"""Build the _smnative CPython extension in place.

Usage: ``python -m simplemath_tpu.native.build``

Compiles smnative.cpp with the host toolchain directly (no pybind11 /
setuptools ceremony) and drops ``_smnative.so`` next to this file.  The
package works without it (pure-python fallbacks in
simplemath_tpu.native.__init__); building it accelerates host-side array
construction and shape math.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig


def build(verbose: bool = True) -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "smnative.cpp")
    out = os.path.join(here, "_smnative.so")
    include = sysconfig.get_path("include")
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O2",
        "-fPIC",
        "-shared",
        "-std=c++17",
        f"-I{include}",
        src,
        "-o",
        out,
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
    sys.path.insert(0, os.path.dirname(path))
    import _smnative  # noqa: F401

    assert _smnative.broadcast_shapes((2, 1), (1, 3)) == (2, 3)
    shape, data, is_float = _smnative.parse_nested([[1.0, 2.0], [3.0, 4.0]])
    assert shape == (2, 2) and is_float == 1
    print("self-test ok")
