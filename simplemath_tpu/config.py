"""Runtime configuration for simplemath_tpu.

The reference library's knobs are all compile-time (CMake option
``SM_ENABLE_NATIVE_OPTIMIZATION`` at CMakeLists.txt:3, ISA ``#ifdef``s at
include/math/helpers.h:14-20, ``CHUNK_SIZE`` at include/macros.h:16, and the
hard-coded OpenMP threshold ``100'000`` at include/math/calculate.h:47).  The
TPU-native equivalent is a runtime dataclass configurable via environment
variables: kernel backend selection replaces ISA selection, the Pallas
dispatch threshold replaces the OpenMP threshold, and tile sizes replace
CHUNK_SIZE.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional


def _env_int(name: str, default: int) -> int:
    v = os.environ.get(name)
    return int(v) if v else default


def _env_str(name: str, default: str) -> str:
    return os.environ.get(name, default)


@dataclasses.dataclass
class Config:
    # Kernel backend: "auto" picks Pallas on TPU for large contiguous ops and
    # XLA elsewhere; "xla" forces jnp/XLA fusion; "pallas" forces Pallas
    # kernels (interpret-mode on CPU).  Analog of the reference's compile-time
    # ISA dispatch (include/math/helpers.h:14-20) done at runtime instead.
    kernel_backend: str = dataclasses.field(
        default_factory=lambda: _env_str("SM_KERNEL_BACKEND", "auto")
    )

    # Minimum number of elements before the Pallas elementwise kernel is
    # preferred under "auto".  Analog of the OpenMP `if(n>100'000)` gate
    # (include/math/calculate.h:47).  Set to exactly 1M so the reference's
    # million_check shape (1,000,000 floats, benchmark/add.cpp:21-29)
    # exercises the framework kernel, not only the XLA fallback.
    pallas_min_elements: int = dataclasses.field(
        default_factory=lambda: _env_int("SM_PALLAS_MIN_ELEMENTS", 1_000_000)
    )

    # Elementwise kernel tile (sublane x lane multiples).  Analog of
    # CHUNK_SIZE=1024 (include/macros.h:16); on TPU the natural unit is the
    # (8, 128) VPU tile and multiples thereof.
    ew_block_rows: int = dataclasses.field(
        default_factory=lambda: _env_int("SM_EW_BLOCK_ROWS", 512)
    )
    ew_block_cols: int = dataclasses.field(
        default_factory=lambda: _env_int("SM_EW_BLOCK_COLS", 1024)
    )

    # Transcendental implementation for exp/log/pow tiles:
    # "auto"    — per-op choice by MEASURED v5e accuracy/speed:
    #             exp & pow -> native (XLA/Mosaic hardware-refined, ~5e-6
    #             rel err, 3-6x faster in-kernel), log/exp2/log2 -> crafted
    #             (XLA:TPU's own log is only ~6e-5 accurate — wrong at
    #             log(3) by 6.2e-5, echoing the reference's bug — and
    #             Mosaic lowers exp2/log2 to the raw ~8-bit hardware
    #             approximation, 4.6e-4 rel err);
    # "native"  — jnp ops everywhere (fastest; platform accuracy);
    # "crafted" — this framework's fdlibm-style range-reduction
    #             implementations everywhere (<=4 ulp across the f32
    #             domain — the from-the-math versions proving the
    #             reference's admitted exp/log bugs fixed; slower).
    # Both impls are accuracy-tested against float64.
    transcendental_impl: str = dataclasses.field(
        default_factory=lambda: _env_str("SM_TRANSCENDENTAL", "auto")
    )

    # Deferred-eager elementwise queue (ops/lazy.py): eager op chains record
    # a lazy expression and flush as ONE fused kernel on materialization
    # instead of one launch per op.  Set SM_DEFERRED_EAGER=0 to compute
    # every op immediately (the round-3 behavior).
    deferred_eager: bool = dataclasses.field(
        default_factory=lambda: _env_str("SM_DEFERRED_EAGER", "1") not in ("", "0")
    )

    # Force Pallas interpret mode (used on CPU test meshes).  None = auto
    # (interpret when the default backend is not TPU).
    pallas_interpret: Optional[bool] = None

    # Debug-mode numerical guards (the sanitizer analog, SURVEY §5): when
    # True, the no-pivot small-matrix inverses emit checkify checks on the
    # finiteness of their results (they assume diagonally-dominant/PD
    # inputs — ops/linalg_small.py).  Run the caller under
    # jax.experimental.checkify.checkify (e.g. utils.debug.nan_guard) to
    # surface the errors; adds ~one reduction per inverse.
    debug_checks: bool = dataclasses.field(
        default_factory=lambda: _env_str("SM_DEBUG_CHECKS", "") not in ("", "0")
    )

    # Default mesh axis names for the distributed layer.
    data_axis: str = "scenario"
    model_axis: str = "model"

    def interpret_mode(self) -> bool:
        if self.pallas_interpret is not None:
            return self.pallas_interpret
        import jax

        return jax.default_backend() != "tpu"


config = Config()

_c64_probe_result: Optional[bool] = None


def backend_supports_complex64() -> bool:
    """Whether the ACTIVE backend can execute complex64 computations.

    XLA:TPU proper supports c64 (decomposed to f32 pairs), but tunneled /
    experimental device plugins may not: the axon tunnel in this
    environment returns UNIMPLEMENTED for every c64 op AND leaves the
    client wedged afterwards — so the probe runs in a THROWAWAY SUBPROCESS
    (a failed in-process attempt would poison all subsequent device work).
    Cached per process; override with SM_TPU_C64=0/1.  CPU always True.
    """
    global _c64_probe_result
    env = _env_str("SM_TPU_C64", "")
    if env != "":
        return env not in ("0", "false")
    import jax

    if jax.default_backend() != "tpu":
        return True
    if _c64_probe_result is None:
        import subprocess
        import sys

        probe = (
            "import jax, jax.numpy as jnp, numpy as np\n"
            "z = jnp.asarray(np.array([1+2j], np.complex64))\n"
            "assert abs(complex(np.asarray(z + z)[0]) - (2+4j)) < 1e-5\n"
            "print('C64_OK')\n"
        )
        try:
            proc = subprocess.run(
                [sys.executable, "-c", probe],
                capture_output=True,
                text=True,
                timeout=300,
            )
            _c64_probe_result = "C64_OK" in proc.stdout
        except Exception:
            _c64_probe_result = False
    return _c64_probe_result


def update(**kwargs) -> Config:
    """Update global config fields; returns the config for chaining."""
    for k, v in kwargs.items():
        if not hasattr(config, k):
            raise AttributeError(f"unknown config field {k!r}")
        setattr(config, k, v)
    return config
