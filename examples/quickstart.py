"""Quickstart — the reference README's example (README.md:36-56), ported.

Run: python examples/quickstart.py
"""

import numpy as np

import simplemath_tpu as sm


def main():
    a = sm.Array([[1, 2], [3, 4]], dtype=np.float32)
    b = sm.Array([[5, 6], [7, 8]], dtype=np.float32)

    c = a + b
    print(c)

    d = sm.Array([1, 2, 3, 4], dtype=np.int32)
    e = d * 2
    print(e)

    # Things the reference advertises but gets wrong — working here:
    view = a[0, :]          # aliasing view
    view[0] = 9.0           # writes through to `a`
    print(a)

    print(sm.pow(a, 2.5))   # float pow (reference: disabled pending SVML)
    print(sm.exp(a))        # correct range reduction (reference: broken)

    # Custom op — reference "Extending with Custom Operations" without the
    # per-ISA boilerplate:
    sm.register_op("scaled_sum", lambda x, y: (x + y) * 2, overwrite=True)
    print(sm.apply_op("scaled_sum", a, b))


if __name__ == "__main__":
    main()
