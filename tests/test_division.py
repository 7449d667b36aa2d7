"""Division suite — port of reference tests/division.cpp.

Divergence note: the reference's int/int ``operator/`` truncates (C++
semantics, include/math/division.h:67-70).  Here ``/`` is NumPy true
division (float result) and ``//`` is the truncating-toward-negative-
infinity integer division; the Division2DInt port uses ``//`` with inputs
that divide exactly, where both semantics agree.
"""

import numpy as np

import simplemath_tpu as sm
from simplemath_tpu import SLICE_ALL


def test_division_1d():
    # tests/division.cpp:5-14
    a = sm.Array([10, 20, 30, 40, 50], dtype=np.float32)
    b = sm.Array([2, 4, 5, 8, 10], dtype=np.float32)
    assert np.array_equal((a / b).numpy(), a.numpy() / b.numpy())


def test_division_2d():
    # tests/division.cpp:17-29
    a = sm.Array([[8, 16, 24], [32, 40, 48]], dtype=np.float32)
    b = sm.Array([[2, 4, 8], [4, 5, 6]], dtype=np.float32)
    assert np.array_equal((a / b).numpy(), a.numpy() / b.numpy())


def test_division_2d_int():
    # tests/division.cpp:32-44 (exactly-dividing values)
    a = sm.Array([[8, 16, 24], [32, 40, 48]], dtype=np.int32)
    b = sm.Array([[2, 4, 8], [4, 5, 6]], dtype=np.int32)
    result = a // b
    assert np.array_equal(
        result.numpy(), np.array([[4, 4, 3], [8, 8, 8]], np.int32)
    )
    # True division on ints promotes to float (NumPy semantics).
    assert np.issubdtype((a / b).dtype, np.floating)


def test_division_3d_double():
    # tests/division.cpp:47-57
    a = np.array([[[8, 16], [24, 32]], [[40, 48], [56, 64]]], dtype=np.float64)
    b = np.array([[[2, 4], [3, 4]], [[5, 6], [7, 8]]], dtype=np.float64)
    result = sm.Array(a) / sm.Array(b)
    assert np.array_equal(result.numpy(), a / b)


def test_division_broadcasting():
    # tests/division.cpp:60-74
    arr = sm.ones(32, 224, 224, 3) * 4
    divisor = sm.ones(1, 224, 1, 3) * 2
    view = arr(0, SLICE_ALL)
    result = view / divisor
    assert result.shape == (1, 224, 224, 3)
    assert np.all(result.numpy() == 2.0)


def test_division_by_ones():
    # tests/division.cpp:77-86
    arr = sm.Array([[1, 2], [3, 4]], dtype=np.float32)
    one = sm.ones(2, 2)
    assert np.array_equal((arr / one).numpy(), arr.numpy())


def test_division_by_self():
    # tests/division.cpp:89-96
    arr = sm.Array([[5, 10], [15, 20]], dtype=np.float32)
    assert np.all((arr / arr).numpy() == 1.0)


def test_division_scalar():
    arr = sm.Array([2, 4, 8], dtype=np.float32)
    assert np.array_equal((arr / 2).numpy(), np.array([1, 2, 4], np.float32))
    assert np.array_equal((8 / arr).numpy(), np.array([4, 2, 1], np.float32))
