"""Addition suite — port of reference tests/add.cpp (case-for-case)."""

import numpy as np
import pytest

import simplemath_tpu as sm
from simplemath_tpu import SLICE_ALL


def test_addition_1d():
    # tests/add.cpp:6-15
    a = sm.Array([1, 2, 3, 4, 5], dtype=np.float32)
    b = sm.Array([5, 4, 3, 2, 1], dtype=np.float32)
    result = a + b
    for i in range(5):
        assert result(i) == a(i) + b(i)


def test_addition_2d():
    # tests/add.cpp:18-30
    a = sm.Array([[1, 2, 3], [4, 5, 6]], dtype=np.float32)
    b = sm.Array([[6, 5, 4], [3, 2, 1]], dtype=np.float32)
    result = a + b
    assert np.array_equal(result.numpy(), np.full((2, 3), 7.0, np.float32))


def test_addition_2d_int():
    # tests/add.cpp:32-44
    a = sm.Array([[1, 2, 3], [4, 5, 6]], dtype=np.int32)
    b = sm.Array([[6, 5, 4], [3, 2, 1]], dtype=np.int32)
    result = a + b
    assert result.dtype == np.int32
    assert np.array_equal(result.numpy(), np.full((2, 3), 7, np.int32))


def test_addition_3d_double():
    # tests/add.cpp:47-57
    a = np.array([[[1, 2], [3, 4]], [[5, 6], [7, 8]]], dtype=np.float64)
    b = np.array([[[8, 7], [6, 5]], [[4, 3], [2, 1]]], dtype=np.float64)
    result = sm.Array(a) + sm.Array(b)
    assert result.dtype == np.float64
    assert np.array_equal(result.numpy(), a + b)


def test_broadcasting_through_view():
    # tests/add.cpp:59-92: (32,224,224,3) sliced to a (224,224,3) view,
    # plus (1,224,1,3) -> broadcast result (1,224,224,3), all elements 4.
    one = sm.ones(32, 224, 224, 3)
    two = sm.zeros(1, 224, 1, 3)
    two[...] = 3.0

    view = one(0, SLICE_ALL)
    assert view.shape == (224, 224, 3)
    assert view.is_view

    result = view + two
    assert result.shape == (1, 224, 224, 3)
    assert np.all(result.numpy() == 4.0)


def test_broadcasting_elementwise_assignment_path():
    # Same case exercising per-element assignment like the reference's loop
    # (two(0, i, 0, c) = 3), on a reduced grid for speed.
    two = sm.zeros(1, 8, 1, 3)
    for i in range(8):
        for c in range(3):
            two[0, i, 0, c] = 3.0
    assert np.all(two.numpy() == 3.0)


def test_addition_with_zero():
    # tests/add.cpp:97-106
    arr = sm.Array([[1, 2], [3, 4]], dtype=np.float32)
    zero = sm.Array([[0, 0], [0, 0]], dtype=np.float32)
    result = arr + zero
    assert np.array_equal(result.numpy(), arr.numpy())


def test_addition_scalar():
    # Scalar path (SMArray.h:226-237) — honors views, fixing SURVEY §2.4-3.
    arr = sm.Array([[1, 2], [3, 4]], dtype=np.float32)
    assert np.array_equal((arr + 10).numpy(), arr.numpy() + 10)
    assert np.array_equal((10 + arr).numpy(), arr.numpy() + 10)
    view = arr.T
    assert np.array_equal((view + 1).numpy(), arr.numpy().T + 1)


def test_addition_shape_mismatch_raises():
    # SMUtils.h:76-78 throws on mismatch.
    a = sm.ones(2, 3)
    b = sm.ones(2, 4)
    with pytest.raises(ValueError, match="broadcast"):
        _ = a + b
