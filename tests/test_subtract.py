"""Subtraction suite — port of reference tests/subtract.cpp."""

import numpy as np

import simplemath_tpu as sm
from simplemath_tpu import SLICE_ALL


def test_subtraction_1d():
    a = sm.Array([10, 20, 30, 40, 50], dtype=np.float32)
    b = sm.Array([1, 2, 3, 4, 5], dtype=np.float32)
    result = a - b
    assert np.array_equal(result.numpy(), a.numpy() - b.numpy())


def test_subtraction_2d():
    a = sm.Array([[9, 8, 7], [6, 5, 4]], dtype=np.float32)
    b = sm.Array([[1, 2, 3], [4, 5, 6]], dtype=np.float32)
    result = a - b
    assert np.array_equal(result.numpy(), a.numpy() - b.numpy())


def test_subtraction_2d_int():
    a = sm.Array([[9, 8, 7], [6, 5, 4]], dtype=np.int32)
    b = sm.Array([[1, 2, 3], [4, 5, 6]], dtype=np.int32)
    result = a - b
    assert result.dtype == np.int32
    assert np.array_equal(result.numpy(), a.numpy() - b.numpy())


def test_subtraction_3d_double():
    a = np.arange(8, dtype=np.float64).reshape(2, 2, 2) + 10
    b = np.arange(8, dtype=np.float64).reshape(2, 2, 2)
    result = sm.Array(a) - sm.Array(b)
    assert np.array_equal(result.numpy(), a - b)


def test_subtraction_broadcasting_through_view():
    # tests/subtract.cpp:60-80 pattern.
    one = sm.ones(32, 224, 224, 3) * 5
    sub = sm.ones(1, 224, 1, 3) * 2
    view = one(0, SLICE_ALL)
    result = view - sub
    assert result.shape == (1, 224, 224, 3)
    assert np.all(result.numpy() == 3.0)


def test_subtraction_self_is_zero():
    a = sm.Array([[5, 10], [15, 20]], dtype=np.float32)
    assert np.all((a - a).numpy() == 0.0)


def test_subtraction_scalar():
    a = sm.Array([1, 2, 3], dtype=np.float32)
    assert np.array_equal((a - 1).numpy(), np.array([0, 1, 2], np.float32))
    assert np.array_equal((10 - a).numpy(), np.array([9, 8, 7], np.float32))
