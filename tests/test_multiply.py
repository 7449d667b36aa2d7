"""Multiplication suite — port of reference tests/multiply.cpp."""

import numpy as np

import simplemath_tpu as sm
from simplemath_tpu import SLICE_ALL


def test_multiplication_1d():
    a = sm.Array([1, 2, 3, 4, 5], dtype=np.float32)
    b = sm.Array([5, 4, 3, 2, 1], dtype=np.float32)
    assert np.array_equal((a * b).numpy(), a.numpy() * b.numpy())


def test_multiplication_2d():
    a = sm.Array([[1, 2, 3], [4, 5, 6]], dtype=np.float32)
    b = sm.Array([[6, 5, 4], [3, 2, 1]], dtype=np.float32)
    assert np.array_equal((a * b).numpy(), a.numpy() * b.numpy())


def test_multiplication_2d_int():
    a = sm.Array([[1, 2, 3], [4, 5, 6]], dtype=np.int32)
    b = sm.Array([[6, 5, 4], [3, 2, 1]], dtype=np.int32)
    result = a * b
    assert result.dtype == np.int32
    assert np.array_equal(result.numpy(), a.numpy() * b.numpy())


def test_multiplication_int64():
    # int64 SIMD is explicitly absent in the reference
    # (include/math/multiply.h:89-95); full support here via the XLA path.
    a = sm.Array(np.array([[1, 2], [3, 4]], dtype=np.int64))
    b = sm.Array(np.array([[5, 6], [7, 8]], dtype=np.int64))
    result = a * b
    assert result.dtype == np.int64
    assert np.array_equal(result.numpy(), a.numpy() * b.numpy())


def test_multiplication_3d_double():
    a = np.arange(8, dtype=np.float64).reshape(2, 2, 2) + 1
    b = np.arange(8, dtype=np.float64).reshape(2, 2, 2) + 9
    assert np.array_equal((sm.Array(a) * sm.Array(b)).numpy(), a * b)


def test_multiplication_broadcasting_mask():
    # tests/multiply.cpp:60-80: ones * (mask of 2s broadcast) == 2.
    one = sm.ones(32, 224, 224, 3)
    mask = sm.zeros(1, 224, 1, 3)
    mask[...] = 2.0
    view = one(0, SLICE_ALL)
    result = view * mask
    assert result.shape == (1, 224, 224, 3)
    assert np.all(result.numpy() == 2.0)


def test_multiplication_with_zero():
    arr = sm.Array([[1, 2], [3, 4]], dtype=np.float32)
    zero = sm.zeros(2, 2)
    assert np.all((arr * zero).numpy() == 0.0)


def test_multiplication_with_ones_identity():
    arr = sm.Array([[1, 2], [3, 4]], dtype=np.float32)
    one = sm.ones(2, 2)
    assert np.array_equal((arr * one).numpy(), arr.numpy())


def test_multiplication_scalar():
    d = sm.Array([1, 2, 3, 4], dtype=np.int32)
    e = d * 2
    assert e.dtype == np.int32
    assert np.array_equal(e.numpy(), np.array([2, 4, 6, 8], np.int32))
