"""Pow suite — port of reference tests/pow.cpp, plus the float-pow cases the
reference left disabled pending its SIMD rewrite (tests/pow.cpp:29-36,
101-125) — working here."""

import numpy as np

import simplemath_tpu as sm


def test_scalar_pow():
    # tests/pow.cpp:4-8
    arr = sm.Array([2], dtype=np.int32)
    result = sm.pow(arr, 3)
    assert result(0) == 8


def test_one_dimensional_pow():
    # tests/pow.cpp:10-16
    arr = sm.Array([1, 2, 3], dtype=np.int32)
    result = sm.pow(arr, 2)
    assert result.tolist() == [1, 4, 9]


def test_two_dimensional_pow():
    # tests/pow.cpp:18-28
    arr = sm.Array([[1, 2, 3], [4, 5, 6]], dtype=np.int32)
    result = sm.pow(arr, 2)
    assert np.array_equal(result.numpy(), np.array([[1, 4, 9], [16, 25, 36]]))


def test_negative_exponent_float():
    # tests/pow.cpp:30-38 (disabled in the reference; works here)
    arr = sm.Array([[2, 4], [8, 16]], dtype=np.float32)
    result = sm.pow(arr, -1.0)
    assert np.allclose(result.numpy(), [[0.5, 0.25], [0.125, 0.0625]], rtol=1e-6)


def test_non_square_shape():
    # tests/pow.cpp:38-45
    arr = sm.Array([[1, 2, 3]], dtype=np.int32)
    result = sm.pow(arr, 3)
    assert np.array_equal(result.numpy(), np.array([[1, 8, 27]]))


def test_large_arrays():
    # tests/pow.cpp:47-61: (1000,1000,2) of 5 cubed.
    arr = sm.full(1000, 1000, 2, fill_value=5, dtype=np.int32)
    result = sm.pow(arr, 3)
    assert np.all(result.numpy() == 125)


def test_large_arrays_with_negatives():
    # tests/pow.cpp:62-99: alternating ±5; positive exponent exact; negative
    # exponent collapses to 0 except bases ±1 (crafted_pow.h:35-51).
    data = np.where(np.arange(50 * 50 * 2) % 2 == 0, 5, -5).astype(np.int32)
    arr = sm.Array(data.reshape(50, 50, 2))

    result_pos = sm.pow(arr, 3)
    assert np.array_equal(result_pos.numpy(), data.reshape(50, 50, 2) ** 3)

    result_neg = sm.pow(arr, -2)
    assert np.all(result_neg.numpy() == 0)


def test_integer_pow_edge_table():
    # crafted_pow.h edge semantics: 0^+n=0, 0^0=1, 1^-n=1, (-1)^±n=±1,
    # other^-n=0 (SURVEY §2.4-8).
    base = sm.Array([0, 0, 1, -1, -1, 2, -3], dtype=np.int32)
    exp = sm.Array([3, 0, -5, -2, -3, -1, -2], dtype=np.int32)
    result = sm.pow(base, exp)
    assert result.tolist() == [0, 1, 1, 1, -1, 0, 0]


def test_float_pow_different_values():
    # tests/pow.cpp:101-125 (disabled in reference): i+j+k values cubed.
    i, j, k = np.meshgrid(
        np.arange(50), np.arange(50), np.arange(2), indexing="ij"
    )
    vals = (i + j + k).astype(np.float32)
    arr = sm.Array(vals)
    result = sm.pow(arr, 3.0)
    expected = np.power(vals.astype(np.float64), 3.0)
    np.testing.assert_allclose(result.numpy(), expected, rtol=2e-6)


def test_pow_respects_views():
    # Fixing SURVEY §2.4-3: sm::pow iterated the flat buffer, giving wrong
    # results on transposed/sliced views.
    arr = sm.Array([[1, 2], [3, 4]], dtype=np.float32)
    view = arr.T
    result = sm.pow(view, 2.0)
    np.testing.assert_allclose(
        result.numpy(), np.array([[1, 9], [4, 16]], np.float32), rtol=1e-6
    )


def test_pow_operator():
    arr = sm.Array([1.0, 2.0, 3.0], dtype=np.float32)
    np.testing.assert_allclose(
        (arr ** 2).numpy(), np.array([1, 4, 9], np.float32), rtol=1e-6
    )
