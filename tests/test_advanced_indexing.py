"""NumPy advanced indexing (integer arrays / boolean masks) on sm.Array.

Beyond the reference's surface (its ``accessByArray`` handles only
ints/slices, include/SMArray.h:397-437), but part of a complete ndarray
API: fancy reads lower to XLA gather and return copies (NumPy semantics);
fancy writes lower to scatter/select THROUGH the view machinery, so they
stay visible to the parent and sibling views.
"""

import numpy as np
import pytest

import simplemath_tpu as sm


def _mk(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


class TestFancyRead:
    def test_int_array_1d(self):
        A = _mk(20)
        idx = np.array([3, 1, 17, 3, 0])
        got = np.asarray(sm.array(A)[idx])
        np.testing.assert_array_equal(got, A[idx])

    def test_int_list(self):
        A = _mk((6, 5))
        got = np.asarray(sm.array(A)[[4, 0, 2]])
        np.testing.assert_array_equal(got, A[[4, 0, 2]])

    def test_negative_indices(self):
        A = _mk(10)
        got = np.asarray(sm.array(A)[np.array([-1, -10, 5])])
        np.testing.assert_array_equal(got, A[np.array([-1, -10, 5])])

    def test_multi_dim_int_arrays(self):
        A = _mk((7, 9))
        r = np.array([0, 3, 6])
        c = np.array([8, 2, 4])
        got = np.asarray(sm.array(A)[r, c])
        np.testing.assert_array_equal(got, A[r, c])

    def test_mixed_slice_and_array(self):
        A = _mk((5, 8))
        got = np.asarray(sm.array(A)[1:4, np.array([7, 0])])
        np.testing.assert_array_equal(got, A[1:4, np.array([7, 0])])

    def test_bool_mask(self):
        A = _mk(30)
        mask = A > 0
        got = np.asarray(sm.array(A)[mask])
        np.testing.assert_array_equal(got, A[mask])

    def test_bool_mask_2d(self):
        A = _mk((6, 7))
        mask = A > 0.5
        got = np.asarray(sm.array(A)[mask])
        np.testing.assert_array_equal(got, A[mask])

    def test_sm_array_as_index(self):
        A = _mk(12)
        idx = sm.array(np.array([0, 5, 11], np.int32))
        got = np.asarray(sm.array(A)[idx])
        np.testing.assert_array_equal(got, A[[0, 5, 11]])

    def test_returns_copy_not_view(self):
        A = _mk(10)
        a = sm.array(A)
        b = a[np.array([0, 1])]
        assert not b.is_view

    def test_fancy_read_through_view(self):
        A = _mk((6, 8))
        v = sm.array(A).T  # view
        got = np.asarray(v[np.array([2, 7])])
        np.testing.assert_array_equal(got, A.T[[2, 7]])


class TestFancyWrite:
    def test_int_array_write(self):
        A = _mk(20)
        a = sm.array(A)
        a[np.array([1, 5, 7])] = 0.0
        want = A.copy()
        want[[1, 5, 7]] = 0.0
        np.testing.assert_array_equal(np.asarray(a), want)

    def test_bool_mask_write(self):
        A = _mk((5, 6))
        a = sm.array(A)
        a[A > 0] = -1.0
        want = A.copy()
        want[A > 0] = -1.0
        np.testing.assert_array_equal(np.asarray(a), want)

    def test_write_array_values(self):
        A = _mk(10)
        a = sm.array(A)
        a[np.array([2, 4])] = np.array([100.0, 200.0], np.float32)
        want = A.copy()
        want[[2, 4]] = [100.0, 200.0]
        np.testing.assert_array_equal(np.asarray(a), want)

    def test_write_through_view_visible_in_parent(self):
        A = _mk((4, 6))
        p = sm.array(A)
        v = p[1]  # row view
        v[np.array([0, 5])] = 9.0
        want = A.copy()
        want[1, [0, 5]] = 9.0
        np.testing.assert_array_equal(np.asarray(p), want)

    def test_write_through_transpose_view(self):
        A = _mk((3, 5))
        p = sm.array(A)
        v = p.T
        v[np.array([4, 0]), np.array([2, 1])] = 7.0
        want = A.copy()
        want.T[[4, 0], [2, 1]] = 7.0
        np.testing.assert_array_equal(np.asarray(p), want)

    def test_mask_write_preserves_dtype(self):
        A = np.arange(10, dtype=np.int32)
        a = sm.array(A)
        a[A % 2 == 0] = -1
        want = A.copy()
        want[A % 2 == 0] = -1
        np.testing.assert_array_equal(np.asarray(a), want)
        assert np.asarray(a).dtype == np.int32


class TestFuzzOracle:
    @pytest.mark.parametrize("seed", range(10))
    def test_fancy_roundtrip(self, seed):
        rng = np.random.default_rng(seed)
        shape = tuple(int(rng.integers(2, 12)) for _ in range(rng.integers(1, 3)))
        A = rng.standard_normal(shape).astype(np.float32)
        a = sm.array(A)
        want = A.copy()
        n_idx = int(rng.integers(1, 6))
        idx = rng.integers(-shape[0], shape[0], n_idx)
        got_read = np.asarray(a[idx])
        np.testing.assert_array_equal(got_read, want[idx])
        val = rng.standard_normal(got_read.shape).astype(np.float32)
        a[idx] = val
        want[idx] = val
        np.testing.assert_array_equal(np.asarray(a), want)
