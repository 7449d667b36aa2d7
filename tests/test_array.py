"""Array container semantics: construction, views, slicing, transpose,
repeat, strides, printing — reference include/SMArray.h behavior with the
SURVEY §2.4 quirks fixed to intended (NumPy) semantics."""

import numpy as np
import pytest

import simplemath_tpu as sm
from simplemath_tpu import SLICE, SLICE_ALL, SLICE_END, SLICE_START, Slice


def test_nested_list_construction():
    # SMArray.h:36-68 nested initializer lists.
    a = sm.Array([[1, 2], [3, 4]])
    assert a.shape == (2, 2)
    assert a.ndim == 2
    assert a.total_size == 4
    assert a(0, 0) == 1 and a(1, 1) == 4


def test_default_dtypes():
    assert sm.Array([1.0, 2.0]).dtype == np.float32
    assert sm.Array([1, 2]).dtype == np.int32


def test_strides_row_major():
    # calculateStride (SMArray.h:357-364): row-major, innermost 1.
    a = sm.zeros(2, 3, 4)
    assert a.strides == (12, 4, 1)


def test_transpose_view_strides():
    # transpose reverses shape+strides (SMArray.h:121-136).
    a = sm.zeros(2, 3, 4)
    t = a.transpose()
    assert t.shape == (4, 3, 2)
    assert t.strides == (1, 4, 12)
    assert t.is_view


def test_transpose_values():
    a = sm.Array(np.arange(6, dtype=np.float32).reshape(2, 3))
    assert np.array_equal(a.T.numpy(), a.numpy().T)


def test_view_write_through():
    # Views alias the parent (SMArray.h:428-436 non-owning views); writes
    # through a view are visible in the parent and vice versa.
    a = sm.zeros(3, 3)
    v = a[1]
    v[...] = 7.0
    assert np.array_equal(a.numpy()[1], np.full(3, 7.0, np.float32))
    a[1, 0] = 5.0
    assert v(0) == 5.0


def test_index_collapse_ndim():
    # Fixed quirk SURVEY §2.4-5: INDEX-collapsed views report correct ndim.
    a = sm.zeros(4, 5, 6)
    v = a(0, SLICE_ALL)
    assert v.shape == (5, 6)
    assert v.ndim == 2


def test_slice_objects():
    # Slice descriptor parity (include/Slice.h:4-28) with working steps
    # (unreachable in the reference, SURVEY §2.4-6).
    a = sm.Array(np.arange(10, dtype=np.float32))
    assert np.array_equal(a[Slice(2, 8)].numpy(), np.arange(2, 8, dtype=np.float32))
    assert np.array_equal(a[SLICE(2, 8, 2)].numpy(), np.array([2, 4, 6], np.float32))
    assert np.array_equal(a[SLICE_START(7)].numpy(), np.array([7, 8, 9], np.float32))
    assert np.array_equal(a[SLICE_END(3)].numpy(), np.array([0, 1, 2], np.float32))
    assert np.array_equal(a[SLICE_ALL].numpy(), a.numpy())


def test_negative_step_slicing():
    a = sm.Array(np.arange(10, dtype=np.float32))
    assert np.array_equal(a[::-1].numpy(), a.numpy()[::-1])
    assert np.array_equal(a[8:2:-2].numpy(), a.numpy()[8:2:-2])


def test_view_of_view_composition():
    base = np.arange(24, dtype=np.float32).reshape(4, 6)
    a = sm.Array(base)
    v1 = a[1:4, ::2]  # (3, 3)
    v2 = v1[::-1, 1:]
    assert np.array_equal(v2.numpy(), base[1:4, ::2][::-1, 1:])
    # write-through across two view levels: v2[0,0] is base row 3 (reversed
    # rows of base[1:4]) and base col 2 (cols [0,2,4] after [1:]).
    v2[0, 0] = 99.0
    assert a.numpy()[3, 2] == 99.0


def test_view_then_transpose_then_slice():
    base = np.arange(60, dtype=np.float32).reshape(3, 4, 5)
    a = sm.Array(base)
    v = a[1].T[2:, :2]
    assert np.array_equal(v.numpy(), base[1].T[2:, :2])
    v[...] = -1.0
    ref = base.copy()
    ref[1].T[2:, :2] = -1.0
    assert np.array_equal(a.numpy(), ref)


def test_out_of_bounds_index_raises():
    a = sm.zeros(2, 2)
    with pytest.raises(IndexError):
        _ = a[5, 0]


def test_too_many_indices_raises():
    a = sm.zeros(2, 2)
    with pytest.raises(IndexError):
        _ = a[0, 0, 0]


def test_repeat_flat():
    # Intended semantics of SMArray.h:138-159 (reference writes overlapping
    # indices, SURVEY §2.4-4 — fixed): each element repeated n times.
    a = sm.Array([1, 2, 3], dtype=np.int32)
    assert a.repeat(3).tolist() == [1, 1, 1, 2, 2, 2, 3, 3, 3]


def test_repeat_axis():
    a = sm.Array([[1, 2], [3, 4]], dtype=np.int32)
    assert np.array_equal(a.repeat(2, axis=0).numpy(), np.repeat(a.numpy(), 2, 0))
    assert np.array_equal(a.repeat(2, axis=1).numpy(), np.repeat(a.numpy(), 2, 1))


def test_reshape_flatten():
    a = sm.Array(np.arange(12, dtype=np.float32))
    assert a.reshape(3, 4).shape == (3, 4)
    assert a.reshape(3, 4).flatten().tolist() == list(range(12))


def test_to_string():
    # toString / operator<< (SMArray.h:306-332, UserFunctions.h:54-57).
    a = sm.Array([[1, 2], [3, 4]], dtype=np.int32)
    s = str(a)
    assert "1" in s and "4" in s and "[" in s


def test_factories():
    # UserFunctions.h:8-40.
    assert sm.empty(2, 3).shape == (2, 3)
    assert np.all(sm.ones(2, 3).numpy() == 1.0)
    assert np.all(sm.zeros(2, 3).numpy() == 0.0)
    assert np.all(sm.full(2, 2, fill_value=7).numpy() == 7.0)
    big = sm.ones(200_000)  # above the reference's par_unseq threshold
    assert float(big.sum().jax()) == 200_000.0


def test_iteration_and_len():
    a = sm.Array([[1, 2], [3, 4]], dtype=np.int32)
    assert len(a) == 2
    rows = [r.tolist() for r in a]
    assert rows == [[1, 2], [3, 4]]


def test_setitem_broadcast():
    a = sm.zeros(3, 4)
    a[1:, :] = 2.0
    expected = np.zeros((3, 4), np.float32)
    expected[1:, :] = 2.0
    assert np.array_equal(a.numpy(), expected)


def test_jit_traceable():
    # Array registers as a pytree; jitted functions accept and return it.
    import jax

    @jax.jit
    def f(x, y):
        return x + y * 2

    a = sm.Array([1.0, 2.0])
    b = sm.Array([3.0, 4.0])
    out = f(a, b)
    assert isinstance(out, sm.Array)
    np.testing.assert_allclose(out.numpy(), [7.0, 10.0])


def test_newaxis_indexing():
    """None (np.newaxis) in keys inserts size-1 dims; like reshape, the
    result is a regular array (the view machinery tracks base dims only)."""
    import numpy as np

    x = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    a = sm.Array(x)
    for key in [
        (None,),
        (None, 0),
        (0, None),
        (Ellipsis, None),
        (None, Ellipsis),
        (1, None, slice(1, 3)),
        (None, slice(None), None, 2),
    ]:
        got, want = a[key], x[key]
        assert got.shape == want.shape
        np.testing.assert_allclose(got.numpy(), want)

    b = sm.Array(x.copy())
    w = x.copy()
    b[0, None] = 7.0
    w[0, None] = 7.0
    np.testing.assert_allclose(b.numpy(), w)

    assert sm.expand_dims(a, 0).shape == (1, 2, 3, 4)
    assert sm.squeeze(a[None]).shape == (2, 3, 4)
