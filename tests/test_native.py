"""Native C++ extension (host-side runtime helpers) and its fallbacks."""

import numpy as np
import pytest

from simplemath_tpu import native


def test_available_reports_bool():
    assert isinstance(native.available(), bool)


def test_parse_nested_flat():
    shape, arr = native.parse_nested([1.0, 2.0, 3.0])
    assert shape == (3,)
    np.testing.assert_array_equal(arr, [1.0, 2.0, 3.0])


def test_parse_nested_2d_ints():
    shape, arr = native.parse_nested([[1, 2, 3], [4, 5, 6]])
    assert shape == (2, 3)
    assert arr.dtype in (np.int64, np.int32)
    np.testing.assert_array_equal(arr, [[1, 2, 3], [4, 5, 6]])


def test_parse_nested_mixed_promotes_float():
    shape, arr = native.parse_nested([[1, 2.5], [3, 4]])
    assert np.issubdtype(arr.dtype, np.floating)
    np.testing.assert_allclose(arr, [[1.0, 2.5], [3.0, 4.0]])


def test_parse_nested_ragged_raises():
    with pytest.raises(ValueError):
        native.parse_nested([[1, 2], [3]])


def test_parse_nested_deep():
    data = [[[i + j + k for k in range(2)] for j in range(3)] for i in range(4)]
    shape, arr = native.parse_nested(data)
    assert shape == (4, 3, 2)
    np.testing.assert_array_equal(arr, np.array(data))


def test_row_major_strides():
    assert native.row_major_strides((2, 3, 4)) == (12, 4, 1)
    assert native.row_major_strides((5,)) == (1,)
    assert native.row_major_strides(()) == ()


def test_broadcast_shapes_native():
    assert native.broadcast_shapes((2, 1), (1, 3)) == (2, 3)
    assert native.broadcast_shapes((224, 224, 3), (1, 224, 1, 3)) == (
        1,
        224,
        224,
        3,
    )
    with pytest.raises(ValueError):
        native.broadcast_shapes((2, 3), (4, 5))


@pytest.mark.skipif(not native.available(), reason="extension not built")
def test_extension_is_actually_used():
    # When built, the C path handles lists (bools become ints).
    shape, arr = native.parse_nested([True, False, True])
    assert shape == (3,)
    np.testing.assert_array_equal(arr, [1, 0, 1])
