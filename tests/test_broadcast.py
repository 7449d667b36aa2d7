"""Broadcast machinery — reference include/SMUtils.h:34-99 semantics."""

import numpy as np
import pytest

import simplemath_tpu as sm
from simplemath_tpu.broadcast import broadcast_shapes


def test_basic_shapes():
    br = broadcast_shapes((32, 224, 224, 3), (1, 224, 1, 3))
    assert br.result_shape == (32, 224, 224, 3)
    assert br.total_size == 32 * 224 * 224 * 3
    assert br.bcast_dims_b == (0, 2)


def test_rank_padding_right_aligned():
    # Right-align pad with 1s (SMUtils.h:45-60).
    br = broadcast_shapes((224, 224, 3), (1, 224, 1, 3))
    assert br.result_shape == (1, 224, 224, 3)
    assert br.padded_a == (1, 224, 224, 3)


def test_scalar_broadcast():
    assert broadcast_shapes((5,), ()).result_shape == (5,)
    assert broadcast_shapes((), ()).result_shape == ()


def test_mismatch_raises():
    # SMUtils.h:76-78.
    with pytest.raises(ValueError, match="broadcast"):
        broadcast_shapes((2, 3), (4, 5))


def test_broadcast_matches_numpy(rng):
    cases = [
        ((3, 1, 5), (1, 4, 5)),
        ((1,), (7, 3)),
        ((2, 3), (3,)),
        ((8, 1), (1, 9)),
    ]
    for sa, sb in cases:
        br = broadcast_shapes(sa, sb)
        assert br.result_shape == np.broadcast_shapes(sa, sb)
        a = rng.normal(size=sa).astype(np.float32)
        b = rng.normal(size=sb).astype(np.float32)
        out = sm.Array(a) + sm.Array(b)
        np.testing.assert_allclose(out.numpy(), a + b, rtol=1e-6)
