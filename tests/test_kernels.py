"""Pallas matmul + reduction kernels vs the NumPy oracle (interpret mode on
CPU; the same kernels compile to Mosaic on TPU).  f32 matmul cases pin the
precision="highest" contract (exact f32) so they hold on the real MXU too;
the default-precision bf16-truncating path is covered by test_dispatch with
bf16-grade tolerances."""

import jax.numpy as jnp
import numpy as np
import pytest

from simplemath_tpu.ops import matmul, reduction


def test_pallas_matmul_square(rng):
    a = rng.normal(size=(256, 320)).astype(np.float32)
    b = rng.normal(size=(320, 256)).astype(np.float32)
    out = matmul.pallas_matmul(jnp.asarray(a), jnp.asarray(b), precision="highest")
    np.testing.assert_allclose(
        np.asarray(out), a @ b, rtol=1e-5, atol=1e-4
    )


def test_pallas_matmul_multi_k_steps(rng):
    # K spans multiple accumulation steps (bk < K).
    a = rng.normal(size=(64, 700)).astype(np.float32)
    b = rng.normal(size=(700, 64)).astype(np.float32)
    out = matmul.pallas_matmul(
        jnp.asarray(a), jnp.asarray(b), block_m=64, block_k=256, block_n=64,
        precision="highest",
    )
    np.testing.assert_allclose(np.asarray(out), a @ b, rtol=1e-5, atol=1e-4)


def test_pallas_matmul_unaligned(rng):
    a = rng.normal(size=(100, 300)).astype(np.float32)
    b = rng.normal(size=(300, 130)).astype(np.float32)
    out = matmul.pallas_matmul(
        jnp.asarray(a), jnp.asarray(b), block_m=64, block_k=128, block_n=64,
        precision="highest",
    )
    np.testing.assert_allclose(np.asarray(out), a @ b, rtol=1e-5, atol=1e-4)


def test_pallas_matmul_bf16(rng):
    a = rng.normal(size=(256, 256)).astype(np.float32)
    b = rng.normal(size=(256, 256)).astype(np.float32)
    out = matmul.pallas_matmul(
        jnp.asarray(a, jnp.bfloat16),
        jnp.asarray(b, jnp.bfloat16),
        out_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(out), a @ b, rtol=2e-2, atol=0.5)


def test_matmul_supported_gates():
    assert matmul.supported((512, 512), (512, 512), jnp.float32)
    assert not matmul.supported((512,), (512,), jnp.float32)
    assert not matmul.supported((64, 64), (64, 64), jnp.float32)
    assert not matmul.supported((512, 512), (512, 512), jnp.float64)


@pytest.mark.parametrize("kind", ["sum", "max", "min"])
def test_pallas_reduce(kind, rng):
    x = rng.normal(size=(5000,)).astype(np.float32)
    out = reduction.pallas_reduce(jnp.asarray(x), kind)
    expected = {"sum": np.sum, "max": np.max, "min": np.min}[kind](
        x.astype(np.float64)
    )
    np.testing.assert_allclose(float(out), expected, rtol=1e-5)


def test_pallas_reduce_2d_unaligned(rng):
    x = rng.normal(size=(37, 41)).astype(np.float32)
    out = reduction.pallas_reduce(jnp.asarray(x), "sum")
    np.testing.assert_allclose(float(out), x.astype(np.float64).sum(), rtol=1e-5)


def test_reduce_2d_block_rows_sublane_aligned():
    """Budget-bound row blocks must round down to the dtype's sublane size
    (Mosaic rejects partial-sublane blocks on real TPU — round-3 advisor):
    f32 c=40000 binds the budget at br=13 → must plan 8; bf16 c=50000 binds
    at br=15 < one 16-row sublane → must fall back to the 1-D path."""
    br = reduction._block_rows_2d(100, 40000, jnp.float32, 512)
    assert br == 8
    assert reduction._block_rows_2d(100, 50000, jnp.bfloat16, 512) is None
    # Whole-array blocks may equal the row count even when unaligned.
    assert reduction._block_rows_2d(13, 128, jnp.float32, 512) == 13
    # Unbound budget keeps the requested block_rows (a sublane multiple).
    assert reduction._block_rows_2d(4096, 512, jnp.float32, 512) == 512


def test_reduce_2d_budget_bound_matches_oracle(rng):
    # End-to-end through the budget-bound planner path (br < r, rounded).
    x = rng.normal(size=(20, 40000)).astype(np.float32)
    out = reduction.pallas_reduce(jnp.asarray(x), "sum")
    np.testing.assert_allclose(float(out), x.astype(np.float64).sum(), rtol=1e-5)


def test_pallas_dot1d(rng):
    a = rng.normal(size=(3333,)).astype(np.float32)
    b = rng.normal(size=(3333,)).astype(np.float32)
    out = reduction.pallas_dot1d(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(
        float(out), np.dot(a.astype(np.float64), b.astype(np.float64)), rtol=1e-5
    )


def test_dot1d_matches_reference_pattern(rng):
    # product.h:74-116 parity case: float dot over a large flat array.
    a = rng.normal(size=(100_000,)).astype(np.float32)
    b = rng.normal(size=(100_000,)).astype(np.float32)
    out = reduction.pallas_dot1d(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(
        float(out),
        np.dot(a.astype(np.float64), b.astype(np.float64)),
        rtol=1e-4,
    )
