"""Pallas elementwise kernel (forced backend, interpret mode on CPU) vs the
NumPy oracle — the kernel-engine tests the reference runs implicitly through
its >100k-element broadcast suites (SURVEY §4)."""

import numpy as np
import pytest

import simplemath_tpu as sm
from simplemath_tpu.config import config
from simplemath_tpu.ops import elementwise


@pytest.fixture(autouse=True)
def force_pallas():
    old = config.kernel_backend
    config.kernel_backend = "pallas"
    yield
    config.kernel_backend = old


def test_contiguous_add(rng):
    a = rng.normal(size=(64, 256)).astype(np.float32)
    b = rng.normal(size=(64, 256)).astype(np.float32)
    out = sm.Array(a) + sm.Array(b)
    np.testing.assert_allclose(out.numpy(), a + b, rtol=1e-6)


def test_1d_add(rng):
    a = rng.normal(size=(1000,)).astype(np.float32)
    b = rng.normal(size=(1000,)).astype(np.float32)
    out = sm.Array(a) + sm.Array(b)
    np.testing.assert_allclose(out.numpy(), a + b, rtol=1e-6)


def test_broadcast_no_materialize(rng):
    # Stride-0 analog: (B, N, C) + (1, 1, C) — the small operand stays a
    # single block pinned to index 0.
    a = rng.normal(size=(4, 96, 130)).astype(np.float32)
    b = rng.normal(size=(1, 1, 130)).astype(np.float32)
    out = sm.Array(a) * sm.Array(b)
    np.testing.assert_allclose(out.numpy(), a * b, rtol=1e-6)


def test_image_broadcast_case(rng):
    # The reference's (32,224,224,3) ⊗ (1,224,1,3) suite shape, reduced
    # batch for CI speed.
    a = rng.normal(size=(2, 224, 224, 3)).astype(np.float32)
    b = rng.normal(size=(1, 224, 1, 3)).astype(np.float32)
    out = sm.Array(a) + sm.Array(b)
    np.testing.assert_allclose(out.numpy(), a + b, rtol=1e-6)


def test_unaligned_tail(rng):
    # Non-multiple-of-tile dims exercise boundary masking.
    a = rng.normal(size=(33, 257)).astype(np.float32)
    b = rng.normal(size=(33, 1)).astype(np.float32)
    out = sm.Array(a) - sm.Array(b)
    np.testing.assert_allclose(out.numpy(), a - b, rtol=1e-6)


def test_scalar_operand(rng):
    a = rng.normal(size=(40, 200)).astype(np.float32)
    out = sm.Array(a) * 2.5
    np.testing.assert_allclose(out.numpy(), a * 2.5, rtol=1e-6)


def test_int32(rng):
    a = rng.integers(-100, 100, size=(37, 129)).astype(np.int32)
    b = rng.integers(-100, 100, size=(37, 129)).astype(np.int32)
    out = sm.Array(a) * sm.Array(b)
    assert np.array_equal(out.numpy(), a * b)


def test_supported_gates():
    assert not elementwise.supported((), (np.float32,), np.float32)
    assert not elementwise.supported((4,), (np.float64,), np.float64)
    assert elementwise.supported((4, 4), (np.float32,), np.float32)
