"""Seeded randomized oracle tests: sm ops vs NumPy over random shapes,
broadcast patterns, dtypes, views, and slices.

The reference's test strategy (SURVEY.md §4) is fixed-case unit tests only —
no fuzz/property tests anywhere.  This suite goes beyond it: every trial is
deterministic (seeded), so failures reproduce, but the case space (rank,
shape, broadcast dims, view composition, slice steps) is sampled instead of
hand-enumerated.  NumPy is the oracle throughout, matching the reference's
scalar-expression oracles (tests/add.cpp etc.).
"""

import numpy as np
import pytest

import simplemath_tpu as sm

TRIALS = 40


def _rand_shape(rng, max_rank=4, max_dim=6):
    rank = int(rng.integers(1, max_rank + 1))
    return tuple(int(rng.integers(1, max_dim + 1)) for _ in range(rank))


def _broadcast_variant(rng, shape):
    """A shape that broadcasts against `shape`: squash random dims to 1 and
    optionally drop leading dims (right-aligned NumPy broadcast)."""
    out = [d if rng.random() < 0.6 else 1 for d in shape]
    drop = int(rng.integers(0, len(out)))
    out = out[drop:]
    return tuple(out) if out else (1,)


def _make_operand(rng, shape, dtype):
    if np.issubdtype(dtype, np.integer):
        return rng.integers(-9, 10, size=shape).astype(dtype)
    return rng.normal(size=shape).astype(dtype)


_BINOPS = [
    ("add", lambda a, b: a + b),
    ("subtract", lambda a, b: a - b),
    ("multiply", lambda a, b: a * b),
    ("divide", lambda a, b: a / b),
]


@pytest.mark.parametrize("trial", range(TRIALS))
def test_fuzz_binary_broadcast(trial):
    rng = np.random.default_rng(1000 + trial)
    name, op = _BINOPS[trial % len(_BINOPS)]
    dtype = [np.float32, np.float64, np.int32][trial % 3]
    if name == "divide" and np.issubdtype(dtype, np.integer):
        dtype = np.float32  # int / is floor-divide territory; tested below
    xs = _rand_shape(rng)
    ys = _broadcast_variant(rng, xs)
    x = _make_operand(rng, xs, dtype)
    y = _make_operand(rng, ys, dtype)
    if name == "divide":
        y = np.where(np.abs(y) < 0.1, 1.0, y).astype(dtype)
    got = op(sm.Array(x), sm.Array(y)).numpy()
    want = op(x, y)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-6)


@pytest.mark.parametrize("trial", range(TRIALS))
def test_fuzz_views_and_slices(trial):
    """Random slice chains (steps, negatives, int-collapse) + transpose,
    then an op: the view must read and broadcast exactly like NumPy's."""
    rng = np.random.default_rng(2000 + trial)
    shape = _rand_shape(rng, max_rank=3, max_dim=7)
    x = rng.normal(size=shape).astype(np.float32)
    a = sm.Array(x)

    key = []
    for d in shape:
        r = rng.random()
        if r < 0.3:
            key.append(int(rng.integers(0, d)))  # INDEX-collapse
        elif r < 0.7:
            start = int(rng.integers(0, d))
            stop = int(rng.integers(start, d + 1))
            step = int(rng.choice([1, 1, 2, -1]))
            if step < 0:
                key.append(slice(None, None, -1))
            else:
                key.append(slice(start, stop, step))
        else:
            key.append(slice(None))
    key = tuple(key)
    v_np = x[key]
    v_sm = a[key]
    assert v_sm.shape == v_np.shape
    np.testing.assert_allclose(v_sm.numpy(), v_np)

    if v_np.ndim >= 2:
        # .T reverses ALL axes (NumPy / reference SMArray.h:121-136 semantics)
        np.testing.assert_allclose(v_sm.T.numpy(), v_np.T)
    if v_np.size:
        np.testing.assert_allclose((v_sm * 2.0).numpy(), v_np * 2.0, rtol=1e-6)


@pytest.mark.parametrize("trial", range(20))
def test_fuzz_setitem_writethrough(trial):
    """Random view writes must land exactly where NumPy lands them."""
    rng = np.random.default_rng(3000 + trial)
    shape = _rand_shape(rng, max_rank=3, max_dim=6)
    x = rng.normal(size=shape).astype(np.float32)
    a = sm.Array(x.copy())
    idx = tuple(int(rng.integers(0, d)) for d in shape)
    val = float(rng.normal())
    a[idx] = val
    want = x.copy()
    want[idx] = val
    np.testing.assert_allclose(a.numpy(), want)

    # slice write on axis 0
    if shape[0] > 1:
        b = sm.Array(x.copy())
        b[1:] = 0.0
        want2 = x.copy()
        want2[1:] = 0.0
        np.testing.assert_allclose(b.numpy(), want2)


@pytest.mark.parametrize("trial", range(20))
def test_fuzz_reductions_and_dot(trial):
    rng = np.random.default_rng(4000 + trial)
    shape = _rand_shape(rng, max_rank=3, max_dim=8)
    x = rng.normal(size=shape).astype(np.float32)
    a = sm.Array(x)
    np.testing.assert_allclose(float(a.sum().jax()), x.sum(), rtol=1e-4, atol=1e-5)
    ax = int(rng.integers(0, len(shape)))
    np.testing.assert_allclose(
        a.sum(axis=ax).numpy(), x.sum(axis=ax), rtol=1e-5, atol=1e-6
    )
    n = int(rng.integers(1, 64))
    u = rng.normal(size=n).astype(np.float32)
    v = rng.normal(size=n).astype(np.float32)
    got = (sm.Array(u) @ sm.Array(v)).jax()
    np.testing.assert_allclose(float(got), np.dot(u, v), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("trial", range(12))
def test_fuzz_int_floordiv_mod(trial):
    rng = np.random.default_rng(5000 + trial)
    shape = _rand_shape(rng, max_rank=2, max_dim=8)
    x = rng.integers(-20, 21, size=shape).astype(np.int32)
    y = rng.integers(1, 9, size=shape).astype(np.int32) * np.where(
        rng.random(size=shape) < 0.5, 1, -1
    ).astype(np.int32)
    np.testing.assert_array_equal(
        (sm.Array(x) // sm.Array(y)).numpy(), x // y
    )
    np.testing.assert_array_equal((sm.Array(x) % sm.Array(y)).numpy(), x % y)


class TestCompositeFuzz:
    """Round-5 composite fuzzer: random view chains feeding random op
    chains ending in random (axis) reductions, vs the NumPy oracle —
    crosses the view-plan, engine, lazy-queue, and axis-kernel layers in
    one property."""

    @pytest.mark.parametrize("seed", range(30))
    def test_views_ops_reductions(self, seed):
        rng = np.random.default_rng(1000 + seed)
        r, c = int(rng.integers(3, 60)), int(rng.integers(3, 60))
        A = rng.standard_normal((r, c)).astype(np.float32)
        a = sm.array(A)
        ref = A
        # random view step
        v = rng.integers(0, 3)
        if v == 0:
            a, ref = a.T, ref.T
        elif v == 1 and r > 2:
            a, ref = a[1:-1], ref[1:-1]
        # random op chain (2-4 ops)
        for _ in range(int(rng.integers(2, 5))):
            op = rng.integers(0, 5)
            if op == 0:
                B = rng.standard_normal(ref.shape).astype(np.float32)
                a, ref = a + sm.array(B), ref + B
            elif op == 1:
                s = float(rng.standard_normal())
                a, ref = a * s, ref * s
            elif op == 2:
                a, ref = sm.square(a), ref ** 2
            elif op == 3:
                a, ref = sm.abs(a), np.abs(ref)
            else:
                a, ref = sm.maximum(a, 0.1), np.maximum(ref, 0.1)
        # random reduction root
        red = rng.integers(0, 4)
        if red == 0:
            got, want = a.sum(axis=0), ref.sum(axis=0)
        elif red == 1:
            got, want = a.mean(axis=1), ref.mean(axis=1)
        elif red == 2:
            got, want = a.max(), ref.max()
        else:
            got, want = a, ref
        np.testing.assert_allclose(
            np.asarray(got), want, rtol=1e-4, atol=1e-4
        )
