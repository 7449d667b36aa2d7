"""Complex dtype support (reference product.h:168-224 supports
complex<double> dot) and debug utilities."""

import jax.numpy as jnp
import numpy as np
import pytest

import simplemath_tpu as sm
from simplemath_tpu.utils import debug


def test_complex_array_ops():
    a = np.array([1 + 2j, 3 - 1j], dtype=np.complex128)
    b = np.array([2 - 1j, 1 + 1j], dtype=np.complex128)
    out = sm.Array(a) * sm.Array(b)
    np.testing.assert_allclose(np.asarray(out.jax()), a * b)
    out2 = sm.Array(a) + sm.Array(b)
    np.testing.assert_allclose(np.asarray(out2.jax()), a + b)


def test_complex_dot():
    # product.h:168-224: complex<double> dot with real/imag lane splitting;
    # here one dot_general call.
    a = np.array([1 + 2j, 3 - 1j, 0.5j], dtype=np.complex128)
    b = np.array([2 - 1j, 1 + 1j, -1.0], dtype=np.complex128)
    out = sm.Array(a) @ sm.Array(b)
    np.testing.assert_allclose(np.asarray(out.jax()), np.dot(a, b))


def test_assert_tree_finite():
    debug.assert_tree_finite({"x": jnp.ones(3)})
    with pytest.raises(FloatingPointError, match="non-finite"):
        debug.assert_tree_finite({"x": jnp.asarray([1.0, np.nan])})


def test_tree_norm():
    n = debug.tree_norm({"a": jnp.ones(4), "b": jnp.ones(4) * 2})
    np.testing.assert_allclose(n, np.sqrt(4 + 16), rtol=1e-6)


def test_nan_guard():
    safe = debug.nan_guard(lambda x: x * 2)
    np.testing.assert_allclose(np.asarray(safe(jnp.ones(3))), 2 * np.ones(3))
    bad = debug.nan_guard(lambda x: x / 0.0)
    with pytest.raises(Exception):
        bad(jnp.ones(3))


def test_interpret_kernels_context():
    from simplemath_tpu.config import config

    with debug.interpret_kernels():
        assert config.interpret_mode()
    # restored afterwards (None -> auto)
    assert config.pallas_interpret is None or isinstance(
        config.pallas_interpret, bool
    )
