"""complex64 contractions on the MXU via real/imaginary splitting.

Reference analog: ``dot_product`` for ``complex<double>``
(/root/reference/include/math/product.h:168-224), which splits each SIMD
register into real/imag lanes and accumulates the four cross products.  TPU
hardware has no complex number type at all, so the TPU-native form splits at
the MATRIX level instead: a c64 contraction becomes THREE f32 MXU
contractions via the Gauss trick

    k1 = (ar + ai) @ br
    k2 = ar @ (bi - br)
    k3 = ai @ (br + bi)
    re = k1 - k3          # = ar@br - ai@bi
    im = k1 + k2          # = ar@bi + ai@br

(25% fewer MXU FLOPs than the naive four-product form; the elementwise
pre/post adds are HBM-cheap and fuse into the matmul epilogues).  The f32
component contractions follow the same measured routing as the real f32
path (ops/engine.py): XLA dot, HIGHEST precision below the big-matmul gate
so small/odd contractions are reference-exact, platform default above it.

Accuracy contract (round-4 advisor): Gauss's ``im = k1 + k2`` cancels two
O(|ar@br|) terms, so when one component dominates (|bi| << |br|) the SMALL
component's absolute error is ~eps*|dominant| — unbounded RELATIVE
componentwise error, a failure mode the reference's naive four-product
form (product.h:168-224) does not have.  Routing therefore follows the
precision contract: the BELOW-GATE/HIGHEST regime (small contractions,
reference-exact by policy) uses the naive four-product split, and only
the above-gate speed regime — where operands are already bf16-truncated
by the platform-default matmul, i.e. componentwise exactness is already
traded for speed — uses Gauss.  tests/test_complex_and_debug.py pins the
dominated-component case on both forms.

complex128 stays on the XLA CPU path (no f64 on TPU — documented divergence,
PARITY.md); this module is only routed for complex64.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gauss(contract, ar, ai, br, bi):
    k1 = contract(ar + ai, br)
    k2 = contract(ar, bi - br)
    k3 = contract(ai, br + bi)
    return jax.lax.complex(k1 - k3, k1 + k2)


def _naive(contract, ar, ai, br, bi):
    # Four products, no catastrophic cancellation on a dominated component
    # (each output component is a direct difference/sum of its own terms —
    # the reference's form, product.h:168-224).
    re = contract(ar, br) - contract(ai, bi)
    im = contract(ar, bi) + contract(ai, br)
    return jax.lax.complex(re, im)


def _split_fn(speed_regime: bool):
    """Naive 4-product in the reference-exact (below-gate / non-TPU)
    regime, Gauss 3-product in the above-gate TPU speed regime — where the
    platform-default matmul already bf16-truncates operands, so
    componentwise exactness is already traded for speed (module
    docstring)."""
    return _gauss if speed_regime else _naive


def _speed_regime(a_shape, b_shape) -> bool:
    from . import matmul as _mm

    return jax.default_backend() == "tpu" and _mm.supported(
        a_shape, b_shape, jnp.float32
    )


def _contract(kind: str, prec):
    if kind == "dot":
        return lambda x, y: jnp.dot(
            x, y, preferred_element_type=jnp.float32, precision=prec
        )
    return lambda x, y: jnp.matmul(
        x, y, preferred_element_type=jnp.float32, precision=prec
    )


def _precision(a_shape, b_shape):
    from . import engine

    _, prec = engine._fallback_precision(a_shape, b_shape, jnp.float32)
    return prec


def complex_dot(a, b):
    """``numpy.dot`` semantics for complex64 operands (any rank)."""
    from . import dispatch

    dispatch.record("matmul", "c64_dot")
    a = jnp.asarray(a, jnp.complex64)
    b = jnp.asarray(b, jnp.complex64)
    prec = _precision(a.shape, b.shape)
    return _split_fn(_speed_regime(a.shape, b.shape))(
        _contract("dot", prec), jnp.real(a), jnp.imag(a), jnp.real(b), jnp.imag(b)
    )


def complex_matmul(a, b):
    """``numpy.matmul`` semantics for complex64 operands."""
    from . import dispatch

    dispatch.record("matmul", "c64_mm")
    a = jnp.asarray(a, jnp.complex64)
    b = jnp.asarray(b, jnp.complex64)
    prec = _precision(a.shape, b.shape)
    return _split_fn(_speed_regime(a.shape, b.shape))(
        _contract("mm", prec), jnp.real(a), jnp.imag(a), jnp.real(b), jnp.imag(b)
    )
