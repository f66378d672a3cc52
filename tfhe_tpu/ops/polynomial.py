"""Negacyclic polynomial operations on the torus (mod X^N + 1, coeffs mod 2^64).

Vectorized over arbitrary leading batch dims; monomial degrees may differ per
batch element (the blind-rotation case).

Reference: ``tfhe/src/core_crypto/algorithms/polynomial_algorithms.rs``
(``polynomial_wrapping_monic_monomial_{mul,div}``,
``polynomial_wrapping_monic_monomial_mul_and_subtract``, schoolbook
``polynomial_wrapping_mul``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def monomial_mul(poly: jnp.ndarray, degree: jnp.ndarray) -> jnp.ndarray:
    """``out = poly * X^degree  (mod X^N + 1)`` with wrapping coeffs.

    ``poly``: uint64[..., N]; ``degree``: uint32/uint64 broadcastable to
    ``poly.shape[:-1]`` with values in [0, 2N).

    out[t] = poly[(t - d) mod N] * (-1)^{floor(((t - d) mod 2N) / N)}
    """
    n = poly.shape[-1]
    degree = jnp.asarray(degree, jnp.int64)
    t = jnp.arange(n, dtype=jnp.int64)
    # src index in [0, 2N)
    src = (t - degree[..., None]) % (2 * n)
    neg = src >= n
    src = jnp.where(neg, src - n, src)
    bshape = jnp.broadcast_shapes(degree.shape, poly.shape[:-1])
    src = jnp.broadcast_to(src, bshape + (n,))
    neg = jnp.broadcast_to(neg, bshape + (n,))
    gathered = jnp.take_along_axis(
        jnp.broadcast_to(poly, bshape + (n,)), src.astype(jnp.int64), axis=-1
    )
    return jnp.where(neg, -gathered, gathered)


def monomial_div(poly: jnp.ndarray, degree: jnp.ndarray) -> jnp.ndarray:
    """``out = poly * X^{-degree} (mod X^N + 1)`` — used to subtract the body
    during blind rotation (reference ``monic_monomial_div``)."""
    n = poly.shape[-1]
    degree = jnp.asarray(degree, jnp.int64)
    return monomial_mul(poly, (2 * n - degree) % (2 * n))


def monomial_mul_and_subtract(poly: jnp.ndarray, degree: jnp.ndarray) -> jnp.ndarray:
    """``poly * X^degree - poly`` — the fused first step of the cmux in blind
    rotation (reference polynomial_algorithms.rs
    ``polynomial_wrapping_monic_monomial_mul_and_subtract``)."""
    return monomial_mul(poly, degree) - poly


# ---------------------------------------------------------------------------
# Ground-truth schoolbook multiply (tests only; numpy, arbitrary precision)
# ---------------------------------------------------------------------------

def np_negacyclic_polymul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Exact negacyclic product mod 2^64 (wrapping uint64 arithmetic).

    Reference oracle: polynomial_algorithms.rs ``polynomial_wrapping_mul``.
    ``a`` may be signed (digits; cast wraps), ``b`` unsigned torus values.
    Computed as sum_i a_i * (b * X^i) — n wrapping numpy passes, exact because
    everything is mod 2^64.
    """
    n = a.shape[-1]
    assert b.shape[-1] == n
    a64 = np.asarray(a).astype(np.int64).astype(np.uint64).reshape(n)
    b64 = np.asarray(b).astype(np.uint64).reshape(n)
    out = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        shifted = b64.copy()
        for i in range(n):
            out += a64[i] * shifted
            # multiply by X: shift right one, wrap last coeff negated
            shifted = np.roll(shifted, 1)
            shifted[0] = np.uint64(0) - shifted[0]
        return out
