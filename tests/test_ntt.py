"""NTT correctness: fwd/inv roundtrip, negacyclic polymul vs schoolbook.

Mirrors reference test gates: tfhe-ntt prime64/native64 tests and
BASELINE config 1 (roundtrip + negacyclic polymul vs schoolbook).

NOTE: test sizes are kept small and shapes shared — this CI box has one CPU
core and XLA compile time dominates; production sizes (N=2048) are exercised
by bench.py on the TPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tfhe_tpu.ops import ntt
from tfhe_tpu.ops.polynomial import np_negacyclic_polymul, monomial_mul, monomial_div


def test_fwd_inv_roundtrip():
    n = 256
    plan = ntt.get_plan(n, 5)
    rng = np.random.default_rng(1)
    # values below every prime so the roundtrip is the identity per prime
    x = rng.integers(0, 2**29, size=(3, n), dtype=np.uint64)
    back = plan.roundtrip_jit(jnp.asarray(x))
    # each prime's channel must reproduce x mod p
    for i, p in enumerate(plan.primes):
        np.testing.assert_array_equal(np.asarray(back[i]), x % np.uint64(p))


def test_negacyclic_polymul_vs_schoolbook():
    n = 256
    plan = ntt.get_plan(n, 5)
    rng = np.random.default_rng(2)
    # signed small "digits" times full torus values — the external-product shape
    a = rng.integers(-(2**22), 2**22, size=n, dtype=np.int64)
    b = rng.integers(0, 2**64, size=n, dtype=np.uint64)
    got = plan.polymul_u64_jit(jnp.asarray(a), jnp.asarray(b))
    want = np_negacyclic_polymul(a, b)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_polymul_monomials_and_wraparound():
    # exact oracle without schoolbook: a = X^d => negacyclic rotation.
    # Reuses the jitted polymul from the test above (same plan, same shapes).
    n = 256
    plan = ntt.get_plan(n, 5)
    rng = np.random.default_rng(5)
    b = rng.integers(0, 2**64, size=n, dtype=np.uint64)
    for d in [0, 1, n // 2, n - 1]:
        a = np.zeros(n, dtype=np.int64)
        a[d] = 1
        got = np.asarray(plan.polymul_u64_jit(jnp.asarray(a), jnp.asarray(b)))
        want = np.roll(b, d)
        if d:
            want[:d] = (-want[:d].astype(np.int64)).astype(np.uint64)
        np.testing.assert_array_equal(got, want)


def test_min_primes_for_bound():
    assert ntt.min_primes_for_bound(50) == 2
    assert ntt.min_primes_for_bound(98) == 4
    assert ntt.min_primes_for_bound(145) == 5


def test_monomial_mul_div():
    n = 16
    rng = np.random.default_rng(3)
    poly = rng.integers(0, 2**64, size=(2, n), dtype=np.uint64)
    for d in [0, 1, n - 1, n, n + 3, 2 * n - 1]:
        m = np.asarray(monomial_mul(jnp.asarray(poly), jnp.asarray([d, d])))
        # reference semantics: rotate right by d%n, negate wrapped-in coeffs,
        # global negate if (d//n) odd
        want = poly.copy()
        if (d // n) % 2 == 1:
            want = (-want.astype(np.int64)).astype(np.uint64)
        r = d % n
        want = np.roll(want, r, axis=-1)
        want[:, :r] = (-want[:, :r].astype(np.int64)).astype(np.uint64)
        np.testing.assert_array_equal(m, want)
        # div inverts mul
        back = np.asarray(monomial_div(jnp.asarray(m), jnp.asarray([d, d])))
        np.testing.assert_array_equal(back, poly)
