"""Exact negacyclic polynomial multiplication mod 2^64 via CRT-NTT.

The TPU-native replacement for the reference's f64 FFT path: polynomial
products over Z_{2^64}[X]/(X^N+1) are computed exactly with number-theoretic
transforms over a set of ~30-bit primes and CRT (Garner) reconstruction with
sign correction — the same mathematical scheme as the reference's
``tfhe-ntt`` ``native64::Plan32`` (``tfhe-ntt/src/native64.rs:16-140``,
prime constants ``tfhe-ntt/src/lib.rs:457-461``), chosen here because all
butterfly arithmetic fits 64-bit intermediates (and, in the optimized Pallas
path, u32 lanes with 16-bit limb products).

Modular arithmetic is division-free: every multiply against a known value
(twiddles, twist factors, Garner constants, NTT-domain key material) uses
Shoup's precomputed-quotient trick (reference ``tfhe-ntt/src/prime64/
shoup.rs`` and ``native64.rs:35-40`` mul_mod64):

    q = (a * w_shoup) >> 32        # w_shoup = floor(w * 2^32 / p)
    r = a*w - q*p;  r -= p if r >= p

valid for any a < 2^32 (result < p). Integer division/remainder never
appears in the hot path — on TPU, 64-bit integer division is catastrophically
slow while 64-bit multiplies lower to a few 32-bit MACs.

Transform structure: forward = Gentleman–Sande (DIF) stages, inverse = the
exact stage-by-stage unwind (CT butterflies with inverse twiddles, applied in
reverse stage order), so no bit-reversal permutation is ever materialized;
the pointwise (NTT) domain is the DIF output order. Negacyclic wrap is
handled by psi-twisting with a 2N-th root of unity.

Everything is vectorized over arbitrary leading batch dims and jittable.
"""

from __future__ import annotations

import functools
from typing import Sequence

try:
    import jax.numpy as jnp
except ImportError:  # thin-client (tfhe_tpu.client) environment: numpy-only paths
    jnp = None
import numpy as np

# The five ~30-bit NTT-friendly primes of tfhe-ntt native64::Plan32
# (tfhe-ntt/src/lib.rs:457-461), extended with six more primes of the same
# c*2^16 + 1 form for wider CRT budgets (the u128 noise-squashing path needs
# ~166 bits => 6 primes). p - 1 is divisible by 2^16 for each, so negacyclic
# transforms are supported for N up to 2^15. The first five stay in tfhe-ntt
# order so Plan32 parity fixtures remain valid.
PRIMES32: tuple[int, ...] = (
    0x3F5A0001,
    0x3F5D0001,
    0x3F760001,
    0x3F820001,
    0x3FAC0001,
    0x3FFC0001,
    0x3FED0001,
    0x3FDE0001,
    0x3FD20001,
    0x3FBB0001,
    0x3FB10001,
)


def _pow_mod(b: int, e: int, p: int) -> int:
    return pow(b, e, p)


def _find_generator(p: int) -> int:
    """Smallest generator of (Z/p)^* (p prime)."""
    factors = []
    m = p - 1
    d = 2
    while d * d <= m:
        if m % d == 0:
            factors.append(d)
            while m % d == 0:
                m //= d
        d += 1
    if m > 1:
        factors.append(m)
    for g in range(2, p):
        if all(_pow_mod(g, (p - 1) // f, p) != 1 for f in factors):
            return g
    raise ValueError("no generator found")


@functools.lru_cache(maxsize=None)
def _psi_root(p: int, order: int) -> int:
    """A primitive ``order``-th root of unity mod p."""
    assert (p - 1) % order == 0, (p, order)
    g = _find_generator(p)
    psi = _pow_mod(g, (p - 1) // order, p)
    assert _pow_mod(psi, order, p) == 1
    assert _pow_mod(psi, order // 2, p) != 1
    return psi


def min_primes_for_bound(bound_bits: float) -> int:
    """Smallest number of leading PRIMES32 whose product exceeds
    2^(bound_bits + 1) (factor 2 for the sign of the centered result)."""
    prod_bits = 0.0
    for i, p in enumerate(PRIMES32):
        prod_bits += np.log2(float(p))
        if prod_bits > bound_bits + 1:
            return i + 1
    raise ValueError(f"bound 2^{bound_bits} too large for available primes")


def polymul_bound_bits(
    operand_bits: int, n: int, num_sums: int = 1, torus_bits: int = 64
) -> float:
    """log2 bound on |coefficient| of sum of ``num_sums`` negacyclic products
    of (signed, < 2^operand_bits magnitude) x (unsigned, < 2^torus_bits)."""
    return operand_bits + torus_bits + np.log2(n) + np.log2(max(num_sums, 1))


def _shoup_np(w: np.ndarray, p: int) -> np.ndarray:
    """floor(w * 2^32 / p) for a table of constants (exact, python ints)."""
    flat = [int(x) for x in np.asarray(w, dtype=np.uint64).reshape(-1)]
    out = np.array([(x << 32) // p for x in flat], dtype=np.uint64)
    return out.reshape(np.asarray(w).shape)


def shoup_mul(a: jnp.ndarray, w, w_shoup, p) -> jnp.ndarray:
    """(a * w) mod p with Shoup's trick. Valid for any ``a`` < 2^32 and
    w < p; result in [0, p). All operands uint64."""
    q = (a * w_shoup) >> jnp.uint64(32)
    r = a * w - q * p
    return jnp.where(r >= p, r - p, r)


def cond_sub_ladder(x: jnp.ndarray, p, log_max: int) -> jnp.ndarray:
    """Reduce ``x`` < 2^log_max * p to [0, p) by conditional subtractions."""
    for k in reversed(range(log_max)):
        step = p << jnp.uint64(k)
        x = jnp.where(x >= step, x - step, x)
    return x


class NegacyclicNtt:
    """Per-(N, num_primes) transform plan. Tables are numpy at build time and
    become jit-time constants when used inside jitted functions."""

    def __init__(self, n: int, num_primes: int, primes: tuple = None):
        assert n & (n - 1) == 0, "N must be a power of two"
        self.n = n
        if primes is None:
            assert 2 <= num_primes <= len(PRIMES32)
            primes = PRIMES32[:num_primes]
        else:
            # custom prime set (e.g. the v6b sub-2^29 lazy-reduction pair,
            # ops/bnf2.py Bnf2Flavor): each must support the 2N-th root
            assert len(primes) == num_primes
            for p in primes:
                assert (p - 1) % (2 * n) == 0, (p, n)
        self.num_primes = num_primes
        self.primes = tuple(primes)
        self.log_n = n.bit_length() - 1
        P = num_primes

        psi = [_psi_root(p, 2 * n) for p in self.primes]
        omega = [(ps * ps) % p for ps, p in zip(psi, self.primes)]  # order N

        # twist tables: psi^j and psi^{-j} * N^{-1}
        self.twist = np.stack(
            [
                np.array([_pow_mod(ps, j, p) for j in range(n)], dtype=np.uint64)
                for ps, p in zip(psi, self.primes)
            ]
        )  # [P, N]
        self.untwist = np.stack(
            [
                np.array(
                    [
                        (_pow_mod(ps, 2 * n - j, p) * _pow_mod(n, p - 2, p)) % p
                        for j in range(n)
                    ],
                    dtype=np.uint64,
                )
                for ps, p in zip(psi, self.primes)
            ]
        )  # [P, N] — psi^{-j} * N^{-1}

        # Stage twiddles. Forward stage s has blocks of length m = N >> s,
        # half h = m/2, twiddle w_m^j for j in [0, h) with w_m = omega^(N/m).
        self.tw_fwd: list[np.ndarray] = []
        self.tw_inv: list[np.ndarray] = []
        for s in range(self.log_n):
            m = n >> s
            h = m >> 1
            fwd = np.zeros((P, h), dtype=np.uint64)
            inv = np.zeros((P, h), dtype=np.uint64)
            for pi, p in enumerate(self.primes):
                wm = _pow_mod(omega[pi], n // m, p)
                wm_inv = _pow_mod(wm, p - 2, p)
                wj = 1
                wj_inv = 1
                for j in range(h):
                    fwd[pi, j] = wj
                    inv[pi, j] = wj_inv
                    wj = (wj * wm) % p
                    wj_inv = (wj_inv * wm_inv) % p
            self.tw_fwd.append(fwd)
            self.tw_inv.append(inv)

        # Shoup duals of every constant table (per prime)
        def shoup_table(tbl: np.ndarray) -> np.ndarray:
            return np.stack(
                [_shoup_np(tbl[pi], p) for pi, p in enumerate(self.primes)]
            )

        self.twist_shoup = shoup_table(self.twist)
        self.untwist_shoup = shoup_table(self.untwist)
        self.tw_fwd_shoup = [shoup_table(t) for t in self.tw_fwd]
        self.tw_inv_shoup = [shoup_table(t) for t in self.tw_inv]

        self.p_arr = np.array(self.primes, dtype=np.uint64)  # [P]

        # Garner / CRT reconstruction constants
        # (semantics of tfhe-ntt native64.rs reconstruct_32bit_01234)
        ps = [int(p) for p in self.primes]
        self.garner_inv = []  # inverse of (p0*...*p_{i-1}) mod p_i
        for i in range(1, P):
            prod = 1
            for j in range(i):
                prod = (prod * ps[j]) % ps[i]
            self.garner_inv.append(pow(prod, ps[i] - 2, ps[i]))
        self.garner_inv_shoup = [
            (inv << 32) // ps[i + 1] for i, inv in enumerate(self.garner_inv)
        ]
        # p_j (< p_i) Shoup duals mod p_i for the Horner chain
        self.pj_shoup = [
            [(ps[j] << 32) // ps[i] for j in range(i)] for i in range(P)
        ]
        # prefix products mod 2^64 (wrapping)
        mask64 = (1 << 64) - 1
        self.prefix_mod64 = []  # [1, p0, p0p1, ...] (length P)
        acc = 1
        for i in range(P):
            self.prefix_mod64.append(acc & mask64)
            acc = (acc * ps[i]) & mask64
        self.full_prod_mod64 = acc & mask64

    # -- helpers ----------------------------------------------------------------
    def _bcast(self, tbl: np.ndarray, ndim_tail: int) -> jnp.ndarray:
        """[P, h] table -> [P, 1...,(ndim_tail-1) ones, h] jnp constant."""
        return jnp.asarray(tbl).reshape(
            (self.num_primes,) + (1,) * (ndim_tail - 1) + (tbl.shape[-1],)
        )

    def p_like(self, ndim_after_p: int) -> jnp.ndarray:
        return jnp.asarray(self.p_arr).reshape(
            (self.num_primes,) + (1,) * ndim_after_p
        )

    # -- forward ------------------------------------------------------------
    def fwd_digits(self, x: jnp.ndarray) -> jnp.ndarray:
        """Forward negacyclic NTT of *small signed* inputs (|x| < 2p, e.g.
        gadget-decomposition digits). Division-free.

        NB the bound is 2p, not p: base_log*levels = 31 decompositions
        produce |digit| <= 2^30, which exceeds the ~2^29.985 plan primes —
        one conditional add of p is not enough to make those non-negative
        (the Pallas kernels are immune: their offset int8 limb split is
        sign-agnostic).

        ``x``: int64[..., N] -> uint64 residues in [0, p), [P, ..., N].
        """
        n = self.n
        assert x.shape[-1] == n
        p = self.p_like(x.ndim)
        xs = x[None].astype(jnp.int64)
        pi = p.astype(jnp.int64)
        r = jnp.where(xs < 0, xs + pi, xs)
        r = jnp.where(r < 0, r + pi, r).astype(jnp.uint64)
        twist = self._bcast(self.twist, x.ndim)
        twist_s = self._bcast(self.twist_shoup, x.ndim)
        r = shoup_mul(r, twist, twist_s, p)
        return self._fwd_stages(r, p)

    def fwd(self, x: jnp.ndarray) -> jnp.ndarray:
        """Forward negacyclic NTT of u64 torus values (cold path: key
        transforms, generic polymul; uses one remainder for the initial
        reduction). int64 inputs are routed to :meth:`fwd_digits`."""
        if x.dtype == jnp.int64:
            return self.fwd_digits(x)
        n = self.n
        assert x.shape[-1] == n
        p = self.p_like(x.ndim)
        r = jnp.remainder(x[None].astype(jnp.uint64), p)
        twist = self._bcast(self.twist, x.ndim)
        twist_s = self._bcast(self.twist_shoup, x.ndim)
        r = shoup_mul(r, twist, twist_s, p)
        return self._fwd_stages(r, p)

    def _fwd_stages(self, r: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
        n = self.n
        lead = r.shape[:-1]
        for s in range(self.log_n):
            m = n >> s
            h = m >> 1
            rr = r.reshape(lead + (n // m, 2, h))
            a = rr[..., 0, :]
            b = rr[..., 1, :]
            w = self._bcast(self.tw_fwd[s], r.ndim)
            ws = self._bcast(self.tw_fwd_shoup[s], r.ndim)
            pp = p[..., None]
            u = a + b
            u = jnp.where(u >= pp, u - pp, u)
            v = shoup_mul(a - b + pp, w, ws, pp)
            r = jnp.stack([u, v], axis=-2).reshape(lead + (n,))
        return r

    # -- inverse ------------------------------------------------------------
    def inv(self, xhat: jnp.ndarray) -> jnp.ndarray:
        """Inverse transform, returning residues (mod each prime) of the
        *integer* result coefficients, shape [P, ..., N] uint64."""
        n = self.n
        p = self.p_like(xhat.ndim - 1)
        r = xhat
        lead = r.shape[:-1]
        for s in reversed(range(self.log_n)):
            m = n >> s
            h = m >> 1
            rr = r.reshape(lead + (n // m, 2, h))
            u = rr[..., 0, :]
            v = rr[..., 1, :]
            w = self._bcast(self.tw_inv[s], r.ndim)
            ws = self._bcast(self.tw_inv_shoup[s], r.ndim)
            pp = p[..., None]
            bw = shoup_mul(v, w, ws, pp)
            a = u + bw
            a = jnp.where(a >= pp, a - pp, a)
            b = u - bw + pp
            b = jnp.where(b >= pp, b - pp, b)
            r = jnp.stack([a, b], axis=-2).reshape(lead + (n,))
        untwist = self._bcast(self.untwist, xhat.ndim - 1)
        untwist_s = self._bcast(self.untwist_shoup, xhat.ndim - 1)
        return shoup_mul(r, untwist, untwist_s, p)

    # -- pointwise ----------------------------------------------------------
    def pointwise_mul(self, ahat: jnp.ndarray, bhat: jnp.ndarray) -> jnp.ndarray:
        """Generic (cold-path) pointwise product; hot paths use
        ``shoup_mul`` against precomputed key duals instead."""
        p = self.p_like(max(ahat.ndim, bhat.ndim) - 1)
        return (ahat * bhat) % p

    # -- CRT reconstruction ---------------------------------------------------
    def reconstruct_u64(self, residues: jnp.ndarray) -> jnp.ndarray:
        """Garner mixed-radix CRT with sign correction: maps residues of a
        centered integer x (|x| < prod(primes)/2) to x mod 2^64.

        Semantics: tfhe-ntt native64.rs ``reconstruct_32bit_01234``;
        division-free (Shoup duals of the Garner constants).
        ``residues``: uint64 [P, ...] -> uint64 [...].
        """
        P = self.num_primes
        ps = [jnp.uint64(p) for p in self.primes]
        m = [residues[i] for i in range(P)]
        v = [m[0]]
        for i in range(1, P):
            pi = ps[i]
            # inner = v0 + p0*(v1 + p1*(v2 + ...)) with each product reduced
            # mod p_i (Horner, innermost first). v_j < p_j < p_i so each
            # partial stays < 2*p_i < 2^31 — Shoup-safe.
            acc = v[i - 1]
            for j in range(i - 2, -1, -1):
                acc = v[j] + shoup_mul(
                    acc, ps[j], jnp.uint64(self.pj_shoup[i][j]), pi
                )
            diff = jnp.uint64(2) * pi + m[i] - acc  # < 3*p_i < 2^32
            vi = shoup_mul(
                diff,
                jnp.uint64(self.garner_inv[i - 1]),
                jnp.uint64(self.garner_inv_shoup[i - 1]),
                pi,
            )
            v.append(vi)
        # positive candidate mod 2^64 (wrapping)
        pos = jnp.zeros_like(v[0])
        for i in range(P):
            pos = pos + v[i] * jnp.uint64(self.prefix_mod64[i])
        neg = pos - jnp.uint64(self.full_prod_mod64)
        sign = v[P - 1] > jnp.uint64(self.primes[P - 1] // 2)
        return jnp.where(sign, neg, pos)

    # -- convenience ----------------------------------------------------------
    def polymul_u64(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Exact negacyclic product mod 2^64 of ``a`` (signed int64 small
        coefficients) and ``b`` (uint64), provided magnitudes fit the prime
        budget (see :func:`min_primes_for_bound`)."""
        ahat = self.fwd(a)
        bhat = self.fwd(b)
        chat = self.pointwise_mul(ahat, bhat)
        return self.reconstruct_u64(self.inv(chat))

    # cached jitted entry points (one compile per plan per shape)
    @functools.cached_property
    def polymul_u64_jit(self):
        import jax

        return jax.jit(self.polymul_u64)

    @functools.cached_property
    def roundtrip_jit(self):
        import jax

        return jax.jit(lambda v: self.inv(self.fwd(v)))


@functools.lru_cache(maxsize=None)
def get_plan(n: int, num_primes: int, primes: tuple = None) -> NegacyclicNtt:
    return NegacyclicNtt(n, num_primes, primes=primes)
