"""Core-crypto algorithms: key generation, encryption, decryption.

Host-side (numpy) with the batched jnp NTT used for the polynomial algebra of
GLWE/GGSW encryption (random draws always come from the CSPRNG streams in a
fixed documented order, so results are deterministic for a given seed).

Reference algorithms mirrored (semantics, not code):
- lwe encryption:  ``core_crypto/algorithms/lwe_encryption.rs:67-120``
  (mask <- uniform public-coin stream, noise <- private-coin stream,
  body = <a, s> + pt + e, all wrapping)
- glwe encryption: ``glwe_encryption.rs:59-160``
- ggsw encryption: ``ggsw_encryption.rs:20-175`` (level matrices with factor
  -m * q/B^level; row i body += factor*s_i, last row += -factor)
- keyswitch keygen: ``lwe_keyswitch_key_generation.rs:160-199``
- bootstrap keygen: ``lwe_bootstrap_key_generation.rs`` (one GGSW per small
  LWE key bit, encrypted under the GLWE key)

Randomness consumption order (our contract; simpler than the reference's
fork-budget scheme but equally deterministic):
  per LWE ct:   n mask u64s, then 1 noise sample
  per GLWE ct:  k*N mask u64s, then N noise samples
  per GGSW:     rows in storage order (level-major), each a GLWE draw
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..utils.csprng import AesCtrGenerator, EncryptionRandomGenerator, SecretRandomGenerator
from ..utils.params import DynamicDistribution
from ..ops import ntt as ntt_mod
from ..ops.decomp import recomposition_summand
from .entities import (
    GlweSecretKey,
    LweBootstrapKey,
    LweKeyswitchKey,
    LweSecretKey,
    NttLweBootstrapKey,
)

_U64 = np.uint64
_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


# ---------------------------------------------------------------------------
# secret keys
# ---------------------------------------------------------------------------

def gen_lwe_secret_key(dim: int, gen: SecretRandomGenerator) -> LweSecretKey:
    return LweSecretKey(gen.uniform_binary(dim))


def gen_glwe_secret_key(glwe_dim: int, poly_size: int, gen: SecretRandomGenerator) -> GlweSecretKey:
    return GlweSecretKey(gen.uniform_binary(glwe_dim * poly_size).reshape(glwe_dim, poly_size))


# ---------------------------------------------------------------------------
# LWE encrypt / decrypt (vectorized numpy)
# ---------------------------------------------------------------------------

def lwe_encrypt(
    sk: LweSecretKey,
    plaintexts: np.ndarray,
    noise: DynamicDistribution,
    gen: EncryptionRandomGenerator,
) -> np.ndarray:
    """Encrypt a list of plaintexts; returns u64[m, n+1].

    Draw order matches the reference's per-ciphertext order (mask then noise),
    iterated ciphertext by ciphertext.
    """
    pts = np.atleast_1d(np.asarray(plaintexts, dtype=_U64))
    m = pts.shape[0]
    n = sk.dim
    # one draw per stream (mask & noise streams are independent, so batching
    # the draws yields the same bytes as per-ciphertext interleaving)
    masks = gen.mask.uniform_u64(m * n).reshape(m, n)
    es = gen.sample_noise(noise, m)
    with np.errstate(over="ignore"):
        dot = np.sum(masks * sk.bits[None, :], axis=1, dtype=_U64)
        body = dot + pts + es
    return np.concatenate([masks, body[:, None]], axis=1)


def lwe_encrypt32(
    sk: LweSecretKey,
    plaintexts: np.ndarray,
    noise: DynamicDistribution,
    gen: EncryptionRandomGenerator,
) -> np.ndarray:
    """LWE encryption over the u32 torus (the KS32 pattern's post-keyswitch
    modulus). Returns u64[m, n+1] holding u32 values."""
    m32 = _U64(0xFFFFFFFF)
    pts = np.atleast_1d(np.asarray(plaintexts, dtype=_U64)) & m32
    m = pts.shape[0]
    n = sk.dim
    masks = gen.mask.uniform_u64(m * n).reshape(m, n) & m32
    es = gen.sample_noise32(noise, m)
    with np.errstate(over="ignore"):
        dot = np.sum(masks * sk.bits[None, :], axis=1, dtype=_U64)
        body = (dot + pts + es) & m32
    return np.concatenate([masks, body[:, None]], axis=1)


def gen_keyswitch_key32(
    in_sk: LweSecretKey,
    out_sk: LweSecretKey,
    base_log: int,
    levels: int,
    noise: DynamicDistribution,
    gen: EncryptionRandomGenerator,
) -> LweKeyswitchKey:
    """KS32 keyswitch key: encrypts the big key's bits over the u32 torus
    (shortint/atomic_pattern/ks32.rs keygen; summands value << (32 - b*l))."""
    n_in = in_sk.dim
    data = np.zeros((n_in, levels, out_sk.dim + 1), dtype=_U64)
    with np.errstate(over="ignore"):
        for i in range(n_in):
            pts = np.zeros(levels, dtype=_U64)
            for j in range(levels):
                level = levels - j
                shift = np.uint64(32 - base_log * level)
                pts[j] = (_U64(in_sk.bits[i]) << shift) & _U64(0xFFFFFFFF)
            data[i] = lwe_encrypt32(out_sk, pts, noise, gen)
    return LweKeyswitchKey(data, base_log, levels)


def lwe_decrypt(sk: LweSecretKey, cts: np.ndarray) -> np.ndarray:
    """Raw plaintexts (noise included): b - <a, s> (lwe_encryption.rs:519)."""
    cts = np.atleast_2d(np.asarray(cts, dtype=_U64))
    n = sk.dim
    with np.errstate(over="ignore"):
        dot = np.sum(cts[:, :n] * sk.bits[None, :], axis=1, dtype=_U64)
        return cts[:, n] - dot


def lwe_trivial(n: int, plaintexts: np.ndarray) -> np.ndarray:
    """Trivial (noiseless, maskless) encryption — reference
    ``lwe_encryption.rs`` trivial encrypt."""
    pts = np.atleast_1d(np.asarray(plaintexts, dtype=_U64))
    out = np.zeros((pts.shape[0], n + 1), dtype=_U64)
    out[:, n] = pts
    return out


# ---------------------------------------------------------------------------
# negacyclic polymul helper for key algebra (binary secret x uniform mask)
# ---------------------------------------------------------------------------

import functools


@functools.lru_cache(maxsize=None)
def _binary_polymul_fn(n: int, num_primes: int, batch_rank: int):
    import jax
    import jax.numpy as jnp

    plan = ntt_mod.get_plan(n, num_primes)

    @jax.jit
    def f(s_bits_i64, masks_u64):
        k = s_bits_i64.shape[0]
        s_hat = plan.fwd(s_bits_i64)  # [P, k, N]
        s_hat = s_hat.reshape((plan.num_primes,) + (1,) * batch_rank + (k, n))
        a_hat = plan.fwd(masks_u64)  # [P, ..., k, N]
        prod = plan.pointwise_mul(a_hat, s_hat)
        p = jnp.asarray(plan.p_arr).reshape(
            (plan.num_primes,) + (1,) * (prod.ndim - 2)
        )
        acc = jnp.sum(prod, axis=-2) % p  # sum over k (values < k*p fits u64)
        return plan.reconstruct_u64(plan.inv(acc))

    return f


def _binary_polymul_batch_np(s_bits: np.ndarray,
                             masks: np.ndarray) -> np.ndarray:
    """Exact numpy twin of :func:`_binary_polymul_batch` for the thin
    client (tfhe_tpu.client runs with JAX absent): schoolbook negacyclic
    shift-and-add on the u64 ring — the key is binary, so each set bit j
    contributes ``a * X^j`` (roll with sign flip on the wrapped prefix).
    O(k * n^2 / 2) adds; CPK keygen/encrypt call this once per message
    batch at n <= 2048, well under a second on an edge device."""
    n = s_bits.shape[-1]
    k = s_bits.shape[0]
    masks = np.asarray(masks, dtype=_U64)
    batch = masks.shape[:-2]
    flat = masks.reshape((-1, k, n))
    out = np.zeros((flat.shape[0], n), dtype=_U64)
    with np.errstate(over="ignore"):
        for i in range(k):
            for j in np.nonzero(s_bits[i])[0]:
                rolled = np.roll(flat[:, i, :], int(j), axis=-1)
                if j:
                    rolled[:, :j] = np.uint64(0) - rolled[:, :j]
                out += rolled
    return out.reshape(batch + (n,))


def _binary_polymul_batch(s_bits: np.ndarray, masks: np.ndarray) -> np.ndarray:
    """sum_i s_i(X) * a_i(X) mod (X^N+1, 2^64) for a batch.

    ``s_bits``: u64[k, N] binary; ``masks``: u64[..., k, N].
    Returns u64[..., N]. Uses the CRT-NTT plan (binary * u64: 3 primes cover
    the 1 + 64 + log2(N) + log2(k) bit bound for N<=2^15, k<=4).
    Falls back to the exact numpy twin when JAX is absent (thin client).
    """
    try:
        import jax.numpy as jnp
    except ImportError:
        return _binary_polymul_batch_np(s_bits, masks)

    n = s_bits.shape[-1]
    k = s_bits.shape[0]
    batch_rank = masks.ndim - 2
    bound = ntt_mod.polymul_bound_bits(1, n, num_sums=k)
    num_primes = ntt_mod.min_primes_for_bound(bound)
    f = _binary_polymul_fn(n, num_primes, batch_rank)
    res = f(jnp.asarray(s_bits.astype(np.int64)), jnp.asarray(masks))
    return np.asarray(res, dtype=_U64)


# ---------------------------------------------------------------------------
# GLWE encrypt / decrypt
# ---------------------------------------------------------------------------

def glwe_encrypt(
    sk: GlweSecretKey,
    plaintext_polys: np.ndarray,
    noise: DynamicDistribution,
    gen: EncryptionRandomGenerator,
) -> np.ndarray:
    """Encrypt plaintext polynomial lists; u64[m, N] -> u64[m, k+1, N]."""
    pts = np.asarray(plaintext_polys, dtype=_U64)
    if pts.ndim == 1:
        pts = pts[None]
    m, n_poly = pts.shape
    k, N = sk.bits.shape
    assert n_poly == N
    masks = gen.mask.uniform_u64(m * k * N).reshape(m, k, N)
    noises = gen.sample_noise(noise, m * N).reshape(m, N)
    dot = _binary_polymul_batch(sk.bits, masks)  # [m, N]
    with np.errstate(over="ignore"):
        body = dot + pts + noises
    return np.concatenate([masks, body[:, None, :]], axis=1)


def glwe_decrypt(sk: GlweSecretKey, cts: np.ndarray) -> np.ndarray:
    """u64[m, k+1, N] -> raw plaintext polys u64[m, N]."""
    cts = np.asarray(cts, dtype=_U64)
    if cts.ndim == 2:
        cts = cts[None]
    k = sk.glwe_dim
    dot = _binary_polymul_batch(sk.bits, cts[:, :k, :])
    with np.errstate(over="ignore"):
        return cts[:, k, :] - dot


# ---------------------------------------------------------------------------
# keyswitch key generation
# ---------------------------------------------------------------------------

def gen_keyswitch_key(
    in_sk: LweSecretKey,
    out_sk: LweSecretKey,
    base_log: int,
    levels: int,
    noise: DynamicDistribution,
    gen: EncryptionRandomGenerator,
) -> LweKeyswitchKey:
    """KSK[i, j] = Enc_out(s_in_i * q / B^(levels - j))  — block index 0 holds
    the level=`levels` summand, aligning with the decomposition output order
    (reference lwe_keyswitch_key_generation.rs:175-190)."""
    n_in = in_sk.dim
    data = np.zeros((n_in, levels, out_sk.dim + 1), dtype=_U64)
    for i in range(n_in):
        pts = np.zeros(levels, dtype=_U64)
        for j in range(levels):
            level = levels - j
            pts[j] = recomposition_summand(np.asarray(in_sk.bits[i]), level, base_log)
        data[i] = lwe_encrypt(out_sk, pts, noise, gen)
    return LweKeyswitchKey(data, base_log, levels)


# ---------------------------------------------------------------------------
# GGSW + bootstrap key generation
# ---------------------------------------------------------------------------

def _ggsw_messages(
    sk: GlweSecretKey, cleartexts: np.ndarray, base_log: int, levels: int
) -> np.ndarray:
    """Message polynomials of GGSW rows for a vector of cleartexts.

    Returns u64[m, l, k+1, N]: level-matrix index j holds factor
    -m * q/B^(levels-j); row r message = factor * s_r, last row = -factor
    in the constant coefficient (ggsw_encryption.rs:20-44, 318-370).
    """
    k, N = sk.bits.shape
    m = cleartexts.shape[0]
    msgs = np.zeros((m, levels, k + 1, N), dtype=_U64)
    with np.errstate(over="ignore"):
        for j in range(levels):
            level = levels - j
            shift = np.uint64(64 - base_log * level)
            factor = ((_U64(0) - cleartexts.astype(_U64)) << shift)  # [m]
            for r in range(k):
                msgs[:, j, r] = sk.bits[r][None, :] * factor[:, None]
            msgs[:, j, k, 0] = _U64(0) - factor
    return msgs


def ggsw_encrypt(
    sk: GlweSecretKey,
    cleartext: int,
    base_log: int,
    levels: int,
    noise: DynamicDistribution,
    gen: EncryptionRandomGenerator,
) -> np.ndarray:
    """GGSW encryption of a small cleartext. Returns u64[l, k+1, k+1, N]."""
    k, N = sk.bits.shape
    msgs = _ggsw_messages(sk, np.array([cleartext], dtype=_U64), base_log, levels)
    rows = glwe_encrypt(sk, msgs.reshape(-1, N), noise, gen)
    return rows.reshape(levels, k + 1, k + 1, N)


def gen_bootstrap_key(
    in_sk: LweSecretKey,
    glwe_sk: GlweSecretKey,
    base_log: int,
    levels: int,
    noise: DynamicDistribution,
    gen: EncryptionRandomGenerator,
) -> LweBootstrapKey:
    """One GGSW (of the key bit) per input LWE key element
    (lwe_bootstrap_key_generation.rs). All rows are encrypted in one batched
    draw + one batched polynomial pass (row-major order over
    (key bit, level, row) for both streams)."""
    n = in_sk.dim
    k, N = glwe_sk.bits.shape
    msgs = _ggsw_messages(glwe_sk, in_sk.bits, base_log, levels)  # [n, l, k+1, N]
    rows = glwe_encrypt(glwe_sk, msgs.reshape(-1, N), noise, gen)
    data = rows.reshape(n, levels, k + 1, k + 1, N)
    return LweBootstrapKey(data, base_log, levels)


def bootstrap_key_to_ntt(bsk: LweBootstrapKey, num_primes: int) -> NttLweBootstrapKey:
    """Forward-transform every BSK polynomial (the analog of
    ``fill_with_forward_fourier``, fft64/crypto/bootstrap.rs:199)."""
    import jax
    import jax.numpy as jnp

    N = bsk.poly_size
    plan = ntt_mod.get_plan(N, num_primes)

    @jax.jit
    def fwd(x):
        res = plan.fwd(x)  # [P, n, l, k+1, k+1, N] residues < 2^30
        p = plan.p_like(res.ndim - 1)
        shoup = (res << jnp.uint64(32)) // p  # cold path: one division at keygen
        return jnp.stack([res, shoup]).astype(jnp.uint32)

    res = fwd(jnp.asarray(bsk.data))  # [2, P, n, l, k+1, k+1, N]
    return NttLweBootstrapKey(
        residues=res,
        base_log=bsk.base_log,
        levels=bsk.levels,
        num_primes=num_primes,
    )


def gen_multi_bit_bootstrap_key(
    in_sk: LweSecretKey,
    glwe_sk: GlweSecretKey,
    base_log: int,
    levels: int,
    grouping: int,
    noise: DynamicDistribution,
    gen: EncryptionRandomGenerator,
) -> LweBootstrapKey:
    """Multi-bit BSK: for each group of ``grouping`` small-key bits, GGSW
    encryptions of every nonempty subset product prod_{j in S} s_j
    (lwe_multi_bit_programmable_bootstrapping keygen; subset index v is the
    bitmask over the group, v = 1..2^g-1).

    Returns data u64[n/g, 2^g - 1, l, k+1, k+1, N].
    """
    n = in_sk.dim
    assert n % grouping == 0, "lwe_dimension must be divisible by grouping"
    ngroups = n // grouping
    nsub = (1 << grouping) - 1
    k, N = glwe_sk.bits.shape
    cleartexts = np.zeros((ngroups, nsub), dtype=_U64)
    for t in range(ngroups):
        bits = in_sk.bits[t * grouping : (t + 1) * grouping]
        for v in range(1, 1 << grouping):
            prod = 1
            for j in range(grouping):
                if (v >> j) & 1:
                    prod *= int(bits[j])
            cleartexts[t, v - 1] = prod
    msgs = _ggsw_messages(glwe_sk, cleartexts.reshape(-1), base_log, levels)
    rows = glwe_encrypt(glwe_sk, msgs.reshape(-1, N), noise, gen)
    data = rows.reshape(ngroups, nsub, levels, k + 1, k + 1, N)
    return LweBootstrapKey(data, base_log, levels)
