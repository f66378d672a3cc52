"""u128-torus core crypto for noise squashing (the 128-bit PBS).

The reference implements noise squashing with a dedicated f128 FFT
(``tfhe-fft/src/fft128``, ``core_crypto/fft_impl/fft128``) and u128 torus
entities. Here the u128 torus is a (hi, lo) pair of u64 arrays and the
polynomial products run over the same CRT-NTT machinery as the u64 path,
widened to a 6-prime budget (|coeff| of the external-product integer result
< 2^166 < prod(6 primes)/2).

Flow reproduced (shortint/noise_squashing/atomic_pattern/standard.rs:63-150,
server_key/mod.rs:1561-1610): keyswitch (caller) -> modulus switch -> blind
rotation over the u128 torus with a u128-GGSW bootstrap key -> sample
extract. Decomposition follows decomposer.rs semantics bit-for-bit, widened
to 128 bits.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any

import numpy as np

from ..ops import ntt as ntt_mod
from ..utils.csprng import EncryptionRandomGenerator
from ..utils.params import DynamicDistribution, NoiseSquashingParameters
from .entities import GlweSecretKey, LweSecretKey

_U64 = np.uint64


# ---------------------------------------------------------------------------
# (hi, lo) u64-pair helpers — work on numpy or jnp arrays alike
# ---------------------------------------------------------------------------

def add128(ahi, alo, bhi, blo):
    lo = alo + blo
    carry = (lo < alo).astype(lo.dtype)
    return ahi + bhi + carry, lo


def sub128(ahi, alo, bhi, blo):
    lo = alo - blo
    borrow = (alo < blo).astype(alo.dtype)
    return ahi - bhi - borrow, lo


def neg128(hi, lo):
    import jax.numpy as jnp

    z = jnp.zeros_like(lo) if not isinstance(lo, np.ndarray) else np.zeros_like(lo)
    return sub128(z, z, hi, lo)


def mul_u64_wide(a, b):
    """Full 128-bit product of u64 arrays -> (hi, lo) u64."""
    sh32 = _U64(32)
    m32 = _U64(0xFFFFFFFF)
    ah, al = a >> sh32, a & m32
    bh, bl = b >> sh32, b & m32
    t0 = al * bl
    t1 = al * bh
    t2 = ah * bl
    t3 = ah * bh
    mid = (t0 >> sh32) + (t1 & m32) + (t2 & m32)
    lo = (t0 & m32) | (mid << sh32)
    hi = t3 + (t1 >> sh32) + (t2 >> sh32) + (mid >> sh32)
    return hi, lo


# ---------------------------------------------------------------------------
# 128-bit signed gadget decomposition (decomposer.rs widened to 128 bits)
# ---------------------------------------------------------------------------

def decompose128(hi, lo, base_log: int, level_count: int):
    """Balanced signed digits of u128 (hi, lo) jnp arrays.

    Returns int64[..., level_count] with the level ``level_count`` digit
    first (same order as :func:`tfhe_tpu.ops.decomp.decompose`). Requires
    64 < base_log * level_count <= 126 (the noise-squashing regime,
    e.g. 24 * 3 = 72).
    """
    import jax.numpy as jnp

    rep = base_log * level_count
    assert 0 < rep <= 126, rep
    non_rep = 128 - rep
    hi = jnp.asarray(hi, jnp.uint64)
    lo = jnp.asarray(lo, jnp.uint64)
    if rep <= 63:
        # Small representable width (e.g. the squashed-list packing KS,
        # base 61 x level 1): the rounded state fits one u64 limb, so this
        # reduces to the u64 decomposer applied to x >> 64 with a 128-bit
        # shift origin (decomposer.rs init_decomposer_state semantics).
        res = hi >> jnp.uint64(non_rep - 1 - 64)  # x >> (non_rep-1)
        rounding = res & jnp.uint64(1)
        res = (res + jnp.uint64(1)) >> jnp.uint64(1)
        res = res & jnp.uint64((1 << rep) - 1)
        shifted_random = rounding << jnp.uint64(rep - 1)
        need_balance = ((((res - jnp.uint64(1)) | shifted_random) & res)
                        >> jnp.uint64(rep - 1))
        state = (res - (need_balance << jnp.uint64(rep))).astype(jnp.int64)
        digits = []
        mod_b_mask = jnp.int64((1 << base_log) - 1)
        for _ in range(level_count):
            r = state & mod_b_mask
            state = state >> base_log
            carry = (((r - jnp.int64(1)) | state) & r) >> (base_log - 1)
            state = state + carry
            digits.append(r - (carry << base_log))
        return jnp.stack(digits, axis=-1)
    s = non_rep - 1  # in [1, 63]
    # res = x >> (non_rep - 1): (rep+1)-bit value on the pair
    res_lo = (lo >> jnp.uint64(s)) | (hi << jnp.uint64(64 - s))
    res_hi = hi >> jnp.uint64(s)
    rounding = res_lo & jnp.uint64(1)
    # res = (res + 1) >> 1
    res_lo2 = res_lo + jnp.uint64(1)
    res_hi2 = res_hi + (res_lo2 == 0).astype(jnp.uint64)
    res_lo = (res_lo2 >> jnp.uint64(1)) | (res_hi2 << jnp.uint64(63))
    res_hi = res_hi2 >> jnp.uint64(1)
    # mod 2^rep
    res_hi = res_hi & jnp.uint64((1 << (rep - 64)) - 1)
    # need_balance bit trick at bit rep-1 (lives in the hi limb)
    top = rep - 1 - 64
    shifted_rand_hi = rounding << jnp.uint64(top)
    m1_lo = res_lo - jnp.uint64(1)
    m1_hi = res_hi - (res_lo == 0).astype(jnp.uint64)
    need_balance = (((m1_hi | shifted_rand_hi) & res_hi) >> jnp.uint64(top)) & jnp.uint64(1)
    # state = res - (need_balance << rep): two's complement on the pair
    st_hi = res_hi - (need_balance << jnp.uint64(rep - 64))
    st_lo = res_lo
    digits = []
    mod_b = jnp.uint64((1 << base_log) - 1)
    for _ in range(level_count):
        res = st_lo & mod_b  # digit candidate (unsigned low bits)
        # state >>= base_log (arithmetic shift of the signed pair)
        st_lo = (st_lo >> jnp.uint64(base_log)) | (st_hi << jnp.uint64(64 - base_log))
        st_hi = jnp.asarray(
            st_hi.astype(jnp.int64) >> base_log, jnp.uint64
        )  # arithmetic
        carry = (((res - jnp.uint64(1)) | st_lo) & res) >> jnp.uint64(base_log - 1)
        carry = carry & jnp.uint64(1)
        st_lo2 = st_lo + carry
        st_hi = st_hi + (st_lo2 < st_lo).astype(jnp.uint64)
        st_lo = st_lo2
        d = res.astype(jnp.int64) - (carry << jnp.uint64(base_log)).astype(jnp.int64)
        digits.append(d)
    return jnp.stack(digits, axis=-1)


# ---------------------------------------------------------------------------
# entities
# ---------------------------------------------------------------------------

@dataclass
class GlweSecretKey128:
    """Binary GLWE secret key used over the u128 torus (bits are bits;
    only the torus width differs)."""

    bits: np.ndarray  # u64[k, N] in {0,1}

    @property
    def glwe_dim(self):
        return self.bits.shape[0]

    @property
    def poly_size(self):
        return self.bits.shape[1]

    def as_lwe_bits(self) -> np.ndarray:
        return self.bits.reshape(-1)


@dataclass
class LweBootstrapKey128:
    hi: np.ndarray  # u64[n, l, R, R, N]
    lo: np.ndarray
    base_log: int
    levels: int


@dataclass
class NttLweBootstrapKey128:
    residues: Any  # u32[P, n, l, R, R, N]
    base_log: int
    levels: int
    num_primes: int


# ---------------------------------------------------------------------------
# keygen / encrypt / decrypt over the u128 torus (host side)
# ---------------------------------------------------------------------------

def num_primes_for_squash(params: NoiseSquashingParameters) -> int:
    bound = ntt_mod.polymul_bound_bits(
        params.decomp_base_log,
        params.polynomial_size,
        num_sums=params.decomp_level_count * params.glwe_size,
        torus_bits=128,
    )
    return ntt_mod.min_primes_for_bound(bound)


def _crt_polymul_int(s_bits: np.ndarray, polys: np.ndarray, n_primes: int = 4):
    """Exact negacyclic s (binary) x polys (u64) as a 128-bit result
    (hi, lo). Negacyclic wrap terms subtract, so the true coefficients are
    signed with |coeff| < N * 2^64 << prod(primes)/2 — reconstructed with
    the standard sign correction, reduced mod 2^128."""
    import jax
    import jax.numpy as jnp

    N = polys.shape[-1]
    plan = ntt_mod.get_plan(N, n_primes)

    @jax.jit
    def f(bits_i64, m):
        s_hat = plan.fwd(bits_i64)  # [P, N]
        m_hat = plan.fwd(m)  # [P, m, N]
        s_hat = s_hat.reshape((plan.num_primes,) + (1,) * (m.ndim - 1) + (N,))
        prod = plan.pointwise_mul(s_hat, m_hat)
        residues = plan.inv(prod)  # [P, ..., N]
        return _reconstruct128(plan, residues)

    return f(jnp.asarray(s_bits.astype(np.int64)), jnp.asarray(polys))


def _binary_dot128(sk_bits: np.ndarray, mask_hi: np.ndarray, mask_lo: np.ndarray):
    """<s, mask> over Z_{2^128}[X]/(X^N+1): sum_k s_k (*) mask_k.

    ``sk_bits``: u64[k, N]; masks u64[m, k, N] -> (hi, lo) u64[m, N].
    """
    m, k, N = mask_lo.shape
    hi_t = np.zeros((m, N), dtype=_U64)
    lo_t = np.zeros((m, N), dtype=_U64)
    with np.errstate(over="ignore"):
        for r in range(k):
            dhi, dlo = _crt_polymul_int(sk_bits[r], mask_lo[:, r, :])
            dhi = np.asarray(dhi, dtype=_U64)
            dlo = np.asarray(dlo, dtype=_U64)
            # + 2^64 * (s (*) mask_hi mod 2^64)
            from .algorithms import _binary_polymul_batch

            hi_part = _binary_polymul_batch(
                sk_bits[r : r + 1], mask_hi[:, r : r + 1, :]
            )
            hi_t, lo_t = add128(hi_t, lo_t, dhi + hi_part, dlo)
    return hi_t, lo_t


def sample_noise128(gen: EncryptionRandomGenerator, dist: DynamicDistribution, n: int):
    """Noise on the u128 torus. T-uniform bounds are < 2^62 so the value fits
    one u64 draw; sign-extend into the hi limb."""
    if dist.kind == "t_uniform":
        v = gen.noise.t_uniform_torus_u64(n, dist.bound_log2)  # signed-as-u64
        sv = v.astype(np.int64)
        hi = np.where(sv < 0, _U64(0xFFFFFFFFFFFFFFFF), _U64(0)).astype(_U64)
        return hi, v.astype(_U64)
    # gaussian on the u128 torus: the f64 samples carry <= 53 bits of
    # precision (same limitation as the reference's f64-pair sampling);
    # scale to 2^128 and split into limbs
    f = gen.noise.gaussian_pairs_f64((n + 1) // 2, dist.std_dev)[:n]
    scaled = np.ldexp(f, 128)
    hi_f = np.floor(np.ldexp(f, 64))
    lo_f = scaled - np.ldexp(hi_f, 64)  # in [0, 2^64)
    with np.errstate(over="ignore", invalid="ignore"):
        hi = hi_f.astype(np.int64).astype(_U64)
        lo = np.minimum(lo_f, np.nextafter(2.0**64, 0)).astype(_U64)
    return hi, lo


def glwe_encrypt128(
    sk: GlweSecretKey128,
    pts_hi: np.ndarray,
    pts_lo: np.ndarray,
    noise: DynamicDistribution,
    gen: EncryptionRandomGenerator,
):
    """u64[m, N] x2 -> (hi, lo) u64[m, k+1, N]."""
    m, N = pts_lo.shape
    k = sk.glwe_dim
    # mask: 16 bytes per coefficient, lo limb first (LE u128 convention)
    raw = gen.mask.uniform_u64(2 * m * k * N).reshape(m, k, N, 2)
    mask_lo = raw[..., 0].copy()
    mask_hi = raw[..., 1].copy()
    nhi, nlo = sample_noise128(gen, noise, m * N)
    nhi = nhi.reshape(m, N)
    nlo = nlo.reshape(m, N)
    dhi, dlo = _binary_dot128(sk.bits, mask_hi, mask_lo)
    with np.errstate(over="ignore"):
        bhi, blo = add128(dhi, dlo, pts_hi, pts_lo)
        bhi, blo = add128(bhi, blo, nhi, nlo)
    hi = np.concatenate([mask_hi, bhi[:, None, :]], axis=1)
    lo = np.concatenate([mask_lo, blo[:, None, :]], axis=1)
    return hi, lo


def glwe_decrypt128(sk: GlweSecretKey128, ct_hi: np.ndarray, ct_lo: np.ndarray):
    k = sk.glwe_dim
    dhi, dlo = _binary_dot128(sk.bits, ct_hi[:, :k, :], ct_lo[:, :k, :])
    with np.errstate(over="ignore"):
        return sub128(ct_hi[:, k, :], ct_lo[:, k, :], dhi, dlo)


def gen_bootstrap_key128(
    in_sk: LweSecretKey,
    glwe_sk: GlweSecretKey128,
    base_log: int,
    levels: int,
    noise: DynamicDistribution,
    gen: EncryptionRandomGenerator,
) -> LweBootstrapKey128:
    """GGSW(bit) per input key element over the u128 torus
    (lwe_bootstrap_key_generation.rs widened; factor q/B^level with
    q = 2^128)."""
    n = in_sk.dim
    k, N = glwe_sk.bits.shape
    R = k + 1
    msgs_hi = np.zeros((n, levels, R, N), dtype=_U64)
    msgs_lo = np.zeros((n, levels, R, N), dtype=_U64)
    bits = in_sk.bits.astype(_U64)
    with np.errstate(over="ignore"):
        for j in range(levels):
            level = levels - j
            shift = 128 - base_log * level  # >= 56 for squash params
            # factor = (-bit) << shift mod 2^128
            fh = np.zeros(n, dtype=_U64)
            fl = np.zeros(n, dtype=_U64)
            nb_hi = np.where(bits != 0, _U64(0xFFFFFFFFFFFFFFFF), _U64(0))
            nb_lo = (_U64(0) - bits).astype(_U64)
            if shift >= 64:
                fh = nb_lo << _U64(shift - 64)
            else:
                fl = nb_lo << _U64(shift)
                fh = (nb_hi << _U64(shift)) | (nb_lo >> _U64(64 - shift))
            for r in range(k):
                msgs_hi[:, j, r] = glwe_sk.bits[r][None, :] * fh[:, None]
                msgs_lo[:, j, r] = glwe_sk.bits[r][None, :] * fl[:, None]
                # bits are 0/1 so limb-wise product is exact
            msgs_hi[:, j, k, 0] = _U64(0) - fh - (fl != 0).astype(_U64)
            msgs_lo[:, j, k, 0] = _U64(0) - fl
    rows_hi, rows_lo = glwe_encrypt128(
        glwe_sk, msgs_hi.reshape(-1, N), msgs_lo.reshape(-1, N), noise, gen
    )
    return LweBootstrapKey128(
        hi=rows_hi.reshape(n, levels, R, R, N),
        lo=rows_lo.reshape(n, levels, R, R, N),
        base_log=base_log,
        levels=levels,
    )


def bootstrap_key128_to_ntt(
    bsk: LweBootstrapKey128, num_primes: int
) -> NttLweBootstrapKey128:
    import jax
    import jax.numpy as jnp

    N = bsk.hi.shape[-1]
    plan = ntt_mod.get_plan(N, num_primes)

    @jax.jit
    def fwd(hi, lo):
        p = plan.p_like(hi.ndim)
        c64 = jnp.asarray(
            [(1 << 64) % int(pp) for pp in plan.primes], jnp.uint64
        ).reshape(p.shape)
        r = (jnp.remainder(hi[None], p) * c64 + jnp.remainder(lo[None], p)) % p
        twist = plan._bcast(plan.twist, hi.ndim)
        twist_s = plan._bcast(plan.twist_shoup, hi.ndim)
        r = ntt_mod.shoup_mul(r, twist, twist_s, p)
        return plan._fwd_stages(r, p).astype(jnp.uint32)

    res = fwd(jnp.asarray(bsk.hi), jnp.asarray(bsk.lo))
    return NttLweBootstrapKey128(
        residues=res, base_log=bsk.base_log, levels=bsk.levels,
        num_primes=num_primes,
    )


# ---------------------------------------------------------------------------
# the 128-bit PBS (jnp device path)
# ---------------------------------------------------------------------------

def _monomial_mul128(hi, lo, degrees):
    """(hi, lo)[..., N] * X^degrees (negacyclic). The wrap negation is a
    128-bit two's-complement negation of the PAIR (limb-wise u64 negation
    would be wrong), so the permutation and the sign are applied here
    rather than via ops.polynomial.monomial_mul."""
    import jax.numpy as jnp

    n = hi.shape[-1]
    degree = jnp.asarray(degrees, jnp.int64)
    t = jnp.arange(n, dtype=jnp.int64)
    src = (t - degree[..., None]) % (2 * n)
    neg = src >= n
    src = jnp.where(neg, src - n, src)
    bshape = jnp.broadcast_shapes(degree.shape, hi.shape[:-1])
    src = jnp.broadcast_to(src, bshape + (n,)).astype(jnp.int64)
    neg = jnp.broadcast_to(neg, bshape + (n,))
    ghi = jnp.take_along_axis(jnp.broadcast_to(hi, bshape + (n,)), src, axis=-1)
    glo = jnp.take_along_axis(jnp.broadcast_to(lo, bshape + (n,)), src, axis=-1)
    nhi, nlo = neg128(ghi, glo)
    return jnp.where(neg, nhi, ghi), jnp.where(neg, nlo, glo)


def _monomial_div128(hi, lo, degrees):
    import jax.numpy as jnp

    n = hi.shape[-1]
    d = jnp.asarray(degrees, jnp.int64)
    return _monomial_mul128(hi, lo, (2 * n - d) % (2 * n))


def _reconstruct128(plan: ntt_mod.NegacyclicNtt, residues):
    """Garner CRT -> centered integer mod 2^128 as (hi, lo) u64 pairs."""
    import jax.numpy as jnp

    P = plan.num_primes
    ps = [jnp.uint64(p) for p in plan.primes]
    m = [residues[i] for i in range(P)]
    v = [m[0]]
    for i in range(1, P):
        pi = ps[i]
        acc = v[i - 1]
        for j in range(i - 2, -1, -1):
            acc = v[j] + ntt_mod.shoup_mul(
                acc, ps[j], jnp.uint64(plan.pj_shoup[i][j]), pi
            )
            # keep partial < 2 p_i for the next shoup round
            acc = jnp.where(acc >= jnp.uint64(2) * pi, acc - jnp.uint64(2) * pi, acc)
        # acc < 2 p_i (condsub above; or < p_i when the chain is empty), so
        # diff stays in (0, 4 p_i) — 4p < 2^32 for every prime in the set
        diff = jnp.uint64(3) * pi + m[i] - acc
        vi = ntt_mod.shoup_mul(
            diff,
            jnp.uint64(plan.garner_inv[i - 1]),
            jnp.uint64(plan.garner_inv_shoup[i - 1]),
            pi,
        )
        v.append(vi)
    hi = jnp.zeros_like(v[0])
    lo = jnp.zeros_like(v[0])
    pre = 1
    mask128 = (1 << 128) - 1
    for i in range(P):
        pw = pre & mask128
        thi, tlo = mul_u64_wide(v[i], jnp.uint64(pw & ((1 << 64) - 1)))
        thi = thi + v[i] * jnp.uint64(pw >> 64)
        hi, lo = add128(hi, lo, thi, tlo)
        pre *= int(plan.primes[i])
    full = pre & mask128
    nhi, nlo = sub128(hi, lo, jnp.uint64(full >> 64), jnp.uint64(full & ((1 << 64) - 1)))
    sign = v[P - 1] > jnp.uint64(plan.primes[P - 1] // 2)
    return jnp.where(sign, nhi, hi), jnp.where(sign, nlo, lo)


def external_product128(
    ggsw_res, acc_hi, acc_lo, base_log: int, levels: int, plan: ntt_mod.NegacyclicNtt
):
    """GGSW (NTT residues u32[P, l, R, R, N]) x GLWE128 -> GLWE128 delta."""
    import jax.numpy as jnp

    R = acc_hi.shape[-2]
    N = acc_hi.shape[-1]
    batch = acc_hi.shape[:-2]
    digits = decompose128(acc_hi, acc_lo, base_log, levels)  # [..., R, N, l]
    digits = jnp.moveaxis(digits, -1, -3)  # [..., l, R, N]
    dhat = plan.fwd_digits(digits)  # [P, ..., l, R, N]
    g = ggsw_res.astype(jnp.uint64).reshape(
        (plan.num_primes,) + (1,) * len(batch) + (levels, R, R, N)
    )
    p_full = plan.p_like(len(batch) + 4)
    prod = (dhat[..., None, :] * g) % p_full
    acc_hat = jnp.sum(prod, axis=(-4, -3)) % plan.p_like(len(batch) + 2)
    residues = plan.inv(acc_hat)
    return _reconstruct128(plan, residues)


def blind_rotate128(
    lut_hi, lut_lo, msed_mask, msed_body, bsk_res, base_log: int, levels: int,
    plan: ntt_mod.NegacyclicNtt,
):
    """u128 blind rotation; ``bsk_res``: u32[P, n, l, R, R, N]."""
    import jax.numpy as jnp
    from jax import lax

    n = bsk_res.shape[1]
    acc_hi, acc_lo = _monomial_div128(lut_hi, lut_lo, msed_body[..., None])

    def body_fn(i, carry):
        hi, lo = carry
        a_i = lax.dynamic_index_in_dim(msed_mask, i, axis=-1, keepdims=False)
        rhi, rlo = _monomial_mul128(hi, lo, a_i[..., None])
        d_hi, d_lo = sub128(rhi, rlo, hi, lo)
        ggsw = lax.dynamic_index_in_dim(bsk_res, i, axis=1, keepdims=False)
        ehi, elo = external_product128(ggsw, d_hi, d_lo, base_log, levels, plan)
        return add128(hi, lo, ehi, elo)

    return lax.fori_loop(0, n, body_fn, (acc_hi, acc_lo))


def sample_extract128(glwe_hi, glwe_lo, nth: int = 0):
    from ..ops.server import sample_extract

    return sample_extract(glwe_hi, nth), sample_extract(glwe_lo, nth)
