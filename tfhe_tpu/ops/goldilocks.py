"""Goldilocks-prime (p = 2^64 - 2^32 + 1) arithmetic and negacyclic NTT.

This is the TPU-native analog of the reference's NTT64 arithmetic model
(``tfhe/src/core_crypto/commons/math/ntt/ntt64.rs:166-260`` — the HPU/FPGA
backend's arithmetic), used by the *BNF* ("bridge to NTT-friendly") PBS
flavor (``core_crypto/algorithms/lwe_programmable_bootstrapping/
ntt64_bnf_pbs.rs:174-260``): ciphertexts stay on the native power-of-two
modulus 2^64; only the polynomial-multiplication transform domain moves to
the prime field.

Why this beats the 4-prime CRT path (ops/ntt.py) on TPU:

- ONE transform per polynomial instead of four (the CRT path needs exact
  integer convolution, bounded by ~2^99 for 2_2 parameters, hence 4 x 30-bit
  primes; the BNF path *wraps mod p* — torus arithmetic in Z_p is correct
  under wrapping, like the reference's approximate f64 FFT);
- no Garner CRT reconstruction (measured 45% of the round-2 kernel step);
- the multiplicative order of 2 mod p is 192, so every G-th root of unity
  with G | 64 is a *power of two* — four-step group-stage twiddle
  multiplications become shift-and-fold, with zero integer multiplies;
- the modulus switches at the field boundary are almost free:
  2^64/p = 1 + (2^32-1)/p, so torus(x) = x + (x >> 32) up to error <= 2.

Error model (vs the exact CRT path): the BSK coefficients are rounded once
into Z_p (error <= 0.5 torus units per coefficient — compare the reference
f64 FFT's ~2^11-unit products at N=2048), and each external-product output
coefficient takes a <= 2-unit switch-back error. Accumulated over n ~ 866
blind-rotation steps this contributes noise of std ~2^30, vs the >= 2^48
PBS output noise at production parameters: negligible (tested statistically
in tests/test_goldilocks.py).

All jnp helpers here are exact mod p, vectorized over leading axes, and
operate on canonical uint64 representatives (values < p) unless noted.
They are the *oracle twin* of the fused Pallas v5 kernel: the kernel uses
lazy representatives internally but canonicalizes at the same points, so
per-step accumulator outputs are bit-identical.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

P = (1 << 64) - (1 << 32) + 1
EPS = (1 << 32) - 1  # 2^64 mod P;  2^96 = -1 mod P
GEN = 7  # generator of the multiplicative group (order p-1 = 2^32*(2^32-1))
ORDER2 = 192  # multiplicative order of 2 mod P

_U64 = jnp.uint64
_M32 = (1 << 32) - 1


def _u64(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=_U64)


def gcanon(x: jnp.ndarray) -> jnp.ndarray:
    """Any u64 representative -> canonical value mod P (valid for ALL u64:
    2p > 2^64, so one conditional subtract suffices)."""
    return jnp.where(x >= _U64(P), x - _U64(P), x)


def gadd(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a + b) mod P for canonical a, b; canonical output."""
    s = a + b
    # on u64 wrap the true value is s + 2^64 = s + EPS (mod P); a,b < p means
    # s_true < 2p < 2^65 so at most one wrap, and s + EPS cannot re-wrap to
    # >= p undetected: fold then canonicalize
    s = jnp.where(s < a, s + _U64(EPS), s)
    return gcanon(s)


def gsub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b) mod P for canonical a, b; canonical output."""
    d = a - b
    return jnp.where(a < b, d - _U64(EPS), d)  # -2^64 = -EPS (mod P)


def gneg(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(a == _U64(0), a, _U64(P) - a)


def _reduce128(hi: jnp.ndarray, lo: jnp.ndarray) -> jnp.ndarray:
    """(hi * 2^64 + lo) mod P -> canonical u64.

    Uses 2^64 = EPS and 2^96 = -1:  x = lo - hi_hi + EPS * hi_lo (mod P).
    """
    hi_hi = hi >> _U64(32)
    hi_lo = hi & _U64(_M32)
    t0 = lo - hi_hi
    t0 = jnp.where(lo < hi_hi, t0 - _U64(EPS), t0)  # borrow: -2^64 = -EPS
    t1 = hi_lo * _U64(EPS)  # < 2^64, exact
    t2 = t0 + t1
    t2 = jnp.where(t2 < t1, t2 + _U64(EPS), t2)  # carry: +2^64 = +EPS
    return gcanon(t2)


def gmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a * b) mod P, canonical output, for any u64 canonical inputs."""
    ah = a >> _U64(32)
    al = a & _U64(_M32)
    bh = b >> _U64(32)
    bl = b & _U64(_M32)
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    # 128-bit assemble: value = ll + (lh + hl) * 2^32 + hh * 2^64
    mid = lh + hl
    mid_carry = (mid < lh).astype(_U64)  # 2^96 weight -> hi += 2^32*carry
    lo = ll + (mid << _U64(32))
    lo_carry = (lo < ll).astype(_U64)
    hi = hh + (mid >> _U64(32)) + (mid_carry << _U64(32)) + lo_carry
    return _reduce128(hi, lo)


def gpow(a: int, e: int) -> int:
    return pow(int(a), int(e), P)


def torus_to_field(b: jnp.ndarray) -> jnp.ndarray:
    """Modulus-switch a torus value mod 2^64 into Z_p: round(b * P / 2^64).

    Error <= 0.5 torus-of-p units. This is the one-time BSK embedding
    (reference ``ntt64.rs:166`` modswitch_from_power_of_two_to_ntt_prime).
    """
    b = b.astype(_U64)
    # b_p = floor((b*P + 2^63) / 2^64) = b - r with
    # r = floor((b*EPS + 2^63 - 1) / 2^64)   (b*P = b*2^64 - b*EPS; the
    # half-up tie goes to the SMALLER r, hence the -1 in the bias)
    t = (b & _U64(_M32)) << _U64(32)  # low 64 bits of b * 2^32
    s = t + _U64((1 << 63) - 1)
    c1 = (s < t).astype(_U64)
    c2 = (s < b).astype(_U64)
    r = (b >> _U64(32)) + c1 - c2
    return gcanon(b - r)


def field_to_torus(x: jnp.ndarray) -> jnp.ndarray:
    """Switch a canonical Z_p value back to the 2^64 torus:
    t = x + (x >> 32), approximating round(x * 2^64 / p) within 2 units
    (this exact formula IS the spec — the Pallas kernel matches it bit for
    bit; reference analog ``ntt64.rs:184``)."""
    x = x.astype(_U64)
    return x + (x >> _U64(32))


def signed_to_field(d: jnp.ndarray) -> jnp.ndarray:
    """Exact embed of small signed integers (decomposition digits) into Z_p
    (reference ``ntt64.rs:221`` forward_from_decomp)."""
    d64 = d.astype(jnp.int64)
    return jnp.where(d64 < 0, _U64(P) + d64.astype(_U64), d64.astype(_U64))


# ---------------------------------------------------------------------------
# plan: negacyclic NTT over Z_p with the v5 four-step frequency order
# ---------------------------------------------------------------------------

def _bitrev(x: int, bits: int) -> int:
    return int(format(x, f"0{bits}b")[::-1], 2) if bits else 0


@functools.lru_cache(maxsize=None)
class GoldilocksPlan:
    """Per-N tables. ``psi`` is the 2N-th root chosen so that the four-step
    group-DFT base omega_G = psi^(2N/G) is the power of two 2^(192/G)
    (possible whenever G = N/128 divides 64, since ord(2) = 192)."""

    def __init__(self, n: int):
        assert n >= 256 and n % 128 == 0 and n & (n - 1) == 0, n
        self.n = n
        self.log_n = n.bit_length() - 1
        G = n // 128
        assert G <= 64, "v5 shift-stage plan requires N <= 8192"
        self.G = G
        self.log_g = G.bit_length() - 1
        assert (P - 1) % (2 * n) == 0

        psi0 = gpow(GEN, (P - 1) // (2 * n))
        omega_g_target = gpow(2, ORDER2 // G) if G > 1 else 1
        # choose psi = psi0^t (t odd -> still primitive) with
        # psi^(2N/G) = omega_g_target
        zeta = gpow(psi0, 2 * n // G)  # primitive G-th root
        t_sol = None
        for t in range(1, 2 * G + 1, 2):
            if gpow(zeta, t) == omega_g_target:
                t_sol = t
                break
        assert t_sol is not None, "no odd dlog for the shift-stage root"
        self.psi = gpow(psi0, t_sol)
        self.omega = gpow(self.psi, 2)
        assert gpow(self.psi, n) == P - 1  # primitive: psi^N = -1
        if G > 1:
            assert gpow(self.psi, 2 * n // G) == omega_g_target

        # group-stage shift amounts: DIF stage s (sub-DFT size m = G >> s)
        # uses omega_m = 2^(192/m) -> twiddle j is a shift by (192/m)*j,
        # reduced to +/- 2^k with k < 96 via 2^96 = -1
        self.stage_shifts = []
        for s in range(self.log_g):
            m = G >> s
            base = ORDER2 // m
            rows = []
            for j in range(m >> 1):
                k = (base * j) % ORDER2
                neg = False
                if k >= 96:
                    k -= 96
                    neg = True
                rows.append((k, neg))
            self.stage_shifts.append(rows)

        # classic full-size tables (oracle path): twist + DIF stages
        psi_pows = np.zeros(n, dtype=np.uint64)
        acc = 1
        for j in range(n):
            psi_pows[j] = acc
            acc = acc * self.psi % P
        self.twist = psi_pows  # psi^j
        inv_psi = gpow(self.psi, 2 * n - 1)
        untwist = np.zeros(n, dtype=np.uint64)
        inv_n = gpow(n, P - 2)
        acc = inv_n
        for j in range(n):
            untwist[j] = acc
            acc = acc * inv_psi % P
        self.untwist = untwist  # psi^-j / N

        self.tw_fwd = []
        self.tw_inv = []
        for s in range(self.log_n):
            h = (n >> s) >> 1
            # stage s sub-size m = n >> s, omega_m = omega^(n/m)
            m = n >> s
            wm = gpow(self.omega, n // m)
            fwd = np.zeros(h, dtype=np.uint64)
            inv = np.zeros(h, dtype=np.uint64)
            wj, wji = 1, 1
            wmi = gpow(wm, P - 2)
            for j in range(h):
                fwd[j] = wj
                inv[j] = wji
                wj = wj * wm % P
                wji = wji * wmi % P
            self.tw_fwd.append(fwd)
            self.tw_inv.append(inv)

        # frequency permutation: classic DIF output position q holds
        # frequency bitrev_logN(q); v5 point (g, l) holds l + 128*bitrev_G(g)
        br = np.array([_bitrev(q, self.log_n) for q in range(n)])
        pos_of_freq = np.argsort(br)
        brg = np.array([_bitrev(g, self.log_g) for g in range(G)])
        freq_v5 = (np.arange(128)[None, :] + 128 * brg[:, None]).reshape(-1)
        self.perm_to_kernel = pos_of_freq[freq_v5]  # [N]: plan pos per (g,l)
        inv_perm = np.argsort(self.perm_to_kernel)
        self.perm_from_kernel = inv_perm


def get_plan_g(n: int) -> GoldilocksPlan:
    return GoldilocksPlan(n)


# ---------------------------------------------------------------------------
# oracle NTT (classic DIF mod P, jnp u64) + kernel-order views
# ---------------------------------------------------------------------------

def fwd_ntt(x: jnp.ndarray, plan: GoldilocksPlan) -> jnp.ndarray:
    """Negacyclic forward NTT mod P; ``x``: canonical u64[..., N].
    Output: canonical u64[..., N] in classic DIF (bit-reversed) order."""
    n = plan.n
    x = gmul(x, jnp.asarray(plan.twist))
    for s in range(plan.log_n):
        m = n >> s
        h = m >> 1
        xr = x.reshape(x.shape[:-1] + (n // m, m))
        a = xr[..., :h]
        b = xr[..., h:]
        w = jnp.asarray(plan.tw_fwd[s])
        u = gadd(a, b)
        v = gmul(gsub(a, b), w)
        x = jnp.concatenate([u, v], axis=-1).reshape(x.shape)
    return x


def inv_ntt(x: jnp.ndarray, plan: GoldilocksPlan) -> jnp.ndarray:
    """Inverse of :func:`fwd_ntt` (input in classic DIF order)."""
    n = plan.n
    for s in reversed(range(plan.log_n)):
        m = n >> s
        h = m >> 1
        xr = x.reshape(x.shape[:-1] + (n // m, m))
        u = xr[..., :h]
        v = xr[..., h:]
        w = jnp.asarray(plan.tw_inv[s])
        bw = gmul(v, w)
        a = gadd(u, bw)
        b = gsub(u, bw)
        x = jnp.concatenate([a, b], axis=-1).reshape(x.shape)
    return gmul(x, jnp.asarray(plan.untwist))


def fwd_ntt_kernel_order(x: jnp.ndarray, plan: GoldilocksPlan) -> jnp.ndarray:
    """u64[..., N] -> canonical u64[..., G, 128] in the v5 kernel's
    (group, lane) frequency order."""
    y = fwd_ntt(x, plan)
    y = y[..., jnp.asarray(plan.perm_to_kernel)]
    return y.reshape(y.shape[:-1] + (plan.G, 128))


def inv_ntt_kernel_order(y: jnp.ndarray, plan: GoldilocksPlan) -> jnp.ndarray:
    y = y.reshape(y.shape[:-2] + (plan.n,))
    return inv_ntt(y[..., jnp.asarray(plan.perm_from_kernel)], plan)


def negacyclic_polymul(a: jnp.ndarray, b: jnp.ndarray,
                       plan: GoldilocksPlan) -> jnp.ndarray:
    """Exact negacyclic product mod (X^N + 1, P) of canonical inputs."""
    return inv_ntt(gmul(fwd_ntt(a, plan), fwd_ntt(b, plan)), plan)


# ---------------------------------------------------------------------------
# BSK preparation + the jnp oracle blind rotation (BNF semantics)
# ---------------------------------------------------------------------------

def bootstrap_key_to_goldilocks(bsk: np.ndarray) -> jnp.ndarray:
    """Standard-domain BSK u64[n, l, R, R, N] (torus mod 2^64) ->
    kernel-order NTT-domain u32[n, 2, l*R, R, G, 128] (hi, lo planes).

    Each coefficient is modulus-switched into Z_p (round(b*P/2^64), error
    <= 0.5 torus units) then forward-transformed mod P — the one-time key
    embedding of the BNF scheme (``ntt64_bnf_pbs.rs:174``)."""
    bsk = jnp.asarray(bsk, dtype=_U64)
    nlwe, l, R, R2, N = bsk.shape
    plan = get_plan_g(N)
    bp = torus_to_field(bsk)
    hat = fwd_ntt_kernel_order(bp, plan)  # [n, l, R, R, G, 128]
    hat = hat.reshape(nlwe, l * R, R2, plan.G, 128)
    hi = (hat >> _U64(32)).astype(jnp.uint32)
    lo = hat.astype(jnp.uint32)
    return jnp.stack([hi, lo], axis=1)  # [n, 2, l*R, R, G, 128]


def bsk_g_merge(bsk_g: jnp.ndarray) -> jnp.ndarray:
    """[n, 2, lR, R, G, 128] u32 -> canonical u64 values (oracle use)."""
    hi = bsk_g[:, 0].astype(_U64)
    lo = bsk_g[:, 1].astype(_U64)
    return (hi << _U64(32)) | lo


def blind_rotate_goldilocks(
    lut: jnp.ndarray,
    msed_mask: jnp.ndarray,
    msed_body: jnp.ndarray,
    bsk_g: jnp.ndarray,
    base_log: int,
    levels: int,
) -> jnp.ndarray:
    """jnp oracle of the v5 Pallas kernel: blind rotation with external
    products computed mod P (BNF), accumulator mod 2^64.

    Bit-exact contract with the kernel: NTT-domain math is exact mod P, the
    inverse output is canonicalized, and the switch back to the torus is
    exactly ``x + (x >> 32)`` per coefficient.

    ``lut``: u64[B, R, N]; ``msed_mask``: u64[B, n] in [0, 2N);
    ``msed_body``: u64[B]; ``bsk_g``: u32[n, 2, l*R, R, G, 128].
    Returns u64[B, R, N].
    """
    from jax import lax

    from .decomp import decompose
    from .polynomial import monomial_div, monomial_mul

    N = lut.shape[-1]
    R = lut.shape[-2]
    plan = get_plan_g(N)
    nsteps = bsk_g.shape[0]
    bsk64 = bsk_g_merge(bsk_g)  # [n, lR, R, G, 128] canonical

    acc = monomial_div(lut, msed_body[..., None])

    def body_fn(i, acc):
        a_i = lax.dynamic_index_in_dim(msed_mask, i, axis=-1, keepdims=False)
        ct1 = monomial_mul(acc, a_i[..., None]) - acc
        digits = decompose(ct1, base_log, levels)  # [B, R, N, l]
        digits = jnp.moveaxis(digits, -1, -3)  # [B, l, R, N]
        dres = signed_to_field(digits)
        dhat = fwd_ntt_kernel_order(dres, plan)  # [B, l, R, G, 128]
        dhat = dhat.reshape(dhat.shape[0], levels * R, plan.G, 128)
        g_i = lax.dynamic_index_in_dim(bsk64, i, axis=0, keepdims=False)
        # MAC: out[c] = sum_j dhat[j] * g_i[j, c]
        out = None
        for j in range(levels * R):
            term = gmul(dhat[:, j, None], g_i[None, j])  # [B, R, G, 128]
            out = term if out is None else gadd(out, term)
        res = inv_ntt_kernel_order(out, plan)  # canonical [B, R, N]
        return acc + field_to_torus(res)

    return lax.fori_loop(0, nsteps, body_fn, acc)
