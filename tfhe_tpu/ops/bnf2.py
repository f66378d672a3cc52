"""Two-prime BNF transform domain ("v6"): external products computed mod
q' = p0 * p1 (~2^60, the first two Plan32 primes) with the bootstrap key
rounded ONCE into Z_q' at key-prep time.

This generalizes the BNF ("bridge to NTT-friendly") idea of the reference's
NTT64 path (``core_crypto/algorithms/lwe_programmable_bootstrapping/
ntt64_bnf_pbs.rs:174-260``, ``commons/math/ntt/ntt64.rs:166-260``) from one
64-bit prime to a 2-prime CRT of 30-bit primes — the sweet spot for the TPU
VPU, whose lanes are 32-bit:

- the exact CRT path (v4, ops/pbs_kernel.py) needs FOUR 30-bit primes to
  bound the integer convolution (~2^99 for 2_2 parameters) and spends a
  measured 45% of the kernel step in the Garner reconstruction;
- the Goldilocks path (v5, ops/pbs_kernel_g.py) needs only ONE prime but
  pays (hi, lo) u32-pair carry arithmetic on every butterfly/MAC — measured
  0.95x of v4;
- v6 keeps v4's single-word u32 lane arithmetic AND the BNF semantics:
  TWO transforms per polynomial, a 2-term CRT merge, and a fixed-point
  multiply back to the 2^64 torus.

Arithmetic model (mirrors ntt64_bnf_pbs.rs):

- ciphertexts/accumulator stay mod 2^64;
- BSK coefficients are rescaled once: b' = round(b * q' / 2^64) in [0, q')
  (error <= 0.5 q'-units = 2^64/q' / 2 ~ 8 torus units per coefficient);
- gadget-decomposition digits are exact small signed integers, embedded
  mod each prime (offset-split int8 limbs, same kernel matmul as v4);
- the NTT mod p_i computes the integer convolution digits (*) b' mod p_i;
  the 2-term CRT merge yields it mod q' — exactly the wrap-around
  semantics we want, since (x mod q') * 2^64 / q' is consistent mod 2^64;
- the switch back to the torus is the fixed-point multiply
  t = floor(x * F / 2^60) with F = floor(2^124 / q') = 2^64 + g, computed
  as t = (x << 4) + ((x0*g1 + x1*g0) >> 28) + ((x1*g1) << 4) mod 2^64
  (the x0*g0 term is DROPPED: its contribution is < 16 torus units —
  this exact dropped-term formula IS the spec, mirrored bit-for-bit by
  the Pallas kernel).

Error budget at 2_2 production parameters (base_log 23, 1 level, k=1,
N=2048, n=866), PHASE level — mask-component errors ride a convolution
with the binary GLWE secret, amplifying per-unit variance by
(1 + k*N/2) = 1025 (empirically confirmed, tests/test_noise.py):

- BSK rescale: n * 1025 * (k+1)*l*N * (B^2/12) / (12 q'^2) ~= 2^-52.3
  variance -> std ~2^37.9 absolute;
- acc32 switch-back (``qp_to_torus32``, error std ~1.1 units of 2^32):
  n * 1025 * 1.27 * 2^-64 ~= 2^-43.9 variance -> std ~2^41 absolute.

Both are far below the >= 2^47 intrinsic PBS noise std and the 2^58
decryption margin (closed-form: ``core/noise_formulas.py``
``bnf_blind_rotate_extra_variance``, validated against empirical
variance in tests/test_noise.py; production decrypt sweeps in
tools/v6_tpu_check.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

from . import ntt as ntt_mod

_U64 = jnp.uint64
_M32 = (1 << 32) - 1

#: the two ~30-bit primes of the v6 domain (tfhe-ntt Plan32 order)
P0: int = ntt_mod.PRIMES32[0]
P1: int = ntt_mod.PRIMES32[1]
QP: int = P0 * P1  # ~2^59.97

#: CRT merge constant: p0^{-1} mod p1 (x = r0 + p0 * ((r1 - r0) * INV01))
INV01: int = pow(P0, P1 - 2, P1)
INV01_SH: int = (INV01 << 32) // P1

#: fixed-point switch-back: F = floor(2^124 / q') = 2^64 + G_CONST
G_CONST: int = (1 << 124) // QP - (1 << 64)
assert 0 < G_CONST < (1 << 60)
G1: int = G_CONST >> 32
G0: int = G_CONST & _M32

#: acc32 switch-back constant (``qp_to_torus32``): t1 = (v1 * C1T) >> 28
#: approximates v1 * p0 * 2^32 / q' = v1 * 2^32 / p1 (note p0*2^32/q' ==
#: 2^32/p1 exactly). v1 < P1 and C1T <= 2^60/P1 keep the product < 2^60.
C1T: int = (1 << 60) // P1
#: centering bias for the two dropped/truncated terms of qp_to_torus32
#: (the undershoot is in [0, ~7.5] units of 2^32; +4 centers it)
T32_BIAS: int = 4


class Bnf2Flavor:
    """A (p0, p1) prime pair plus every derived switch-back constant of the
    BNF arithmetic model, generalizing the module-level constants (which
    remain the DEFAULT ~30-bit flavor, bit-for-bit).

    The torus switch t = round(x * 2^64 / q') is computed as
    (x << S1) + cross-terms >> S2 with S1 = 64 - SHIFT, S2 = SHIFT - 32,
    SHIFT = ceil(log2 q'), F = floor(2^(64+SHIFT)/q') = 2^64 + G; the pair
    must satisfy F - 2^64 in (0, 2^60) (a ~0.09-bit window below each
    power of two). The DEFAULT pair has SHIFT=60 (S1=4, S2=28 — the
    literals the kernel used before this class existed).

    ``lazy`` = 8*max(p) < 2^32: the kernel may defer reductions (enter
    the group stages at < 4p, skip the MAC chain condsub) — the v6b
    sub-2^29 pair FAST28 qualifies, the default ~2^30 pair does not.
    """

    def __init__(self, p0: int, p1: int, t32_bias: int):
        assert p0 < 2 * p1, "crt merge needs r0 < 2*p1"
        self.p0, self.p1 = p0, p1
        self.qp = p0 * p1
        self.shift = (self.qp - 1).bit_length()
        assert (1 << (self.shift - 1)) < self.qp <= (1 << self.shift)
        self.s1 = 64 - self.shift
        self.s2 = self.shift - 32
        self.inv01 = pow(p0, p1 - 2, p1)
        self.inv01_sh = (self.inv01 << 32) // p1
        self.g_const = (1 << (64 + self.shift)) // self.qp - (1 << 64)
        assert 0 < self.g_const < (1 << 60), hex(self.g_const)
        self.g1 = self.g_const >> 32
        self.g0 = self.g_const & _M32
        self.c1t = (1 << 60) // p1
        assert self.c1t < (1 << 32) and p1 * self.c1t < (1 << 60)
        self.t32_bias = t32_bias
        self.lazy = 8 * max(p0, p1) < (1 << 32)
        self.primes = (p0, p1)

    def plan(self, n: int) -> ntt_mod.NegacyclicNtt:
        return ntt_mod.get_plan(n, 2, primes=self.primes)


#: the shipped v6 flavor — the module-level constants verbatim (checked)
DEFAULT = Bnf2Flavor(P0, P1, T32_BIAS)
assert (DEFAULT.qp, DEFAULT.inv01, DEFAULT.inv01_sh, DEFAULT.g_const,
        DEFAULT.g1, DEFAULT.g0, DEFAULT.c1t, DEFAULT.s1, DEFAULT.s2) == (
    QP, INV01, INV01_SH, G_CONST, G1, G0, C1T, 4, 28)
assert not DEFAULT.lazy

#: v6b: sub-2^29 pair (q' ~ 2^56.9998) enabling lazy in-kernel reduction
#: (8p < 2^32). Rescale noise grows (QP/QP28)^2 = 64x over DEFAULT —
#: std ~2^40.9 absolute, still far below the >= 2^47 intrinsic PBS noise
#: (bnf_blind_rotate_extra_variance covers it via transform_modulus; the
#: variant_noise_margin_ok gate enforces the budget per parameter set).
#: t32_bias=1 centers the measured [0, 3] switch-back undershoot.
FAST28 = Bnf2Flavor(0x163B0001, 0x17080001, t32_bias=1)
assert FAST28.lazy and FAST28.s1 == 7 and FAST28.s2 == 25


def get_plan2(n: int) -> ntt_mod.NegacyclicNtt:
    """The 2-prime transform plan for polynomial size ``n``."""
    return ntt_mod.get_plan(n, 2)


def eligible(n: int, base_log: int, levels: int) -> bool:
    """Same kernel envelope as v4 (the v6 kernel IS the v4 kernel with a
    different recombination tail): N in [256, 32768] on 128-lane tiles and
    decomposition digits that fit the u32 decomposer. The q'-rounding noise
    is always dominated by the decomposer's own 2^(64 - blog*l) rounding
    term within this envelope (see module docstring)."""
    return (256 <= n <= 32768 and n % 128 == 0 and (n & (n - 1)) == 0
            and base_log * levels <= 31)


# ---------------------------------------------------------------------------
# scalar maps (jnp u64, vectorized) — the oracle spec
# ---------------------------------------------------------------------------

def torus_to_qp(b: jnp.ndarray, flavor: "Bnf2Flavor" = None) -> jnp.ndarray:
    """round(b * q' / 2^64) for torus values b mod 2^64; output in [0, q').

    The one-time BSK embedding (analog of ntt64.rs:166
    ``modswitch_from_power_of_two_to_ntt_prime``). b < 2^64 and q' < 2^60
    (so q'>>32 < 2^28 and the mid-limb sum is exact), and the result is
    < q' except for b within a few ulp of 2^64, where the round can reach
    exactly q' — folded back to 0 (same class mod q')."""
    fl = flavor or DEFAULT
    b = jnp.asarray(b, dtype=_U64)
    q = _U64(fl.qp)
    qh = q >> _U64(32)
    ql = q & _U64(_M32)
    bh = b >> _U64(32)
    bl = b & _U64(_M32)
    ll = bl * ql
    lh = bl * qh
    hl = bh * ql
    hh = bh * qh
    mid = lh + hl  # < 2^63 + 2^60: no u64 overflow (qh < 2^28)
    lo = ll + (mid << _U64(32))
    hi = hh + (mid >> _U64(32)) + (lo < ll).astype(_U64)
    out = hi + (lo >> _U64(63))  # + rounding bit
    return jnp.where(out >= q, out - q, out)


def crt2_merge(r0: jnp.ndarray, r1: jnp.ndarray,
               flavor: "Bnf2Flavor" = None) -> jnp.ndarray:
    """Canonical residues (r0 mod p0, r1 mod p1) -> x in [0, q') u64."""
    fl = flavor or DEFAULT
    r0 = r0.astype(_U64)
    r1 = r1.astype(_U64)
    d = jnp.remainder(r1 + _U64(fl.p1) - r0, _U64(fl.p1))
    v1 = jnp.remainder(d * _U64(fl.inv01), _U64(fl.p1))  # < 2^60: exact
    return r0 + _U64(fl.p0) * v1


def qp_to_torus32(r0: jnp.ndarray, r1: jnp.ndarray,
                  flavor: "Bnf2Flavor" = None) -> jnp.ndarray:
    """acc32 switch-back, fused with the CRT merge: canonical residues
    (r0 mod P0, r1 mod P1) -> hi-plane torus value (u32 inside u64)

        t32 ~= round(crt2_merge(r0, r1) * 2^32 / QP)   (mod 2^32)

    SPEC formula (the Pallas kernel's acc32 v6 tail matches it bit for
    bit):

        v1 = (r1 + 2*P1 - r0) * INV01  mod P1
        t32 = ((v1 * C1T) >> 28) + (r0 >> 28) + T32_BIAS   (mod 2^32)

    Exactly one u32-plane is produced; the full 64-bit switch-back's
    x0-cross terms are dropped because the acc32 accumulator rounds every
    increment to a multiple of 2^32 anyway. |error| <= ~4 units of 2^32
    after the +T32_BIAS centering — below the acc32 rounding noise
    (std 2^32/sqrt(12) per step) that the mode already accepts."""
    fl = flavor or DEFAULT
    r0 = jnp.asarray(r0, dtype=_U64)
    r1 = jnp.asarray(r1, dtype=_U64)
    d = jnp.remainder(r1 + _U64(2 * fl.p1) - r0, _U64(fl.p1))
    v1 = jnp.remainder(d * _U64(fl.inv01), _U64(fl.p1))
    t = ((v1 * _U64(fl.c1t)) >> _U64(28)) + (r0 >> _U64(fl.s2)) \
        + _U64(fl.t32_bias)
    return t & _U64(_M32)


def qp_to_torus(x: jnp.ndarray, flavor: "Bnf2Flavor" = None) -> jnp.ndarray:
    """Switch x in [0, q') back to the 2^64 torus.

    SPEC formula (the Pallas kernel matches it bit for bit), with
    S1 = 64 - SHIFT, S2 = SHIFT - 32 (DEFAULT: 4 / 28):
        t = (x << S1) + ((x0*G1 + x1*G0) >> S2) + ((x1*G1) << S1)  mod 2^64
    with x = x1*2^32 + x0. Undershoots round(x * 2^64 / QP) by at most
    ~18 (dropped x0*G0 term + floor); the deficit is pure noise at torus
    scale (see module docstring)."""
    fl = flavor or DEFAULT
    x = jnp.asarray(x, dtype=_U64)
    x0 = x & _U64(_M32)
    x1 = x >> _U64(32)
    s = x0 * _U64(fl.g1) + x1 * _U64(fl.g0)  # < 2^61: exact
    d = x1 * _U64(fl.g1)  # < 2^55: exact
    return (x << _U64(fl.s1)) + (s >> _U64(fl.s2)) + (d << _U64(fl.s1))


# ---------------------------------------------------------------------------
# BSK preparation
# ---------------------------------------------------------------------------

def bootstrap_key_to_bnf2(bsk: np.ndarray,
                          flavor: "Bnf2Flavor" = None) -> jnp.ndarray:
    """Standard-domain BSK u64[n, l, R, R, N] (torus mod 2^64) -> v6
    NTT-domain scan layout u32[n, 2, 2, l*R, R, N] (residue+shoup planes,
    2 primes), directly consumable by ``pbs_kernel.blind_rotate_pallas``.

    Each coefficient is rescaled into Z_q' (``torus_to_qp``) then
    forward-transformed mod each prime — the one-time key embedding of the
    BNF scheme (ntt64_bnf_pbs.rs:174)."""
    import jax

    from .pbs_kernel import bsk_to_scan_layout

    bsk = jnp.asarray(bsk, dtype=_U64)
    nlwe, l, R, R2, N = bsk.shape
    fl = flavor or DEFAULT
    plan = fl.plan(N)

    @jax.jit
    def fwd(x):
        res = plan.fwd(torus_to_qp(x, fl))  # [2, n, l, R, R, N] residues
        p = plan.p_like(res.ndim - 1)
        shoup = (res << jnp.uint64(32)) // p  # cold path (keygen only)
        return jnp.stack([res, shoup]).astype(jnp.uint32)

    return bsk_to_scan_layout(fwd(bsk))


# ---------------------------------------------------------------------------
# jnp oracle blind rotation (bit-exact twin of the v6 Pallas kernel)
# ---------------------------------------------------------------------------

def blind_rotate_bnf2(
    lut: jnp.ndarray,
    msed_mask: jnp.ndarray,
    msed_body: jnp.ndarray,
    bsk_scan2: jnp.ndarray,
    base_log: int,
    levels: int,
    acc_round32: bool = False,
    flavor: "Bnf2Flavor" = None,
) -> jnp.ndarray:
    """jnp oracle of the v6 kernel: blind rotation with external products
    computed mod q' (2-prime CRT), accumulator mod 2^64.

    Bit-exact contract with the kernel: mod-p_i NTT math is exact, the
    inverse outputs are canonical residues, and the CRT merge + torus
    switch follow ``crt2_merge``/``qp_to_torus`` exactly.

    ``acc_round32``: mirror of the Pallas kernel's acc32 contract — the
    accumulator starts rounded to the nearest multiple of 2^32 and every
    CMUX increment is produced directly as a hi-plane value by the fused
    ``qp_to_torus32`` switch-back (bit-exact twin of
    ``blind_rotate_pallas(bnf2=True)`` under its default TFHE_V4_ACC=32;
    the rotate/decompose stages commute with the rounding because a
    multiple-of-2^32 accumulator has an exact zero low limb).

    ``lut``: u64[B, R, N]; ``msed_mask``: u64[B, n] in [0, 2N);
    ``msed_body``: u64[B]; ``bsk_scan2``: u32[n, 2, 2, l*R, R, N].
    Returns u64[B, R, N].
    """
    from .decomp import decompose
    from .pbs_kernel import scan_to_legacy_layout
    from .polynomial import monomial_div, monomial_mul

    N = lut.shape[-1]
    R = lut.shape[-2]
    fl = flavor or DEFAULT
    plan = fl.plan(N)
    nsteps = bsk_scan2.shape[0]
    # [2(res/shoup), 2(P), n, l, R, R, N] -> residues u64 [n, P, l*R, R, N]
    legacy = scan_to_legacy_layout(bsk_scan2, levels)
    bres = jnp.moveaxis(legacy[0].astype(_U64), 1, 0)
    bres = bres.reshape(nsteps, 2, levels * R, R, N)

    acc = monomial_div(lut, msed_body[..., None])
    half = jnp.uint64(1) << jnp.uint64(31)
    r32 = lambda x: ((x + half) >> jnp.uint64(32)) << jnp.uint64(32)
    if acc_round32:
        acc = r32(acc)
    p_arr = [jnp.uint64(fl.p0), jnp.uint64(fl.p1)]

    def body_fn(i, acc):
        a_i = lax.dynamic_index_in_dim(msed_mask, i, axis=-1, keepdims=False)
        ct1 = monomial_mul(acc, a_i[..., None]) - acc
        digits = decompose(ct1, base_log, levels)  # [B, R, N, l] signed
        digits = jnp.moveaxis(digits, -1, -3)  # [B, l, R, N]
        dhat = plan.fwd_digits(
            digits.reshape(digits.shape[0], levels * R, N).astype(jnp.int64)
        )  # [P, B, l*R, N] residues < p
        g_i = lax.dynamic_index_in_dim(bres, i, axis=0, keepdims=False)
        res_c = []
        for c in range(R):
            per_p = []
            for pi in range(2):
                p = p_arr[pi]
                acc_m = None
                for j in range(levels * R):
                    term = jnp.remainder(
                        dhat[pi, :, j] * g_i[pi, j, c][None], p)
                    acc_m = term if acc_m is None else jnp.remainder(
                        acc_m + term, p)
                per_p.append(acc_m)
            # inverse expects [P, ..., N]
            r = plan.inv(jnp.stack(per_p))  # canonical residues
            if acc_round32:
                res_c.append(qp_to_torus32(r[0], r[1], fl)
                             << jnp.uint64(32))
            else:
                res_c.append(qp_to_torus(crt2_merge(r[0], r[1], fl), fl))
        inc = jnp.stack(res_c, axis=-2)  # [B, R, N]
        return acc + inc

    return lax.fori_loop(0, nsteps, body_fn, acc)
