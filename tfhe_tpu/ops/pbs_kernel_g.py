"""Fused Pallas TPU kernel for one blind-rotation step, Goldilocks variant
("v5"): single-prime transform domain p = 2^64 - 2^32 + 1 (BNF semantics,
reference ``ntt64_bnf_pbs.rs:174-260`` / ``ntt64.rs:166-260``).

Differences vs the 4-prime CRT kernel (ops/pbs_kernel.py, "v4"):

- ONE negacyclic NTT per polynomial instead of four: the product wraps
  mod p, which is correct torus arithmetic (the BSK was rounded into Z_p
  once at key-prep time, error <= 0.5 torus units per coefficient);
- NO Garner CRT reconstruction (45% of the measured v4 step cost): the
  inverse output switches back to the 2^64 torus with
  ``t = x + (x >> 32)`` (2 vector ops, error <= 2 torus units — the exact
  formula is the spec, mirrored bit-for-bit by
  :func:`tfhe_tpu.ops.goldilocks.field_to_torus`);
- group-axis DIF stages are MULTIPLY-FREE: the plan picks the 2N-th root
  psi with psi^(2N/G) = 2^(192/G) (ord(2) = 192 mod p), so every group
  twiddle is +/- a power of two — shift-and-fold only;
- the 128-lane DFT halves are int8 MXU matmuls exactly like v4, but with
  8 output limb planes (64-bit matrix entries) instead of 4;
- values are (hi, lo) u32 pairs holding ANY u64 representative of the
  mod-p class (2p > 2^64, so one conditional subtract canonicalizes);
  only the inverse output is canonicalized (the switch-back formula is
  representative-sensitive and must match the oracle).

Layout, rotation, decomposition and the scan scaffolding are shared with
v4 (transposed group-leading [G, Bt, 128] tiles).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import goldilocks as gl
from .pbs_kernel import (
    _decompose_u32,
    _negacyclic_rot_v4,
    _split_digits_i8,
    _sub64,
    _add64,
    split_u64,
    merge_u64,
    to_transposed_layout,
    from_transposed_layout,
)

U32 = jnp.uint32
I32 = jnp.int32
P = gl.P
EPS = gl.EPS  # 2^64 mod p = 2^32 - 1


# ---------------------------------------------------------------------------
# (hi, lo) u32-pair Goldilocks primitives (in-kernel)
# ---------------------------------------------------------------------------

def _pair_add_wrap(ahi, alo, bhi, blo):
    """(a + b) mod p on u64 representatives; output another representative.

    A u64 wrap contributes 2^64 = EPS (mod p); the +EPS fix can wrap at
    most once more (value was >= p), handled by a second masked +EPS.
    """
    lo = alo + blo
    c0 = (lo < alo).astype(U32)
    t = ahi + bhi
    c1 = (t < ahi).astype(U32)
    hi = t + c0
    c1 = c1 | ((hi < t).astype(U32) & c0)
    # first fix: + c1 * EPS  (EPS = 0xFFFFFFFF, i.e. lo - 1 when c1)
    lo2 = lo - c1
    b1 = c1 & (lo != U32(0)).astype(U32)  # lo + 0xFFFFFFFF carries iff lo>=1
    hi2 = hi + b1
    c2 = b1 & (hi == U32(0xFFFFFFFF)).astype(U32)  # second wrap
    lo3 = lo2 - c2
    b2 = c2 & (lo2 != U32(0)).astype(U32)
    hi3 = hi2 + b2
    return hi3, lo3


def _pair_sub_wrap(ahi, alo, bhi, blo):
    """(a - b) mod p on u64 representatives (a u64 borrow removes EPS;
    if that fix underflows — the wrapped difference was < EPS — a second
    EPS is removed, and no third fix can be needed)."""
    br_lo = (alo < blo).astype(U32)
    lo = alo - blo
    hi = ahi - bhi - br_lo
    br = ((ahi < bhi) | ((ahi == bhi) & (alo < blo))).astype(U32)
    # subtract EPS = add (1 - 2^32): lo += 1 (carry), hi -= 1
    under = br & ((hi == U32(0)) & (lo != U32(0xFFFFFFFF))).astype(U32)
    lo1 = lo + br
    c1 = br & (lo1 == U32(0)).astype(U32)
    hi1 = hi + c1 - br
    lo2 = lo1 + under
    c2 = under & (lo2 == U32(0)).astype(U32)
    hi2 = hi1 + c2 - under
    return hi2, lo2


def _pair_neg(hi, lo):
    """(-x) mod p from a u64 representative: 0 - x with the borrow fix."""
    z = jnp.zeros_like(hi)
    return _pair_sub_wrap(z, z, hi, lo)


def _fold96(w2, w1, w0):
    """(w2 * 2^64 + w1 * 2^32 + w0) mod p -> u64 representative pair.

    w2 * 2^64 = w2 * EPS = (w2 << 32) - w2, built without multiplies.
    """
    nz = (w2 != U32(0)).astype(U32)
    thi = w2 - nz
    tlo = U32(0) - w2
    return _pair_add_wrap(w1, w0, thi, tlo)


def _canon_pair(hi, lo):
    """Any u64 representative -> canonical (< p). One masked subtract
    suffices because 2p > 2^64. x >= p iff hi == 0xFFFFFFFF and lo >= 1;
    then x - p = lo - 1 (hi' = 0)."""
    m = ((hi == U32(0xFFFFFFFF)) & (lo != U32(0))).astype(U32)
    return hi * (U32(1) - m), lo - m


def _mul32_hilo_presplit(a, wh16, wl16):
    """(hi, lo) of a(u32) * w(u32) where w's 16-bit halves are precomputed
    table values (wh16 = w >> 16, wl16 = w & 0xFFFF)."""
    ah = a >> U32(16)
    al = a & U32(0xFFFF)
    t0 = al * wl16
    t1 = al * wh16
    t2 = ah * wl16
    t3 = ah * wh16
    m = (t0 >> U32(16)) + (t1 & U32(0xFFFF)) + (t2 & U32(0xFFFF))
    lo = (t0 & U32(0xFFFF)) | (m << U32(16))
    hi = t3 + (t1 >> U32(16)) + (t2 >> U32(16)) + (m >> U32(16))
    return hi, lo


def _gmul_pair(ahi, alo, w4):
    """(a * w) mod p: a = (ahi, alo) any u64 representative; w given as its
    four 16-bit quarters ``w4 = (whh, whl, wlh, wll)`` (u32 tables holding
    w>>48, (w>>32)&0xFFFF, (w>>16)&0xFFFF, w&0xFFFF). Full 128-bit product
    then the 2-word Goldilocks fold. Output: u64 representative pair."""
    whh, whl, wlh, wll = w4
    # four 32x32 products (w halves pre-split into the table quarters)
    ll_hi, ll_lo = _mul32_hilo_presplit(alo, wlh, wll)   # alo * wlo
    lh_hi, lh_lo = _mul32_hilo_presplit(alo, whh, whl)   # alo * whi
    hl_hi, hl_lo = _mul32_hilo_presplit(ahi, wlh, wll)   # ahi * wlo
    hh_hi, hh_lo = _mul32_hilo_presplit(ahi, whh, whl)   # ahi * whi
    # assemble n3..n0 of the 128-bit product
    n0 = ll_lo
    s1 = ll_hi + lh_lo
    c1 = (s1 < ll_hi).astype(U32)
    n1 = s1 + hl_lo
    c1 = c1 + (n1 < s1).astype(U32)
    s2 = lh_hi + hl_hi          # < 2^33 - 2: track carry
    c2 = (s2 < lh_hi).astype(U32)
    s2b = s2 + hh_lo
    c2 = c2 + (s2b < s2).astype(U32)
    n2 = s2b + c1
    c2 = c2 + (n2 < s2b).astype(U32)
    n3 = hh_hi + c2
    # reduce: x = (n1, n0) - n3 + n2 * EPS   (2^64 = EPS, 2^96 = -1)
    z = jnp.zeros_like(n3)
    hi, lo = _pair_sub_wrap(n1, n0, z, n3)
    nz = (n2 != U32(0)).astype(U32)
    return _pair_add_wrap(hi, lo, n2 - nz, U32(0) - n2)


def _gshift_pair(hi, lo, k: int):
    """(x * 2^k) mod p for a constant 0 <= k < 96; u64 representative in,
    representative out. Multiply-free (word shifts + Goldilocks fold)."""
    assert 0 <= k < 96
    if k == 0:
        return hi, lo
    q, r = divmod(k, 32)
    w = [jnp.zeros_like(lo) for _ in range(5)]
    if r == 0:
        w[q] = lo
        w[q + 1] = hi
    else:
        w[q] = lo << U32(r)
        w[q + 1] = (hi << U32(r)) | (lo >> U32(32 - r))
        w[q + 2] = hi >> U32(32 - r)
    # value = sum w[i] 2^{32 i};  2^64 = EPS, 2^96 = -1, 2^128 = -2^32
    rhi, rlo = _fold96(w[2], w[1], w[0])
    if k > 32:  # w[3] can be nonzero
        rhi, rlo = _pair_sub_wrap(rhi, rlo, jnp.zeros_like(rhi), w[3])
    if k > 64:  # w[4] can be nonzero: subtract w[4] * 2^32
        rhi, rlo = _pair_sub_wrap(rhi, rlo, w[4], jnp.zeros_like(rhi))
    return rhi, rlo


def _shift_mul(hi, lo, spec):
    """x * (+/- 2^k) from a plan shift spec ``(k, neg)``."""
    k, neg = spec
    rhi, rlo = _gshift_pair(hi, lo, k)
    if neg:
        rhi, rlo = _pair_neg(rhi, rlo)
    return rhi, rlo


# ---------------------------------------------------------------------------
# table building (python ints -> numpy tables)
# ---------------------------------------------------------------------------

def _split8(v: int):
    out = []
    for _ in range(8):
        d = v & 255
        if d > 127:
            d -= 256
        out.append(d)
        v = (v - d) >> 8
    return out, v


def _balanced_limbs8(x: int) -> list:
    """A representative of x (mod p) as 8 signed base-256 limbs.

    The int8 digit range [-128, 127] is asymmetric, so the centered
    representative in (-p/2, p/2] can overflow the positive side
    (max representable is 127 * (256^8 - 1)/255 < p/2); in that case the
    negative representative v - p fits (-p/2 > -128 * sum 256^b)."""
    v = x % P
    if v > P // 2:
        v -= P
    out, res = _split8(v)
    if res != 0:
        out, res = _split8(v - P if v > 0 else v + P)
    assert res == 0, ("balanced 8-limb split residue", x)
    return out


def _merged_limb_matrix_g(M, nl_in: int, off: int):
    """Merged int8 limb matrix for ``out = in @ M mod p`` with 64-bit
    entries (8 output limb planes).

    ``M``: [C, 128] python-int matrix. Input values are offset-split into
    ``nl_in`` int8 limbs with the constant offset ``off`` (true value
    v = sum_a L_a 2^{8a} + off). Returns:

    - W [nl_in*C, 8*128] int8 — column block b holds output limb b of the
      stacked [2^{8a} M mod p] rows (balanced representatives, |limb|<=128);
    - bias [128] python ints: off * colsum(k) mod p (add after recombine);
    - pair_ok [4] bools: whether |U_{2i}| + 256|U_{2i+1}| (with |L|<=128)
      stays int32-exact so planes 2i, 2i+1 can be pair-folded.
    """
    C = M.shape[0]
    src = np.zeros((8, nl_in * C, 128), dtype=np.int8)
    for a in range(nl_in):
        for c in range(C):
            for k in range(128):
                limbs = _balanced_limbs8((int(M[c, k]) << (8 * a)) % P)
                for b in range(8):
                    src[b, a * C + c, k] = limbs[b]
    W = np.concatenate([src[b] for b in range(8)], axis=1)
    bnd = [int((np.abs(src[b].astype(np.int64)).sum(axis=0) * 128).max())
           for b in range(8)]
    pair_ok = [bnd[2 * i] + 256 * bnd[2 * i + 1] < 2**31 - 2 for i in range(4)]
    assert all(b < 2**31 - 2 for b in bnd), bnd
    colsum = [sum(int(M[c, k]) for c in range(C)) for k in range(128)]
    bias = [(off * colsum[k]) % P for k in range(128)]
    return W, bias, pair_ok


def _w4_split(tbl_obj: np.ndarray) -> np.ndarray:
    """[..., ] python-int table of values < 2^64 -> [4, ...] u32 16-bit
    quarters (w>>48, (w>>32)&0xFFFF, (w>>16)&0xFFFF, w&0xFFFF)."""
    flat = np.asarray(
        [int(x) for x in np.asarray(tbl_obj, dtype=object).reshape(-1)],
        dtype=np.uint64,
    ).reshape(np.asarray(tbl_obj).shape)
    return np.stack([
        (flat >> np.uint64(48)).astype(np.uint32),
        ((flat >> np.uint64(32)) & np.uint64(0xFFFF)).astype(np.uint32),
        ((flat >> np.uint64(16)) & np.uint64(0xFFFF)).astype(np.uint32),
        (flat & np.uint64(0xFFFF)).astype(np.uint32),
    ])


def _pair_table(vals) -> np.ndarray:
    """python-int list/array (mod p) -> [2, ...] u32 (hi, lo) planes."""
    flat = np.asarray(
        [int(x) % (1 << 64) for x in np.asarray(vals, dtype=object).reshape(-1)],
        dtype=np.uint64,
    ).reshape(np.asarray(vals).shape)
    return np.stack([(flat >> np.uint64(32)).astype(np.uint32),
                     flat.astype(np.uint32)])


class _KernelTablesG:
    """Tables for the v5 Goldilocks four-step kernel (per N, base_log)."""

    def __init__(self, n: int, base_log: int):
        plan = gl.get_plan_g(n)
        self.plan = plan
        G = plan.G
        self.G = G
        self.log_g = plan.log_g
        self.base_log = base_log
        self.nl_in = max(1, -(-(base_log + 1) // 8))
        self.in_offset = 1 << (base_log - 1)
        psi = plan.psi

        # forward lane-DFT matrix M[j2, k2] = psi^{G j2 (1 + 2 k2)}
        M = np.empty((128, 128), dtype=object)
        for j2 in range(128):
            for k2 in range(128):
                M[j2, k2] = gl.gpow(psi, (G * j2 * (1 + 2 * k2)) % (2 * n))
        off_f = 128 * sum(1 << (8 * a) for a in range(self.nl_in)) \
            - self.in_offset
        self.fwd_w8, fwd_bias, self.fwd_pair_ok = _merged_limb_matrix_g(
            M, self.nl_in, off_f)
        sb = _seg_bias_int(self.fwd_pair_ok)
        fwd_bias = [(b - sb) % P for b in fwd_bias]
        self.fwd_bias = _pair_table(fwd_bias)  # [2, 128]

        # inverse lane-DFT matrix Minv[k2, j2] = psi^{-G j2 (1+2 k2)} / 128
        inv128 = gl.gpow(128, P - 2)
        Minv = np.empty((128, 128), dtype=object)
        for k2 in range(128):
            for j2 in range(128):
                e = (G * j2 * (1 + 2 * k2)) % (2 * n)
                Minv[k2, j2] = gl.gpow(psi, 2 * n - e) * inv128 % P
        off_i = 128 * sum(1 << (8 * a) for a in range(8))
        self.inv_w8, inv_bias, self.inv_pair_ok = _merged_limb_matrix_g(
            Minv, 8, off_i)
        sbi = _seg_bias_int(self.inv_pair_ok)
        inv_bias = [(b - sbi) % P for b in inv_bias]
        self.inv_bias = _pair_table(inv_bias)

        # twiddles T[j1, k2] = psi^{j1 (1+2 k2)}; T_inv = psi^{-...} / G
        invG = gl.gpow(G, P - 2)
        T = np.empty((G, 128), dtype=object)
        Ti = np.empty((G, 128), dtype=object)
        for j1 in range(G):
            for k2 in range(128):
                e = (j1 * (1 + 2 * k2)) % (2 * n)
                T[j1, k2] = gl.gpow(psi, e)
                Ti[j1, k2] = gl.gpow(psi, 2 * n - e) * invG % P
        self.tw = _w4_split(T)       # [4, G, 128] u32 quarters
        self.tw_inv = _w4_split(Ti)

        # group-stage shift specs (python constants; multiply-free stages)
        self.stage_shifts = plan.stage_shifts  # fwd: [(k, neg)] per stage
        self.stage_shifts_inv = []
        for rows in plan.stage_shifts:
            inv_rows = []
            for (k, neg) in rows:
                ki = (192 - (k + (96 if neg else 0))) % 192
                n2_ = False
                if ki >= 96:
                    ki -= 96
                    n2_ = True
                inv_rows.append((ki, n2_))
            self.stage_shifts_inv.append(inv_rows)


@functools.lru_cache(maxsize=None)
def _get_tables_g(n: int, base_log: int) -> _KernelTablesG:
    return _KernelTablesG(n, base_log)


# ---------------------------------------------------------------------------
# in-kernel transform pieces ([G, Bt, 128] pairs)
# ---------------------------------------------------------------------------

def _recombine8(planes, pair_ok, bias_hi, bias_lo):
    """8 int32 matmul planes (each [rows, 128]) -> (hi, lo) u64
    representative of  sum_b U_b 2^{8b} + bias  (mod p).

    Safe plane pairs are folded int32-first (U_{2i} + 256 U_{2i+1}); each
    resulting segment is biased to u32 by +2^31 and the constant biases are
    pre-subtracted from the stored ``bias`` table at build time.
    """
    segs = []  # (weight_shift, biased u32 value)
    for i in range(4):
        if pair_ok[i]:
            v = planes[2 * i] + (planes[2 * i + 1] << I32(8))
            segs.append((16 * i, v.astype(U32) + U32(0x80000000)))
        else:
            segs.append((16 * i, planes[2 * i].astype(U32) + U32(0x80000000)))
            segs.append((16 * i + 8,
                         planes[2 * i + 1].astype(U32) + U32(0x80000000)))
    z = jnp.zeros_like(segs[0][1])
    w0 = w1 = w2 = z
    for sh, v in segs:
        q, r = divmod(sh, 32)
        if r == 0:
            lo_part, hi_part = v, None
        else:
            lo_part = v << U32(r)
            hi_part = v >> U32(32 - r)
        if q == 0:
            nw0 = w0 + lo_part
            w1 = w1 + (nw0 < w0).astype(U32)
            w0 = nw0
            if hi_part is not None:
                nw1 = w1 + hi_part
                w2 = w2 + (nw1 < w1).astype(U32)
                w1 = nw1
        else:  # q == 1
            nw1 = w1 + lo_part
            w2 = w2 + (nw1 < w1).astype(U32)
            w1 = nw1
            if hi_part is not None:
                w2 = w2 + hi_part
    hi, lo = _fold96(w2, w1, w0)
    return _pair_add_wrap(hi, lo, bias_hi, bias_lo)


def _seg_bias_int(pair_ok) -> int:
    """Total constant added by the +2^31 segment biasing in _recombine8."""
    total = 0
    for i in range(4):
        if pair_ok[i]:
            total += (1 << 31) << (16 * i)
        else:
            total += ((1 << 31) << (16 * i)) + ((1 << 31) << (16 * i + 8))
    return total


def _fwd_ntt_g(L, tg, bt, G, abl=frozenset()):
    """Forward transform from pre-split digit limbs.

    ``L``: [G*Bt, nl_in*128] int8. Returns (hi, lo) [G, Bt, 128] u64
    representatives in v5 point order (lane = k mod 128, group g holds
    k1 = bitrev(g)). Matmul -> recombine -> T twiddle -> shift-only group
    DIF stages. ``abl``: timing-only stubs (see tools/v5_ablate.py)."""
    if "matmul_f" in abl:
        planes = [L[:, :128].astype(I32)] * 8
    else:
        U = lax.dot_general(L, tg["fwd_w8"], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)  # [G*Bt, 1024]
        planes = [U[:, 128 * b:128 * (b + 1)] for b in range(8)]
    if "recomb_f" in abl:
        hi = planes[0].astype(U32)
        lo = planes[1].astype(U32)
    else:
        hi, lo = _recombine8(planes, tg["fwd_pair_ok"],
                             tg["fwd_bias"][0][None, :],
                             tg["fwd_bias"][1][None, :])
    hi = hi.reshape(G, bt, 128)
    lo = lo.reshape(G, bt, 128)
    # T twiddle (per-group constant rows)
    if "tw_f" not in abl:
        w4 = tuple(tg["tw"][q][:, None, :] for q in range(4))
        hi, lo = _gmul_pair(hi, lo, w4)
    if "stages_f" in abl:
        return hi, lo
    # group-axis DIF stages: butterflies with +/- 2^k twiddles
    for st in range(tg["log_g"]):
        m = G >> st
        h = m >> 1
        specs = tg["stage_shifts"][st]
        pieces_hi, pieces_lo = [], []
        for b in range(G // m):
            for j in range(h):
                ia = b * m + j
                ib = b * m + h + j
                uh, ul = _pair_add_wrap(hi[ia:ia + 1], lo[ia:ia + 1],
                                        hi[ib:ib + 1], lo[ib:ib + 1])
                th, tl = _pair_sub_wrap(hi[ia:ia + 1], lo[ia:ia + 1],
                                        hi[ib:ib + 1], lo[ib:ib + 1])
                vh, vl = _shift_mul(th, tl, specs[j])
                pieces_hi.append((ia, uh))
                pieces_lo.append((ia, ul))
                pieces_hi.append((ib, vh))
                pieces_lo.append((ib, vl))
        order = sorted(range(len(pieces_hi)), key=lambda t: pieces_hi[t][0])
        hi = jnp.concatenate([pieces_hi[t][1] for t in order], axis=0)
        lo = jnp.concatenate([pieces_lo[t][1] for t in order], axis=0)
    return hi, lo


def _inv_ntt_g(hi, lo, tg, bt, G, abl=frozenset()):
    """Inverse transform: (hi, lo) [G, Bt, 128] representatives ->
    CANONICAL standard-domain coefficients mod p (transposed layout)."""
    if "stages_i" in abl:
        pass
    else:
        hi, lo = _inv_group_stages(hi, lo, tg, G)
    if "tw_i" not in abl:
        w4 = tuple(tg["tw_inv"][q][:, None, :] for q in range(4))
        hi, lo = _gmul_pair(hi, lo, w4)
    # 8-limb offset split of the u64 representative (linear mod p, so any
    # representative works) -> inverse lane matmul
    hif = hi.reshape(G * bt, 128).astype(I32)
    lof = lo.reshape(G * bt, 128).astype(I32)
    limbs = []
    for j in range(4):
        limbs.append(((((lof >> I32(8 * j)) & I32(255)) - I32(128))
                      .astype(jnp.int8)))
    for j in range(4):
        limbs.append(((((hif >> I32(8 * j)) & I32(255)) - I32(128))
                      .astype(jnp.int8)))
    L = jnp.concatenate(limbs, axis=-1)  # [G*Bt, 1024]
    if "matmul_i" in abl:
        planes = [L[:, :128].astype(I32)] * 8
    else:
        U = lax.dot_general(L, tg["inv_w8"], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        planes = [U[:, 128 * b:128 * (b + 1)] for b in range(8)]
    if "recomb_i" in abl:
        rhi = planes[0].astype(U32)
        rlo = planes[1].astype(U32)
    else:
        rhi, rlo = _recombine8(planes, tg["inv_pair_ok"],
                               tg["inv_bias"][0][None, :],
                               tg["inv_bias"][1][None, :])
        rhi, rlo = _canon_pair(rhi, rlo)
    return rhi.reshape(G, bt, 128), rlo.reshape(G, bt, 128)


def _inv_group_stages(hi, lo, tg, G):
    for st in reversed(range(tg["log_g"])):
        m = G >> st
        h = m >> 1
        specs = tg["stage_shifts_inv"][st]
        pieces_hi, pieces_lo = [], []
        for b in range(G // m):
            for j in range(h):
                ia = b * m + j
                ib = b * m + h + j
                bh, bl = _shift_mul(hi[ib:ib + 1], lo[ib:ib + 1], specs[j])
                ah, al = _pair_add_wrap(hi[ia:ia + 1], lo[ia:ia + 1], bh, bl)
                sh, sl = _pair_sub_wrap(hi[ia:ia + 1], lo[ia:ia + 1], bh, bl)
                pieces_hi.append((ia, ah))
                pieces_lo.append((ia, al))
                pieces_hi.append((ib, sh))
                pieces_lo.append((ib, sl))
        order = sorted(range(len(pieces_hi)), key=lambda t: pieces_hi[t][0])
        hi = jnp.concatenate([pieces_hi[t][1] for t in order], axis=0)
        lo = jnp.concatenate([pieces_lo[t][1] for t in order], axis=0)
    return hi, lo


# ---------------------------------------------------------------------------
# the fused step kernel
# ---------------------------------------------------------------------------

def _make_step_kernel_g(n, base_log, levels, R, tg_tabs: _KernelTablesG,
                        unroll: int = 1, ablate: str = ""):
    log_2n = n.bit_length()
    G = tg_tabs.G
    # timing-only ablation stubs (tools/v5_ablate.py); part of the
    # _build_step_fn_g cache key, outputs are garbage when set
    abl = frozenset(filter(None, ablate.split(",")))

    def one_step(hi, lo, a_bits, bsk, tg, lane_idx):
        """hi/lo: lists of R [G, Bt, 128] u32 (accumulator mod 2^64);
        bsk: [2, l*R, R, G, 128] u32 (hi, lo) canonical BSK values."""
        bt = hi[0].shape[1]
        per_r_digits = []
        for r in range(R):
            if "rot" in abl:
                dhi, dlo = hi[r], lo[r]
            else:
                rhi, rlo = _negacyclic_rot_v4(hi[r], lo[r], a_bits, lane_idx,
                                              G, log_2n)
                dhi, dlo = _sub64(rhi, rlo, hi[r], lo[r])
            if "decomp" in abl:
                per_r_digits.append([dhi.astype(I32)] * levels)
            else:
                per_r_digits.append(
                    _decompose_u32(dhi, dlo, base_log, levels))
        digit_polys = [per_r_digits[r][lev]
                       for lev in range(levels) for r in range(R)]
        if "split" in abl:
            Ls = [jnp.concatenate(
                [(d.reshape(G * bt, 128) & I32(127)).astype(jnp.int8)]
                * tg_tabs.nl_in, axis=-1) for d in digit_polys]
        else:
            Ls = [_split_digits_i8(d, tg_tabs.nl_in, tg_tabs.in_offset)
                  for d in digit_polys]
        dhat = [_fwd_ntt_g(L, tg, bt, G, abl) for L in Ls]

        for c in range(R):
            if "mac" in abl:
                mhi, mlo = dhat[c % len(dhat)]
            else:
                mhi = mlo = None
                for j in range(levels * R):
                    w_hi = bsk[0, j, c][:, None, :]   # [G, 1, 128]
                    w_lo = bsk[1, j, c][:, None, :]
                    w4 = (w_hi >> U32(16), w_hi & U32(0xFFFF),
                          w_lo >> U32(16), w_lo & U32(0xFFFF))
                    th, tl = _gmul_pair(dhat[j][0], dhat[j][1], w4)
                    if mhi is None:
                        mhi, mlo = th, tl
                    else:
                        mhi, mlo = _pair_add_wrap(mhi, mlo, th, tl)
            rhi, rlo = _inv_ntt_g(mhi, mlo, tg, bt, G, abl)  # canonical
            # switch back to the 2^64 torus: t = x + (x >> 32)  (the spec —
            # bit-identical to goldilocks.field_to_torus), then accumulate
            if "modswitch" in abl:
                thi, tlo = rhi, rlo
            else:
                thi, tlo = _add64(rhi, rlo, jnp.zeros_like(rhi), rhi)
            hi[c], lo[c] = _add64(hi[c], lo[c], thi, tlo)
        return hi, lo

    def kernel(a_ref, bsk_ref, fw_ref, iw_ref, tw_ref, ti_ref, fb_ref,
               ib_ref, acc_hi_ref, acc_lo_ref, out_hi_ref, out_lo_ref):
        tg = {
            "fwd_w8": fw_ref[:], "inv_w8": iw_ref[:],
            "tw": tw_ref[:], "tw_inv": ti_ref[:],
            "fwd_bias": fb_ref[:], "inv_bias": ib_ref[:],
            "fwd_pair_ok": tg_tabs.fwd_pair_ok,
            "inv_pair_ok": tg_tabs.inv_pair_ok,
            "stage_shifts": tg_tabs.stage_shifts,
            "stage_shifts_inv": tg_tabs.stage_shifts_inv,
            "log_g": tg_tabs.log_g,
        }
        lane_idx = lax.broadcasted_iota(U32, (1, 1, 128), 2)
        hi = [acc_hi_ref[r] for r in range(R)]
        lo = [acc_lo_ref[r] for r in range(R)]
        for u in range(unroll):
            hi, lo = one_step(hi, lo, a_ref[u], bsk_ref[u], tg, lane_idx)
        for c in range(R):
            out_hi_ref[c] = hi[c]
            out_lo_ref[c] = lo[c]

    return kernel


@functools.lru_cache(maxsize=None)
def _build_step_fn_g(n, base_log, levels, R, batch_tile, unroll=1,
                     ablate=""):
    """fn(a_ms[U,1,B,1], bsk_step[U,2,l*R,R,G,128], acc_hi, acc_lo)
    -> (acc_hi, acc_lo), accs u32[R, G, B, 128] (group-leading transposed
    layout, same as v4). ``ablate`` is bench-only (garbage outputs)."""
    tabs = _get_tables_g(n, base_log)
    kernel = _make_step_kernel_g(n, base_log, levels, R, tabs, unroll=unroll,
                                 ablate=ablate)
    G = tabs.G
    consts = [tabs.fwd_w8, tabs.inv_w8, tabs.tw, tabs.tw_inv,
              tabs.fwd_bias, tabs.inv_bias]

    def step(a_ms, bsk_step, acc_hi, acc_lo):
        B = acc_hi.shape[2]
        Bt = min(batch_tile, B)
        assert B % Bt == 0
        z = np.int32(0)
        full = lambda shape: pl.BlockSpec(
            shape, (lambda i, _k=len(shape): (z,) * _k),
            memory_space=pltpu.VMEM)
        acc_spec = pl.BlockSpec(
            (R, G, Bt, 128), (lambda i: (z, z, i, z)),
            memory_space=pltpu.VMEM)
        a_spec = pl.BlockSpec(
            (unroll, 1, Bt, 1), (lambda i: (z, z, i, z)),
            memory_space=pltpu.VMEM)
        in_specs = [
            a_spec,
            full((unroll, 2, levels * R, R, G, 128)),
        ] + [full(tuple(c.shape)) for c in consts] + [acc_spec, acc_spec]
        interpret = jax.default_backend() == "cpu"
        out_hi, out_lo = pl.pallas_call(
            kernel,
            grid=(B // Bt,),
            interpret=interpret,
            in_specs=in_specs,
            out_specs=(acc_spec, acc_spec),
            out_shape=(
                jax.ShapeDtypeStruct((R, G, B, 128), jnp.uint32),
                jax.ShapeDtypeStruct((R, G, B, 128), jnp.uint32),
            ),
            input_output_aliases={8: 0, 9: 1},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(a_ms, bsk_step, *[jnp.asarray(c) for c in consts], acc_hi, acc_lo)
        return out_hi, out_lo

    return step


# ---------------------------------------------------------------------------
# host-visible entry
# ---------------------------------------------------------------------------

def eligible(n: int, base_log: int, levels: int) -> bool:
    """The v5 kernel covers the classic-PBS parameter envelope: N in
    [256, 8192] (shift-stage roots need G = N/128 | 64) and digits that fit
    the u32 decomposer."""
    return (256 <= n <= 8192 and n % 128 == 0 and (n & (n - 1)) == 0
            and base_log * levels <= 31)


def blind_rotate_goldilocks_pallas(
    lut: jnp.ndarray,
    msed_mask: jnp.ndarray,
    msed_body: jnp.ndarray,
    bsk_g: jnp.ndarray,
    base_log: int,
    levels: int,
    batch_tile: int = 16,
    unroll: int = 2,
) -> jnp.ndarray:
    """Fused-Pallas twin of :func:`tfhe_tpu.ops.goldilocks.
    blind_rotate_goldilocks` (bit-identical outputs).

    ``lut``: u64[B, R, N]; ``msed_mask``: u64[B, n] in [0, 2N);
    ``msed_body``: u64[B]; ``bsk_g``: u32[n, 2, l*R, R, G, 128]
    (kernel-order NTT-domain key from ``bootstrap_key_to_goldilocks``).
    """
    from .polynomial import monomial_div

    nsteps = bsk_g.shape[0]
    R = bsk_g.shape[3]
    G = bsk_g.shape[4]
    n = G * 128
    B = lut.shape[0]
    unroll = int(os.environ.get("TFHE_UNROLL", unroll))
    batch_tile = int(os.environ.get("TFHE_BATCH_TILE", batch_tile))

    acc = monomial_div(lut, msed_body[..., None])  # u64 [B, R, N]
    acc = jnp.moveaxis(acc, 1, 0)  # [R, B, N]
    acc_hi, acc_lo = split_u64(
        jnp.moveaxis(to_transposed_layout(acc, G), 2, 1))  # [R, G, B, 128]
    a_scan = jnp.moveaxis(msed_mask.astype(U32), 1, 0)[:, None, :, None]

    pad = (-nsteps) % unroll
    if pad:
        a_scan = jnp.concatenate(
            [a_scan, jnp.zeros((pad,) + a_scan.shape[1:], a_scan.dtype)], 0)
        bsk_g = jnp.concatenate(
            [bsk_g, jnp.zeros((pad,) + bsk_g.shape[1:], bsk_g.dtype)], 0)
        nsteps += pad
    a_scan = a_scan.reshape((nsteps // unroll, unroll) + a_scan.shape[1:])
    bsk_scan = bsk_g.reshape((nsteps // unroll, unroll) + bsk_g.shape[1:])

    ablate = os.environ.get("TFHE_V5_ABLATE", "")
    if ablate:
        import warnings

        warnings.warn(
            f"TFHE_V5_ABLATE={ablate!r}: v5 kernel stages are stubbed — "
            "outputs are GARBAGE (bench-only mode)", stacklevel=2)
    step_fn = _build_step_fn_g(n, base_log, levels, R, batch_tile, unroll,
                               ablate=ablate)

    def body(carry, xs):
        hi, lo = carry
        a_ms, bsk_step = xs
        hi, lo = step_fn(a_ms, bsk_step, hi, lo)
        return (hi, lo), None

    (acc_hi, acc_lo), _ = lax.scan(body, (acc_hi, acc_lo),
                                   (a_scan, bsk_scan))
    out = merge_u64(acc_hi, acc_lo)
    out = from_transposed_layout(jnp.moveaxis(out, 1, 2))
    return jnp.moveaxis(out, 0, 1)  # [B, R, N]
