"""Fused Pallas TPU kernel for one blind-rotation step (the PBS hot loop).

One kernel invocation performs, for a tile of ciphertexts (batch on
sublanes, polynomial coefficients on lanes):

    rotate(acc, X^{a_i}) -> subtract -> signed gadget decompose ->
    forward negacyclic NTT (per CRT prime) -> MAC against the GGSW row
    (Shoup multiplication against precomputed key duals) -> inverse NTT ->
    Garner CRT reconstruction mod 2^64 -> 64-bit accumulate into acc

which is exactly the reference's ``add_external_product_assign`` inside
``blind_rotate_assign`` (fft_impl/fft64/crypto/bootstrap.rs:294-381,
ggsw.rs:483-640), re-designed for the TPU vector unit:

- all arithmetic is uint32 (u64 torus values are (hi, lo) limb pairs;
  32x32->64 products via 16-bit half-word splits) — no emulated u64;
- modular multiplication is division-free Shoup: q = hi32(a * w_shoup),
  r = a*w - q*p, with the *lazy* bound r < 2p carried through butterflies;
- butterfly pairing: large strides (h >= 128) use static lane slices
  (no redundant work); small strides use lane rolls + masked selects;
- the per-ciphertext monomial rotation X^{a} uses the binary decomposition
  of a: log2(2N) conditional static rolls with per-sublane bit masks
  (data-independent, no gathers);
- the n-step loop is a ``lax.scan`` outside the kernel: XLA streams the
  bootstrap key (one GGSW per step) HBM->VMEM while compute runs.

The CRT/NTT math (primes, twiddles, Garner constants) comes from
:class:`tfhe_tpu.ops.ntt.NegacyclicNtt` so this kernel is bit-identical to
the portable jnp path in :mod:`tfhe_tpu.ops.server`.
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

from . import ntt as ntt_mod

U32 = jnp.uint32
I32 = jnp.int32


def _roll(x, shift, axis):
    """Lane roll; pltpu.roll inside kernels, swappable to jnp.roll in tests."""
    return pltpu.roll(x, np.int32(shift), axis=axis)


# ---------------------------------------------------------------------------
# u32 limb arithmetic
# ---------------------------------------------------------------------------

def _mul_hi(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """High 32 bits of the 64-bit product of two u32 arrays."""
    ah = a >> U32(16)
    al = a & U32(0xFFFF)
    bh = b >> U32(16)
    bl = b & U32(0xFFFF)
    t0 = al * bl
    t1 = al * bh
    t2 = ah * bl
    t3 = ah * bh
    m = (t0 >> U32(16)) + (t1 & U32(0xFFFF)) + (t2 & U32(0xFFFF))
    return t3 + (t1 >> U32(16)) + (t2 >> U32(16)) + (m >> U32(16))


def _mul_hi_lo(a: jnp.ndarray, b: jnp.ndarray):
    """(hi, lo) of the 64-bit product of two u32 arrays."""
    ah = a >> U32(16)
    al = a & U32(0xFFFF)
    bh = b >> U32(16)
    bl = b & U32(0xFFFF)
    t0 = al * bl
    t1 = al * bh
    t2 = ah * bl
    t3 = ah * bh
    m = (t0 >> U32(16)) + (t1 & U32(0xFFFF)) + (t2 & U32(0xFFFF))
    lo = (t0 & U32(0xFFFF)) | (m << U32(16))
    hi = t3 + (t1 >> U32(16)) + (t2 >> U32(16)) + (m >> U32(16))
    return hi, lo


def _mul_hi_approx(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """mul_hi undershooting the exact value by at most 2: drops the
    low-half carry fold of :func:`_mul_hi` (3 mullo + 2 shifts fewer)."""
    ah = a >> U32(16)
    al = a & U32(0xFFFF)
    bh = b >> U32(16)
    bl = b & U32(0xFFFF)
    return ah * bh + ((al * bh) >> U32(16)) + ((ah * bl) >> U32(16))


# 'approx' (default) = Shoup q via _mul_hi_approx (q <= exact <= q+2, so
# the raw product lands in [0, 4p); an internal compare-free condsub
# restores the < 2p contract, and the value mod p — hence every downstream
# bound and the final canonical residues — is unchanged. Requires
# 4p < 2^32 (all plan primes are < 2^30) and, like the exact mode's < 2p
# bound, a TRUE (w, wsh) Shoup pair: with an inconsistent dual the product
# wraps mod 2^32 and 2^32 is not 0 mod p (synthetic-random-key harnesses
# must build real duals — see tools/v4_ablate.py). Measured: 1.484 vs
# 1.623 us/ct-step on v5e, bit-identical blind-rotation output.
_SHOUP_MODE = os.environ.get("TFHE_V4_SHOUP", "approx")


def _condsub_wide(x: jnp.ndarray, c) -> jnp.ndarray:
    """x mod-subtract c once, branch-free and safe for x >= 2^31 (where a
    lowered signed compare would mis-select): for x < c + 2^31, c < 2^31,
    returns x - c if x >= c else x."""
    m = x - c
    return m + ((m >> U32(31)) * c)


def _shoup(a: jnp.ndarray, w, w_shoup, p) -> jnp.ndarray:
    """(a * w) mod p, lazy: result < 2p. Valid for ANY u32 ``a``, w < p."""
    if _SHOUP_MODE == "approx":
        q = _mul_hi_approx(a, w_shoup)
        # raw result < 4p can cross 2^31 (unlike every exact-path value,
        # which stays < 2p < 2^31), so the fold-back must not use a compare
        return _condsub_wide(a * w - q * p, p + p)  # [0, 4p) -> [0, 2p)
    q = _mul_hi(a, w_shoup)
    return a * w - q * p  # exact low-32 of a value < 2p < 2^32


def _condsub(x: jnp.ndarray, c) -> jnp.ndarray:
    return jnp.where(x >= c, x - c, x)


def _neg64(hi: jnp.ndarray, lo: jnp.ndarray):
    """Two's-complement negation of (hi, lo) u64 limbs."""
    nlo = U32(0) - lo
    nhi = ~hi + jnp.where(lo == U32(0), U32(1), U32(0))
    return nhi, nlo


def _sub64(ahi, alo, bhi, blo):
    lo = alo - blo
    borrow = jnp.where(alo < blo, U32(1), U32(0))
    hi = ahi - bhi - borrow
    return hi, lo


def _add64(ahi, alo, bhi, blo):
    lo = alo + blo
    carry = jnp.where(lo < alo, U32(1), U32(0))
    hi = ahi + bhi + carry
    return hi, lo


# ---------------------------------------------------------------------------
# kernel-constant tables (built from the NegacyclicNtt plan)
# ---------------------------------------------------------------------------

class _KernelTables:
    """Lane-layout twiddle/mask tables for the in-kernel NTT.

    Per forward/inverse stage s (stride h = N >> (s+1)), a full-width lane
    table where position j in the lower half of its butterfly block
    (j mod 2h >= h) holds twiddle w_{j mod 2h - h}; upper positions hold 0
    (masked out). ``twist``/``untwist`` are the psi-power tables.
    """

    def __init__(self, plan: ntt_mod.NegacyclicNtt):
        n = plan.n
        log_n = plan.log_n
        P = plan.num_primes
        self.plan = plan

        def lane_table(stage_tbl):
            # stage_tbl: [P, h] -> [P, N] lane layout
            out = np.zeros((P, n), dtype=np.uint32)
            h = stage_tbl.shape[1]
            j = np.arange(n)
            lower = (j % (2 * h)) >= h
            idx = (j % (2 * h)) - h
            for pi in range(P):
                out[pi] = np.where(lower, stage_tbl[pi][np.clip(idx, 0, h - 1)], 0)
            return out

        self.tw_fwd = np.stack([lane_table(plan.tw_fwd[s]) for s in range(log_n)], 1)
        self.tw_fwd_sh = np.stack(
            [lane_table(plan.tw_fwd_shoup[s]) for s in range(log_n)], 1
        )
        self.tw_inv = np.stack([lane_table(plan.tw_inv[s]) for s in range(log_n)], 1)
        self.tw_inv_sh = np.stack(
            [lane_table(plan.tw_inv_shoup[s]) for s in range(log_n)], 1
        )
        # Sub-NTT twiddle COLUMNS for the transposed small-stride stages:
        # stages with h < 128 act within each 128-lane block with a pattern
        # that repeats every 2h, so the first 128 lane-table entries describe
        # the whole stage once the block is transposed onto sublanes.
        # [P, n_small_stages, 128] (fwd and inv; stage order as in tw_*).
        sub = min(128, n)
        n_small = sum(1 for s in range(log_n) if ((n >> s) >> 1) < 128)
        first_small = log_n - n_small
        self.tw_fwd_col = self.tw_fwd[:, first_small:, :sub].copy()
        self.tw_fwd_col_sh = self.tw_fwd_sh[:, first_small:, :sub].copy()
        self.tw_inv_col = self.tw_inv[:, first_small:, :sub].copy()
        self.tw_inv_col_sh = self.tw_inv_sh[:, first_small:, :sub].copy()
        self.first_small_stage = first_small
        # [P, log_n, N] each
        self.twist = plan.twist.astype(np.uint32)
        self.twist_sh = plan.twist_shoup.astype(np.uint32)
        self.untwist = plan.untwist.astype(np.uint32)
        self.untwist_sh = plan.untwist_shoup.astype(np.uint32)
        j = np.arange(n)
        self.upper = np.stack(
            [((j % (n >> s)) < ((n >> s) >> 1)).astype(np.uint32) for s in range(log_n)]
        )  # [log_n, N]: 1 at upper butterfly positions of stage s

        # --- MXU-DFT tables (v3): the composite of all h<128 stages as a
        # 128x128 matrix mod p, stored as stacked signed int8 limbs so the
        # whole small-stride half of the transform is int8 matmuls on the
        # MXU (exact: |row sum| <= 512*128*128 = 2^23 < 2^31).
        if sub == 128:
            self.fwd_w8 = np.stack(
                [self._dft_limb_stack(pi, inverse=False) for pi in range(P)]
            )  # [P, 4, 512, 128] int8
            self.inv_w8 = np.stack(
                [self._dft_limb_stack(pi, inverse=True) for pi in range(P)]
            )
            # recombination constants per prime
            self.c32 = np.array(
                [(1 << 32) % p for p in plan.primes], dtype=np.uint32
            )
            self.c32_sh = np.array(
                [(((1 << 32) % p) << 32) // p for p in plan.primes],
                dtype=np.uint32,
            )
            self.one_sh = np.array(
                [(1 << 32) // p for p in plan.primes], dtype=np.uint32
            )
            bias = (1 << 23) * (1 + (1 << 8) + (1 << 16) + (1 << 24))
            self.recomb_bias = np.array(
                [bias % p for p in plan.primes], dtype=np.uint32
            )
            # --- v3c: merged [512,512] matrices (the 4 output-limb matmuls
            # as one dispatch), OFFSET data limbs d_j = ((v>>8j)&255)-128,
            # and a pair-fold recombination whose int32 safety is verified
            # here against the EXACT per-matrix row-sum bounds.
            self.c16 = np.array(
                [(1 << 16) % p for p in plan.primes], dtype=np.uint32
            )
            self.c16_sh = np.array(
                [(((1 << 16) % p) << 32) // p for p in plan.primes],
                dtype=np.uint32,
            )
            fwd_m, fwd_b = [], []
            inv_m, inv_b = [], []
            for pi in range(P):
                m, b = self._merged_limb_matrix(pi, inverse=False)
                fwd_m.append(m)
                fwd_b.append(b)
                m, b = self._merged_limb_matrix(pi, inverse=True)
                inv_m.append(m)
                inv_b.append(b)
            self.fwd_w8m = np.stack(fwd_m)  # [P, 512, 512] int8
            self.inv_w8m = np.stack(inv_m)
            self.fwd_bias_row = np.stack(fwd_b)  # [P, 128] u32
            self.inv_bias_row = np.stack(inv_b)

    def _merged_limb_matrix(self, pi: int, inverse: bool):
        """[512, 512] int8 merged matrix + [128] u32 bias row for prime pi.

        Column block j holds output limb j; the bias row folds (a) the +2^31
        bias applied to the two pair-folded int32 values (V1 scaled 2^16) and
        (b) the +128 offset of the data limbs (corrected via matrix column
        sums — the 2^{8i} limb scale lives inside the stacked matrix).
        Asserts the exact pair-fold bounds |U_0 + 256 U_1|, |U_2 + 256 U_3|
        < 2^31 using per-column absolute row sums.
        """
        p = int(self.plan.primes[pi])
        src = self.inv_w8[pi] if inverse else self.fwd_w8[pi]  # [4,512,128]
        W = np.concatenate([src[j] for j in range(4)], axis=1)  # [512, 512]
        bnd = [
            int((np.abs(src[j].astype(np.int64)).sum(axis=0) * 128).max())
            for j in range(4)
        ]
        assert bnd[0] + 256 * bnd[1] < 2**31 - 1, (pi, inverse, bnd)
        assert bnd[2] + 256 * bnd[3] < 2**31 - 1, (pi, inverse, bnd)
        colsum = src.astype(np.int64).sum(axis=1)  # [4, 128]
        bias_row = np.zeros(128, dtype=np.uint32)
        for lane in range(128):
            off = 128 * sum(int(colsum[j, lane]) << (8 * j) for j in range(4))
            bias_row[lane] = (-(1 << 31) * (1 + (1 << 16)) + off) % p
        return W.astype(np.int8), bias_row

    def _small_stage_matrix(self, pi: int, inverse: bool) -> np.ndarray:
        """128x128 matrix M (mod p) with out_row = in_row @ M equal to the
        composite of the h<128 DIF stages (or their inverse)."""
        p = np.uint64(self.plan.primes[pi])
        x = np.eye(128, dtype=np.uint64)  # row j = e_j
        if not inverse:
            for k in range(7):
                h = 128 >> (k + 1)
                w_col = self.tw_fwd_col[pi, k].astype(np.uint64)
                out = np.empty_like(x)
                for b in range(128 // (2 * h)):
                    s = b * 2 * h
                    a = x[:, s : s + h]
                    bb = x[:, s + h : s + 2 * h]
                    w = w_col[s + h : s + 2 * h][None, :]
                    out[:, s : s + h] = (a + bb) % p
                    out[:, s + h : s + 2 * h] = ((a + p - bb) * w) % p
                x = out
        else:
            for k in reversed(range(7)):
                h = 128 >> (k + 1)
                w_col = self.tw_inv_col[pi, k].astype(np.uint64)
                out = np.empty_like(x)
                for b in range(128 // (2 * h)):
                    s = b * 2 * h
                    u = x[:, s : s + h]
                    v = x[:, s + h : s + 2 * h]
                    w = w_col[s + h : s + 2 * h][None, :]
                    bw = (v * w) % p
                    out[:, s : s + h] = (u + bw) % p
                    out[:, s + h : s + 2 * h] = (u + p - bw) % p
                x = out
        return x

    def _dft_limb_stack(self, pi: int, inverse: bool) -> np.ndarray:
        """[4, 512, 128] int8: limb j of the stacked [2^{8i} M mod p] rows."""
        p = int(self.plan.primes[pi])
        M = self._small_stage_matrix(pi, inverse).astype(object)
        out = np.zeros((4, 4 * 128, 128), dtype=np.int8)
        for i in range(4):
            Wi = (M * pow(2, 8 * i, p)) % p
            # balanced representative in (-p/2, p/2]
            Wb = np.where(Wi > p // 2, Wi - p, Wi).astype(np.int64)
            v = Wb.copy()
            for j in range(4):
                d = v & 255
                d = np.where(d > 127, d - 256, d)
                out[j, i * 128 : (i + 1) * 128, :] = d.astype(np.int8)
                v = (v - d) >> 8
            assert np.all(v == 0), "limb split residue"
        return out


@functools.lru_cache(maxsize=None)
def _get_tables(n: int, num_primes: int) -> _KernelTables:
    return _KernelTables(ntt_mod.get_plan(n, num_primes))


# ---------------------------------------------------------------------------
# in-kernel building blocks (operate on [Bt, N] u32 values)
# ---------------------------------------------------------------------------

def _fwd_stage_sliced(x, h, w_row, wsh_row, p, p2):
    """One forward DIF stage via static lane slices (h >= 128)."""
    n = x.shape[-1]
    pieces = []
    for b in range(n // (2 * h)):
        a = x[:, b * 2 * h : b * 2 * h + h]
        bb = x[:, b * 2 * h + h : (b + 1) * 2 * h]
        u = _condsub(a + bb, p2)
        t = a + p2 - bb
        w = w_row[:, b * 2 * h + h : (b + 1) * 2 * h]
        wsh = wsh_row[:, b * 2 * h + h : (b + 1) * 2 * h]
        v = _shoup(t, w, wsh, p)
        pieces.extend([u, v])
    return jnp.concatenate(pieces, axis=-1)


def _fwd_stage_rolled(x, h, w_row, wsh_row, upper_row, p, p2):
    """One forward DIF stage via lane rolls (h < 128)."""
    n = x.shape[-1]
    rm = _roll(x, n - h, 1)  # x[j+h] at j
    rp = _roll(x, h, 1)  # x[j-h] at j
    u = _condsub(x + rm, p2)
    t = rp + p2 - x
    v = _shoup(t, w_row, wsh_row, p)
    return jnp.where(upper_row != U32(0), u, v)


def _inv_stage_sliced(x, h, w_row, wsh_row, p, p2):
    n = x.shape[-1]
    pieces = []
    for b in range(n // (2 * h)):
        u = x[:, b * 2 * h : b * 2 * h + h]
        v = x[:, b * 2 * h + h : (b + 1) * 2 * h]
        w = w_row[:, b * 2 * h + h : (b + 1) * 2 * h]
        wsh = wsh_row[:, b * 2 * h + h : (b + 1) * 2 * h]
        bw = _shoup(v, w, wsh, p)
        a = _condsub(u + bw, p2)
        bpiece = _condsub(u + p2 - bw, p2)
        pieces.extend([a, bpiece])
    return jnp.concatenate(pieces, axis=-1)


def _inv_stage_rolled(x, h, w_row, wsh_row, upper_row, p, p2):
    bw = _shoup(x, w_row, wsh_row, p)  # valid at lower positions
    n = x.shape[-1]
    a = _condsub(x + _roll(bw, n - h, 1), p2)
    b = _condsub(_roll(x, h, 1) + p2 - bw, p2)
    return jnp.where(upper_row != U32(0), a, b)


_SLICE_MIN_H = 128


def _fwd_stage_subl(y, h, w_col, wsh_col, p, p2):
    """One forward DIF stage on the TRANSPOSED block: butterflies along the
    sublane axis via static sublane slices (h < 128)."""
    m = y.shape[0]
    pieces = []
    for b in range(m // (2 * h)):
        a = y[b * 2 * h : b * 2 * h + h, :]
        bb = y[b * 2 * h + h : (b + 1) * 2 * h, :]
        u = _condsub(a + bb, p2)
        t = a + p2 - bb
        w = w_col[b * 2 * h + h : (b + 1) * 2 * h, :]
        wsh = wsh_col[b * 2 * h + h : (b + 1) * 2 * h, :]
        v = _shoup(t, w, wsh, p)
        pieces.extend([u, v])
    return jnp.concatenate(pieces, axis=0)


def _inv_stage_subl(y, h, w_col, wsh_col, p, p2):
    m = y.shape[0]
    pieces = []
    for b in range(m // (2 * h)):
        u = y[b * 2 * h : b * 2 * h + h, :]
        v = y[b * 2 * h + h : (b + 1) * 2 * h, :]
        w = w_col[b * 2 * h + h : (b + 1) * 2 * h, :]
        wsh = wsh_col[b * 2 * h + h : (b + 1) * 2 * h, :]
        bw = _shoup(v, w, wsh, p)
        a = _condsub(u + bw, p2)
        bpiece = _condsub(u + p2 - bw, p2)
        pieces.extend([a, bpiece])
    return jnp.concatenate(pieces, axis=0)


def _fwd_ntt_v2(x, pi, tabs_c, p, p2, log_n):
    """Forward negacyclic NTT, transposed-small-stage variant.

    Identical math (and bit-identical output) to :func:`_fwd_ntt`, but the
    h < 128 stages run on a transposed [128, Bt*N/128] block so butterflies
    are static SUBLANE slices instead of lane rolls + masked selects —
    measured ~99 ns per (128,128) u32 transpose on v5e vs ~730 ns per
    rolled stage, and the sliced form does half the arithmetic.
    """
    bt, n = x.shape
    x = _shoup(x, tabs_c["twist"][pi], tabs_c["twist_sh"][pi], p)
    n_small = log_n - tabs_c["first_small"]
    for s in range(tabs_c["first_small"]):
        h = (n >> s) >> 1
        x = _fwd_stage_sliced(
            x, h, tabs_c["tw_fwd"][pi, s][None], tabs_c["tw_fwd_sh"][pi, s][None],
            p, p2,
        )
    rows = bt * (n // 128)
    y = x.reshape(rows, 128).T  # [j, (b, block)]
    for k in range(n_small):
        h = 128 >> (k + 1)
        y = _fwd_stage_subl(
            y, h, tabs_c["tw_fwd_col"][pi, k][:, None],
            tabs_c["tw_fwd_col_sh"][pi, k][:, None], p, p2,
        )
    return y.T.reshape(bt, n)


def _inv_ntt_v2(x, pi, tabs_c, p, p2, log_n):
    """Inverse of :func:`_fwd_ntt_v2`; bit-identical to :func:`_inv_ntt`."""
    bt, n = x.shape
    n_small = log_n - tabs_c["first_small"]
    rows = bt * (n // 128)
    y = x.reshape(rows, 128).T
    for k in reversed(range(n_small)):
        h = 128 >> (k + 1)
        y = _inv_stage_subl(
            y, h, tabs_c["tw_inv_col"][pi, k][:, None],
            tabs_c["tw_inv_col_sh"][pi, k][:, None], p, p2,
        )
    x = y.T.reshape(bt, n)
    for s in reversed(range(tabs_c["first_small"])):
        h = (n >> s) >> 1
        x = _inv_stage_sliced(
            x, h, tabs_c["tw_inv"][pi, s][None], tabs_c["tw_inv_sh"][pi, s][None],
            p, p2,
        )
    x = _shoup(x, tabs_c["untwist"][pi], tabs_c["untwist_sh"][pi], p)
    return _condsub(x, p)


def _split4_i8(x):
    """u32 values < 2^30 -> 4 balanced base-256 int8 limbs, concatenated on
    the lane axis: [rows, 128] -> [rows, 512] int8."""
    v = x.astype(I32)
    limbs = []
    for _ in range(3):
        d = v & I32(0xFF)
        d = jnp.where(d > I32(127), d - I32(256), d)
        limbs.append(d)
        v = (v - d) >> I32(8)
    limbs.append(v)  # < 2^30 / 2^24 + 1 <= 65
    return jnp.concatenate([l.astype(jnp.int8) for l in limbs], axis=-1)


def _split4_i8_offset(x):
    """u32 values < 2^30 -> 4 OFFSET base-256 limbs d_j = ((v>>8j)&255)-128
    (int8), concatenated on the lane axis: [rows, 128] -> [rows, 512].

    v = sum_j d_j 2^{8j} + 128*0x01010101; the constant offset is corrected
    by the per-prime bias row (column sums folded at table-build time)."""
    v = x.astype(I32)
    limbs = []
    for j in range(4):
        d = ((v >> I32(8 * j)) & I32(255)) - I32(128) if j else (
            (v & I32(255)) - I32(128)
        )
        limbs.append(d.astype(jnp.int8))
    return jnp.concatenate(limbs, axis=-1)


def _mxu_small_dft(y, pi, w8m_ref, bias_ref, consts, p):
    """All h<128 stages as ONE merged int8 MXU matmul: [rows, 128] u32 (< p)
    -> [rows, 128] u32 (< 2p).

    U = L @ W where L stacks 4 offset data limbs on the contraction axis and
    W's column block j holds limb j of the stacked [2^{8i} M mod p] rows.
    Recombination is a pair fold — V0 = U_0 + 256 U_1, V1 = U_2 + 256 U_3,
    both int32-exact by the row-sum bounds asserted at table build — then
    X = V0 + 2^16 V1 mod p via two Shoup-style reductions; the +2^31
    signed->unsigned biases and the limb offset are one bias-row add.
    ``consts`` = (c16, c16_sh, one_sh) python ints for this prime.
    """
    c16, c16_sh, one_sh = (U32(c) for c in consts)
    L = _split4_i8_offset(y)  # [rows, 512] int8
    U = lax.dot_general(
        L, w8m_ref[pi], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [rows, 512] int32
    V0 = U[:, :128] + (U[:, 128:256] << I32(8))
    V1 = U[:, 256:384] + (U[:, 384:512] << I32(8))
    V0u = V0.astype(U32) + U32(0x80000000)  # = V0 + 2^31 mod 2^32 (exact)
    V1u = V1.astype(U32) + U32(0x80000000)
    q0 = _mul_hi(V0u, one_sh)
    r0 = V0u - q0 * p  # V0u mod p, < 2p (Shoup identity with w = 1)
    r1 = _shoup(V1u, c16, c16_sh, p)  # < 2p
    s = _condsub(r0 + r1, U32(2) * p)  # < 2p
    s = s + bias_ref[pi][None, :]  # bias < p so s < 3p < 2^32
    return _condsub(s, U32(2) * p)  # < 2p


def _fwd_ntt_v3(x, pi, tabs_c, p, p2, log_n, w8_ref):
    """Forward NTT, MXU variant: twist + big sliced stages on the VPU, all
    h<128 stages as one stacked int8 matmul per limb. Returns the result in
    BLOCK layout [Bt*(N/128), 128] (< 2p) — pointwise ops downstream are
    layout-agnostic and the inverse starts in block layout."""
    bt, n = x.shape
    x = _shoup(x, tabs_c["twist"][pi], tabs_c["twist_sh"][pi], p)
    for s in range(tabs_c["first_small"]):
        h = (n >> s) >> 1
        x = _fwd_stage_sliced(
            x, h, tabs_c["tw_fwd"][pi, s][None], tabs_c["tw_fwd_sh"][pi, s][None],
            p, p2,
        )
    x = _condsub(x, p)  # < p for the limb split
    y = x.reshape(bt * (n // 128), 128)
    return _mxu_small_dft(y, pi, w8_ref, tabs_c["fwd_bias"],
                          tabs_c["mxu_consts"][pi], p)


def _inv_ntt_v3(yb, pi, tabs_c, p, p2, log_n, w8i_ref, bt, n):
    """Inverse NTT, MXU variant: input in BLOCK layout (< 2p), inverse small
    stages as matmuls, then the big inverse stages + untwist on the VPU.
    Output [Bt, N] fully reduced < p (same contract as _inv_ntt)."""
    yb = _condsub(yb, p)
    z = _mxu_small_dft(yb, pi, w8i_ref, tabs_c["inv_bias"],
                       tabs_c["mxu_consts"][pi], p)  # < 2p, block layout
    x = z.reshape(bt, n)
    for s in reversed(range(tabs_c["first_small"])):
        h = (n >> s) >> 1
        x = _inv_stage_sliced(
            x, h, tabs_c["tw_inv"][pi, s][None], tabs_c["tw_inv_sh"][pi, s][None],
            p, p2,
        )
    x = _shoup(x, tabs_c["untwist"][pi], tabs_c["untwist_sh"][pi], p)
    return _condsub(x, p)


def _inv_ntt_v3b(yb, pi, tabs_c, p, p2, log_n, w8i_ref, bt, n):
    """Inverse NTT, MXU variant with the big stages in 3-D block layout:
    the matmul output stays as [Bt, N/128, 128] and the h >= 128 butterflies
    slice the middle (group) axis, so the block->flat relayout happens once
    at the very end instead of between the matmul and the stages."""
    yb = _condsub(yb, p)
    z = _mxu_small_dft(yb, pi, w8i_ref, tabs_c["inv_bias"],
                       tabs_c["mxu_consts"][pi], p)  # < 2p
    g = n // 128
    y3 = z.reshape(bt, g, 128)
    for s in reversed(range(tabs_c["first_small"])):
        h = (n >> s) >> 1
        hg = h // 128
        w3 = tabs_c["tw_inv"][pi, s].reshape(g, 128)
        ws3 = tabs_c["tw_inv_sh"][pi, s].reshape(g, 128)
        pieces = []
        for b in range(g // (2 * hg)):
            u = y3[:, b * 2 * hg : b * 2 * hg + hg, :]
            v = y3[:, b * 2 * hg + hg : (b + 1) * 2 * hg, :]
            w = w3[b * 2 * hg + hg : (b + 1) * 2 * hg][None]
            ws = ws3[b * 2 * hg + hg : (b + 1) * 2 * hg][None]
            bw = _shoup(v, w, ws, p)
            pieces.append(_condsub(u + bw, p2))
            pieces.append(_condsub(u + p2 - bw, p2))
        y3 = jnp.concatenate(pieces, axis=1)
    utw = tabs_c["untwist"][pi].reshape(1, g, 128)
    utws = tabs_c["untwist_sh"][pi].reshape(1, g, 128)
    y3 = _shoup(y3, utw, utws, p)
    return _condsub(y3, p).reshape(bt, n)


def _fwd_ntt_v3b(x, pi, tabs_c, p, p2, log_n, w8_ref):
    """Forward NTT, MXU variant with the big stages in 3-D block layout
    (mirror of :func:`_inv_ntt_v3b`): twist and h >= 128 butterflies act on
    [Bt, N/128, 128] with group-axis slices, then the limb matmul."""
    bt, n = x.shape
    g = n // 128
    y3 = x.reshape(bt, g, 128)
    tw = tabs_c["twist"][pi].reshape(1, g, 128)
    tws = tabs_c["twist_sh"][pi].reshape(1, g, 128)
    y3 = _shoup(y3, tw, tws, p)
    for s in range(tabs_c["first_small"]):
        h = (n >> s) >> 1
        hg = h // 128
        w3 = tabs_c["tw_fwd"][pi, s].reshape(g, 128)
        ws3 = tabs_c["tw_fwd_sh"][pi, s].reshape(g, 128)
        pieces = []
        for b in range(g // (2 * hg)):
            a = y3[:, b * 2 * hg : b * 2 * hg + hg, :]
            bb = y3[:, b * 2 * hg + hg : (b + 1) * 2 * hg, :]
            u = _condsub(a + bb, p2)
            t = a + p2 - bb
            w = w3[b * 2 * hg + hg : (b + 1) * 2 * hg][None]
            ws = ws3[b * 2 * hg + hg : (b + 1) * 2 * hg][None]
            pieces.append(u)
            pieces.append(_shoup(t, w, ws, p))
        y3 = jnp.concatenate(pieces, axis=1)
    y = _condsub(y3, p).reshape(bt * g, 128)
    return _mxu_small_dft(y, pi, w8_ref, tabs_c["fwd_bias"],
                          tabs_c["mxu_consts"][pi], p)


def _fwd_ntt(x, pi, tabs_c, p, p2, log_n):
    """Forward negacyclic NTT of residues x (< 2p) for prime index pi.

    ``tabs_c``: dict of jnp constant tables. Output < 2p.
    """
    n = x.shape[-1]
    x = _shoup(x, tabs_c["twist"][pi], tabs_c["twist_sh"][pi], p)
    for s in range(log_n):
        h = (n >> s) >> 1
        w_row = tabs_c["tw_fwd"][pi, s][None]
        wsh_row = tabs_c["tw_fwd_sh"][pi, s][None]
        if h >= _SLICE_MIN_H:
            x = _fwd_stage_sliced(x, h, w_row, wsh_row, p, p2)
        else:
            x = _fwd_stage_rolled(x, h, w_row, wsh_row, tabs_c["upper"][s][None], p, p2)
    return x


def _inv_ntt(x, pi, tabs_c, p, p2, log_n):
    """Inverse transform; input < 2p, output fully reduced < p."""
    n = x.shape[-1]
    for s in reversed(range(log_n)):
        h = (n >> s) >> 1
        w_row = tabs_c["tw_inv"][pi, s][None]
        wsh_row = tabs_c["tw_inv_sh"][pi, s][None]
        if h >= _SLICE_MIN_H:
            x = _inv_stage_sliced(x, h, w_row, wsh_row, p, p2)
        else:
            x = _inv_stage_rolled(x, h, w_row, wsh_row, tabs_c["upper"][s][None], p, p2)
    x = _shoup(x, tabs_c["untwist"][pi], tabs_c["untwist_sh"][pi], p)
    return _condsub(x, p)  # < 2p -> < p (shoup output is already < 2p)


def _negacyclic_rot(hi, lo, a_bits, lane_idx, log_2n):
    """(hi, lo) * X^{a} with per-sublane rotation amount a in [0, 2N).

    ``a_bits``: u32 [Bt, 1]; binary-decomposed conditional static rolls.
    """
    n = hi.shape[-1]
    for j in range(log_2n):
        s = 1 << j
        bit = (a_bits >> U32(j)) & U32(1)
        if s < n:
            rhi = _roll(hi, s, 1)
            rlo = _roll(lo, s, 1)
            nhi, nlo = _neg64(rhi, rlo)
            wrap = lane_idx < U32(s)
            rhi = jnp.where(wrap, nhi, rhi)
            rlo = jnp.where(wrap, nlo, rlo)
        else:  # s == n: X^N = -1
            rhi, rlo = _neg64(hi, lo)
        take = bit != U32(0)
        hi = jnp.where(take, rhi, hi)
        lo = jnp.where(take, rlo, lo)
    return hi, lo


def _decompose_u32(hi, lo, base_log, levels):
    """Balanced signed decomposition of (hi, lo) u64 values; returns a list
    of ``levels`` int32 digit arrays (level ``levels`` first), bit-identical
    to :func:`tfhe_tpu.ops.decomp.decompose`. Requires base_log*levels <= 31.
    """
    rep = base_log * levels
    assert rep <= 31, "kernel decomposition supports base_log*levels <= 31"
    non_rep = 64 - rep  # >= 33: the state comes from the hi limb only
    sh = non_rep - 1 - 32
    res = hi >> U32(sh) if sh else hi
    rounding = res & U32(1)
    res = (res + U32(1)) >> U32(1)
    res = res & U32((1 << rep) - 1)
    shifted_r = rounding << U32(rep - 1)
    need_bal = (((res - U32(1)) | shifted_r) & res) >> U32(rep - 1)
    state = (res - (need_bal << U32(rep))).astype(I32)  # signed
    digits = []
    mod_b = I32((1 << base_log) - 1)
    for _ in range(levels):
        d = state & mod_b
        state = state >> I32(base_log)  # arithmetic shift
        carry = (((d - I32(1)) | state) & d) >> I32(base_log - 1)
        state = state + carry
        digits.append(d - (carry << I32(base_log)))
    return digits


# ---------------------------------------------------------------------------
# the fused step kernel
# ---------------------------------------------------------------------------

def _make_step_kernel(n, num_primes, base_log, levels, R, tabs: _KernelTables,
                      unroll: int = 1, use_v2: bool = True, ablate: str = "",
                      use_mxu: bool = False):
    """``ablate`` (bench-only, breaks correctness): skip one stage to
    measure its in-situ cost — 'ntt' | 'mac' | 'rot' | 'decomp' | 'crt'.
    ``use_mxu``: v3 — all h<128 NTT stages as int8 MXU matmuls."""
    log_n = n.bit_length() - 1
    log_2n = log_n + 1
    plan = tabs.plan
    primes = plan.primes
    P = num_primes
    fwd_fn = _fwd_ntt_v2 if use_v2 else _fwd_ntt
    inv_fn = _inv_ntt_v2 if use_v2 else _inv_ntt
    if ablate == "ntt":
        fwd_fn = inv_fn = lambda x, pi, tabs_c, p, p2, log_n: x
        use_mxu = False

    # Garner constants (python ints baked into the kernel)
    garner_inv = plan.garner_inv
    garner_inv_sh = [int(x) for x in plan.garner_inv_shoup]
    pj_sh = plan.pj_shoup
    prefix = plan.prefix_mod64  # u64 python ints
    full_prod = plan.full_prod_mod64

    def one_step(hi, lo, a_bits, bsk, tabs_c, lane_idx, w8f_ref=None,
                 w8i_ref=None):
        """One blind-rotation step on in-register limb values.

        ``hi``/``lo``: lists of R [Bt, N] u32; ``bsk``: [2, P, l*R, R, N]."""
        digit_polys = []  # [levels * R] of [Bt, N] i32 (level-major)
        per_r_digits = []
        for r in range(R):
            if ablate == "rot":
                dhi, dlo = hi[r], lo[r]
            else:
                rhi, rlo = _negacyclic_rot(hi[r], lo[r], a_bits, lane_idx, log_2n)
                dhi, dlo = _sub64(rhi, rlo, hi[r], lo[r])
            if ablate == "decomp":
                per_r_digits.append([dhi.astype(I32)] * levels)
            else:
                per_r_digits.append(_decompose_u32(dhi, dlo, base_log, levels))
        for lev in range(levels):
            for r in range(R):
                digit_polys.append(per_r_digits[r][lev])

        bt_loc = hi[0].shape[0]
        residues = []  # [P][R] of [Bt, N] u32, canonical < p
        for pi in range(P):
            p = U32(primes[pi])
            p2 = U32(2 * primes[pi])
            dhat = []
            for j in range(levels * R):
                d = digit_polys[j]
                rres = jnp.where(d < I32(0), d + p.astype(I32), d).astype(U32)
                if use_mxu:
                    dhat.append(
                        _fwd_ntt_v3(rres, pi, tabs_c, p, p2, log_n, w8f_ref)
                    )
                else:
                    dhat.append(fwd_fn(rres, pi, tabs_c, p, p2, log_n))
            res_p = []
            for c in range(R):
                if ablate == "mac":
                    acc_m = dhat[c % (levels * R)]
                else:
                    acc_m = None
                    for j in range(levels * R):
                        g = bsk[0, pi, j, c]  # [N]
                        gsh = bsk[1, pi, j, c]
                        if use_mxu:
                            # block layout: view dhat as [Bt, N/128, 128] and
                            # broadcast the GGSW row over the leading batch
                            # axis (free — no materialized tile)
                            g = g.reshape(1, n // 128, 128)
                            gsh = gsh.reshape(1, n // 128, 128)
                            d3 = dhat[j].reshape(bt_loc, n // 128, 128)
                            term = _shoup(d3, g, gsh, p)
                        else:
                            term = _shoup(dhat[j], g[None], gsh[None], p)
                        acc_m = term if acc_m is None else _condsub(acc_m + term, p2)
                if use_mxu:
                    res_p.append(
                        _inv_ntt_v3b(
                            acc_m.reshape(bt_loc * (n // 128), 128), pi,
                            tabs_c, p, p2, log_n, w8i_ref, bt_loc, n,
                        )
                    )
                else:
                    res_p.append(inv_fn(acc_m, pi, tabs_c, p, p2, log_n))
            residues.append(res_p)

        if ablate == "crt":
            for c in range(R):
                ehi = residues[0][c]
                elo = residues[P - 1][c]
                hi[c], lo[c] = _add64(hi[c], lo[c], ehi, elo)
            return hi, lo
        for c in range(R):
            m = [residues[pi][c] for pi in range(P)]
            v = [m[0]]
            for i in range(1, P):
                pi_p = U32(primes[i])
                acc_g = v[i - 1]
                for j in range(i - 2, -1, -1):
                    acc_g = v[j] + _shoup(
                        acc_g, U32(primes[j]), U32(pj_sh[i][j]), pi_p
                    )
                # acc_g < 3*p_i (each v_j < p_j and shoup < 2p_i), so a 3p_i
                # offset keeps diff in (0, 4p_i) without u32 overflow
                diff = U32(3 * primes[i]) + m[i] - acc_g
                vi = _shoup(diff, U32(garner_inv[i - 1]), U32(garner_inv_sh[i - 1]), pi_p)
                vi = _condsub(vi, pi_p)
                v.append(vi)
            pos_hi = jnp.zeros_like(v[0])
            pos_lo = jnp.zeros_like(v[0])
            for i in range(P):
                pre = prefix[i]
                pre_lo = U32(pre & 0xFFFFFFFF)
                pre_hi = U32((pre >> 32) & 0xFFFFFFFF)
                thi, tlo = _mul_hi_lo(v[i], pre_lo)
                thi = thi + v[i] * pre_hi
                pos_hi, pos_lo = _add64(pos_hi, pos_lo, thi, tlo)
            # sign correction: if v_last > p_last/2, subtract prod(primes)
            neg_hi, neg_lo = _sub64(
                pos_hi, pos_lo,
                U32((full_prod >> 32) & 0xFFFFFFFF), U32(full_prod & 0xFFFFFFFF),
            )
            sign = v[P - 1] > U32(primes[P - 1] // 2)
            ehi = jnp.where(sign, neg_hi, pos_hi)
            elo = jnp.where(sign, neg_lo, pos_lo)
            hi[c], lo[c] = _add64(hi[c], lo[c], ehi, elo)
        return hi, lo

    mxu_consts = None
    if getattr(tabs, "fwd_w8m", None) is not None:
        mxu_consts = tuple(
            (int(tabs.c16[i]), int(tabs.c16_sh[i]), int(tabs.one_sh[i]))
            for i in range(P)
        )

    def kernel(a_ref, bsk_ref, tf_ref, tfs_ref, ti_ref, tis_ref, tw_ref,
               tws_ref, utw_ref, utws_ref, up_ref, tfc_ref, tfcs_ref,
               tic_ref, tics_ref, w8f_ref, w8i_ref, biasf_ref, biasi_ref,
               acc_hi_ref, acc_lo_ref, out_hi_ref, out_lo_ref):
        tabs_c = {
            "tw_fwd": tf_ref[:], "tw_fwd_sh": tfs_ref[:],
            "tw_inv": ti_ref[:], "tw_inv_sh": tis_ref[:],
            "twist": tw_ref[:], "twist_sh": tws_ref[:],
            "untwist": utw_ref[:], "untwist_sh": utws_ref[:],
            "upper": up_ref[:],
            "tw_fwd_col": tfc_ref[:], "tw_fwd_col_sh": tfcs_ref[:],
            "tw_inv_col": tic_ref[:], "tw_inv_col_sh": tics_ref[:],
            "first_small": tabs.first_small_stage,
            "mxu_consts": mxu_consts,
            "fwd_bias": biasf_ref[:], "inv_bias": biasi_ref[:],
        }
        lane_idx = lax.broadcasted_iota(U32, (1, n), 1)
        hi = [acc_hi_ref[r] for r in range(R)]
        lo = [acc_lo_ref[r] for r in range(R)]
        for u in range(unroll):
            hi, lo = one_step(
                hi, lo, a_ref[u], bsk_ref[u], tabs_c, lane_idx,
                w8f_ref=w8f_ref, w8i_ref=w8i_ref,
            )
        for c in range(R):
            out_hi_ref[c] = hi[c]
            out_lo_ref[c] = lo[c]

    return kernel


@functools.lru_cache(maxsize=None)
def _build_step_fn(n, num_primes, base_log, levels, R, batch_tile, unroll=1,
                   use_v2=None, ablate="", use_mxu=None):
    """Returns fn(a_ms_u32[U,B,1], bsk_step[U,2,P,l*R,R,N], acc_hi, acc_lo)
    -> (acc_hi, acc_lo), each acc u32[R, B, N]; performs ``unroll`` steps."""
    if use_v2 is None:
        use_v2 = n >= 256 and n % 128 == 0
    if use_mxu is None:
        use_mxu = False
    use_mxu = use_mxu and n >= 256 and n % 128 == 0
    tabs = _get_tables(n, num_primes)
    kernel = _make_step_kernel(n, num_primes, base_log, levels, R, tabs,
                               unroll=unroll, use_v2=use_v2, ablate=ablate,
                               use_mxu=use_mxu)
    P = num_primes
    log_n = n.bit_length() - 1
    n_small = log_n - tabs.first_small_stage

    consts = [
        tabs.tw_fwd, tabs.tw_fwd_sh, tabs.tw_inv, tabs.tw_inv_sh,
        tabs.twist, tabs.twist_sh, tabs.untwist, tabs.untwist_sh, tabs.upper,
        tabs.tw_fwd_col, tabs.tw_fwd_col_sh, tabs.tw_inv_col,
        tabs.tw_inv_col_sh, tabs.fwd_w8m, tabs.inv_w8m,
        tabs.fwd_bias_row, tabs.inv_bias_row,
    ]

    def step(a_ms, bsk_step, acc_hi, acc_lo):
        B = acc_hi.shape[1]
        Bt = min(batch_tile, B)
        assert B % Bt == 0
        grid = (B // Bt,)
        # index maps return explicit int32 zeros: under jax_enable_x64 plain
        # Python 0 literals trace as i64 and Mosaic rejects the mixed tuple
        z = np.int32(0)
        full = lambda shape: pl.BlockSpec(
            shape, (lambda i, _k=len(shape): (z,) * _k), memory_space=pltpu.VMEM
        )
        acc_spec = pl.BlockSpec(
            (R, Bt, n), (lambda i: (z, i, z)), memory_space=pltpu.VMEM
        )
        a_spec = pl.BlockSpec(
            (unroll, Bt, 1), (lambda i: (z, i, z)), memory_space=pltpu.VMEM
        )
        interpret = jax.default_backend() == "cpu"  # tests without a TPU
        out_hi, out_lo = pl.pallas_call(
            kernel,
            grid=grid,
            interpret=interpret,
            in_specs=[
                a_spec,
                full((unroll, 2, P, levels * R, R, n)),
                full((P, log_n, n)), full((P, log_n, n)),
                full((P, log_n, n)), full((P, log_n, n)),
                full((P, n)), full((P, n)), full((P, n)), full((P, n)),
                full((log_n, n)),
                full((P, n_small, min(128, n))), full((P, n_small, min(128, n))),
                full((P, n_small, min(128, n))), full((P, n_small, min(128, n))),
                full((P, 512, 512)), full((P, 512, 512)),
                full((P, 128)), full((P, 128)),
                acc_spec, acc_spec,
            ],
            out_specs=(acc_spec, acc_spec),
            out_shape=(
                jax.ShapeDtypeStruct((R, B, n), jnp.uint32),
                jax.ShapeDtypeStruct((R, B, n), jnp.uint32),
            ),
            input_output_aliases={19: 0, 20: 1},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(a_ms, bsk_step, *[jnp.asarray(c) for c in consts], acc_hi, acc_lo)
        return out_hi, out_lo

    return step


# ---------------------------------------------------------------------------
# v4: transposed four-step NTT kernel
# ---------------------------------------------------------------------------
#
# Coefficients live in TRANSPOSED block layout: a polynomial a_0..a_{N-1} is
# stored as A[j1, j2] = a[j1 + G*j2] with G = N/128 groups (sublane-direction
# axis) and j2 in [0, 128) on lanes.  Writing j = j1 + G*j2 and splitting the
# frequency index k = k2 + 128*k1 (k2 in [0,128), k1 in [0,G)), the negacyclic
# NTT  X[k] = sum_j a_j psi^j omega^{jk}  factors as
#
#   X[k2 + 128 k1] = DFT_G over j1 [ psi^{j1} omega^{j1 k2} *
#                        sum_{j2} (psi^{G j2} omega^{G j2 k2}) A[j1, j2] ]
#
# i.e. (1) a lane-axis DFT_128 with the psi-twist folded into its matrix —
# executed as ONE int8 MXU matmul directly on the raw gadget-decomposition
# digits (which need only ceil((base_log+1)/8) <= 3 int8 limbs, vs 4 for
# full-size residues); (2) a twiddle multiply fused into the limb
# recombination (the (j1,k2)-diagonal rides the two Shoup reductions for
# free); (3) log2(G) butterfly stages along the GROUP axis with scalar
# twiddles.  The inverse mirrors the three steps with psi^{-G j2}/128 folded
# into the inverse matrix and psi^{-j1}/G into the inverse twiddle.
#
# Wins vs v3 (measured rationale in PERF_NOTES.md): no flat<->block
# relayouts anywhere (the accumulator, rotation and CRT all live in the
# transposed layout), a 25% smaller forward matmul fed by a single
# prime-independent limb split, and two fewer VPU Shoup multiplies per
# element (separate twist and recombination reductions are gone).
# Same mathematical contract as ggsw.rs:483-640 external products inside
# bootstrap.rs:294-381 blind rotation (reference file:line cites).


class _KernelTablesV4:
    """Tables for the v4 transposed four-step kernel (per N, primes, blog)."""

    def __init__(self, plan: ntt_mod.NegacyclicNtt, base_log: int):
        n = plan.n
        assert n % 128 == 0 and n >= 256
        G = n // 128
        self.G = G
        self.log_g = G.bit_length() - 1
        P = plan.num_primes
        self.plan = plan
        self.base_log = base_log
        # number of int8 limbs for a balanced digit |d| <= 2^(blog-1),
        # offset-split of u = d + 2^(blog-1) in [0, 2^blog]
        self.nl_in = max(1, -(-(base_log + 1) // 8))
        self.in_offset = 1 << (base_log - 1)

        psi = [ntt_mod._psi_root(p, 2 * n) for p in plan.primes]

        fwd_w8, fwd_bias = [], []
        inv_w8, inv_bias = [], []
        t_tw, t_tw16, t_inv = [], [], []
        gw_f, gw_i = [], []
        for pi, p in enumerate(plan.primes):
            ps = int(psi[pi])
            om = (ps * ps) % p  # order N
            # M[j2, k2] = psi^{G j2} * omega^{G j2 k2} = psi^{G j2 (1+2 k2)}
            M = np.array(
                [[pow(ps, int(G * jj * (1 + 2 * kk)) % (2 * n), p)
                  for kk in range(128)] for jj in range(128)],
                dtype=object,
            )
            W, bias = _merged_limb_matrix_generic(
                M, p, self.nl_in, self.in_offset, max_in=self.in_offset)
            fwd_w8.append(W)
            fwd_bias.append(bias)
            # inverse matrix Minv[k2, j2] = (1/128) psi^{-G j2} omega^{-G j2 k2}
            inv128 = pow(128, p - 2, p)
            Minv = np.array(
                [[(pow(ps, 2 * n - (int(G * jj * (1 + 2 * kk)) % (2 * n)), p)
                   * inv128) % p
                  for jj in range(128)] for kk in range(128)],
                dtype=object,
            )
            Wi, bias_i = _merged_limb_matrix_generic(
                Minv, p, 4, 0, max_in=p - 1)
            inv_w8.append(Wi)
            inv_bias.append(bias_i)
            # twiddle T[j1, k2] = psi^{j1} omega^{j1 k2} = psi^{j1 (1+2 k2)}
            T = np.array(
                [[pow(ps, (jj * (1 + 2 * kk)) % (2 * n), p) for kk in range(128)]
                 for jj in range(G)], dtype=object)
            T16 = (T * pow(2, 16, p)) % p
            invG = pow(G, p - 2, p)
            Tinv = np.array(
                [[(pow(ps, 2 * n - ((jj * (1 + 2 * kk)) % (2 * n)), p) * invG) % p
                  for kk in range(128)] for jj in range(G)], dtype=object)
            # fwd bias folded through the twiddle: biasT = bias[k2]*T[j1,k2]
            biasT = (T * bias[None, :].astype(object)) % p
            t_tw.append(np.stack([
                T.astype(np.uint64), _shoup_obj(T, p),
                T16.astype(np.uint64), _shoup_obj(T16, p),
                biasT.astype(np.uint64)]))
            t_inv.append(np.stack([
                Tinv.astype(np.uint64), _shoup_obj(Tinv, p)]))
            # group-stage twiddles: DIF over j1 with omega_G = omega^128
            wg = pow(om, 128, p)
            fs, is_ = [], []
            for s in range(self.log_g):
                m = G >> s
                h = m >> 1
                wm = pow(wg, G // m, p)
                wmi = pow(wm, p - 2, p)
                row_f = np.zeros(G, dtype=object)
                row_i = np.zeros(G, dtype=object)
                wj, wji = 1, 1
                for j in range(h):
                    # same twiddle for every block at offset h+j
                    for b in range(G // m):
                        row_f[b * m + h + j] = wj
                        row_i[b * m + h + j] = wji
                    wj = (wj * wm) % p
                    wji = (wji * wmi) % p
                fs.append(np.stack([np.array(row_f, dtype=np.uint64),
                                    _shoup_obj(row_f, p)]))
                is_.append(np.stack([np.array(row_i, dtype=np.uint64),
                                     _shoup_obj(row_i, p)]))
            gw_f.append(np.stack(fs) if fs else np.zeros((0, 2, G), np.uint64))
            gw_i.append(np.stack(is_) if is_ else np.zeros((0, 2, G), np.uint64))
        # lane-replicate the group twiddles ([G] -> [G, 128]) so in-kernel
        # slices broadcast over the sublane axis only (Mosaic-friendly)
        gw_f = [np.repeat(a[..., None], 128, axis=-1) for a in gw_f]
        gw_i = [np.repeat(a[..., None], 128, axis=-1) for a in gw_i]

        self.fwd_w8 = np.stack(fwd_w8)          # [P, nl_in*128, 512] i8
        self._fwd_w8_cat = None  # built on first use (stacked path only)
        self.inv_w8 = np.stack(inv_w8)          # [P, 512, 512] i8
        self.inv_bias = np.stack(inv_bias).astype(np.uint32)   # [P, 128]
        self.tw = np.stack(t_tw).astype(np.uint32)    # [P, 5, G, 128]
        self.tw_inv = np.stack(t_inv).astype(np.uint32)  # [P, 2, G, 128]
        self.gw_fwd = np.stack(gw_f).astype(np.uint32)  # [P, log_g, 2, G, 128]
        self.gw_inv = np.stack(gw_i).astype(np.uint32)
        self.c16 = np.array([(1 << 16) % p for p in plan.primes], np.uint32)
        self.c16_sh = np.array(
            [(((1 << 16) % p) << 32) // p for p in plan.primes], np.uint32)
        self.one_sh = np.array([(1 << 32) // p for p in plan.primes], np.uint32)

        # standard->v4 frequency permutation (shared across primes):
        # v4 point (g, l) holds frequency k = l + 128*bitrev_logG(g); the
        # legacy plan's DIF output position q holds frequency bitrev_logN(q).
        log_n = n.bit_length() - 1
        br = np.array([int(format(q, f"0{log_n}b")[::-1], 2) for q in range(n)])
        plan_pos_of_freq = np.argsort(br)  # freq -> plan position
        brg = np.array(
            [int(format(g, f"0{self.log_g}b")[::-1], 2) if self.log_g else 0
             for g in range(G)])
        freq_v4 = (np.arange(128)[None, :] + 128 * brg[:, None]).reshape(-1)
        self.perm_from_plan = plan_pos_of_freq[freq_v4]  # [G*128]

    @property
    def fwd_w8_cat(self):
        """Column-concat across primes: ONE forward matmul computes every
        prime's lane DFT from the shared (prime-independent) digit limbs.
        Lazy: only the opt-in TFHE_V6_STACKED path consumes it."""
        if self._fwd_w8_cat is None:
            self._fwd_w8_cat = np.concatenate(list(self.fwd_w8), axis=1)
        return self._fwd_w8_cat


def _shoup_obj(tbl, p: int) -> np.ndarray:
    flat = [int(x) for x in np.asarray(tbl, dtype=object).reshape(-1)]
    out = np.array([(x << 32) // p for x in flat], dtype=np.uint64)
    return out.reshape(np.asarray(tbl).shape)


def _merged_limb_matrix_generic(M, p: int, nl_in: int, in_offset: int,
                                max_in: int):
    """Merged int8 limb matrix for ``out = in @ M mod p``.

    ``M``: [C, 128] python-int matrix (C = contraction length).  Input values
    v (0 <= v <= max_in after adding ``in_offset``... i.e. u = v + in_offset
    with u in [0, in_offset + max_in]) are offset-split into ``nl_in`` int8
    limbs d_j = ((u >> 8j) & 255) - 128.  Returns (W [nl_in*C, 512] int8,
    bias [128] uint32) such that with U = L @ W (int32) and the pair-fold
    V0 = U[:, :128] + 256*U[:, 128:256], V1 = U[:, 256:384] + 256*U[:, 384:],
    the true value is (V0u + 2^16 V1u + bias) mod p where V?u = V? + 2^31
    (asserted int32-exact via per-column absolute row sums).
    """
    C = M.shape[0]
    assert in_offset + max_in < (1 << (8 * nl_in)), (in_offset, max_in, nl_in)
    # src[j] = output-limb j of the stacked [2^{8a} M mod p] rows (balanced)
    src = np.zeros((4, nl_in * C, 128), dtype=np.int8)
    for a in range(nl_in):
        Wa = np.vectorize(
            lambda x: (int(x) << (8 * a)) % p, otypes=[object])(M)
        Wab = np.vectorize(
            lambda x: int(x) - p if int(x) > p // 2 else int(x),
            otypes=[object])(Wa).astype(np.int64)
        vv = Wab.copy()
        for j in range(4):
            d = vv & 255
            d = np.where(d > 127, d - 256, d)
            src[j, a * C:(a + 1) * C, :] = d.astype(np.int8)
            vv = (vv - d) >> 8
        assert np.all(vv == 0), "limb split residue"
    W = np.concatenate([src[j] for j in range(4)], axis=1)  # [nl_in*C, 512]
    # int32-exactness of the pair fold: |L| <= 128
    bnd = [int((np.abs(src[j].astype(np.int64)).sum(axis=0) * 128).max())
           for j in range(4)]
    assert bnd[0] + 256 * bnd[1] < 2**31 - 1, bnd
    assert bnd[2] + 256 * bnd[3] < 2**31 - 1, bnd
    # bias: +2^31 un-biasing of the two folds, plus the limb-offset
    # correction through the matrix column sums: true input
    # v = sum_a d_a 2^{8a} + OFF with OFF = 128*sum_a 2^{8a} - in_offset.
    off = 128 * sum(1 << (8 * a) for a in range(nl_in)) - in_offset
    colsum = [sum(int(M[c, k]) for c in range(C)) for k in range(128)]
    bias = np.zeros(128, dtype=np.uint32)
    for k in range(128):
        bias[k] = ((-(1 << 31) * (1 + (1 << 16)) + off * colsum[k]) % p)
    return W, bias


@functools.lru_cache(maxsize=None)
def _get_tables_v4(n: int, num_primes: int, base_log: int,
                   primes: tuple = None) -> _KernelTablesV4:
    """``primes``: custom prime set (the v6b FAST28 flavor); None = the
    leading PRIMES32 (v4/v6 default). The table builder is fully generic
    over the plan's primes."""
    return _KernelTablesV4(ntt_mod.get_plan(n, num_primes, primes=primes),
                           base_log)


def _split_digits_i8(d, nl_in: int, in_offset: int):
    """Signed digits [G, Bt, 128] i32 (|d| <= in_offset) -> offset int8 limbs
    [G*Bt, nl_in*128] (prime-independent)."""
    g, bt, _ = d.shape
    u = (d + I32(in_offset)).reshape(g * bt, 128)
    limbs = [(((u >> I32(8 * j)) & I32(255)) - I32(128)).astype(jnp.int8)
             for j in range(nl_in)]
    return jnp.concatenate(limbs, axis=-1)


def _pair_fold_u(U):
    """[rows, 512] int32 -> biased u32 pair (V0u, V1u)."""
    V0 = U[:, :128] + (U[:, 128:256] << I32(8))
    V1 = U[:, 256:384] + (U[:, 384:512] << I32(8))
    return (V0.astype(U32) + U32(0x80000000),
            V1.astype(U32) + U32(0x80000000))


def _fwd_ntt_v4(L, pi, t4c, p, p2, bt, G, lazy=False):
    """Forward transform from pre-split digit limbs.

    ``L``: [G*Bt, nl_in*128] int8.  Returns [G, Bt, 128] u32 < 2p in v4
    point order (lane = k mod 128, group g holds k1 = bitrev(g)).
    Group-leading layout: each [Bt, 128] slab is a native vreg tile, so the
    group-axis butterflies are whole-register selects (no sublane shuffles).
    ``lazy`` (sub-2^29 primes only): outputs < 4p, one condsub fewer.
    """
    U = lax.dot_general(L, t4c["fwd_w8"][pi], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    return _fwd_tail_v4(U, pi, t4c, p, p2, bt, G, lazy=lazy)


def _fwd_tail_v4(U, pi, t4c, p, p2, bt, G, lazy=False):
    """Twiddle scaling + group-axis DIF stages applied to the raw int32
    lane-DFT matmul output ``U`` [G*Bt, 512] for one prime (the post-dot
    half of :func:`_fwd_ntt_v4`, split out so a caller can fuse several
    polynomials/primes into one big matmul and feed per-prime slices).

    ``lazy`` (valid iff 8p < 2^32, i.e. the FAST28 flavor): the stage
    invariant is relaxed from < 2p to < 4p — the twiddle-scale sum s < 4p
    skips its condsub, s + tw4 < 6p folds once to < 4p, and the DIF
    butterflies run with the 4p constant (u = a+bb < 8p < 2^32 exact,
    condsub(,4p) -> < 4p; Shoup inputs t = a + 4p - bb < 8p are in the
    Shoup contract a < 2^32 -> out < 2p). Outputs < 4p."""
    V0u, V1u = _pair_fold_u(U)
    tw = t4c["tw"][pi]  # [5, G, 128]
    V0u = V0u.reshape(G, bt, 128)
    V1u = V1u.reshape(G, bt, 128)
    s = _shoup(V0u, tw[0][:, None, :], tw[1][:, None, :], p)
    s = s + _shoup(V1u, tw[2][:, None, :], tw[3][:, None, :], p)  # < 4p
    if lazy:
        cstage = p2 + p2
        s = _condsub(s + tw[4][:, None, :], p2)  # < 6p - 2p -> < 4p
    else:
        cstage = p2
        s = _condsub(s, p2)
        s = _condsub(s + tw[4][:, None, :], p2)  # < 2p
    # group-axis DIF stages (slices on the leading axis)
    for st in range(t4c["log_g"]):
        h = (G >> st) >> 1
        w = t4c["gw_fwd"][pi, st, 0][:, None, :]
        wsh = t4c["gw_fwd"][pi, st, 1][:, None, :]
        pieces = []
        m = G >> st
        for b in range(G // m):
            a = s[b * m: b * m + h]
            bb = s[b * m + h: (b + 1) * m]
            u = _condsub(a + bb, cstage)
            t = a + cstage - bb
            v = _shoup(t, w[b * m + h: (b + 1) * m],
                       wsh[b * m + h: (b + 1) * m], p)
            pieces.extend([u, v])
        s = jnp.concatenate(pieces, axis=0)
    return s


def _inv_ntt_v4(y, pi, t4c, p, p2, bt, G, lazy=False):
    """Inverse transform: [G, Bt, 128] u32 < 2p (< 4p when ``lazy``) ->
    standard-domain coefficients (transposed layout), canonical < p.

    ``lazy`` (8p < 2^32 only): stages run with the 4p constant — inputs
    < 4p, bw = Shoup(v) < 2p, u + bw < 6p and u + 4p - bw < 8p both fold
    once to < 4p; the final canonical Shoup + condsub are unchanged."""
    cstage = p2 + p2 if lazy else p2
    for st in reversed(range(t4c["log_g"])):
        h = (G >> st) >> 1
        w = t4c["gw_inv"][pi, st, 0][:, None, :]
        wsh = t4c["gw_inv"][pi, st, 1][:, None, :]
        pieces = []
        m = G >> st
        for b in range(G // m):
            u = y[b * m: b * m + h]
            v = y[b * m + h: (b + 1) * m]
            bw = _shoup(v, w[b * m + h: (b + 1) * m],
                        wsh[b * m + h: (b + 1) * m], p)
            pieces.append(_condsub(u + bw, cstage))
            pieces.append(_condsub(u + cstage - bw, cstage))
        y = jnp.concatenate(pieces, axis=0)
    ti = t4c["tw_inv"][pi]
    y = _shoup(y, ti[0][:, None, :], ti[1][:, None, :], p)  # < 2p
    y = _condsub(y, p)
    # 4-limb offset split + inverse matmul
    limbs = [((((y.reshape(G * bt, 128)).astype(I32) >> I32(8 * j)) & I32(255))
              - I32(128)).astype(jnp.int8) for j in range(4)]
    L = jnp.concatenate(limbs, axis=-1)
    U = lax.dot_general(L, t4c["inv_w8"][pi], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    V0u, V1u = _pair_fold_u(U)
    c16, c16_sh, one_sh = t4c["mxu_consts"][pi]
    if _SHOUP_MODE == "approx":
        # Barrett fold with the cheap mulhi: q undershoots by <= 2, so the
        # raw remainder lands in [0, 4p); fold back under 2p (mod p intact)
        q0 = _mul_hi_approx(V0u, U32(one_sh))
        r0 = _condsub_wide(V0u - q0 * p, p + p)
    else:
        q0 = _mul_hi(V0u, U32(one_sh))
        r0 = V0u - q0 * p
    r1 = _shoup(V1u, U32(c16), U32(c16_sh), p)
    s = _condsub(r0 + r1, p2)
    s = _condsub(s + t4c["inv_bias"][pi][None, :], p2)
    s = _condsub(s, p)
    return s.reshape(G, bt, 128)


def _negacyclic_rot_v4(hi, lo, a_bits, lane_idx, G, log_2n):
    """(hi, lo) [G, Bt, 128] * X^a, a in [0, 2N) per-batch ([1, Bt, 1])."""
    for t in range(log_2n):
        s = 1 << t
        bit = (a_bits >> U32(t)) & U32(1)
        if s >= 128 * G:  # s == N: X^N = -1
            rhi, rlo = _neg64(hi, lo)
        elif s >= G:
            sl = s // G
            if sl < 128:
                rhi = _roll(hi, sl, 2)
                rlo = _roll(lo, sl, 2)
                nhi, nlo = _neg64(rhi, rlo)
                wrap = lane_idx < U32(sl)
                rhi = jnp.where(wrap, nhi, rhi)
                rlo = jnp.where(wrap, nlo, rlo)
            else:  # sl == 128: X^N = -1
                rhi, rlo = _neg64(hi, lo)
        else:
            # group shift by s with carry into the lane direction: the s
            # wrapped groups get an extra lane roll with a sign flip at lane 0
            thi, tlo = hi[G - s:], lo[G - s:]
            rthi = _roll(thi, 1, 2)
            rtlo = _roll(tlo, 1, 2)
            nhi, nlo = _neg64(rthi, rtlo)
            wrap = lane_idx < U32(1)
            rthi = jnp.where(wrap, nhi, rthi)
            rtlo = jnp.where(wrap, nlo, rtlo)
            rhi = jnp.concatenate([rthi, hi[:G - s]], axis=0)
            rlo = jnp.concatenate([rtlo, lo[:G - s]], axis=0)
        take = bit != U32(0)
        hi = jnp.where(take, rhi, hi)
        lo = jnp.where(take, rlo, lo)
    return hi, lo


def _negacyclic_rot_v4_hi(hi, a_bits, lane_idx, G, log_2n):
    """Single-plane variant of :func:`_negacyclic_rot_v4` for the acc32
    accumulator (acc_u64 = hi * 2^32, so negation mod 2^64 is negation of
    the hi plane mod 2^32)."""
    for t in range(log_2n):
        s = 1 << t
        bit = (a_bits >> U32(t)) & U32(1)
        if s >= 128 * G:  # s == N: X^N = -1
            rhi = U32(0) - hi
        elif s >= G:
            sl = s // G
            if sl < 128:
                rhi = _roll(hi, sl, 2)
                wrap = lane_idx < U32(sl)
                rhi = jnp.where(wrap, U32(0) - rhi, rhi)
            else:  # sl == 128: X^N = -1
                rhi = U32(0) - hi
        else:
            thi = hi[G - s:]
            rthi = _roll(thi, 1, 2)
            wrap = lane_idx < U32(1)
            rthi = jnp.where(wrap, U32(0) - rthi, rthi)
            rhi = jnp.concatenate([rthi, hi[:G - s]], axis=0)
        take = bit != U32(0)
        hi = jnp.where(take, rhi, hi)
    return hi


def _make_step_kernel_v4(n, num_primes, base_log, levels, R,
                         tabs4: _KernelTablesV4, unroll: int = 1,
                         acc32: bool = False, ablate: str = "",
                         garner_chunk: int = 0, bnf2: bool = False,
                         stacked: bool = False, bnf2_flavor=None):
    log_2n = n.bit_length()
    G = tabs4.G
    P = num_primes
    plan = tabs4.plan
    primes = plan.primes
    garner_inv = plan.garner_inv
    garner_inv_sh = [int(x) for x in plan.garner_inv_shoup]
    pj_sh = plan.pj_shoup
    prefix = plan.prefix_mod64
    full_prod = plan.full_prod_mod64
    mxu_consts = tuple(
        (int(tabs4.c16[i]), int(tabs4.c16_sh[i]), int(tabs4.one_sh[i]))
        for i in range(P))
    if bnf2:
        # v6: 2-prime BNF recombination constants (ops/bnf2.py is the spec)
        from . import bnf2 as bnf2_mod

        if bnf2_flavor is None:
            bnf2_flavor = bnf2_mod.DEFAULT
        assert P == 2 and primes == bnf2_flavor.primes, (
            primes, bnf2_flavor.primes)
        # lazy in-kernel reduction: 8*max(p) < 2^32 lets the forward
        # transform enter the group stages at < 4p and (for <= 2 MAC
        # terms) the MAC chain skip its per-term condsub (bounds in
        # _fwd_tail_v4/_inv_ntt_v4/one_step comments)
        lazy = bnf2_flavor.lazy
        lazy_mac = lazy and levels * R <= 2
    else:
        lazy = False
        lazy_mac = False

    # timing-only ablation switches (tools/v4_ablate.py): each named piece
    # is replaced by a shape/dtype-preserving stub so t_full - t_ablated
    # measures its in-situ marginal cost; outputs are garbage when set.
    # The value arrives as an explicit build argument (part of the
    # _build_step_fn_v4 cache key — a leaked env var can no longer silently
    # poison a cached kernel; blind_rotate_pallas warns loudly when active)
    abl = frozenset(filter(None, ablate.split(",")))

    def garner_c(m):
        """Garner digits then mixed-radix Horner to a centered u64 pair.

        value = v0 + p0*(v1 + p1*(v2 + p2*v3)) mod 2^64, minus the full
        prime product when the top digit says the centered value is
        negative. Horner needs one u32 mul_hi per level (vs one per
        prime for the prefix-product form) and keeps only the running
        pair live.
        """
        v = [m[0]]
        for i in range(1, P):
            pi_p = U32(primes[i])
            acc_g = v[i - 1]
            for j in range(i - 2, -1, -1):
                acc_g = v[j] + _shoup(
                    acc_g, U32(primes[j]), U32(pj_sh[i][j]), pi_p)
            diff = U32(3 * primes[i]) + m[i] - acc_g
            vi = _shoup(diff, U32(garner_inv[i - 1]),
                        U32(garner_inv_sh[i - 1]), pi_p)
            v.append(_condsub(vi, pi_p))
        pos_hi = jnp.zeros_like(v[0])
        pos_lo = v[P - 1]
        for i in range(P - 2, -1, -1):
            pc = U32(primes[i])
            nlo = pos_lo * pc
            nhi = _mul_hi(pos_lo, pc) + pos_hi * pc
            pos_lo = nlo + v[i]
            pos_hi = nhi + (pos_lo < nlo).astype(U32)
        neg_hi, neg_lo = _sub64(
            pos_hi, pos_lo,
            U32((full_prod >> 32) & 0xFFFFFFFF),
            U32(full_prod & 0xFFFFFFFF))
        sign = v[P - 1] > U32(primes[P - 1] // 2)
        return (jnp.where(sign, neg_hi, pos_hi),
                jnp.where(sign, neg_lo, pos_lo))

    # flavor constants for the bnf2 tail (DEFAULT unless a custom flavor
    # was threaded through _build_step_fn_v4; S1 + S2 = 32 so every
    # u32-pair shift below is expressible in the two)
    if bnf2:
        _fl = bnf2_flavor
        _S1, _S2 = _fl.s1, _fl.s2  # python ints: U32() inside the kernel

    def bnf2_c(m):
        """v6 recombination: 2-term CRT merge to x in [0, q') then the
        fixed-point switch back to the 2^64 torus (spec: ops/bnf2.py
        ``crt2_merge`` + ``qp_to_torus``, mirrored bit for bit; shifts
        S1 = 64 - SHIFT, S2 = 32 - S1 from the flavor)."""
        p1 = U32(_fl.p1)
        # v1 = (r1 - r0) * inv01 mod p1  (r0 < p0 < 2*p1: diff < 3p1)
        diff = p1 + p1 + m[1] - m[0]
        v1 = _condsub(_shoup(diff, U32(_fl.inv01), U32(_fl.inv01_sh), p1),
                      p1)
        # x = r0 + p0 * v1 < q' < 2^60
        x_hi, x_lo = _mul_hi_lo(v1, U32(_fl.p0))
        nlo = x_lo + m[0]
        x_hi = x_hi + (nlo < x_lo).astype(U32)
        x_lo = nlo
        # t = (x<<S1) + ((x0*G1 + x1*G0) >> S2) + ((x1*G1) << S1) mod 2^64
        b_hi, b_lo = _mul_hi_lo(x_lo, U32(_fl.g1))
        c_hi, c_lo = _mul_hi_lo(x_hi, U32(_fl.g0))
        d_hi, d_lo = _mul_hi_lo(x_hi, U32(_fl.g1))
        s_lo = b_lo + c_lo
        s_hi = b_hi + c_hi + (s_lo < b_lo).astype(U32)  # s < 2^61
        S1, S2 = U32(_S1), U32(_S2)
        r_lo = (s_lo >> S2) | (s_hi << S1)
        r_hi = s_hi >> S2
        u_hi, u_lo = _add64(r_hi, r_lo,
                            (d_hi << S1) | (d_lo >> S2),
                            d_lo << S1)
        return _add64(u_hi, u_lo,
                      (x_hi << S1) | (x_lo >> S2),
                      x_lo << S1)

    def bnf2_c32(m):
        """acc32 v6 tail: round(CRT(m0, m1) * 2^32 / q') directly as
        ONE u32 plane (spec: ops/bnf2.py ``qp_to_torus32``, mirrored
        bit for bit) — the full 64-bit merge + switch-back collapses
        to one Shoup multiply and one widening multiply per element.
        The 28/4 shift pair is C1T's fixed 2^60 scale (flavor-invariant);
        only the r0-term shift is the flavor's S2."""
        p1 = U32(_fl.p1)
        # v1 = (r1 + 2*p1 - r0) * inv01 mod p1 (diff < 3*p1 < 2^32)
        diff = p1 + p1 + m[1] - m[0]
        v1 = _condsub(_shoup(diff, U32(_fl.inv01), U32(_fl.inv01_sh), p1),
                      p1)
        s_hi, s_lo = _mul_hi_lo(v1, U32(_fl.c1t))  # v1*C1T < 2^60
        t1 = (s_hi << U32(4)) | (s_lo >> U32(28))
        return t1 + (m[0] >> U32(_S2)) + U32(_fl.t32_bias)

    recomb = bnf2_c if bnf2 else garner_c

    def one_step(hi, lo, a_bits, bsk, t4c, lane_idx):
        """hi/lo: lists of R [G, Bt, 128]; bsk: [2, P, l*R, R, G, 128].
        acc32 mode: lo is None; acc_u64 = hi * 2^32 (every increment is
        rounded to a multiple of 2^32 — see garner tail)."""
        bt = hi[0].shape[1]
        per_r_digits = []
        for r in range(R):
            if acc32:
                if "rot" in abl:
                    dhi = hi[r]
                else:
                    rhi = _negacyclic_rot_v4_hi(hi[r], a_bits, lane_idx,
                                                G, log_2n)
                    dhi = rhi - hi[r]
                dlo = dhi  # unused: the decomposer reads the hi limb only
            elif "rot" in abl:
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
        # shared prime-independent limb split
        if "split" in abl:
            Ls = [jnp.concatenate(
                [(d.reshape(G * bt, 128) & I32(127)).astype(jnp.int8)]
                * tabs4.nl_in, axis=-1) for d in digit_polys]
        else:
            Ls = [_split_digits_i8(d, tabs4.nl_in, tabs4.in_offset)
                  for d in digit_polys]

        residues = []
        for pi in range(P):
            p = U32(primes[pi])
            p2 = U32(2 * primes[pi])
            if "fwd" in abl:
                dhat = [(L[:, :128].astype(I32) & I32(0xFFFF))
                        .astype(U32).reshape(G, bt, 128) for L in Ls]
            else:
                dhat = [_fwd_ntt_v4(L, pi, t4c, p, p2, bt, G, lazy=lazy)
                        for L in Ls]
            res_p = []
            for c in range(R):
                if "mac" in abl:
                    acc_m = dhat[c % len(dhat)]
                else:
                    acc_m = None
                    for j in range(levels * R):
                        g = bsk[0, pi, j, c][:, None, :]     # [G, 1, 128]
                        gsh = bsk[1, pi, j, c][:, None, :]
                        term = _shoup(dhat[j], g, gsh, p)
                        if acc_m is None:
                            acc_m = term
                        elif lazy_mac:
                            # terms < 2p each; <= 2 of them keeps the sum
                            # < 4p, inside the lazy inverse's invariant
                            acc_m = acc_m + term
                        else:
                            acc_m = _condsub(acc_m + term, p2)
                if "inv" in abl:
                    res_p.append(_condsub(acc_m, p))
                else:
                    res_p.append(_inv_ntt_v4(acc_m, pi, t4c, p, p2, bt, G,
                                             lazy=lazy))
            residues.append(res_p)


        # live-register relief: optionally run the recombination in G-slices
        # so the chain's ~10 concurrently-live [G, Bt, 128] tensors shrink
        # to [gch, Bt, 128] (64 physical vregs; whole-plane chains spill)
        gch = garner_chunk
        for c in range(R):
            m = [residues[pi][c] for pi in range(P)]
            if "garner" in abl:
                if acc32:
                    hi[c] = hi[c] + m[0]
                else:
                    hi[c], lo[c] = _add64(hi[c], lo[c], m[0], m[P - 1])
                continue
            if bnf2 and acc32:
                # the fused hi-plane tail; no lo limb ever materializes
                if 0 < gch < G:
                    t32 = jnp.concatenate(
                        [bnf2_c32([x[g0:g0 + gch] for x in m])
                         for g0 in range(0, G, gch)], axis=0)
                else:
                    t32 = bnf2_c32(m)
                hi[c] = hi[c] + t32
                continue
            if 0 < gch < G:
                parts = [recomb([x[g0:g0 + gch] for x in m])
                         for g0 in range(0, G, gch)]
                ehi = jnp.concatenate([t[0] for t in parts], axis=0)
                elo = jnp.concatenate([t[1] for t in parts], axis=0)
            else:
                ehi, elo = recomb(m)
            if acc32:
                # round the increment to a multiple of 2^32:
                # round(x / 2^32) = ehi + [elo >= 2^31] — the only acc32
                # deviation from the exact path (contract mirrored by the
                # jnp oracle's acc_round32 flag)
                hi[c] = hi[c] + ehi + (elo >> U32(31))
            else:
                hi[c], lo[c] = _add64(hi[c], lo[c], ehi, elo)
        return hi, lo

    def one_step_stacked(hi, a_bits, bsk, t4c, lane_idx):
        """acc32 + bnf2 fast path, bit-exact with :func:`one_step`.

        Every per-polynomial VPU stage (rotate, decompose, limb split,
        forward tail, inverse, recombination) runs ONCE on a single
        sublane-stacked tensor [G, (l*)R*Bt, 128] instead of R (or l*R)
        times on [G, Bt, 128] slabs, and the 4 small forward matmuls fuse
        into one [G*l*R*Bt, nl*128] x [nl*128, P*512] int8 dot (the digit
        limbs are prime-independent; ``fwd_w8_cat``), the 4 inverse ones
        into 2 per-prime row-stacked dots. Stacking is pure layout — each
        element sees the identical op sequence, so kernel-vs-oracle
        bit-exactness is untouched. Measured: the unstacked step spent
        ~36% of its time in recombination/overheads (ABLATE_V6_r04.jsonl);
        fewer, larger ops cut Mosaic dispatch and register pressure."""
        bt = hi[0].shape[1]
        H = jnp.concatenate(hi, axis=1)  # [G, R*bt, 128]
        aR = jnp.concatenate([a_bits] * R, axis=1)
        if "rot" in abl:
            dH = H
        else:
            rH = _negacyclic_rot_v4_hi(H, aR, lane_idx, G, log_2n)
            dH = rH - H
        if "decomp" in abl:
            digs = [dH.astype(I32)] * levels
        else:
            digs = _decompose_u32(dH, dH, base_log, levels)
        # [G, levels*R*bt, 128]; block j = lev*R + r matches the bsk j axis
        DIG = digs[0] if levels == 1 else jnp.concatenate(digs, axis=1)
        btf = levels * R * bt
        if "split" in abl:
            L = jnp.concatenate(
                [(DIG.reshape(G * btf, 128) & I32(127)).astype(jnp.int8)]
                * tabs4.nl_in, axis=-1)
        else:
            L = _split_digits_i8(DIG, tabs4.nl_in, tabs4.in_offset)
        dhat = []
        if "fwd" in abl:
            for pi in range(P):
                dhat.append((L[:, :128].astype(I32) & I32(0xFFFF))
                            .astype(U32).reshape(G, btf, 128))
        else:
            U = lax.dot_general(L, t4c["fwd_w8"][:],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            for pi in range(P):
                p = U32(primes[pi])
                dhat.append(_fwd_tail_v4(
                    U[:, pi * 512:(pi + 1) * 512], pi, t4c, p,
                    U32(2 * primes[pi]), btf, G))
        residues = []
        for pi in range(P):
            p = U32(primes[pi])
            p2 = U32(2 * primes[pi])
            outs = []
            for c in range(R):
                if "mac" in abl:
                    acc_m = lax.slice_in_dim(dhat[pi], 0, bt, axis=1)
                else:
                    acc_m = None
                    for j in range(levels * R):
                        dj = lax.slice_in_dim(dhat[pi], j * bt,
                                              (j + 1) * bt, axis=1)
                        g = bsk[0, pi, j, c][:, None, :]
                        gsh = bsk[1, pi, j, c][:, None, :]
                        term = _shoup(dj, g, gsh, p)
                        acc_m = (term if acc_m is None
                                 else _condsub(acc_m + term, p2))
                outs.append(acc_m)
            Y = jnp.concatenate(outs, axis=1)  # [G, R*bt, 128]
            if "inv" in abl:
                residues.append(_condsub(Y, p))
            else:
                residues.append(_inv_ntt_v4(Y, pi, t4c, p, p2, R * bt, G))
        if "garner" in abl:
            t32 = residues[0]
        else:
            gch = garner_chunk
            if 0 < gch < G:
                t32 = jnp.concatenate(
                    [bnf2_c32([x[g0:g0 + gch] for x in residues])
                     for g0 in range(0, G, gch)], axis=0)
            else:
                t32 = bnf2_c32(residues)
        H = H + t32
        return [lax.slice_in_dim(H, c * bt, (c + 1) * bt, axis=1)
                for c in range(R)]

    def _t4c(fw_ref, iw_ref, tw_ref, ti_ref, gf_ref, gi_ref, ib_ref):
        return {
            "fwd_w8": fw_ref, "inv_w8": iw_ref,
            "tw": tw_ref[:], "tw_inv": ti_ref[:],
            "gw_fwd": gf_ref[:], "gw_inv": gi_ref[:],
            "inv_bias": ib_ref[:], "log_g": tabs4.log_g,
            "mxu_consts": mxu_consts,
        }

    def kernel(a_ref, bsk_ref, fw_ref, iw_ref, tw_ref, ti_ref, gf_ref,
               gi_ref, ib_ref, acc_hi_ref, acc_lo_ref, out_hi_ref,
               out_lo_ref):
        t4c = _t4c(fw_ref, iw_ref, tw_ref, ti_ref, gf_ref, gi_ref, ib_ref)
        lane_idx = lax.broadcasted_iota(U32, (1, 1, 128), 2)
        hi = [acc_hi_ref[r] for r in range(R)]
        lo = [acc_lo_ref[r] for r in range(R)]
        for u in range(unroll):
            hi, lo = one_step(hi, lo, a_ref[u], bsk_ref[u], t4c, lane_idx)
        for c in range(R):
            out_hi_ref[c] = hi[c]
            out_lo_ref[c] = lo[c]

    def kernel32(a_ref, bsk_ref, fw_ref, iw_ref, tw_ref, ti_ref, gf_ref,
                 gi_ref, ib_ref, acc_ref, out_ref):
        t4c = _t4c(fw_ref, iw_ref, tw_ref, ti_ref, gf_ref, gi_ref, ib_ref)
        lane_idx = lax.broadcasted_iota(U32, (1, 1, 128), 2)
        hi = [acc_ref[r] for r in range(R)]
        for u in range(unroll):
            if stacked:
                # stacked path (fw_ref holds tabs4.fwd_w8_cat)
                hi = one_step_stacked(hi, a_ref[u], bsk_ref[u], t4c,
                                      lane_idx)
            else:
                hi, _ = one_step(hi, None, a_ref[u], bsk_ref[u], t4c,
                                 lane_idx)
        for c in range(R):
            out_ref[c] = hi[c]

    return kernel32 if acc32 else kernel


class _DotRef:
    """Wrapper letting the kernel index a matrix ref lazily: ref[pi] loads
    the [*, 512] int8 matrix for one prime."""

    def __init__(self, ref):
        self._ref = ref

    def __getitem__(self, pi):
        return self._ref[pi]


@functools.lru_cache(maxsize=None)
def _build_step_fn_v4(n, num_primes, base_log, levels, R, batch_tile,
                      unroll=1, acc32=False, ablate="", garner_chunk=0,
                      bnf2=False, stacked=False, bnf2_flavor=None):
    """fn(a_ms[U,1,B,1], bsk_step[U,2,P,l*R,R,G,128], acc_hi, acc_lo)
    -> (acc_hi, acc_lo), accs u32[R, G, B, 128] in group-leading transposed
    layout. acc32: single-plane accumulator (acc_u64 = hi * 2^32);
    fn(a_ms, bsk_step, acc) -> acc. ``ablate``/``garner_chunk`` are part of
    the cache key (bench-only; see _make_step_kernel_v4). ``bnf2``: the
    2-prime BNF recombination tail (v6, ops/bnf2.py spec)."""
    # the stacked kernel is written for the single-plane accumulator only;
    # feeding fwd_w8_cat to the two-plane kernel's per-prime indexing would
    # be a runtime shape mismatch — fail loudly at build time instead
    assert not stacked or (acc32 and bnf2), \
        "stacked=True requires acc32=True and bnf2=True"
    # custom flavor (FAST28): its prime pair replaces the leading PRIMES32
    # in the plan/tables; the stacked kernel is not flavor-aware
    assert bnf2_flavor is None or (bnf2 and not stacked)
    fl_primes = bnf2_flavor.primes if bnf2_flavor is not None else None
    tabs4 = _get_tables_v4(n, num_primes, base_log, primes=fl_primes)
    kernel = _make_step_kernel_v4(n, num_primes, base_log, levels, R, tabs4,
                                  unroll=unroll, acc32=acc32, ablate=ablate,
                                  garner_chunk=garner_chunk, bnf2=bnf2,
                                  stacked=stacked, bnf2_flavor=bnf2_flavor)
    P = num_primes
    G = tabs4.G
    # the stacked v6 path consumes the column-concatenated forward matrix
    # through the same const slot ([:] load instead of [pi] indexing)
    fwd_mat = tabs4.fwd_w8_cat if stacked else tabs4.fwd_w8
    consts = [fwd_mat, tabs4.inv_w8, tabs4.tw, tabs4.tw_inv,
              tabs4.gw_fwd, tabs4.gw_inv, tabs4.inv_bias]

    def wrapped_kernel(a_ref, bsk_ref, fw_ref, iw_ref, *rest):
        kernel(a_ref, bsk_ref, _DotRef(fw_ref), _DotRef(iw_ref), *rest)

    def _specs(B):
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
            full((unroll, 2, P, levels * R, R, G, 128)),
            full(tuple(consts[0].shape)), full(tuple(consts[1].shape)),
            full(tuple(consts[2].shape)), full(tuple(consts[3].shape)),
            full(tuple(consts[4].shape)), full(tuple(consts[5].shape)),
            full(tuple(consts[6].shape)),
        ]
        return (B // Bt,), in_specs, acc_spec

    interpret_default = lambda: jax.default_backend() == "cpu"

    if acc32:
        def step(a_ms, bsk_step, acc):
            B = acc.shape[2]
            grid, in_specs, acc_spec = _specs(B)
            out = pl.pallas_call(
                wrapped_kernel,
                grid=grid,
                interpret=interpret_default(),
                in_specs=in_specs + [acc_spec],
                out_specs=acc_spec,
                out_shape=jax.ShapeDtypeStruct((R, G, B, 128), jnp.uint32),
                input_output_aliases={9: 0},
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024,
                ),
            )(a_ms, bsk_step, *[jnp.asarray(c) for c in consts], acc)
            return out

        return step

    def step(a_ms, bsk_step, acc_hi, acc_lo):
        B = acc_hi.shape[2]
        grid, in_specs, acc_spec = _specs(B)
        out_hi, out_lo = pl.pallas_call(
            wrapped_kernel,
            grid=grid,
            interpret=interpret_default(),
            in_specs=in_specs + [acc_spec, acc_spec],
            out_specs=(acc_spec, acc_spec),
            out_shape=(
                jax.ShapeDtypeStruct((R, G, B, 128), jnp.uint32),
                jax.ShapeDtypeStruct((R, G, B, 128), jnp.uint32),
            ),
            input_output_aliases={9: 0, 10: 1},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(a_ms, bsk_step, *[jnp.asarray(c) for c in consts], acc_hi, acc_lo)
        return out_hi, out_lo

    return step


@functools.lru_cache(maxsize=None)
def _build_body_rot_fn_v4(n: int, R: int, batch_tile: int, acc32: bool):
    """Pallas prologue: per-ciphertext negacyclic body rotation of the
    accumulator IN the transposed [R, G, B, 128] layout.

    Replaces ``monomial_div(lut, body)`` — a per-row gather on the minor
    axis that XLA lowers catastrophically (measured 142 us/ct at B=1024,
    23% of the whole 2_2 PBS; /tmp-probe 2026-08-20) — with the same
    conditional-static-roll ladder the step kernel uses for X^{a_i}
    (``_negacyclic_rot_v4``), ~1 us/ct. ``acc32``: fold to the
    single-plane accumulator inside the kernel (rotate the exact (hi, lo)
    pair FIRST so the result stays bit-identical to
    monomial_div-then-fold, the jnp oracle's order).

    fn(a_rot[1, B, 1] u32 in [0, 2N), acc_hi, acc_lo u32[R, G, B, 128])
    -> acc_hi (acc32) or (acc_hi, acc_lo).
    """
    G = n // 128
    log_2n = n.bit_length()

    def kernel(a_ref, hi_ref, lo_ref, *out_refs):
        lane_idx = lax.broadcasted_iota(U32, (1, 1, 128), 2)
        for r in range(R):
            rhi, rlo = _negacyclic_rot_v4(hi_ref[r], lo_ref[r], a_ref[0],
                                          lane_idx, G, log_2n)
            if acc32:
                out_refs[0][r] = rhi + (rlo >> U32(31))
            else:
                out_refs[0][r] = rhi
                out_refs[1][r] = rlo

    def fn(a_rot, acc_hi, acc_lo):
        B = acc_hi.shape[2]
        Bt = min(batch_tile, B)
        assert B % Bt == 0
        z = np.int32(0)
        acc_spec = pl.BlockSpec((R, G, Bt, 128), (lambda i: (z, z, i, z)),
                                memory_space=pltpu.VMEM)
        a_spec = pl.BlockSpec((1, Bt, 1), (lambda i: (z, i, z)),
                              memory_space=pltpu.VMEM)
        shape = jax.ShapeDtypeStruct((R, G, B, 128), jnp.uint32)
        out_shape = shape if acc32 else (shape, shape)
        out_specs = acc_spec if acc32 else (acc_spec, acc_spec)
        return pl.pallas_call(
            kernel,
            grid=(B // Bt,),
            interpret=jax.default_backend() == "cpu",
            in_specs=[a_spec, acc_spec, acc_spec],
            out_specs=out_specs,
            out_shape=out_shape,
        )(a_rot, acc_hi, acc_lo)

    return fn


def to_transposed_layout(x: jnp.ndarray, G: int) -> jnp.ndarray:
    """[..., N] standard coefficient order -> [..., G, 128] transposed
    (entry [j1, j2] = coeff j1 + G*j2)."""
    n = x.shape[-1]
    return jnp.swapaxes(x.reshape(x.shape[:-1] + (128, G)), -1, -2)


def from_transposed_layout(x: jnp.ndarray) -> jnp.ndarray:
    G = x.shape[-2]
    return jnp.swapaxes(x, -1, -2).reshape(x.shape[:-2] + (G * 128,))


# ---------------------------------------------------------------------------
# host-visible entry: full blind rotation via scan over the fused kernel
# ---------------------------------------------------------------------------

def split_u64(x: jnp.ndarray):
    """u64 -> (hi, lo) u32."""
    return (x >> jnp.uint64(32)).astype(U32), x.astype(U32)


def merge_u64(hi: jnp.ndarray, lo: jnp.ndarray):
    return (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)


def bsk_to_scan_layout(bsk_hat: jnp.ndarray) -> jnp.ndarray:
    """[2, P, n, l, R, R, N] (residues+shoup) -> [n, 2, P, l*R, R, N]."""
    two, P, nlwe, l, R, R2, N = bsk_hat.shape
    x = jnp.moveaxis(bsk_hat, 2, 0)
    return x.reshape(nlwe, two, P, l * R, R2, N)


def scan_to_legacy_layout(bsk_scan: jnp.ndarray, levels: int) -> jnp.ndarray:
    """Inverse of :func:`bsk_to_scan_layout` (for the portable jnp path)."""
    nlwe, two, P, lR, R, N = bsk_scan.shape
    x = bsk_scan.reshape(nlwe, two, P, levels, lR // levels, R, N)
    return jnp.moveaxis(x, 0, 2)


def bsk_scan_to_kernel_order(bsk_scan: jnp.ndarray,
                             base_log: int) -> jnp.ndarray:
    """[n, 2, P, l*R, R, N] -> pre-permuted kernel order
    [n, 2, P, l*R, R, G, 128] (the v4 frequency permutation applied ONCE).

    Doing this gather at key-prep time instead of inside the jitted
    rotation saves a whole-key (hundreds of MB) gather per rotation call —
    measured 0.18 us/ct-step at batch 1024, 24% of the v6 step cost.
    blind_rotate_pallas auto-detects the layout by ndim."""
    nlwe, two, P, lR, R, N = bsk_scan.shape
    G = N // 128
    tabs4 = _get_tables_v4(N, P, base_log)
    perm = jnp.asarray(tabs4.perm_from_plan)
    return bsk_scan[..., perm].reshape(bsk_scan.shape[:-1] + (G, 128))


def kernel_order_to_bsk_scan(bsk_k: jnp.ndarray, base_log: int) -> jnp.ndarray:
    """Inverse of :func:`bsk_scan_to_kernel_order` (oracle/CPU paths)."""
    nlwe, two, P, lR, R, G, _ = bsk_k.shape
    N = G * 128
    tabs4 = _get_tables_v4(N, P, base_log)
    inv_perm = jnp.asarray(np.argsort(tabs4.perm_from_plan))
    flat = bsk_k.reshape(bsk_k.shape[:-2] + (N,))
    return flat[..., inv_perm]


def blind_rotate_pallas(
    lut: jnp.ndarray,
    msed_mask: jnp.ndarray,
    msed_body: jnp.ndarray,
    bsk_scan: jnp.ndarray,
    base_log: int,
    levels: int,
    plan: ntt_mod.NegacyclicNtt,
    batch_tile: int = 16,
    unroll: int = 2,
    bnf2: bool = False,
    bnf2_flavor=None,
) -> jnp.ndarray:
    """Drop-in replacement for :func:`tfhe_tpu.ops.server.blind_rotate`
    (same contract) using the fused Pallas step kernel, ``unroll`` steps per
    kernel launch (fewer launches + fewer accumulator HBM round-trips).

    ``lut``: u64[B, R, N]; ``msed_mask``: u64[B, n] in [0, 2N);
    ``msed_body``: u64[B]; ``bsk_scan``: u32[n, 2, P, l*R, R, N].
    ``bnf2``: v6 mode — ``bsk_scan`` holds the 2-prime BNF key
    (ops/bnf2.py ``bootstrap_key_to_bnf2``) and the recombination tail is
    the CRT merge + torus switch instead of the exact Garner.
    """
    from .polynomial import monomial_div

    import os

    nsteps = bsk_scan.shape[0]
    P = bsk_scan.shape[2]
    R = bsk_scan.shape[4]
    # ndim 7 = pre-permuted kernel-order key ([..., G, 128], see
    # bsk_scan_to_kernel_order): the per-call whole-key gather below is a
    # measured 0.18 us/ct-step (~24% of the v6 step!) when left in the
    # jitted rotation, so production keys hoist it to key-prep time
    prepermuted = bsk_scan.ndim == 7
    n = (bsk_scan.shape[5] * bsk_scan.shape[6] if prepermuted
         else bsk_scan.shape[5])
    B = lut.shape[0]
    # NTT strategy: 'v4' (default) = transposed four-step, digits straight
    # into an int8 MXU matmul; 'v3' = flat layout with MXU small stages;
    # 'v2' = transposed sublane slices; 'v1' = lane rolls
    variant = os.environ.get("TFHE_NTT_VARIANT", "v4")
    if bnf2:
        # v6: the v4 kernel body with the 2-prime BNF recombination tail;
        # caller guarantees eligibility (ops/bnf2.py eligible())
        variant = "v4"
    use_v4 = (variant == "v4" and n >= 256 and n % 128 == 0
              and base_log * levels <= 31)
    assert use_v4 or not bnf2, (n, base_log, levels)
    use_v2 = variant != "v1" and n >= 256 and n % 128 == 0
    # Mosaic rejects the (Bt, n)->(Bt*n/128, 128) relayout for small n
    # ("unsupported shape cast"); the MXU variant is for production sizes
    use_mxu = variant == "v3" and n >= 2048 and n % 128 == 0
    unroll = int(os.environ.get("TFHE_UNROLL", unroll))
    # Opt-in sublane-stacked v6 step (one VPU pass per stage, 3 fused
    # matmuls instead of 8). Measured 0.730 vs 0.751 us/ct-step at Bt=32
    # (its best tile; ABLATE_V6_r04 era probes) but its Mosaic compile is
    # 2-3x slower and a cold-cache bench can exceed driver timeouts, so
    # the 3% stays opt-in until the compile cost is understood.
    stacked = bool(int(os.environ.get("TFHE_V6_STACKED", "0"))) and bnf2
    if stacked and batch_tile == 16:
        batch_tile = 32
    batch_tile = int(os.environ.get("TFHE_BATCH_TILE", batch_tile))

    acc = jnp.moveaxis(lut, 1, 0)  # [R, B, N]; body rotation applied below

    # acc32: single-plane accumulator (acc_u64 = hi * 2^32); every CMUX
    # increment is rounded to a multiple of 2^32 — injects per-step noise
    # of std 2^32/sqrt(12) (~2^35.5 total over n steps, vs >= 2^48 PBS
    # noise at production parameters). Mirrored exactly by the jnp
    # oracle's acc_round32 flag.
    # v6 defaults to acc32: its per-step 2^32/sqrt(12) rounding noise
    # (~2^35.5 std over 866 steps) is far below the BNF path's own switch
    # noise budget (ops/bnf2.py docstring) and the single-plane accumulator
    # halves the rotation + accumulate cost (measured on chip, PERF_NOTES).
    acc_mode = os.environ.get("TFHE_V4_ACC", "32" if bnf2 else "64")
    use_acc32 = use_v4 and acc_mode == "32"

    if use_v4:
        G = n // 128
        tabs4 = _get_tables_v4(n, P, base_log)
        # [R, B, G, 128] -> group-leading [R, G, B, 128]
        acc_hi, acc_lo = split_u64(
            jnp.moveaxis(to_transposed_layout(acc, G), 2, 1))
        # body rotation (lut * X^{-body}) as a Pallas prologue in the
        # transposed layout — see _build_body_rot_fn_v4 for why not
        # monomial_div (a gather costing 23% of the whole PBS)
        a_rot = (((2 * n) - msed_body) % jnp.uint64(2 * n)).astype(U32)
        rot_fn = _build_body_rot_fn_v4(n, R, batch_tile, acc32=use_acc32)
        if use_acc32:
            acc_hi = rot_fn(a_rot[None, :, None], acc_hi, acc_lo)
        else:
            acc_hi, acc_lo = rot_fn(a_rot[None, :, None], acc_hi, acc_lo)
        a_scan = jnp.moveaxis(msed_mask.astype(U32), 1, 0)[:, None, :, None]
        if not prepermuted:
            perm = jnp.asarray(tabs4.perm_from_plan)
            bsk_scan = bsk_scan[..., perm].reshape(
                bsk_scan.shape[:-1] + (G, 128))
    else:
        if prepermuted:
            raise ValueError(
                "pre-permuted (kernel-order) BSK requires the v4/v6 path")
        acc = monomial_div(jnp.moveaxis(acc, 0, 1),
                           msed_body[..., None])  # u64 [B, R, N]
        acc_hi, acc_lo = split_u64(jnp.moveaxis(acc, 1, 0))
        a_scan = jnp.moveaxis(msed_mask.astype(U32), 1, 0)[..., None]

    pad = (-nsteps) % unroll
    if pad:
        # zero-padded steps are exact no-ops: a=0 rotates by X^0 and a zero
        # GGSW contributes nothing to the external product
        a_scan = jnp.concatenate(
            [a_scan, jnp.zeros((pad,) + a_scan.shape[1:], a_scan.dtype)], 0
        )
        bsk_scan = jnp.concatenate(
            [bsk_scan, jnp.zeros((pad,) + bsk_scan.shape[1:], bsk_scan.dtype)], 0
        )
        nsteps += pad
    a_scan = a_scan.reshape((nsteps // unroll, unroll) + a_scan.shape[1:])
    bsk_scan = bsk_scan.reshape((nsteps // unroll, unroll) + bsk_scan.shape[1:])

    if use_v4:
        ablate = os.environ.get("TFHE_V4_ABLATE", "")
        if ablate:
            import warnings

            warnings.warn(
                f"TFHE_V4_ABLATE={ablate!r} is set: the blind-rotation "
                "kernel is running with stubbed stages and produces "
                "GARBAGE outputs (bench-only mode)", stacklevel=2)
        gch = int(os.environ.get("TFHE_V4_GARNER_CHUNK", "0") or 0)
        step_fn = _build_step_fn_v4(n, P, base_log, levels, R, batch_tile,
                                    unroll, acc32=use_acc32, ablate=ablate,
                                    garner_chunk=gch, bnf2=bnf2,
                                    stacked=stacked and use_acc32,
                                    bnf2_flavor=bnf2_flavor)
    else:
        step_fn = _build_step_fn(n, P, base_log, levels, R, batch_tile,
                                 unroll, use_v2=use_v2, use_mxu=use_mxu)

    if use_acc32:
        def body32(carry, xs):
            a_ms, bsk_step = xs
            return step_fn(a_ms, bsk_step, carry), None

        acc_hi, _ = lax.scan(body32, acc_hi, (a_scan, bsk_scan))
        acc_lo = jnp.zeros_like(acc_hi)
    else:
        def body(carry, xs):
            hi, lo = carry
            a_ms, bsk_step = xs
            hi, lo = step_fn(a_ms, bsk_step, hi, lo)
            return (hi, lo), None

        (acc_hi, acc_lo), _ = lax.scan(
            body, (acc_hi, acc_lo), (a_scan, bsk_scan))
    out = merge_u64(acc_hi, acc_lo)
    if use_v4:
        out = from_transposed_layout(jnp.moveaxis(out, 1, 2))
    return jnp.moveaxis(out, 0, 1)  # [B, R, N]
