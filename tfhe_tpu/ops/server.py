"""Server-side device kernels: keyswitch, modulus switch, external product,
blind rotation, sample extraction, programmable bootstrap.

All functions are pure, jittable, batched over arbitrary leading dims, and
written in fixed-shape JAX (``lax.fori_loop``/``lax.scan``, no data-dependent
Python control flow). The mathematical contracts mirror the reference:

- keyswitch: ``core_crypto/algorithms/lwe_keyswitch.rs:137-230``
  (out = [0|b_in] - sum_{i,l} digit_{i,l} * KSK[i,l])
- modulus switch: ``core_crypto/fft_impl/common.rs:10-23`` (round to 2N)
- centered-binary MS noise reduction: ``algorithms/modulus_switch.rs:35-104``
- external product: ``fft_impl/fft64/crypto/ggsw.rs:483-640`` (decompose,
  forward-transform, MAC against GGSW rows in transform domain, one inverse
  transform per output poly)
- blind rotation: ``fft_impl/fft64/crypto/bootstrap.rs:294-381``
  (lut *= X^-b, then n cmux steps). The reference skips a_i == 0 with a
  branch; here every step always executes — external product is linear and
  decompose(0) = 0, so the zero case contributes exactly nothing and the loop
  is data-independent (TPU-friendly, and bit-identical).
- sample extract: ``algorithms/glwe_sample_extraction.rs:89-160``
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from . import ntt as ntt_mod
from .decomp import decompose
from .polynomial import monomial_div, monomial_mul

_U64 = jnp.uint64


# ---------------------------------------------------------------------------
# keyswitch
# ---------------------------------------------------------------------------

def keyswitch(
    ct: jnp.ndarray,
    ksk: jnp.ndarray,
    base_log: int,
    levels: int,
    chunk: int = 64,
) -> jnp.ndarray:
    """LWE keyswitch. ``ct``: u64[..., n_in+1], ``ksk``: u64[n_in, l, n_out+1].

    Returns u64[..., n_out+1]. Decompose-then-MAC as a scan over input-mask
    chunks (the optimized path replaces this with an int8-limb MXU matmul).
    """
    n_in = ksk.shape[0]
    n_out = ksk.shape[2] - 1
    a = ct[..., :n_in]
    b = ct[..., n_in]

    digits = decompose(a, base_log, levels)  # [..., n_in, l] int64
    # pad n_in to a multiple of chunk
    pad = (-n_in) % chunk
    if pad:
        digits = jnp.pad(digits, [(0, 0)] * (digits.ndim - 2) + [(0, pad), (0, 0)])
        ksk = jnp.pad(ksk, [(0, pad), (0, 0), (0, 0)])
    n_steps = (n_in + pad) // chunk

    batch_shape = ct.shape[:-1]
    digits = digits.reshape(batch_shape + (n_steps, chunk, levels))
    ksk_steps = ksk.reshape(n_steps, chunk, levels, n_out + 1)

    def step(acc, inp):
        dig, kk = inp  # dig: [..., chunk, l] (moved axis), kk: [chunk, l, n_out+1]
        prod = dig.astype(_U64)[..., None] * kk  # [..., chunk, l, n_out+1]
        return acc - jnp.sum(prod, axis=(-3, -2)), None

    # move the step axis first for scan
    dig_scan = jnp.moveaxis(digits, -3, 0)  # [n_steps, ..., chunk, l]
    acc0 = jnp.zeros(batch_shape + (n_out + 1,), dtype=_U64)
    acc0 = acc0.at[..., n_out].set(b)
    acc, _ = lax.scan(step, acc0, (dig_scan, ksk_steps))
    return acc


# ---------------------------------------------------------------------------
# keyswitch, MXU path
# ---------------------------------------------------------------------------

def ksk_to_i8_limbs(ksk: "np.ndarray", base_log: int) -> "np.ndarray":
    """Precompute the KSK in *signed base-256 limb* form for the MXU path.

    Every u64 entry is rewritten as sum(limb_k * 256^k) mod 2^64 with
    limb_k in [-128, 127] (the 9th carry limb contributes 2^64 == 0 and is
    dropped). ``ksk``: u64[n_in, l, n_out+1] -> int8[n_in * l, (n_out+1) * 8].
    """
    import numpy as np

    # base_log == 8 would admit a +128 balanced digit, which wraps to -128
    # in int8 and silently corrupts the keyswitch; cap at 7 (|digit| <= 64).
    assert base_log <= 7, "balanced digits must fit int8 for the MXU keyswitch"
    v = np.asarray(ksk, dtype=np.uint64).copy()
    limbs = np.empty(v.shape + (8,), dtype=np.int8)
    for k in range(8):
        r = (v & np.uint64(0xFF)).astype(np.int64)
        r = np.where(r > 127, r - 256, r)
        limbs[..., k] = r.astype(np.int8)
        v = (v - r.astype(np.uint64)) >> np.uint64(8)
    n_in, l, o = ksk.shape
    return limbs.reshape(n_in * l, o * 8)


def keyswitch_mxu(
    ct: jnp.ndarray,
    ksk_i8: jnp.ndarray,
    base_log: int,
    levels: int,
) -> jnp.ndarray:
    """LWE keyswitch as ONE int8 MXU matmul.

    Same contract as :func:`keyswitch` (lwe_keyswitch.rs:137-230) but the
    decompose-MAC reduction is expressed as ``digits[B, n_in*l] @
    ksk_limbs[n_in*l, (n_out+1)*8] -> int32``, which XLA maps onto the MXU
    int8 systolic path. Exactness: |digit| <= 2^(base_log-1) <= 128 and
    |limb| <= 128, so |row sum| <= K * 2^14 < 2^31 for K up to 2^16.

    ``ct``: u64[..., n_in+1]; ``ksk_i8``: int8[n_in*l, (n_out+1)*8].
    """
    K, O8 = ksk_i8.shape
    n_in = K // levels
    n_out = O8 // 8 - 1
    a = ct[..., :n_in]
    b = ct[..., n_in]
    batch = ct.shape[:-1]

    digits = decompose(a, base_log, levels)  # [..., n_in, l] int64, |d|<=B/2
    d8 = digits.astype(jnp.int8).reshape((-1, K))
    # pad the batch to a multiple of 8: XLA CPU's int8 mat-VEC path
    # miscompiles (wrong int32 sums at batch 1), and sublane alignment helps
    # the MXU anyway
    B = d8.shape[0]
    pad = (-B) % 8
    if pad:
        d8 = jnp.concatenate([d8, jnp.zeros((pad, K), dtype=jnp.int8)], 0)
    sums = jnp.dot(d8, ksk_i8, preferred_element_type=jnp.int32)
    if pad:
        sums = sums[:B]
    sums = sums.reshape(batch + (n_out + 1, 8))
    # recombine limbs: total = sum_k sums_k * 2^8k (mod 2^64). NB: written as
    # multiply-by-weight rather than int64 shifts — XLA CPU miscompiles the
    # strided-slice + sign-extend + shift pattern (wrong sums at batch 1)
    w = jnp.asarray([1 << (8 * k) for k in range(8)], dtype=jnp.int64)
    total = jnp.sum(sums.astype(jnp.int64) * w, axis=-1).astype(jnp.uint64)
    out = jnp.zeros_like(total)
    out = out.at[..., n_out].set(b)
    return out - total


# ---------------------------------------------------------------------------
# keyswitch with scalar change (u64 -> u32): the KS32 atomic pattern
# ---------------------------------------------------------------------------

def ksk32_to_i8_limbs(ksk32: "np.ndarray", base_log: int) -> "np.ndarray":
    """KSK with u32 entries in signed base-256 limb form:
    u64[n_in, l, n_out+1] (values < 2^32) -> int8[n_in*l, (n_out+1)*4]."""
    import numpy as np

    assert base_log <= 7, "balanced digits must fit int8 for the MXU keyswitch"
    v = (np.asarray(ksk32, dtype=np.uint64) & np.uint64(0xFFFFFFFF)).copy()
    limbs = np.empty(v.shape + (4,), dtype=np.int8)
    for k in range(4):
        r = (v & np.uint64(0xFF)).astype(np.int64)
        r = np.where(r > 127, r - 256, r)
        limbs[..., k] = r.astype(np.int8)
        v = (v - r.astype(np.uint64)) >> np.uint64(8)
    n_in, l, o = ksk32.shape
    return limbs.reshape(n_in * l, o * 4)


def keyswitch_mxu32(
    ct: jnp.ndarray,
    ksk_i8: jnp.ndarray,
    base_log: int,
    levels: int,
) -> jnp.ndarray:
    """u64 -> u32 LWE keyswitch as one int8 MXU matmul
    (lwe_keyswitch.rs:331 keyswitch_lwe_ciphertext_with_scalar_change).

    The input mask decomposes with the u64 decomposer; the MAC runs against
    u32 KSK limbs and the output wraps mod 2^32. The body rounds to the
    closest multiple of 2^32 then downshifts. Returns u64[..., n_out+1]
    holding u32 values.
    """
    K, O4 = ksk_i8.shape
    n_in = K // levels
    n_out = O4 // 4 - 1
    a = ct[..., :n_in]
    b = ct[..., n_in]
    batch = ct.shape[:-1]

    digits = decompose(a, base_log, levels)
    d8 = digits.astype(jnp.int8).reshape((-1, K))
    B = d8.shape[0]
    pad = (-B) % 8
    if pad:
        d8 = jnp.concatenate([d8, jnp.zeros((pad, K), dtype=jnp.int8)], 0)
    sums = jnp.dot(d8, ksk_i8, preferred_element_type=jnp.int32)
    if pad:
        sums = sums[:B]
    sums = sums.reshape(batch + (n_out + 1, 4))
    w = jnp.asarray([1 << (8 * k) for k in range(4)], dtype=jnp.int64)
    total = jnp.sum(sums.astype(jnp.int64) * w, axis=-1).astype(jnp.uint64)
    # body: closest multiple of 2^32, downscaled (round-half-up)
    b32 = (b + jnp.uint64(1 << 31)) >> jnp.uint64(32)
    out = jnp.zeros_like(total)
    out = out.at[..., n_out].set(b32)
    return (out - total) & jnp.uint64(0xFFFFFFFF)


# ---------------------------------------------------------------------------
# modulus switch
# ---------------------------------------------------------------------------

def modulus_switch(x: jnp.ndarray, log_modulus: int, torus_bits: int = 64) -> jnp.ndarray:
    """Round to the nearest multiple of 2^torus_bits / 2^log_modulus;
    returns the switched value in [0, 2^log_modulus) as uint64
    (fft_impl/common.rs:10). ``torus_bits`` = 32 covers the KS32 atomic
    pattern's post-keyswitch u32 modulus (atomic_pattern/ks32.rs)."""
    x = x.astype(_U64)
    if torus_bits < 64:
        x = x & jnp.uint64((1 << torus_bits) - 1)
        half = jnp.uint64(1 << (torus_bits - log_modulus - 1))
        out = (x + half) >> jnp.uint64(torus_bits - log_modulus)
        return out & jnp.uint64((1 << log_modulus) - 1)
    half = jnp.uint64(1) << jnp.uint64(64 - log_modulus - 1)
    return (x + half) >> jnp.uint64(64 - log_modulus)


def _trunc_div2_i64(x: jnp.ndarray) -> jnp.ndarray:
    """Rust-style truncated (toward zero) division by two on int64."""
    return jnp.where(x < 0, -((-x) >> 1), x >> 1)


def centered_binary_ms_body_correction(
    mask: jnp.ndarray, log_modulus: int, torus_bits: int = 64
) -> jnp.ndarray:
    """Correction to add to the body before a centered-binary modulus switch
    (the CenteredMeanNoiseReduction default, algorithms/modulus_switch.rs:57).

    ``mask``: u64[..., n] -> u64[...] correction.
    """
    shift = jnp.uint64(torus_bits - log_modulus)
    rounded = modulus_switch(mask, log_modulus, torus_bits) << shift
    if torus_bits < 64:
        masked = mask & jnp.uint64((1 << torus_bits) - 1)
        err = rounded.astype(jnp.int64) - masked.astype(jnp.int64)
        # sign-extend the torus_bits-wide wrapping difference
        tb = jnp.int64(1 << (torus_bits - 1))
        err = ((err + tb) & jnp.int64((1 << torus_bits) - 1)) - tb
    else:
        err = (rounded - mask).astype(jnp.int64)  # signed rounding error
    half_err = _trunc_div2_i64(err)
    halving_err_doubled = 2 * half_err - err  # in {-1, 0, 1}
    sum_half = jnp.sum(half_err.astype(_U64), axis=-1)
    sum_halving = jnp.sum(halving_err_doubled, axis=-1)
    sum_halving_half = _trunc_div2_i64(sum_halving).astype(_U64)
    sum_half = sum_half - sum_halving_half
    half_case = jnp.uint64(1 << (torus_bits - log_modulus - 1))
    return sum_half - half_case


def lwe_centered_binary_modulus_switch(
    ct: jnp.ndarray, log_modulus: int, torus_bits: int = 64
):
    """Returns (switched_mask, switched_body) as uint64 in [0, 2^log_modulus),
    with the centered-binary body correction applied pre-switch."""
    n = ct.shape[-1] - 1
    mask = ct[..., :n]
    body = ct[..., n]
    corr = centered_binary_ms_body_correction(mask, log_modulus, torus_bits)
    return (
        modulus_switch(mask, log_modulus, torus_bits),
        modulus_switch(body + corr, log_modulus, torus_bits),
    )


def lwe_standard_modulus_switch(
    ct: jnp.ndarray, log_modulus: int, torus_bits: int = 64
):
    n = ct.shape[-1] - 1
    return (
        modulus_switch(ct[..., :n], log_modulus, torus_bits),
        modulus_switch(ct[..., n], log_modulus, torus_bits),
    )


def _ms_round_error_f64(x: jnp.ndarray, log_modulus: int,
                        torus_bits: int = 64) -> jnp.ndarray:
    """Signed rounding error rounded(x) - x of the modulus switch, as f64
    (modulus_switch_noise_reduction.rs:14-36 round_error_float). |err| <=
    2^(torus_bits - log_modulus - 1) < 2^53 for every supported shape, so
    the f64 value is exact."""
    shift = jnp.uint64(torus_bits - log_modulus)
    rounded = modulus_switch(x, log_modulus, torus_bits) << shift
    if torus_bits < 64:
        masked = x.astype(_U64) & jnp.uint64((1 << torus_bits) - 1)
        err = rounded.astype(jnp.int64) - masked.astype(jnp.int64)
        tb = jnp.int64(1 << (torus_bits - 1))
        err = ((err + tb) & jnp.int64((1 << torus_bits) - 1)) - tb
    else:
        err = (rounded - x.astype(_U64)).astype(jnp.int64)
    return err.astype(jnp.float64)


def choose_drift_candidate(
    ct: jnp.ndarray,
    zeros: jnp.ndarray,
    r_sigma_factor: float,
    bound: float,
    input_variance: float,
    log_modulus: int,
    torus_bits: int = 64,
    chunk: int = 64,
) -> jnp.ndarray:
    """Drift-technique candidate selection (eprint 2024/1718; reference
    ``modulus_switch_noise_reduction.rs:99``
    choose_candidate_to_improve_modulus_switch_noise_for_binary_key).

    For each batched LWE, considers candidates {no addition} union {ct +
    zeros[z]} and computes the noise-estimation measure
    ``|expectancy| + sqrt(variance + modular_input_variance) * r_sigma``
    with expectancy = body_err - sum(mask_err)/2 and variance =
    sum(mask_err^2)/4 over the modulus-switch rounding errors. Returns the
    candidate index per batch element (0 = no addition, z+1 = zeros[z]):
    the FIRST candidate whose measure satisfies ``bound`` in reference
    evaluation order, else the overall argmin (first occurrence — the
    reference's strict-improvement scan).

    ``ct``: u64[..., n+1]; ``zeros``: u64[Z, n+1]. ``input_variance`` is
    torus-relative (reference Variance); the modular variance is
    input_variance * 2^(2*torus_bits). Candidates are evaluated in chunks
    of ``chunk`` to bound transient memory (Z+1 error planes of the whole
    batch would not fit HBM at production zero counts)."""
    n = ct.shape[-1] - 1
    Z = zeros.shape[0]
    batch_shape = ct.shape[:-1]
    # candidate deltas: index 0 = no addition
    zeros_ext = jnp.concatenate(
        [jnp.zeros((1, n + 1), dtype=_U64), zeros.astype(_U64)], axis=0)
    mod_var = float(input_variance) * float(2.0 ** (2 * torus_bits))
    r_sigma = float(r_sigma_factor)

    pad = (-(Z + 1)) % chunk
    if pad:
        # padded candidates duplicate candidate 0 and are masked out below
        zeros_ext = jnp.concatenate(
            [zeros_ext, jnp.zeros((pad,) + zeros_ext.shape[1:], _U64)], 0)
    n_chunks = zeros_ext.shape[0] // chunk
    zc = zeros_ext.reshape(n_chunks, chunk, n + 1)

    def measure_chunk(zk):
        # [chunk, ..., n+1] wrapping candidate sums
        cand = ct[None] + zk.reshape((chunk,) + (1,) * len(batch_shape)
                                     + (n + 1,))
        err = _ms_round_error_f64(cand, log_modulus, torus_bits)
        mask_err = err[..., :n]
        body_err = err[..., n]
        expectancy = body_err - jnp.sum(mask_err, axis=-1) / 2.0
        variance = jnp.sum(mask_err * mask_err, axis=-1) / 4.0
        return jnp.abs(expectancy) + jnp.sqrt(variance + mod_var) * r_sigma

    measures = lax.map(measure_chunk, zc)  # [n_chunks, chunk, ...]
    measures = measures.reshape((n_chunks * chunk,) + batch_shape)
    if pad:
        measures = measures[: Z + 1]
    sat = measures <= jnp.float64(bound)
    first_sat = jnp.argmax(sat, axis=0)  # first True (0 if none)
    any_sat = jnp.any(sat, axis=0)
    best = jnp.argmin(measures, axis=0)  # first occurrence of the min
    return jnp.where(any_sat, first_sat, best)


def improve_drift_ms(
    ct: jnp.ndarray,
    zeros: jnp.ndarray,
    r_sigma_factor: float,
    bound: float,
    input_variance: float,
    log_modulus: int,
    torus_bits: int = 64,
) -> jnp.ndarray:
    """Add the chosen encryption of zero to each batched LWE (identity when
    the no-addition candidate wins). The subsequent modulus switch must be
    the STANDARD rounding switch (reference improve_noise_and_modulus_switch
    -> lwe_ciphertext_modulus_switch)."""
    idx = choose_drift_candidate(
        ct, zeros, r_sigma_factor, bound, input_variance, log_modulus,
        torus_bits)
    n = ct.shape[-1] - 1
    zeros_ext = jnp.concatenate(
        [jnp.zeros((1, n + 1), dtype=_U64), zeros.astype(_U64)], axis=0)
    return ct + zeros_ext[idx]


# ---------------------------------------------------------------------------
# external product / cmux
# ---------------------------------------------------------------------------

def external_product_ntt(
    ggsw_hat: jnp.ndarray,
    glwe: jnp.ndarray,
    base_log: int,
    levels: int,
    plan: ntt_mod.NegacyclicNtt,
) -> jnp.ndarray:
    """GGSW (transform domain) x GLWE -> GLWE, exact mod 2^64.

    ``ggsw_hat``: u32[2, P, l, R, R, N] — NTT residues and their Shoup duals
                  (floor(res * 2^32 / p)), R = k+1
    ``glwe``:     u64[..., R, N]
    Returns u64[..., R, N] (the external product; caller adds to the acc).
    Division-free: the MAC is Shoup multiplication against the key duals.
    """
    import math

    P = plan.num_primes
    R = glwe.shape[-2]
    N = glwe.shape[-1]
    batch = glwe.shape[:-2]

    digits = decompose(glwe, base_log, levels)  # [..., R, N, l]
    digits = jnp.moveaxis(digits, -1, -3)  # [..., l, R, N]
    dhat = plan.fwd_digits(digits)  # [P, ..., l, R, N]

    g = ggsw_hat[0].astype(_U64)
    gs = ggsw_hat[1].astype(_U64)
    bshape = (P,) + (1,) * len(batch) + g.shape[1:]
    g = g.reshape(bshape)  # [P, 1.., l, R, C, N]
    gs = gs.reshape(bshape)
    p = plan.p_like(dhat.ndim)

    prod = ntt_mod.shoup_mul(dhat[..., None, :], g, gs, p)  # [P, ..., l, R, C, N]
    acc_hat = jnp.sum(prod, axis=(-4, -3))  # [P, ..., C, N] — < l*R*p
    n_terms = levels * R
    acc_hat = ntt_mod.cond_sub_ladder(
        acc_hat, p[..., 0, 0], max(1, math.ceil(math.log2(n_terms)))
    )
    residues = plan.inv(acc_hat)
    return plan.reconstruct_u64(residues)


def cmux_ntt(
    ggsw_hat: jnp.ndarray,
    ct0: jnp.ndarray,
    ct1: jnp.ndarray,
    base_log: int,
    levels: int,
    plan: ntt_mod.NegacyclicNtt,
) -> jnp.ndarray:
    """ct0 + GGSW x (ct1 - ct0): selects ct1 when the GGSW encrypts 1
    (fft_impl/fft64/crypto/ggsw.rs:510 cmux)."""
    return ct0 + external_product_ntt(ggsw_hat, ct1 - ct0, base_log, levels, plan)


# ---------------------------------------------------------------------------
# blind rotation
# ---------------------------------------------------------------------------

def blind_rotate(
    lut: jnp.ndarray,
    msed_mask: jnp.ndarray,
    msed_body: jnp.ndarray,
    bsk_hat: jnp.ndarray,
    base_log: int,
    levels: int,
    plan: ntt_mod.NegacyclicNtt,
    acc_round32: bool = False,
) -> jnp.ndarray:
    """Blind rotation of ``lut`` by the mod-switched LWE.

    ``lut``:      u64[..., R, N] (trivial GLWE of the accumulator)
    ``msed_mask``: u64[..., n] values in [0, 2N)
    ``msed_body``: u64[...]     value  in [0, 2N)
    ``bsk_hat``:  u32[2, P, n, l, R, R, N] (residues + Shoup duals)
    ``acc_round32``: mirror of the Pallas kernel's acc32 contract — the
    accumulator and every CMUX increment are rounded to multiples of 2^32
    (bit-exact twin of ``blind_rotate_pallas`` under TFHE_V4_ACC=32).
    """
    n = bsk_hat.shape[2]
    # lut <- lut * X^{-b}
    acc = monomial_div(lut, msed_body[..., None])
    if acc_round32:
        half = jnp.uint64(1) << jnp.uint64(31)
        r32 = lambda x: ((x + half) >> jnp.uint64(32)) << jnp.uint64(32)
        acc = r32(acc)

    def body_fn(i, acc):
        a_i = lax.dynamic_index_in_dim(msed_mask, i, axis=-1, keepdims=False)
        # ct1 = acc * X^{a_i} - acc  (fused monomial-mul-subtract)
        ct1 = monomial_mul(acc, a_i[..., None]) - acc
        ggsw = lax.dynamic_index_in_dim(bsk_hat, i, axis=2, keepdims=False)
        inc = external_product_ntt(ggsw, ct1, base_log, levels, plan)
        if acc_round32:
            inc = r32(inc)
        return acc + inc

    return lax.fori_loop(0, n, body_fn, acc)


# ---------------------------------------------------------------------------
# sample extraction
# ---------------------------------------------------------------------------

def sample_extract(glwe: jnp.ndarray, nth: int = 0) -> jnp.ndarray:
    """GLWE -> LWE of the nth coefficient (glwe_sample_extraction.rs:89).

    ``glwe``: u64[..., k+1, N] -> u64[..., k*N + 1]
    """
    k_plus_1 = glwe.shape[-2]
    N = glwe.shape[-1]
    k = k_plus_1 - 1
    body = glwe[..., k, nth]
    mask = glwe[..., :k, :]
    # reverse each polynomial
    rev = mask[..., ::-1]
    # negate the first (N - nth - 1) coefficients
    opp = N - nth - 1
    idx = jnp.arange(N)
    neg = jnp.where(idx < opp, jnp.uint64(0) - rev, rev)
    # rotate left by opp
    rotated = jnp.roll(neg, -opp, axis=-1)
    out_mask = rotated.reshape(glwe.shape[:-2] + (k * N,))
    return jnp.concatenate([out_mask, body[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# programmable bootstrap (classic)
# ---------------------------------------------------------------------------

def programmable_bootstrap_pallas(
    ct_in: jnp.ndarray,
    lut: jnp.ndarray,
    bsk_scan: jnp.ndarray,
    base_log: int,
    levels: int,
    plan,
    centered_ms: bool = True,
    extract_nth: int = 0,
    batch_tile: int = 16,
    input_torus_bits: int = 64,
) -> jnp.ndarray:
    """Classic PBS on the fused Pallas blind-rotation kernel (TPU hot path).

    Same contract as :func:`programmable_bootstrap` but takes the bootstrap
    key in scan layout (``pbs_kernel.bsk_to_scan_layout``). Arbitrary leading
    batch dims; the batch is padded up to a multiple of ``batch_tile``.
    ``input_torus_bits`` = 32 for the KS32 atomic pattern.
    """
    from . import pbs_kernel as pk

    N = plan.n
    log_modulus = N.bit_length()
    if centered_ms:
        ms_mask, ms_body = lwe_centered_binary_modulus_switch(
            ct_in, log_modulus, input_torus_bits)
    else:
        ms_mask, ms_body = lwe_standard_modulus_switch(
            ct_in, log_modulus, input_torus_bits)

    batch = ct_in.shape[:-1]
    n_small = ct_in.shape[-1] - 1
    R = bsk_scan.shape[4]
    B = 1
    for d in batch:
        B *= d
    ms_mask = ms_mask.reshape(B, n_small)
    ms_body = ms_body.reshape(B)
    lut_b = jnp.broadcast_to(lut, batch + lut.shape[-2:]).reshape(
        (B,) + lut.shape[-2:]
    )
    pad = (-B) % batch_tile
    if pad:
        ms_mask = jnp.concatenate([ms_mask, ms_mask[:pad]], 0)
        ms_body = jnp.concatenate([ms_body, ms_body[:pad]], 0)
        lut_b = jnp.concatenate([lut_b, lut_b[:pad]], 0)
    rotated = pk.blind_rotate_pallas(
        lut_b, ms_mask, ms_body, bsk_scan, base_log, levels, plan,
        batch_tile=batch_tile,
    )
    if pad:
        rotated = rotated[:B]
    out = sample_extract(rotated, extract_nth)
    return out.reshape(batch + (out.shape[-1],))


def programmable_bootstrap_goldilocks(
    ct_in: jnp.ndarray,
    lut: jnp.ndarray,
    bsk_g: jnp.ndarray,
    base_log: int,
    levels: int,
    centered_ms: bool = True,
    extract_nth: int = 0,
    batch_tile: int = 16,
    input_torus_bits: int = 64,
    use_pallas: bool = True,
) -> jnp.ndarray:
    """Classic PBS on the single-prime Goldilocks (BNF) transform path —
    the v5 TPU hot path (see ops/goldilocks.py for the arithmetic model;
    reference ``ntt64_bnf_pbs.rs:174-260``).

    ``bsk_g``: u32[n, 2, l*R, R, G, 128] from
    ``goldilocks.bootstrap_key_to_goldilocks``. ``use_pallas=False`` runs
    the jnp oracle twin (bit-identical outputs; CPU tests)."""
    from . import goldilocks as gl
    from . import pbs_kernel_g as pkg

    G = bsk_g.shape[4]
    N = G * 128
    log_modulus = N.bit_length()
    if centered_ms:
        ms_mask, ms_body = lwe_centered_binary_modulus_switch(
            ct_in, log_modulus, input_torus_bits)
    else:
        ms_mask, ms_body = lwe_standard_modulus_switch(
            ct_in, log_modulus, input_torus_bits)

    batch = ct_in.shape[:-1]
    n_small = ct_in.shape[-1] - 1
    R = bsk_g.shape[3]
    B = 1
    for d in batch:
        B *= d
    ms_mask = ms_mask.reshape(B, n_small)
    ms_body = ms_body.reshape(B)
    lut_b = jnp.broadcast_to(lut, batch + lut.shape[-2:]).reshape(
        (B,) + lut.shape[-2:])
    if use_pallas:
        pad = (-B) % batch_tile
        if pad:
            ms_mask = jnp.concatenate([ms_mask, ms_mask[:pad]], 0)
            ms_body = jnp.concatenate([ms_body, ms_body[:pad]], 0)
            lut_b = jnp.concatenate([lut_b, lut_b[:pad]], 0)
        rotated = pkg.blind_rotate_goldilocks_pallas(
            lut_b, ms_mask, ms_body, bsk_g, base_log, levels,
            batch_tile=batch_tile)
        if pad:
            rotated = rotated[:B]
    else:
        rotated = gl.blind_rotate_goldilocks(
            lut_b, ms_mask, ms_body, bsk_g, base_log, levels)
    out = sample_extract(rotated, extract_nth)
    return out.reshape(batch + (out.shape[-1],))


def programmable_bootstrap_bnf2(
    ct_in: jnp.ndarray,
    lut: jnp.ndarray,
    bsk_scan2: jnp.ndarray,
    base_log: int,
    levels: int,
    centered_ms: bool = True,
    extract_nth: int = 0,
    # Bt=32 measured -3.4% on the rotation / +3.3% e2e vs 16 once the
    # body-rotation prologue landed (2,064 vs 1,998 PBS/s at batch 8192,
    # BENCH_HISTORY 2026-08-20); TFHE_BATCH_TILE still overrides
    batch_tile: int = 32,
    input_torus_bits: int = 64,
    use_pallas: bool = True,
    flavor=None,
) -> jnp.ndarray:
    """Classic PBS on the 2-prime BNF transform path — the v6 TPU hot path
    (see ops/bnf2.py for the arithmetic model; reference
    ``ntt64_bnf_pbs.rs:174-260`` generalized to a 30-bit prime pair).
    ``flavor``: a ``bnf2.Bnf2Flavor`` (None = DEFAULT; FAST28 = the v6b
    sub-2^29 lazy-reduction pair, -2.4% rotation time).

    ``bsk_scan2``: u32[n, 2, 2, l*R, R, N] from
    ``bnf2.bootstrap_key_to_bnf2``, or the pre-permuted kernel-order form
    u32[n, 2, 2, l*R, R, G, 128] (``pbs_kernel.bsk_scan_to_kernel_order``
    — hoists a whole-key gather out of the jitted rotation, 24% of the v6
    step). ``use_pallas=False`` runs the jnp oracle twin (bit-identical
    outputs; CPU tests)."""
    from . import bnf2 as b2
    from . import pbs_kernel as pk

    fl = flavor or b2.DEFAULT
    prepermuted = bsk_scan2.ndim == 7
    N = (bsk_scan2.shape[5] * bsk_scan2.shape[6] if prepermuted
         else bsk_scan2.shape[5])
    plan2 = fl.plan(N)
    log_modulus = N.bit_length()
    if centered_ms:
        ms_mask, ms_body = lwe_centered_binary_modulus_switch(
            ct_in, log_modulus, input_torus_bits)
    else:
        ms_mask, ms_body = lwe_standard_modulus_switch(
            ct_in, log_modulus, input_torus_bits)

    batch = ct_in.shape[:-1]
    n_small = ct_in.shape[-1] - 1
    B = 1
    for d in batch:
        B *= d
    ms_mask = ms_mask.reshape(B, n_small)
    ms_body = ms_body.reshape(B)
    lut_b = jnp.broadcast_to(lut, batch + lut.shape[-2:]).reshape(
        (B,) + lut.shape[-2:])
    if use_pallas:
        # small batches keep the 16-tile: padding a single-op latency call
        # out to the 32-wide throughput tile doubles its rotation work
        # (fheuint64 latency rows regressed 2-6x when Bt=32 became the
        # default, BENCH_HISTORY 2026-08-20)
        if B <= 16:
            batch_tile = min(batch_tile, 16)
        pad = (-B) % batch_tile
        if pad:
            ms_mask = jnp.concatenate([ms_mask, ms_mask[:pad]], 0)
            ms_body = jnp.concatenate([ms_body, ms_body[:pad]], 0)
            lut_b = jnp.concatenate([lut_b, lut_b[:pad]], 0)
        rotated = pk.blind_rotate_pallas(
            lut_b, ms_mask, ms_body, bsk_scan2, base_log, levels, plan2,
            batch_tile=batch_tile, bnf2=True, bnf2_flavor=fl)
        if pad:
            rotated = rotated[:B]
    else:
        # bit-exact twin of the Pallas path: resolve the accumulator mode
        # from the same env knob (the v6 kernel defaults to acc32)
        acc32 = os.environ.get("TFHE_V4_ACC", "32") == "32"
        if prepermuted:
            bsk_scan2 = pk.kernel_order_to_bsk_scan(bsk_scan2, base_log)
        rotated = b2.blind_rotate_bnf2(
            lut_b, ms_mask, ms_body, bsk_scan2, base_log, levels,
            acc_round32=acc32, flavor=fl)
    out = sample_extract(rotated, extract_nth)
    return out.reshape(batch + (out.shape[-1],))


def programmable_bootstrap(
    ct_in: jnp.ndarray,
    lut: jnp.ndarray,
    bsk_hat: jnp.ndarray,
    base_log: int,
    levels: int,
    plan: ntt_mod.NegacyclicNtt,
    centered_ms: bool = True,
    extract_nth: int = 0,
    input_torus_bits: int = 64,
) -> jnp.ndarray:
    """Classic PBS: modulus switch -> blind rotate -> sample extract.

    ``ct_in``: u64[..., n+1] under the small key; ``lut``: u64[..., R, N] or
    [R, N] (broadcast over batch). Returns u64[..., k*N+1] under the big key.
    Mirrors shortint's apply_programmable_bootstrap
    (shortint/server_key/mod.rs:1440-1560) with the centered-mean modulus
    switch enabled by default (the 2_2 parameter default).
    """
    N = plan.n
    log_modulus = N.bit_length()  # log2(2N)
    if centered_ms:
        ms_mask, ms_body = lwe_centered_binary_modulus_switch(
            ct_in, log_modulus, input_torus_bits)
    else:
        ms_mask, ms_body = lwe_standard_modulus_switch(
            ct_in, log_modulus, input_torus_bits)
    batch = ct_in.shape[:-1]
    lut = jnp.broadcast_to(lut, batch + lut.shape[-2:])
    rotated = blind_rotate(lut, ms_mask, ms_body, bsk_hat, base_log, levels, plan)
    return sample_extract(rotated, extract_nth)


# ---------------------------------------------------------------------------
# multi-bit PBS — reference lwe_multi_bit_programmable_bootstrapping.rs
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _trivial_ggsw_one_hat(n: int, num_primes: int, base_log: int, levels: int, R: int):
    """NTT-domain trivial GGSW of the cleartext 1: diagonal gadget entries
    q/B^(levels-j) in coefficient 0 (GGSW = m*G with no encryption)."""
    import numpy as np

    plan = ntt_mod.get_plan(n, num_primes)
    data = np.zeros((levels, R, R, n), dtype=np.uint64)
    for j in range(levels):
        shift = 64 - base_log * (levels - j)
        for r in range(R):
            data[j, r, r, 0] = np.uint64(1) << np.uint64(shift)
    # computed in PURE numpy: this is lru-cached and may first be reached
    # inside a jit trace — a jax computation here would cache a tracer
    out = np.zeros((plan.num_primes,) + data.shape, dtype=np.uint64)
    for pi, p in enumerate(plan.primes):
        r = (data % np.uint64(p)).astype(object)
        r = (r * plan.twist[pi].astype(object)) % p  # twist
        x = r.astype(np.uint64)
        nloc = n
        for s in range(plan.log_n):
            m = nloc >> s
            h = m >> 1
            xr = x.reshape(data.shape[:-1] + (nloc // m, 2, h))
            a = xr[..., 0, :].astype(object)
            b = xr[..., 1, :].astype(object)
            u = (a + b) % p
            v = ((a - b) * plan.tw_fwd[s][pi].astype(object)) % p
            x = np.stack([u, v], axis=-2).reshape(data.shape).astype(np.uint64)
        out[pi] = x
    return out  # numpy [P, l, R, R, N]; converted to jnp at the use site


def multi_bit_blind_rotate(
    lut: jnp.ndarray,
    msed_mask: jnp.ndarray,
    msed_body: jnp.ndarray,
    mbk_hat: jnp.ndarray,
    base_log: int,
    levels: int,
    grouping: int,
    plan: ntt_mod.NegacyclicNtt,
) -> jnp.ndarray:
    """Multi-bit blind rotation: n/g external products, each against a
    combined GGSW assembled in the NTT domain:

        GGSW(X^{sum_j a_j s_j}) = sum_{S subset of group}
            NTT(prod_{j in S}(X^{a_j} - 1)) (.) GGSW(prod_{j in S} s_j)

    with the empty subset contributing the trivial GGSW of 1
    (std_prepare_multi_bit_ggsw, lwe_multi_bit_programmable_bootstrapping
    .rs:115,366).

    ``mbk_hat``: u64/u32 residues [P, n/g, 2^g-1, l, R, R, N] (no duals).
    """
    from .polynomial import monomial_mul

    ngroups = mbk_hat.shape[1]
    R = lut.shape[-2]
    N = plan.n
    batch = lut.shape[:-2]
    acc = monomial_div(lut, msed_body[..., None])
    triv = jnp.asarray(_trivial_ggsw_one_hat(N, plan.num_primes, base_log, levels, R))
    triv = triv.reshape((plan.num_primes,) + (1,) * len(batch) + triv.shape[1:])
    p_full = plan.p_like(len(batch) + 4)  # [P, batch-ones, l, R, C, N]

    delta = jnp.zeros(batch + (N,), dtype=jnp.uint64).at[..., 0].set(jnp.uint64(1))

    def group_step(t, acc):
        nh = []
        for j in range(grouping):
            a = lax.dynamic_index_in_dim(msed_mask, t * grouping + j, axis=-1,
                                         keepdims=False)
            mono = monomial_mul(delta, a) - delta
            nh.append(plan.fwd(mono.astype(jnp.int64)))
        pP = plan.p_like(len(batch) + 1)
        combined = jnp.broadcast_to(
            triv, (plan.num_primes,) + batch + (levels, R, R, N)
        ).astype(jnp.uint64)
        for v in range(1, 1 << grouping):
            coef = None
            for j in range(grouping):
                if (v >> j) & 1:
                    coef = nh[j] if coef is None else (coef * nh[j]) % pP
            gv = lax.dynamic_index_in_dim(mbk_hat, t, axis=1, keepdims=False)
            gv = lax.dynamic_index_in_dim(gv, v - 1, axis=1, keepdims=False)
            gv = gv.astype(jnp.uint64).reshape(
                (plan.num_primes,) + (1,) * len(batch) + (levels, R, R, N)
            )
            term = (coef[..., None, None, None, :] * gv) % p_full
            combined = combined + term
        combined = combined % p_full

        # external product acc <- EP(combined, acc)
        digits = decompose(acc, base_log, levels)  # [..., R, N, l]
        digits = jnp.moveaxis(digits, -1, -3)  # [..., l, R, N]
        dhat = plan.fwd_digits(digits)  # [P, ..., l, R, N]
        prod = (dhat[..., None, :].astype(jnp.uint64) * combined) % p_full
        acc_hat = jnp.sum(prod, axis=(-4, -3)) % plan.p_like(len(batch) + 2)
        residues = plan.inv(acc_hat)
        return plan.reconstruct_u64(residues)

    # scan, not a Python loop: at production sizes ngroups = n/g ~ 452 and
    # an unrolled graph takes tens of minutes to compile
    def scan_body(a, t):
        return group_step(t, a), None

    acc, _ = lax.scan(scan_body, acc, jnp.arange(ngroups))
    return acc


def multi_bit_programmable_bootstrap(
    ct_in: jnp.ndarray,
    lut: jnp.ndarray,
    mbk_hat: jnp.ndarray,
    base_log: int,
    levels: int,
    grouping: int,
    plan: ntt_mod.NegacyclicNtt,
    extract_nth: int = 0,
) -> jnp.ndarray:
    """Multi-bit PBS: standard modulus switch -> grouped blind rotation ->
    sample extract."""
    N = plan.n
    log_modulus = N.bit_length()
    ms_mask, ms_body = lwe_standard_modulus_switch(ct_in, log_modulus)
    batch = ct_in.shape[:-1]
    lut = jnp.broadcast_to(lut, batch + lut.shape[-2:])
    rotated = multi_bit_blind_rotate(
        lut, ms_mask, ms_body, mbk_hat, base_log, levels, grouping, plan
    )
    return sample_extract(rotated, extract_nth)
