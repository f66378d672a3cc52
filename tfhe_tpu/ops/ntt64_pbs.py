"""NTT64 prime-modulus PBS: the ciphertext modulus IS the NTT prime.

The reference's third PBS flavor (``core_crypto/algorithms/
lwe_programmable_bootstrapping/ntt64_pbs.rs``): every ciphertext lives mod
q = 2^64 - 2^32 + 1 (the Goldilocks prime), so the blind-rotation external
products are EXACT negacyclic convolutions mod (X^N + 1, q) — no transform
rounding error at all (unlike the f64-FFT, CRT-approx v6/BNF, or v5
flavors, which all bridge from the 2^64 torus). The price is non-native
arithmetic everywhere else:

- gadget decomposition uses ``SignedDecomposerNonNative``
  (``commons/math/decomposition/decomposer.rs:310-548``): sign-split around
  ceil(q/2), native MSB rounding of the absolute value, balanced digits,
  then sign re-application;
- the recomposition scale for level i is 2^(ceil_log2(q) - b*i) = 2^(64-b*i)
  AS AN INTEGER MOD q (``term.rs:to_approximate_recomposition_summand``);
- the PBS modulus switch divides by q, not by a power of two
  (``ntt64_pbs.rs:540`` ``pbs_modulus_switch_non_native``:
  round(v * 2N / q));
- monomial mul/div and sample extraction negate mod q
  (``polynomial_wrapping_monic_monomial_mul_assign_custom_mod``).

TPU design: the transform and field arithmetic are the existing Goldilocks
jnp plan (``ops/goldilocks.py`` — exact mod q, vectorized, u32-pair lane
math); the rotation is a batched ``lax.scan`` over mask elements with the
CMUX fan-out expressed as whole-tensor ops, so XLA fuses the decompose/
NTT/MAC chain per step. Key generation is host-side numpy with the mask
convolutions jitted through the same plan.

Doc-example parity (``ntt64_pbs.rs:31-176``): n=742, k=1, N=2048, b=23,
l=1, q = 2^64 - 2^32 + 1, 4-bit messages — reproduced decrypt-correct in
``tests/test_ntt64_pbs.py``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import goldilocks as gl

_U64 = jnp.uint64
_I64 = jnp.int64

#: the ciphertext modulus == the NTT prime (Goldilocks)
Q: int = gl.P
#: ceil(log2(q)) — q is 64 bits, so the "containing" scale is 2^64
Q_BITS: int = 64
#: ceil(q / 2): the positive/negative split point of the signed view
Q_HALF_CEIL: int = (Q + 1) // 2


# ---------------------------------------------------------------------------
# SignedDecomposerNonNative (vectorized)
# ---------------------------------------------------------------------------

def init_state_nonnative(v: jnp.ndarray, base_log: int, levels: int,
                         q: int = Q):
    """(state, sign) of the non-native decomposer for canonical ``v`` < q.

    Mirrors ``decomposer.rs:520`` ``init_decomposer_state``: sign-split
    around ceil(q/2), then native MSB rounding of the absolute value
    shifted up by 64 - ceil_ilog2(q) (zero for the Goldilocks q).
    Returns (u64 state < 2^(b*l), bool negative).
    """
    assert q & (q - 1) != 0, "use the native decomposer for 2^k moduli"
    q_bits = q.bit_length()  # == ceil_ilog2(q) for non-power-of-two q
    v = jnp.asarray(v, _U64)
    neg = v >= _U64((q + 1) // 2)
    abs_v = jnp.where(neg, _U64(q) - v, v)
    non_rep = q_bits - base_log * levels
    assert non_rep > 0, "b*l must be < ceil_ilog2(q)"
    # native_closest_representable(abs << stn) >> stn >> (q_bits - b*l)
    # collapses to one rounded shift at bit non_rep (decomposer.rs:25-50:
    # add the half interval, discard the deciding bit)
    res = abs_v >> _U64(non_rep - 1)
    res = (res + _U64(1)) >> _U64(1)
    return res, neg


def closest_representable_nonnative(v: jnp.ndarray, base_log: int,
                                    levels: int, q: int = Q) -> jnp.ndarray:
    """decomposer.rs ``closest_representable``: the rounded absolute value
    re-scaled and sign-reapplied mod q (canonical u64)."""
    q_bits = q.bit_length()
    state, neg = init_state_nonnative(v, base_log, levels, q)
    abs_closest = state << _U64(q_bits - base_log * levels)
    return jnp.where(neg & (abs_closest != 0), _U64(q) - abs_closest,
                     abs_closest)


def decompose_nonnative(v: jnp.ndarray, base_log: int, levels: int,
                        q: int = Q) -> jnp.ndarray:
    """Balanced signed digits of ``v`` (canonical mod q), int64, shaped
    ``v.shape + (levels,)`` with index 0 = level ``levels`` (the iterator's
    first yield — smallest scale 2^(64-b*l)), matching GGSW level-matrix
    storage order (same convention as :func:`ops.decomp.decompose`).

    Mirrors ``iter.rs:299-435`` (``SignedDecompositionNonNativeIter`` +
    ``decompose_one_level``), including the final sign re-application.
    """
    state_u, neg = init_state_nonnative(v, base_log, levels, q)
    state = state_u.astype(_I64)
    mask = _I64((1 << base_log) - 1)
    digits = []
    for _ in range(levels):
        res = state & mask
        state = state >> base_log  # arithmetic shift (int64)
        carry = (((res - _I64(1)) | state) & res) >> (base_log - 1)
        state = state + carry
        digits.append(res - (carry << base_log))
    d = jnp.stack(digits, axis=-1)
    return jnp.where(neg[..., None], -d, d)


def recomposition_summand_q(value_signed: np.ndarray, level: int,
                            base_log: int) -> np.ndarray:
    """term.rs ``to_approximate_recomposition_summand`` mod q: the signed
    term times 2^(64 - b*level), represented canonically in [0, q)."""
    v = np.asarray(value_signed, dtype=object)
    shift = Q_BITS - base_log * level
    out = (v * (1 << shift)) % Q
    return np.array(out.tolist(), dtype=np.uint64)


def modulus_switch_nonnative(v: np.ndarray, poly_size: int) -> np.ndarray:
    """round(v * 2N / q) (``ntt64_pbs.rs:540`` — u128 divide_round).

    Host-side exact integer math (the switch happens once per ciphertext
    component, outside the jitted rotation)."""
    vv = np.asarray(v, dtype=np.uint64).astype(object)
    # divide_round(a, b) = (a + (b >> 1)) / b (misc.rs) — q odd, so the
    # half-interval is (q-1)/2
    out = [(int(x) * 2 * poly_size + (Q >> 1)) // Q for x in vv.reshape(-1)]
    return np.array(out, dtype=np.uint64).reshape(vv.shape)


# ---------------------------------------------------------------------------
# mod-q LWE/GLWE primitives (host-side keygen; jnp hot path)
# ---------------------------------------------------------------------------

def _rounded_gaussian_q(std_abs: float, shape, rng: np.random.Generator):
    """Gaussian noise of absolute std (in q units), canonical mod q."""
    e = np.rint(rng.normal(0.0, std_abs, size=shape)).astype(object)
    return np.array([(int(x) % Q) for x in e.reshape(-1)],
                    dtype=np.uint64).reshape(shape)


def _polymul_binary_q(s_bits: np.ndarray, masks: np.ndarray) -> np.ndarray:
    """a_j (*) s_j negacyclic mod (X^N+1, q), summed over j.

    ``s_bits``: u8[k, N] binary; ``masks``: u64[m, k, N] canonical < q.
    Returns u64[m, N]."""
    plan = gl.get_plan_g(masks.shape[-1])
    s = jnp.asarray(s_bits.astype(np.uint64))
    a = jnp.asarray(masks)
    s_hat = gl.fwd_ntt(s, plan)            # [k, N]
    a_hat = gl.fwd_ntt(a, plan)            # [m, k, N]
    prod = gl.gmul(a_hat, s_hat[None])     # [m, k, N]
    acc = prod[:, 0]
    for j in range(1, prod.shape[1]):
        acc = gl.gadd(acc, prod[:, j])
    return np.asarray(gl.inv_ntt(acc, plan), dtype=np.uint64)


def glwe_encrypt_q(sk_bits: np.ndarray, msgs: np.ndarray, noise_std_abs: float,
                   rng: np.random.Generator) -> np.ndarray:
    """GLWE encryption mod q: mask uniform in [0, q), body = sum a_j*s_j
    + m + e (all mod q). ``msgs``: u64[m, N] canonical. -> u64[m, k+1, N]."""
    k, N = sk_bits.shape
    m = msgs.shape[0]
    mask = rng.integers(0, Q, size=(m, k, N), dtype=np.uint64)
    body = _polymul_binary_q(sk_bits, mask)
    e = _rounded_gaussian_q(noise_std_abs, (m, N), rng)
    body = np.asarray(gl.gadd(gl.gadd(jnp.asarray(body), jnp.asarray(msgs)),
                              jnp.asarray(e)), dtype=np.uint64)
    return np.concatenate([mask, body[:, None, :]], axis=1)


def glwe_decrypt_q(sk_bits: np.ndarray, cts: np.ndarray) -> np.ndarray:
    """body - sum a_j*s_j mod q. ``cts``: u64[m, k+1, N] -> u64[m, N]."""
    k = sk_bits.shape[0]
    acc = _polymul_binary_q(sk_bits, cts[:, :k])
    return np.asarray(gl.gsub(jnp.asarray(cts[:, k]), jnp.asarray(acc)),
                      dtype=np.uint64)


def lwe_encrypt_q(sk_bits: np.ndarray, pts: np.ndarray, noise_std_abs: float,
                  rng: np.random.Generator) -> np.ndarray:
    """LWE encryption mod q. ``pts``: u64[m] canonical -> u64[m, n+1]."""
    n = sk_bits.shape[0]
    m = pts.shape[0]
    a = rng.integers(0, Q, size=(m, n), dtype=np.uint64)
    # dot(a, s) mod q: s binary, so this is a masked sum — do it in python
    # ints (host keygen; exactness over speed)
    sel = a[:, sk_bits.astype(bool)]
    dots = np.array([int(sum(int(x) for x in row) % Q) for row in sel],
                    dtype=np.uint64)
    e = _rounded_gaussian_q(noise_std_abs, (m,), rng)
    body = np.array([(int(d) + int(p) + int(ee)) % Q
                     for d, p, ee in zip(dots, pts, e)], dtype=np.uint64)
    return np.concatenate([a, body[:, None]], axis=1)


def lwe_decrypt_q(sk_bits: np.ndarray, cts: np.ndarray) -> np.ndarray:
    """phase = body - <a, s> mod q. ``cts``: u64[m, n+1] -> u64[m]."""
    sel = cts[:, :-1][:, sk_bits.astype(bool)]
    dots = [int(sum(int(x) for x in row) % Q) for row in sel]
    return np.array([(int(b) - d) % Q for b, d in zip(cts[:, -1], dots)],
                    dtype=np.uint64)


def decode_q(phase: np.ndarray, delta: int) -> np.ndarray:
    """Signed rounding decode mod q (``decomposer.rs:decode_plaintext``)."""
    out = []
    for p in np.asarray(phase, dtype=np.uint64).reshape(-1):
        p = int(p)
        neg = p > Q >> 1
        if neg:
            p = Q - p
        d = (p + delta // 2) // delta
        out.append((Q - d) % Q if neg else d)
    return np.array(out, dtype=np.uint64).reshape(np.shape(phase))


# ---------------------------------------------------------------------------
# GGSW + bootstrap key (mod q)
# ---------------------------------------------------------------------------

def gen_bootstrap_key_ntt64(lwe_bits: np.ndarray, glwe_bits: np.ndarray,
                            base_log: int, levels: int, noise_std_abs: float,
                            rng: np.random.Generator) -> np.ndarray:
    """Standard-domain BSK mod q: u64[n, l, k+1, k+1, N].

    GGSW row (j, r) encrypts factor*s_r (last row -factor) with factor =
    -bit * 2^(64 - b*(levels-j)) mod q — the mod-q analog of
    ``ggsw_encryption.rs:20-175`` with the non-native recomposition scale.
    """
    n = lwe_bits.shape[0]
    k, N = glwe_bits.shape
    msgs = np.zeros((n, levels, k + 1, N), dtype=np.uint64)
    for j in range(levels):
        level = levels - j
        factor = recomposition_summand_q(
            -lwe_bits.astype(np.int64), level, base_log)  # [n] canonical
        for r in range(k):
            # factor * s_r mod q: s_r binary, so this is a select
            msgs[:, j, r] = np.where(glwe_bits[r][None, :].astype(bool),
                                     factor[:, None], np.uint64(0))
        msgs[:, j, k, 0] = np.array(
            [(Q - int(f)) % Q for f in factor], dtype=np.uint64)
    rows = glwe_encrypt_q(glwe_bits, msgs.reshape(-1, N), noise_std_abs, rng)
    return rows.reshape(n, levels, k + 1, k + 1, N)


def bootstrap_key_to_ntt64(bsk_q: np.ndarray) -> jnp.ndarray:
    """Forward-transform every BSK polynomial (the
    ``convert_standard_lwe_bootstrap_key_to_ntt64`` analog; normalization
    stays in the inverse transform — our plan's inv_ntt carries N^{-1}, so
    no Normalize pre-scale is needed)."""
    n, l, R, R2, N = bsk_q.shape
    plan = gl.get_plan_g(N)
    return gl.fwd_ntt(jnp.asarray(bsk_q), plan)


# ---------------------------------------------------------------------------
# rotation + PBS (jit, batched)
# ---------------------------------------------------------------------------

def monomial_mul_q(poly: jnp.ndarray, degree: jnp.ndarray) -> jnp.ndarray:
    """poly * X^degree mod (X^N + 1, q), degree in [0, 2N) (per batch,
    shape broadcastable to poly[..., :1]). Negation is mod q (gneg)."""
    N = poly.shape[-1]
    d = jnp.asarray(degree, _U64)
    rot = d % _U64(N)
    flip = (d // _U64(N)) & _U64(1)  # odd wrap => global sign flip
    idx = jnp.arange(N, dtype=jnp.uint64)
    src = (idx - rot) % _U64(N)
    gathered = jnp.take_along_axis(
        poly, jnp.broadcast_to(src, poly.shape).astype(jnp.int32), axis=-1)
    wrapped = (idx < rot).astype(_U64) ^ flip
    return jnp.where(wrapped.astype(bool), gl.gneg(gathered), gathered)


def monomial_div_q(poly: jnp.ndarray, degree: jnp.ndarray) -> jnp.ndarray:
    """poly * X^-degree mod (X^N + 1, q)."""
    N = poly.shape[-1]
    return monomial_mul_q(poly, (_U64(2 * N) - jnp.asarray(degree, _U64))
                          % _U64(2 * N))


@partial(jax.jit, static_argnums=(4, 5))
def blind_rotate_ntt64(lut: jnp.ndarray, mask_sw: jnp.ndarray,
                       body_sw: jnp.ndarray, bsk_hat: jnp.ndarray,
                       base_log: int, levels: int) -> jnp.ndarray:
    """Blind rotation mod q (``ntt64_pbs.rs:178-285`` semantics, batched).

    ``lut``: u64[B, k+1, N] canonical mod q; ``mask_sw``/``body_sw``:
    switched degrees in [0, 2N) (u64[B, n] / u64[B]);
    ``bsk_hat``: NTT-domain BSK u64[n, l, k+1, k+1, N]. -> u64[B, k+1, N].

    A zero switched-mask element is a numerical no-op here (rotation diff
    = 0, all digits 0, external product exactly 0), so the scan needs no
    skip branch — the reference's `if *lwe_mask_element != 0` fast path
    (`ntt64_pbs.rs:256`) is a CPU optimization, not a semantic one.
    """
    N = lut.shape[-1]
    R = lut.shape[-2]
    plan = gl.get_plan_g(N)
    nsteps = mask_sw.shape[-1]

    acc = monomial_div_q(lut, body_sw[..., None, None])

    def body_fn(i, acc):
        a_i = lax.dynamic_index_in_dim(mask_sw, i, axis=-1, keepdims=False)
        ct1 = gl.gsub(monomial_mul_q(acc, a_i[..., None, None]), acc)
        digits = decompose_nonnative(ct1, base_log, levels)  # [B, R, N, l]
        digits = jnp.moveaxis(digits, -1, -3)  # [B, l, R, N]
        dres = gl.signed_to_field(digits)
        dhat = gl.fwd_ntt(dres, plan).reshape(
            digits.shape[0], levels * R, N)
        g_i = lax.dynamic_index_in_dim(bsk_hat, i, axis=0, keepdims=False)
        g_i = g_i.reshape(levels * R, R, N)
        out = None
        for j in range(levels * R):
            term = gl.gmul(dhat[:, j, None], g_i[None, j])  # [B, R, N]
            out = term if out is None else gl.gadd(out, term)
        res = gl.inv_ntt(out, plan)  # canonical [B, R, N]
        return gl.gadd(acc, res)

    return lax.fori_loop(0, nsteps, body_fn, acc)


def sample_extract_q(glwe: jnp.ndarray, nth: int = 0) -> jnp.ndarray:
    """GLWE -> LWE of the nth coefficient, negations mod q
    (glwe_sample_extraction.rs with custom modulus)."""
    k_plus_1 = glwe.shape[-2]
    N = glwe.shape[-1]
    k = k_plus_1 - 1
    body = glwe[..., k, nth]
    rev = glwe[..., :k, ::-1]
    opp = N - nth - 1
    idx = jnp.arange(N)
    neg = jnp.where(idx < opp, gl.gneg(rev), rev)
    rotated = jnp.roll(neg, -opp, axis=-1)
    out_mask = rotated.reshape(glwe.shape[:-2] + (k * N,))
    return jnp.concatenate([out_mask, body[..., None]], axis=-1)


def generate_lut_q(poly_size: int, glwe_size: int, message_modulus: int,
                   delta: int, f) -> np.ndarray:
    """Trivial GLWE LUT mod q (generate_programmable_bootstrap_glwe_lut)."""
    N = poly_size
    box = N // message_modulus
    body = np.zeros(N, dtype=np.uint64)
    for i in range(message_modulus):
        val = (f(i) * delta) % Q
        body[i * box:(i + 1) * box] = val
    # negacyclic half-box pre-rotation (mod q negation)
    half = box // 2
    rot = np.concatenate([body[half:], body[:half]])
    rot[N - half:] = np.array(
        [(Q - int(x)) % Q for x in rot[N - half:]], dtype=np.uint64)
    out = np.zeros((glwe_size, N), dtype=np.uint64)
    out[-1] = rot
    return out


def pbs_ntt64(lwe_cts: np.ndarray, lut_glwe: np.ndarray, bsk_hat: jnp.ndarray,
              base_log: int, levels: int) -> np.ndarray:
    """Full PBS mod q: modulus switch (host), blind rotate (device),
    sample extract. ``lwe_cts``: u64[B, n+1] -> u64[B, k*N + 1]."""
    N = lut_glwe.shape[-1]
    B = lwe_cts.shape[0]
    mask_sw = modulus_switch_nonnative(lwe_cts[:, :-1], N)
    body_sw = modulus_switch_nonnative(lwe_cts[:, -1], N)
    lut = jnp.broadcast_to(jnp.asarray(lut_glwe)[None], (B,) + lut_glwe.shape)
    acc = blind_rotate_ntt64(lut, jnp.asarray(mask_sw), jnp.asarray(body_sw),
                             bsk_hat, base_log, levels)
    return np.asarray(sample_extract_q(acc), dtype=np.uint64)
