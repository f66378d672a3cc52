"""NTT64 prime-modulus PBS (ciphertext modulus == the Goldilocks NTT prime).

Mirrors the reference's doc example and decomposer doc-vectors:
- ``core_crypto/algorithms/lwe_programmable_bootstrapping/ntt64_pbs.rs:31-176``
  (the complete PBS recipe at n=742, k=1, N=2048, b=23, l=1,
  q = 2^64 - 2^32 + 1, 4-bit messages)
- ``commons/math/decomposition/decomposer.rs:310-548`` doc asserts
  (init state vectors at q = 2^48 +- 1, term bounds at the Goldilocks q)
"""

import numpy as np
import pytest

import tfhe_tpu  # noqa: F401  (enables x64)
from tfhe_tpu.ops import goldilocks as gl
from tfhe_tpu.ops import ntt64_pbs as nn

Q = nn.Q


# ---------------------------------------------------------------------------
# SignedDecomposerNonNative unit vectors
# ---------------------------------------------------------------------------

def test_init_state_doc_vectors():
    # decomposer.rs:470-490: q = 2^48 - 1 and 2^48 + 1, b=4, l=3,
    # input 249280154129830 -> closest_abs 32160715112448
    for q in [(1 << 48) - 1, (1 << 48) + 1]:
        q_bits = q.bit_length()
        state, neg = nn.init_state_nonnative(
            np.array([249280154129830], dtype=np.uint64), 4, 3, q)
        got = int(np.asarray(state)[0]) << (q_bits - 12)
        assert got == 32160715112448, (q, got)


def test_decompose_term_bounds_and_count():
    # decomposer.rs:576-598: b=4, l=3, q Goldilocks; both arms of the
    # half-basis carry check
    b, lev = 4, 3
    half = (1 << b) // 2
    vals = np.array([1 << 63, 9223372032559808513], dtype=np.uint64)
    d = np.asarray(nn.decompose_nonnative(vals, b, lev))
    assert d.shape == (2, lev)
    assert np.all(d >= -half) and np.all(d <= half)


def test_decompose_recompose_mod_q():
    # recompose(decompose(v)) == closest_representable(v) mod q
    # (decomposer.rs:620-637)
    rng = np.random.default_rng(7)
    b, lev = 6, 4
    vals = rng.integers(0, Q, size=256, dtype=np.uint64)
    vals = np.concatenate([vals, np.array(
        [0, 1, Q - 1, Q // 2, Q // 2 + 1, (1 << 63), Q - (1 << 40)],
        dtype=np.uint64)])
    digs = np.asarray(nn.decompose_nonnative(vals, b, lev)).astype(np.int64)
    q_bits = 64
    rec = np.zeros(len(vals), dtype=object)
    for idx in range(lev):
        level = lev - idx
        rec += digs[:, idx].astype(object) * (1 << (q_bits - b * level))
    rec = np.array([int(x) % Q for x in rec], dtype=np.uint64)
    want = np.asarray(
        nn.closest_representable_nonnative(vals, b, lev)).astype(np.uint64)
    assert np.array_equal(rec, want)


def test_modulus_switch_nonnative():
    # round(v * 2N / q) for hand values
    N = 2048
    assert nn.modulus_switch_nonnative(np.uint64(0), N) == 0
    # v = q/2 -> N
    got = nn.modulus_switch_nonnative(np.array([Q // 2], dtype=np.uint64), N)
    assert int(got[0]) in (N - 1, N)
    got = nn.modulus_switch_nonnative(np.array([Q - 1], dtype=np.uint64), N)
    assert int(got[0]) == 2 * N  # rounds up to 2N (degree 2N == 0 mod X^N+1
    # with sign +: X^{2N} = 1); monomial ops take degrees in [0, 2N]


# ---------------------------------------------------------------------------
# mod-q encryption round trips
# ---------------------------------------------------------------------------

def test_glwe_encrypt_decrypt_q():
    rng = np.random.default_rng(1)
    k, N = 2, 256
    sk = rng.integers(0, 2, size=(k, N)).astype(np.uint8)
    delta = (1 << 59)
    msgs = (rng.integers(0, 16, size=(3, N), dtype=np.uint64)
            * np.uint64(delta)) % np.uint64(Q)
    cts = nn.glwe_encrypt_q(sk, msgs, 3e3, rng)
    phase = nn.glwe_decrypt_q(sk, cts)
    dec = nn.decode_q(phase, delta)
    assert np.array_equal(dec % 16, (msgs // np.uint64(delta)) % 16)


def test_lwe_encrypt_decrypt_q():
    rng = np.random.default_rng(2)
    n = 128
    sk = rng.integers(0, 2, size=n).astype(np.uint8)
    delta = 1 << 59
    pts = (np.arange(8, dtype=np.uint64) * np.uint64(delta)) % np.uint64(Q)
    cts = nn.lwe_encrypt_q(sk, pts, 1e6, rng)
    dec = nn.decode_q(nn.lwe_decrypt_q(sk, cts), delta)
    assert np.array_equal(dec, np.arange(8, dtype=np.uint64))


# ---------------------------------------------------------------------------
# the doc-example PBS, decrypt-correct at the exact recipe parameters
# ---------------------------------------------------------------------------

def test_pbs_ntt64_doc_example():
    """ntt64_pbs.rs:31-176: n=742, k=1, N=2048, b=23, l=1, 4-bit messages,
    f(x) = 2x; input 3 -> 6 (we batch all 16 messages)."""
    rng = np.random.default_rng(42)
    n, k, N = 742, 1, 2048
    base_log, levels = 23, 1
    mm = 16
    delta = (1 << 63) // mm
    # noise: doc stddevs are relative to q
    lwe_std = 0.000007069849454709433 * Q
    glwe_std = 0.00000000000000029403601535432533 * Q

    lwe_sk = rng.integers(0, 2, size=n).astype(np.uint8)
    glwe_sk = rng.integers(0, 2, size=(k, N)).astype(np.uint8)
    big_sk = glwe_sk.reshape(-1)  # into_lwe_secret_key

    bsk_q = nn.gen_bootstrap_key_ntt64(lwe_sk, glwe_sk, base_log, levels,
                                       glwe_std, rng)
    bsk_hat = nn.bootstrap_key_to_ntt64(bsk_q)

    msgs = np.arange(mm, dtype=np.uint64)
    pts = (msgs * np.uint64(delta)) % np.uint64(Q)
    cts = nn.lwe_encrypt_q(lwe_sk, pts, lwe_std, rng)

    lut = nn.generate_lut_q(N, k + 1, mm, delta, lambda x: 2 * x)
    out = nn.pbs_ntt64(cts, lut, bsk_hat, base_log, levels)

    phase = nn.lwe_decrypt_q(big_sk, out)
    dec = nn.decode_q(phase, delta)
    # f(m) = 2m encodes on 5 bits (max 30); the padding-bit convention makes
    # the cleartext space Z_{2*mm}, and the decoded canonical-mod-q value is
    # negative (q - v) for phases past q/2 — compare in signed form mod 2*mm
    signed = np.array([int(v) - Q if int(v) > Q // 2 else int(v)
                       for v in dec])
    assert np.array_equal(signed % (2 * mm), (2 * msgs.astype(int)) % (2 * mm)), signed


def test_external_product_exactness_small():
    """The mod-q external product is EXACT (no transform rounding): with a
    zero-noise GGSW of bit=1, one CMUX returns the rotated accumulator's
    closest-representable phase exactly."""
    rng = np.random.default_rng(3)
    n, k, N = 2, 1, 256
    base_log, levels = 23, 1
    lwe_sk = np.ones(n, dtype=np.uint8)
    glwe_sk = rng.integers(0, 2, size=(k, N)).astype(np.uint8)
    bsk_q = nn.gen_bootstrap_key_ntt64(lwe_sk, glwe_sk, base_log, levels,
                                       0.0, rng)
    bsk_hat = nn.bootstrap_key_to_ntt64(bsk_q)

    delta = (1 << 63) // 16
    lut = nn.generate_lut_q(N, k + 1, 16, delta, lambda x: x)
    import jax.numpy as jnp
    B = 2
    mask_sw = np.array([[3, 0], [5, 2 * N - 1]], dtype=np.uint64)
    body_sw = np.array([0, 7], dtype=np.uint64)
    acc = nn.blind_rotate_ntt64(
        jnp.broadcast_to(jnp.asarray(lut)[None], (B, k + 1, N)),
        jnp.asarray(mask_sw), jnp.asarray(body_sw), bsk_hat,
        base_log, levels)
    # oracle: trivial LUT rotated by -body + sum(mask) with s=1 per step,
    # phases tracked exactly mod q
    got_phase = nn.glwe_decrypt_q(glwe_sk, np.asarray(acc, dtype=np.uint64))
    for bi in range(B):
        rot = (2 * N - int(body_sw[bi]) + int(mask_sw[bi].sum())) % (2 * N)
        want = np.asarray(
            nn.monomial_mul_q(jnp.asarray(lut[-1][None]),
                              jnp.asarray(np.uint64(rot))),
            dtype=np.uint64)[0]
        # the decomposition is approximate (closest representable), so the
        # phase matches up to the per-step rounding bound: l=1, b=23 ->
        # |err| <= N * 2^(64-23-1) per step... with bit=1 and exact zero
        # noise the CMUX output phase = closest(rotated - acc) + acc; allow
        # the rounding slack
        err = (got_phase[bi].astype(object) - want.astype(object)) % Q
        err = np.array([min(int(e), Q - int(e)) for e in err.reshape(-1)])
        assert err.max() <= 2 * N * (1 << (64 - base_log * levels)), err.max()


if __name__ == "__main__":
    import sys
    pytest.main([__file__, "-v"] + sys.argv[1:])
