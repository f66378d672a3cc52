"""Goldilocks field + BNF oracle tests (the v5 kernel's mathematical twin).

Covers: field ops vs python ints (including wrap edge cases), NTT roundtrip
and negacyclic polymul vs schoolbook, the torus<->field modulus switches,
and a full PBS decrypt-correctness run at toy parameters through the
Goldilocks oracle blind rotation.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tfhe_tpu.ops import goldilocks as gl

P = gl.P
rng = np.random.default_rng(0x60111)


def _rand_u64(shape):
    return rng.integers(0, 1 << 64, size=shape, dtype=np.uint64)


def _rand_canon(shape):
    return (_rand_u64(shape) % np.uint64(P)).astype(np.uint64)


EDGE = np.array([0, 1, 2, P - 1, P - 2, (1 << 32) - 1, 1 << 32,
                 (1 << 63), P // 2, P // 2 + 1], dtype=np.uint64)


def test_field_ops_vs_python():
    a = np.concatenate([_rand_canon(500), EDGE])
    b = np.concatenate([_rand_canon(500), EDGE[::-1].copy()])
    ja, jb = jnp.asarray(a), jnp.asarray(b)
    add = np.asarray(gl.gadd(ja, jb))
    sub = np.asarray(gl.gsub(ja, jb))
    mul = np.asarray(gl.gmul(ja, jb))
    neg = np.asarray(gl.gneg(ja))
    for i in range(len(a)):
        x, y = int(a[i]), int(b[i])
        assert int(add[i]) == (x + y) % P
        assert int(sub[i]) == (x - y) % P
        assert int(mul[i]) == (x * y) % P
        assert int(neg[i]) == (-x) % P


def test_gcanon_all_reps():
    x = np.concatenate([_rand_u64(500), EDGE,
                        np.array([(1 << 64) - 1, P], dtype=np.uint64)])
    out = np.asarray(gl.gcanon(jnp.asarray(x)))
    for i in range(len(x)):
        assert int(out[i]) == int(x[i]) % P


def test_torus_to_field_rounding():
    b = np.concatenate([_rand_u64(500), EDGE,
                        np.array([(1 << 64) - 1], dtype=np.uint64)])
    out = np.asarray(gl.torus_to_field(jnp.asarray(b)))
    for i in range(len(b)):
        x = int(b[i])
        expect = ((x * P + (1 << 63)) >> 64) % P
        assert int(out[i]) == expect, (x, int(out[i]), expect)


def test_field_to_torus_close():
    x = np.concatenate([_rand_canon(500), EDGE])
    out = np.asarray(gl.field_to_torus(jnp.asarray(x)))
    for i in range(len(x)):
        v = int(x[i])
        exact = ((v * (1 << 64) + P // 2) // P) % (1 << 64)
        err = (int(out[i]) - exact) % (1 << 64)
        if err > (1 << 63):
            err -= 1 << 64
        assert abs(err) <= 2, (v, err)


def test_roundtrip_torus_field_small_error():
    b = _rand_u64(1000)
    back = np.asarray(gl.field_to_torus(gl.torus_to_field(jnp.asarray(b))))
    err = (back.astype(np.int64) - b.astype(np.int64))
    assert np.abs(err).max() <= 3


@pytest.mark.parametrize("n", [256, 2048])
def test_ntt_roundtrip(n):
    plan = gl.get_plan_g(n)
    x = jnp.asarray(_rand_canon((3, n)))
    y = gl.inv_ntt(gl.fwd_ntt(x, plan), plan)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    yk = gl.inv_ntt_kernel_order(gl.fwd_ntt_kernel_order(x, plan), plan)
    np.testing.assert_array_equal(np.asarray(yk), np.asarray(x))


def test_plan_shift_stage_roots():
    plan = gl.get_plan_g(2048)
    assert plan.G == 16
    # psi^(2N/G) must be 2^12 (so group twiddles are shifts)
    assert gl.gpow(plan.psi, 2 * 2048 // 16) == pow(2, 12, P)
    assert gl.gpow(plan.psi, 2048) == P - 1


def test_negacyclic_polymul_vs_schoolbook():
    n = 256
    plan = gl.get_plan_g(n)
    a = _rand_canon((n,))
    b = _rand_canon((n,))
    got = np.asarray(gl.negacyclic_polymul(jnp.asarray(a), jnp.asarray(b),
                                           plan))
    # schoolbook mod (X^n + 1, P) in python ints
    ref = [0] * n
    for i in range(n):
        ai = int(a[i])
        if ai == 0:
            continue
        for j in range(n):
            k = i + j
            t = ai * int(b[j])
            if k >= n:
                ref[k - n] = (ref[k - n] - t) % P
            else:
                ref[k] = (ref[k] + t) % P
    np.testing.assert_array_equal(got, np.array(ref, dtype=np.uint64))


def test_fwd_matches_naive_dft_point():
    """Spot-check the frequency convention: kernel-order point (g, l) holds
    the negacyclic evaluation at psi^(1 + 2*(l + 128*bitrev(g)))."""
    n = 256
    plan = gl.get_plan_g(n)
    x = _rand_canon((n,))
    hat = np.asarray(gl.fwd_ntt_kernel_order(jnp.asarray(x), plan))
    for (g, l) in [(0, 0), (1, 7), (0, 127), (1, 64)]:
        k = l + 128 * int(format(g, f"0{plan.log_g}b")[::-1], 2)
        root = gl.gpow(plan.psi, 1 + 2 * k)
        val = 0
        rp = 1
        for j in range(n):
            val = (val + int(x[j]) * rp) % P
            rp = rp * root % P
        assert int(hat[g, l]) == val


def test_pbs_goldilocks_toy_correctness():
    """Full PBS through the Goldilocks oracle blind rotation at toy
    parameters: every message decrypts to LUT(m)."""
    from tfhe_tpu.shortint.client_key import ClientKey
    from tfhe_tpu.shortint.server_key import ServerKey
    from tfhe_tpu.utils.params import PARAM_TEST_TOY
    from tfhe_tpu.ops import server as server_ops
    from tfhe_tpu.core import algorithms as algo

    p = PARAM_TEST_TOY
    ck = ClientKey.generate(p, seed=7)
    sk = ServerKey.generate(ck)  # KSK + LUT machinery
    # a fresh standard-domain BSK from the advanced stream (still a valid
    # encryption of the same small key bits under the same GLWE key)
    bsk = algo.gen_bootstrap_key(ck.lwe_sk, ck.glwe_sk, p.pbs_base_log,
                                 p.pbs_level, p.glwe_noise_distribution,
                                 ck._keygen_gen)
    bsk_g = gl.bootstrap_key_to_goldilocks(np.asarray(bsk.data))

    mm = p.message_modulus
    lut_fn = lambda x: (3 * x + 1) % mm
    lut = sk.generate_lookup_table(lut_fn)

    msgs = np.arange(mm, dtype=np.uint64)
    cts = np.stack([np.asarray(ck.encrypt(int(m)).ct) for m in msgs])
    small = server_ops.keyswitch_mxu(jnp.asarray(cts), sk.ksk_i8,
                                     p.ks_base_log, p.ks_level)
    ms_mask, ms_body = server_ops.lwe_centered_binary_modulus_switch(
        small, p.polynomial_size.bit_length())
    lut_b = jnp.broadcast_to(jnp.asarray(lut.acc),
                             (len(msgs),) + lut.acc.shape)
    rotated = gl.blind_rotate_goldilocks(
        lut_b, ms_mask, ms_body, bsk_g, p.pbs_base_log, p.pbs_level)
    out = server_ops.sample_extract(rotated)
    enc = ck.encoding
    raw = algo.lwe_decrypt(ck.big_lwe_sk, np.asarray(out, dtype=np.uint64))
    for i, m in enumerate(msgs):
        dec = int(enc.decode(int(raw[i]))) % mm
        assert dec == lut_fn(int(m)), (int(m), dec, lut_fn(int(m)))
