"""v6 (2-prime BNF) tests: scalar-map specs vs python ints, kernel parity
(bit-exact) against the jnp oracle ``bnf2.blind_rotate_bnf2`` in interpret
mode, and end-to-end shortint correctness with TFHE_NTT_VARIANT=v6."""

import numpy as np
import pytest

import jax.numpy as jnp

from tfhe_tpu.ops import bnf2 as b2
from tfhe_tpu.ops import pbs_kernel as pk

rng = np.random.default_rng(0x66F)

EDGE = np.array([0, 1, (1 << 32) - 1, 1 << 32, (1 << 63),
                 (1 << 64) - 1, b2.QP - 1, b2.QP, b2.QP + 1],
                dtype=np.uint64)


def test_torus_to_qp_exact_round():
    b = np.concatenate([rng.integers(0, 1 << 64, 500, dtype=np.uint64), EDGE])
    out = np.asarray(b2.torus_to_qp(jnp.asarray(b)))
    for i in range(len(b)):
        want = ((int(b[i]) * b2.QP + (1 << 63)) >> 64) % b2.QP
        assert int(out[i]) == want, (i, int(b[i]))


def test_crt2_merge_exact():
    x = np.concatenate([
        rng.integers(0, b2.QP, 500, dtype=np.uint64),
        np.array([0, 1, b2.QP - 1], dtype=np.uint64)])
    r0 = jnp.asarray(x % np.uint64(b2.P0))
    r1 = jnp.asarray(x % np.uint64(b2.P1))
    out = np.asarray(b2.crt2_merge(r0, r1))
    np.testing.assert_array_equal(out, x)


def test_qp_to_torus_error_bound():
    """The spec formula tracks round(x * 2^64 / QP) within [-20, 1]."""
    x = np.concatenate([rng.integers(0, b2.QP, 500, dtype=np.uint64),
                        np.array([0, 1, b2.QP - 1], dtype=np.uint64)])
    out = np.asarray(b2.qp_to_torus(jnp.asarray(x)))
    for i in range(len(x)):
        exact = ((int(x[i]) << 64) + b2.QP // 2) // b2.QP
        diff = (int(out[i]) - exact) % (1 << 64)
        if diff > (1 << 63):
            diff -= 1 << 64
        assert -20 <= diff <= 1, (int(x[i]), diff)


def test_rescale_roundtrip_torus_error():
    """torus -> Z_q' -> torus is the identity within ~(2^64/QP)/2 + 20."""
    b = rng.integers(0, 1 << 64, 500, dtype=np.uint64)
    t = np.asarray(b2.qp_to_torus(b2.torus_to_qp(jnp.asarray(b))))
    diff = (t.astype(np.int64) - b.astype(np.int64))
    assert np.abs(diff).max() <= 40, np.abs(diff).max()


def _kernel_bnf2_c_host(r0, r1):
    """Run the in-kernel bnf2 recombination formula on u32 numpy arrays
    (mirrors pbs_kernel._make_step_kernel_v4's bnf2_c via the same jnp
    primitives outside a kernel)."""
    U32 = jnp.uint32
    m0 = jnp.asarray(r0.astype(np.uint32))
    m1 = jnp.asarray(r1.astype(np.uint32))
    p1 = U32(b2.P1)
    diff = p1 + p1 + m1 - m0
    v1 = pk._condsub(
        pk._shoup(diff, U32(b2.INV01), U32(b2.INV01_SH), p1), p1)
    x_hi, x_lo = pk._mul_hi_lo(v1, U32(b2.P0))
    nlo = x_lo + m0
    x_hi = x_hi + (nlo < x_lo).astype(U32)
    x_lo = nlo
    b_hi, b_lo = pk._mul_hi_lo(x_lo, U32(b2.G1))
    c_hi, c_lo = pk._mul_hi_lo(x_hi, U32(b2.G0))
    d_hi, d_lo = pk._mul_hi_lo(x_hi, U32(b2.G1))
    s_lo = b_lo + c_lo
    s_hi = b_hi + c_hi + (s_lo < b_lo).astype(U32)
    r_lo = (s_lo >> U32(28)) | (s_hi << U32(4))
    r_hi = s_hi >> U32(28)
    u_hi, u_lo = pk._add64(r_hi, r_lo,
                           (d_hi << U32(4)) | (d_lo >> U32(28)),
                           d_lo << U32(4))
    t_hi, t_lo = pk._add64(u_hi, u_lo,
                           (x_hi << U32(4)) | (x_lo >> U32(28)),
                           x_lo << U32(4))
    return ((np.asarray(t_hi).astype(np.uint64) << np.uint64(32))
            | np.asarray(t_lo).astype(np.uint64))


def test_kernel_recomb_matches_oracle_spec():
    """The u32-pair kernel recombination == crt2_merge + qp_to_torus."""
    x = np.concatenate([rng.integers(0, b2.QP, 500, dtype=np.uint64),
                        np.array([0, 1, b2.QP - 1], dtype=np.uint64)])
    r0 = x % np.uint64(b2.P0)
    r1 = x % np.uint64(b2.P1)
    got = _kernel_bnf2_c_host(r0, r1)
    want = np.asarray(b2.qp_to_torus(b2.crt2_merge(
        jnp.asarray(r0), jnp.asarray(r1))))
    np.testing.assert_array_equal(got, want)


def _toy_inputs(batch=4, n_small=8, seed=3, p_n=256):
    levels, R, blog = 1, 2, 23
    r = np.random.default_rng(seed)
    lut = r.integers(0, 1 << 64, size=(batch, R, p_n), dtype=np.uint64)
    mask = r.integers(0, 2 * p_n, size=(batch, n_small), dtype=np.uint64)
    body = r.integers(0, 2 * p_n, size=(batch,), dtype=np.uint64)
    bsk_std = r.integers(0, 1 << 64,
                         size=(n_small, levels, R, R, p_n), dtype=np.uint64)
    bsk2 = b2.bootstrap_key_to_bnf2(bsk_std)
    return lut, mask, body, bsk2, blog, levels


def test_blind_rotate_parity_vs_oracle(monkeypatch):
    """v6 kernel (interpret mode, exact-acc) == jnp oracle, bit-exact."""
    monkeypatch.setenv("TFHE_V4_ACC", "64")
    lut, mask, body, bsk2, blog, levels = _toy_inputs()
    want = np.asarray(b2.blind_rotate_bnf2(
        jnp.asarray(lut), jnp.asarray(mask), jnp.asarray(body), bsk2,
        blog, levels))
    got = np.asarray(pk.blind_rotate_pallas(
        jnp.asarray(lut), jnp.asarray(mask), jnp.asarray(body), bsk2,
        blog, levels, b2.get_plan2(256), batch_tile=2, unroll=2, bnf2=True))
    np.testing.assert_array_equal(got, want)


def test_blind_rotate_parity_unroll1(monkeypatch):
    monkeypatch.setenv("TFHE_V4_ACC", "64")
    lut, mask, body, bsk2, blog, levels = _toy_inputs(batch=2, n_small=5,
                                                      seed=9)
    want = np.asarray(b2.blind_rotate_bnf2(
        jnp.asarray(lut), jnp.asarray(mask), jnp.asarray(body), bsk2,
        blog, levels))
    got = np.asarray(pk.blind_rotate_pallas(
        jnp.asarray(lut), jnp.asarray(mask), jnp.asarray(body), bsk2,
        blog, levels, b2.get_plan2(256), batch_tile=2, unroll=1, bnf2=True))
    np.testing.assert_array_equal(got, want)


def test_blind_rotate_parity_acc32(monkeypatch):
    """v6 kernel under its DEFAULT acc32 accumulator == the jnp oracle's
    acc_round32 twin, bit-exact (the acc32 contract of pbs_kernel.py's
    blind_rotate_pallas docstring, now the v6 shipping mode)."""
    monkeypatch.delenv("TFHE_V4_ACC", raising=False)
    lut, mask, body, bsk2, blog, levels = _toy_inputs(seed=21)
    want = np.asarray(b2.blind_rotate_bnf2(
        jnp.asarray(lut), jnp.asarray(mask), jnp.asarray(body), bsk2,
        blog, levels, acc_round32=True))
    got = np.asarray(pk.blind_rotate_pallas(
        jnp.asarray(lut), jnp.asarray(mask), jnp.asarray(body), bsk2,
        blog, levels, b2.get_plan2(256), batch_tile=2, unroll=2, bnf2=True))
    np.testing.assert_array_equal(got, want)
    # acc32 outputs are multiples of 2^32 by construction
    assert (got & np.uint64((1 << 32) - 1)).max() == 0


# ---------------------------------------------------------------------------
# end-to-end shortint with TFHE_NTT_VARIANT=v6
# ---------------------------------------------------------------------------

@pytest.fixture
def v6_env(monkeypatch):
    monkeypatch.setenv("TFHE_NTT_VARIANT", "v6")


def test_variant_resolution(v6_env):
    from tfhe_tpu.shortint.client_key import ClientKey
    from tfhe_tpu.shortint.server_key import ServerKey
    from tfhe_tpu.utils.params import PARAM_TEST_TOY as p

    ck = ClientKey.generate(p, seed=11)
    sk = ServerKey.generate(ck)
    assert sk.ntt_variant == "v6"
    assert sk.bsk_scan_b.shape == (
        p.lwe_dimension, 2, 2, p.pbs_level * 2, 2, p.polynomial_size)


def test_apply_lookup_table_v6(v6_env):
    from tfhe_tpu.shortint.client_key import ClientKey
    from tfhe_tpu.shortint.server_key import ServerKey
    from tfhe_tpu.utils.params import PARAM_TEST_TOY as p

    ck = ClientKey.generate(p, seed=11)
    sk = ServerKey.generate(ck)
    mm = p.message_modulus
    lut = sk.generate_lookup_table(lambda x: (x * x + 1) % mm)
    for m in range(mm):
        ct = ck.encrypt(m)
        out = sk.apply_lookup_table(ct, lut)
        assert int(ck.decrypt(out)) == (m * m + 1) % mm, m


def test_blind_rotate_prepermuted_key_parity(monkeypatch):
    """Pre-permuted kernel-order BSK (bsk_scan_to_kernel_order, the
    production key layout — hoists the whole-key frequency gather out of
    the jitted rotation) must be bit-identical to the spec-layout key,
    and the inverse map must round-trip exactly."""
    monkeypatch.delenv("TFHE_V4_ACC", raising=False)
    lut, mask, body, bsk2, blog, levels = _toy_inputs(seed=33)
    bsk_k = pk.bsk_scan_to_kernel_order(bsk2, blog)
    assert bsk_k.shape == bsk2.shape[:-1] + (bsk2.shape[-1] // 128, 128)
    np.testing.assert_array_equal(
        np.asarray(pk.kernel_order_to_bsk_scan(bsk_k, blog)),
        np.asarray(bsk2))
    want = np.asarray(pk.blind_rotate_pallas(
        jnp.asarray(lut), jnp.asarray(mask), jnp.asarray(body), bsk2,
        blog, levels, b2.get_plan2(256), batch_tile=2, unroll=2, bnf2=True))
    got = np.asarray(pk.blind_rotate_pallas(
        jnp.asarray(lut), jnp.asarray(mask), jnp.asarray(body), bsk_k,
        blog, levels, b2.get_plan2(256), batch_tile=2, unroll=2, bnf2=True))
    np.testing.assert_array_equal(got, want)


def test_pbs_bnf2_accepts_prepermuted_key(monkeypatch):
    """programmable_bootstrap_bnf2 is layout-agnostic: the 7-dim
    kernel-order key must give bit-identical outputs on the jnp oracle
    path (use_pallas=False converts back via the exact inverse)."""
    from tfhe_tpu.ops import server as server_ops
    from tfhe_tpu.shortint.client_key import ClientKey
    from tfhe_tpu.utils.params import PARAM_TEST_TOY as p

    monkeypatch.setenv("TFHE_NTT_VARIANT", "v6")
    from tfhe_tpu.shortint.server_key import ServerKey

    ck = ClientKey.generate(p, seed=17)
    sk = ServerKey.generate(ck)
    mm = p.message_modulus
    lut = sk.generate_lookup_table(lambda x: (x + 1) % mm)
    ct = ck.encrypt(1)
    bsk6 = sk.bsk_scan_b
    bsk7 = sk.bsk_scan_b_k
    assert bsk7.ndim == 7
    a = np.asarray(server_ops.programmable_bootstrap_bnf2(
        ct.ct[None], lut.acc[None], bsk6, p.pbs_base_log, p.pbs_level,
        use_pallas=False))
    b = np.asarray(server_ops.programmable_bootstrap_bnf2(
        ct.ct[None], lut.acc[None], bsk7, p.pbs_base_log, p.pbs_level,
        use_pallas=False))
    np.testing.assert_array_equal(a, b)


def test_bsk_b_roundtrip_derivation(v6_env):
    """The lazy CRT->standard->BNF2 derivation must equal the direct
    embedding of the raw standard-domain key."""
    from tfhe_tpu.core import algorithms as algo
    from tfhe_tpu.core.algorithms import bootstrap_key_to_ntt
    from tfhe_tpu.ops.pbs_kernel import bsk_to_scan_layout
    from tfhe_tpu.shortint.client_key import ClientKey
    from tfhe_tpu.shortint.server_key import ServerKey
    from tfhe_tpu.utils.params import PARAM_TEST_TOY as p

    ck = ClientKey.generate(p, seed=13)
    bsk = algo.gen_bootstrap_key(ck.lwe_sk, ck.glwe_sk, p.pbs_base_log,
                                 p.pbs_level, p.glwe_noise_distribution,
                                 ck._keygen_gen)
    hat = bootstrap_key_to_ntt(bsk, 4)
    sk = ServerKey(params=p, ksk=None, ksk_i8=None,
                   bsk_scan=bsk_to_scan_layout(hat.residues), num_primes=4)
    direct = np.asarray(b2.bootstrap_key_to_bnf2(np.asarray(bsk.data)))
    derived = np.asarray(sk.bsk_scan_b)
    np.testing.assert_array_equal(derived, direct)


# ---------------------------------------------------------------------------
# v6b FAST28 flavor (sub-2^29 lazy-reduction pair)
# ---------------------------------------------------------------------------

def test_fast28_switchback_spec():
    """FAST28's generic-shift switch-back maps stay within the documented
    error of the exact rounding (qp_to_torus undershoot and the centered
    qp_to_torus32 error), and torus_to_qp is the exact round."""
    fl = b2.FAST28
    xs = np.concatenate([
        rng.integers(0, fl.qp, 2000, dtype=np.uint64),
        np.array([0, 1, fl.qp - 1], dtype=np.uint64)])
    got = np.asarray(b2.qp_to_torus(jnp.asarray(xs), fl))
    exact = np.array([(int(x) << 64) // fl.qp & ((1 << 64) - 1)
                      for x in xs], dtype=np.uint64)
    under = (exact - got).astype(np.int64)
    assert under.min() >= 0 and under.max() < 1 << 10, (
        under.min(), under.max())

    r0 = xs % np.uint64(fl.p0)
    r1 = xs % np.uint64(fl.p1)
    merged = np.asarray(b2.crt2_merge(jnp.asarray(r0), jnp.asarray(r1), fl))
    np.testing.assert_array_equal(merged, xs)
    t32 = np.asarray(b2.qp_to_torus32(jnp.asarray(r0), jnp.asarray(r1), fl))
    want32 = np.array([(int(x) * (1 << 32) + fl.qp // 2) // fl.qp
                       for x in xs], dtype=np.uint64) & np.uint64(0xFFFFFFFF)
    err32 = (want32.astype(np.int64) - t32.astype(np.int64))
    err32 = (err32 + (1 << 31)) % (1 << 32) - (1 << 31)  # mod-2^32 wrap
    assert abs(err32).max() <= 2, abs(err32).max()

    bs = rng.integers(0, 1 << 64, 500, dtype=np.uint64)
    got_q = np.asarray(b2.torus_to_qp(jnp.asarray(bs), fl))
    want_q = np.array([((int(v) * fl.qp + (1 << 63)) >> 64) % fl.qp
                       for v in bs], dtype=np.uint64)
    np.testing.assert_array_equal(got_q, want_q)


def _toy_inputs_fast28(batch=4, n_small=8, seed=3, p_n=256):
    levels, R, blog = 1, 2, 23
    r = np.random.default_rng(seed)
    lut = r.integers(0, 1 << 64, size=(batch, R, p_n), dtype=np.uint64)
    mask = r.integers(0, 2 * p_n, size=(batch, n_small), dtype=np.uint64)
    body = r.integers(0, 2 * p_n, size=(batch,), dtype=np.uint64)
    bsk_std = r.integers(0, 1 << 64,
                         size=(n_small, levels, R, R, p_n), dtype=np.uint64)
    bsk2 = b2.bootstrap_key_to_bnf2(bsk_std, flavor=b2.FAST28)
    return lut, mask, body, bsk2, blog, levels


def test_blind_rotate_fast28_parity_exact_acc(monkeypatch):
    """v6b kernel (FAST28 lazy reduction, interpret mode, exact acc) ==
    the flavor-generic jnp oracle, bit-exact — proves the lazy 4p-bound
    arithmetic is exact and the generic-shift tail matches the spec."""
    monkeypatch.setenv("TFHE_V4_ACC", "64")
    lut, mask, body, bsk2, blog, levels = _toy_inputs_fast28()
    want = np.asarray(b2.blind_rotate_bnf2(
        jnp.asarray(lut), jnp.asarray(mask), jnp.asarray(body), bsk2,
        blog, levels, flavor=b2.FAST28))
    got = np.asarray(pk.blind_rotate_pallas(
        jnp.asarray(lut), jnp.asarray(mask), jnp.asarray(body), bsk2,
        blog, levels, b2.FAST28.plan(256), batch_tile=2, unroll=2,
        bnf2=True, bnf2_flavor=b2.FAST28))
    np.testing.assert_array_equal(got, want)


def test_blind_rotate_fast28_parity_acc32(monkeypatch):
    monkeypatch.delenv("TFHE_V4_ACC", raising=False)
    lut, mask, body, bsk2, blog, levels = _toy_inputs_fast28(seed=21)
    want = np.asarray(b2.blind_rotate_bnf2(
        jnp.asarray(lut), jnp.asarray(mask), jnp.asarray(body), bsk2,
        blog, levels, acc_round32=True, flavor=b2.FAST28))
    got = np.asarray(pk.blind_rotate_pallas(
        jnp.asarray(lut), jnp.asarray(mask), jnp.asarray(body), bsk2,
        blog, levels, b2.FAST28.plan(256), batch_tile=2, unroll=2,
        bnf2=True, bnf2_flavor=b2.FAST28))
    np.testing.assert_array_equal(got, want)
    assert (got & np.uint64((1 << 32) - 1)).max() == 0


def test_apply_lookup_table_v6b(monkeypatch):
    """End-to-end shortint under TFHE_NTT_VARIANT=v6b (FAST28 lazy
    kernel): variant resolution (incl. the noise-margin gate at the
    larger 2^-57 rescale noise) and exhaustive LUT decrypt."""
    monkeypatch.setenv("TFHE_NTT_VARIANT", "v6b")
    from tfhe_tpu.shortint.client_key import ClientKey
    from tfhe_tpu.shortint.server_key import ServerKey
    from tfhe_tpu.utils.params import PARAM_TEST_TOY as p

    ck = ClientKey.generate(p, seed=11)
    sk = ServerKey.generate(ck)
    assert sk.ntt_variant == "v6b"
    mm = p.message_modulus
    lut = sk.generate_lookup_table(lambda x: (x * x + 1) % mm)
    ct = ck.encrypt(np.arange(mm, dtype=np.uint64))
    out = sk.apply_lookup_table(ct, lut)
    got = np.asarray(ck.decrypt(out))
    want = (np.arange(mm, dtype=np.uint64) ** 2 + 1) % mm
    np.testing.assert_array_equal(got, want)
