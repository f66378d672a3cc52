"""ZK pke proof tests: curve sanity plus a prove/verify round trip on a
reduced-dimension statement (same code path as the reference's
d=1024/k=320 sizes — tfhe-zk-pok/src/proofs/pke.rs test_pke — but sized
for pure-Python pairings)."""

import numpy as np
import pytest

from tfhe_tpu.zk.curve import F12_ONE, G1, G2, R, f12_pow, pairing
from tfhe_tpu.zk.pke import PkeCrs, prove, verify

_MASK = (1 << 64) - 1


def _i64(x):
    x &= _MASK
    return x - (1 << 64) if x >= (1 << 63) else x


def _polymul_rev(a, b, d):
    """Negacyclic rot(a) . bar(b), wrapping i64 (proofs/mod.rs:476-491)."""
    c = [0] * d
    for i in range(d):
        for j in range(d):
            p = a[i] * b[d - j - 1]
            if i + j < d:
                c[i + j] = _i64(c[i + j] + p)
            else:
                c[i + j - d] = _i64(c[i + j - d] - p)
    return c


def _gen_testcase(rng, d, k, B, t, pad):
    t_eff = t >> pad
    a = [
        _i64(int.from_bytes(bytes(rng.integers(0, 256, 8).tolist()), "little"))
        for _ in range(d)
    ]
    s = [int(rng.integers(0, 2)) for _ in range(d)]
    e = [int(rng.integers(0, 2 * B)) - B for _ in range(d)]
    e1 = [int(rng.integers(0, 2 * B)) - B for _ in range(d)]
    e2 = [int(rng.integers(0, 2 * B)) - B for _ in range(k)]
    r = [int(rng.integers(0, 2)) for _ in range(d)]
    m = [int(rng.integers(0, t_eff)) for _ in range(k)]
    b = [_i64(x + ei) for x, ei in zip(_polymul_rev(a, s, d), e)]
    delta = (1 << 64) // t
    c1 = [_i64(x + ei) for x, ei in zip(_polymul_rev(a, r, d), e1)]
    c2 = []
    for i in range(k):
        dot = 0
        for j in range(d):
            bj = b[d - j - i - 1] if i + j < d else _i64(-b[2 * d - j - i - 1])
            dot = _i64(dot + r[d - j - 1] * bj)
        c2.append(_i64(dot + e2[i] + _i64(delta * m[i])))
    return (a, b, c1, c2), (r, e1, m, e2), (s, m)


def test_pairing_bilinear():
    g1, g2 = G1.generator(), G2.generator()
    assert g1.in_subgroup() and g2.in_subgroup()
    e = pairing(g1, g2)
    assert e != F12_ONE
    assert f12_pow(e, R) == F12_ONE
    a, b = 123457, 987653
    assert pairing(a * g1, b * g2) == f12_pow(e, a * b % R)


@pytest.fixture(scope="module")
def crs():
    return PkeCrs.generate(d=8, k=1, b=256, q=0, t=32, pad_bits=1, seed=7)


def test_pke_prove_verify_roundtrip(crs):
    rng = np.random.default_rng(3)
    public, private, _ = _gen_testcase(rng, 8, 1, 256, 32, 1)
    proof = prove(crs, public, private, metadata=b"meta", seed=b"s")
    assert verify(proof, crs, public, metadata=b"meta")


def test_proven_compact_list_roundtrip():
    """encrypt_and_prove -> verify_and_expand -> decrypt, plus rejection of
    a tampered body (compact_list.rs verify-and-expand flow)."""
    from tfhe_tpu.shortint.compact_public_key import (
        CompactPrivateKey,
        CompactPublicKey,
    )
    from tfhe_tpu.utils.params import (
        CompactPublicKeyEncryptionParameters,
        DynamicDistribution,
    )
    from tfhe_tpu.zk.proven_list import (
        ProvenCompactCiphertextList,
        crs_for_params,
    )

    P = CompactPublicKeyEncryptionParameters(
        encryption_lwe_dimension=16,
        encryption_noise_distribution=DynamicDistribution.t_uniform(3),
        message_modulus=4,
        carry_modulus=4,
        name="TOY_PKE_ZK",
    )
    priv = CompactPrivateKey.generate(P, seed=5)
    pk = CompactPublicKey.generate(priv)
    zk_crs = crs_for_params(P, max_bin_messages=4, seed=1)
    lst = ProvenCompactCiphertextList.encrypt_and_prove(
        pk, [1, 2, 3, 0], zk_crs, metadata=b"md"
    )
    ct = lst.verify_and_expand(zk_crs, pk, metadata=b"md")
    dec = priv.decrypt_expanded(np.asarray(ct.ct))
    assert list(dec) == [1, 2, 3, 0]

    lst.ct_list.bodies[1] += np.uint64(1 << 60)
    assert not lst.verify(zk_crs, pk, metadata=b"md")
    with pytest.raises(ValueError):
        lst.verify_and_expand(zk_crs, pk, metadata=b"md")


def test_pke_rejects_tampering(crs):
    rng = np.random.default_rng(4)
    public, private, _ = _gen_testcase(rng, 8, 1, 256, 32, 1)
    proof = prove(crs, public, private, metadata=b"", seed=b"s")
    # wrong metadata
    assert not verify(proof, crs, public, metadata=b"x")
    # tampered ciphertext body
    a, b, c1, c2 = public
    bad = (a, b, c1, [_i64(c2[0] + (1 << 59))])
    assert not verify(proof, crs, bad, metadata=b"")


# ---------------------------------------------------------------------------
# pke v2 (norm-bound proof, tfhe-zk-pok/src/proofs/pke_v2)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def crs_v2():
    from tfhe_tpu.zk.pke_v2 import PkeV2Crs

    return PkeV2Crs.generate(d=4, k=1, b_inf=2, q=0, t=8, pad_bits=1,
                             seed=11)


def _gen_testcase_v2(rng, d, k, B, t, pad):
    # same statement family as v1 but noise bounded by B_inf for the norm
    return _gen_testcase(rng, d, k, B, t, pad)


def test_four_squares():
    from tfhe_tpu.zk.four_squares import four_squares

    for v in [0, 1, 2, 3, 6, 7, 15, 28, 240, (1 << 97) + 12345]:
        s = four_squares(v)
        assert sum(x * x for x in s) == v


def test_pke_v2_prove_verify_roundtrip(crs_v2):
    from tfhe_tpu.zk import pke_v2

    rng = np.random.default_rng(5)
    public, private, _ = _gen_testcase(rng, 4, 1, 2, 8, 1)
    proof = pke_v2.prove(crs_v2, public, private, metadata=b"m2", seed=b"s2")
    assert pke_v2.verify(proof, crs_v2, public, metadata=b"m2")


def test_pke_v2_rejects_tampering(crs_v2):
    from tfhe_tpu.zk import pke_v2

    rng = np.random.default_rng(6)
    public, private, _ = _gen_testcase(rng, 4, 1, 2, 8, 1)
    proof = pke_v2.prove(crs_v2, public, private, metadata=b"m", seed=b"s")
    a, b, c1, c2 = public
    bad = (a, b, [c1[0] + (1 << 50)] + c1[1:], c2)
    assert not pke_v2.verify(proof, crs_v2, bad, metadata=b"m")
    assert not pke_v2.verify(proof, crs_v2, public, metadata=b"other")


def test_proven_compact_list_v2_roundtrip():
    """Same flow as the v1 proven-list test but with the pke_v2 scheme
    (crs_for_params_v2 — the reference default since v0.11)."""
    from tfhe_tpu.shortint.compact_public_key import (
        CompactPrivateKey,
        CompactPublicKey,
    )
    from tfhe_tpu.utils.params import (
        CompactPublicKeyEncryptionParameters,
        DynamicDistribution,
    )
    from tfhe_tpu.zk.proven_list import (
        ProvenCompactCiphertextList,
        crs_for_params_v2,
    )

    P = CompactPublicKeyEncryptionParameters(
        encryption_lwe_dimension=16,
        encryption_noise_distribution=DynamicDistribution.t_uniform(3),
        message_modulus=4,
        carry_modulus=4,
        name="TOY_PKE_ZK2",
    )
    priv = CompactPrivateKey.generate(P, seed=5)
    pk = CompactPublicKey.generate(priv)
    zk_crs = crs_for_params_v2(P, max_bin_messages=4, seed=2)
    lst = ProvenCompactCiphertextList.encrypt_and_prove(
        pk, [3, 0, 2], zk_crs, metadata=b"md2"
    )
    ct = lst.verify_and_expand(zk_crs, pk, metadata=b"md2")
    dec = priv.decrypt_expanded(np.asarray(ct.ct))
    assert list(dec) == [3, 0, 2]

    lst.ct_list.bodies[0] += np.uint64(1 << 59)
    assert not lst.verify(zk_crs, pk, metadata=b"md2")


def test_native_curve_backend_matches_python():
    """The C hot-loop backend (native/bls446.c) must agree point-for-point
    with the pure-Python curve (the spec) on fixed-base power generation
    and Pippenger MSM, over both groups."""
    import random

    from tfhe_tpu.zk import curve as cv

    if cv._native_lib() is None:
        pytest.skip("native BLS12-446 backend unavailable")
    rnd = random.Random(11)
    alpha = rnd.randrange(cv.R)
    scalars = [pow(alpha, j, cv.R) for j in range(1, 25)] + [0]
    for cls, ops in ((cv.G1, cv.FQ_OPS), (cv.G2, cv.FQ2_OPS)):
        nat = cv._native_fixed_powers(cls, scalars, 8)
        tbl = cv._FixedBaseTable(cls.GEN, ops, bits=cv.R.bit_length())
        pure = tbl.mul_many(scalars)
        assert [p.pt for p in nat] == pure
        pts = [p.pt for p in nat]
        ks = [rnd.randrange(cv.R) for _ in pts]
        ks[3] = 0  # zero scalar and infinity point both exercised
        nat_msm = cv._native_msm(cls, pts, ks)
        j = cv._msm_pippenger(pts, ks, ops, bits=cv.R.bit_length())
        (aff,) = cv._jac_to_affine_batch([j], ops)
        assert nat_msm.pt == aff


def test_native_pairing_matches_python():
    """The C pairing (native/bls446.c: Fq6/Fq12 tower, generic Miller,
    shared final exp — the same construction as the Python spec) must
    produce the IDENTICAL Fq12 value, verify a true bilinearity product,
    and reject a perturbed one."""
    from tfhe_tpu.zk import curve as cv

    if (cv._native_lib() is None
            or not hasattr(cv._native_lib(), "pairing_product_is_one")):
        pytest.skip("native pairing unavailable")
    P1, Q1 = cv.G1(cv.G1.GEN), cv.G2(cv.G2.GEN)
    assert cv._native_pairing_eval(P1, Q1) == cv.pairing(P1, Q1)
    a, b = 987654321, 123456789
    good = [(P1 * a, Q1 * b), (P1 * (-(a * b) % cv.R), Q1)]
    assert cv._native_pairing_product(good) is True
    assert cv.pairing_product_is_one(good)  # dispatches native
    bad = [(P1 * a, Q1 * b), (P1, Q1)]
    assert cv._native_pairing_product(bad) is False
    # zero points skip their pair, like the Python path
    assert cv._native_pairing_product(
        [(cv.G1.zero(), Q1), (P1, cv.G2.zero())]) is True


def test_transcript_reference_framing():
    """zk/transcript.py mirrors the Rust sha3 framing byte-for-byte:

    1. the zero-bits encoding reproduces the REFERENCE'S OWN unit-test
       vectors (hashes.rs:1390-1409) exactly;
    2. the ternary R mapping, base-3 packing, Compact powers expansion,
       Montgomery byte encodings and the 42-bit-mask/REDC scalar
       derivation match independent recomputations of the documented
       construction;
    3. the full chain is deterministic and challenge-order dependent.
    """
    import hashlib

    from tfhe_tpu.zk import transcript as tr
    from tfhe_tpu.zk.curve import G1, R as ZP

    # (1) reference unit-test vectors, copied verbatim from hashes.rs
    assert tr.encode_proven_zero_bits_anybit_anyslot(1, 1 << 5, 6) == bytes(
        [0b11101111, 0b10111101, 0b11110111, 0b11110])
    assert tr.encode_proven_zero_bits_anybit_anyslot(2, 1 << 9, 3) == bytes(
        [0b1111111, 0b11111110, 0b11111100, 0b1])

    # (2a) scalar derivation: 56-byte read, top limb masked to 42 bits,
    # then * 2^-128 mod r (Zp::hash / from_raw_u64x7)
    (got,) = tr.zp_hash([b"abc"], 1)
    raw = hashlib.shake_256(b"abc").digest(56)
    u = int.from_bytes(raw, "little") & ((1 << 426) - 1)
    assert got == u * pow(1 << 128, -1, ZP) % ZP
    # 128-bit scalars are plain 16-byte reads
    assert tr.zp_hash_128([b"abc"], 1) == [
        int.from_bytes(hashlib.shake_256(b"abc").digest(16), "little")]

    # (2b) Montgomery byte encodings (arkworks Fp limbs)
    assert tr.zp_bytes(1) == ((1 << 320) % ZP).to_bytes(40, "little")
    gb = tr.g1_bytes(G1(G1.GEN))
    assert len(gb) == 113 and gb[-1] == 0
    assert tr.g1_bytes(G1.zero())[-1] == 1

    # (2c) ternary stream mapping {0,1->0, 2->1, 3->-1} and base-3 pack
    R = tr.gen_R([b"seed"], 128, 4)
    stream = hashlib.shake_256(b"seed").digest(128 * 4)
    want = [{0: 0, 1: 0, 2: 1, 3: -1}[b & 3] for b in stream]
    assert R == want
    # digits are (value + 1): [1,-1,0,0,0] -> [2,0,1,1,1] base-3 LE
    assert tr.encode_R_compact([1, -1, 0, 0, 0]) == bytes(
        [2 * 1 + 0 * 3 + 1 * 9 + 1 * 27 + 1 * 81])
    assert tr.encode_R_compact([0] * 5) == bytes([1 + 3 + 9 + 27 + 81])

    # (2d) Compact mode: scalar1 powers, bytes = Montgomery(scalar1)
    vals, b1 = tr.gen_scalars_compact([b"x"], 5)
    (s1,) = tr.zp_hash([b"x"], 1)
    assert vals == [1, s1, s1 * s1 % ZP, pow(s1, 3, ZP), pow(s1, 4, ZP)]
    assert b1 == tr.zp_bytes(s1)

    # (3) chain determinism + order dependence
    ds = tr.separators_from_crs_ds(b"test-ds")
    def chain(meta):
        t = tr.PkeV2Transcript(ds, b"\x00" * 16, meta, b"xbytes",
                               D=10, m=3, n=394, k=1, d=8)
        t.gen_R(b"A", b"B", b"C")
        phi = t.gen_phi(b"D")
        xi = t.gen_xi(b"E")
        return phi, xi
    assert chain(b"m1") == chain(b"m1")
    assert chain(b"m1") != chain(b"m2")


def test_poly_mul_kronecker_matches_schoolbook():
    import random

    from tfhe_tpu.zk.pke import _poly_mul_mod

    rnd = random.Random(3)
    ZP = R
    a = [rnd.randrange(ZP) for _ in range(67)]
    b = [rnd.randrange(ZP) for _ in range(45)]
    out = _poly_mul_mod(a, b, ZP)
    ref = [0] * (len(a) + len(b) - 1)
    for i, ai in enumerate(a):
        for j, bj in enumerate(b):
            ref[i + j] = (ref[i + j] + ai * bj) % ZP
    assert out == ref


def test_zk_v2_production_dimensions():
    """End-to-end pke_v2 at the reference's production PKE parameter set
    (PARAM_PKE_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128: d = 2048,
    t_uniform(17) — tfhe-zk-pok/src/proofs/pke_v2.rs:638 sizing). Runs in
    ~15 s with the native curve backend; see tools/zk_prod_bench.py and
    ZK_PROD_r04.json for the recorded 4xFheUint64 (k = 128) wall times."""
    from tfhe_tpu.shortint.compact_public_key import (
        CompactPrivateKey,
        CompactPublicKey,
    )
    from tfhe_tpu.utils.params_registry import get as params_by_name
    from tfhe_tpu.zk.proven_list import (
        ProvenCompactCiphertextList,
        crs_for_params_v2,
    )

    P = params_by_name("PARAM_PKE_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128")
    crs = crs_for_params_v2(P, max_bin_messages=8, seed=1)
    assert crs.d == 2048
    priv = CompactPrivateKey.generate(P, seed=7)
    pk = CompactPublicKey.generate(priv)
    msgs = [3, 0, 2, 1, 1, 2]
    lst = ProvenCompactCiphertextList.encrypt_and_prove(
        pk, msgs, crs, metadata=b"prod")
    ct = lst.verify_and_expand(crs, pk, metadata=b"prod")
    dec = priv.decrypt_expanded(np.asarray(ct.ct))
    assert list(dec) == msgs
    lst.ct_list.bodies[0] += np.uint64(1 << 59)
    assert not lst.verify(crs, pk, metadata=b"prod")
