"""CSPRNG tests: AES-128 known-answer, CTR stream windowing, fork
determinism (the reference's parallel == sequential guarantee,
tfhe-csprng/src/generators/aes_ctr/parallel.rs)."""

import numpy as np

from tfhe_tpu.utils.csprng import (
    AesCtrGenerator,
    EncryptionRandomGenerator,
    _key_expansion,
    aes128_encrypt_blocks,
)


def test_aes128_fips197_vector():
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    pt = bytes.fromhex("3243f6a8885a308d313198a2e0370734")
    ct = aes128_encrypt_blocks(
        _key_expansion(key), np.frombuffer(pt, dtype=np.uint8).reshape(1, 16)
    )
    assert ct.tobytes().hex() == "3925841d02dc09fbdc118597196a0b32"


def test_aes128_fips197_appendix_a_key():
    # FIPS-197 Appendix A round-key expansion spot check (w43 of the same key)
    rk = _key_expansion(bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c"))
    assert rk.shape == (11, 16)
    assert rk[10].tobytes().hex() == "d014f9a8c9ee2589e13f0cc8b6630ca6"


def test_stream_windowing_matches_full_stream():
    g = AesCtrGenerator(999)
    full = g.next_bytes(100)
    # reading in odd-sized chunks yields the same bytes
    g2 = AesCtrGenerator(999)
    parts = np.concatenate([g2.next_bytes(k) for k in (1, 2, 3, 10, 30, 54)])
    np.testing.assert_array_equal(full, parts)


def test_fork_matches_sequential():
    g1 = AesCtrGenerator(12345)
    seq = g1.next_bytes(160)
    g2 = AesCtrGenerator(12345)
    kids = g2.try_fork(5, 32)
    cat = np.concatenate([k.next_bytes(32) for k in kids])
    np.testing.assert_array_equal(seq, cat)
    assert g2.table_index == 160
    # nested fork
    g3 = AesCtrGenerator(12345)
    kids = g3.try_fork(5, 32)
    grandkids = kids[0].try_fork(2, 16)
    cat = np.concatenate([k.next_bytes(16) for k in grandkids])
    np.testing.assert_array_equal(seq[:32], cat)


def test_fork_bound_enforced():
    g = AesCtrGenerator(1)
    kids = g.try_fork(2, 8)
    kids[0].next_bytes(8)
    try:
        kids[0].next_bytes(1)
        raise AssertionError("bound not enforced")
    except Exception:
        pass


def test_gaussian_moments():
    g = AesCtrGenerator(42)
    std = 2.0 ** -20
    x = g.gaussian_torus_u64(4000, std).astype(np.int64).astype(np.float64) / 2.0 ** 64
    assert abs(x.mean()) < 5 * std / np.sqrt(4000)
    assert abs(x.std() / std - 1.0) < 0.1


def test_t_uniform_bounds():
    g = AesCtrGenerator(43)
    b = 10
    x = g.t_uniform_torus_u64(2000, b).astype(np.int64)
    assert x.min() >= -(2 ** b) and x.max() <= 2 ** b
    # roughly uniform: variance ~ (2^{2b+1}+1)/6
    var_expected = (2.0 ** (2 * b + 1) + 1) / 6
    assert abs(x.astype(np.float64).var() / var_expected - 1) < 0.15


def test_encryption_generator_split_streams():
    g = EncryptionRandomGenerator(7, 8)
    m1 = g.mask.uniform_u64(4)
    # noise stream independent of mask consumption
    g2 = EncryptionRandomGenerator(7, 8)
    n1 = g2.noise.uniform_u64(4)
    g2.mask.uniform_u64(4)
    n2 = AesCtrGenerator(8).uniform_u64(4)
    np.testing.assert_array_equal(n1, n2)


def test_statistical_battery():
    """Dieharder-style statistical battery over the AES-128-CTR stream
    (the reference gates its CSPRNG with scripts/dieharder_test.sh; the
    binary is not available here, so the canonical NIST SP 800-22-style
    tests are implemented directly): monobit frequency, block frequency,
    runs, byte-histogram chi-square, serial 2-bit test, and lag
    autocorrelation — each at the 10^-6 significance level on 4 MB."""
    import math

    g = AesCtrGenerator(seed=0x5EED_CAFE)
    data = g.next_bytes(4 * 1024 * 1024)
    bits = np.unpackbits(np.asarray(data, dtype=np.uint8))
    n = bits.size
    z_crit = 4.9  # two-sided 10^-6

    # 1. monobit frequency
    s = (2.0 * bits.sum() - n) / math.sqrt(n)
    assert abs(s) < z_crit, f"monobit z={s}"

    # 2. block frequency (4096-bit blocks): chi^2 ~ N(df, 2df)
    blocks = bits.reshape(-1, 4096).sum(axis=1)
    chi = float((((blocks - 2048.0) ** 2) / 1024.0).sum())
    df = blocks.size
    z = (chi - df) / math.sqrt(2.0 * df)
    assert abs(z) < z_crit, f"block frequency z={z}"

    # 3. runs test (total number of 01/10 transitions)
    pi = bits.mean()
    runs = int((bits[1:] != bits[:-1]).sum()) + 1
    exp = 2.0 * n * pi * (1 - pi)
    z = (runs - exp) / (2.0 * math.sqrt(n) * pi * (1 - pi))
    assert abs(z) < z_crit, f"runs z={z}"

    # 4. byte histogram chi-square (255 df)
    hist = np.bincount(data, minlength=256)
    e = data.size / 256.0
    chi = float((((hist - e) ** 2) / e).sum())
    z = (chi - 255.0) / math.sqrt(2.0 * 255.0)
    assert abs(z) < z_crit, f"byte chi2 z={z}"

    # 5. serial test on overlapping 2-bit patterns
    pairs = bits[:-1] * 2 + bits[1:]
    cnt = np.bincount(pairs, minlength=4)
    e = (n - 1) / 4.0
    chi = float((((cnt - e) ** 2) / e).sum())
    z = (chi - 3.0) / math.sqrt(6.0)
    assert abs(z) < z_crit, f"serial z={z}"

    # 6. autocorrelation at lags 1, 2, 8, 16, 64 bits
    x = bits.astype(np.int64) * 2 - 1
    for lag in (1, 2, 8, 16, 64):
        c = float(np.dot(x[:-lag], x[lag:]))
        z = c / math.sqrt(n - lag)
        assert abs(z) < z_crit, f"autocorr lag {lag} z={z}"
