"""Oracle tests for the integer op tail (ops_extra): parallel mul/sum,
vector find, scalar div/rem, bit manipulation, dot products, encrypted
rotates. Clear-function oracles over random inputs, mirroring
tests_cases_unsigned.rs.
"""

import numpy as np
import pytest

from tfhe_tpu.integer.radix import ClientKey, ServerKey
from tfhe_tpu.utils.params import PARAM_TEST_TOY

NB = 4  # 8-bit values at 2 bits/block
BITS = 8
MASK = (1 << BITS) - 1


@pytest.fixture(scope="module")
def keys():
    ck = ClientKey.generate(PARAM_TEST_TOY, seed=21)
    sk = ServerKey.generate(ck)
    return ck, sk


def enc(ck, vals):
    return ck.encrypt_radix(np.asarray(vals, dtype=np.uint64), NB)


def dec(ck, ct):
    return [int(x) for x in np.atleast_1d(ck.decrypt_radix(ct))]


def test_mul_parallelized(keys):
    ck, sk = keys
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, 3)
    b = rng.integers(0, 256, 3)
    got = dec(ck, sk.mul(enc(ck, a), enc(ck, b)))
    assert got == [int((x * y) & MASK) for x, y in zip(a, b)]


def test_sum_ciphertexts_parallelized(keys):
    ck, sk = keys
    rng = np.random.default_rng(1)
    vals = [rng.integers(0, 256, 2) for _ in range(5)]
    cts = [enc(ck, v) for v in vals]
    got = dec(ck, sk.sum_ciphertexts_parallelized(cts))
    want = [int(sum(int(v[i]) for v in vals) & MASK) for i in range(2)]
    assert got == want


def test_overflowing_mul(keys):
    ck, sk = keys
    # 4-bit values (2 blocks) keep the double-width product graph small
    # enough for the 1-core CI box
    a = ck.encrypt_radix(np.asarray([5, 3], dtype=np.uint64), 2)
    b = ck.encrypt_radix(np.asarray([7, 5], dtype=np.uint64), 2)
    lo, ov = sk.overflowing_mul(a, b)
    assert dec(ck, lo) == [(5 * 7) & 0xF, 15]
    assert [int(x) for x in ck.key.decrypt(
        __import__("tfhe_tpu.shortint.ciphertext", fromlist=["ShortintCiphertext"]).ShortintCiphertext(
            ct=ov.ct, degree=1, noise_level=1,
            message_modulus=4, carry_modulus=4)
    )] == [1, 0]


def test_match_value(keys):
    ck, sk = keys
    a = enc(ck, [7, 42, 9])
    matches = [(7, 3), (42, 15), (100, 1)]
    res, check = sk.match_value(a, matches)
    got = dec(ck, res)
    assert got[:2] == [3, 15]
    checks = sk.decrypt_bool(ck, check)
    assert list(np.atleast_1d(checks)) == [1, 1, 0]


def test_match_value_or(keys):
    ck, sk = keys
    a = enc(ck, [5, 11])
    res, _ = sk.match_value_or(a, [(11, 2)], default=9)
    assert dec(ck, res) == [9, 2]


def test_is_in_clears_and_index(keys):
    ck, sk = keys
    a = enc(ck, [13, 200])
    hit = sk.is_in_clears(a, [1, 13, 77])
    assert list(np.atleast_1d(sk.decrypt_bool(ck, hit))) == [1, 0]
    idx, found = sk.index_in_clears(a, [1, 13, 77])
    assert dec(ck, idx)[0] == 1
    assert list(np.atleast_1d(sk.decrypt_bool(ck, found))) == [1, 0]


def test_contains_clear(keys):
    ck, sk = keys
    cts = [enc(ck, [3]), enc(ck, [77]), enc(ck, [12])]
    got = sk.decrypt_bool(ck, sk.contains_clear(cts, 77))
    assert list(np.atleast_1d(got)) == [1]
    got2 = sk.decrypt_bool(ck, sk.contains_clear(cts, 78))
    assert list(np.atleast_1d(got2)) == [0]


@pytest.mark.parametrize("d", [1, 3, 8, 255])
def test_scalar_div_rem(keys, d):
    ck, sk = keys
    rng = np.random.default_rng(d)
    vals = rng.integers(0, 256, 2)
    q, r = sk.scalar_div_rem(enc(ck, vals), d)
    assert dec(ck, q) == [int(v) // d for v in vals]
    assert dec(ck, r) == [int(v) % d for v in vals]


def test_reverse_bits(keys):
    ck, sk = keys
    vals = [0b10110001, 0b00000001, 0xFF]
    got = dec(ck, sk.reverse_bits(enc(ck, vals)))
    assert got == [int(f"{v:08b}"[::-1], 2) for v in vals]


def test_scalar_bitslice(keys):
    ck, sk = keys
    vals = [0b10110110, 0x5A]
    got = dec(ck, sk.scalar_bitslice(enc(ck, vals), 2, 6))
    assert got == [(v >> 2) & 0xF for v in vals]


def test_leading_trailing(keys):
    ck, sk = keys
    vals = [0b00010100, 0]
    a = enc(ck, vals)

    def lz(v):
        return 8 if v == 0 else 8 - v.bit_length()

    def tz(v):
        return 8 if v == 0 else (v & -v).bit_length() - 1

    assert dec(ck, sk.leading_zeros(a)) == [lz(v) for v in vals]
    assert dec(ck, sk.trailing_zeros(a)) == [tz(v) for v in vals]
    assert dec(ck, sk.leading_ones(a)) == [lz(v ^ MASK) for v in vals]
    assert dec(ck, sk.trailing_ones(a)) == [tz(v ^ MASK) for v in vals]


def test_rotate_encrypted_amount(keys):
    ck, sk = keys
    vals = [0b10010110, 0b00000001]
    amts = [3, 1]
    a = enc(ck, vals)
    amt = enc(ck, amts)
    got_r = dec(ck, sk.rotate_right(a, amt))
    want_r = [((v >> s) | (v << (8 - s))) & MASK for v, s in zip(vals, amts)]
    assert got_r == want_r
    got_l = dec(ck, sk.rotate_left(a, amt))
    want_l = [((v << s) | (v >> (8 - s))) & MASK for v, s in zip(vals, amts)]
    assert got_l == want_l


def test_scalar_dot_product(keys):
    ck, sk = keys
    vs = [[3, 1], [5, 2], [7, 0]]
    ws = [2, 3, 1]
    cts = [enc(ck, v) for v in vs]
    got = dec(ck, sk.scalar_dot_product(cts, ws))
    want = [
        (sum(w * v[i] for w, v in zip(ws, vs))) & MASK for i in range(2)
    ]
    assert got == want


def test_oblivious_pseudo_random(keys):
    ck, sk = keys
    r = sk.generate_oblivious_pseudo_random(seed=7, num_blocks=4,
                                            random_bits_count=5)
    v = int(np.atleast_1d(ck.decrypt_radix(r))[0])
    assert 0 <= v < 32
    r2 = sk.generate_oblivious_pseudo_random(seed=7, num_blocks=4,
                                             random_bits_count=5)
    assert int(np.atleast_1d(ck.decrypt_radix(r2))[0]) == v


def test_vector_slice_comparisons(keys):
    """all_eq_slices / contains_sub_slice vs clear oracles (reference
    radix_parallel/vector_comparisons.rs + tests in tests_unsigned)."""
    ck, sk = keys
    enc = lambda vals: [ck.encrypt_radix(np.asarray([v], dtype=np.uint64), 4)
                        for v in vals]
    dec_bool = lambda blk: bool(np.asarray(sk.decrypt_bool(ck, blk))[0])

    a = enc([10, 20, 30])
    b = enc([10, 20, 30])
    c = enc([10, 21, 30])
    assert dec_bool(sk.all_eq_slices(a, b)) is True
    assert dec_bool(sk.all_eq_slices(a, c)) is False
    assert dec_bool(sk.all_eq_slices(a, b[:2])) is False  # length mismatch

    hay = enc([5, 10, 20, 30, 7])
    assert dec_bool(sk.contains_sub_slice(hay, enc([10, 20]))) is True
    assert dec_bool(sk.contains_sub_slice(hay, enc([20, 10]))) is False
    assert dec_bool(sk.contains_sub_slice(hay, enc([7]))) is True
    assert dec_bool(sk.contains_sub_slice(enc([1]), enc([1, 2]))) is False
