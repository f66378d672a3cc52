"""Clear-function oracle tests for the radix integer layer (toy params).

Mirrors the reference's test strategy: random inputs, compare each encrypted
op against the clear oracle (integer/server_key/radix_parallel/
tests_cases_unsigned.rs).
"""

import numpy as np
import pytest

from tfhe_tpu.integer.radix import ClientKey, ServerKey
from tfhe_tpu.utils.params import PARAM_TEST_TOY as P

NB = 4  # 4 blocks x 2 bits = 8-bit integers
MOD = 1 << 8
rng = np.random.default_rng(1234)


@pytest.fixture(scope="module")
def keys():
    ck = ClientKey.generate(P, seed=99)
    sk = ServerKey.generate(ck)
    return ck, sk


def _enc(ck, vals, nb=NB):
    return ck.encrypt_radix(np.asarray(vals, dtype=np.uint64), nb)


def _dec(ck, ct):
    return np.asarray(ck.decrypt_radix(ct))


def _dec_bool(ck, sk, blk):
    return np.asarray(sk.decrypt_bool(ck, blk))


CASES = rng.integers(0, MOD, size=(6, 2), dtype=np.uint64)


def test_add_parallelized(keys):
    ck, sk = keys
    a, b = CASES[:, 0], CASES[:, 1]
    got = _dec(ck, sk.add(_enc(ck, a), _enc(ck, b)))
    assert np.array_equal(got, (a + b) % MOD)


def test_overflowing_add(keys):
    ck, sk = keys
    a, b = CASES[:, 0], CASES[:, 1]
    res, ov = sk.add_parallelized(_enc(ck, a), _enc(ck, b), compute_overflow=True)
    assert np.array_equal(_dec(ck, res), (a + b) % MOD)
    assert np.array_equal(_dec_bool(ck, sk, ov), (a.astype(int) + b.astype(int)) >= MOD)


def test_sub_and_borrow(keys):
    ck, sk = keys
    a, b = CASES[:, 0], CASES[:, 1]
    res, bw = sk.sub_parallelized(_enc(ck, a), _enc(ck, b), compute_overflow=True)
    assert np.array_equal(_dec(ck, res), (a - b) % MOD)
    assert np.array_equal(_dec_bool(ck, sk, bw), a < b)


def test_bitnot(keys):
    ck, sk = keys
    a = CASES[:, 0]
    got = _dec(ck, sk.bitnot(_enc(ck, a)))
    assert np.array_equal(got, (~a) % MOD)


def test_comparisons(keys):
    ck, sk = keys
    a, b = CASES[:, 0], CASES[:, 1]
    ea, eb = _enc(ck, a), _enc(ck, b)
    assert np.array_equal(_dec_bool(ck, sk, sk.lt(ea, eb)), a < b)
    assert np.array_equal(_dec_bool(ck, sk, sk.le(ea, eb)), a <= b)
    assert np.array_equal(_dec_bool(ck, sk, sk.gt(ea, eb)), a > b)
    assert np.array_equal(_dec_bool(ck, sk, sk.ge(ea, eb)), a >= b)


def test_min_max(keys):
    ck, sk = keys
    a, b = CASES[:, 0], CASES[:, 1]
    assert np.array_equal(_dec(ck, sk.min(_enc(ck, a), _enc(ck, b))), np.minimum(a, b))
    assert np.array_equal(_dec(ck, sk.max(_enc(ck, a), _enc(ck, b))), np.maximum(a, b))


def test_if_then_else(keys):
    ck, sk = keys
    a, b = CASES[:, 0], CASES[:, 1]
    cond = sk.lt(_enc(ck, a), _enc(ck, b))
    got = _dec(ck, sk.if_then_else(cond, _enc(ck, a), _enc(ck, b)))
    assert np.array_equal(got, np.where(a < b, a, b))


def test_scalar_shifts(keys):
    ck, sk = keys
    a = CASES[:, 0]
    for s in (0, 1, 3, 6):
        assert np.array_equal(
            _dec(ck, sk.scalar_right_shift(_enc(ck, a), s)), a >> np.uint64(s)
        ), f"rshift {s}"
        assert np.array_equal(
            _dec(ck, sk.scalar_left_shift(_enc(ck, a), s)), (a << np.uint64(s)) % MOD
        ), f"lshift {s}"


def test_scalar_rotates(keys):
    ck, sk = keys
    a = CASES[:, 0]
    for s in (1, 5):
        exp = ((a >> np.uint64(s)) | (a << np.uint64(8 - s))) % MOD
        assert np.array_equal(_dec(ck, sk.scalar_rotate_right(_enc(ck, a), s)), exp)
        exp = ((a << np.uint64(s)) | (a >> np.uint64(8 - s))) % MOD
        assert np.array_equal(_dec(ck, sk.scalar_rotate_left(_enc(ck, a), s)), exp)


def test_encrypted_shift(keys):
    ck, sk = keys
    a = CASES[:3, 0]
    amt = np.array([1, 3, 6], dtype=np.uint64)
    got = _dec(ck, sk.right_shift(_enc(ck, a, NB), _enc(ck, amt, NB)))
    assert np.array_equal(got, a >> amt)
    got = _dec(ck, sk.left_shift(_enc(ck, a, NB), _enc(ck, amt, NB)))
    assert np.array_equal(got, (a << amt) % MOD)


def test_scalar_ops(keys):
    ck, sk = keys
    a = CASES[:, 0]
    assert np.array_equal(_dec(ck, sk.scalar_sub(_enc(ck, a), 57)), (a - 57) % MOD)
    assert np.array_equal(_dec(ck, sk.scalar_mul(_enc(ck, a), 11)), (a * 11) % MOD)
    assert np.array_equal(_dec_bool(ck, sk, sk.scalar_lt(_enc(ck, a), 100)), a < 100)
    assert np.array_equal(_dec_bool(ck, sk, sk.scalar_ge(_enc(ck, a), 100)), a >= 100)
    assert np.array_equal(_dec_bool(ck, sk, sk.scalar_eq(_enc(ck, a), int(a[0]))), a == a[0])
    assert np.array_equal(_dec(ck, sk.scalar_bitand(_enc(ck, a), 0x5A)), a & 0x5A)
    assert np.array_equal(_dec(ck, sk.scalar_bitxor(_enc(ck, a), 0xA5)), a ^ 0xA5)


def test_sum_ciphertexts(keys):
    ck, sk = keys
    vals = rng.integers(0, MOD, size=(5, 4), dtype=np.uint64)
    cts = [_enc(ck, vals[i]) for i in range(5)]
    got = _dec(ck, sk.sum_ciphertexts(cts))
    assert np.array_equal(got, vals.sum(axis=0) % MOD)


def test_div_rem(keys):
    ck, sk = keys
    # 4-bit division (2 blocks) to keep the bit-serial loop short
    a = np.array([13, 7, 15], dtype=np.uint64)
    b = np.array([3, 2, 4], dtype=np.uint64)
    q, r = sk.div_rem(_enc(ck, a, 2), _enc(ck, b, 2))
    assert np.array_equal(_dec(ck, q), a // b)
    assert np.array_equal(_dec(ck, r), a % b)


def test_cast(keys):
    ck, sk = keys
    a = CASES[:, 0]
    ext = sk.cast_to_num_blocks(_enc(ck, a), 6)
    assert ext.num_blocks == 6
    assert np.array_equal(_dec(ck, ext), a)
    tr = sk.cast_to_num_blocks(_enc(ck, a), 2)
    assert np.array_equal(_dec(ck, tr), a % 16)


def test_count_and_parity(keys):
    ck, sk = keys
    a = np.array([0b10110101, 0b00000001, 0b11111111, 0], dtype=np.uint64)
    ea = _enc(ck, a)
    ones = _dec(ck, sk.count_ones(ea))
    assert np.array_equal(ones, [bin(v).count("1") for v in a]), ones
    zeros = _dec(ck, sk.count_zeros(ea))
    assert np.array_equal(zeros, [8 - bin(v).count("1") for v in a]), zeros
    assert np.array_equal(_dec_bool(ck, sk, sk.is_even(ea)), a % 2 == 0)
    assert np.array_equal(_dec_bool(ck, sk, sk.is_odd(ea)), a % 2 == 1)


def test_ilog2(keys):
    ck, sk = keys
    a = np.array([1, 2, 7, 128, 255], dtype=np.uint64)
    got = _dec(ck, sk.ilog2(_enc(ck, a)))
    assert np.array_equal(got, [int(v).bit_length() - 1 for v in a]), got
