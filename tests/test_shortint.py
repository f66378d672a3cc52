"""Shortint end-to-end tests on toy parameters (the reference's
parameterized-test pattern, shortint/server_key/tests/parameterized_test.rs,
shrunk to CI-sized params; real parameter sets run in bench/TPU jobs)."""

import numpy as np
import pytest

from tfhe_tpu.utils.params import PARAM_TEST_TOY
from tfhe_tpu import shortint


@pytest.fixture(scope="module")
def keys():
    ck = shortint.ClientKey.generate(PARAM_TEST_TOY, seed=42)
    sk = shortint.ServerKey.generate(ck)
    return ck, sk


def test_encrypt_decrypt_roundtrip(keys):
    ck, _ = keys
    msgs = [0, 1, 2, 3]
    ct = ck.encrypt(msgs)
    np.testing.assert_array_equal(ck.decrypt(ct), msgs)


def test_pbs_identity_and_square(keys):
    ck, sk = keys
    ct = ck.encrypt([0, 1, 2, 3])
    lut = sk.generate_lookup_table(lambda x: x)
    np.testing.assert_array_equal(ck.decrypt(sk.apply_lookup_table(ct, lut)), [0, 1, 2, 3])
    lut2 = sk.generate_lookup_table(lambda x: (x * x) % 4)
    np.testing.assert_array_equal(
        ck.decrypt_message_and_carry(sk.apply_lookup_table(ct, lut2)), [0, 1, 0, 1]
    )


def test_pbs_full_cleartext_domain(keys):
    # LUT over the whole message+carry space (mm*cm = 16 in toy params)
    ck, sk = keys
    full = PARAM_TEST_TOY.message_modulus * PARAM_TEST_TOY.carry_modulus
    # encrypt message+carry values directly through scalar add on an enc of 0
    ct = ck.encrypt([0] * full)
    ct = sk.unchecked_scalar_add(ct, 0)  # no-op, keeps type
    # build values 0..15 by scalar-add per slot is awkward batched; instead
    # test f over message space with carries produced by unchecked_add
    a = ck.encrypt([1, 2, 3, 3])
    b = ck.encrypt([2, 3, 3, 3])
    s = sk.unchecked_add(a, b)  # degree 6: occupies carry space
    np.testing.assert_array_equal(ck.decrypt_message_and_carry(s), [3, 5, 6, 6])
    msg = sk.message_extract(s)
    np.testing.assert_array_equal(ck.decrypt(msg), [3, 1, 2, 2])
    carry = sk.carry_extract(s)
    np.testing.assert_array_equal(ck.decrypt(carry), [0, 1, 1, 1])


def test_leveled_ops(keys):
    ck, sk = keys
    a = ck.encrypt([1, 2, 0, 3])
    b = ck.encrypt([2, 1, 3, 0])
    s = sk.unchecked_add(a, b)
    np.testing.assert_array_equal(ck.decrypt_message_and_carry(s), [3, 3, 3, 3])
    sm = sk.unchecked_scalar_mul(a, 2)
    np.testing.assert_array_equal(ck.decrypt_message_and_carry(sm), [2, 4, 0, 6])
    sa = sk.unchecked_scalar_add(a, 3)
    np.testing.assert_array_equal(ck.decrypt_message_and_carry(sa), [4, 5, 3, 6])
    neg = sk.unchecked_neg(a)
    # -m mod message space: z - m with z multiple of 4 > degree
    np.testing.assert_array_equal(ck.decrypt(neg), [3, 2, 0, 1])
    sub = sk.unchecked_sub(a, b)
    np.testing.assert_array_equal(ck.decrypt(sub), [3, 1, 1, 3])


def test_bivariate_mul(keys):
    ck, sk = keys
    a = ck.encrypt([1, 2, 3, 3])
    b = ck.encrypt([2, 3, 1, 3])
    prod = sk.mul(a, b)
    np.testing.assert_array_equal(ck.decrypt(prod), [2, 2, 3, 1])
