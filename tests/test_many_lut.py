"""Many-LUT PBS: several functions, one blind rotation
(engine/mod.rs:168 fill_many_lut_accumulator)."""

import numpy as np
import pytest

from tfhe_tpu.keycache import get_shortint_keys
from tfhe_tpu.shortint.ciphertext import ShortintCiphertext
from tfhe_tpu.utils.params import PARAM_TEST_TOY as P


def test_many_lut():
    ck, sk = get_shortint_keys(P, seed=55)
    msgs = np.arange(8, dtype=np.uint64)
    ct = ck.encrypt(msgs)
    ct = ShortintCiphertext(ct=ct.ct, degree=7, noise_level=ct.noise_level,
                            message_modulus=ct.message_modulus,
                            carry_modulus=ct.carry_modulus)
    many = sk.generate_many_lookup_table(
        [lambda x: x % 4, lambda x: (x * 2) % 16]
    )
    o0, o1 = sk.apply_many_lookup_table(ct, many)
    assert np.array_equal(np.asarray(ck.decrypt_message_and_carry(o0)), msgs % 4)
    assert np.array_equal(np.asarray(ck.decrypt_message_and_carry(o1)), (msgs * 2) % 16)


def test_many_lut_degree_guard():
    ck, sk = get_shortint_keys(P, seed=55)
    ct = ck.encrypt(np.arange(4, dtype=np.uint64))
    ct = ShortintCiphertext(ct=ct.ct, degree=15, noise_level=1,
                            message_modulus=4, carry_modulus=4)
    many = sk.generate_many_lookup_table([lambda x: x, lambda x: x + 1])
    with pytest.raises(AssertionError, match="many-LUT limit"):
        sk.apply_many_lookup_table(ct, many)
