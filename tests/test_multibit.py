"""Multi-bit PBS tests (reference lwe_multi_bit_programmable_bootstrapping.rs):
grouped blind rotation must decode identically to the classic PBS."""

import numpy as np
import pytest

from tfhe_tpu.shortint.client_key import ClientKey
from tfhe_tpu.shortint.server_key import ServerKey
from tfhe_tpu.utils.params import PARAM_TEST_TOY_MULTI_BIT as P


@pytest.fixture(scope="module")
def keys():
    ck = ClientKey.generate(P, seed=21)
    sk = ServerKey.generate(ck)
    return ck, sk


def test_multibit_lut_exhaustive(keys):
    ck, sk = keys
    mm = P.message_modulus
    cm = P.carry_modulus
    msgs = np.arange(mm * cm, dtype=np.uint64)  # full cleartext space
    ct = ck.encrypt(msgs)
    lut = sk.generate_lookup_table(lambda x: (5 * x + 3) % (mm * cm))
    out = sk.apply_lookup_table(ct, lut)
    dec = np.asarray(ck.decrypt_message_and_carry(out))
    assert np.array_equal(dec, (5 * msgs + 3) % (mm * cm)), dec


def test_multibit_chained(keys):
    ck, sk = keys
    mm = P.message_modulus
    msgs = np.arange(4, dtype=np.uint64)
    ct = ck.encrypt(msgs)
    lut = sk.generate_msg_lookup_table(lambda x: 3 * x + 1)
    cur = ct
    expect = msgs
    for _ in range(3):
        cur = sk.apply_lookup_table(cur, lut)
        expect = (3 * expect + 1) % mm
    assert np.array_equal(np.asarray(ck.decrypt(cur)), expect)
