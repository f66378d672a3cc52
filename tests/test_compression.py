"""List compression tests (shortint/list_compression/compression.rs flow)."""

import numpy as np
import pytest

from tfhe_tpu.shortint import list_compression as lc
from tfhe_tpu.shortint.client_key import ClientKey
from tfhe_tpu.shortint.server_key import ServerKey
from tfhe_tpu.utils.params import PARAM_TEST_TOY as P


@pytest.fixture(scope="module")
def keys():
    ck = ClientKey.generate(P, seed=31)
    sk = ServerKey.generate(ck)
    priv = lc.new_compression_private_key(ck, lc.COMP_PARAM_TEST_TOY)
    comp_key, dec_key = lc.new_compression_decompression_keys(ck, priv)
    return ck, sk, comp_key, dec_key


def test_compress_decompress_roundtrip(keys):
    ck, sk, comp_key, dec_key = keys
    msgs = np.arange(16, dtype=np.uint64)
    cts = ck.encrypt(msgs)
    packed = lc.compress(comp_key, cts)
    # storage really is small: top bits only
    assert packed.storage.dtype == np.uint32
    assert packed.count == 16
    out = lc.decompress(packed, dec_key, sk)
    dec = np.asarray(ck.decrypt_message_and_carry(out))
    assert np.array_equal(dec, msgs), dec


def test_decompress_subset(keys):
    ck, sk, comp_key, dec_key = keys
    msgs = np.array([3, 7, 11, 14], dtype=np.uint64)
    packed = lc.compress(comp_key, ck.encrypt(msgs))
    out = lc.decompress(packed, dec_key, sk, indices=[2, 0])
    dec = np.asarray(ck.decrypt_message_and_carry(out))
    assert np.array_equal(dec, [11, 3]), dec
