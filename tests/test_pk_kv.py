"""Public key + KVStore tests."""

import numpy as np
import pytest

from tfhe_tpu.high_level_api import ConfigBuilder, FheUint8, generate_keys, set_server_key
from tfhe_tpu.high_level_api.kv_store import KVStore
from tfhe_tpu.shortint.public_key import PublicKey
from tfhe_tpu.utils.params import PARAM_TEST_TOY


@pytest.fixture(scope="module")
def keys():
    config = ConfigBuilder().use_custom_parameters(PARAM_TEST_TOY).with_seed(81).build()
    ck, sk = generate_keys(config)
    set_server_key(sk)
    return ck, sk


def test_public_key_encrypt(keys):
    ck, _ = keys
    pk = PublicKey.generate(ck.inner.key)
    msgs = np.array([0, 1, 2, 3], dtype=np.uint64)
    ct = pk.encrypt(msgs, rng=np.random.default_rng(5))
    dec = np.asarray(ck.inner.key.decrypt(ct))
    assert np.array_equal(dec, msgs), dec


def test_kv_store(keys):
    ck, _ = keys
    kv = KVStore()
    kv.insert(FheUint8.encrypt(10, ck), FheUint8.encrypt(111, ck))
    kv.insert(FheUint8.encrypt(20, ck), FheUint8.encrypt(222, ck))
    got = kv.get(FheUint8.encrypt(20, ck))
    assert got.decrypt(ck) == 222
    missing = kv.get(FheUint8.encrypt(99, ck))
    assert missing.decrypt(ck) == 0
    assert kv.contains(FheUint8.encrypt(10, ck)).decrypt(ck) is True
    assert kv.contains(FheUint8.encrypt(9, ck)).decrypt(ck) is False
    kv.update(FheUint8.encrypt(10, ck), FheUint8.encrypt(42, ck))
    assert kv.get(FheUint8.encrypt(10, ck)).decrypt(ck) == 42
    assert kv.get(FheUint8.encrypt(20, ck)).decrypt(ck) == 222
