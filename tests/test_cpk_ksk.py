"""Compact public key, compact lists, keyset casting, re-randomization.

Reference: shortint/public_key/compact.rs, key_switching_key/mod.rs,
ciphertext/re_randomization.rs, lwe_compact_ciphertext_list_expansion.rs.
"""

import numpy as np
import pytest

from tfhe_tpu.shortint.client_key import ClientKey
from tfhe_tpu.shortint.compact_public_key import (
    CompactCiphertextList,
    CompactPrivateKey,
    CompactPublicKey,
)
from tfhe_tpu.shortint.key_switching_key import (
    KeySwitchingKey,
    re_randomize_ciphertexts,
)
from tfhe_tpu.shortint.server_key import ServerKey
from tfhe_tpu.utils.params import (
    PARAM_TEST_TOY,
    CompactPublicKeyEncryptionParameters,
    DynamicDistribution,
    EncryptionKeyChoice,
    ShortintKeySwitchingParameters,
)

TOY_PKE = CompactPublicKeyEncryptionParameters(
    encryption_lwe_dimension=64,
    encryption_noise_distribution=DynamicDistribution.t_uniform(3),
    message_modulus=4,
    carry_modulus=4,
    name="TOY_PKE",
)

TOY_KS = ShortintKeySwitchingParameters(
    ks_base_log=3,
    ks_level=5,
    destination_key=EncryptionKeyChoice.BIG,
    name="TOY_KS",
)


def test_cpk_encrypt_expand_decrypt():
    priv = CompactPrivateKey.generate(TOY_PKE, seed=5)
    pk = CompactPublicKey.generate(priv)
    msgs = np.arange(10, dtype=np.uint64) % 4
    clist = pk.encrypt(msgs)
    # compactness: one mask vector per bin of n=64
    assert clist.masks.shape == (1, 64)
    assert clist.bodies.shape == (10,)
    got = priv.decrypt_expanded(clist.expand())
    assert list(got) == list(msgs)


def test_cpk_multi_bin():
    priv = CompactPrivateKey.generate(TOY_PKE, seed=6)
    pk = CompactPublicKey.generate(priv)
    msgs = np.arange(130, dtype=np.uint64) % 4  # 3 bins of 64
    clist = pk.encrypt(msgs)
    assert clist.masks.shape == (3, 64)
    got = priv.decrypt_expanded(clist.expand())
    assert list(got) == list(msgs)


@pytest.fixture(scope="module")
def compute_keys():
    ck = ClientKey.generate(PARAM_TEST_TOY, seed=7)
    sk = ServerKey.generate(ck)
    return ck, sk


def test_pke_to_compute_cast(compute_keys):
    ck, sk = compute_keys
    priv = CompactPrivateKey.generate(TOY_PKE, seed=8)
    pk = CompactPublicKey.generate(priv)
    ksk = KeySwitchingKey.generate(priv, ck, sk, TOY_KS)
    msgs = np.array([0, 1, 2, 3], dtype=np.uint64)
    ct = pk.encrypt(msgs).expand_to_shortint()
    casted = ksk.cast(ct)
    assert casted.under_key == "big"
    assert list(ck.decrypt(casted)) == list(msgs)
    # casted ciphertexts are full compute-keyset citizens: apply a LUT
    lut = sk.generate_lookup_table(lambda x: (x + 1) % 4)
    out = sk.apply_lookup_table(casted, lut)
    assert list(ck.decrypt(out)) == [(int(m) + 1) % 4 for m in msgs]


def test_compute_to_compute_cast(compute_keys):
    ck1, sk1 = compute_keys
    ck2 = ClientKey.generate(PARAM_TEST_TOY, seed=99)
    sk2 = ServerKey.generate(ck2)
    ksk = KeySwitchingKey.generate(ck1, ck2, sk2, TOY_KS, src_server=sk1)
    msgs = np.array([3, 1], dtype=np.uint64)
    ct = ck1.encrypt(msgs)
    casted = ksk.cast(ct)
    assert list(ck2.decrypt(casted)) == list(msgs)


def test_re_randomization(compute_keys):
    ck, sk = compute_keys
    priv = CompactPrivateKey.generate(TOY_PKE, seed=11)
    pk = CompactPublicKey.generate(priv)
    ksk = KeySwitchingKey.generate(priv, ck, sk, TOY_KS)
    msgs = np.array([2, 3], dtype=np.uint64)
    ct = sk.message_extract(ck.encrypt(msgs))  # nominal noise
    (rr,) = re_randomize_ciphertexts([ct], cpk=pk, ksk=ksk, seed=1234)
    # same plaintext, different ciphertext bytes
    assert list(ck.decrypt(rr)) == list(msgs)
    assert not np.array_equal(np.asarray(rr.ct), np.asarray(ct.ct))
    # deterministic in the seed
    (rr2,) = re_randomize_ciphertexts([ct], cpk=pk, ksk=ksk, seed=1234)
    assert np.array_equal(np.asarray(rr.ct), np.asarray(rr2.ct))
