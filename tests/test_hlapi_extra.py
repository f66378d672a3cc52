"""HLAPI additions: noise squashing, compressed server key, compact public
key with casting, tags. Reference: high_level_api/ (squash_noise,
CompressedServerKey, compact lists, tag.rs)."""

import numpy as np
import pytest

from tfhe_tpu.high_level_api import api
from tfhe_tpu.utils.params import (
    PARAM_TEST_TOY,
    PARAM_TEST_TOY_SQUASH,
    DynamicDistribution,
    EncryptionKeyChoice,
    CompactPublicKeyEncryptionParameters,
    ShortintKeySwitchingParameters,
)


@pytest.fixture(scope="module")
def keys():
    cfg = api.Config(
        PARAM_TEST_TOY, seed=3,
        noise_squashing_parameters=PARAM_TEST_TOY_SQUASH,
    )
    ck, sk = api.generate_keys(cfg)
    api.set_server_key(sk)
    return ck, sk


def test_squash_noise_roundtrip(keys):
    ck, sk = keys
    x = api.FheUint8.encrypt(173, ck)
    sq = x.squash_noise()
    assert sq.decrypt(ck) == 173


def test_squash_after_compute(keys):
    ck, sk = keys
    a = api.FheUint8.encrypt(100, ck)
    b = api.FheUint8.encrypt(55, ck)
    c = a + b
    assert c.squash_noise().decrypt(ck) == 155


def test_compressed_server_key_hlapi(keys):
    ck, _ = keys
    csk = api.CompressedServerKey.generate(
        api.ClientKey(ck.inner)  # fresh logical client for keygen stream
        if False else api.ClientKey.generate(api.Config(PARAM_TEST_TOY, seed=77))
    )
    sk2 = csk.decompress()
    ck2 = api.ClientKey.generate(api.Config(PARAM_TEST_TOY, seed=77))
    api.set_server_key(sk2)
    try:
        x = api.FheUint8.encrypt(9, ck2)
        y = x + x
        assert y.decrypt(ck2) == 18
    finally:
        api.set_server_key(keys[1])


def test_compact_public_key_hlapi(keys):
    ck, sk = keys
    pke = CompactPublicKeyEncryptionParameters(
        encryption_lwe_dimension=64,
        encryption_noise_distribution=DynamicDistribution.t_uniform(3),
        message_modulus=4,
        carry_modulus=4,
        name="TOY_PKE_HL",
    )
    ksp = ShortintKeySwitchingParameters(
        ks_base_log=3, ks_level=5,
        destination_key=EncryptionKeyChoice.BIG, name="TOY_KS_HL",
    )
    cpk = api.CompactPublicKey.new(ck, sk, pke, ksp, seed=21)
    x = cpk.encrypt_radix(201, api.FheUint8)
    assert x.decrypt(ck) == 201
    y = x + x
    assert y.decrypt(ck) == (201 * 2) % 256


def test_tag_propagation(keys):
    ck, sk = keys
    ck.tag = api.Tag(b"tenant-42")
    assert ck.tag == api.Tag(b"tenant-42")
    csk = api.CompressedServerKey.generate(ck)
    assert csk.tag == ck.tag
    assert csk.decompress().tag == ck.tag


@pytest.fixture(scope="module")
def comp_keys():
    from tfhe_tpu.shortint.list_compression import COMP_PARAM_TEST_TOY

    cfg = (api.ConfigBuilder().use_custom_parameters(PARAM_TEST_TOY)
           .with_seed(8).enable_compression(COMP_PARAM_TEST_TOY).build())
    ck, sk = api.generate_keys(cfg)
    return ck, sk


def test_compressed_ciphertext_list_hlapi(comp_keys, keys):
    """push/build/get round trip over mixed types
    (compressed_ciphertext_list.rs). The global-key swap is scoped to THIS
    test: a module-scoped swap leaked the compression server key into every
    later test that encrypts under the ``keys`` fixture's client key."""
    ck, sk = comp_keys
    api.set_server_key(sk)
    try:
        _compressed_list_body(ck)
    finally:
        api.set_server_key(keys[1])


def _compressed_list_body(ck):
    a = api.FheUint8.encrypt(173, ck)
    b = api.FheUint4.encrypt(9, ck)
    fb = api.FheBool.encrypt(True, ck)
    lst = (api.CompressedCiphertextListBuilder()
           .push(a).push(b).push(fb).build())
    assert len(lst) == 3
    assert int(lst.get(0).decrypt(ck)) == 173
    assert int(lst.get(1).decrypt(ck)) == 9
    assert bool(lst.get(2).decrypt(ck)) is True
    assert type(lst.get(1)).__name__ == "FheUint4"


def test_compact_list_builder_hlapi(keys):
    """Typed compact list: push/build/expand (compact_list.rs)."""
    ck, sk = keys
    pke = CompactPublicKeyEncryptionParameters(
        encryption_lwe_dimension=16,
        encryption_noise_distribution=DynamicDistribution.t_uniform(3),
        message_modulus=4, carry_modulus=4, name="TOY_PKE_CL",
    )
    ksp = ShortintKeySwitchingParameters(
        ks_base_log=3, ks_level=5,
        destination_key=EncryptionKeyChoice.BIG, name="TOY_KS_CL",
    )
    cpk = api.CompactPublicKey.new(ck, sk, pke, ksp, seed=31)
    lst = (api.CompactCiphertextListBuilder(cpk)
           .push(11, api.FheUint4).push(True, api.FheBool)
           .push(2, api.FheUint2).build())
    vals = lst.expand()
    assert int(vals[0].decrypt(ck)) == 11
    assert bool(vals[1].decrypt(ck)) is True
    assert int(vals[2].decrypt(ck)) == 2


def test_safe_serialization_hlapi(keys):
    ck, sk = keys
    x = api.FheUint8.encrypt(90, ck)
    blob = api.safe_serialize(x)
    back = api.safe_deserialize(blob)
    assert int(back.decrypt(ck)) == 90
    with pytest.raises(ValueError):
        api.safe_serialize(x, serialized_size_limit=16)
    with pytest.raises(ValueError):
        api.safe_deserialize(blob, serialized_size_limit=16)


def test_fhe_array_elementwise(keys):
    """Array types: elementwise batched ops, indexing, slicing, sum
    (high_level_api/array/)."""
    ck, sk = keys
    a = api.FheUint8Array.encrypt([10, 200, 31], ck)
    b = api.FheUint8Array.encrypt([5, 100, 1], ck)
    assert list((a + b).decrypt(ck)) == [15, 44, 32]
    assert list((a & b).decrypt(ck)) == [10 & 5, 200 & 100, 31 & 1]
    assert int(a[1].decrypt(ck)) == 200
    assert list(a[0:2].decrypt(ck)) == [10, 200]
    assert int(a.sum().decrypt(ck)) == (10 + 200 + 31) % 256
    assert len(a) == 3


def test_xof_keyset_deterministic():
    """Single-seed keyset: equal seeds -> bit-identical keys, cross-derived
    decryption works (xof_key_set.rs)."""
    cfg = api.ConfigBuilder().use_custom_parameters(PARAM_TEST_TOY).build()
    ks1 = api.CompressedXofKeySet.generate(cfg, seed=99)
    ks2 = api.CompressedXofKeySet.generate(cfg, seed=99)
    ck1, sk1 = ks1.decompress()
    ck2, sk2 = ks2.decompress()
    assert np.array_equal(ck1.inner.key.lwe_sk.bits, ck2.inner.key.lwe_sk.bits)
    old = api._SERVER_KEY
    api.set_server_key(sk1)
    try:
        x = api.FheUint8.encrypt(42, ck1)
        assert int((x + x).decrypt(ck2)) == 84
    finally:
        api.set_server_key(old)
