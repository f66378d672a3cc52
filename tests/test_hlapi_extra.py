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
