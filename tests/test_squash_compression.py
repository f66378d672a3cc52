"""Noise-squashed ciphertext list compression (u128 packing keyswitch).

Reference semantics: shortint/list_compression/noise_squashing_compression.rs
(compress + PBS-free unpack), private_key.rs:308, server_keys.rs:271.
"""

import numpy as np

from tfhe_tpu.shortint.client_key import ClientKey
from tfhe_tpu.shortint.noise_squashing import (
    NoiseSquashingKey,
    NoiseSquashingPrivateKey,
)
from tfhe_tpu.shortint.noise_squashing_compression import (
    CompressedSquashedNoiseCiphertextList,
    NoiseSquashingCompressionKey,
    NoiseSquashingCompressionPrivateKey,
    compress_noise_squashed_ciphertexts_into_list,
)
from tfhe_tpu.shortint.server_key import ServerKey
from tfhe_tpu.utils.params import (
    PARAM_TEST_TOY,
    PARAM_TEST_TOY_SQUASH,
    DynamicDistribution,
    NoiseSquashingCompressionParameters,
)

TOY_SQUASH_COMP = NoiseSquashingCompressionParameters(
    packing_ks_level=1,
    packing_ks_base_log=61,
    packing_ks_polynomial_size=256,
    packing_ks_glwe_dimension=1,
    lwe_per_glwe=4,
    packing_ks_key_noise_distribution=DynamicDistribution.t_uniform(3),
    message_modulus=4,
    carry_modulus=4,
)


def test_squash_compress_roundtrip_toy():
    ck = ClientKey.generate(PARAM_TEST_TOY, seed=123)
    sk = ServerKey.generate(ck)
    priv = NoiseSquashingPrivateKey.generate(ck, PARAM_TEST_TOY_SQUASH)
    nsk = NoiseSquashingKey.generate(ck, priv)
    comp_priv = NoiseSquashingCompressionPrivateKey.generate(
        ck, TOY_SQUASH_COMP)
    comp_key = NoiseSquashingCompressionKey.generate(ck, priv, comp_priv)

    msgs = np.array([0, 1, 2, 3, 3, 1], dtype=np.uint64)
    squashed = nsk.squash_ciphertext_noise(sk, ck.encrypt(msgs))
    packed = compress_noise_squashed_ciphertexts_into_list(
        comp_key, [squashed])
    assert len(packed) == len(msgs)
    # 6 cts at lwe_per_glwe=4 -> 2 GLWEs
    assert packed.glwe_hi.shape[0] == 2

    for i, want in enumerate(msgs):
        ct = packed.unpack(i)
        assert ct.degree == squashed.degree
        got = comp_priv.decrypt(ct)
        assert got == [int(want)], (i, got, want)


def test_squash_compress_empty():
    ck = ClientKey.generate(PARAM_TEST_TOY, seed=5)
    priv = NoiseSquashingPrivateKey.generate(ck, PARAM_TEST_TOY_SQUASH)
    comp_priv = NoiseSquashingCompressionPrivateKey.generate(
        ck, TOY_SQUASH_COMP)
    comp_key = NoiseSquashingCompressionKey.generate(ck, priv, comp_priv)
    packed = compress_noise_squashed_ciphertexts_into_list(comp_key, [])
    assert len(packed) == 0


def test_decompose128_small_rep_vs_oracle():
    """rep <= 63 path (packing-KS base 61 x level 1) vs the python-int
    oracle shared with the wide-rep decomposer tests."""
    import jax.numpy as jnp

    from test_noise_squashing import _oracle_decompose128
    from tfhe_tpu.core import squash as sq

    rng = np.random.default_rng(42)
    hi = rng.integers(0, 1 << 64, 64, dtype=np.uint64)
    lo = rng.integers(0, 1 << 64, 64, dtype=np.uint64)
    hi[:4] = [0, 0xFFFFFFFFFFFFFFFF, 1 << 63, (1 << 63) - 1]
    lo[:4] = [0, 0xFFFFFFFFFFFFFFFF, 0, 0xFFFFFFFFFFFFFFFF]
    for bl, l in [(61, 1), (20, 3), (12, 5)]:
        digits = np.asarray(
            sq.decompose128(jnp.asarray(hi), jnp.asarray(lo), bl, l))
        for i in range(64):
            x = int(hi[i]) << 64 | int(lo[i])
            want = _oracle_decompose128(x, bl, l)
            got = [int(digits[i, j]) for j in range(l)]
            assert got == want, (bl, l, hex(x), got, want)


def test_hlapi_compressed_squashed_list():
    """high_level_api/compressed_noise_squashed_ciphertext_list.rs flow:
    squash -> pack into a compressed list -> unpack (no PBS) -> decrypt."""
    from tfhe_tpu.high_level_api import api

    cfg = api.Config(
        PARAM_TEST_TOY, seed=11,
        noise_squashing_parameters=PARAM_TEST_TOY_SQUASH,
        noise_squashing_compression_parameters=TOY_SQUASH_COMP,
    )
    ck, sk = api.generate_keys(cfg)
    api.set_server_key(sk)
    try:
        a = api.FheUint8.encrypt(200, ck)
        b = api.FheUint8.encrypt(55, ck)
        sa, sb = a.squash_noise(), b.squash_noise()
        packed = (api.CompressedSquashedNoiseCiphertextList.builder()
                  .push(sa).push(sb).build())
        assert len(packed) == 2
        assert packed.get(0).decrypt_with_compression_key(ck) == 200
        assert packed.get(1).decrypt_with_compression_key(ck) == 55
    finally:
        api.unset_server_key()
