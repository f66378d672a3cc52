"""shortint — single-block operations on small (1-8 bit) messages.

TPU-native equivalent of ``tfhe/src/shortint``: a ciphertext is a batched
LWE array; the server key drives batched KS->PBS pipelines.

Re-exports are lazy (PEP 562) so the client-side modules (ciphertext,
client_key, compact_public_key — used by the JAX-free thin client
:mod:`tfhe_tpu.client`) can be imported without pulling in the server-side
compute stack (which requires jax).
"""

_EXPORTS = {
    "LookupTable": ".ciphertext",
    "ShortintCiphertext": ".ciphertext",
    "ClientKey": ".client_key",
    "CompactCiphertextList": ".compact_public_key",
    "CompactPrivateKey": ".compact_public_key",
    "CompactPublicKey": ".compact_public_key",
    "CompressedServerKey": ".compressed_server_key",
    "KeySwitchingKey": ".key_switching_key",
    "re_randomize_ciphertexts": ".key_switching_key",
    "NoiseSquashingKey": ".noise_squashing",
    "NoiseSquashingPrivateKey": ".noise_squashing",
    "SquashedNoiseCiphertext": ".noise_squashing",
    "CompressedSquashedNoiseCiphertextList": ".noise_squashing_compression",
    "NoiseSquashingCompressionKey": ".noise_squashing_compression",
    "NoiseSquashingCompressionPrivateKey": ".noise_squashing_compression",
    "compress_noise_squashed_ciphertexts_into_list":
        ".noise_squashing_compression",
    "PublicKey": ".public_key",
    "ServerKey": ".server_key",
    "WopbsKey": ".wopbs",
}

__all__ = list(_EXPORTS) + ["gen_keys"]


def __getattr__(name: str):
    if name in _EXPORTS:
        import importlib

        mod = importlib.import_module(_EXPORTS[name], __name__)
        val = getattr(mod, name)
        globals()[name] = val
        return val
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def gen_keys(params, seed: int = 0):
    """(ClientKey, ServerKey) — reference ``shortint::gen_keys``."""
    from .client_key import ClientKey
    from .server_key import ServerKey

    ck = ClientKey.generate(params, seed)
    sk = ServerKey.generate(ck)
    return ck, sk
