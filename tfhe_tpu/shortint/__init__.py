"""shortint — single-block operations on small (1-8 bit) messages.

TPU-native equivalent of ``tfhe/src/shortint``: a ciphertext is a batched
LWE array; the server key drives batched KS->PBS pipelines.
"""

from .ciphertext import LookupTable, ShortintCiphertext
from .client_key import ClientKey
from .compact_public_key import (
    CompactCiphertextList,
    CompactPrivateKey,
    CompactPublicKey,
)
from .compressed_server_key import CompressedServerKey
from .key_switching_key import KeySwitchingKey, re_randomize_ciphertexts
from .noise_squashing import (
    NoiseSquashingKey,
    NoiseSquashingPrivateKey,
    SquashedNoiseCiphertext,
)
from .public_key import PublicKey
from .server_key import ServerKey
from .wopbs import WopbsKey


def gen_keys(params, seed: int = 0):
    """(ClientKey, ServerKey) — reference ``shortint::gen_keys``."""
    ck = ClientKey.generate(params, seed)
    sk = ServerKey.generate(ck)
    return ck, sk
