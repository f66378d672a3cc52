"""shortint — single-block operations on small (1-8 bit) messages.

TPU-native equivalent of ``tfhe/src/shortint``: a ciphertext is a batched
LWE array; the server key drives batched KS->PBS pipelines.
"""

from .ciphertext import LookupTable, ShortintCiphertext
from .client_key import ClientKey
from .server_key import ServerKey


def gen_keys(params, seed: int = 0):
    """(ClientKey, ServerKey) — reference ``shortint::gen_keys``."""
    ck = ClientKey.generate(params, seed)
    sk = ServerKey.generate(ck)
    return ck, sk
