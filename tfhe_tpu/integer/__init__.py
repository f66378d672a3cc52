"""integer — multi-block radix big integers over shortint blocks.

Reference: ``tfhe/src/integer/``.
"""

from .radix import BooleanBlock, ClientKey, RadixCiphertext, ServerKey


def gen_keys(params, seed: int = 0):
    ck = ClientKey.generate(params, seed)
    sk = ServerKey.generate(ck)
    return ck, sk
