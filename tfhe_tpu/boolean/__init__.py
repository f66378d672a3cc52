"""boolean — encrypted boolean gate API (drop-in TFHE-gate layer).

Reference: ``tfhe/src/boolean/`` — messages are encoded at +-q/8
(``boolean/mod.rs:72-78``: TRUE = q/8, FALSE = -q/8); a gate is a small
linear combination followed by a sign bootstrap whose accumulator is the
constant-TRUE polynomial (``boolean/engine/bootstrapping.rs:64``), then a
keyswitch back to the small key.
"""

from .keys import BooleanCiphertext, ClientKey, ServerKey, gen_keys
