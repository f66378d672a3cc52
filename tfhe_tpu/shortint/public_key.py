"""LWE public keys: encrypt without the secret key.

Reference: ``tfhe/src/shortint/public_key/standard.rs`` and
``core_crypto/algorithms/lwe_public_key_generation.rs`` — the public key is
a list of encryptions of zero; public encryption is a random binary subset
sum plus the plaintext (Regev public-key encryption).

The compact public key (public_key/compact.rs, one GLWE-sized key +
expansion) is tracked for a later round; this module covers the standard
public key surface.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np

from ..core import algorithms as algo
from .ciphertext import NOMINAL_NOISE, ShortintCiphertext
from .client_key import ClientKey


# reference zero_encryption_count for LwePublicKey
# (shortint/engine/public_side.rs:15-22): (n + 1) * log2(q) + 128 zero
# encryptions, the leftover-hash-lemma margin that makes Regev subset-sum
# public encryption semantically secure.
def _zero_count(n: int) -> int:
    return (n + 1) * 64 + 128


@dataclass
class PublicKey:
    """zeros: u64[count, n+1] — encryptions of 0 under the encryption key."""

    zeros: np.ndarray
    params: Any

    @classmethod
    def generate(cls, client_key: ClientKey) -> "PublicKey":
        p = client_key.params
        sk, noise, _ = client_key.encryption_key_and_noise
        count = _zero_count(sk.dim)
        pts = np.zeros(count, dtype=np.uint64)
        zeros = algo.lwe_encrypt(sk, pts, noise, client_key._enc_gen)
        return cls(zeros=np.asarray(zeros), params=p)

    def encrypt(self, values, rng=None) -> ShortintCiphertext:
        """Random-subset-sum public encryption (standard.rs encrypt).

        The subset-selection bits are encryption randomness: they come from
        the AES-CTR CSPRNG (seeded from OS entropy by default), matching the
        reference's SecretRandomGenerator, never a non-cryptographic PRNG.
        """
        import jax.numpy as jnp

        from ..utils.encoding import ShortintEncoding

        p = self.params
        enc = ShortintEncoding(
            ciphertext_modulus=p.ciphertext_modulus,
            message_modulus=p.message_modulus,
            carry_modulus=p.carry_modulus,
            padding_bit=True,
        )
        if rng is None:
            import secrets

            from ..utils.csprng import AesCtrGenerator

            rng = AesCtrGenerator(seed=secrets.randbits(128))
        vals = np.atleast_1d(np.asarray(values, dtype=np.uint64))
        count = self.zeros.shape[0]
        if isinstance(rng, np.random.Generator):  # test-only deterministic path
            sel = rng.integers(0, 2, size=(vals.size, count), dtype=np.uint64)
        else:
            sel = rng.uniform_binary(vals.size * count).reshape(vals.size, count).astype(np.uint64)
        with np.errstate(over="ignore"):
            cts = (sel[:, :, None] * self.zeros[None]).sum(axis=1)
            for i, v in enumerate(vals.reshape(-1)):
                cts[i, -1] += enc.encode(int(v))
        cts = cts.reshape(vals.shape + (self.zeros.shape[1],))
        if np.isscalar(values) or np.asarray(values).ndim == 0:
            cts = cts[0]
        under = "big" if self.zeros.shape[1] - 1 == p.big_lwe_dimension else "small"
        return ShortintCiphertext(
            ct=jnp.asarray(cts),
            degree=p.message_modulus - 1,
            noise_level=NOMINAL_NOISE,
            message_modulus=p.message_modulus,
            carry_modulus=p.carry_modulus,
            under_key=under,
        )
