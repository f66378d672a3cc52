"""Compact public key encryption + compact ciphertext lists.

Reference: ``shortint/public_key/compact.rs``,
``core_crypto/algorithms/lwe_compact_public_key_generation.rs`` (pk = (a,
b = a (*) rev(s) + e), one semi-reverse negacyclic convolution),
``lwe_encryption.rs:2279-2410`` (list encryption: per bin of n messages one
shared mask r-convolution and n bodies) and
``lwe_compact_ciphertext_list_expansion.rs`` (ct_i mask = a * X^i).

The n^2-compactness trick: a bin of up to n ciphertexts shares ONE mask
vector; expansion applies monic monomial rotations, exactly the negacyclic
ring structure the NTT layer already models.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List

import numpy as np

from ..core import algorithms as algo
from ..core.entities import LweSecretKey
from ..utils.csprng import EncryptionRandomGenerator, SecretRandomGenerator
from ..utils.encoding import ShortintEncoding
from ..utils.params import CompactPublicKeyEncryptionParameters
from .ciphertext import NOMINAL_NOISE, ShortintCiphertext

_U64 = np.uint64


def _srnc(lhs: np.ndarray, rhs_binary: np.ndarray) -> np.ndarray:
    """slice_semi_reverse_negacyclic_convolution: lhs (*) reverse(rhs) in
    Z_{2^64}[X]/(X^n + 1) (slice_algorithms.rs:626)."""
    rev = rhs_binary[::-1].copy()
    return algo._binary_polymul_batch(rev[None, :], lhs[None, None, :])[0]


@dataclass
class CompactPrivateKey:
    """Dedicated secret key for compact-PK encryption
    (shortint CompactPrivateKey)."""

    lwe_sk: LweSecretKey
    params: CompactPublicKeyEncryptionParameters
    _gen: EncryptionRandomGenerator = None

    @classmethod
    def generate(
        cls, params: CompactPublicKeyEncryptionParameters, seed: int = 0
    ) -> "CompactPrivateKey":
        sec = SecretRandomGenerator(seed ^ 0xC0FFEE)
        sk = algo.gen_lwe_secret_key(params.encryption_lwe_dimension, sec)
        gen = EncryptionRandomGenerator(seed ^ 0xFACADE, seed ^ 0xDEC0DE)
        return cls(lwe_sk=sk, params=params, _gen=gen)

    @property
    def encoding(self) -> ShortintEncoding:
        p = self.params
        return ShortintEncoding(
            ciphertext_modulus=p.ciphertext_modulus,
            message_modulus=p.message_modulus,
            carry_modulus=p.carry_modulus,
            padding_bit=True,
        )

    def decrypt_expanded(self, cts: np.ndarray) -> np.ndarray:
        raws = algo.lwe_decrypt(self.lwe_sk, cts)
        return np.array(
            [self.encoding.decode(int(r)) for r in raws], dtype=_U64
        )


@dataclass
class CompactPublicKey:
    """(a, b = a (*) rev(s) + e) — 2n u64 values total."""

    mask: np.ndarray  # u64[n]
    body: np.ndarray  # u64[n]
    params: CompactPublicKeyEncryptionParameters

    @classmethod
    def generate(cls, private_key: CompactPrivateKey) -> "CompactPublicKey":
        p = private_key.params
        n = p.encryption_lwe_dimension
        gen = private_key._gen
        mask = gen.mask.uniform_u64(n)
        with np.errstate(over="ignore"):
            body = _srnc(mask, private_key.lwe_sk.bits.astype(_U64))
            body = body + gen.sample_noise(p.encryption_noise_distribution, n)
        return cls(mask=mask, body=body, params=p)

    # ------------------------------------------------------------------
    def encrypt(self, values, rng: EncryptionRandomGenerator = None
                ) -> "CompactCiphertextList":
        """Encrypt a clear list into a compact list (lwe_encryption.rs:2279):
        per bin, mask_out = a (*) rev(r) + e1 and body_j =
        rev(b (*) rev(r))_j + Delta m_j + e2_j."""
        import secrets

        p = self.params
        n = p.encryption_lwe_dimension
        if rng is None:
            rng = EncryptionRandomGenerator(
                secrets.randbits(128), secrets.randbits(128)
            )
        enc = ShortintEncoding(
            ciphertext_modulus=p.ciphertext_modulus,
            message_modulus=p.message_modulus,
            carry_modulus=p.carry_modulus,
            padding_bit=True,
        )
        vals = np.atleast_1d(np.asarray(values, dtype=_U64))
        k = vals.shape[0]
        n_bins = -(-k // n)
        masks = np.zeros((n_bins, n), dtype=_U64)
        bodies = np.zeros(k, dtype=_U64)
        dist = p.encryption_noise_distribution
        with np.errstate(over="ignore"):
            for b in range(n_bins):
                chunk = vals[b * n : (b + 1) * n]
                m = chunk.shape[0]
                r = rng.noise.uniform_binary(n).astype(_U64)
                e1 = rng.sample_noise(dist, n)
                e2 = rng.sample_noise(dist, m)
                masks[b] = _srnc(self.mask, r) + e1
                conv = _srnc(self.body, r)[::-1]
                for j in range(m):
                    bodies[b * n + j] = (
                        conv[j] + e2[j] + enc.encode(int(chunk[j]))
                    )
        return CompactCiphertextList(
            masks=masks, bodies=bodies, count=k, params=p,
            degree=p.message_modulus - 1,
        )


@dataclass
class CompactCiphertextList:
    """Shared-mask compact LWE list; ~n+k u64 instead of k*(n+1)."""

    masks: np.ndarray  # u64[n_bins, n]
    bodies: np.ndarray  # u64[count]
    count: int
    params: Any
    degree: int

    def expand(self) -> np.ndarray:
        """-> u64[count, n+1]: ct_i mask = bin_mask * X^(i mod n)
        (lwe_compact_ciphertext_list_expansion.rs)."""
        n = self.params.encryption_lwe_dimension
        out = np.zeros((self.count, n + 1), dtype=_U64)
        with np.errstate(over="ignore"):
            for i in range(self.count):
                b, j = divmod(i, n)
                rot = np.roll(self.masks[b], j)
                if j:
                    rot[:j] = _U64(0) - rot[:j]
                out[i, :n] = rot
                out[i, n] = self.bodies[i]
        return out

    def expand_to_shortint(self) -> ShortintCiphertext:
        """Expanded ciphertexts as a batched shortint ct under the CPK key
        (cast to compute params with a KeySwitchingKey before computing)."""
        from ..utils.hostarray import asarray as _wrap

        p = self.params
        return ShortintCiphertext(
            ct=_wrap(self.expand()),
            degree=self.degree,
            noise_level=NOMINAL_NOISE,
            message_modulus=p.message_modulus,
            carry_modulus=p.carry_modulus,
            under_key="pke",
        )
