"""Core-crypto entities: arrays + metadata, not view hierarchies.

The reference's 50+ entity types (``tfhe/src/core_crypto/entities/``) are
``(container, metadata)`` views over flat slices; here each is a plain
dataclass holding numpy (host) arrays, with device (jnp) mirrors created by
the server-key preparation step.

Shapes (q = 2^64 everywhere, leading batch dims allowed on ciphertexts):
- LWE ciphertext:        u64[..., n+1]           (mask | body)
- GLWE ciphertext:       u64[..., k+1, N]        (k mask polys | body poly)
- GGSW ciphertext:       u64[l, k+1, k+1, N]     (level-matrix rows x polys;
                         level index 0 <-> decomposition level l (q/B^l),
                         matching the reference's storage order)
- LWE keyswitch key:     u64[n_in, l_ks, n_out+1]
- LWE bootstrap key:     u64[n, l_pbs, k+1, k+1, N]
- NTT bootstrap key:     u32[P, n, l_pbs, k+1, k+1, N] residues (the
                         transform-domain mirror of the reference's
                         FourierLweBootstrapKey, fft64/crypto/bootstrap.rs:33)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np

from ..utils.params import DynamicDistribution


@dataclass
class LweSecretKey:
    bits: np.ndarray  # u64[n], values in {0,1}

    @property
    def dim(self) -> int:
        return self.bits.shape[0]


@dataclass
class GlweSecretKey:
    bits: np.ndarray  # u64[k, N]

    @property
    def glwe_dim(self) -> int:
        return self.bits.shape[0]

    @property
    def poly_size(self) -> int:
        return self.bits.shape[1]

    def as_lwe_secret_key(self) -> LweSecretKey:
        """Flatten to the equivalent big LWE key (reference
        ``GlweSecretKey::into_lwe_secret_key``)."""
        return LweSecretKey(self.bits.reshape(-1).copy())


@dataclass
class LweKeyswitchKey:
    data: np.ndarray  # u64[n_in, l, n_out+1]
    base_log: int
    levels: int

    @property
    def input_dim(self) -> int:
        return self.data.shape[0]

    @property
    def output_dim(self) -> int:
        return self.data.shape[2] - 1


@dataclass
class LweBootstrapKey:
    data: np.ndarray  # u64[n, l, k+1, k+1, N]
    base_log: int
    levels: int

    @property
    def input_dim(self) -> int:
        return self.data.shape[0]

    @property
    def glwe_size(self) -> int:
        return self.data.shape[2]

    @property
    def poly_size(self) -> int:
        return self.data.shape[-1]


@dataclass
class NttLweBootstrapKey:
    """Transform-domain BSK: per-prime residues + their Shoup duals, u32.

    Equivalent of the reference's Fourier-domain key
    (``fft_impl/fft64/crypto/bootstrap.rs:33`` FourierLweBootstrapKey), with
    NTT residues instead of c64 — exact arithmetic. The second leading slot
    stores floor(res * 2^32 / p) so every MAC in the external product is a
    division-free Shoup multiply (tfhe-ntt prime64/shoup.rs scheme).
    """

    residues: Any  # jnp u32[2, P, n, l, k+1, k+1, N]
    base_log: int
    levels: int
    num_primes: int

    @property
    def input_dim(self) -> int:
        return self.residues.shape[2]

    @property
    def glwe_size(self) -> int:
        return self.residues.shape[4]

    @property
    def poly_size(self) -> int:
        return self.residues.shape[6]
