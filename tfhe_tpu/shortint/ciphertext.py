"""Shortint ciphertext: a (possibly batched) LWE array plus host-side
degree/noise bookkeeping.

Reference: ``tfhe/src/shortint/ciphertext/standard.rs:20`` (Ciphertext) and
``ciphertext/common.rs:68,151`` (Degree, NoiseLevel). The bookkeeping is pure
host metadata — it never lives on device. A batched ciphertext carries one
(degree, noise_level) pair for the whole batch (the conservative max), since
batches run the same circuit.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any

NOMINAL_NOISE = 1


@dataclass
class ShortintCiphertext:
    ct: Any  # jnp u64[..., dim+1]
    degree: int  # max attainable encoded value
    noise_level: int  # multiples of nominal fresh noise
    message_modulus: int
    carry_modulus: int
    # which key the ciphertext lives under: 'big' (post-PBS / fresh for
    # KS->PBS params) or 'small'
    under_key: str = "big"

    @property
    def batch_shape(self):
        return self.ct.shape[:-1]

    @property
    def lwe_dimension(self) -> int:
        return self.ct.shape[-1] - 1

    def with_ct(self, ct, degree=None, noise_level=None) -> "ShortintCiphertext":
        return replace(
            self,
            ct=ct,
            degree=self.degree if degree is None else degree,
            noise_level=self.noise_level if noise_level is None else noise_level,
        )


@dataclass
class LookupTable:
    """A trivial GLWE accumulator + the degree of the function's output
    (reference shortint/server_key LookupTableOwned)."""

    acc: Any  # jnp u64[k+1, N]
    degree: int


@dataclass
class ManyLookupTable:
    """Several functions packed in one accumulator (reference
    ManyLookupTableOwned): after one blind rotation, function i's output is
    the sample extraction at coefficient ``i * stride``."""

    acc: Any
    degrees: list
    stride: int
    count: int
    max_input_degree: int = 0
