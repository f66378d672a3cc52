"""Shortint noise squashing: re-encrypt a ciphertext with a 128-bit PBS so
the result carries enough noise headroom for threshold decryption.

Reference: ``tfhe/src/shortint/noise_squashing/`` (private_key.rs,
server_key.rs, atomic_pattern/standard.rs:63-150) and the PBS-128 plumbing
in ``shortint/server_key/mod.rs:1561-1610``. Flow for KS->PBS keys:

    ct (u64, big key) --KS--> small key --MS--> blind rotate over the u128
    torus with the squashing BSK and an identity LUT at Delta_128 -->
    sample extract --> SquashedNoiseCiphertext (u128 LWE, degree preserved)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np

from ..core import algorithms as algo
from ..core import squash as sq
from ..core.entities import GlweSecretKey
from ..ops import ntt as ntt_mod
from ..ops import server as server_ops
from ..utils.params import NoiseSquashingParameters
from .ciphertext import ShortintCiphertext
from .client_key import ClientKey

_U64 = np.uint64


@dataclass
class SquashedNoiseCiphertext:
    """u128 LWE ciphertext as a (hi, lo) u64 pair, plus shortint metadata
    (reference ``shortint/ciphertext/squashed_noise.rs``)."""

    hi: Any  # u64[..., kN+1]
    lo: Any
    degree: int
    message_modulus: int
    carry_modulus: int


@dataclass
class NoiseSquashingPrivateKey:
    """The u128 GLWE secret key (private_key.rs); generated from the client
    key's keygen CSPRNG so squashing keysets are reproducible."""

    glwe_sk: sq.GlweSecretKey128
    params: NoiseSquashingParameters

    @classmethod
    def generate(
        cls, client_key: ClientKey, params: NoiseSquashingParameters
    ) -> "NoiseSquashingPrivateKey":
        gen = client_key._keygen_gen
        k, N = params.glwe_dimension, params.polynomial_size
        bits = gen.mask.uniform_binary(k * N).reshape(k, N)
        return cls(glwe_sk=sq.GlweSecretKey128(bits=bits.astype(_U64)), params=params)

    def decrypt_raw(self, ct: SquashedNoiseCiphertext):
        """Raw u128 plaintext (host python ints, exact)."""
        bits = self.glwe_sk.as_lwe_bits()
        hi = np.asarray(ct.hi, dtype=_U64)
        lo = np.asarray(ct.lo, dtype=_U64)
        if hi.ndim == 1:
            hi, lo = hi[None], lo[None]
        out = []
        n = bits.shape[0]
        mask128 = (1 << 128) - 1
        for r in range(hi.shape[0]):
            a = [int(hi[r, i]) << 64 | int(lo[r, i]) for i in range(n)]
            b = int(hi[r, n]) << 64 | int(lo[r, n])
            dot = sum(a[i] for i in range(n) if bits[i]) & mask128
            out.append((b - dot) & mask128)
        return out

    def decrypt(self, ct: SquashedNoiseCiphertext):
        """Decode message-and-carry from the u128 encoding (padding bit)."""
        mod_sup = ct.message_modulus * ct.carry_modulus
        delta = (1 << 127) // mod_sup
        vals = []
        for raw in self.decrypt_raw(ct):
            rounded = (raw + delta // 2) // delta
            vals.append(int(rounded) % (2 * mod_sup) % mod_sup)
        return vals


@dataclass
class NoiseSquashingKey:
    """Server-side squashing key: the u128 bootstrap key in NTT form
    (server_key.rs; the keyswitch key is borrowed from the compute server
    key at squash time, as in atomic_pattern/standard.rs:80-104)."""

    bsk_res: Any  # u32[P, n_small, l, R, R, N]
    base_log: int
    levels: int
    num_primes: int
    params: NoiseSquashingParameters

    @classmethod
    def generate(
        cls, client_key: ClientKey, private_key: NoiseSquashingPrivateKey
    ) -> "NoiseSquashingKey":
        p = private_key.params
        assert p.grouping_factor == 0, "multi-bit squashing BSK not yet wired"
        gen = client_key._keygen_gen
        bsk = sq.gen_bootstrap_key128(
            client_key.lwe_sk,
            private_key.glwe_sk,
            p.decomp_base_log,
            p.decomp_level_count,
            p.glwe_noise_distribution,
            gen,
        )
        num_primes = sq.num_primes_for_squash(p)
        ntt_bsk = sq.bootstrap_key128_to_ntt(bsk, num_primes)
        return cls(
            bsk_res=ntt_bsk.residues,
            base_log=p.decomp_base_log,
            levels=p.decomp_level_count,
            num_primes=num_primes,
            params=p,
        )

    # ------------------------------------------------------------------
    def squash_ciphertext_noise(
        self, server_key, ct: ShortintCiphertext
    ) -> SquashedNoiseCiphertext:
        """KS -> 128-bit PBS with the identity LUT
        (atomic_pattern/standard.rs:63-150)."""
        import jax.numpy as jnp

        p = self.params
        sp = server_key.params
        mod_sup = p.message_modulus * p.carry_modulus
        N = p.polynomial_size
        R = p.glwe_size

        # 1. keyswitch to the small key when the ct lives under the big key
        if ct.under_key == "big":
            small = server_key._fns[2](ct.ct, server_key.ksk_i8)
        else:
            small = ct.ct

        # 2. modulus switch to 2N
        log_modulus = N.bit_length()
        from ..utils.params import ModulusSwitchType

        if p.modulus_switch_type == ModulusSwitchType.CENTERED_MEAN_NOISE_REDUCTION:
            ms_mask, ms_body = server_ops.lwe_centered_binary_modulus_switch(
                small, log_modulus
            )
        else:
            ms_mask, ms_body = server_ops.lwe_standard_modulus_switch(
                small, log_modulus
            )

        # 3. identity LUT at Delta_128 over the output cleartext space
        box = N // mod_sup
        delta_hi = np.uint64((1 << 63) // mod_sup)  # Delta_128 >> 64
        body = np.repeat(
            (np.arange(mod_sup, dtype=_U64) * delta_hi), box
        )
        half = box // 2
        with np.errstate(over="ignore"):
            body[:half] = _U64(0) - body[:half]
        body = np.roll(body, -half)
        lut_hi = np.zeros((R, N), dtype=_U64)
        lut_hi[-1] = body
        lut_lo = np.zeros((R, N), dtype=_U64)

        batch = small.shape[:-1]
        plan = ntt_mod.get_plan(N, self.num_primes)
        lut_hi_b = jnp.broadcast_to(jnp.asarray(lut_hi), batch + (R, N))
        lut_lo_b = jnp.broadcast_to(jnp.asarray(lut_lo), batch + (R, N))
        rot_hi, rot_lo = sq.blind_rotate128(
            lut_hi_b, lut_lo_b, ms_mask, ms_body, self.bsk_res,
            self.base_log, self.levels, plan,
        )
        out_hi, out_lo = sq.sample_extract128(rot_hi, rot_lo)
        return SquashedNoiseCiphertext(
            hi=out_hi,
            lo=out_lo,
            degree=ct.degree,
            message_modulus=p.message_modulus,
            carry_modulus=p.carry_modulus,
        )
