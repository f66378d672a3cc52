"""Compression of noise-squashed (u128) ciphertexts into packed GLWE lists.

Mirrors the reference's ``shortint/list_compression/noise_squashing_compression.rs``
(``compress_noise_squashed_ciphertexts_into_list``) and the key types in
``list_compression/{private_key,server_keys}.rs`` (``NoiseSquashingCompressionPrivateKey``,
``NoiseSquashingCompressionKey``). Unlike the u64 list compression, the packed
ciphertexts can be extracted WITHOUT a PBS (plain sample extract), because the
squashed torus has enough noise headroom; the storage modulus stays the full
native u128 (``CompressedModulusSwitchedGlweCiphertext`` with
``ciphertext_modulus_log == 128`` keeps every bit).

Design notes (TPU-first): the packing keyswitch is an exact CRT-NTT
convolution — digit polynomials (one nonzero coefficient per packed LWE) are
forward-transformed once and MAC'd against the pre-transformed u128 packing
KSK residues, with the 128-bit result reconstructed by the same Garner path
as the u128 PBS (`core/squash.py`). The whole chunk is one fused jnp program.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Optional

import numpy as np

from ..core import squash as sq
from ..ops import ntt as ntt_mod
from ..utils.params import NoiseSquashingCompressionParameters
from .client_key import ClientKey
from .noise_squashing import NoiseSquashingPrivateKey, SquashedNoiseCiphertext

_U64 = np.uint64


@dataclass
class NoiseSquashingCompressionPrivateKey:
    """GLWE secret key of the packed domain (private_key.rs:308)."""

    glwe_sk: sq.GlweSecretKey128
    params: NoiseSquashingCompressionParameters

    @classmethod
    def generate(
        cls, client_key: ClientKey, params: NoiseSquashingCompressionParameters
    ) -> "NoiseSquashingCompressionPrivateKey":
        gen = client_key._keygen_gen
        k = params.packing_ks_glwe_dimension
        N = params.packing_ks_polynomial_size
        bits = gen.mask.uniform_binary(k * N).reshape(k, N)
        return cls(glwe_sk=sq.GlweSecretKey128(bits=bits.astype(_U64)),
                   params=params)

    def private_key_view(self) -> NoiseSquashingPrivateKey:
        """Decryption view (reference private_key.rs:100 From impl)."""
        return NoiseSquashingPrivateKey(glwe_sk=self.glwe_sk, params=None)

    def decrypt(self, ct: SquashedNoiseCiphertext):
        return self.private_key_view().decrypt(ct)


@dataclass
class NoiseSquashingCompressionKey:
    """u128 packing keyswitch key in NTT residue form (server_keys.rs:271).

    ``pksk_hat``: u32[P, n_in, l, R_c, N_c] — NTT residues of
    GLWE_enc128(s_j * 2^(128 - b*level)) under the compression GLWE key.
    """

    pksk_hat: Any
    params: NoiseSquashingCompressionParameters
    num_primes: int
    in_dim: int

    @classmethod
    def generate(
        cls,
        client_key: ClientKey,
        squash_private_key: NoiseSquashingPrivateKey,
        comp_private_key: NoiseSquashingCompressionPrivateKey,
    ) -> "NoiseSquashingCompressionKey":
        import jax.numpy as jnp

        cp = comp_private_key.params
        N_c = cp.packing_ks_polynomial_size
        R_c = cp.packing_ks_glwe_dimension + 1
        l = cp.packing_ks_level
        b = cp.packing_ks_base_log
        gen = client_key._keygen_gen

        in_bits = squash_private_key.glwe_sk.as_lwe_bits()  # u64[n_in]
        n_in = in_bits.shape[0]

        # plaintexts s_j * 2^(128 - b*level) as (hi, lo) u64 pairs,
        # message in coefficient 0 (lwe_packing_keyswitch_key_generation.rs)
        pts_hi = np.zeros((n_in, l, N_c), dtype=_U64)
        pts_lo = np.zeros((n_in, l, N_c), dtype=_U64)
        with np.errstate(over="ignore"):
            for lev_idx in range(l):
                level = l - lev_idx
                shift = 128 - b * level
                if shift >= 64:
                    pts_hi[:, lev_idx, 0] = in_bits << _U64(shift - 64)
                else:
                    pts_lo[:, lev_idx, 0] = in_bits << _U64(shift)
        hi, lo = sq.glwe_encrypt128(
            comp_private_key.glwe_sk,
            pts_hi.reshape(-1, N_c), pts_lo.reshape(-1, N_c),
            cp.packing_ks_key_noise_distribution, gen,
        )  # u64[n_in*l, R_c, N_c] x2
        hi = hi.reshape(n_in, l, R_c, N_c)
        lo = lo.reshape(n_in, l, R_c, N_c)

        # exactness budget: signed digits (< 2^(b-1)) x u128 coefficients,
        # n_in*l accumulated negacyclic products
        bound = ntt_mod.polymul_bound_bits(b, N_c, num_sums=n_in * l,
                                           torus_bits=128)
        npr = ntt_mod.min_primes_for_bound(float(bound))
        plan = ntt_mod.get_plan(N_c, npr)
        # residues of the u128 pair: (hi * 2^64 + lo) mod p, then fwd NTT
        # (same transform as bootstrap_key128_to_ntt, core/squash.py:332)
        import jax

        @jax.jit
        def fwd(hi, lo):
            p = plan.p_like(hi.ndim)
            c64 = jnp.asarray(
                [(1 << 64) % int(pp) for pp in plan.primes], jnp.uint64
            ).reshape(p.shape)
            r = (jnp.remainder(hi[None], p) * c64
                 + jnp.remainder(lo[None], p)) % p
            twist = plan._bcast(plan.twist, hi.ndim)
            twist_s = plan._bcast(plan.twist_shoup, hi.ndim)
            r = ntt_mod.shoup_mul(r, twist, twist_s, p)
            return plan._fwd_stages(r, p).astype(jnp.uint32)

        pksk_hat = fwd(jnp.asarray(hi), jnp.asarray(lo))
        return cls(pksk_hat=pksk_hat, params=cp, num_primes=npr, in_dim=n_in)


@dataclass
class CompressedSquashedNoiseCiphertextList:
    """Packed GLWE list at full u128 precision (ciphertext/squashed_noise.rs
    CompressedSquashedNoiseCiphertextList)."""

    glwe_hi: np.ndarray  # u64[n_glwe, R_c, N_c]
    glwe_lo: np.ndarray
    count: int
    message_modulus: int
    carry_modulus: int
    params: NoiseSquashingCompressionParameters
    degrees: Optional[List[int]] = None

    def __len__(self) -> int:
        return self.count

    def unpack(self, index: int) -> SquashedNoiseCiphertext:
        """Extract one squashed LWE — no PBS needed (the reference's
        SquashedNoiseCiphertextList::unpack path)."""
        assert 0 <= index < self.count
        per = min(self.params.lwe_per_glwe,
                  self.params.packing_ks_polynomial_size)
        gidx, nth = divmod(index, per)
        hi, lo = sq.sample_extract128(
            self.glwe_hi[gidx], self.glwe_lo[gidx], nth)
        degree = (self.degrees[index] if self.degrees is not None
                  else self.message_modulus * self.carry_modulus - 1)
        return SquashedNoiseCiphertext(
            hi=np.asarray(hi), lo=np.asarray(lo),
            degree=degree,
            message_modulus=self.message_modulus,
            carry_modulus=self.carry_modulus,
        )


def compress_noise_squashed_ciphertexts_into_list(
    key: NoiseSquashingCompressionKey,
    ciphertexts: List[SquashedNoiseCiphertext],
) -> CompressedSquashedNoiseCiphertextList:
    """Pack squashed LWEs into GLWEs via the u128 packing keyswitch
    (noise_squashing_compression.rs:23-120)."""
    import jax.numpy as jnp

    cp = key.params
    N_c = cp.packing_ks_polynomial_size
    R_c = cp.packing_ks_glwe_dimension + 1
    l = cp.packing_ks_level
    b = cp.packing_ks_base_log
    per = min(cp.lwe_per_glwe, N_c)
    plan = ntt_mod.get_plan(N_c, key.num_primes)

    if not ciphertexts:
        return CompressedSquashedNoiseCiphertextList(
            glwe_hi=np.zeros((0, R_c, N_c), _U64),
            glwe_lo=np.zeros((0, R_c, N_c), _U64),
            count=0, message_modulus=cp.message_modulus,
            carry_modulus=cp.carry_modulus, params=cp)

    n_in = key.in_dim
    his, los, degrees = [], [], []
    for ct in ciphertexts:
        assert np.asarray(ct.hi).shape[-1] == n_in + 1, \
            "ciphertext lwe size does not match the packing keyswitch key"
        assert ct.message_modulus == cp.message_modulus
        assert ct.carry_modulus == cp.carry_modulus
        hi2 = np.atleast_2d(np.asarray(ct.hi, _U64))  # batched cts flatten
        his.append(hi2)
        los.append(np.atleast_2d(np.asarray(ct.lo, _U64)))
        degrees.extend([ct.degree] * hi2.shape[0])

    hi_all = np.concatenate(his, axis=0)
    lo_all = np.concatenate(los, axis=0)
    count = hi_all.shape[0]
    n_glwe = -(-count // per)

    out_hi = np.zeros((n_glwe, R_c, N_c), _U64)
    out_lo = np.zeros((n_glwe, R_c, N_c), _U64)
    for gidx in range(n_glwe):
        chi = hi_all[gidx * per: (gidx + 1) * per]
        clo = lo_all[gidx * per: (gidx + 1) * per]
        B = chi.shape[0]
        digits = np.asarray(sq.decompose128(
            jnp.asarray(chi[:, :n_in]), jnp.asarray(clo[:, :n_in]), b, l,
        ))  # [B, n_in, l] int64
        polys = np.zeros((n_in, l, N_c), dtype=np.int64)
        polys[:, :, :B] = np.moveaxis(digits, 0, -1)
        # base-61 digits exceed the primes by ~2^30, so reduce each prime's
        # residue with a full remainder before the transform (plan.fwd's
        # int64 fast path assumes |x| < p and would be wrong here)
        pj = jnp.asarray(polys)
        p = plan.p_like(pj.ndim)
        rp = jnp.remainder(pj[None], p.astype(jnp.int64)).astype(jnp.uint64)
        twist = plan._bcast(plan.twist, pj.ndim)
        twist_s = plan._bcast(plan.twist_shoup, pj.ndim)
        dhat = plan._fwd_stages(
            ntt_mod.shoup_mul(rp, twist, twist_s, p), p)  # [P, n_in, l, N_c]
        prod = (
            dhat[..., None, :].astype(jnp.uint64)
            * key.pksk_hat.astype(jnp.uint64)
        ) % plan.p_like(4)
        acc_hat = jnp.sum(prod, axis=(1, 2)) % plan.p_like(2)  # [P, R_c, N_c]
        mac_hi, mac_lo = sq._reconstruct128(plan, plan.inv(acc_hat))
        body_hi = np.zeros((R_c, N_c), _U64)
        body_lo = np.zeros((R_c, N_c), _U64)
        body_hi[R_c - 1, :B] = chi[:, n_in]
        body_lo[R_c - 1, :B] = clo[:, n_in]
        with np.errstate(over="ignore"):
            ghi, glo = sq.sub128(body_hi, body_lo,
                                 np.asarray(mac_hi, _U64),
                                 np.asarray(mac_lo, _U64))
        out_hi[gidx], out_lo[gidx] = ghi, glo

    return CompressedSquashedNoiseCiphertextList(
        glwe_hi=out_hi, glwe_lo=out_lo, count=count,
        message_modulus=cp.message_modulus, carry_modulus=cp.carry_modulus,
        params=cp, degrees=degrees)
