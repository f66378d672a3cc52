"""Keyset-to-keyset key switching (parameter casting) and ciphertext
re-randomization.

Reference: ``shortint/key_switching_key/mod.rs:134,539,696``
(KeySwitchingKey::cast / cast_and_apply_functions: optional pre-shift LUT,
keyswitch, refresh PBS on the destination key) and
``shortint/ciphertext/re_randomization.rs:283-374`` (add keyswitched
compact-PK encryptions of zero derived from a seed).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import numpy as np

from ..core import algorithms as algo
from ..ops import server as server_ops
from ..utils.csprng import EncryptionRandomGenerator
from ..utils.params import EncryptionKeyChoice, ShortintKeySwitchingParameters
from .ciphertext import NOMINAL_NOISE, ShortintCiphertext
from .client_key import ClientKey
from .compact_public_key import CompactPrivateKey, CompactPublicKey
from .server_key import ServerKey

_U64 = np.uint64


@dataclass
class KeySwitchingKey:
    """Casts ciphertexts from a source keyset (a compute keyset or a
    compact-PK keyset) into a destination keyset."""

    ksk: np.ndarray  # u64[n_src, l, n_dst+1]
    ksk_i8: Any
    params: ShortintKeySwitchingParameters
    dest_server_key: ServerKey
    src_server_key: Optional[ServerKey]
    cast_rshift: int
    dest_under: str  # 'big' | 'small'

    # ------------------------------------------------------------------
    @classmethod
    def generate(
        cls,
        src,  # ClientKey (compute keyset) or CompactPrivateKey (PKE keyset)
        dst_client: ClientKey,
        dst_server: ServerKey,
        params: ShortintKeySwitchingParameters,
        src_server: Optional[ServerKey] = None,
    ) -> "KeySwitchingKey":
        if isinstance(src, CompactPrivateKey):
            in_sk = src.lwe_sk
            src_bits = (
                src.params.message_modulus * src.params.carry_modulus
            ).bit_length() - 1
        else:
            in_sk, _, _ = src.encryption_key_and_noise
            src_bits = (
                src.params.message_modulus * src.params.carry_modulus
            ).bit_length() - 1
        dp = dst_client.params
        dst_bits = (dp.message_modulus * dp.carry_modulus).bit_length() - 1
        if params.destination_key == EncryptionKeyChoice.BIG:
            out_sk = dst_client.big_lwe_sk
            noise = dp.glwe_noise_distribution
            dest_under = "big"
        else:
            out_sk = dst_client.lwe_sk
            noise = dp.lwe_noise_distribution
            dest_under = "small"
        ksk = algo.gen_keyswitch_key(
            in_sk, out_sk, params.ks_base_log, params.ks_level, noise,
            dst_client._keygen_gen,
        )
        return cls(
            ksk=ksk.data,
            ksk_i8=None,
            params=params,
            dest_server_key=dst_server,
            src_server_key=src_server,
            cast_rshift=dst_bits - src_bits,
            dest_under=dest_under,
        )

    # ------------------------------------------------------------------
    def cast(self, ct: ShortintCiphertext) -> ShortintCiphertext:
        """Pre-shift (when casting to fewer message bits), keyswitch, then a
        refresh PBS under the destination key
        (key_switching_key/mod.rs:696-800)."""
        import jax.numpy as jnp

        dsk = self.dest_server_key
        dp = dsk.params
        mod_sup_dst = dp.message_modulus * dp.carry_modulus

        pre = ct
        if self.cast_rshift < 0:
            assert self.src_server_key is not None, (
                "casting to a smaller message modulus needs the source "
                "server key for the pre-shift LUT"
            )
            src_sk = self.src_server_key
            mod_sup_src = (
                src_sk.params.message_modulus * src_sk.params.carry_modulus
            )
            lut = src_sk.generate_lookup_table(
                lambda x: (x << -self.cast_rshift) % mod_sup_src
            )
            pre = src_sk.apply_lookup_table(ct, lut)

        ksed = server_ops.keyswitch(
            jnp.asarray(pre.ct), jnp.asarray(self.ksk),
            self.params.ks_base_log, self.params.ks_level,
        )
        mid = ShortintCiphertext(
            ct=ksed,
            degree=pre.degree,
            noise_level=NOMINAL_NOISE,
            message_modulus=dp.message_modulus,
            carry_modulus=dp.carry_modulus,
            under_key=self.dest_under,
        )
        # refresh through the destination atomic pattern (reference casts
        # always refresh: noise after a cross-keyset KS is off-model)
        if self.cast_rshift > 0:
            f = lambda x: (x >> self.cast_rshift) % mod_sup_dst  # noqa: E731
        else:
            f = lambda x: x % mod_sup_dst  # noqa: E731
        lut = dsk.generate_lookup_table(f)
        if self.dest_under == "big" and dsk._ap_order == "ks_pbs":
            return dsk.apply_lookup_table(mid, lut)
        # destination is the small key: run the PBS directly (the ct already
        # sits under the PBS input key)
        _, pbs_only, _ = dsk._fns
        out = pbs_only(mid.ct, lut.acc, dsk.pbs_bsk)
        return ShortintCiphertext(
            ct=out, degree=lut.degree, noise_level=NOMINAL_NOISE,
            message_modulus=dp.message_modulus,
            carry_modulus=dp.carry_modulus, under_key="big",
        )


def re_randomize_ciphertexts(
    cts: list,
    cpk: CompactPublicKey,
    ksk: KeySwitchingKey,
    seed: int,
) -> list:
    """Add keyswitched compact-PK encryptions of ZERO, deterministically
    derived from ``seed`` (ciphertext/re_randomization.rs:283-374). Inputs
    must be at nominal noise; outputs stay at nominal."""
    import jax.numpy as jnp

    assert ksk.dest_under == "big", "re-randomization requires KS->PBS order"
    assert ksk.cast_rshift == 0, "re-randomization requires matching moduli"
    for ct in cts:
        assert ct.noise_level <= NOMINAL_NOISE, (
            "tried to re-randomize a ciphertext with non-nominal noise"
        )
    count = sum(int(np.prod(ct.ct.shape[:-1])) or 1 for ct in cts)
    rng = EncryptionRandomGenerator(seed, seed ^ 0x5EED)
    zeros = cpk.encrypt(np.zeros(count, dtype=_U64), rng=rng)
    expanded = zeros.expand()
    ksed = np.asarray(
        server_ops.keyswitch(
            jnp.asarray(expanded), jnp.asarray(ksk.ksk),
            ksk.params.ks_base_log, ksk.params.ks_level,
        )
    )
    out = []
    idx = 0
    with np.errstate(over="ignore"):
        for ct in cts:
            shape = ct.ct.shape
            m = int(np.prod(shape[:-1])) or 1
            z = ksed[idx : idx + m].reshape(shape)
            idx += m
            out.append(ct.with_ct(ct.ct + jnp.asarray(z)))
    return out
