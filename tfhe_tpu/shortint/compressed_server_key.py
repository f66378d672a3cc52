"""Compressed (seeded) server keys: store only ciphertext BODIES plus the
mask-stream coordinates; masks are re-expanded deterministically.

Reference: seeded entities (``core_crypto/entities/seeded_lwe_bootstrap_key
.rs``, ``seeded_lwe_keyswitch_key.rs``) and ``CompressedServerKey``
(``shortint/server_key/compressed.rs``, ``high_level_api/keys/server.rs``).
The reference stores a compression seed and re-draws every mask from it on
decompression; here the recorded coordinates are the keygen mask stream's
(key, byte-offset) at the start of each key's draws, which makes
``decompress()`` produce arrays BIT-IDENTICAL to what
``ServerKey.generate(client_key)`` would have built — a stronger contract
than the reference's (which uses a separate seeded keygen path).

Sizes at PARAM_MESSAGE_2_CARRY_2_KS_PBS: full ServerKey device arrays are
~300 MB (NTT-domain BSK + limb KSK); the compressed form is the BSK body
polynomials (n * l * (k+1) * N u64 = 28.4 MB) + KSK bodies (80 KB) + seeds.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import numpy as np

from ..core import algorithms as algo
from ..core.entities import LweBootstrapKey, LweKeyswitchKey
from ..ops import server as server_ops
from ..utils.csprng import AesCtrGenerator
from .client_key import ClientKey
from .server_key import ServerKey

_U64 = np.uint64


@dataclass
class CompressedServerKey:
    params: Any
    bsk_bodies: np.ndarray  # u64[..., l, k+1, N] (body poly of each GGSW row)
    ksk_bodies: np.ndarray  # u64[n_big, l_ks] (body of each KSK LWE)
    mask_seed: int  # keygen mask-stream AES key
    bsk_mask_start: int  # stream byte offset at the first BSK mask draw
    ksk_mask_start: int
    max_degree: int = 0

    # ------------------------------------------------------------------
    @classmethod
    def generate(cls, client_key: ClientKey) -> "CompressedServerKey":
        """Same draw order as :meth:`ServerKey.generate` (BSK with glwe
        noise, then KSK with lwe noise — engine/server_side.rs), recording
        mask positions and keeping only bodies."""
        p = client_key.params
        gen = client_key._keygen_gen
        mask_seed = int.from_bytes(gen.mask._key16, "little")
        grouping = getattr(p, "grouping_factor", 0) or 0
        bsk_mask_start = gen.mask.table_index
        if grouping:
            bsk = algo.gen_multi_bit_bootstrap_key(
                client_key.lwe_sk, client_key.glwe_sk, p.pbs_base_log,
                p.pbs_level, grouping, p.glwe_noise_distribution, gen,
            )
        else:
            bsk = algo.gen_bootstrap_key(
                client_key.lwe_sk, client_key.glwe_sk, p.pbs_base_log,
                p.pbs_level, p.glwe_noise_distribution, gen,
            )
        ksk_mask_start = gen.mask.table_index
        ksk = algo.gen_keyswitch_key(
            client_key.big_lwe_sk, client_key.lwe_sk, p.ks_base_log,
            p.ks_level, p.lwe_noise_distribution, gen,
        )
        k = p.glwe_dimension
        return cls(
            params=p,
            bsk_bodies=np.asarray(bsk.data)[..., k, :].copy(),
            ksk_bodies=np.asarray(ksk.data)[..., ksk.data.shape[-1] - 1].copy(),
            mask_seed=mask_seed,
            bsk_mask_start=bsk_mask_start,
            ksk_mask_start=ksk_mask_start,
            max_degree=p.message_modulus * p.carry_modulus - 1,
        )

    # ------------------------------------------------------------------
    def decompress(self) -> ServerKey:
        """Re-expand masks from the recorded stream coordinates and build
        the full server key (NTT-domain BSK + int8-limb KSK)."""
        import jax.numpy as jnp

        p = self.params
        k = p.glwe_dimension
        N = p.polynomial_size
        n_big = p.glwe_dimension * p.polynomial_size
        n_small = p.lwe_dimension

        # --- BSK masks: one batched draw, same order as glwe_encrypt ----
        rows_shape = self.bsk_bodies.shape[:-1]  # [..., l, k+1]
        m_rows = int(np.prod(rows_shape))
        stream = AesCtrGenerator(self.mask_seed, table_index=self.bsk_mask_start)
        masks = stream.uniform_u64(m_rows * k * N).reshape(rows_shape + (k, N))
        data = np.concatenate([masks, self.bsk_bodies[..., None, :]], axis=-2)
        bsk = LweBootstrapKey(data, p.pbs_base_log, p.pbs_level)

        # --- KSK masks ---------------------------------------------------
        stream = AesCtrGenerator(self.mask_seed, table_index=self.ksk_mask_start)
        ksk_masks = stream.uniform_u64(n_big * p.ks_level * n_small).reshape(
            n_big, p.ks_level, n_small
        )
        ksk_data = np.concatenate(
            [ksk_masks, self.ksk_bodies[..., None].astype(_U64)], axis=-1
        )
        ksk = LweKeyswitchKey(ksk_data, p.ks_base_log, p.ks_level)

        # --- device transforms (same as ServerKey.generate) --------------
        num_primes = ServerKey._num_primes_for(p)
        bsk_hat = algo.bootstrap_key_to_ntt(bsk, num_primes)
        grouping = getattr(p, "grouping_factor", 0) or 0
        from ..ops.pbs_kernel import bsk_to_scan_layout

        if grouping:
            bsk_stored = bsk_hat.residues
        else:
            bsk_stored = bsk_to_scan_layout(bsk_hat.residues)
        return ServerKey(
            params=p,
            ksk=jnp.asarray(ksk_data),
            ksk_i8=jnp.asarray(server_ops.ksk_to_i8_limbs(ksk_data, p.ks_base_log)),
            bsk_scan=bsk_stored,
            num_primes=num_primes,
            max_degree=self.max_degree,
        )

    # ------------------------------------------------------------------
    def serialized_size_bytes(self) -> int:
        return self.bsk_bodies.nbytes + self.ksk_bodies.nbytes + 64


def _register_serialization():
    from ..utils import serialization as ser

    def _from(payload):
        m = payload["meta"]
        a = payload["arrays"]
        return CompressedServerKey(
            params=ser._params_from_name(m["params"]),
            bsk_bodies=a["bsk_bodies"],
            ksk_bodies=a["ksk_bodies"],
            mask_seed=int(m["mask_seed"], 16),
            bsk_mask_start=m["bsk_mask_start"],
            ksk_mask_start=m["ksk_mask_start"],
            max_degree=m["max_degree"],
        )

    ser.register_type("CompressedServerKey", 1, _from)

    def serialize_compressed_server_key(csk: CompressedServerKey) -> bytes:
        return ser.serialize(
            "CompressedServerKey",
            {
                "params": csk.params.name,
                "mask_seed": hex(csk.mask_seed),
                "bsk_mask_start": csk.bsk_mask_start,
                "ksk_mask_start": csk.ksk_mask_start,
                "max_degree": csk.max_degree,
            },
            {"bsk_bodies": csk.bsk_bodies, "ksk_bodies": csk.ksk_bodies},
        )

    ser.serialize_compressed_server_key = serialize_compressed_server_key


_register_serialization()
