"""Disk-backed key cache: avoids minutes of keygen per test/bench run.

Reference: ``tfhe/src/keycache/mod.rs`` (FileStorage/KeyCache named per
parameter set) and ``shortint/keycache.rs``. Keys are stored as raw ``.npy``
arrays in a directory keyed by ``(param_name, seed)``; the cache is also
memoized in-process.

Because the client key's keygen and encryption CSPRNG streams are derived
from independent sub-seeds (see :class:`tfhe_tpu.shortint.client_key
.ClientKey`), a cache hit is bit-identical to a fresh generation — both the
key material and all subsequent encryptions.
"""

from __future__ import annotations

import os
import threading
from pathlib import Path

import numpy as np

_DEFAULT_DIR = os.environ.get(
    "TFHE_TPU_KEYCACHE", os.path.join(os.path.dirname(__file__), "..", ".keycache")
)

_mem: dict = {}
_lock = threading.Lock()


def _fingerprint(params) -> str:
    """Short stable hash of the fields that shape key material.

    The cache was originally keyed by ``params.name`` alone, but two
    DIFFERENT parameter sets can share a name (e.g. ``utils.params``'s
    PARAM_MESSAGE_2_CARRY_2_KS_PBS vs the registry entry of the same name
    with different lwe_dimension/ks decomposition) — a name-only key then
    silently serves incompatible keys and the keyswitch crashes or, worse,
    corrupts. Keying on the actual geometry closes that."""
    import hashlib

    fields = []
    for f in ("lwe_dimension", "glwe_dimension", "polynomial_size",
              "ks_base_log", "ks_level", "pbs_base_log", "pbs_level",
              "grouping_factor", "message_modulus", "carry_modulus",
              "encryption_key_choice", "modulus_switch_type"):
        fields.append(str(getattr(params, f, None)))
    for f in ("lwe_noise_distribution", "glwe_noise_distribution"):
        d = getattr(params, f, None)
        fields.append(f"{getattr(d, 'kind', None)}:{getattr(d, 'std_dev', None)}:"
                      f"{getattr(d, 'bound_log2', None)}")
    return hashlib.sha256("|".join(fields).encode()).hexdigest()[:12]


def _cache_dir(param_name: str, seed: int, fp: str) -> Path:
    return Path(_DEFAULT_DIR) / f"{param_name}_s{seed}_{fp}"


def get_shortint_keys(params, seed: int = 0):
    """(ClientKey, ServerKey) for a shortint parameter set, cached."""
    from .shortint.client_key import ClientKey
    from .shortint.server_key import ServerKey

    fp = _fingerprint(params)
    key = ("shortint", params.name, seed, fp)
    with _lock:
        if key in _mem:
            return _mem[key]

    import jax.numpy as jnp

    d = _cache_dir(params.name, seed, fp)
    ck = ClientKey.generate(params, seed)  # fast (secret keys only)
    if (d / "bsk_scan.npy").exists():
        sk = ServerKey(
            params=params,
            ksk=jnp.asarray(np.load(d / "ksk.npy")),
            ksk_i8=jnp.asarray(np.load(d / "ksk_i8.npy")),
            bsk_scan=jnp.asarray(np.load(d / "bsk_scan.npy")),
            num_primes=ServerKey._num_primes_for(params),
            max_degree=params.message_modulus * params.carry_modulus - 1,
        )
        # the cached server keygen consumed the whole _keygen_gen stream in
        # generate(); nothing to advance — encryption uses its own stream
    else:
        sk = ServerKey.generate(ck)
        d.mkdir(parents=True, exist_ok=True)
        np.save(d / "ksk.npy", np.asarray(sk.ksk))
        np.save(d / "ksk_i8.npy", np.asarray(sk.ksk_i8))
        np.save(d / "bsk_scan.npy", np.asarray(sk.bsk_scan))
    with _lock:
        _mem[key] = (ck, sk)
    return ck, sk


def clear_memory_cache() -> None:
    with _lock:
        _mem.clear()
