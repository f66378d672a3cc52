"""Oblivious PRF: encrypted uniform randomness from a public seed.

Reference: ``tfhe/src/shortint/oprf.rs`` — a SHAKE256 XOF expands the seed
into a pseudorandom LWE mask (body 0); its phase -<a, s> is uniform and
unknown to everyone; one blind rotation with a staircase accumulator shapes
it into an encryption of a uniform value in [0, 2^random_bits_count).

LUT recipe (oprf.rs:185-255): acc[x] = (2*(x // poly_delta) + 1) * delta / 2
with poly_delta = 2N / 2^bits (no box encoding), then a final plaintext add
of degree * delta / 2.
"""

from __future__ import annotations

import hashlib

import numpy as np

from ..ops import ntt as ntt_mod
from ..ops import server as server_ops
from .ciphertext import NOMINAL_NOISE, ShortintCiphertext


def sha3_hash_u64(seed: int, count: int) -> np.ndarray:
    """SHAKE256(seed_le_8bytes) -> count u64 little-endian (oprf.rs:98)."""
    reader = hashlib.shake_256(int(seed).to_bytes(8, "little", signed=False))
    raw = reader.digest(count * 8)
    return np.frombuffer(raw, dtype="<u8").copy()


def create_random_from_seed(seed: int, lwe_dimension: int) -> np.ndarray:
    """Seeded LWE: XOF mask, zero body (oprf.rs create_random_from_seed)."""
    ct = np.zeros(lwe_dimension + 1, dtype=np.uint64)
    ct[:lwe_dimension] = sha3_hash_u64(seed, lwe_dimension)
    return ct


def generate_oblivious_pseudo_random(
    server_key, seed: int, random_bits_count: int
) -> ShortintCiphertext:
    """Encrypted uniform value in [0, 2^random_bits_count)
    (generate_oblivious_pseudo_random_message_and_carry)."""
    import jax.numpy as jnp

    p_ = server_key.params
    mm, cm = p_.message_modulus, p_.carry_modulus
    # message + carry + the padding bit (oprf.rs example "rbc=3, fbc=7"
    # corresponds to 3_3 params: 3 + 3 + 1)
    full_bits = int(np.log2(mm * cm)) + 1
    assert (1 << random_bits_count) <= mm * cm
    N = p_.polynomial_size
    R = p_.glwe_size
    pr = 1 << random_bits_count
    degree = pr - 1
    delta = 1 << (64 - full_bits)
    poly_delta = 2 * N // pr

    # staircase accumulator, no box encoding
    j = np.arange(N, dtype=np.uint64)
    body = (2 * (j // np.uint64(poly_delta)) + 1) * np.uint64(delta) // np.uint64(2)
    acc = np.zeros((R, N), dtype=np.uint64)
    acc[-1] = body

    ct = create_random_from_seed(seed, p_.lwe_dimension)
    plan = ntt_mod.get_plan(N, server_key.num_primes)
    from ..ops.pbs_kernel import scan_to_legacy_layout
    from .server_key import use_pallas_default

    grouping = getattr(p_, "grouping_factor", 0) or 0
    if grouping:
        out = server_ops.multi_bit_programmable_bootstrap(
            jnp.asarray(ct)[None], jnp.asarray(acc), server_key.bsk_scan[0],
            p_.pbs_base_log, p_.pbs_level, grouping, plan,
        )[0]
    elif server_key.ntt_variant == "v5":
        out = server_ops.programmable_bootstrap_goldilocks(
            jnp.asarray(ct)[None], jnp.asarray(acc), server_key.bsk_scan_g,
            p_.pbs_base_log, p_.pbs_level, centered_ms=False,
            use_pallas=use_pallas_default(),
        )[0]
    elif use_pallas_default():
        out = server_ops.programmable_bootstrap_pallas(
            jnp.asarray(ct)[None], jnp.asarray(acc), server_key.bsk_scan,
            p_.pbs_base_log, p_.pbs_level, plan, centered_ms=False,
        )[0]
    else:
        out = server_ops.programmable_bootstrap(
            jnp.asarray(ct)[None], jnp.asarray(acc),
            scan_to_legacy_layout(server_key.bsk_scan, p_.pbs_level),
            p_.pbs_base_log, p_.pbs_level, plan, centered_ms=False,
        )[0]
    out = out.at[-1].add(jnp.uint64(degree * delta // 2))
    return ShortintCiphertext(
        ct=out, degree=degree, noise_level=NOMINAL_NOISE,
        message_modulus=mm, carry_modulus=cm, under_key="big",
    )
