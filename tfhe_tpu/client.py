"""Thin-client surface: keygen / encrypt / decrypt / serialize without JAX.

The TPU-native analog of the reference's browser client API
(``tfhe/src/js_on_wasm_api/``, wasm-bindgen bindings exposing *client-side*
operations only — keygen, encryption, serialization, compact lists, ZK
proofs — so an untrusted thin device can produce ciphertexts for a remote
server). Here the same role is played by a numpy-only module: every function
below runs with JAX absent (verified by ``tests/test_client_sdk.py`` in a
subprocess with the ``jax`` package masked), so the client stack can run on
WASM-Python (pyodide) in a browser, on a phone, or on any edge device, while
the server side (``tfhe_tpu.shortint.server_key`` and up) runs on TPU.

Interop contract: ciphertexts produced here are bit-identical to the ones the
full stack produces from the same seed (same CSPRNG draw order), and the
serialized envelopes are the regular ``RadixCiphertext`` /
``ShortintClientKey`` envelopes of :mod:`tfhe_tpu.utils.serialization`, so
either side can read what the other wrote.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .shortint.ciphertext import NOMINAL_NOISE, ShortintCiphertext
from .shortint.client_key import ClientKey as ShortintClientKey
from .shortint.compact_public_key import CompactPublicKey  # noqa: F401
from .utils import serialization as ser

__all__ = [
    "ClientKey",
    "ClientRadixCiphertext",
    "CompactPublicKey",
    "CompactPrivateKey",
    "encrypt_radix",
    "encrypt_signed_radix",
    "decrypt_radix",
    "decrypt_signed_radix",
    "serialize_radix",
    "serialize_client_key",
    "generate_compact_keys",
    "build_compact_list",
    "build_proven_compact_list",
    "client_crs",
    "serialize_compact_list",
    "serialize_proof",
]

ClientKey = ShortintClientKey


@dataclass
class ClientRadixCiphertext:
    """Client-side radix ciphertext: plain numpy arrays, attribute-compatible
    with the serialization envelope of the server's ``RadixCiphertext``."""

    ct: np.ndarray  # u64[..., num_blocks, dim+1]
    degrees: np.ndarray
    noise_levels: np.ndarray
    message_modulus: int
    carry_modulus: int

    @property
    def num_blocks(self) -> int:
        return self.ct.shape[-2]


def encrypt_radix(ck: ShortintClientKey, values, num_blocks: int
                  ) -> ClientRadixCiphertext:
    """Clear integer(s) -> radix ciphertext with the same block decomposition
    and CSPRNG draw order as ``integer::ClientKey::encrypt_radix`` (reference
    integer/client_key/mod.rs), built without the server-side radix module."""
    mm = ck.params.message_modulus
    vals = np.atleast_1d(np.asarray(values, dtype=np.uint64))
    blocks = np.zeros(vals.shape + (num_blocks,), dtype=np.uint64)
    v = vals.copy()
    for b in range(num_blocks):
        blocks[..., b] = v % mm
        v //= mm
    ct = ck.encrypt(blocks.reshape(-1))
    dim = ct.ct.shape[-1]
    arr = np.asarray(ct.ct, dtype=np.uint64).reshape(
        vals.shape + (num_blocks, dim)
    )
    if np.isscalar(values) or np.asarray(values).ndim == 0:
        arr = arr[0]
    return ClientRadixCiphertext(
        ct=arr,
        degrees=np.full(num_blocks, mm - 1, dtype=np.int64),
        noise_levels=np.full(num_blocks, NOMINAL_NOISE, dtype=np.int64),
        message_modulus=mm,
        carry_modulus=ck.params.carry_modulus,
    )


def encrypt_signed_radix(ck: ShortintClientKey, values, num_blocks: int
                         ) -> ClientRadixCiphertext:
    """Two's-complement encode then radix-encrypt (signed integers)."""
    mm = ck.params.message_modulus
    bits = int(np.log2(mm)) * num_blocks
    vals = np.asarray(values, dtype=np.int64)
    enc = np.mod(vals.astype(object), 1 << bits)
    enc = np.asarray(enc, dtype=np.uint64)
    return encrypt_radix(ck, enc if vals.ndim else np.uint64(enc), num_blocks)


def _as_shortint(ck: ShortintClientKey, payload) -> ShortintCiphertext:
    return ShortintCiphertext(
        ct=np.asarray(payload.ct, dtype=np.uint64),
        degree=payload.message_modulus - 1,
        noise_level=NOMINAL_NOISE,
        message_modulus=payload.message_modulus,
        carry_modulus=payload.carry_modulus,
        under_key="big" if ck.params.encryption_key_choice.name == "BIG"
        else "small",
    )


def decrypt_radix(ck: ShortintClientKey, payload) -> np.ndarray:
    """Radix ciphertext (client or server object) -> clear unsigned values."""
    digits = np.atleast_2d(ck.decrypt(_as_shortint(ck, payload)))
    mm = int(payload.message_modulus)
    nb = digits.shape[-1]
    scale = mm ** np.arange(nb, dtype=object)
    vals = (digits.astype(object) * scale).sum(axis=-1)
    return np.array([int(v) for v in np.atleast_1d(vals)], dtype=np.uint64)


def decrypt_signed_radix(ck: ShortintClientKey, payload) -> np.ndarray:
    mm = int(payload.message_modulus)
    nb = np.asarray(payload.ct).shape[-2]
    bits = int(np.log2(mm)) * nb
    u = decrypt_radix(ck, payload)
    return np.where(
        u >= np.uint64(1 << (bits - 1)),
        u.astype(np.int64) - np.int64(1 << bits),
        u.astype(np.int64),
    )


def serialize_radix(payload) -> bytes:
    """Client radix ciphertext -> the standard ``RadixCiphertext`` envelope
    (readable by the server's safe_deserialize)."""
    return ser.serialize_radix(payload)


def serialize_client_key(ck: ShortintClientKey) -> bytes:
    return ser.serialize_shortint_client_key(ck)


# ---------------------------------------------------------------------------
# compact lists + client-side ZK proving (js_on_wasm_api parity: the
# reference browser client builds CompactCiphertextLists and proves them
# locally — tfhe/src/js_on_wasm_api/js_high_level_api/zk.rs,
# integers.rs ProvenCompactCiphertextList::builder)
# ---------------------------------------------------------------------------

from .shortint.compact_public_key import CompactPrivateKey  # noqa: E402,F401


def generate_compact_keys(cpk_params, seed: int = 0):
    """(CompactPrivateKey, CompactPublicKey) for a
    CompactPublicKeyEncryptionParameters set — pure numpy keygen, the
    analog of ``TfheCompactPublicKey::new`` in the wasm client."""
    from .shortint.compact_public_key import CompactPublicKey as Cpk

    sk = CompactPrivateKey.generate(cpk_params, seed=seed)
    return sk, Cpk.generate(sk)


def _radix_digits(values, num_blocks: int, message_modulus: int) -> np.ndarray:
    vals = np.atleast_1d(np.asarray(values, dtype=np.uint64))
    digits = np.zeros(vals.shape + (num_blocks,), dtype=np.uint64)
    v = vals.copy()
    for b in range(num_blocks):
        digits[..., b] = v % np.uint64(message_modulus)
        v //= np.uint64(message_modulus)
    return digits.reshape(-1)


def build_compact_list(pk, values, num_blocks: int):
    """Radix-decompose clear integers and pack them into ONE
    CompactCiphertextList under the compact public key (the
    CompactCiphertextListBuilder::push/build flow of
    js_high_level_api/integers.rs, without the server stack)."""
    mm = pk.params.message_modulus
    return pk.encrypt(_radix_digits(values, num_blocks, mm))


def build_proven_compact_list(pk, values, num_blocks: int, crs,
                              metadata: bytes = b""):
    """build_compact_list + a ZK proof of encryption correctness per
    shared-mask bin (ProvenCompactCiphertextList::builder ... build_with_
    proof_packed in the wasm client). Proving is pure Python/numpy (with
    the optional native BLS12-446 backend when the C toolchain exists on
    the client) — no JAX, so a thin device can prove locally."""
    from .zk.proven_list import ProvenCompactCiphertextList

    mm = pk.params.message_modulus
    return ProvenCompactCiphertextList.encrypt_and_prove(
        pk, _radix_digits(values, num_blocks, mm), crs, metadata=metadata)


def client_crs(cpk_params, max_bin_messages: int, seed: int = 0,
               scheme: str = "v2"):
    """CRS sized for the parameter set (CompactPkeCrs::from_config).
    ``scheme``: 'v2' (reference default since v0.11) or 'v1'."""
    from .zk import proven_list as pl

    fn = pl.crs_for_params_v2 if scheme == "v2" else pl.crs_for_params
    return fn(cpk_params, max_bin_messages, seed=seed)


def serialize_compact_list(cl) -> bytes:
    return ser.serialize_compact_list(cl)


def serialize_proof(proof) -> bytes:
    return ser.serialize_zk_proof(proof)
