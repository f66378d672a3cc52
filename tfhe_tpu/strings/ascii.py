"""Encrypted ASCII strings over the radix integer layer.

Reference: ``tfhe/src/strings/`` (``FheAsciiString``: one radix ciphertext
per character — 7-bit ASCII in 4 radix blocks with 2_2 params — padded with
encrypted nulls to a fixed capacity; server ops in ``strings/server_key/``).

TPU-native twist: the character axis is a *leading batch dimension* of one
radix ciphertext, so every per-character operation (case mapping, per-char
equality...) is a single batched PBS over the whole string.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Optional

import numpy as np

from ..integer.radix import (
    BooleanBlock,
    ClientKey as IntegerClientKey,
    RadixCiphertext,
    ServerKey as IntegerServerKey,
)

CHAR_BLOCKS = 4  # 8-bit chars on 2-bit blocks


@dataclass
class FheAsciiString:
    """chars: RadixCiphertext with leading batch dim = capacity (padded)."""

    chars: RadixCiphertext
    capacity: int

    @property
    def ct(self):
        return self.chars.ct


class StringClientKey:
    """Reference ``strings::ClientKey`` (strings/client_key.rs)."""

    def __init__(self, inner: IntegerClientKey):
        self.inner = inner

    def encrypt_ascii(self, s: str, capacity: Optional[int] = None) -> FheAsciiString:
        if capacity is None:
            capacity = len(s)
        assert len(s) <= capacity
        assert all(0 < ord(c) < 128 for c in s), "strict ASCII, no nulls"
        padded = np.array(
            [ord(c) for c in s] + [0] * (capacity - len(s)), dtype=np.uint64
        )
        return FheAsciiString(
            chars=self.inner.encrypt_radix(padded, CHAR_BLOCKS), capacity=capacity
        )

    def decrypt_ascii(self, s: FheAsciiString) -> str:
        vals = np.asarray(self.inner.decrypt_radix(s.chars)).reshape(-1)
        out = []
        for v in vals:
            if v == 0:
                break
            out.append(chr(int(v) & 0x7F))
        return "".join(out)


class StringServerKey:
    """Reference ``strings::ServerKey`` (strings/server_key/)."""

    def __init__(self, inner: IntegerServerKey):
        self.key = inner

    # -- helpers ------------------------------------------------------------
    def _char_at(self, s: FheAsciiString, i: int) -> RadixCiphertext:
        ct = s.chars
        return ct.with_ct(ct.ct[i])

    def _per_char_eq_scalar_bits(self, s: FheAsciiString, pattern: str, offset: int):
        """AND over pattern chars of (s[offset+k] == pattern[k])."""
        sk = self.key
        bit = None
        for k, pc in enumerate(pattern):
            c = self._char_at(s, offset + k)
            b = sk.scalar_eq(c, ord(pc))
            bit = b if bit is None else sk.boolean_bitand(bit, b)
        return bit

    # -- equality ------------------------------------------------------------
    def eq(self, a: FheAsciiString, b: FheAsciiString) -> BooleanBlock:
        """Padded-buffer equality (strings/server_key/comp.rs)."""
        sk = self.key
        cap = max(a.capacity, b.capacity)
        bit = None
        for i in range(cap):
            ca = self._char_at(a, i) if i < a.capacity else None
            cb = self._char_at(b, i) if i < b.capacity else None
            if ca is None:
                ca = sk._trivial_radix(0, CHAR_BLOCKS, cb)
            if cb is None:
                cb = sk._trivial_radix(0, CHAR_BLOCKS, ca)
            e = sk.eq(ca, cb)
            bit = e if bit is None else sk.boolean_bitand(bit, e)
        return bit

    def ne(self, a: FheAsciiString, b: FheAsciiString) -> BooleanBlock:
        return self.key.boolean_bitnot(self.eq(a, b))

    def eq_clear(self, a: FheAsciiString, s: str) -> BooleanBlock:
        sk = self.key
        bit = None
        for i in range(a.capacity):
            want = ord(s[i]) if i < len(s) else 0
            b = sk.scalar_eq(self._char_at(a, i), want)
            bit = b if bit is None else sk.boolean_bitand(bit, b)
        return bit

    # -- search --------------------------------------------------------------
    def contains_clear(self, s: FheAsciiString, pattern: str) -> BooleanBlock:
        """OR over offsets of per-offset pattern match
        (strings/server_key/contains.rs, clear-pattern path)."""
        sk = self.key
        assert pattern, "empty pattern"
        acc = None
        for off in range(0, s.capacity - len(pattern) + 1):
            m = self._per_char_eq_scalar_bits(s, pattern, off)
            acc = m if acc is None else sk.boolean_bitor(acc, m)
        if acc is None:  # pattern longer than capacity
            z = sk._trivial_radix(0, 1, self._char_at(s, 0))
            return BooleanBlock(ct=z.ct[..., 0, :])
        return acc

    def find_clear(self, s: FheAsciiString, pattern: str):
        """(index, found): first match offset, scanned back-to-front with a
        cmux cascade (strings/server_key/find.rs)."""
        sk = self.key
        nb_idx = CHAR_BLOCKS  # index as an 8-bit radix value
        like = self._char_at(s, 0)
        idx = sk._trivial_radix(0, nb_idx, like)
        found = None
        for off in range(s.capacity - len(pattern), -1, -1):
            m = self._per_char_eq_scalar_bits(s, pattern, off)
            off_ct = sk._trivial_radix(off, nb_idx, like)
            idx = sk.if_then_else(m, off_ct, idx)
            found = m if found is None else sk.boolean_bitor(found, m)
        return idx, found

    def starts_with_clear(self, s: FheAsciiString, pattern: str) -> BooleanBlock:
        return self._per_char_eq_scalar_bits(s, pattern, 0)

    def ends_with_clear(self, s: FheAsciiString, pattern: str) -> BooleanBlock:
        """OR over possible lengths: matches when the pattern sits right
        before the padding boundary."""
        sk = self.key
        acc = None
        for end in range(len(pattern), s.capacity + 1):
            m = self._per_char_eq_scalar_bits(s, pattern, end - len(pattern))
            # boundary: char[end] is NUL (or end == capacity)
            if end < s.capacity:
                m = sk.boolean_bitand(m, sk.scalar_eq(self._char_at(s, end), 0))
            acc = m if acc is None else sk.boolean_bitor(acc, m)
        return acc

    # -- length --------------------------------------------------------------
    def len(self, s: FheAsciiString) -> RadixCiphertext:
        """Number of non-null chars (strings/server_key/mod.rs len): sum of
        is_nonzero bits — one batched PBS + radix sum."""
        sk = self.key
        bits = []
        for i in range(s.capacity):
            nz = sk.scalar_ne(self._char_at(s, i), 0)
            blk = sk._trivial_radix(0, CHAR_BLOCKS, self._char_at(s, 0))
            import jax.numpy as jnp

            ct = blk.ct.at[..., 0, :].set(nz.ct)
            degs = np.zeros(CHAR_BLOCKS, dtype=np.int64)
            degs[0] = 1
            noises = np.zeros(CHAR_BLOCKS, dtype=np.int64)
            noises[0] = 1
            bits.append(blk.with_ct(ct, degrees=degs, noise_levels=noises))
        return sk.sum_ciphertexts(bits)

    def is_empty(self, s: FheAsciiString) -> BooleanBlock:
        return self.key.scalar_eq(self._char_at(s, 0), 0)

    # -- case mapping ----------------------------------------------------------
    def to_uppercase(self, s: FheAsciiString) -> FheAsciiString:
        """Batched over ALL chars at once: cond = 'a' <= c <= 'z';
        out = cond ? c - 32 : c (strings/server_key/up_low_case.rs)."""
        sk = self.key
        chars = s.chars  # batch dim = capacity
        ge_a = sk.scalar_ge(chars, ord("a"))
        le_z = sk.scalar_le(chars, ord("z"))
        cond = sk.boolean_bitand(ge_a, le_z)
        shifted = sk.scalar_sub(chars, 32)
        out = sk.if_then_else(cond, shifted, chars)
        return FheAsciiString(chars=out, capacity=s.capacity)

    def to_lowercase(self, s: FheAsciiString) -> FheAsciiString:
        sk = self.key
        chars = s.chars
        ge_A = sk.scalar_ge(chars, ord("A"))
        le_Z = sk.scalar_le(chars, ord("Z"))
        cond = sk.boolean_bitand(ge_A, le_Z)
        shifted = sk.scalar_add(chars, 32)
        out = sk.if_then_else(cond, shifted, chars)
        return FheAsciiString(chars=out, capacity=s.capacity)

    def concat(self, a: FheAsciiString, b: FheAsciiString) -> FheAsciiString:
        """Concatenation assuming ``a`` fills its capacity exactly is NOT
        required: b is shifted by len(a) via per-position cmux cascade.
        Simplified v1: requires a's clear capacity == its length is NOT
        assumed; cost O(cap_a * cap_b) cmux."""
        raise NotImplementedError(
            "concat with encrypted lengths lands with the slice/shift suite"
        )
