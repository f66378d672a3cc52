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

    # -- character-axis shifts (the splice primitive) -------------------------
    def _shift_chars_right(self, s: FheAsciiString, amount: RadixCiphertext,
                           out_capacity: Optional[int] = None) -> FheAsciiString:
        """Move every char ``amount`` positions toward higher indices
        (encrypted amount), filling with nulls — the barrel shifter of
        strings/server_key/shift.rs, one cmux round per amount bit."""
        sk = self.key
        cap = out_capacity or s.capacity
        cur = self._resize(s, cap)
        max_bits = max(1, (cap).bit_length())
        for kbit in range(max_bits):
            blk_idx, bit_idx = divmod(kbit, sk._bits_per_block())
            if blk_idx >= amount.num_blocks:
                break
            bit_lut = sk._lut(lambda x, b=bit_idx: (x >> b) & 1, degree=1)
            bit = sk._pbs_blocks(
                amount.ct[..., blk_idx : blk_idx + 1, :],
                int(amount.degrees[blk_idx]),
                int(amount.noise_levels[blk_idx]),
                bit_lut,
            )
            cond = BooleanBlock(ct=bit[..., 0, :])
            shifted = self._static_shift_chars(cur, 1 << kbit)
            picked = sk.if_then_else(cond, shifted.chars, cur.chars)
            cur = FheAsciiString(chars=picked, capacity=cap)
        return cur

    def _static_shift_chars(self, s: FheAsciiString, by: int) -> FheAsciiString:
        """Chars moved ``by`` positions toward higher indices (clear
        amount); trivial nulls shifted in."""
        import jax.numpy as jnp

        sk = self.key
        ct = s.chars.ct
        if by >= s.capacity:
            zeros = jnp.zeros_like(ct)
            return FheAsciiString(
                chars=s.chars.with_ct(
                    zeros,
                    degrees=np.zeros_like(s.chars.degrees),
                    noise_levels=np.zeros_like(s.chars.noise_levels),
                ),
                capacity=s.capacity,
            )
        zeros = jnp.zeros_like(ct[:by])
        out = jnp.concatenate([zeros, ct[: s.capacity - by]], axis=0)
        return FheAsciiString(chars=s.chars.with_ct(out), capacity=s.capacity)

    def _resize(self, s: FheAsciiString, cap: int) -> FheAsciiString:
        import jax.numpy as jnp

        if cap == s.capacity:
            return s
        if cap < s.capacity:
            return FheAsciiString(
                chars=s.chars.with_ct(s.chars.ct[:cap]), capacity=cap
            )
        pad = jnp.zeros((cap - s.capacity,) + s.chars.ct.shape[1:], jnp.uint64)
        return FheAsciiString(
            chars=s.chars.with_ct(jnp.concatenate([s.chars.ct, pad], 0)),
            capacity=cap,
        )

    def concat(self, a: FheAsciiString, b: FheAsciiString) -> FheAsciiString:
        """a + b: shift b right by len(a) into a combined buffer and OR the
        two (nulls are zero, so add is exact — strings/server_key/concat)."""
        sk = self.key
        cap = a.capacity + b.capacity
        la = self.len(a)
        a_ext = self._resize(a, cap)
        b_ext = self._resize(b, cap)
        b_shifted = self._shift_chars_right(b_ext, la)
        merged = sk.add_parallelized(a_ext.chars, b_shifted.chars)
        return FheAsciiString(chars=merged, capacity=cap)

    def _shift_chars_left(self, s: FheAsciiString, amount: RadixCiphertext) -> FheAsciiString:
        """Chars moved toward LOWER indices by an encrypted amount."""
        import jax.numpy as jnp

        sk = self.key
        cap = s.capacity
        cur = s
        max_bits = max(1, cap.bit_length())
        for kbit in range(max_bits):
            blk_idx, bit_idx = divmod(kbit, sk._bits_per_block())
            if blk_idx >= amount.num_blocks:
                break
            bit_lut = sk._lut(lambda x, b=bit_idx: (x >> b) & 1, degree=1)
            bit = sk._pbs_blocks(
                amount.ct[..., blk_idx : blk_idx + 1, :],
                int(amount.degrees[blk_idx]),
                int(amount.noise_levels[blk_idx]),
                bit_lut,
            )
            cond = BooleanBlock(ct=bit[..., 0, :])
            by = 1 << kbit
            if by >= cap:
                shifted_ct = jnp.zeros_like(cur.chars.ct)
                shifted = FheAsciiString(
                    chars=cur.chars.with_ct(
                        shifted_ct,
                        degrees=np.zeros_like(cur.chars.degrees),
                        noise_levels=np.zeros_like(cur.chars.noise_levels),
                    ),
                    capacity=cap,
                )
            else:
                zeros = jnp.zeros_like(cur.chars.ct[:by])
                out = jnp.concatenate([cur.chars.ct[by:], zeros], axis=0)
                shifted = FheAsciiString(chars=cur.chars.with_ct(out), capacity=cap)
            picked = sk.if_then_else(cond, shifted.chars, cur.chars)
            cur = FheAsciiString(chars=picked, capacity=cap)
        return cur

    # -- encrypted-pattern search (strings/server_key/pattern/) ---------------
    def _char_or_null(self, s: FheAsciiString, i: int) -> RadixCiphertext:
        if i < s.capacity:
            return self._char_at(s, i)
        return self.key._trivial_radix(0, CHAR_BLOCKS, self._char_at(s, 0))

    def _match_at(self, s: FheAsciiString, p: FheAsciiString, off: int) -> BooleanBlock:
        """AND over pattern positions of (p_k == NUL) OR (s_{off+k} == p_k):
        the padded-pattern match predicate (pattern/contains.rs)."""
        sk = self.key
        bit = None
        for k in range(p.capacity):
            pk = self._char_at(p, k)
            sc = self._char_or_null(s, off + k)
            eq = sk.eq(sc, pk)
            is_null = sk.scalar_eq(pk, 0)
            ok = sk.boolean_bitor(eq, is_null)
            bit = ok if bit is None else sk.boolean_bitand(bit, ok)
        return bit

    def contains(self, s: FheAsciiString, p: FheAsciiString) -> BooleanBlock:
        """Encrypted-pattern containment: OR over every offset."""
        sk = self.key
        acc = None
        for off in range(s.capacity + 1):
            m = self._match_at(s, p, off)
            acc = m if acc is None else sk.boolean_bitor(acc, m)
        return acc

    def starts_with(self, s: FheAsciiString, p: FheAsciiString) -> BooleanBlock:
        return self._match_at(s, p, 0)

    def ends_with(self, s: FheAsciiString, p: FheAsciiString) -> BooleanBlock:
        """OR over offsets of exact-suffix alignment: all P chars (nulls
        included) equal s at the offset — padded-null semantics make the
        boundary check implicit; when the pattern could fill its whole
        buffer the char after the window must be NUL."""
        sk = self.key
        acc = None
        for off in range(s.capacity + 1):
            bit = None
            for k in range(p.capacity):
                pk = self._char_at(p, k)
                sc = self._char_or_null(s, off + k)
                e = sk.eq(sc, pk)
                bit = e if bit is None else sk.boolean_bitand(bit, e)
            after = self._char_or_null(s, off + p.capacity)
            bit = sk.boolean_bitand(bit, sk.scalar_eq(after, 0))
            # a match at `off` must not start inside padding unless the
            # pattern is empty: s_off == NUL forces p_0 == NUL
            acc = bit if acc is None else sk.boolean_bitor(acc, bit)
        return acc

    def find(self, s: FheAsciiString, p: FheAsciiString):
        """(index, found) for an encrypted pattern — back-to-front cmux."""
        sk = self.key
        like = self._char_at(s, 0)
        idx = sk._trivial_radix(0, CHAR_BLOCKS, like)
        found = None
        for off in range(s.capacity, -1, -1):
            m = self._match_at(s, p, off)
            off_ct = sk._trivial_radix(off, CHAR_BLOCKS, like)
            idx = sk.if_then_else(m, off_ct, idx)
            found = m if found is None else sk.boolean_bitor(found, m)
        return idx, found

    # -- lexicographic comparisons (strings/server_key/comp.rs) ---------------
    def _cmp_chain(self, a: FheAsciiString, b: FheAsciiString):
        """Returns (lt, eq) BooleanBlocks by folding from the LAST position:
        lt = (a_i < b_i) | (a_i == b_i & lt_rest)."""
        sk = self.key
        cap = max(a.capacity, b.capacity)
        lt = None
        for i in range(cap - 1, -1, -1):
            ca = self._char_or_null(a, i)
            cb = self._char_or_null(b, i)
            l = sk.lt(ca, cb)
            e = sk.eq(ca, cb)
            if lt is None:
                lt = l
                eq = e
            else:
                lt = sk.boolean_bitor(l, sk.boolean_bitand(e, lt))
                eq = sk.boolean_bitand(e, eq)
        return lt, eq

    def lt(self, a: FheAsciiString, b: FheAsciiString) -> BooleanBlock:
        return self._cmp_chain(a, b)[0]

    def le(self, a: FheAsciiString, b: FheAsciiString) -> BooleanBlock:
        lt, eq = self._cmp_chain(a, b)
        return self.key.boolean_bitor(lt, eq)

    def gt(self, a: FheAsciiString, b: FheAsciiString) -> BooleanBlock:
        return self.key.boolean_bitnot(self.le(a, b))

    def ge(self, a: FheAsciiString, b: FheAsciiString) -> BooleanBlock:
        return self.key.boolean_bitnot(self.lt(a, b))

    # -- trim (strings/server_key/trim.rs) ------------------------------------
    def _is_whitespace(self, c: RadixCiphertext) -> BooleanBlock:
        """ASCII whitespace: space, \\t, \\n, \\v, \\f, \\r."""
        sk = self.key
        sp = sk.scalar_eq(c, 32)
        tab_cr = sk.boolean_bitand(sk.scalar_ge(c, 9), sk.scalar_le(c, 13))
        return sk.boolean_bitor(sp, tab_cr)

    def trim_end(self, s: FheAsciiString) -> FheAsciiString:
        """Clear trailing whitespace: scanning from the end, a char is
        erased while every char after it is erased-or-null and it is
        whitespace."""
        import jax.numpy as jnp

        sk = self.key
        erase = None  # so far, suffix is only whitespace/null
        out_blocks = []
        cond_list = [None] * s.capacity
        for i in range(s.capacity - 1, -1, -1):
            c = self._char_at(s, i)
            ws = self._is_whitespace(c)
            nul = sk.scalar_eq(c, 0)
            removable = sk.boolean_bitor(ws, nul)
            erase = removable if erase is None else sk.boolean_bitand(
                erase, removable
            )
            cond_list[i] = erase
        zero = sk._trivial_radix(0, CHAR_BLOCKS, self._char_at(s, 0))
        outs = []
        for i in range(s.capacity):
            c = self._char_at(s, i)
            outs.append(sk.if_then_else(cond_list[i], zero, c))
        ct = jnp.stack([o.ct for o in outs], axis=0)
        return FheAsciiString(
            chars=s.chars.with_ct(
                ct,
                degrees=outs[0].degrees,
                noise_levels=outs[0].noise_levels,
            ),
            capacity=s.capacity,
        )

    def trim_start(self, s: FheAsciiString) -> FheAsciiString:
        """Erase leading whitespace then compact left by the erased count."""
        sk = self.key
        # leading-whitespace prefix mask + count
        prefix = None
        bits = []
        for i in range(s.capacity):
            ws = self._is_whitespace(self._char_at(s, i))
            prefix = ws if prefix is None else sk.boolean_bitand(prefix, ws)
            bits.append(prefix)
        count = sk._sum_bool_bits(bits, self._char_at(s, 0))
        count = sk.cast_to_num_blocks(count, CHAR_BLOCKS)
        return self._shift_chars_left(s, count)

    def trim(self, s: FheAsciiString) -> FheAsciiString:
        return self.trim_start(self.trim_end(s))

    # -- splice / replace ------------------------------------------------------
    def strip_prefix_clear(self, s: FheAsciiString, prefix: str):
        """(result, stripped): when s starts with the clear prefix, shift it
        off; otherwise unchanged (pattern/strip.rs)."""
        sk = self.key
        m = self.starts_with_clear(s, prefix)
        n = sk._trivial_radix(len(prefix), CHAR_BLOCKS, self._char_at(s, 0))
        zero = sk._trivial_radix(0, CHAR_BLOCKS, self._char_at(s, 0))
        amt_ct = sk.if_then_else(m, n, zero)
        return self._shift_chars_left(s, amt_ct), m

    def strip_suffix_clear(self, s: FheAsciiString, suffix: str):
        """(result, stripped): erase the clear suffix when it terminates s."""
        import jax.numpy as jnp

        sk = self.key
        L = len(suffix)
        acc_bits = []
        for off in range(s.capacity - L + 1):
            m = self._per_char_eq_scalar_bits(s, suffix, off)
            after = self._char_or_null(s, off + L)
            m = sk.boolean_bitand(m, sk.scalar_eq(after, 0))
            if off > 0:
                m = sk.boolean_bitand(
                    m, sk.scalar_ne(self._char_at(s, off), 0)
                )
            acc_bits.append((off, m))
        stripped = None
        zero = sk._trivial_radix(0, CHAR_BLOCKS, self._char_at(s, 0))
        outs = [self._char_at(s, i) for i in range(s.capacity)]
        for off, m in acc_bits:
            for k in range(L):
                if off + k < s.capacity:
                    outs[off + k] = sk.if_then_else(m, zero, outs[off + k])
            stripped = m if stripped is None else sk.boolean_bitor(stripped, m)
        ct = jnp.stack([o.ct for o in outs], axis=0)
        res = FheAsciiString(
            chars=s.chars.with_ct(
                ct, degrees=outs[0].degrees, noise_levels=outs[0].noise_levels
            ),
            capacity=s.capacity,
        )
        return res, stripped

    def replace_clear(self, s: FheAsciiString, frm: str, to: str) -> FheAsciiString:
        """Replace every non-overlapping occurrence of a clear pattern with a
        clear replacement (strings/server_key/replace.rs). General lengths:
        the output is rebuilt position-by-position with encrypted write
        indices; output capacity grows by the worst-case expansion."""
        import jax.numpy as jnp

        sk = self.key
        assert frm, "empty pattern"
        cap = s.capacity
        n_matches_max = cap // len(frm)
        out_cap = cap + max(0, (len(to) - len(frm))) * n_matches_max

        # 1. non-overlapping match bits, scanned left to right: a match at
        # `off` is suppressed when any match covers it already
        match = {}
        covered = [None] * cap  # covered[i] -> bit: position i inside a match
        for off in range(0, cap - len(frm) + 1):
            m = self._per_char_eq_scalar_bits(s, frm, off)
            # suppress overlaps: not covered by an earlier match
            if covered[off] is not None:
                m = sk.boolean_bitand(m, sk.boolean_bitnot(covered[off]))
            match[off] = m
            for k in range(len(frm)):
                i = off + k
                if i < cap:
                    covered[i] = (
                        m if covered[i] is None else sk.boolean_bitor(covered[i], m)
                    )

        # 2. write-index per source position: w_i = i + (len(to) - len(frm))
        # * (#matches strictly before i, counting a match at off as before
        # positions > off). delta per match position handled by building the
        # output with per-position cmux over candidate sources. For equal
        # lengths this collapses to in-place substitution.
        if len(to) == len(frm):
            outs = [self._char_at(s, i) for i in range(cap)]
            for off, m in match.items():
                for k, ch in enumerate(to):
                    i = off + k
                    rc = sk._trivial_radix(ord(ch), CHAR_BLOCKS, outs[0])
                    outs[i] = sk.if_then_else(m, rc, outs[i])
            ct = jnp.stack([o.ct for o in outs], axis=0)
            return FheAsciiString(
                chars=s.chars.with_ct(
                    ct, degrees=outs[0].degrees, noise_levels=outs[0].noise_levels
                ),
                capacity=cap,
            )

        # General lengths: sequential rebuild via concat of segments.
        # Walk the string once; at each offset either copy one char or (on a
        # match) append `to` and skip len(frm) chars — realized with an
        # encrypted shift-accumulator per step.
        result = self.encrypt_trivial("", out_cap)
        pos_like = self._char_at(s, 0)
        write_pos = sk._trivial_radix(0, CHAR_BLOCKS, pos_like)
        read_skip = [None] * cap  # bit: this source char is consumed by a match
        for off, m in match.items():
            for k in range(len(frm)):
                i = off + k
                read_skip[i] = (
                    m if read_skip[i] is None else sk.boolean_bitor(read_skip[i], m)
                )
        for i in range(cap):
            # chars written at this step: `to` when a match starts here,
            # else the source char when not consumed
            m = match.get(i)
            consumed = read_skip[i]
            # write the source char (unless consumed)
            c = self._char_at(s, i)
            zero = sk._trivial_radix(0, CHAR_BLOCKS, pos_like)
            keep = (
                sk.if_then_else(sk.boolean_bitnot(consumed), c, zero)
                if consumed is not None
                else c
            )
            result = self._scatter_char(result, write_pos, keep)
            one_if_kept = (
                sk.if_then_else(
                    sk.boolean_bitnot(consumed),
                    sk._trivial_radix(1, CHAR_BLOCKS, pos_like),
                    sk._trivial_radix(0, CHAR_BLOCKS, pos_like),
                )
                if consumed is not None
                else sk._trivial_radix(1, CHAR_BLOCKS, pos_like)
            )
            if m is not None:
                # on a match starting here, write `to` at write_pos..+len(to)
                for k, ch in enumerate(to):
                    rc = sk._trivial_radix(ord(ch), CHAR_BLOCKS, pos_like)
                    sel = sk.if_then_else(m, rc, zero)
                    wp = sk.scalar_add(write_pos, k)
                    result = self._scatter_char(result, wp, sel)
                adv_m = sk._trivial_radix(len(to), CHAR_BLOCKS, pos_like)
                advance = sk.if_then_else(m, adv_m, one_if_kept)
            else:
                advance = one_if_kept
            write_pos = sk.add_parallelized(write_pos, advance)
        return result

    def _scatter_char(self, s: FheAsciiString, pos: RadixCiphertext,
                      c: RadixCiphertext) -> FheAsciiString:
        """result[pos] += c (encrypted position): adds c at every index
        gated by an index-equality bit — O(capacity) cmux."""
        import jax.numpy as jnp

        sk = self.key
        outs = []
        for j in range(s.capacity):
            here = sk.scalar_eq(pos, j)
            cur = self._char_at(s, j)
            cand = sk.add_parallelized(cur, c)
            outs.append(sk.if_then_else(here, cand, cur))
        ct = jnp.stack([o.ct for o in outs], axis=0)
        return FheAsciiString(
            chars=s.chars.with_ct(
                ct, degrees=outs[0].degrees, noise_levels=outs[0].noise_levels
            ),
            capacity=s.capacity,
        )

    def encrypt_trivial(self, text: str, capacity: int) -> FheAsciiString:
        """Trivial (noiseless) encryption of a clear string — server-side
        constant (strings/server_key trivial encryptions)."""
        import jax.numpy as jnp

        sk = self.key
        from ..integer.radix import RadixCiphertext

        mm = sk.params.message_modulus
        delta = sk.key.encoding.delta()
        data = np.zeros((capacity, CHAR_BLOCKS, sk.params.big_lwe_dimension + 1),
                        dtype=np.uint64)
        degs = np.zeros(CHAR_BLOCKS, dtype=np.int64)
        for i, ch in enumerate(text[:capacity]):
            v = ord(ch)
            for b in range(CHAR_BLOCKS):
                digit = (v // (mm ** b)) % mm
                data[i, b, -1] = (digit * delta) % (1 << 64)
        degs[:] = mm - 1
        ct = RadixCiphertext(
            ct=jnp.asarray(data),
            degrees=degs,
            noise_levels=np.zeros(CHAR_BLOCKS, dtype=np.int64),
            message_modulus=mm,
            carry_modulus=sk.params.carry_modulus,
        )
        return FheAsciiString(chars=ct, capacity=capacity)
