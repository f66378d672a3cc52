"""Radix big integers: vectors of shortint blocks, LSB-first.

Reference: ``tfhe/src/integer/ciphertext/base.rs:23-35`` (RadixCiphertext),
``integer/server_key/radix_parallel/``. TPU-native twist: a radix ciphertext
is ONE device array ``u64[..., num_blocks, dim+1]`` — the block axis is just
another batch axis, so every per-block PBS in an op is a single batched
bootstrap (the analog of the reference's rayon par-iter + CUDA vector PBS).

Per-block degree/noise bookkeeping lives host-side as numpy arrays.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace
from typing import Any, Callable, Optional

import numpy as np

from ..shortint.ciphertext import NOMINAL_NOISE, LookupTable
from ..shortint.client_key import ClientKey as ShortintClientKey
from ..shortint.server_key import ServerKey as ShortintServerKey
from ..utils.params import ClassicPBSParameters


@dataclass
class RadixCiphertext:
    ct: Any  # jnp u64[..., nb, dim+1]
    degrees: np.ndarray  # int64[nb] — max attainable value per block
    noise_levels: np.ndarray  # int64[nb]
    message_modulus: int
    carry_modulus: int

    @property
    def num_blocks(self) -> int:
        return self.ct.shape[-2]

    @property
    def batch_shape(self):
        return self.ct.shape[:-2]

    def with_ct(self, ct, degrees=None, noise_levels=None) -> "RadixCiphertext":
        return replace(
            self,
            ct=ct,
            degrees=self.degrees if degrees is None else np.asarray(degrees),
            noise_levels=(
                self.noise_levels if noise_levels is None else np.asarray(noise_levels)
            ),
        )


@dataclass
class BooleanBlock:
    """An encrypted 0/1 value in a single shortint block (reference
    ``integer/ciphertext/boolean_value.rs``)."""

    ct: Any  # jnp u64[..., dim+1]


class ClientKey:
    """Reference ``integer::ClientKey`` — wraps the shortint client key."""

    def __init__(self, shortint_key: ShortintClientKey):
        self.key = shortint_key

    @classmethod
    def generate(cls, params: ClassicPBSParameters, seed: int = 0) -> "ClientKey":
        return cls(ShortintClientKey.generate(params, seed))

    @property
    def params(self) -> ClassicPBSParameters:
        return self.key.params

    def encrypt_radix(self, values, num_blocks: int) -> RadixCiphertext:
        """Encrypt clear integer(s) into ``num_blocks`` base-mm blocks."""
        import jax.numpy as jnp

        mm = self.params.message_modulus
        vals = np.atleast_1d(np.asarray(values, dtype=np.uint64))
        shape = vals.shape
        blocks = np.zeros(shape + (num_blocks,), dtype=np.uint64)
        v = vals.copy()
        for b in range(num_blocks):
            blocks[..., b] = v % mm
            v //= mm
        ct = self.key.encrypt(blocks.reshape(-1))
        dim = ct.ct.shape[-1]
        arr = ct.ct.reshape(shape + (num_blocks, dim))
        if np.isscalar(values) or np.asarray(values).ndim == 0:
            arr = arr[0]
        return RadixCiphertext(
            ct=arr,
            degrees=np.full(num_blocks, mm - 1, dtype=np.int64),
            noise_levels=np.full(num_blocks, NOMINAL_NOISE, dtype=np.int64),
            message_modulus=mm,
            carry_modulus=self.params.carry_modulus,
        )

    def decrypt_radix(self, ct: RadixCiphertext) -> np.ndarray:
        mm = ct.message_modulus
        nb = ct.num_blocks
        from ..shortint.ciphertext import ShortintCiphertext

        sct = ShortintCiphertext(
            ct=ct.ct,
            degree=int(ct.degrees.max()),
            noise_level=int(ct.noise_levels.max()),
            message_modulus=mm,
            carry_modulus=ct.carry_modulus,
        )
        blocks = np.atleast_1d(self.key.decrypt(sct))  # [..., nb]
        blocks = blocks.reshape(ct.batch_shape + (nb,))
        out = np.zeros(ct.batch_shape, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for b in reversed(range(nb)):
                out = out * np.uint64(mm) + blocks[..., b]
        total_bits = int(math.log2(mm)) * nb
        if total_bits < 64:
            out &= np.uint64((1 << total_bits) - 1)
        return out


class ServerKey:
    """Reference ``integer::ServerKey`` — radix ops over the shortint key.

    Every op keeps carries clean on output ("default" op semantics of the
    reference's *_parallelized ops).
    """

    def __init__(self, shortint_key: ShortintServerKey):
        self.key = shortint_key

    @classmethod
    def generate(cls, client_key: ClientKey) -> "ServerKey":
        return cls(ShortintServerKey.generate(client_key.key))

    @property
    def params(self) -> ClassicPBSParameters:
        return self.key.params

    # -- helpers -------------------------------------------------------------
    def _shortint(self, ct: RadixCiphertext, degrees=None, noises=None):
        from ..shortint.ciphertext import ShortintCiphertext

        return ShortintCiphertext(
            ct=ct.ct,
            degree=int(np.max(degrees if degrees is not None else ct.degrees)),
            noise_level=int(np.max(noises if noises is not None else ct.noise_levels)),
            message_modulus=ct.message_modulus,
            carry_modulus=ct.carry_modulus,
        )

    def _apply_lut_blocks(self, ct: RadixCiphertext, lut: LookupTable, degree: int):
        """One batched PBS over all blocks (and any leading batch dims)."""
        out = self.key.apply_lookup_table(self._shortint(ct), lut)
        nb = ct.num_blocks
        return ct.with_ct(
            out.ct,
            degrees=np.full(nb, degree, dtype=np.int64),
            noise_levels=np.full(nb, NOMINAL_NOISE, dtype=np.int64),
        )

    def _max_clean(self, ct: RadixCiphertext) -> bool:
        return bool(np.all(ct.degrees < ct.message_modulus))

    # -- carry propagation -----------------------------------------------------
    def full_propagate(self, ct: RadixCiphertext) -> RadixCiphertext:
        """Sequential carry propagation: per block, absorb the incoming carry,
        then split into message and carry with two batched-over-batch PBS.
        (The grouped Hillis–Steele prefix-scan version of
        integer/server_key/radix_parallel/add.rs:828-1260 is the optimized
        path — tracked for the perf pass.)
        """
        import jax.numpy as jnp

        mm = self.params.message_modulus
        nb = ct.num_blocks
        msg_lut = self.key.generate_lookup_table(lambda x: x % mm)
        carry_lut = self.key.generate_lookup_table(lambda x: x // mm)

        from ..shortint.ciphertext import ShortintCiphertext

        blocks = ct.ct
        dim = blocks.shape[-1]
        carry = None
        out_blocks = []
        for b in range(nb):
            blk = blocks[..., b, :]
            if carry is not None:
                blk = blk + carry
            deg = int(ct.degrees[b]) + (0 if carry is None else mm - 1)
            s = ShortintCiphertext(
                ct=blk, degree=deg, noise_level=int(ct.noise_levels[b]) + 1,
                message_modulus=mm, carry_modulus=ct.carry_modulus,
            )
            if b < nb - 1:
                carry = self.key.apply_lookup_table(s, carry_lut).ct
            out_blocks.append(self.key.apply_lookup_table(s, msg_lut).ct)
        new = jnp.stack(out_blocks, axis=-2)
        return ct.with_ct(
            new,
            degrees=np.full(nb, mm - 1, dtype=np.int64),
            noise_levels=np.full(nb, NOMINAL_NOISE, dtype=np.int64),
        )

    # -- linear ops -------------------------------------------------------------
    def unchecked_add(self, a: RadixCiphertext, b: RadixCiphertext) -> RadixCiphertext:
        return a.with_ct(
            a.ct + b.ct,
            degrees=a.degrees + b.degrees,
            noise_levels=a.noise_levels + b.noise_levels,
        )

    def add(self, a: RadixCiphertext, b: RadixCiphertext) -> RadixCiphertext:
        mm = self.params.message_modulus
        cm = self.params.carry_modulus
        s = self.unchecked_add(a, b)
        if np.any(s.degrees >= mm * cm) or np.any(
            s.noise_levels > self.params.max_noise_level
        ):
            raise ValueError("add would overflow carry space; propagate first")
        return self.full_propagate(s)

    def unchecked_neg(self, a: RadixCiphertext) -> RadixCiphertext:
        """Per-block negation with degree-correction multiples of mm, plus
        borrow-style correction terms on higher blocks
        (integer/server_key/radix/neg.rs semantics)."""
        import jax.numpy as jnp

        mm = self.params.message_modulus
        delta = self.key.encoding.delta()
        nb = a.num_blocks
        ct = jnp.uint64(0) - a.ct
        degrees = np.zeros(nb, dtype=np.int64)
        carry_in = 0  # the z-correction propagated from the previous block
        for b in range(nb):
            z = int(math.ceil((int(a.degrees[b]) + 1) / mm)) * mm
            corr = (z - carry_in) % (1 << 64)
            ct = ct.at[..., b, -1].add(jnp.uint64((corr * delta) % (1 << 64)))
            degrees[b] = z - carry_in
            carry_in = z // mm
        return a.with_ct(ct, degrees=degrees, noise_levels=a.noise_levels)

    def neg(self, a: RadixCiphertext) -> RadixCiphertext:
        return self.full_propagate(self.unchecked_neg(a))

    def sub(self, a: RadixCiphertext, b: RadixCiphertext) -> RadixCiphertext:
        return self.full_propagate(self.unchecked_add(a, self.unchecked_neg(b)))

    def scalar_add(self, a: RadixCiphertext, scalar: int) -> RadixCiphertext:
        import jax.numpy as jnp

        mm = self.params.message_modulus
        delta = self.key.encoding.delta()
        nb = a.num_blocks
        ct = a.ct
        degrees = a.degrees.copy()
        s = int(scalar)
        for b in range(nb):
            digit = s % mm
            s //= mm
            if digit:
                ct = ct.at[..., b, -1].add(jnp.uint64((digit * delta) % (1 << 64)))
                degrees[b] += digit
        out = a.with_ct(ct, degrees=degrees)
        return self.full_propagate(out)

    # -- bitwise ops (one batched bivariate PBS) -------------------------------
    def _bitwise(self, a, b, f) -> RadixCiphertext:
        mm = self.params.message_modulus
        a = self.full_propagate(a) if not self._max_clean(a) else a
        b = self.full_propagate(b) if not self._max_clean(b) else b
        factor = mm
        import jax.numpy as jnp

        packed = a.ct * jnp.uint64(factor) + b.ct
        s = self._shortint(
            a.with_ct(packed, degrees=a.degrees * factor + b.degrees,
                      noise_levels=a.noise_levels * factor + b.noise_levels)
        )
        lut = self.key.generate_lookup_table(lambda x: f((x // factor) % mm, x % factor))
        out = self.key.apply_lookup_table(s, lut)
        nb = a.num_blocks
        return a.with_ct(
            out.ct,
            degrees=np.full(nb, mm - 1, dtype=np.int64),
            noise_levels=np.full(nb, NOMINAL_NOISE, dtype=np.int64),
        )

    def bitand(self, a, b):
        return self._bitwise(a, b, lambda x, y: x & y)

    def bitor(self, a, b):
        return self._bitwise(a, b, lambda x, y: x | y)

    def bitxor(self, a, b):
        return self._bitwise(a, b, lambda x, y: x ^ y)

    # -- multiplication ---------------------------------------------------------
    def mul(self, a: RadixCiphertext, b: RadixCiphertext) -> RadixCiphertext:
        """Schoolbook block products + radix sums (reference mul.rs:455-640
        computes block products via bivariate PBS then sums the shifted
        partial products). Round-1: sequential sum with propagation."""
        import jax.numpy as jnp

        mm = self.params.message_modulus
        nb = a.num_blocks
        a = self.full_propagate(a) if not self._max_clean(a) else a
        b = self.full_propagate(b) if not self._max_clean(b) else b

        result = None
        for j in range(nb):
            # partial product of a with block j of b, shifted j blocks:
            # low parts: (a_i * b_j) % mm ; high parts: (a_i * b_j) // mm
            bj = b.ct[..., j : j + 1, :]  # [..., 1, dim]
            packed = a.ct * jnp.uint64(mm) + jnp.broadcast_to(bj, a.ct.shape)
            s = self._shortint(
                a.with_ct(packed,
                          degrees=a.degrees * mm + (mm - 1),
                          noise_levels=a.noise_levels * mm + 1)
            )
            low_lut = self.key.generate_lookup_table(
                lambda x: (((x // mm) % mm) * (x % mm)) % mm
            )
            high_lut = self.key.generate_lookup_table(
                lambda x: (((x // mm) % mm) * (x % mm)) // mm
            )
            low = self.key.apply_lookup_table(s, low_lut).ct
            high = self.key.apply_lookup_table(s, high_lut).ct

            zeros_like_block = jnp.zeros_like(a.ct[..., :1, :])
            # shift low by j blocks, high by j+1 blocks, truncate to nb
            def shifted(x, by):
                pads = [zeros_like_block] * by
                parts = pads + [x]
                cat = jnp.concatenate(parts, axis=-2)
                return cat[..., :nb, :]

            pp = shifted(low, j)
            pp_deg = np.zeros(nb, dtype=np.int64)
            pp_deg[j:] = mm - 1
            term = RadixCiphertext(
                ct=pp, degrees=pp_deg,
                noise_levels=np.full(nb, NOMINAL_NOISE, dtype=np.int64),
                message_modulus=mm, carry_modulus=a.carry_modulus,
            )
            if j + 1 < nb:
                pp2 = shifted(high, j + 1)
                pp2_deg = np.zeros(nb, dtype=np.int64)
                pp2_deg[j + 1 :] = mm - 1
                term = self.unchecked_add(
                    term,
                    RadixCiphertext(
                        ct=pp2, degrees=pp2_deg,
                        noise_levels=np.full(nb, NOMINAL_NOISE, dtype=np.int64),
                        message_modulus=mm, carry_modulus=a.carry_modulus,
                    ),
                )
            result = term if result is None else self.unchecked_add(result, term)
            # keep carry space from overflowing
            if np.any(result.degrees + mm - 1 >= mm * a.carry_modulus) or np.any(
                result.noise_levels + 2 > self.params.max_noise_level
            ):
                result = self.full_propagate(result)
        return self.full_propagate(result)

    # -- comparisons -------------------------------------------------------------
    def eq(self, a: RadixCiphertext, b: RadixCiphertext) -> BooleanBlock:
        """Blockwise equality then an AND-reduction tree
        (reference comparison.rs)."""
        import jax.numpy as jnp

        mm = self.params.message_modulus
        diff_is_zero = self._bitwise(a, b, lambda x, y: 1 if x == y else 0)
        # AND-reduce the per-block bits: sum then compare to nb (bits fit the
        # carry space in chunks)
        return self._reduce_all_ones(diff_is_zero)

    def ne(self, a: RadixCiphertext, b: RadixCiphertext) -> BooleanBlock:
        blk = self.eq(a, b)
        import jax.numpy as jnp

        # 1 - bit: negate then add 1
        mm = self.params.message_modulus
        delta = self.key.encoding.delta()
        ct = (jnp.uint64(0) - blk.ct).at[..., -1].add(jnp.uint64(delta))
        from ..shortint.ciphertext import ShortintCiphertext

        s = ShortintCiphertext(ct=ct, degree=1, noise_level=2,
                               message_modulus=mm, carry_modulus=self.params.carry_modulus)
        lut = self.key.generate_lookup_table(lambda x: x % 2)
        return BooleanBlock(ct=self.key.apply_lookup_table(s, lut).ct)

    def _reduce_all_ones(self, bits: RadixCiphertext) -> BooleanBlock:
        """bits: radix ct whose blocks are 0/1; returns enc(1) iff all are 1."""
        import jax.numpy as jnp

        mm = self.params.message_modulus
        cm = self.params.carry_modulus
        max_sum = mm * cm - 1
        nb = bits.num_blocks
        from ..shortint.ciphertext import ShortintCiphertext

        # tree-reduce by summing chunks of size <= max_sum then LUT x == chunk
        cur = bits.ct  # [..., nb, dim]
        counts = np.ones(cur.shape[-2], dtype=np.int64)  # how many 1s each slot needs
        while cur.shape[-2] > 1:
            chunk = min(cur.shape[-2], max_sum)
            # sum up to `chunk` blocks whose degree sum <= max_sum
            take = 1
            tot = counts[0]
            while take < cur.shape[-2] and tot + counts[take] <= max_sum:
                tot += counts[take]
                take += 1
            summed = jnp.sum(cur[..., :take, :], axis=-2)
            need = int(np.sum(counts[:take]))
            s = ShortintCiphertext(ct=summed, degree=need, noise_level=take,
                                   message_modulus=mm, carry_modulus=cm)
            lut = self.key.generate_lookup_table(lambda x, need=need: 1 if x == need else 0)
            bit = self.key.apply_lookup_table(s, lut).ct
            rest = cur[..., take:, :]
            cur = jnp.concatenate([bit[..., None, :], rest], axis=-2)
            counts = np.concatenate([[1], counts[take:]])
        return BooleanBlock(ct=cur[..., 0, :])

    def decrypt_bool(self, client_key: ClientKey, blk: BooleanBlock) -> np.ndarray:
        from ..shortint.ciphertext import ShortintCiphertext

        s = ShortintCiphertext(
            ct=blk.ct, degree=1, noise_level=1,
            message_modulus=self.params.message_modulus,
            carry_modulus=self.params.carry_modulus,
        )
        return client_key.key.decrypt(s).astype(bool)
