"""Signed (balanced) gadget decomposition — vectorized, bit-exact.

Decomposes torus values into ``level_count`` balanced base-2^base_log digits,
MSB-rounded, yielding digits for level ``l`` (level_count) first, matching the
reference's iteration order so digits line up with GGSW level matrices and
keyswitch-key blocks.

Reference semantics reproduced bit-for-bit:
- ``tfhe/src/core_crypto/commons/math/decomposition/decomposer.rs``
  (``init_decomposer_state``, ``balanced_rounding_condition_bit_trick``)
- ``tfhe/src/core_crypto/commons/math/decomposition/iter.rs``
  (``decompose_one_level``, ``decomposition_bit_trick``)

Digit values are signed in [-B/2, B/2]. All state arithmetic is done on the
*signed* integer view (int64) because the reference uses arithmetic shifts on
the two's-complement bit pattern; the bit patterns are identical.
"""

from __future__ import annotations

try:
    import jax.numpy as jnp
except ImportError:  # thin-client (tfhe_tpu.client) environment: numpy-only paths
    jnp = None
import numpy as np


def closest_representable(x: jnp.ndarray, base_log: int, level_count: int) -> jnp.ndarray:
    """Round ``x`` (uint64) to the closest value representable on the
    ``level_count * base_log`` most significant bits.

    Reference: decomposer.rs ``native_closest_representable``.
    """
    bits = 64
    non_rep = bits - level_count * base_log
    if non_rep == 0:
        return x
    shift = non_rep - 1
    x = jnp.asarray(x, jnp.uint64)
    res = x >> jnp.uint64(shift)
    res = res + jnp.uint64(1)
    res = res & (~jnp.uint64(1))
    return res << jnp.uint64(shift)


def init_decomposer_state(x: jnp.ndarray, base_log: int, level_count: int) -> jnp.ndarray:
    """Rounded, balanced initial state (as int64 holding the signed value).

    Reference: decomposer.rs ``init_decomposer_state``.
    """
    bits = 64
    rep = level_count * base_log
    non_rep = bits - rep
    x = jnp.asarray(x, jnp.uint64)
    if non_rep == 0:
        # All bits representable: state is just the value itself; the balance
        # logic below does not apply (reference asserts BITS > b*l, so rep is
        # always < 64 in practice).
        raise ValueError("base_log * level_count must be < 64")
    res = x >> jnp.uint64(non_rep - 1)
    rounding_bit = res & jnp.uint64(1)
    res = res + jnp.uint64(1)
    res = res >> jnp.uint64(1)
    mod_mask = jnp.uint64((1 << rep) - 1)
    res = res & mod_mask
    # need_balance = (res > B/2) || (res == B/2 && rounding_bit == 1), as the
    # bit trick: ((res - 1) | (rounding << (rep-1))) & res) >> (rep - 1)
    shifted_random = rounding_bit << jnp.uint64(rep - 1)
    need_balance = (((res - jnp.uint64(1)) | shifted_random) & res) >> jnp.uint64(rep - 1)
    state = res - (need_balance << jnp.uint64(rep))
    return state.astype(jnp.int64)


def decompose(
    x: jnp.ndarray, base_log: int, level_count: int
) -> jnp.ndarray:
    """Decompose uint64 array ``x`` into signed digits.

    Returns int64 array of shape ``x.shape + (level_count,)`` where index 0
    along the last axis is the *level_count* term (the reference iterator's
    first yield — smallest recomposition factor q/B^l), matching GGSW level
    matrix storage order and KSK block order.
    """
    state = init_decomposer_state(x, base_log, level_count)
    mod_b_mask = jnp.int64((1 << base_log) - 1)
    digits = []
    for _ in range(level_count):
        res = state & mod_b_mask
        state = state >> base_log  # arithmetic shift on int64
        # carry = ((res.wrapping_sub(1) | state) & res) >> (base_log - 1)
        carry = (((res - jnp.int64(1)) | state) & res) >> (base_log - 1)
        state = state + carry
        digits.append(res - (carry << base_log))
    return jnp.stack(digits, axis=-1)


def recompose(digits: jnp.ndarray, base_log: int, level_count: int) -> jnp.ndarray:
    """Sum of digit_i * q / B^level — inverse of :func:`decompose` up to
    closest_representable rounding. Digits axis ordered as produced by
    :func:`decompose` (level ``level_count`` first)."""
    bits = 64
    acc = jnp.zeros(digits.shape[:-1], dtype=jnp.uint64)
    for idx in range(level_count):
        level = level_count - idx
        shift = bits - base_log * level
        term = digits[..., idx].astype(jnp.uint64) << jnp.uint64(shift)
        acc = acc + term
    return acc


# ---------------------------------------------------------------------------
# numpy twins (host-side keygen uses these; identical bit behavior)
# ---------------------------------------------------------------------------

def np_closest_representable(x: np.ndarray, base_log: int, level_count: int) -> np.ndarray:
    non_rep = 64 - level_count * base_log
    if non_rep == 0:
        return x
    shift = non_rep - 1
    x = x.astype(np.uint64)
    res = x >> np.uint64(shift)
    res = res + np.uint64(1)
    res = res & ~np.uint64(1)
    return res << np.uint64(shift)


def recomposition_summand(value_signed: np.ndarray, level: int, base_log: int) -> np.ndarray:
    """DecompositionTerm::to_recomposition_summand — value << (64 - b*level),
    wrapping. Used by key generation (KSK/GGSW plaintexts)."""
    shift = np.uint64(64 - base_log * level)
    return (value_signed.astype(np.int64).astype(np.uint64)) << shift
