"""Signed decomposition tests, mirroring the doc-examples in the reference
``decomposer.rs`` and property tests in ``commons/math/decomposition``."""

import numpy as np
import jax.numpy as jnp

from tfhe_tpu.ops import decomp


def test_closest_representable_reference_value():
    # decomposer.rs doc example (u32 case mapped to u64 by shifting 32):
    # SignedDecomposer::<u32>::new(4, 3).closest_representable(1_340_987_234)
    #   == 1_341_128_704
    val_u32 = 1_340_987_234
    got = decomp.closest_representable(
        jnp.asarray(np.uint64(val_u32) << np.uint64(32)), 4, 3
    )
    assert int(got) >> 32 == 1_341_128_704


def test_decompose_recompose_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 2**64, size=1000, dtype=np.uint64)
    for base_log, levels in [(23, 1), (3, 5), (4, 3), (15, 2), (10, 2)]:
        d = decomp.decompose(jnp.asarray(x), base_log, levels)
        # digits are balanced: |digit| <= B/2
        half = 1 << (base_log - 1)
        assert int(jnp.max(jnp.abs(d))) <= half
        rec = decomp.recompose(d, base_log, levels)
        expected = decomp.closest_representable(jnp.asarray(x), base_log, levels)
        np.testing.assert_array_equal(np.asarray(rec), np.asarray(expected))


def test_decompose_term_order_is_level_count_first():
    # first digit along the last axis must be the level=level_count term,
    # i.e. recomposition factor q/B^l (smallest) — check on a single-digit
    # value: x = q/B^l exactly -> digit vector [1, 0, ..., 0]
    base_log, levels = 4, 3
    x = jnp.asarray(np.uint64(1) << np.uint64(64 - base_log * levels))
    d = decomp.decompose(x, base_log, levels)
    np.testing.assert_array_equal(np.asarray(d), [1, 0, 0])


def test_decompose_balanced_tie():
    # 2^31-1-like case from decomposer.rs doc: terms stay within +-B/2
    base_log, levels = 4, 3
    x = jnp.asarray(np.uint64(0x7FFFFFFF) << np.uint64(32))
    d = decomp.decompose(x, base_log, levels)
    half = 1 << (base_log - 1)
    assert int(jnp.max(jnp.abs(d))) <= half
