"""v5 Goldilocks Pallas kernel tests: (hi, lo) pair primitives vs python
ints, and blind-rotation parity (bit-exact) against the jnp oracle
``goldilocks.blind_rotate_goldilocks`` in interpret mode."""

import numpy as np
import pytest

import jax.numpy as jnp

from tfhe_tpu.ops import goldilocks as gl
from tfhe_tpu.ops import pbs_kernel_g as kg

P = gl.P
rng = np.random.default_rng(0xA5A5)


def _pairs(vals):
    v = np.asarray(vals, dtype=np.uint64)
    return (jnp.asarray((v >> np.uint64(32)).astype(np.uint32)),
            jnp.asarray(v.astype(np.uint32)))


def _merge(hi, lo):
    return (np.asarray(hi, dtype=np.uint64) << np.uint64(32)) | np.asarray(
        lo, dtype=np.uint64)


EDGE = np.array([0, 1, P - 1, P, P + 1, (1 << 64) - 1, (1 << 32) - 1,
                 1 << 32, (1 << 63), (1 << 64) - (1 << 32)], dtype=np.uint64)


def _rand_u64(k):
    return rng.integers(0, 1 << 64, size=k, dtype=np.uint64)


def test_pair_add_sub_wrap():
    a = np.concatenate([_rand_u64(400), EDGE, EDGE])
    b = np.concatenate([_rand_u64(400), EDGE, EDGE[::-1].copy()])
    ah, al = _pairs(a)
    bh, bl = _pairs(b)
    add = _merge(*kg._pair_add_wrap(ah, al, bh, bl))
    sub = _merge(*kg._pair_sub_wrap(ah, al, bh, bl))
    neg = _merge(*kg._pair_neg(ah, al))
    for i in range(len(a)):
        x, y = int(a[i]), int(b[i])
        assert int(add[i]) % P == (x + y) % P, (x, y)
        assert int(sub[i]) % P == (x - y) % P, (x, y)
        assert int(neg[i]) % P == (-x) % P, x


def test_canon_pair():
    a = np.concatenate([_rand_u64(200), EDGE])
    out = _merge(*kg._canon_pair(*_pairs(a)))
    for i in range(len(a)):
        assert int(out[i]) == int(a[i]) % P


def test_gmul_pair():
    a = np.concatenate([_rand_u64(300), EDGE])
    w = np.concatenate([_rand_u64(300) % np.uint64(P), EDGE % np.uint64(P)])
    ah, al = _pairs(a)
    w4 = (jnp.asarray((w >> np.uint64(48)).astype(np.uint32)),
          jnp.asarray(((w >> np.uint64(32)) & np.uint64(0xFFFF)).astype(np.uint32)),
          jnp.asarray(((w >> np.uint64(16)) & np.uint64(0xFFFF)).astype(np.uint32)),
          jnp.asarray((w & np.uint64(0xFFFF)).astype(np.uint32)))
    out = _merge(*kg._gmul_pair(ah, al, w4))
    for i in range(len(a)):
        assert int(out[i]) % P == int(a[i]) * int(w[i]) % P, (i,)


@pytest.mark.parametrize("k", [0, 1, 12, 24, 31, 32, 33, 48, 60, 63, 64,
                               65, 72, 84, 95])
def test_gshift_pair(k):
    a = np.concatenate([_rand_u64(100), EDGE])
    out = _merge(*kg._gshift_pair(*_pairs(a), k))
    for i in range(len(a)):
        assert int(out[i]) % P == (int(a[i]) << k) % P, (k, int(a[i]))


def test_fold96():
    w = rng.integers(0, 1 << 32, size=(3, 200), dtype=np.uint64)
    out = _merge(*kg._fold96(jnp.asarray(w[2].astype(np.uint32)),
                             jnp.asarray(w[1].astype(np.uint32)),
                             jnp.asarray(w[0].astype(np.uint32))))
    for i in range(200):
        v = int(w[0][i]) + (int(w[1][i]) << 32) + (int(w[2][i]) << 64)
        assert int(out[i]) % P == v % P


def _toy_inputs(batch=4, n_small=8, seed=3):
    p_n = 256
    levels, R, blog = 1, 2, 23
    r = np.random.default_rng(seed)
    lut = r.integers(0, 1 << 64, size=(batch, R, p_n), dtype=np.uint64)
    mask = r.integers(0, 2 * p_n, size=(batch, n_small), dtype=np.uint64)
    body = r.integers(0, 2 * p_n, size=(batch,), dtype=np.uint64)
    bsk_std = r.integers(0, 1 << 64,
                         size=(n_small, levels, R, R, p_n), dtype=np.uint64)
    bsk_g = gl.bootstrap_key_to_goldilocks(bsk_std)
    return lut, mask, body, bsk_g, blog, levels


def test_blind_rotate_parity_vs_oracle():
    """Kernel (interpret mode) == jnp oracle, bit-exact, random data."""
    lut, mask, body, bsk_g, blog, levels = _toy_inputs()
    want = np.asarray(gl.blind_rotate_goldilocks(
        jnp.asarray(lut), jnp.asarray(mask), jnp.asarray(body), bsk_g,
        blog, levels))
    got = np.asarray(kg.blind_rotate_goldilocks_pallas(
        jnp.asarray(lut), jnp.asarray(mask), jnp.asarray(body), bsk_g,
        blog, levels, batch_tile=2, unroll=2))
    np.testing.assert_array_equal(got, want)


def test_blind_rotate_parity_unroll1():
    lut, mask, body, bsk_g, blog, levels = _toy_inputs(batch=2, n_small=5,
                                                       seed=9)
    want = np.asarray(gl.blind_rotate_goldilocks(
        jnp.asarray(lut), jnp.asarray(mask), jnp.asarray(body), bsk_g,
        blog, levels))
    got = np.asarray(kg.blind_rotate_goldilocks_pallas(
        jnp.asarray(lut), jnp.asarray(mask), jnp.asarray(body), bsk_g,
        blog, levels, batch_tile=2, unroll=1))
    np.testing.assert_array_equal(got, want)
