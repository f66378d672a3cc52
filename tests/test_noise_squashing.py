"""Noise squashing (u128 PBS): limb arithmetic, 128-bit decomposition,
GLWE128 roundtrip, and the full squash pipeline on toy parameters.

Reference semantics: shortint/noise_squashing/, decomposer.rs (widened),
shortint/server_key/mod.rs:1561-1610.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tfhe_tpu.core import squash as sq
from tfhe_tpu.shortint.client_key import ClientKey
from tfhe_tpu.shortint.noise_squashing import (
    NoiseSquashingKey,
    NoiseSquashingPrivateKey,
)
from tfhe_tpu.shortint.server_key import ServerKey
from tfhe_tpu.utils.csprng import EncryptionRandomGenerator
from tfhe_tpu.utils.params import (
    PARAM_TEST_TOY,
    PARAM_TEST_TOY_SQUASH,
    DynamicDistribution,
)

MASK128 = (1 << 128) - 1


def test_mul_u64_wide():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 1 << 64, 100, dtype=np.uint64)
    b = rng.integers(0, 1 << 64, 100, dtype=np.uint64)
    hi, lo = sq.mul_u64_wide(a, b)
    for i in range(100):
        want = int(a[i]) * int(b[i])
        assert (int(hi[i]) << 64 | int(lo[i])) == want


def test_add_sub_neg128():
    rng = np.random.default_rng(1)
    ah = rng.integers(0, 1 << 64, 50, dtype=np.uint64)
    al = rng.integers(0, 1 << 64, 50, dtype=np.uint64)
    bh = rng.integers(0, 1 << 64, 50, dtype=np.uint64)
    bl = rng.integers(0, 1 << 64, 50, dtype=np.uint64)
    with np.errstate(over="ignore"):
        sh, sl = sq.add128(ah, al, bh, bl)
        dh, dl = sq.sub128(ah, al, bh, bl)
    for i in range(50):
        a = int(ah[i]) << 64 | int(al[i])
        b = int(bh[i]) << 64 | int(bl[i])
        assert (int(sh[i]) << 64 | int(sl[i])) == (a + b) & MASK128
        assert (int(dh[i]) << 64 | int(dl[i])) == (a - b) & MASK128


def _oracle_decompose128(x: int, base_log: int, levels: int):
    """Python-int reimplementation of decomposer.rs for 128-bit scalars."""
    rep = base_log * levels
    non_rep = 128 - rep
    res = x >> (non_rep - 1)
    rounding = res & 1
    res = (res + 1) >> 1
    res &= (1 << rep) - 1
    need_balance = (((res - 1) | (rounding << (rep - 1))) & res) >> (rep - 1)
    state = res - (need_balance << rep)
    digits = []
    for _ in range(levels):
        d = state & ((1 << base_log) - 1)
        state >>= base_log
        carry = (((d - 1) | state) & d) >> (base_log - 1) & 1
        state += carry
        digits.append(d - (carry << base_log))
    return digits


@pytest.mark.parametrize("bl,l", [(24, 3), (23, 3), (13, 6)])
def test_decompose128_vs_oracle(bl, l):
    rng = np.random.default_rng(2)
    n = 200
    hi = rng.integers(0, 1 << 64, n, dtype=np.uint64)
    lo = rng.integers(0, 1 << 64, n, dtype=np.uint64)
    # include edge values
    hi[:4] = [0, 0xFFFFFFFFFFFFFFFF, 1 << 63, 0x8000000000000000 - 1]
    lo[:4] = [0, 0xFFFFFFFFFFFFFFFF, 0, 0xFFFFFFFFFFFFFFFF]
    digs = np.asarray(sq.decompose128(jnp.asarray(hi), jnp.asarray(lo), bl, l))
    for i in range(n):
        x = int(hi[i]) << 64 | int(lo[i])
        want = _oracle_decompose128(x, bl, l)
        got = [int(digs[i, j]) for j in range(l)]
        assert got == want, (hex(x), got, want)


def test_glwe128_roundtrip():
    gen = EncryptionRandomGenerator(123, 456)
    k, N = 1, 256
    bits = gen.mask.uniform_binary(k * N).reshape(k, N)
    sk = sq.GlweSecretKey128(bits=bits.astype(np.uint64))
    rng = np.random.default_rng(3)
    pts_hi = rng.integers(0, 1 << 64, (2, N), dtype=np.uint64) & np.uint64(
        0xFFFFFF0000000000
    )
    pts_lo = np.zeros((2, N), dtype=np.uint64)
    noise = DynamicDistribution.t_uniform(3)
    ct_hi, ct_lo = sq.glwe_encrypt128(sk, pts_hi, pts_lo, noise, gen)
    dh, dl = sq.glwe_decrypt128(sk, ct_hi, ct_lo)
    # noise is tiny (2^3) vs plaintext granularity 2^104: top bits must match
    err_h = (dh - pts_hi).astype(np.int64)
    assert np.all(np.abs(err_h) <= 1)  # borrow from lo-limb noise at most


def test_squash_roundtrip_toy():
    ck = ClientKey.generate(PARAM_TEST_TOY, seed=99)
    sk = ServerKey.generate(ck)
    priv = NoiseSquashingPrivateKey.generate(ck, PARAM_TEST_TOY_SQUASH)
    nsk = NoiseSquashingKey.generate(ck, priv)
    msgs = np.array([0, 1, 2, 3], dtype=np.uint64)
    ct = ck.encrypt(msgs)
    squashed = nsk.squash_ciphertext_noise(sk, ct)
    assert squashed.degree == ct.degree
    got = priv.decrypt(squashed)
    assert got == list(msgs), got


def test_squash_preserves_carry_toy():
    ck = ClientKey.generate(PARAM_TEST_TOY, seed=7)
    sk = ServerKey.generate(ck)
    priv = NoiseSquashingPrivateKey.generate(ck, PARAM_TEST_TOY_SQUASH)
    nsk = NoiseSquashingKey.generate(ck, priv)
    a = ck.encrypt(np.array([3, 2], dtype=np.uint64))
    b = ck.encrypt(np.array([3, 3], dtype=np.uint64))
    s = sk.unchecked_add(a, b)  # message+carry value 6, 5
    squashed = nsk.squash_ciphertext_noise(sk, s)
    got = priv.decrypt(squashed)
    assert got == [6, 5], got
