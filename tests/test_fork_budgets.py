"""Fork-budget parity: the reference's static byte budgets, the sequential
rejection gaussian, and parallel-fork == serial keygen equality.

Mirrors the structural tests of the reference's
``commons/generators/encryption/test.rs`` (which has no golden byte
vectors either — it checks fork arithmetic and stream consistency).
"""

import math

import numpy as np
import pytest

from tfhe_tpu.core.algorithms import gen_lwe_secret_key, gen_glwe_secret_key
from tfhe_tpu.utils.csprng import AesCtrGenerator, EncryptionRandomGenerator
from tfhe_tpu.utils.fork_budgets import (
    bsk_fork_config,
    fork,
    gaussian_min_attempts,
    gaussian_torus_u64_reference,
    gen_bootstrap_key_reference_forks,
    ggsw_fork_config,
    ksk_fork_config,
    lwe_list_fork_config,
    noise_bytes_per_element,
    t_uniform_sample_bytes,
)
from tfhe_tpu.utils.params import DynamicDistribution

GAUSS = DynamicDistribution.gaussian_from_std_dev(2.0 ** -25)
TUNI = DynamicDistribution.t_uniform(17)


def test_gaussian_attempt_count_is_58():
    # ceil(-128 / log2(1 - pi/4)) with p_success = pi/4
    assert gaussian_min_attempts() == 58
    assert noise_bytes_per_element(GAUSS) == 16 * 58


def test_t_uniform_bytes():
    # ceil((bound_log2 + 1 + 1) / 8)
    assert t_uniform_sample_bytes(17) == 3
    assert t_uniform_sample_bytes(6) == 1
    assert t_uniform_sample_bytes(14) == 2
    assert noise_bytes_per_element(TUNI) == 3


def test_fork_config_arithmetic():
    n, k, N, l = 16, 2, 64, 3
    cfg = bsk_fork_config(n, k, N, l, GAUSS)
    assert cfg.children_count == n
    assert cfg.mask_bytes_per_child == l * (k + 1) * k * N * 8
    assert cfg.noise_bytes_per_child == l * (k + 1) * N * 928
    row = ggsw_fork_config(k, N, l, GAUSS)
    assert row.children_count == l * (k + 1)
    assert row.mask_bytes_per_child * row.children_count == cfg.mask_bytes_per_child
    assert row.noise_bytes_per_child * row.children_count == cfg.noise_bytes_per_child
    ks = ksk_fork_config(32, 16, 4, TUNI)
    assert ks.mask_bytes_per_child == 4 * 16 * 8
    assert ks.noise_bytes_per_child == 4 * 3
    ll = lwe_list_fork_config(5, 10, GAUSS)
    assert (ll.children_count, ll.mask_bytes_per_child) == (5, 80)


def test_fork_children_are_disjoint_consecutive_and_parent_jumps():
    gen = EncryptionRandomGenerator(seed=7, noise_seed=8)
    serial = EncryptionRandomGenerator(seed=7, noise_seed=8)
    cfg = lwe_list_fork_config(4, 8, GAUSS)
    kids = fork(gen, cfg)
    # concatenated child mask streams == the serial stream
    got = np.concatenate([k.mask.next_bytes(64) for k in kids])
    want = serial.mask.next_bytes(4 * 64)
    np.testing.assert_array_equal(got, want)
    # parent continues exactly after the last child
    np.testing.assert_array_equal(
        gen.mask.next_bytes(16), serial.mask.next_bytes(16)
    )
    # children are bounded: overrunning the budget raises
    with pytest.raises(Exception):
        kids[0].mask.next_bytes(1)


def test_sequential_gaussian_budget_and_stats():
    gen = AesCtrGenerator(seed=123)
    start = gen.table_index
    n = 2000
    std = 2.0 ** -20
    vals = gaussian_torus_u64_reference(gen, n, std)
    consumed = gen.table_index - start
    # rejection: more than the ideal pi/4-success floor, far under budget
    assert consumed >= (n // 2) * 16
    assert consumed < n * 928
    # signed torus values ~ N(0, std * 2^64)
    signed = vals.astype(np.int64).astype(np.float64)
    sigma = std * 2.0 ** 64
    assert abs(signed.mean()) < 5 * sigma / math.sqrt(n)
    assert 0.9 < signed.std() / sigma < 1.1
    # odd count draws a full pair and discards the second element
    g2 = AesCtrGenerator(seed=123)
    odd = gaussian_torus_u64_reference(g2, n - 1, std)
    np.testing.assert_array_equal(odd[: n - 2], vals[: n - 2])


def test_bsk_parallel_forks_equal_serial():
    """Generating children in any order (or any subset elsewhere) gives the
    exact same key as walking them serially — the point of static budgets."""
    lwe_sk = gen_lwe_secret_key(12, AesCtrGenerator(seed=1))
    glwe_sk = gen_glwe_secret_key(1, 32, AesCtrGenerator(seed=2))

    bsk_a = gen_bootstrap_key_reference_forks(
        lwe_sk, glwe_sk, 8, 2, GAUSS, EncryptionRandomGenerator(3, 4)
    )
    bsk_b = gen_bootstrap_key_reference_forks(
        lwe_sk, glwe_sk, 8, 2, GAUSS, EncryptionRandomGenerator(3, 4)
    )
    np.testing.assert_array_equal(bsk_a.data, bsk_b.data)

    # regenerate ONLY child #5 from a fresh generator forked to the same
    # offsets; it must reproduce the same GGSW bytes
    gen = EncryptionRandomGenerator(3, 4)
    k, N = glwe_sk.bits.shape
    cfg = bsk_fork_config(lwe_sk.dim, k, N, 2, GAUSS)
    kids = fork(gen, cfg)
    import tfhe_tpu.utils.fork_budgets as fb
    from tfhe_tpu.core import algorithms as algo

    msgs = algo._ggsw_messages(glwe_sk, lwe_sk.bits, 8, 2)
    rows = fork(kids[5], ggsw_fork_config(k, N, 2, GAUSS))
    mask0 = rows[0].mask.uniform_u64(k * N).reshape(k, N)
    np.testing.assert_array_equal(mask0, bsk_a.data[5, 0, 0, :k])

    # and the key actually works: decrypting row (l, k) of GGSW_i yields
    # msg + small noise
    body_noise = (
        algo.glwe_decrypt(glwe_sk, bsk_a.data[5, 0, 0][None])[0]
        - msgs[5, 0, 0]
    ).astype(np.int64)
    assert np.abs(body_noise).max() < 2 ** 45


def test_shortint_pbs_with_fork_keygen():
    """A server key generated with reference fork order drives a correct
    LUT bootstrap end to end."""
    from tfhe_tpu.shortint.client_key import ClientKey
    from tfhe_tpu.shortint.server_key import ServerKey
    from tfhe_tpu.utils.params import PARAM_TEST_TOY as P

    ck = ClientKey.generate(P, seed=42)
    sk = ServerKey.generate(ck, reference_forks=True)
    ct = ck.encrypt([0, 1, 2, 3])
    lut = sk.generate_lookup_table(lambda x: 3 * x % 4)
    got = [int(x) for x in ck.decrypt(sk.apply_lookup_table(ct, lut))]
    assert got == [0, 3, 2, 1]


def test_decrypts_same_as_batched_keygen_semantics():
    """Fork-order keygen must be interchangeable with the batched keygen:
    same entity layout, valid under the same secret key (values differ —
    different stream consumption order — but both decrypt)."""
    from tfhe_tpu.core import algorithms as algo

    lwe_sk = gen_lwe_secret_key(8, AesCtrGenerator(seed=11))
    glwe_sk = gen_glwe_secret_key(2, 16, AesCtrGenerator(seed=12))
    bsk = gen_bootstrap_key_reference_forks(
        lwe_sk, glwe_sk, 6, 3, GAUSS, EncryptionRandomGenerator(13, 14)
    )
    ref = algo.gen_bootstrap_key(
        lwe_sk, glwe_sk, 6, 3, GAUSS, EncryptionRandomGenerator(13, 14)
    )
    assert bsk.data.shape == ref.data.shape
    msgs = algo._ggsw_messages(glwe_sk, lwe_sk.bits, 6, 3)
    for i in (0, 7):
        for lvl in (0, 2):
            for r in (0, 2):
                noise = (
                    algo.glwe_decrypt(glwe_sk, bsk.data[i, lvl, r][None])[0]
                    - msgs[i, lvl, r]
                ).astype(np.int64)
                assert np.abs(noise).max() < 2 ** 45
