"""End-to-end shortint correctness with the v5 Goldilocks transform variant
(TFHE_NTT_VARIANT=v5) — on CPU this exercises the jnp oracle twin of the
Pallas kernel (bit-identical math; the kernel itself is parity-tested in
test_pbs_kernel_g.py and validated on hardware in tools/tpu_prod_tests.py).
"""

import os

import numpy as np
import pytest

from tfhe_tpu.shortint.client_key import ClientKey
from tfhe_tpu.shortint.server_key import ServerKey
from tfhe_tpu.utils.params import PARAM_TEST_TOY


@pytest.fixture
def v5_env(monkeypatch):
    monkeypatch.setenv("TFHE_NTT_VARIANT", "v5")


def test_variant_resolution(v5_env):
    ck = ClientKey.generate(PARAM_TEST_TOY, seed=11)
    sk = ServerKey.generate(ck)
    assert sk.ntt_variant == "v5"
    assert sk.bsk_scan_g.shape == (
        PARAM_TEST_TOY.lwe_dimension, 2,
        PARAM_TEST_TOY.pbs_level * 2, 2,
        PARAM_TEST_TOY.polynomial_size // 128, 128)


def test_apply_lookup_table_v5(v5_env):
    ck = ClientKey.generate(PARAM_TEST_TOY, seed=11)
    sk = ServerKey.generate(ck)
    mm = PARAM_TEST_TOY.message_modulus
    lut = sk.generate_lookup_table(lambda x: (x * x + 1) % mm)
    for m in range(mm):
        ct = ck.encrypt(m)
        out = sk.apply_lookup_table(ct, lut)
        assert int(ck.decrypt(out)) == (m * m + 1) % mm, m


def test_bsk_g_roundtrip_derivation(v5_env):
    """The lazy CRT->standard->Goldilocks derivation must equal the direct
    embedding of the raw standard-domain key."""
    import jax.numpy as jnp

    from tfhe_tpu.core import algorithms as algo
    from tfhe_tpu.ops import goldilocks as gl

    p = PARAM_TEST_TOY
    ck = ClientKey.generate(p, seed=13)
    bsk = algo.gen_bootstrap_key(ck.lwe_sk, ck.glwe_sk, p.pbs_base_log,
                                 p.pbs_level, p.glwe_noise_distribution,
                                 ck._keygen_gen)
    from tfhe_tpu.core.algorithms import bootstrap_key_to_ntt
    from tfhe_tpu.ops.pbs_kernel import bsk_to_scan_layout

    hat = bootstrap_key_to_ntt(bsk, 4)
    sk = ServerKey(params=p, ksk=None, ksk_i8=None,
                   bsk_scan=bsk_to_scan_layout(hat.residues), num_primes=4)
    direct = np.asarray(gl.bootstrap_key_to_goldilocks(np.asarray(bsk.data)))
    derived = np.asarray(sk.bsk_scan_g)
    np.testing.assert_array_equal(derived, direct)


def test_many_lut_v5(v5_env):
    ck = ClientKey.generate(PARAM_TEST_TOY, seed=11)
    sk = ServerKey.generate(ck)
    mm = PARAM_TEST_TOY.message_modulus
    many = sk.generate_many_lookup_table(
        [lambda x: (x + 1) % mm, lambda x: (3 * x) % mm])
    ct = ck.encrypt(2)
    outs = sk.apply_many_lookup_table(ct, many)
    assert int(ck.decrypt(outs[0])) == 3
    assert int(ck.decrypt(outs[1])) == 2  # 6 % 4
