"""Drift-technique modulus-switch noise reduction (eprint 2024/1718;
reference core_crypto/algorithms/modulus_switch_noise_reduction.rs).

Covers: candidate selection vs a direct numpy oracle of the reference's
sequential scan (round_error / expectancy / variance / measure semantics,
early exit on the bound, strict-improvement argmin), plaintext preservation
of improve_drift_ms, the registered v1_3 KS32 drift parameter set, and an
end-to-end toy shortint LUT under a drift-selecting parameter set.
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from tfhe_tpu.ops import server as server_ops
from tfhe_tpu.utils.params import (
    ModulusSwitchNoiseReductionParams,
    ModulusSwitchType,
    PARAM_TEST_TOY,
)

rng = np.random.default_rng(0xD21F7)


def _round_error_np(x: np.ndarray, log_modulus: int, torus_bits: int = 64):
    """round(x)-x on the 2^torus_bits torus, signed f64 (reference
    round_error_float, modulus_switch_noise_reduction.rs:21-36)."""
    x = x.astype(np.uint64) & np.uint64((1 << torus_bits) - 1)
    half = np.uint64(1 << (torus_bits - log_modulus - 1))
    with np.errstate(over="ignore"):
        switched = (x + half) >> np.uint64(torus_bits - log_modulus)
        rounded = switched << np.uint64(torus_bits - log_modulus)
    with np.errstate(over="ignore"):
        err_u = (rounded - x).astype(np.uint64)  # wrapping sub mod 2^64
    if torus_bits < 64:
        err_u &= np.uint64((1 << torus_bits) - 1)
        err = err_u.astype(np.int64)
        tb_half = np.int64(1 << (torus_bits - 1))
        err = np.where(err >= tb_half, err - (tb_half << 1), err)
    else:
        err = err_u.astype(np.int64)  # two's-complement reinterpret
    return err.astype(np.float64)


def _oracle_choose(ct, zeros, r_sigma, bound, input_variance, log_modulus,
                   torus_bits=64):
    """Sequential reference scan: per-candidate measure, early exit at the
    first measure <= bound, else strict-improvement argmin."""
    n = ct.shape[-1] - 1
    mod_var = input_variance * 2.0 ** (2 * torus_bits)

    def measure(c):
        err = _round_error_np(c, log_modulus, torus_bits)
        expectancy = err[n] - err[:n].sum() / 2.0
        variance = (err[:n] ** 2).sum() / 4.0
        return abs(expectancy) + np.sqrt(variance + mod_var) * r_sigma

    best_i, best_m = 0, measure(ct)
    if best_m <= bound:
        return 0
    with np.errstate(over="ignore"):
        for z in range(zeros.shape[0]):
            m = measure(ct + zeros[z])
            if m < best_m:
                best_i, best_m = z + 1, m
            if m <= bound:
                return best_i
    return best_i


@pytest.mark.parametrize("torus_bits", [64, 32])
def test_choose_candidate_matches_oracle(torus_bits):
    n, Z, B, log_mod = 24, 37, 16, 8
    lim = 1 << torus_bits if torus_bits < 64 else 1 << 64
    ct = rng.integers(0, lim, size=(B, n + 1), dtype=np.uint64)
    zeros = rng.integers(0, lim, size=(Z, n + 1), dtype=np.uint64)
    r_sigma = 3.5
    input_variance = 2.0 ** (-2 * (torus_bits - 10))
    # a bound around the typical measure so both exit paths are exercised
    mid = 2.0 ** (torus_bits - log_mod - 1) * np.sqrt(n) * 0.9
    for bound in (0.0, mid, np.inf):
        got = np.asarray(server_ops.choose_drift_candidate(
            jnp.asarray(ct), jnp.asarray(zeros), r_sigma, float(bound),
            input_variance, log_mod, torus_bits=torus_bits, chunk=8))
        want = np.array([
            _oracle_choose(ct[b], zeros, r_sigma, bound, input_variance,
                           log_mod, torus_bits) for b in range(B)])
        np.testing.assert_array_equal(got, want, err_msg=f"bound={bound}")


def test_improve_preserves_plaintext_and_helps():
    """Adding the chosen encryption of zero keeps the plaintext and, for a
    tight bound, the post-switch rounding-noise measure never worsens."""
    from tfhe_tpu.core import algorithms as algo
    from tfhe_tpu.utils.csprng import (EncryptionRandomGenerator,
                                       SecretRandomGenerator)

    p = PARAM_TEST_TOY
    gen = EncryptionRandomGenerator(77, 78)
    sk = algo.gen_lwe_secret_key(p.lwe_dimension, SecretRandomGenerator(79))
    pts = rng.integers(0, 4, size=64, dtype=np.uint64) << np.uint64(62)
    ct = np.asarray(algo.lwe_encrypt(sk, pts, p.lwe_noise_distribution, gen))
    zeros = np.asarray(algo.lwe_encrypt(
        sk, np.zeros(32, dtype=np.uint64), p.lwe_noise_distribution, gen))
    log_mod = p.polynomial_size.bit_length()  # log2(2N)

    improved = np.asarray(server_ops.improve_drift_ms(
        jnp.asarray(ct), jnp.asarray(zeros), r_sigma_factor=3.0, bound=0.0,
        input_variance=2.0 ** -50, log_modulus=log_mod))
    # plaintext unchanged (encryptions of zero are additively transparent)
    dec = np.asarray(algo.lwe_decrypt(sk, improved))
    want = np.asarray(algo.lwe_decrypt(sk, ct))
    with np.errstate(over="ignore"):
        err = (dec - want).astype(np.int64)
    assert np.abs(err).max() < (1 << 40)  # noise of one extra zero enc
    # bound=0 forces the full argmin scan: measure(improved) <= measure(ct)
    def batch_measure(c):
        err_f = _round_error_np(c, log_mod)
        exp = err_f[:, -1] - err_f[:, :-1].sum(1) / 2.0
        var = (err_f[:, :-1] ** 2).sum(1) / 4.0
        return np.abs(exp) + np.sqrt(var + 2.0 ** -50 * 2.0 ** 128) * 3.0
    assert (batch_measure(improved) <= batch_measure(ct) + 1e-6).all()


def test_v1_3_drift_params_materialize():
    from tfhe_tpu.utils.params_registry import UNIVERSE

    p = UNIVERSE["V1_3_PARAM_MESSAGE_2_CARRY_2_KS32_PBS_TUNIFORM_2M128"]
    assert (p.modulus_switch_type
            == ModulusSwitchType.DRIFT_TECHNIQUE_NOISE_REDUCTION)
    d = p.modulus_switch_noise_reduction_params
    assert d.modulus_switch_zeros_count == 1449
    assert d.ms_bound == 67108864.0
    assert p.post_keyswitch_ciphertext_modulus.bits == 32


TOY_DRIFT = dataclasses.replace(
    PARAM_TEST_TOY,
    modulus_switch_type=ModulusSwitchType.DRIFT_TECHNIQUE_NOISE_REDUCTION,
    modulus_switch_noise_reduction_params=ModulusSwitchNoiseReductionParams(
        modulus_switch_zeros_count=16,
        ms_bound=2.0 ** 57,
        ms_r_sigma_factor=3.0,
        ms_input_variance=2.0 ** -80,
    ),
    name="PARAM_TEST_TOY_DRIFT",
)


def test_apply_lookup_table_drift():
    """End-to-end shortint LUT under a drift-MS parameter set: the server
    key carries encryptions of zero and the pipeline stays correct."""
    from tfhe_tpu.shortint.client_key import ClientKey
    from tfhe_tpu.shortint.server_key import ServerKey

    ck = ClientKey.generate(TOY_DRIFT, seed=5)
    sk = ServerKey.generate(ck)
    assert sk.ms_zeros is not None
    assert sk.ms_zeros.shape == (16, TOY_DRIFT.lwe_dimension + 1)
    assert isinstance(sk.pbs_bsk, tuple)
    mm = TOY_DRIFT.message_modulus
    lut = sk.generate_lookup_table(lambda x: (3 * x + 2) % mm)
    for m in range(mm):
        ct = ck.encrypt(m)
        out = sk.apply_lookup_table(ct, lut)
        assert int(np.asarray(ck.decrypt(out))) == (3 * m + 2) % mm, m
