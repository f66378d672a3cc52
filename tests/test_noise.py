"""Statistical noise tests: empirical op variance vs the closed-form
formulas (reference core_crypto/algorithms/test/noise_distribution/)."""

import math

import numpy as np
import pytest

from tfhe_tpu.core import noise_formulas as nf
from tfhe_tpu.keycache import get_shortint_keys
from tfhe_tpu.ops import server as so
from tfhe_tpu.utils.params import PARAM_TEST_TOY as P, PARAM_MESSAGE_2_CARRY_2_KS_PBS


def _phase_errors(ct_arr, bits, expected_pt):
    """Signed torus error of each ciphertext vs its expected plaintext."""
    arr = np.asarray(ct_arr, dtype=np.uint64)
    with np.errstate(over="ignore"):
        pts = arr[..., -1] - (arr[..., :-1] * bits).sum(axis=-1).astype(np.uint64)
        err = (pts - expected_pt).astype(np.int64)
    return err.astype(np.float64) / 2.0 ** 64


def test_keyswitch_noise_matches_formula():
    ck, sk = get_shortint_keys(P, seed=55)
    n_samples = 256
    msgs = np.zeros(n_samples, dtype=np.uint64)
    ct = ck.encrypt(msgs)
    import jax

    small = jax.device_get(
        so.keyswitch_mxu(ct.ct, sk.ksk_i8, P.ks_base_log, P.ks_level)
    )
    err = _phase_errors(small, ck.lwe_sk.bits, np.uint64(0))
    emp_var = float(np.var(err))
    pred = nf.keyswitch_additive_variance_exact(
        P.big_lwe_dimension, P.ks_base_log, P.ks_level,
        P.lwe_noise_distribution.std_dev ** 2,
    ) + P.glwe_noise_distribution.std_dev ** 2  # input fresh noise
    ratio = emp_var / pred
    assert 0.5 < ratio < 2.0, (emp_var, pred, ratio)


def test_simulation_engine_and_pfail():
    eng = nf.NoiseSimulationEngine(PARAM_MESSAGE_2_CARRY_2_KS_PBS)
    fresh = eng.encrypt()
    after = eng.atomic_pattern(fresh)
    assert after.lwe_dimension == PARAM_MESSAGE_2_CARRY_2_KS_PBS.big_lwe_dimension
    assert 0 < after.variance < 1e-8
    # sum of two then bootstrap again: noise resets
    s = eng.add(after, after)
    assert s.variance == pytest.approx(2 * after.variance)
    again = eng.atomic_pattern(s)
    assert again.variance == pytest.approx(after.variance)
    # production params must meet their advertised pfail within a couple of
    # orders of magnitude under the gaussian model
    pf = eng.pfail_per_pbs(s)
    # advertised: 2^-128.6 — the gaussian model with centered-mean MS lands
    # within a few orders of magnitude
    assert pf < 2.0 ** -100, math.log2(pf)


def test_fitted_formulas_sane():
    p = PARAM_MESSAGE_2_CARRY_2_KS_PBS
    ks = nf.keyswitch_additive_variance_gaussian(
        p.big_lwe_dimension, p.lwe_dimension, p.ks_base_log, p.ks_level
    )
    pbs = nf.pbs_additive_variance_gaussian(
        p.lwe_dimension, p.glwe_dimension, p.polynomial_size,
        p.pbs_base_log, p.pbs_level,
    )
    assert 0 < ks < 1 and 0 < pbs < 1
    # the exact-NTT blind-rotate bound should not exceed the fft-mul fitted
    # model by orders of magnitude
    exact = nf.blind_rotate_additive_variance_exact(
        p.lwe_dimension, p.glwe_dimension, p.polynomial_size,
        p.pbs_base_log, p.pbs_level, p.glwe_noise_distribution.std_dev ** 2,
    )
    assert exact < pbs * 100
