"""The generated parameter universe: coverage + spot value checks.

Spot values are transcribed independently from the reference files cited in
each check, so a generator bug cannot self-validate.
"""

import math

from tfhe_tpu.utils import params as P
from tfhe_tpu.utils.params_registry import RAW_PARAMS, UNIVERSE, all_names


def test_universe_materializes_fully():
    for name in RAW_PARAMS:
        obj = UNIVERSE[name]
        assert obj is not None


def test_reference_alias_list_covered():
    # every public alias exported by the reference's aliases.rs
    aliases = [
        "PARAM_MESSAGE_2_CARRY_2_KS_PBS_GAUSSIAN_2M128",
        "PARAM_MESSAGE_3_CARRY_3_KS_PBS_GAUSSIAN_2M128",
        "PARAM_MESSAGE_2_CARRY_2_KS_PBS_GAUSSIAN_2M64",
        "PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128",
        "PARAM_MESSAGE_2_CARRY_2_KS_PBS",
        "PARAM_MESSAGE_2_CARRY_2",
        "PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M64",
        "PARAM_MESSAGE_2_CARRY_2_KS32_PBS_TUNIFORM_2M128",
        "COMP_PARAM_MESSAGE_2_CARRY_2_KS_PBS_GAUSSIAN_2M128",
        "COMP_PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128",
        "COMP_PARAM_MESSAGE_2_CARRY_2_KS_PBS",
        "COMP_PARAM_MESSAGE_2_CARRY_2",
        "PARAM_PKE_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128",
        "PARAM_KEYSWITCH_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128",
        "PARAM_KEYSWITCH_TO_SMALL_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128",
        "PARAM_KEYSWITCH_TO_BIG_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128",
        "NOISE_SQUASHING_PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128",
        "NOISE_SQUASHING_COMP_PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128",
        "PARAM_GPU_MULTI_BIT_GROUP_4_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128",
        "PARAM_GPU_MULTI_BIT_GROUP_4_MESSAGE_2_CARRY_2_KS_PBS_GAUSSIAN_2M128",
    ]
    for a in aliases:
        assert a in RAW_PARAMS, f"alias {a} missing from universe"
        UNIVERSE[a]


def test_2_2_tuniform_values():
    # v1_1/classic/tuniform/p_fail_2_minus_128/ks_pbs.rs (via v1_4 -> v1_5)
    p = UNIVERSE["PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128"]
    assert isinstance(p, P.ClassicPBSParameters)
    assert p.lwe_dimension == 918
    assert p.glwe_dimension == 1
    assert p.polynomial_size == 2048
    assert p.lwe_noise_distribution.kind == "t_uniform"
    assert p.lwe_noise_distribution.bound_log2 == 45
    assert p.glwe_noise_distribution.bound_log2 == 17
    assert (p.pbs_base_log, p.pbs_level) == (23, 1)
    assert (p.ks_base_log, p.ks_level) == (4, 4)
    assert p.max_noise_level == 5
    assert math.isclose(p.log2_p_fail, -129.581)
    assert (
        p.modulus_switch_type
        == P.ModulusSwitchType.CENTERED_MEAN_NOISE_REDUCTION
    )
    # the bare 2_2 alias resolves to the tuniform set (aliases.rs)
    assert UNIVERSE["PARAM_MESSAGE_2_CARRY_2"] == p.with_name(
        UNIVERSE["PARAM_MESSAGE_2_CARRY_2"].name
    )


def test_2_2_gaussian_values():
    # v1_1/classic/gaussian/p_fail_2_minus_128/ks_pbs.rs
    p = UNIVERSE["PARAM_MESSAGE_2_CARRY_2_KS_PBS_GAUSSIAN_2M128"]
    assert p.lwe_dimension == 866
    assert p.lwe_noise_distribution.kind == "gaussian"
    assert math.isclose(p.lwe_noise_distribution.std_dev, 2.046151696979124e-06)
    assert math.isclose(p.glwe_noise_distribution.std_dev, 2.845267479601915e-15)
    assert (p.ks_base_log, p.ks_level) == (3, 5)


def test_multibit_group4_2_2_values():
    # v1_1/multi_bit/tuniform/p_fail_2_minus_128/ks_pbs.rs:206
    p = UNIVERSE["V1_5_PARAM_MULTI_BIT_GROUP_4_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128"]
    assert isinstance(p, P.MultiBitPBSParameters)
    assert p.lwe_dimension == 920
    assert p.grouping_factor == 4
    assert (p.pbs_base_log, p.pbs_level) == (22, 1)
    assert (p.ks_base_log, p.ks_level) == (3, 5)


def test_noise_squashing_values():
    # v1_5/noise_squashing/p_fail_2_minus_128/mod.rs:8
    p = UNIVERSE["NOISE_SQUASHING_PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128"]
    assert isinstance(p, P.NoiseSquashingParameters)
    assert p.glwe_dimension == 2
    assert p.polynomial_size == 2048
    assert (p.decomp_base_log, p.decomp_level_count) == (24, 3)
    assert p.glwe_noise_distribution.bound_log2 == 30
    assert p.ciphertext_modulus.bits == 128
    assert p.modulus_switch_type == P.ModulusSwitchType.CENTERED_MEAN_NOISE_REDUCTION


def test_ks32_values():
    p = UNIVERSE["PARAM_MESSAGE_2_CARRY_2_KS32_PBS_TUNIFORM_2M128"]
    assert isinstance(p, P.KeySwitch32PBSParameters)
    assert p.post_keyswitch_ciphertext_modulus.bits == 32
    assert p.lwe_dimension == 918


def test_family_counts():
    assert len(all_names("ClassicPBSParameters")) >= 140
    assert len(all_names("MultiBitPBSParameters")) >= 250
    assert len(all_names("MetaParameters")) >= 170
    assert len(RAW_PARAMS) >= 600


def test_params_by_name_falls_through_to_universe():
    # a universe-only name resolves via the lazy registry
    p = P.PARAMS_BY_NAME["PARAM_MESSAGE_2_CARRY_2_KS32_PBS_TUNIFORM_2M128"]
    assert p.lwe_dimension == 918
    assert "PARAM_MESSAGE_2_CARRY_2_KS32_PBS_TUNIFORM_2M128" in P.PARAMS_BY_NAME
    # hand-written constants keep precedence
    assert P.PARAMS_BY_NAME["PARAM_TEST_TOY"] is P.PARAM_TEST_TOY
