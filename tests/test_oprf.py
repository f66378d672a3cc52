"""OPRF tests (shortint/oprf.rs): determinism + statistical uniformity."""

import numpy as np
import pytest

from tfhe_tpu.keycache import get_shortint_keys
from tfhe_tpu.shortint import oprf
from tfhe_tpu.utils.params import PARAM_TEST_TOY as P


@pytest.fixture(scope="module")
def keys():
    return get_shortint_keys(P, seed=61)


def test_xof_deterministic():
    a = oprf.sha3_hash_u64(1234, 8)
    b = oprf.sha3_hash_u64(1234, 8)
    c = oprf.sha3_hash_u64(1235, 8)
    assert np.array_equal(a, b) and not np.array_equal(a, c)


def test_oprf_range_and_determinism(keys):
    ck, sk = keys
    v1 = oprf.generate_oblivious_pseudo_random(sk, seed=7, random_bits_count=2)
    v2 = oprf.generate_oblivious_pseudo_random(sk, seed=7, random_bits_count=2)
    d1 = int(np.asarray(ck.decrypt_message_and_carry(v1)))
    d2 = int(np.asarray(ck.decrypt_message_and_carry(v2)))
    assert d1 == d2  # same seed -> same value
    assert 0 <= d1 < 4


def test_oprf_uniformity(keys):
    ck, sk = keys
    bits = 2
    vals = [
        int(np.asarray(ck.decrypt_message_and_carry(
            oprf.generate_oblivious_pseudo_random(sk, seed=s, random_bits_count=bits)
        )))
        for s in range(48)
    ]
    counts = np.bincount(vals, minlength=1 << bits)
    assert counts.sum() == 48
    # loose uniformity: every bucket hit, none dominating
    assert counts.min() >= 3 and counts.max() <= 24, counts
