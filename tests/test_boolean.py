"""Boolean gate API tests (reference tfhe/src/boolean/: one PBS per binary
gate, two for mux), on small insecure parameters for CI speed."""

import numpy as np
import pytest

from tfhe_tpu.boolean.keys import ClientKey, ServerKey
from tfhe_tpu.utils.params import BooleanParameters, _G


TEST_PARAMS = BooleanParameters(
    lwe_dimension=32,
    glwe_dimension=2,
    polynomial_size=256,
    lwe_noise_distribution=_G(2.0 ** -40),
    glwe_noise_distribution=_G(2.0 ** -40),
    pbs_base_log=10,
    pbs_level=2,
    ks_base_log=3,
    ks_level=5,
    name="BOOLEAN_TEST_TOY",
)


@pytest.fixture(scope="module")
def keys():
    ck = ClientKey.generate(TEST_PARAMS, seed=3)
    sk = ServerKey.generate(ck)
    return ck, sk


CASES = [(False, False), (False, True), (True, False), (True, True)]


def test_gates(keys):
    ck, sk = keys
    l = ck.encrypt(np.array([a for a, _ in CASES]))
    r = ck.encrypt(np.array([b for _, b in CASES]))
    assert list(ck.decrypt(sk.and_(l, r))) == [a and b for a, b in CASES]
    assert list(ck.decrypt(sk.or_(l, r))) == [a or b for a, b in CASES]
    assert list(ck.decrypt(sk.xor(l, r))) == [a ^ b for a, b in CASES]
    assert list(ck.decrypt(sk.nand(l, r))) == [not (a and b) for a, b in CASES]
    assert list(ck.decrypt(sk.nor(l, r))) == [not (a or b) for a, b in CASES]
    assert list(ck.decrypt(sk.xnor(l, r))) == [not (a ^ b) for a, b in CASES]


def test_not_and_mux(keys):
    ck, sk = keys
    l = ck.encrypt(np.array([a for a, _ in CASES]))
    r = ck.encrypt(np.array([b for _, b in CASES]))
    assert list(ck.decrypt(sk.not_(l))) == [not a for a, _ in CASES]
    c = ck.encrypt(np.array([True, False, True, False]))
    m = sk.mux(c, l, r)
    exp = [la if cc else rb for cc, (la, rb) in zip([True, False, True, False], CASES)]
    assert list(ck.decrypt(m)) == exp


def test_tfhe_lib_parameters_gates():
    """The legacy TFHE-lib parameter set (boolean/parameters/mod.rs:131
    TFHE_LIB_PARAMETERS) generates keys and evaluates gates correctly —
    the last member of the reference's VEC_BOOLEAN_PARAM family."""
    from tfhe_tpu.utils.params import BOOLEAN_TFHE_LIB_PARAMETERS as P

    assert (P.lwe_dimension, P.glwe_dimension, P.polynomial_size) == (
        630, 1, 1024)
    ck = ClientKey.generate(P, seed=11)
    sk = ServerKey.generate(ck)
    l = ck.encrypt(np.array([a for a, _ in CASES]))
    r = ck.encrypt(np.array([b for _, b in CASES]))
    assert list(ck.decrypt(sk.and_(l, r))) == [a and b for a, b in CASES]
    assert list(ck.decrypt(sk.xor(l, r))) == [a ^ b for a, b in CASES]
