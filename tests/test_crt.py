"""CRT integer tests (integer/server_key/crt_parallel/): blockwise carry-free
arithmetic mod prod(bases)."""

import numpy as np
import pytest

from tfhe_tpu.integer import crt
from tfhe_tpu.integer.radix import ClientKey, ServerKey
from tfhe_tpu.utils.params import PARAM_TEST_TOY as P

MODULI = (3, 4)  # coprime; each basis^2-1 fits the 16-value space
M = 12


@pytest.fixture(scope="module")
def keys():
    ck = ClientKey.generate(P, seed=71)
    sk = ServerKey.generate(ck)
    return ck, crt.CrtServerKey(sk)


def test_roundtrip(keys):
    ck, _ = keys
    vals = np.array([0, 5, 11, 7], dtype=np.uint64)
    ct = crt.encrypt_crt(ck, vals, MODULI)
    assert np.array_equal(crt.decrypt_crt(ck, ct), vals)


def test_arithmetic(keys):
    ck, sk = keys
    a = np.array([5, 11, 3], dtype=np.uint64)
    b = np.array([9, 4, 10], dtype=np.uint64)
    ea = crt.encrypt_crt(ck, a, MODULI)
    eb = crt.encrypt_crt(ck, b, MODULI)
    assert np.array_equal(crt.decrypt_crt(ck, sk.add(ea, eb)), (a + b) % M)
    assert np.array_equal(crt.decrypt_crt(ck, sk.sub(ea, eb)),
                          (a.astype(np.int64) - b.astype(np.int64)) % M)
    assert np.array_equal(crt.decrypt_crt(ck, sk.mul(ea, eb)), (a * b) % M)
    assert np.array_equal(crt.decrypt_crt(ck, sk.neg(ea)), (M - a) % M)
    assert np.array_equal(crt.decrypt_crt(ck, sk.scalar_add(ea, 7)), (a + 7) % M)
    assert np.array_equal(crt.decrypt_crt(ck, sk.scalar_mul(ea, 5)), (a * 5) % M)
