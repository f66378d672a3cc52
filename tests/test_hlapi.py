"""HLAPI tests: the reference README example (on toy params) + signed types.

BASELINE config 4: FheUint32 radix ops (mul, shift, min, cast to FheUint8).
"""

import numpy as np
import pytest

from tfhe_tpu.high_level_api import (
    ConfigBuilder, FheBool, FheUint8, FheUint32, FheInt8,
    generate_keys, set_server_key,
)
from tfhe_tpu.utils.params import PARAM_TEST_TOY


@pytest.fixture(scope="module")
def keys():
    config = ConfigBuilder().use_custom_parameters(PARAM_TEST_TOY).with_seed(7).build()
    ck, sk = generate_keys(config)
    set_server_key(sk)
    return ck, sk


def test_readme_example(keys):
    ck, _ = keys
    clear_a, clear_b, clear_c = 1344, 5, 7
    a = FheUint32.encrypt(clear_a, ck)
    b = FheUint32.encrypt(clear_b, ck)
    c = FheUint8.encrypt(clear_c, ck)
    # reference README: shift, mul, min, cast
    shifted = b << 1
    assert shifted.decrypt(ck) == clear_b << 1
    prod = a * b
    assert prod.decrypt(ck) == (clear_a * clear_b) % (1 << 32)
    cast = a.cast_into(FheUint8)
    assert cast.decrypt(ck) == clear_a % 256
    m = cast.min(c)
    assert m.decrypt(ck) == min(clear_a % 256, clear_c)


def test_operators(keys):
    ck, _ = keys
    a = FheUint8.encrypt(200, ck)
    b = FheUint8.encrypt(57, ck)
    assert (a + b).decrypt(ck) == (200 + 57) % 256
    assert (a - b).decrypt(ck) == (200 - 57) % 256
    assert (a + 100).decrypt(ck) == (200 + 100) % 256
    assert (a * 3).decrypt(ck) == (200 * 3) % 256
    assert (a & 0x0F).decrypt(ck) == 200 & 0x0F
    assert (~a).decrypt(ck) == (~200) % 256
    assert (a >> 2).decrypt(ck) == 200 >> 2
    assert a.rotate_left(3).decrypt(ck) == ((200 << 3) | (200 >> 5)) % 256
    assert (a // b).decrypt(ck) == 200 // 57
    assert (a % b).decrypt(ck) == 200 % 57


def test_comparisons_and_select(keys):
    ck, _ = keys
    a = FheUint8.encrypt(13, ck)
    b = FheUint8.encrypt(200, ck)
    lt = a.lt(b)
    assert lt.decrypt(ck) is True
    assert a.ge(b).decrypt(ck) is False
    assert a.lt(100).decrypt(ck) is True
    sel = lt.select(a, b)
    assert sel.decrypt(ck) == 13
    res, ov = b.overflowing_add(b)
    assert res.decrypt(ck) == (400) % 256
    assert ov.decrypt(ck) is True


def test_fhebool_algebra(keys):
    ck, _ = keys
    t = FheBool.encrypt(True, ck)
    f = FheBool.encrypt(False, ck)
    assert (t & f).decrypt(ck) is False
    assert (t | f).decrypt(ck) is True
    assert (t ^ t).decrypt(ck) is False
    assert (~f).decrypt(ck) is True


def _wrap_i8(v: int) -> int:
    return (v + 128) % 256 - 128


def test_signed(keys):
    ck, _ = keys
    a = FheInt8.encrypt(-57, ck)
    b = FheInt8.encrypt(13, ck)
    assert (a + b).decrypt(ck) == -44
    assert (a - b).decrypt(ck) == -70
    assert (a * b).decrypt(ck) == _wrap_i8(-57 * 13)
    assert a.lt(b).decrypt(ck) is True
    assert a.gt(b).decrypt(ck) is False
    assert a.lt(-100).decrypt(ck) is False
    assert a.abs().decrypt(ck) == 57
    assert (a >> 2).decrypt(ck) == -57 >> 2  # arithmetic shift
    assert a.min(b).decrypt(ck) == -57
    q, r = a.div_rem(b)
    assert q.decrypt(ck) == int(-57 / 13)  # trunc toward zero
    assert r.decrypt(ck) == -57 - int(-57 / 13) * 13
    big = a.cast_into(__import__("tfhe_tpu.high_level_api", fromlist=["FheInt16"]).FheInt16)
    assert big.decrypt(ck) == -57


def test_trivial_encrypt(keys):
    ck, _ = keys
    t = FheUint8.encrypt_trivial(42)
    assert t.decrypt(ck) == 42
