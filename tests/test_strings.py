"""FheAsciiString tests (reference tfhe/src/strings/): clear-fn oracles."""

import numpy as np
import pytest

from tfhe_tpu.integer.radix import ClientKey as IntCk, ServerKey as IntSk
from tfhe_tpu.strings import FheAsciiString, StringClientKey, StringServerKey
from tfhe_tpu.utils.params import PARAM_TEST_TOY as P


@pytest.fixture(scope="module")
def keys():
    ick = IntCk.generate(P, seed=41)
    isk = IntSk.generate(ick)
    return StringClientKey(ick), StringServerKey(isk)


def test_roundtrip(keys):
    ck, _ = keys
    s = ck.encrypt_ascii("Hello", capacity=8)
    assert ck.decrypt_ascii(s) == "Hello"


def test_eq_and_case(keys):
    ck, sk = keys
    a = ck.encrypt_ascii("FhE", capacity=4)
    b = ck.encrypt_ascii("FhE", capacity=4)
    c = ck.encrypt_ascii("fhe", capacity=4)
    assert bool(np.asarray(sk.key.decrypt_bool(ck.inner, sk.eq(a, b))).all())
    assert not bool(np.asarray(sk.key.decrypt_bool(ck.inner, sk.eq(a, c))).any())
    up = sk.to_uppercase(c)
    assert ck.decrypt_ascii(up) == "FHE"
    low = sk.to_lowercase(a)
    assert ck.decrypt_ascii(low) == "fhe"


def test_search(keys):
    ck, sk = keys
    s = ck.encrypt_ascii("abcab", capacity=6)
    dec = lambda blk: bool(np.asarray(sk.key.decrypt_bool(ck.inner, blk)))
    assert dec(sk.contains_clear(s, "ca")) is True
    assert dec(sk.contains_clear(s, "cc")) is False
    assert dec(sk.starts_with_clear(s, "ab")) is True
    assert dec(sk.ends_with_clear(s, "ab")) is True
    assert dec(sk.ends_with_clear(s, "bc")) is False
    idx, found = sk.find_clear(s, "ab")
    assert dec(found) is True
    assert int(ck.inner.decrypt_radix(idx)) == 0
    idx2, found2 = sk.find_clear(s, "ca")
    assert int(ck.inner.decrypt_radix(idx2)) == 2


def test_len(keys):
    ck, sk = keys
    s = ck.encrypt_ascii("abc", capacity=6)
    assert int(ck.inner.decrypt_radix(sk.len(s))) == 3
    e = ck.encrypt_ascii("", capacity=4)
    assert bool(np.asarray(sk.key.decrypt_bool(ck.inner, sk.is_empty(e))))
