"""Strings: encrypted-pattern search, lexicographic comparisons, trim,
concat, strip, replace — clear-function oracles on toy parameters.

Reference: strings/server_key/{pattern/,comp.rs,trim.rs,replace.rs,shift.rs}.
"""

import numpy as np
import pytest

from tfhe_tpu.integer.radix import ClientKey as IntClientKey
from tfhe_tpu.integer.radix import ServerKey as IntServerKey
from tfhe_tpu.strings.ascii import FheAsciiString, StringClientKey, StringServerKey
from tfhe_tpu.utils.params import PARAM_TEST_TOY


@pytest.fixture(scope="module")
def keys():
    ick = IntClientKey.generate(PARAM_TEST_TOY, seed=33)
    isk = IntServerKey.generate(ick)
    return StringClientKey(ick), StringServerKey(isk), ick


def b(sk, ick, bit):
    return int(np.atleast_1d(sk.key.decrypt_bool(ick, bit))[0])


def test_encrypted_pattern_contains(keys):
    ck, sk, ick = keys
    s = ck.encrypt_ascii("hello", 6)
    assert b(sk, ick, sk.contains(s, ck.encrypt_ascii("ell", 4))) == 1
    assert b(sk, ick, sk.contains(s, ck.encrypt_ascii("elo", 4))) == 0
    assert b(sk, ick, sk.contains(s, ck.encrypt_ascii("", 2))) == 1


def test_encrypted_starts_ends(keys):
    ck, sk, ick = keys
    s = ck.encrypt_ascii("abc", 4)
    assert b(sk, ick, sk.starts_with(s, ck.encrypt_ascii("ab", 3))) == 1
    assert b(sk, ick, sk.starts_with(s, ck.encrypt_ascii("b", 2))) == 0
    assert b(sk, ick, sk.ends_with(s, ck.encrypt_ascii("bc", 3))) == 1
    assert b(sk, ick, sk.ends_with(s, ck.encrypt_ascii("ab", 3))) == 0


def test_encrypted_find(keys):
    ck, sk, ick = keys
    s = ck.encrypt_ascii("abab", 5)
    idx, found = sk.find(s, ck.encrypt_ascii("ba", 3))
    assert int(np.atleast_1d(ick.decrypt_radix(idx))[0]) == 1
    assert b(sk, ick, found) == 1
    _, nf = sk.find(s, ck.encrypt_ascii("zz", 3))
    assert b(sk, ick, nf) == 0


def test_lexicographic_cmp(keys):
    ck, sk, ick = keys
    pairs = [("abc", "abd"), ("abc", "abc"), ("b", "abc"), ("abc", "ab")]
    for x, y in pairs:
        a = ck.encrypt_ascii(x, 4)
        c = ck.encrypt_ascii(y, 4)
        assert b(sk, ick, sk.lt(a, c)) == int(x < y), (x, y)
        assert b(sk, ick, sk.le(a, c)) == int(x <= y), (x, y)
        assert b(sk, ick, sk.gt(a, c)) == int(x > y), (x, y)
        assert b(sk, ick, sk.ge(a, c)) == int(x >= y), (x, y)


def test_trim(keys):
    ck, sk, ick = keys
    s = ck.encrypt_ascii("  hi ", 6)
    assert ck.decrypt_ascii(sk.trim_end(s)) == "  hi"
    assert ck.decrypt_ascii(sk.trim_start(s)) == "hi "
    assert ck.decrypt_ascii(sk.trim(s)) == "hi"


def test_concat(keys):
    ck, sk, ick = keys
    a = ck.encrypt_ascii("ab", 4)
    c = ck.encrypt_ascii("cd", 3)
    assert ck.decrypt_ascii(sk.concat(a, c)) == "abcd"


def test_strip_prefix_suffix(keys):
    ck, sk, ick = keys
    s = ck.encrypt_ascii("abcd", 5)
    res, stripped = sk.strip_prefix_clear(s, "ab")
    assert ck.decrypt_ascii(res) == "cd"
    assert b(sk, ick, stripped) == 1
    res2, s2 = sk.strip_prefix_clear(s, "xy")
    assert ck.decrypt_ascii(res2) == "abcd"
    assert b(sk, ick, s2) == 0
    res3, s3 = sk.strip_suffix_clear(s, "cd")
    assert ck.decrypt_ascii(res3) == "ab"
    assert b(sk, ick, s3) == 1


def test_replace_equal_length(keys):
    ck, sk, ick = keys
    s = ck.encrypt_ascii("abab", 5)
    out = sk.replace_clear(s, "ab", "xy")
    assert ck.decrypt_ascii(out) == "xyxy"


def test_replace_general_length(keys):
    ck, sk, ick = keys
    s = ck.encrypt_ascii("aba", 4)
    out = sk.replace_clear(s, "b", "bb")
    assert ck.decrypt_ascii(out) == "abba"
    out2 = sk.replace_clear(s, "ab", "z")
    assert ck.decrypt_ascii(out2) == "za"
