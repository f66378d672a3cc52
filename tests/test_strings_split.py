"""Strings: split-iterator family, rfind, repeat, encrypted replace,
eq_ignore_case, encrypted strip — Rust std oracles on toy parameters.

Reference: strings/server_key/pattern/split/{mod,split_iters}.rs, trim.rs
(split_ascii_whitespace), pattern/replace.rs, no_patterns.rs (repeat),
comp.rs (eq_ignore_case).
"""

import numpy as np
import pytest

from tfhe_tpu.integer.radix import ClientKey as IntClientKey
from tfhe_tpu.integer.radix import ServerKey as IntServerKey
from tfhe_tpu.strings.ascii import FheAsciiString, StringClientKey, StringServerKey
from tfhe_tpu.utils.params import PARAM_TEST_TOY


@pytest.fixture(scope="module")
def keys():
    ick = IntClientKey.generate(PARAM_TEST_TOY, seed=34)
    isk = IntServerKey.generate(ick)
    return StringClientKey(ick), StringServerKey(isk), ick


def b(sk, ick, bit):
    return int(np.atleast_1d(sk.key.decrypt_bool(ick, bit))[0])


def drain(it, ck, sk, ick, n):
    """First n (value, is_some) pairs decrypted; stops the list at None."""
    out = []
    for _ in range(n):
        s, some = it.next()
        if not b(sk, ick, some):
            out.append(None)
            break
        out.append(ck.decrypt_ascii(s))
    return out


def test_split_basic(keys):
    ck, sk, ick = keys
    s = ck.encrypt_ascii("a,b,c", 5)
    it = sk.split(s, ck.encrypt_ascii(",", 2))
    assert drain(it, ck, sk, ick, 5) == ["a", "b", "c", None]


def test_split_trailing_and_terminator(keys):
    ck, sk, ick = keys
    s = ck.encrypt_ascii("ab,", 4)
    assert drain(sk.split(s, ","), ck, sk, ick, 4) == ["ab", "", None]
    assert drain(sk.split_terminator(s, ","), ck, sk, ick, 4) == ["ab", None]


def test_rsplit(keys):
    ck, sk, ick = keys
    s = ck.encrypt_ascii("a,b", 3)
    assert drain(sk.rsplit(s, ","), ck, sk, ick, 4) == ["b", "a", None]


def test_splitn(keys):
    ck, sk, ick = keys
    s = ck.encrypt_ascii("a,b,c", 5)
    assert drain(sk.splitn(s, ",", 2), ck, sk, ick, 4) == ["a", "b,c", None]


def test_split_inclusive(keys):
    ck, sk, ick = keys
    s = ck.encrypt_ascii("a,b", 3)
    assert drain(sk.split_inclusive(s, ","), ck, sk, ick, 4) == ["a,", "b", None]


def test_split_empty_pattern(keys):
    ck, sk, ick = keys
    s = ck.encrypt_ascii("ab", 2)
    got = drain(sk.split(s, ""), ck, sk, ick, 6)
    assert got == ["", "a", "b", "", None]


def test_rsplit_terminator(keys):
    ck, sk, ick = keys
    s = ck.encrypt_ascii("a,b,", 4)
    assert drain(sk.rsplit_terminator(s, ","), ck, sk, ick, 4) == ["b", "a", None]


def test_split_once(keys):
    ck, sk, ick = keys
    s = ck.encrypt_ascii("x=y=z", 5)
    lhs, rhs, ok = sk.split_once(s, "=")
    assert b(sk, ick, ok) == 1
    assert ck.decrypt_ascii(lhs) == "x"
    assert ck.decrypt_ascii(rhs) == "y=z"
    lhs, rhs, ok = sk.rsplit_once(s, "=")
    assert b(sk, ick, ok) == 1
    assert ck.decrypt_ascii(lhs) == "x=y"
    assert ck.decrypt_ascii(rhs) == "z"


def test_split_ascii_whitespace(keys):
    ck, sk, ick = keys
    s = ck.encrypt_ascii(" a  bc ", 7)
    it = sk.split_ascii_whitespace(s)
    assert drain(it, ck, sk, ick, 4) == ["a", "bc", None]


def test_rfind(keys):
    ck, sk, ick = keys
    s = ck.encrypt_ascii("abab", 5)
    idx, found = sk.rfind(s, ck.encrypt_ascii("ab", 3))
    assert b(sk, ick, found) == 1
    assert int(np.atleast_1d(ick.decrypt_radix(idx))[0]) == 2
    idx, found = sk.rfind(s, "")
    assert b(sk, ick, found) == 1
    assert int(np.atleast_1d(ick.decrypt_radix(idx))[0]) == 4


def test_eq_ignore_case(keys):
    ck, sk, ick = keys
    a = ck.encrypt_ascii("AbC", 3)
    assert b(sk, ick, sk.eq_ignore_case(a, ck.encrypt_ascii("abc", 3))) == 1
    assert b(sk, ick, sk.eq_ignore_case(a, ck.encrypt_ascii("abd", 3))) == 0


def test_repeat(keys):
    ck, sk, ick = keys
    s = ck.encrypt_ascii("ab", 2)
    assert ck.decrypt_ascii(sk.repeat(s, 3)) == "ababab"
    n = ick.encrypt_radix(np.uint64(2), 4)
    assert ck.decrypt_ascii(sk.repeat(s, n, max_n=3)) == "abab"


def test_replace_encrypted(keys):
    ck, sk, ick = keys
    s = ck.encrypt_ascii("aXbX", 4)
    out = sk.replace(s, ck.encrypt_ascii("X", 2), ck.encrypt_ascii("YZ", 2))
    assert ck.decrypt_ascii(out) == "aYZbYZ"


def test_replacen(keys):
    ck, sk, ick = keys
    s = ck.encrypt_ascii("aXbX", 4)
    out = sk.replacen(s, "X", ck.encrypt_ascii("Y", 1), 1)
    assert ck.decrypt_ascii(out) == "aYbX"


def test_replace_empty_pattern(keys):
    ck, sk, ick = keys
    s = ck.encrypt_ascii("ww", 2)
    out = sk.replace(s, "", ck.encrypt_ascii("a", 1))
    assert ck.decrypt_ascii(out) == "awawa"


def test_strip_encrypted(keys):
    ck, sk, ick = keys
    s = ck.encrypt_ascii("abcd", 4)
    out, ok = sk.strip_prefix(s, ck.encrypt_ascii("ab", 2))
    assert b(sk, ick, ok) == 1
    assert ck.decrypt_ascii(out) == "cd"
    out, ok = sk.strip_suffix(s, ck.encrypt_ascii("cd", 3))
    assert b(sk, ick, ok) == 1
    assert ck.decrypt_ascii(out) == "ab"
    out, ok = sk.strip_suffix(s, ck.encrypt_ascii("xx", 2))
    assert b(sk, ick, ok) == 0
    assert ck.decrypt_ascii(out) == "abcd"
