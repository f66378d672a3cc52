"""Atomic pattern variants: PBS->KS ordering (small-key ciphertexts) and
KS32 (u32 post-keyswitch modulus).

Reference: shortint/atomic_pattern/standard.rs:155-190 (both orders),
shortint/atomic_pattern/ks32.rs, lwe_keyswitch.rs:331 (scalar change).
"""

import numpy as np
import pytest

from tfhe_tpu.shortint.client_key import ClientKey
from tfhe_tpu.shortint.server_key import ServerKey
from tfhe_tpu.utils.params import (
    PARAM_TEST_TOY_KS32,
    PARAM_TEST_TOY_PBS_KS,
)


def test_pbs_ks_pattern_roundtrip():
    ck = ClientKey.generate(PARAM_TEST_TOY_PBS_KS, seed=17)
    sk = ServerKey.generate(ck)
    msgs = np.array([0, 1, 2, 3], dtype=np.uint64)
    ct = ck.encrypt(msgs)
    assert ct.under_key == "small"
    lut = sk.generate_lookup_table(lambda x: (3 * x + 1) % 4)
    out = sk.apply_lookup_table(ct, lut)
    assert out.under_key == "small"
    got = list(ck.decrypt(out))
    assert got == [(3 * int(m) + 1) % 4 for m in msgs]
    # chain a second PBS (output must be a valid small-key ciphertext)
    out2 = sk.apply_lookup_table(out, lut)
    assert list(ck.decrypt(out2)) == [(3 * g + 1) % 4 for g in got]


def test_pbs_ks_leveled_then_lut():
    ck = ClientKey.generate(PARAM_TEST_TOY_PBS_KS, seed=18)
    sk = ServerKey.generate(ck)
    a = ck.encrypt(np.array([1, 2], dtype=np.uint64))
    b = ck.encrypt(np.array([2, 1], dtype=np.uint64))
    s = sk.unchecked_add(a, b)
    msg = sk.message_extract(s)
    assert list(ck.decrypt(msg)) == [3, 3]


def test_ks32_pattern_roundtrip():
    ck = ClientKey.generate(PARAM_TEST_TOY_KS32, seed=19)
    sk = ServerKey.generate(ck)
    assert ServerKey._is_ks32(PARAM_TEST_TOY_KS32)
    msgs = np.array([0, 1, 2, 3], dtype=np.uint64)
    ct = ck.encrypt(msgs)
    assert ct.under_key == "big"
    lut = sk.generate_lookup_table(lambda x: (x * x) % 4)
    out = sk.apply_lookup_table(ct, lut)
    got = list(ck.decrypt(out))
    assert got == [(int(m) ** 2) % 4 for m in msgs]


def test_ks32_keyswitch_decrypts_under_small_key_mod_2_32():
    """The intermediate u32 ciphertext decrypts correctly at modulus 2^32."""
    ck = ClientKey.generate(PARAM_TEST_TOY_KS32, seed=20)
    sk = ServerKey.generate(ck)
    msgs = np.array([1, 3], dtype=np.uint64)
    ct = ck.encrypt(msgs)
    small = np.asarray(sk._fns[2](ct.ct, sk.ksk_i8))
    bits = ck.lwe_sk.bits
    n = bits.shape[0]
    mod = 1 << 32
    mm_cm = 16
    delta32 = mod // (2 * mm_cm)
    for r in range(len(msgs)):
        dot = sum(int(small[r, i]) for i in range(n) if bits[i]) % mod
        raw = (int(small[r, n]) - dot) % mod
        val = ((raw + delta32 // 2) // delta32) % (2 * mm_cm) % mm_cm
        assert val == int(msgs[r])
