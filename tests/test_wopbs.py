"""WoP-PBS: bit extraction, circuit bootstrapping, vertical packing, and the
full wopbs LUT over message+carry — toy parameters, decryption oracles.

Reference: shortint/wopbs/mod.rs, core_crypto fft_impl wop_pbs/mod.rs.
"""

import numpy as np
import pytest

from tfhe_tpu.core import algorithms as algo
from tfhe_tpu.shortint.client_key import ClientKey
from tfhe_tpu.shortint.server_key import ServerKey
from tfhe_tpu.shortint.wopbs import WopbsKey
from tfhe_tpu.utils.params import PARAM_TEST_TOY


@pytest.fixture(scope="module")
def keys():
    ck = ClientKey.generate(PARAM_TEST_TOY, seed=51)
    sk = ServerKey.generate(ck)
    wk = WopbsKey.generate(ck, sk)
    return ck, sk, wk


def _decrypt_small_bit(ck, lwe, pos):
    raw = int(algo.lwe_decrypt(ck.lwe_sk, lwe[None])[0])
    return (raw + (1 << (pos - 1))) >> pos & 1


def test_extract_bits(keys):
    ck, sk, wk = keys
    mod_sup = 16
    nbits = 4
    delta_log = 64 - 1 - nbits
    for value in (0b0000, 0b1011, 0b0110, 0b1111):
        ct = ck.encrypt(np.array([value % 4], dtype=np.uint64))
        # put the full 4-bit value in (message+carry space)
        from tfhe_tpu.shortint.ciphertext import ShortintCiphertext

        import jax.numpy as jnp

        delta = (1 << 63) // mod_sup
        raw = algo.lwe_trivial(ck.big_lwe_sk.dim, np.array(
            [np.uint64(value * delta)], dtype=np.uint64))[0]
        # add encryption of zero for realism
        zero = ck.encrypt(np.array([0], dtype=np.uint64))
        full = np.asarray(zero.ct, dtype=np.uint64)[0] + raw
        ct = ShortintCiphertext(
            ct=jnp.asarray(full), degree=15, noise_level=1,
            message_modulus=4, carry_modulus=4,
        )
        bits = wk.extract_bits(ct, delta_log, nbits)
        got = [_decrypt_small_bit(ck, b, 63) for b in bits]
        want = [(value >> (nbits - 1 - i)) & 1 for i in range(nbits)]
        assert got == want, (bin(value), got, want)


def test_circuit_bootstrap_ggsw_decrypts(keys):
    ck, sk, wk = keys
    # bit = 1 at position 63 (trivial for determinism)
    lwe = np.zeros(ck.params.lwe_dimension + 1, dtype=np.uint64)
    lwe[-1] = np.uint64(1 << 63)
    ggsw = wk.circuit_bootstrap(lwe)
    # last row of level slot j encrypts bit * 2^(64 - bl*(levels-j))
    k = ck.params.glwe_dimension
    for j in range(wk.cbs_levels):
        lvl = wk.cbs_levels - j
        row = ggsw[j, k]  # [R, N]
        pt = np.asarray(algo.glwe_decrypt(ck.glwe_sk, row[None]))[0]
        want = np.uint64(1 << (64 - wk.cbs_base_log * lvl))
        err = int(pt[0] - want)
        if err > 1 << 63:
            err -= 1 << 64
        assert abs(err) < 1 << 40, (j, hex(pt[0]), hex(int(want)))


def test_wopbs_full_lut(keys):
    ck, sk, wk = keys
    f = lambda x: (7 * x + 3) % 16  # noqa: E731 — over message+carry space
    msgs = [0, 1, 2, 3]
    for m in msgs:
        ct = ck.encrypt(np.array([m], dtype=np.uint64))
        out = wk.wopbs(ct, f)
        got = int(np.asarray(ck.decrypt_message_and_carry(out))[0])
        assert got == f(m), (m, got, f(m))


def test_wopbs_nonlinear_lut(keys):
    ck, sk, wk = keys
    f = lambda x: (x * x) % 16  # noqa: E731
    ct = ck.encrypt(np.array([3], dtype=np.uint64))
    s = sk.unchecked_add(ct, ck.encrypt(np.array([3], dtype=np.uint64)))
    # value 6 lives in message+carry; wopbs sees the full space
    out = wk.wopbs(s, f)
    got = int(np.asarray(ck.decrypt_message_and_carry(out))[0])
    assert got == 36 % 16
