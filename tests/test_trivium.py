"""FHE Trivium vs the clear oracle (apps/trivium parity).

The FHE stream starts from a clear-warmed, then-encrypted state so the test
exercises the 64-bit-parallel FHE round function without paying 1152
warm-up rounds on the CI box; a second test runs one full-FHE 64-round
step from the un-warmed state to cover initialization.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from apps.trivium import ClearTrivium, TriviumStream, transcipher_decrypt
from tfhe_tpu.boolean.keys import BooleanCiphertext, ClientKey, ServerKey
from tfhe_tpu.utils.params import BOOLEAN_TEST_TOY

KEY = [(i * 7 + 3) % 2 for i in range(80)]
IV = [(i * 5 + 1) % 2 for i in range(80)]


@pytest.fixture(scope="module")
def keys():
    ck = ClientKey.generate(BOOLEAN_TEST_TOY, seed=41)
    sk = ServerKey.generate(ck)
    return ck, sk


def test_keystream_parity_from_warmed_state(keys):
    ck, sk = keys
    clear = ClearTrivium(KEY, IV)  # warmed up
    state_bits = list(clear.s)
    enc_state = ck.encrypt(np.array(state_bits, dtype=bool))
    stream = TriviumStream.from_state(sk, enc_state)
    want = clear.next_bits(128)
    got_ct = stream.next_bits(128)
    got = [int(b) for b in ck.decrypt(got_ct)]
    assert got == want


def test_one_step_from_initial_state(keys):
    ck, sk = keys
    clear = ClearTrivium(KEY, IV, warmup=False)
    key_ct = ck.encrypt(np.array(KEY, dtype=bool))
    stream = TriviumStream.new(sk, key_ct, IV, warmed_up=False)
    want = clear.next_bits(64)
    got = [int(b) for b in ck.decrypt(stream.next_64())]
    assert got == want
    # states stay in lockstep after the step
    st = [int(b) for b in ck.decrypt(stream.state)]
    assert st == clear.s


def test_transciphering(keys):
    ck, sk = keys
    clear = ClearTrivium(KEY, IV)
    msg = [(i * 3 + 1) % 2 for i in range(64)]
    sym_ct = [m ^ z for m, z in zip(msg, clear.next_bits(64))]
    # server side: regenerate the keystream under FHE and XOR the clear bits
    clear2 = ClearTrivium(KEY, IV)
    enc_state = ck.encrypt(np.array(clear2.s, dtype=bool))
    stream = TriviumStream.from_state(sk, enc_state)
    fhe_msg = transcipher_decrypt(stream, sym_ct)
    got = [int(b) for b in ck.decrypt(fhe_msg)]
    assert got == msg
