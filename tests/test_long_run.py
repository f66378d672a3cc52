"""Long-run randomized op-sequence tests: a seeded chain of random radix
ops evaluated homomorphically vs a clear oracle carried alongside.

Mirrors the reference's long-run suites
(``integer/server_key/radix_parallel/tests_long_run/test_random_op_sequence
.rs`` — random (op, operand) chains with per-step oracle checks — and
``test_erc20.rs``; the erc20 workload itself lives in
tests/test_workloads.py). The chain catches cross-op degradation that
single-op oracle tests cannot: carry/degree bookkeeping drift, noise
accumulation past the bootstrap budget, and stale-state bugs in ops that
reuse intermediate ciphertexts.

A production-parameter chain runs on real TPU hardware via
``tools/tpu_prod_tests.py`` (TESTS_TPU.md records the pass).
"""

import numpy as np
import pytest

from tfhe_tpu.integer.radix import ClientKey, ServerKey
from tfhe_tpu.utils.params import PARAM_TEST_TOY as P

NB = 4  # 4 blocks x 2 bits = FheUint8 equivalent; chain length is the point
MOD = 1 << 8


@pytest.fixture(scope="module")
def keys():
    ck = ClientKey.generate(P, seed=2024)
    sk = ServerKey.generate(ck)
    return ck, sk


def _binary_ops(sk):
    m = np.uint64(MOD - 1)
    return [
        ("add", sk.add, lambda x, y: (x + y) & m),
        ("sub", sk.sub, lambda x, y: (x - y) & m),
        ("mul", sk.mul, lambda x, y: (x * y) & m),
        ("bitand", sk.bitand, lambda x, y: x & y),
        ("bitor", sk.bitor, lambda x, y: x | y),
        ("bitxor", sk.bitxor, lambda x, y: x ^ y),
        ("min", sk.min, np.minimum),
        ("max", sk.max, np.maximum),
    ]


def _scalar_ops(sk):
    m = np.uint64(MOD - 1)
    return [
        ("scalar_add", sk.scalar_add, lambda x, s: (x + np.uint64(s)) & m),
        ("scalar_mul", sk.scalar_mul, lambda x, s: (x * np.uint64(s)) & m),
    ]


def test_random_op_sequence_30_ops(keys):
    """30+ seeded random ops chained on a working set of 4 encrypted values,
    each step decrypt-checked against the clear oracle (the reference runs
    the same shape of chain with per-op result checks)."""
    ck, sk = keys
    rng = np.random.default_rng(0xC0FFEE)
    n_ops = 32

    clear = rng.integers(0, MOD, size=4, dtype=np.uint64)
    enc = [ck.encrypt_radix(np.asarray([v], dtype=np.uint64), NB)
           for v in clear]
    clear = [np.uint64(v) for v in clear]

    bin_ops = _binary_ops(sk)
    sc_ops = _scalar_ops(sk)

    for step in range(n_ops):
        kind = rng.integers(0, 10)
        dst = int(rng.integers(0, 4))
        if kind < 6:  # binary op between two slots
            src = int(rng.integers(0, 4))
            name, fn, oracle = bin_ops[int(rng.integers(0, len(bin_ops)))]
            enc[dst] = fn(enc[dst], enc[src])
            clear[dst] = np.uint64(oracle(clear[dst], clear[src]))
        elif kind < 8:  # scalar op
            s = int(rng.integers(0, MOD))
            name, fn, oracle = sc_ops[int(rng.integers(0, len(sc_ops)))]
            enc[dst] = fn(enc[dst], s)
            clear[dst] = np.uint64(oracle(clear[dst], s))
        else:  # comparison + select (exercises BooleanBlock reuse)
            src = int(rng.integers(0, 4))
            name = "if_then_else(le)"
            cond = sk.le(enc[dst], enc[src])
            enc[dst] = sk.if_then_else(cond, enc[src], enc[dst])
            clear[dst] = np.uint64(
                clear[src] if clear[dst] <= clear[src] else clear[dst])
        got = int(np.asarray(ck.decrypt_radix(enc[dst]))[0])
        assert got == int(clear[dst]), (
            f"step {step} ({name}): got {got}, want {int(clear[dst])}")


def test_random_op_sequence_deterministic(keys):
    """The same seed must replay to the same ciphertext contents — op
    chains are deterministic end to end (reference long-run suites rely on
    seeded reproducibility to triage failures)."""
    ck, sk = keys
    rng1 = np.random.default_rng(7)
    rng2 = np.random.default_rng(7)
    x0 = ck.encrypt_radix(np.asarray([17], dtype=np.uint64), NB)
    y0 = ck.encrypt_radix(np.asarray([103], dtype=np.uint64), NB)

    def chain(rng):
        x, y = x0, y0
        for _ in range(6):
            op = int(rng.integers(0, 3))
            if op == 0:
                x = sk.add(x, y)
            elif op == 1:
                x = sk.mul(x, y)
            else:
                x = sk.bitxor(x, y)
        return np.asarray(x.ct)

    a = chain(rng1)
    b = chain(rng2)
    np.testing.assert_array_equal(a, b)
