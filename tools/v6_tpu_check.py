"""On-chip validation of the v6 (2-prime BNF) kernel.

Stages (each gated on the previous):
 1. kernel-vs-oracle bit-exactness on the REAL chip at production geometry
    (N=2048, synthetic keys, few steps);
 2. full production 2_2 PBS: exhaustive message sweep, decrypt-checked;
 3. throughput probe vs the v4 (exact CRT) kernel at the same batch.

Usage: python tools/v6_tpu_check.py [stage...]   (default: all)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fetch(x):
    """Force execution through the axon tunnel (see PERF_NOTES.md)."""
    return np.asarray(x)


def stage1_parity():
    import jax.numpy as jnp

    from tfhe_tpu.ops import bnf2 as b2
    from tfhe_tpu.ops import pbs_kernel as pk

    r = np.random.default_rng(7)
    N, nsteps, levels, R, blog, batch = 2048, 6, 1, 2, 23, 16
    lut = r.integers(0, 1 << 64, size=(batch, R, N), dtype=np.uint64)
    mask = r.integers(0, 2 * N, size=(batch, nsteps), dtype=np.uint64)
    body = r.integers(0, 2 * N, size=(batch,), dtype=np.uint64)
    bsk_std = r.integers(0, 1 << 64, size=(nsteps, levels, R, R, N),
                         dtype=np.uint64)
    bsk2 = b2.bootstrap_key_to_bnf2(bsk_std)
    # mirror the kernel's accumulator mode (defaults to acc32 for v6)
    acc32 = os.environ.get("TFHE_V4_ACC", "32") == "32"
    want = fetch(b2.blind_rotate_bnf2(
        jnp.asarray(lut), jnp.asarray(mask), jnp.asarray(body), bsk2,
        blog, levels, acc_round32=acc32))
    got = fetch(pk.blind_rotate_pallas(
        jnp.asarray(lut), jnp.asarray(mask), jnp.asarray(body), bsk2,
        blog, levels, b2.get_plan2(N), batch_tile=16, unroll=2, bnf2=True))
    assert np.array_equal(got, want), (
        "v6 kernel != oracle on chip: "
        f"{np.argwhere(got != want)[:5]} of {got.size}")
    print("stage1 OK: v6 kernel bit-exact vs oracle on chip (N=2048)")


def stage2_production():
    os.environ["TFHE_NTT_VARIANT"] = "v6"
    import jax

    from tfhe_tpu.keycache import get_shortint_keys
    from tfhe_tpu.utils.params import PARAM_MESSAGE_2_CARRY_2_KS_PBS as P

    ck, sk = get_shortint_keys(P, seed=42)
    assert sk.ntt_variant == "v6", sk.ntt_variant
    mm, cm = P.message_modulus, P.carry_modulus
    full = mm * cm
    msgs = np.arange(full, dtype=np.uint64)
    ct = ck.encrypt(msgs)
    lut = sk.generate_lookup_table(lambda x: (3 * x + 1) % mm)
    out = sk.apply_lookup_table(ct, lut)
    jax.block_until_ready(out.ct)
    dec = np.asarray(ck.decrypt(out))
    expect = (3 * msgs + 1) % mm
    assert np.array_equal(dec, expect), (dec, expect)
    print(f"stage2 OK: production 2_2 exhaustive sweep ({full} msgs) "
          "decrypts correctly through v6")


def stage3_throughput(batch=2048):
    import jax

    from tfhe_tpu.keycache import get_shortint_keys
    from tfhe_tpu.utils.params import PARAM_MESSAGE_2_CARRY_2_KS_PBS as P

    results = {}
    for variant in ("v6", "crt"):
        os.environ["TFHE_NTT_VARIANT"] = variant
        ck, sk = get_shortint_keys(P, seed=42)
        mm = P.message_modulus
        msgs = np.arange(batch, dtype=np.uint64) % mm
        ct = ck.encrypt(msgs)
        lut = sk.generate_lookup_table(lambda x: (3 * x + 1) % mm)
        out = sk.apply_lookup_table(ct, lut)  # compile + correctness
        jax.block_until_ready(out.ct)
        dec = np.asarray(ck.decrypt(out))
        assert np.array_equal(dec, (3 * msgs + 1) % mm), variant
        iters = 2
        t0 = time.perf_counter()
        cur = out
        for _ in range(iters):
            cur = sk.apply_lookup_table(cur, lut)
            jax.block_until_ready(cur.ct)
        dt = (time.perf_counter() - t0) / iters
        results[variant] = batch / dt
        print(f"stage3 {variant}: {batch / dt:.1f} PBS/s (batch {batch})")
    print(f"v6/crt speedup: {results['v6'] / results['crt']:.3f}x")


if __name__ == "__main__":
    stages = sys.argv[1:] or ["1", "2", "3"]
    if "1" in stages:
        stage1_parity()
    if "2" in stages:
        stage2_production()
    if "3" in stages:
        stage3_throughput()
