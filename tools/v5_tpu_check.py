"""On-chip validation of the v5 Goldilocks kernel.

Stages (each gated on the previous):
 1. kernel-vs-oracle bit-exactness on the REAL chip at production geometry
    (N=2048, synthetic keys, few steps) — catches Mosaic lowering bugs the
    CPU interpret-mode parity test cannot;
 2. full production 2_2 PBS: exhaustive message sweep, decrypt-checked;
 3. quick throughput probe vs the v4 kernel at the same batch.

Usage: python tools/v5_tpu_check.py [stage...]   (default: all)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fetch(x):
    """Force execution through the axon tunnel (block_until_ready can
    return before the remote chip executes — see PERF_NOTES.md)."""
    return np.asarray(x)


def stage1_parity():
    import jax.numpy as jnp

    from tfhe_tpu.ops import goldilocks as gl
    from tfhe_tpu.ops import pbs_kernel_g as kg

    r = np.random.default_rng(7)
    N, nsteps, levels, R, blog, batch = 2048, 6, 1, 2, 23, 16
    lut = r.integers(0, 1 << 64, size=(batch, R, N), dtype=np.uint64)
    mask = r.integers(0, 2 * N, size=(batch, nsteps), dtype=np.uint64)
    body = r.integers(0, 2 * N, size=(batch,), dtype=np.uint64)
    bsk_std = r.integers(0, 1 << 64, size=(nsteps, levels, R, R, N),
                         dtype=np.uint64)
    bsk_g = gl.bootstrap_key_to_goldilocks(bsk_std)
    want = fetch(gl.blind_rotate_goldilocks(
        jnp.asarray(lut), jnp.asarray(mask), jnp.asarray(body), bsk_g,
        blog, levels))
    got = fetch(kg.blind_rotate_goldilocks_pallas(
        jnp.asarray(lut), jnp.asarray(mask), jnp.asarray(body), bsk_g,
        blog, levels, batch_tile=16, unroll=2))
    assert np.array_equal(got, want), (
        "v5 kernel != oracle on chip: "
        f"{np.argwhere(got != want)[:5]} of {got.size}")
    print("stage1 OK: v5 kernel bit-exact vs oracle on chip (N=2048)")


def stage2_production():
    os.environ["TFHE_NTT_VARIANT"] = "v5"
    import jax

    from tfhe_tpu.keycache import get_shortint_keys
    from tfhe_tpu.utils.params import PARAM_MESSAGE_2_CARRY_2_KS_PBS as P

    ck, sk = get_shortint_keys(P, seed=42)
    assert sk.ntt_variant == "v5", sk.ntt_variant
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
          "decrypts correctly through v5")


def stage3_throughput(batch=2048):
    import jax

    from tfhe_tpu.keycache import get_shortint_keys
    from tfhe_tpu.utils.params import PARAM_MESSAGE_2_CARRY_2_KS_PBS as P

    results = {}
    for variant in ("v5", "v4"):
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
    print(f"v5/v4 speedup: {results['v5'] / results['v4']:.3f}x")


if __name__ == "__main__":
    stages = sys.argv[1:] or ["1", "2", "3"]
    if "1" in stages:
        stage1_parity()
    if "2" in stages:
        stage2_production()
    if "3" in stages:
        stage3_throughput()
