"""Measure VPU primitive costs inside a Pallas kernel on the real chip.

Times a long fori_loop of a single vector op on a [8, 2048] u32 tile using
the two-point method (difference of two trip counts cancels launch/tunnel
overhead). This sets the speed-of-light budget for NTT kernel design:
how much a u32 multiply / mul_hi / Shoup modmul actually costs per element.

Run: python tools/vpu_primitives.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")

from tfhe_tpu.ops import pbs_kernel as pk

U32 = jnp.uint32
BT, N = 8, 2048
P0 = np.uint32(0x3F5A0001)
W = np.uint32(12345677)
WSH = np.uint32((12345677 << 32) // 0x3F5A0001)


def timed(fn, *args, iters=3):
    out = fn(*args)
    jax.device_get(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(out)
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts))


def run_case(name, body, lo=1 << 16, hi=1 << 20):
    def kernel(n_ref, x_ref, o_ref):
        def step(i, x):
            return body(x)

        o_ref[:] = lax.fori_loop(0, n_ref[0], step, x_ref[:])

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BT, N), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    fn = jax.jit(lambda c, v: call(c, v))
    x0 = jnp.asarray(
        np.random.default_rng(0).integers(0, P0, (BT, N), np.uint32))
    try:
        t_lo = timed(fn, jnp.full((1,), lo, jnp.int32), x0)
    except Exception as e:  # Mosaic lowering gaps (e.g. u32->f32 casts)
        print(json.dumps({"metric": name, "error": str(e)[:120]}), flush=True)
        return
    t_hi = timed(fn, jnp.full((1,), hi, jnp.int32), x0)
    per = max(t_hi - t_lo, 1e-12) / (hi - lo)
    ns = per * 1e9
    # elements processed per loop iteration = BT*N
    print(json.dumps({
        "metric": name, "ns_per_loop": round(ns, 3),
        "ps_per_elem": round(per / (BT * N) * 1e12, 3),
    }), flush=True)


run_case("add", lambda x: x + x)
run_case("mul_u32", lambda x: x * x)
run_case("mul_u32_const", lambda x: x * W)
run_case("shift", lambda x: x >> U32(16))
run_case("and", lambda x: x & U32(0xFFFF))
run_case("where_ge", lambda x: jnp.where(x >= P0, x - P0, x))
run_case("mul_hi", lambda x: pk._mul_hi(x, x | U32(1)))
run_case("shoup", lambda x: pk._shoup(x, W, WSH, P0))
run_case("shoup_condsub", lambda x: pk._condsub(pk._shoup(x, W, WSH, P0), P0))
# a full radix-2 butterfly pair worth of work per element (approximation)
run_case("butterfly_mix",
         lambda x: pk._condsub(x + x, np.uint32(2) * P0)
         ^ pk._shoup(x, W, WSH, P0))
# i32->f32->i32 conversion cost probe
run_case("to_f32_roundtrip",
         lambda x: (x.astype(jnp.int32).astype(jnp.float32)
                    + 1.0).astype(jnp.int32).astype(jnp.uint32))

# --- 16-bit-prime feasibility probes (round 2) ---------------------------
# Shoup modmul when p, w, a are all < 2^16: every product fits u32, so the
# whole modmul is 3 u32 mullo ops (no mul_hi). If mullo is ~2x cheaper than
# mul_hi this halves the per-modmul budget (at the price of ~7/4x primes).
P16 = np.uint32(40961)          # 10*2^12 + 1, NTT-friendly for N=2048
W16 = np.uint32(12345)
W16SH = np.uint32((12345 << 16) // 40961)
MASK16 = np.uint32(0xFFFF)


def _shoup16(a, w, wsh, p):
    q = (a * wsh) >> np.uint32(16)
    return a * w - q * p


run_case("mullo16_vals", lambda x: (x & MASK16) * W16)
run_case("shoup16", lambda x: _shoup16(x & MASK16, W16, W16SH, P16))
run_case("shoup16_condsub",
         lambda x: pk._condsub(_shoup16(x & MASK16, W16, W16SH, P16),
                               np.uint32(2) * P16))
# (an int16-dtype multiply probe SIGABRTs the mosaic compiler — omitted)
run_case("mul_f32",
         lambda x: ((x & MASK16).astype(jnp.float32)
                    * 1.5).astype(jnp.uint32))


def _mulhi_4mullo(a, wsh_hi, wsh_lo):
    """floor(a * wsh / 2^32) via 16-bit splits: 4 mullos + shifts/adds
    (+-1 exact; carry handling omitted, adds one lazy condsub downstream)."""
    a1 = a >> np.uint32(16)
    a0 = a & np.uint32(0xFFFF)
    m = a1 * wsh_lo + a0 * wsh_hi + ((a0 * wsh_lo) >> np.uint32(16))
    return a1 * wsh_hi + (m >> np.uint32(16))


run_case("mulhi_4mullo",
         lambda x: _mulhi_4mullo(x, np.uint32(W >> np.uint32(16)),
                                 np.uint32(W & np.uint32(0xFFFF))))


def _mul_hi_approx(a, b):
    """mul_hi undershooting by at most 2 (drops the low-half carry fold).
    For Shoup q this widens the lazy bound to < 4p; one condsub restores
    the < 2p contract and the value mod p is unchanged."""
    ah = a >> np.uint32(16)
    al = a & np.uint32(0xFFFF)
    bh = b >> np.uint32(16)
    bl = b & np.uint32(0xFFFF)
    return ah * bh + ((al * bh) >> np.uint32(16)) + ((ah * bl) >> np.uint32(16))


def _shoup_approx(a, w, wsh, p):
    q = _mul_hi_approx(a, wsh)
    r = a * w - q * p
    return pk._condsub(r, np.uint32(2) * p)


run_case("mulhi_approx", lambda x: _mul_hi_approx(x, x | U32(1)))
run_case("shoup_approx_2p", lambda x: _shoup_approx(x, W, WSH, P0))
run_case("shoup_approx_canon",
         lambda x: pk._condsub(_shoup_approx(x, W, WSH, P0), P0))


# --- leading-axis slice+concat cost (group-stage pattern) -----------------
def run_case3d(name, body, lo=1 << 12, hi=1 << 16):
    G, BT = 16, 16

    def kernel(n_ref, x_ref, o_ref):
        def step(i, x):
            return body(x)

        o_ref[:] = lax.fori_loop(0, n_ref[0], step, x_ref[:])

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((G, BT, 128), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    fn = jax.jit(lambda c, v: call(c, v))
    x0 = jnp.asarray(
        np.random.default_rng(0).integers(0, P0, (G, BT, 128), np.uint32))
    try:
        t_lo = timed(fn, jnp.full((1,), lo, jnp.int32), x0)
        t_hi = timed(fn, jnp.full((1,), hi, jnp.int32), x0)
    except Exception as e:
        print(json.dumps({"metric": name, "error": str(e)[:120]}), flush=True)
        return
    per = max(t_hi - t_lo, 1e-12) / (hi - lo)
    print(json.dumps({
        "metric": name, "ns_per_loop": round(per * 1e9, 3),
        "ps_per_elem": round(per / (16 * 16 * 128) * 1e12, 3),
    }), flush=True)


def _stage_like(x):
    """One DIF group stage: slice halves, butterfly, concat (no modmul)."""
    G = x.shape[0]
    h = G // 2
    u, v = x[:h], x[h:]
    return jnp.concatenate([u + v, u - v], axis=0)


def _four_stages(x):
    for st in range(4):
        m = x.shape[0] >> st
        pieces = []
        for b in range(x.shape[0] // m):
            u = x[b * m: b * m + m // 2]
            v = x[b * m + m // 2: (b + 1) * m]
            pieces.append(u + v)
            pieces.append(u - v)
        x = jnp.concatenate(pieces, axis=0)
    return x


run_case3d("addsub_only", lambda x: (x + x) - (x >> U32(1)))
run_case3d("one_stage_concat", _stage_like)
run_case3d("four_stages_concat", _four_stages)


# condsub via unsigned-wrap minimum (x>=c -> x-c < x; else wraps huge):
# NOT viable — Mosaic has no u32 minimum lowering (remote_compile HTTP 500),
# and the signed-reinterpret variant picks the wrong side. The where-based
# _condsub (0.9 ps/elem) stands.
