"""Probe in-kernel int8 MXU matmul throughput and MXU/VPU overlap.

Cases (two-point fori_loop timing, [8,2048]-u32 tile resident in VMEM):
  - matmul_512x512: one [128,512]@[512,512] int8->int32 dot per loop
  - matmul_384x512: one [128,384]@[384,512] (the v4 forward shape)
  - matmul_256r_384x512: rows=256 (two digit polys batched)
  - shoup_x8: 8 chained Shoup modmuls (pure VPU reference)
  - mix: matmul + 8 shoups per loop — tests whether MXU hides under VPU
Run: python tools/mxu_probe.py
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
I32 = jnp.int32
BT, N = 8, 2048
P0 = np.uint32(0x3F5A0001)
W = np.uint32(12345677)
WSH = np.uint32((12345677 << 32) // 0x3F5A0001)

rng = np.random.default_rng(0)
W512 = jnp.asarray(rng.integers(-128, 128, (512, 512), np.int8))
W384 = jnp.asarray(rng.integers(-128, 128, (384, 512), np.int8))


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


def run_case(name, body, mops=0.0, lo=1 << 13, hi=1 << 17):
    def kernel(n_ref, x_ref, w5_ref, w3_ref, o_ref):
        def step(i, x):
            return body(x, w5_ref[:], w3_ref[:])

        o_ref[:] = lax.fori_loop(0, n_ref[0], step, x_ref[:])

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BT, N), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    fn = jax.jit(lambda c, v, a, b: call(c, v, a, b))
    x0 = jnp.asarray(rng.integers(0, P0, (BT, N), np.uint32))
    t_lo = timed(fn, jnp.full((1,), lo, jnp.int32), x0, W512, W384)
    t_hi = timed(fn, jnp.full((1,), hi, jnp.int32), x0, W512, W384)
    per = max(t_hi - t_lo, 1e-12) / (hi - lo)
    rec = {"metric": name, "ns_per_loop": round(per * 1e9, 2)}
    if mops:
        rec["effective_tops"] = round(mops * 1e6 / per / 1e12, 1)
    print(json.dumps(rec), flush=True)


def mm512(x, w5):
    L = x.reshape(128, 128).astype(jnp.int8)
    L4 = jnp.concatenate([L, L, L, L], axis=-1)  # [128, 512]
    U = lax.dot_general(L4, w5, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    return U


def mm384(x, w3):
    L = x.reshape(128, 128).astype(jnp.int8)
    L3 = jnp.concatenate([L, L, L], axis=-1)  # [128, 384]
    U = lax.dot_general(L3, w3, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    return U


def fold(x, U):
    V = (U[:, :128] + (U[:, 128:256] << I32(8))).astype(U32)
    return x ^ V.reshape(1, -1)[:, :N] * U32(3)


def shoup_chain(x, k):
    for _ in range(k):
        x = pk._shoup(x, W, WSH, P0)
    return x


run_case("matmul_512x512", lambda x, w5, w3: fold(x, mm512(x, w5)),
         mops=2 * 128 * 512 * 512 / 1e6)
run_case("matmul_384x512", lambda x, w5, w3: fold(x, mm384(x, w3)),
         mops=2 * 128 * 384 * 512 / 1e6)


def mm_rows256(x, w5, w3):
    L = x.reshape(128, 128).astype(jnp.int8)
    L3 = jnp.concatenate([L, L, L], axis=-1)
    L6 = jnp.concatenate([L3, L3], axis=0)  # [256, 384]
    U = lax.dot_general(L6, w3, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    return fold(x, U[:128])


run_case("matmul_256r_384x512", mm_rows256,
         mops=2 * 256 * 384 * 512 / 1e6)

run_case("shoup_x8", lambda x, w5, w3: shoup_chain(x, 8))
run_case("shoup_x16", lambda x, w5, w3: shoup_chain(x, 16))


def mix(x, w5, w3):
    U = mm512(x, w5)
    y = shoup_chain(x, 8)
    return fold(y, U)


run_case("mix_matmul512_shoupx8", mix)


def mix2(x, w5, w3):
    U = mm512(x, w5)
    U2 = mm384(x, w3)
    y = shoup_chain(x, 16)
    return fold(fold(y, U), U2)


run_case("mix_2matmul_shoupx16", mix2)
