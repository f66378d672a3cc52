"""One-off TPU measurement experiments for PBS kernel design decisions.

Run: python tools/kernel_experiments.py [out.jsonl]

E1: (128,128) u32 transpose cost inside a Pallas kernel
E2: int8 MXU matmul ([128,512]@[512,128] -> int32) inside a Pallas kernel
E3: sublane-strided butterfly stage cost (static sublane slices)
E4: lane-rolled butterfly stage cost (current approach, for reference)
E5: lane-sliced butterfly stage cost (h >= 128 pattern)

All use the two-point dynamic-trip-count method from kernel_bench.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")

from tfhe_tpu.ops import kernel_bench as kb
from tfhe_tpu.ops import pbs_kernel as pk

P0 = np.uint32(0x3F5A0001)
P2 = np.uint32(2 * 0x3F5A0001)

out_path = sys.argv[1] if len(sys.argv) > 1 else None
sink = open(out_path, "a") if out_path else sys.stdout


def emit(d):
    print(json.dumps(d), file=sink, flush=True)


def run(name, kernel, arrays, per_loop_elems, lo=64, hi=4096):
    try:
        interpret = jax.default_backend() == "cpu"
        call = kb._looped_pallas(
            kernel, (arrays[0].shape, arrays[0].dtype), len(arrays), interpret
        )
        fn = jax.jit(lambda c, *a: call(c, *a))
        t = kb._time_delta(fn, lo, hi, *arrays, iters=7)
        emit({"metric": name, "sec_per_loop": t,
              "ns_per_elem": 1e9 * t / per_loop_elems})
    except Exception as e:
        emit({"metric": name, "error": f"{type(e).__name__}: {e}"[:500]})


rng = np.random.default_rng(0)

# --- E1: transpose (128,128) u32 --------------------------------------------
x128 = jnp.asarray(rng.integers(0, 1 << 32, (128, 128), np.uint32))


def k_transpose(n_ref, x_ref, o_ref):
    def step(i, x):
        y = x.T
        return y + jnp.uint32(1)

    o_ref[:] = lax.fori_loop(0, n_ref[0], step, x_ref[:])


run("transpose_128x128_u32", k_transpose, [x128], 128 * 128)

# --- E1b: reshape (8,2048)->(128,128) + transpose + back --------------------
x8 = jnp.asarray(rng.integers(0, 1 << 32, (8, 2048), np.uint32))


def k_relayout(n_ref, x_ref, o_ref):
    def step(i, x):
        y = x.reshape(128, 128).T
        z = (y + jnp.uint32(1)).T.reshape(8, 2048)
        return z

    o_ref[:] = lax.fori_loop(0, n_ref[0], step, x_ref[:])


run("relayout_roundtrip_8x2048", k_relayout, [x8], 8 * 2048)

# --- E2: int8 MXU matmul -----------------------------------------------------
L = jnp.asarray(rng.integers(-127, 128, (128, 512), np.int8))
W = jnp.asarray(rng.integers(-127, 128, (512, 128), np.int8))


def k_matmul(n_ref, l_ref, w_ref, o_ref):
    def step(i, acc):
        s = jax.lax.dot_general(
            l_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc + s

    o_ref[:] = lax.fori_loop(
        0, n_ref[0], step, jnp.zeros((128, 128), jnp.int32)
    )


def run_matmul():
    try:
        interpret = jax.default_backend() == "cpu"
        call = pl.pallas_call(
            k_matmul,
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )
        fn = jax.jit(lambda c, *a: call(c, *a))
        t = kb._time_delta(fn, 64, 4096, L, W, iters=7)
        macs = 128 * 512 * 128
        emit({"metric": "int8_matmul_128x512x128", "sec_per_loop": t,
              "mac_per_s": macs / t, "mxu_fraction": macs / t / kb.MXU_INT8_PEAK})
    except Exception as e:
        emit({"metric": "int8_matmul_128x512x128",
              "error": f"{type(e).__name__}: {e}"[:500]})


run_matmul()

# --- E3: sublane-strided butterfly stage on (128,128) -----------------------
w_col = jnp.asarray(rng.integers(0, int(P0), (128, 1), np.uint32))
ws_col = jnp.asarray(rng.integers(0, 1 << 31, (128, 1), np.uint32))


def k_sub_stage(n_ref, x_ref, w_ref, ws_ref, o_ref):
    def stage(x, h):
        pieces = []
        for b in range(128 // (2 * h)):
            a = x[b * 2 * h : b * 2 * h + h, :]
            bb = x[b * 2 * h + h : (b + 1) * 2 * h, :]
            u = pk._condsub(a + bb, P2)
            t = a + P2 - bb
            w = w_ref[b * 2 * h + h : (b + 1) * 2 * h, :]
            ws = ws_ref[b * 2 * h + h : (b + 1) * 2 * h, :]
            v = pk._shoup(t, w, ws, P0)
            pieces.extend([u, v])
        return jnp.concatenate(pieces, axis=0)

    def step(i, x):
        # one full 7-stage pass (h = 64..1)
        for h in (64, 32, 16, 8, 4, 2, 1):
            x = stage(x, h)
        return x

    o_ref[:] = lax.fori_loop(0, n_ref[0], step, x_ref[:])


run("sublane_7stages_128x128", k_sub_stage, [x128, w_col, ws_col],
    128 * 128, lo=64, hi=1024)

# --- E4: current rolled stages (7 of them) on (8,2048) ----------------------
tabs = pk._get_tables(2048, 4)
w_row = jnp.asarray(tabs.tw_fwd[0])   # [11, 2048] prime 0
ws_row = jnp.asarray(tabs.tw_fwd_sh[0])
up_row = jnp.asarray(tabs.upper)


def k_rolled(n_ref, x_ref, w_ref, ws_ref, up_ref, o_ref):
    def step(i, x):
        for s in range(4, 11):
            h = (2048 >> s) >> 1
            x = pk._fwd_stage_rolled(
                x, h, w_ref[s][None], ws_ref[s][None], up_ref[s][None], P0, P2
            )
        return x

    o_ref[:] = lax.fori_loop(0, n_ref[0], step, x_ref[:])


run("rolled_7stages_8x2048", k_rolled, [x8, w_row, ws_row, up_row],
    8 * 2048, lo=64, hi=1024)

# --- E5: sliced stages (the 4 big ones) on (8,2048) -------------------------
def k_sliced(n_ref, x_ref, w_ref, ws_ref, o_ref):
    def step(i, x):
        for s in range(4):
            h = (2048 >> s) >> 1
            x = pk._fwd_stage_sliced(x, h, w_ref[s][None], ws_ref[s][None], P0, P2)
        return x

    o_ref[:] = lax.fori_loop(0, n_ref[0], step, x_ref[:])


run("sliced_4stages_8x2048", k_sliced, [x8, w_row, ws_row],
    8 * 2048, lo=64, hi=1024)

if out_path:
    sink.close()
