"""Trustworthy NTT-variant timings: long in-kernel loops (~0.2-1 s device
work per call) so tunnel jitter is irrelevant, at the REAL interleaving
(4 primes x 4 polys per step, like the fused kernel).

Run: python tools/ntt_variants.py [out.jsonl]
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

out_path = sys.argv[1] if len(sys.argv) > 1 else None
sink = open(out_path, "a") if out_path else sys.stdout

N = 2048
P = 4
BT = 8
tabs = pk._get_tables(N, P)
log_n = 11
_TABS = ("tw_fwd", "tw_fwd_sh", "tw_inv", "tw_inv_sh", "twist", "twist_sh",
         "untwist", "untwist_sh", "upper", "tw_fwd_col", "tw_fwd_col_sh",
         "tw_inv_col", "tw_inv_col_sh", "fwd_w8", "inv_w8")
tab_arrays = [jnp.asarray(getattr(tabs, nm)) for nm in _TABS]
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.integers(0, tabs.plan.primes[0], (BT, N), np.uint32))


def timed(fn, *args, iters=3):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts))


def run_case(name, body_fn, n_loops_lo=16384, n_loops_hi=262144, work_desc=1.0):
    """body_fn(x, tabs_c) -> x; timed at two loop counts."""

    def kernel(n_ref, x_ref, *refs):
        tab_refs, o_ref = refs[:-1], refs[-1]
        tabs_c = {nm: r[:] for nm, r in zip(_TABS, tab_refs)}
        tabs_c["first_small"] = tabs.first_small_stage

        def step(i, x):
            return body_fn(x, tabs_c)

        o_ref[:] = lax.fori_loop(0, n_ref[0], step, x_ref[:])

    try:
        interpret = jax.default_backend() == "cpu"
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((BT, N), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + len(tab_arrays)),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )
        fn = jax.jit(lambda c, v, *t: call(c, v, *t))
        lo = jnp.full((1,), n_loops_lo, jnp.int32)
        hi = jnp.full((1,), n_loops_hi, jnp.int32)
        t_lo = timed(fn, lo, x0, *tab_arrays)
        t_hi = timed(fn, hi, x0, *tab_arrays)
        per = max(t_hi - t_lo, 1e-12) / (n_loops_hi - n_loops_lo)
        print(json.dumps({"metric": name, "us_per_loop": per * 1e6,
                          "t_lo": t_lo, "t_hi": t_hi}), file=sink, flush=True)
    except Exception as e:
        print(json.dumps({"metric": name,
                          "error": f"{type(e).__name__}: {e}"[:400]}),
              file=sink, flush=True)


p0 = np.uint32(tabs.plan.primes[0])
p20 = np.uint32(2 * int(tabs.plan.primes[0]))

# 1. single fwd v1 (rolled)
run_case("fwd_v1", lambda x, tc: pk._fwd_ntt(x, 0, tc, p0, p20, log_n))
# 2. single fwd v2 (transposed)
run_case("fwd_v2", lambda x, tc: pk._fwd_ntt_v2(x, 0, tc, p0, p20, log_n))
# 3. single inv v1 / v2
run_case("inv_v1", lambda x, tc: pk._inv_ntt(x, 0, tc, p0, p20, log_n))
run_case("inv_v2", lambda x, tc: pk._inv_ntt_v2(x, 0, tc, p0, p20, log_n))


# 4. 4 stages sliced only
def sliced4(x, tc):
    for s in range(4):
        h = (N >> s) >> 1
        x = pk._fwd_stage_sliced(x, h, tc["tw_fwd"][0, s][None],
                                 tc["tw_fwd_sh"][0, s][None], p0, p20)
    return x


run_case("sliced4", sliced4)


# 5. rolled 7 stages only
def rolled7(x, tc):
    for s in range(4, 11):
        h = (N >> s) >> 1
        x = pk._fwd_stage_rolled(x, h, tc["tw_fwd"][0, s][None],
                                 tc["tw_fwd_sh"][0, s][None],
                                 tc["upper"][s][None], p0, p20)
    return x


run_case("rolled7", rolled7)


# 6. transposed 7 stages only (incl. relayout)
def subl7(x, tc):
    rows = BT * (N // 128)
    y = x.reshape(rows, 128).T
    for k in range(7):
        h = 128 >> (k + 1)
        y = pk._fwd_stage_subl(y, h, tc["tw_fwd_col"][0, k][:, None],
                               tc["tw_fwd_col_sh"][0, k][:, None], p0, p20)
    return y.T.reshape(BT, N)


run_case("subl7_with_relayout", subl7)


# 7. relayout only
def relayout(x, tc):
    y = x.reshape(BT * (N // 128), 128).T
    return (y + jnp.uint32(1)).T.reshape(BT, N)


run_case("relayout_only", relayout)


# 7b. the MXU (v3) transforms
_MXU_CONSTS = tuple(
    (int(tabs.c32[i]), int(tabs.c32_sh[i]), int(tabs.one_sh[i]),
     int(tabs.recomb_bias[i])) for i in range(P)
)


def fwd_v3(x, tc):
    tc = dict(tc)
    tc["mxu_consts"] = _MXU_CONSTS
    y = pk._fwd_ntt_v3(x, 0, tc, p0, p20, log_n, tc["fwd_w8"])
    return y.reshape(BT, N)


def inv_v3(x, tc):
    tc = dict(tc)
    tc["mxu_consts"] = _MXU_CONSTS
    yb = x.reshape(BT * (N // 128), 128)
    return pk._inv_ntt_v3(yb, 0, tc, p0, p20, log_n, tc["inv_w8"], BT, N)


run_case("fwd_v3_mxu", fwd_v3, n_loops_lo=16384, n_loops_hi=262144)
run_case("inv_v3_mxu", inv_v3, n_loops_lo=16384, n_loops_hi=262144)


def inv_v3b(x, tc):
    tc = dict(tc)
    tc["mxu_consts"] = _MXU_CONSTS
    yb = x.reshape(BT * (N // 128), 128)
    return pk._inv_ntt_v3b(yb, 0, tc, p0, p20, log_n, tc["inv_w8"], BT, N)


run_case("inv_v3b_block_stages", inv_v3b, n_loops_lo=16384, n_loops_hi=262144)


def split_only(x, tc):
    L = pk._split4_i8(x.reshape(BT * (N // 128), 128))
    return (L[:, :128].astype(jnp.int32).astype(jnp.uint32)
            + L[:, 128:256].astype(jnp.int32).astype(jnp.uint32)).reshape(BT, N) + x


run_case("split4_only", split_only, n_loops_lo=16384, n_loops_hi=262144)


# 8. in-situ-shaped: 4 fwd transforms (one per prime), chained
def fwd4(x, tc):
    outs = []
    for pi in range(P):
        p = np.uint32(tabs.plan.primes[pi])
        p2 = np.uint32(2 * int(tabs.plan.primes[pi]))
        outs.append(pk._fwd_ntt_v2(x, pi, tc, p, p2, log_n))
    o = outs[0]
    for q in outs[1:]:
        o = o ^ q
    return o


run_case("fwd4_primes_v2", fwd4, n_loops_lo=4096, n_loops_hi=65536)


def fwd4_v1(x, tc):
    outs = []
    for pi in range(P):
        p = np.uint32(tabs.plan.primes[pi])
        p2 = np.uint32(2 * int(tabs.plan.primes[pi]))
        outs.append(pk._fwd_ntt(x, pi, tc, p, p2, log_n))
    o = outs[0]
    for q in outs[1:]:
        o = o ^ q
    return o


run_case("fwd4_primes_v1", fwd4_v1, n_loops_lo=4096, n_loops_hi=65536)

if out_path:
    sink.close()
