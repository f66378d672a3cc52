"""Per-piece timings of the v4 kernel vs v3c on the real chip.

Run: python tools/v4_probe.py
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
N, P, BT, BL = 2048, 4, 8, 23
G = N // 128
tabs4 = pk._get_tables_v4(N, P, BL)
tabs3 = pk._get_tables(N, P)

T4C = {
    "fwd_w8": jnp.asarray(tabs4.fwd_w8), "inv_w8": jnp.asarray(tabs4.inv_w8),
    "tw": jnp.asarray(tabs4.tw), "tw_inv": jnp.asarray(tabs4.tw_inv),
    "gw_fwd": jnp.asarray(tabs4.gw_fwd), "gw_inv": jnp.asarray(tabs4.gw_inv),
    "inv_bias": jnp.asarray(tabs4.inv_bias), "log_g": tabs4.log_g,
    "mxu_consts": tuple(
        (int(tabs4.c16[i]), int(tabs4.c16_sh[i]), int(tabs4.one_sh[i]))
        for i in range(P)),
}
_T4_NAMES = ["fwd_w8", "inv_w8", "tw", "tw_inv", "gw_fwd", "gw_inv",
             "inv_bias"]
T4_ARRAYS = [T4C[k] for k in _T4_NAMES]

_T3_NAMES = ("tw_fwd", "tw_fwd_sh", "tw_inv", "tw_inv_sh", "twist",
             "twist_sh", "untwist", "untwist_sh", "upper", "tw_fwd_col",
             "tw_fwd_col_sh", "tw_inv_col", "tw_inv_col_sh", "fwd_w8m",
             "inv_w8m", "fwd_bias_row", "inv_bias_row")
T3_ARRAYS = [jnp.asarray(getattr(tabs3, nm)) for nm in _T3_NAMES]
MXU3 = tuple((int(tabs3.c16[i]), int(tabs3.c16_sh[i]), int(tabs3.one_sh[i]))
             for i in range(P))

rng = np.random.default_rng(0)
p0 = np.uint32(tabs4.plan.primes[0])
p20 = np.uint32(2 * int(tabs4.plan.primes[0]))


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


def run_case(name, body, tab_arrays, lo=1 << 14, hi=1 << 18):
    def kernel(n_ref, x_ref, *refs):
        tab_refs, o_ref = refs[:-1], refs[-1]
        tabs_c = {nm: r for nm, r in zip(_names, tab_refs)}

        def step(i, x):
            return body(x, tabs_c)

        o_ref[:] = lax.fori_loop(0, n_ref[0], step, x_ref[:])

    _names = _cur_names
    try:
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((BT, G, 128), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + len(tab_arrays)),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=jax.default_backend() == "cpu",
        )
        fn = jax.jit(lambda c, v, *t: call(c, v, *t))
        x0 = jnp.asarray(
            rng.integers(0, p0, (BT, G, 128), np.uint32))
        t_lo = timed(fn, jnp.full((1,), lo, jnp.int32), x0, *tab_arrays)
        t_hi = timed(fn, jnp.full((1,), hi, jnp.int32), x0, *tab_arrays)
        per = max(t_hi - t_lo, 1e-12) / (hi - lo)
        print(json.dumps({"metric": name, "us_per_loop": round(per * 1e6, 4)}),
              flush=True)
    except Exception as e:
        print(json.dumps({"metric": name,
                          "error": f"{type(e).__name__}: {e}"[:300]}),
              flush=True)


def with_t4(tc):
    d = dict(tc)
    for k in _T4_NAMES:
        if k in ("fwd_w8", "inv_w8"):
            d[k] = pk._DotRef(d[k])
        else:
            d[k] = d[k][:]
    d["log_g"] = tabs4.log_g
    d["mxu_consts"] = T4C["mxu_consts"]
    return d


def v4_fwd(x, tc):
    tc = with_t4(tc)
    d = (x & U32(0x3FFFFF)).astype(I32) - I32(1 << 21)
    L = pk._split_digits_i8(d, tabs4.nl_in, tabs4.in_offset)
    return pk._fwd_ntt_v4(L, 0, tc, p0, p20, BT, G)


def v4_fwd_nosplit(x, tc):
    tc = with_t4(tc)
    L = jnp.concatenate(
        [x.reshape(BT * G, 128).astype(jnp.int8)] * 3, axis=-1)
    return pk._fwd_ntt_v4(L, 0, tc, p0, p20, BT, G)


def v4_inv(x, tc):
    tc = with_t4(tc)
    return pk._inv_ntt_v4(x, 0, tc, p0, p20, BT, G)


def v4_rot(x, tc):
    lane_idx = lax.broadcasted_iota(U32, (1, 1, 128), 2)
    a = (x[:, :1, :1] & U32(2 * N - 1))
    hi, lo = pk._negacyclic_rot_v4(x, x ^ U32(1), a, lane_idx, G, 12)
    return hi ^ lo


def v4_mac(x, tc):
    tc = with_t4(tc)
    g = tc["tw"][0][0][None]
    gs = tc["tw"][0][1][None]
    acc = None
    for j in range(2):
        t = pk._shoup(x, g, gs, p0)
        acc = t if acc is None else pk._condsub(acc + t, p20)
    return acc


_cur_names = _T4_NAMES
run_case("v4_fwd_with_split", v4_fwd, T4_ARRAYS)
run_case("v4_fwd_nosplit", v4_fwd_nosplit, T4_ARRAYS)
run_case("v4_inv", v4_inv, T4_ARRAYS)
run_case("v4_rot", v4_rot, T4_ARRAYS)
run_case("v4_mac2", v4_mac, T4_ARRAYS)


def v3_fwd(x, tc):
    tc = dict((k, v[:]) for k, v in tc.items())
    tc["first_small"] = tabs3.first_small_stage
    tc["mxu_consts"] = MXU3
    tc["fwd_bias"] = tc["fwd_bias_row"]
    tc["inv_bias"] = tc["inv_bias_row"]
    y = pk._fwd_ntt_v3(x.reshape(BT, N), 0, tc, p0, p20, 11, tc["fwd_w8m"])
    return y.reshape(BT, G, 128)


def v3_inv(x, tc):
    tc = dict((k, v[:]) for k, v in tc.items())
    tc["first_small"] = tabs3.first_small_stage
    tc["mxu_consts"] = MXU3
    tc["fwd_bias"] = tc["fwd_bias_row"]
    tc["inv_bias"] = tc["inv_bias_row"]
    y = pk._inv_ntt_v3b(x.reshape(BT * G, 128), 0, tc, p0, p20, 11,
                        tc["inv_w8m"], BT, N)
    return y.reshape(BT, G, 128)


_cur_names = _T3_NAMES
run_case("v3_fwd", v3_fwd, T3_ARRAYS)
run_case("v3_inv", v3_inv, T3_ARRAYS)


# --- sub-piece probes -------------------------------------------------------

def v4_groups_fwd(x, tc):
    tc = with_t4(tc)
    s = x
    for st in range(tabs4.log_g):
        h = (G >> st) >> 1
        w = tc["gw_fwd"][0, st, 0][None, :, None]
        wsh = tc["gw_fwd"][0, st, 1][None, :, None]
        pieces = []
        m = G >> st
        for b in range(G // m):
            a = s[:, b * m: b * m + h, :]
            bb = s[:, b * m + h: (b + 1) * m, :]
            u = pk._condsub(a + bb, p20)
            t = a + p20 - bb
            v = pk._shoup(t, w[:, b * m + h: (b + 1) * m, :],
                          wsh[:, b * m + h: (b + 1) * m, :], p0)
            pieces.extend([u, v])
        s = jnp.concatenate(pieces, axis=1)
    return s


def v4_matmul_fold(x, tc):
    tc = with_t4(tc)
    L = jnp.concatenate(
        [x.reshape(BT * G, 128).astype(jnp.int8)] * 3, axis=-1)
    U = lax.dot_general(L, tc["fwd_w8"][0], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    V0u, V1u = pk._pair_fold_u(U)
    return (V0u ^ V1u).reshape(BT, G, 128)


def v4_tw_recombine(x, tc):
    tc = with_t4(tc)
    tw = tc["tw"][0]
    s = pk._shoup(x, tw[0][None], tw[1][None], p0)
    s = s + pk._shoup(x, tw[2][None], tw[3][None], p0)
    s = pk._condsub(s, p20)
    return pk._condsub(s + tw[4][None], p20)


def v4_split4(x, tc):
    y = pk._condsub(x, p0)
    limbs = [((((y.reshape(BT * G, 128)).astype(I32) >> I32(8 * j)) & I32(255))
              - I32(128)).astype(jnp.int8) for j in range(4)]
    L = jnp.concatenate(limbs, axis=-1)
    return x + L[:, :128].astype(I32).astype(U32).reshape(BT, G, 128)


def v4_inv_matmul_recombine(x, tc):
    tc = with_t4(tc)
    y = pk._condsub(x, p0)
    limbs = [((((y.reshape(BT * G, 128)).astype(I32) >> I32(8 * j)) & I32(255))
              - I32(128)).astype(jnp.int8) for j in range(4)]
    L = jnp.concatenate(limbs, axis=-1)
    U = lax.dot_general(L, tc["inv_w8"][0], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    V0u, V1u = pk._pair_fold_u(U)
    c16, c16_sh, one_sh = T4C["mxu_consts"][0]
    q0 = pk._mul_hi(V0u, U32(one_sh))
    r0 = V0u - q0 * p0
    r1 = pk._shoup(V1u, U32(c16), U32(c16_sh), p0)
    s = pk._condsub(r0 + r1, p20)
    s = pk._condsub(s + tc["inv_bias"][0][None, :], p20)
    return pk._condsub(s, p0).reshape(BT, G, 128)


_cur_names = _T4_NAMES
run_case("v4_groups4_fwd", v4_groups_fwd, T4_ARRAYS)
run_case("v4_matmul_fold", v4_matmul_fold, T4_ARRAYS)
run_case("v4_tw_recombine", v4_tw_recombine, T4_ARRAYS)
run_case("v4_split4", v4_split4, T4_ARRAYS)
run_case("v4_inv_matmul_recombine", v4_inv_matmul_recombine, T4_ARRAYS)


# --- [G, Bt, 128] leading-group layout probes -------------------------------

def run_case_g(name, body, tab_arrays, lo=1 << 14, hi=1 << 18):
    def kernel(n_ref, x_ref, *refs):
        tab_refs, o_ref = refs[:-1], refs[-1]
        tabs_c = {nm: r for nm, r in zip(_T4_NAMES, tab_refs)}

        def step(i, x):
            return body(x, tabs_c)

        o_ref[:] = lax.fori_loop(0, n_ref[0], step, x_ref[:])

    try:
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((G, BT, 128), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + len(tab_arrays)),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=jax.default_backend() == "cpu",
        )
        fn = jax.jit(lambda c, v, *t: call(c, v, *t))
        x0 = jnp.asarray(rng.integers(0, p0, (G, BT, 128), np.uint32))
        t_lo = timed(fn, jnp.full((1,), lo, jnp.int32), x0, *tab_arrays)
        t_hi = timed(fn, jnp.full((1,), hi, jnp.int32), x0, *tab_arrays)
        per = max(t_hi - t_lo, 1e-12) / (hi - lo)
        print(json.dumps({"metric": name, "us_per_loop": round(per * 1e6, 4)}),
              flush=True)
    except Exception as e:
        print(json.dumps({"metric": name,
                          "error": f"{type(e).__name__}: {e}"[:300]}),
              flush=True)


def g_groups_fwd(x, tc):
    tc = with_t4(tc)
    s = x
    for st in range(tabs4.log_g):
        h = (G >> st) >> 1
        w = tc["gw_fwd"][0, st, 0][:, None, None]
        wsh = tc["gw_fwd"][0, st, 1][:, None, None]
        pieces = []
        m = G >> st
        for b in range(G // m):
            a = s[b * m: b * m + h]
            bb = s[b * m + h: (b + 1) * m]
            u = pk._condsub(a + bb, p20)
            t = a + p20 - bb
            v = pk._shoup(t, w[b * m + h: (b + 1) * m],
                          wsh[b * m + h: (b + 1) * m], p0)
            pieces.extend([u, v])
        s = jnp.concatenate(pieces, axis=0)
    return s


def g_tw_recombine(x, tc):
    tc = with_t4(tc)
    tw = tc["tw"][0]
    s = pk._shoup(x, tw[0][:, None, :], tw[1][:, None, :], p0)
    s = s + pk._shoup(x, tw[2][:, None, :], tw[3][:, None, :], p0)
    s = pk._condsub(s, p20)
    return pk._condsub(s + tw[4][:, None, :], p20)


def g_matmul_fold(x, tc):
    tc = with_t4(tc)
    L = jnp.concatenate(
        [x.reshape(G * BT, 128).astype(jnp.int8)] * 3, axis=-1)
    U = lax.dot_general(L, tc["fwd_w8"][0], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    V0u, V1u = pk._pair_fold_u(U)
    return (V0u ^ V1u).reshape(G, BT, 128)


def g_rot(x, tc):
    lane_idx = lax.broadcasted_iota(U32, (1, 1, 128), 2)
    a = (x[:1, :, :1] & U32(2 * N - 1))
    log_g = 4
    hi, lo = x, x ^ U32(1)
    for t in range(12):
        s = 1 << t
        bit = (a >> U32(t)) & U32(1)
        if s >= 128 * G:
            rhi, rlo = pk._neg64(hi, lo)
        elif s >= G:
            sl = s // G
            if sl < 128:
                rhi = pk._roll(hi, sl, 2)
                rlo = pk._roll(lo, sl, 2)
                nhi, nlo = pk._neg64(rhi, rlo)
                wrap = lane_idx < U32(sl)
                rhi = jnp.where(wrap, nhi, rhi)
                rlo = jnp.where(wrap, nlo, rlo)
            else:
                rhi, rlo = pk._neg64(hi, lo)
        else:
            def lr1(z):
                r = pk._roll(z, 1, 2)
                return r
            thi, tlo = hi[G - s:], lo[G - s:]
            rthi = pk._roll(thi, 1, 2)
            rtlo = pk._roll(tlo, 1, 2)
            nhi, nlo = pk._neg64(rthi, rtlo)
            wrap = lane_idx < U32(1)
            rthi = jnp.where(wrap, nhi, rthi)
            rtlo = jnp.where(wrap, nlo, rtlo)
            rhi = jnp.concatenate([rthi, hi[:G - s]], axis=0)
            rlo = jnp.concatenate([rtlo, lo[:G - s]], axis=0)
        take = bit != U32(0)
        hi = jnp.where(take, rhi, hi)
        lo = jnp.where(take, rlo, lo)
    return hi ^ lo


run_case_g("g_groups4_fwd", g_groups_fwd, T4_ARRAYS)
run_case_g("g_tw_recombine", g_tw_recombine, T4_ARRAYS)
run_case_g("g_matmul_fold", g_matmul_fold, T4_ARRAYS)
run_case_g("g_rot", g_rot, T4_ARRAYS)


def g_groups_fwd2(x, tc):
    tc = with_t4(tc)
    s = x
    for st in range(tabs4.log_g):
        h = (G >> st) >> 1
        w = tc["gw_fwd"][0, st, 0][:, None, :]
        wsh = tc["gw_fwd"][0, st, 1][:, None, :]
        pieces = []
        m = G >> st
        for b in range(G // m):
            a = s[b * m: b * m + h]
            bb = s[b * m + h: (b + 1) * m]
            u = pk._condsub(a + bb, p20)
            t = a + p20 - bb
            v = pk._shoup(t, w[b * m + h: (b + 1) * m],
                          wsh[b * m + h: (b + 1) * m], p0)
            pieces.extend([u, v])
        s = jnp.concatenate(pieces, axis=0)
    return s


def g_garner(x, tc):
    plan = tabs4.plan
    primes = plan.primes
    garner_inv = plan.garner_inv
    garner_inv_sh = [int(v) for v in plan.garner_inv_shoup]
    pj_sh = plan.pj_shoup
    prefix = plan.prefix_mod64
    full_prod = plan.full_prod_mod64
    m = [x, x ^ U32(1), x ^ U32(2), x ^ U32(3)]
    v = [m[0]]
    for i in range(1, P):
        pi_p = U32(primes[i])
        acc_g = v[i - 1]
        for j in range(i - 2, -1, -1):
            acc_g = v[j] + pk._shoup(
                acc_g, U32(primes[j]), U32(pj_sh[i][j]), pi_p)
        diff = U32(3 * primes[i]) + m[i] - acc_g
        vi = pk._shoup(diff, U32(garner_inv[i - 1]),
                       U32(garner_inv_sh[i - 1]), pi_p)
        v.append(pk._condsub(vi, pi_p))
    pos_hi = jnp.zeros_like(v[0])
    pos_lo = jnp.zeros_like(v[0])
    for i in range(P):
        pre = prefix[i]
        pre_lo = U32(pre & 0xFFFFFFFF)
        pre_hi = U32((pre >> 32) & 0xFFFFFFFF)
        thi, tlo = pk._mul_hi_lo(v[i], pre_lo)
        thi = thi + v[i] * pre_hi
        pos_hi, pos_lo = pk._add64(pos_hi, pos_lo, thi, tlo)
    neg_hi, neg_lo = pk._sub64(
        pos_hi, pos_lo,
        U32((full_prod >> 32) & 0xFFFFFFFF), U32(full_prod & 0xFFFFFFFF))
    sign = v[P - 1] > U32(primes[P - 1] // 2)
    return jnp.where(sign, neg_hi, pos_hi) ^ jnp.where(sign, neg_lo, pos_lo)


def g_decomp(x, tc):
    digs = pk._decompose_u32(x, x ^ U32(1), BL, 1)
    return digs[0].astype(U32)


run_case_g("g_groups4_fwd_lanerep", g_groups_fwd2, T4_ARRAYS)
run_case_g("g_garner_crt_1c", g_garner, T4_ARRAYS)
run_case_g("g_decomp", g_decomp, T4_ARRAYS)
