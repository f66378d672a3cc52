"""Round-2b kernel experiments: candidate replacements for the v3 MXU
small-stage DFT glue, timed standalone on the real chip (same two-point
loop-count method as tools/ntt_variants.py).

Candidates:
  - offset limb split (shift/and/sub, bias folded into the recombination
    constant) vs balanced split (carry chain);
  - merged single [512,512] int8 matmul vs 4x [512,128];
  - pair-fold recombination (2 int32 folds + 2 reductions, bounds verified
    exactly against the per-prime matrix row sums at table-build time) vs
    the u64-assembly recombination;
  - inverse big stages: 3-D concat slices (v3b) vs sublane rolls.

Run: python tools/ntt_v3c_experiments.py [out.jsonl]
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

out_path = sys.argv[1] if len(sys.argv) > 1 else None
sink = open(out_path, "a") if out_path else sys.stdout

N = 2048
P = 4
BT = 8
tabs = pk._get_tables(N, P)
log_n = 11
plan = tabs.plan

# ---------------------------------------------------------------------------
# build v3c tables (numpy, host side)
# ---------------------------------------------------------------------------

OFFSET = 128 * 0x01010101  # sum of +128 per offset limb


def build_v3c(pi: int, inverse: bool):
    """Merged [512, 512] int8 matrix + recombination constants for prime pi.

    Data limbs are OFFSET limbs: d_j = ((v >> 8j) & 255) - 128, so
    v = sum d_j 2^{8j} + OFFSET; the matrix is the same balanced limb stack
    as v3 (columns j hold limb j of [2^{8i} M mod p] rows); the extra
    OFFSET * colsum term is folded into a per-lane bias row.

    Pair-fold exactness: |U_0 + 256*U_1| and |U_2 + 256*U_3| must stay
    below 2^31; verified against the exact row-sum bounds.
    """
    p = int(plan.primes[pi])
    src = tabs.inv_w8[pi] if inverse else tabs.fwd_w8[pi]  # [4, 512, 128] int8
    W = np.concatenate([src[j] for j in range(4)], axis=1)  # [512, 512]
    # exact bounds per output limb j: max over out-lane of sum |W_j| * 128
    bnd = [
        int((np.abs(src[j].astype(np.int64)).sum(axis=0) * 128).max())
        for j in range(4)
    ]
    assert bnd[0] + 256 * bnd[1] < 2**31 - 1, (pi, inverse, bnd)
    assert bnd[2] + 256 * bnd[3] < 2**31 - 1, (pi, inverse, bnd)
    # recomb constants
    c16 = (1 << 16) % p
    c16_sh = (c16 << 32) // p
    one_sh = (1 << 32) // p
    # bias row[lane]: corrections for (a) the +2^31 bias added to V0 and V1
    # (V1 scaled by 2^16), (b) the OFFSET * colsum term of the offset split.
    M = np.zeros((4, 128), dtype=object)
    colsum = src.astype(np.int64).sum(axis=1)  # [4, 128] sum over 512 rows
    bias_row = np.zeros(128, dtype=np.uint64)
    for lane in range(128):
        # the 2^{8i} limb scaling lives inside the stacked matrix, so the
        # per-limb +128 offset corrects as 128 * colsum (NOT OFFSET * colsum)
        off_term = 128 * sum(int(colsum[j, lane]) << (8 * j) for j in range(4))
        corr = (-(1 << 31) * (1 + (1 << 16)) + off_term) % p
        bias_row[lane] = corr
    return W.astype(np.int8), np.uint32(c16), np.uint32(c16_sh), np.uint32(one_sh), bias_row.astype(np.uint32)


V3C = {}
for pi in range(P):
    V3C[(pi, False)] = build_v3c(pi, False)
    V3C[(pi, True)] = build_v3c(pi, True)

w8m_fwd = np.stack([V3C[(pi, False)][0] for pi in range(P)])  # [P,512,512]
w8m_inv = np.stack([V3C[(pi, True)][0] for pi in range(P)])
bias_fwd = np.stack([V3C[(pi, False)][4] for pi in range(P)])  # [P,128]
bias_inv = np.stack([V3C[(pi, True)][4] for pi in range(P)])
consts_fwd = [
    (int(V3C[(pi, False)][1]), int(V3C[(pi, False)][2]), int(V3C[(pi, False)][3]))
    for pi in range(P)
]
consts_inv = [
    (int(V3C[(pi, True)][1]), int(V3C[(pi, True)][2]), int(V3C[(pi, True)][3]))
    for pi in range(P)
]

_TABS = ("tw_fwd", "tw_fwd_sh", "tw_inv", "tw_inv_sh", "twist", "twist_sh",
         "untwist", "untwist_sh", "upper", "tw_fwd_col", "tw_fwd_col_sh",
         "tw_inv_col", "tw_inv_col_sh", "fwd_w8", "inv_w8")
tab_arrays = [jnp.asarray(getattr(tabs, nm)) for nm in _TABS]
EXTRA = {"w8m_fwd": jnp.asarray(w8m_fwd), "w8m_inv": jnp.asarray(w8m_inv),
         "bias_fwd": jnp.asarray(bias_fwd), "bias_inv": jnp.asarray(bias_inv)}
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.integers(0, plan.primes[0], (BT, N), np.uint32))

_MXU_CONSTS = tuple(
    (int(tabs.c32[i]), int(tabs.c32_sh[i]), int(tabs.one_sh[i]),
     int(tabs.recomb_bias[i])) for i in range(P)
)


# ---------------------------------------------------------------------------
# v3c building blocks
# ---------------------------------------------------------------------------

def _split4_i8_offset(x):
    """u32 < 2^30 -> 4 offset base-256 int8 limbs on the lane axis."""
    v = x.astype(I32)
    limbs = []
    for j in range(4):
        d = ((v >> I32(8 * j)) & I32(255)) - I32(128) if j else (v & I32(255)) - I32(128)
        limbs.append(d.astype(jnp.int8))
    return jnp.concatenate(limbs, axis=-1)


def _mxu_small_dft_v3c(y, pi, w8m_ref, bias_ref, consts, p):
    """[rows,128] u32 (<p) -> [rows,128] u32 (<2p): merged matmul + offset
    split + pair-fold recombination."""
    c16, c16_sh, one_sh = (U32(c) for c in consts)
    L = _split4_i8_offset(y)  # [rows, 512]
    U = lax.dot_general(
        L, w8m_ref[pi], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [rows, 512] int32
    U0, U1 = U[:, :128], U[:, 128:256]
    U2, U3 = U[:, 256:384], U[:, 384:512]
    V0 = U0 + (U1 << I32(8))
    V1 = U2 + (U3 << I32(8))
    V0u = pltpu.bitcast(V0, jnp.uint32) ^ U32(0x80000000)
    V1u = pltpu.bitcast(V1, jnp.uint32) ^ U32(0x80000000)
    q0 = pk._mul_hi(V0u, one_sh)
    r0 = V0u - q0 * p  # < 2p
    r1 = pk._shoup(V1u, c16, c16_sh, p)  # < 2p
    s = pk._condsub(r0 + r1, U32(2) * p)
    s = s + bias_ref[pi][None, :]
    return pk._condsub(s, U32(2) * p)  # < 2p


def fwd_v3c(x, tc):
    p = np.uint32(plan.primes[0])
    p2 = np.uint32(2 * int(plan.primes[0]))
    x = pk._shoup(x, tc["twist"][0], tc["twist_sh"][0], p)
    for s in range(tabs.first_small_stage):
        h = (N >> s) >> 1
        x = pk._fwd_stage_sliced(
            x, h, tc["tw_fwd"][0, s][None], tc["tw_fwd_sh"][0, s][None], p, p2
        )
    x = pk._condsub(x, p)
    y = x.reshape(BT * (N // 128), 128)
    out = _mxu_small_dft_v3c(y, 0, tc["w8m_fwd"], tc["bias_fwd"], consts_fwd[0], p)
    return out.reshape(BT, N)


def inv_v3c(x, tc):
    """v3c small DFT + v3b-style 3-D big stages."""
    p = np.uint32(plan.primes[0])
    p2 = np.uint32(2 * int(plan.primes[0]))
    yb = x.reshape(BT * (N // 128), 128)
    yb = pk._condsub(yb, p)
    z = _mxu_small_dft_v3c(yb, 0, tc["w8m_inv"], tc["bias_inv"], consts_inv[0], p)
    g = N // 128
    y3 = z.reshape(BT, g, 128)
    for s in reversed(range(tabs.first_small_stage)):
        h = (N >> s) >> 1
        hg = h // 128
        w3 = tc["tw_inv"][0, s].reshape(g, 128)
        ws3 = tc["tw_inv_sh"][0, s].reshape(g, 128)
        pieces = []
        for b in range(g // (2 * hg)):
            u = y3[:, b * 2 * hg : b * 2 * hg + hg, :]
            v = y3[:, b * 2 * hg + hg : (b + 1) * 2 * hg, :]
            w = w3[b * 2 * hg + hg : (b + 1) * 2 * hg][None]
            ws = ws3[b * 2 * hg + hg : (b + 1) * 2 * hg][None]
            bw = pk._shoup(v, w, ws, p)
            pieces.append(pk._condsub(u + bw, p2))
            pieces.append(pk._condsub(u + p2 - bw, p2))
        y3 = jnp.concatenate(pieces, axis=1)
    utw = tc["untwist"][0].reshape(1, g, 128)
    utws = tc["untwist_sh"][0].reshape(1, g, 128)
    y3 = pk._shoup(y3, utw, utws, p)
    return pk._condsub(y3, p).reshape(BT, N)


def inv_v3c_rolls(x, tc):
    """v3c small DFT + big stages via sublane rolls on the 3-D group axis."""
    p = np.uint32(plan.primes[0])
    p2 = np.uint32(2 * int(plan.primes[0]))
    yb = x.reshape(BT * (N // 128), 128)
    yb = pk._condsub(yb, p)
    z = _mxu_small_dft_v3c(yb, 0, tc["w8m_inv"], tc["bias_inv"], consts_inv[0], p)
    g = N // 128
    y3 = z.reshape(BT, g, 128)
    gidx = lax.broadcasted_iota(U32, (1, g, 1), 1)
    for s in reversed(range(tabs.first_small_stage)):
        h = (N >> s) >> 1
        hg = h // 128
        w3 = tc["tw_inv"][0, s].reshape(1, g, 128)
        ws3 = tc["tw_inv_sh"][0, s].reshape(1, g, 128)
        upper = ((gidx % U32(2 * hg)) < U32(hg))
        bw = pk._shoup(y3, w3, ws3, p)  # valid at lower positions
        a = pk._condsub(y3 + pltpu.roll(bw, np.int32(g - hg), axis=1), p2)
        b = pk._condsub(pltpu.roll(y3, np.int32(hg), axis=1) + p2 - bw, p2)
        y3 = jnp.where(upper, a, b)
    utw = tc["untwist"][0].reshape(1, g, 128)
    utws = tc["untwist_sh"][0].reshape(1, g, 128)
    y3 = pk._shoup(y3, utw, utws, p)
    return pk._condsub(y3, p).reshape(BT, N)


def fwd_v3_base(x, tc):
    tc = dict(tc)
    tc["mxu_consts"] = _MXU_CONSTS
    y = pk._fwd_ntt_v3(x, 0, tc, np.uint32(plan.primes[0]),
                       np.uint32(2 * int(plan.primes[0])), log_n, tc["fwd_w8"])
    return y.reshape(BT, N)


def inv_v3b_base(x, tc):
    tc = dict(tc)
    tc["mxu_consts"] = _MXU_CONSTS
    yb = x.reshape(BT * (N // 128), 128)
    return pk._inv_ntt_v3b(yb, 0, tc, np.uint32(plan.primes[0]),
                           np.uint32(2 * int(plan.primes[0])), log_n,
                           tc["inv_w8"], BT, N)


# matmul-only probes
def mm4_only(x, tc):
    y = x.reshape(BT * (N // 128), 128)
    L = pk._split4_i8(pk._condsub(y, np.uint32(plan.primes[0])))
    acc = None
    for j in range(4):
        u = lax.dot_general(L, tc["fwd_w8"][0, j], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        acc = u if acc is None else acc + u
    return (acc.astype(U32)).reshape(BT, N) + x


def mm1_only(x, tc):
    y = x.reshape(BT * (N // 128), 128)
    L = _split4_i8_offset(pk._condsub(y, np.uint32(plan.primes[0])))
    U = lax.dot_general(L, tc["w8m_fwd"][0], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    acc = U[:, :128] + U[:, 128:256] + U[:, 256:384] + U[:, 384:512]
    return (acc.astype(U32)).reshape(BT, N) + x


def mm1_rows256(x, tc):
    """Same MACs per data element, but 256-row matmul: does doubling the row
    dim amortize MXU weight-load overhead? (Counts as TWO transforms of
    work, so us_per_loop/2 is the per-[8,2048] cost.)"""
    y = x.reshape(BT * (N // 128), 128)
    L = _split4_i8_offset(pk._condsub(y, np.uint32(plan.primes[0])))
    L2 = jnp.concatenate([L, L], axis=0)  # [256, 512]
    U = lax.dot_general(L2, tc["w8m_fwd"][0], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    acc = (U[:128, :128] + U[128:, :128] + U[:128, 128:256]
           + U[128:, 384:512])
    return (acc.astype(U32)).reshape(BT, N) + x


def mm1_rows512(x, tc):
    """4x rows (counts as FOUR transforms of matmul work)."""
    y = x.reshape(BT * (N // 128), 128)
    L = _split4_i8_offset(pk._condsub(y, np.uint32(plan.primes[0])))
    L2 = jnp.concatenate([L, L, L, L], axis=0)  # [512, 512]
    U = lax.dot_general(L2, tc["w8m_fwd"][0], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    acc = (U[:128, :128] + U[128:256, :128] + U[256:384, 128:256]
           + U[384:, 384:512])
    return (acc.astype(U32)).reshape(BT, N) + x


# ---------------------------------------------------------------------------
# correctness check (CPU interpret or TPU, small loop) then timing
# ---------------------------------------------------------------------------

_EXTRA_NAMES = list(EXTRA.keys())


def run_case(name, body_fn, n_loops_lo=16384, n_loops_hi=262144, check_against=None):
    def kernel(n_ref, x_ref, *refs):
        tab_refs, o_ref = refs[:-1], refs[-1]
        tabs_c = {nm: r[:] for nm, r in
                  zip(list(_TABS) + _EXTRA_NAMES, tab_refs)}
        tabs_c["first_small"] = tabs.first_small_stage

        def step(i, x):
            return body_fn(x, tabs_c)

        o_ref[:] = lax.fori_loop(0, n_ref[0], step, x_ref[:])

    all_tabs = tab_arrays + [EXTRA[k] for k in _EXTRA_NAMES]
    try:
        interpret = jax.default_backend() == "cpu"
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((BT, N), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + len(all_tabs)),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        fn = jax.jit(lambda c, v, *t: call(c, v, *t))
        one = jnp.full((1,), 1, jnp.int32)
        got = np.asarray(fn(one, x0, *all_tabs))
        if check_against is not None:
            want = np.asarray(fn_cache[check_against](one, x0, *all_tabs))
            if not np.array_equal(got % np.uint32(plan.primes[0]),
                                  want % np.uint32(plan.primes[0])):
                bad = int((got % np.uint32(plan.primes[0]) !=
                           want % np.uint32(plan.primes[0])).sum())
                print(json.dumps({"metric": name, "MISMATCH": bad}),
                      file=sink, flush=True)
                return
        fn_cache[name] = fn
        lo = jnp.full((1,), n_loops_lo, jnp.int32)
        hi = jnp.full((1,), n_loops_hi, jnp.int32)

        def timed(nn):
            out = fn(nn, x0, *all_tabs)
            jax.device_get(out)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = fn(nn, x0, *all_tabs)
                jax.device_get(out)
                ts.append(time.perf_counter() - t0)
            return float(np.min(ts))

        t_lo = timed(lo)
        t_hi = timed(hi)
        per = max(t_hi - t_lo, 1e-12) / (n_loops_hi - n_loops_lo)
        print(json.dumps({"metric": name, "us_per_loop": per * 1e6,
                          "t_lo": t_lo, "t_hi": t_hi}), file=sink, flush=True)
    except Exception as e:
        print(json.dumps({"metric": name,
                          "error": f"{type(e).__name__}: {e}"[:500]}),
              file=sink, flush=True)


fn_cache = {}

run_case("fwd_v3_base", fwd_v3_base)
run_case("fwd_v3c", fwd_v3c, check_against="fwd_v3_base")
run_case("inv_v3b_base", inv_v3b_base)
run_case("inv_v3c", inv_v3c, check_against="inv_v3b_base")
run_case("inv_v3c_rolls", inv_v3c_rolls, check_against="inv_v3b_base")
run_case("mm4_only", mm4_only)
run_case("mm1_only", mm1_only)
run_case("mm1_rows256", mm1_rows256, n_loops_lo=8192, n_loops_hi=131072)
run_case("mm1_rows512", mm1_rows512, n_loops_lo=8192, n_loops_hi=131072)

if out_path:
    sink.close()
