"""Per-kernel roofline microbenchmarks for the PBS hot path.

Mirrors the reference's per-layer criterion benches
(``tfhe-benchmark/benches/core_crypto/pbs_bench.rs:16,232,646``) but at the
*kernel* altitude: each stage of the fused blind-rotation step is timed in
isolation inside a Pallas kernel and reported against an estimated chip
roofline so the "speed-of-light" claim is checkable from the repo.

Measurement method: the axon TPU tunnel adds ~30-50 ms of dispatch+sync
latency per call, so every microbench loops in-kernel with a RUNTIME trip
count and reports (t(hi) - t(lo)) / (hi - lo) — fixed overheads cancel
exactly and one compile serves both points.

Stages measured (all on [Bt, N] u32 tiles, the kernel's native layout):
  - fwd_ntt / inv_ntt     per-prime negacyclic NTT (butterflies/s)
  - mac                   pointwise Shoup MAC against GGSW rows
  - rotate                per-sublane monomial rotation (u64 limb pair)
  - decompose             balanced signed digit extraction
  - step                  the whole fused step (classic blind-rotation step)
  - keyswitch_mxu         int8 MXU keyswitch (int8 MAC/s)

Roofline model (TPU v5e, 1 core): VPU = 8 sublanes x 128 lanes x 4 ALUs
@ ~1.74 GHz ~= 7.1e12 elementary int32 ops/s; MXU int8 ~= 394e12 MAC/s.
u32 multiplies may occupy >1 ALU slot, so VPU fractions are a lower bound.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ntt as ntt_mod
from . import pbs_kernel as pk

VPU_PEAK = 7.1e12  # elementary ops/s (v5e estimate, 4 ALUs)
MXU_INT8_PEAK = 394e12  # int8 MAC/s (v5e)

_LOOPS_LO, _LOOPS_HI = 2048, 65536


def _time_fn(fn, *args, iters: int = 5, reduce: str = "median") -> float:
    """Wall seconds of jitted ``fn`` (device_get to force sync —
    block_until_ready does not block under the axon tunnel).

    ``reduce``: "median" (default) or "min".  The tunnel's jitter is
    additive and positive (±100-300 ms per dispatch), so for two-point
    deltas the MIN is the unbiased estimator — the round-3/4 fused-step
    rows degenerated to t_hi - t_lo <= 0 under median-of-5.
    """
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts) if reduce == "min" else np.median(ts))


def _checked_per_unit(t_lo: float, t_hi: float, units: float, metric: str,
                      lo_bound: float, hi_bound: float) -> float:
    """(t_hi - t_lo)/units with a physicality gate: a nonphysical rate
    (KERNELS_r04's 5.98e17 ct-steps/s row) must fail, not ship."""
    per = (t_hi - t_lo) / units
    if not (lo_bound <= per <= hi_bound):
        raise RuntimeError(
            f"{metric}: nonphysical per-unit time {per:.3e}s "
            f"(t_lo={t_lo:.4f}s t_hi={t_hi:.4f}s, expected "
            f"[{lo_bound:.1e}, {hi_bound:.1e}]) — increase the hi/lo "
            f"separation or re-run; refusing to emit a garbage row")
    return per


def _time_delta(fn, lo: int, hi: int, *args, iters: int = 5) -> float:
    """Per-loop seconds via the two-point trick; fn(n_loops_arr, *args)."""
    nlo = jnp.full((1,), lo, jnp.int32)
    nhi = jnp.full((1,), hi, jnp.int32)
    t_lo = _time_fn(fn, nlo, *args, iters=iters)
    t_hi = _time_fn(fn, nhi, *args, iters=iters)
    return max(t_hi - t_lo, 1e-12) / (hi - lo)


def _looped_pallas(kernel, out_shape_dtype, n_vmem_in: int, interpret):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(*out_shape_dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_vmem_in,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )


_TAB_NAMES = ("tw_fwd", "tw_fwd_sh", "tw_inv", "tw_inv_sh", "twist",
              "twist_sh", "untwist", "untwist_sh", "upper")


def bench_ntt(n: int = 2048, num_primes: int = 4, bt: int = 8,
              direction: str = "fwd") -> dict:
    """One-prime negacyclic NTT throughput in the kernel's lane layout."""
    tabs = pk._get_tables(n, num_primes)
    log_n = n.bit_length() - 1
    p = np.uint32(tabs.plan.primes[0])
    p2 = np.uint32(2 * int(tabs.plan.primes[0]))
    tab_arrays = [jnp.asarray(getattr(tabs, nm)) for nm in _TAB_NAMES]

    def kernel(n_ref, x_ref, *refs):
        tab_refs, o_ref = refs[:-1], refs[-1]
        tabs_c = {nm: r[:] for nm, r in zip(_TAB_NAMES, tab_refs)}

        def step(i, x):
            if direction == "fwd":
                return pk._fwd_ntt(x, 0, tabs_c, p, p2, log_n)
            return pk._inv_ntt(x, 0, tabs_c, p, p2, log_n)

        o_ref[:] = lax.fori_loop(0, n_ref[0], step, x_ref[:])

    interpret = jax.default_backend() == "cpu"
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, int(p), size=(bt, n), dtype=np.uint32)
    )
    call = _looped_pallas(kernel, ((bt, n), jnp.uint32),
                          1 + len(tab_arrays), interpret)
    fn = jax.jit(lambda c, v, *tabs_in: call(c, v, *tabs_in))
    t = _time_delta(fn, _LOOPS_LO, _LOOPS_HI, x, *tab_arrays)
    butterflies = bt * (n // 2) * log_n  # per loop iteration
    est_ops = butterflies * 14.0
    return {
        "metric": f"ntt_{direction}_N{n}",
        "value": butterflies / t,
        "unit": "butterflies/s",
        "seconds_per_batch8_transform": t,
        "vpu_fraction_est": est_ops / t / VPU_PEAK,
    }


def bench_pointwise_mac(n: int = 2048, bt: int = 64, terms: int = 2) -> dict:
    """Shoup MAC: acc += d * g for ``terms`` GGSW rows, one prime."""
    p = np.uint32(ntt_mod.PRIMES32[0])
    p2 = np.uint32(2 * ntt_mod.PRIMES32[0])
    rng = np.random.default_rng(1)
    g = jnp.asarray(rng.integers(0, int(p), size=(terms, n), dtype=np.uint32))
    gs = jnp.asarray(rng.integers(0, 1 << 31, size=(terms, n), dtype=np.uint32))

    def kernel(n_ref, x_ref, g_ref, gs_ref, o_ref):
        def step(i, x):
            acc = None
            for j in range(terms):
                term = pk._shoup(x, g_ref[j][None], gs_ref[j][None], p)
                acc = term if acc is None else pk._condsub(acc + term, p2)
            return acc

        o_ref[:] = lax.fori_loop(0, n_ref[0], step, x_ref[:])

    interpret = jax.default_backend() == "cpu"
    x = jnp.asarray(rng.integers(0, int(p), size=(bt, n), dtype=np.uint32))
    call = _looped_pallas(kernel, ((bt, n), jnp.uint32), 3, interpret)
    fn = jax.jit(lambda c, v, gg, ggs: call(c, v, gg, ggs))
    t = _time_delta(fn, _LOOPS_LO, _LOOPS_HI, x, g, gs)
    macs = bt * n * terms
    return {
        "metric": "pointwise_shoup_mac",
        "value": macs / t,
        "unit": "MAC/s",
        "vpu_fraction_est": macs * 19.0 / t / VPU_PEAK,
    }


def bench_rotate(n: int = 2048, bt: int = 8) -> dict:
    """Monomial rotation of a (hi, lo) u64 poly by per-sublane amounts."""
    log_2n = n.bit_length()
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.integers(0, 1 << 32, size=(2, bt, n), dtype=np.uint32))
    a = jnp.asarray(rng.integers(0, 2 * n, size=(bt, 1), dtype=np.uint32))

    def kernel(n_ref, x_ref, a_ref, o_ref):
        lane_idx = lax.broadcasted_iota(jnp.uint32, (1, n), 1)

        def step(i, hl):
            hi, lo = pk._negacyclic_rot(hl[0], hl[1], a_ref[:], lane_idx, log_2n)
            return (hi, lo)

        hi, lo = lax.fori_loop(0, n_ref[0], step, (x_ref[0], x_ref[1]))
        o_ref[0] = hi
        o_ref[1] = lo

    interpret = jax.default_backend() == "cpu"
    call = _looped_pallas(kernel, ((2, bt, n), jnp.uint32), 2, interpret)
    fn = jax.jit(lambda c, v, aa: call(c, v, aa))
    t = _time_delta(fn, _LOOPS_LO, _LOOPS_HI, x, a)
    return {
        "metric": "negacyclic_rotate",
        "value": bt / t,
        "unit": "u64-poly-rotations/s",
        "seconds_per_batch8_rotation": t,
    }


def bench_decompose(n: int = 2048, bt: int = 64, base_log: int = 23,
                    levels: int = 1) -> dict:
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, 1 << 32, size=(2, bt, n), dtype=np.uint32))

    def kernel(n_ref, x_ref, o_ref):
        def step(i, hl):
            hi, lo = hl
            digs = pk._decompose_u32(hi, lo, base_log, levels)
            d = digs[0]
            for dd in digs[1:]:
                d = d + dd
            return (hi + d.astype(jnp.uint32), lo)

        hi, lo = lax.fori_loop(0, n_ref[0], step, (x_ref[0], x_ref[1]))
        o_ref[0] = hi
        o_ref[1] = lo

    interpret = jax.default_backend() == "cpu"
    call = _looped_pallas(kernel, ((2, bt, n), jnp.uint32), 1, interpret)
    fn = jax.jit(lambda c, v: call(c, v))
    t = _time_delta(fn, _LOOPS_LO, _LOOPS_HI, x)
    return {"metric": "decompose", "value": bt * n / t, "unit": "coeff-decomp/s"}


def bench_step(params=None, batch: int = 256, lo_steps: int = 8,
               hi_steps: int = 300) -> dict:
    """The fused classic blind-rotation step at production shape: per
    (ciphertext x step) seconds via two scan lengths (overheads cancel)."""
    from ..utils.params import PARAM_MESSAGE_2_CARRY_2_KS_PBS

    p = params or PARAM_MESSAGE_2_CARRY_2_KS_PBS
    n = p.polynomial_size
    R = p.glwe_dimension + 1
    levels = p.pbs_level
    base_log = p.pbs_base_log
    P = 4
    rng = np.random.default_rng(4)

    unroll = 2
    step_fn = pk._build_step_fn(n, P, base_log, levels, R, 8, unroll)
    a = jnp.asarray(rng.integers(0, 2 * n, size=(unroll, batch, 1), dtype=np.uint32))
    bsk = jnp.asarray(
        rng.integers(0, ntt_mod.PRIMES32[0],
                     size=(unroll, 2, P, levels * R, R, n), dtype=np.uint32)
    )
    hi = jnp.asarray(rng.integers(0, 1 << 32, size=(R, batch, n), dtype=np.uint32))
    lo = jnp.asarray(rng.integers(0, 1 << 32, size=(R, batch, n), dtype=np.uint32))

    def make(n_steps):
        def many(hi, lo):
            def body(carry, _):
                h, l = carry
                h, l = step_fn(a, bsk, h, l)
                return (h, l), None

            (h, l), _ = lax.scan(body, (hi, lo), None, length=n_steps)
            return h, l

        return jax.jit(many)

    t_lo = _time_fn(make(lo_steps), hi, lo, reduce="min")
    t_hi = _time_fn(make(hi_steps), hi, lo, reduce="min")
    sec_per_ct_step = _checked_per_unit(
        t_lo, t_hi, (hi_steps - lo_steps) * unroll * batch,
        "fused_step", 5e-8, 1e-4)
    pbs_s = 1.0 / (sec_per_ct_step * p.lwe_dimension)
    return {
        "metric": "fused_step",
        "value": 1.0 / sec_per_ct_step,
        "unit": "ct-steps/s",
        "seconds_per_ct_step": sec_per_ct_step,
        "implied_blind_rotate_pbs_per_s": pbs_s,
    }


def bench_step_v6(params=None, batch: int = 1024, batch_tile: int = 16,
                  unroll: int = 2, lo_steps: int = 16,
                  hi_steps: int = 742) -> dict:
    """The SHIPPED v6 (2-prime BNF) fused step at the production
    configuration (Bt=16, unroll=2, real BNF key with true Shoup duals —
    synthetic inconsistent duals break the approx-Shoup contract, see
    PERF_NOTES.md).

    Measurement: min-of-5 two-point (the ablation harness's method —
    tunnel jitter is additive-positive, so median-of-5 at 300 steps
    produced t_hi - t_lo <= 0 in rounds 3 AND 4); hi = 742 scan bodies
    (~1.1 s of device work at the known 0.75 us/ct-step) so the delta is
    >= 3x the worst-case jitter, plus a physicality gate."""
    from . import bnf2 as b2
    from .pbs_kernel import bsk_to_scan_layout  # noqa: F401 (layout doc)
    from ..utils.params import PARAM_MESSAGE_2_CARRY_2_KS_PBS

    p = params or PARAM_MESSAGE_2_CARRY_2_KS_PBS
    n = p.polynomial_size
    R = p.glwe_dimension + 1
    levels = p.pbs_level
    base_log = p.pbs_base_log
    G = n // 128
    rng = np.random.default_rng(7)

    # acc32=True: time the SHIPPED single-plane accumulator kernel (the
    # round-3 version of this bench built the acc64 variant and its
    # two-point delta degenerated to <= 0 under tunnel jitter)
    step_fn = pk._build_step_fn_v4(n, 2, base_log, levels, R, batch_tile,
                                   unroll, acc32=True, bnf2=True)
    tabs4 = pk._get_tables_v4(n, 2, base_log)
    bsk_std = rng.integers(0, 1 << 64, size=(unroll, levels, R, R, n),
                           dtype=np.uint64)
    bsk_scan = b2.bootstrap_key_to_bnf2(bsk_std)  # [U, 2, 2, l*R, R, N]
    perm = jnp.asarray(tabs4.perm_from_plan)
    bsk_step = bsk_scan[..., perm].reshape(bsk_scan.shape[:-1] + (G, 128))
    a = jnp.asarray(rng.integers(0, 2 * n, size=(unroll, 1, batch, 1),
                                 dtype=np.uint32))
    hi = jnp.asarray(rng.integers(0, 1 << 32, size=(R, G, batch, 128),
                                  dtype=np.uint32))

    def make(n_steps):
        def many(hi):
            def body(carry, _):
                return step_fn(a, bsk_step, carry), None

            h, _ = lax.scan(body, hi, None, length=n_steps)
            return h

        return jax.jit(many)

    t_lo = _time_fn(make(lo_steps), hi, reduce="min")
    t_hi = _time_fn(make(hi_steps), hi, reduce="min")
    sec_per_ct_step = _checked_per_unit(
        t_lo, t_hi, (hi_steps - lo_steps) * unroll * batch,
        "fused_step_v6", 5e-8, 1e-4)
    pbs_s = 1.0 / (sec_per_ct_step * p.lwe_dimension)
    # per-element VPU op estimate for the v6 step (2 primes): fwd/inv NTT
    # stages + tw + MAC + CRT merge + torus switch, from the kernel op mix
    return {
        "metric": "fused_step_v6",
        "value": 1.0 / sec_per_ct_step,
        "unit": "ct-steps/s",
        "batch": batch, "batch_tile": batch_tile, "unroll": unroll,
        "seconds_per_ct_step": sec_per_ct_step,
        "implied_blind_rotate_pbs_per_s": pbs_s,
    }


def bench_keyswitch(params=None, batch: int = 4096, lo: int = 2,
                    hi: int = 66) -> dict:
    from ..ops.server import keyswitch_mxu, ksk_to_i8_limbs
    from ..utils.params import PARAM_MESSAGE_2_CARRY_2_KS_PBS

    p = params or PARAM_MESSAGE_2_CARRY_2_KS_PBS
    n_in = p.glwe_dimension * p.polynomial_size
    n_out = p.lwe_dimension
    rng = np.random.default_rng(5)
    ksk = rng.integers(0, 1 << 64, size=(n_in, p.ks_level, n_out + 1),
                       dtype=np.uint64)
    ksk_i8 = jnp.asarray(ksk_to_i8_limbs(ksk, p.ks_base_log))
    ct = jnp.asarray(rng.integers(0, 1 << 64, size=(batch, n_in + 1),
                                  dtype=np.uint64))

    def make(n_loops):
        def many(c):
            out = c
            for _ in range(n_loops):
                ks = keyswitch_mxu(out, ksk_i8, p.ks_base_log, p.ks_level)
                # fold the result into EVERY input coordinate: with only
                # the first n_out+1 coords updated (the r5 version), the
                # decomposition of the untouched mask tail was identical
                # across iterations and XLA CSE'd it away — the marginal
                # loop cost collapsed and the row claimed 1.8x the int8
                # MXU peak. The LCG mix (~0.1 ms vs the ~3 ms KS) makes
                # every iteration's input distinct.
                out = out * jnp.uint64(6364136223846793005) + jnp.uint64(1)
                out = out.at[..., : n_out + 1].add(ks)
            # scalar reduction: fetching the raw [B, n_in+1] output (67 MB)
            # over the tunnel cost ~2.5 s per point and drowned the delta
            return out.sum()

        return jax.jit(many)

    # min-of-reps two-point with the physicality gate (the r4/r5 fused-step
    # lesson: tunnel jitter degenerates median two-point deltas; the r5
    # keyswitch row shipped 1.9e25 MAC/s before this gate existed here).
    # Bounds: a batch-4096 KS is ~34 G int8-MACs; [0.1 ms, 10 s] per loop.
    t_lo = _time_fn(make(lo), ct, reduce="min")
    t_hi = _time_fn(make(hi), ct, reduce="min")
    t = _checked_per_unit(t_lo, t_hi, hi - lo, "keyswitch_mxu",
                          1e-4, 10.0)
    macs = batch * (n_in * p.ks_level) * ((n_out + 1) * 8)
    row = {
        "metric": "keyswitch_mxu",
        "value": macs / t,
        "unit": "int8-MAC/s",
        "mxu_fraction": macs / t / MXU_INT8_PEAK,
        "ks_per_s": batch / t,
    }
    if row["mxu_fraction"] > 1.0:
        raise RuntimeError(f"keyswitch_mxu above int8 peak: {row}")
    return row


def bench_ntt_jnp(n: int = 16384, num_primes: int = 5, batch: int = 8,
                  lo: int = 1, hi: int = 9) -> dict:
    """XLA (non-Pallas) plan path at large N (BASELINE asks for N=2^14)."""
    plan = ntt_mod.get_plan(n, num_primes)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.integers(0, 1 << 63, size=(batch, n), dtype=np.uint64))

    def make(k):
        def many(v):
            out = v.astype(jnp.int64)
            for _ in range(k):
                h = plan.fwd_digits(out & jnp.int64((1 << 22) - 1))
                out = out + plan.inv(h)[0].astype(jnp.int64)
            return out

        return jax.jit(many)

    t_lo = _time_fn(make(lo), x)
    t_hi = _time_fn(make(hi), x)
    t = max(t_hi - t_lo, 1e-12) / (hi - lo)
    log_n = n.bit_length() - 1
    # per iteration: fwd + inv over num_primes residues
    butterflies = 2 * num_primes * batch * (n // 2) * log_n
    return {
        "metric": f"ntt_jnp_roundtrip_N{n}",
        "value": butterflies / t,
        "unit": "butterflies/s",
    }


def run_all(quick: bool = False) -> list[dict]:
    out = []
    out.append(bench_ntt(2048, 4, direction="fwd"))
    out.append(bench_ntt(2048, 4, direction="inv"))
    out.append(bench_pointwise_mac())
    out.append(bench_rotate())
    out.append(bench_decompose())
    out.append(bench_step())
    out.append(bench_step_v6())
    out.append(bench_keyswitch())
    if not quick:
        out.append(bench_ntt_jnp(16384, 5))
    return out
