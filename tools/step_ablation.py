"""In-situ ablation of the fused blind-rotation step kernel.

Times the production-shaped step (batch 256, unroll 2, 2_2 params, 4 primes)
with one stage removed at a time; the difference vs the full kernel is that
stage's in-situ cost. Long scans (two-point 16 vs 272 steps, ~0.8 s of
device work) so tunnel RTT jitter is negligible.

Run: python tools/step_ablation.py [out.jsonl] [v1]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")

from tfhe_tpu.ops import ntt as ntt_mod
from tfhe_tpu.ops import pbs_kernel as pk
from tfhe_tpu.utils.params import PARAM_MESSAGE_2_CARRY_2_KS_PBS as PARAMS

out_path = sys.argv[1] if len(sys.argv) > 1 else None
use_v2 = "v1" not in sys.argv[2:]
use_mxu = "v3" in sys.argv[2:]
sink = open(out_path, "a") if out_path else sys.stdout

n = PARAMS.polynomial_size
R = PARAMS.glwe_dimension + 1
levels = PARAMS.pbs_level
base_log = PARAMS.pbs_base_log
P = 4
batch = 256
unroll = 2
rng = np.random.default_rng(4)

a = jnp.asarray(rng.integers(0, 2 * n, size=(unroll, batch, 1), dtype=np.uint32))
bsk = jnp.asarray(
    rng.integers(0, ntt_mod.PRIMES32[0],
                 size=(unroll, 2, P, levels * R, R, n), dtype=np.uint32)
)
hi0 = jnp.asarray(rng.integers(0, 1 << 32, size=(R, batch, n), dtype=np.uint32))
lo0 = jnp.asarray(rng.integers(0, 1 << 32, size=(R, batch, n), dtype=np.uint32))


def time_variant(ablate, lo_steps=8, hi_steps=144):
    step_fn = pk._build_step_fn(n, P, base_log, levels, R, 8, unroll,
                                use_v2=use_v2, ablate=ablate, use_mxu=use_mxu)

    def make(n_steps):
        def many(hi, lo):
            def body(carry, _):
                h, l = carry
                return step_fn(a, bsk, h, l), None

            (h, l), _ = lax.scan(body, (hi, lo), None, length=n_steps)
            return h, l

        return jax.jit(many)

    def t(fn):
        out = fn(hi0, lo0)
        jax.device_get(out[0])
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(hi0, lo0)
            jax.device_get(out[0])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_lo = t(make(lo_steps))
    t_hi = t(make(hi_steps))
    per_ct_step = max(t_hi - t_lo, 1e-12) / ((hi_steps - lo_steps) * unroll * batch)
    return per_ct_step


full = time_variant("")
print(json.dumps({"variant": "full", "v2": use_v2, "mxu": use_mxu,
                  "us_per_ct_step": full * 1e6,
                  "implied_pbs_s": 1.0 / (full * PARAMS.lwe_dimension)}),
      file=sink, flush=True)
for abl in ["ntt", "mac", "rot", "decomp", "crt"]:
    try:
        v = time_variant(abl)
        print(json.dumps({
            "variant": f"no_{abl}", "us_per_ct_step": v * 1e6,
            "stage_share": 1.0 - v / full,
        }), file=sink, flush=True)
    except Exception as e:
        print(json.dumps({"variant": f"no_{abl}",
                          "error": f"{type(e).__name__}: {e}"[:300]}),
              file=sink, flush=True)
if out_path:
    sink.close()
