"""In-situ ablation of the v5 Goldilocks blind-rotation kernel on the real
chip (clone of tools/v4_ablate.py; see that file and PERF_NOTES.md for the
method and the axon fetch-forced-timing quirk).

Run: python tools/v5_ablate.py                 # all pieces
     python tools/v5_ablate.py tw_f stages_f   # a subset
"""

import json
import os
import subprocess
import sys

PIECES = ["rot", "decomp", "split", "matmul_f", "recomb_f", "tw_f",
          "stages_f", "mac", "stages_i", "tw_i", "matmul_i", "recomb_i",
          "modswitch"]

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache_ablate")
from tfhe_tpu.ops import goldilocks as gl
from tfhe_tpu.ops import pbs_kernel_g as kg

N, BL, LEV, R, B, NSTEPS = 2048, 23, 1, 2, 1024, 742
rng = np.random.default_rng(0)
lut = jnp.asarray(rng.integers(0, 1 << 63, (B, R, N), dtype=np.uint64))
mask = jnp.asarray(rng.integers(0, 2 * N, (B, NSTEPS), dtype=np.uint64))
body = jnp.asarray(rng.integers(0, 2 * N, (B,), dtype=np.uint64))
bsk_std = rng.integers(0, 1 << 64, (NSTEPS, LEV, R, R, N), dtype=np.uint64)
bsk_g = gl.bootstrap_key_to_goldilocks(bsk_std)

Bt = int(os.environ.get("TFHE_BATCH_TILE", "16"))
UN = int(os.environ.get("TFHE_UNROLL", "2"))
fn = jax.jit(lambda l, m, b, k: kg.blind_rotate_goldilocks_pallas(
    l, m, b, k, BL, LEV, batch_tile=Bt, unroll=UN))
out = fn(lut, mask, body, bsk_g)
_ = np.asarray(out[0, 0, 0])  # force compile + first run (axon quirk)
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    o = fn(lut, mask, body, bsk_g)
    _ = np.asarray(o[0, 0, 0])
    ts.append(time.perf_counter() - t0)
t = min(ts)
print(json.dumps({"ablate": os.environ.get("TFHE_V5_ABLATE", ""),
                  "bt": Bt, "unroll": UN,
                  "seconds": round(t, 4),
                  "us_per_ct_step": round(t / NSTEPS / B * 1e6, 4),
                  "sanity": int(np.asarray(out[0, 0, 0]))}))
"""


def run(ablate: str, extra_env=None):
    env = dict(os.environ, TFHE_V5_ABLATE=ablate)
    if extra_env:
        env.update(extra_env)
    r = subprocess.run([sys.executable, "-c", CHILD], env=env,
                       capture_output=True, text=True, timeout=1800)
    line = r.stdout.strip().split("\n")[-1] if r.stdout.strip() else ""
    try:
        return json.loads(line)
    except Exception:
        return {"ablate": ablate, "error": (r.stderr or r.stdout)[-400:]}


def main():
    pieces = sys.argv[1:] or PIECES
    full = run("")
    print(json.dumps(full), flush=True)
    base = full.get("us_per_ct_step")
    for piece in pieces:
        rec = run(piece)
        if base is not None and "us_per_ct_step" in rec:
            rec["marginal_us"] = round(base - rec["us_per_ct_step"], 4)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
