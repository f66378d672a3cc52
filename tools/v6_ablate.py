"""In-situ ablation of the v6 (2-prime BNF) blind-rotation kernel on the
real chip — clone of tools/v4_ablate.py with bnf2=True and a real BNF key
(rescaled torus values; consistent Shoup duals come from the key builder).

Run: python tools/v6_ablate.py            # all pieces
     python tools/v6_ablate.py rot inv    # a subset
"""

import json
import os
import subprocess
import sys

PIECES = ["rot", "decomp", "split", "fwd", "mac", "inv", "garner"]

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache_ablate")
from tfhe_tpu.ops import bnf2 as b2
from tfhe_tpu.ops import pbs_kernel as pk

N, BL, LEV, R, B, NSTEPS = 2048, 23, 1, 2, 1024, 742
rng = np.random.default_rng(0)
lut = jnp.asarray(rng.integers(0, 1 << 63, (B, R, N), dtype=np.uint64))
mask = jnp.asarray(rng.integers(0, 2 * N, (B, NSTEPS), dtype=np.uint64))
body = jnp.asarray(rng.integers(0, 2 * N, (B,), dtype=np.uint64))
bsk_std = rng.integers(0, 1 << 64, (NSTEPS, LEV, R, R, N), dtype=np.uint64)
bsk2 = b2.bootstrap_key_to_bnf2(bsk_std)

fn = jax.jit(lambda l, m, b, k: pk.blind_rotate_pallas(
    l, m, b, k, BL, LEV, b2.get_plan2(N), bnf2=True))
out = fn(lut, mask, body, bsk2)
_ = np.asarray(out[0, 0, 0])  # force compile + first run (axon fetch quirk)
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    o = fn(lut, mask, body, bsk2)
    _ = np.asarray(o[0, 0, 0])
    ts.append(time.perf_counter() - t0)
t = min(ts)
print(json.dumps({"ablate": os.environ.get("TFHE_V4_ABLATE", ""),
                  "seconds": round(t, 4),
                  "us_per_ct_step": round(t / NSTEPS / B * 1e6, 4),
                  "sanity": int(np.asarray(out[0, 0, 0]))}))
"""


def run(ablate: str):
    env = dict(os.environ, TFHE_V4_ABLATE=ablate)
    r = subprocess.run([sys.executable, "-c", CHILD], env=env,
                       capture_output=True, text=True, timeout=900)
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
