"""Quick on-chip probe of v6 kernel knobs (garner_chunk, unroll, batch
tile) via the same two-scan-length child as tools/v6_ablate.py.

Run: python tools/v6_probe.py gch=0 gch=4 gch=8 bt=32 unroll=4
Each arg sets one knob off the default shipped config and prints one
JSON line with us_per_ct_step.
"""

import json
import os
import subprocess
import sys

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache_probe")
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
_ = np.asarray(out[0, 0, 0])
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    o = fn(lut, mask, body, bsk2)
    _ = np.asarray(o[0, 0, 0])
    ts.append(time.perf_counter() - t0)
t = min(ts)
print(json.dumps({"knobs": {k: os.environ.get(k, "") for k in
                            ("TFHE_V4_GARNER_CHUNK", "TFHE_UNROLL",
                             "TFHE_BATCH_TILE", "TFHE_V4_ACC")},
                  "seconds": round(t, 4),
                  "us_per_ct_step": round(t / NSTEPS / B * 1e6, 4),
                  "sanity": int(np.asarray(out[0, 0, 0]))}))
"""

KNOB_MAP = {"gch": "TFHE_V4_GARNER_CHUNK", "unroll": "TFHE_UNROLL",
            "bt": "TFHE_BATCH_TILE", "acc": "TFHE_V4_ACC"}


def run(spec: str):
    env = dict(os.environ)
    for item in filter(None, spec.split(",")):
        k, v = item.split("=")
        env[KNOB_MAP[k]] = v
    r = subprocess.run([sys.executable, "-c", CHILD], env=env,
                       capture_output=True, text=True, timeout=900)
    line = r.stdout.strip().split("\n")[-1] if r.stdout.strip() else ""
    try:
        rec = json.loads(line)
    except Exception:
        rec = {"error": (r.stderr or r.stdout)[-400:]}
    rec["spec"] = spec
    return rec


def main():
    for spec in sys.argv[1:] or [""]:
        print(json.dumps(run(spec)), flush=True)


if __name__ == "__main__":
    main()
