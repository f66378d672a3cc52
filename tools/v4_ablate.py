"""In-situ ablation of the v4 blind-rotation kernel on the real chip.

For each named piece, rebuilds the production scan with that piece replaced
by a shape-preserving stub (TFHE_V4_ABLATE env, see pbs_kernel.py) in a
fresh subprocess, and reports t_full - t_ablated as the piece's marginal
in-situ cost. Outputs are garbage under ablation; this is timing only.

Run: python tools/v4_ablate.py            # all pieces
     python tools/v4_ablate.py rot inv    # a subset
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
from tfhe_tpu.ops import pbs_kernel as pk
from tfhe_tpu.ops import ntt as ntt_mod

N, P, BL, LEV, R, B, NSTEPS = 2048, 4, 23, 1, 2, 1024, 742
plan = ntt_mod.NegacyclicNtt(N, num_primes=P)
rng = np.random.default_rng(0)
lut = jnp.asarray(rng.integers(0, 1 << 63, (B, R, N), dtype=np.uint64))
mask = jnp.asarray(rng.integers(0, 2 * N, (B, NSTEPS), dtype=np.uint64))
body = jnp.asarray(rng.integers(0, 2 * N, (B,), dtype=np.uint64))
# consistent (g, gsh) Shoup pairs per prime: with an inconsistent dual the
# product wraps mod 2^32 (not 0 mod p) and exact/approx shoup disagree
g = np.zeros((NSTEPS, 1, P, LEV * R, R, N), dtype=np.int64)
for i, p in enumerate(plan.primes):
    g[:, :, i] = rng.integers(0, int(p), (NSTEPS, 1, LEV * R, R, N),
                              dtype=np.int64)
ps = np.asarray(plan.primes, np.uint64).reshape(1, 1, P, 1, 1, 1)
gsh = ((g.astype(np.uint64) << np.uint64(32)) // ps).astype(np.int64)
bsk = jnp.asarray(np.concatenate([g, gsh], axis=1).astype(np.uint32))

fn = jax.jit(lambda l, m, b, k: pk.blind_rotate_pallas(
    l, m, b, k, BL, LEV, plan))
out = fn(lut, mask, body, bsk)
_ = np.asarray(out[0, 0, 0])  # force compile + first execution
# axon quirk: block_until_ready can return before execution happens (lazy
# remote scheduling); a host fetch of one element forces the whole program.
# Time (dispatch + fetch) per iteration and subtract nothing: the fetch
# itself is ~2% of a full blind rotation.
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    o = fn(lut, mask, body, bsk)
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
