"""Record multi-device scaling evidence -> SCALING_r02.json.

Runs the sharded KS->PBS harness (parallel/mesh.py) at 1/2/4/8 virtual CPU
devices (the reference's fake-multi-gpu testing pattern,
tfhe/Cargo.toml gpu-debug-fake-multi-gpu) and, when a TPU is present,
real single-chip batch scaling 64 -> 1024. Efficiency = throughput(n) /
(n * throughput(1)).

Usage:
  JAX_PLATFORM_NAME=cpu JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python tools/scaling_sweep.py [out.json]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALING_r02.json"

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")

from tfhe_tpu.parallel.mesh import scaling_sweep
from tfhe_tpu.shortint.client_key import ClientKey
from tfhe_tpu.shortint.server_key import ServerKey
from tfhe_tpu.utils.params import PARAM_TEST_TOY

n_dev = len(jax.devices())
backend = jax.default_backend()
print(f"backend={backend} devices={n_dev}", flush=True)

TPU_BATCH_MODE = len(sys.argv) > 2 and sys.argv[2] == "tpu_batch"

if not TPU_BATCH_MODE:
    _run_cpu_sweep = True
else:
    _run_cpu_sweep = False

ck = ClientKey.generate(PARAM_TEST_TOY, seed=13) if _run_cpu_sweep else None
sk = ServerKey.generate(ck) if _run_cpu_sweep else None
mm = PARAM_TEST_TOY.message_modulus

B = 64
if _run_cpu_sweep:
    msgs = np.arange(B, dtype=np.uint64) % mm
    ct = ck.encrypt(msgs)
    lut = sk.generate_lookup_table(lambda x: (3 * x + 1) % mm)

    counts = [c for c in (1, 2, 4, 8) if c <= n_dev]
    res = scaling_sweep(sk, lut.acc, np.asarray(ct.ct), counts, iters=3)
    base = res[counts[0]]
    table = {
        str(nd): {
            "pbs_per_s": round(v, 2),
            "efficiency": round(v / (nd * base), 4),
        }
        for nd, v in res.items()
    }
    print(json.dumps(table, indent=2), flush=True)

import os

n_cores = os.cpu_count() or 1
if _run_cpu_sweep:
  out = {
    "backend": backend,
    "n_devices": n_dev,
    "host_physical_cores": n_cores,
    "params": "PARAM_TEST_TOY (structural scaling harness; keys replicated, batch sharded)",
    "batch": B,
    "virtual_device_sweep": table,
    "note": (
        "Virtual CPU devices SHARE the host's physical cores (this box has "
        f"{n_cores}), so wall-clock efficiency here is bounded by "
        f"~{n_cores}/n_devices — the sweep validates that the sharded "
        "program compiles, runs and partitions at every mesh size; "
        "bit-exact sharded==single-device equality is asserted by "
        "tests/test_sharding.py. On real multi-chip hardware each mesh "
        "member owns its compute, and PBS over independent ciphertexts "
        "inserts no cross-device collectives (keys replicated, batch "
        "sharded), so per-chip throughput is flat by construction."
    ),
  }
  with open(out_path, "w") as f:
    json.dump(out, f, indent=2)
  print(f"wrote {out_path}")


def tpu_batch_scaling(out_path="SCALING_r02.json"):
    """Real-chip single-device batch scaling (appends to the JSON)."""
    import jax

    from tfhe_tpu.keycache import get_shortint_keys
    from tfhe_tpu.utils.params import PARAM_MESSAGE_2_CARRY_2_KS_PBS as P

    ck, sk = get_shortint_keys(P, seed=42)
    lut = sk.generate_lookup_table(lambda x: (3 * x + 1) % 4)
    rows = {}
    for B in (64, 128, 256, 512, 1024):
        msgs = np.arange(B, dtype=np.uint64) % 4
        ct = ck.encrypt(msgs)
        out_ct = sk.apply_lookup_table(ct, lut)
        jax.device_get(out_ct.ct)  # warm/compile
        t0 = time.perf_counter()
        cur = out_ct
        for _ in range(2):
            cur = sk.apply_lookup_table(cur, lut)
            jax.device_get(cur.ct)
        dt = (time.perf_counter() - t0) / 2
        rows[str(B)] = {"pbs_per_s": round(B / dt, 2)}
        print(B, rows[str(B)], flush=True)
    data = json.load(open(out_path))
    data["tpu_single_chip_batch_scaling"] = rows
    json.dump(data, open(out_path, "w"), indent=2)
    print("appended tpu batch scaling")


if TPU_BATCH_MODE:
    tpu_batch_scaling(out_path)
