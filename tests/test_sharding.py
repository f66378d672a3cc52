"""Multi-device batch sharding: sharded KS->PBS must equal the single-device
result bit-exactly (the analog of the reference's fake-multi-gpu testing,
tfhe/Cargo.toml gpu-debug-fake-multi-gpu).

Runs in a subprocess with 8 virtual CPU devices (XLA flags must be set
before JAX initializes; the main test process already holds a 1-device CPU
backend)."""

import os
import subprocess
import sys

import pytest

_SUBPROCESS_BODY = r"""
import os
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
import numpy as np
import jax
assert len(jax.devices()) == 8, jax.devices()

from tfhe_tpu.keycache import get_shortint_keys
from tfhe_tpu.parallel import mesh as pmesh
from tfhe_tpu.utils.params import PARAM_TEST_TOY as P

ck, sk = get_shortint_keys(P, seed=77)
msgs = np.arange(16, dtype=np.uint64) % 16
ct = ck.encrypt(msgs)
lut = sk.generate_lookup_table(lambda x: (7 * x + 1) % 16)

# single-device reference
ref = sk.apply_lookup_table(ct, lut)
ref_arr = np.asarray(ref.ct)

# sharded over an 8-device batch mesh
mesh = pmesh.make_batch_mesh(8)
run = pmesh.sharded_ks_pbs(sk, mesh)
out = np.asarray(jax.device_get(run(ct.ct, lut.acc)))
assert np.array_equal(out, ref_arr), "sharded != single-device"

# scaling harness executes at 1, 2, 4, 8 devices
res = pmesh.scaling_sweep(sk, lut.acc, ct.ct, [1, 2, 4, 8], iters=1)
assert set(res) == {1, 2, 4, 8} and all(v > 0 for v in res.values())
print("SHARDING_OK", {k: round(v, 1) for k, v in res.items()})
"""


def test_sharded_pbs_matches_single_device():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-c", _SUBPROCESS_BODY],
        env=env, cwd=repo, capture_output=True, text=True, timeout=1200,
    )
    assert "SHARDING_OK" in r.stdout, r.stdout + "\n" + r.stderr
