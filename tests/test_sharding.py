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


_NO_COLLECTIVES_BODY = r"""
import os
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as Pspec
assert len(jax.devices()) == 8, jax.devices()

import __graft_entry__ as ge
from tfhe_tpu.parallel.mesh import make_batch_mesh
from tfhe_tpu.utils.params import PARAM_TEST_TOY as P

mesh = make_batch_mesh(8)
ksk, bsk = ge._synthetic_v6_key_arrays(P)
batch = 16
rng = np.random.default_rng(2)
ct = jnp.asarray(rng.integers(
    0, 2**64, size=(batch, P.glwe_dimension * P.polynomial_size + 1),
    dtype=np.uint64))
lut = jnp.zeros((P.glwe_size, P.polynomial_size), dtype=jnp.uint64)
ct_sh = NamedSharding(mesh, Pspec("batch"))
rep = NamedSharding(mesh, Pspec())
step = jax.jit(ge._ks_pbs_step_v6(P),
               in_shardings=(ct_sh, rep, rep, rep), out_shardings=ct_sh)
compiled = step.lower(ct, lut, ksk, bsk).compile()
hlo = compiled.as_text()
bad = [op for op in ("all-reduce", "all-gather", "collective-permute",
                     "reduce-scatter", "all-to-all")
       if op in hlo]
assert not bad, f"collectives found in sharded KS->PBS HLO: {bad}"
print("NO_COLLECTIVES_OK", len(hlo))
"""


def test_sharded_ks_pbs_hlo_has_no_collectives():
    """The scaling claim in parallel/mesh.py as a TEST: with batch sharded
    and keys replicated, the compiled v6 KS->PBS HLO contains zero
    cross-device collectives (the PBS is embarrassingly parallel; ICI is
    touched only by the initial scatter / final gather outside the jit)."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-c", _NO_COLLECTIVES_BODY],
        env=env, cwd=repo, capture_output=True, text=True, timeout=1200,
    )
    assert "NO_COLLECTIVES_OK" in r.stdout, r.stdout + "\n" + r.stderr
