"""Thin-client SDK (tfhe_tpu.client — the js_on_wasm_api analog):

1. the whole client surface imports and runs in a subprocess where the jax
   package is masked (what a pyodide/edge deployment looks like);
2. ciphertexts produced there are bit-identical to full-stack encryptions
   from the same seed, and the serialized envelope round-trips into the
   server stack, which can compute on it.

Reference: tfhe/src/js_on_wasm_api/ (client-side keygen/encrypt/serialize).
"""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent

CLIENT_SCRIPT = r"""
import sys

# Mask jax BEFORE anything imports it (sitecustomize may have preloaded it:
# drop those modules, then block re-import).
for m in [k for k in sys.modules if k == "jax" or k.startswith("jax.")]:
    del sys.modules[m]


import importlib.abc


class _Blocker(importlib.abc.MetaPathFinder):
    def find_spec(self, name, path=None, target=None):
        if name.split(".")[0] in ("jax", "jaxlib"):
            raise ImportError(f"jax is masked in the thin-client test: {name}")


sys.meta_path.insert(0, _Blocker())
sys.path.insert(0, %(root)r)

import numpy as np

from tfhe_tpu import client
from tfhe_tpu.utils.params import PARAM_TEST_TOY

assert "jax" not in sys.modules, "client import chain pulled in jax"

ck = client.ClientKey.generate(PARAM_TEST_TOY, seed=1234)
ct = client.encrypt_radix(ck, np.uint64(173), 4)
assert isinstance(ct.ct, np.ndarray), type(ct.ct)
assert int(client.decrypt_radix(ck, ct)[0]) == 173
sct = client.encrypt_signed_radix(ck, -5, 4)
assert int(client.decrypt_signed_radix(ck, sct)[0]) == -5

blob = client.serialize_radix(ct)
open(%(out)r, "wb").write(blob)
kblob = client.serialize_client_key(ck)
open(%(kout)r, "wb").write(kblob)

# compact-list building + client-side ZK proving (js_on_wasm_api parity:
# the browser client proves locally, the server only verifies)
from tfhe_tpu.utils.params import (
    CompactPublicKeyEncryptionParameters, DynamicDistribution,
)

PKE = CompactPublicKeyEncryptionParameters(
    encryption_lwe_dimension=16,
    encryption_noise_distribution=DynamicDistribution.t_uniform(3),
    message_modulus=4,
    carry_modulus=4,
    name="TOY_PKE_CLIENT",
)
cpriv, cpk = client.generate_compact_keys(PKE, seed=7)
clist = client.build_compact_list(cpk, [9, 3], num_blocks=2)
assert clist.count == 4
crs = client.client_crs(PKE, max_bin_messages=4, seed=2, scheme="v2")
proven = client.build_proven_compact_list(
    cpk, [9, 3], num_blocks=2, crs=crs, metadata=b"cm")
open(%(lout)r, "wb").write(client.serialize_compact_list(proven.ct_list))
open(%(pout)r, "wb").write(client.serialize_proof(proven.proofs[0]))
assert "jax" not in sys.modules, "client operations pulled in jax"
print("CLIENT-OK")
"""


def test_binary_polymul_numpy_twin_bit_exact():
    """The thin client's numpy negacyclic shift-and-add must equal the
    CRT-NTT path bit-for-bit (same u64 ring)."""
    from tfhe_tpu.core import algorithms as algo

    r = np.random.default_rng(5)
    for n, k in [(16, 1), (64, 2), (256, 1)]:
        s = r.integers(0, 2, size=(k, n)).astype(np.uint64)
        a = r.integers(0, 1 << 64, size=(3, k, n), dtype=np.uint64)
        want = algo._binary_polymul_batch(s, a)
        got = algo._binary_polymul_batch_np(s, a)
        np.testing.assert_array_equal(got, want)


def test_client_without_jax_interop(tmp_path):
    out = str(tmp_path / "ct.bin")
    kout = str(tmp_path / "ck.bin")
    lout = str(tmp_path / "clist.bin")
    pout = str(tmp_path / "proof.bin")
    script = CLIENT_SCRIPT % {"root": str(ROOT), "out": out, "kout": kout,
                              "lout": lout, "pout": pout}
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        env=env, timeout=540,
    )
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-3000:])
    assert "CLIENT-OK" in r.stdout

    # server side (jax available): read the envelope, compute, decrypt
    from tfhe_tpu.utils.serialization import deserialize
    from tfhe_tpu.integer.radix import ClientKey as IntCk, ServerKey as IntSk
    from tfhe_tpu.utils.params import PARAM_TEST_TOY
    from tfhe_tpu import client as cl

    ct = deserialize(open(out, "rb").read(), expected_type="RadixCiphertext")
    ick = IntCk.generate(PARAM_TEST_TOY, seed=1234)
    # bit-identical to a full-stack encryption from the same seed
    full = ick.encrypt_radix(np.uint64(173), 4)
    assert np.array_equal(np.asarray(full.ct), np.asarray(ct.ct))
    isk = IntSk.generate(ick)
    doubled = isk.add_parallelized(ct, ct)
    assert int(np.atleast_1d(ick.decrypt_radix(doubled))[0]) == (173 * 2) % 256
    # the client key envelope restores a working key
    ck2 = deserialize(open(kout, "rb").read(), expected_type="ShortintClientKey")
    assert int(cl.decrypt_radix(ck2, ct)[0]) == 173

    # server side of the ZK flow: regenerate pk/crs from the same seeds,
    # deserialize the client-built compact list + proof, verify, expand,
    # decrypt (the verify_and_expand path of compact_list.rs:638)
    from tfhe_tpu.utils.params import (
        CompactPublicKeyEncryptionParameters, DynamicDistribution,
    )
    from tfhe_tpu.zk.proven_list import ProvenCompactCiphertextList

    PKE = CompactPublicKeyEncryptionParameters(
        encryption_lwe_dimension=16,
        encryption_noise_distribution=DynamicDistribution.t_uniform(3),
        message_modulus=4,
        carry_modulus=4,
        name="TOY_PKE_CLIENT",
    )
    cpriv, cpk = cl.generate_compact_keys(PKE, seed=7)
    crs = cl.client_crs(PKE, max_bin_messages=4, seed=2, scheme="v2")
    clist = deserialize(open(lout, "rb").read(),
                        expected_type="CompactCiphertextList")
    proof = deserialize(open(pout, "rb").read(), expected_type="PkeV2Proof")
    proven = ProvenCompactCiphertextList(
        ct_list=clist, proofs=[proof], metadata=b"cm")
    expanded = proven.verify_and_expand(crs, cpk, metadata=b"cm")
    dec = cpriv.decrypt_expanded(np.asarray(expanded.ct))
    # radix digits of [9, 3] at message_modulus 4, 2 blocks each
    assert list(dec) == [1, 2, 3, 0]
    assert not proven.verify(crs, cpk, metadata=b"wrong-metadata")
