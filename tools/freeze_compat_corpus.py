"""Freeze the backward-compatibility corpus: one serialized artifact per
registered envelope type at deterministic toy parameters, written to
tests/data/ with a manifest. The analog of the reference's
``utils/tfhe-backward-compat-data`` repo: artifacts are frozen once per
format version and NEVER regenerated — tests/test_serialization.py
deserializes them through the upgrade chain forever.

Run once per format bump: python tools/freeze_compat_corpus.py
(refuses to overwrite existing artifacts unless --force).
"""

import hashlib
import json
import os
import sys

# artifacts are platform-independent data; pin to CPU so the freezer never
# routes toy keygen through the TPU tunnel
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "data")

SEED = 2024


def build_artifacts() -> dict:
    from tfhe_tpu.shortint import list_compression as lc
    from tfhe_tpu.shortint.client_key import ClientKey
    from tfhe_tpu.shortint.compact_public_key import (
        CompactPrivateKey, CompactPublicKey)
    from tfhe_tpu.shortint.compressed_server_key import CompressedServerKey
    from tfhe_tpu.shortint.noise_squashing import (
        NoiseSquashingKey, NoiseSquashingPrivateKey)
    from tfhe_tpu.shortint.server_key import ServerKey
    from tfhe_tpu.integer.radix import ClientKey as RadixClientKey
    from tfhe_tpu.utils import serialization as ser
    from tfhe_tpu.utils.params import (
        CompactPublicKeyEncryptionParameters, DynamicDistribution,
        PARAM_TEST_TOY, PARAM_TEST_TOY_SQUASH)
    from tfhe_tpu.zk.proven_list import (ProvenCompactCiphertextList,
                                         crs_for_params_v2)
    from tfhe_tpu.utils.csprng import EncryptionRandomGenerator

    out = {}
    ck = ClientKey.generate(PARAM_TEST_TOY, seed=SEED)
    sk = ServerKey.generate(ck)
    out["shortint_ck"] = ser.serialize_shortint_client_key(ck)
    out["shortint_sk"] = ser.serialize_shortint_server_key(sk)
    out["shortint_ct"] = ser.serialize_shortint_ciphertext(ck.encrypt(3))

    rck = RadixClientKey(ck)
    out["radix_ct"] = ser.serialize_radix(
        rck.encrypt_radix(np.array([1234], dtype=np.uint64), num_blocks=4))

    priv = NoiseSquashingPrivateKey.generate(ck, PARAM_TEST_TOY_SQUASH)
    nsk = NoiseSquashingKey.generate(ck, priv)
    out["squashed_ct"] = ser.serialize_squashed_ciphertext(
        nsk.squash_ciphertext_noise(sk, ck.encrypt(2)))

    cpriv = lc.new_compression_private_key(ck, lc.COMP_PARAM_TEST_TOY)
    comp_key, _dec = lc.new_compression_decompression_keys(ck, cpriv)
    cts = ck.encrypt(np.array([0, 1, 2], dtype=np.uint64))
    out["compressed_list"] = ser.serialize_compressed_list(
        lc.compress(comp_key, cts))

    P = CompactPublicKeyEncryptionParameters(
        encryption_lwe_dimension=16,
        encryption_noise_distribution=DynamicDistribution.t_uniform(3),
        message_modulus=4, carry_modulus=4, name="TOY_PKE_ZK")
    cpk_priv = CompactPrivateKey.generate(P, seed=SEED)
    pk = CompactPublicKey.generate(cpk_priv)
    enc_gen = EncryptionRandomGenerator(SEED + 1, SEED + 2)
    out["compact_list"] = ser.serialize_compact_list(
        pk.encrypt(np.array([1, 2, 3, 0], dtype=np.uint64), rng=enc_gen))

    # V2 scheme: serialize_zk_crs/serialize_zk_proof freeze the PkeV2
    # types (the reference's default ZK scheme since v0.11)
    zk_crs = crs_for_params_v2(P, max_bin_messages=4, seed=1)
    out["zk_crs"] = ser.serialize_zk_crs(zk_crs)
    lst = ProvenCompactCiphertextList.encrypt_and_prove(
        pk, [1, 2, 3, 0], zk_crs, metadata=b"md")
    out["zk_proof"] = ser.serialize_zk_proof(lst.proofs[0])

    ck2 = ClientKey.generate(PARAM_TEST_TOY, seed=SEED + 9)
    out["compressed_server_key"] = ser.serialize_compressed_server_key(
        CompressedServerKey.generate(ck2))
    return out


def main():
    force = "--force" in sys.argv
    arts = build_artifacts()
    manifest_path = os.path.join(DATA, "compat_manifest_v2.json")
    manifest = {"seed": SEED, "params": "PARAM_TEST_TOY", "artifacts": {}}
    for name, blob in arts.items():
        path = os.path.join(DATA, f"compat_{name}_v1.bin")
        if os.path.exists(path) and not force:
            print(f"keep   {path} (frozen)")
        else:
            with open(path, "wb") as f:
                f.write(blob)
            print(f"wrote  {path} ({len(blob)} bytes)")
        with open(path, "rb") as f:
            frozen = f.read()
        manifest["artifacts"][name] = {
            "file": os.path.basename(path),
            "sha256": hashlib.sha256(frozen).hexdigest(),
            "nbytes": len(frozen),
        }
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    print(f"manifest: {manifest_path}")


if __name__ == "__main__":
    main()
