"""Golden test vectors: every intermediate of a KS->PBS atomic pattern from a
fixed seed, with SHA-256 checksums (regression anchor).

Mirrors the reference's ``apps/test-vectors`` (main.rs: RAND_SEED 0x74666865,
toy geometry n=10/k=1/N=256) and ``scripts/test_vectors.sh`` checksum gate.
NB: the reference repo ships its vector *data* via Git LFS (not available in
this environment), so these vectors anchor THIS framework's determinism; the
cross-library byte comparison is tracked for when the LFS data is reachable.

Usage:  python apps/test_vectors.py generate [outdir]
        python apps/test_vectors.py check    [outdir]
"""

import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RAND_SEED = 0x74666865

TOY = dict(lwe_dimension=10, glwe_dimension=1, polynomial_size=256,
           pbs_base_log=23, pbs_level=1, ks_base_log=3, ks_level=5)


def generate(outdir: str) -> dict:
    import jax.numpy as jnp

    from tfhe_tpu.shortint.client_key import ClientKey
    from tfhe_tpu.shortint.server_key import ServerKey
    from tfhe_tpu.ops import server as so, ntt as ntt_mod
    from tfhe_tpu.ops.pbs_kernel import scan_to_legacy_layout
    from tfhe_tpu.utils.params import PARAM_TEST_TOY, DynamicDistribution
    from dataclasses import replace

    p = replace(
        PARAM_TEST_TOY,
        lwe_dimension=TOY["lwe_dimension"],
        polynomial_size=TOY["polynomial_size"],
        lwe_noise_distribution=DynamicDistribution.gaussian_from_std_dev(0.0),
        glwe_noise_distribution=DynamicDistribution.gaussian_from_std_dev(0.0),
        name="TEST_VECTORS_TOY",
    )
    ck = ClientKey.generate(p, seed=RAND_SEED)
    sk = ServerKey.generate(ck)
    A, B = 3, 2
    mm = p.message_modulus

    vecs = {}
    vecs["large_lwe_secret_key"] = ck.big_lwe_sk.bits
    vecs["small_lwe_secret_key"] = ck.lwe_sk.bits
    vecs["ksk"] = np.asarray(sk.ksk)
    lwe_a = ck.encrypt(np.uint64(A))
    lwe_b = ck.encrypt(np.uint64(B))
    vecs["lwe_a"] = np.asarray(lwe_a.ct)
    vecs["lwe_b"] = np.asarray(lwe_b.ct)
    vecs["lwe_sum"] = np.asarray(lwe_a.ct + lwe_b.ct)
    vecs["lwe_prod"] = np.asarray(lwe_a.ct * jnp.uint64(B))

    ks = so.keyswitch_mxu(lwe_a.ct, sk.ksk_i8, p.ks_base_log, p.ks_level)
    vecs["lwe_ks"] = np.asarray(ks)
    N = p.polynomial_size
    logm = N.bit_length()
    msm, msb = so.lwe_standard_modulus_switch(ks, logm)
    vecs["lwe_ms"] = np.concatenate(
        [np.asarray(msm).reshape(-1), np.asarray(msb).reshape(1)]
    )

    plan = ntt_mod.get_plan(N, sk.num_primes)
    bsk_legacy = scan_to_legacy_layout(sk.bsk_scan, p.pbs_level)
    for tag, f in (("id", lambda x: x), ("spec", lambda x: (2 * x) % (mm * p.carry_modulus))):
        lut = sk.generate_lookup_table(f)
        from tfhe_tpu.ops.server import blind_rotate, sample_extract

        rotated = blind_rotate(
            jnp.broadcast_to(lut.acc, lut.acc.shape), msm, msb, bsk_legacy,
            p.pbs_base_log, p.pbs_level, plan,
        )
        vecs[f"glwe_after_{tag}_br"] = np.asarray(rotated)
        vecs[f"lwe_after_{tag}_pbs"] = np.asarray(sample_extract(rotated, 0))

    os.makedirs(outdir, exist_ok=True)
    sums = {}
    for name, arr in vecs.items():
        path = os.path.join(outdir, f"{name}.npy")
        np.save(path, np.ascontiguousarray(arr))
        sums[name] = hashlib.sha256(np.ascontiguousarray(arr).tobytes()).hexdigest()
    with open(os.path.join(outdir, "checksums.json"), "w") as f:
        json.dump(sums, f, indent=1, sort_keys=True)
    return sums


def check(outdir: str) -> bool:
    import tempfile

    with open(os.path.join(outdir, "checksums.json")) as f:
        want = json.load(f)
    with tempfile.TemporaryDirectory() as td:
        got = generate(td)
    ok = True
    for k in sorted(want):
        if want[k] != got.get(k):
            print(f"MISMATCH {k}: {want[k][:16]} != {got.get(k, 'missing')[:16]}")
            ok = False
    print("OK: all vectors reproduce" if ok else "FAIL")
    return ok


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "check"
    outdir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "test_vectors_data"
    )
    if cmd == "generate":
        sums = generate(outdir)
        print(json.dumps(sums, indent=1, sort_keys=True))
    else:
        sys.exit(0 if check(outdir) else 1)
