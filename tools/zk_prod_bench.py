"""ZK pke_v2 at PRODUCTION dimensions (VERDICT r3 #5).

Generates a real-dimension CRS for
PARAM_PKE_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128 (d = 2048, t_uniform(17),
zk_scheme V2 — reference `tfhe-zk-pok/src/proofs/pke_v2.rs:638` sizing),
encrypts-and-proves a compact list of 4 FheUint64s (128 2-bit blocks in one
shared-mask bin set), verifies, and prints wall times as JSON lines.

Run: python tools/zk_prod_bench.py [--k K] [--out ZK_PROD.json]
CPU-only (the ZK surface is host-side by design).
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=128,
                    help="messages per proof bin (128 = 4 x FheUint64 at "
                         "2-bit blocks)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import numpy as np

    from tfhe_tpu.shortint.compact_public_key import (
        CompactPrivateKey, CompactPublicKey)
    from tfhe_tpu.utils.params_registry import get as params_by_name
    from tfhe_tpu.zk.proven_list import (
        ProvenCompactCiphertextList, crs_for_params_v2)

    P = params_by_name("PARAM_PKE_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128")
    rows = []

    def emit(rec):
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    t0 = time.perf_counter()
    crs = crs_for_params_v2(P, max_bin_messages=args.k, seed=1)
    t_crs = time.perf_counter() - t0
    emit({"metric": "zk_v2_crs_generate", "seconds": round(t_crs, 2),
          "d": crs.d, "k": crs.k, "n": crs.n, "big_d": crs.big_d,
          "m_bound": crs.m_bound, "g1_points": 2 * crs.n,
          "g2_points": crs.n})

    priv = CompactPrivateKey.generate(P, seed=7)
    pk = CompactPublicKey.generate(priv)
    # 4 x FheUint64 = 128 blocks of 2 bits
    rng = np.random.default_rng(3)
    msgs = [int(x) for x in rng.integers(0, 4, args.k)]

    t0 = time.perf_counter()
    lst = ProvenCompactCiphertextList.encrypt_and_prove(
        pk, msgs, crs, metadata=b"zk-prod-bench")
    t_prove = time.perf_counter() - t0
    emit({"metric": "zk_v2_encrypt_and_prove", "seconds": round(t_prove, 2),
          "messages": args.k,
          "proof_bytes": sum(len(p.to_bytes()) for p in lst.proofs)})

    t0 = time.perf_counter()
    ok = lst.verify(crs, pk, metadata=b"zk-prod-bench")
    t_verify = time.perf_counter() - t0
    emit({"metric": "zk_v2_verify", "seconds": round(t_verify, 2),
          "ok": bool(ok)})
    assert ok

    # tamper check: a flipped body must fail
    lst.ct_list.bodies[0] += np.uint64(1 << 59)
    t0 = time.perf_counter()
    bad = lst.verify(crs, pk, metadata=b"zk-prod-bench")
    emit({"metric": "zk_v2_verify_tampered",
          "seconds": round(time.perf_counter() - t0, 2),
          "rejected": not bad})
    assert not bad

    if args.out:
        with open(args.out, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
