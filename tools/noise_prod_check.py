"""On-chip empirical v6 noise validation at production 2_2 (VERDICT r4
Missing #6 / r5 task #7).

Runs the SHIPPED v6 atomic pattern (KS -> acc32 BNF PBS) at
PARAM_MESSAGE_2_CARRY_2_KS_PBS on the real chip, measures the output
phase error of >= 1k PBS samples against the identity LUT's exact
encoding, and compares the empirical variance to the closed form
``blind_rotate_additive_variance_exact + bnf_blind_rotate_extra_variance``
(core/noise_formulas.py). The r4 validation anchored the BNF terms
empirically only at toy geometry (N=256, CPU); this is the production-
scale, on-hardware anchor.

PBS output noise = blind-rotation accumulation only (the input/KS/MS
noise decides WHICH box the rotation lands in, not the in-box offset),
so the identity-LUT phase residual isolates exactly the terms the
formula predicts.

Run: python tools/noise_prod_check.py [--batch 2048] [--out NOISE.json]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    from tfhe_tpu.core import noise_formulas as nf
    from tfhe_tpu.ops import bnf2 as b2
    from tfhe_tpu.shortint.client_key import ClientKey
    from tfhe_tpu.shortint.server_key import ServerKey
    from tfhe_tpu.utils.params import PARAM_MESSAGE_2_CARRY_2_KS_PBS as P

    t0 = time.time()
    ck = ClientKey.generate(P, seed=20260820)
    sk = ServerKey.generate(ck)
    assert sk.ntt_variant in ("v6", "v6b"), sk.ntt_variant

    mm = P.message_modulus
    msgs = (np.arange(args.batch) % mm).astype(np.uint64)
    ct = ck.encrypt(msgs)
    lut = sk.generate_lookup_table(lambda x: x)
    out_ct = sk.apply_lookup_table(ct, lut)
    raw = np.asarray(ck.decrypt_raw(out_ct), dtype=np.uint64).reshape(-1)
    dec = np.asarray(ck.decrypt(out_ct), dtype=np.uint64).reshape(-1)
    correct = int((dec == msgs).sum())
    enc = np.array([sk.encoding.encode(int(m)) for m in msgs],
                   dtype=np.uint64)
    err = (raw - enc).astype(np.int64).astype(np.float64) / 2.0 ** 64
    emp_var = float(np.var(err))

    q = 2.0 ** 64
    bsk_var = P.glwe_noise_distribution.variance(q) / q ** 2
    exact = nf.blind_rotate_additive_variance_exact(
        P.lwe_dimension, P.glwe_dimension, P.polynomial_size,
        P.pbs_base_log, P.pbs_level, bsk_var)
    qp = b2.FAST28.qp if sk.ntt_variant == "v6b" else b2.QP
    extra = nf.bnf_blind_rotate_extra_variance(
        P.lwe_dimension, P.glwe_dimension, P.polynomial_size,
        P.pbs_base_log, P.pbs_level, float(qp), acc32=True)
    pred = exact + extra
    ratio = emp_var / pred

    rec = {
        "metric": "v6_prod_noise_validation",
        "variant": sk.ntt_variant,
        "params": P.name,
        "backend": jax.default_backend(),
        "samples": int(args.batch),
        "decrypt_correct": correct,
        "empirical_variance": emp_var,
        "predicted_exact": exact,
        "predicted_bnf_extra": extra,
        "predicted_total": pred,
        "ratio_emp_over_pred": round(ratio, 4),
        "pass": bool(0.5 < ratio < 2.0 and correct == args.batch),
        "seconds": round(time.time() - t0, 1),
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S+00:00", time.gmtime()),
    }
    line = json.dumps(rec)
    print(line)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")
    assert rec["pass"], rec


if __name__ == "__main__":
    main()
