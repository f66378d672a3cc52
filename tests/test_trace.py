"""PBS-count tracing (the reference PBS_COUNT workload-accounting analog)."""

import numpy as np

from tfhe_tpu.shortint.client_key import ClientKey
from tfhe_tpu.shortint.server_key import ServerKey
from tfhe_tpu.utils import trace
from tfhe_tpu.utils.params import PARAM_TEST_TOY as P


def test_pbs_count_and_spans():
    ck = ClientKey.generate(P, seed=51)
    sk = ServerKey.generate(ck)
    ct = ck.encrypt([1, 2, 3])
    lut = sk.generate_lookup_table(lambda x: x)
    trace.reset_pbs_count()
    with trace.span("outer") as s:
        sk.apply_lookup_table(ct, lut)
        with trace.span("inner") as si:
            sk.apply_lookup_table(ct, lut)
    assert trace.get_pbs_count() == 6
    assert s.pbs == 6 and si.pbs == 3
    assert s.ks == 6
    assert s.seconds > 0
    assert "inner" in s.report()
    trace.reset_pbs_count()
    assert trace.get_pbs_count() == 0
