"""Workload integration tests mirroring the reference's bench workloads
(tfhe-benchmark erc20/dex): encrypted token transfer with balance checks."""

import numpy as np
import pytest

from tfhe_tpu.high_level_api import ConfigBuilder, FheUint8, generate_keys, set_server_key
from tfhe_tpu.utils.params import PARAM_TEST_TOY


@pytest.fixture(scope="module")
def keys():
    config = ConfigBuilder().use_custom_parameters(PARAM_TEST_TOY).with_seed(91).build()
    ck, sk = generate_keys(config)
    set_server_key(sk)
    return ck, sk


def erc20_transfer(from_bal, to_bal, amount):
    """reference tfhe-benchmark erc20: conditional transfer, no branching."""
    can_pay = amount.le(from_bal)
    actual = can_pay.select(amount, amount - amount)  # amount or 0
    return from_bal - actual, to_bal + actual


def test_erc20_transfer_ok(keys):
    ck, _ = keys
    f, t = erc20_transfer(
        FheUint8.encrypt(100, ck), FheUint8.encrypt(5, ck), FheUint8.encrypt(30, ck)
    )
    assert f.decrypt(ck) == 70 and t.decrypt(ck) == 35


def test_erc20_transfer_insufficient(keys):
    ck, _ = keys
    f, t = erc20_transfer(
        FheUint8.encrypt(10, ck), FheUint8.encrypt(5, ck), FheUint8.encrypt(30, ck)
    )
    assert f.decrypt(ck) == 10 and t.decrypt(ck) == 5
