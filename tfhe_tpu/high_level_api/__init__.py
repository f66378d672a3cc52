"""high_level_api — the user-facing typed API.

Reference: ``tfhe/src/high_level_api/``: ``generate_keys`` (keys/mod.rs:40),
``set_server_key`` (global_state.rs:66), ``ConfigBuilder`` (config.rs:41),
``FheBool``, ``FheUint8..FheUint256``, operator overloading.

Usage (mirrors the reference README):

    from tfhe_tpu.high_level_api import *
    config = ConfigBuilder().build()
    client_key, server_key = generate_keys(config)
    set_server_key(server_key)
    a = FheUint32.encrypt(1409, client_key)
    b = FheUint32.encrypt(3, client_key)
    c = a + b
    assert c.decrypt(client_key) == 1412
"""

from .api import (
    Config,
    ConfigBuilder,
    FheBool,
    FheUint2,
    FheUint4,
    FheUint8,
    FheUint16,
    FheUint32,
    FheUint64,
    FheUint128,
    FheUint256,
    generate_keys,
    set_server_key,
    unset_server_key,
)
