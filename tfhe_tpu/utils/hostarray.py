"""Device-or-host array wrap for client-side code paths.

The thin-client surface (:mod:`tfhe_tpu.client` — the analog of the
reference's browser client API ``tfhe/src/js_on_wasm_api/``, which exposes
keygen/encrypt/serialize WITHOUT the server stack) must run where JAX is not
installed (e.g. WASM-Python/pyodide). All client math is numpy; this helper
only decides whether freshly built ciphertext arrays get wrapped as JAX
device arrays (server-side convenience) or stay numpy (thin client).
"""

from __future__ import annotations

import numpy as np

try:  # pragma: no cover - exercised via tests/test_client_sdk.py subprocess
    import jax.numpy as _jnp

    _WRAP = _jnp.asarray
except Exception:  # jax absent: numpy-only client mode
    _WRAP = np.asarray


def asarray(x):
    """jnp.asarray when JAX is importable, np.asarray otherwise."""
    return _WRAP(x)
