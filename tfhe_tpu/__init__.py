"""tfhe_tpu — a TPU-native TFHE (fully homomorphic encryption) framework.

A from-scratch reimplementation of the capabilities of TFHE-rs (reference:
Zama's tfhe-rs v1.5.0) designed for TPU hardware:

- All server-side compute is expressed as batched, jittable JAX functions.
- Polynomial arithmetic uses exact CRT number-theoretic transforms over
  TPU-friendly ~30-bit primes (the same prime set as tfhe-ntt's
  ``native64::Plan32``, reference ``tfhe-ntt/src/lib.rs:457-461``) instead of
  the reference's f64 FFT — exactness for free, u32-lane friendly.
- Parallelism is ciphertext-batch data parallelism over a
  ``jax.sharding.Mesh`` (mesh axis ``batch``), replacing the reference's
  rayon/multi-GPU scatter-gather (reference
  ``backends/tfhe-cuda-backend/cuda/include/helper_multi_gpu.h``).
- Client-side key generation and encryption run on host (numpy) with a
  deterministic, fork-able AES-128-CTR CSPRNG mirroring ``tfhe-csprng``.

Layer map (mirrors reference ``tfhe/src/``):
    ops/        — kernels: NTT, decomposition, keyswitch, PBS (device, JAX)
    core/       — core_crypto equivalent: LWE/GLWE/GGSW algorithms + keygen
    shortint/   — single-block ops on small messages, LUT machinery
    boolean/    — gate API
    integer/    — multi-block radix big integers
    high_level_api/ — FheUint/FheInt/FheBool typed API
    parallel/   — mesh/sharding helpers
    utils/      — params, encoding, CSPRNG, serialization, keycache
"""

# The torus is Z_{2^64}: we need native uint64 arrays everywhere. On TPU, XLA
# emulates 64-bit integers on 32-bit lanes; hot kernels are specialized later.
# JAX is optional at import time: the thin-client surface
# (:mod:`tfhe_tpu.client`, the js_on_wasm_api analog) runs numpy-only where
# JAX isn't installed (e.g. pyodide); every server-side module still requires
# it and will raise on use.
try:
    import jax as _jax

    _jax.config.update("jax_enable_x64", True)
except ImportError:  # client-only environment
    _jax = None

__version__ = "0.1.0"

from .utils.params import (  # noqa: E402,F401
    CiphertextModulus,
    ClassicPBSParameters,
    DynamicDistribution,
    EncryptionKeyChoice,
    ModulusSwitchType,
    PARAM_MESSAGE_1_CARRY_1_KS_PBS,
    PARAM_MESSAGE_2_CARRY_2_KS_PBS,
    PARAM_TEST_TOY,
)
