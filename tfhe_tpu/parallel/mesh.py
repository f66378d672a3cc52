"""Ciphertext-batch data parallelism over a device mesh.

The reference's multi-device story is scatter/gather of independent LWEs over
GPUs with replicated keys (``backends/tfhe-cuda-backend/cuda/include/
helper_multi_gpu.h:14-46``). The TPU-native equivalent: a 1-D ``batch`` mesh
axis, ciphertext batches sharded along it, key material replicated; XLA SPMD
inserts no collectives because PBS over independent ciphertexts is
embarrassingly parallel — ICI is only exercised by the initial scatter and
final gather (device_put of sharded arrays).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_batch_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[: n_devices]
    return Mesh(np.array(devices), axis_names=("batch",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for ciphertext arrays: leading batch dim split over the mesh,
    all other dims replicated."""
    return NamedSharding(mesh, P("batch"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_ciphertext_batch(ct, mesh: Mesh):
    """Place a batched ciphertext array so its leading dim is split across
    the mesh (pads are the caller's responsibility: batch % n_devices == 0)."""
    return jax.device_put(ct, batch_sharding(mesh))


def replicate_keys(mesh: Mesh, *keys):
    return tuple(jax.device_put(k, replicated(mesh)) for k in keys)
