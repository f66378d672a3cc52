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


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up: a pod-slice run is a config change, not new
    code. Call once per process before building meshes; afterwards
    ``jax.devices()`` spans every host and :func:`make_batch_mesh` shards
    the ciphertext batch over ICI+DCN exactly as it does over one host
    (keys replicated, no cross-device collectives in the PBS itself)."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


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


def sharded_ks_pbs(server_key, mesh: Mesh):
    """Returns fn(ct_batch, lut_acc) running the KS->PBS atomic pattern with
    the batch sharded over the mesh and key material replicated.

    This is the scaling story of BASELINE config 5: independent PBS sharded
    over chips; XLA SPMD inserts only the initial scatter / final gather.
    """
    import jax

    ks_pbs, _, _ = server_key._fns
    # pbs_bsk follows the active transform variant (v6/v5/crt) — it is what
    # the compiled pipeline expects as its ``bsk`` argument
    ksk_i8, bsk = replicate_keys(mesh, server_key.ksk_i8, server_key.pbs_bsk)

    def run(ct_batch, lut_acc):
        ct_dev = shard_ciphertext_batch(ct_batch, mesh)
        out = ks_pbs(ct_dev, lut_acc, ksk_i8, bsk)
        return out

    return run


def scaling_sweep(server_key, lut_acc, ct_batch, device_counts, iters: int = 3):
    """PBS/s at several mesh sizes (scaling-efficiency harness).

    Returns {n_devices: pbs_per_second}. On a single-chip host this is only
    meaningful under --xla_force_host_platform_device_count.
    """
    import time

    import jax
    import numpy as np

    results = {}
    B = ct_batch.shape[0]
    for nd in device_counts:
        mesh = make_batch_mesh(nd)
        run = sharded_ks_pbs(server_key, mesh)
        out = run(ct_batch, lut_acc)
        _ = jax.device_get(out)  # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            _ = jax.device_get(run(ct_batch, lut_acc))
        dt = (time.perf_counter() - t0) / iters
        results[nd] = B / dt
    return results
