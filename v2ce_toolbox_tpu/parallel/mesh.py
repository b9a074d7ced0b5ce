"""Device mesh + sharding helpers.

The reference's only parallelism is Lightning DDP data-parallel over GPUs
plus NCCL (reference: train/main.py:192-195; SURVEY.md §2.5). The TPU-native
replacement is single-program jit over a jax.sharding.Mesh: batch-dim
sharding for both training and inference windows; XLA inserts the gradient
all-reduce (psum over 'data') and any resharding collectives over ICI.

Mesh axes:
  'data'  — batch / window / frame fan-out (DP; inference is embarrassingly
            parallel along it, v2ce.py:179-204's manual micro-batching).
  'model' — reserved for spatial/width sharding of the UNet (pano strips,
            v2ce.py:103-126, become a sharded batch axis instead).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-process (multi-host) startup — the TPU-native replacement for
    the reference's multi-node Lightning DDP launch
    (reference: train/main.py:192-195, one NCCL process per GPU).

    After this returns, jax.devices() is the GLOBAL device list across all
    processes and a Mesh built over it compiles collectives over ICI (TPU)
    or Gloo (CPU test fixture: 2 processes x N virtual devices). On real
    TPU pods the three arguments can all be None — jax autodetects the
    coordinator from the TPU metadata; on CPU/GPU they are required.

    No-op when num_processes == 1 and no coordinator is given.
    """
    if coordinator_address is None and (num_processes or 1) == 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data", "model"),
    model_parallelism: int = 1,
) -> Mesh:
    """Create a (data, model) mesh over the first n_devices devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallelism == 0, (n, model_parallelism)
    grid = np.asarray(devices).reshape(n // model_parallelism,
                                       model_parallelism)
    return Mesh(grid, axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard axis 0 over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch pytree with axis-0 'data' sharding.

    Works in both single- and multi-process meshes: every process passes
    the same GLOBAL batch (loaders are seeded identically across hosts,
    like DDP's per-rank deterministic sampler) and only the locally
    addressable shards are materialized on each host.
    """
    if jax.process_count() == 1:
        return jax.tree.map(
            lambda x: jax.device_put(x, batch_sharding(mesh, ndim=x.ndim)),
            batch,
        )

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, batch_sharding(mesh, ndim=x.ndim),
            lambda idx: x[idx])

    return jax.tree.map(put, batch)
