"""Host-side batching with background workers and device prefetch.

Replaces torch DataLoader + Lightning DataInterface
(reference: train/scripts/data/data_interface.py:32-39): a thread pool
materializes packets ahead of consumption and batches are device_put with
the mesh's batch sharding one step ahead of compute, double-buffering
host IO against TPU execution.
"""

from __future__ import annotations

import concurrent.futures
import threading
from typing import Dict, Iterator, Optional

import numpy as np


def iterate_batches(
    dataset,
    batch_size: int,
    *,
    shuffle: bool = True,
    seed: int = 0,
    num_workers: int = 4,
    drop_last: bool = True,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yield stacked host batches from an indexable dataset."""
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        np.random.RandomState(seed).shuffle(order)
    if drop_last:
        order = order[: (n // batch_size) * batch_size]

    def collate(indices):
        items = [dataset[int(i)] for i in indices]
        return {k: np.stack([it[k] for it in items], axis=0)
                for k in items[0]}

    if num_workers <= 1:
        for i in range(0, len(order), batch_size):
            yield collate(order[i:i + batch_size])
        return

    with concurrent.futures.ThreadPoolExecutor(num_workers) as pool:
        futures = []
        chunks = [order[i:i + batch_size]
                  for i in range(0, len(order), batch_size)]
        # keep up to num_workers batches in flight
        it = iter(chunks)
        for _ in range(num_workers):
            c = next(it, None)
            if c is not None:
                futures.append(pool.submit(collate, c))
        while futures:
            batch = futures.pop(0).result()
            c = next(it, None)
            if c is not None:
                futures.append(pool.submit(collate, c))
            yield batch


def device_prefetch(host_batches, mesh=None, depth: int = 2):
    """Move batches to device ahead of consumption. With a mesh, batches are
    sharded over the 'data' axis."""
    import jax

    from v2ce_toolbox_tpu.parallel.mesh import shard_batch

    def put(batch):
        if mesh is not None:
            return shard_batch(mesh, batch)
        return jax.tree.map(jax.device_put, batch)

    queue = []
    for batch in host_batches:
        queue.append(put(batch))
        if len(queue) >= depth:
            yield queue.pop(0)
    while queue:
        yield queue.pop(0)
