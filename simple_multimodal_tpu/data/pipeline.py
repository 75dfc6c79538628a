"""Host→device batch prefetching.

The reference moves each batch to the device synchronously inside the train
loop (/root/reference/training/advanced_trainer.py:380-394). Here transfers
are issued ahead of compute: ``prefetch_to_device`` keeps ``size`` batches in
flight using JAX's async dispatch, optionally placing them with a
``NamedSharding`` so the data axis of a mesh is fed directly (each device
receives only its shard of the batch).
"""
import collections
from typing import Iterable, Iterator, Optional

import jax
import numpy as np


def _device_put_batch(batch, sharding=None):
    def put(x):
        if isinstance(x, np.ndarray):
            return jax.device_put(x, sharding) if sharding is not None else jax.device_put(x)
        return x  # host-only fields (text_raw, sample_ids) stay on host

    return jax.tree_util.tree_map(
        put, batch, is_leaf=lambda x: isinstance(x, (np.ndarray, list))
    )


def prefetch_to_device(iterator: Iterable, size: int = 2,
                       sharding=None) -> Iterator:
    """Yield device-resident batches while the next transfers are in flight."""
    queue = collections.deque()
    it = iter(iterator)

    def enqueue(n):
        for _ in range(n):
            try:
                batch = next(it)
            except StopIteration:
                return
            queue.append(_device_put_batch(batch, sharding))

    enqueue(size)
    while queue:
        yield queue.popleft()
        enqueue(1)
