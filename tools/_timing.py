"""Shared on-chip timing helper for the profiling tools.

Sync via ONE device scalar: a per-leaf device_get costs a ~28 ms tunnel
RTT per leaf and inflates grad-tree timings by seconds (CLAUDE.md timing
notes). block_until_ready can return at enqueue time on the tunneled
chip, so the sync must FETCH data.
"""
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=10):
    reduce1 = jax.jit(lambda t: jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(x.astype(jnp.float32)),
        t, jnp.float32(0)))

    def sync(out):
        float(jax.device_get(reduce1(out)))

    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / iters
