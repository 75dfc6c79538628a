"""SPMD composition for the Pallas kernels.

A ``pallas_call`` is an opaque custom call — XLA cannot partition it, so
under a multi-device mesh each kernel must be explicitly ``shard_map``-ped:
batch over the 'data' axis, attention heads over the 'model' axis (the
megatron TP layout already shards the qkv projections column-wise, so head
shards fall out of the activation sharding naturally — no resharding).

The mesh is ambient (parallel/mesh.py:set_current_mesh — registered by
make_mesh); kernels consult it at trace time. When per-shard shapes do not
divide (batch % data or heads % model), the caller falls back to its XLA
reference path instead of crashing mid-jit.
"""
from typing import Callable, Optional, Tuple

from jax import shard_map
from jax.sharding import PartitionSpec as P


def resolve_mesh(batch: int, heads: int) -> Tuple[Optional[object], bool]:
    """(mesh-to-wrap-with-or-None, must_fall_back_to_xla)."""
    from ...parallel.mesh import current_mesh

    mesh = current_mesh()
    if mesh is None or mesh.size == 1:
        return None, False
    d = mesh.shape.get("data", 1)
    m = mesh.shape.get("model", 1)
    if batch % d or heads % m:
        return None, True
    return mesh, False


def bshd_spec() -> P:
    """[batch, seq, heads, head_dim] operand spec."""
    return P("data", None, "model", None)


def wrap_bshd(fn: Callable, mesh, n_in: int) -> Callable:
    """shard_map a kernel over [B, S, H, D]-layout operands."""
    return shard_map(
        fn, mesh=mesh, in_specs=(bshd_spec(),) * n_in, out_specs=bshd_spec(),
        check_vma=False,
    )
