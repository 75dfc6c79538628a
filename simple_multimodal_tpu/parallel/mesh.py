"""Device mesh construction and sharding rules.

The reference is single-device (the deepest infrastructure it owns is
``.to(device)``, /root/reference/training/advanced_trainer.py:39-44). The
TPU-native design scales through a ``jax.sharding.Mesh`` with two axes:

- ``data``: batch (data-parallel) axis — gradients are reduced by the
  XLA-inserted all-reduce over ICI when params are replicated and the batch
  is sharded.
- ``model``: tensor-parallel axis for the encoder weights (attention heads /
  MLP columns), used when a single chip can't hold the flagship model or to
  scale serving throughput.

Multi-host: call ``initialize_distributed()`` once per process before mesh
creation; ``mesh_shape`` then spans the global device set (data axis across
DCN, model axis inside a slice over ICI).
"""
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_CURRENT_MESH: Optional[Mesh] = None


def set_current_mesh(mesh: Optional[Mesh]) -> None:
    """Register the ambient device mesh. The Pallas kernels consult this to
    wrap themselves in ``shard_map`` (a pallas_call has no SPMD partitioning
    rule, so under a >1 mesh it must be explicitly mapped: batch over
    'data', heads over 'model'). Trainer / dryrun / serving set it once at
    mesh construction; ``None`` (or a size-1 mesh) means no wrapping."""
    global _CURRENT_MESH
    _CURRENT_MESH = mesh


def current_mesh() -> Optional[Mesh]:
    return _CURRENT_MESH


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host setup over DCN (no-op on a single host)."""
    if num_processes and num_processes > 1:  # pragma: no cover - needs pod
        jax.distributed.initialize(coordinator_address, num_processes, process_id)


def make_mesh(mesh_shape: Tuple[int, int] = (1, 1),
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh. mesh_shape=(−1, m) fills data with all
    remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    d, m = mesh_shape
    if d == -1:
        d = len(devices) // m
    n = d * m
    grid = np.array(devices[:n]).reshape(d, m)
    mesh = Mesh(grid, axis_names=("data", "model"))
    set_current_mesh(mesh)  # Pallas kernels shard_map over the ambient mesh
    return mesh


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis; replicate rest."""
    return NamedSharding(mesh, P("data"))


def batch_shardings(mesh: Mesh, batch) -> object:
    """Pytree of NamedShardings matching a batch pytree (host lists excluded)."""
    spec = NamedSharding(mesh, P("data"))

    def one(x):
        return spec

    return jax.tree_util.tree_map(one, batch)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# --- parameter partitioning (tensor parallelism over the 'model' axis) ------

def param_partition_spec(path_keys, value) -> P:
    """TP rules for encoder weights; everything else replicated.

    Layout choices (megatron-style, collectives ride ICI):
    - attention q/k/v kernels: shard the head (output) dim → P(None, 'model')
    - attention output projection: shard the input dim → P('model', None)
    - MLP up projection (intermediate): shard output dim
    - MLP down projection: shard input dim
    - ViT patch embedding conv: shard the output-feature dim (col-parallel)
    - word embeddings: vocab-parallel (XLA masks the lookup and all-reduces)
    - LSTM hoisted input matmul w_ih: shard the input dim (row-parallel, one
      all-reduce per layer); the sequential recurrent matmul w_hh stays
      replicated — sharding it would cost a collective per timestep

    Deliberately REPLICATED (measured/structural choices, not omissions):
    - LSTM w_hh (above) and all LSTM biases.
    - DeBERTa rel_embeddings + rel_ln: consumed by EVERY layer's shared-key
      position projections; sharding the [2·span, E] table would force an
      all-gather per layer to rebuild the per-head position tables the
      fused kernel consumes, for ~1.5 MB of savings.
    - All fusion weights, classifier/aux heads, adapters, prompts, norms,
      biases: each is ≤ a few MB; the 99% of FLOPs and bytes live in the
      three encoder stacks, so sharding the fusion heads buys nothing and
      costs a collective at the modality join (measured round 3 on the
      virtual mesh: fusion is within noise of free at every mesh shape —
      see RESULTS.md TP section).
    """
    parent = path_keys[-2] if len(path_keys) >= 2 else ""
    leaf = path_keys[-1]
    # Encoder transformer layers are nn.scan-stacked: their kernels carry a
    # leading [num_layers] axis (path …/layers/<name>/kernel, ndim 3). The
    # layer axis itself is never sharded — TP splits the same in/out dims,
    # shifted right by one.
    stacked = "layers" in path_keys
    if leaf == "kernel" and value.ndim == 4 and parent == "patch_embed":
        return P(None, None, None, "model")
    if leaf == "embedding" and parent == "word_embeddings":
        return P("model", None)
    if value.ndim != (3 if stacked else 2):
        return P()
    if leaf.startswith("w_ih"):
        return P("model", None)
    col_markers = ("q_proj", "k_proj", "v_proj", "query", "key", "value",
                   "query_proj", "key_proj", "value_proj",
                   "intermediate_dense", "ffn_0")
    row_markers = ("out_proj", "attn_output", "attn_out_dense",
                   "output_dense", "ffn_3")
    if leaf == "kernel":
        if parent in col_markers:
            return P(None, None, "model") if stacked else P(None, "model")
        if parent in row_markers:
            return P(None, "model", None) if stacked else P("model", None)
    return P()


def params_shardings(mesh: Mesh, params):
    """NamedSharding pytree for a param pytree using param_partition_spec."""

    def one(path, value):
        keys = [getattr(p, "key", str(p)) for p in path]
        if mesh.shape["model"] == 1:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, param_partition_spec(keys, value))

    return jax.tree_util.tree_map_with_path(one, params)
