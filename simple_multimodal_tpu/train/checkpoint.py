"""Orbax checkpointing.

Reference counterpart: ``AdvancedTrainer.save_checkpoint`` writes
``{epoch, model_state_dict, optimizer_state_dict, scheduler_state_dict,
metrics, config}`` (/root/reference/training/advanced_trainer.py:396-411) and
``load_pretrained_model`` restores weights only (multimodal_model.py:472-485).
Here the full train-state pytree (params + optimizer state + step + RNG) is
checkpointed, so resume restores training exactly — the reference could only
restore weights. Schedules are stateless functions of ``step`` in optax, so
no separate scheduler state exists.
"""
import hashlib
import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..config import config_to_dict


def _abs(path: str) -> str:
    return os.path.abspath(path)


def tree_fingerprint(tree) -> str:
    """Stable hash of a pytree's structure + leaf shapes/dtypes.

    Written into checkpoint meta so resume can detect an optimizer-chain
    change (different treedef => silently mispaired leaves) and fail loudly
    instead of corrupting the run.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    desc = str(treedef) + "|" + ";".join(
        f"{getattr(x, 'shape', ())}:{getattr(x, 'dtype', type(x).__name__)}"
        for x in leaves
    )
    return hashlib.sha256(desc.encode()).hexdigest()[:16]


def save_checkpoint(path: str, state, metrics: Optional[Dict] = None,
                    epoch: Optional[int] = None, config=None) -> None:
    """Write a full training checkpoint directory."""
    path = _abs(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": jax.device_get(state.params)}
    if getattr(state, "opt_state", None) is not None:
        payload["opt_state"] = jax.device_get(state.opt_state)
    payload["step"] = int(state.step)
    payload["rng"] = np.asarray(jax.device_get(state.rng))
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    meta = {
        "epoch": epoch,
        "metrics": {k: float(v) for k, v in (metrics or {}).items()},
    }
    if getattr(state, "opt_state", None) is not None:
        meta["opt_state_fingerprint"] = tree_fingerprint(state.opt_state)
    if config is not None:
        meta["config"] = config_to_dict(config)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)


def save_params(path: str, params) -> None:
    """Weights-only checkpoint (reference final-model analogue)."""
    path = _abs(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": jax.device_get(params)}, force=True)
    ckptr.wait_until_finished()


def migrate_legacy_layers(tree):
    """Stack pre-scan per-layer subtrees into the nn.scan layout.

    Checkpoints saved before the encoders moved to scan-over-layers hold
    ``layer_0 .. layer_{N-1}`` sibling subtrees; the current layout holds
    one ``layers`` subtree with a leading layer axis. Detects the complete
    legacy pattern anywhere in the tree and stacks it (leaf-wise np.stack),
    leaving everything else untouched."""
    if not isinstance(tree, dict):
        return tree
    tree = {k: migrate_legacy_layers(v) for k, v in tree.items()}
    names = [k for k in tree
             if k.startswith("layer_") and k[len("layer_"):].isdigit()]
    n = len(names)
    if (n and "layers" not in tree
            and sorted(int(k[len("layer_"):]) for k in names)
            == list(range(n))
            and all(isinstance(tree[k], dict) for k in names)):
        ordered = [tree.pop(f"layer_{i}") for i in range(n)]
        tree["layers"] = jax.tree_util.tree_map(
            lambda *xs: np.stack(xs), *ordered)
    return tree


def restore_params(path: str) -> Any:
    """Restore just the params pytree from a checkpoint directory."""
    path = _abs(path)
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(path)
    return migrate_legacy_layers(restored["params"])


def restore_checkpoint(path: str, state_target=None) -> Dict[str, Any]:
    """Restore the full payload (params, opt_state, step, rng) + metadata.

    When ``state_target`` (the live TrainState) is given AND the checkpoint
    carries an opt_state, the restore is *targeted*: Orbax rebuilds the exact
    live pytree (namedtuple fields matched by name, never by dict-key sort
    order), and the saved structure fingerprint is checked first so an
    optimizer-chain change between save and resume raises a clear error
    instead of silently mispairing Adam moments. Targeted restores also honor
    the live leaves' shardings, which is what makes cross-topology resume
    (save on one mesh, resume on another) work.
    """
    path = _abs(path)
    meta_path = os.path.join(path, "meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)

    saved_fp = meta.get("opt_state_fingerprint")
    if state_target is not None and saved_fp is not None:
        live_fp = tree_fingerprint(state_target.opt_state)
        if saved_fp != live_fp:
            raise ValueError(
                f"Checkpoint at {path} was saved with a different optimizer "
                f"structure (fingerprint {saved_fp} != live {live_fp}); "
                "resume with the same optimizer configuration it was saved "
                "under, or restore params only."
            )
        template = {
            "params": state_target.params,
            "opt_state": state_target.opt_state,
            "step": 0,
            "rng": np.asarray(jax.device_get(state_target.rng)),
        }
        payload = ocp.StandardCheckpointer().restore(path, template)
    else:
        payload = ocp.PyTreeCheckpointer().restore(path)
        if payload.get("params") is not None:
            payload["params"] = migrate_legacy_layers(payload["params"])
    payload["meta"] = meta
    return payload
