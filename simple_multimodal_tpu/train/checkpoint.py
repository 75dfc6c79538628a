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
import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..config import config_to_dict


def _abs(path: str) -> str:
    return os.path.abspath(path)


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


def restore_params(path: str) -> Any:
    """Restore just the params pytree from a checkpoint directory."""
    path = _abs(path)
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(path)
    return restored["params"]


def restore_checkpoint(path: str) -> Dict[str, Any]:
    """Restore the full payload (params, opt_state, step, rng) + metadata."""
    path = _abs(path)
    ckptr = ocp.PyTreeCheckpointer()
    payload = ckptr.restore(path)
    meta_path = os.path.join(path, "meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    payload["meta"] = meta
    return payload
