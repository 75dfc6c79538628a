"""Loss functions for all training modes.

Weights and semantics follow the reference trainer
(/root/reference/training/advanced_trainer.py:53,139-166): label-smoothed
cross-entropy (0.1) on emotion logits, + 0.1 × summed pairwise contrastive
losses, + 0.1 × auxiliary valence/arousal MSE, + 0.5 × distillation loss.

Quirk note: in the reference the auxiliary term is dead code —
``hasattr(batch_dict, 'valence')`` is always False for a dict
(advanced_trainer.py:150-153) — so ``aux_weight`` only engages when targets
are actually provided, preserving observable behavior by default.
"""
from typing import Dict, Optional

import jax
import jax.numpy as jnp


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  label_smoothing: float = 0.0) -> jnp.ndarray:
    """Mean CE over the batch with torch-style label smoothing."""
    num_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if label_smoothing > 0:
        smooth = -logp.mean(axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    return nll.mean()


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)


def total_loss(
    outputs: Dict[str, jnp.ndarray],
    emotion_targets: jnp.ndarray,
    label_smoothing: float = 0.1,
    contrastive_weight: float = 0.1,
    aux_weight: float = 0.1,
    distill_weight: float = 0.5,
    valence_targets: Optional[jnp.ndarray] = None,
    arousal_targets: Optional[jnp.ndarray] = None,
    logits_key: str = "emotion_logits",
):
    """Assemble the reference's composite training loss; returns (loss, parts)."""
    main = cross_entropy(outputs[logits_key], emotion_targets, label_smoothing)
    contrastive = jnp.asarray(0.0, jnp.float32)
    cl = outputs.get("contrastive_losses") or {}
    for v in cl.values():
        contrastive = contrastive + v
    aux = jnp.asarray(0.0, jnp.float32)
    if valence_targets is not None and "valence" in outputs:
        aux = aux + mse(outputs["valence"][:, 0], valence_targets)
    if arousal_targets is not None and "arousal" in outputs:
        aux = aux + mse(outputs["arousal"][:, 0], arousal_targets)
    distill = outputs.get("distillation_loss", jnp.asarray(0.0, jnp.float32))
    loss = (
        main
        + contrastive_weight * contrastive
        + aux_weight * aux
        + distill_weight * distill
    )
    parts = {
        "total_loss": loss,
        "emotion_loss": main,
        "contrastive_loss": contrastive,
        "auxiliary_loss": aux,
        "distillation_loss": distill,
    }
    return loss, parts
