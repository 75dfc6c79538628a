"""Optimizer and LR schedule construction.

Mirrors the reference's setup (/root/reference/training/advanced_trainer.py:77-112):
AdamW (weight decay from config), OneCycle cosine schedule with 10% warmup,
global-norm gradient clipping (1.0), and a separate 0.1× learning-rate group
for the pretrained encoder backbones.

Quirk note: in the reference, ``OneCycleLR(max_lr=scalar)`` overwrites both
parameter groups with the *same* max LR each step, silently erasing the 0.1×
backbone group (advanced_trainer.py:91-94 vs 104-110). Here the 0.1× scaling
is actually honored (``backbone_lr_scale``); set it to 1.0 to reproduce the
reference's accidental uniform-LR behavior.
"""
from typing import Callable, Optional

import jax
import optax

BACKBONE_MARKERS = (
    ("text_encoder", "model"),
    ("audio_encoder", "model"),
    ("video_encoder", "vit"),
)


def is_backbone_path(path) -> bool:
    keys = [getattr(p, "key", str(p)) for p in path]
    for parent, child in BACKBONE_MARKERS:
        for i, k in enumerate(keys[:-1]):
            if k == parent and keys[i + 1] == child:
                return True
    return False


def backbone_mask(params):
    """Pytree of bools: True where the param belongs to a pretrained backbone."""
    flat = jax.tree_util.tree_map_with_path(lambda p, _: is_backbone_path(p), params)
    return flat


def make_schedule(learning_rate: float, total_steps: int,
                  pct_start: float = 0.1) -> optax.Schedule:
    """torch OneCycleLR(cos) equivalent: warmup to peak, cosine to ~0.

    Built from joined warmup+decay pieces instead of
    ``optax.cosine_onecycle_schedule`` because the latter divides by zero
    (→ NaN params) whenever ``pct_start * total_steps < 1`` — i.e. any short
    run.
    """
    total_steps = max(total_steps, 2)
    warmup = min(max(int(round(total_steps * pct_start)), 1), total_steps - 1)
    init = learning_rate / 25.0
    end = init / 1e4
    return optax.join_schedules(
        [
            optax.linear_schedule(init, learning_rate, warmup),
            optax.cosine_decay_schedule(
                learning_rate, total_steps - warmup, alpha=end / learning_rate
            ),
        ],
        [warmup],
    )


def _freeze_tree(params, freeze_mask):
    """Bool pytree: True where the path falls under a True freeze_mask node."""

    def frozen(path, _):
        sub = freeze_mask
        for p in path:
            if sub is True:
                return True
            k = getattr(p, "key", str(p))
            if isinstance(sub, dict) and k in sub:
                sub = sub[k]
            else:
                return False
        return sub is True

    return jax.tree_util.tree_map_with_path(frozen, params)


def make_optimizer(
    config,
    params,
    total_steps: int,
    backbone_lr_scale: float = 0.1,
    freeze_mask=None,
) -> optax.GradientTransformation:
    """AdamW + OneCycle + clip, with scaled-LR backbones and optional freezes.

    Built as ONE chain with masked stateless scaling rather than
    ``optax.multi_transform`` over per-group AdamW instances:
    multi_transform initializes each group's Adam moments over the *full*
    parameter tree, which triples optimizer memory (≈10 GB for the flagship)
    and pushed training into HBM spill. Here mu/nu exist once; the 0.1×
    backbone group and frozen subtrees are masked update scalings.

    ``freeze_mask``: nested dict of bools, True → subtree is frozen (used for
    the distillation teacher and few-shot episodes).
    """
    schedule = make_schedule(config.learning_rate, total_steps)
    bb_mask = backbone_mask(params)

    adam = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    frozen_tree = None
    if freeze_mask is not None:
        frozen_tree = _freeze_tree(params, freeze_mask)
        # don't allocate Adam moments for frozen subtrees (a frozen
        # distillation teacher would otherwise double optimizer memory)
        trainable_tree = jax.tree_util.tree_map(lambda f: not f, frozen_tree)
        adam = optax.masked(adam, trainable_tree)

    chain = [
        optax.clip_by_global_norm(config.gradient_clip_norm),
        adam,
        optax.add_decayed_weights(config.weight_decay),
        optax.masked(optax.scale(backbone_lr_scale), bb_mask),
        optax.scale_by_learning_rate(schedule),  # scales by −lr(step)
    ]
    if frozen_tree is not None:
        chain.append(optax.masked(optax.set_to_zero(), frozen_tree))
    return optax.chain(*chain)


def make_trainable_only_optimizer(config, params,
                                  trainable_fn: Callable[[str], bool],
                                  learning_rate: Optional[float] = None
                                  ) -> optax.GradientTransformation:
    """Plain AdamW over params whose path matches ``trainable_fn``; others
    frozen (reference few-shot optimizer, advanced_trainer.py:512-524)."""
    lr = learning_rate if learning_rate is not None else config.learning_rate

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "train" if trainable_fn(
                "/".join(getattr(p, "key", str(p)) for p in path)
            ) else "frozen",
            params,
        )

    return optax.multi_transform(
        {"train": optax.adamw(lr), "frozen": optax.set_to_zero()}, label_fn
    )
