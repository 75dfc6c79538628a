"""Jitted train/eval steps.

The reference's per-batch hot loop (forward, loss assembly, backward, clip,
optimizer, scheduler — /root/reference/training/advanced_trainer.py:126-196)
compiles here into a single donated XLA executable: device-side augmentation,
forward (bf16 under the dtype policy), composite loss, grads, global-norm
clip and AdamW update all fuse into one launch per step. Mixed precision is
the TPU analogue of the reference's AMP path (advanced_trainer.py:131,171-176):
bf16 activations need no GradScaler.
"""
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from ..data.augment import augment_batch
from .losses import cross_entropy, total_loss
from .state import TrainState


def device_batch(batch):
    """Strip host-only fields from a collated batch."""
    return {
        "text": batch["text"],
        "audio": batch["audio"],
        "video": batch["video"],
        "emotion": batch["emotion"],
    }


def make_train_step(
    model,
    tx,
    config,
    augment: bool = False,
    compute_contrastive_loss: bool = True,
    logits_key: str = "emotion_logits",
    missing_modality_rate: float = 0.0,
    model_kwargs: Optional[dict] = None,
) -> Callable:
    """Build the jitted train step: (state, batch) → (state, metrics).

    ``missing_modality_rate`` > 0 reproduces the robustness trainer's
    per-batch random modality zeroing (advanced_trainer.py:573-580) as a
    traced input mask — one compiled graph serves all 8 scenarios instead of
    one recompile each.
    """
    model_kwargs = dict(model_kwargs or {})

    from ..models.multimodal_model import resolve_dtype

    compute_dtype = resolve_dtype(config)

    def step(state: TrainState, batch):
        rng, rng_aug, rng_drop, rng_miss = jax.random.split(state.rng, 4)
        audio = batch["audio"]
        if audio.dtype == jnp.int16:  # wire format; dequantize on device
            audio = audio.astype(jnp.float32) / 32768.0
        # decode the wire format (packed yuv420 / uint8 RGB) at compute
        # dtype: a [B,30,224,224,3] f32 buffer would double peak HBM vs bf16
        from ..data.video_wire import decode_video_wire

        video = decode_video_wire(batch["video"], compute_dtype)
        if augment:
            audio, video = augment_batch(rng_aug, audio, video)
        text = batch["text"]

        if missing_modality_rate > 0:
            drop = jax.random.uniform(rng_miss, (3,)) < missing_modality_rate
            ids = jnp.where(drop[0], jnp.zeros_like(text["input_ids"]),
                            text["input_ids"])
            mask = jnp.where(drop[0], jnp.zeros_like(text["attention_mask"]),
                             text["attention_mask"])
            text = {"input_ids": ids, "attention_mask": mask}
            audio = jnp.where(drop[1], jnp.zeros_like(audio), audio)
            video = jnp.where(drop[2], jnp.zeros_like(video), video)

        def loss_fn(params):
            outputs = model.apply(
                params, text, audio, video,
                compute_contrastive_loss=compute_contrastive_loss,
                deterministic=False,
                rngs={"dropout": rng_drop},
                **model_kwargs,
            )
            loss, parts = total_loss(
                outputs, batch["emotion"],
                label_smoothing=0.1,
                logits_key=logits_key,
            )
            return loss, parts

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u.astype(p.dtype), state.params, updates
        )
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, rng=rng
        )
        parts = dict(parts)
        parts["grad_norm"] = jax.tree_util.tree_reduce(
            lambda a, g: a + jnp.sum(g.astype(jnp.float32) ** 2),
            grads, jnp.asarray(0.0),
        ) ** 0.5
        return new_state, parts

    return jax.jit(step, donate_argnums=(0,))


def make_eval_step(model, compute_loss: bool = True,
                   logits_key: str = "emotion_logits",
                   missing_modalities: Optional[Sequence[str]] = None,
                   model_kwargs: Optional[dict] = None) -> Callable:
    """Build the jitted eval step: (params, batch) → outputs dict."""
    model_kwargs = dict(model_kwargs or {})
    mm = tuple(missing_modalities) if missing_modalities else None

    @jax.jit
    def step(params, batch):
        kwargs = dict(model_kwargs)
        if mm:
            kwargs["missing_modalities"] = mm
        outputs = model.apply(
            params, batch["text"], batch["audio"], batch["video"],
            deterministic=True, **kwargs,
        )
        logits = outputs[logits_key]
        result = {
            "logits": logits,
            "probs": jax.nn.softmax(logits, axis=-1),
            "predictions": jnp.argmax(logits, axis=-1),
            "features": (
                outputs["text_features"] + outputs["audio_features"]
                + outputs["video_features"]
            ) / 3.0,
        }
        if "individual_logits" in outputs:
            result["individual_logits"] = outputs["individual_logits"]
        if compute_loss:
            result["loss"] = cross_entropy(logits, batch["emotion"], 0.1)
        return result

    return step


def make_fewshot_step(model, tx, n_way: int, n_shot: int) -> Callable:
    """Episode step for prototypical few-shot training
    (reference: advanced_trainer.py:526-557). The reference applies CE to
    already-softmaxed prototype probabilities (its quirk #3); replicated
    faithfully: log_softmax over the probability vector.
    """

    def step(state: TrainState, support, query):
        rng, rng_drop = jax.random.split(state.rng)

        def loss_fn(params):
            out = model.apply(
                params, support, query, n_way, n_shot,
                deterministic=False, rngs={"dropout": rng_drop},
            )
            # CE over probabilities (not logits) — reference parity
            return cross_entropy(out["predictions"], query["emotion"]), out

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u.astype(p.dtype), state.params, updates
        )
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state, rng=rng), loss

    return jax.jit(step, donate_argnums=(0,))
