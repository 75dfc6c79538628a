"""Model assembly: encoders + fusion + heads, and the model-family wrappers.

Capability parity with /root/reference/models/multimodal_model.py:
``MultimodalEmotionModel`` (fusion dispatch, missing-modality zeroing,
modality dropout in training, auxiliary valence/arousal/uncertainty heads,
reference-keyed output dict), ``EmotionClassifier``,
``KnowledgeDistillationModel``, ``FewShotModel`` (prototypical),
``RobustMultimodalModel``, plus ``create_model``/``load_pretrained_model``
factories.

Design notes / documented deviations:
- ``missing_modalities`` is a *static* tuple: each of the 7 robustness
  scenarios compiles once and is then cached (multimodal_model.py:77-86
  zeroes tensors dynamically; zeroing here folds into the jitted graph).
- The reference's FewShotModel defines support/query LSTMs that are never
  called (multimodal_model.py:275-288); they are not re-created here.
- The reference's EmotionClassifier computes hierarchical sentiment heads
  whose outputs are discarded (multimodal_model.py:210-219); the heads are
  kept (checkpoint-shape parity, usable for auxiliary losses) and their
  results are returned to the caller instead of being thrown away — logits
  behavior is identical since only ``main_logits`` feeds the loss.
- The reference's RobustMultimodalModel.forward does not accept
  ``missing_modalities`` although RobustnessTrainer passes it
  (advanced_trainer.py:583-588) — a latent TypeError. Here the robust model
  accepts both ``missing_modalities`` (zeroed inputs) and
  ``available_modalities`` (ground-truth weighting).
"""
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.adapters import ModalityDropout
from .encoders import AudioEncoder, TextEncoder, VideoEncoder
from .fusion import (
    AdaptiveFusion,
    ContrastiveFusion,
    EarlyFusion,
    GraphFusion,
    HierarchicalFusion,
    LateFusion,
    MultimodalTransformer,
)

FUSION_TYPES = (
    "early", "late", "mult", "graph", "contrastive", "adaptive", "hierarchical"
)


class EmotionClassifier(nn.Module):
    """Main MLP head + hierarchical sentiment heads
    (reference: multimodal_model.py:186-219)."""

    config: object
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: jnp.ndarray, deterministic: bool = True):
        cfg = self.config
        h = nn.Dense(cfg.fusion_hidden_size // 2, dtype=self.dtype,
                     name="classifier_0")(features)
        h = nn.relu(h)
        h = nn.Dropout(cfg.fusion_dropout)(h, deterministic=deterministic)
        main_logits = nn.Dense(cfg.num_emotions, dtype=self.dtype,
                               name="classifier_3")(h)
        # Hierarchical heads: computed for auxiliary use; only main_logits
        # drives classification (reference behavior).
        _sentiment = nn.Dense(3, dtype=self.dtype, name="sentiment_classifier")(features)
        _positive = nn.Dense(2, dtype=self.dtype, name="positive_classifier")(features)
        _negative = nn.Dense(4, dtype=self.dtype, name="negative_classifier")(features)
        return main_logits


class MultimodalEmotionModel(nn.Module):
    """Three encoders → modality dropout → fusion → heads
    (reference: multimodal_model.py:12-183)."""

    config: object
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        text_input: Dict[str, jnp.ndarray],
        audio_input: jnp.ndarray,
        video_input: jnp.ndarray,
        use_adapter: bool = False,
        use_prompt: bool = False,
        compute_contrastive_loss: bool = False,
        missing_modalities: Optional[Sequence[str]] = None,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        fusion_type = getattr(cfg, "fusion_type", "hierarchical")
        if fusion_type not in FUSION_TYPES:
            raise ValueError(f"Unknown fusion type: {fusion_type}")

        input_ids = text_input["input_ids"]
        attention_mask = text_input["attention_mask"]
        # Decode the video wire format (packed yuv420 / uint8 RGB / float)
        # BEFORE any modality zeroing: a zeroed packed plane decodes to
        # green (U=V=0 is chroma -128), not black — zeroing must act on
        # normalized frames to match the reference's semantics.
        from ..data.video_wire import decode_video_wire

        video_input = decode_video_wire(video_input, self.dtype)
        if missing_modalities:
            if "text" in missing_modalities:
                input_ids = jnp.zeros_like(input_ids)
                attention_mask = jnp.zeros_like(attention_mask)
            if "audio" in missing_modalities:
                audio_input = jnp.zeros_like(audio_input)
            if "video" in missing_modalities:
                video_input = jnp.zeros_like(video_input)

        text_out = TextEncoder(cfg, dtype=self.dtype, name="text_encoder")(
            input_ids, attention_mask, use_adapter=use_adapter,
            use_prompt=use_prompt, deterministic=deterministic,
        )
        audio_out = AudioEncoder(cfg, dtype=self.dtype, name="audio_encoder")(
            audio_input, use_adapter=use_adapter, deterministic=deterministic,
        )
        video_out = VideoEncoder(cfg, dtype=self.dtype, name="video_encoder")(
            video_input, use_adapter=use_adapter, deterministic=deterministic,
        )
        text_features = text_out["features"]
        audio_features = audio_out["features"]
        video_features = video_out["features"]

        if not deterministic:  # training: modality dropout (reference :104-107)
            text_features, audio_features, video_features = ModalityDropout(
                dropout_rate=0.1, name="modality_dropout"
            )(text_features, audio_features, video_features, training=True)

        individual_logits = None
        fusion_weights = None
        fusion_output = None
        if fusion_type == "late":
            fusion_output = LateFusion(cfg, dtype=self.dtype, name="fusion_layer")(
                text_features, audio_features, video_features,
                deterministic=deterministic,
            )
            emotion_logits = fusion_output["fused_logits"]
            individual_logits = {
                "text": fusion_output["text_logits"],
                "audio": fusion_output["audio_logits"],
                "video": fusion_output["video_logits"],
            }
            fusion_weights = fusion_output["fusion_weights"]
            fused_features = None
        else:
            if fusion_type == "early":
                fusion_output = EarlyFusion(cfg, dtype=self.dtype,
                                            name="fusion_layer")(
                    text_features, audio_features, video_features,
                    deterministic=deterministic)
            elif fusion_type == "mult":
                fusion_output = MultimodalTransformer(cfg, dtype=self.dtype,
                                                      name="fusion_layer")(
                    text_features, audio_features, video_features,
                    deterministic=deterministic)
            elif fusion_type == "graph":
                fusion_output = GraphFusion(cfg, dtype=self.dtype,
                                            name="fusion_layer")(
                    text_features, audio_features, video_features,
                    deterministic=deterministic)
            elif fusion_type == "contrastive":
                fusion_output = ContrastiveFusion(cfg, dtype=self.dtype,
                                                  name="fusion_layer")(
                    text_features, audio_features, video_features,
                    compute_contrastive_loss, deterministic=deterministic)
            elif fusion_type == "adaptive":
                fusion_output = AdaptiveFusion(cfg, dtype=self.dtype,
                                               name="fusion_layer")(
                    text_features, audio_features, video_features,
                    deterministic=deterministic)
            else:  # hierarchical
                fusion_output = HierarchicalFusion(cfg, dtype=self.dtype,
                                                   name="fusion_layer")(
                    text_features, audio_features, video_features,
                    compute_contrastive_loss, deterministic=deterministic)
            fused_features = (
                fusion_output["fused_features"]
                if isinstance(fusion_output, dict) else fusion_output
            )
            emotion_logits = EmotionClassifier(cfg, dtype=self.dtype,
                                               name="classifier")(
                fused_features, deterministic=deterministic)

        # Auxiliary heads (reference: multimodal_model.py:147-156)
        aux_in = (
            fused_features if fusion_type != "late"
            else (text_features + audio_features + video_features) / 3.0
        )
        valence = nn.Dense(1, dtype=self.dtype, name="valence_regressor")(aux_in)
        arousal = nn.Dense(1, dtype=self.dtype, name="arousal_regressor")(aux_in)
        uncertainty_logits = nn.Dense(cfg.num_emotions, dtype=self.dtype,
                                      name="uncertainty_head")(aux_in)

        output = {
            "emotion_logits": emotion_logits,
            "emotion_probs": jax.nn.softmax(emotion_logits, axis=-1),
            "valence": valence,
            "arousal": arousal,
            "uncertainty": jax.nn.softmax(uncertainty_logits, axis=-1),
            "text_features": text_features,
            "audio_features": audio_features,
            "video_features": video_features,
        }
        if fusion_type == "late":
            output["individual_logits"] = individual_logits
            output["fusion_weights"] = fusion_weights
        if isinstance(fusion_output, dict):
            for key, value in fusion_output.items():
                if key != "fused_features":
                    output[key] = value
        return output


class KnowledgeDistillationModel(nn.Module):
    """Frozen teacher + student with KL soft-target loss
    (reference: multimodal_model.py:222-262). The teacher subtree is frozen
    by the trainer's optimizer mask; its logits carry stop_gradient here."""

    teacher_config: object
    student_config: object
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text_input, audio_input, video_input,
                 deterministic: bool = True, **kwargs):
        scfg = self.student_config
        student_out = MultimodalEmotionModel(
            scfg, dtype=self.dtype, name="student"
        )(text_input, audio_input, video_input, deterministic=deterministic,
          **kwargs)
        teacher_out = MultimodalEmotionModel(
            self.teacher_config, dtype=self.dtype, name="teacher"
        )(text_input, audio_input, video_input, deterministic=True)

        T = scfg.distill_temperature
        student_logits = student_out["emotion_logits"]
        teacher_logits = jax.lax.stop_gradient(teacher_out["emotion_logits"])
        soft_targets = jax.nn.softmax(teacher_logits / T, axis=-1)
        soft_student = jax.nn.log_softmax(student_logits / T, axis=-1)
        # KL(teacher ‖ student), batchmean, scaled by T² (torch kl_div parity)
        kl = soft_targets * (jnp.log(jnp.clip(soft_targets, 1e-10, None)) - soft_student)
        distill_loss = kl.sum(axis=-1).mean() * (T ** 2)

        student_out["distillation_loss"] = distill_loss
        student_out["teacher_logits"] = teacher_logits
        return student_out


class FewShotModel(nn.Module):
    """Prototypical network over summed modality features
    (reference: multimodal_model.py:265-362)."""

    config: object
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, support_data: Dict, query_data: Dict, n_way: int,
                 n_shot: int, deterministic: bool = True) -> Dict:
        cfg = self.config
        base = MultimodalEmotionModel(cfg, dtype=self.dtype, name="base_model")

        def features(data):
            out = base(
                text_input=data["text"], audio_input=data["audio"],
                video_input=data["video"], use_adapter=True, use_prompt=True,
                deterministic=deterministic,
            )
            return (out["text_features"] + out["audio_features"]
                    + out["video_features"])

        support_features = features(support_data)
        query_features = features(query_data)

        protos = support_features.reshape(n_way, n_shot, -1).mean(axis=1)
        h = nn.Dense(cfg.fusion_hidden_size, dtype=self.dtype,
                     name="prototype_network_0")(protos)
        h = nn.relu(h)
        prototypes = nn.Dense(cfg.fusion_hidden_size, dtype=self.dtype,
                              name="prototype_network_2")(h)

        diffs = query_features[:, None, :] - prototypes[None, :, :]
        distances = jnp.sqrt(
            jnp.clip(jnp.sum(diffs.astype(jnp.float32) ** 2, axis=-1), 1e-12, None)
        )
        predictions = jax.nn.softmax(-distances, axis=-1)
        return {
            "predictions": predictions,
            "distances": distances,
            "prototypes": prototypes,
            "support_features": support_features,
            "query_features": query_features,
        }


class RobustMultimodalModel(nn.Module):
    """Base model + per-modality backup classifiers + availability predictor
    (reference: multimodal_model.py:365-450)."""

    config: object
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text_input, audio_input, video_input,
                 available_modalities: Optional[Sequence[str]] = None,
                 missing_modalities: Optional[Sequence[str]] = None,
                 compute_contrastive_loss: bool = False,
                 deterministic: bool = True) -> Dict:
        cfg = self.config
        output = MultimodalEmotionModel(
            cfg, dtype=self.dtype, name="base_model"
        )(text_input, audio_input, video_input,
          missing_modalities=missing_modalities,
          compute_contrastive_loss=compute_contrastive_loss,
          deterministic=deterministic)

        t = output["text_features"]
        a = output["audio_features"]
        v = output["video_features"]

        concat = jnp.concatenate([t, a, v], axis=-1)
        h = nn.Dense(cfg.fusion_hidden_size, dtype=self.dtype,
                     name="modality_predictor_0")(concat)
        h = nn.relu(h)
        availability = jax.nn.sigmoid(
            nn.Dense(3, dtype=self.dtype, name="modality_predictor_2")(h)
        )

        text_pred = nn.Dense(cfg.num_emotions, dtype=self.dtype,
                             name="text_only_classifier")(t)
        audio_pred = nn.Dense(cfg.num_emotions, dtype=self.dtype,
                              name="audio_only_classifier")(a)
        video_pred = nn.Dense(cfg.num_emotions, dtype=self.dtype,
                              name="video_only_classifier")(v)

        if available_modalities is None:
            weights = availability
        else:
            w = jnp.zeros_like(availability)
            if "text" in available_modalities:
                w = w.at[:, 0].set(1.0)
            if "audio" in available_modalities:
                w = w.at[:, 1].set(1.0)
            if "video" in available_modalities:
                w = w.at[:, 2].set(1.0)
            weights = w
        weights = weights / (jnp.sum(weights, axis=1, keepdims=True) + 1e-8)

        robust_prediction = (
            weights[:, 0:1] * text_pred
            + weights[:, 1:2] * audio_pred
            + weights[:, 2:3] * video_pred
        )
        output.update({
            "robust_prediction": robust_prediction,
            "modality_availability": availability,
            "individual_predictions": {
                "text": text_pred, "audio": audio_pred, "video": video_pred,
            },
            "modality_weights": weights,
        })
        return output


def resolve_dtype(config) -> jnp.dtype:
    """Compute dtype policy: the reference's AMP analogue
    (advanced_trainer.py:57,131). bf16 activations on TPU under
    ``mixed_precision`` (params stay f32); f32 elsewhere."""
    if getattr(config, "mixed_precision", False):
        if jax.default_backend() == "tpu":
            name = getattr(config, "compute_dtype", "bfloat16")
            return jnp.dtype(name)
    return jnp.float32


def create_model(config, model_type: str = "standard",
                 dtype: Optional[jnp.dtype] = None) -> nn.Module:
    """Factory mirroring the reference (multimodal_model.py:453-469)."""
    if dtype is None:
        dtype = resolve_dtype(config)
    if model_type == "standard":
        return MultimodalEmotionModel(config, dtype=dtype)
    if model_type == "few_shot":
        return FewShotModel(config, dtype=dtype)
    if model_type == "robust":
        return RobustMultimodalModel(config, dtype=dtype)
    if model_type == "distillation":
        # Teacher weights get loaded by the trainer; this pairs the modules.
        return KnowledgeDistillationModel(config, config, dtype=dtype)
    raise ValueError(f"Unknown model type: {model_type}")


def load_pretrained_model(checkpoint_path: str, config,
                          dtype: jnp.dtype = jnp.float32):
    """Restore (model, params) from an Orbax checkpoint
    (reference analogue: multimodal_model.py:472-485)."""
    from ..train.checkpoint import restore_params

    model = MultimodalEmotionModel(config, dtype=dtype)
    params = restore_params(checkpoint_path)
    return model, params
