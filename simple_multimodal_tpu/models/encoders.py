"""Modality encoders: text (DeBERTa), audio (Wav2Vec2), video (ViT+LSTM).

Capability parity with /root/reference/models/encoders.py: each encoder wraps
its backbone with optional residual adapters and (text) prompt tuning, a
modality-specific temporal module, pooling, and a projection into the shared
fusion space. Presets select backbone scale: 'base' = the pretrained
architectures the reference uses; 'tiny' = same-interface small stacks for
tests/CI; 'half' = the distillation student scale.

Behavioral quirks preserved from the reference:
- Text pooling picks the CLS token iff 'bert' is a substring of the
  backbone's model_type (encoders.py:87-94). 'deberta-v2' contains 'bert',
  so DeBERTa pools CLS; the masked-mean branch is kept for other backbones.
- Prompt tuning prepends learned embeddings to the *word embeddings* and
  extends the attention mask (encoders.py:49-71).
"""
import dataclasses
from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from ..ops.adapters import AdapterLayer
from ..ops.attention import MultiHeadAttention, use_flash_attention
from ..ops.lstm import LSTM
from .deberta import DebertaConfig, DebertaModel
from .vit import ViTConfig, ViTModel
from .wav2vec2 import Wav2Vec2Config, Wav2Vec2Model


def resolve_backbone_configs(config, deterministic: bool = True):
    """Pick backbone dimension presets from a ModelConfig.

    ``deterministic=False`` (a training trace) resolves the kernel
    engagement from ``flash_attention_train`` instead of
    ``flash_attention`` — the two modes gate independently because their
    in-context winners were measured separately on v5e (RESULTS.md
    round 4; both currently fused, but the train gate is the safety
    valve the round-3 OOM showed is needed)."""
    preset = getattr(config, "encoder_preset", "base")
    if preset == "tiny":
        text = DebertaConfig.tiny()
        text = dataclasses.replace(text, vocab_size=128100)  # HashTokenizer ids
        audio = Wav2Vec2Config.tiny()
        vit = dataclasses.replace(
            ViTConfig.tiny(), image_size=config.video_frame_size[0]
        )
    elif preset == "half":
        text = DebertaConfig.half()
        audio = Wav2Vec2Config.half()
        vit = dataclasses.replace(
            ViTConfig.half(), image_size=config.video_frame_size[0]
        )
    else:
        text = DebertaConfig.base()
        audio = Wav2Vec2Config.base()
        vit = dataclasses.replace(
            ViTConfig.base(), image_size=config.video_frame_size[0]
        )
    flash = use_flash_attention(config, train=not deterministic)
    text = dataclasses.replace(text, use_flash=flash)
    audio = dataclasses.replace(audio, use_flash=flash)
    vit = dataclasses.replace(vit, use_flash=flash)
    return text, audio, vit


# "auto" remat budget: bf16 residual estimate must fit this to turn remat
# OFF. Measured v5e-16GB anchor points (tools/ab_remat.py, B=8 flagship
# estimates ~1.9 GB / B=16 ~3.8 GB both fit and win, B=32 ~7.6 GB OOMs);
# 4.5 GiB keeps margin under the untested midrange.
REMAT_AUTO_BUDGET_BYTES = int(4.5 * 1024 ** 3)


def resolve_remat(config) -> bool:
    """Resolve ``remat_encoders`` ("auto" | bool) to a bool.

    Remat (gradient checkpointing) trades ~one extra encoder-stack
    forward inside the backward for activation HBM. In the fused-kernel
    era the stacks' custom-VJP kernels save only their [rows, S, E]
    inputs as residuals (never score- or [rows, F]-sized tensors), so
    storing activations is cheap enough that remat OFF wins whenever it
    fits. Measured on v5e 16 GB (tools/ab_remat.py, interleaved ABAB,
    base flagship, RESULTS.md round 5):

        B=8  : 383.2 (off) vs 421.9 (on) ms/step  -> off, -9.2%
        B=16 : 800.5 (off) vs 859.1 (on) ms/step  -> off, -6.8%
        B=32 : remat-off OOMs                     -> on

    "auto" turns remat off iff the bf16 residual estimate — two
    [rows, S, E] saves per layer across the three stacks — fits
    ``REMAT_AUTO_BUDGET_BYTES``. The reference has no remat at all
    (torch autograd stores everything,
    /root/reference/training/advanced_trainer.py:114-207).
    """
    r = getattr(config, "remat_encoders", "auto")
    if isinstance(r, bool):
        return r
    if isinstance(r, str) and r.lower() not in ("auto",):
        return r.lower() in ("1", "true", "on")

    text, audio, vit = resolve_backbone_configs(config)
    B = getattr(config, "batch_size", 8)
    s_text = getattr(config, "text_max_length", 512)
    # wav2vec2 conv frontend downsamples 16 kHz samples by 320
    s_audio = max(1, getattr(config, "audio_max_length", 160000) // 320)
    rows_video = B * getattr(config, "video_max_frames", 30)
    s_video = (vit.image_size // vit.patch_size) ** 2 + 1
    est = 2 * 2 * (  # two bf16 saves per layer
        text.num_layers * B * s_text * text.hidden_size
        + audio.num_layers * B * s_audio * audio.hidden_size
        + vit.num_layers * rows_video * s_video * vit.hidden_size
    )
    return est > REMAT_AUTO_BUDGET_BYTES


class TextEncoder(nn.Module):
    """DeBERTa backbone + prompt tuning + adapter + projection
    (reference: encoders.py:11-104)."""

    config: object  # ModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray,
                 use_adapter: bool = False, use_prompt: bool = False,
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        text_cfg, _, _ = resolve_backbone_configs(cfg, deterministic)
        backbone = DebertaModel(
            text_cfg, dtype=self.dtype, remat=resolve_remat(cfg),
            name="model",
        )
        B = input_ids.shape[0]

        if use_prompt:
            prompt = self.param(
                "prompt_embeddings", nn.initializers.normal(1.0),
                (cfg.prompt_length, text_cfg.hidden_size),
            )
            sequence_output = backbone(
                input_ids=input_ids, attention_mask=attention_mask,
                prompt_embeds=prompt, deterministic=deterministic,
            )
            attention_mask = jnp.concatenate(
                [jnp.ones((B, cfg.prompt_length), attention_mask.dtype),
                 attention_mask], axis=1,
            )
        else:
            sequence_output = backbone(
                input_ids=input_ids, attention_mask=attention_mask,
                deterministic=deterministic,
            )

        if use_adapter:
            sequence_output = AdapterLayer(
                cfg.adapter_size, dtype=self.dtype, name="adapter"
            )(sequence_output, deterministic=deterministic)

        if "bert" in text_cfg.model_type:  # reference substring rule
            pooled = sequence_output[:, 0]
        else:
            mask = attention_mask[..., None].astype(sequence_output.dtype)
            summed = jnp.sum(sequence_output * mask, axis=1)
            denom = jnp.clip(jnp.sum(mask, axis=1), 1e-9, None)
            pooled = summed / denom

        projected = nn.Dense(cfg.fusion_hidden_size, dtype=self.dtype,
                             name="projection")(pooled)
        projected = nn.Dropout(cfg.fusion_dropout)(projected,
                                                   deterministic=deterministic)
        return {
            "features": projected,
            "sequence_output": sequence_output,
            "attention_mask": attention_mask,
        }


class AudioEncoder(nn.Module):
    """Wav2Vec2 backbone + temporal attention + projection
    (reference: encoders.py:107-167)."""

    config: object
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, waveform: jnp.ndarray, use_adapter: bool = False,
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        if waveform.dtype == jnp.int16:
            # audio ships across the host→device boundary as int16 (the WAV
            # source precision): half the transfer bytes, dequantized here
            waveform = waveform.astype(self.dtype) / 32768.0
        _, audio_cfg, _ = resolve_backbone_configs(cfg, deterministic)
        sequence_output = Wav2Vec2Model(
            audio_cfg, dtype=self.dtype,
            remat=resolve_remat(cfg), name="model",
        )(waveform, deterministic=deterministic)

        if use_adapter:
            sequence_output = AdapterLayer(
                cfg.adapter_size, dtype=self.dtype, name="adapter"
            )(sequence_output, deterministic=deterministic)

        # need_weights=False: nothing downstream reads the temporal-attention
        # probabilities (the reference computes them and its model assembly
        # discards them — encoders.py:152-166 vs multimodal_model.py), and
        # materializing the [B, 8, S, S] tensor blocks the fused
        # attention-block kernel route (ops/attention.py:109-139).
        attended, attn_weights = MultiHeadAttention(
            audio_cfg.hidden_size, 8, cfg.fusion_dropout, dtype=self.dtype,
            use_flash=audio_cfg.use_flash, name="temporal_attention",
        )(sequence_output, sequence_output, sequence_output,
          deterministic=deterministic, need_weights=False)

        pooled = attended.mean(axis=1)
        projected = nn.Dense(cfg.fusion_hidden_size, dtype=self.dtype,
                             name="projection")(pooled)
        projected = nn.Dropout(cfg.fusion_dropout)(projected,
                                                   deterministic=deterministic)
        return {
            "features": projected,
            "sequence_output": attended,
            "attention_weights": attn_weights,
        }


class VideoEncoder(nn.Module):
    """ViT per frame + bidirectional LSTM + facial attention + projection
    (reference: encoders.py:170-251). Accepts uint8 [B,T,H,W,3] (normalized
    on device) or pre-normalized float frames."""

    config: object
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, video_frames: jnp.ndarray, use_adapter: bool = False,
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        _, _, vit_cfg = resolve_backbone_configs(cfg, deterministic)
        from ..data.video_wire import decode_video_wire

        video_frames = decode_video_wire(video_frames, self.dtype)
        B, T = video_frames.shape[0], video_frames.shape[1]
        frames = video_frames.reshape((B * T,) + video_frames.shape[2:])
        cls = ViTModel(
            vit_cfg, dtype=self.dtype,
            remat=resolve_remat(cfg), name="vit",
        )(frames, deterministic=deterministic, cls_only=True)
        frame_features = cls.reshape(B, T, -1)

        if use_adapter:
            frame_features = AdapterLayer(
                cfg.adapter_size, dtype=self.dtype, name="adapter"
            )(frame_features, deterministic=deterministic)

        lstm_out, _ = LSTM(
            vit_cfg.hidden_size // 2, num_layers=2, bidirectional=True,
            dropout=cfg.fusion_dropout, dtype=self.dtype, name="temporal_lstm",
        )(frame_features, deterministic=deterministic)

        # need_weights=False — see temporal_attention above: the weights are
        # computed-and-discarded in the reference, and skipping them unblocks
        # the fused attention-block kernel at this site.
        attended, attn_weights = MultiHeadAttention(
            vit_cfg.hidden_size, 8, cfg.fusion_dropout, dtype=self.dtype,
            use_flash=vit_cfg.use_flash, name="facial_attention",
        )(lstm_out, lstm_out, lstm_out, deterministic=deterministic,
          need_weights=False)

        pooled = attended.mean(axis=1)
        projected = nn.Dense(cfg.fusion_hidden_size, dtype=self.dtype,
                             name="projection")(pooled)
        projected = nn.Dropout(cfg.fusion_dropout)(projected,
                                                   deterministic=deterministic)
        return {
            "features": projected,
            "sequence_output": attended,
            "attention_weights": attn_weights,
        }
