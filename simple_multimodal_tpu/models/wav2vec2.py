"""Wav2Vec2 audio backbone in Flax.

From-scratch implementation of the architecture the reference loads as
``Wav2Vec2Model.from_pretrained("facebook/wav2vec2-base-960h")``
(/root/reference/models/encoders.py:116): a 7-layer strided conv feature
extractor (group-norm on the first layer only), feature projection, a
grouped-conv positional embedding with weight normalization, and a 12-layer
post-LN transformer. 160 000 samples → 499 frames, matching torch's conv
arithmetic exactly.

TPU-first details:
- The feature extractor runs as ``lax.conv_general_dilated`` over NWC
  layouts (XLA maps these onto the MXU); the whole 10-second clip is one
  fused conv stack, no framing loop.
- Weight-norm on the positional conv is folded at apply time
  (g * v/|v|), so inference does a plain conv.
- Optional SpecAugment-style time masking matches the torch training-time
  behavior (apply_spec_augment, mask_time_prob=0.05, length=10).
"""
import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import compact_scores, gelu


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    conv_dims: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernels: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_strides: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    layer_norm_eps: float = 1e-5
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    feat_proj_dropout: float = 0.1
    mask_time_prob: float = 0.05
    mask_time_length: int = 10
    use_flash: bool = False  # Pallas flash kernel for self-attention

    @staticmethod
    def base() -> "Wav2Vec2Config":
        """facebook/wav2vec2-base-960h dimensions."""
        return Wav2Vec2Config()

    @staticmethod
    def tiny() -> "Wav2Vec2Config":
        # Keep the full 320x stride stack: a 10-second clip must still come
        # out as ~499 frames or downstream attention goes quadratic in audio
        # length.
        return Wav2Vec2Config(
            conv_dims=(16,) * 7,
            hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
            pos_conv_kernel=8, pos_conv_groups=2,
        )

    @staticmethod
    def half() -> "Wav2Vec2Config":
        return Wav2Vec2Config(hidden_size=384, num_layers=6, num_heads=6,
                              intermediate_size=1536)

    def num_frames(self, num_samples: int) -> int:
        n = num_samples
        for k, s in zip(self.conv_kernels, self.conv_strides):
            n = (n - k) // s + 1
        return n


class FeatureEncoder(nn.Module):
    """Strided 1-D conv stack: raw waveform [B, T] → frames [B, T', C]."""

    config: Wav2Vec2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, waveform: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        from ..ops.pallas.wav_frontend import frontend_viable, wav_frontend

        # First stage (conv_0 → per-channel GroupNorm → GELU) fused kernel:
        # MEASURED LOSS on v5e, so default-OFF (SMM_WAV_FRONTEND=1 forces).
        # The two-pass group-framed kernel (ops/pallas/wav_frontend.py) is
        # numerically exact vs this composition, but interleaved A/B shows
        # XLA already runs the stage at ~3.5-4.5 ms vs the kernel's
        # 4.6-6.7 (XLA fuses the GN stats reduce and the normalize+GELU
        # into the conv, so its real traffic is ~790 MB, not the naive
        # 1.5 GB; the kernel's recompute matmul + VPU GELU eats the rest
        # of the margin). Same engagement discipline as plain flash at
        # short S: the kernel stays, measured and gated (RESULTS.md r4).
        # Params stay byte-compatible either way: ConvParams /
        # LayerNormParams mirror nn.Conv / nn.GroupNorm's trees.
        import os

        fuse0 = (cfg.use_flash
                 and os.environ.get("SMM_WAV_FRONTEND", "0") == "1"
                 and frontend_viable(
                     cfg.conv_kernels[0], cfg.conv_strides[0],
                     cfg.conv_dims[0]))
        x = waveform[..., None].astype(self.dtype)  # NWC: [B, T, 1]
        for i, (dim, k, s) in enumerate(
            zip(cfg.conv_dims, cfg.conv_kernels, cfg.conv_strides)
        ):
            if i == 0 and fuse0:
                from ..ops.attention import ConvParams, LayerNormParams

                kernel = ConvParams(dim, k, name="conv_0")(1)
                g, b = LayerNormParams(name="group_norm")(dim)
                x = wav_frontend(waveform, kernel.astype(self.dtype),
                                 g, b, stride=s, eps=1e-5)
                continue
            x = nn.Conv(dim, kernel_size=(k,), strides=(s,), padding="VALID",
                        use_bias=False, dtype=self.dtype, name=f"conv_{i}")(x)
            if i == 0:
                # torch GroupNorm(num_groups=C, num_channels=C): per-channel
                # normalization over the time axis.
                x = nn.GroupNorm(num_groups=x.shape[-1], epsilon=1e-5,
                                 dtype=self.dtype, name="group_norm")(x)
            x = gelu(x, self.dtype)
        return x


class PositionalConvEmbedding(nn.Module):
    """Grouped conv positional embedding with weight norm folded at apply."""

    config: Wav2Vec2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        E = cfg.hidden_size
        K, G = cfg.pos_conv_kernel, cfg.pos_conv_groups
        # torch weight_norm splits conv weight into direction v and scale g
        # (norm over all dims except out-channel groups' dim=2 in torch's
        # layout). Keep the same parametrization so checkpoints convert 1:1.
        weight_v = self.param(
            "weight_v", nn.initializers.normal(0.02), (K, E // G, E)
        )  # flax conv kernel layout: [kernel, in/groups, out]
        # torch applies weight_norm(dim=2): the scale g is per kernel
        # position, with v normed over (out, in) at each position.
        weight_g = self.param("weight_g", nn.initializers.ones, (K, 1, 1))
        bias = self.param("bias", nn.initializers.zeros, (E,))
        norm = jnp.sqrt(
            jnp.sum(weight_v.astype(jnp.float32) ** 2, axis=(1, 2), keepdims=True)
        )
        kernel = (weight_g * weight_v / jnp.maximum(norm, 1e-12)).astype(self.dtype)
        pad = K // 2
        out = jax.lax.conv_general_dilated(
            hidden.astype(self.dtype),
            kernel,
            window_strides=(1,),
            padding=[(pad, pad)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=G,
        ) + bias.astype(self.dtype)
        if K % 2 == 0:  # SamePad: drop the trailing extra frame
            out = out[:, :-1, :]
        return gelu(out, self.dtype)


class Wav2Vec2EncoderLayer(nn.Module):
    """Post-LN transformer layer (do_stable_layer_norm=False)."""

    config: Wav2Vec2Config
    dtype: jnp.dtype = jnp.float32
    scan: bool = False  # under nn.scan the body must return (carry, ys)

    @nn.compact
    def __call__(self, hidden: jnp.ndarray, deterministic: bool = True):
        cfg = self.config
        E, H = cfg.hidden_size, cfg.num_heads
        D = E // H
        B, S, _ = hidden.shape

        # Attention routing: the fully-fused block kernel (qkv-proj +
        # softmax(QKᵀ)V + out-proj, natural [B, S, E] I/O) — per-op kernels
        # lose in-context to their own operand materialization (vit.py note).
        from ..ops.attention import DenseParams
        from ..ops.pallas.attention_block import attention_block, block_viable

        fused_ok = (cfg.use_flash
                    and (deterministic or cfg.attention_dropout == 0.0))
        # the block kernel also serves TRAINING: attention dropout runs
        # in-kernel from a stateless hash (attention_block.py _drop_keep)
        if cfg.use_flash and H * D == E and block_viable(S, H, D, E):
            from ..ops.attention import kernel_dropout_seed

            drop_rate, drop_seed = kernel_dropout_seed(
                self, 0.0 if deterministic else cfg.attention_dropout)
            wq, bq = DenseParams(E, name="q_proj")(E)
            wk, bk = DenseParams(E, name="k_proj")(E)
            wv, bv = DenseParams(E, name="v_proj")(E)
            wo, bo = DenseParams(E, name="out_proj")(E)
            attn = attention_block(
                hidden, wq.astype(self.dtype), bq.astype(self.dtype),
                wk.astype(self.dtype), bk.astype(self.dtype),
                wv.astype(self.dtype), bv.astype(self.dtype),
                wo.astype(self.dtype), bo.astype(self.dtype), num_heads=H,
                dropout_rate=drop_rate, dropout_seed=drop_seed,
            )
        else:
            q = nn.Dense(E, dtype=self.dtype, name="q_proj")(hidden)
            k = nn.Dense(E, dtype=self.dtype, name="k_proj")(hidden)
            v = nn.Dense(E, dtype=self.dtype, name="v_proj")(hidden)
            q = q.reshape(B, S, H, D)
            k = k.reshape(B, S, H, D)
            v = v.reshape(B, S, H, D)
            if fused_ok and S > 512:
                from ..ops.pallas.flash_attention import flash_attention

                ctx = flash_attention(q, k, v)
            else:
                scores = jnp.einsum("bqhd,bkhd->bhqk", q * (D ** -0.5), k,
                                    preferred_element_type=jnp.float32)
                scores = compact_scores(scores, self.dtype)
                probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
                probs = nn.Dropout(cfg.attention_dropout)(probs,
                                                          deterministic=deterministic)
                ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                                 preferred_element_type=jnp.float32).astype(self.dtype)
            attn = nn.Dense(E, dtype=self.dtype, name="out_proj")(ctx.reshape(B, S, E))
        attn = nn.Dropout(cfg.hidden_dropout)(attn, deterministic=deterministic)
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                              name="layer_norm")(hidden + attn)

        from ..ops.pallas.ffn_block import ffn_block, ffn_viable

        F = cfg.intermediate_size
        # Post-LN FFN sub-block in ONE kernel: LN(hidden + W2·gelu(W1·h)) —
        # the [S, F] intermediate never leaves VMEM. Both hidden dropouts
        # (post-GELU intermediate + FFN output, matching the unfused
        # composition below) run in-kernel from a stateless hash, so the
        # fused path serves training too.
        if (cfg.use_flash
                and ffn_viable(S, E, F, jnp.dtype(self.dtype).itemsize)):
            from ..ops.attention import (
                DenseParams, LayerNormParams, kernel_dropout_seed,
            )

            rate, seed = kernel_dropout_seed(
                self, 0.0 if deterministic else cfg.hidden_dropout)
            w1, b1 = DenseParams(F, name="intermediate_dense")(E)
            w2, b2 = DenseParams(E, name="output_dense")(F)
            g, b = LayerNormParams(name="final_layer_norm")(E)
            out = ffn_block(
                hidden, w1.astype(self.dtype), b1.astype(self.dtype),
                w2.astype(self.dtype), b2.astype(self.dtype),
                ln=(g.astype(self.dtype), b.astype(self.dtype),
                    cfg.layer_norm_eps),
                ln_post=True, residual=True,
                dropout_rate_mid=rate, dropout_rate_out=rate,
                dropout_seed=seed,
            )
            return (out, None) if self.scan else out
        ff = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                      name="intermediate_dense")(hidden)
        ff = gelu(ff, self.dtype)
        ff = nn.Dropout(cfg.hidden_dropout)(ff, deterministic=deterministic)
        ff = nn.Dense(E, dtype=self.dtype, name="output_dense")(ff)
        ff = nn.Dropout(cfg.hidden_dropout)(ff, deterministic=deterministic)
        out = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                           name="final_layer_norm")(hidden + ff)
        return (out, None) if self.scan else out


class Wav2Vec2Model(nn.Module):
    """Raw waveform [B, T] → hidden frames [B, T', E]."""

    config: Wav2Vec2Config
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    apply_spec_augment: bool = True

    @nn.compact
    def __call__(self, waveform: jnp.ndarray, deterministic: bool = True):
        cfg = self.config
        feats = FeatureEncoder(cfg, dtype=self.dtype, name="feature_encoder")(waveform)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="fp_layer_norm")(feats)
        x = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fp_projection")(x)
        x = nn.Dropout(cfg.feat_proj_dropout)(x, deterministic=deterministic)

        if self.apply_spec_augment and cfg.mask_time_prob > 0:
            # Param must exist regardless of mode so init/apply trees agree.
            mask_embed = self.param(
                "masked_spec_embed", nn.initializers.uniform(1.0),
                (cfg.hidden_size,),
            )
        if self.apply_spec_augment and not deterministic and cfg.mask_time_prob > 0:
            # SpecAugment time masking: each frame starts a mask of
            # mask_time_length with prob mask_time_prob (torch training path).
            key = self.make_rng("dropout")
            B, S, _ = x.shape
            starts = jax.random.uniform(key, (B, S)) < cfg.mask_time_prob
            window = jnp.ones((cfg.mask_time_length,), x.dtype)
            masked = jnp.clip(
                jax.vmap(lambda s: jnp.convolve(s.astype(x.dtype), window, mode="full")[
                    : S
                ])(starts),
                0, 1,
            )
            x = jnp.where(masked[..., None] > 0, mask_embed.astype(x.dtype), x)

        pos = PositionalConvEmbedding(cfg, dtype=self.dtype, name="pos_conv")(x)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="encoder_layer_norm")(x + pos)
        x = nn.Dropout(cfg.hidden_dropout)(x, deterministic=deterministic)

        # nn.scan over stacked [L, ...] layer params: one traced/compiled
        # body instead of num_layers unrolled copies (see deberta.py note).
        layer_cls = (
            nn.remat(Wav2Vec2EncoderLayer, static_argnums=(2,), prevent_cse=False)
            if self.remat else Wav2Vec2EncoderLayer
        )
        scanned = nn.scan(
            layer_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=nn.broadcast,
            length=cfg.num_layers,
        )
        x, _ = scanned(cfg, dtype=self.dtype, scan=True, name="layers")(
            x, deterministic
        )
        return x
