"""DeBERTa-v2/v3 text backbone in Flax, with disentangled attention.

From-scratch implementation of the architecture the reference loads as
``AutoModel.from_pretrained("microsoft/deberta-v3-base")``
(/root/reference/models/encoders.py:20): relative-position *log-bucketed*
disentangled attention with content→position (c2p) and position→content
(p2c) bias terms, shared attention keys, layer-normed relative embeddings,
and no absolute-position bias in the embeddings.

TPU-first details:
- Sequence length is static under jit, so the bucketed relative-position
  matrix is a compile-time numpy constant — no per-step bucket math.
- The c2p/p2c bias gathers are ``take_along_axis`` over the last axis of an
  MXU-computed [B,H,S,2*span] score tensor.
- Numerics verified to ≤1e-3 against transformers' torch DebertaV2Model with
  converted weights (tests/test_encoder_parity.py).
"""
import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import compact_scores, gelu


@dataclasses.dataclass(frozen=True)
class DebertaConfig:
    vocab_size: int = 128100
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    position_buckets: int = 256
    use_flash: bool = False  # Pallas flash kernel for the softmax(·)V stage
    layer_norm_eps: float = 1e-7
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    # model_type string drives the reference's pooling rule
    # ('bert' in 'deberta-v2' → CLS pooling, encoders.py:87-94)
    model_type: str = "deberta-v2"

    @staticmethod
    def base() -> "DebertaConfig":
        """microsoft/deberta-v3-base dimensions."""
        return DebertaConfig()

    @staticmethod
    def tiny() -> "DebertaConfig":
        return DebertaConfig(
            vocab_size=1024, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, max_position_embeddings=64, position_buckets=16,
        )

    @staticmethod
    def half() -> "DebertaConfig":
        """Distillation student scale (half width/depth)."""
        return DebertaConfig(hidden_size=384, num_layers=6, num_heads=6,
                             intermediate_size=1536)


def log_bucket(rel: np.ndarray, bucket_size: int, max_position: int) -> np.ndarray:
    """DeBERTa's log-bucket map, elementwise over an array of relative
    positions: positions within ±bucket_size/2 are exact; farther ones are
    log-spaced into the remaining buckets. Antisymmetric: b(-x) = -b(x)."""
    mid = bucket_size // 2
    sign = np.sign(rel)
    abs_pos = np.where((rel < mid) & (rel > -mid), mid - 1, np.abs(rel))
    with np.errstate(divide="ignore", invalid="ignore"):
        log_pos = (
            np.ceil(np.log(abs_pos / mid) / np.log((max_position - 1) / mid) * (mid - 1))
            + mid
        )
    bucket = np.where(abs_pos <= mid, rel.astype(np.float64), log_pos * sign)
    return bucket.astype(np.int32)


def log_bucket_positions(seq_len: int, bucket_size: int, max_position: int) -> np.ndarray:
    """Bucketed relative positions [seq, seq], computed host-side as a constant."""
    q = np.arange(seq_len)
    return log_bucket(q[:, None] - q[None, :], bucket_size, max_position)


class DisentangledSelfAttention(nn.Module):
    config: DebertaConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, attention_bias, rel_embeddings, rel_select,
                 attention_mask, deterministic: bool = True):
        cfg = self.config
        B, S, E = hidden.shape
        H = cfg.num_heads
        D = E // H
        span = cfg.position_buckets  # pos_ebd_size with buckets enabled

        q_proj = nn.Dense(E, dtype=self.dtype, name="query_proj")
        k_proj = nn.Dense(E, dtype=self.dtype, name="key_proj")
        v_proj = nn.Dense(E, dtype=self.dtype, name="value_proj")

        q = q_proj(hidden).reshape(B, S, H, D)
        k = k_proj(hidden).reshape(B, S, H, D)
        v = v_proj(hidden).reshape(B, S, H, D)

        scale_factor = 3  # 1 + c2p + p2c
        scale = jnp.sqrt(jnp.array(D, jnp.float32) * scale_factor)

        if rel_select is None:
            # Fused-kernel path (DebertaModel decided it): QKᵀ, the c2p/p2c
            # bias, masking, softmax, and ·V run in ONE Pallas program per
            # (batch, head-group) — no [B, H, S, S] tensor ever reaches HBM.
            # The one-hot XLA path below streams ~536 MB/layer of selection
            # constants at S=512 (bandwidth-bound, 2 ms/layer measured).
            from ..ops.pallas.deberta_attention import deberta_attention

            rel_embeddings = nn.Dropout(cfg.hidden_dropout)(
                rel_embeddings, deterministic=deterministic
            )
            pos_k = k_proj(rel_embeddings)   # share_att_key=True
            pos_q = q_proj(rel_embeddings)
            from ..ops.attention import kernel_dropout_seed

            drop_rate, drop_seed = kernel_dropout_seed(
                self, 0.0 if deterministic else cfg.attention_dropout)
            ctx = deberta_attention(
                q, k, v, pos_k, pos_q, attention_mask,
                span=span, max_position=cfg.max_position_embeddings,
                dropout_rate=drop_rate, dropout_seed=drop_seed,
            )
            return ctx.reshape(B, S, E)

        # --- disentangled bias (share_att_key=True: reuse q/k projections) ---
        # The (q,k)→bucket selection is a static pattern; the bias "gather"
        # runs as one-hot einsums on the MXU instead of take_along_axis
        # (measured on-chip: the [B,H,S,S] minor-axis gather is ~150x slower
        # than the whole encoder). A Transformer-XL rel-shift variant (fewer
        # FLOPs, more layout copies) was measured 4-6x SLOWER per layer here:
        # at S=512=2*span the one-hot contraction rides the MXU at >100 TF/s
        # while skew pad/reshape/slice copies are HBM-bandwidth-bound —
        # FLOPs are cheap, bytes are not. (For S >> buckets the rel-shift
        # trade flips; revisit if long-context text lands.)
        c2p_sel, p2c_sel = rel_select  # [S, S, 2*span] one-hots
        rel_embeddings = nn.Dropout(cfg.hidden_dropout)(
            rel_embeddings, deterministic=deterministic
        )
        pos_q = q_proj(rel_embeddings).reshape(2 * span, H, D)
        pos_k = k_proj(rel_embeddings).reshape(2 * span, H, D)

        # c2p: bias[q,k] = q[q]·pos_k[bucket(q−k)]
        # Each [B,H,S,S] bias product is stored in the compute dtype under
        # mixed precision (compact_scores): same traffic-halving trade as
        # the QK^T scores; the softmax-input sum happens in f32.
        c2p = jnp.einsum("bqhd,phd->bhqp", q, pos_k,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        c2p = compact_scores(jnp.einsum("bhqp,qkp->bhqk", c2p, c2p_sel,
                                        preferred_element_type=jnp.float32),
                             self.dtype)
        # p2c: bias[q,k] = k[k]·pos_q[bucket(−(k−q))]
        p2c = jnp.einsum("bkhd,phd->bhkp", k, pos_q,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        p2c = compact_scores(jnp.einsum("bhkp,kqp->bhqk", p2c, p2c_sel,
                                        preferred_element_type=jnp.float32),
                             self.dtype)
        rel_bias = (c2p + p2c) / scale

        # v5e-measured: with the disentangled bias already materialized in
        # HBM, flash is only at parity at S=512 — XLA keeps the default;
        # flash takes over beyond, where probs traffic grows quadratically
        if (cfg.use_flash and S > 512
                and (deterministic or cfg.attention_dropout == 0.0)):
            from ..ops.pallas.flash_attention import flash_attention

            # flash applies 1/sqrt(D); fold the remaining 1/sqrt(3) into q so
            # the fused logits are (q·k + c2p + p2c)/sqrt(3D) + mask.
            sqrt_d_over_scale = (jnp.sqrt(jnp.array(D, jnp.float32))
                                 / scale).astype(self.dtype)
            ctx = flash_attention(q * sqrt_d_over_scale, k, v,
                                  bias=rel_bias + attention_bias)
            return ctx.reshape(B, S, E)

        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k / scale.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        # compact BEFORE the additive key mask: f32.min would round to
        # -inf in bf16 and fully-masked (padded-query) rows would go NaN,
        # which the next layer's QK^T would spread to valid rows
        scores = compact_scores(scores + rel_bias, self.dtype) + attention_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        probs = nn.Dropout(cfg.attention_dropout)(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        return ctx.reshape(B, S, E)


class DebertaLayer(nn.Module):
    config: DebertaConfig
    dtype: jnp.dtype = jnp.float32
    scan: bool = False  # under nn.scan the body must return (carry, ys)

    @nn.compact
    def __call__(self, hidden, attention_bias, rel_embeddings, rel_select,
                 attention_mask, deterministic: bool = True):
        cfg = self.config
        attn = DisentangledSelfAttention(cfg, dtype=self.dtype, name="self")(
            hidden, attention_bias, rel_embeddings, rel_select,
            attention_mask, deterministic
        )
        attn = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="attn_out_dense")(attn)
        attn = nn.Dropout(cfg.hidden_dropout)(attn, deterministic=deterministic)
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                              name="attn_out_ln")(attn + hidden)

        from ..ops.pallas.ffn_block import ffn_block, ffn_viable

        E, F = cfg.hidden_size, cfg.intermediate_size
        S = hidden.shape[1]
        # Post-LN FFN sub-block in ONE kernel: LN(hidden + W2·gelu(W1·h))
        # — the [S, F] intermediate never leaves VMEM. The hidden dropout
        # (FFN output, pre-residual) runs in-kernel from a stateless
        # hash, so the fused path serves training too.
        if (cfg.use_flash
                and ffn_viable(S, E, F, jnp.dtype(self.dtype).itemsize)):
            from ..ops.attention import (
                DenseParams, LayerNormParams, kernel_dropout_seed,
            )

            rate, seed = kernel_dropout_seed(
                self, 0.0 if deterministic else cfg.hidden_dropout)
            w1, b1 = DenseParams(F, name="intermediate_dense")(E)
            w2, b2 = DenseParams(E, name="output_dense")(F)
            g, b = LayerNormParams(name="output_ln")(E)
            out = ffn_block(
                hidden, w1.astype(self.dtype), b1.astype(self.dtype),
                w2.astype(self.dtype), b2.astype(self.dtype),
                ln=(g.astype(self.dtype), b.astype(self.dtype),
                    cfg.layer_norm_eps),
                ln_post=True, residual=True,
                dropout_rate_out=rate, dropout_seed=seed,
            )
            return (out, None) if self.scan else out
        inter = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                         name="intermediate_dense")(hidden)
        inter = gelu(inter, self.dtype)
        out = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="output_dense")(inter)
        out = nn.Dropout(cfg.hidden_dropout)(out, deterministic=deterministic)
        out = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                           name="output_ln")(out + hidden)
        return (out, None) if self.scan else out


class DebertaModel(nn.Module):
    """DeBERTa-v2/v3 encoder. Returns last_hidden_state [B, S, E]."""

    config: DebertaConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, input_ids: Optional[jnp.ndarray] = None,
                 attention_mask: Optional[jnp.ndarray] = None,
                 inputs_embeds: Optional[jnp.ndarray] = None,
                 prompt_embeds: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        embed = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                         embedding_init=nn.initializers.normal(0.02),
                         dtype=self.dtype, name="word_embeddings")
        if inputs_embeds is None:
            inputs_embeds = embed(input_ids)
        if prompt_embeds is not None:
            # Prompt tuning: learned embeddings prepended to the word
            # embeddings with the mask extended (reference: encoders.py:49-71).
            B = inputs_embeds.shape[0]
            P = prompt_embeds.shape[-2]
            if prompt_embeds.ndim == 2:
                prompt_embeds = jnp.broadcast_to(
                    prompt_embeds[None], (B, P, cfg.hidden_size)
                )
            inputs_embeds = jnp.concatenate(
                [prompt_embeds.astype(inputs_embeds.dtype), inputs_embeds], axis=1
            )
            if attention_mask is not None:
                attention_mask = jnp.concatenate(
                    [jnp.ones((B, P), attention_mask.dtype), attention_mask], axis=1
                )
        B, S, _ = inputs_embeds.shape
        if attention_mask is None:
            attention_mask = jnp.ones((B, S), dtype=jnp.int32)

        emb = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                           name="emb_ln")(inputs_embeds)
        emb = emb * attention_mask[..., None].astype(emb.dtype)
        hidden = nn.Dropout(cfg.hidden_dropout)(emb, deterministic=deterministic)

        # Path choice: the fused Pallas kernel computes the disentangled bias
        # per VMEM tile (ops/pallas/deberta_attention.py); the XLA fallback
        # materializes one-hot bucket selections and [B,H,S,S] biases. The
        # kernel path must also skip building the [S,S,2·span] one-hot
        # constants — at S=512 they are ~268 MB of HBM-resident graph
        # constants on their own.
        from ..ops.pallas.deberta_attention import fused_viable

        head_dim = cfg.hidden_size // cfg.num_heads
        # attention dropout no longer forces the one-hot path: the kernel
        # applies it in-VMEM from a stateless hash (fwd + bwd regenerate
        # the same mask), so the fused path serves the training step too
        use_fused = (
            cfg.use_flash
            and fused_viable(S, cfg.num_heads, head_dim)
        )
        span = cfg.position_buckets
        if use_fused:
            attention_bias = None
            rel_select = None
        else:
            m = attention_mask.astype(bool)
            pair = m[:, None, :, None] & m[:, None, None, :]
            attention_bias = jnp.where(pair, 0.0, jnp.finfo(jnp.float32).min)
            rel_pos = log_bucket_positions(S, span, cfg.max_position_embeddings)
            # Static one-hot bucket selections, computed once and shared by
            # every layer (the bias gathers run as MXU einsums against these).
            c2p_idx = np.clip(rel_pos + span, 0, 2 * span - 1)
            p2c_idx = np.clip(-rel_pos + span, 0, 2 * span - 1)
            c2p_sel = jax.nn.one_hot(c2p_idx, 2 * span, dtype=self.dtype)
            p2c_sel = jax.nn.one_hot(p2c_idx, 2 * span, dtype=self.dtype)
            rel_select = (c2p_sel, p2c_sel)

        rel_emb_table = self.param(
            "rel_embeddings", nn.initializers.normal(0.02),
            (2 * cfg.position_buckets, cfg.hidden_size),
        ).astype(self.dtype)
        rel_embeddings = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="rel_ln"
        )(rel_emb_table)

        # Layers run under nn.scan with stacked [L, ...] params: the layer
        # body is traced and compiled ONCE instead of num_layers times —
        # unrolled 12-layer stacks were the dominant compile cost (569 s for
        # the flagship forward; three 12-layer encoders, ×2 for the KD pair).
        # prevent_cse is safe off inside scan (jax.checkpoint docs); remat
        # composes as scan-of-remat, the standard per-layer pattern.
        layer_cls = (
            nn.remat(DebertaLayer, static_argnums=(6,), prevent_cse=False)
            if self.remat else DebertaLayer
        )
        scanned = nn.scan(
            layer_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=nn.broadcast,
            length=cfg.num_layers,
        )
        hidden, _ = scanned(cfg, dtype=self.dtype, scan=True, name="layers")(
            hidden, attention_bias, rel_embeddings, rel_select,
            attention_mask, deterministic
        )
        return hidden
