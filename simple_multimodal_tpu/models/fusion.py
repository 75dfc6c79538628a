"""The seven multimodal fusion strategies, as one XLA graph each.

Capability parity with /root/reference/models/fusion_layers.py (EarlyFusion,
LateFusion, MultimodalTransformer/CrossModalTransformer, GraphFusion,
ContrastiveFusion, AdaptiveFusion, HierarchicalFusion), redesigned TPU-first:

- GraphFusion is a *dense* 3-node graph-attention network computed with
  batched einsums (the graph is always the 3 fully-connected modality nodes,
  fusion_layers.py:267-270), eliminating the reference's per-sample Python
  graph-construction loop (fusion_layers.py:253-274) by construction.
- All attention uses ops.attention.MultiHeadAttention (torch MHA numerics).
- Dense layers inside former torch ``nn.Sequential`` stacks are named by
  their Sequential index ("0", "3", ...) so torch checkpoints convert 1:1.

Known reference defect, fixed here and documented: the reference stacks
``graph_num_layers`` GAT layers all declared as in=512→out=256
(fusion_layers.py:223-232), which crashes for layers ≥2 (a 256-d input into
a 512-in layer). Here layer 0 maps fusion_hidden→graph_hidden and deeper
layers map graph_hidden→graph_hidden, which is the evident intent.
"""
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import MultiHeadAttention


class EarlyFusion(nn.Module):
    """Concat → MLP (reference: fusion_layers.py:9-43)."""

    config: object
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text, audio, video, deterministic: bool = True):
        cfg = self.config
        x = jnp.concatenate([text, audio, video], axis=-1)
        x = nn.Dense(cfg.fusion_hidden_size * 2, dtype=self.dtype, name="0")(x)
        x = nn.relu(x)
        x = nn.Dropout(cfg.fusion_dropout)(x, deterministic=deterministic)
        x = nn.Dense(cfg.fusion_hidden_size, dtype=self.dtype, name="3")(x)
        x = nn.relu(x)
        x = nn.Dropout(cfg.fusion_dropout)(x, deterministic=deterministic)
        return x


class LateFusion(nn.Module):
    """Per-modality classifiers + learned softmax weights
    (reference: fusion_layers.py:46-90)."""

    config: object
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text, audio, video, deterministic: bool = True):
        cfg = self.config
        text_logits = nn.Dense(cfg.num_emotions, dtype=self.dtype,
                               name="text_classifier")(text)
        audio_logits = nn.Dense(cfg.num_emotions, dtype=self.dtype,
                                name="audio_classifier")(audio)
        video_logits = nn.Dense(cfg.num_emotions, dtype=self.dtype,
                                name="video_classifier")(video)
        fusion_weights = self.param(
            "fusion_weights", lambda k: jnp.ones(3) / 3.0
        )
        weights = jax.nn.softmax(fusion_weights)
        fused = (
            weights[0] * text_logits
            + weights[1] * audio_logits
            + weights[2] * video_logits
        )
        return {
            "fused_logits": fused,
            "text_logits": text_logits,
            "audio_logits": audio_logits,
            "video_logits": video_logits,
            "fusion_weights": weights,
        }


class CrossModalTransformer(nn.Module):
    """Pre-built cross-attention block: MHA + add&norm + FFN + add&norm
    (reference: fusion_layers.py:182-211)."""

    config: object
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key_value, deterministic: bool = True):
        cfg = self.config
        E = cfg.fusion_hidden_size
        attn_out, _ = MultiHeadAttention(
            E, cfg.fusion_num_heads, cfg.fusion_dropout, dtype=self.dtype,
            name="attention",
        )(query, key_value, key_value, deterministic=deterministic,
          need_weights=False)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(query + attn_out)
        h = nn.Dense(E * 4, dtype=self.dtype, name="ffn_0")(x)
        h = nn.relu(h)
        h = nn.Dropout(cfg.fusion_dropout)(h, deterministic=deterministic)
        h = nn.Dense(E, dtype=self.dtype, name="ffn_3")(h)
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(x + h)


class MultimodalTransformer(nn.Module):
    """MulT: 6 directed cross-modal blocks + per-modality self-attention
    (reference: fusion_layers.py:93-179)."""

    config: object
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text, audio, video, deterministic: bool = True):
        cfg = self.config
        E = cfg.fusion_hidden_size
        # Accept pooled [B, E] features by treating them as length-1 sequences
        # (reference: fusion_layers.py:140-143).
        squeeze = text.ndim == 2
        if squeeze:
            text, audio, video = (x[:, None, :] for x in (text, audio, video))

        def xmod(name):
            return CrossModalTransformer(cfg, dtype=self.dtype, name=name)

        t_from_a = xmod("text_to_audio")(text, audio, deterministic=deterministic)
        t_from_v = xmod("text_to_video")(text, video, deterministic=deterministic)
        a_from_t = xmod("audio_to_text")(audio, text, deterministic=deterministic)
        a_from_v = xmod("audio_to_video")(audio, video, deterministic=deterministic)
        v_from_t = xmod("video_to_text")(video, text, deterministic=deterministic)
        v_from_a = xmod("video_to_audio")(video, audio, deterministic=deterministic)

        enh_t = text + t_from_a + t_from_v
        enh_a = audio + a_from_t + a_from_v
        enh_v = video + v_from_t + v_from_a

        def self_attn(name, x):
            out, _ = MultiHeadAttention(
                E, cfg.fusion_num_heads, cfg.fusion_dropout, dtype=self.dtype,
                name=name,
            )(x, x, x, deterministic=deterministic, need_weights=False)
            return out

        t_att = self_attn("text_self_attn", enh_t).mean(axis=1)
        a_att = self_attn("audio_self_attn", enh_a).mean(axis=1)
        v_att = self_attn("video_self_attn", enh_v).mean(axis=1)

        fused = jnp.concatenate([t_att, a_att, v_att], axis=-1)
        fused = nn.Dense(E, dtype=self.dtype, name="final_fusion_0")(fused)
        fused = nn.relu(fused)
        fused = nn.Dropout(cfg.fusion_dropout)(fused, deterministic=deterministic)
        return {
            "fused_features": fused,
            "text_features": t_att,
            "audio_features": a_att,
            "video_features": v_att,
        }


class DenseGATLayer(nn.Module):
    """One GAT layer over a dense (fully-connected + self-loop) tiny graph.

    Numerics follow torch_geometric's ``GATConv(heads, concat=False)``
    with its default self-loops: per-head attention logits
    ``LeakyReLU(a_src·Wx_j + a_dst·Wx_i)`` softmaxed over source nodes j,
    output averaged over heads plus bias. Expressed as batched einsums:
    with N=3 nodes there is nothing to scatter.
    """

    out_features: int
    heads: int = 4
    dropout: float = 0.1
    negative_slope: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        # x: [B, N, F_in] → [B, N, out_features]
        B, N, _ = x.shape
        H, C = self.heads, self.out_features
        xp = nn.Dense(H * C, use_bias=False, dtype=self.dtype, name="lin")(x)
        xp = xp.reshape(B, N, H, C)
        att_src = self.param("att_src", nn.initializers.glorot_uniform(), (1, H, C))
        att_dst = self.param("att_dst", nn.initializers.glorot_uniform(), (1, H, C))
        s = jnp.einsum("bnhc,ohc->bnh", xp, att_src.astype(self.dtype))
        d = jnp.einsum("bnhc,ohc->bnh", xp, att_dst.astype(self.dtype))
        # e[b, i, j, h]: edge j→i score
        e = nn.leaky_relu(
            d[:, :, None, :] + s[:, None, :, :], self.negative_slope
        )
        alpha = jax.nn.softmax(e, axis=2)
        alpha = nn.Dropout(self.dropout)(alpha, deterministic=deterministic)
        out = jnp.einsum(
            "bijh,bjhc->bihc", alpha, xp, preferred_element_type=jnp.float32
        ).astype(self.dtype)
        out = out.mean(axis=2)  # concat=False → average heads
        bias = self.param("bias", nn.initializers.zeros, (C,))
        return out + bias.astype(self.dtype)


class GraphFusion(nn.Module):
    """Modalities as a 3-node graph, fused by stacked dense-GAT layers
    (reference: fusion_layers.py:214-291, minus the per-sample host loop)."""

    config: object
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text, audio, video, deterministic: bool = True):
        cfg = self.config
        nodes = jnp.stack([text, audio, video], axis=1)  # [B, 3, E]
        type_embed = nn.Embed(
            3, cfg.fusion_hidden_size, dtype=self.dtype, name="node_type_embedding"
        )(jnp.arange(3))
        x = nodes + type_embed[None, :, :]
        for i in range(cfg.graph_num_layers):
            x = DenseGATLayer(
                cfg.graph_hidden_size,
                heads=4,
                dropout=cfg.graph_dropout,
                dtype=self.dtype,
                name=f"gcn_layers_{i}",
            )(x, deterministic=deterministic)
            x = nn.relu(x)
        pooled = x.mean(axis=1)  # global mean pool over the 3 nodes
        return nn.Dense(
            cfg.fusion_hidden_size, dtype=self.dtype, name="output_projection"
        )(pooled)


def info_nce(z1: jnp.ndarray, z2: jnp.ndarray, temperature: float) -> jnp.ndarray:
    """Symmetric InfoNCE over in-batch pairs (reference: fusion_layers.py:361-375)."""
    sim = jnp.einsum(
        "bd,cd->bc", z1, z2, preferred_element_type=jnp.float32
    ) / temperature
    labels = jnp.arange(z1.shape[0])
    logp_12 = jax.nn.log_softmax(sim, axis=-1)
    logp_21 = jax.nn.log_softmax(sim.T, axis=-1)
    loss_1 = -jnp.take_along_axis(logp_12, labels[:, None], axis=1).mean()
    loss_2 = -jnp.take_along_axis(logp_21, labels[:, None], axis=1).mean()
    return (loss_1 + loss_2) / 2.0


class ContrastiveFusion(nn.Module):
    """Projection heads + in-batch InfoNCE + concat-MLP fusion
    (reference: fusion_layers.py:294-375)."""

    config: object
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text, audio, video, compute_contrastive_loss: bool = False,
                 deterministic: bool = True):
        cfg = self.config
        E = cfg.fusion_hidden_size

        def projector(name, x):
            h = nn.Dense(E, dtype=self.dtype, name=f"{name}_0")(x)
            h = nn.relu(h)
            h = nn.Dense(E // 2, dtype=self.dtype, name=f"{name}_2")(h)
            # smooth L2 normalize: sqrt's gradient at an exactly-zero vector
            # is NaN (hit whenever modality dropout zeroes a modality);
            # rsqrt(|h|²+eps) matches torch F.normalize's 0-subgradient there
            sq = jnp.sum(h.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
            return h * jax.lax.rsqrt(sq + 1e-12).astype(self.dtype)

        text_proj = projector("text_projector", text)
        audio_proj = projector("audio_projector", audio)
        video_proj = projector("video_projector", video)

        contrastive_losses = {}
        if compute_contrastive_loss:
            t = cfg.contrastive_temperature
            contrastive_losses = {
                "text_audio": info_nce(text_proj, audio_proj, t),
                "text_video": info_nce(text_proj, video_proj, t),
                "audio_video": info_nce(audio_proj, video_proj, t),
            }

        fused = jnp.concatenate([text, audio, video], axis=-1)
        fused = nn.Dense(E, dtype=self.dtype, name="fusion_layer_0")(fused)
        fused = nn.relu(fused)
        fused = nn.Dropout(cfg.fusion_dropout)(fused, deterministic=deterministic)
        return {
            "fused_features": fused,
            "text_proj": text_proj,
            "audio_proj": audio_proj,
            "video_proj": video_proj,
            "contrastive_losses": contrastive_losses,
        }


class AdaptiveFusion(nn.Module):
    """Attention over the 3 modality tokens + predicted mixing weights
    (reference: fusion_layers.py:378-452)."""

    config: object
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text, audio, video, deterministic: bool = True):
        cfg = self.config
        E = cfg.fusion_hidden_size
        t = nn.Dense(E, dtype=self.dtype, name="text_transform")(text)
        a = nn.Dense(E, dtype=self.dtype, name="audio_transform")(audio)
        v = nn.Dense(E, dtype=self.dtype, name="video_transform")(video)
        stacked = jnp.stack([t, a, v], axis=1)  # [B, 3, E]
        attended, attention_weights = MultiHeadAttention(
            E, cfg.fusion_num_heads, cfg.fusion_dropout, dtype=self.dtype,
            name="attention",
        )(stacked, stacked, stacked, deterministic=deterministic)

        concat = jnp.concatenate([text, audio, video], axis=-1)
        w = nn.Dense(E, dtype=self.dtype, name="weight_predictor_0")(concat)
        w = nn.relu(w)
        w = nn.Dense(3, dtype=self.dtype, name="weight_predictor_2")(w)
        adaptive_weights = jax.nn.softmax(w, axis=-1)

        weighted = jnp.sum(attended * adaptive_weights[..., None], axis=1)
        out = nn.Dense(E, dtype=self.dtype, name="fusion_layer_0")(weighted)
        out = nn.relu(out)
        out = nn.Dropout(cfg.fusion_dropout)(out, deterministic=deterministic)
        return {
            "fused_features": out,
            "attention_weights": attention_weights,
            "adaptive_weights": adaptive_weights,
        }


class HierarchicalFusion(nn.Module):
    """Meta-fusion over early+MulT+graph+contrastive+adaptive
    (reference: fusion_layers.py:455-520)."""

    config: object
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text, audio, video, compute_contrastive_loss: bool = False,
                 deterministic: bool = True):
        cfg = self.config
        E = cfg.fusion_hidden_size
        early = EarlyFusion(cfg, dtype=self.dtype, name="early_fusion")(
            text, audio, video, deterministic=deterministic
        )
        mult = MultimodalTransformer(cfg, dtype=self.dtype, name="mult_fusion")(
            text, audio, video, deterministic=deterministic
        )
        graph = GraphFusion(cfg, dtype=self.dtype, name="graph_fusion")(
            text, audio, video, deterministic=deterministic
        )
        contrastive = ContrastiveFusion(cfg, dtype=self.dtype, name="contrastive_fusion")(
            text, audio, video, compute_contrastive_loss, deterministic=deterministic
        )
        adaptive = AdaptiveFusion(cfg, dtype=self.dtype, name="adaptive_fusion")(
            text, audio, video, deterministic=deterministic
        )

        all_features = jnp.concatenate(
            [
                early,
                mult["fused_features"],
                graph,
                contrastive["fused_features"],
                adaptive["fused_features"],
            ],
            axis=-1,
        )
        h = nn.Dense(E * 2, dtype=self.dtype, name="meta_fusion_0")(all_features)
        h = nn.relu(h)
        h = nn.Dropout(cfg.fusion_dropout)(h, deterministic=deterministic)
        final = nn.Dense(E, dtype=self.dtype, name="meta_fusion_3")(h)
        return {
            "fused_features": final,
            "early_features": early,
            "mult_features": mult["fused_features"],
            "graph_features": graph,
            "contrastive_features": contrastive["fused_features"],
            "adaptive_features": adaptive["fused_features"],
            "contrastive_losses": contrastive["contrastive_losses"],
            "attention_weights": adaptive["attention_weights"],
            "adaptive_weights": adaptive["adaptive_weights"],
        }
