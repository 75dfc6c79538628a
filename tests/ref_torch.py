"""Reference-structured torch mirror models, dims-parameterized.

Builds torch models with the reference's exact module structure and
state-dict naming (/root/reference/models/multimodal_model.py:12-183 +
models/fusion_layers.py:9-520 + models/encoders.py) at ANY scale:
``TINY`` matches tests/conftest.tiny_config; ``base_dims()`` matches the
framework's ``encoder_preset="base"`` + default ModelConfig fusion sizes
(DeBERTa-v3-base / wav2vec2-base / ViT-B16, F=512, G=256).

Used by the tiny full-model parity suite (test_full_model_parity.py) and
the base-dim conversion rehearsal through tools/convert_checkpoint.py
(test_full_model_base_conversion.py). torch_geometric is unavailable here,
so GraphFusion's GATConv is mirrored by ``GATConvT`` — a from-the-docs
torch implementation of PyG GATConv semantics (heads=4, concat=False,
default self-loops), independently validated against hand-computed
message-passing in test_models.py (test_gat_golden_numerics).
"""
import dataclasses

import torch
import transformers


@dataclasses.dataclass
class Dims:
    """Every size the reference model's constructor derives from config."""

    # text backbone (DebertaV2)
    text_hidden: int
    text_layers: int
    text_heads: int
    text_inter: int
    text_maxpos: int
    text_buckets: int
    text_vocab: int = 128100
    # audio backbone (Wav2Vec2)
    audio_hidden: int = 32
    audio_layers: int = 2
    audio_heads: int = 2
    audio_inter: int = 64
    conv_dim: int = 16
    conv_pos: int = 8
    conv_pos_groups: int = 2
    # video backbone (ViT per frame + LSTM)
    vit_image: int = 32
    vit_patch: int = 16
    vit_hidden: int = 32
    vit_layers: int = 2
    vit_heads: int = 2
    vit_inter: int = 64
    lstm_hidden: int = 16          # = vit_hidden // 2 (bidirectional)
    # encoder heads (temporal/facial attention — 8 at every scale,
    # reference encoders.py:152,199)
    enc_mha_heads: int = 8
    # fusion / heads
    F: int = 32                    # fusion_hidden_size
    G: int = 16                    # graph_hidden_size
    HEADS: int = 4                 # fusion_num_heads (cross-modal MHA)
    ADAPTER: int = 8               # adapter bottleneck
    PROMPT_LEN: int = 4            # prompt-tuning length
    N_EMO: int = 7


TINY = Dims(
    text_hidden=32, text_layers=2, text_heads=2, text_inter=64,
    text_maxpos=64, text_buckets=16,
)


def base_dims() -> Dims:
    """Real reference scale: matches resolve_backbone_configs('base') and
    default ModelConfig fusion sizes (config.py)."""
    return Dims(
        text_hidden=768, text_layers=12, text_heads=12, text_inter=3072,
        text_maxpos=512, text_buckets=256,
        audio_hidden=768, audio_layers=12, audio_heads=12, audio_inter=3072,
        conv_dim=512, conv_pos=128, conv_pos_groups=16,
        vit_image=224, vit_patch=16, vit_hidden=768, vit_layers=12,
        vit_heads=12, vit_inter=3072, lstm_hidden=384,
        F=512, G=256, HEADS=8, ADAPTER=64, PROMPT_LEN=10,
    )


# --------------------------------------------------------------- encoders

class AdapterLayerT(torch.nn.Module):
    """Reference AdapterLayer (encoders.py:254-277)."""

    def __init__(self, hidden, adapter):
        super().__init__()
        self.down_project = torch.nn.Linear(hidden, adapter)
        self.up_project = torch.nn.Linear(adapter, hidden)

    def forward(self, x):
        return x + self.up_project(torch.relu(self.down_project(x)))


class TextEncoderT(torch.nn.Module):
    def __init__(self, d: Dims):
        super().__init__()
        self.d = d
        self.model = transformers.DebertaV2Model(transformers.DebertaV2Config(
            vocab_size=d.text_vocab, hidden_size=d.text_hidden,
            num_hidden_layers=d.text_layers,
            num_attention_heads=d.text_heads,
            intermediate_size=d.text_inter,
            max_position_embeddings=d.text_maxpos, relative_attention=True,
            position_buckets=d.text_buckets, norm_rel_ebd="layer_norm",
            share_att_key=True, pos_att_type=["p2c", "c2p"],
            layer_norm_eps=1e-7, position_biased_input=False,
        ))
        self.adapter = AdapterLayerT(d.text_hidden, d.ADAPTER)
        self.prompt_embeddings = torch.nn.Parameter(
            torch.randn(d.PROMPT_LEN, d.text_hidden))
        self.projection = torch.nn.Linear(d.text_hidden, d.F)

    def forward(self, input_ids, attention_mask, use_adapter=False,
                use_prompt=False):
        if use_prompt:  # reference: encoders.py:49-71
            B = input_ids.shape[0]
            embeds = self.model.embeddings.word_embeddings(input_ids)
            embeds = torch.cat(
                [self.prompt_embeddings.unsqueeze(0).expand(B, -1, -1),
                 embeds], dim=1)
            attention_mask = torch.cat(
                [torch.ones(B, self.d.PROMPT_LEN, dtype=attention_mask.dtype),
                 attention_mask], dim=1)
            seq = self.model(inputs_embeds=embeds,
                             attention_mask=attention_mask).last_hidden_state
        else:
            seq = self.model(input_ids=input_ids,
                             attention_mask=attention_mask).last_hidden_state
        if use_adapter:
            seq = self.adapter(seq)
        pooled = seq[:, 0]  # 'bert' in 'deberta-v2' → CLS (encoders.py:87-88)
        return self.projection(pooled)


class AudioEncoderT(torch.nn.Module):
    def __init__(self, d: Dims):
        super().__init__()
        self.model = transformers.Wav2Vec2Model(transformers.Wav2Vec2Config(
            hidden_size=d.audio_hidden, num_hidden_layers=d.audio_layers,
            num_attention_heads=d.audio_heads,
            intermediate_size=d.audio_inter, conv_dim=(d.conv_dim,) * 7,
            conv_kernel=(10, 3, 3, 3, 3, 2, 2),
            conv_stride=(5, 2, 2, 2, 2, 2, 2), num_feat_extract_layers=7,
            num_conv_pos_embeddings=d.conv_pos,
            num_conv_pos_embedding_groups=d.conv_pos_groups,
            do_stable_layer_norm=False, feat_extract_norm="group",
            apply_spec_augment=False,
        ))
        self.adapter = AdapterLayerT(d.audio_hidden, d.ADAPTER)
        self.temporal_attention = torch.nn.MultiheadAttention(
            d.audio_hidden, d.enc_mha_heads, dropout=0.0, batch_first=True)
        self.projection = torch.nn.Linear(d.audio_hidden, d.F)

    def forward(self, waveform, use_adapter=False):
        seq = self.model(waveform).last_hidden_state
        if use_adapter:
            seq = self.adapter(seq)
        att, _ = self.temporal_attention(seq, seq, seq)
        return self.projection(att.mean(1))


class VideoEncoderT(torch.nn.Module):
    def __init__(self, d: Dims):
        super().__init__()
        self.vit = transformers.ViTModel(transformers.ViTConfig(
            image_size=d.vit_image, patch_size=d.vit_patch,
            hidden_size=d.vit_hidden, num_hidden_layers=d.vit_layers,
            num_attention_heads=d.vit_heads,
            intermediate_size=d.vit_inter,
        ), add_pooling_layer=False)
        self.adapter = AdapterLayerT(d.vit_hidden, d.ADAPTER)
        self.temporal_lstm = torch.nn.LSTM(d.vit_hidden, d.lstm_hidden,
                                           num_layers=2, batch_first=True,
                                           bidirectional=True, dropout=0.0)
        self.facial_attention = torch.nn.MultiheadAttention(
            d.vit_hidden, d.enc_mha_heads, dropout=0.0, batch_first=True)
        self.projection = torch.nn.Linear(d.vit_hidden, d.F)

    def forward(self, frames, use_adapter=False):  # [B, T, 3, H, W]
        B, T = frames.shape[:2]
        flat = frames.reshape(B * T, *frames.shape[2:])
        cls = self.vit(flat).last_hidden_state[:, 0].reshape(B, T, -1)
        if use_adapter:
            cls = self.adapter(cls)
        lstm_out, _ = self.temporal_lstm(cls)
        att, _ = self.facial_attention(lstm_out, lstm_out, lstm_out)
        return self.projection(att.mean(1))


# ------------------------------------------------------- fusion (torch)
# Structure and state-dict names mirror /root/reference/models/
# fusion_layers.py exactly; dropout=0 so eval-mode logits are deterministic.

class EarlyFusionT(torch.nn.Module):
    def __init__(self, d: Dims):
        super().__init__()
        F = d.F
        self.fusion_layers = torch.nn.Sequential(
            torch.nn.Linear(F * 3, F * 2), torch.nn.ReLU(),
            torch.nn.Dropout(0.0), torch.nn.Linear(F * 2, F),
            torch.nn.ReLU(), torch.nn.Dropout(0.0))

    def forward(self, t, a, v):
        return self.fusion_layers(torch.cat([t, a, v], -1))


class LateFusionT(torch.nn.Module):
    def __init__(self, d: Dims):
        super().__init__()
        self.text_classifier = torch.nn.Linear(d.F, d.N_EMO)
        self.audio_classifier = torch.nn.Linear(d.F, d.N_EMO)
        self.video_classifier = torch.nn.Linear(d.F, d.N_EMO)
        self.fusion_weights = torch.nn.Parameter(torch.ones(3) / 3)

    def forward(self, t, a, v):
        tl = self.text_classifier(t)
        al = self.audio_classifier(a)
        vl = self.video_classifier(v)
        w = torch.softmax(self.fusion_weights, dim=0)
        return {"fused_logits": w[0] * tl + w[1] * al + w[2] * vl,
                "text_logits": tl, "audio_logits": al, "video_logits": vl,
                "fusion_weights": w}


class CrossModalTransformerT(torch.nn.Module):
    def __init__(self, d: Dims):
        super().__init__()
        F = d.F
        self.attention = torch.nn.MultiheadAttention(F, d.HEADS, dropout=0.0,
                                                     batch_first=True)
        self.norm1 = torch.nn.LayerNorm(F)
        self.norm2 = torch.nn.LayerNorm(F)
        self.ffn = torch.nn.Sequential(
            torch.nn.Linear(F, F * 4), torch.nn.ReLU(),
            torch.nn.Dropout(0.0), torch.nn.Linear(F * 4, F))

    def forward(self, q, kv):
        attn, _ = self.attention(q, kv, kv)
        x = self.norm1(q + attn)
        return self.norm2(x + self.ffn(x))


class MultimodalTransformerT(torch.nn.Module):
    def __init__(self, d: Dims):
        super().__init__()
        F = d.F
        for name in ("text_to_audio", "text_to_video", "audio_to_text",
                     "audio_to_video", "video_to_text", "video_to_audio"):
            setattr(self, name, CrossModalTransformerT(d))
        for name in ("text_self_attn", "audio_self_attn", "video_self_attn"):
            setattr(self, name, torch.nn.MultiheadAttention(
                F, d.HEADS, dropout=0.0, batch_first=True))
        self.final_fusion = torch.nn.Sequential(
            torch.nn.Linear(F * 3, F), torch.nn.ReLU(), torch.nn.Dropout(0.0))

    def forward(self, t, a, v):
        if t.dim() == 2:
            t, a, v = t.unsqueeze(1), a.unsqueeze(1), v.unsqueeze(1)
        et = t + self.text_to_audio(t, a) + self.text_to_video(t, v)
        ea = a + self.audio_to_text(a, t) + self.audio_to_video(a, v)
        ev = v + self.video_to_text(v, t) + self.video_to_audio(v, a)
        tt, _ = self.text_self_attn(et, et, et)
        aa, _ = self.audio_self_attn(ea, ea, ea)
        vv, _ = self.video_self_attn(ev, ev, ev)
        tp, ap, vp = tt.mean(1), aa.mean(1), vv.mean(1)
        return {"fused_features": self.final_fusion(
                    torch.cat([tp, ap, vp], -1)),
                "text_features": tp, "audio_features": ap,
                "video_features": vp}


class GATConvT(torch.nn.Module):
    """PyG ``GATConv(heads=4, concat=False)`` numerics in plain torch for a
    dense (fully-connected + default self-loop) graph: per-head scores
    ``LeakyReLU(att_src·Wx_j + att_dst·Wx_i)`` softmaxed over sources j per
    target i; heads averaged; bias added after averaging."""

    def __init__(self, in_dim, out_dim, heads=4):
        super().__init__()
        self.heads, self.out_dim = heads, out_dim
        self.lin = torch.nn.Linear(in_dim, heads * out_dim, bias=False)
        self.att_src = torch.nn.Parameter(torch.randn(1, heads, out_dim) * 0.3)
        self.att_dst = torch.nn.Parameter(torch.randn(1, heads, out_dim) * 0.3)
        self.bias = torch.nn.Parameter(torch.zeros(out_dim))

    def forward(self, x):  # [B, N, in] → [B, N, out]
        B, N, _ = x.shape
        xp = self.lin(x).view(B, N, self.heads, self.out_dim)
        s = (xp * self.att_src).sum(-1)  # [B, N, H] source term
        d = (xp * self.att_dst).sum(-1)  # [B, N, H] target term
        e = torch.nn.functional.leaky_relu(
            d.unsqueeze(2) + s.unsqueeze(1), 0.2)  # [B, i, j, H]
        alpha = torch.softmax(e, dim=2)
        out = torch.einsum("bijh,bjhc->bihc", alpha, xp).mean(2)
        return out + self.bias


class GraphFusionT(torch.nn.Module):
    """Reference GraphFusion, dense. Layer sizing follows the framework's
    documented fix of the reference's latent shape bug (fusion_layers.py:
    223-232 declares every layer in=F): layer 0 maps F→G, deeper G→G."""

    def __init__(self, d: Dims, num_layers=3):
        super().__init__()
        self.gcn_layers = torch.nn.ModuleList(
            [GATConvT(d.F if i == 0 else d.G, d.G)
             for i in range(num_layers)])
        self.node_type_embedding = torch.nn.Embedding(3, d.F)
        self.output_projection = torch.nn.Linear(d.G, d.F)

    def forward(self, t, a, v):
        x = torch.stack([t, a, v], dim=1)  # [B, 3, F]
        x = x + self.node_type_embedding(torch.arange(3))[None]
        for layer in self.gcn_layers:
            x = torch.relu(layer(x))
        return self.output_projection(x.mean(1))


class ContrastiveFusionT(torch.nn.Module):
    def __init__(self, d: Dims):
        super().__init__()
        F = d.F
        for m in ("text", "audio", "video"):
            setattr(self, f"{m}_projector", torch.nn.Sequential(
                torch.nn.Linear(F, F), torch.nn.ReLU(),
                torch.nn.Linear(F, F // 2)))
        self.fusion_layer = torch.nn.Sequential(
            torch.nn.Linear(F * 3, F), torch.nn.ReLU(), torch.nn.Dropout(0.0))

    def forward(self, t, a, v, compute_contrastive_loss=False):
        norm = torch.nn.functional.normalize
        return {
            "fused_features": self.fusion_layer(torch.cat([t, a, v], -1)),
            "text_proj": norm(self.text_projector(t), dim=-1),
            "audio_proj": norm(self.audio_projector(a), dim=-1),
            "video_proj": norm(self.video_projector(v), dim=-1),
            "contrastive_losses": {},
        }


class AdaptiveFusionT(torch.nn.Module):
    def __init__(self, d: Dims):
        super().__init__()
        F = d.F
        self.attention = torch.nn.MultiheadAttention(F, d.HEADS, dropout=0.0,
                                                     batch_first=True)
        self.text_transform = torch.nn.Linear(F, F)
        self.audio_transform = torch.nn.Linear(F, F)
        self.video_transform = torch.nn.Linear(F, F)
        self.weight_predictor = torch.nn.Sequential(
            torch.nn.Linear(F * 3, F), torch.nn.ReLU(),
            torch.nn.Linear(F, 3), torch.nn.Softmax(dim=-1))
        self.fusion_layer = torch.nn.Sequential(
            torch.nn.Linear(F, F), torch.nn.ReLU(), torch.nn.Dropout(0.0))

    def forward(self, t, a, v):
        stacked = torch.stack([self.text_transform(t),
                               self.audio_transform(a),
                               self.video_transform(v)], dim=1)
        attended, attn_w = self.attention(stacked, stacked, stacked)
        weights = self.weight_predictor(torch.cat([t, a, v], -1))
        fused = (attended * weights.unsqueeze(-1)).sum(1)
        return {"fused_features": self.fusion_layer(fused),
                "attention_weights": attn_w, "adaptive_weights": weights}


class HierarchicalFusionT(torch.nn.Module):
    def __init__(self, d: Dims):
        super().__init__()
        F = d.F
        self.early_fusion = EarlyFusionT(d)
        self.mult_fusion = MultimodalTransformerT(d)
        self.graph_fusion = GraphFusionT(d)
        self.contrastive_fusion = ContrastiveFusionT(d)
        self.adaptive_fusion = AdaptiveFusionT(d)
        self.meta_fusion = torch.nn.Sequential(
            torch.nn.Linear(F * 5, F * 2), torch.nn.ReLU(),
            torch.nn.Dropout(0.0), torch.nn.Linear(F * 2, F))

    def forward(self, t, a, v, compute_contrastive_loss=False):
        early = self.early_fusion(t, a, v)
        mult = self.mult_fusion(t, a, v)["fused_features"]
        graph = self.graph_fusion(t, a, v)
        contrastive = self.contrastive_fusion(t, a, v)["fused_features"]
        adaptive = self.adaptive_fusion(t, a, v)["fused_features"]
        return {"fused_features": self.meta_fusion(torch.cat(
            [early, mult, graph, contrastive, adaptive], -1))}


FUSIONS_T = {
    "early": EarlyFusionT,
    "late": LateFusionT,
    "mult": MultimodalTransformerT,
    "graph": GraphFusionT,
    "contrastive": ContrastiveFusionT,
    "adaptive": AdaptiveFusionT,
    "hierarchical": HierarchicalFusionT,
}


class ClassifierT(torch.nn.Module):
    def __init__(self, d: Dims):
        super().__init__()
        F = d.F
        self.classifier = torch.nn.Sequential(
            torch.nn.Linear(F, F // 2), torch.nn.ReLU(),
            torch.nn.Dropout(0.0), torch.nn.Linear(F // 2, d.N_EMO))
        self.sentiment_classifier = torch.nn.Linear(F, 3)
        self.positive_classifier = torch.nn.Linear(F, 2)
        self.negative_classifier = torch.nn.Linear(F, 4)

    def forward(self, x):
        return self.classifier(x)


class RefModelT(torch.nn.Module):
    """Reference-structured MultimodalEmotionModel, any fusion type
    (mirrors /root/reference/models/multimodal_model.py:12-183)."""

    def __init__(self, fusion_type, d: Dims = TINY):
        super().__init__()
        self.fusion_type = fusion_type
        self.text_encoder = TextEncoderT(d)
        self.audio_encoder = AudioEncoderT(d)
        self.video_encoder = VideoEncoderT(d)
        self.fusion_layer = FUSIONS_T[fusion_type](d)
        self.classifier = ClassifierT(d)
        self.valence_regressor = torch.nn.Linear(d.F, 1)
        self.arousal_regressor = torch.nn.Linear(d.F, 1)
        self.uncertainty_head = torch.nn.Linear(d.F, 7)

    def forward(self, input_ids, attention_mask, audio, video,
                use_adapter=False, use_prompt=False):
        t = self.text_encoder(input_ids, attention_mask,
                              use_adapter=use_adapter, use_prompt=use_prompt)
        a = self.audio_encoder(audio, use_adapter=use_adapter)
        v = self.video_encoder(video, use_adapter=use_adapter)
        out = {"text_features": t, "audio_features": a, "video_features": v}
        if self.fusion_type == "late":
            fo = self.fusion_layer(t, a, v)
            out["emotion_logits"] = fo["fused_logits"]
            out["individual_logits"] = {
                "text": fo["text_logits"], "audio": fo["audio_logits"],
                "video": fo["video_logits"]}
            out["fusion_weights"] = fo["fusion_weights"]
            aux_in = (t + a + v) / 3  # reference: multimodal_model.py:153
        else:
            fo = self.fusion_layer(t, a, v)
            fused = fo["fused_features"] if isinstance(fo, dict) else fo
            out["emotion_logits"] = self.classifier(fused)
            aux_in = fused
        out["valence"] = self.valence_regressor(aux_in)
        out["arousal"] = self.arousal_regressor(aux_in)
        out["uncertainty"] = self.uncertainty_head(aux_in)
        # the reference merges all fusion-dict keys into the output,
        # OVERWRITING encoder text/audio/video_features for e.g. MulT
        # (multimodal_model.py:179-182)
        if isinstance(fo, dict):
            for k, v_ in fo.items():
                if k != "fused_features":
                    out[k] = v_
        return out


# ------------------------------------------------------------- wrappers

class RobustModelT(torch.nn.Module):
    """Reference RobustMultimodalModel (multimodal_model.py:365-450)."""

    def __init__(self, fusion_type="early", d: Dims = TINY):
        super().__init__()
        F = d.F
        self.base_model = RefModelT(fusion_type, d)
        self.text_only_classifier = torch.nn.Linear(F, d.N_EMO)
        self.audio_only_classifier = torch.nn.Linear(F, d.N_EMO)
        self.video_only_classifier = torch.nn.Linear(F, d.N_EMO)
        self.modality_predictor = torch.nn.Sequential(
            torch.nn.Linear(F * 3, F), torch.nn.ReLU(),
            torch.nn.Linear(F, 3), torch.nn.Sigmoid())

    def forward(self, *args):
        out = self.base_model(*args)
        t, a, v = (out["text_features"], out["audio_features"],
                   out["video_features"])
        avail = self.modality_predictor(torch.cat([t, a, v], -1))
        tp = self.text_only_classifier(t)
        ap = self.audio_only_classifier(a)
        vp = self.video_only_classifier(v)
        w = avail / (avail.sum(1, keepdim=True) + 1e-8)
        out["robust_prediction"] = (w[:, 0:1] * tp + w[:, 1:2] * ap
                                    + w[:, 2:3] * vp)
        out["modality_availability"] = avail
        return out


class KDModelT(torch.nn.Module):
    """Reference KnowledgeDistillationModel (multimodal_model.py:222-262)."""

    def __init__(self, d: Dims = TINY):
        super().__init__()
        self.teacher = RefModelT("early", d)
        self.student = RefModelT("early", d)
        self.temperature = 4.0

    def forward(self, *args):
        student_out = self.student(*args)
        with torch.no_grad():
            teacher_out = self.teacher(*args)
        sl, tl = student_out["emotion_logits"], teacher_out["emotion_logits"]
        soft_t = torch.softmax(tl / self.temperature, -1)
        soft_s = torch.log_softmax(sl / self.temperature, -1)
        student_out["distillation_loss"] = torch.nn.functional.kl_div(
            soft_s, soft_t, reduction="batchmean") * self.temperature ** 2
        student_out["teacher_logits"] = tl
        return student_out


class FewShotModelT(torch.nn.Module):
    """Reference FewShotModel (multimodal_model.py:265-362). The support/
    query LSTMs it constructs are never called (reference quirk #4), so they
    are omitted here — they cannot affect any output."""

    def __init__(self, d: Dims = TINY):
        super().__init__()
        F = d.F
        self.base_model = RefModelT("early", d)
        self.prototype_network = torch.nn.Sequential(
            torch.nn.Linear(F, F), torch.nn.ReLU(), torch.nn.Linear(F, F))

    def _features(self, ids, mask, audio, video):
        # reference: use_adapter=True, use_prompt=True
        # (multimodal_model.py:325-334)
        out = self.base_model(ids, mask, audio, video,
                              use_adapter=True, use_prompt=True)
        return (out["text_features"] + out["audio_features"]
                + out["video_features"])

    def forward(self, support, query, n_way, n_shot):
        sf = self._features(*support)
        qf = self._features(*query)
        protos = self.prototype_network(sf.view(n_way, n_shot, -1).mean(1))
        d = torch.cdist(qf, protos, p=2)
        return {"predictions": torch.softmax(-d, -1), "distances": d}
