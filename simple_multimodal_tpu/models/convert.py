"""PyTorch → Flax weight converters.

Maps HuggingFace torch state dicts for the three backbone architectures the
reference uses (DeBERTa-v2/v3, Wav2Vec2, ViT — /root/reference/config.py:12,17,23)
onto this framework's parameter pytrees, so pretrained weights (or weights
trained by the reference implementation) can be loaded and produce logits
matching to ≤1e-3 (verified in tests/test_encoder_parity.py against
transformers' torch models).

Conventions:
- torch ``nn.Linear.weight`` is [out, in]; flax ``Dense.kernel`` is [in, out]
  → transpose.
- torch Conv1d/Conv2d weights are [out, in, *k]; flax kernels are [*k, in, out].
- torch ``nn.MultiheadAttention`` packs QKV into ``in_proj_weight`` [3E, E]
  → split into three Dense kernels.
- torch LSTM has separate ``bias_ih``/``bias_hh`` → summed into one bias.
"""
from typing import Dict

import numpy as np


def _t(w) -> np.ndarray:
    return np.asarray(w).T


def _np(w) -> np.ndarray:
    return np.asarray(w)


def _dense(sd, prefix) -> Dict:
    out = {"kernel": _t(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _ln(sd, prefix) -> Dict:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _mha(sd, prefix) -> Dict:
    """torch nn.MultiheadAttention → ops.attention.MultiHeadAttention params."""
    in_w = _np(sd[f"{prefix}.in_proj_weight"])
    in_b = _np(sd[f"{prefix}.in_proj_bias"])
    E = in_w.shape[1]
    qw, kw, vw = in_w[:E], in_w[E:2 * E], in_w[2 * E:]
    qb, kb, vb = in_b[:E], in_b[E:2 * E], in_b[2 * E:]
    return {
        "q_proj": {"kernel": qw.T, "bias": qb},
        "k_proj": {"kernel": kw.T, "bias": kb},
        "v_proj": {"kernel": vw.T, "bias": vb},
        "out_proj": _dense(sd, f"{prefix}.out_proj"),
    }


def _stack_layers(layers) -> Dict:
    """Stack a list of per-layer param dicts into one [L, ...]-leaved dict
    (the models scan over layers with stacked params; see deberta.py)."""
    out = {}
    for key, value in layers[0].items():
        if isinstance(value, dict):
            out[key] = _stack_layers([layer[key] for layer in layers])
        else:
            out[key] = np.stack([layer[key] for layer in layers])
    return out


def _lstm(sd, prefix, num_layers: int, bidirectional: bool) -> Dict:
    out = {}
    dirs = ("", "_reverse") if bidirectional else ("",)
    for layer in range(num_layers):
        for suffix in dirs:
            t_sfx = f"l{layer}{suffix}"
            out[f"w_ih_l{layer}{suffix}"] = _t(sd[f"{prefix}.weight_ih_{t_sfx}"])
            out[f"w_hh_l{layer}{suffix}"] = _t(sd[f"{prefix}.weight_hh_{t_sfx}"])
            out[f"bias_l{layer}{suffix}"] = (
                _np(sd[f"{prefix}.bias_ih_{t_sfx}"])
                + _np(sd[f"{prefix}.bias_hh_{t_sfx}"])
            )
    return out


# --------------------------------------------------------------------- DeBERTa

def convert_deberta(sd: Dict, num_layers: int) -> Dict:
    """HF DebertaV2Model state_dict → DebertaModel params."""
    p = {
        "word_embeddings": {"embedding": _np(sd["embeddings.word_embeddings.weight"])},
        "emb_ln": _ln(sd, "embeddings.LayerNorm"),
        "rel_embeddings": _np(sd["encoder.rel_embeddings.weight"]),
        "rel_ln": _ln(sd, "encoder.LayerNorm"),
    }
    layers = []
    for i in range(num_layers):
        pre = f"encoder.layer.{i}"
        layers.append({
            "self": {
                "query_proj": _dense(sd, f"{pre}.attention.self.query_proj"),
                "key_proj": _dense(sd, f"{pre}.attention.self.key_proj"),
                "value_proj": _dense(sd, f"{pre}.attention.self.value_proj"),
            },
            "attn_out_dense": _dense(sd, f"{pre}.attention.output.dense"),
            "attn_out_ln": _ln(sd, f"{pre}.attention.output.LayerNorm"),
            "intermediate_dense": _dense(sd, f"{pre}.intermediate.dense"),
            "output_dense": _dense(sd, f"{pre}.output.dense"),
            "output_ln": _ln(sd, f"{pre}.output.LayerNorm"),
        })
    p["layers"] = _stack_layers(layers)
    return p


# -------------------------------------------------------------------- Wav2Vec2

def convert_wav2vec2(sd: Dict, num_conv: int, num_layers: int) -> Dict:
    """HF Wav2Vec2Model state_dict → Wav2Vec2Model params."""
    fe = {}
    for i in range(num_conv):
        w = _np(sd[f"feature_extractor.conv_layers.{i}.conv.weight"])
        fe[f"conv_{i}"] = {"kernel": w.transpose(2, 1, 0)}
    if "feature_extractor.conv_layers.0.layer_norm.weight" in sd:
        fe["group_norm"] = _ln(sd, "feature_extractor.conv_layers.0.layer_norm")

    # pos conv weight norm: plain or parametrized key layout
    if "encoder.pos_conv_embed.conv.weight_g" in sd:
        g = _np(sd["encoder.pos_conv_embed.conv.weight_g"])
        v = _np(sd["encoder.pos_conv_embed.conv.weight_v"])
    else:
        g = _np(sd["encoder.pos_conv_embed.conv.parametrizations.weight.original0"])
        v = _np(sd["encoder.pos_conv_embed.conv.parametrizations.weight.original1"])
    pos = {
        # torch: v [out, in/g, k], g [1, 1, k] → flax [k, in/g, out], [k, 1, 1]
        "weight_v": v.transpose(2, 1, 0),
        "weight_g": g.transpose(2, 1, 0),
        "bias": _np(sd["encoder.pos_conv_embed.conv.bias"]),
    }

    p = {
        "feature_encoder": fe,
        "fp_layer_norm": _ln(sd, "feature_projection.layer_norm"),
        "fp_projection": _dense(sd, "feature_projection.projection"),
        "pos_conv": pos,
        "encoder_layer_norm": _ln(sd, "encoder.layer_norm"),
    }
    if "masked_spec_embed" in sd:
        p["masked_spec_embed"] = _np(sd["masked_spec_embed"])
    layers = []
    for i in range(num_layers):
        pre = f"encoder.layers.{i}"
        layers.append({
            "q_proj": _dense(sd, f"{pre}.attention.q_proj"),
            "k_proj": _dense(sd, f"{pre}.attention.k_proj"),
            "v_proj": _dense(sd, f"{pre}.attention.v_proj"),
            "out_proj": _dense(sd, f"{pre}.attention.out_proj"),
            "layer_norm": _ln(sd, f"{pre}.layer_norm"),
            "intermediate_dense": _dense(sd, f"{pre}.feed_forward.intermediate_dense"),
            "output_dense": _dense(sd, f"{pre}.feed_forward.output_dense"),
            "final_layer_norm": _ln(sd, f"{pre}.final_layer_norm"),
        })
    p["layers"] = _stack_layers(layers)
    return p


# ------------------------------------------------------------------------- ViT

def convert_vit(sd: Dict, num_layers: int) -> Dict:
    """HF ViTModel state_dict → ViTModel params."""
    proj = _np(sd["embeddings.patch_embeddings.projection.weight"])
    p = {
        "cls_token": _np(sd["embeddings.cls_token"]),
        "position_embeddings": _np(sd["embeddings.position_embeddings"]),
        "patch_embed": {
            "kernel": proj.transpose(2, 3, 1, 0),
            "bias": _np(sd["embeddings.patch_embeddings.projection.bias"]),
        },
        "layernorm": _ln(sd, "layernorm"),
    }
    layers = []
    for i in range(num_layers):
        pre = f"encoder.layer.{i}"
        attn_pre = (
            f"{pre}.attention.attention"
            if f"{pre}.attention.attention.query.weight" in sd
            else f"{pre}.attention"
        )
        layers.append({
            "layernorm_before": _ln(sd, f"{pre}.layernorm_before"),
            "layernorm_after": _ln(sd, f"{pre}.layernorm_after"),
            "query": _dense(sd, f"{attn_pre}.query"),
            "key": _dense(sd, f"{attn_pre}.key"),
            "value": _dense(sd, f"{attn_pre}.value"),
            "attn_output": _dense(sd, f"{pre}.attention.output.dense"),
            "intermediate_dense": _dense(sd, f"{pre}.intermediate.dense"),
            "output_dense": _dense(sd, f"{pre}.output.dense"),
        })
    p["layers"] = _stack_layers(layers)
    return p


__all__ = [
    "convert_deberta", "convert_wav2vec2", "convert_vit",
    "_mha", "_lstm", "_dense", "_ln",
]
