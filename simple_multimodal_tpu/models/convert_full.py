"""Full-model converter: reference torch checkpoints → this framework.

Maps a complete ``MultimodalEmotionModel`` state dict from the reference
implementation (/root/reference/models/multimodal_model.py:12-183 — encoders
with adapters/prompt/projection, any of the 7 fusion layers, classifier and
auxiliary heads) onto this framework's parameter pytree, so users migrating
from the PyTorch reference can load their trained checkpoints directly and
get logits matching to ≤1e-3.

Usage:
    params = {"params": convert_multimodal_model(torch_state_dict, config)}
    model = MultimodalEmotionModel(config)
    out = model.apply(params, ...)

CLI: tools/convert_checkpoint.py wraps this with torch.load + orbax save.
"""
from typing import Dict

import numpy as np

from .convert import _dense, _ln, _lstm, _mha, convert_deberta, convert_vit, convert_wav2vec2
from .deberta import DebertaConfig
from .vit import ViTConfig
from .wav2vec2 import Wav2Vec2Config


def _sub(sd: Dict, prefix: str) -> Dict:
    plen = len(prefix)
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _adapter(sd, prefix) -> Dict:
    return {
        "down_project": _dense(sd, f"{prefix}.down_project"),
        "up_project": _dense(sd, f"{prefix}.up_project"),
    }


def _gat_layer(sd, prefix) -> Dict:
    lin_key = (f"{prefix}.lin.weight" if f"{prefix}.lin.weight" in sd
               else f"{prefix}.lin_src.weight")
    out = {
        "lin": {"kernel": _np(sd[lin_key]).T},
        "att_src": _np(sd[f"{prefix}.att_src"])[0][None],  # [1, H, C]
        "att_dst": _np(sd[f"{prefix}.att_dst"])[0][None],
        "bias": _np(sd[f"{prefix}.bias"]),
    }
    return out


def _cross_modal_block(sd, prefix) -> Dict:
    return {
        "attention": _mha(sd, f"{prefix}.attention"),
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "norm2": _ln(sd, f"{prefix}.norm2"),
        "ffn_0": _dense(sd, f"{prefix}.ffn.0"),
        "ffn_3": _dense(sd, f"{prefix}.ffn.3"),
    }


def convert_fusion(sd: Dict, fusion_type: str, config) -> Dict:
    """fusion_layer.* of the reference → our fusion param subtree."""
    if fusion_type == "early":
        return {
            "0": _dense(sd, "fusion_layers.0"),
            "3": _dense(sd, "fusion_layers.3"),
        }
    if fusion_type == "late":
        return {
            "text_classifier": _dense(sd, "text_classifier"),
            "audio_classifier": _dense(sd, "audio_classifier"),
            "video_classifier": _dense(sd, "video_classifier"),
            "fusion_weights": _np(sd["fusion_weights"]),
        }
    if fusion_type == "mult":
        out = {}
        for name in ("text_to_audio", "text_to_video", "audio_to_text",
                     "audio_to_video", "video_to_text", "video_to_audio"):
            out[name] = _cross_modal_block(sd, name)
        for name in ("text_self_attn", "audio_self_attn", "video_self_attn"):
            out[name] = _mha(sd, name)
        out["final_fusion_0"] = _dense(sd, "final_fusion.0")
        return out
    if fusion_type == "graph":
        out = {
            "node_type_embedding": {
                "embedding": _np(sd["node_type_embedding.weight"])
            },
            "output_projection": _dense(sd, "output_projection"),
        }
        for i in range(config.graph_num_layers):
            out[f"gcn_layers_{i}"] = _gat_layer(sd, f"gcn_layers.{i}")
        return out
    if fusion_type == "contrastive":
        out = {}
        for m in ("text", "audio", "video"):
            out[f"{m}_projector_0"] = _dense(sd, f"{m}_projector.0")
            out[f"{m}_projector_2"] = _dense(sd, f"{m}_projector.2")
        out["fusion_layer_0"] = _dense(sd, "fusion_layer.0")
        return out
    if fusion_type == "adaptive":
        return {
            "attention": _mha(sd, "attention"),
            "text_transform": _dense(sd, "text_transform"),
            "audio_transform": _dense(sd, "audio_transform"),
            "video_transform": _dense(sd, "video_transform"),
            "weight_predictor_0": _dense(sd, "weight_predictor.0"),
            "weight_predictor_2": _dense(sd, "weight_predictor.2"),
            "fusion_layer_0": _dense(sd, "fusion_layer.0"),
        }
    if fusion_type == "hierarchical":
        return {
            "early_fusion": convert_fusion(
                _sub(sd, "early_fusion."), "early", config),
            "mult_fusion": convert_fusion(
                _sub(sd, "mult_fusion."), "mult", config),
            "graph_fusion": convert_fusion(
                _sub(sd, "graph_fusion."), "graph", config),
            "contrastive_fusion": convert_fusion(
                _sub(sd, "contrastive_fusion."), "contrastive", config),
            "adaptive_fusion": convert_fusion(
                _sub(sd, "adaptive_fusion."), "adaptive", config),
            "meta_fusion_0": _dense(sd, "meta_fusion.0"),
            "meta_fusion_3": _dense(sd, "meta_fusion.3"),
        }
    raise ValueError(f"Unknown fusion type: {fusion_type}")


def convert_text_encoder(sd: Dict, text_cfg: DebertaConfig) -> Dict:
    out = {
        "model": convert_deberta(_sub(sd, "model."), text_cfg.num_layers),
        "projection": _dense(sd, "projection"),
    }
    if "adapter.down_project.weight" in sd:
        out["adapter"] = _adapter(sd, "adapter")
    if "prompt_embeddings" in sd:
        out["prompt_embeddings"] = _np(sd["prompt_embeddings"])
    return out


def convert_audio_encoder(sd: Dict, audio_cfg: Wav2Vec2Config) -> Dict:
    out = {
        "model": convert_wav2vec2(
            _sub(sd, "model."), len(audio_cfg.conv_dims), audio_cfg.num_layers),
        "temporal_attention": _mha(sd, "temporal_attention"),
        "projection": _dense(sd, "projection"),
    }
    if "adapter.down_project.weight" in sd:
        out["adapter"] = _adapter(sd, "adapter")
    return out


def convert_video_encoder(sd: Dict, vit_cfg: ViTConfig) -> Dict:
    out = {
        "vit": convert_vit(_sub(sd, "vit."), vit_cfg.num_layers),
        "temporal_lstm": _lstm(sd, "temporal_lstm", num_layers=2,
                               bidirectional=True),
        "facial_attention": _mha(sd, "facial_attention"),
        "projection": _dense(sd, "projection"),
    }
    if "adapter.down_project.weight" in sd:
        out["adapter"] = _adapter(sd, "adapter")
    return out


def convert_classifier(sd: Dict) -> Dict:
    return {
        "classifier_0": _dense(sd, "classifier.0"),
        "classifier_3": _dense(sd, "classifier.3"),
        "sentiment_classifier": _dense(sd, "sentiment_classifier"),
        "positive_classifier": _dense(sd, "positive_classifier"),
        "negative_classifier": _dense(sd, "negative_classifier"),
    }


def convert_multimodal_model(sd: Dict, config) -> Dict:
    """Reference MultimodalEmotionModel state_dict → our params subtree."""
    from .encoders import resolve_backbone_configs

    text_cfg, audio_cfg, vit_cfg = resolve_backbone_configs(config)
    fusion_type = getattr(config, "fusion_type", "hierarchical")
    out = {
        "text_encoder": convert_text_encoder(_sub(sd, "text_encoder."), text_cfg),
        "audio_encoder": convert_audio_encoder(
            _sub(sd, "audio_encoder."), audio_cfg),
        "video_encoder": convert_video_encoder(
            _sub(sd, "video_encoder."), vit_cfg),
        "fusion_layer": convert_fusion(
            _sub(sd, "fusion_layer."), fusion_type, config),
        "valence_regressor": _dense(sd, "valence_regressor"),
        "arousal_regressor": _dense(sd, "arousal_regressor"),
        "uncertainty_head": _dense(sd, "uncertainty_head"),
    }
    if fusion_type != "late":
        out["classifier"] = convert_classifier(_sub(sd, "classifier."))
    return out


def convert_robust_model(sd: Dict, config) -> Dict:
    """Reference RobustMultimodalModel state_dict → our params subtree
    (reference: multimodal_model.py:365-450: base model + per-modality backup
    classifiers + sigmoid availability predictor)."""
    return {
        "base_model": convert_multimodal_model(_sub(sd, "base_model."), config),
        "text_only_classifier": _dense(sd, "text_only_classifier"),
        "audio_only_classifier": _dense(sd, "audio_only_classifier"),
        "video_only_classifier": _dense(sd, "video_only_classifier"),
        "modality_predictor_0": _dense(sd, "modality_predictor.0"),
        "modality_predictor_2": _dense(sd, "modality_predictor.2"),
    }


def convert_distillation_model(sd: Dict, teacher_config, student_config) -> Dict:
    """Reference KnowledgeDistillationModel state_dict → our params subtree
    (reference: multimodal_model.py:222-262; attribute names teacher/student)."""
    return {
        "teacher": convert_multimodal_model(_sub(sd, "teacher."), teacher_config),
        "student": convert_multimodal_model(_sub(sd, "student."), student_config),
    }


def convert_fewshot_model(sd: Dict, config) -> Dict:
    """Reference FewShotModel state_dict → our params subtree.

    The reference's support/query LSTMs are constructed but never called
    (multimodal_model.py:275-288, its quirk #4), so their weights are
    intentionally dropped here — they cannot affect any output.
    """
    return {
        "base_model": convert_multimodal_model(_sub(sd, "base_model."), config),
        "prototype_network_0": _dense(sd, "prototype_network.0"),
        "prototype_network_2": _dense(sd, "prototype_network.2"),
    }
