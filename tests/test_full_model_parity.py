"""End-to-end logits parity with the reference architecture — ALL fusion
types and wrappers, at tiny scale.

The torch mirror models (reference module structure + state-dict naming)
live in tests/ref_torch.py, dims-parameterized: this suite drives them at
TINY dims through convert_full and checks the fusion-head logits match to
≤1e-3 (the BASELINE.json migration target) for every fusion strategy
(early/late/mult/graph/contrastive/adaptive/hierarchical) and every
wrapper (robust, distillation, few-shot). The base-dim rehearsal through
tools/convert_checkpoint.py is test_full_model_base_conversion.py.
"""
import dataclasses

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from simple_multimodal_tpu.models import (  # noqa: E402
    FewShotModel,
    KnowledgeDistillationModel,
    MultimodalEmotionModel,
    RobustMultimodalModel,
)
from simple_multimodal_tpu.models.convert_full import (  # noqa: E402
    convert_distillation_model,
    convert_fewshot_model,
    convert_multimodal_model,
    convert_robust_model,
)

from ref_torch import (  # noqa: E402
    FUSIONS_T,
    FewShotModelT,
    KDModelT,
    RefModelT,
    RobustModelT,
    TINY,
)

N_EMO = TINY.N_EMO


# ------------------------------------------------------------------ inputs

def make_inputs(cfg, B=2, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, 120000, (B, cfg.text_max_length)).astype(np.int32)
    mask = np.ones((B, cfg.text_max_length), np.int32)
    mask[1, 10:] = 0
    audio = rng.standard_normal((B, cfg.audio_max_length)).astype(np.float32)
    video = rng.random((B, cfg.video_max_frames, 32, 32, 3)).astype(np.float32)
    return ids, mask, audio, video


def torch_inputs(ids, mask, audio, video):
    return (torch.tensor(ids.astype(np.int64)),
            torch.tensor(mask.astype(np.int64)),
            torch.tensor(audio),
            torch.tensor(video.transpose(0, 1, 4, 2, 3)))  # NCHW for torch


def tiny_cfg(tiny_config, fusion_type):
    cfg = dataclasses.replace(tiny_config)
    cfg.fusion_type = fusion_type
    cfg.fusion_dropout = 0.0
    return cfg


PARITY_KEYS = ("text_features", "audio_features", "video_features",
               "emotion_logits", "valence", "arousal")


@pytest.mark.parametrize("fusion_type", list(FUSIONS_T))
def test_full_model_logits_parity(tiny_config, fusion_type):
    torch.manual_seed(0)
    ref = RefModelT(fusion_type).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    cfg = tiny_cfg(tiny_config, fusion_type)
    model = MultimodalEmotionModel(cfg)
    params = {"params": convert_multimodal_model(sd, cfg)}

    ids, mask, audio, video = make_inputs(cfg)
    with torch.no_grad():
        ref_out = ref(*torch_inputs(ids, mask, audio, video))
    out = jax.jit(lambda p, t, a, v: model.apply(p, t, a, v))(
        params, {"input_ids": ids, "attention_mask": mask}, audio, video
    )

    for key in PARITY_KEYS:
        np.testing.assert_allclose(
            np.asarray(out[key]), ref_out[key].numpy(),
            atol=1e-3, rtol=1e-3, err_msg=f"{fusion_type}:{key}",
        )
    if fusion_type == "late":
        for m in ("text", "audio", "video"):
            np.testing.assert_allclose(
                np.asarray(out["individual_logits"][m]),
                ref_out["individual_logits"][m].numpy(),
                atol=1e-3, rtol=1e-3, err_msg=f"late:individual:{m}")
        np.testing.assert_allclose(
            np.asarray(out["fusion_weights"]),
            ref_out["fusion_weights"].numpy(), atol=1e-5)


def test_robust_model_parity(tiny_config):
    torch.manual_seed(1)
    ref = RobustModelT().eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    cfg = tiny_cfg(tiny_config, "early")
    model = RobustMultimodalModel(cfg)
    params = {"params": convert_robust_model(sd, cfg)}

    ids, mask, audio, video = make_inputs(cfg, seed=1)
    with torch.no_grad():
        ref_out = ref(*torch_inputs(ids, mask, audio, video))
    out = jax.jit(lambda p, t, a, v: model.apply(p, t, a, v))(
        params, {"input_ids": ids, "attention_mask": mask}, audio, video
    )
    for key in ("robust_prediction", "modality_availability",
                "emotion_logits"):
        np.testing.assert_allclose(
            np.asarray(out[key]), ref_out[key].numpy(),
            atol=1e-3, rtol=1e-3, err_msg=key)


def test_distillation_model_parity(tiny_config):
    torch.manual_seed(2)
    ref = KDModelT().eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    cfg = tiny_cfg(tiny_config, "early")
    model = KnowledgeDistillationModel(cfg, cfg)
    params = {"params": convert_distillation_model(sd, cfg, cfg)}

    ids, mask, audio, video = make_inputs(cfg, seed=2)
    with torch.no_grad():
        ref_out = ref(*torch_inputs(ids, mask, audio, video))
    out = jax.jit(lambda p, t, a, v: model.apply(p, t, a, v))(
        params, {"input_ids": ids, "attention_mask": mask}, audio, video
    )
    np.testing.assert_allclose(np.asarray(out["emotion_logits"]),
                               ref_out["emotion_logits"].numpy(),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out["teacher_logits"]),
                               ref_out["teacher_logits"].numpy(),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(float(out["distillation_loss"]),
                               float(ref_out["distillation_loss"]),
                               atol=2e-3)


def test_fewshot_model_parity(tiny_config):
    # Exercises adapters + prompt tuning: the reference's few-shot feature
    # extractor runs the base model with use_adapter=True, use_prompt=True.
    torch.manual_seed(3)
    ref = FewShotModelT().eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    cfg = tiny_cfg(tiny_config, "early")
    model = FewShotModel(cfg)
    params = {"params": convert_fewshot_model(sd, cfg)}

    n_way, n_shot = N_EMO, 1
    ids, mask, audio, video = make_inputs(cfg, B=n_way * n_shot, seed=3)
    qids, qmask, qaudio, qvideo = make_inputs(cfg, B=3, seed=4)

    with torch.no_grad():
        ref_out = ref(torch_inputs(ids, mask, audio, video),
                      torch_inputs(qids, qmask, qaudio, qvideo),
                      n_way, n_shot)

    support = {"text": {"input_ids": ids, "attention_mask": mask},
               "audio": audio, "video": video}
    query = {"text": {"input_ids": qids, "attention_mask": qmask},
             "audio": qaudio, "video": qvideo}
    out = jax.jit(
        lambda p, s, q: model.apply(p, s, q, n_way, n_shot),
        static_argnames=(),
    )(params, support, query)

    np.testing.assert_allclose(np.asarray(out["distances"]),
                               ref_out["distances"].numpy(),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out["predictions"]),
                               ref_out["predictions"].numpy(),
                               atol=1e-3, rtol=1e-3)
