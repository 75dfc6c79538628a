"""Full-model BASE-dim migration rehearsal through tools/convert_checkpoint.py.

Builds the ASSEMBLED reference-format checkpoint at real scale — the
hierarchical model over DeBERTa-v3-base / wav2vec2-base / ViT-B16 with
F=512 fusion (~8× every tiny dim) — saves it as the reference's ``.pth``
layout (``{'model_state_dict': ...}``, /root/reference/models/
multimodal_model.py:472-485 and training/advanced_trainer.py:396-411),
runs the user-facing conversion CLI, and asserts the ≤1e-3 logits-parity
migration target plus a working evaluator restore of the converted
checkpoint. Per-encoder base-dim parity lives in test_base_dim_parity.py;
this covers the assembly: fusion stack, aux heads, and the tool itself.

Slow (~10 min on one CPU core, ~6 GB peak): marked ``slow``.
"""
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

pytestmark = pytest.mark.slow

TOOL = Path(__file__).resolve().parent.parent / "tools" / "convert_checkpoint.py"


def test_full_model_base_conversion_via_tool(tmp_path):
    from ref_torch import RefModelT, base_dims

    from simple_multimodal_tpu.config import ModelConfig
    from simple_multimodal_tpu.eval.evaluator import ModelEvaluator

    d = base_dims()
    torch.manual_seed(0)
    ref = RefModelT("hierarchical", d).eval()

    # the reference trainer's checkpoint layout (advanced_trainer.py:396-411)
    pth = tmp_path / "reference_checkpoint.pth"
    torch.save({"model_state_dict": ref.state_dict(), "epoch": 3,
                "metrics": {"val_f1_macro": 0.5}}, pth)

    out_dir = tmp_path / "converted"
    proc = subprocess.run(
        [sys.executable, str(TOOL), "--torch_checkpoint", str(pth),
         "--output", str(out_dir), "--fusion_type", "hierarchical",
         "--preset", "base"],
        capture_output=True, text=True, cwd=str(tmp_path),
        env={"JAX_PLATFORMS": "cpu",
             "PYTHONPATH": str(TOOL.parent.parent),
             "PATH": "/usr/bin:/bin:/usr/local/bin",
             "HOME": str(tmp_path)},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]

    # reduced input EXTENTS keep one-core runtime tractable — conversion
    # layout depends on dims, not sequence lengths, and the full extents
    # (512 tokens / 160 000 samples / 224²×30) are covered per-encoder in
    # test_base_dim_parity.py; this test targets the assembly + the tool
    cfg = ModelConfig(encoder_preset="base", video_max_frames=4,
                      text_max_length=128, audio_max_length=32000,
                      data_path=str(tmp_path / "data"),
                      save_path=str(tmp_path / "ckpt"),
                      log_path=str(tmp_path / "logs"))
    cfg.fusion_type = "hierarchical"
    cfg.fusion_dropout = 0.0
    cfg.mixed_precision = False  # parity target is exact-dtype ≤1e-3

    # evaluator restore proves the converted artifact is what
    # evaluate_model.py / demo/serve.py load
    ev = ModelEvaluator(str(out_dir), config=cfg)

    rng = np.random.default_rng(0)
    B = 1
    ids = rng.integers(1, d.text_vocab, (B, cfg.text_max_length)).astype(
        np.int32)
    mask = np.ones((B, cfg.text_max_length), np.int32)
    mask[0, 100:] = 0  # realistic padding tail
    audio = (rng.standard_normal((B, cfg.audio_max_length)) * 0.1).astype(
        np.float32)
    video = rng.random((B, cfg.video_max_frames, 224, 224, 3)).astype(
        np.float32)

    with torch.no_grad():
        ref_out = ref(torch.tensor(ids.astype(np.int64)),
                      torch.tensor(mask.astype(np.int64)),
                      torch.tensor(audio),
                      torch.tensor(video.transpose(0, 1, 4, 2, 3)))

    out = jax.jit(lambda p, t, a, v: ev.model.apply(p, t, a, v))(
        ev.params, {"input_ids": ids, "attention_mask": mask}, audio, video)

    for key in ("text_features", "audio_features", "video_features",
                "emotion_logits", "valence", "arousal"):
        got = np.asarray(out[key])
        want = ref_out[key].numpy()
        err = np.abs(got - want).max()
        assert err <= 1e-3, f"base-dim full-model {key}: {err} > 1e-3"
