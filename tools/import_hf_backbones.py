#!/usr/bin/env python
"""Import pretrained HF backbones (safetensors, NO torch) into a model
checkpoint.

The reference builds its encoders with ``from_pretrained`` (reference
models/encoders.py:20,116,179). Offline TPU equivalent: download
``model.safetensors`` for the three backbone repos elsewhere, point this
tool at them, and it writes an Orbax params checkpoint with the pretrained
weights spliced into a freshly-initialized model — loadable by
train_advanced.py --resume-ish flows, evaluate_model.py and demo/serve.py.

    python tools/import_hf_backbones.py \
        --text  /ckpts/deberta-v3-base \
        --audio /ckpts/wav2vec2-base-960h \
        --video /ckpts/vit-base-patch16-224 \
        --output checkpoints/pretrained_base

Any subset of --text/--audio/--video may be given; the rest stay at their
fresh init. torch is never imported.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(
        description="Splice HF safetensors backbones into a model checkpoint")
    ap.add_argument("--text", help="DeBERTa-v2/v3 safetensors file or dir")
    ap.add_argument("--audio", help="Wav2Vec2 safetensors file or dir")
    ap.add_argument("--video", help="ViT safetensors file or dir")
    ap.add_argument("--output", required=True,
                    help="Output Orbax checkpoint directory")
    ap.add_argument("--fusion_type", default="hierarchical",
                    choices=["early", "late", "mult", "graph",
                             "contrastive", "adaptive", "hierarchical"])
    ap.add_argument("--preset", default="base",
                    choices=["tiny", "half", "base"])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    if not (args.text or args.audio or args.video):
        ap.error("give at least one of --text/--audio/--video")

    import jax
    import numpy as np

    from simple_multimodal_tpu.config import ModelConfig
    from simple_multimodal_tpu.data.video_wire import packed_height
    from simple_multimodal_tpu.models import MultimodalEmotionModel
    from simple_multimodal_tpu.models.multimodal_model import resolve_dtype
    from simple_multimodal_tpu.models.safetensors_io import (
        load_pretrained_backbones,
    )
    from simple_multimodal_tpu.train.checkpoint import save_params

    cfg = ModelConfig(encoder_preset=args.preset)
    cfg.fusion_type = args.fusion_type
    model = MultimodalEmotionModel(cfg, dtype=resolve_dtype(cfg))
    h, w = cfg.video_frame_size
    text = {"input_ids": np.zeros((1, cfg.text_max_length), np.int32),
            "attention_mask": np.ones((1, cfg.text_max_length), np.int32)}
    audio = np.zeros((1, cfg.audio_max_length), np.float32)
    video = np.zeros((1, cfg.video_max_frames, packed_height(h), w), np.uint8)
    params = jax.jit(model.init)(jax.random.PRNGKey(args.seed),
                                 text, audio, video)
    params = jax.device_get(params)
    params = load_pretrained_backbones(params, text=args.text,
                                       audio=args.audio, video=args.video)
    save_params(args.output, params)
    done = [n for n, v in (("text", args.text), ("audio", args.audio),
                           ("video", args.video)) if v]
    print(f"Imported {'+'.join(done)} backbones -> {args.output}")


if __name__ == "__main__":
    main()
