#!/usr/bin/env python
"""Measure the PyTorch-CPU reference baseline for bench.py's vs_baseline.

The reference publishes no numbers (BASELINE.md), so the baseline is
*measured*: the same encoder architectures the reference loads
(DeBERTa-v3-base + Wav2Vec2-base + ViT-B/16, /root/reference/config.py:12,17,23)
are built from local transformers configs (random init — identical FLOPs to
pretrained weights) and timed on one full-size clip forward: 512 text tokens,
160 000 audio samples, 30 frames at 224². Fusion/heads are <1% of FLOPs and
are approximated by the early-fusion MLP. Host preprocessing (decode) is
measured by bench.py identically for both sides.

Result is cached to BASELINE_MEASURED.json so the round-end bench doesn't
re-pay the multi-minute torch-CPU forward.
"""
import json
import os
import sys
import time

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "BASELINE_MEASURED.json")


def measure(clips: int = 1) -> dict:
    import torch
    import transformers

    torch.set_num_threads(os.cpu_count() or 1)
    torch.manual_seed(0)

    deberta = transformers.DebertaV2Model(transformers.DebertaV2Config(
        vocab_size=128100, hidden_size=768, num_hidden_layers=12,
        num_attention_heads=12, intermediate_size=3072,
        max_position_embeddings=512, relative_attention=True,
        position_buckets=256, norm_rel_ebd="layer_norm", share_att_key=True,
        pos_att_type=["p2c", "c2p"], position_biased_input=False,
    )).eval()
    wav2vec2 = transformers.Wav2Vec2Model(
        transformers.Wav2Vec2Config()).eval()
    vit = transformers.ViTModel(transformers.ViTConfig(),
                                add_pooling_layer=False).eval()
    fusion = torch.nn.Sequential(
        torch.nn.Linear(512 * 3, 1024), torch.nn.ReLU(),
        torch.nn.Linear(1024, 512), torch.nn.ReLU(),
        torch.nn.Linear(512, 7),
    ).eval()
    proj_t = torch.nn.Linear(768, 512).eval()
    proj_a = torch.nn.Linear(768, 512).eval()
    proj_v = torch.nn.Linear(768, 512).eval()

    rng = np.random.default_rng(0)
    ids = torch.tensor(rng.integers(1, 128000, (1, 512)), dtype=torch.long)
    mask = torch.ones(1, 512, dtype=torch.long)
    wav = torch.tensor(rng.standard_normal((1, 160000)), dtype=torch.float32)
    frames = torch.tensor(rng.random((30, 3, 224, 224)), dtype=torch.float32)

    def one_clip():
        with torch.no_grad():
            t = deberta(input_ids=ids, attention_mask=mask).last_hidden_state[:, 0]
            a = wav2vec2(wav).last_hidden_state.mean(1)
            v = vit(frames).last_hidden_state[:, 0].mean(0, keepdim=True)
            fused = fusion(torch.cat([proj_t(t), proj_a(a), proj_v(v)], -1))
        return fused

    times = []
    for _ in range(clips):
        t0 = time.time()
        one_clip()
        times.append(time.time() - t0)
    sec_per_clip = float(np.median(times))
    return {
        "torch_cpu_sec_per_clip_forward": sec_per_clip,
        "torch_cpu_clips_per_sec_forward": 1.0 / sec_per_clip,
        "cpu_count": os.cpu_count(),
        "torch_version": torch.__version__,
        "clips_measured": clips,
    }


def main():
    clips = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    result = measure(clips)
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
