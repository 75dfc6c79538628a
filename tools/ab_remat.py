"""Same-process interleaved A/B: encoder remat ON vs OFF in the train step.

Remat (gradient checkpointing) re-runs each encoder layer's forward inside
the backward to avoid storing activations — the reference always pays full
activation memory instead (torch autograd default,
/root/reference/training/advanced_trainer.py:114-207). On a 16 GB v5e the
flagship's saved residuals are small enough (the fused kernels stash only
their [B, S, E] inputs + weights, not score-sized tensors) that storing them
may fit, trading ~one extra encoder forward per step for HBM.

Cross-process timings on the tunneled chip drift +/-10% (CLAUDE.md), so the
two configs are timed ABAB inside ONE process, one train state resident at a
time (two states = 2x Adam moments would starve HBM alongside the
activations).

Usage: python tools/ab_remat.py [--iters 6] [--rounds 2] [--batch 8]
"""
import argparse
import gc
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402


def build_batch(cfg, B, rng):
    return {
        "text": {
            "input_ids": rng.integers(
                1, 120000, (B, cfg.text_max_length)).astype(np.int32),
            "attention_mask": np.ones((B, cfg.text_max_length), np.int32),
        },
        "audio": (rng.standard_normal((B, cfg.audio_max_length)) * 8000
                  ).astype(np.int16),
        "video": rng.integers(
            0, 255,
            (B, cfg.video_max_frames, *cfg.video_frame_size, 3)
        ).astype(np.uint8),
        "emotion": rng.integers(0, cfg.num_emotions, (B,)).astype(np.int32),
    }


def run_config(remat: bool, B: int, iters: int, preset: str,
               prior_peak: int = 0):
    import jax

    from simple_multimodal_tpu.config import ModelConfig
    from simple_multimodal_tpu.models import MultimodalEmotionModel
    from simple_multimodal_tpu.models.multimodal_model import resolve_dtype
    from simple_multimodal_tpu.train.optim import make_optimizer
    from simple_multimodal_tpu.train.state import TrainState
    from simple_multimodal_tpu.train.steps import make_train_step

    cfg = ModelConfig(encoder_preset=preset,
                      data_path="/tmp/smm_ab/data",
                      save_path="/tmp/smm_ab/ckpt",
                      log_path="/tmp/smm_ab/logs")
    cfg.fusion_type = "hierarchical"
    cfg.remat_encoders = remat
    dtype = resolve_dtype(cfg)
    model = MultimodalEmotionModel(cfg, dtype=dtype)

    rng = np.random.default_rng(0)
    batch = build_batch(cfg, B, rng)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch["text"],
                                 batch["audio"], batch["video"])
    tx = make_optimizer(cfg, params, total_steps=1000)
    state = TrainState.create(params, tx, jax.random.PRNGKey(1))
    step = make_train_step(model, tx, cfg, augment=True,
                           compute_contrastive_loss=True)
    tb = jax.device_put(batch)
    jax.block_until_ready(tb)

    t0 = time.time()
    state, parts = step(state, tb)
    loss0 = float(jax.device_get(parts["total_loss"]))
    compile_s = time.time() - t0

    t0 = time.time()
    for _ in range(iters):
        state, parts = step(state, tb)
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    float(jax.device_get(leaf.reshape(-1)[0]))
    sec = (time.time() - t0) / iters

    from simple_multimodal_tpu.utils.profiling import memory_stats

    # peak_bytes_in_use is a process-lifetime MONOTONIC high-water mark:
    # it only attributes to THIS config when this run pushed past every
    # prior run's peak (advisor r4). Report it with that flag so later
    # rounds can't silently inherit the first config's larger peak.
    peak = max((s.get("peak_bytes_in_use") or 0)
               for s in memory_stats().values()) if memory_stats() else 0
    own_peak = peak > prior_peak

    del state, parts, tb, params, step, tx
    gc.collect()
    return sec, compile_s, loss0, peak, own_peak


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--preset", default="base")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(ROOT, ".jax_cache", jax.default_backend()))
    except Exception:
        pass

    results = {True: [], False: []}
    prior_peak = 0
    for r in range(args.rounds):
        for remat in (True, False):
            sec, compile_s, loss, peak, own = run_config(
                remat, args.batch, args.iters, args.preset, prior_peak)
            results[remat].append(sec)
            peak_s = (f"peak_hbm {peak/2**30:.2f} GiB" if own else
                      f"peak_hbm <= {peak/2**30:.2f} GiB (prior-run "
                      f"ceiling, not this config's own)")
            print(f"round {r} remat={int(remat)}: {sec*1e3:.1f} ms/step "
                  f"({args.batch/sec:.2f} clips/s) compile {compile_s:.1f}s "
                  f"loss {loss:.4f} {peak_s}", flush=True)
            prior_peak = max(prior_peak, peak)

    for remat in (True, False):
        xs = results[remat]
        print(f"remat={int(remat)}: median {np.median(xs)*1e3:.1f} ms/step "
              f"over {len(xs)} rounds ({sorted(round(x*1e3,1) for x in xs)})")


if __name__ == "__main__":
    main()
