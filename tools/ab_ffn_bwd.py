"""Same-process interleaved A/B: FFN dedicated Pallas backward vs the
reference-vjp fallback, in the full train step.

Round 4 proved the configuration question must be measured in-context and
interleaved (cross-process drift is +/-10% on the tunneled chip): fused
fwd + dedicated Pallas bwd won the attention kernels (423 vs 543 ms
all-XLA) while fused fwd + XLA-vjp-of-the-custom-call LOST (681 ms). The
FFN block gained its dedicated backward in round 5 — this tool answers
whether it pays in the 425 ms train step the same ABAB way. SMM_FFN_BWD
is read at trace time (ops/pallas/ffn_block._force_ffn_xla_bwd), so each
config is built+jitted fresh under its env setting, one train state
resident at a time. Matches the reference training hot loop
(/root/reference/training/advanced_trainer.py:126-182).

VERDICT (v5e, 2 ABAB rounds, losses identical): Pallas FFN bwd 438.9
ms/step median vs reference-vjp 426.6 — the kernel LOSES in-context and
is neutral isolated (144-148 vs ~144 ms on the bare 12-layer stack), so
it ships default-OFF (SMM_FFN_BWD=1 opts in). See RESULTS.md round 5.

Usage: python tools/ab_ffn_bwd.py [--iters 6] [--rounds 2] [--batch 8]
"""
import argparse
import gc
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402

from ab_remat import build_batch  # noqa: E402


def run_config(ffn_pallas_bwd: bool, B: int, iters: int, preset: str):
    import jax

    from simple_multimodal_tpu.config import ModelConfig
    from simple_multimodal_tpu.models import MultimodalEmotionModel
    from simple_multimodal_tpu.models.multimodal_model import resolve_dtype
    from simple_multimodal_tpu.train.optim import make_optimizer
    from simple_multimodal_tpu.train.state import TrainState
    from simple_multimodal_tpu.train.steps import make_train_step

    os.environ["SMM_FFN_BWD"] = "1" if ffn_pallas_bwd else "0"

    cfg = ModelConfig(encoder_preset=preset,
                      data_path="/tmp/smm_ab/data",
                      save_path="/tmp/smm_ab/ckpt",
                      log_path="/tmp/smm_ab/logs")
    cfg.fusion_type = "hierarchical"
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

    del state, parts, tb, params, step, tx
    gc.collect()
    return sec, compile_s, loss0


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
    losses = {}
    for r in range(args.rounds):
        for pallas in (True, False):
            sec, compile_s, loss = run_config(
                pallas, args.batch, args.iters, args.preset)
            results[pallas].append(sec)
            losses.setdefault(pallas, loss)
            print(f"round {r} ffn_pallas_bwd={int(pallas)}: "
                  f"{sec*1e3:.1f} ms/step ({args.batch/sec:.2f} clips/s) "
                  f"compile {compile_s:.1f}s loss {loss:.4f}", flush=True)

    # the two paths replay identical hash-dropout masks — losses must agree
    if abs(losses[True] - losses[False]) > 1e-3 * max(1.0, abs(losses[False])):
        print(f"WARNING: loss mismatch {losses[True]:.6f} vs "
              f"{losses[False]:.6f} — paths are not numerically equivalent")
    for pallas in (True, False):
        xs = results[pallas]
        print(f"ffn_pallas_bwd={int(pallas)}: median {np.median(xs)*1e3:.1f} "
              f"ms/step over {len(xs)} rounds "
              f"({sorted(round(x*1e3, 1) for x in xs)})")


if __name__ == "__main__":
    main()
