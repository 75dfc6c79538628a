#!/usr/bin/env python
"""Measure tensor/data-parallel scaling of the jitted train step.

Runs the full train step at a sweep of (data, model) mesh shapes and
reports per-step wall time after compile. On real hardware this measures
TP/DP speedup; on the 8-virtual-CPU-device mesh (the only multi-"chip"
topology available in this environment) absolute numbers are dominated by
single-core dispatch — the value there is RELATIVE cost and proof that the
sharded step executes; treat CPU numbers as correctness-with-cost
evidence, not speedup claims (recorded as such in RESULTS.md).

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
    PYTHONPATH=/root/repo python tools/bench_tp.py --preset tiny \
    --meshes 1x1 8x1 4x2 2x4 --steps 5
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", default="tiny")
    parser.add_argument("--meshes", nargs="+", default=["1x1", "8x1", "4x2"])
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--steps", type=int, default=5)
    parser.add_argument("--eval-only", action="store_true")
    args = parser.parse_args()

    import jax

    if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    from __graft_entry__ import _synth_batch, _tiny_config
    from simple_multimodal_tpu.config import ModelConfig
    from simple_multimodal_tpu.models import MultimodalEmotionModel
    from simple_multimodal_tpu.parallel.mesh import (
        batch_sharding, make_mesh, params_shardings, set_current_mesh,
    )
    from simple_multimodal_tpu.train.optim import make_optimizer
    from simple_multimodal_tpu.train.state import TrainState
    from simple_multimodal_tpu.train.steps import make_eval_step, make_train_step

    results = {}
    for spec in args.meshes:
        d, m = (int(x) for x in spec.split("x"))
        if d * m > len(jax.devices()):
            print(f"{spec}: skipped (only {len(jax.devices())} devices)")
            continue
        if args.preset == "tiny":
            cfg = _tiny_config()
        else:
            cfg = ModelConfig(encoder_preset=args.preset,
                              data_path="/tmp/tp/data", save_path="/tmp/tp/c",
                              log_path="/tmp/tp/l")
        cfg.fusion_type = "hierarchical"
        cfg.mesh_shape = (d, m)
        mesh = make_mesh((d, m))
        model = MultimodalEmotionModel(cfg)
        B = max(args.batch, d)
        batch = _synth_batch(cfg, B)

        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), batch["text"], batch["audio"], batch["video"])
        params = jax.device_put(params, params_shardings(mesh, params))
        b_sh = batch_sharding(mesh)
        dev = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, b_sh) if isinstance(x, np.ndarray) else x,
            batch)

        if args.eval_only:
            step = make_eval_step(model)
            t0 = time.time()
            out = step(params, dev)
            jax.block_until_ready(out)
            compile_s = time.time() - t0
            t0 = time.time()
            for _ in range(args.steps):
                out = step(params, dev)
            jax.block_until_ready(out)
            per = (time.time() - t0) / args.steps
        else:
            tx = make_optimizer(cfg, params, total_steps=100)
            state = TrainState.create(params, tx, jax.random.PRNGKey(1))
            step = make_train_step(model, tx, cfg, augment=False,
                                   compute_contrastive_loss=True)
            t0 = time.time()
            state, parts = step(state, dev)
            float(jax.device_get(parts["total_loss"]))
            compile_s = time.time() - t0
            t0 = time.time()
            for _ in range(args.steps):
                state, parts = step(state, dev)
            float(jax.device_get(parts["total_loss"]))
            per = (time.time() - t0) / args.steps
        results[spec] = per
        print(f"mesh {spec}: {per*1e3:.1f} ms/step (B={B}, compile {compile_s:.0f}s)")
        set_current_mesh(None)

    if "1x1" in results:
        base = results["1x1"]
        for spec, per in results.items():
            print(f"  {spec}: {base/per:.2f}x vs 1x1")


if __name__ == "__main__":
    main()
