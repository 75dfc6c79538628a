"""Per-component on-chip timing of the flagship TRAIN step.

Splits the batch-8 hierarchical-base train step (fwd+bwd+AdamW, remat) into
per-encoder value_and_grad passes plus the optimizer update so the backward
gap has a measured owner. Roofline: backward ≈ 2x forward FLOPs, remat adds
one forward; optimizer is pure HBM traffic over the f32 params+moments.

Usage: python tools/profile_train.py [--no-remat]  (TPU backend)
"""
import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


from _timing import timeit  # noqa: E402


def main():
    from simple_multimodal_tpu.config import ModelConfig
    from simple_multimodal_tpu.models.encoders import (
        AudioEncoder, TextEncoder, VideoEncoder,
    )
    from simple_multimodal_tpu.models.multimodal_model import (
        MultimodalEmotionModel, resolve_dtype,
    )
    from simple_multimodal_tpu.data.video_wire import packed_height

    cfg = ModelConfig()
    cfg.encoder_preset = "base"
    cfg.fusion_type = "hierarchical"
    cfg.compute_dtype = "bfloat16"
    if "--no-remat" in sys.argv:
        cfg.remat_encoders = False
    dt = resolve_dtype(cfg)
    B = 8
    rng = np.random.default_rng(0)

    ids = jnp.asarray(rng.integers(1, 1000, (B, 512)), jnp.int32)
    mask = jnp.ones((B, 512), jnp.int32)
    wav = jnp.asarray(rng.standard_normal((B, 160000)) * 0.1, jnp.float32)
    video = jnp.asarray(
        rng.integers(0, 255, (B, 30, packed_height(224), 224)), jnp.uint8)
    y = jnp.asarray(rng.integers(0, 7, (B,)), jnp.int32)

    def record(name, t):
        rows.append((name, t))
        print(f"{name:28s}: {t*1e3:8.2f} ms", flush=True)

    def grad_time(enc, apply_args, p):
        def loss(p):
            out = enc.apply(p, *apply_args)
            feats = out["features"] if isinstance(out, dict) else out
            return jnp.sum(feats.astype(jnp.float32) ** 2)
        return timeit(jax.jit(jax.grad(loss)), p)

    rows = []
    te = TextEncoder(cfg, dtype=dt)
    pt = jax.jit(te.init)(jax.random.PRNGKey(0), ids, mask)
    record("text grad", grad_time(te, (ids, mask), pt))
    del pt

    ae = AudioEncoder(cfg, dtype=dt)
    pa = jax.jit(ae.init)(jax.random.PRNGKey(1), wav)
    record("audio grad", grad_time(ae, (wav,), pa))
    del pa

    ve = VideoEncoder(cfg, dtype=dt)
    pv = jax.jit(ve.init)(jax.random.PRNGKey(2), video)
    record("video grad", grad_time(ve, (video,), pv))
    del pv
    import gc
    gc.collect()

    # full train step (the real one)
    from simple_multimodal_tpu.train.optim import make_optimizer
    from simple_multimodal_tpu.train.state import TrainState
    from simple_multimodal_tpu.train.steps import make_train_step

    model = MultimodalEmotionModel(cfg, dtype=dt)
    text_in = {"input_ids": ids, "attention_mask": mask}
    pm = jax.jit(model.init)(jax.random.PRNGKey(3), text_in, wav, video)
    tx = make_optimizer(cfg, pm, total_steps=1000)

    # optimizer update alone (measures the AdamW HBM pass)
    g = jax.tree_util.tree_map(jnp.ones_like, pm)
    opt_state = jax.jit(tx.init)(pm)

    def opt_only(g, opt_state, pm):
        up, new_os = tx.update(g, opt_state, pm)
        import optax
        return optax.apply_updates(pm, up), new_os
    record("optimizer update alone", timeit(jax.jit(opt_only), g,
                                            opt_state, pm))
    del g, opt_state

    state = TrainState.create(
        jax.tree_util.tree_map(jnp.array, pm), tx, jax.random.PRNGKey(1))
    step = make_train_step(model, tx, cfg, augment=True,
                           compute_contrastive_loss=True)
    batch = {"text": text_in, "audio": wav, "video": video, "emotion": y}
    batch = dict(jax.device_put(batch))

    t0 = time.time()
    state, parts = step(state, batch)
    float(jax.device_get(parts["total_loss"]))
    compile_s = time.time() - t0

    def run(state):
        state, parts = step(state, batch)
        return state, parts["total_loss"]
    # donation: time by stepping N times sequentially
    n = 10
    t0 = time.time()
    for _ in range(n):
        state, loss = run(state)
    float(jax.device_get(loss))
    t_step = (time.time() - t0) / n

    print(f"{'full train step':28s}: {t_step*1e3:8.2f} ms  "
          f"(compile {compile_s:.0f} s, remat={getattr(cfg, 'remat_encoders', True)})")
    print(f"train clips/s: {B/t_step:.1f}")


if __name__ == "__main__":
    main()
