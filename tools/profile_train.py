"""Per-stage on-chip budget of the TRAIN step (backward + optimizer).

The forward has had a per-stage table since round 2 (profile_flagship.py);
this produces the same attribution for the train step, so the gap between
the measured step time and the FLOP-ideal is assigned to stages instead of
guessed. Method: for each component, time forward-only and
``value_and_grad`` of a weighted-random-sum loss (NOT sum(out**2): through
a trailing LayerNorm that loss is pure cancellation noise — CLAUDE.md), so

    bwd+remat-recompute ≈ t(grad) − t(fwd).

The optimizer update is timed separately on a real grad tree, and the full
bench-parity train step (augment + loss assembly + AdamW + donation) is
timed as the cross-check total. Matches the reference's per-batch hot loop
(/root/reference/training/advanced_trainer.py:126-196).

Usage:  python tools/profile_train.py            # full table (TPU)
        python tools/profile_train.py --stacks   # only the ViT-stack A/Bs
        SMM_PALLAS_BWD=0 ...                     # XLA-vjp backward A/B
"""
import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from _timing import timeit  # noqa: E402

# ViT-stack shape: 8 clips x 30 frames, 197 tokens, ViT-base
N_ROWS, S_VIT, E_VIT, F_VIT = 240, 197, 768, 3072
N_LAYERS = 12


def _wloss(out, w):
    return jnp.sum(out.astype(jnp.float32) * w)


class _FFNStack(nn.Module):
    """12 stacked pre-LN FFN sub-blocks exactly as ViTLayer._ffn invokes
    the fused kernel (vit.py:132-163): h + W2·gelu(W1·LN(h))."""

    L: int
    E: int
    F: int
    dtype: jnp.dtype
    remat: bool
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x):
        from simple_multimodal_tpu.ops.pallas.ffn_block import ffn_block

        E, F, L = self.E, self.F, self.L
        k = nn.linear.default_kernel_init
        w1 = self.param("w1", k, (L, E, F))
        b1 = self.param("b1", nn.initializers.zeros, (L, F))
        w2 = self.param("w2", k, (L, F, E))
        b2 = self.param("b2", nn.initializers.zeros, (L, E))
        g = self.param("g", nn.initializers.ones, (L, E))
        b = self.param("b", nn.initializers.zeros, (L, E))
        dt = self.dtype

        def body(h, p):
            pw1, pb1, pw2, pb2, pg, pb = (a.astype(dt) for a in p)
            out = ffn_block(h, pw1, pb1, pw2, pb2,
                            ln=(pg, pb, self.eps), ln_post=False,
                            residual=True)
            return out, None

        if self.remat:
            body = jax.checkpoint(body, prevent_cse=False)
        x, _ = jax.lax.scan(body, x, (w1, b1, w2, b2, g, b))
        return x


class _AttnStack(nn.Module):
    """12 stacked pre-LN attention sub-blocks as ViTLayer._body invokes
    the fused kernel (vit.py:183-203): x + proj(attn(LN(x)))."""

    L: int
    E: int
    H: int
    dtype: jnp.dtype
    remat: bool
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x):
        from simple_multimodal_tpu.ops.pallas.attention_block import (
            attention_block,
        )

        E, L = self.E, self.L
        k = nn.linear.default_kernel_init
        ws = {n: self.param(f"w{n}", k, (L, E, E)) for n in "qkvo"}
        bs = {n: self.param(f"b{n}", nn.initializers.zeros, (L, E))
              for n in "qkvo"}
        g = self.param("g", nn.initializers.ones, (L, E))
        b = self.param("b", nn.initializers.zeros, (L, E))
        dt = self.dtype

        def body(h, p):
            wq, wk, wv, wo, bq, bk, bv, bo, pg, pb = (
                a.astype(dt) for a in p)
            out = attention_block(h, wq, bq, wk, bk, wv, bv, wo, bo,
                                  num_heads=self.H,
                                  ln=(pg, pb, self.eps), residual=True)
            return out, None

        if self.remat:
            body = jax.checkpoint(body, prevent_cse=False)
        x, _ = jax.lax.scan(
            body, x, (ws["q"], ws["k"], ws["v"], ws["o"],
                      bs["q"], bs["k"], bs["v"], bs["o"], g, b))
        return x


def time_stack(mod, x, w, label, rows):
    p = jax.jit(mod.init)(jax.random.PRNGKey(0), x)
    fwd = timeit(jax.jit(lambda pp: mod.apply(pp, x)), p)

    def lg(pp):
        return jax.value_and_grad(lambda q: _wloss(mod.apply(q, x), w))(pp)

    grad = timeit(jax.jit(lg), p)
    rows.append((label, fwd, grad))
    return fwd, grad


def stack_table(remat: bool):
    rows = []
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N_ROWS, S_VIT, E_VIT)) * 0.02,
                    jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((N_ROWS, S_VIT, E_VIT)), jnp.float32)
    time_stack(_FFNStack(N_LAYERS, E_VIT, F_VIT, jnp.bfloat16, remat),
               x, w, f"ViT FFN stack x12 (remat={int(remat)})", rows)
    time_stack(_AttnStack(N_LAYERS, E_VIT, 12, jnp.bfloat16, remat),
               x, w, f"ViT attn stack x12 (remat={int(remat)})", rows)
    return rows


def print_rows(rows):
    print(f"{'component':46s} {'fwd ms':>8s} {'grad ms':>9s} "
          f"{'bwd ms':>8s} {'bwd/lyr':>8s}")
    for label, fwd, grad in rows:
        bwd = grad - fwd
        print(f"{label:46s} {fwd*1e3:8.2f} {grad*1e3:9.2f} "
              f"{bwd*1e3:8.2f} {bwd*1e3/N_LAYERS:8.2f}")


def full_table(args):
    from simple_multimodal_tpu.config import ModelConfig
    from simple_multimodal_tpu.data.video_wire import packed_height
    from simple_multimodal_tpu.models.encoders import (
        AudioEncoder, TextEncoder, VideoEncoder,
    )
    from simple_multimodal_tpu.models.multimodal_model import (
        MultimodalEmotionModel, resolve_dtype,
    )
    from simple_multimodal_tpu.train.optim import make_optimizer
    from simple_multimodal_tpu.train.state import TrainState
    from simple_multimodal_tpu.train.steps import make_train_step

    cfg = ModelConfig()
    cfg.encoder_preset = "base"
    cfg.fusion_type = "hierarchical"
    cfg.compute_dtype = "bfloat16"
    cfg.remat_encoders = ("auto" if args.remat == "auto"
                          else args.remat == "1")
    dt = resolve_dtype(cfg)
    B = 8
    rng = np.random.default_rng(0)

    ids = jnp.asarray(rng.integers(1, 1000, (B, 512)), jnp.int32)
    mask = jnp.ones((B, 512), jnp.int32)
    wav = jnp.asarray(rng.standard_normal((B, 160000)) * 0.1, jnp.float32)
    video = jnp.asarray(
        rng.integers(0, 255, (B, 30, packed_height(224), 224)), jnp.uint8)
    text_in = {"input_ids": ids, "attention_mask": mask}
    labels = jnp.asarray(rng.integers(0, cfg.num_emotions, (B,)), jnp.int32)

    rows = []  # (label, fwd, grad)

    # ---- per-encoder fwd vs grad (weighted-sum loss) --------------------
    for name, enc, enc_args in (
        ("text encoder (DeBERTa S=512)", TextEncoder(cfg, dtype=dt),
         (ids, mask)),
        ("audio encoder (wav2vec2+temporal)", AudioEncoder(cfg, dtype=dt),
         (wav,)),
        ("video encoder (ViT x30 + biLSTM)", VideoEncoder(cfg, dtype=dt),
         (video,)),
    ):
        p = jax.jit(enc.init)(jax.random.PRNGKey(0), *enc_args)
        out0 = jax.eval_shape(lambda pp: enc.apply(pp, *enc_args), p)
        # encoders return dicts; weight every float leaf (weighted-sum loss,
        # never sum(out**2) through an LN tail — see module docstring)
        w = [jnp.asarray(rng.standard_normal(s.shape), jnp.float32)
             if jnp.issubdtype(s.dtype, jnp.inexact) else None
             for s in jax.tree_util.tree_leaves(out0)]
        fwd = timeit(jax.jit(lambda pp: enc.apply(pp, *enc_args)), p)

        def lg(pp, _enc=enc, _args=enc_args, _w=w):
            def loss(q):
                flat = jax.tree_util.tree_leaves(_enc.apply(q, *_args))
                return sum(_wloss(o, ww) for o, ww in zip(flat, _w)
                           if ww is not None)
            return jax.value_and_grad(loss)(pp)

        grad = timeit(jax.jit(lg), p)
        rows.append((name, fwd, grad))
        del p

    # ---- full model: fwd, grad, optimizer, whole step -------------------
    model = MultimodalEmotionModel(cfg, dtype=dt)
    params = jax.jit(model.init)(jax.random.PRNGKey(3), text_in, wav, video)

    from simple_multimodal_tpu.train.losses import total_loss

    def loss_fn(p, rng_drop):
        outputs = model.apply(p, text_in, wav, video,
                              compute_contrastive_loss=True,
                              deterministic=False,
                              rngs={"dropout": rng_drop})
        loss, _ = total_loss(outputs, labels, label_smoothing=0.1)
        return loss

    key = jax.random.PRNGKey(7)
    fwd_full = timeit(jax.jit(loss_fn), params, key)
    grad_fn = jax.jit(lambda p, k: jax.value_and_grad(loss_fn)(p, k))
    grad_full = timeit(grad_fn, params, key)
    rows.append(("full model (loss fwd vs value_and_grad)",
                 fwd_full, grad_full))

    # optimizer update alone, on the real grad tree
    tx = make_optimizer(cfg, params, total_steps=1000)
    opt_state = tx.init(params)
    _, grads = grad_fn(params, key)

    def opt_only(g, s, p):
        updates, s2 = tx.update(g, s, p)
        p2 = jax.tree_util.tree_map(lambda a, u: a + u.astype(a.dtype),
                                    p, updates)
        return p2, s2

    t_opt = timeit(jax.jit(opt_only), grads, opt_state, params)
    del opt_state, grads

    # bench-parity full train step (donated), loop-timed like bench.py
    tx2 = make_optimizer(cfg, params, total_steps=1000)
    train_params = jax.tree_util.tree_map(jnp.array, params)
    state = TrainState.create(train_params, tx2, jax.random.PRNGKey(1))
    step = make_train_step(model, tx2, cfg, augment=True,
                           compute_contrastive_loss=True)
    tb = {"text": text_in, "audio": jax.device_put(wav),
          "video": jax.device_put(video), "emotion": labels}
    state, parts = step(state, tb)
    float(jax.device_get(parts["total_loss"]))
    t0 = time.time()
    for _ in range(args.iters):
        state, parts = step(state, tb)
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    float(jax.device_get(leaf.reshape(-1)[0]))
    t_step = (time.time() - t0) / args.iters

    print_rows(rows)
    print(f"{'optimizer update only (AdamW+clip+masked)':46s} "
          f"{'':8s} {'':9s} {t_opt*1e3:8.2f}")
    print(f"{'full train step (bench parity, donated)':46s} "
          f"{'':8s} {'':9s} {t_step*1e3:8.2f}")
    bwd_full = grad_full - fwd_full
    print(f"\nattribution: fwd {fwd_full*1e3:.1f} + bwd(+remat) "
          f"{bwd_full*1e3:.1f} + opt {t_opt*1e3:.1f} "
          f"= {(grad_full+t_opt)*1e3:.1f} ms "
          f"(step measured {t_step*1e3:.1f})")
    print(json.dumps({
        "fwd_ms": round(fwd_full * 1e3, 2),
        "bwd_ms": round(bwd_full * 1e3, 2),
        "opt_ms": round(t_opt * 1e3, 2),
        "step_ms": round(t_step * 1e3, 2),
        "encoders": {lbl: {"fwd_ms": round(f * 1e3, 2),
                           "bwd_ms": round((g - f) * 1e3, 2)}
                     for lbl, f, g in rows},
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stacks", action="store_true",
                    help="only the isolated ViT attn/FFN stack table")
    ap.add_argument("--remat", default="auto", choices=["auto", "0", "1"],
                    help="remat_encoders for the profiled config "
                         "(auto = the shipped resolve_remat default)")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    if args.stacks:
        # isolated stacks have no ModelConfig; "auto" = the B=8 ViT-stack
        # answer (off — fits easily at 240 rows)
        print_rows(stack_table(args.remat == "1"))
    else:
        full_table(args)


if __name__ == "__main__":
    main()
