"""On-TPU smoke test for the Pallas kernels at ENGAGED lengths.

The CPU test suite runs every kernel in interpreter mode; this tool runs
them compiled on the real chip — in particular flash attention forward AND
backward at S > 512 (the only regime the auto-gate ever engages it,
ops/attention.py), with a bias, so the VMEM head-group estimate
(flash_attention._head_group) is validated against Mosaic's actual
budget rather than assumed.

Usage:  python tools/smoke_tpu_kernels.py   (needs a TPU backend)
"""
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _check(name, got, want, tol):
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    status = "ok" if err <= tol else "FAIL"
    print(f"  {name}: max|Δ| = {err:.2e} (tol {tol:g}) {status}")
    if err > tol:
        raise SystemExit(f"{name} exceeded tolerance")


def xla_attention(q, k, v, bias=None):
    D = q.shape[-1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * (D ** -0.5)
    if bias is not None:
        s = s + bias
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def smoke_flash(S=1024, B=2, H=12, D=64):
    from simple_multimodal_tpu.ops.pallas.flash_attention import flash_attention

    print(f"flash fwd+bwd at S={S} (bias on), compiled:")
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((1, H, S, S)) * 0.5, jnp.float32)

    out = jax.jit(flash_attention)(q, k, v, bias)
    ref = jax.jit(xla_attention)(q, k, v, bias)
    _check("forward", out, ref, 3e-2)

    def loss_flash(q, k, v, bias):
        return jnp.sum(flash_attention(q, k, v, bias).astype(jnp.float32) ** 2)

    def loss_xla(q, k, v, bias):
        return jnp.sum(xla_attention(q, k, v, bias).astype(jnp.float32) ** 2)

    gf = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2, 3)))(q, k, v, bias)
    gx = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2, 3)))(q, k, v, bias)
    scale = float(jnp.max(jnp.abs(gx[0].astype(jnp.float32)))) or 1.0
    for name, a, b in zip("dq dk dv dbias".split(), gf, gx):
        _check(name, a / scale, b / scale, 5e-2)


def smoke_deberta(S=512, B=2, H=12, D=64, span=256):
    from simple_multimodal_tpu.ops.pallas.deberta_attention import (
        deberta_attention,
    )
    from simple_multimodal_tpu.models.deberta import (
        DebertaConfig, DebertaModel,
    )

    print("fused disentangled-attention kernel vs XLA model path:")
    import dataclasses as dc
    cfg = dc.replace(DebertaConfig.base(), num_layers=1)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (B, S)), jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)
    m_k = DebertaModel(dc.replace(cfg, use_flash=True), dtype=jnp.bfloat16)
    m_x = DebertaModel(dc.replace(cfg, use_flash=False), dtype=jnp.bfloat16)
    p = jax.jit(m_k.init)(jax.random.PRNGKey(0), ids, mask)
    ok = jax.jit(lambda p: m_k.apply(p, ids, mask))(p)
    ox = jax.jit(lambda p: m_x.apply(p, ids, mask))(p)
    _check("deberta layer", ok, ox, 5e-2)

    # backward: the Pallas bwd kernel (recompute + unskew table grads) vs
    # autodiff of the XLA one-hot model path, compiled on-chip at base dims.
    # NB: the loss must be a random-weighted sum, NOT sum(out**2) — the
    # model ends in a LayerNorm, so sum(LN(x)**2) is ~constant and its
    # gradient is pure cancellation noise (measured: even the one-hot path
    # disagrees with ITSELF jit-vs-nojit at 1.0 relative under that loss)
    w_l = jnp.asarray(rng.standard_normal((B, S, cfg.hidden_size)),
                      jnp.float32)

    def loss(m):
        def f(p):
            out = m.apply(p, ids, mask)
            return jnp.sum(out.astype(jnp.float32) * w_l) / (B * S)
        return f

    gk = jax.jit(jax.grad(loss(m_k)))(p)
    gx = jax.jit(jax.grad(loss(m_x)))(p)
    for (path, a_), (_, e_) in zip(
            jax.tree_util.tree_leaves_with_path(gk),
            jax.tree_util.tree_leaves_with_path(gx)):
        scl = float(jnp.max(jnp.abs(e_.astype(jnp.float32)))) or 1.0
        _check("bwd " + jax.tree_util.keystr(path)[-40:], a_ / scl,
               e_ / scl, 5e-2)

    # training mode: in-kernel dropout fwd+bwd compiles and is finite
    m_t = DebertaModel(dc.replace(cfg, use_flash=True, attention_dropout=0.1),
                       dtype=jnp.bfloat16)

    def loss_t(p):
        out = m_t.apply(p, ids, mask, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(7)})
        return jnp.sum(out.astype(jnp.float32) ** 2) / (B * S)

    vt, gt = jax.jit(jax.value_and_grad(loss_t))(p)
    assert np.isfinite(float(vt)), "train-mode fused loss not finite"
    bad = [jax.tree_util.keystr(path)
           for path, l in jax.tree_util.tree_leaves_with_path(gt)
           if not bool(jnp.all(jnp.isfinite(l)))]
    assert not bad, f"non-finite train-mode grads: {bad}"
    print("  train-mode (dropout 0.1) fwd+bwd finite on-chip: OK")


def smoke_block(S=512, B=4, H=12, E=768):
    # H=12 → head_dim 64 (the ViT/wav2vec2 internal shape). H=8 over 768
    # gives head_dim 96, which block_viable REJECTS (128 % 96 != 0) — that
    # configuration silently compares einsum vs einsum and smokes nothing.
    from simple_multimodal_tpu.ops.attention import MultiHeadAttention
    from simple_multimodal_tpu.ops.pallas.attention_block import block_viable

    assert block_viable(S, H, E // H, E), "smoke config must engage the kernel"
    print("fused attention-block kernel vs einsum path:")
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((B, S, E)), jnp.bfloat16)
    m_k = MultiHeadAttention(E, H, dtype=jnp.bfloat16, use_flash=True)
    m_x = MultiHeadAttention(E, H, dtype=jnp.bfloat16, use_flash=False)
    p = jax.jit(m_k.init)(jax.random.PRNGKey(0), x, x, x)
    ok, _ = jax.jit(lambda p: m_k.apply(p, x, x, x, need_weights=False))(p)
    ox, _ = jax.jit(lambda p: m_x.apply(p, x, x, x, need_weights=False))(p)
    _check("attention block", ok, ox, 5e-2)

    # in-kernel dropout: kernel vs the XLA hash reference, fwd + grads,
    # compiled on-chip at the wav2vec2 stack shape
    from simple_multimodal_tpu.ops.pallas import attention_block as ab

    rate, seed = 0.1, 1234
    seed_arr = jnp.full((1,), seed, jnp.int32)
    rngw = np.random.default_rng(3)
    ws = [jnp.asarray(rngw.standard_normal((E, E)) * 0.05, jnp.bfloat16)
          for _ in range(4)]
    bs = [jnp.asarray(rngw.standard_normal((E,)) * 0.05, jnp.bfloat16)
          for _ in range(4)]
    w_l = jnp.asarray(rngw.standard_normal((B, S, E)), jnp.float32)

    def loss_k(x, *wb):
        out = ab.attention_block(x, wb[0], wb[4], wb[1], wb[5], wb[2],
                                 wb[6], wb[3], wb[7], num_heads=H,
                                 dropout_rate=rate,
                                 dropout_seed=jnp.int32(seed))
        return jnp.sum(out.astype(jnp.float32) * w_l)

    def loss_r(x, *wb):
        out = ab._xla_reference(x, wb[0], wb[4], wb[1], wb[5], wb[2],
                                wb[6], wb[3], wb[7], num_heads=H,
                                seed=seed_arr, rate=rate)
        return jnp.sum(out.astype(jnp.float32) * w_l)

    args = (x, *ws, *bs)
    gk = jax.jit(jax.grad(loss_k, argnums=(0, 1, 5)))(*args)
    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 5)))(*args)
    for name, a, e in zip(("drop dx", "drop dwq", "drop dbq"), gk, gr):
        scl = float(jnp.max(jnp.abs(e.astype(jnp.float32)))) or 1.0
        _check(name, a / scl, e / scl, 5e-2)


def smoke_block_ln(S=197, B=8, H=12, E=768):
    """The whole pre-LN attention sub-block (LN + qkv + attn + out-proj +
    residual) in one kernel — ViTLayer's fused route — vs the unfused
    composition, compiled on-chip."""
    from simple_multimodal_tpu.ops.pallas.attention_block import (
        attention_block,
    )

    print("fused LN+attention-block+residual (ViT sub-block) vs XLA:")
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((B, S, E)), jnp.bfloat16)
    ws = [jnp.asarray(rng.standard_normal((E, E)) * 0.03, jnp.bfloat16)
          for _ in range(4)]
    bs = [jnp.asarray(rng.standard_normal((E,)) * 0.03, jnp.bfloat16)
          for _ in range(4)]
    g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(E), jnp.bfloat16)
    b = jnp.asarray(0.1 * rng.standard_normal(E), jnp.bfloat16)
    eps = 1e-12

    def fused(x):
        return attention_block(x, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2],
                               ws[3], bs[3], num_heads=H,
                               ln=(g, b, eps), residual=True)

    def unfused(x):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        xn = ((xf - mu) * jax.lax.rsqrt(var + eps)
              * g.astype(jnp.float32) + b.astype(jnp.float32)
              ).astype(x.dtype)
        D = E // H
        q = (xn @ ws[0] + bs[0]).reshape(B, S, H, D)
        k = (xn @ ws[1] + bs[1]).reshape(B, S, H, D)
        v = (xn @ ws[2] + bs[2]).reshape(B, S, H, D)
        ctx = xla_attention(q, k, v).reshape(B, S, E)
        return x + (ctx @ ws[3] + bs[3])

    _check("ln+block+residual", jax.jit(fused)(x), jax.jit(unfused)(x), 5e-2)

    # backward: the Pallas bwd kernel (dx + packed dqkv + a) vs XLA vjp,
    # compiled on-chip at the ViT stack shape
    wsum = jnp.asarray(rng.standard_normal((B, S, E)) * 0.1, jnp.float32)

    def loss(fn, x, g, b, ws, bs):
        ws = [w.astype(jnp.bfloat16) for w in ws]
        bs_ = [v.astype(jnp.bfloat16) for v in bs]
        return jnp.sum(fn(x, g, b, ws, bs_).astype(jnp.float32) * wsum)

    def fused_p(x, g, b, ws, bs):
        return attention_block(x, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2],
                               ws[3], bs[3], num_heads=H,
                               ln=(g, b, eps), residual=True)

    def unfused_p(x, g, b, ws, bs):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        xn = ((xf - mu) * jax.lax.rsqrt(var + eps)
              * g.astype(jnp.float32) + b.astype(jnp.float32)
              ).astype(x.dtype)
        D = E // H
        q = (xn @ ws[0] + bs[0]).reshape(B, S, H, D)
        k = (xn @ ws[1] + bs[1]).reshape(B, S, H, D)
        v = (xn @ ws[2] + bs[2]).reshape(B, S, H, D)
        ctx = xla_attention(q, k, v).reshape(B, S, E)
        return x + (ctx @ ws[3] + bs[3])

    tree = {"x": x.astype(jnp.float32), "g": g.astype(jnp.float32),
            "b": b.astype(jnp.float32),
            "ws": [w.astype(jnp.float32) for w in ws],
            "bs": [v.astype(jnp.float32) for v in bs]}

    def tree_loss(fn, t):
        return loss(fn, t["x"].astype(jnp.bfloat16),
                    t["g"].astype(jnp.bfloat16),
                    t["b"].astype(jnp.bfloat16), t["ws"], t["bs"])

    gf = jax.jit(jax.grad(lambda t: tree_loss(fused_p, t)))(tree)
    gu = jax.jit(jax.grad(lambda t: tree_loss(unfused_p, t)))(tree)
    leaves_f = jax.tree_util.tree_leaves_with_path(gf)
    leaves_u = jax.tree_util.tree_leaves_with_path(gu)
    # Per-leaf scale floored at 1e-2 of the global gradient scale: the
    # key-projection bias grad is ANALYTICALLY ZERO (softmax is shift-
    # invariant per query row, so Σ_k ds[q,k] = 0) — both sides produce
    # pure cancellation noise there, and noise/noise is not a kernel bug.
    gmax = max(float(jnp.max(jnp.abs(e.astype(jnp.float32))))
               for _, e in leaves_u)
    for (path, a_), (_, e_) in zip(leaves_f, leaves_u):
        scl = max(float(jnp.max(jnp.abs(e_.astype(jnp.float32)))),
                  1e-2 * gmax)
        _check("bwd " + jax.tree_util.keystr(path), a_ / scl, e_ / scl,
               5e-2)


def smoke_ffn(B=240, S=197, E=768, F=3072):
    """Fused FFN block at the ViT stack shape (the [S, F] intermediate is
    ~290 MB/layer in HBM on the unfused path), both LN placements."""
    from simple_multimodal_tpu.ops.pallas import ffn_block as fb

    print("fused FFN block vs XLA composition:")
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((B, S, E)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((E, F)) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal((F,)) * 0.05, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((F, E)) * 0.05, jnp.bfloat16)
    b2 = jnp.asarray(rng.standard_normal((E,)) * 0.05, jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((E,)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((E,)), jnp.bfloat16)

    for post in (False, True):
        ln = (g, b, 1e-7)
        out = jax.jit(lambda x: fb.ffn_block(x, w1, b1, w2, b2, ln=ln,
                                             ln_post=post, residual=True))(x)
        ref = jax.jit(lambda x: fb._xla_reference(x, w1, b1, w2, b2, ln=ln,
                                                  ln_post=post,
                                                  residual=True))(x)
        # relative: FFN+residual outputs reach |y| ≈ 20 here, where one
        # bf16 ulp is 0.125 — an absolute 5e-2 would flag correct rounding
        scl = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) or 1.0
        _check(f"ffn ln_post={post}", out / scl, ref / scl, 5e-2)


def smoke_ffn_bwd(B=240, S=197, E=768, F=3072):
    """Dedicated Pallas FFN backward (round 5) at the ViT stack shape,
    compiled under Mosaic: validates the _bwd_pick VMEM envelope for real
    (round-3 lesson: the estimate lies, the chip doesn't) and grad parity
    vs the XLA reference vjp — pre-LN with BOTH dropout draws live (the
    training hot path) and post-LN (DeBERTa/wav2vec2 placement)."""
    import os

    from simple_multimodal_tpu.ops.pallas import ffn_block as fb

    os.environ["SMM_FFN_BWD"] = "1"  # Pallas FFN bwd is opt-in (r5 A/B)
    jax.clear_caches()
    print("FFN dedicated Pallas backward vs XLA-reference vjp:")
    rng = np.random.default_rng(5)
    tree = {
        "x": jnp.asarray(rng.standard_normal((B, S, E)), jnp.float32),
        "w1": jnp.asarray(rng.standard_normal((E, F)) * 0.05, jnp.float32),
        "b1": jnp.asarray(rng.standard_normal((F,)) * 0.05, jnp.float32),
        "w2": jnp.asarray(rng.standard_normal((F, E)) * 0.05, jnp.float32),
        "b2": jnp.asarray(rng.standard_normal((E,)) * 0.05, jnp.float32),
        "g": jnp.asarray(rng.standard_normal((E,)), jnp.float32),
        "b": jnp.asarray(rng.standard_normal((E,)), jnp.float32),
    }
    wsum = jnp.asarray(rng.standard_normal((B, S, E)), jnp.float32)
    seed = jnp.full((1,), 99, jnp.int32)

    for post, r_mid, r_out in ((False, 0.1, 0.1), (True, 0.0, 0.1)):
        def loss_fused(t):
            return jnp.sum(fb.ffn_block(
                t["x"].astype(jnp.bfloat16), t["w1"].astype(jnp.bfloat16),
                t["b1"].astype(jnp.bfloat16), t["w2"].astype(jnp.bfloat16),
                t["b2"].astype(jnp.bfloat16),
                ln=(t["g"].astype(jnp.bfloat16),
                    t["b"].astype(jnp.bfloat16), 1e-7),
                ln_post=post, residual=True, dropout_rate_mid=r_mid,
                dropout_rate_out=r_out,
                dropout_seed=jnp.int32(99)).astype(jnp.float32) * wsum)

        def loss_ref(t):
            return jnp.sum(fb._xla_reference(
                t["x"].astype(jnp.bfloat16), t["w1"].astype(jnp.bfloat16),
                t["b1"].astype(jnp.bfloat16), t["w2"].astype(jnp.bfloat16),
                t["b2"].astype(jnp.bfloat16),
                ln=(t["g"].astype(jnp.bfloat16),
                    t["b"].astype(jnp.bfloat16), 1e-7),
                ln_post=post, residual=True, seed=seed, rate_mid=r_mid,
                rate_out=r_out).astype(jnp.float32) * wsum)

        gf = jax.jit(jax.grad(loss_fused))(tree)
        gr = jax.jit(jax.grad(loss_ref))(tree)
        gmax = max(float(jnp.max(jnp.abs(e))) for e in
                   jax.tree_util.tree_leaves(gr))
        for k in tree:
            scl = max(float(jnp.max(jnp.abs(gr[k]))), 1e-2 * gmax)
            _check(f"ffn bwd ln_post={post} d{k}", gf[k] / scl, gr[k] / scl,
                   5e-2)


def main():
    if jax.default_backend() != "tpu":
        raise SystemExit("needs a TPU backend (got %s)" % jax.default_backend())
    print(f"device: {jax.devices()[0]}")
    smoke_flash()
    smoke_deberta()
    smoke_block()
    smoke_block_ln()
    smoke_ffn()
    smoke_ffn_bwd()
    print("all kernel smokes passed on-chip")


if __name__ == "__main__":
    main()
