import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simple_multimodal_tpu.models import (
    FewShotModel,
    KnowledgeDistillationModel,
    MultimodalEmotionModel,
    RobustMultimodalModel,
    create_model,
)
from simple_multimodal_tpu.ops.adapters import modality_dropout

# NOTE: everything here runs jitted — eager per-op dispatch is pathologically
# slow on small CI hosts, and the framework always runs jitted in production.


def make_batch(cfg, B=2, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "text": {
            "input_ids": rng.integers(0, 1000, (B, cfg.text_max_length)).astype(np.int32),
            "attention_mask": np.ones((B, cfg.text_max_length), np.int32),
        },
        "audio": rng.standard_normal((B, cfg.audio_max_length)).astype(np.float32),
        "video": rng.integers(
            0, 255, (B, cfg.video_max_frames, *cfg.video_frame_size, 3)
        ).astype(np.uint8),
        "emotion": rng.integers(0, cfg.num_emotions, (B,)).astype(np.int32),
    }


def jinit(model, batch, **kw):
    f = jax.jit(partial(model.init, **kw))
    return f(jax.random.PRNGKey(0), batch["text"], batch["audio"], batch["video"])


def japply(model, params, batch, rngs=None, **kw):
    f = jax.jit(
        lambda p, t, a, v: model.apply(p, t, a, v, rngs=rngs, **kw)
    )
    return f(params, batch["text"], batch["audio"], batch["video"])


def fusion_cfg(cfg, fusion_type):
    c = dataclasses.replace(cfg)
    c.fusion_type = fusion_type
    return c


@pytest.fixture(scope="module")
def cfg(tiny_config):
    return tiny_config


@pytest.fixture(scope="module")
def early_setup(cfg):
    c = fusion_cfg(cfg, "early")
    model = MultimodalEmotionModel(c)
    batch = make_batch(c)
    params = jinit(model, batch)
    return c, model, batch, params


@pytest.mark.parametrize("fusion_type", [
    "early", "late", "mult", "graph", "contrastive", "adaptive", "hierarchical",
])
def test_fusion_forward_shapes(cfg, fusion_type):
    c = fusion_cfg(cfg, fusion_type)
    model = MultimodalEmotionModel(c)
    batch = make_batch(c)
    ccl = fusion_type in ("contrastive", "hierarchical")
    params = jinit(model, batch, compute_contrastive_loss=ccl)
    out = japply(model, params, batch, compute_contrastive_loss=ccl)
    B = batch["audio"].shape[0]
    assert out["emotion_logits"].shape == (B, c.num_emotions)
    assert out["emotion_probs"].shape == (B, c.num_emotions)
    np.testing.assert_allclose(np.asarray(out["emotion_probs"]).sum(-1), 1.0, atol=1e-5)
    assert out["valence"].shape == (B, 1)
    assert out["arousal"].shape == (B, 1)
    assert out["uncertainty"].shape == (B, c.num_emotions)
    for k in ("text_features", "audio_features", "video_features"):
        assert out[k].shape == (B, c.fusion_hidden_size)
    if fusion_type == "late":
        assert set(out["individual_logits"]) == {"text", "audio", "video"}
        assert out["fusion_weights"].shape == (3,)
        np.testing.assert_allclose(np.asarray(out["fusion_weights"]).sum(), 1.0, atol=1e-5)
    if ccl:
        assert set(out["contrastive_losses"]) == {"text_audio", "text_video", "audio_video"}
        for v in out["contrastive_losses"].values():
            assert np.isfinite(float(v))
    if fusion_type == "hierarchical":
        for k in ("early_features", "mult_features", "graph_features",
                  "contrastive_features", "adaptive_features"):
            assert out[k].shape == (B, c.fusion_hidden_size)


def test_missing_modalities_zeroed(early_setup):
    c, model, batch, params = early_setup
    out_full = japply(model, params, batch)
    out_noaudio = japply(model, params, batch, missing_modalities=("audio",))
    zero_batch = dict(batch, audio=np.zeros_like(batch["audio"]))
    out_zero = japply(model, params, zero_batch)
    np.testing.assert_allclose(
        np.asarray(out_noaudio["emotion_logits"]),
        np.asarray(out_zero["emotion_logits"]), atol=1e-5,
    )
    assert not np.allclose(
        np.asarray(out_noaudio["emotion_logits"]),
        np.asarray(out_full["emotion_logits"]),
    )


def test_modality_dropout_survivor_guarantee():
    B, D = 64, 4
    ones = jnp.ones((B, D))
    t2, a2, v2 = jax.jit(partial(modality_dropout, rate=0.99))(
        jax.random.PRNGKey(0), ones, ones, ones
    )
    alive = (
        (np.asarray(t2).sum(-1) > 0).astype(int)
        + (np.asarray(a2).sum(-1) > 0).astype(int)
        + (np.asarray(v2).sum(-1) > 0).astype(int)
    )
    assert np.all(alive >= 1)


def test_training_mode_stochastic(early_setup):
    c, model, batch, params = early_setup
    out1 = japply(model, params, batch, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(1)})
    out2 = japply(model, params, batch, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(
        np.asarray(out1["emotion_logits"]), np.asarray(out2["emotion_logits"])
    )
    out3 = japply(model, params, batch)
    out4 = japply(model, params, batch)
    np.testing.assert_allclose(
        np.asarray(out3["emotion_logits"]), np.asarray(out4["emotion_logits"])
    )


def test_adapter_prompt_paths(cfg):
    c = fusion_cfg(cfg, "early")
    model = MultimodalEmotionModel(c)
    batch = make_batch(c)
    params = jinit(model, batch, use_adapter=True, use_prompt=True)
    flat = jax.tree_util.tree_leaves_with_path(params)
    names = {"/".join(str(p) for p in path) for path, _ in flat}
    assert any("prompt_embeddings" in n for n in names)
    assert any("adapter" in n for n in names)
    out = japply(model, params, batch, use_adapter=True, use_prompt=True)
    assert out["emotion_logits"].shape == (2, c.num_emotions)


def test_distillation_model(cfg):
    c = fusion_cfg(cfg, "early")
    model = KnowledgeDistillationModel(c, c)
    batch = make_batch(c)
    params = jinit(model, batch)
    out = japply(model, params, batch)
    assert "distillation_loss" in out and np.isfinite(float(out["distillation_loss"]))
    assert float(out["distillation_loss"]) >= 0
    assert out["teacher_logits"].shape == out["emotion_logits"].shape


def test_few_shot_model(cfg):
    c = fusion_cfg(cfg, "early")
    n_way, n_shot = c.num_emotions, 2
    model = FewShotModel(c)
    support = make_batch(c, B=n_way * n_shot, seed=1)
    query = make_batch(c, B=4, seed=2)
    params = jax.jit(
        lambda k, s, q: model.init(k, s, q, n_way, n_shot)
    )(jax.random.PRNGKey(0), support, query)
    out = jax.jit(
        lambda p, s, q: model.apply(p, s, q, n_way, n_shot)
    )(params, support, query)
    assert out["predictions"].shape == (4, n_way)
    np.testing.assert_allclose(np.asarray(out["predictions"]).sum(-1), 1.0, atol=1e-5)
    assert out["prototypes"].shape == (n_way, c.fusion_hidden_size)
    assert out["distances"].shape == (4, n_way)


def test_robust_model(cfg):
    c = fusion_cfg(cfg, "early")
    model = RobustMultimodalModel(c)
    batch = make_batch(c)
    params = jinit(model, batch)
    out = japply(model, params, batch)
    assert out["robust_prediction"].shape == (2, c.num_emotions)
    np.testing.assert_allclose(np.asarray(out["modality_weights"]).sum(-1), 1.0, atol=1e-5)
    out2 = japply(model, params, batch, available_modalities=("text",))
    w = np.asarray(out2["modality_weights"])
    np.testing.assert_allclose(w[:, 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(w[:, 1:], 0.0, atol=1e-5)
    # missing_modalities accepted (reference had a latent TypeError here)
    out3 = japply(model, params, batch, missing_modalities=("audio",))
    assert out3["robust_prediction"].shape == (2, c.num_emotions)


def test_create_model_factory(cfg):
    for mt in ("standard", "few_shot", "robust", "distillation"):
        assert create_model(cfg, mt) is not None
    with pytest.raises(ValueError):
        create_model(cfg, "nope")


def test_grad_flow(early_setup):
    c, model, batch, params = early_setup

    @jax.jit
    def grads_fn(p):
        def loss_fn(p):
            out = model.apply(p, batch["text"], batch["audio"], batch["video"])
            logits = out["emotion_logits"]
            labels = jax.nn.one_hot(batch["emotion"], c.num_emotions)
            return -jnp.mean(jnp.sum(labels * jax.nn.log_softmax(logits), axis=-1))
        return jax.grad(loss_fn)(p)

    grads = grads_fn(params)
    norms = [float(jnp.abs(g).max()) for g in jax.tree_util.tree_leaves(grads)]
    assert all(np.isfinite(n) for n in norms)
    assert max(norms) > 0


def test_contrastive_grad_finite_with_dropped_modality(cfg):
    """Regression: a modality zeroed by modality-dropout makes the
    contrastive projector output exactly 0; naive L2-normalize has a NaN
    gradient there (sqrt'(0))."""
    import jax.numpy as jnp

    from simple_multimodal_tpu.models.fusion import ContrastiveFusion

    c = fusion_cfg(cfg, "contrastive")
    m = ContrastiveFusion(c)
    rng = np.random.default_rng(0)
    t = rng.standard_normal((2, c.fusion_hidden_size)).astype(np.float32)
    a = np.zeros((2, c.fusion_hidden_size), np.float32)  # dropped modality
    v = rng.standard_normal((2, c.fusion_hidden_size)).astype(np.float32)
    params = m.init(jax.random.PRNGKey(0), t, a, v, True)

    @jax.jit
    def gfn(p):
        def loss(p):
            out = m.apply(p, t, a, v, True)
            return sum(out["contrastive_losses"].values())
        return jax.grad(loss)(p)

    grads = gfn(params)
    assert all(
        bool(jnp.all(jnp.isfinite(g)))
        for g in jax.tree_util.tree_leaves(grads)
    )


def test_gat_golden_numerics():
    """DenseGATLayer vs an independent, loop-based evaluation of
    torch_geometric GATConv message-passing semantics (docs formula:
    for target i, alpha_ij = softmax_j LeakyReLU(att_src·Wx_j + att_dst·Wx_i)
    over incoming sources j incl. the default self-loop; concat=False
    averages heads, bias added after the average). PyG itself is not
    installable here; this hand-rolled evaluation is the golden reference."""
    import numpy as np

    from simple_multimodal_tpu.models.fusion import DenseGATLayer

    B, N, F_in, H, C = 2, 3, 5, 2, 4
    rng = np.random.default_rng(42)
    x = rng.standard_normal((B, N, F_in)).astype(np.float32)
    W = rng.standard_normal((F_in, H * C)).astype(np.float32) * 0.5
    att_src = rng.standard_normal((1, H, C)).astype(np.float32)
    att_dst = rng.standard_normal((1, H, C)).astype(np.float32)
    bias = rng.standard_normal((C,)).astype(np.float32)

    def leaky(v, slope=0.2):
        return np.where(v > 0, v, slope * v)

    # independent per-edge evaluation (explicit loops, no einsum sharing)
    expected = np.zeros((B, N, C), np.float32)
    for b in range(B):
        xp = (x[b] @ W).reshape(N, H, C)  # [N, H, C]
        for i in range(N):  # target
            per_head = np.zeros((H, C), np.float32)
            for h in range(H):
                scores = np.array([
                    leaky(float(att_src[0, h] @ xp[j, h])
                          + float(att_dst[0, h] @ xp[i, h]))
                    for j in range(N)  # sources: full graph + self-loop
                ])
                alpha = np.exp(scores - scores.max())
                alpha = alpha / alpha.sum()
                per_head[h] = sum(alpha[j] * xp[j, h] for j in range(N))
            expected[b, i] = per_head.mean(0) + bias

    layer = DenseGATLayer(out_features=C, heads=H, dropout=0.0)
    params = {"params": {"lin": {"kernel": W},
                         "att_src": att_src, "att_dst": att_dst,
                         "bias": bias}}
    got = np.asarray(layer.apply(params, x, deterministic=True))
    np.testing.assert_allclose(got, expected, atol=1e-5, rtol=1e-5)


def test_bf16_mode_close_to_f32(cfg):
    """Mixed-precision mode (bf16 compute, compacted attention scores,
    tanh-gelu) stays finite and within bf16-accumulation distance of the
    f32 logits — guards the compact-before-mask ordering (a -inf rounding
    bug there NaNs padded rows)."""
    import dataclasses as dc

    import jax.numpy as jnp

    from simple_multimodal_tpu.models import MultimodalEmotionModel

    c = dc.replace(cfg)
    c.fusion_type = "early"
    batch = make_batch(c, B=2, seed=21)
    # padded text rows exercise the masked-key path under bf16
    batch["text"]["attention_mask"][1, 8:] = 0
    args = (batch["text"], batch["audio"], batch["video"])

    m32 = MultimodalEmotionModel(c, dtype=jnp.float32)
    m16 = MultimodalEmotionModel(c, dtype=jnp.bfloat16)
    params = jax.jit(m32.init)(jax.random.PRNGKey(0), *args)
    out32 = np.asarray(jax.jit(
        lambda p, t, a, v: m32.apply(p, t, a, v)["emotion_logits"])(params, *args))
    out16 = np.asarray(jax.jit(
        lambda p, t, a, v: m16.apply(p, t, a, v)["emotion_logits"])(params, *args),
        np.float32)
    assert np.isfinite(out16).all()
    assert np.abs(out16 - out32).max() < 0.15, (out16, out32)


def test_use_flash_attention_resolution(monkeypatch):
    """'auto' follows the backend (kernels SPMD-wrap themselves, so the
    mesh no longer matters); explicit strings/bools force."""
    import jax as _jax

    from simple_multimodal_tpu.ops import attention as attn_mod

    class Cfg:
        flash_attention = "auto"
        mesh_shape = (-1, 1)

    monkeypatch.setattr(_jax, "default_backend", lambda: "cpu")
    assert attn_mod.use_flash_attention(Cfg()) is False
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    assert attn_mod.use_flash_attention(Cfg()) is True
    Cfg.mesh_shape = (4, 2)  # multi-chip: auto stays on
    assert attn_mod.use_flash_attention(Cfg()) is True
    Cfg.flash_attention = "true"
    monkeypatch.setattr(_jax, "default_backend", lambda: "cpu")
    assert attn_mod.use_flash_attention(Cfg()) is True
    Cfg.flash_attention = False
    assert attn_mod.use_flash_attention(Cfg()) is False


def test_resolve_remat_auto():
    """"auto" remat turns OFF when the activation estimate fits HBM and
    ON when it would OOM — anchored to the v5e-measured points (off wins
    at batch 8/16, batch 32 OOMs; RESULTS.md round 5). Bools force."""
    from simple_multimodal_tpu.config import ModelConfig
    from simple_multimodal_tpu.models.encoders import resolve_remat

    cfg = ModelConfig()
    assert cfg.remat_encoders == "auto"
    for B, expect in ((8, False), (16, False), (32, True)):
        cfg.batch_size = B
        assert resolve_remat(cfg) is expect, (B, expect)

    cfg.batch_size = 32
    cfg.encoder_preset = "tiny"  # tiny stacks always fit
    assert resolve_remat(cfg) is False

    cfg.remat_encoders = True  # explicit values pass through untouched
    assert resolve_remat(cfg) is True
    cfg.remat_encoders = False
    assert resolve_remat(cfg) is False
    cfg.remat_encoders = "1"  # strings from a JSON round-trip
    assert resolve_remat(cfg) is True
    cfg.remat_encoders = "false"
    assert resolve_remat(cfg) is False
