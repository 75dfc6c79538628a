"""Flash-attention kernel numerics (interpreter mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simple_multimodal_tpu.ops.pallas.flash_attention import flash_attention


def reference_attention(q, k, v, bias=None):
    D = q.shape[-1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(jnp.float32(D))
    if bias is not None:
        s = s + bias
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


@pytest.mark.parametrize("shape", [
    (2, 128, 2, 64),       # aligned
    (1, 197, 4, 64),       # ViT: ragged seq
    (2, 499, 2, 32),       # wav2vec2-ish ragged
])
def test_flash_matches_reference(shape):
    B, S, H, D = shape
    rng = np.random.default_rng(0)
    q = rng.standard_normal((B, S, H, D)).astype(np.float32)
    k = rng.standard_normal((B, S, H, D)).astype(np.float32)
    v = rng.standard_normal((B, S, H, D)).astype(np.float32)
    out = flash_attention(q, k, v, interpret=True)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)


def test_flash_with_bias_and_mask():
    B, S, H, D = 2, 64, 2, 32
    rng = np.random.default_rng(1)
    q = rng.standard_normal((B, S, H, D)).astype(np.float32)
    k = rng.standard_normal((B, S, H, D)).astype(np.float32)
    v = rng.standard_normal((B, S, H, D)).astype(np.float32)
    # additive bias with -inf-style masking of the last 20 keys of item 1
    bias = rng.standard_normal((B, H, S, S)).astype(np.float32) * 0.5
    bias[1, :, :, 44:] = -1e30
    out = flash_attention(q, k, v, bias=bias, block_q=32, block_k=32,
                          interpret=True)
    ref = reference_attention(q, k, v, bias=jnp.asarray(bias))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)


@pytest.mark.parametrize("shape,blocks", [
    ((2, 128, 2, 32), (64, 64)),    # aligned
    ((1, 100, 2, 16), (32, 32)),    # ragged: padded q rows + masked keys
])
def test_flash_grads_match_reference(shape, blocks):
    B, S, H, D = shape
    bq, bk = blocks
    rng = np.random.default_rng(3)
    q = rng.standard_normal((B, S, H, D)).astype(np.float32)
    k = rng.standard_normal((B, S, H, D)).astype(np.float32)
    v = rng.standard_normal((B, S, H, D)).astype(np.float32)
    w = rng.standard_normal((B, S, H, D)).astype(np.float32)  # output weights

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=bq, block_k=bk,
                                       interpret=True) * w)

    def loss_ref(q, k, v):
        return jnp.sum(reference_attention(q, k, v) * w)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-4)


def test_flash_bias_grad_and_broadcast_reduction():
    """dbias flows, including unbroadcasting to a [1, 1, S, S] bias."""
    B, S, H, D = 2, 48, 2, 16
    rng = np.random.default_rng(4)
    q = rng.standard_normal((B, S, H, D)).astype(np.float32)
    k = rng.standard_normal((B, S, H, D)).astype(np.float32)
    v = rng.standard_normal((B, S, H, D)).astype(np.float32)
    bias = (rng.standard_normal((1, 1, S, S)) * 0.5).astype(np.float32)
    w = rng.standard_normal((B, S, H, D)).astype(np.float32)

    def loss_flash(q, k, v, bias):
        return jnp.sum(flash_attention(q, k, v, bias=bias, block_q=16,
                                       block_k=16, interpret=True) * w)

    def loss_ref(q, k, v, bias):
        return jnp.sum(reference_attention(q, k, v, bias=bias) * w)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    assert g_flash[3].shape == bias.shape
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-4)


def test_flash_bf16_forward():
    B, S, H, D = 1, 64, 2, 32
    rng = np.random.default_rng(5)
    q = rng.standard_normal((B, S, H, D)).astype(jnp.bfloat16)
    k = rng.standard_normal((B, S, H, D)).astype(jnp.bfloat16)
    v = rng.standard_normal((B, S, H, D)).astype(jnp.bfloat16)
    out = flash_attention(q, k, v, block_q=32, block_k=32, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = reference_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                              v.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)


def test_deberta_flash_matches_xla():
    """The in-model flash route (engaged for S > 512) reproduces the XLA
    attention numerics, including the fused disentangled bias + mask and the
    pre-folded 1/sqrt(3) scale (interpret mode on CPU)."""
    import dataclasses as dc

    from simple_multimodal_tpu.models.deberta import DebertaConfig, DebertaModel

    cfg = DebertaConfig.tiny()
    S = 576  # beyond the measured flash crossover
    rng = np.random.default_rng(11)
    ids = rng.integers(1, cfg.vocab_size, (2, S)).astype(np.int32)
    mask = np.ones((2, S), np.int32)
    mask[1, 500:] = 0  # exercise the additive -inf key mask through the bias

    m_xla = DebertaModel(dc.replace(cfg, use_flash=False))
    m_fl = DebertaModel(dc.replace(cfg, use_flash=True))
    params = jax.jit(m_xla.init)(jax.random.PRNGKey(0), ids, mask)
    ref = jax.jit(m_xla.apply)(params, ids, mask)
    out = jax.jit(m_fl.apply)(params, ids, mask)
    # compare valid positions only: on fully-masked query rows flash emits
    # zeros while the XLA path averages over finfo.min scores — both are
    # garbage the pooling mask excludes downstream
    valid = np.asarray(mask, bool)
    np.testing.assert_allclose(np.asarray(out)[valid], np.asarray(ref)[valid],
                               atol=2e-4, rtol=2e-3)


@pytest.mark.parametrize("which", ["vit", "wav2vec2"])
def test_encoder_layer_flash_matches_xla_long_seq(which):
    """The ViT / wav2vec2 layer flash routes (engaged for S > 512) match the
    XLA attention numerics (interpret mode on CPU)."""
    import dataclasses as dc

    rng = np.random.default_rng(13)
    S = 576
    if which == "vit":
        from simple_multimodal_tpu.models.vit import ViTConfig, ViTLayer

        cfg = ViTConfig.tiny()
        make = lambda fl: ViTLayer(dc.replace(cfg, use_flash=fl))
        E = cfg.hidden_size
    else:
        from simple_multimodal_tpu.models.wav2vec2 import (
            Wav2Vec2Config,
            Wav2Vec2EncoderLayer,
        )

        cfg = Wav2Vec2Config.tiny()
        make = lambda fl: Wav2Vec2EncoderLayer(dc.replace(cfg, use_flash=fl))
        E = cfg.hidden_size
    x = rng.standard_normal((2, S, E)).astype(np.float32)
    m_xla, m_fl = make(False), make(True)
    params = jax.jit(m_xla.init)(jax.random.PRNGKey(0), x)
    ref = jax.jit(m_xla.apply)(params, x)
    out = jax.jit(m_fl.apply)(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-3)


@pytest.mark.parametrize("shape,span", [
    ((2, 50, 2, 16), 16),      # ragged: padded rows + bucket clipping
    ((1, 128, 4, 32), 32),     # aligned
    ((2, 130, 2, 16), 64),     # span > mid coverage, ragged
])
def test_deberta_fused_attention_matches_dense(shape, span):
    """The fused disentangled-attention kernel reproduces a literal dense
    construction of softmax((QKᵀ + c2p + p2c)/√(3D) + mask)·V built from the
    bucket map directly (interpret mode on CPU)."""
    from simple_multimodal_tpu.models.deberta import log_bucket
    from simple_multimodal_tpu.ops.pallas.deberta_attention import (
        deberta_attention,
    )

    B, S, H, D = shape
    max_pos = 8 * span
    rng = np.random.default_rng(7)
    q = rng.standard_normal((B, S, H, D)).astype(np.float32)
    k = rng.standard_normal((B, S, H, D)).astype(np.float32)
    v = rng.standard_normal((B, S, H, D)).astype(np.float32)
    pos_k = rng.standard_normal((2 * span, H, D)).astype(np.float32)
    pos_q = rng.standard_normal((2 * span, H, D)).astype(np.float32)
    mask = np.ones((B, S), np.int32)
    mask[-1, S - 7 :] = 0

    out = deberta_attention(q, k, v, pos_k.reshape(2 * span, H * D),
                            pos_q.reshape(2 * span, H * D), mask,
                            span=span, max_position=max_pos, interpret=True)

    # literal dense reference (numpy, gathers and all)
    rel = np.arange(S)[:, None] - np.arange(S)[None, :]
    buck = log_bucket(rel, span, max_pos)
    # DeBERTa-v2 convention (HF): c2p[q,k] = q[q]·pos_k[clip(b(q−k)+span)];
    # p2c[q,k] = k[k]·pos_q[clip(b(q−k)+span)] (p2c_pos = clamp(−rel+span)
    # evaluated at [k,q], then transposed — the two signs cancel).
    idx = np.clip(buck + span, 0, 2 * span - 1)            # [S, S]
    s = np.einsum("bqhd,bkhd->bhqk", q, k)
    s = s + np.einsum("bqhd,qkhd->bhqk", q, pos_k[idx])
    s = s + np.einsum("bkhd,qkhd->bhqk", k, pos_q[idx])
    s = s / np.sqrt(3.0 * D)
    s = np.where(mask[:, None, None, :] > 0, s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bkhd->bqhd", p, v)

    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5, rtol=3e-4)


def test_deberta_fused_attention_grads():
    """Grads through the fused kernel (custom VJP → XLA rel-shift reference)
    match autodiff of the dense one-hot formulation."""
    from simple_multimodal_tpu.models.deberta import log_bucket
    from simple_multimodal_tpu.ops.pallas.deberta_attention import (
        deberta_attention,
    )

    # B=2 covers the bwd kernel's table-cotangent accumulation across the
    # batch grid axis (dtc/dtp output blocks revisited per head-group)
    B, S, H, D, span = 2, 40, 2, 16, 16
    max_pos = 128
    rng = np.random.default_rng(8)
    q = rng.standard_normal((B, S, H, D)).astype(np.float32)
    k = rng.standard_normal((B, S, H, D)).astype(np.float32)
    v = rng.standard_normal((B, S, H, D)).astype(np.float32)
    pos_k = rng.standard_normal((2 * span, H, D)).astype(np.float32)
    pos_q = rng.standard_normal((2 * span, H, D)).astype(np.float32)
    mask = np.ones((B, S), np.int32)
    w = rng.standard_normal((B, S, H, D)).astype(np.float32)

    rel = np.arange(S)[:, None] - np.arange(S)[None, :]
    buck = log_bucket(rel, span, max_pos)
    sel = jax.nn.one_hot(np.clip(buck + span, 0, 2 * span - 1), 2 * span)
    c2p_sel = p2c_sel = sel  # both biases select with clip(b(q−k)+span)

    def loss_fused(q, k, v, pos_k, pos_q):
        out = deberta_attention(q, k, v, pos_k, pos_q, mask, span=span,
                                max_position=max_pos, interpret=True)
        return jnp.sum(out * w)

    def loss_ref(q, k, v, pos_k, pos_q):
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        s = s + jnp.einsum("bqhd,qkp,phd->bhqk", q, c2p_sel, pos_k)
        s = s + jnp.einsum("bkhd,qkp,phd->bhqk", k, p2c_sel, pos_q)
        p = jax.nn.softmax(s / jnp.sqrt(3.0 * D), axis=-1)
        return jnp.sum(jnp.einsum("bhqk,bkhd->bqhd", p, v) * w)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(q, k, v, pos_k, pos_q)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, pos_k, pos_q)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-4)


def test_deberta_model_fused_vs_onehot_path():
    """DebertaModel with the fused kernel engaged (use_flash) matches the
    one-hot XLA path at a reference-like (short) length, valid rows only."""
    import dataclasses as dc

    from simple_multimodal_tpu.models.deberta import DebertaConfig, DebertaModel

    cfg = DebertaConfig.tiny()
    S = 48
    rng = np.random.default_rng(9)
    ids = rng.integers(1, cfg.vocab_size, (2, S)).astype(np.int32)
    mask = np.ones((2, S), np.int32)
    mask[1, 40:] = 0

    m_xla = DebertaModel(dc.replace(cfg, use_flash=False))
    m_fused = DebertaModel(dc.replace(cfg, use_flash=True))
    params = jax.jit(m_xla.init)(jax.random.PRNGKey(0), ids, mask)
    ref = jax.jit(m_xla.apply)(params, ids, mask)
    out = jax.jit(m_fused.apply)(params, ids, mask)
    valid = np.asarray(mask, bool)
    np.testing.assert_allclose(np.asarray(out)[valid], np.asarray(ref)[valid],
                               atol=2e-4, rtol=2e-3)


def _block_args(B, S, H, D, seed=21):
    E = H * D
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((B, S, E)).astype(np.float32)
    ws = [(rng.standard_normal((E, E)) * 0.1).astype(np.float32)
          for _ in range(4)]
    bs = [(rng.standard_normal((E,)) * 0.1).astype(np.float32)
          for _ in range(4)]
    return x, ws, bs


def _block_reference(x, ws, bs, H):
    B, S, E = x.shape
    D = E // H
    q = (x @ ws[0] + bs[0]).reshape(B, S, H, D)
    k = (x @ ws[1] + bs[1]).reshape(B, S, H, D)
    v = (x @ ws[2] + bs[2]).reshape(B, S, H, D)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(D)
    p = jax.nn.softmax(s, axis=-1)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, S, E)
    return ctx @ ws[3] + bs[3]


@pytest.mark.parametrize("shape", [
    (2, 128, 2, 32),      # aligned
    (3, 197, 4, 16),      # ViT length: ragged lane padding
    (1, 250, 2, 16),      # wav2vec2-ish length
])
def test_attention_block_matches_reference(shape):
    """The fused qkv+attention+out-proj block kernel (masked-pair head
    separation) reproduces the einsum attention block."""
    from simple_multimodal_tpu.ops.pallas.attention_block import (
        attention_block,
    )

    B, S, H, D = shape
    x, ws, bs = _block_args(B, S, H, D)
    out = attention_block(x, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2],
                          ws[3], bs[3], num_heads=H, interpret=True)
    ref = _block_reference(x, ws, bs, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-4)


def test_attention_block_grads():
    from simple_multimodal_tpu.ops.pallas.attention_block import (
        attention_block,
    )

    B, S, H, D = 1, 150, 2, 16  # ragged: exercises the pad-trim VJP
    x, ws, bs = _block_args(B, S, H, D, seed=22)
    w_out = np.random.default_rng(23).standard_normal(x.shape).astype(np.float32)

    def loss_fused(x, *wb):
        out = attention_block(x, wb[0], wb[4], wb[1], wb[5], wb[2], wb[6],
                              wb[3], wb[7], num_heads=H, interpret=True)
        return jnp.sum(out * w_out)

    def loss_ref(x, *wb):
        return jnp.sum(_block_reference(x, wb[:4], wb[4:], H) * w_out)

    args = (x, *ws, *bs)
    g_fused = jax.grad(loss_fused, argnums=tuple(range(9)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(9)))(*args)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a).reshape(np.asarray(b).shape),
                                   np.asarray(b), atol=5e-5, rtol=5e-4)


@pytest.mark.parametrize("which", ["vit", "wav2vec2"])
def test_encoder_layer_plain_fused_matches_xla_short_seq(which):
    """At the real encoder lengths (ViT 197 / wav2vec2 499-ish) the
    layout-preserving fused kernel must match the XLA einsum layer."""
    import dataclasses as dc

    rng = np.random.default_rng(23)
    if which == "vit":
        from simple_multimodal_tpu.models.vit import ViTConfig, ViTLayer

        cfg = ViTConfig.tiny()
        S = 197
        make = lambda fl: ViTLayer(dc.replace(cfg, use_flash=fl))
        E = cfg.hidden_size
    else:
        from simple_multimodal_tpu.models.wav2vec2 import (
            Wav2Vec2Config,
            Wav2Vec2EncoderLayer,
        )

        cfg = Wav2Vec2Config.tiny()
        S = 250
        make = lambda fl: Wav2Vec2EncoderLayer(dc.replace(cfg, use_flash=fl))
        E = cfg.hidden_size
    x = rng.standard_normal((2, S, E)).astype(np.float32)
    m_xla, m_fl = make(False), make(True)
    params = jax.jit(m_xla.init)(jax.random.PRNGKey(0), x)
    ref = jax.jit(m_xla.apply)(params, x)
    out = jax.jit(m_fl.apply)(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-3)


def test_mha_plain_fused_matches_einsum():
    """MultiHeadAttention routes through the fused kernel when weights are
    not requested; outputs must match the einsum path."""
    from simple_multimodal_tpu.ops.attention import MultiHeadAttention

    rng = np.random.default_rng(24)
    x = rng.standard_normal((2, 197, 32)).astype(np.float32)
    m_xla = MultiHeadAttention(32, 4, 0.0, use_flash=False)
    m_fl = MultiHeadAttention(32, 4, 0.0, use_flash=True)
    params = jax.jit(m_xla.init)(jax.random.PRNGKey(0), x, x, x)
    ref, _ = jax.jit(lambda p: m_xla.apply(p, x, x, x, need_weights=False))(params)
    out, _ = jax.jit(lambda p: m_fl.apply(p, x, x, x, need_weights=False))(params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-3)


def test_flash_cross_attention_lengths():
    B, Sq, Sk, H, D = 1, 30, 130, 2, 16
    rng = np.random.default_rng(2)
    q = rng.standard_normal((B, Sq, H, D)).astype(np.float32)
    k = rng.standard_normal((B, Sk, H, D)).astype(np.float32)
    v = rng.standard_normal((B, Sk, H, D)).astype(np.float32)
    out = flash_attention(q, k, v, block_q=16, block_k=64, interpret=True)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)


def test_attention_block_fused_ln_residual():
    """ln=(g,b,eps) + residual=True computes x + proj(attn(LN(x))) — the
    whole pre-LN attention sub-block (ViTLayer's fused route) — matching
    the unfused composition, forward and grads."""
    from simple_multimodal_tpu.ops.pallas.attention_block import (
        attention_block,
    )

    B, S, H, D = 2, 197, 4, 16
    E = H * D
    x, ws, bs = _block_args(B, S, H, D, seed=31)
    rng = np.random.default_rng(32)
    g = (1.0 + 0.1 * rng.standard_normal(E)).astype(np.float32)
    b = (0.1 * rng.standard_normal(E)).astype(np.float32)
    eps = 1e-12

    def unfused(x, g, b, *wb):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        xn = (x - mu) * jax.lax.rsqrt(var + eps) * g + b
        return x + _block_reference(xn, wb[:4], wb[4:], H)

    def fused(x, g, b, *wb):
        return attention_block(x, wb[0], wb[4], wb[1], wb[5], wb[2], wb[6],
                               wb[3], wb[7], num_heads=H, interpret=True,
                               ln=(g, b, eps), residual=True)

    args = (x, g, b, *ws, *bs)
    out_f = fused(*args)
    out_u = unfused(*args)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                               atol=5e-5, rtol=5e-4)

    w_out = rng.standard_normal(x.shape).astype(np.float32)
    gf = jax.grad(lambda *a: jnp.sum(fused(*a) * w_out),
                  argnums=(0, 1, 2, 3, 7))(*args)
    gu = jax.grad(lambda *a: jnp.sum(unfused(*a) * w_out),
                  argnums=(0, 1, 2, 3, 7))(*args)
    for a, e in zip(gf, gu):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   atol=2e-4, rtol=2e-3)


def test_deberta_fused_dropout_matches_hash_reference():
    """In-kernel stateless attention dropout (interpret mode) is
    elementwise-identical to the XLA reference evaluating the same
    (seed, head, q, k) hash, and its drop fraction matches the rate."""
    from simple_multimodal_tpu.ops.pallas import deberta_attention as da

    B, S, H, D, span = 2, 40, 2, 16, 16
    max_pos = 128
    rate, seed = 0.25, 12345
    rng = np.random.default_rng(11)
    q = rng.standard_normal((B, S, H, D)).astype(np.float32)
    k = rng.standard_normal((B, S, H, D)).astype(np.float32)
    v = rng.standard_normal((B, S, H, D)).astype(np.float32)
    pos_k = rng.standard_normal((2 * span, H, D)).astype(np.float32)
    pos_q = rng.standard_normal((2 * span, H, D)).astype(np.float32)
    mask = np.ones((B, S), np.int32)
    mask[-1, S - 5 :] = 0

    out = da.deberta_attention(q, k, v, pos_k, pos_q, mask, span=span,
                               max_position=max_pos, interpret=True,
                               dropout_rate=rate,
                               dropout_seed=jnp.int32(seed))

    # reference: same padding pipeline, XLA path with the same hash
    Sp = da._round_up(max(S, da._QBLOCK), da._QBLOCK)
    pad = Sp - S
    qp = jnp.swapaxes(jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0))), 1, 2)
    kp = jnp.swapaxes(jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0))), 1, 2)
    vp = jnp.swapaxes(jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0))), 1, 2)
    mp = jnp.pad(jnp.asarray(mask), ((0, 0), (0, pad)))
    tc, tp_ = da.build_rel_tables(jnp.asarray(pos_k), jnp.asarray(pos_q),
                                  Sp, Sp, span, max_pos)
    ref = da._xla_reference(qp, kp, vp, tc, tp_, mp,
                            float(1.0 / np.sqrt(3.0 * D)),
                            jnp.full((1,), seed, jnp.int32), rate)
    ref = jnp.swapaxes(ref[:, :, :S, :], 1, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=3e-4)

    # statistics: the keep mask drops ~rate of entries
    u32 = jnp.uint32
    hb = jax.lax.broadcasted_iota(u32, (B, H, Sp, Sp), 0)
    hh = jax.lax.broadcasted_iota(u32, (B, H, Sp, Sp), 1)
    hq = jax.lax.broadcasted_iota(u32, (B, H, Sp, Sp), 2)
    hk = jax.lax.broadcasted_iota(u32, (B, H, Sp, Sp), 3)
    keep = da._hash_keep(u32(seed), hb * np.uint32(H) + hh, hq, hk, rate)
    frac = float(jnp.mean(keep.astype(jnp.float32)))
    assert abs(frac - (1 - rate)) < 0.01


def test_deberta_fused_dropout_grads_match_hash_reference():
    """Backward through the in-kernel dropout (mask regenerated from the
    hash, never stored) matches autodiff of the XLA hash-dropout path."""
    from simple_multimodal_tpu.ops.pallas import deberta_attention as da

    B, S, H, D, span = 1, 40, 2, 16, 16
    max_pos = 128
    rate, seed = 0.2, 777
    rng = np.random.default_rng(12)
    q = rng.standard_normal((B, S, H, D)).astype(np.float32)
    k = rng.standard_normal((B, S, H, D)).astype(np.float32)
    v = rng.standard_normal((B, S, H, D)).astype(np.float32)
    pos_k = rng.standard_normal((2 * span, H, D)).astype(np.float32)
    pos_q = rng.standard_normal((2 * span, H, D)).astype(np.float32)
    mask = np.ones((B, S), np.int32)
    w = rng.standard_normal((B, S, H, D)).astype(np.float32)

    def loss_fused(q, k, v, pos_k, pos_q):
        out = da.deberta_attention(q, k, v, pos_k, pos_q, mask, span=span,
                                   max_position=max_pos, interpret=True,
                                   dropout_rate=rate,
                                   dropout_seed=jnp.int32(seed))
        return jnp.sum(out * w)

    Sp = da._round_up(max(S, da._QBLOCK), da._QBLOCK)
    pad = Sp - S
    mp = jnp.pad(jnp.asarray(mask), ((0, 0), (0, pad)))
    seed_arr = jnp.full((1,), seed, jnp.int32)

    def loss_ref(q, k, v, pos_k, pos_q):
        qp = jnp.swapaxes(jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0))), 1, 2)
        kp = jnp.swapaxes(jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0))), 1, 2)
        vp = jnp.swapaxes(jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0))), 1, 2)
        tc, tp_ = da.build_rel_tables(pos_k, pos_q, Sp, Sp, span, max_pos)
        out = da._xla_reference(qp, kp, vp, tc, tp_, mp,
                                float(1.0 / np.sqrt(3.0 * D)), seed_arr, rate)
        return jnp.sum(jnp.swapaxes(out[:, :, :S, :], 1, 2) * w)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(q, k, v, pos_k, pos_q)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, pos_k, pos_q)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-4)


def test_deberta_model_training_mode_fused_grads_finite():
    """DebertaModel in training mode (dropout active) engages the fused
    kernel and produces finite grads through the in-kernel dropout."""
    import dataclasses as dc

    from simple_multimodal_tpu.models.deberta import DebertaConfig, DebertaModel

    cfg = DebertaConfig.tiny()
    cfg = dc.replace(cfg, use_flash=True, attention_dropout=0.3,
                     hidden_dropout=0.1)
    model = DebertaModel(cfg)
    ids = np.array([[5, 9, 2, 7, 1, 3, 8, 4] * 3], np.int32)
    mask = np.ones_like(ids)
    params = model.init(jax.random.PRNGKey(0), ids, mask)

    def loss(p, rng):
        h = model.apply(p, ids, mask, deterministic=False,
                        rngs={"dropout": rng})
        return jnp.sum(h.astype(jnp.float32) ** 2)

    val, grads = jax.value_and_grad(loss)(params, jax.random.PRNGKey(1))
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    # a different dropout RNG must change the loss (dropout is live)
    val2 = loss(params, jax.random.PRNGKey(2))
    assert float(val) != float(val2)


def test_attention_block_dropout_matches_hash_reference():
    """In-kernel attention dropout in the block kernel (interpret mode) is
    elementwise-identical to the XLA reference evaluating the same
    (seed, head, q, k) hash; drop fraction tracks the rate."""
    from simple_multimodal_tpu.ops.pallas import attention_block as ab

    B, S, H, D = 2, 150, 2, 16
    E = H * D
    rate, seed = 0.3, 4242
    x, ws, bs = _block_args(B, S, H, D, seed=31)

    out = ab.attention_block(x, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2],
                             ws[3], bs[3], num_heads=H, interpret=True,
                             dropout_rate=rate,
                             dropout_seed=jnp.int32(seed))
    ref = ab._xla_reference(x, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2],
                            ws[3], bs[3], num_heads=H,
                            seed=jnp.full((1,), seed, jnp.int32), rate=rate)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-4)

    # dropping is live and ~rate of probs are zeroed: compare against the
    # no-dropout output
    out0 = ab.attention_block(x, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2],
                              ws[3], bs[3], num_heads=H, interpret=True)
    assert float(jnp.max(jnp.abs(out - out0))) > 1e-3


def test_attention_block_dropout_grads_match_hash_reference():
    from simple_multimodal_tpu.ops.pallas import attention_block as ab

    B, S, H, D = 2, 150, 2, 16
    rate, seed = 0.2, 99
    x, ws, bs = _block_args(B, S, H, D, seed=32)
    w_out = np.random.default_rng(33).standard_normal(x.shape).astype(
        np.float32)
    seed_arr = jnp.full((1,), seed, jnp.int32)

    def loss_fused(x, *wb):
        out = ab.attention_block(x, wb[0], wb[4], wb[1], wb[5], wb[2],
                                 wb[6], wb[3], wb[7], num_heads=H,
                                 interpret=True, dropout_rate=rate,
                                 dropout_seed=jnp.int32(seed))
        return jnp.sum(out * w_out)

    def loss_ref(x, *wb):
        out = ab._xla_reference(x, wb[0], wb[4], wb[1], wb[5], wb[2],
                                wb[6], wb[3], wb[7], num_heads=H,
                                seed=seed_arr, rate=rate)
        return jnp.sum(out * w_out)

    args = (x, *ws, *bs)
    g_fused = jax.grad(loss_fused, argnums=tuple(range(9)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(9)))(*args)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a).reshape(np.asarray(b).shape),
                                   np.asarray(b), atol=5e-5, rtol=5e-4)


def test_wav2vec2_layer_training_mode_fused_grads_finite():
    """Wav2Vec2 encoder layer in training mode (attention dropout 0.1)
    engages the fused block kernel and yields finite, dropout-sensitive
    grads through the in-kernel hash dropout."""
    import dataclasses as dc

    from simple_multimodal_tpu.models.wav2vec2 import (
        Wav2Vec2Config, Wav2Vec2EncoderLayer,
    )

    cfg = dc.replace(Wav2Vec2Config.tiny(), use_flash=True,
                     attention_dropout=0.3, hidden_dropout=0.0)
    layer = Wav2Vec2EncoderLayer(cfg)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 150, cfg.hidden_size)).astype(np.float32)
    params = layer.init(jax.random.PRNGKey(0), x)

    def loss(p, key):
        out = layer.apply(p, x, deterministic=False,
                          rngs={"dropout": key})
        w = jax.random.normal(jax.random.PRNGKey(9), out.shape)
        return jnp.sum(out.astype(jnp.float32) * w)

    val, grads = jax.value_and_grad(loss)(params, jax.random.PRNGKey(1))
    assert np.isfinite(float(val))
    assert all(bool(jnp.all(jnp.isfinite(l)))
               for l in jax.tree_util.tree_leaves(grads))
    val2 = loss(params, jax.random.PRNGKey(2))
    assert float(val) != float(val2)


@pytest.mark.parametrize("ln_mode", ["pre", "post", "none"])
def test_ffn_block_matches_reference(ln_mode):
    """The fused FFN kernel (matmul→GELU→matmul with the [S, F]
    intermediate resident in VMEM) reproduces the XLA composition in all
    three LayerNorm placements (interpret mode on CPU)."""
    from simple_multimodal_tpu.ops.pallas import ffn_block as fb

    B, S, E, F = 2, 150, 32, 128
    rng = np.random.default_rng(41)
    x = rng.standard_normal((B, S, E)).astype(np.float32)
    w1 = (rng.standard_normal((E, F)) * 0.1).astype(np.float32)
    b1 = (rng.standard_normal((F,)) * 0.1).astype(np.float32)
    w2 = (rng.standard_normal((F, E)) * 0.1).astype(np.float32)
    b2 = (rng.standard_normal((E,)) * 0.1).astype(np.float32)
    g = rng.standard_normal((E,)).astype(np.float32)
    b = rng.standard_normal((E,)).astype(np.float32)
    ln = None if ln_mode == "none" else (g, b, 1e-7)
    ln_post = ln_mode == "post"

    out = fb.ffn_block(x, w1, b1, w2, b2, ln=ln, ln_post=ln_post,
                       residual=True, interpret=True)
    ref = fb._xla_reference(x, w1, b1, w2, b2, ln=ln, ln_post=ln_post,
                            residual=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-4)


def test_ffn_block_grads(monkeypatch):
    from simple_multimodal_tpu.ops.pallas import ffn_block as fb

    monkeypatch.setenv("SMM_FFN_BWD", "1")  # Pallas bwd is opt-in (r5 A/B)
    jax.clear_caches()
    B, S, E, F = 1, 130, 32, 64  # ragged rows exercise the pad-trim VJP
    rng = np.random.default_rng(42)
    x = rng.standard_normal((B, S, E)).astype(np.float32)
    w1 = (rng.standard_normal((E, F)) * 0.1).astype(np.float32)
    b1 = (rng.standard_normal((F,)) * 0.1).astype(np.float32)
    w2 = (rng.standard_normal((F, E)) * 0.1).astype(np.float32)
    b2 = (rng.standard_normal((E,)) * 0.1).astype(np.float32)
    g = rng.standard_normal((E,)).astype(np.float32)
    b = rng.standard_normal((E,)).astype(np.float32)
    w_out = rng.standard_normal(x.shape).astype(np.float32)

    def loss_fused(x, w1, b1, w2, b2, g, b):
        out = fb.ffn_block(x, w1, b1, w2, b2, ln=(g, b, 1e-7),
                           ln_post=True, residual=True, interpret=True)
        return jnp.sum(out * w_out)

    def loss_ref(x, w1, b1, w2, b2, g, b):
        out = fb._xla_reference(x, w1, b1, w2, b2, ln=(g, b, 1e-7),
                                ln_post=True, residual=True)
        return jnp.sum(out * w_out)

    args = (x, w1, b1, w2, b2, g, b)
    gf = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for a, e in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a).reshape(np.asarray(e).shape),
                                   np.asarray(e), atol=5e-5, rtol=5e-4)


def test_ffn_block_dropout_matches_hash_reference():
    """In-kernel hidden dropout (intermediate + output draws) in the FFN
    kernel is elementwise-identical to the XLA hash reference, fwd and
    grads (interpret mode)."""
    from simple_multimodal_tpu.ops.pallas import ffn_block as fb

    B, S, E, F = 2, 140, 32, 64
    r_mid, r_out, seed = 0.25, 0.1, 321
    rng = np.random.default_rng(43)
    x = rng.standard_normal((B, S, E)).astype(np.float32)
    w1 = (rng.standard_normal((E, F)) * 0.1).astype(np.float32)
    b1 = (rng.standard_normal((F,)) * 0.1).astype(np.float32)
    w2 = (rng.standard_normal((F, E)) * 0.1).astype(np.float32)
    b2 = (rng.standard_normal((E,)) * 0.1).astype(np.float32)
    g = rng.standard_normal((E,)).astype(np.float32)
    b = rng.standard_normal((E,)).astype(np.float32)
    seed_arr = jnp.full((1,), seed, jnp.int32)
    w_out = rng.standard_normal(x.shape).astype(np.float32)

    def f_fused(x, w1, b1, w2, b2, g, b):
        return fb.ffn_block(x, w1, b1, w2, b2, ln=(g, b, 1e-7),
                            ln_post=True, residual=True, interpret=True,
                            dropout_rate_mid=r_mid, dropout_rate_out=r_out,
                            dropout_seed=jnp.int32(seed))

    def f_ref(x, w1, b1, w2, b2, g, b):
        return fb._xla_reference(x, w1, b1, w2, b2, ln=(g, b, 1e-7),
                                 ln_post=True, residual=True,
                                 seed=seed_arr, rate_mid=r_mid,
                                 rate_out=r_out)

    args = (x, w1, b1, w2, b2, g, b)
    np.testing.assert_allclose(np.asarray(f_fused(*args)),
                               np.asarray(f_ref(*args)),
                               atol=5e-5, rtol=5e-4)
    # dropout is live
    ref0 = fb._xla_reference(x, w1, b1, w2, b2, ln=(g, b, 1e-7),
                             ln_post=True, residual=True)
    assert float(jnp.max(jnp.abs(f_fused(*args) - ref0))) > 1e-3

    gf = jax.grad(lambda *a: jnp.sum(f_fused(*a) * w_out),
                  argnums=tuple(range(7)))(*args)
    gr = jax.grad(lambda *a: jnp.sum(f_ref(*a) * w_out),
                  argnums=tuple(range(7)))(*args)
    for a, e in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a).reshape(np.asarray(e).shape),
                                   np.asarray(e), atol=5e-5, rtol=5e-4)


# ---- stateless hash dropout: statistical validation ------------------------
# The in-kernel dropout replaces the reference's PRNG dropout in TRAINING
# (/root/reference/models/encoders.py dropout modules); a biased or
# correlated mask would silently change regularization. These check that
# `_hash_keep` is Bernoulli-like: keep-rate inside a binomial CI, no
# autocorrelation along any index axis, and decorrelation across the
# per-shard seed offsets used by the SPMD wrappers.


def _keep_mask(seed, head, nq, nk, rate):
    from simple_multimodal_tpu.ops.pallas.deberta_attention import _hash_keep

    q = jax.lax.broadcasted_iota(jnp.uint32, (nq, nk), 0)
    k = jax.lax.broadcasted_iota(jnp.uint32, (nq, nk), 1)
    return np.asarray(_hash_keep(jnp.uint32(seed), jnp.uint32(head),
                                 q, k, rate))


def test_hash_dropout_keep_rate_binomial_ci():
    rate = 0.1
    for seed, head in ((0, 0), (12345, 3), (2**31 - 1, 11)):
        m = _keep_mask(seed, head, 512, 512, rate)
        n = m.size
        p_hat = m.mean()
        sigma = np.sqrt(rate * (1 - rate) / n)  # ≈ 5.9e-4 at n = 512²
        assert abs(p_hat - (1 - rate)) < 6 * sigma, (seed, head, p_hat)


def test_hash_dropout_no_autocorrelation():
    """Lag-1..4 autocorrelation along q, k, head, and seed axes must be
    noise-level (|r| ≲ 5/√n for ±1-coded Bernoulli)."""
    rate = 0.1

    def corr(a, b):
        a = a.astype(np.float64) - a.mean()
        b = b.astype(np.float64) - b.mean()
        d = np.sqrt((a * a).sum() * (b * b).sum())
        return float((a * b).sum() / d) if d else 0.0

    m = _keep_mask(7, 2, 512, 512, rate)
    bound = 5.0 / np.sqrt(m[:-4].size)
    for lag in (1, 2, 3, 4):
        assert abs(corr(m[lag:], m[:-lag])) < bound          # along q
        assert abs(corr(m[:, lag:], m[:, :-lag])) < bound    # along k
    # along head and seed: same (q, k) grid, adjacent head/seed values
    heads = [_keep_mask(7, h, 256, 256, rate) for h in range(4)]
    seeds = [_keep_mask(s, 2, 256, 256, rate) for s in range(4)]
    bound = 5.0 / np.sqrt(heads[0].size)
    for a, b in zip(heads[1:], heads[:-1]):
        assert abs(corr(a, b)) < bound
    for a, b in zip(seeds[1:], seeds[:-1]):
        assert abs(corr(a, b)) < bound


def test_hash_dropout_cross_shard_decorrelation():
    """The SPMD wrappers offset the seed by axis_index·1000003 (data) and
    axis_index·7919 (model); masks under offset seeds must agree at the
    independent-Bernoulli rate p² + (1-p)², not above it (no lattice)."""
    rate = 0.1
    p = 1 - rate
    expect = p * p + rate * rate
    base = 424242
    m0 = _keep_mask(base, 5, 512, 512, rate)
    n = m0.size
    sigma = np.sqrt(expect * (1 - expect) / n)
    for off in (1000003, 2 * 1000003, 7919, 3 * 7919, 1000003 + 7919):
        m1 = _keep_mask((base + off) & 0xFFFFFFFF, 5, 512, 512, rate)
        agree = (m0 == m1).mean()
        assert abs(agree - expect) < 6 * sigma, (off, agree)


def test_hash_dropout_row_column_balance():
    """No row or column of the mask may be systematically starved: each
    row/column keep-count stays within a 6σ binomial band (512 draws)."""
    rate = 0.1
    m = _keep_mask(99, 1, 512, 512, rate)
    sigma = np.sqrt(rate * (1 - rate) * 512)
    lo, hi = 512 * (1 - rate) - 6 * sigma, 512 * (1 - rate) + 6 * sigma
    rows = m.sum(axis=1)
    cols = m.sum(axis=0)
    assert rows.min() >= lo and rows.max() <= hi
    assert cols.min() >= lo and cols.max() <= hi


# ---------------------------------------------------------------------------
# wav_frontend: fused conv_0 + GroupNorm + GELU (default-off: measured loss
# on v5e, kept gated — see ops/pallas/wav_frontend.py and RESULTS.md r4)
# ---------------------------------------------------------------------------


def _wf_inputs(B=2, T=4003, K=10, C=512, s=5, dtype=jnp.bfloat16, seed=0):
    rng = np.random.default_rng(seed)
    wav = jnp.asarray(rng.standard_normal((B, T)) * 0.3, jnp.float32)
    kern = jnp.asarray(rng.standard_normal((K, 1, C)) * 0.1, dtype)
    g = jnp.asarray(rng.standard_normal(C) * 0.2 + 1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
    return wav, kern, g, b, s


@pytest.mark.parametrize("T", [4003, 2560, 645])
def test_wav_frontend_matches_xla_reference(T):
    from simple_multimodal_tpu.ops.pallas.wav_frontend import (
        _xla_reference, wav_frontend,
    )

    wav, kern, g, b, s = _wf_inputs(T=T)
    out = jax.jit(lambda *a: wav_frontend(*a, stride=s))(wav, kern, g, b)
    ref = _xla_reference(wav, kern, g, b, s, 1e-5, True, jnp.bfloat16)
    assert out.shape == ref.shape == (2, (T - 10) // s + 1, 512)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    assert err < 2e-2, err  # bf16 rounding only


def test_wav_frontend_grads_match_reference():
    """The custom VJP routes through the XLA reference; grads must agree
    exactly. Weighted-sum loss (CLAUDE.md: never sum-of-squares after a
    normalization layer)."""
    from simple_multimodal_tpu.ops.pallas.wav_frontend import (
        _xla_reference, wav_frontend,
    )

    wav, kern, g, b, s = _wf_inputs(T=1285)
    rng = np.random.default_rng(1)
    T1 = (1285 - 10) // s + 1
    w = jnp.asarray(rng.standard_normal((2, T1, 512)), jnp.float32)

    def loss_fused(wav, kern, g, b):
        return jnp.sum(
            wav_frontend(wav, kern, g, b, stride=s).astype(jnp.float32) * w)

    def loss_ref(wav, kern, g, b):
        return jnp.sum(
            _xla_reference(wav, kern, g, b, s, 1e-5, True,
                           jnp.bfloat16).astype(jnp.float32) * w)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(wav, kern, g, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(wav, kern, g, b)
    for a, r in zip(gf, gr):
        assert float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                     - r.astype(jnp.float32)))) == 0.0


def test_wav_frontend_feature_encoder_integration(monkeypatch):
    """Forced on (SMM_WAV_FRONTEND=1), the fused FeatureEncoder produces
    the same param tree and matching outputs vs the unfused one."""
    import dataclasses

    from simple_multimodal_tpu.models.wav2vec2 import (
        FeatureEncoder, Wav2Vec2Config,
    )

    monkeypatch.setenv("SMM_WAV_FRONTEND", "1")
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((2, 16000)) * 0.3, jnp.float32)
    fe_x = FeatureEncoder(
        dataclasses.replace(Wav2Vec2Config.base(), use_flash=False),
        dtype=jnp.bfloat16)
    fe_f = FeatureEncoder(
        dataclasses.replace(Wav2Vec2Config.base(), use_flash=True),
        dtype=jnp.bfloat16)
    p = jax.jit(fe_x.init)(jax.random.PRNGKey(0), wav)
    pf = jax.jit(fe_f.init)(jax.random.PRNGKey(0), wav)
    assert (jax.tree_util.tree_structure(p)
            == jax.tree_util.tree_structure(pf))
    ox = jax.jit(fe_x.apply)(p, wav)
    of = jax.jit(fe_f.apply)(p, wav)
    assert float(jnp.max(jnp.abs(ox.astype(jnp.float32)
                                 - of.astype(jnp.float32)))) < 2e-3


def test_flash_bwd_bias_blocks_fit_vmem():
    """The backward's bias-family tiles (dq: bias-in + dbias-out, both
    double-buffered = 16·G·bq·Sk bytes; dkv: bias-in = 8·G·Sq·bk) must fit
    the calibrated budget at every engaged length — the S=2048 compile
    failure this guards against hit 17.25 MB vs the 16 MB scoped limit."""
    from simple_multimodal_tpu.ops.pallas.flash_attention import (
        _bwd_bias_blocks,
    )

    budget = 8 * 1024 * 1024
    for S in (512, 1024, 2048, 4096, 8192):
        for G in (1, 2):
            bq, bk = _bwd_bias_blocks(512, 512, G, S, S)
            assert S % bq == 0 and S % bk == 0, (S, G, bq, bk)
            assert bq >= 128 and bk >= 128
            if 16 * G * 128 * S <= budget:  # fit is achievable at all
                assert 16 * G * bq * S <= budget, (S, G, bq)
            if 8 * G * S * 128 <= budget:
                assert 8 * G * S * bk <= budget, (S, G, bk)
    # the observed failure shape: S=2048, G=1, default 512 blocks
    bq, bk = _bwd_bias_blocks(512, 512, 1, 2048, 2048)
    assert bq == 256 and 16 * bq * 2048 <= budget


def test_flash_attention_train_gate_resolution(monkeypatch):
    """flash_attention_train: 'auto' follows the eval gate; explicit
    values force independently (the train-step A/B knob, RESULTS.md r4).
    On the CPU backend 'auto' resolves False for both modes."""
    from types import SimpleNamespace

    from simple_multimodal_tpu.ops.attention import use_flash_attention

    def cfg(fa, fat):
        return SimpleNamespace(flash_attention=fa, flash_attention_train=fat)

    # auto on CPU: off for eval, and train follows eval
    assert use_flash_attention(cfg("auto", "auto")) is False
    assert use_flash_attention(cfg("auto", "auto"), train=True) is False
    # forced eval engagement propagates to an auto train gate
    assert use_flash_attention(cfg(True, "auto")) is True
    assert use_flash_attention(cfg(True, "auto"), train=True) is True
    # train forces independently of eval, both directions
    assert use_flash_attention(cfg(True, "false"), train=True) is False
    assert use_flash_attention(cfg(False, "true"), train=True) is True
    assert use_flash_attention(cfg(True, False), train=True) is False
    # string forms accepted (CLI round-trip)
    assert use_flash_attention(cfg("true", "auto")) is True
    assert use_flash_attention(cfg("false", "1"), train=True) is True


def test_force_xla_bwd_env_knob(monkeypatch):
    from simple_multimodal_tpu.ops.pallas.deberta_attention import (
        _force_xla_bwd,
    )

    monkeypatch.delenv("SMM_PALLAS_BWD", raising=False)
    assert _force_xla_bwd() is False
    monkeypatch.setenv("SMM_PALLAS_BWD", "0")
    assert _force_xla_bwd() is True
    monkeypatch.setenv("SMM_PALLAS_BWD", "1")
    assert _force_xla_bwd() is False

@pytest.mark.parametrize("ln_mode", ["pre", "none"])
def test_ffn_block_grads_pre_ln_and_bare(ln_mode, monkeypatch):
    """The dedicated Pallas FFN backward matches the reference vjp in the
    pre-LN (ViT hot path) and bare placements, with both dropout draws
    live (weighted-sum loss — never sum-of-squares through an LN tail)."""
    from simple_multimodal_tpu.ops.pallas import ffn_block as fb

    monkeypatch.setenv("SMM_FFN_BWD", "1")  # Pallas bwd is opt-in (r5 A/B)
    jax.clear_caches()
    B, S, E, F = 2, 130, 32, 64  # ragged rows exercise the pad-trim VJP
    rng = np.random.default_rng(52)
    x = rng.standard_normal((B, S, E)).astype(np.float32)
    w1 = (rng.standard_normal((E, F)) * 0.1).astype(np.float32)
    b1 = (rng.standard_normal((F,)) * 0.1).astype(np.float32)
    w2 = (rng.standard_normal((F, E)) * 0.1).astype(np.float32)
    b2 = (rng.standard_normal((E,)) * 0.1).astype(np.float32)
    g = rng.standard_normal((E,)).astype(np.float32)
    b = rng.standard_normal((E,)).astype(np.float32)
    w_out = rng.standard_normal(x.shape).astype(np.float32)
    ln = (g, b, 1e-7) if ln_mode == "pre" else None
    seed_arr = jnp.full((1,), 77, jnp.int32)
    r_mid, r_out = 0.2, 0.15

    def loss_fused(x, w1, b1, w2, b2, g, b):
        out = fb.ffn_block(x, w1, b1, w2, b2,
                           ln=None if ln is None else (g, b, 1e-7),
                           ln_post=False, residual=True, interpret=True,
                           dropout_rate_mid=r_mid, dropout_rate_out=r_out,
                           dropout_seed=jnp.int32(77))
        return jnp.sum(out * w_out)

    def loss_ref(x, w1, b1, w2, b2, g, b):
        out = fb._xla_reference(x, w1, b1, w2, b2,
                                ln=None if ln is None else (g, b, 1e-7),
                                ln_post=False, residual=True,
                                seed=seed_arr, rate_mid=r_mid,
                                rate_out=r_out)
        return jnp.sum(out * w_out)

    args = (x, w1, b1, w2, b2, g, b)
    gf = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for a, e in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a).reshape(np.asarray(e).shape),
                                   np.asarray(e), atol=5e-5, rtol=5e-4)


def test_ffn_bwd_knob_and_chunked_kernel_agree(monkeypatch):
    """SMM_FFN_BWD=0 (reference-vjp fallback) and the dedicated Pallas
    backward produce the same grads, including when F chunks into
    multiple tiles (F=384 -> only Fc=128 divides: three-chunk loop)."""
    from simple_multimodal_tpu.ops.pallas import ffn_block as fb

    B, S, E, F = 1, 96, 32, 384  # F=384 -> Fc=128: three-chunk loop
    rng = np.random.default_rng(53)
    x = rng.standard_normal((B, S, E)).astype(np.float32)
    w1 = (rng.standard_normal((E, F)) * 0.1).astype(np.float32)
    b1 = (rng.standard_normal((F,)) * 0.1).astype(np.float32)
    w2 = (rng.standard_normal((F, E)) * 0.1).astype(np.float32)
    b2 = (rng.standard_normal((E,)) * 0.1).astype(np.float32)
    g = rng.standard_normal((E,)).astype(np.float32)
    b = rng.standard_normal((E,)).astype(np.float32)
    w_out = rng.standard_normal(x.shape).astype(np.float32)
    assert fb._bwd_pick(96, E, F, 4, False)[1] == 128  # chunked for real

    def loss(x, w1, b1, w2, b2, g, b):
        out = fb.ffn_block(x, w1, b1, w2, b2, ln=(g, b, 1e-7),
                           ln_post=True, residual=True, interpret=True)
        return jnp.sum(out * w_out)

    args = (x, w1, b1, w2, b2, g, b)
    monkeypatch.setenv("SMM_FFN_BWD", "1")  # Pallas bwd is opt-in (r5 A/B)
    jax.clear_caches()
    g_pallas = jax.grad(loss, argnums=tuple(range(7)))(*args)
    monkeypatch.setenv("SMM_FFN_BWD", "0")
    jax.clear_caches()
    g_vjp = jax.grad(loss, argnums=tuple(range(7)))(*args)
    monkeypatch.delenv("SMM_FFN_BWD")
    jax.clear_caches()
    for a, e in zip(g_pallas, g_vjp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   atol=5e-5, rtol=5e-4)
