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
