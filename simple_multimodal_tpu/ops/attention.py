"""Multi-head attention with torch ``nn.MultiheadAttention`` semantics.

Every attention block in the reference is torch's stock MHA
(/root/reference/models/fusion_layers.py:110-121,188-191 and
models/encoders.py:126-131,193-198): packed QKV projections, scaling by
1/sqrt(head_dim), dropout on the attention probabilities, and returned
weights averaged over heads. This module reproduces those numerics exactly
(so converted torch weights give 1e-3-matching logits) while computing as
batched einsums the MXU can tile; long-sequence paths can route through the
Pallas flash-attention kernel (ops/pallas) which avoids materializing the
[B, H, S, S] probability tensor.
"""
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def compact_scores(scores: jnp.ndarray, dtype) -> jnp.ndarray:
    """Round attention logits to the compute dtype before the softmax.

    Under mixed precision this halves the [B, H, S, S] score tensor's HBM
    traffic — the dominant attention cost at encoder lengths on v5e
    (measured 6.9 → 3.8 ms/layer at the ViT shape; the chip sustains only
    ~290 GB/s effective on elementwise passes). The softmax math itself
    stays f32 (max-subtract, exp, normalize happen after the upcast, fused
    into the read). Rounding error is within bf16 output quantization, and
    matches the reference's AMP behavior — torch autocast computes MHA
    scores in half precision (/root/reference/training/advanced_trainer.py:57).
    In f32 mode this is the identity, so parity tests are bit-unchanged.
    """
    if dtype == jnp.bfloat16:
        return scores.astype(jnp.bfloat16).astype(jnp.float32)
    return scores


def gelu(x: jnp.ndarray, dtype) -> jnp.ndarray:
    """erf-exact GELU in f32 mode; tanh approximation under bf16.

    The tanh form is ~1.6x faster on the VPU (3.5 → 2.2 ms on the ViT FFN
    activation) and its max deviation from the erf form (~3e-3 near |x|=2)
    is below bf16's own resolution there (1.6e-2), so bf16-mode numerics
    are indistinguishable; f32 mode keeps the reference-exact erf form.
    """
    return jax.nn.gelu(x, approximate=dtype == jnp.bfloat16)


def use_flash_attention(config, train: bool = False) -> bool:
    """Resolve a ModelConfig's flash_attention flag.

    "auto" → on for TPU backends regardless of mesh size: the kernels
    shard_map themselves over the ambient mesh (ops/pallas/spmd.py), so
    multi-chip no longer disables them. On CPU the kernels would run in
    interpreter mode (tests only) — auto stays off there. True/False force.

    ``train=True`` (a grad trace, i.e. deterministic=False) resolves
    ``flash_attention_train`` instead — an independent gate because the
    in-context winner differs per mode and was measured three ways on v5e
    at the base flagship (RESULTS.md round 4): fused fwd + dedicated
    Pallas bwd 423 ms/step BEATS all-XLA 543 ms/step, but fused fwd with
    only XLA-vjp backwards LOSES at 681 ms/step (custom-call residual
    saves cost HBM traffic XLA's whole-graph fusion avoids; the dedicated
    bwd kernels recompute in VMEM and win it back). "auto" therefore
    follows the ``flash_attention`` resolution — fused on TPU — and the
    field remains a forcing knob / safety valve (with SMM_PALLAS_BWD=0
    as the bwd-only A/B switch).
    """
    if train:
        fat = getattr(config, "flash_attention_train", "auto")
        if isinstance(fat, str) and fat == "auto":
            return use_flash_attention(config, train=False)
        if isinstance(fat, str):
            return fat.lower() in ("1", "true", "yes", "on")
        return bool(fat)
    fa = getattr(config, "flash_attention", "auto")
    if isinstance(fa, str):
        if fa != "auto":
            return fa.lower() in ("1", "true", "yes", "on")
        return jax.default_backend() == "tpu"
    return bool(fa)


def kernel_dropout_seed(module: nn.Module, rate: float):
    """Per-step scalar int32 seed for the fused kernels' stateless hash
    dropout, drawn from the module's 'dropout' RNG collection. Returns
    (rate, seed) with seed=None when rate is 0 — the single place the
    seed-derivation convention lives (width, collection name)."""
    if not rate:
        return 0.0, None
    seed = jax.random.randint(module.make_rng("dropout"), (), 0,
                              np.int32(2**31 - 1), dtype=jnp.int32)
    return float(rate), seed


class DenseParams(nn.Module):
    """Creates the exact parameter tree of an ``nn.Dense`` (kernel + bias,
    same names/inits) WITHOUT computing the matmul — for layers that hand
    their projection weights to a fused Pallas kernel instead of calling
    the Dense. Swapping a Dense call for DenseParams keeps checkpoints and
    converted torch weights byte-compatible."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.linear.default_kernel_init,
            (in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class ConvParams(nn.Module):
    """Creates the exact parameter tree of a bias-free ``nn.Conv`` (kernel
    [K, in, out], same name/init) WITHOUT computing the convolution — for
    conv stages whose compute is fused into a Pallas kernel (see
    DenseParams). ``features``/``kernel_size`` match the nn.Conv fields."""

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, in_features: int):
        return self.param(
            "kernel", nn.linear.default_kernel_init,
            (self.kernel_size, in_features, self.features),
        )


class LayerNormParams(nn.Module):
    """Creates the exact parameter tree of an ``nn.LayerNorm`` (scale +
    bias, same names/inits) WITHOUT computing the normalization — for
    layers whose LN is fused into a Pallas kernel (see DenseParams)."""

    @nn.compact
    def __call__(self, features: int):
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        return scale, bias


class MultiHeadAttention(nn.Module):
    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False  # route softmax(QK^T)V through the Pallas kernel

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        need_weights: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """query [B,Q,E], key/value [B,K,E], mask broadcastable to [B,1,Q,K]
        (True = attend). Returns (output [B,Q,E], attn averaged over heads)."""
        E, H = self.embed_dim, self.num_heads
        Dh = E // H
        B, Q = query.shape[0], query.shape[1]
        K = key.shape[1]

        fused_ok = (
            self.use_flash
            and not need_weights  # else probs must materialize anyway
            and mask is None
            and (self.dropout == 0.0 or deterministic)
        )
        from .pallas.attention_block import block_viable

        # Fully-fused attention block for the self-attention sites (the
        # audio temporal / video facial attentions, encoders.py:126-131,
        # 193-198): projections + softmax + out-projection in one kernel,
        # [B, S, E] I/O. Per-op attention kernels were measured to LOSE
        # in-context to their own [B,H,S,S]-operand materialization (see
        # ops/pallas/attention_block.py). Q >= 128 gates out the tiny
        # fusion-token attentions where kernel dispatch dominates.
        # Dropout does NOT gate the block path: attention dropout runs
        # in-kernel from a stateless hash, so it serves training too.
        use_block = (self.use_flash and not need_weights and mask is None
                     and query is key and key is value
                     and Q >= 128 and block_viable(Q, H, Dh, E))
        if use_block:
            drop_rate, drop_seed = kernel_dropout_seed(
                self, 0.0 if deterministic else self.dropout)
            wq, bq = DenseParams(E, name="q_proj")(E)
            wk, bk = DenseParams(E, name="k_proj")(E)
            wv, bv = DenseParams(E, name="v_proj")(E)
            wo, bo = DenseParams(E, name="out_proj")(E)
            from .pallas.attention_block import attention_block

            out = attention_block(
                query, wq.astype(self.dtype), bq.astype(self.dtype),
                wk.astype(self.dtype), bk.astype(self.dtype),
                wv.astype(self.dtype), bv.astype(self.dtype),
                wo.astype(self.dtype), bo.astype(self.dtype), num_heads=H,
                dropout_rate=drop_rate, dropout_seed=drop_seed,
            )
            return out, None

        q = nn.Dense(E, dtype=self.dtype, name="q_proj")(query)
        k = nn.Dense(E, dtype=self.dtype, name="k_proj")(key)
        v = nn.Dense(E, dtype=self.dtype, name="v_proj")(value)
        q = q.reshape(B, Q, H, Dh)
        k = k.reshape(B, K, H, Dh)
        v = v.reshape(B, K, H, Dh)

        use_flash = fused_ok and Q > 512 and K > 512
        probs = None
        if use_flash:
            from .pallas.flash_attention import flash_attention

            out = flash_attention(q, k, v)  # [B, Q, H, Dh]
        else:
            scale = 1.0 / jnp.sqrt(jnp.array(Dh, dtype=jnp.float32))
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ) * scale
            # compact BEFORE the additive mask: f32.min would round to -inf
            # in bf16 and a fully-masked row would produce NaN
            logits = compact_scores(logits, self.dtype)
            if mask is not None:
                logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
            probs = jnp.exp(
                logits - jnp.max(logits, axis=-1, keepdims=True)
            )
            probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
            probs = probs.astype(self.dtype)
            dropped = nn.Dropout(rate=self.dropout)(probs, deterministic=deterministic)
            out = jnp.einsum(
                "bhqk,bkhd->bqhd", dropped, v, preferred_element_type=jnp.float32
            ).astype(self.dtype)

        out = out.reshape(B, Q, E)
        out = nn.Dense(E, dtype=self.dtype, name="out_proj")(out)
        if need_weights and probs is not None:
            return out, probs.mean(axis=1)  # torch averages heads by default
        return out, None
