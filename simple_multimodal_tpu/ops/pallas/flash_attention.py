"""Flash attention Pallas kernel for TPU.

Fused softmax(QKᵀ·scale + bias)·V with online (streaming) softmax: the
[B, H, S, S] probability tensor never hits HBM — score tiles live in VMEM
one (q-block × k-block) at a time, which is the memory-bound win over the
XLA einsum path for the encoder sequence lengths here (ViT 197, wav2vec2
499, DeBERTa 512) and scales to much longer sequences unchanged.

Layout: q/k/v arrive [B, S, H, D] (attention-module layout) and are
transposed to [B, H, S, D] so the grid blocks cleanly. Supports an optional
additive bias [B, H, Sq, Sk] (DeBERTa's disentangled-attention bias + mask)
streamed in q-block tiles.

On CPU (tests) the kernel runs in Pallas interpreter mode.
"""
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30


def _attn_body(q, k_ref, v_ref, b_ref, scale, block_k, seq_k):
    """Online-softmax accumulation over key blocks. q: [Bq, D] f32."""
    bq = q.shape[0]
    num_k = seq_k // block_k

    def body(i, carry):
        acc, m, l = carry
        k = k_ref[0, 0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, 0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [Bq, Bk]
        if b_ref is not None:
            s = s + b_ref[0, 0, :, pl.ds(i * block_k, block_k)].astype(jnp.float32)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[:, None])
        corr = jnp.exp(m - m_new)
        acc = acc * corr[:, None] + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        l = l * corr + jnp.sum(p, axis=-1)
        return acc, m_new, l

    acc0 = jnp.zeros((bq, q.shape[1]), jnp.float32)
    m0 = jnp.full((bq,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq,), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, num_k, body, (acc0, m0, l0))
    l = jnp.where(l == 0.0, 1.0, l)  # fully-masked rows → zeros, not NaN
    return acc / l[:, None]


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale, block_k, seq_k):
    q = q_ref[0, 0].astype(jnp.float32)
    o_ref[0, 0] = _attn_body(q, k_ref, v_ref, None, scale, block_k,
                             seq_k).astype(o_ref.dtype)


def _kernel_bias(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale, block_k, seq_k):
    q = q_ref[0, 0].astype(jnp.float32)
    o_ref[0, 0] = _attn_body(q, k_ref, v_ref, b_ref, scale, block_k,
                             seq_k).astype(o_ref.dtype)


def _pad_axis(x, axis, mult, value=0.0):
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    block_q: int = 128,
    block_k: int = 128,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """softmax(q·kᵀ/√D + bias)·v.

    q: [B, Sq, H, D], k/v: [B, Sk, H, D], bias: broadcastable to
    [B, H, Sq, Sk] or None. Returns [B, Sq, H, D] in q's dtype.
    Scale is 1/sqrt(D).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    scale = 1.0 / (D ** 0.5)

    qt = _pad_axis(jnp.swapaxes(q, 1, 2), 2, block_q)  # [B, H, Sq_p, D]
    kt = _pad_axis(jnp.swapaxes(k, 1, 2), 2, block_k)
    vt = _pad_axis(jnp.swapaxes(v, 1, 2), 2, block_k)
    Sq_p, Sk_p = qt.shape[2], kt.shape[2]

    # Key padding must not receive weight: realize a bias with -inf there.
    if bias is None and Sk_p != Sk:
        bias = jnp.zeros((1, 1, Sq, Sk), jnp.float32)
    if bias is not None:
        bias = jnp.broadcast_to(bias, (B, H, Sq, Sk)).astype(jnp.float32)
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, Sq_p - Sq), (0, Sk_p - Sk)),
                       constant_values=NEG_INF)
        if Sq_p != Sq:  # padded query rows: keep rows finite (output trimmed)
            row_fix = jnp.zeros((B, H, Sq_p - Sq, Sk_p), jnp.float32)
            bias = jnp.concatenate([bias[:, :, :Sq], row_fix], axis=2)

    grid = (B, H, Sq_p // block_q)
    q_spec = pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0))
    kv_spec = pl.BlockSpec((1, 1, Sk_p, D), lambda b, h, i: (b, h, 0, 0))
    o_spec = pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0))
    out_shape = jax.ShapeDtypeStruct((B, H, Sq_p, D), q.dtype)

    if bias is not None:
        b_spec = pl.BlockSpec((1, 1, block_q, Sk_p),
                              lambda b, h, i: (b, h, i, 0))
        out = pl.pallas_call(
            functools.partial(_kernel_bias, scale=scale, block_k=block_k,
                              seq_k=Sk_p),
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec, b_spec],
            out_specs=o_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(qt, kt, vt, bias)
    else:
        out = pl.pallas_call(
            functools.partial(_kernel, scale=scale, block_k=block_k,
                              seq_k=Sk_p),
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=o_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(qt, kt, vt)

    return jnp.swapaxes(out[:, :, :Sq, :], 1, 2)  # [B, Sq, H, D]
