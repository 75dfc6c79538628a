"""Fully-fused self-attention BLOCK: qkv-projection → softmax(QKᵀ/√D)·V →
output projection, one Pallas program per batch item.

Why fusing only softmax(QKᵀ)V is not enough (v5e, measured round 3): any
per-op attention kernel forces XLA to materialize q/k/v/out as [B, S, H, D]
HBM tensors in the kernel's layout — an *identity* kernel spliced into the
ViT stack in place of XLA attention cost +38 ms on the 240-frame forward
(128.4 vs 90.2 ms) before doing any math. The block kernel's I/O is the
[B, S, E] hidden states the layer materializes anyway; heads exist only in
VMEM.

Kernel dialect note: this kernel deliberately uses ONLY constructs verified
to lower fast and correctly on this toolchain — plain 2-D MXU matmuls,
128-aligned lane slices of VMEM scratches, and elementwise VPU ops.
Everything else tried first either crashed the remote Mosaic compiler or
compiled pathologically slowly at these sizes: batch-12 dot_generals over
[12, 512, 512]; ≥3 live [512, 12, 64] transposes; unrolled loops holding
chunk outputs as live values; multi-dim tpu.matmul contractions; and
[g, E, D]·[Sp, E] free-dim-heavy dots.

Head separation without sub-128 slicing — the masked-pair trick: heads are
processed in 128-lane groups (128/D heads per group). For head i of a
group, the group's k/v lanes outside that head's D-slice are zeroed before
the 2-D matmul, so

    s_i  = q_grp · (k_grp ∘ m_i)ᵀ        ([Sp, Sp], contraction over 128)
    ctx  = Σ_i (softmax(s_i) · (v_grp ∘ m_i)) ∘ m_i

computes every head independently while every matmul stays [Sp, 128]-by-
[128, Sp]-shaped. The redundant masked lanes cost 128/D× the attention
FLOPs — noise next to the MXU roofline, and the price buys compileability.

Matches torch/HF semantics of the wav2vec2 / ViT attention blocks
(/root/reference/models/encoders.py:116,179): biased q/k/v + output
projections, 1/√D scaling. Backward: custom VJP against the einsum
reference. SPMD: shard_maps itself over the ambient mesh (batch → 'data';
weights replicated per shard).
"""
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, dims,
                               preferred_element_type=jnp.float32)


def _mm(a, b):
    """Plain 2-D matmul a [M, K] · b [K, N] → f32 [M, N]."""
    return _dot(a, b, (((1,), (0,)), ((), ())))


def _kernel(x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
            wo_ref, bo_ref, o_ref, q_scr, k_scr, v_scr, a_scr,
            *, scale, s_valid, head_dim, group):
    x = x_ref[0]                      # [Sp, E]
    Sp, E = x.shape
    D = head_dim
    # fused projections: three [Sp, E] x [E, E] MXU matmuls
    q_scr[...] = (_mm(x, wq_ref[...]) * scale
                  + bq_ref[...].astype(jnp.float32) * scale).astype(x.dtype)
    k_scr[...] = (_mm(x, wk_ref[...])
                  + bk_ref[...].astype(jnp.float32)).astype(x.dtype)
    v_scr[...] = (_mm(x, wv_ref[...])
                  + bv_ref[...].astype(jnp.float32)).astype(x.dtype)

    for g0 in range(0, E, group):
        q_g = q_scr[:, g0 : g0 + group]    # [Sp, group] (128-aligned)
        k_g = k_scr[:, g0 : g0 + group]
        v_g = v_scr[:, g0 : g0 + group]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (Sp, group), 1)
        ctx = jnp.zeros((Sp, group), jnp.float32)
        for i in range(group // D):
            m_i = (lanes >= i * D) & (lanes < (i + 1) * D)
            k_i = jnp.where(m_i, k_g, 0)
            s = _dot(q_g, k_i, (((1,), (1,)), ((), ())))   # [Sp, Sp] f32
            if s_valid < Sp:
                cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(cols < s_valid, s, NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            probs = (p / jnp.where(l == 0.0, 1.0, l)).astype(x.dtype)
            v_i = jnp.where(m_i, v_g, 0)
            ctx = ctx + jnp.where(m_i, _mm(probs, v_i), 0.0)
        a_scr[:, g0 : g0 + group] = ctx.astype(a_scr.dtype)

    o_ref[0] = (_mm(a_scr[...], wo_ref[...])
                + bo_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _fused_call(x, wq, bq, wk, bk, wv, bv, wo, bo, s_valid, head_dim,
                interpret):
    B, Sp, E = x.shape
    group = min(E, _round_up(head_dim, 128))
    return pl.pallas_call(
        functools.partial(_kernel, scale=1.0 / float(np.sqrt(head_dim)),
                          s_valid=s_valid, head_dim=head_dim, group=group),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Sp, E), lambda b: (b, 0, 0)),
            pl.BlockSpec((E, E), lambda b: (0, 0)),
            pl.BlockSpec((1, E), lambda b: (0, 0)),
            pl.BlockSpec((E, E), lambda b: (0, 0)),
            pl.BlockSpec((1, E), lambda b: (0, 0)),
            pl.BlockSpec((E, E), lambda b: (0, 0)),
            pl.BlockSpec((1, E), lambda b: (0, 0)),
            pl.BlockSpec((E, E), lambda b: (0, 0)),
            pl.BlockSpec((1, E), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Sp, E), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Sp, E), x.dtype),
        scratch_shapes=[pltpu.VMEM((Sp, E), x.dtype)] * 4,
        interpret=interpret,
    )(x, wq, bq, wk, bk, wv, bv, wo, bo)


def _xla_reference(x, wq, bq, wk, bk, wv, bv, wo, bo, num_heads):
    B, S, E = x.shape
    H = num_heads
    D = E // H
    q = (x @ wq + bq).reshape(B, S, H, D)
    k = (x @ wk + bk).reshape(B, S, H, D)
    v = (x @ wv + bv).reshape(B, S, H, D)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) / np.sqrt(D)
    p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, S, E)
    return (ctx.astype(x.dtype) @ wo + bo).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def _block(x, wq, bq, wk, bk, wv, bv, wo, bo, s_valid, head_dim, interpret):
    return _fused_call(x, wq, bq, wk, bk, wv, bv, wo, bo, s_valid, head_dim,
                       interpret)


def _block_fwd(x, wq, bq, wk, bk, wv, bv, wo, bo, s_valid, head_dim,
               interpret):
    out = _fused_call(x, wq, bq, wk, bk, wv, bv, wo, bo, s_valid, head_dim,
                      interpret)
    return out, (x, wq, bq, wk, bk, wv, bv, wo, bo)


def _block_bwd(s_valid, head_dim, interpret, res, g):
    x, wq, bq, wk, bk, wv, bv, wo, bo = res
    E = x.shape[-1]
    xv = x[:, :s_valid]
    _, vjp = jax.vjp(
        lambda *a: _xla_reference(*a, num_heads=E // head_dim),
        xv, wq, bq.reshape(-1), wk, bk.reshape(-1), wv, bv.reshape(-1),
        wo, bo.reshape(-1))
    grads = vjp(g[:, :s_valid])
    dx = grads[0]
    pad = x.shape[1] - s_valid
    if pad:
        dx = jnp.pad(dx, ((0, 0), (0, pad), (0, 0)))
    out = [dx]
    for i, gr in enumerate(grads[1:]):
        out.append(gr.reshape(1, -1) if gr.ndim == 1 else gr)
    return tuple(out)


_block.defvjp(_block_fwd, _block_bwd)


def block_viable(S: int, H: int, D: int, E: int, itemsize: int = 2) -> bool:
    if D > 128 or 128 % min(D, 128) != 0:
        return False
    Sp = _round_up(max(S, 128), 128)
    weights = 4 * E * E * itemsize
    scratches = 4 * Sp * E * itemsize
    x_io = 2 * Sp * E * itemsize * 2
    scores = 2 * Sp * Sp * 4
    return weights + scratches + x_io + scores <= 13 * 1024 * 1024


def attention_block(
    x: jnp.ndarray,
    wq: jnp.ndarray, bq: jnp.ndarray,
    wk: jnp.ndarray, bk: jnp.ndarray,
    wv: jnp.ndarray, bv: jnp.ndarray,
    wo: jnp.ndarray, bo: jnp.ndarray,
    num_heads: int,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused attention block over hidden states x [B, S, E].

    Weights in flax Dense layout: wq/wk/wv/wo [E, E], biases [E].
    Returns [B, S, E] in x's dtype.
    """
    from .spmd import resolve_mesh

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, S, E = x.shape
    D = E // num_heads
    bq2, bk2, bv2, bo2 = (b.reshape(1, E) for b in (bq, bk, bv, bo))

    mesh, fallback = resolve_mesh(B, 1)  # heads stay whole per shard
    if fallback:
        return _xla_reference(x, wq, bq, wk, bk, wv, bv, wo, bo, num_heads)

    Sp = _round_up(max(S, 128), 128)
    if Sp != S:
        x = jnp.pad(x, ((0, 0), (0, Sp - S), (0, 0)))

    def fn(x_, wq_, bq_, wk_, bk_, wv_, bv_, wo_, bo_):
        return _block(x_, wq_, bq_, wk_, bk_, wv_, bv_, wo_, bo_, S, D,
                      interpret)

    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        bse = P("data", None, None)
        rep = P()
        fn = shard_map(fn, mesh=mesh,
                       in_specs=(bse,) + (rep,) * 8, out_specs=bse,
                       check_vma=False)
    out = fn(x, wq, bq2, wk, bk2, wv, bv2, wo, bo2)
    return out[:, :S]
