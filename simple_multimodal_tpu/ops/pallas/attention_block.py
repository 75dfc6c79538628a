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
projections, 1/√D scaling. Backward: a Pallas bwd kernel recomputes
projections/probabilities in VMEM and emits dx + packed (dq,dk,dv)
cotangents + the context ``a``; the four weight-grad contractions ride
plain XLA matmuls over (B, S). Falls back to a reference-vjp when the
bwd residency exceeds VMEM (_bwd_viable). SPMD: shard_maps itself over
the ambient mesh (batch → 'data'; weights replicated per shard).
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


def _pad_s(S: int, itemsize: int) -> int:
    """Pad S to the SUBLANE multiple (8 f32 / 16 bf16), not to 128.

    S is the row (sublane) dimension of every matmul in the kernel — only
    the [Sp, Sp] score tensor puts it on lanes, and Mosaic masks a partial
    final lane tile there for free. Rows are where the FLOPs scale:
    at the ViT stack shape (240×197×768) Sp=208 measured 3.06 ms/layer vs
    3.59 at Sp=256, bit-identical output (15% — the padded-row share of
    the four [Sp, E]×[E, E] projections).
    """
    mult = 8 if itemsize >= 4 else 16
    return _round_up(max(S, 128), mult)


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, dims,
                               preferred_element_type=jnp.float32)


def _mm(a, b):
    """Plain 2-D matmul a [M, K] · b [K, N] → f32 [M, N]."""
    return _dot(a, b, (((1,), (0,)), ((), ())))


def _drop_keep(seed_ref, b, head, shape, n_heads, rate):
    """Attention-prob dropout keep mask over a [Sp, Sp] score tile for
    (batch b, global head) — the same stateless (seed, head, q, k) hash as
    the DeBERTa kernel (`_hash_keep`), regenerated identically in fwd/bwd
    so no [B, H, S, S] mask is ever stored. Padded indices hash like any
    other, so the mask is padding-invariant for the valid region."""
    from .deberta_attention import _hash_keep

    q_i = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    k_i = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    h = jnp.uint32(b) * np.uint32(n_heads) + np.uint32(head)
    return _hash_keep(jnp.uint32(seed_ref[0]), h, q_i, k_i, rate)


def _kernel(x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
            wo_ref, bo_ref, seed_ref, *rest,
            scale, s_valid, head_dim, group, ln_eps, residual, rate,
            n_heads):
    """``rest``: [g_ref, b_ref,] o_ref, q_scr, k_scr, v_scr, a_scr.

    ``ln_eps`` is not None → fuse the pre-LayerNorm: x_ref holds the RAW
    hidden states and g_ref/b_ref the LN scale/bias; normalization happens
    on the VMEM tile, so the LN output never round-trips HBM (XLA must
    otherwise materialize it as the custom call's operand — measured
    ~1.4 ms/layer of pure traffic at the ViT stack shape).
    ``residual`` → o += raw x (the block's residual add, fused for free)."""
    if ln_eps is not None:
        g_ref, b_ref = rest[0], rest[1]
        rest = rest[2:]
    o_ref, q_scr, k_scr, v_scr, a_scr = rest
    x = x_ref[0]                      # [Sp, E]
    Sp, E = x.shape
    D = head_dim
    if ln_eps is not None:
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=1, keepdims=True)
        var = jnp.mean((xf - mu) * (xf - mu), axis=1, keepdims=True)
        xn = ((xf - mu) * jax.lax.rsqrt(var + ln_eps)
              * g_ref[...].astype(jnp.float32)
              + b_ref[...].astype(jnp.float32)).astype(x.dtype)
    else:
        xn = x
    # fused projections: three [Sp, E] x [E, E] MXU matmuls
    q_scr[...] = (_mm(xn, wq_ref[...]) * scale
                  + bq_ref[...].astype(jnp.float32) * scale).astype(x.dtype)
    k_scr[...] = (_mm(xn, wk_ref[...])
                  + bk_ref[...].astype(jnp.float32)).astype(x.dtype)
    v_scr[...] = (_mm(xn, wv_ref[...])
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
            p = p / jnp.where(l == 0.0, 1.0, l)
            if rate:
                p = jnp.where(
                    _drop_keep(seed_ref, pl.program_id(0), g0 // D + i,
                               p.shape, n_heads, rate),
                    p * (1.0 / (1.0 - rate)), 0.0)
            probs = p.astype(x.dtype)
            v_i = jnp.where(m_i, v_g, 0)
            ctx = ctx + jnp.where(m_i, _mm(probs, v_i), 0.0)
        a_scr[:, g0 : g0 + group] = ctx.astype(a_scr.dtype)

    out = _mm(a_scr[...], wo_ref[...]) + bo_ref[...].astype(jnp.float32)
    if residual:
        out = out + x.astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _fused_call(x, wq, bq, wk, bk, wv, bv, wo, bo, seed, rate, ln, s_valid,
                head_dim, interpret, residual):
    B, Sp, E = x.shape
    group = min(E, _round_up(head_dim, 128))
    ln_eps = None if ln is None else ln[2]
    operands = [x, wq, bq, wk, bk, wv, bv, wo, bo, seed]
    mat = pl.BlockSpec((E, E), lambda b: (0, 0))
    vec = pl.BlockSpec((1, E), lambda b: (0, 0))
    in_specs = [pl.BlockSpec((1, Sp, E), lambda b: (b, 0, 0)),
                mat, vec, mat, vec, mat, vec, mat, vec,
                pl.BlockSpec(memory_space=pltpu.SMEM)]
    if ln is not None:
        operands += [ln[0].reshape(1, E), ln[1].reshape(1, E)]
        in_specs += [vec, vec]
    return pl.pallas_call(
        functools.partial(_kernel, scale=1.0 / float(np.sqrt(head_dim)),
                          s_valid=s_valid, head_dim=head_dim, group=group,
                          ln_eps=ln_eps, residual=residual, rate=rate,
                          n_heads=E // head_dim),
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Sp, E), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Sp, E), x.dtype),
        scratch_shapes=[pltpu.VMEM((Sp, E), x.dtype)] * 4,
        interpret=interpret,
    )(*operands)


def _xla_reference(x, wq, bq, wk, bk, wv, bv, wo, bo, num_heads,
                   ln=None, residual=False, seed=None, rate=0.0):
    B, S, E = x.shape
    H = num_heads
    D = E // H
    xn = x
    if ln is not None:
        g, b, eps = ln
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        xn = ((xf - mu) * jax.lax.rsqrt(var + eps)
              * g.reshape(-1).astype(jnp.float32)
              + b.reshape(-1).astype(jnp.float32)).astype(x.dtype)
    q = (xn @ wq + bq).reshape(B, S, H, D)
    k = (xn @ wk + bk).reshape(B, S, H, D)
    v = (xn @ wv + bv).reshape(B, S, H, D)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) / np.sqrt(D)
    p = jax.nn.softmax(s, axis=-1)
    if rate:
        # same stateless hash as the kernel (`_drop_keep`), elementwise
        from .deberta_attention import _hash_keep

        hb = jax.lax.broadcasted_iota(jnp.uint32, (B, H, S, S), 0)
        hh = jax.lax.broadcasted_iota(jnp.uint32, (B, H, S, S), 1)
        hq = jax.lax.broadcasted_iota(jnp.uint32, (B, H, S, S), 2)
        hk = jax.lax.broadcasted_iota(jnp.uint32, (B, H, S, S), 3)
        keep = _hash_keep(jnp.uint32(seed.reshape(())),
                          hb * np.uint32(H) + hh, hq, hk, rate)
        p = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
    p = p.astype(x.dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, S, E)
    out = (ctx.astype(x.dtype) @ wo + bo).astype(jnp.float32)
    if residual:
        out = out + x.astype(jnp.float32)
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15, 16, 17))
def _block(x, wq, bq, wk, bk, wv, bv, wo, bo, ln_g, ln_b, seed,
           ln_eps, s_valid, head_dim, interpret, residual, rate):
    ln = None if ln_eps is None else (ln_g, ln_b, ln_eps)
    return _fused_call(x, wq, bq, wk, bk, wv, bv, wo, bo, seed, rate, ln,
                       s_valid, head_dim, interpret, residual)


def _block_fwd(x, wq, bq, wk, bk, wv, bv, wo, bo, ln_g, ln_b, seed,
               ln_eps, s_valid, head_dim, interpret, residual, rate):
    ln = None if ln_eps is None else (ln_g, ln_b, ln_eps)
    out = _fused_call(x, wq, bq, wk, bk, wv, bv, wo, bo, seed, rate, ln,
                      s_valid, head_dim, interpret, residual)
    return out, (x, wq, bq, wk, bk, wv, bv, wo, bo, ln_g, ln_b, seed)


def _bwd_kernel(x_ref, g_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref,
                bv_ref, wo_ref, lg_ref, lb_ref, seed_ref,
                dx_ref, dqkv_ref, a_ref, dln_ref,
                q_scr, k_scr, v_scr, da_scr, xhat_scr=None,
                *, scale, s_valid, head_dim, group, ln_eps, residual, rate,
                n_heads):
    """dx + packed (dq,dk,dv) cotangents + recomputed context ``a``.

    Recomputes projections and per-head probabilities in VMEM from the
    saved inputs (the same cost profile as the forward), so the backward
    never materializes [B, H, S, S] probability tensors in HBM — the
    XLA-vjp fallback this replaces re-ran the reference path and paid
    that traffic for every fused layer. The four weight-grad
    contractions ride big XLA matmuls outside (see _block_bwd): they
    contract over (B, Sp), which a per-batch grid cannot feed the MXU
    efficiently, while dln (tiny [E]) accumulates here across the grid.
    """
    b = pl.program_id(0)
    x = x_ref[0]                       # [Sp, E]
    gy = g_ref[0]                      # [Sp, E] cotangent (zero padded rows)
    Sp, E = x.shape
    D = head_dim
    f32 = jnp.float32

    @pl.when(b == 0)
    def _():
        dln_ref[...] = jnp.zeros(dln_ref.shape, dln_ref.dtype)

    if ln_eps is not None:
        xf = x.astype(f32)
        mu = jnp.mean(xf, axis=1, keepdims=True)
        var = jnp.mean((xf - mu) * (xf - mu), axis=1, keepdims=True)
        rstd = jax.lax.rsqrt(var + ln_eps)
        xhat_scr[...] = (xf - mu) * rstd
        xn = (xhat_scr[...] * lg_ref[...].astype(f32)
              + lb_ref[...].astype(f32)).astype(x.dtype)
    else:
        xn = x

    # recompute projections (same as forward)
    q_scr[...] = (_mm(xn, wq_ref[...]) * scale
                  + bq_ref[...].astype(f32) * scale).astype(x.dtype)
    k_scr[...] = (_mm(xn, wk_ref[...])
                  + bk_ref[...].astype(f32)).astype(x.dtype)
    v_scr[...] = (_mm(xn, wv_ref[...])
                  + bv_ref[...].astype(f32)).astype(x.dtype)

    # da = dL/d(context) = gy @ wo^T
    da_scr[...] = _dot(gy, wo_ref[...], (((1,), (1,)), ((), ())))

    for g0 in range(0, E, group):
        q_g = q_scr[:, g0 : g0 + group]
        k_g = k_scr[:, g0 : g0 + group]
        v_g = v_scr[:, g0 : g0 + group]
        da_g = da_scr[:, g0 : g0 + group]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (Sp, group), 1)
        a_acc = jnp.zeros((Sp, group), f32)
        dq_acc = jnp.zeros((Sp, group), f32)
        dk_acc = jnp.zeros((Sp, group), f32)
        dv_acc = jnp.zeros((Sp, group), f32)
        for i in range(group // D):
            m_i = (lanes >= i * D) & (lanes < (i + 1) * D)
            k_i = jnp.where(m_i, k_g, 0)
            v_i = jnp.where(m_i, v_g, 0)
            da_i = jnp.where(m_i, da_g.astype(x.dtype), 0)
            s = _dot(q_g, k_i, (((1,), (1,)), ((), ())))   # [Sp, Sp] f32
            if s_valid < Sp:
                cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(cols < s_valid, s, NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            l = jnp.sum(e, axis=-1, keepdims=True)
            p = e / jnp.where(l == 0.0, 1.0, l)            # [Sp, Sp] f32
            if rate:
                keep = _drop_keep(seed_ref, b, g0 // D + i, p.shape,
                                  n_heads, rate)
                p_drop = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
            else:
                p_drop = p
            p_b = p_drop.astype(x.dtype)
            a_acc = a_acc + jnp.where(m_i, _mm(p_b, v_i), 0.0)
            # softmax backward through the dropout mask:
            # dL/dp = keep/(1-rate) * (da · vᵀ); ds = p * (dp - rowsum(dp*p))
            dp = _dot(da_i, v_i, (((1,), (1,)), ((), ())))  # [Sp, Sp] f32
            if rate:
                dp = jnp.where(keep, dp * (1.0 / (1.0 - rate)), 0.0)
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            ds_b = ds.astype(x.dtype)
            dq_acc = dq_acc + _mm(ds_b, k_i)
            dk_acc = dk_acc + jnp.where(
                m_i, _dot(ds_b, jnp.where(m_i, q_g, 0),
                          (((0,), (0,)), ((), ()))), 0.0)
            dv_acc = dv_acc + jnp.where(
                m_i, _dot(p_b, da_i, (((0,), (0,)), ((), ()))), 0.0)
        a_ref[0, :, g0 : g0 + group] = a_acc.astype(a_ref.dtype)
        # dq is the grad wrt (xn@wq + bq): forward scaled by `scale` after
        dqkv_ref[0, :, g0 : g0 + group] = (dq_acc * scale).astype(
            dqkv_ref.dtype)
        dqkv_ref[0, :, E + g0 : E + g0 + group] = dk_acc.astype(
            dqkv_ref.dtype)
        dqkv_ref[0, :, 2 * E + g0 : 2 * E + g0 + group] = dv_acc.astype(
            dqkv_ref.dtype)

    dq = dqkv_ref[0, :, :E]
    dk = dqkv_ref[0, :, E : 2 * E]
    dv = dqkv_ref[0, :, 2 * E :]
    dxn = (_dot(dq, wq_ref[...], (((1,), (1,)), ((), ())))
           + _dot(dk, wk_ref[...], (((1,), (1,)), ((), ())))
           + _dot(dv, wv_ref[...], (((1,), (1,)), ((), ()))))   # [Sp, E] f32

    if ln_eps is not None:
        xhat = xhat_scr[...]
        dln_ref[0:1] += jnp.sum(dxn * xhat, axis=0, keepdims=True)
        dln_ref[1:2] += jnp.sum(dxn, axis=0, keepdims=True)
        dxhat = dxn * lg_ref[...].astype(f32)
        h1 = jnp.mean(dxhat, axis=1, keepdims=True)
        h2 = jnp.mean(dxhat * xhat, axis=1, keepdims=True)
        dx = rstd * (dxhat - h1 - xhat * h2)
    else:
        dx = dxn
    if residual:
        dx = dx + gy.astype(f32)
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _bwd_viable(Sp: int, E: int, itemsize: int, has_ln: bool) -> bool:
    """VMEM upper bound for the backward kernel's resident set."""
    io = 2 * Sp * E * itemsize                    # x, gy in
    weights = 4 * E * E * itemsize + 5 * E * itemsize
    outs = (Sp * E + Sp * 3 * E + Sp * E) * itemsize + 8 * E * 4
    scr = 3 * Sp * E * itemsize + Sp * E * 4      # q/k/v + da f32
    if has_ln:
        scr += Sp * E * 4                         # xhat f32 (LN only)
    scores = 3 * Sp * Sp * 4                      # p, dp/ds live f32 tiles
    return (io + weights + outs + scr + scores) * 2 <= 24 * 1024 * 1024


def _block_bwd(ln_eps, s_valid, head_dim, interpret, residual, rate, res, g):
    x, wq, bq, wk, bk, wv, bv, wo, bo, ln_g, ln_b, seed = res
    B, Sp, E = x.shape
    has_ln = ln_eps is not None
    itemsize = jnp.dtype(x.dtype).itemsize
    dseed = np.zeros(seed.shape, jax.dtypes.float0)

    from .deberta_attention import _force_xla_bwd

    if not _bwd_viable(Sp, E, itemsize, has_ln) or _force_xla_bwd():
        # reference-vjp fallback (exceeds the kernel's VMEM budget, or
        # the SMM_PALLAS_BWD=0 A/B knob)
        xv = x[:, :s_valid]

        def ref(xr, wqr, bqr, wkr, bkr, wvr, bvr, wor, bor, gr, br):
            ln = (gr, br, ln_eps) if has_ln else None
            return _xla_reference(xr, wqr, bqr, wkr, bkr, wvr, bvr, wor,
                                  bor, num_heads=E // head_dim, ln=ln,
                                  residual=residual, seed=seed, rate=rate)

        _, vjp = jax.vjp(
            ref, xv, wq, bq.reshape(-1), wk, bk.reshape(-1), wv,
            bv.reshape(-1), wo, bo.reshape(-1), ln_g.reshape(-1),
            ln_b.reshape(-1))
        grads = vjp(g[:, :s_valid])
        dx = grads[0]
        pad = x.shape[1] - s_valid
        if pad:
            dx = jnp.pad(dx, ((0, 0), (0, pad), (0, 0)))
        out = [dx]
        for gr_ in grads[1:]:
            out.append(gr_.reshape(1, -1) if gr_.ndim == 1 else gr_)
        return tuple(out) + (dseed,)

    group = min(E, _round_up(head_dim, 128))
    bse = pl.BlockSpec((1, Sp, E), lambda b: (b, 0, 0))
    mat = pl.BlockSpec((E, E), lambda b: (0, 0))
    vec = pl.BlockSpec((1, E), lambda b: (0, 0))
    dx, dqkv, a, dln = pl.pallas_call(
        functools.partial(
            _bwd_kernel, scale=1.0 / float(np.sqrt(head_dim)),
            s_valid=s_valid, head_dim=head_dim, group=group,
            ln_eps=ln_eps, residual=residual, rate=rate,
            n_heads=E // head_dim),
        grid=(B,),
        in_specs=[bse, bse, mat, vec, mat, vec, mat, vec, mat, vec, vec,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[bse,
                   pl.BlockSpec((1, Sp, 3 * E), lambda b: (b, 0, 0)),
                   bse,
                   pl.BlockSpec((8, E), lambda b: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((B, Sp, E), x.dtype),
                   jax.ShapeDtypeStruct((B, Sp, 3 * E), x.dtype),
                   jax.ShapeDtypeStruct((B, Sp, E), x.dtype),
                   jax.ShapeDtypeStruct((8, E), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((Sp, E), x.dtype)] * 3
        + [pltpu.VMEM((Sp, E), jnp.float32)] * (2 if has_ln else 1),
        interpret=interpret,
    )(x, g, wq, bq, wk, bk, wv, bv, wo, ln_g, ln_b, seed)

    # Weight grads: (B, Sp)-contractions — one big MXU matmul each, fed by
    # the kernel's packed cotangents. xn is recomputed here (elementwise).
    if has_ln:
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        xn = ((xf - mu) * jax.lax.rsqrt(var + ln_eps)
              * ln_g.reshape(-1).astype(jnp.float32)
              + ln_b.reshape(-1).astype(jnp.float32)).astype(x.dtype)
    else:
        xn = x
    dW = jnp.einsum("bse,bsf->ef", xn, dqkv,
                    preferred_element_type=jnp.float32)
    dwq = dW[:, :E].astype(wq.dtype)
    dwk = dW[:, E : 2 * E].astype(wk.dtype)
    dwv = dW[:, 2 * E :].astype(wv.dtype)
    dwo = jnp.einsum("bse,bsf->ef", a, g,
                     preferred_element_type=jnp.float32).astype(wo.dtype)
    db = jnp.sum(dqkv.astype(jnp.float32), axis=(0, 1), keepdims=False)
    dbq = db[:E].reshape(1, E).astype(bq.dtype)
    dbk = db[E : 2 * E].reshape(1, E).astype(bk.dtype)
    dbv = db[2 * E :].reshape(1, E).astype(bv.dtype)
    dbo = jnp.sum(g.astype(jnp.float32), axis=(0, 1)).reshape(1, E).astype(
        bo.dtype)
    if has_ln:
        dln_g = dln[0].reshape(1, E).astype(ln_g.dtype)
        dln_b = dln[1].reshape(1, E).astype(ln_b.dtype)
    else:
        dln_g = jnp.zeros_like(ln_g)
        dln_b = jnp.zeros_like(ln_b)
    return (dx, dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo, dln_g, dln_b, dseed)


_block.defvjp(_block_fwd, _block_bwd)


def block_viable(S: int, H: int, D: int, E: int, itemsize: int = 2) -> bool:
    if D > 128 or 128 % min(D, 128) != 0:
        return False
    Sp = _pad_s(S, itemsize)
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
    ln: Optional[tuple] = None,
    residual: bool = False,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fused attention block over hidden states x [B, S, E].

    Weights in flax Dense layout: wq/wk/wv/wo [E, E], biases [E].
    ``ln=(scale, bias, eps)`` fuses a pre-LayerNorm of x into the kernel
    (LN output never touches HBM); ``residual=True`` fuses ``out += x``.
    Together they make the kernel the whole pre-LN attention sub-block:
    ``x + proj(attn(LN(x)))``. Returns [B, S, E] in x's dtype.

    dropout_rate > 0 applies attention-prob dropout IN-KERNEL from a
    stateless (dropout_seed, head, q, k) hash (`_drop_keep`) so the fused
    path serves the training step; the backward regenerates the identical
    mask. dropout_seed: scalar int32 (one per step from the flax RNG).
    """
    from .spmd import resolve_mesh

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rate = float(dropout_rate)
    if rate:
        if dropout_seed is None:
            raise ValueError("dropout_rate > 0 requires dropout_seed")
        seed = jnp.asarray(dropout_seed, jnp.int32).reshape(1)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    B, S, E = x.shape
    D = E // num_heads
    bq2, bk2, bv2, bo2 = (b.reshape(1, E) for b in (bq, bk, bv, bo))

    mesh, fallback = resolve_mesh(B, 1)  # heads stay whole per shard
    if fallback:
        return _xla_reference(x, wq, bq, wk, bk, wv, bv, wo, bo, num_heads,
                              ln=ln, residual=residual, seed=seed,
                              rate=rate)

    Sp = _pad_s(S, jnp.dtype(x.dtype).itemsize)
    if Sp != S:
        x = jnp.pad(x, ((0, 0), (0, Sp - S), (0, 0)))

    if ln is not None:
        ln_g, ln_b, ln_eps = ln
        ln_g = ln_g.reshape(1, E)
        ln_b = ln_b.reshape(1, E)
    else:  # dummies: custom_vjp wants arrays; bwd returns zero cotangents
        ln_g = jnp.zeros((1, E), x.dtype)
        ln_b = jnp.zeros((1, E), x.dtype)
        ln_eps = None

    def fn(x_, wq_, bq_, wk_, bk_, wv_, bv_, wo_, bo_, g_, b_, s_):
        if rate and mesh is not None:
            # decorrelate shards: the kernel hashes LOCAL batch indices
            s_ = s_ + (jax.lax.axis_index("data") * 1000003).astype(
                jnp.int32)
        return _block(x_, wq_, bq_, wk_, bk_, wv_, bv_, wo_, bo_, g_, b_,
                      s_, ln_eps, S, D, interpret, residual, rate)

    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        bse = P("data", None, None)
        rep = P()
        fn = shard_map(fn, mesh=mesh,
                       in_specs=(bse,) + (rep,) * 11, out_specs=bse,
                       check_vma=False)
    out = fn(x, wq, bq2, wk, bk2, wv, bv2, wo, bo2, ln_g, ln_b, seed)
    return out[:, :S]
