"""Fully-fused transformer FFN block: [pre-LN →] x@W1+b1 → GELU → @W2+b2
[→ +residual → post-LN], one Pallas program per (batch, row-tile).

Why: the FFN intermediate is the single largest remaining HBM tensor in the
forward once attention is fused. At the ViT stack shape ([240, 197, 768],
F=3072) the [rows, F] activation is ~290 MB bf16 per layer; XLA fuses the
GELU into the first matmul's epilogue but still materializes the
intermediate between the two matmuls — ~580 MB of write+read traffic per
layer at ~292 GB/s effective (≈2 ms), comparable to the FFN's entire MXU
time. Here the intermediate lives in VMEM: per row-tile, h = gelu(x@W1+b1)
is produced and consumed in-register/VMEM and only the [rows, E] output is
written. Matches the reference FFN semantics (torch Linear-act-Linear,
/root/reference/models/encoders.py:116,179 and HF ViT/DebertaV2/Wav2Vec2
intermediate+output blocks).

Layer-norm placement covers all three encoders:
- ``ln=(g, b, eps), ln_post=False``: ViT — out = x + W2·gelu(W1·LN(x))
  (pre-LN + residual fused; the LN output never touches HBM).
- ``ln=(g, b, eps), ln_post=True``: DeBERTa / wav2vec2 — out =
  LN(x + W2·gelu(W1·x)) (post-LN of the residual sum fused).
- ``ln=None``: bare FFN (+ optional residual).

GELU form follows ops/attention.gelu: tanh approximation for bf16 inputs,
erf-exact for f32 (the bf16 production path lowers as tanh on the VPU).

Backward: a dedicated Pallas bwd kernel exists (same recipe that won
round 4 for the attention kernels) but ships DEFAULT-OFF — the round-5
on-chip A/B measured it 438.9 vs 426.6 ms/step in the full train step
(and neutral isolated); opt in with SMM_FFN_BWD=1. Default backward is
jax.vjp of the unfused XLA reference. Kernel recipe, kept for shapes
where the trade may flip (larger F, longer rows): per (batch, row-tile)
it recomputes the LN/GELU
chain in VMEM with an F-chunked loop (the [rows, F] intermediate never
exists in f32 in HBM), applies the stateless-hash dropout replay, and
emits dx + the packed [rows, F] pre-GELU cotangent ``dh_pre`` (+``dy0``
for post-LN) + LN-param accumulators. The four weight-grad contractions
ride plain XLA matmuls over (B, S) outside (a per-batch grid cannot feed
the MXU a [E, F] reduction efficiently, and an in-kernel [E, F]-f32 dW
accumulator would not fit VMEM next to both weight operands). The [rows,
F] cotangent must reach the W1/W2 weight grads either way — what the
kernel removes vs the XLA-vjp-of-the-unfused-reference is the separate
materializations of the f32 intermediate, the gelu-saved pre-activation,
and the post-dropout copies, plus the fused LN backward. Falls back to
the reference-vjp when the residency exceeds VMEM (``_bwd_pick``), when
SMM_FFN_BWD is not "1" (the default), or under SMM_PALLAS_BWD=0.

Grid: (B, row-tiles). Weights are grid-constant blocks (fetched once, kept
resident). VMEM at base dims (E=768, F=3072, R=128, bf16): ~9.4 MB weights
+ ~2.7 MB tiles/scratch.
"""
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 13 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pad_rows(S: int, R: int) -> int:
    return _round_up(max(S, R), R)


def _gelu_f32(h, approximate: bool):
    return jax.nn.gelu(h, approximate=approximate)


def _ln_f32(xf, g, b, eps):
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) * (xf - mu), axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * g + b


def _drop_keep(seed_ref, b, r0, shape, rate, salt, c0=0):
    """Hidden-dropout keep mask over a [R, cols] tile: the stateless
    murmur hash of (seed + salt, global row, col) — same family as the
    attention kernels' `_hash_keep`, so fwd and the Pallas/XLA backwards
    regenerate identical masks without storing them. ``salt`` separates
    the intermediate and output dropout draws; ``c0`` offsets the column
    index for F-chunked tiles (bwd kernel)."""
    from .deberta_attention import _hash_keep

    row = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) + jnp.uint32(r0)
    col = jax.lax.broadcasted_iota(jnp.uint32, shape, 1) + jnp.uint32(c0)
    return _hash_keep(jnp.uint32(seed_ref[0]) + np.uint32(salt),
                      jnp.uint32(b), row, col, rate)


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, seed_ref, *rest,
            ln_eps, ln_post, residual, approximate, rate_mid, rate_out, R):
    """``rest``: [g_ref, b_ref,] o_ref."""
    if ln_eps is not None:
        g_ref, b_ref = rest[0], rest[1]
        rest = rest[2:]
    (o_ref,) = rest
    b = pl.program_id(0)
    r0 = pl.program_id(1) * R
    x = x_ref[0]                                   # [R, E]
    f32 = jnp.float32
    xf = x.astype(f32)

    if ln_eps is not None and not ln_post:
        xin = _ln_f32(xf, g_ref[...].astype(f32), b_ref[...].astype(f32),
                      ln_eps).astype(x.dtype)
    else:
        xin = x

    h = jax.lax.dot_general(xin, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)
    h = _gelu_f32(h + b1_ref[...].astype(f32), approximate)
    if rate_mid:
        h = jnp.where(_drop_keep(seed_ref, b, r0, h.shape, rate_mid, 1),
                      h * (1.0 / (1.0 - rate_mid)), 0.0)
    y = jax.lax.dot_general(h.astype(x.dtype), w2_ref[...],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)
    y = y + b2_ref[...].astype(f32)
    if rate_out:
        y = jnp.where(_drop_keep(seed_ref, b, r0, y.shape, rate_out, 2),
                      y * (1.0 / (1.0 - rate_out)), 0.0)
    if residual:
        y = y + xf
    if ln_eps is not None and ln_post:
        y = _ln_f32(y, g_ref[...].astype(f32), b_ref[...].astype(f32),
                    ln_eps)
    o_ref[0] = y.astype(o_ref.dtype)


def _fused_call(x, w1, b1, w2, b2, seed, rate_mid, rate_out, ln, ln_post,
                residual, R, interpret):
    B, Sp, E = x.shape
    F = w1.shape[1]
    approximate = jnp.dtype(x.dtype) == jnp.bfloat16
    ln_eps = None if ln is None else ln[2]
    operands = [x, w1, b1, w2, b2, seed]
    in_specs = [pl.BlockSpec((1, R, E), lambda b, r: (b, r, 0)),
                pl.BlockSpec((E, F), lambda b, r: (0, 0)),
                pl.BlockSpec((1, F), lambda b, r: (0, 0)),
                pl.BlockSpec((F, E), lambda b, r: (0, 0)),
                pl.BlockSpec((1, E), lambda b, r: (0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM)]
    if ln is not None:
        operands += [ln[0].reshape(1, E), ln[1].reshape(1, E)]
        in_specs += [pl.BlockSpec((1, E), lambda b, r: (0, 0))] * 2
    return pl.pallas_call(
        functools.partial(_kernel, ln_eps=ln_eps, ln_post=ln_post,
                          residual=residual, approximate=approximate,
                          rate_mid=rate_mid, rate_out=rate_out, R=R),
        grid=(B, Sp // R),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, R, E), lambda b, r: (b, r, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Sp, E), x.dtype),
        interpret=interpret,
    )(*operands)


def _ref_drop(y, seed, rate, salt):
    """Elementwise-identical XLA evaluation of the kernel's hidden-dropout
    hash over a full [B, S, C] tensor (global row index = s, batch = b)."""
    from .deberta_attention import _hash_keep

    u32 = jnp.uint32
    bi = jax.lax.broadcasted_iota(u32, y.shape, 0)
    ri = jax.lax.broadcasted_iota(u32, y.shape, 1)
    ci = jax.lax.broadcasted_iota(u32, y.shape, 2)
    keep = _hash_keep(u32(seed.reshape(())) + np.uint32(salt), bi, ri, ci,
                      rate)
    return jnp.where(keep, y * (1.0 / (1.0 - rate)), 0.0)


def _xla_reference(x, w1, b1, w2, b2, ln=None, ln_post=False,
                   residual=True, seed=None, rate_mid=0.0, rate_out=0.0):
    """Same math in plain XLA — kernel ground truth and the VJP backward."""
    f32 = jnp.float32
    approximate = jnp.dtype(x.dtype) == jnp.bfloat16
    xf = x.astype(f32)
    if ln is not None and not ln_post:
        g, b, eps = ln
        xin = _ln_f32(xf, g.reshape(-1).astype(f32),
                      b.reshape(-1).astype(f32), eps).astype(x.dtype)
    else:
        xin = x
    h = jnp.einsum("bse,ef->bsf", xin, w1,
                   preferred_element_type=f32) + b1.reshape(-1).astype(f32)
    h = _gelu_f32(h, approximate)
    if rate_mid:
        h = _ref_drop(h, seed, rate_mid, 1)
    h = h.astype(x.dtype)
    y = jnp.einsum("bsf,fe->bse", h, w2,
                   preferred_element_type=f32) + b2.reshape(-1).astype(f32)
    if rate_out:
        y = _ref_drop(y, seed, rate_out, 2)
    if residual:
        y = y + xf
    if ln is not None and ln_post:
        g, b, eps = ln
        y = _ln_f32(y, g.reshape(-1).astype(f32),
                    b.reshape(-1).astype(f32), eps)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13, 14))
def _ffn(x, w1, b1, w2, b2, ln_g, ln_b, seed,
         ln_eps, ln_post, residual, R, interpret, rate_mid, rate_out):
    ln = None if ln_eps is None else (ln_g, ln_b, ln_eps)
    return _fused_call(x, w1, b1, w2, b2, seed, rate_mid, rate_out, ln,
                       ln_post, residual, R, interpret)


def _ffn_fwd(x, w1, b1, w2, b2, ln_g, ln_b, seed,
             ln_eps, ln_post, residual, R, interpret, rate_mid, rate_out):
    out = _ffn(x, w1, b1, w2, b2, ln_g, ln_b, seed, ln_eps, ln_post,
               residual, R, interpret, rate_mid, rate_out)
    return out, (x, w1, b1, w2, b2, ln_g, ln_b, seed)


def _force_ffn_xla_bwd() -> bool:
    """The dedicated FFN Pallas backward is OPT-IN (SMM_FFN_BWD=1);
    default is the reference-vjp fallback. Round-5 interleaved
    same-process A/B on-chip (tools/ab_ffn_bwd.py, v5e, B=8 flagship):
    Pallas bwd 438.9 ms/step vs vjp 426.6 ms/step median, identical
    losses — the kernel is correct but loses in-context (and is neutral
    at best isolated: 144–148 vs 144 ms on the bare 12-layer stack).
    XLA's vjp of the *unfused* reference already overlaps the weight-grad
    contractions with the dx chain; the kernel serializes them behind the
    custom call. Same isolated≠in-context lesson as flash-fwd (round 3).
    SMM_PALLAS_BWD=0 still switches all bwd kernels at once."""
    import os

    return os.environ.get("SMM_FFN_BWD", "0") != "1"


def _bwd_pick(Sp: int, E: int, F: int, itemsize: int, ln_post: bool):
    """(row-tile Rb, F-chunk Fc) for the bwd kernel, or None if nothing
    fits the VMEM envelope. Largest-first so the MXU sees full 128-row
    passes and the chunk loop stays short. Budget items: resident W1+W2,
    double-buffered streams (x, gy, dx, dh_pre [+dy0 post-LN]), and the
    f32 scratch (dxn accumulator, dy0 copy, per-chunk hp/dh tiles
    [+ysum/yhat for post-LN]). 15.5 MB against the 16 MB scoped limit —
    the fwd kernel ships at ~14.5 estimated and holds on-chip."""
    rbs = [Sp] if Sp <= 256 else [r for r in (256, 128) if Sp % r == 0]
    fcs = [c for c in (1024, 512, 256, 128) if F % c == 0] or [F]
    for Rb in rbs:
        for Fc in fcs:
            w = 2 * E * F * itemsize
            streams = (3 * Rb * E + Rb * F
                       + (Rb * E if ln_post else 0)) * itemsize * 2
            scratch = Rb * E * 4 + Rb * E * itemsize + 2 * Rb * Fc * 4
            if ln_post:
                scratch += 2 * Rb * E * 4
            if w + streams + scratch <= int(15.5 * 1024 * 1024):
                return Rb, Fc
    return None


def _bwd_kernel(x_ref, g_ref, w1_ref, b1_ref, w2_ref, b2_ref, lg_ref,
                lb_ref, seed_ref, *outs,
                ln_eps, ln_post, residual, approximate, rate_mid, rate_out,
                Rb, Fc):
    """``outs``: dx_ref, dhp_ref, dln_ref [, dy0_ref if ln_post].

    Recomputes the forward chain per row-tile with weights resident and
    the [Rb, F] intermediate visited one [Rb, Fc] f32 chunk at a time
    (never whole in f32), replays the hash-dropout masks, and emits:
    dx, the pre-GELU cotangent dh_pre (the one [rows, F] tensor the
    weight grads genuinely need in HBM), dln (dg/db rows of an [8, E]
    f32 accumulator across the grid), and — post-LN only — dy0 (the
    cotangent at the second matmul's output, which needs the in-kernel
    LN backward to exist). GELU's derivative comes from jax.vjp of the
    same `_gelu_f32` the forward uses, so the Pallas and reference
    backwards are derivative-form-identical."""
    if ln_post:
        dx_ref, dhp_ref, dln_ref, dy0_ref = outs
    else:
        dx_ref, dhp_ref, dln_ref = outs
    b = pl.program_id(0)
    r = pl.program_id(1)
    r0 = r * Rb
    f32 = jnp.float32
    x = x_ref[0]                                    # [Rb, E]
    gy = g_ref[0].astype(f32)                       # zero on padded rows
    E = x.shape[1]
    F = w1_ref.shape[1]
    xf = x.astype(f32)

    @pl.when((b == 0) & (r == 0))
    def _():
        dln_ref[...] = jnp.zeros(dln_ref.shape, dln_ref.dtype)

    if ln_eps is not None and not ln_post:
        mu = jnp.mean(xf, axis=1, keepdims=True)
        var = jnp.mean((xf - mu) * (xf - mu), axis=1, keepdims=True)
        rstd = jax.lax.rsqrt(var + ln_eps)
        xhat = (xf - mu) * rstd
        xn = (xhat * lg_ref[...].astype(f32)
              + lb_ref[...].astype(f32)).astype(x.dtype)
    else:
        xn = x

    gelu = functools.partial(_gelu_f32, approximate=approximate)

    if ln_post:
        # pass 1: rebuild y0 = drop_mid(gelu(xn@W1+b1)) @ W2 + b2 so the
        # output-LN backward has its statistics
        y0 = jnp.zeros((Rb, E), f32)
        for f0 in range(0, F, Fc):
            hp_c = (jax.lax.dot_general(
                xn, w1_ref[:, f0:f0 + Fc], (((1,), (0,)), ((), ())),
                preferred_element_type=f32)
                + b1_ref[0, f0:f0 + Fc].astype(f32))
            h_c = gelu(hp_c)
            if rate_mid:
                h_c = jnp.where(
                    _drop_keep(seed_ref, b, r0, h_c.shape, rate_mid, 1, f0),
                    h_c * (1.0 / (1.0 - rate_mid)), 0.0)
            y0 = y0 + jax.lax.dot_general(
                h_c.astype(x.dtype), w2_ref[f0:f0 + Fc, :],
                (((1,), (0,)), ((), ())), preferred_element_type=f32)
        y0 = y0 + b2_ref[...].astype(f32)
        if rate_out:
            keep_o = _drop_keep(seed_ref, b, r0, y0.shape, rate_out, 2)
            y1 = jnp.where(keep_o, y0 * (1.0 / (1.0 - rate_out)), 0.0)
        else:
            y1 = y0
        ysum = y1 + xf if residual else y1
        mu2 = jnp.mean(ysum, axis=1, keepdims=True)
        var2 = jnp.mean((ysum - mu2) * (ysum - mu2), axis=1, keepdims=True)
        rstd2 = jax.lax.rsqrt(var2 + ln_eps)
        yhat = (ysum - mu2) * rstd2
        dln_ref[0:1] += jnp.sum(gy * yhat, axis=0, keepdims=True)
        dln_ref[1:2] += jnp.sum(gy, axis=0, keepdims=True)
        dyhat = gy * lg_ref[...].astype(f32)
        dysum = rstd2 * (dyhat
                         - jnp.mean(dyhat, axis=1, keepdims=True)
                         - yhat * jnp.mean(dyhat * yhat, axis=1,
                                           keepdims=True))
        dx_tail = dysum if residual else None
        dy1 = dysum
    else:
        dy1 = gy
        dx_tail = gy if residual else None
    if rate_out:
        dy0 = jnp.where(_drop_keep(seed_ref, b, r0, dy1.shape, rate_out, 2),
                        dy1 * (1.0 / (1.0 - rate_out)), 0.0)
    else:
        dy0 = dy1
    if ln_post:
        dy0_ref[0] = dy0.astype(dy0_ref.dtype)
    dy0_b = dy0.astype(x.dtype)

    dxn = jnp.zeros((Rb, E), f32)
    for f0 in range(0, F, Fc):
        hp_c = (jax.lax.dot_general(
            xn, w1_ref[:, f0:f0 + Fc], (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
            + b1_ref[0, f0:f0 + Fc].astype(f32))
        _, gelu_vjp = jax.vjp(gelu, hp_c)
        dh_c = jax.lax.dot_general(dy0_b, w2_ref[f0:f0 + Fc, :],
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)
        if rate_mid:
            dh_c = jnp.where(
                _drop_keep(seed_ref, b, r0, dh_c.shape, rate_mid, 1, f0),
                dh_c * (1.0 / (1.0 - rate_mid)), 0.0)
        dhp_b = gelu_vjp(dh_c)[0].astype(x.dtype)
        dhp_ref[0, :, f0:f0 + Fc] = dhp_b
        dxn = dxn + jax.lax.dot_general(dhp_b, w1_ref[:, f0:f0 + Fc],
                                        (((1,), (1,)), ((), ())),
                                        preferred_element_type=f32)
    if ln_eps is not None and not ln_post:
        dln_ref[0:1] += jnp.sum(dxn * xhat, axis=0, keepdims=True)
        dln_ref[1:2] += jnp.sum(dxn, axis=0, keepdims=True)
        dxhat = dxn * lg_ref[...].astype(f32)
        dx = rstd * (dxhat
                     - jnp.mean(dxhat, axis=1, keepdims=True)
                     - xhat * jnp.mean(dxhat * xhat, axis=1, keepdims=True))
    else:
        dx = dxn
    if dx_tail is not None:
        dx = dx + dx_tail
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _ffn_bwd(ln_eps, ln_post, residual, R, interpret, rate_mid, rate_out,
             res, g):
    x, w1, b1, w2, b2, ln_g, ln_b, seed = res
    has_ln = ln_eps is not None
    B, Sp, E = x.shape
    F = w1.shape[1]
    itemsize = jnp.dtype(x.dtype).itemsize
    dseed = np.zeros(seed.shape, jax.dtypes.float0)

    from .deberta_attention import _force_xla_bwd

    pick = _bwd_pick(Sp, E, F, itemsize, ln_post and has_ln)
    aligned = interpret or (E % 128 == 0 and F % 128 == 0)
    if pick is None or not aligned or _force_xla_bwd() or _force_ffn_xla_bwd():
        # reference-vjp fallback (VMEM envelope / lane alignment / A/B knob)
        def ref(xr, w1r, b1r, w2r, b2r, gr, br):
            ln = (gr, br, ln_eps) if has_ln else None
            return _xla_reference(xr, w1r, b1r, w2r, b2r, ln=ln,
                                  ln_post=ln_post, residual=residual,
                                  seed=seed, rate_mid=rate_mid,
                                  rate_out=rate_out)

        _, vjp = jax.vjp(ref, x, w1, b1.reshape(-1), w2, b2.reshape(-1),
                         ln_g.reshape(-1), ln_b.reshape(-1))
        grads = vjp(g)
        out = [grads[0]]
        for gr_ in grads[1:]:
            out.append(gr_.reshape(1, -1) if gr_.ndim == 1 else gr_)
        return tuple(out) + (dseed,)

    Rb, Fc = pick
    f32 = jnp.float32
    approximate = jnp.dtype(x.dtype) == jnp.bfloat16
    post = ln_post and has_ln
    bse = pl.BlockSpec((1, Rb, E), lambda b, r: (b, r, 0))
    bsf = pl.BlockSpec((1, Rb, F), lambda b, r: (b, r, 0))
    out_specs = [bse, bsf, pl.BlockSpec((8, E), lambda b, r: (0, 0))]
    out_shape = [jax.ShapeDtypeStruct((B, Sp, E), x.dtype),
                 jax.ShapeDtypeStruct((B, Sp, F), x.dtype),
                 jax.ShapeDtypeStruct((8, E), f32)]
    if post:
        out_specs.append(bse)
        out_shape.append(jax.ShapeDtypeStruct((B, Sp, E), x.dtype))
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, ln_eps=ln_eps, ln_post=post,
                          residual=residual, approximate=approximate,
                          rate_mid=rate_mid, rate_out=rate_out, Rb=Rb,
                          Fc=Fc),
        grid=(B, Sp // Rb),
        in_specs=[bse, bse,
                  pl.BlockSpec((E, F), lambda b, r: (0, 0)),
                  pl.BlockSpec((1, F), lambda b, r: (0, 0)),
                  pl.BlockSpec((F, E), lambda b, r: (0, 0)),
                  pl.BlockSpec((1, E), lambda b, r: (0, 0)),
                  pl.BlockSpec((1, E), lambda b, r: (0, 0)),
                  pl.BlockSpec((1, E), lambda b, r: (0, 0)),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(x, g, w1, b1, w2, b2, ln_g, ln_b, seed)
    if post:
        dx, dhp, dln, dy0 = outs
        dy0 = dy0.astype(f32)
    else:
        dx, dhp, dln = outs

    # weight grads: (B, Sp)-contractions as big XLA matmuls. xn and h_d
    # are recomputed here (one matmul + elementwise — the same recompute
    # a remat'd vjp pays); padded rows carry zero cotangents from the
    # kernel, so they contribute nothing.
    if has_ln and not ln_post:
        xf = x.astype(f32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        xn = ((xf - mu) * jax.lax.rsqrt(var + ln_eps)
              * ln_g.reshape(-1).astype(f32)
              + ln_b.reshape(-1).astype(f32)).astype(x.dtype)
    else:
        xn = x
    dw1 = jnp.einsum("bse,bsf->ef", xn, dhp,
                     preferred_element_type=f32).astype(w1.dtype)
    db1 = jnp.sum(dhp.astype(f32), axis=(0, 1)).reshape(1, F).astype(
        b1.dtype)
    hp = (jnp.einsum("bse,ef->bsf", xn, w1, preferred_element_type=f32)
          + b1.reshape(-1).astype(f32))
    h = _gelu_f32(hp, approximate)
    if rate_mid:
        h = _ref_drop(h, seed, rate_mid, 1)
    h_d = h.astype(x.dtype)
    if not post:
        dy0 = g.astype(f32)
        if rate_out:
            dy0 = _ref_drop(dy0, seed, rate_out, 2)
    dw2 = jnp.einsum("bsf,bse->fe", h_d, dy0,
                     preferred_element_type=f32).astype(w2.dtype)
    db2 = jnp.sum(dy0, axis=(0, 1)).reshape(1, E).astype(b2.dtype)
    if has_ln:
        dln_g = dln[0:1].astype(ln_g.dtype)
        dln_b = dln[1:2].astype(ln_b.dtype)
    else:
        dln_g = jnp.zeros_like(ln_g)
        dln_b = jnp.zeros_like(ln_b)
    return (dx, dw1, db1, dw2, db2, dln_g, dln_b, dseed)


_ffn.defvjp(_ffn_fwd, _ffn_bwd)


def _pick_rows(S: int, E: int, F: int, itemsize: int) -> int:
    """Row-tile R: prefer ONE sublane-padded tile per batch row (no padded
    rows beyond the sublane multiple — rows are where the FFN FLOPs scale,
    cf. attention_block._pad_s), falling back to 256/128 tiling for longer
    sequences. Returns 0 when even R=128 exceeds VMEM."""
    weights = (E * F + F * E) * itemsize

    def fits(R, budget):
        tiles = 2 * R * E * itemsize * 2          # x/out double-buffered
        inter = R * F * 4 + R * F * itemsize      # h f32 + compute-dtype copy
        return weights + tiles + inter <= budget

    sub = 8 if itemsize >= 4 else 16
    single = _round_up(max(S, 128), sub)
    # single-tile gets a slightly relaxed budget: no second tile is ever
    # live, so the double-buffer share of the estimate is pessimistic
    if fits(single, _VMEM_BUDGET + 2 * 1024 * 1024):
        return single
    for R in (256, 128):
        if fits(R, _VMEM_BUDGET):
            return R
    return 0


def ffn_viable(S: int, E: int, F: int, itemsize: int = 2) -> bool:
    return _pick_rows(S, E, F, itemsize) > 0


def ffn_block(
    x: jnp.ndarray,
    w1: jnp.ndarray, b1: jnp.ndarray,
    w2: jnp.ndarray, b2: jnp.ndarray,
    ln: Optional[tuple] = None,
    ln_post: bool = False,
    residual: bool = True,
    interpret: Optional[bool] = None,
    dropout_rate_mid: float = 0.0,
    dropout_rate_out: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fused FFN block over hidden states x [B, S, E].

    w1 [E, F], b1 [F], w2 [F, E], b2 [E] in flax Dense layout.
    ``ln=(scale, bias, eps)``: pre-LN when ``ln_post=False`` (ViT),
    post-LN of the residual sum when ``ln_post=True`` (DeBERTa/wav2vec2).
    Returns [B, S, E] in x's dtype.

    ``dropout_rate_mid`` drops post-GELU intermediate activations
    (wav2vec2's intermediate_dropout); ``dropout_rate_out`` drops the FFN
    output BEFORE the residual add (all three encoders' hidden dropout).
    Both run in-kernel from a stateless hash so the fused path serves
    training; ``dropout_seed`` is a scalar int32 per step.
    """
    from .spmd import resolve_mesh

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rate_mid = float(dropout_rate_mid)
    rate_out = float(dropout_rate_out)
    if rate_mid or rate_out:
        if dropout_seed is None:
            raise ValueError("dropout rates > 0 require dropout_seed")
        seed = jnp.asarray(dropout_seed, jnp.int32).reshape(1)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    B, S, E = x.shape
    F = w1.shape[1]
    b1r = b1.reshape(1, F)
    b2r = b2.reshape(1, E)

    mesh, fallback = resolve_mesh(B, 1)
    if fallback:
        return _xla_reference(x, w1, b1, w2, b2, ln=ln, ln_post=ln_post,
                              residual=residual, seed=seed,
                              rate_mid=rate_mid, rate_out=rate_out)

    R = _pick_rows(S, E, F, jnp.dtype(x.dtype).itemsize)
    if not R:  # shape exceeds the VMEM budget: plain XLA composition
        return _xla_reference(x, w1, b1, w2, b2, ln=ln, ln_post=ln_post,
                              residual=residual, seed=seed,
                              rate_mid=rate_mid, rate_out=rate_out)
    Sp = _pad_rows(S, R)
    if Sp != S:
        x = jnp.pad(x, ((0, 0), (0, Sp - S), (0, 0)))

    if ln is not None:
        ln_g, ln_b, ln_eps = ln
        ln_g = ln_g.reshape(1, E)
        ln_b = ln_b.reshape(1, E)
    else:
        ln_g = jnp.zeros((1, E), x.dtype)
        ln_b = jnp.zeros((1, E), x.dtype)
        ln_eps = None

    def fn(x_, w1_, b1_, w2_, b2_, g_, b_, s_):
        if (rate_mid or rate_out) and mesh is not None:
            # decorrelate shards: the kernel hashes LOCAL batch indices
            s_ = s_ + (jax.lax.axis_index("data") * 1000003).astype(
                jnp.int32)
        return _ffn(x_, w1_, b1_, w2_, b2_, g_, b_, s_, ln_eps, ln_post,
                    residual, R, interpret, rate_mid, rate_out)

    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        bse = P("data", None, None)
        rep = P()
        fn = shard_map(fn, mesh=mesh, in_specs=(bse,) + (rep,) * 7,
                       out_specs=bse, check_vma=False)
    out = fn(x, w1, b1r, w2, b2r, ln_g, ln_b, seed)
    return out[:, :S]
