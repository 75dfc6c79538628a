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

Backward: custom VJP against the XLA reference — the forward fusion is
what the serving/throughput path needs; the backward pays the same traffic
as the unfused path (the [rows, F] cotangent must reach the W1/W2 weight
grads either way, and an in-kernel [E, F]-f32 dW accumulator would not fit
VMEM next to both weight operands).

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


def _drop_keep(seed_ref, b, r0, shape, rate, salt):
    """Hidden-dropout keep mask over a [R, cols] tile: the stateless
    murmur hash of (seed + salt, global row, col) — same family as the
    attention kernels' `_hash_keep`, so fwd and the XLA-vjp backward
    regenerate identical masks without storing them. ``salt`` separates
    the intermediate and output dropout draws."""
    from .deberta_attention import _hash_keep

    row = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) + jnp.uint32(r0)
    col = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
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


def _ffn_bwd(ln_eps, ln_post, residual, R, interpret, rate_mid, rate_out,
             res, g):
    x, w1, b1, w2, b2, ln_g, ln_b, seed = res
    has_ln = ln_eps is not None

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
    return tuple(out) + (np.zeros(seed.shape, jax.dtypes.float0),)


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
