"""Fused wav2vec2 front-end: strided conv_0 → per-channel GroupNorm → GELU
in two streaming Pallas passes, never materializing the pre-norm activation.

Why: the first extractor stage dominates the audio encoder's cost on TPU.
At the base shape ([8, 160000] → [8, 31999, 512]) the conv output is
~262 MB bf16; the unfused XLA composition writes it, re-reads it for the
GroupNorm stats + normalize passes, and re-writes the GELU output —
~1.5 GB of HBM traffic for ~8 GFLOP of matmul (measured ~4 ms of the
5-6 ms extractor at base dims, tools/ probes, RESULTS.md round 4).
GroupNorm needs full-sequence statistics before a single output row can be
produced, so no local fusion can fix it; the fix is recompute: the conv is
a small matmul, cheap to run twice from the 5 MB waveform.

The conv matmul is NOT expressed per-frame ([rows, K] @ [K, C]): a K=10
contraction leaves the MXU idle and measured no faster than XLA's conv.
Instead FRAME GROUPS pack the contraction dimension: 8 consecutive frames
(span s·7+K = 45 samples, zero-padded to 128 lanes) form one row, and the
weight expands to a banded [128, 8·C] matrix W[i, f·C+c] = w[i−s·f, c] —
the kernel matmul is [rows, 128] @ [128, 4096] at full MXU tiling, and the
output lanes (f, c) reshape to the [T1, C] layout for free (bit-order
identical). The 128/45 contraction padding wastes only FLOPs, which are
nearly free here; the bytes are what matter.

- Pass 1 (stats): y = groups @ Wexp in f32 per (batch, row-tile);
  accumulate Σy and Σy² per (f, c) lane into [1, 4096] revisited blocks
  (TPU grids iterate the minor axis sequentially, so accumulation across
  row-tiles is well-defined). The final invalid frame (the framing
  overshoots the VALID conv length by one) is masked in-kernel.
- Between passes (tiny XLA): fold the [B, 8·C] lane moments over f to the
  [B, C] GroupNorm moments, build per-lane mean/rstd/affine vectors.
- Pass 2 (apply): recompute the same y tile, normalize, affine + GELU,
  write the [rows, 8·C] output once. Total traffic ≈ 2 reads of the
  group-framed waveform (~8 MB) + one output write (~262 MB) instead of
  ~1.5 GB.

Matches torch ``GroupNorm(num_groups=C, num_channels=C)`` after wav2vec2's
conv_0 (/root/reference/models/encoders.py:116 via HF Wav2Vec2
FeatureEncoder): per-(batch, channel) statistics over time, eps 1e-5,
affine scale+bias. The conv tile is rounded through the compute dtype
before the statistics so the fused path matches the XLA composition's
numerics (which computes the conv in bf16) rather than a higher-precision
variant of them.

Backward: custom VJP against the XLA reference composition — the forward
fusion is the serving/throughput win; the backward re-derives the same
~8 GFLOP of matmul plus elementwise work XLA already schedules well.

Framing requires K % stride == 0 (true for wav2vec2's K=10, s=5) and a
lane-aligned channel count; ``frontend_viable`` gates engagement, the
caller falls back to the XLA composition otherwise.
"""
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FG = 8     # frames per group (output lanes = _FG * C)
_SPAN = 128  # padded per-group contraction span (s*(_FG-1)+K must fit)
_ROWS = 256  # group-rows per program tile (= _ROWS*_FG frames)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _gelu(h, approximate: bool):
    return jax.nn.gelu(h, approximate=approximate)


def _group_frames(wav, K: int, s: int, ng: int, dtype):
    """[B, T] → group-framed [B, ng, _SPAN]: group g covers samples
    [g·s·_FG, g·s·_FG + s·(_FG-1)+K), zero-padded to _SPAN lanes."""
    B = wav.shape[0]
    gs = s * _FG                      # sample stride between groups
    span = s * (_FG - 1) + K          # real samples per group
    # the overhang view below reshapes a full (ng·gs)-sample slice starting
    # at gs, so the padded waveform must reach (ng+1)·gs samples
    need = (ng + 1) * gs
    pad = need - wav.shape[1]
    if pad > 0:
        wav = jnp.pad(wav, ((0, 0), (0, pad)))
    base = wav[:, : ng * gs].reshape(B, ng, gs)
    # the span overhang (K - s samples) comes from the NEXT group's window
    over = wav[:, gs : gs + ng * gs].reshape(B, ng, gs)[:, :, : span - gs]
    fr = jnp.concatenate([base, over], axis=-1)
    return jnp.pad(fr, ((0, 0), (0, 0), (0, _SPAN - span))).astype(dtype)


def _expand_weight(kernel, s: int, dtype):
    """Conv weight [K, 1, C] → banded [_SPAN, _FG·C]:
    W[i, f·C+c] = w[i − s·f, c] (zero outside the band)."""
    K, _, C = kernel.shape
    w = kernel.reshape(K, C).astype(jnp.float32)
    i = np.arange(_SPAN)[:, None]                    # [_SPAN, 1]
    f = np.arange(_FG)[None, :]                      # [1, _FG]
    tap = i - s * f                                  # [_SPAN, _FG]
    valid = (tap >= 0) & (tap < K)
    tap_c = jnp.asarray(np.clip(tap, 0, K - 1))
    # [_SPAN, _FG, C]: gather taps then mask the out-of-band entries
    wexp = w[tap_c] * jnp.asarray(valid, jnp.float32)[..., None]
    return wexp.reshape(_SPAN, _FG * C).astype(dtype)


def _stats_kernel(fr_ref, w_ref, sum_ref, sq_ref, *, cdtype, n_groups,
                  last_valid_f):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        sum_ref[...] = jnp.zeros_like(sum_ref)
        sq_ref[...] = jnp.zeros_like(sq_ref)

    y = jax.lax.dot_general(
        fr_ref[0], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # round through the compute dtype: the XLA path's GN sees the bf16
    # conv output, so the fused stats must too
    y = y.astype(cdtype).astype(jnp.float32)
    R, L = y.shape
    # mask trailing invalid frames: group rows beyond n_groups-1 entirely,
    # and lanes with f > last_valid_f on the final group row
    row = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0) + t * R
    f = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1) // (L // _FG)
    keep = (row < n_groups - 1) | (
        (row == n_groups - 1) & (f <= last_valid_f))
    y = jnp.where(keep, y, 0.0)
    sum_ref[0] += jnp.sum(y, axis=0, keepdims=True)
    sq_ref[0] += jnp.sum(y * y, axis=0, keepdims=True)


def _apply_kernel(fr_ref, w_ref, mean_ref, rstd_ref, g_ref, b_ref, out_ref,
                  *, approximate, cdtype):
    y = jax.lax.dot_general(
        fr_ref[0], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = y.astype(cdtype).astype(jnp.float32)
    z = (y - mean_ref[0]) * rstd_ref[0] * g_ref[...] + b_ref[...]
    out_ref[0] = _gelu(z, approximate).astype(out_ref.dtype)


def _fused_call(frames, wexp, n_groups, last_valid_f, interpret):
    B, ngp, S = frames.shape
    L = wexp.shape[1]
    nt = ngp // _ROWS
    fr_spec = pl.BlockSpec((1, _ROWS, S), lambda bb, t: (bb, t, 0))
    w_spec = pl.BlockSpec((S, L), lambda bb, t: (0, 0))
    ch_spec = pl.BlockSpec((1, 1, L), lambda bb, t: (bb, 0, 0))

    return pl.pallas_call(
        functools.partial(_stats_kernel, cdtype=frames.dtype,
                          n_groups=n_groups, last_valid_f=last_valid_f),
        grid=(B, nt),
        in_specs=[fr_spec, w_spec],
        out_specs=[ch_spec, ch_spec],
        out_shape=[jax.ShapeDtypeStruct((B, 1, L), jnp.float32)] * 2,
        interpret=interpret,
    )(frames, wexp)


def _apply_call(frames, wexp, mean, rstd, g, b, approximate, interpret):
    B, ngp, S = frames.shape
    L = wexp.shape[1]
    nt = ngp // _ROWS
    fr_spec = pl.BlockSpec((1, _ROWS, S), lambda bb, t: (bb, t, 0))
    w_spec = pl.BlockSpec((S, L), lambda bb, t: (0, 0))
    ch_spec = pl.BlockSpec((1, 1, L), lambda bb, t: (bb, 0, 0))
    vec_spec = pl.BlockSpec((1, L), lambda bb, t: (0, 0))

    return pl.pallas_call(
        functools.partial(_apply_kernel, approximate=approximate,
                          cdtype=frames.dtype),
        grid=(B, nt),
        in_specs=[fr_spec, w_spec, ch_spec, ch_spec, vec_spec, vec_spec],
        out_specs=pl.BlockSpec((1, _ROWS, L), lambda bb, t: (bb, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, ngp, L), frames.dtype),
        interpret=interpret,
    )(frames, wexp, mean, rstd, g, b)


def _xla_reference(wav, kernel, g, b, stride, eps, approximate, cdtype):
    """The unfused composition (conv → GroupNorm → GELU), used as the
    backward reference and the non-viable-shape fallback. Mirrors
    models/wav2vec2.FeatureEncoder's first stage exactly."""
    x = wav[..., None].astype(cdtype)
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(cdtype), window_strides=(stride,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    yf = y.astype(jnp.float32)
    mean = jnp.mean(yf, axis=1, keepdims=True)
    var = jnp.mean((yf - mean) ** 2, axis=1, keepdims=True)
    xhat = (yf - mean) * jax.lax.rsqrt(var + eps)
    z = xhat * g.astype(jnp.float32) + b.astype(jnp.float32)
    return _gelu(z, approximate).astype(cdtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _frontend(wav, kernel, g, b, stride, eps, approximate, cdtype,
              interpret):
    K, _, C = kernel.shape
    T = wav.shape[1]
    T1 = (T - K) // stride + 1                     # VALID conv length
    ng = -(-T1 // _FG)                             # groups covering T1
    ngp = _round_up(ng, _ROWS)
    last_valid_f = (T1 - 1) % _FG                  # final group's last frame
    frames = _group_frames(wav, K, stride, ng, cdtype)
    if ngp != ng:
        frames = jnp.pad(frames, ((0, 0), (0, ngp - ng), (0, 0)))
    wexp = _expand_weight(kernel, stride, cdtype)
    L = _FG * C

    s1, s2 = _fused_call(frames, wexp, ng, last_valid_f, interpret)
    # fold the per-(f, c) lane moments over f to GroupNorm's per-channel
    # moments, then broadcast back to per-lane vectors (tiny XLA ops)
    n = jnp.float32(T1)
    sum_c = s1.reshape(-1, _FG, C).sum(axis=1)     # [B, C]
    sq_c = s2.reshape(-1, _FG, C).sum(axis=1)
    mean_c = sum_c / n
    var_c = jnp.maximum(sq_c / n - mean_c * mean_c, 0.0)
    rstd_c = jax.lax.rsqrt(var_c + eps)
    mean = jnp.tile(mean_c, (1, _FG)).reshape(-1, 1, L)
    rstd = jnp.tile(rstd_c, (1, _FG)).reshape(-1, 1, L)
    gl = jnp.tile(g.astype(jnp.float32).reshape(1, C), (1, _FG))
    bl = jnp.tile(b.astype(jnp.float32).reshape(1, C), (1, _FG))

    out = _apply_call(frames, wexp, mean, rstd, gl, bl, approximate,
                      interpret)
    # [B, ngp, _FG*C] is bit-identical to [B, ngp*_FG, C] (f is the outer
    # lane index): reshape + trim to the valid conv length
    return out.reshape(out.shape[0], ngp * _FG, C)[:, :T1]


def _frontend_fwd(wav, kernel, g, b, stride, eps, approximate, cdtype,
                  interpret):
    out = _frontend(wav, kernel, g, b, stride, eps, approximate, cdtype,
                    interpret)
    return out, (wav, kernel, g, b)


def _frontend_bwd(stride, eps, approximate, cdtype, interpret, res, gy):
    wav, kernel, g, b = res

    def ref(wr, kr, gr, br):
        return _xla_reference(wr, kr, gr, br, stride, eps, approximate,
                              cdtype)

    _, vjp = jax.vjp(ref, wav, kernel, g, b)
    return vjp(gy)


_frontend.defvjp(_frontend_fwd, _frontend_bwd)


def frontend_viable(K: int, stride: int, C: int) -> bool:
    """Group framing needs K % stride == 0, the group span inside the
    padded contraction, and lane-aligned output groups. The tiny preset
    (C=16) runs the XLA path — it only exists on CPU."""
    span = stride * (_FG - 1) + K
    return (K % stride == 0 and span <= _SPAN
            and (_FG * C) % 128 == 0 and C >= 128)


def wav_frontend(
    wav: jnp.ndarray,
    kernel: jnp.ndarray,
    gn_scale: jnp.ndarray,
    gn_bias: jnp.ndarray,
    stride: int,
    eps: float = 1e-5,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused conv_0 → GroupNorm(C groups) → GELU over waveform [B, T].

    ``kernel`` is the flax ``nn.Conv`` weight [K, 1, C]; ``gn_scale`` /
    ``gn_bias`` the ``nn.GroupNorm`` affine [C]. Returns [B, T1, C] in the
    kernel's dtype with T1 = (T - K)//stride + 1. GELU follows
    ops/attention.gelu: tanh approximation for bf16, erf-exact for f32.
    """
    from .spmd import resolve_mesh

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    cdtype = kernel.dtype
    approximate = cdtype == jnp.bfloat16
    K, _, C = kernel.shape
    B = wav.shape[0]
    if not frontend_viable(K, stride, C):
        return _xla_reference(wav, kernel, gn_scale, gn_bias, stride, eps,
                              approximate, cdtype)

    mesh, fallback = resolve_mesh(B, 1)
    if fallback:
        return _xla_reference(wav, kernel, gn_scale, gn_bias, stride, eps,
                              approximate, cdtype)

    def fn(wav_, k_, g_, b_):
        return _frontend(wav_, k_, g_, b_, stride, eps, approximate,
                         cdtype, interpret)

    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        fn = shard_map(fn, mesh=mesh,
                       in_specs=(P("data", None), P(), P(), P()),
                       out_specs=P("data", None, None), check_vma=False)
    return fn(wav, kernel, gn_scale, gn_bias)
