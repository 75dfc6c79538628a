"""Fused DeBERTa disentangled attention — one Pallas kernel per layer.

Computes softmax((Q·Kᵀ + c2p + p2c)/√(3D) + mask)·V where c2p/p2c are
DeBERTa-v2/v3's content↔position bias terms (the workload of
/root/reference/models/encoders.py:20, HF DebertaV2 DisentangledSelfAttention),
WITHOUT materializing any [B, H, S, S] tensor in HBM.

Why this exists (v5e, measured round 2): the XLA path realizes the bias via
one-hot einsums whose [S, S, 2·span] selection constants stream ~536 MB of
HBM per layer at S=512 — the text encoder was 24.3 ms at ~292 GB/s effective
bandwidth while the MXU sat idle. Here the bias is computed per head-group
tile in VMEM:

1.  The bucketed position tables are pre-gathered OUTSIDE the kernel into
    *relative-offset order*: ``T[u] = pos[clip(bucket(r(u)) + span)]`` with
    ``r(u) = (S_rows - 1) - u`` — a tiny [W, H, D] gather of the [2·span, H, D]
    projection table (XLA handles it; W ≈ 2S).
2.  In-kernel, per 128-row block: one MXU matmul against a static window of
    the table gives ``x[r, w] = row_r · T[off + w]``; the bias tile
    ``y[r, c] = x[r, c + 127 - r]`` is a Toeplitz (diagonal-band) extraction.
3.  The extraction runs as a *binary-decomposed per-column circular roll
    down the sublane axis*: 7 static ``pltpu.roll`` passes gated by the bits
    of a column iota, then a static slice. Alternatives measured on-chip:
    reshape-based skews and per-row dynamic slices do NOT lower in Mosaic
    (compiler-rejected); per-row LANE rolls lower but are ~2× slower than
    the sublane form; rolls only exist for 32-bit data. See RESULTS.md.
4.  c2p's column tiles land transposed and pay one VMEM swapaxes per
    128-column block (~free); p2c's land in [q, k] orientation directly.

The only HBM traffic is q/k/v/out + the small tables: ~50 MB/layer vs
~600 MB/layer for the XLA path.

Backward: a second Pallas kernel (grid transposed to (head-group, batch) so
the table cotangents accumulate in a resident VMEM block across the batch)
recomputes scores/probs in VMEM from the saved q/k/v and emits dq/dk/dv plus
the position-table cotangents via the inverse skew (`_unskew_cols`) — the
XLA-vjp fallback it replaces materialized the [B, H, S, S] probability and
score cotangents in HBM (~600 MB/layer at base dims). Falls back to the XLA
vjp when the residency exceeds VMEM (`_bwd_viable`).

Attention dropout runs IN-KERNEL as a counter-based murmur-mixed hash of
(seed, head, q, k) — stateless, so the backward regenerates the identical
keep mask instead of storing a [B, H, S, S] mask tensor. This is what lets
the fused path serve the TRAINING step (the reference trains with
attention_probs_dropout_prob = 0.1: /root/reference/models/encoders.py:20 →
HF DebertaV2); rate 0 compiles the hash out entirely.

Grid: one program per (batch, head-group); the whole sequence lives in VMEM
(gated to padded S ≤ ~1k — covers every reference shape, 512 + prompts).
"""
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_VMEM_BUDGET = 11 * 1024 * 1024
_QBLOCK = 128  # row-block for the skew (7 roll passes; static table windows)


def _force_xla_bwd() -> bool:
    """SMM_PALLAS_BWD=0 routes every custom-VJP backward through the XLA
    reference vjp instead of the dedicated Pallas bwd kernels — the A/B
    knob for measuring the bwd kernels in-context (and a safety valve)."""
    import os

    return os.environ.get("SMM_PALLAS_BWD", "1") == "0"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _head_group(H, Sq, Sk, D, itemsize) -> int:
    """Largest divisor of H whose per-program buffers fit the VMEM budget."""
    W = Sq + Sk
    for g in range(H, 0, -1):
        if H % g:
            continue
        qkv = 3 * g * max(Sq, Sk) * D * itemsize * 2  # double-buffered
        tables = 2 * g * W * D * itemsize * 2
        scores = g * Sq * Sk * 4  # f32 scratch
        # skew temps: [G, W*, 128] f32 column tiles (a few live at once)
        windows = 3 * g * (max(Sq, Sk) + _QBLOCK) * _QBLOCK * 4
        if qkv + tables + scores + windows <= _VMEM_BUDGET:
            return g
    return 0  # not even g=1 fits: caller must take the XLA path


def _skew_cols(x, n_rows, interpret):
    """x [G, W, C] → y [G, n_rows, C] with y[g, r, c] = x[g, r + (C-1) - c, c].

    Toeplitz band extraction as a per-COLUMN circular roll down the SUBLANE
    axis by the column index (binary-decomposed static ``pltpu.roll`` passes
    gated by the bits of a column iota — Mosaic supports only static
    shifts), then a static sublane slice: rolled[g, w, c] =
    x[g, (w - c) mod W, c], so rolled[g, r + C - 1, c] = x[g, r + C-1 - c, c]
    (index ≥ 0 ∀ r,c — no wraparound contamination).

    Measured v5e note: sublane rolls on the [G, W, 128] column-tile layout
    beat the equivalent per-row LANE rolls on [G, 128, W] by ~2× in the full
    kernel (0.54 vs 0.77+ ms/layer at base dims) — and only 32-bit data can
    rotate (Mosaic: "Rotate with non-32-bit data" is unimplemented), so the
    skew runs on the f32 accumulators.
    """
    G, W, C = x.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (G, W, C), 2)
    bits = 0
    while (1 << bits) < C:
        bits += 1
    for b in range(bits):
        sh = 1 << b
        if interpret:
            rolled = jnp.roll(x, sh, axis=1)
        else:
            rolled = pltpu.roll(x, sh, 1)
        x = jnp.where((cols & sh) != 0, rolled, x)
    return x[:, C - 1 : C - 1 + n_rows, :]


def _unskew_cols(y, W, interpret):
    """Adjoint of `_skew_cols`: y [G, R, C] → x [G, W, C] with
    x[g, w, c] = y[g, w − (C−1) + c, c] where that row exists, else 0.

    Zero-pad y to W rows at offset C−1 (undoing the forward's static
    slice), then per-column circular roll UP by the column index — the
    inverse rotation, binary-decomposed over the bits of a column iota
    like the forward. Requires W ≥ R + C − 1 (the forward's no-wraparound
    condition); wrapped reads land in the top zero padding, so the
    circular roll introduces no contamination.
    """
    G, R, C = y.shape
    x = jnp.concatenate(
        [jnp.zeros((G, C - 1, C), y.dtype), y,
         jnp.zeros((G, W - R - (C - 1), C), y.dtype)], axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (G, W, C), 2)
    bits = 0
    while (1 << bits) < C:
        bits += 1
    for b in range(bits):
        sh = 1 << b
        if interpret:
            rolled = jnp.roll(x, -sh, axis=1)
        else:
            rolled = pltpu.roll(x, W - sh, 1)
        x = jnp.where((cols & sh) != 0, rolled, x)
    return x


def _hash_keep(seed_u32, head_u32, q_u32, k_u32, rate: float):
    """Stateless dropout keep-mask: murmur3-finalizer hash of
    (seed, global head, query index, key index) → keep with prob 1−rate.

    Pure uint32 VPU ops so the identical mask is recomputable in the
    backward kernel AND in `_xla_reference` (the vjp fallback) without
    ever storing a [B, H, S, S] mask. Golden-ratio / murmur multiplier
    constants; the finalizer passes avalanche well enough for dropout.
    """
    u32 = np.uint32
    x = q_u32 * u32(0x9E3779B9) + k_u32 * u32(0x85EBCA6B)
    x = x + head_u32 * u32(0xC2B2AE35) + seed_u32
    x = x ^ (x >> u32(16))
    x = x * u32(0x85EBCA6B)
    x = x ^ (x >> u32(13))
    x = x * u32(0xC2B2AE35)
    x = x ^ (x >> u32(16))
    thresh = u32(int(min(max(rate, 0.0), 1.0) * 4294967296.0) & 0xFFFFFFFF)
    return x >= thresh


def _bdot(a, b, contract_a, contract_b):
    """Batch-0 dot: contract a[contract_a] with b[contract_b]."""
    return jax.lax.dot_general(
        a, b, (((contract_a,), (contract_b,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _kernel(q_ref, k_ref, v_ref, tc_ref, tp_ref, mask_ref, seed_ref, o_ref,
            s_scr, *, inv_scale, interpret, rate, n_heads):
    q = q_ref[0]   # [G, Sq, D]
    k = k_ref[0]   # [G, Sk, D]
    v = v_ref[0]
    G, Sq, D = q.shape
    Sk = k.shape[1]
    Wf_c = Sk + _QBLOCK   # c2p window width
    Wf_p = Sq + _QBLOCK   # p2c window width

    # content→content scores
    s_scr[...] = _bdot(q, k, 2, 2)  # [G, Sq, Sk] f32

    # Both bias terms run as table-major matmuls ([G, W, D]·[G, 128, D]ᵀ →
    # [G, W, 128] column tiles) followed by the sublane skew. With window
    # offset off = S − 128 − j·128 and tables ordered T[u] =
    # pos[clip(span + bucket((S−1) − u))], the skew picks exactly
    # rel = q − k for c2p and rel = k − q (negated table) for p2c.

    # c2p: bias[q, c] = q[q]·pos_k[clip(b(q−c)+span)]. The column tile comes
    # out transposed ([G, Sk, 128-q-cols]) — one VMEM swapaxes per block.
    for j in range(Sq // _QBLOCK):
        qj = j * _QBLOCK
        off = Sq - _QBLOCK - qj
        qpT = _bdot(tc_ref[:, off : off + Wf_c, :], q[:, qj : qj + _QBLOCK, :],
                    2, 2)  # [G, Wf_c, 128]
        yT = _skew_cols(qpT, Sk, interpret)    # [G, Sk, 128] = c2pᵀ block
        s_scr[:, qj : qj + _QBLOCK, :] += jnp.swapaxes(yT, 1, 2)

    # p2c: bias[q, c] = k[c]·pos_q[clip(b(q−c)+span)] — key-major columns
    # land directly in [q, k] orientation, no transpose.
    for j in range(Sk // _QBLOCK):
        kj = j * _QBLOCK
        off = Sk - _QBLOCK - kj
        kpT = _bdot(tp_ref[:, off : off + Wf_p, :], k[:, kj : kj + _QBLOCK, :],
                    2, 2)  # [G, Wf_p, 128]
        s_scr[:, :, kj : kj + _QBLOCK] += _skew_cols(kpT, Sq, interpret)

    s = s_scr[...] * inv_scale
    key_ok = mask_ref[0] > 0                   # [1, Sk] (stay ≥2-D on TPU)
    s = jnp.where(key_ok[:, None, :] if key_ok.ndim == 2 else key_ok,
                  s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    probs = p / jnp.where(l == 0.0, 1.0, l)
    if rate:
        keep = _hash_keep(*_drop_ids(seed_ref, pl.program_id(0),
                                     pl.program_id(1), probs.shape, n_heads),
                          rate)
        probs = jnp.where(keep, probs * (1.0 / (1.0 - rate)), 0.0)
    probs = probs.astype(v.dtype)
    o_ref[0] = _bdot(probs, v, 2, 1).astype(o_ref.dtype)  # [G, Sq, D]


def _drop_ids(seed_ref, b, g_blk, shape, n_heads):
    """(seed, head, q, k) uint32 index arrays for `_hash_keep` over a
    [G, Sq, Sk] tile of program (b, head-group g_blk)."""
    G = shape[0]
    g_i = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    q_i = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    k_i = jax.lax.broadcasted_iota(jnp.uint32, shape, 2)
    head = (jnp.uint32(b) * np.uint32(n_heads)
            + jnp.uint32(g_blk) * np.uint32(G) + g_i)
    return jnp.uint32(seed_ref[0]), head, q_i, k_i


def build_rel_tables(pos_k, pos_q, Sq_p: int, Sk_p: int, span: int,
                     max_position: int):
    """Gather the bucketed position projections into relative-offset order.

    pos_k/pos_q: [2·span, H, D] (key/query projections of the layer-normed
    rel embeddings). Returns (Tc2p, Tp2c), each [H, W, D] with
    W = Sq_p + Sk_p, ordered so that row u of Tc2p is pos_k[bucket((Sq_p−1)−u)]
    (Tp2c likewise over rel = k − q, i.e. rows indexed from Sk_p−1 downward).
    Rows outside the valid relative range are zeroed.
    """
    from ...models.deberta import log_bucket  # shared bucket map

    W = Sq_p + Sk_p

    def one(table, rows_max, rel_min, negate):
        r = rows_max - np.arange(W)
        b = log_bucket(r, span, max_position)
        idx = np.clip((-b if negate else b) + span, 0, 2 * span - 1)
        valid = (r >= rel_min) & (r <= rows_max)
        t = jnp.take(table, jnp.asarray(idx), axis=0)
        return t * jnp.asarray(valid, t.dtype)[:, None, None]

    # c2p[q,k] = q[q]·pos_k[clip(bucket(q−k)+span)]: rows=q, rel = q−k.
    t_c2p = one(pos_k, Sq_p - 1, -(Sk_p - 1), negate=False)
    # p2c[q,k] = k[k]·pos_q[clip(bucket(q−k)+span)] (HF DebertaV2's
    # p2c_pos = clamp(−rel+span) applied at [k,q] then transposed): computed
    # with rows=k so the row−col rel is k−q = −(q−k) → negate the bucket.
    t_p2c = one(pos_q, Sk_p - 1, -(Sq_p - 1), negate=True)
    # [W, H, D] → [H, W, D] (kernel blocks over heads)
    return jnp.swapaxes(t_c2p, 0, 1), jnp.swapaxes(t_p2c, 0, 1)


def _fused_call(q, k, v, t_c2p, t_p2c, mask, seed, rate, inv_scale,
                interpret):
    """All operands padded: q/k/v [B, H, S*, D]; tables [H, W, D];
    mask [B, Sk_p] int32; seed [1] int32 (SMEM). Returns [B, H, Sq_p, D]."""
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    G = _head_group(H, Sq, Sk, D, q.dtype.itemsize)
    grid = (B, H // G)
    kernel = functools.partial(_kernel, inv_scale=inv_scale,
                               interpret=interpret, rate=rate, n_heads=H)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, G, Sq, D), lambda b, g: (b, g, 0, 0)),
            pl.BlockSpec((1, G, Sk, D), lambda b, g: (b, g, 0, 0)),
            pl.BlockSpec((1, G, Sk, D), lambda b, g: (b, g, 0, 0)),
            pl.BlockSpec((G, Sq + Sk, D), lambda b, g: (g, 0, 0)),
            pl.BlockSpec((G, Sq + Sk, D), lambda b, g: (g, 0, 0)),
            # mask ships as [B, 1, Sk]: a (1, 1, Sk) block keeps the last two
            # dims equal to the array dims (TPU tiling rule for odd shapes)
            pl.BlockSpec((1, 1, Sk), lambda b, g: (b, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, G, Sq, D), lambda b, g: (b, g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Sq, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((G, Sq, Sk), jnp.float32)],
        interpret=interpret,
    )(q, k, v, t_c2p, t_p2c, mask[:, None, :], seed)


def _bwd_head_group(H, Sq, Sk, D, itemsize) -> int:
    """Largest divisor of H whose backward per-program buffers fit VMEM.

    Calibrated against a measured on-chip scoped-vmem OOM: at base dims
    (H=12 S=512 D=64 bf16) under the full train step the g=2 program's
    real stack was 17.84 MB (8.92 MB/group) against the 16 MB scoped
    limit, 1.74x the old single-buffered estimate — Mosaic double-buffers
    the grid-streamed in/out refs and keeps extra f32 temporaries. Budget
    the streamed refs at 2x and cap the estimate at 8 MB so the real
    stack (~1.15x this estimate) keeps several MB of headroom.
    """
    W = Sq + Sk
    budget = 8 * 1024 * 1024
    for g in range(H, 0, -1):
        if H % g:
            continue
        io = 4 * g * max(Sq, Sk) * D * itemsize * 2 * 2  # q/k/v/gy in (dbuf)
        outs = 3 * g * max(Sq, Sk) * D * itemsize * 2 * 2  # dq/dk/dv (dbuf)
        tables = 2 * g * W * D * itemsize * 2 * 2        # tc/tp in (dbuf)
        tgrads = 2 * g * W * D * 4                       # dtc/dtp f32 resident
        scores = 2 * g * Sq * Sk * 4                     # p + ds f32 scratch
        temps = 4 * g * (max(Sq, Sk) + _QBLOCK) * _QBLOCK * 4
        if io + outs + tables + tgrads + scores + temps <= budget:
            return g
    return 0


def _bwd_kernel(q_ref, k_ref, v_ref, tc_ref, tp_ref, mask_ref, seed_ref,
                g_ref, dq_ref, dk_ref, dv_ref, dtc_ref, dtp_ref,
                p_scr, ds_scr, *, inv_scale, interpret, rate, n_heads):
    """dq/dk/dv + position-table cotangents, nothing through HBM but I/O.

    Grid (head-group, batch) — batch innermost so dtc/dtp (indexed by
    head-group only) stay VMEM-resident and accumulate across the batch,
    written back once per head-group. Scores and probabilities are
    recomputed exactly as the forward (same skew loops), the dropout keep
    mask is regenerated from the same (seed, head, q, k) hash, and the two
    bias-grad paths run the forward skew in reverse (`_unskew_cols`):
    un-skew the score cotangent into table-window column tiles, then one
    MXU matmul each against the table window (→ dq/dk) and the q/k block
    (→ dtc/dtp).
    """
    g_blk = pl.program_id(0)
    b = pl.program_id(1)
    q = q_ref[0]   # [G, Sq, D]
    k = k_ref[0]
    v = v_ref[0]
    gy = g_ref[0]  # [G, Sq, D] cotangent
    G, Sq, D = q.shape
    Sk = k.shape[1]
    Wf_c = Sk + _QBLOCK
    Wf_p = Sq + _QBLOCK

    @pl.when(b == 0)
    def _():
        dtc_ref[...] = jnp.zeros(dtc_ref.shape, dtc_ref.dtype)
        dtp_ref[...] = jnp.zeros(dtp_ref.shape, dtp_ref.dtype)

    # ---- recompute scores exactly as the forward ----
    p_scr[...] = _bdot(q, k, 2, 2)
    for j in range(Sq // _QBLOCK):
        qj = j * _QBLOCK
        off = Sq - _QBLOCK - qj
        qpT = _bdot(tc_ref[:, off : off + Wf_c, :],
                    q[:, qj : qj + _QBLOCK, :], 2, 2)
        yT = _skew_cols(qpT, Sk, interpret)
        p_scr[:, qj : qj + _QBLOCK, :] += jnp.swapaxes(yT, 1, 2)
    for j in range(Sk // _QBLOCK):
        kj = j * _QBLOCK
        off = Sk - _QBLOCK - kj
        kpT = _bdot(tp_ref[:, off : off + Wf_p, :],
                    k[:, kj : kj + _QBLOCK, :], 2, 2)
        p_scr[:, :, kj : kj + _QBLOCK] += _skew_cols(kpT, Sq, interpret)

    s = p_scr[...] * inv_scale
    key_ok = mask_ref[0] > 0
    s = jnp.where(key_ok[:, None, :] if key_ok.ndim == 2 else key_ok,
                  s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    p = e / jnp.where(l == 0.0, 1.0, l)       # [G, Sq, Sk] f32
    p_scr[...] = p

    if rate:
        keep = _hash_keep(*_drop_ids(seed_ref, b, g_blk, p.shape, n_heads),
                          rate)
        inv_keep = 1.0 / (1.0 - rate)
        p_drop = jnp.where(keep, p * inv_keep, 0.0)
    else:
        p_drop = p

    # dv = p_dropᵀ · gy ; dp = gy · vᵀ (through the dropout mask)
    dv_ref[0] = _bdot(p_drop.astype(v.dtype), gy, 1, 1).astype(dv_ref.dtype)
    dp = _bdot(gy, v, 2, 2)                    # [G, Sq, Sk] f32
    if rate:
        dp = jnp.where(keep, dp * inv_keep, 0.0)
    p = p_scr[...]
    ds_scr[...] = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
                   * inv_scale)

    ds_b = ds_scr[...].astype(q.dtype)
    dq_c = _bdot(ds_b, k, 2, 1)                # content: ds · k  [G, Sq, D]
    dk_c = _bdot(ds_b, q, 1, 1)                # content: dsᵀ · q [G, Sk, D]

    # c2p: un-skew the [128-q-rows × Sk] cotangent tile back into the
    # window layout, then dq += dqpTᵀ·T_window and dtc_win += dqpT·q_block
    for j in range(Sq // _QBLOCK):
        qj = j * _QBLOCK
        off = Sq - _QBLOCK - qj
        dyT = jnp.swapaxes(ds_scr[:, qj : qj + _QBLOCK, :], 1, 2)
        dqpT = _unskew_cols(dyT, Wf_c, interpret).astype(q.dtype)
        dq_ref[0, :, qj : qj + _QBLOCK, :] = (
            dq_c[:, qj : qj + _QBLOCK, :]
            + _bdot(dqpT, tc_ref[:, off : off + Wf_c, :], 1, 1)
        ).astype(dq_ref.dtype)
        dtc_ref[:, off : off + Wf_c, :] += _bdot(
            dqpT, q[:, qj : qj + _QBLOCK, :], 2, 1)

    # p2c: the [Sq × 128-k-lanes] cotangent tile is already in skew layout
    for j in range(Sk // _QBLOCK):
        kj = j * _QBLOCK
        off = Sk - _QBLOCK - kj
        dy = ds_scr[:, :, kj : kj + _QBLOCK]
        dkpT = _unskew_cols(dy, Wf_p, interpret).astype(k.dtype)
        dk_ref[0, :, kj : kj + _QBLOCK, :] = (
            dk_c[:, kj : kj + _QBLOCK, :]
            + _bdot(dkpT, tp_ref[:, off : off + Wf_p, :], 1, 1)
        ).astype(dk_ref.dtype)
        dtp_ref[:, off : off + Wf_p, :] += _bdot(
            dkpT, k[:, kj : kj + _QBLOCK, :], 2, 1)


def _bwd_call(q, k, v, t_c2p, t_p2c, mask, seed, g, rate, inv_scale,
              interpret, G):
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    W = Sq + Sk
    kernel = functools.partial(_bwd_kernel, inv_scale=inv_scale,
                               interpret=interpret, rate=rate, n_heads=H)
    bhsd_q = pl.BlockSpec((1, G, Sq, D), lambda g_, b: (b, g_, 0, 0))
    bhsd_k = pl.BlockSpec((1, G, Sk, D), lambda g_, b: (b, g_, 0, 0))
    table = pl.BlockSpec((G, W, D), lambda g_, b: (g_, 0, 0))
    dq, dk, dv, dtc, dtp = pl.pallas_call(
        kernel,
        grid=(H // G, B),
        in_specs=[bhsd_q, bhsd_k, bhsd_k, table, table,
                  pl.BlockSpec((1, 1, Sk), lambda g_, b: (b, 0, 0)),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  bhsd_q],
        out_specs=[bhsd_q, bhsd_k, bhsd_k,
                   pl.BlockSpec((G, W, D), lambda g_, b: (g_, 0, 0)),
                   pl.BlockSpec((G, W, D), lambda g_, b: (g_, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((B, H, Sq, D), q.dtype),
                   jax.ShapeDtypeStruct((B, H, Sk, D), k.dtype),
                   jax.ShapeDtypeStruct((B, H, Sk, D), v.dtype),
                   jax.ShapeDtypeStruct((H, W, D), jnp.float32),
                   jax.ShapeDtypeStruct((H, W, D), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((G, Sq, Sk), jnp.float32),
                        pltpu.VMEM((G, Sq, Sk), jnp.float32)],
        interpret=interpret,
    )(q, k, v, t_c2p, t_p2c, mask[:, None, :], seed, g)
    return dq, dk, dv, dtc, dtp


def _xla_reference(q, k, v, t_c2p, t_p2c, mask, inv_scale, seed=None,
                   rate=0.0):
    """Same math in plain XLA (rel-shift skew as pad/reshape/slice).

    Ground truth for kernel tests and the non-viable-shape fallback of the
    custom VJP — including the stateless hash dropout, elementwise-identical
    to the kernel's (same `_hash_keep` over the same (seed, head, q, k)).
    Materializes [B, H, S, S] tensors — correct, not fast (the round-2
    rel-shift study measured exactly this shape of code bandwidth-bound).
    """
    B, H, Sq, D = q.shape
    Sk = k.shape[2]

    def skew(x, n_cols):
        # x [B, H, R, W] → y[..., r, c] = x[..., r, c + (R-1) - r]
        b, h, R, W = x.shape
        flat = x.reshape(b, h, R * W)
        resh = flat[:, :, : R * (W - 1)].reshape(b, h, R, W - 1)
        return resh[:, :, :, R - 1 : R - 1 + n_cols]

    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    qp = jnp.einsum("bhqd,hwd->bhqw", q, t_c2p,
                    preferred_element_type=jnp.float32)
    s = s + skew(qp, Sk)
    kp = jnp.einsum("bhkd,hwd->bhkw", k, t_p2c,
                    preferred_element_type=jnp.float32)
    s = s + jnp.swapaxes(skew(kp, Sq), 2, 3)
    s = s * inv_scale
    s = jnp.where(mask[:, None, None, :] > 0, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    probs = p / jnp.where(l == 0.0, 1.0, l)
    if rate:
        hq = jax.lax.broadcasted_iota(jnp.uint32, (B, H, Sq, Sk), 2)
        hk = jax.lax.broadcasted_iota(jnp.uint32, (B, H, Sq, Sk), 3)
        hb = jax.lax.broadcasted_iota(jnp.uint32, (B, H, Sq, Sk), 0)
        hh = jax.lax.broadcasted_iota(jnp.uint32, (B, H, Sq, Sk), 1)
        keep = _hash_keep(jnp.uint32(seed.reshape(())),
                          hb * np.uint32(H) + hh, hq, hk, rate)
        probs = jnp.where(keep, probs * (1.0 / (1.0 - rate)), 0.0)
    probs = probs.astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _attn(q, k, v, t_c2p, t_p2c, mask, seed, rate, inv_scale, interpret):
    return _fused_call(q, k, v, t_c2p, t_p2c, mask, seed, rate, inv_scale,
                       interpret)


def _attn_fwd(q, k, v, t_c2p, t_p2c, mask, seed, rate, inv_scale, interpret):
    out = _fused_call(q, k, v, t_c2p, t_p2c, mask, seed, rate, inv_scale,
                      interpret)
    return out, (q, k, v, t_c2p, t_p2c, mask, seed)


def _attn_bwd(rate, inv_scale, interpret, res, g):
    q, k, v, t_c2p, t_p2c, mask, seed = res
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    G = _bwd_head_group(H, Sq, Sk, D, q.dtype.itemsize)
    if _force_xla_bwd():  # A/B knob: SMM_PALLAS_BWD=0 (see tools/)
        G = 0
    if G:
        dq, dk, dv, dtc, dtp = _bwd_call(
            q, k, v, t_c2p, t_p2c, mask, seed, g, rate, inv_scale,
            interpret, G)
        dtc = dtc.astype(t_c2p.dtype)
        dtp = dtp.astype(t_p2c.dtype)
    else:
        # shapes whose backward residency exceeds VMEM: XLA vjp fallback
        _, vjp = jax.vjp(
            lambda q_, k_, v_, tc_, tp_: _xla_reference(
                q_, k_, v_, tc_, tp_, mask, inv_scale, seed, rate),
            q, k, v, t_c2p, t_p2c,
        )
        dq, dk, dv, dtc, dtp = vjp(g)
    dmask = np.zeros(mask.shape, jax.dtypes.float0)
    dseed = np.zeros(seed.shape, jax.dtypes.float0)
    return dq, dk, dv, dtc, dtp, dmask, dseed


_attn.defvjp(_attn_fwd, _attn_bwd)


def fused_viable(S: int, H: int, D: int, itemsize: int = 2) -> bool:
    """True when the fused kernel's per-program buffers can fit VMEM (the
    whole padded sequence is resident; covers every reference length).

    Derived from the SAME formula `_head_group` budgets with (g=1 worst
    case, including the skew-window temps and double-buffered qkv), so a
    shape that passes here can never overflow at Mosaic compile time."""
    Sp = _round_up(max(S, _QBLOCK), _QBLOCK)
    return _head_group(H, Sp, Sp, D, itemsize) > 0


def deberta_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    pos_k: jnp.ndarray,
    pos_q: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray],
    span: int,
    max_position: int,
    interpret: Optional[bool] = None,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fused disentangled attention.

    q/k/v: [B, S, H, D] (module layout); pos_k/pos_q: [2·span, H·D] or
    [2·span, H, D] key/query projections of the rel embeddings;
    attention_mask: [B, S] (1 = attend) or None. Returns [B, S, H, D].
    Applies the reference's 1/√(3·D) scaling internally.

    dropout_rate > 0 applies attention-prob dropout IN-KERNEL (stateless
    hash of (dropout_seed, head, q, k) — see `_hash_keep`), letting the
    fused path serve the training step; dropout_seed is a scalar int32
    (derive one per step from the flax 'dropout' RNG).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rate = float(dropout_rate)
    if rate:
        if dropout_seed is None:
            raise ValueError("dropout_rate > 0 requires dropout_seed")
        seed = jnp.asarray(dropout_seed, jnp.int32).reshape(1)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    B, S, H, D = q.shape
    Sp = _round_up(max(S, _QBLOCK), _QBLOCK)
    inv_scale = float(1.0 / np.sqrt(D * 3.0))

    pos_k = pos_k.reshape(2 * span, H, D)
    pos_q = pos_q.reshape(2 * span, H, D)
    t_c2p, t_p2c = build_rel_tables(pos_k, pos_q, Sp, Sp, span, max_position)

    if attention_mask is None:
        attention_mask = jnp.ones((B, S), jnp.int32)
    mask = attention_mask.astype(jnp.int32)
    if Sp != S:
        pad = Sp - S
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))

    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    tc = t_c2p.astype(q.dtype)
    tp = t_p2c.astype(q.dtype)

    # SPMD: shard_map over the ambient mesh (batch → 'data', heads →
    # 'model', tables head-sharded, mask batch-sharded). A pallas_call has
    # no XLA partitioning rule; the table cotangents are psum-reduced over
    # 'data' by shard_map's transpose automatically.
    from .spmd import resolve_mesh

    mesh, fallback = resolve_mesh(B, H)
    # shapes whose g=1 buffers exceed VMEM can't run the kernel at all
    fallback = fallback or _head_group(H, Sp, Sp, D, q.dtype.itemsize) == 0
    if fallback:
        out = _xla_reference(qt, kt, vt, tc, tp, mask, inv_scale, seed, rate)
    elif mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        bhsd = P("data", "model", None, None)

        def shard_fn(q_, k_, v_, tc_, tp_, m_, s_):
            # decorrelate the hash across shards: the kernel sees LOCAL
            # batch/head indices, so without a per-shard seed offset every
            # data/model shard would reuse the same dropout pattern
            if rate:
                s_ = s_ + (jax.lax.axis_index("data") * 1000003
                           + jax.lax.axis_index("model") * 7919).astype(
                               jnp.int32)
            return _attn(q_, k_, v_, tc_, tp_, m_, s_, rate, inv_scale,
                         interpret)

        out = shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(bhsd, bhsd, bhsd, P("model", None, None),
                      P("model", None, None), P("data", None), P(None)),
            out_specs=bhsd, check_vma=False,
        )(qt, kt, vt, tc, tp, mask, seed)
    else:
        out = _attn(qt, kt, vt, tc, tp, mask, seed, rate, inv_scale,
                    interpret)
    return jnp.swapaxes(out[:, :, :S, :], 1, 2)
