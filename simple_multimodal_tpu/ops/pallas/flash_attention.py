"""Flash attention Pallas kernels for TPU — forward AND backward.

Fused softmax(QKᵀ·scale + bias)·V with online (streaming) softmax: the
[B, H, S, S] probability tensor never hits HBM — score tiles live in VMEM
one (head-group × q-block × k-block) at a time. That is the memory-bound
win over the XLA einsum path for the encoder workloads here (ViT 197,
wav2vec2 499, DeBERTa 512 — reference: /root/reference/models/encoders.py:
20,116,179): XLA materializes the f32 score tensor (e.g. 447 MB/layer for
the 240-frame ViT stack) twice per layer.

Grid design (v5e-measured): one program per (batch, head-group, q-block)
with ALL of a group's heads processed as a batched dot inside the kernel.
A head-per-program grid (B·H·num_q tiny programs) was measured 1.6x SLOWER
than XLA at S=197 — per-program DMA/dispatch overhead dominates when the
per-head tile work is microseconds. Head groups amortize that overhead
while keeping k/v/bias tiles inside VMEM.

Matmul dtype: operands stay in their network dtype (bf16 on the bench
path) — the MXU takes bf16 inputs at full rate and accumulates in f32 via
preferred_element_type; upcasting first would force 8x-slower f32 passes.
Softmax math runs in f32 on the VPU.

Training-ready: ``flash_attention`` carries a custom VJP whose backward is
two Pallas kernels (dk/dv swept over key blocks, dq — and dbias when a bias
is given — swept over query blocks), recomputing probabilities from the
saved logsumexp instead of materializing them. Standard decomposition:

    P   = exp(S·scale + bias − lse)        S = QKᵀ
    dV  = Pᵀ dO
    dP  = dO Vᵀ
    dS  = P ∘ (dP − Δ)                     Δ = rowsum(dO ∘ O)
    dQ  = scale · dS K,  dK = scale · dSᵀ Q,  dbias = dS

Layout: q/k/v arrive [B, S, H, D] (attention-module layout) and are
transposed to [B, H, S, D] so the grid blocks cleanly. The optional
additive bias is broadcastable to [B, H, Sq, Sk] (DeBERTa's disentangled
bias + padding mask); its cotangent is reduced back over broadcast axes.

On CPU (tests) the kernels run in Pallas interpreter mode.
"""
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30
_VMEM_BUDGET = 6 * 1024 * 1024  # soft cap for resident tiles per program


def _pad_axis(x, axis, mult, value=0.0):
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _head_group(H, Sq, Sk, D, itemsize, block_q, has_bias, full_q=False):
    """Largest divisor of H whose resident tiles fit the VMEM budget.

    ``full_q``: the backward dk/dv (and dq/dbias) kernels additionally keep
    the FULL-sequence q, do, lse, and delta operands resident per program
    (their BlockSpecs span Sq) — at engaged lengths (S > 512) that
    residency dominates and must be budgeted, or the group overflows VMEM.
    """
    for hg in range(H, 0, -1):
        if H % hg:
            continue
        kv = 2 * hg * Sk * D * itemsize
        bias = hg * block_q * Sk * 4 if has_bias else 0
        scores = 2 * hg * block_q * Sk * 4  # s tile + p tile (f32)
        resident = (
            2 * hg * Sq * D * itemsize  # full q + do
            + 2 * hg * Sq * 4           # full lse + delta (f32)
        ) if full_q else 0
        if kv + bias + scores + resident <= _VMEM_BUDGET:
            return hg
    return 1


def _bdot(a, b, contract_a, contract_b):
    """Head-batched dot: contracts a[contract_a] with b[contract_b], batch
    over axis 0. [G, M, K] x [G, N, K]-style → [G, M, N]."""
    return jax.lax.dot_general(
        a, b, (((contract_a,), (contract_b,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


# --------------------------------------------------------------------- forward

def _col_mask(s, col0, sk_valid):
    """Mask key-padding columns with -inf. cols are col0 + lane index; the
    mask is computed in-register from an iota — padding costs no HBM bytes
    (an early version realized a broadcast [B,H,Sq,Sk] f32 zeros-bias for
    padded sequences: 447 MB of traffic at the ViT shape, slower than XLA).
    """
    cols = col0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, s.ndim - 1)
    return jnp.where(cols < sk_valid, s, NEG_INF)


def _fwd_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, lse_ref, *, scale, block_k,
                seq_k, sk_valid, has_bias):
    q = q_ref[0]  # [G, Bq, D] network dtype
    g, bq, d = q.shape
    num_k = seq_k // block_k

    if num_k == 1:
        # whole key range in one block: plain (non-streaming) softmax, no
        # running-max corrections. Measured ~2.7x faster than the looped
        # form at S<=512 — block sizes are chosen to hit this path there.
        k = k_ref[0]
        v = v_ref[0]
        s = _bdot(q, k, 2, 2) * scale  # [G, Bq, Sk] f32
        if has_bias:
            s = s + b_ref[0].astype(jnp.float32)
        if sk_valid < seq_k:
            s = _col_mask(s, 0, sk_valid)
        m = jnp.max(s, axis=-1)
        p = jnp.exp(s - m[..., None])
        l = jnp.sum(p, axis=-1)
        safe_l = jnp.where(l == 0.0, 1.0, l)
        acc = _bdot(p.astype(v.dtype), v, 2, 1)
        o_ref[0] = (acc / safe_l[..., None]).astype(o_ref.dtype)
        lse_ref[0] = jnp.where(l == 0.0, -NEG_INF,
                               m + jnp.log(safe_l))[..., None]
        return

    def body(i, carry):
        acc, m, l = carry
        k = k_ref[0, :, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, :, pl.ds(i * block_k, block_k), :]
        s = _bdot(q, k, 2, 2) * scale  # [G, Bq, Bk] f32
        if has_bias:
            s = s + b_ref[0, :, :, pl.ds(i * block_k, block_k)].astype(jnp.float32)
        if sk_valid < seq_k:
            s = _col_mask(s, i * block_k, sk_valid)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        acc = acc * corr[..., None] + _bdot(p.astype(v.dtype), v, 2, 1)
        l = l * corr + jnp.sum(p, axis=-1)
        return acc, m_new, l

    acc0 = jnp.zeros((g, bq, d), jnp.float32)
    m0 = jnp.full((g, bq), NEG_INF, jnp.float32)
    l0 = jnp.zeros((g, bq), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_k, body, (acc0, m0, l0))
    safe_l = jnp.where(l == 0.0, 1.0, l)  # fully-masked rows → zeros, not NaN
    o_ref[0] = (acc / safe_l[..., None]).astype(o_ref.dtype)
    # lse = m + log(l); +inf sentinel on fully-masked rows makes the
    # recomputed probabilities in the backward exactly zero there. Stored
    # [B, H, Sq, 1]: the trailing singleton keeps the block's last two dims
    # (block_q, 1) legal under the TPU (8, 128)-tiling rule.
    lse_ref[0] = jnp.where(l == 0.0, -NEG_INF, m + jnp.log(safe_l))[..., None]


def _flash_forward(q, k, v, bias, block_q, block_k, interpret, sk_valid):
    """q/k/v: [B, H, S, D] (already padded); bias [B, H, Sq, Sk] or None.
    sk_valid: number of real (unpadded) keys. Returns out [B, H, Sq, D]
    (q dtype) and lse [B, H, Sq, 1] (f32)."""
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    scale = 1.0 / (D ** 0.5)
    G = _head_group(H, Sq, Sk, D, q.dtype.itemsize, block_q, bias is not None)
    grid = (B, H // G, Sq // block_q)
    q_spec = pl.BlockSpec((1, G, block_q, D), lambda b, g, i: (b, g, i, 0))
    kv_spec = pl.BlockSpec((1, G, Sk, D), lambda b, g, i: (b, g, 0, 0))
    o_spec = pl.BlockSpec((1, G, block_q, D), lambda b, g, i: (b, g, i, 0))
    lse_spec = pl.BlockSpec((1, G, block_q, 1), lambda b, g, i: (b, g, i, 0))
    out_shape = (
        jax.ShapeDtypeStruct((B, H, Sq, D), q.dtype),
        jax.ShapeDtypeStruct((B, H, Sq, 1), jnp.float32),
    )
    in_specs = [q_spec, kv_spec, kv_spec]
    operands = [q, k, v]
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, G, block_q, Sk),
                                     lambda b, g, i: (b, g, i, 0)))
        operands.append(bias)
    kernel = functools.partial(
        _fwd_kernel, scale=scale, block_k=block_k, seq_k=Sk,
        sk_valid=sk_valid, has_bias=bias is not None,
    )
    if bias is None:  # keep kernel arity fixed: bias ref slot unused
        kernel = functools.partial(
            lambda q_r, k_r, v_r, o_r, l_r, f: f(q_r, k_r, v_r, None, o_r, l_r),
            f=kernel,
        )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(o_spec, lse_spec),
        out_shape=out_shape,
        interpret=interpret,
    )(*operands)
    return out, lse


# -------------------------------------------------------------------- backward

def _bwd_dkv_kernel(q_ref, k_ref, v_ref, b_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, scale, block_q, seq_q, block_k,
                    sk_valid, has_bias):
    k = k_ref[0]  # [G, Bk, D]
    v = v_ref[0]
    g, bk, d = k.shape
    num_q = seq_q // block_q

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, :, pl.ds(i * block_q, block_q), :]
        do = do_ref[0, :, pl.ds(i * block_q, block_q), :]
        lse = lse_ref[0, :, pl.ds(i * block_q, block_q), :]    # [G, Bq, 1]
        delta = delta_ref[0, :, pl.ds(i * block_q, block_q), :]
        # No key-padding mask here: each program only writes dk/dv for its
        # OWN key block, so padded-key garbage lands exclusively in rows the
        # wrapper trims; padded q rows have do = 0 and contribute nothing.
        s = _bdot(q, k, 2, 2) * scale  # [G, Bq, Bk]
        if has_bias:
            s = s + b_ref[0, :, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        p = jnp.exp(s - lse)
        dv = dv + _bdot(p.astype(do.dtype), do, 1, 1)  # [G, Bk, D]
        dp = _bdot(do, v, 2, 2)  # [G, Bq, Bk]
        ds = p * (dp - delta)
        dk = dk + _bdot(ds.astype(q.dtype), q, 1, 1) * scale  # [G, Bk, D]
        return dk, dv

    dk0 = jnp.zeros((g, bk, d), jnp.float32)
    dv0 = jnp.zeros((g, bk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_q, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, b_ref, do_ref, lse_ref, delta_ref,
                   dq_ref, db_ref, *, scale, block_k, seq_k, sk_valid,
                   has_bias):
    q = q_ref[0]             # [G, Bq, D]
    do = do_ref[0]
    lse = lse_ref[0]         # [G, Bq, 1]
    delta = delta_ref[0]     # [G, Bq, 1]
    g, bq, d = q.shape
    num_k = seq_k // block_k

    def body(i, dq):
        k = k_ref[0, :, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, :, pl.ds(i * block_k, block_k), :]
        s = _bdot(q, k, 2, 2) * scale
        if has_bias:
            s = s + b_ref[0, :, :, pl.ds(i * block_k, block_k)].astype(jnp.float32)
        if sk_valid < seq_k:
            s = _col_mask(s, i * block_k, sk_valid)
        p = jnp.exp(s - lse)
        dp = _bdot(do, v, 2, 2)
        ds = p * (dp - delta)
        if has_bias:
            db_ref[0, :, :, pl.ds(i * block_k, block_k)] = ds.astype(db_ref.dtype)
        dq = dq + _bdot(ds.astype(k.dtype), k, 2, 1) * scale  # [G, Bq, D]
        return dq

    dq = jax.lax.fori_loop(0, num_k, body, jnp.zeros((g, bq, d), jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_bias_blocks(block_q, block_k, G, Sq, Sk,
                     budget=8 * 1024 * 1024):
    """Shrink the backward sweep blocks so the BIAS-family tiles fit VMEM.

    Scoped-VMEM calibration measured on v5e (cf.
    deberta_attention._bwd_head_group): Mosaic DOUBLE-BUFFERS the
    grid-streamed refs, so the dq program's real stack holds 2× the
    bias-in tile AND 2× the dbias-out tile (16·G·block_q·Sk bytes f32
    total) — at S=2048 with block_q=512 that alone is 16 MB and the
    compile fails at 17.25 MB against the 16 MB scoped limit (observed,
    smoke S=2048). The dkv program streams bias-in only (8·G·Sq·block_k).
    Halving preserves divisibility (every candidate block divides the
    padded sequence an even number of times); floor 128."""
    while block_q > 128 and 16 * G * block_q * Sk > budget:
        block_q //= 2
    while block_k > 128 and 8 * G * Sq * block_k > budget:
        block_k //= 2
    return block_q, block_k


def _flash_backward(q, k, v, bias, out, lse, do, block_q, block_k, interpret,
                    sk_valid):
    """All operands [B, H, S, D]-family, already padded. Returns
    (dq, dk, dv, dbias-or-None)."""
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    scale = 1.0 / (D ** 0.5)
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True)  # [B, H, Sq, 1]

    has_bias = bias is not None
    G = _head_group(H, Sq, Sk, D, q.dtype.itemsize,
                    max(block_q, block_k), has_bias, full_q=True)
    if has_bias:
        block_q, block_k = _bwd_bias_blocks(block_q, block_k, G, Sq, Sk)
    tile_q = pl.BlockSpec((1, G, block_q, D), lambda b, g, i: (b, g, i, 0))
    full_q = pl.BlockSpec((1, G, Sq, D), lambda b, g, i: (b, g, 0, 0))
    tile_k = pl.BlockSpec((1, G, block_k, D), lambda b, g, i: (b, g, i, 0))
    full_k = pl.BlockSpec((1, G, Sk, D), lambda b, g, i: (b, g, 0, 0))
    tile_lse = pl.BlockSpec((1, G, block_q, 1), lambda b, g, i: (b, g, i, 0))
    full_lse = pl.BlockSpec((1, G, Sq, 1), lambda b, g, i: (b, g, 0, 0))

    # --- dk, dv: one key block per program, sweep query blocks
    in_specs = [full_q, tile_k, tile_k,
                pl.BlockSpec((1, G, Sq, block_k), lambda b, g, i: (b, g, 0, i))
                if has_bias else None,
                full_q, full_lse, full_lse]
    operands = [q, k, v, bias, do, lse, delta]
    if not has_bias:
        in_specs = [s for s in in_specs if s is not None]
        operands = [x for x in operands if x is not None]

    def dkv_kernel(*refs):
        if has_bias:
            q_r, k_r, v_r, b_r, do_r, lse_r, d_r, dk_r, dv_r = refs
        else:
            q_r, k_r, v_r, do_r, lse_r, d_r, dk_r, dv_r = refs
            b_r = None
        _bwd_dkv_kernel(q_r, k_r, v_r, b_r, do_r, lse_r, d_r, dk_r, dv_r,
                        scale=scale, block_q=block_q, seq_q=Sq,
                        block_k=block_k, sk_valid=sk_valid, has_bias=has_bias)

    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(B, H // G, Sk // block_k),
        in_specs=in_specs,
        out_specs=(tile_k, tile_k),
        out_shape=(jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)),
        interpret=interpret,
    )(*operands)

    # --- dq (and dbias): one query block per program, sweep key blocks
    in_specs = [tile_q, full_k, full_k,
                pl.BlockSpec((1, G, block_q, Sk), lambda b, g, i: (b, g, i, 0))
                if has_bias else None,
                tile_q, tile_lse, tile_lse]
    operands = [q, k, v, bias, do, lse, delta]
    if not has_bias:
        in_specs = [s for s in in_specs if s is not None]
        operands = [x for x in operands if x is not None]
    out_specs = [tile_q]
    out_shape = [jax.ShapeDtypeStruct(q.shape, q.dtype)]
    if has_bias:
        out_specs.append(
            pl.BlockSpec((1, G, block_q, Sk), lambda b, g, i: (b, g, i, 0)))
        out_shape.append(jax.ShapeDtypeStruct((B, H, Sq, Sk), jnp.float32))

    def dq_kernel(*refs):
        if has_bias:
            q_r, k_r, v_r, b_r, do_r, lse_r, d_r, dq_r, db_r = refs
        else:
            q_r, k_r, v_r, do_r, lse_r, d_r, dq_r = refs
            b_r = db_r = None
        _bwd_dq_kernel(q_r, k_r, v_r, b_r, do_r, lse_r, d_r, dq_r, db_r,
                       scale=scale, block_k=block_k, seq_k=Sk,
                       sk_valid=sk_valid, has_bias=has_bias)

    res = pl.pallas_call(
        dq_kernel,
        grid=(B, H // G, Sq // block_q),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(*operands)
    if has_bias:
        dq, dbias = res
        return dq, dk, dv, dbias
    (dq,) = res
    return dq, dk, dv, None


# ------------------------------------------------------ custom-vjp entry point

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash(q, k, v, bias, block_q, block_k, interpret, has_bias, sk_valid):
    out, _ = _flash_forward(q, k, v, bias if has_bias else None,
                            block_q, block_k, interpret, sk_valid)
    return out


def _flash_fwd(q, k, v, bias, block_q, block_k, interpret, has_bias, sk_valid):
    out, lse = _flash_forward(q, k, v, bias if has_bias else None,
                              block_q, block_k, interpret, sk_valid)
    return out, (q, k, v, bias, out, lse)


def _flash_bwd(block_q, block_k, interpret, has_bias, sk_valid, residuals, g):
    q, k, v, bias, out, lse = residuals
    dq, dk, dv, dbias = _flash_backward(
        q, k, v, bias if has_bias else None, out, lse, g,
        block_q, block_k, interpret, sk_valid,
    )
    if not has_bias:
        dbias = jnp.zeros_like(bias)
    return dq, dk, dv, dbias


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    block_q: int = 512,
    block_k: int = 512,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """softmax(q·kᵀ/√D + bias)·v, differentiable in q, k, v, and bias.

    q: [B, Sq, H, D], k/v: [B, Sk, H, D], bias: broadcastable to
    [B, H, Sq, Sk] or None. Returns [B, Sq, H, D] in q's dtype.
    Scale is 1/sqrt(D).

    Default blocks are 512 (shrunk to the 128-padded sequence when smaller):
    big blocks were measured ~2.7x faster than 128x128 tiles at the encoder
    shapes here — the streaming-correction math and per-block loop overhead
    cost more than the VMEM the larger tiles spend.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, Sq, H, D = q.shape
    Sk = k.shape[1]

    # SPMD: under an ambient multi-device mesh, recurse inside a shard_map
    # (batch over 'data', heads over 'model') — a pallas_call has no XLA
    # partitioning rule. The ambient mesh is cleared inside the per-shard
    # body so the recursion takes the single-device path.
    from ...parallel.mesh import current_mesh, set_current_mesh
    from .spmd import resolve_mesh

    mesh, fallback = resolve_mesh(B, H)
    if mesh is not None and not fallback:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        bshd = P("data", None, "model", None)

        def unmeshed(fn):
            def body(*args):
                prev = current_mesh()
                set_current_mesh(None)
                try:
                    return fn(*args)
                finally:
                    set_current_mesh(prev)
            return body

        if bias is None:
            body = unmeshed(lambda q_, k_, v_: flash_attention(
                q_, k_, v_, block_q=block_q, block_k=block_k,
                interpret=interpret))
            return shard_map(body, mesh=mesh, in_specs=(bshd,) * 3,
                             out_specs=bshd, check_vma=False)(q, k, v)
        # broadcastable biases must be materialized: shard_map needs the
        # sharded dims to actually divide
        bias_full = jnp.broadcast_to(bias, (B, H, Sq, Sk))
        body = unmeshed(lambda q_, k_, v_, b_: flash_attention(
            q_, k_, v_, bias=b_, block_q=block_q, block_k=block_k,
            interpret=interpret))
        return shard_map(
            body, mesh=mesh,
            in_specs=(bshd, bshd, bshd, P("data", "model", None, None)),
            out_specs=bshd, check_vma=False,
        )(q, k, v, bias_full)

    def pick_block(requested, S):
        if interpret:  # tests pass explicit small blocks; no lane padding
            return min(requested, max(S, 1))
        lane_p = -(-S // 128) * 128  # lane-padded length
        if lane_p <= requested:
            return lane_p  # single block, no extra padding
        # largest block dividing the lane-padded length — padding to a
        # multiple of a 512 block instead would waste up to ~2.5x score
        # work at lengths just past the S>512 engagement threshold
        for b in (512, 384, 256, 128):
            if b <= requested and lane_p % b == 0:
                return b
        return 128

    block_q = pick_block(block_q, Sq)
    block_k = pick_block(block_k, Sk)

    qt = _pad_axis(jnp.swapaxes(q, 1, 2), 2, block_q)  # [B, H, Sq_p, D]
    kt = _pad_axis(jnp.swapaxes(k, 1, 2), 2, block_k)
    vt = _pad_axis(jnp.swapaxes(v, 1, 2), 2, block_k)
    Sq_p, Sk_p = qt.shape[2], kt.shape[2]

    # Key padding is masked IN-KERNEL from an iota against sk_valid —
    # realizing a padding bias tensor would cost [B, H, Sq, Sk] f32 of HBM
    # traffic, defeating the kernel's purpose.
    has_bias = bias is not None
    if has_bias:
        # broadcast/pad are traced linear ops OUTSIDE the custom_vjp, so the
        # bias cotangent is reduced back over broadcast axes (and the pad
        # region dropped) by their transposes automatically.
        bias = jnp.broadcast_to(bias, (B, H, Sq, Sk)).astype(jnp.float32)
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, Sq_p - Sq), (0, Sk_p - Sk)),
                       constant_values=NEG_INF)
        if Sq_p != Sq:  # padded query rows: keep rows finite (output trimmed)
            row_fix = jnp.zeros((B, H, Sq_p - Sq, Sk_p), jnp.float32)
            bias = jnp.concatenate([bias[:, :, :Sq], row_fix], axis=2)
    else:
        bias = jnp.zeros((), jnp.float32)  # placeholder leaf for custom_vjp

    out = _flash(qt, kt, vt, bias, block_q, block_k, interpret, has_bias, Sk)
    return jnp.swapaxes(out[:, :, :Sq, :], 1, 2)  # [B, Sq, H, D]
