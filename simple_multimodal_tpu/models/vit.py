"""Vision Transformer (ViT) frame backbone in Flax.

From-scratch implementation of the architecture the reference loads as
``ViTModel.from_pretrained("google/vit-base-patch16-224")``
(/root/reference/models/encoders.py:179): conv patch embedding, CLS token,
learned absolute position embeddings, 12 pre-LN transformer layers, final
LayerNorm. The reference consumes only the CLS vector per frame
(encoders.py:223), so ``__call__`` can return just that and skip
materializing the full token sequence output.

TPU-first: frames arrive channels-last uint8/float [N, H, W, 3]; patch
embedding is one conv the MXU tiles directly; all frames of all clips are
batched into a single [B*T, ...] call (the reference does the same flatten,
encoders.py:219, but then pays per-frame CUDA kernels).
"""
import dataclasses
import jax
import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import compact_scores, gelu


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-12
    hidden_dropout: float = 0.0
    attention_dropout: float = 0.0
    use_flash: bool = False  # Pallas flash kernel for self-attention

    @staticmethod
    def base() -> "ViTConfig":
        """google/vit-base-patch16-224 dimensions."""
        return ViTConfig()

    @staticmethod
    def tiny() -> "ViTConfig":
        return ViTConfig(image_size=32, patch_size=16, hidden_size=32,
                         num_layers=2, num_heads=2, intermediate_size=64)

    @staticmethod
    def half() -> "ViTConfig":
        return ViTConfig(hidden_size=384, num_layers=6, num_heads=6,
                         intermediate_size=1536)

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


class ViTLayer(nn.Module):
    config: ViTConfig
    dtype: jnp.dtype = jnp.float32
    scan: bool = False  # under nn.scan the body must return (carry, ys)

    def _use_fused(self, S: int) -> bool:
        from ..ops.pallas.attention_block import block_viable

        cfg = self.config
        E, H = cfg.hidden_size, cfg.num_heads
        # dropout does not gate the kernel: attention dropout runs
        # in-kernel from a stateless hash (attention_block.py _drop_keep)
        return (cfg.use_flash
                and H * (E // H) == E and block_viable(S, H, E // H, E))

    def _attend(self, x, deterministic, fused_w, rows=None):
        """softmax(QK^T)V + out-projection for ``x`` [B, S, E].

        ``rows``: if set, only the first ``rows`` query rows are computed
        (k/v still span all S keys) — the CLS-only final-layer path.
        ``fused_w``: the (wq,bq,...,wo,bo) tuple when the fused block
        kernel route owns the projection params, else None (nn.Dense
        modules own them)."""
        cfg = self.config
        E, H = cfg.hidden_size, cfg.num_heads
        D = E // H
        B, S, _ = x.shape

        if fused_w is not None and rows is None:
            from ..ops.pallas.attention_block import attention_block

            wq, bq, wk, bk, wv, bv, wo, bo = [
                w.astype(self.dtype) for w in fused_w
            ]
            from ..ops.attention import kernel_dropout_seed

            drop_rate, drop_seed = kernel_dropout_seed(
                self, 0.0 if deterministic else cfg.attention_dropout)
            return attention_block(x, wq, bq, wk, bk, wv, bv, wo, bo,
                                   num_heads=H, dropout_rate=drop_rate,
                                   dropout_seed=drop_seed)

        xq = x if rows is None else x[:, :rows]
        Q = xq.shape[1]
        if fused_w is not None:
            wq, bq, wk, bk, wv, bv, wo, bo = [
                w.astype(self.dtype) for w in fused_w
            ]
            q = (jnp.dot(xq, wq) + bq).reshape(B, Q, H, D)
            k = (jnp.dot(x, wk) + bk).reshape(B, S, H, D)
            v = (jnp.dot(x, wv) + bv).reshape(B, S, H, D)
        else:
            q = nn.Dense(E, dtype=self.dtype, name="query")(xq).reshape(B, Q, H, D)
            k = nn.Dense(E, dtype=self.dtype, name="key")(x).reshape(B, S, H, D)
            v = nn.Dense(E, dtype=self.dtype, name="value")(x).reshape(B, S, H, D)
        if fused_w is None and rows is None and cfg.use_flash and (
                deterministic or cfg.attention_dropout == 0.0) and S > 512:
            from ..ops.pallas.flash_attention import flash_attention

            ctx = flash_attention(q, k, v)
        else:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32) * (D ** -0.5)
            scores = compact_scores(scores, self.dtype)
            probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
            probs = nn.Dropout(cfg.attention_dropout)(probs,
                                                      deterministic=deterministic)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                             preferred_element_type=jnp.float32).astype(self.dtype)
        ctx = ctx.reshape(B, Q, E)
        if fused_w is not None:
            return jnp.dot(ctx, wo) + bo
        return nn.Dense(E, dtype=self.dtype, name="attn_output")(ctx)

    def _ffn(self, hidden, deterministic):
        cfg = self.config
        E, F = cfg.hidden_size, cfg.intermediate_size
        S = hidden.shape[1]
        from ..ops.pallas.ffn_block import ffn_block, ffn_viable

        # Whole pre-LN FFN sub-block in ONE kernel: hidden +
        # W2·gelu(W1·LN(hidden)). The [S, F] intermediate (the largest
        # remaining HBM tensor once attention is fused — ~290 MB/layer at
        # the 240×197 ViT stack shape) never leaves VMEM. Hidden dropout
        # (FFN output, pre-residual) runs in-kernel from a stateless
        # hash, so training fuses too; S >= 64 skips the CLS-rows path
        # where dispatch would dominate.
        if (cfg.use_flash and S >= 64
                and ffn_viable(S, E, F, jnp.dtype(self.dtype).itemsize)):
            from ..ops.attention import (
                DenseParams, LayerNormParams, kernel_dropout_seed,
            )

            rate, seed = kernel_dropout_seed(
                self, 0.0 if deterministic else cfg.hidden_dropout)
            g, b = LayerNormParams(name="layernorm_after")(E)
            w1, b1 = DenseParams(F, name="intermediate_dense")(E)
            w2, b2 = DenseParams(E, name="output_dense")(F)
            return ffn_block(
                hidden, w1.astype(self.dtype), b1.astype(self.dtype),
                w2.astype(self.dtype), b2.astype(self.dtype),
                ln=(g.astype(self.dtype), b.astype(self.dtype),
                    cfg.layer_norm_eps),
                ln_post=False, residual=True,
                dropout_rate_out=rate, dropout_seed=seed,
            )
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layernorm_after")(hidden)
        x = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                     name="intermediate_dense")(x)
        x = gelu(x, self.dtype)
        x = nn.Dense(cfg.hidden_size, dtype=self.dtype,
                     name="output_dense")(x)
        x = nn.Dropout(cfg.hidden_dropout)(x, deterministic=deterministic)
        return hidden + x

    def _body(self, hidden, deterministic, fused_w, rows=None):
        cfg = self.config
        # Whole pre-LN attention sub-block in ONE kernel when possible:
        # x + proj(attn(LN(x))). XLA must materialize a custom call's
        # operands in HBM, so a separate LayerNorm costs a full [S, E]
        # round trip per layer (plus another for the residual add) that
        # the fused form never pays. Dropout between attn and the
        # residual gates the fusion off (ViT-base has hidden_dropout=0,
        # so training fuses too).
        if (fused_w is not None and rows is None
                and (deterministic or cfg.hidden_dropout == 0.0)):
            from ..ops.attention import LayerNormParams, kernel_dropout_seed
            from ..ops.pallas.attention_block import attention_block

            # attention-prob dropout runs IN-KERNEL (the sub-block fusion
            # only requires the attn-output hidden dropout to be off)
            drop_rate, drop_seed = kernel_dropout_seed(
                self, 0.0 if deterministic else cfg.attention_dropout)
            g, b = LayerNormParams(name="layernorm_before")(cfg.hidden_size)
            wq, bq, wk, bk, wv, bv, wo, bo = [
                w.astype(self.dtype) for w in fused_w
            ]
            h = attention_block(
                hidden, wq, bq, wk, bk, wv, bv, wo, bo,
                num_heads=cfg.num_heads,
                ln=(g.astype(self.dtype), b.astype(self.dtype),
                    cfg.layer_norm_eps),
                residual=True,
                dropout_rate=drop_rate, dropout_seed=drop_seed,
            )
            return self._ffn(h, deterministic)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layernorm_before")(hidden)
        attn = self._attend(x, deterministic, fused_w, rows=rows)
        attn = nn.Dropout(cfg.hidden_dropout)(attn, deterministic=deterministic)
        if rows is None:
            return self._ffn(hidden + attn, deterministic)
        h = hidden[:, :rows] + attn
        out_rows = self._ffn(h, deterministic)
        # Rows >= ``rows`` of the carry go stale (previous layer's hidden);
        # the caller consumes only the computed rows (CLS pooling).
        return jax.lax.dynamic_update_slice(
            hidden, out_rows.astype(hidden.dtype), (0, 0, 0))

    @nn.compact
    def __call__(self, hidden: jnp.ndarray, deterministic: bool = True,
                 rows: int = None):
        """``rows``: static — compute only the first ``rows`` query rows of
        this layer (CLS-only final layer; see ViTModel). Rows past ``rows``
        of the returned carry are passed through stale."""
        cfg = self.config
        E, H = cfg.hidden_size, cfg.num_heads
        S = hidden.shape[1]

        # Attention routing (v5e-measured, round 3): per-op attention
        # kernels LOSE in-context at these shapes regardless of their inner
        # speed — the custom call forces [B, S, H, D] q/k/v/out tensors to
        # materialize in HBM (an *identity* kernel cost +38 ms on the
        # 240-frame forward). The block kernel fuses qkv-projection +
        # attention + out-projection with natural [B, S, E] I/O instead.
        from ..ops.attention import DenseParams

        fused_w = None
        if self._use_fused(S):
            wq, bq = DenseParams(E, name="query")(E)
            wk, bk = DenseParams(E, name="key")(E)
            wv, bv = DenseParams(E, name="value")(E)
            wo, bo = DenseParams(E, name="attn_output")(E)
            fused_w = (wq, bq, wk, bk, wv, bv, wo, bo)

        out = self._body(hidden, deterministic, fused_w, rows=rows)
        return (out, None) if self.scan else out


class _StackedLeaves(nn.Module):
    """Creates leaf params with a leading [L] stack axis under this
    module's scope — the same names/shapes/inits nn.scan over the layer
    module would create, so checkpoints and converters are agnostic to
    which mechanism owns the scan."""

    leaves: tuple  # ((leaf_name, per-layer shape), ...)
    L: int

    @nn.compact
    def __call__(self):
        out = {}
        for leaf, shape in self.leaves:
            init = (nn.initializers.ones if leaf == "scale" else
                    nn.initializers.zeros if leaf == "bias" else
                    nn.linear.default_kernel_init)
            out[leaf] = self.param(leaf, init, (self.L,) + tuple(shape))
        return out


class _StackedLayerParams(nn.Module):
    """The full ViTLayer param tree, [num_layers]-stacked (see ViTModel)."""

    config: ViTConfig

    @nn.compact
    def __call__(self):
        cfg = self.config
        E, F, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
        ln = (("scale", (E,)), ("bias", (E,)))
        groups = {
            "layernorm_before": ln,
            "query": (("kernel", (E, E)), ("bias", (E,))),
            "key": (("kernel", (E, E)), ("bias", (E,))),
            "value": (("kernel", (E, E)), ("bias", (E,))),
            "attn_output": (("kernel", (E, E)), ("bias", (E,))),
            "layernorm_after": ln,
            "intermediate_dense": (("kernel", (E, F)), ("bias", (F,))),
            "output_dense": (("kernel", (F, E)), ("bias", (E,))),
        }
        return {name: _StackedLeaves(leaves, L, name=name)()
                for name, leaves in groups.items()}


class ViTModel(nn.Module):
    """Frames [N, H, W, 3] → token states [N, 1+P, E] (LayerNormed)."""

    config: ViTConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray, deterministic: bool = True,
                 cls_only: bool = False):
        cfg = self.config
        N = pixel_values.shape[0]
        x = nn.Conv(cfg.hidden_size,
                    kernel_size=(cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    padding="VALID", dtype=self.dtype,
                    name="patch_embed")(pixel_values.astype(self.dtype))
        x = x.reshape(N, -1, cfg.hidden_size)  # [N, P, E]

        cls_token = self.param("cls_token", nn.initializers.zeros,
                               (1, 1, cfg.hidden_size))
        pos_embed = self.param("position_embeddings",
                               nn.initializers.normal(0.02),
                               (1, 1 + cfg.num_patches, cfg.hidden_size))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(self.dtype), (N, 1, cfg.hidden_size)), x],
            axis=1,
        )
        x = x + pos_embed.astype(self.dtype)
        x = nn.Dropout(cfg.hidden_dropout)(x, deterministic=deterministic)

        # Layer stack: explicitly created [L, ...]-stacked params (the exact
        # tree nn.scan would make — converters/TP specs/checkpoints see no
        # difference) driven by jax.lax.scan, so the layer body is traced
        # and compiled ONCE (12-layer unroll compiled in 569 s, the scan in
        # ~74 s). Owning the scan directly (instead of nn.scan) lets the
        # FINAL layer run outside it with a static CLS-only fast path:
        # the video encoder consumes only the CLS vector per frame
        # (reference encoders.py:223), so the last layer computes just the
        # CLS query row — k/v still span all tokens, but the FFN and q/out
        # projections shrink S → 1, saving ~a layer of MXU work. An
        # is_last lax.cond inside the scan was measured to cost ~0.35 ms
        # PER ITERATION (XLA cond blocks fusion across its boundary),
        # cancelling the entire win — hence the structural split.
        stack = _StackedLayerParams(cfg, name="layers")()
        layer = ViTLayer(cfg, dtype=self.dtype)
        L = cfg.num_layers
        n_scanned = L - 1 if (cls_only and L > 1) else L
        scanned_params = jax.tree_util.tree_map(lambda a: a[:n_scanned], stack)

        needs_rng = not deterministic and (
            cfg.hidden_dropout > 0 or cfg.attention_dropout > 0
        )
        keys = (jax.random.split(self.make_rng("dropout"), L)
                if needs_rng else jnp.zeros((L, 2), jnp.uint32))

        def body(h, xs):
            p_i, key_i = xs
            rngs = {"dropout": key_i} if needs_rng else None
            out = layer.apply({"params": p_i}, h, deterministic, rngs=rngs)
            return out, None

        if self.remat:
            body = jax.checkpoint(body, prevent_cse=False)
        x, _ = jax.lax.scan(body, x, (scanned_params, keys[:n_scanned]))

        if cls_only and L > 1:
            p_last = jax.tree_util.tree_map(lambda a: a[L - 1], stack)
            rngs = {"dropout": keys[L - 1]} if needs_rng else None
            x = layer.apply({"params": p_last}, x, deterministic, 1,
                            rngs=rngs)
            x = x[:, :1]  # only the CLS row is live past the final layer
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layernorm")(x)
        if cls_only:
            return x[:, 0]
        return x
