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

    @nn.compact
    def __call__(self, hidden: jnp.ndarray, deterministic: bool = True):
        cfg = self.config
        E, H = cfg.hidden_size, cfg.num_heads
        D = E // H
        B, S, _ = hidden.shape

        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layernorm_before")(hidden)
        # Attention routing (v5e-measured, round 3): per-op attention
        # kernels LOSE in-context at these shapes regardless of their inner
        # speed — the custom call forces [B, S, H, D] q/k/v/out tensors to
        # materialize in HBM (an *identity* kernel cost +38 ms on the
        # 240-frame forward). The block kernel fuses qkv-projection +
        # attention + out-projection with natural [B, S, E] I/O instead.
        from ..ops.attention import DenseParams
        from ..ops.pallas.attention_block import attention_block, block_viable

        fused_ok = (cfg.use_flash
                    and (deterministic or cfg.attention_dropout == 0.0))
        if fused_ok and H * D == E and block_viable(S, H, D, E):
            wq, bq = DenseParams(E, name="query")(E)
            wk, bk = DenseParams(E, name="key")(E)
            wv, bv = DenseParams(E, name="value")(E)
            wo, bo = DenseParams(E, name="attn_output")(E)
            attn = attention_block(
                x, wq.astype(self.dtype), bq.astype(self.dtype),
                wk.astype(self.dtype), bk.astype(self.dtype),
                wv.astype(self.dtype), bv.astype(self.dtype),
                wo.astype(self.dtype), bo.astype(self.dtype), num_heads=H,
            )
        else:
            q = nn.Dense(E, dtype=self.dtype, name="query")(x).reshape(B, S, H, D)
            k = nn.Dense(E, dtype=self.dtype, name="key")(x).reshape(B, S, H, D)
            v = nn.Dense(E, dtype=self.dtype, name="value")(x).reshape(B, S, H, D)
            if fused_ok and S > 512:
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
            attn = nn.Dense(E, dtype=self.dtype, name="attn_output")(ctx.reshape(B, S, E))
        attn = nn.Dropout(cfg.hidden_dropout)(attn, deterministic=deterministic)
        hidden = hidden + attn

        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layernorm_after")(hidden)
        x = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                     name="intermediate_dense")(x)
        x = gelu(x, self.dtype)
        x = nn.Dense(E, dtype=self.dtype, name="output_dense")(x)
        x = nn.Dropout(cfg.hidden_dropout)(x, deterministic=deterministic)
        out = hidden + x
        return (out, None) if self.scan else out


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

        # nn.scan over stacked [L, ...] layer params: one traced/compiled
        # body instead of num_layers unrolled copies (see deberta.py note).
        layer_cls = (
            nn.remat(ViTLayer, static_argnums=(2,), prevent_cse=False)
            if self.remat else ViTLayer
        )
        scanned = nn.scan(
            layer_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=nn.broadcast,
            length=cfg.num_layers,
        )
        x, _ = scanned(cfg, dtype=self.dtype, scan=True, name="layers")(
            x, deterministic
        )
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layernorm")(x)
        if cls_only:
            return x[:, 0]
        return x
