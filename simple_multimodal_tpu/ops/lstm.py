"""Multi-layer bidirectional LSTM for TPU via ``lax.scan``.

XLA:TPU has no cuDNN-style fused LSTM (the reference leans on torch's,
/root/reference/models/encoders.py:183-190), so this implements torch
``nn.LSTM`` semantics directly: gate order (i, f, g, o), per-direction
weights, dropout between layers but not after the last, outputs of the two
directions concatenated on the feature axis.

TPU mapping: the input-to-hidden projection for *all* timesteps is hoisted
out of the scan into one large [B*T, I] x [I, 4H] matmul (MXU-friendly);
the scan body only does the small recurrent [B, H] x [H, 4H] matmul plus
elementwise gates, which is the irreducible sequential core.
"""
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _lstm_direction(
    x: jnp.ndarray,
    w_ih: jnp.ndarray,
    w_hh: jnp.ndarray,
    bias: jnp.ndarray,
    reverse: bool,
) -> jnp.ndarray:
    """One direction of one layer. x [B,T,I] → h-sequence [B,T,H]."""
    B, T, _ = x.shape
    H4 = w_hh.shape[1]
    H = H4 // 4
    # Hoisted input projection: [B, T, 4H] in a single matmul.
    xw = jnp.einsum("bti,ih->bth", x, w_ih, preferred_element_type=jnp.float32)
    xw = (xw + bias).astype(x.dtype)
    xw_t = jnp.swapaxes(xw, 0, 1)  # [T, B, 4H] for scan
    h0 = jnp.zeros((B, H), dtype=x.dtype)
    c0 = jnp.zeros((B, H), dtype=jnp.float32)  # cell state in f32 for stability

    def step(carry, xw_step):
        h, c = carry
        gates = xw_step + jnp.dot(
            h, w_hh, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f.astype(jnp.float32) * c + (i * g).astype(jnp.float32)
        h = (o * jnp.tanh(c).astype(x.dtype)).astype(x.dtype)
        return (h, c), h

    (_, _), hs = jax.lax.scan(step, (h0, c0), xw_t, reverse=reverse)
    return jnp.swapaxes(hs, 0, 1)  # [B, T, H]


class LSTM(nn.Module):
    """torch-``nn.LSTM``-semantics recurrent stack (batch_first)."""

    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = False
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, None]:
        H = self.hidden_size
        num_dir = 2 if self.bidirectional else 1
        out = x.astype(self.dtype)
        for layer in range(self.num_layers):
            in_dim = out.shape[-1]
            dir_outputs = []
            # torch nn.LSTM initializes every weight U[-1/sqrt(H), 1/sqrt(H)]
            # (symmetric; flax's uniform() is [0, scale) and would bias
            # from-scratch training all-positive)
            def lstm_init(key, shape, dtype=jnp.float32):
                bound = 1.0 / jnp.sqrt(jnp.array(H, jnp.float32))
                return jax.random.uniform(key, shape, dtype,
                                          minval=-bound, maxval=bound)

            for d in range(num_dir):
                suffix = f"_l{layer}" + ("_reverse" if d == 1 else "")
                w_ih = self.param(f"w_ih{suffix}", lstm_init, (in_dim, 4 * H))
                w_hh = self.param(f"w_hh{suffix}", lstm_init, (H, 4 * H))
                bias = self.param(
                    f"bias{suffix}", nn.initializers.zeros, (4 * H,)
                )
                dir_outputs.append(
                    _lstm_direction(
                        out,
                        w_ih.astype(self.dtype),
                        w_hh.astype(self.dtype),
                        bias.astype(self.dtype),
                        reverse=(d == 1),
                    )
                )
            out = (
                jnp.concatenate(dir_outputs, axis=-1)
                if num_dir == 2
                else dir_outputs[0]
            )
            if self.dropout > 0 and layer < self.num_layers - 1:
                out = nn.Dropout(rate=self.dropout)(out, deterministic=deterministic)
        return out, None
