"""Parameter-efficient tuning blocks and modality dropout.

Reference counterparts: ``AdapterLayer`` (/root/reference/models/encoders.py:254-277)
and ``ModalityDropout`` (encoders.py:280-321). The modality dropout here is
fully vectorized: the reference's "revive one modality when all three were
dropped" fallback (encoders.py:307-314) becomes a branch-free categorical
draw merged with ``where`` — same distribution, no host-side control flow,
jit-safe.
"""
import jax
import jax.numpy as jnp
from flax import linen as nn


class AdapterLayer(nn.Module):
    """Bottleneck residual adapter: down → ReLU → dropout → up → +residual."""

    adapter_size: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        hidden = x.shape[-1]
        init = nn.initializers.normal(stddev=0.02)
        h = nn.Dense(self.adapter_size, kernel_init=init, dtype=self.dtype,
                     name="down_project")(x)
        h = nn.relu(h)
        h = nn.Dropout(rate=self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(hidden, kernel_init=init, dtype=self.dtype,
                     name="up_project")(h)
        return x + h


def modality_dropout(
    key: jax.Array,
    text: jnp.ndarray,
    audio: jnp.ndarray,
    video: jnp.ndarray,
    rate: float = 0.1,
):
    """Per-sample Bernoulli drop of each modality; at least one survives.

    Matches the reference distribution (encoders.py:303-319): each modality
    is independently kept with prob 1-rate; rows where all three dropped
    revive one uniformly at random.
    """
    B = text.shape[0]
    k_mask, k_revive = jax.random.split(key)
    keep = jax.random.uniform(k_mask, (B, 3)) > rate  # bool [B, 3]
    all_dropped = ~jnp.any(keep, axis=1)  # [B]
    revive = jax.nn.one_hot(
        jax.random.randint(k_revive, (B,), 0, 3), 3, dtype=jnp.bool_
    )
    keep = jnp.where(all_dropped[:, None], revive, keep)
    mask = keep.astype(text.dtype)
    return (
        text * mask[:, 0:1],
        audio * mask[:, 1:2],
        video * mask[:, 2:3],
    )


class ModalityDropout(nn.Module):
    """Flax wrapper drawing its key from the 'dropout' RNG collection."""

    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, text, audio, video, training: bool = True):
        if not training:
            return text, audio, video
        key = self.make_rng("dropout")
        return modality_dropout(key, text, audio, video, self.dropout_rate)
