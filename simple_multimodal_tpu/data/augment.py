"""Device-side, jittable data augmentation.

The reference augments per-item on the host with torch RNG
(/root/reference/data/dataset_loaders.py:195-261): audio gets gaussian noise
(p=0.3) and a linear-interpolation time stretch with factor U[0.8, 1.2]
(p=0.3); video gets a brightness scale U[0.8, 1.2] (p=0.3) and a horizontal
flip (p=0.5). Here the same distributions are applied *on device* as one
fused, PRNG-keyed transform over the whole batch — static shapes throughout
(the time stretch is a fixed-size gather with masking, not a resize), so it
lives inside the jitted train step at negligible cost.
"""
import jax
import jax.numpy as jnp


def _time_stretch(wav: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    """Linear-interp time stretch to length L*factor, then pad/trunc back to L.

    Matches torch ``F.interpolate(mode='linear', align_corners=False)``
    coordinate mapping used by the reference (dataset_loaders.py:221-226),
    expressed as a static-shape gather so it jits without recompiles.
    """
    L = wav.shape[-1]
    new_len = jnp.floor(L * factor)  # traced scalar; shapes stay static
    j = jnp.arange(L, dtype=jnp.float32)
    src = (j + 0.5) * (L / jnp.maximum(new_len, 1.0)) - 0.5
    lo = jnp.clip(jnp.floor(src), 0, L - 1).astype(jnp.int32)
    hi = jnp.clip(lo + 1, 0, L - 1)
    frac = jnp.clip(src - lo.astype(jnp.float32), 0.0, 1.0)
    stretched = wav[lo] * (1.0 - frac) + wav[hi] * frac
    return jnp.where(j < new_len, stretched, 0.0)


def augment_audio(key: jax.Array, audio: jnp.ndarray) -> jnp.ndarray:
    """Batch audio augmentation. audio: f32[B, L]."""

    def one(key, wav):
        k_noise_p, k_noise, k_stretch_p, k_factor = jax.random.split(key, 4)
        add_noise = jax.random.uniform(k_noise_p) < 0.3
        wav = jnp.where(
            add_noise, wav + 0.01 * jax.random.normal(k_noise, wav.shape), wav
        )
        do_stretch = jax.random.uniform(k_stretch_p) < 0.3
        factor = 0.8 + jax.random.uniform(k_factor) * 0.4
        wav = jnp.where(do_stretch, _time_stretch(wav, factor), wav)
        return wav

    keys = jax.random.split(key, audio.shape[0])
    return jax.vmap(one)(keys, audio)


def augment_video(key: jax.Array, video: jnp.ndarray) -> jnp.ndarray:
    """Batch video augmentation. video: f32[B, T, H, W, 3] in [0, 1]."""

    def one(key, vid):
        k_bright_p, k_bright, k_flip = jax.random.split(key, 3)
        do_bright = jax.random.uniform(k_bright_p) < 0.3
        factor = 0.8 + jax.random.uniform(k_bright) * 0.4
        vid = jnp.where(do_bright, jnp.clip(vid * factor, 0.0, 1.0), vid)
        do_flip = jax.random.uniform(k_flip) < 0.5
        vid = jnp.where(do_flip, vid[:, :, ::-1, :], vid)
        return vid

    keys = jax.random.split(key, video.shape[0])
    return jax.vmap(one)(keys, video)


@jax.jit
def augment_batch(key: jax.Array, audio: jnp.ndarray, video: jnp.ndarray):
    """Apply audio+video augmentation with independent per-sample keys.

    Jitted: augmentation is one fused executable (it also runs fused inside
    the jitted train step); eager dispatch of the many small RNG ops is
    pathologically slow on small hosts.
    """
    k_a, k_v = jax.random.split(key)
    return augment_audio(k_a, audio), augment_video(k_v, video)
