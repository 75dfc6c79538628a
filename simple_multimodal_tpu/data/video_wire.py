"""Video wire formats for the host→device boundary.

The flagship's end-to-end throughput through a slow host link is
transfer-bound, and video is ~93% of the bytes (uint8 RGB at
[30, 224, 224, 3] is 4.5 MB/clip; the reference ships f32 tensors — 4×
more, dataset_loaders.py:95-193). ``yuv420`` halves the wire again with
standard 4:2:0 chroma subsampling (BT.601 full-range): the eye — and the
ViT — barely uses chroma at full resolution, and every production camera
pipeline ships 4:2:0 for exactly this reason. Luma stays lossless at 8
bits; chroma is stored at quarter resolution.

Packed layout (per frame, I420-style planar, one uint8 [H*3//2, W] array):

    rows 0        .. H-1        Y plane               [H, W]
    rows H        .. H+H//4-1   U plane, row-major    [H//2, W//2] → [H//4, W]
    rows H+H//4   .. H*3//2-1   V plane, row-major    [H//2, W//2] → [H//4, W]

``pack_yuv420`` runs on host (numpy, at decode/cache time);
``decode_video_wire`` is the single jittable entry every device-side
consumer (train step, VideoEncoder) uses to turn ANY wire format —
packed yuv420 uint8 [B, T, H*3//2, W], RGB uint8 [B, T, H, W, 3], or
pre-normalized float frames — into normalized [B, T, H, W, 3] in the
compute dtype.

Accuracy: round-trip error is bounded by chroma quantization (±2/255 on
flat regions, a few % on saturated color edges); Y (what drives spatial
structure) is exact. The flagship's logit delta and prediction agreement
are validated in tests/test_data.py and measured on-chip (RESULTS.md).
"""
import numpy as np

import jax.numpy as jnp

# BT.601 full-range coefficients (the JPEG/JFIF convention).
_KR, _KG, _KB = 0.299, 0.587, 0.114


def packed_height(h: int) -> int:
    return h * 3 // 2


def can_pack(h: int, w: int) -> bool:
    """Packing needs H divisible by 4 (U/V replanes) and W by 2."""
    return h % 4 == 0 and w % 2 == 0


def pack_yuv420(frames: np.ndarray) -> np.ndarray:
    """uint8 RGB [..., H, W, 3] → packed uint8 [..., H*3//2, W]."""
    if frames.dtype != np.uint8:
        raise ValueError(f"pack_yuv420 expects uint8, got {frames.dtype}")
    *lead, h, w, c = frames.shape
    if c != 3 or not can_pack(h, w):
        raise ValueError(f"cannot 4:2:0-pack shape {frames.shape}")
    f = frames.astype(np.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = _KR * r + _KG * g + _KB * b
    u = (b - y) / (2.0 * (1.0 - _KB)) + 128.0
    v = (r - y) / (2.0 * (1.0 - _KR)) + 128.0
    # 2x2 box-average chroma, then re-plane [H//2, W//2] → [H//4, W]
    sub = lambda p: p.reshape(*lead, h // 2, 2, w // 2, 2).mean(axis=(-3, -1))
    u = sub(u).reshape(*lead, h // 4, w)
    v = sub(v).reshape(*lead, h // 4, w)
    out = np.concatenate([y, u, v], axis=-2)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def unpack_yuv420(packed: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Packed uint8 [..., H*3//2, W] → normalized RGB [..., H, W, 3] in
    ``dtype``, range [0, 1]. Jittable; nearest-neighbor chroma upsample
    (broadcast+reshape — no gathers)."""
    *lead, hp, w = packed.shape
    h = hp * 2 // 3
    p = packed.astype(jnp.float32)
    y = p[..., :h, :]
    u = p[..., h : h + h // 4, :].reshape(*lead, h // 2, w // 2)
    v = p[..., h + h // 4 :, :].reshape(*lead, h // 2, w // 2)

    def up2(q):  # nearest ×2 in both spatial dims
        q = jnp.repeat(q, 2, axis=-2)
        return jnp.repeat(q, 2, axis=-1)

    u = up2(u) - 128.0
    v = up2(v) - 128.0
    r = y + 2.0 * (1.0 - _KR) * v
    b = y + 2.0 * (1.0 - _KB) * u
    g = (y - _KR * r - _KB * b) / _KG
    rgb = jnp.stack([r, g, b], axis=-1)
    return (jnp.clip(rgb, 0.0, 255.0) / 255.0).astype(dtype)


def decode_video_wire(video: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Any wire format → normalized float frames [..., H, W, 3] in ``dtype``.

    - rank-N, uint8, last dim 3:  RGB bytes → /255
    - rank-(N-1), uint8:          yuv420-packed planes → unpack
    - float:                      already normalized frames, cast only
    """
    if video.dtype == jnp.uint8:
        if video.shape[-1] == 3:
            return video.astype(dtype) / 255.0
        return unpack_yuv420(video, dtype)
    return video.astype(dtype)
