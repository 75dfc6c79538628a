"""Per-stage on-chip timing for the Wav2Vec2 audio encoder.

The audio encoder measures ~25 ms/batch-8 while its transformer stack's
MXU roofline is ~6 ms — this tool splits the time between the conv
feature extractor, the positional conv, and the transformer stack so the
optimization target is measured, not guessed.

Usage: python tools/profile_wav2vec2.py  (TPU backend)
"""
import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


from _timing import timeit  # noqa: E402


def main():
    from simple_multimodal_tpu.models.wav2vec2 import (
        FeatureEncoder, PositionalConvEmbedding, Wav2Vec2Config,
        Wav2Vec2EncoderLayer, Wav2Vec2Model,
    )

    if jax.default_backend() not in ("tpu",):
        print(f"warning: backend is {jax.default_backend()}")

    cfg = Wav2Vec2Config.base()
    cfg = type(cfg)(**{**cfg.__dict__, "use_flash": True})
    B, T = 8, 160000
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((B, T)) * 0.1, dt)

    # 1. full model
    m = Wav2Vec2Model(cfg, dtype=dt, apply_spec_augment=False)
    p = jax.jit(m.init)(jax.random.PRNGKey(0), wav)
    f_full = jax.jit(lambda p, w: m.apply(p, w))
    t_full = timeit(f_full, p, wav)

    # 2. feature extractor alone
    fe = FeatureEncoder(cfg, dtype=dt)
    pfe = jax.jit(fe.init)(jax.random.PRNGKey(0), wav)
    f_fe = jax.jit(lambda p, w: fe.apply(p, w))
    t_fe = timeit(f_fe, pfe, wav)
    feats = f_fe(pfe, wav)
    S = feats.shape[1]

    # 2b. each conv layer alone (with gelu, as in the model)
    from simple_multimodal_tpu.ops.attention import gelu
    from flax import linen as nn
    x = wav[..., None]
    per_layer = []
    for i, (dim, k, s) in enumerate(
        zip(cfg.conv_dims, cfg.conv_kernels, cfg.conv_strides)
    ):
        conv = nn.Conv(dim, kernel_size=(k,), strides=(s,), padding="VALID",
                       use_bias=False, dtype=dt)
        pc = jax.jit(conv.init)(jax.random.PRNGKey(i), x)
        g = jax.jit(lambda p, x: gelu(conv.apply(p, x), dt))
        t = timeit(g, pc, x, iters=20)
        flops = 2 * B * ((x.shape[1] - k) // s + 1) * dim * k * x.shape[-1]
        per_layer.append((i, x.shape[1], k, s, t, flops))
        x = g(pc, x)
    # group norm pass on conv0 output
    shape0 = (B, (T - 10) // 5 + 1, 512)
    gn = nn.GroupNorm(num_groups=512, epsilon=1e-5, dtype=dt)
    x0 = jnp.asarray(rng.standard_normal(shape0) * 0.1, dt)
    pgn = jax.jit(gn.init)(jax.random.PRNGKey(9), x0)
    t_gn = timeit(jax.jit(lambda p, x: gn.apply(p, x)), pgn, x0)

    # 3. positional conv
    pce = PositionalConvEmbedding(cfg, dtype=dt)
    h = jnp.asarray(rng.standard_normal((B, S, cfg.hidden_size)) * 0.1, dt)
    pp = jax.jit(pce.init)(jax.random.PRNGKey(1), h)
    t_pos = timeit(jax.jit(lambda p, h: pce.apply(p, h)), pp, h)

    # 4. one transformer layer (fused path)
    lay = Wav2Vec2EncoderLayer(cfg, dtype=dt)
    pl = jax.jit(lay.init)(jax.random.PRNGKey(2), h)
    t_lay = timeit(jax.jit(lambda p, h: lay.apply(p, h)), pl, h)

    print(f"frames S={S}")
    print(f"full model       : {t_full*1e3:8.2f} ms")
    print(f"feature extractor: {t_fe*1e3:8.2f} ms")
    for i, L, k, s, t, flops in per_layer:
        print(f"  conv_{i} (len {L:>6}, k{k}/s{s}): {t*1e3:7.2f} ms  "
              f"{flops/t/1e12:6.1f} TF/s")
    print(f"  group_norm pass on conv0 out:  {t_gn*1e3:7.2f} ms")
    print(f"pos conv         : {t_pos*1e3:8.2f} ms")
    print(f"1 encoder layer  : {t_lay*1e3:8.2f} ms  (x12 = {t_lay*12e3:.1f})")
    resid = t_full - t_fe - t_pos - 12 * t_lay
    print(f"residual (proj/LN/dropout/...): {resid*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
