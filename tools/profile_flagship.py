"""Per-component on-chip timing of the flagship forward.

Splits the batch-8 hierarchical-base forward into its encoder/fusion/head
pieces so optimization targets stay measured, not guessed. Each component
is jitted in isolation with the same dtypes/shapes the full model uses;
the full forward is timed too so the isolated numbers can be sanity-checked
against the whole (XLA fuses across component seams, so the sum usually
exceeds the in-context total slightly).

Usage: python tools/profile_flagship.py  (TPU backend)
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
    from simple_multimodal_tpu.config import ModelConfig
    from simple_multimodal_tpu.models.encoders import (
        AudioEncoder, TextEncoder, VideoEncoder, resolve_backbone_configs,
        resolve_remat,
    )
    from simple_multimodal_tpu.models.multimodal_model import (
        MultimodalEmotionModel, resolve_dtype,
    )
    from simple_multimodal_tpu.data.video_wire import packed_height

    cfg = ModelConfig()
    cfg.encoder_preset = "base"
    cfg.fusion_type = "hierarchical"
    cfg.compute_dtype = "bfloat16"
    dt = resolve_dtype(cfg)
    B = 8
    rng = np.random.default_rng(0)

    ids = jnp.asarray(rng.integers(1, 1000, (B, 512)), jnp.int32)
    mask = jnp.ones((B, 512), jnp.int32)
    wav = jnp.asarray(rng.standard_normal((B, 160000)) * 0.1, jnp.float32)
    n_f, h, w = 30, 224, 224
    video = jnp.asarray(
        rng.integers(0, 255, (B, n_f, packed_height(h), w)), jnp.uint8)

    rows = []

    te = TextEncoder(cfg, dtype=dt)
    pt = jax.jit(te.init)(jax.random.PRNGKey(0),
                          ids, mask)
    rows.append(("text encoder (DeBERTa, S=512)",
                 timeit(jax.jit(lambda p: te.apply(p, ids, mask)), pt)))

    # --- text internals: embeddings+rel tables vs the layer stack -------
    from simple_multimodal_tpu.models.deberta import DebertaModel

    text_cfg, audio_cfg, _ = resolve_backbone_configs(cfg)
    deb = DebertaModel(text_cfg, dtype=dt,
                       remat=resolve_remat(cfg))
    pdeb = jax.jit(deb.init)(jax.random.PRNGKey(9), ids, mask)
    rows.append(("  text: DeBERTa backbone only",
                 timeit(jax.jit(lambda p: deb.apply(p, ids, mask)), pdeb)))

    ae = AudioEncoder(cfg, dtype=dt)
    pa = jax.jit(ae.init)(jax.random.PRNGKey(1), wav)
    rows.append(("audio encoder (wav2vec2+temporal)",
                 timeit(jax.jit(lambda p: ae.apply(p, wav)), pa)))

    # --- audio internals: conv extractor vs transformer stack -----------
    from simple_multimodal_tpu.models.wav2vec2 import (
        FeatureEncoder, Wav2Vec2Model,
    )

    fe = FeatureEncoder(audio_cfg, dtype=dt)
    pfe = jax.jit(fe.init)(jax.random.PRNGKey(10), wav)
    rows.append(("  audio: conv feature extractor",
                 timeit(jax.jit(lambda p: fe.apply(p, wav)), pfe)))
    w2v = Wav2Vec2Model(audio_cfg, dtype=dt,
                        remat=resolve_remat(cfg))
    pw2v = jax.jit(w2v.init)(jax.random.PRNGKey(11), wav)
    rows.append(("  audio: wav2vec2 full (extractor+transformer)",
                 timeit(jax.jit(lambda p: w2v.apply(p, wav)), pw2v)))

    ve = VideoEncoder(cfg, dtype=dt)
    pv = jax.jit(ve.init)(jax.random.PRNGKey(2), video)
    rows.append(("video encoder (ViT x30 + biLSTM + facial)",
                 timeit(jax.jit(lambda p: ve.apply(p, video)), pv)))

    # --- video-encoder internals (the dominant stage: split it) ---------
    from simple_multimodal_tpu.data.video_wire import decode_video_wire
    from simple_multimodal_tpu.models.vit import ViTModel

    _, _, vit_cfg = resolve_backbone_configs(cfg)
    rows.append(("  video: yuv420 decode only",
                 timeit(jax.jit(lambda v: decode_video_wire(v, dt)), video)))
    frames = jax.jit(lambda v: decode_video_wire(v, dt))(video)
    frames = frames.reshape((B * n_f,) + frames.shape[2:])
    vit = ViTModel(vit_cfg, dtype=dt,
                   remat=resolve_remat(cfg))
    pvit = jax.jit(vit.init)(jax.random.PRNGKey(7), frames[:2])
    rows.append(("  video: ViT stack (240 frames, cls_only)",
                 timeit(jax.jit(
                     lambda p: vit.apply(p, frames, cls_only=True)), pvit)))
    # temporal tail (LSTM + facial attention + projection) on fake features
    from simple_multimodal_tpu.ops.lstm import LSTM
    from simple_multimodal_tpu.ops.attention import MultiHeadAttention
    import flax.linen as fnn

    class _Tail(fnn.Module):
        @fnn.compact
        def __call__(self, x):
            y, _ = LSTM(vit_cfg.hidden_size // 2, num_layers=2,
                        bidirectional=True, dropout=0.0, dtype=dt)(x)
            a, _ = MultiHeadAttention(vit_cfg.hidden_size, 8, 0.0, dtype=dt,
                                      use_flash=vit_cfg.use_flash)(
                y, y, y, need_weights=False)
            return fnn.Dense(cfg.fusion_hidden_size, dtype=dt)(a.mean(axis=1))

    feats = jnp.zeros((B, n_f, vit_cfg.hidden_size), dt)
    tail = _Tail()
    ptail = jax.jit(tail.init)(jax.random.PRNGKey(8), feats)
    rows.append(("  video: biLSTM + facial attn + proj",
                 timeit(jax.jit(lambda p: tail.apply(p, feats)), ptail)))

    model = MultimodalEmotionModel(cfg, dtype=dt)
    text_in = {"input_ids": ids, "attention_mask": mask}
    pm = jax.jit(model.init)(jax.random.PRNGKey(3), text_in, wav, video)
    t_full = timeit(jax.jit(
        lambda p: model.apply(p, text_in, wav, video)["emotion_logits"]), pm)

    total = sum(t for name, t in rows if not name.startswith("  "))
    for name, t in rows:
        print(f"{name:42s}: {t*1e3:7.2f} ms")
    print(f"{'sum of encoders':42s}: {total*1e3:7.2f} ms")
    print(f"{'full forward (fusion+heads included)':42s}: {t_full*1e3:7.2f} ms"
          f"  -> fusion/heads ≈ {(t_full-total)*1e3:.2f} ms")
    print(f"clips/s device-resident: {B/t_full:.1f}")


if __name__ == "__main__":
    main()
