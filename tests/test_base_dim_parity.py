"""Base-dim conversion rehearsal: torch → Flax at REAL shapes.

The regular parity suite verifies numerics at tiny dims (hidden 32, short
sequences); layout/axis bugs can hide at base dims — the 256-bucket/
512-position log-bucket table, the K=128 weight-norm fold, head-dim-64
attention. This suite converts randomly initialized BASE-size torch models
built from local transformers configs (no network needed) and asserts the
≤1e-3 logits-parity target at the reference's real input extents
(512 tokens / 160 000 samples / 224² frames — /root/reference/config.py:
14,20,26; backbones at /root/reference/models/encoders.py:20,116,179).

Slow (~minutes on one CPU core): marked ``slow``; deselect with
``-m "not slow"`` when iterating.
"""
import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from simple_multimodal_tpu.models.convert import (  # noqa: E402
    convert_deberta,
    convert_vit,
    convert_wav2vec2,
)
from simple_multimodal_tpu.models.deberta import DebertaConfig, DebertaModel  # noqa: E402
from simple_multimodal_tpu.models.vit import ViTConfig, ViTModel  # noqa: E402
from simple_multimodal_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Model  # noqa: E402

pytestmark = pytest.mark.slow


def to_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_deberta_base_dims():
    """microsoft/deberta-v3-base architecture at S=512, batch 1.

    Exercises the full 256-bucket log-position table (rel positions up to
    ±511 hit the logarithmic region AND the clip boundary) and head-dim-64
    disentangled attention."""
    hf_cfg = transformers.DebertaV2Config(
        vocab_size=8192,  # embedding size doesn't affect layout coverage
        hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
        intermediate_size=3072, max_position_embeddings=512,
        relative_attention=True, position_buckets=256,
        norm_rel_ebd="layer_norm", share_att_key=True,
        pos_att_type=["p2c", "c2p"], layer_norm_eps=1e-7,
        position_biased_input=False, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.DebertaV2Model(hf_cfg).eval()

    cfg = DebertaConfig(
        vocab_size=8192, hidden_size=768, num_layers=12, num_heads=12,
        intermediate_size=3072, max_position_embeddings=512,
        position_buckets=256, hidden_dropout=0.0, attention_dropout=0.0,
    )
    model = DebertaModel(cfg)
    params = {"params": convert_deberta(to_sd(hf), cfg.num_layers)}

    rng = np.random.default_rng(0)
    B, S = 1, 512
    ids = rng.integers(1, 8192, (B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    mask[0, 490:] = 0  # realistic padding tail

    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state.numpy()
    ours = np.asarray(jax.jit(model.apply)(params, ids, mask))
    valid = mask.astype(bool)
    err = np.abs(ours[valid] - ref[valid]).max()
    assert err <= 1e-3, f"base-dim DeBERTa parity {err} > 1e-3"


def test_wav2vec2_base_dims():
    """facebook/wav2vec2-base-960h architecture at 160 000 samples, batch 1.

    Exercises the 7-conv/320× extractor at full length (→ 499 frames), the
    K=128 grouped weight-norm positional conv fold, and head-dim-64
    attention."""
    hf_cfg = transformers.Wav2Vec2Config(
        vocab_size=32, hidden_size=768, num_hidden_layers=12,
        num_attention_heads=12, intermediate_size=3072,
        conv_dim=(512,) * 7, conv_kernel=(10, 3, 3, 3, 3, 2, 2),
        conv_stride=(5, 2, 2, 2, 2, 2, 2), num_feat_extract_layers=7,
        num_conv_pos_embeddings=128, num_conv_pos_embedding_groups=16,
        do_stable_layer_norm=False, feat_extract_norm="group",
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        layerdrop=0.0, apply_spec_augment=False,
    )
    torch.manual_seed(0)
    hf = transformers.Wav2Vec2Model(hf_cfg).eval()

    cfg = Wav2Vec2Config(hidden_dropout=0.0, attention_dropout=0.0,
                         feat_proj_dropout=0.0)
    model = Wav2Vec2Model(cfg, apply_spec_augment=False)
    params = {"params": convert_wav2vec2(to_sd(hf), 7, cfg.num_layers)}

    rng = np.random.default_rng(0)
    wav = (rng.standard_normal((1, 160000)) * 0.1).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.tensor(wav)).last_hidden_state.numpy()
    ours = np.asarray(jax.jit(model.apply)(params, wav))
    assert ours.shape == ref.shape == (1, 499, 768)
    err = np.abs(ours - ref).max()
    assert err <= 1e-3, f"base-dim wav2vec2 parity {err} > 1e-3"


def test_vit_base_dims():
    """google/vit-base-patch16-224 architecture at 224², batch 1."""
    hf_cfg = transformers.ViTConfig(
        image_size=224, patch_size=16, hidden_size=768, num_hidden_layers=12,
        num_attention_heads=12, intermediate_size=3072,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.ViTModel(hf_cfg, add_pooling_layer=False).eval()

    cfg = ViTConfig()
    model = ViTModel(cfg)
    params = {"params": convert_vit(to_sd(hf), cfg.num_layers)}

    rng = np.random.default_rng(0)
    imgs = rng.random((1, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.tensor(imgs.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
    ours = np.asarray(jax.jit(model.apply)(params, imgs))
    assert ours.shape == ref.shape == (1, 197, 768)
    err = np.abs(ours - ref).max()
    assert err <= 1e-3, f"base-dim ViT parity {err} > 1e-3"
