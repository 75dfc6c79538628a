"""Golden-numerics parity: Flax backbones vs transformers' torch models.

Builds small random-init torch models from local transformers configs (no
network), converts weights with models/convert.py, and checks outputs match
to ≤1e-3 (BASELINE.json logits-parity target; tolerances here are tighter).
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


def to_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_deberta_parity():
    hf_cfg = transformers.DebertaV2Config(
        vocab_size=512, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, relative_attention=True,
        position_buckets=16, norm_rel_ebd="layer_norm", share_att_key=True,
        pos_att_type=["p2c", "c2p"], layer_norm_eps=1e-7,
        position_biased_input=False, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.DebertaV2Model(hf_cfg).eval()

    cfg = DebertaConfig(
        vocab_size=512, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, max_position_embeddings=64, position_buckets=16,
        hidden_dropout=0.0, attention_dropout=0.0,
    )
    model = DebertaModel(cfg)
    params = {"params": convert_deberta(to_sd(hf), cfg.num_layers)}

    rng = np.random.default_rng(0)
    B, S = 2, 24
    ids = rng.integers(1, 512, (B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    mask[1, 17:] = 0  # ragged mask

    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state.numpy()
    ours = np.asarray(jax.jit(model.apply)(params, ids, mask))
    # positions under the mask are garbage in both; compare valid tokens
    valid = mask.astype(bool)
    np.testing.assert_allclose(ours[valid], ref[valid], atol=2e-4, rtol=1e-3)


def test_wav2vec2_parity():
    hf_cfg = transformers.Wav2Vec2Config(
        vocab_size=32, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        conv_dim=(16, 16), conv_kernel=(10, 3), conv_stride=(5, 2),
        num_feat_extract_layers=2, num_conv_pos_embeddings=8,
        num_conv_pos_embedding_groups=2, do_stable_layer_norm=False,
        feat_extract_norm="group", hidden_dropout=0.0, attention_dropout=0.0,
        feat_proj_dropout=0.0, layerdrop=0.0, apply_spec_augment=False,
    )
    torch.manual_seed(0)
    hf = transformers.Wav2Vec2Model(hf_cfg).eval()

    cfg = Wav2Vec2Config(
        conv_dims=(16, 16), conv_kernels=(10, 3), conv_strides=(5, 2),
        hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
        pos_conv_kernel=8, pos_conv_groups=2,
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
    )
    model = Wav2Vec2Model(cfg, apply_spec_augment=False)
    params = {"params": convert_wav2vec2(to_sd(hf), 2, cfg.num_layers)}

    rng = np.random.default_rng(0)
    wav = rng.standard_normal((2, 800)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.tensor(wav)).last_hidden_state.numpy()
    ours = np.asarray(jax.jit(model.apply)(params, wav))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_wav2vec2_frame_count():
    # 160 000 samples must produce 499 frames (SURVEY §7 hard part #2)
    assert Wav2Vec2Config.base().num_frames(160000) == 499


def test_vit_parity():
    hf_cfg = transformers.ViTConfig(
        image_size=32, patch_size=16, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.ViTModel(hf_cfg, add_pooling_layer=False).eval()

    cfg = ViTConfig(image_size=32, patch_size=16, hidden_size=32,
                    num_layers=2, num_heads=2, intermediate_size=64)
    model = ViTModel(cfg)
    params = {"params": convert_vit(to_sd(hf), cfg.num_layers)}

    rng = np.random.default_rng(0)
    # NHWC for us, NCHW for torch
    imgs = rng.random((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.tensor(imgs.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
    ours = np.asarray(jax.jit(model.apply)(params, imgs))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_mha_parity():
    """ops.attention vs torch nn.MultiheadAttention (fusion-layer numerics)."""
    from simple_multimodal_tpu.models.convert import _mha
    from simple_multimodal_tpu.ops.attention import MultiHeadAttention

    E, H = 32, 4
    torch.manual_seed(0)
    t_mha = torch.nn.MultiheadAttention(E, H, dropout=0.0, batch_first=True).eval()
    sd = {f"x.{k}": v.detach().numpy() for k, v in t_mha.state_dict().items()}
    params = {"params": _mha(sd, "x")}

    model = MultiHeadAttention(E, H, dropout=0.0)
    rng = np.random.default_rng(0)
    q = rng.standard_normal((2, 5, E)).astype(np.float32)
    kv = rng.standard_normal((2, 7, E)).astype(np.float32)
    with torch.no_grad():
        ref_out, ref_w = t_mha(torch.tensor(q), torch.tensor(kv), torch.tensor(kv))
    out, w = jax.jit(model.apply)(params, q, kv, kv)
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(w), ref_w.numpy(), atol=1e-5, rtol=1e-4)


def test_lstm_parity():
    from simple_multimodal_tpu.models.convert import _lstm
    from simple_multimodal_tpu.ops.lstm import LSTM

    I, H = 12, 8
    torch.manual_seed(0)
    t_lstm = torch.nn.LSTM(I, H, num_layers=2, batch_first=True,
                           bidirectional=True, dropout=0.0).eval()
    sd = {f"l.{k}": v.detach().numpy() for k, v in t_lstm.state_dict().items()}
    params = {"params": _lstm(sd, "l", num_layers=2, bidirectional=True)}

    model = LSTM(H, num_layers=2, bidirectional=True, dropout=0.0)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 6, I)).astype(np.float32)
    with torch.no_grad():
        ref, _ = t_lstm(torch.tensor(x))
    out, _ = jax.jit(lambda p, x: model.apply(p, x))(params, x)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5, rtol=1e-4)
