"""End-to-end logits parity with the reference architecture.

Builds a torch model with the reference's exact module structure and state-
dict naming (/root/reference/models/multimodal_model.py:12-183 +
models/encoders.py) at tiny scale, converts the checkpoint with
convert_full.convert_multimodal_model, and checks the fusion-head logits
match to ≤1e-3 (the BASELINE.json migration target).
"""
import dataclasses

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from simple_multimodal_tpu.models import MultimodalEmotionModel  # noqa: E402
from simple_multimodal_tpu.models.convert_full import convert_multimodal_model  # noqa: E402

F = 32  # fusion hidden size


class TextEncoderT(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.model = transformers.DebertaV2Model(transformers.DebertaV2Config(
            vocab_size=128100, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            max_position_embeddings=64, relative_attention=True,
            position_buckets=16, norm_rel_ebd="layer_norm", share_att_key=True,
            pos_att_type=["p2c", "c2p"], layer_norm_eps=1e-7,
            position_biased_input=False,
        ))
        self.projection = torch.nn.Linear(32, F)

    def forward(self, input_ids, attention_mask):
        seq = self.model(input_ids=input_ids,
                         attention_mask=attention_mask).last_hidden_state
        pooled = seq[:, 0]  # 'bert' in 'deberta-v2' → CLS (encoders.py:87-88)
        return self.projection(pooled)


class AudioEncoderT(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.model = transformers.Wav2Vec2Model(transformers.Wav2Vec2Config(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=64, conv_dim=(16,) * 7,
            conv_kernel=(10, 3, 3, 3, 3, 2, 2),
            conv_stride=(5, 2, 2, 2, 2, 2, 2), num_feat_extract_layers=7,
            num_conv_pos_embeddings=8, num_conv_pos_embedding_groups=2,
            do_stable_layer_norm=False, feat_extract_norm="group",
            apply_spec_augment=False,
        ))
        self.temporal_attention = torch.nn.MultiheadAttention(
            32, 8, dropout=0.0, batch_first=True)
        self.projection = torch.nn.Linear(32, F)

    def forward(self, waveform):
        seq = self.model(waveform).last_hidden_state
        att, _ = self.temporal_attention(seq, seq, seq)
        return self.projection(att.mean(1))


class VideoEncoderT(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.vit = transformers.ViTModel(transformers.ViTConfig(
            image_size=32, patch_size=16, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
        ), add_pooling_layer=False)
        self.temporal_lstm = torch.nn.LSTM(32, 16, num_layers=2,
                                           batch_first=True,
                                           bidirectional=True, dropout=0.0)
        self.facial_attention = torch.nn.MultiheadAttention(
            32, 8, dropout=0.0, batch_first=True)
        self.projection = torch.nn.Linear(32, F)

    def forward(self, frames):  # [B, T, 3, H, W]
        B, T = frames.shape[:2]
        flat = frames.reshape(B * T, *frames.shape[2:])
        cls = self.vit(flat).last_hidden_state[:, 0].reshape(B, T, -1)
        lstm_out, _ = self.temporal_lstm(cls)
        att, _ = self.facial_attention(lstm_out, lstm_out, lstm_out)
        return self.projection(att.mean(1))


class ClassifierT(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.classifier = torch.nn.Sequential(
            torch.nn.Linear(F, F // 2), torch.nn.ReLU(),
            torch.nn.Dropout(0.0), torch.nn.Linear(F // 2, 7))
        self.sentiment_classifier = torch.nn.Linear(F, 3)
        self.positive_classifier = torch.nn.Linear(F, 2)
        self.negative_classifier = torch.nn.Linear(F, 4)

    def forward(self, x):
        return self.classifier(x)


class RefModelT(torch.nn.Module):
    """Reference-structured model with 'early' fusion."""

    def __init__(self):
        super().__init__()
        self.text_encoder = TextEncoderT()
        self.audio_encoder = AudioEncoderT()
        self.video_encoder = VideoEncoderT()
        self.fusion_layer = torch.nn.Module()
        self.fusion_layer.fusion_layers = torch.nn.Sequential(
            torch.nn.Linear(F * 3, F * 2), torch.nn.ReLU(),
            torch.nn.Dropout(0.0), torch.nn.Linear(F * 2, F),
            torch.nn.ReLU(), torch.nn.Dropout(0.0))
        self.classifier = ClassifierT()
        self.valence_regressor = torch.nn.Linear(F, 1)
        self.arousal_regressor = torch.nn.Linear(F, 1)
        self.uncertainty_head = torch.nn.Linear(F, 7)

    def forward(self, input_ids, attention_mask, audio, video):
        t = self.text_encoder(input_ids, attention_mask)
        a = self.audio_encoder(audio)
        v = self.video_encoder(video)
        fused = self.fusion_layer.fusion_layers(torch.cat([t, a, v], -1))
        return {
            "emotion_logits": self.classifier(fused),
            "valence": self.valence_regressor(fused),
            "arousal": self.arousal_regressor(fused),
            "uncertainty": self.uncertainty_head(fused),
            "text_features": t, "audio_features": a, "video_features": v,
        }


def test_full_model_logits_parity(tiny_config):
    torch.manual_seed(0)
    ref = RefModelT().eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    cfg = dataclasses.replace(tiny_config)
    cfg.fusion_type = "early"
    cfg.fusion_dropout = 0.0
    model = MultimodalEmotionModel(cfg)
    params = {"params": convert_multimodal_model(sd, cfg)}

    rng = np.random.default_rng(0)
    B = 2
    ids = rng.integers(1, 120000, (B, cfg.text_max_length)).astype(np.int32)
    mask = np.ones((B, cfg.text_max_length), np.int32)
    mask[1, 10:] = 0
    audio = rng.standard_normal((B, cfg.audio_max_length)).astype(np.float32)
    video = rng.random((B, cfg.video_max_frames, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(
            torch.tensor(ids.astype(np.int64)),
            torch.tensor(mask.astype(np.int64)),
            torch.tensor(audio),
            torch.tensor(video.transpose(0, 1, 4, 2, 3)),  # NCHW for torch
        )

    out = jax.jit(lambda p, t, a, v: model.apply(p, t, a, v))(
        params, {"input_ids": ids, "attention_mask": mask}, audio, video
    )

    for ours_key, ref_key, tol in (
        ("text_features", "text_features", 1e-3),
        ("audio_features", "audio_features", 1e-3),
        ("video_features", "video_features", 1e-3),
        ("emotion_logits", "emotion_logits", 1e-3),
        ("valence", "valence", 1e-3),
        ("arousal", "arousal", 1e-3),
    ):
        np.testing.assert_allclose(
            np.asarray(out[ours_key]), ref_out[ref_key].numpy(),
            atol=tol, rtol=1e-3, err_msg=ours_key,
        )
