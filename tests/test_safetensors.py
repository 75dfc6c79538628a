"""Torch-free safetensors ingestion (models/safetensors_io.py).

The reference loads pretrained backbones with torch ``from_pretrained``
(/root/reference/models/encoders.py:20,116,179); here real HF checkpoint
files (safetensors, HF's default) must import with NO torch on the path.
Fixtures are HF-shaped random state dicts written by our own
``save_safetensors`` (the format is symmetric); the name/transpose mapping
itself is already parity-tested against torch models in
test_encoder_parity.py — these tests cover the container I/O, sharding,
prefix handling, splicing, and the torch-free guarantee (subprocess with a
poisoned ``torch`` import).
"""
import json
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ml_dtypes

from simple_multimodal_tpu.models.safetensors_io import (
    load_backbone_params,
    load_pretrained_backbones,
    load_safetensors,
    load_state_dict,
    save_safetensors,
)

E, L, F, HEADS = 32, 2, 64, 2  # tiny backbone dims (DebertaConfig.tiny)


def test_roundtrip_dtypes(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "a.f32": rng.standard_normal((3, 5)).astype(np.float32),
        "b.bf16": rng.standard_normal((4, 2)).astype(ml_dtypes.bfloat16),
        "c.i32": rng.integers(-9, 9, (7,)).astype(np.int32),
        "d.f16": rng.standard_normal((2, 2, 2)).astype(np.float16),
        "e.bool": np.array([True, False]),
        "f.scalarish": np.float32(3.25).reshape(()),
    }
    p = tmp_path / "t.safetensors"
    save_safetensors(tensors, str(p), metadata={"format": "pt"})
    back = load_safetensors(str(p))
    assert set(back) == set(tensors)
    for k in tensors:
        assert back[k].dtype == tensors[k].dtype, k
        np.testing.assert_array_equal(np.asarray(back[k]),
                                      np.asarray(tensors[k]), err_msg=k)


def test_data_section_alignment(tmp_path):
    """The writer pads the JSON header to 8-byte-align the data section."""
    p = tmp_path / "a.safetensors"
    save_safetensors({"x": np.arange(3, dtype=np.float64)}, str(p))
    raw = p.read_bytes()
    n = int.from_bytes(raw[:8], "little")
    assert (8 + n) % 8 == 0
    json.loads(raw[8:8 + n])  # trailing-space padding is valid JSON


def _deberta_sd(rng, vocab=64, buckets=16):
    sd = {
        "embeddings.word_embeddings.weight":
            rng.standard_normal((vocab, E)).astype(np.float32),
        "embeddings.LayerNorm.weight": np.ones(E, np.float32),
        "embeddings.LayerNorm.bias": np.zeros(E, np.float32),
        "encoder.rel_embeddings.weight":
            rng.standard_normal((2 * buckets, E)).astype(np.float32),
        "encoder.LayerNorm.weight": np.ones(E, np.float32),
        "encoder.LayerNorm.bias": np.zeros(E, np.float32),
    }
    for i in range(L):
        pre = f"encoder.layer.{i}"
        for name in (f"{pre}.attention.self.query_proj",
                     f"{pre}.attention.self.key_proj",
                     f"{pre}.attention.self.value_proj",
                     f"{pre}.attention.output.dense"):
            sd[f"{name}.weight"] = rng.standard_normal((E, E)).astype(
                np.float32)
            sd[f"{name}.bias"] = rng.standard_normal(E).astype(np.float32)
        sd[f"{pre}.attention.output.LayerNorm.weight"] = np.ones(E, np.float32)
        sd[f"{pre}.attention.output.LayerNorm.bias"] = np.zeros(E, np.float32)
        sd[f"{pre}.intermediate.dense.weight"] = rng.standard_normal(
            (F, E)).astype(np.float32)
        sd[f"{pre}.intermediate.dense.bias"] = rng.standard_normal(F).astype(
            np.float32)
        sd[f"{pre}.output.dense.weight"] = rng.standard_normal(
            (E, F)).astype(np.float32)
        sd[f"{pre}.output.dense.bias"] = rng.standard_normal(E).astype(
            np.float32)
        sd[f"{pre}.output.LayerNorm.weight"] = np.ones(E, np.float32)
        sd[f"{pre}.output.LayerNorm.bias"] = np.zeros(E, np.float32)
    return sd


def test_backbone_import_deberta(tmp_path):
    rng = np.random.default_rng(1)
    sd = _deberta_sd(rng)
    p = tmp_path / "model.safetensors"
    save_safetensors(sd, str(p))

    params = load_backbone_params(str(p), "deberta")  # num_layers inferred
    assert params["word_embeddings"]["embedding"].shape == (64, E)
    # torch Linear [out,in] -> flax kernel [in,out] (transposed)
    w = sd["encoder.layer.0.attention.self.query_proj.weight"]
    got = params["layers"]["self"]["query_proj"]["kernel"][0]
    np.testing.assert_allclose(np.asarray(got), w.T)
    # stacked leading axis = num_layers
    assert params["layers"]["intermediate_dense"]["kernel"].shape == (L, E, F)

    # the tree drops into the real flax module and runs
    from simple_multimodal_tpu.models.deberta import DebertaConfig, DebertaModel

    cfg = DebertaConfig.tiny()
    cfg = type(cfg)(**{**cfg.__dict__, "vocab_size": 64,
                       "position_buckets": 16})
    model = DebertaModel(cfg)
    ids = jnp.asarray([[1, 5, 9, 2]], jnp.int32)
    mask = jnp.ones_like(ids)
    out = jax.jit(lambda pr: model.apply({"params": pr}, ids, mask))(
        jax.tree_util.tree_map(jnp.asarray, params))
    assert out.shape == (1, 4, E)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_sharded_index_and_prefix_strip(tmp_path):
    rng = np.random.default_rng(2)
    sd = {f"deberta.{k}": v for k, v in _deberta_sd(rng).items()}
    keys = sorted(sd)
    half = len(keys) // 2
    shards = {"model-00001-of-00002.safetensors": keys[:half],
              "model-00002-of-00002.safetensors": keys[half:]}
    weight_map = {}
    for shard, ks in shards.items():
        save_safetensors({k: sd[k] for k in ks}, str(tmp_path / shard))
        weight_map.update({k: shard for k in ks})
    (tmp_path / "model.safetensors.index.json").write_text(
        json.dumps({"weight_map": weight_map}))

    merged = load_state_dict(str(tmp_path))
    # arch prefix stripped, all keys present
    assert "embeddings.word_embeddings.weight" in merged
    assert len(merged) == len(sd)
    params = load_backbone_params(str(tmp_path), "deberta")
    assert params["layers"]["output_dense"]["kernel"].shape == (L, F, E)


def test_splice_into_full_model(tmp_path):
    """load_pretrained_backbones replaces exactly the backbone subtree of a
    real tiny model and the spliced tree still forwards."""
    from simple_multimodal_tpu.config import ModelConfig
    from simple_multimodal_tpu.data.video_wire import packed_height
    from simple_multimodal_tpu.models import MultimodalEmotionModel

    cfg = ModelConfig(encoder_preset="tiny")
    cfg.fusion_type = "early"
    model = MultimodalEmotionModel(cfg)
    h, w = cfg.video_frame_size
    text = {"input_ids": np.zeros((1, 16), np.int32),
            "attention_mask": np.ones((1, 16), np.int32)}
    audio = np.zeros((1, 3200), np.float32)
    video = np.zeros((1, 2, packed_height(h), w), np.uint8)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), text, audio, video)

    # build a safetensors fixture matching the tiny text backbone dims
    from simple_multimodal_tpu.models.encoders import resolve_backbone_configs

    tcfg, _, _ = resolve_backbone_configs(cfg)
    rng = np.random.default_rng(3)
    sd = _deberta_sd(rng, vocab=tcfg.vocab_size,
                     buckets=tcfg.position_buckets)
    p = tmp_path / "deberta.safetensors"
    save_safetensors(sd, str(p))

    old_leaf = np.asarray(
        params["params"]["text_encoder"]["model"]["word_embeddings"]
        ["embedding"])
    new_params = load_pretrained_backbones(params, text=str(p))
    new_leaf = np.asarray(
        new_params["params"]["text_encoder"]["model"]["word_embeddings"]
        ["embedding"])
    assert not np.allclose(old_leaf, new_leaf)
    # non-backbone subtrees untouched (same objects)
    assert (new_params["params"]["audio_encoder"]
            is params["params"]["audio_encoder"])
    out = jax.jit(lambda pr: model.apply(
        jax.tree_util.tree_map(jnp.asarray, pr), text, audio, video,
        deterministic=True))(new_params)
    assert out["emotion_logits"].shape == (1, cfg.num_emotions)


def test_loader_never_imports_torch(tmp_path):
    """Hard guarantee: the whole safetensors->params path runs with torch
    import-poisoned (VERDICT r4 #8: 'torch absent from the import path')."""
    rng = np.random.default_rng(4)
    save_safetensors(_deberta_sd(rng), str(tmp_path / "model.safetensors"))
    script = f"""
import sys
class _Block:
    def find_module(self, name, path=None):
        if name == "torch" or name.startswith("torch."):
            return self
    def load_module(self, name):
        raise ImportError("torch is poisoned in this test")
sys.meta_path.insert(0, _Block())
sys.path.insert(0, {repr(str(tmp_path.parent))})
from simple_multimodal_tpu.models.safetensors_io import load_backbone_params
p = load_backbone_params({repr(str(tmp_path))}, "deberta")
assert p["layers"]["intermediate_dense"]["kernel"].shape == ({L}, {E}, {F})
assert "torch" not in sys.modules
print("TORCHFREE_OK")
"""
    import os
    import pathlib

    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""))
    r = subprocess.run([sys.executable, "-c", script], capture_output=True,
                       text=True, env=env, timeout=300)
    assert "TORCHFREE_OK" in r.stdout, r.stdout + r.stderr


def test_unsupported_dtype_errors(tmp_path):
    import struct

    header = {"x": {"dtype": "F99", "shape": [1],
                    "data_offsets": [0, 4]}}
    hj = json.dumps(header).encode()
    (tmp_path / "bad.safetensors").write_bytes(
        struct.pack("<Q", len(hj)) + hj + b"\x00" * 4)
    with pytest.raises(ValueError, match="unsupported"):
        load_safetensors(str(tmp_path / "bad.safetensors"))
