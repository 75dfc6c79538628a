import jax
import numpy as np
import pytest

from simple_multimodal_tpu.data.audio_io import (
    load_audio_fixed,
    read_wav,
    resample_np,
    write_wav,
)
from simple_multimodal_tpu.data.dataset import (
    DataLoader,
    FewShotDataset,
    collate,
    get_dataset,
)
from simple_multimodal_tpu.data.sample_data import create_sample_dataset, synth_audio
from simple_multimodal_tpu.data.tokenizer import CLS_ID, PAD_ID, SEP_ID, HashTokenizer


def test_wav_roundtrip(tmp_path):
    rate = 16000
    wav = np.sin(np.linspace(0, 100, rate)).astype(np.float32) * 0.5
    path = tmp_path / "t.wav"
    write_wav(path, wav, rate)
    back, r = read_wav(path)
    assert r == rate
    assert back.shape == (1, rate)
    np.testing.assert_allclose(back[0], wav, atol=1e-3)


def test_resample_preserves_tone():
    # A 440 Hz tone resampled 44.1k -> 16k should still be a 440 Hz tone.
    src_rate, dst_rate = 44100, 16000
    t = np.arange(src_rate) / src_rate
    wav = np.sin(2 * np.pi * 440 * t).astype(np.float32)[None]
    out = resample_np(wav, src_rate, dst_rate)
    assert abs(out.shape[-1] - dst_rate) <= 2
    spec = np.abs(np.fft.rfft(out[0, 1000:-1000]))
    freqs = np.fft.rfftfreq(out.shape[-1] - 2000, 1 / dst_rate)
    assert abs(freqs[np.argmax(spec)] - 440) < 5


def test_load_audio_fixed_pads_and_truncates(tmp_path):
    rate = 16000
    write_wav(tmp_path / "short.wav", np.ones(1000, np.float32) * 0.1, rate)
    out = load_audio_fixed(tmp_path / "short.wav", rate, 4000)
    assert out.shape == (4000,)
    assert np.all(out[1000:] == 0)
    out2 = load_audio_fixed(tmp_path / "short.wav", rate, 500)
    assert out2.shape == (500,)
    # missing file -> zeros
    out3 = load_audio_fixed(tmp_path / "nope.wav", rate, 100)
    assert np.all(out3 == 0)


def test_tokenizer_shapes_and_determinism():
    tok = HashTokenizer(model_max_length=16)
    enc = tok(["Hello world!", "a much longer sentence " * 10])
    assert enc["input_ids"].shape == (2, 16)
    assert enc["attention_mask"].shape == (2, 16)
    assert enc["input_ids"][0, 0] == CLS_ID
    row = enc["input_ids"][0]
    sep_pos = np.argmax(row == SEP_ID)
    assert np.all(row[sep_pos + 1 :] == PAD_ID)
    # long input fills all 16 slots, ends with SEP
    assert enc["input_ids"][1, -1] == SEP_ID
    enc2 = tok(["Hello world!", "a much longer sentence " * 10])
    np.testing.assert_array_equal(enc["input_ids"], enc2["input_ids"])


@pytest.fixture(scope="module")
def sample_dataset_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sample_data")
    create_sample_dataset(str(d), num_samples_per_emotion=2, duration=0.3)
    return d


def test_sample_dataset_files(sample_dataset_dir):
    for split in ["train", "val", "test"]:
        assert (sample_dataset_dir / f"{split}.csv").exists()
    wavs = list((sample_dataset_dir / "audio").glob("*.wav"))
    vids = list((sample_dataset_dir / "video").glob("*.mp4"))
    assert len(wavs) == 14 and len(vids) == 14


def test_synth_audio_distinct():
    a = synth_audio("happy", 0.3)
    b = synth_audio("sad", 0.3)
    assert a.shape == b.shape
    assert not np.allclose(a, b)


def test_difficulty_knob(tmp_path):
    """--difficulty (create_sample_data.py --difficulty, VERDICT-r4 item 5):
    d=0 reproduces the original generator bit-for-bit; d=1 blends a
    confuser into the media, may flip labels, and records the knob."""
    import csv as _csv
    import json

    d0a, d0b, d1 = (tmp_path / n for n in ("d0a", "d0b", "d1"))
    create_sample_dataset(str(d0a), num_samples_per_emotion=2, duration=0.3)
    create_sample_dataset(str(d0b), num_samples_per_emotion=2, duration=0.3,
                          difficulty=0.0)
    create_sample_dataset(str(d1), num_samples_per_emotion=2, duration=0.3,
                          difficulty=1.0)
    # d=0 explicit == default, bit-for-bit (csvs and media)
    for split in ["train", "val", "test"]:
        assert (d0a / f"{split}.csv").read_bytes() == (
            d0b / f"{split}.csv").read_bytes()
    wav = "happy_000.wav"
    assert (d0a / "audio" / wav).read_bytes() == (
        d0b / "audio" / wav).read_bytes()
    # d=1 media genuinely differ (confuser blend + noise), same seed
    assert (d0a / "audio" / wav).read_bytes() != (
        d1 / "audio" / wav).read_bytes()
    assert (d0a / "video" / "happy_000.mp4").read_bytes() != (
        d1 / "video" / "happy_000.mp4").read_bytes()
    # knob is recorded; label flips only occur at d>0 and stay a minority
    meta = json.loads((d1 / "generation_meta.json").read_text())
    assert meta["difficulty"] == 1.0

    def flips(root):
        n = 0
        for split in ["train", "val", "test"]:
            with open(root / f"{split}.csv") as f:
                for row in _csv.DictReader(f):
                    if not row["audio_path"].startswith(
                            f"audio/{row['emotion']}_"):
                        n += 1
        return n

    assert flips(d0a) == 0
    assert 0 < flips(d1) <= 7  # seed-42 deterministic; ~10% of 14 samples
    with pytest.raises(ValueError):
        create_sample_dataset(str(tmp_path / "bad"),
                              num_samples_per_emotion=1, difficulty=1.5)


def test_dataset_and_loader(sample_dataset_dir, tiny_config):
    cfg = tiny_config
    ds = get_dataset("sample", str(sample_dataset_dir), "train", cfg)
    assert len(ds) > 0
    item = ds[0]
    assert item["text"]["input_ids"].shape == (cfg.text_max_length,)
    assert item["audio"].shape == (cfg.audio_max_length,)
    # default wire format is yuv420: packed [T, H*3//2, W] planes
    assert item["video"].shape == (cfg.video_max_frames, 48, 32)
    assert item["video"].dtype == np.uint8

    loader = DataLoader(ds, batch_size=4, shuffle=True, seed=0)
    batches = list(loader)
    assert len(batches) == len(loader)
    b = batches[0]
    assert b["audio"].shape == (4, cfg.audio_max_length)
    assert b["video"].shape == (4, cfg.video_max_frames, 48, 32)
    assert b["emotion"].shape == (4,)
    # final batch wrap-pads to full size
    assert batches[-1]["audio"].shape[0] == 4


def test_dataset_cache_hit(sample_dataset_dir, tiny_config):
    ds = get_dataset("sample", str(sample_dataset_dir), "val", tiny_config)
    _ = ds[0]
    row = ds.data[0]
    cache = (sample_dataset_dir / row["audio_path"]).with_suffix(".wav.aud16.npy")
    assert cache.exists()
    item2 = ds[0]
    assert item2["audio"].shape == (tiny_config.audio_max_length,)


def test_few_shot_dataset(sample_dataset_dir, tiny_config):
    base = get_dataset("sample", str(sample_dataset_dir), "train", tiny_config)
    fs = FewShotDataset(base, n_shot=1, seed=42)
    # at most one per class present in the train split
    assert 1 <= len(fs) <= 7
    labels = [fs[i]["emotion"] for i in range(len(fs))]
    assert len(set(int(l) for l in labels)) == len(labels)
    fs2 = FewShotDataset(base, n_shot=1, seed=42)
    assert fs.few_shot_indices == fs2.few_shot_indices


def test_augment_shapes(tiny_config):
    import jax

    from simple_multimodal_tpu.data.augment import augment_batch

    key = jax.random.PRNGKey(0)
    audio = np.random.randn(2, 3200).astype(np.float32)
    video = np.random.rand(2, 4, 32, 32, 3).astype(np.float32)
    a2, v2 = augment_batch(key, audio, video)
    assert a2.shape == audio.shape
    assert v2.shape == video.shape
    assert np.all(np.asarray(v2) >= 0) and np.all(np.asarray(v2) <= 1)


def test_config_roundtrip(tmp_path):
    from simple_multimodal_tpu.config import (
        DataConfig, ModelConfig, config_from_dict, config_to_dict,
        load_config_json, save_config_json,
    )

    cfg = ModelConfig(batch_size=4, data_path=str(tmp_path / "d"),
                      save_path=str(tmp_path / "c"), log_path=str(tmp_path / "l"))
    cfg.fusion_type = "mult"  # attached attr, like the reference CLI does
    dc = DataConfig(primary_dataset="meld")
    path = tmp_path / "final_config.json"
    save_config_json(str(path), model_config=cfg, data_config=dc)
    data = load_config_json(str(path))
    assert data["model_config"]["fusion_type"] == "mult"
    assert data["data_config"]["primary_dataset"] == "meld"
    back = config_from_dict(ModelConfig, data["model_config"])
    assert back.batch_size == 4
    assert back.fusion_type == "mult"
    assert back.video_frame_size == (224, 224)  # list→tuple normalization


def test_loader_smaller_than_batch(sample_dataset_dir, tiny_config):
    ds = get_dataset("sample", str(sample_dataset_dir), "val", tiny_config)
    assert len(ds) < 8
    loader = DataLoader(ds, batch_size=8, shuffle=False)
    batches = list(loader)
    assert len(batches) == 1
    assert batches[0]["audio"].shape[0] == 8  # cycled wrap-pad


def test_audio_ships_int16(sample_dataset_dir, tiny_config):
    ds = get_dataset("sample", str(sample_dataset_dir), "train", tiny_config)
    item = ds[0]
    assert item["audio"].dtype == np.int16
    # dequantized on device: model accepts int16 directly
    import jax

    from simple_multimodal_tpu.models.encoders import AudioEncoder

    enc = AudioEncoder(tiny_config)
    audio = np.stack([item["audio"], item["audio"]])
    params = jax.jit(enc.init)(jax.random.PRNGKey(0), audio)
    out = jax.jit(lambda p, a: enc.apply(p, a))(params, audio)
    assert np.all(np.isfinite(np.asarray(out["features"])))
    # f32 input gives the same features (within dequantization error)
    out_f32 = jax.jit(lambda p, a: enc.apply(p, a))(
        params, audio.astype(np.float32) / 32768.0)
    np.testing.assert_allclose(np.asarray(out["features"]),
                               np.asarray(out_f32["features"]), atol=1e-4)


def test_kfold_and_ratio_splits(tmp_path):
    import csv

    from simple_multimodal_tpu.data.splits import (
        kfold_csvs, kfold_indices, ratio_split,
    )

    labels = ["happy"] * 10 + ["sad"] * 10 + ["angry"] * 5
    folds = list(kfold_indices(labels, k=5, seed=0))
    assert len(folds) == 5
    all_val = np.concatenate([v for _, v in folds])
    assert sorted(all_val.tolist()) == list(range(25))  # exact partition
    for train, val in folds:
        assert set(train) & set(val) == set()
        # stratification: every fold's val has the majority classes
        val_labels = {labels[i] for i in val}
        assert {"happy", "sad"} <= val_labels

    s = ratio_split(labels, test_split=0.2, val_split=0.2, seed=0)
    assert len(s["train"]) + len(s["val"]) + len(s["test"]) == 25
    assert set(np.concatenate(list(s.values())).tolist()) == set(range(25))

    # CSV round trip
    rows = [{"text": f"t{i}", "audio_path": "a", "video_path": "v",
             "emotion": labels[i], "sample_id": i} for i in range(25)]
    combined = tmp_path / "all.csv"
    with open(combined, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    dirs = kfold_csvs(str(combined), str(tmp_path / "folds"), k=3, seed=0)
    assert len(dirs) == 3
    for d in dirs:
        for split in ("train", "val", "test"):
            with open(f"{d}/{split}.csv", newline="") as f:
                assert len(list(csv.DictReader(f))) > 0


def test_fewshot_episodes_resample_query(sample_dataset_dir, tiny_config):
    """Consecutive episodes must draw DIFFERENT query batches (the reference
    protocol reshuffles per episode; round 1 fed one fixed batch 100x)."""
    from simple_multimodal_tpu.data import FewShotDataset, create_dataloader

    train = get_dataset("sample", str(sample_dataset_dir), "train", tiny_config)
    fs = FewShotDataset(train, n_shot=1, n_way=tiny_config.num_emotions)
    loader = create_dataloader(fs, batch_size=3, shuffle=True, seed=0)
    draws = [tuple(next(iter(loader))["sample_ids"]) for _ in range(6)]
    assert len(set(draws)) > 1, "every episode saw the identical query batch"


def test_device_cached_loader_reshuffles_batch_composition(
        sample_dataset_dir, tiny_config):
    from simple_multimodal_tpu.data import create_dataloader
    from simple_multimodal_tpu.data.pipeline import DeviceCachedLoader

    ds = get_dataset("sample", str(sample_dataset_dir), "train", tiny_config)
    loader = create_dataloader(ds, batch_size=2, shuffle=False)
    cached = DeviceCachedLoader(loader, seed=0)

    def epoch_batches(epoch):
        cached.set_epoch(epoch)
        out = []
        for b in cached:
            ids = list(b["sample_ids"])
            emo = np.asarray(jax.device_get(b["emotion"]))
            assert emo.shape[0] == 2
            out.append(tuple(ids))
        return out

    e0, e1 = epoch_batches(0), epoch_batches(1)
    # same multiset of samples overall…
    assert sorted(sum(map(list, e0), [])) == sorted(sum(map(list, e1), []))
    # …but a different sample-to-batch assignment
    assert set(e0) != set(e1)


def test_device_cached_loader_labels_track_samples(
        sample_dataset_dir, tiny_config):
    """The gathered emotion labels must stay aligned with sample_ids."""
    from simple_multimodal_tpu.data import create_dataloader
    from simple_multimodal_tpu.data.pipeline import DeviceCachedLoader

    ds = get_dataset("sample", str(sample_dataset_dir), "train", tiny_config)
    loader = create_dataloader(ds, batch_size=2, shuffle=False)
    truth = {}
    for b in loader:
        for sid, e in zip(b["sample_ids"], np.asarray(b["emotion"])):
            truth[sid] = int(e)
    cached = DeviceCachedLoader(loader, seed=1)
    cached.set_epoch(5)
    for b in cached:
        for sid, e in zip(b["sample_ids"],
                          np.asarray(jax.device_get(b["emotion"]))):
            assert truth[sid] == int(e)


def _mini_spm_pieces():
    from simple_multimodal_tpu.data.spm import (
        CONTROL, NORMAL, UNKNOWN)

    return [
        ("[PAD]", 0.0, CONTROL), ("[CLS]", 0.0, CONTROL),
        ("[SEP]", 0.0, CONTROL), ("[UNK]", 0.0, UNKNOWN),
        ("▁", -3.0, NORMAL),
        ("▁hello", -1.0, NORMAL),
        ("▁world", -1.5, NORMAL),
        ("he", -4.0, NORMAL), ("llo", -4.0, NORMAL),
        ("l", -5.0, NORMAL), ("o", -5.0, NORMAL),
        ("w", -5.0, NORMAL), ("or", -4.5, NORMAL), ("ld", -4.5, NORMAL),
        ("▁he", -3.5, NORMAL),
    ]


def test_spm_proto_roundtrip():
    from simple_multimodal_tpu.data.spm import (
        parse_model_proto, serialize_model_proto)

    pieces = _mini_spm_pieces()
    blob = serialize_model_proto(pieces)
    parsed = parse_model_proto(blob)
    assert [(p, t) for p, _, t in parsed] == [(p, t) for p, _, t in pieces]
    assert np.allclose([s for _, s, _ in parsed], [s for _, s, _ in pieces])


def test_spm_unigram_golden_ids(tmp_path):
    """Hand-derived Viterbi segmentations over a checked-in mini unigram
    model (the golden reference for sentencepiece semantics: best-score
    segmentation, ▁ dummy prefix, whitespace collapse, unk merging)."""
    from simple_multimodal_tpu.data.spm import (
        SentencePieceUnigram, serialize_model_proto)

    path = tmp_path / "spm.model"
    path.write_bytes(serialize_model_proto(_mini_spm_pieces()))
    sp = SentencePieceUnigram.from_file(str(path))

    # "▁hello"(-1) + "▁world"(-1.5) beats every decomposition
    assert sp.encode("hello world") == [5, 6]
    # whitespace collapses before segmentation
    assert sp.encode("  hello \t world ") == [5, 6]
    # no space → "world" must be built from sub-pieces: w|or|ld
    assert sp.encode("helloworld") == [5, 11, 12, 13]
    # unknown run merges into ONE unk token after the matched "▁"
    assert sp.encode("hello zzz") == [5, 4, 3]
    assert sp.encode("") == []


def test_spm_tokenizer_framing_and_resolution(tmp_path, monkeypatch):
    from simple_multimodal_tpu.data.spm import serialize_model_proto
    from simple_multimodal_tpu.data.tokenizer import SpmTokenizer, get_tokenizer

    path = tmp_path / "spm.model"
    path.write_bytes(serialize_model_proto(_mini_spm_pieces()))

    tok = SpmTokenizer(str(path), model_max_length=8)
    enc = tok(["hello world"], max_length=8)
    # [CLS] ▁hello ▁world [SEP] pad pad pad pad
    assert enc["input_ids"][0].tolist() == [1, 5, 6, 2, 0, 0, 0, 0]
    assert enc["attention_mask"][0].tolist() == [1, 1, 1, 1, 0, 0, 0, 0]

    # resolution: spm file found via env var → SpmTokenizer, not Hash
    monkeypatch.setenv("SMM_SPM_MODEL", str(path))
    got = get_tokenizer("microsoft/deberta-v3-base", max_length=8)
    assert isinstance(got, SpmTokenizer)
    monkeypatch.delenv("SMM_SPM_MODEL")
    got = get_tokenizer("microsoft/deberta-v3-base", max_length=8)
    assert isinstance(got, HashTokenizer)


# ---- video wire format (yuv420 packing) -----------------------------------


def test_yuv420_roundtrip_error_bound():
    from simple_multimodal_tpu.data.video_wire import (
        decode_video_wire, pack_yuv420, unpack_yuv420,
    )

    rng = np.random.default_rng(0)
    # synthetic-benchmark-like content: flat colored shapes on black
    frames = np.zeros((3, 32, 32, 3), np.uint8)
    frames[0, 4:20, 4:20] = (255, 165, 0)
    frames[1, :, 8:16] = (0, 100, 255)
    frames[2] = rng.integers(0, 255, (32, 32, 3))  # worst case: noise
    packed = pack_yuv420(frames)
    assert packed.shape == (3, 48, 32) and packed.dtype == np.uint8

    out = np.asarray(unpack_yuv420(packed))
    ref = frames.astype(np.float32) / 255.0
    # flat/shape content (what video actually looks like): near-exact
    assert np.abs(ref[:2] - out[:2]).max() < 2.0 / 255.0
    # luma on flat content is exact up to quantization
    w = np.array([0.299, 0.587, 0.114], np.float32)
    assert np.abs(ref[:2] @ w - out[:2] @ w).max() < 2.0 / 255.0
    # Per-pixel-random COLOR is the adversarial worst case for 4:2:0
    # (chroma decimation destroys it by construction; no real video has
    # per-pixel-independent chroma). Documented, bounded, not pretty:
    assert np.abs(ref[2] - out[2]).mean() < 0.2
    # ... but its luma (the spatial structure ViT features ride on)
    # survives to within clipping effects even there
    assert np.abs(ref[2] @ w - out[2] @ w).mean() < 6.0 / 255.0

    # decode_video_wire dispatch: packed rank-4, rgb rank-5, float passthru
    assert decode_video_wire(packed).shape == (3, 32, 32, 3)
    assert np.allclose(np.asarray(decode_video_wire(frames)), ref)
    assert np.asarray(decode_video_wire(ref)).dtype == np.float32


def test_wire_format_rgb8_fallback(sample_dataset_dir, tiny_config):
    import dataclasses

    cfg = dataclasses.replace(tiny_config, video_wire_format="rgb8")
    ds = get_dataset("sample", str(sample_dataset_dir), "val", cfg)
    item = ds[0]
    assert item["video"].shape == (cfg.video_max_frames, 32, 32, 3)


def test_model_zeroed_packed_video_is_black(tiny_config):
    """Missing-modality zeroing must act on decoded frames: a zeroed
    packed plane would otherwise decode to green (chroma 0 = -128)."""
    from simple_multimodal_tpu.data.video_wire import decode_video_wire

    zero_packed = np.zeros((1, 2, 48, 32), np.uint8)
    dec = np.asarray(decode_video_wire(zero_packed))
    assert dec.max() > 0.3  # green — proves raw zeroing would be wrong
    # the model decodes before zeroing (multimodal_model.py), so its
    # missing-video output must equal the rgb8 missing-video output
    import jax

    from simple_multimodal_tpu.models import MultimodalEmotionModel

    cfg = tiny_config
    model = MultimodalEmotionModel(cfg)
    rng = np.random.default_rng(1)
    text = {"input_ids": rng.integers(1, 100, (1, cfg.text_max_length)).astype(np.int32),
            "attention_mask": np.ones((1, cfg.text_max_length), np.int32)}
    audio = rng.standard_normal((1, cfg.audio_max_length)).astype(np.float32)
    vid_packed = rng.integers(0, 255, (1, cfg.video_max_frames, 48, 32)).astype(np.uint8)
    vid_rgb = rng.integers(0, 255, (1, cfg.video_max_frames, 32, 32, 3)).astype(np.uint8)
    params = model.init(jax.random.PRNGKey(0), text, audio, vid_packed)
    out_p = model.apply(params, text, audio, vid_packed,
                        missing_modalities=["video"])
    out_r = model.apply(params, text, audio, vid_rgb,
                        missing_modalities=["video"])
    np.testing.assert_allclose(np.asarray(out_p["emotion_logits"]),
                               np.asarray(out_r["emotion_logits"]),
                               atol=1e-5)


def test_dataset_missing_video_decodes_black(sample_dataset_dir, tiny_config):
    """A missing video FILE under yuv420 must fill packed-BLACK planes
    (chroma 128), not raw zeros (which decode to green frames)."""
    import dataclasses

    from simple_multimodal_tpu.data.video_wire import decode_video_wire

    cfg = dataclasses.replace(tiny_config)  # default yuv420
    ds = get_dataset("sample", str(sample_dataset_dir), "val", cfg)
    item = ds._video("does/not/exist.mp4")
    assert item.dtype == np.uint8 and item.ndim == 3  # packed planes
    dec = np.asarray(decode_video_wire(item[None]))
    assert float(np.abs(dec).max()) < 1e-2  # black, not green


def test_wire_format_prediction_agreement(sample_dataset_dir, tiny_config):
    """yuv420 vs rgb8 wire through the SAME model params: logits close,
    predictions identical on the synthetic set."""
    import dataclasses

    import jax

    from simple_multimodal_tpu.models import MultimodalEmotionModel

    cfg_y = tiny_config  # default yuv420
    cfg_r = dataclasses.replace(tiny_config, video_wire_format="rgb8")
    dsy = get_dataset("sample", str(sample_dataset_dir), "val", cfg_y)
    dsr = get_dataset("sample", str(sample_dataset_dir), "val", cfg_r)
    by = collate([dsy[i] for i in range(min(4, len(dsy)))])
    br = collate([dsr[i] for i in range(min(4, len(dsr)))])

    model = MultimodalEmotionModel(cfg_y)
    params = model.init(jax.random.PRNGKey(0), by["text"], by["audio"],
                        by["video"])
    fwd = jax.jit(lambda p, t, a, v: model.apply(p, t, a, v)["emotion_logits"])
    ly = np.asarray(fwd(params, by["text"], by["audio"], by["video"]))
    lr = np.asarray(fwd(params, br["text"], br["audio"], br["video"]))
    assert np.argmax(ly, -1).tolist() == np.argmax(lr, -1).tolist()
    assert np.abs(ly - lr).max() < 0.15  # random-init logits, tiny model
