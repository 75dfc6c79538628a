"""Native C++ decode library vs the numpy reference path."""
import numpy as np
import pytest

from simple_multimodal_tpu.data import native
from simple_multimodal_tpu.data.audio_io import load_audio_fixed, write_wav


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    rng = np.random.default_rng(0)
    rates = [16000, 44100, 22050]
    paths = []
    for i, rate in enumerate(rates):
        t = np.arange(int(rate * 0.5)) / rate
        wav = (0.5 * np.sin(2 * np.pi * 440 * t)
               + 0.1 * rng.standard_normal(t.shape)).astype(np.float32)
        p = d / f"tone_{rate}.wav"
        write_wav(p, wav, rate)
        paths.append(str(p))
    # stereo file
    stereo = np.stack([np.sin(2 * np.pi * 440 * t),
                       np.sin(2 * np.pi * 220 * t)]).astype(np.float32) * 0.5
    p = d / "stereo.wav"
    write_wav(p, stereo, 16000)
    paths.append(str(p))
    return paths


def test_native_builds():
    assert native.available(), "g++ build of native/smmdata.cpp failed"


def test_native_matches_numpy(wav_dir):
    if not native.available():
        pytest.skip("no native lib")
    for path in wav_dir:
        ours = native.decode_audio(path, 16000, 12000)
        ref = load_audio_fixed(path, 16000, 12000, use_native=False)
        assert ours.shape == ref.shape
        # same pad/truncate envelope
        np.testing.assert_array_equal(ours == 0, ref == 0)
        # resampled content agrees closely (different windowed-sinc impls)
        nz = ref != 0
        if nz.any():
            err = np.abs(ours[nz] - ref[nz]).mean()
            assert err < 5e-3, err


def test_native_batch(wav_dir):
    if not native.available():
        pytest.skip("no native lib")
    out = native.decode_audio_batch(wav_dir, 16000, 8000, num_threads=2)
    assert out.shape == (len(wav_dir), 8000)
    for i, path in enumerate(wav_dir):
        single = native.decode_audio(path, 16000, 8000)
        np.testing.assert_array_equal(out[i], single)


def test_native_missing_file():
    if not native.available():
        pytest.skip("no native lib")
    out = native.decode_audio("/nonexistent/file.wav", 16000, 100)
    assert np.all(out == 0)
