"""Demo HTTP server test: train a tiny checkpoint, serve it, hit the API."""
import dataclasses
import json
import threading
import urllib.request

import jax
import numpy as np
import pytest


@pytest.fixture(scope="module")
def served_demo(tiny_config, tmp_path_factory):
    from simple_multimodal_tpu.data import create_sample_dataset
    from simple_multimodal_tpu.models import MultimodalEmotionModel
    from simple_multimodal_tpu.serving import MultimodalEmotionDemo
    from simple_multimodal_tpu.train.checkpoint import save_checkpoint
    from simple_multimodal_tpu.train.state import TrainState

    base = tmp_path_factory.mktemp("demo")
    data_dir = str(base / "data")
    create_sample_dataset(data_dir, num_samples_per_emotion=1, duration=0.3)

    c = dataclasses.replace(tiny_config)
    c.fusion_type = "late"  # exercises per-modality breakdown
    model = MultimodalEmotionModel(c)
    rng = np.random.default_rng(0)
    dummy = {
        "text": {"input_ids": rng.integers(0, 1000, (1, c.text_max_length)).astype(np.int32),
                 "attention_mask": np.ones((1, c.text_max_length), np.int32)},
        "audio": rng.standard_normal((1, c.audio_max_length)).astype(np.float32),
        "video": rng.integers(0, 255, (1, c.video_max_frames,
                                       *c.video_frame_size, 3)).astype(np.uint8),
    }
    params = jax.jit(model.init)(jax.random.PRNGKey(0), dummy["text"],
                                 dummy["audio"], dummy["video"])
    ckpt = str(base / "ckpt")
    state = TrainState(step=0, params=jax.device_get(params), opt_state=None,
                       rng=jax.random.PRNGKey(0))
    save_checkpoint(ckpt, state, metrics={}, epoch=0, config=c)

    demo = MultimodalEmotionDemo(ckpt, config=c)

    import sys
    sys.path.insert(0, "demo")
    from serve import make_handler  # noqa: E402
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(demo, media_dir=str(data_dir)))
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield port, data_dir
    server.shutdown()


def test_demo_page(served_demo):
    port, _ = served_demo
    html = urllib.request.urlopen(
        f"http://127.0.0.1:{port}/", timeout=120).read().decode()
    assert "Multimodal Emotion Recognition" in html
    assert "analyze" in html


def test_demo_api_json(served_demo):
    port, data_dir = served_demo
    body = json.dumps({
        "text": "my boss at work made this the best day ever",
        "audio_path": f"{data_dir}/audio/happy_000.wav",
        "video_path": f"{data_dir}/video/happy_000.mp4",
    }).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/analyze", data=body,
        headers={"Content-Type": "application/json"})
    resp = json.loads(urllib.request.urlopen(req, timeout=300).read())
    ea = resp["emotion_analysis"]
    assert ea["predicted_emotion"] in [
        "happy", "sad", "angry", "fear", "surprise", "disgust", "neutral"]
    assert 0 < ea["confidence"] <= 1
    assert len(ea["emotion_distribution"]) == 7
    # late fusion → per-modality breakdown present
    assert set(ea["individual_modalities"]) == {"text", "audio", "video"}
    assert "Work situations" in resp["ai_response"]
    assert resp["emotion_chart"]["type"] == "bar"
    assert resp["va_chart"]["prediction"]["emotion"] == ea["predicted_emotion"]
    assert len(resp["history"]) >= 1


def test_demo_api_empty_input(served_demo):
    port, _ = served_demo
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/analyze",
        data=json.dumps({"text": ""}).encode(),
        headers={"Content-Type": "application/json"})
    resp = json.loads(urllib.request.urlopen(req, timeout=300).read())
    assert resp["emotion_analysis"]  # degrades to zero modalities, still answers


def test_demo_api_rejects_path_traversal(served_demo):
    port, _ = served_demo
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/analyze",
        data=json.dumps({"text": "hi",
                         "audio_path": "../../../etc/passwd"}).encode(),
        headers={"Content-Type": "application/json"})
    try:
        resp = urllib.request.urlopen(req, timeout=300)
        payload = json.loads(resp.read())
        assert "error" in payload
    except urllib.error.HTTPError as e:
        assert e.code == 500
        assert "error" in json.loads(e.read())


def test_demo_api_webcam_upload(served_demo):
    """A recorded webcam clip uploaded as the 'webcam_video' multipart field
    (the browser's MediaRecorder path) round-trips through the API and is
    used as the video source (reference webcam input,
    gradio_demo.py:613-616)."""
    port, data_dir = served_demo
    # synthetic "webcam" blob: any container cv2 can open works; the sample
    # mp4 stands in for the browser's webm (same decode path)
    clip = open(f"{data_dir}/video/happy_000.mp4", "rb").read()
    boundary = "webcamboundary42"
    parts = [
        f"--{boundary}\r\nContent-Disposition: form-data; "
        f'name="text"\r\n\r\nlook at my webcam feed\r\n'.encode(),
        f"--{boundary}\r\nContent-Disposition: form-data; "
        f'name="webcam_video"; filename="webcam.webm"\r\n'
        f"Content-Type: video/webm\r\n\r\n".encode() + clip + b"\r\n",
        f"--{boundary}--\r\n".encode(),
    ]
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/analyze", data=b"".join(parts),
        headers={"Content-Type":
                 f"multipart/form-data; boundary={boundary}"})
    resp = json.loads(urllib.request.urlopen(req, timeout=300).read())
    ea = resp["emotion_analysis"]
    assert ea["predicted_emotion"] in [
        "happy", "sad", "angry", "fear", "surprise", "disgust", "neutral"]
    assert 0 < ea["confidence"] <= 1

    # JSON-path variant of the same field (webcam_path, media_dir-confined)
    body = json.dumps({"text": "webcam again",
                       "webcam_path": "video/happy_000.mp4"}).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/analyze", data=body,
        headers={"Content-Type": "application/json"})
    resp = json.loads(urllib.request.urlopen(req, timeout=300).read())
    assert resp["emotion_analysis"]["predicted_emotion"]


def test_demo_page_has_webcam_capture(served_demo):
    port, _ = served_demo
    html = urllib.request.urlopen(
        f"http://127.0.0.1:{port}/", timeout=120).read().decode()
    assert "getUserMedia" in html
    assert "MediaRecorder" in html
    assert "webcam_video" in html


def test_demo_api_multipart_upload(served_demo, tmp_path):
    port, data_dir = served_demo
    wav = open(f"{data_dir}/audio/happy_000.wav", "rb").read()
    boundary = "testboundary123"
    parts = []
    parts.append(f"--{boundary}\r\nContent-Disposition: form-data; "
                 f'name="text"\r\n\r\nwhat a wonderful day\r\n'.encode())
    parts.append(f"--{boundary}\r\nContent-Disposition: form-data; "
                 f'name="audio"; filename="a.wav"\r\n'
                 f"Content-Type: audio/wav\r\n\r\n".encode() + wav + b"\r\n")
    parts.append(f"--{boundary}--\r\n".encode())
    body = b"".join(parts)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/analyze", data=body,
        headers={"Content-Type":
                 f"multipart/form-data; boundary={boundary}"})
    resp = json.loads(urllib.request.urlopen(req, timeout=300).read())
    assert resp["emotion_analysis"]["predicted_emotion"]
