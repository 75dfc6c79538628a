"""Host-side video decode.

The reference decodes the first ``video_max_frames`` frames with OpenCV,
converts BGR→RGB, resizes to 224², normalizes to [0,1] and zero-pads short
clips (/root/reference/data/dataset_loaders.py:137-193). We keep decode on the
host (it is inherently ragged/serial) but ship frames as a single fixed-shape
``[T, H, W, 3]`` uint8 buffer; normalization to float happens on-device so the
host→device transfer is 4x smaller than the reference's float tensors.

Layout note: this framework uses channels-last ``[T, H, W, 3]`` (the layout
XLA:TPU prefers for convolutions); the reference uses torch's ``[T, 3, H, W]``.
"""
from typing import Tuple

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False


def load_video_frames(
    path: str,
    max_frames: int = 30,
    frame_size: Tuple[int, int] = (224, 224),
    stride: int = 1,
) -> np.ndarray:
    """Decode up to ``max_frames`` RGB frames → uint8 [max_frames, H, W, 3].

    Missing/corrupt files yield zeros (reference behavior,
    dataset_loaders.py:143-149). ``stride`` > 1 subsamples frames the way the
    reference demo does (gradio_demo.py:213-214).
    """
    h, w = frame_size[1], frame_size[0]
    out = np.zeros((max_frames, h, w, 3), dtype=np.uint8)
    if not _HAS_CV2:
        return out
    try:
        cap = cv2.VideoCapture(str(path))
        n = 0
        frame_idx = 0
        while n < max_frames:
            ret, frame = cap.read()
            if not ret:
                break
            if frame_idx % stride == 0:
                frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
                frame = cv2.resize(frame, frame_size)
                out[n] = frame
                n += 1
            frame_idx += 1
        cap.release()
    except Exception:
        return np.zeros((max_frames, h, w, 3), dtype=np.uint8)
    return out


def write_video(path: str, frames: np.ndarray, fps: int = 15) -> None:
    """Write uint8 RGB frames [T, H, W, 3] to an mp4 file (for sample data)."""
    if not _HAS_CV2:
        raise RuntimeError("OpenCV not available; cannot encode video")
    h, w = frames.shape[1], frames.shape[2]
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    out = cv2.VideoWriter(str(path), fourcc, fps, (w, h))
    for f in frames:
        out.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    out.release()
