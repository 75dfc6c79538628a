"""Torch-free safetensors reader/writer + HF backbone import.

The reference's accuracy story rests on ``from_pretrained`` backbones
(/root/reference/models/encoders.py:20,116,179), which torch-loads HF
checkpoints. HF's current default checkpoint format is safetensors — a
trivial container: 8-byte little-endian u64 header length, a JSON header
mapping tensor name → {dtype, shape, data_offsets}, then a flat byte
buffer. This module parses it directly (same spirit as data/spm.py's
ModelProto reader), so a user holding real ``model.safetensors`` files can
import pretrained weights with no torch anywhere on the path:

    from simple_multimodal_tpu.models.safetensors_io import load_backbone_params
    deberta = load_backbone_params("/path/to/deberta-v3-base", "deberta")

or splice all three backbones into a full model tree with
``load_pretrained_backbones`` (CLI: tools/import_hf_backbones.py).

Supports single files, directories holding ``model.safetensors``, and
sharded checkpoints via ``model.safetensors.index.json``. bfloat16 tensors
decode through ml_dtypes (jax's own dtype package). The name mapping rides
the existing converters in models/convert.py.
"""
import json
import os
import struct
from typing import Dict, Optional

import numpy as np


def _dtype_map() -> Dict[str, np.dtype]:
    m = {
        "F64": np.dtype("<f8"), "F32": np.dtype("<f4"),
        "F16": np.dtype("<f2"),
        "I64": np.dtype("<i8"), "I32": np.dtype("<i4"),
        "I16": np.dtype("<i2"), "I8": np.dtype("i1"),
        "U64": np.dtype("<u8"), "U32": np.dtype("<u4"),
        "U16": np.dtype("<u2"), "U8": np.dtype("u1"),
        "BOOL": np.dtype("bool"),
    }
    try:
        import ml_dtypes

        m["BF16"] = np.dtype(ml_dtypes.bfloat16)
        m["F8_E4M3"] = np.dtype(ml_dtypes.float8_e4m3fn)
        m["F8_E5M2"] = np.dtype(ml_dtypes.float8_e5m2)
    except ImportError:  # pragma: no cover - ml_dtypes ships with jax
        pass
    return m


_DTYPES = _dtype_map()
_INV_DTYPES = {v: k for k, v in _DTYPES.items()}


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Read one .safetensors file → {name: np.ndarray} (zero-copy mmap)."""
    with open(path, "rb") as f:
        (header_len,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(header_len).decode("utf-8"))
    data = np.memmap(path, dtype=np.uint8, mode="r", offset=8 + header_len)
    out: Dict[str, np.ndarray] = {}
    for name, info in header.items():
        if name == "__metadata__":
            continue
        dtype = _DTYPES.get(info["dtype"])
        if dtype is None:
            raise ValueError(
                f"{path}: unsupported safetensors dtype {info['dtype']!r}"
                f" for tensor {name!r}")
        start, end = info["data_offsets"]
        arr = np.frombuffer(data[start:end], dtype=dtype)
        out[name] = arr.reshape(info["shape"])
    return out


def save_safetensors(tensors: Dict[str, np.ndarray], path: str,
                     metadata: Optional[Dict[str, str]] = None) -> None:
    """Write a .safetensors file (test fixtures / torch-free export)."""
    header: Dict[str, object] = {}
    if metadata:
        header["__metadata__"] = dict(metadata)
    bufs = []
    offset = 0
    for name, arr in tensors.items():
        a = np.ascontiguousarray(arr)
        key = _INV_DTYPES.get(a.dtype)
        if key is None:
            raise ValueError(f"unsupported dtype {a.dtype} for {name!r}")
        raw = a.tobytes()
        header[name] = {"dtype": key, "shape": list(a.shape),
                        "data_offsets": [offset, offset + len(raw)]}
        bufs.append(raw)
        offset += len(raw)
    hjson = json.dumps(header, separators=(",", ":")).encode("utf-8")
    pad = (-(8 + len(hjson))) % 8  # 8-byte-align the data section
    hjson += b" " * pad
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for raw in bufs:
            f.write(raw)


# Keys of the HF *task-model* wrappers strip down to the bare backbone the
# converters expect ("embeddings.…", "encoder.…").
_ARCH_PREFIXES = ("deberta.", "wav2vec2.", "vit.", "model.", "bert.",
                  "roberta.")


def _strip_shared_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    for prefix in _ARCH_PREFIXES:
        if sd and all(k.startswith(prefix) for k in sd):
            return {k[len(prefix):]: v for k, v in sd.items()}
    return sd


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a safetensors checkpoint: a file, a directory holding
    ``model.safetensors``, or a sharded ``model.safetensors.index.json``.
    A backbone-arch prefix shared by every key (``deberta.`` etc.) is
    stripped so task-model checkpoints convert like bare backbones."""
    if os.path.isdir(path):
        index = os.path.join(path, "model.safetensors.index.json")
        single = os.path.join(path, "model.safetensors")
        if os.path.isfile(index):
            with open(index) as f:
                weight_map = json.load(f)["weight_map"]
            sd: Dict[str, np.ndarray] = {}
            for shard in sorted(set(weight_map.values())):
                sd.update(load_safetensors(os.path.join(path, shard)))
        elif os.path.isfile(single):
            sd = load_safetensors(single)
        else:
            cands = [f for f in sorted(os.listdir(path))
                     if f.endswith(".safetensors")]
            if not cands:
                raise FileNotFoundError(
                    f"{path}: no model.safetensors[.index.json] found")
            sd = {}
            for c in cands:
                sd.update(load_safetensors(os.path.join(path, c)))
    else:
        sd = load_safetensors(path)
    return _strip_shared_prefix(sd)


def load_backbone_params(path: str, arch: str,
                         num_layers: Optional[int] = None,
                         num_conv: int = 7) -> Dict:
    """Safetensors checkpoint → this framework's backbone param subtree.

    ``arch``: 'deberta' | 'wav2vec2' | 'vit'. ``num_layers`` defaults to
    the count present in the checkpoint. Matches the reference's
    ``AutoModel.from_pretrained`` ingestion (encoders.py:20,116,179) with
    the name mapping of models/convert.py; parity is covered by
    tests/test_encoder_parity.py (same converters, torch-built trees).
    """
    from .convert import convert_deberta, convert_vit, convert_wav2vec2

    sd = load_state_dict(path)
    if num_layers is None:
        pat = ("encoder.layers." if arch == "wav2vec2" else "encoder.layer.")
        idx = {int(k[len(pat):].split(".")[0])
               for k in sd if k.startswith(pat)}
        if not idx:
            raise ValueError(f"{path}: no '{pat}N.' keys — wrong arch "
                             f"{arch!r} for this checkpoint?")
        num_layers = max(idx) + 1
    if arch == "deberta":
        return convert_deberta(sd, num_layers)
    if arch == "wav2vec2":
        return convert_wav2vec2(sd, num_conv, num_layers)
    if arch == "vit":
        return convert_vit(sd, num_layers)
    raise ValueError(f"unknown arch {arch!r} "
                     "(expected deberta/wav2vec2/vit)")


def load_pretrained_backbones(params: Dict,
                              text: Optional[str] = None,
                              audio: Optional[str] = None,
                              video: Optional[str] = None) -> Dict:
    """Splice safetensors-loaded backbones into a full model param tree.

    ``params`` is the tree ``model.init`` returned (with or without the
    top-level 'params' key); each of ``text``/``audio``/``video`` is a
    safetensors file/dir. Returns a NEW tree; untouched leaves are shared.
    Placement mirrors train/optim.py BACKBONE_MARKERS.
    """
    import copy

    root = params.get("params", params)
    new_root = copy.copy(root)
    if text is not None:
        sub = dict(new_root["text_encoder"])
        sub["model"] = load_backbone_params(text, "deberta")
        new_root["text_encoder"] = sub
    if audio is not None:
        sub = dict(new_root["audio_encoder"])
        sub["model"] = load_backbone_params(audio, "wav2vec2")
        new_root["audio_encoder"] = sub
    if video is not None:
        sub = dict(new_root["video_encoder"])
        sub["vit"] = load_backbone_params(video, "vit")
        new_root["video_encoder"] = sub
    return {"params": new_root} if "params" in params else new_root
