"""Host-side text tokenization.

The reference tokenizes with ``AutoTokenizer.from_pretrained(config.text_model_name)``
(/root/reference/data/dataset_loaders.py:34,82-93), which requires downloading
the DeBERTa-v3 sentencepiece model. This framework runs in fully-offline
environments, so it ships a self-contained, deterministic tokenizer with the
same interface and id conventions as DeBERTa-v2/v3's tokenizer:

    PAD=0  CLS=1  SEP=2  UNK=3,  vocab_size defaults to 128100.

When a HuggingFace tokenizer for ``model_name`` is available locally (cached
or on-disk), it is used instead, so token ids match the reference exactly.

Tokenization is pure host-side CPU work; the device only ever sees fixed-shape
``[B, max_length]`` int32 buffers (keeps every jit trace shape-stable).
"""
import hashlib
import re
from typing import Dict, List, Optional, Sequence, Union

import numpy as np

PAD_ID = 0
CLS_ID = 1
SEP_ID = 2
UNK_ID = 3
_NUM_SPECIAL = 100  # reserve low ids like sentencepiece does

_WORD_RE = re.compile(r"[a-z0-9]+|[^a-z0-9\s]")


class HashTokenizer:
    """Deterministic hashing tokenizer with a DeBERTa-style interface.

    Words are lowercased, split on non-alphanumeric boundaries, and mapped to
    stable ids via blake2 hashing into ``[NUM_SPECIAL, vocab_size)``. The map
    is stable across processes and platforms, so datasets tokenized on
    different hosts of a pod agree bit-for-bit.
    """

    def __init__(self, vocab_size: int = 128100, model_max_length: int = 512):
        self.vocab_size = vocab_size
        self.model_max_length = model_max_length
        self.pad_token_id = PAD_ID
        self.cls_token_id = CLS_ID
        self.sep_token_id = SEP_ID
        self.unk_token_id = UNK_ID
        self._cache: Dict[str, int] = {}

    def _word_id(self, word: str) -> int:
        wid = self._cache.get(word)
        if wid is None:
            h = hashlib.blake2b(word.encode("utf-8"), digest_size=8).digest()
            span = self.vocab_size - _NUM_SPECIAL
            wid = _NUM_SPECIAL + int.from_bytes(h, "little") % span
            self._cache[word] = wid
        return wid

    def encode(self, text: str) -> List[int]:
        words = _WORD_RE.findall(str(text).lower())
        return [self._word_id(w) for w in words]

    def __call__(
        self,
        text: Union[str, Sequence[str]],
        truncation: bool = True,
        padding: str = "max_length",
        max_length: Optional[int] = None,
        return_tensors: str = "np",
    ) -> Dict[str, np.ndarray]:
        if isinstance(text, str):
            texts = [text]
        else:
            texts = list(text)
        max_length = max_length or self.model_max_length

        input_ids = np.full((len(texts), max_length), PAD_ID, dtype=np.int32)
        attention_mask = np.zeros((len(texts), max_length), dtype=np.int32)
        for i, t in enumerate(texts):
            ids = self.encode(t)
            if truncation:
                ids = ids[: max_length - 2]
            seq = [CLS_ID] + ids + [SEP_ID]
            input_ids[i, : len(seq)] = seq
            attention_mask[i, : len(seq)] = 1
        return {"input_ids": input_ids, "attention_mask": attention_mask}


class SpmTokenizer:
    """DeBERTa-v2/v3-convention tokenizer over a local sentencepiece model.

    Wraps data.spm.SentencePieceUnigram with the id conventions HF's
    DebertaV2Tokenizer applies on top of raw sentencepiece ids:
    [PAD]=0 [CLS]=1 [SEP]=2 [UNK]=3, piece ids used directly. With the real
    DeBERTa ``spm.model`` file this produces the exact ids the reference
    feeds its text encoder (dataset_loaders.py:82-93) — no network needed.
    """

    def __init__(self, spm_path: str, model_max_length: int = 512):
        from .spm import SentencePieceUnigram

        self.sp = SentencePieceUnigram.from_file(spm_path)
        self.vocab_size = max(self.sp.vocab_size, 4)
        self.model_max_length = model_max_length
        self.pad_token_id = PAD_ID
        self.cls_token_id = CLS_ID
        self.sep_token_id = SEP_ID
        self.unk_token_id = UNK_ID

    def encode(self, text: str) -> List[int]:
        return self.sp.encode(text)

    __call__ = HashTokenizer.__call__  # same batching/padding/CLS-SEP framing


def _find_spm_model(spm_path: Optional[str]) -> Optional[str]:
    import os

    candidates = [spm_path, os.environ.get("SMM_SPM_MODEL")]
    for c in candidates:
        if c and os.path.isfile(c):
            return c
    return None


def get_tokenizer(model_name: str, max_length: int = 512,
                  spm_path: Optional[str] = None):
    """Return the best locally-available tokenizer.

    Resolution order (never touches the network):
    1. HF tokenizer for ``model_name`` if locally cached — exact reference ids.
    2. A sentencepiece unigram model file (``spm_path`` argument or the
       ``SMM_SPM_MODEL`` env var) read by the self-contained spm reader —
       exact reference ids when given the real DeBERTa spm.model.
    3. HashTokenizer — deterministic offline fallback.
    """
    try:  # pragma: no cover - exercised only when a local HF cache exists
        import os

        os.environ.setdefault("HF_HUB_OFFLINE", "1")
        os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(model_name, local_files_only=True)

        class _HFWrapper:
            vocab_size = tok.vocab_size
            pad_token_id = tok.pad_token_id or 0

            def __call__(self, text, truncation=True, padding="max_length",
                         max_length=max_length, return_tensors="np"):
                enc = tok(
                    list(text) if not isinstance(text, str) else text,
                    truncation=truncation,
                    padding=padding,
                    max_length=max_length,
                    return_tensors="np",
                )
                return {
                    "input_ids": enc["input_ids"].astype(np.int32),
                    "attention_mask": enc["attention_mask"].astype(np.int32),
                }

        return _HFWrapper()
    except Exception:
        pass
    found = _find_spm_model(spm_path)
    if found:
        try:
            return SpmTokenizer(found, model_max_length=max_length)
        except Exception as e:
            print(f"Warning: could not read spm model {found}: {e}")
    return HashTokenizer(model_max_length=max_length)
