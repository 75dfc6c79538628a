"""SentencePiece unigram reader/encoder tests (data/spm.py).

The reference tokenizes with DeBERTa-v3's real sentencepiece model via
``AutoTokenizer`` (/root/reference/data/dataset_loaders.py:34,82-93); this
repo's offline equivalent is the self-contained ModelProto reader + Viterbi
segmenter. No spm.model ships here, so fixtures are hand-constructed with
``serialize_model_proto`` (the same wire format the reader parses) and the
expected segmentations are hand-derived from the unigram-LM objective:
maximize the sum of piece log-probs; uncovered chars cost
``min_score − 10`` each and consecutive unknowns merge into one token.
"""
import numpy as np
import pytest

from simple_multimodal_tpu.data.spm import (
    CONTROL,
    NORMAL,
    UNKNOWN,
    SentencePieceUnigram,
    parse_model_proto,
    serialize_model_proto,
)
from simple_multimodal_tpu.data.tokenizer import (
    CLS_ID,
    PAD_ID,
    SEP_ID,
    HashTokenizer,
    SpmTokenizer,
    get_tokenizer,
)

# DeBERTa-v2/v3 layout: [PAD]=0 [CLS]=1 [SEP]=2 [UNK]=3, then pieces.
PIECES = [
    ("[PAD]", 0.0, CONTROL),      # 0
    ("[CLS]", 0.0, CONTROL),      # 1
    ("[SEP]", 0.0, CONTROL),      # 2
    ("[UNK]", 0.0, UNKNOWN),      # 3
    ("▁", -3.0, NORMAL),     # 4  "▁"
    ("▁hello", -1.0, NORMAL),  # 5
    ("▁world", -1.5, NORMAL),  # 6
    ("▁hell", -1.25, NORMAL),  # 7
    ("o", -2.75, NORMAL),         # 8
    ("▁ab", -5.0, NORMAL),   # 9
    ("▁a", -1.0, NORMAL),    # 10
    ("b", -1.0, NORMAL),          # 11
    ("▁fi", -2.0, NORMAL),   # 12
]
MIN_SCORE = -5.0          # over NORMAL pieces
UNK_SCORE = MIN_SCORE - 10.0


@pytest.fixture(scope="module")
def model_bytes():
    return serialize_model_proto(PIECES)


@pytest.fixture(scope="module")
def sp(model_bytes):
    return SentencePieceUnigram(model_bytes)


def test_wire_roundtrip(model_bytes):
    assert parse_model_proto(model_bytes) == PIECES


def test_vocab_and_special_ids(sp):
    assert sp.vocab_size == len(PIECES)
    assert sp.unk_id == 3
    assert sp.piece_to_id["▁hello"] == 5
    # control pieces are NOT matchable as text
    assert "[PAD]" not in sp._matchable
    assert sp.unk_score == UNK_SCORE


def test_normalization_nfkc_and_dummy_prefix(sp):
    # dummy prefix + space escaping
    assert sp.normalize("hello world") == "▁hello▁world"
    # whitespace collapse + strip
    assert sp.normalize("  hello \t world \n") == "▁hello▁world"
    # NFKC: U+FB01 LATIN SMALL LIGATURE FI -> "fi"; fullwidth A -> A
    assert sp.normalize("ﬁ") == "▁fi"
    assert sp.normalize("Ａ") == "▁A"
    assert sp.normalize("") == ""
    assert sp.normalize("   ") == ""


def test_viterbi_picks_best_scoring_segmentation(sp):
    # "▁hello▁world": ▁hello(-1.0)+▁world(-1.5) = -2.5 beats
    # ▁hell(-1.25)+o(-2.75)+▁world(-1.5) = -5.5
    assert sp.encode("hello world") == [5, 6]


def test_viterbi_prefers_two_short_pieces_over_one_long(sp):
    # "▁ab": ▁a(-1.0)+b(-1.0) = -2.0 beats ▁ab(-5.0)
    assert sp.encode("ab") == [10, 11]


def test_unknown_chars_merge_into_single_unk(sp):
    # "▁hello▁xyzzy": ▁hello, then "▁" (-3.0 beats the -15 unk fallback),
    # then 5 uncovered chars -> one merged [UNK]
    assert sp.encode("hello xyzzy") == [5, 4, 3]
    # a run broken by a known piece produces two unks; each word-leading
    # "▁" is covered by the ▁ piece (-3.0 beats the -15 unk fallback)
    assert sp.encode("xy a zz") == [4, 3, 10, 4, 3]


def test_unknown_score_keeps_lattice_connected(sp):
    # entirely-unknown input still encodes (no crash, single merged unk
    # after the matchable "▁")
    assert sp.encode("qqq") == [4, 3]


def test_empty_input(sp):
    assert sp.encode("") == []
    assert sp.encode("   \t ") == []


def test_nfkc_feeds_viterbi(sp):
    # the ligature normalizes to "fi" and then matches ▁fi
    assert sp.encode("ﬁ") == [12]


def test_spm_tokenizer_framing(tmp_path, model_bytes):
    """[CLS] ids [SEP] + PAD framing and attention mask, DeBERTa policy."""
    path = tmp_path / "spm.model"
    path.write_bytes(model_bytes)
    tok = SpmTokenizer(str(path), model_max_length=8)
    assert (tok.pad_token_id, tok.cls_token_id,
            tok.sep_token_id, tok.unk_token_id) == (0, 1, 2, 3)
    enc = tok(["hello world", "ab"], max_length=8)
    assert enc["input_ids"].dtype == np.int32
    np.testing.assert_array_equal(
        enc["input_ids"][0], [CLS_ID, 5, 6, SEP_ID, PAD_ID, PAD_ID,
                              PAD_ID, PAD_ID])
    np.testing.assert_array_equal(
        enc["attention_mask"][0], [1, 1, 1, 1, 0, 0, 0, 0])
    np.testing.assert_array_equal(
        enc["input_ids"][1], [CLS_ID, 10, 11, SEP_ID] + [PAD_ID] * 4)


def test_spm_tokenizer_truncation(tmp_path, model_bytes):
    path = tmp_path / "spm.model"
    path.write_bytes(model_bytes)
    tok = SpmTokenizer(str(path), model_max_length=4)
    enc = tok("hello world hello world hello world", max_length=4)
    ids = enc["input_ids"][0]
    assert ids[0] == CLS_ID and ids[3] == SEP_ID  # CLS + 2 pieces + SEP
    assert enc["attention_mask"][0].sum() == 4


def test_get_tokenizer_resolves_spm_via_env(tmp_path, model_bytes,
                                            monkeypatch):
    """Resolution order: no local HF cache for this name -> the
    SMM_SPM_MODEL env var wins over the HashTokenizer fallback."""
    path = tmp_path / "spm.model"
    path.write_bytes(model_bytes)
    monkeypatch.setenv("SMM_SPM_MODEL", str(path))
    tok = get_tokenizer("this-model/does-not-exist-locally", max_length=16)
    assert isinstance(tok, SpmTokenizer)
    assert tok.encode("hello world") == [5, 6]
    monkeypatch.delenv("SMM_SPM_MODEL")
    tok2 = get_tokenizer("this-model/does-not-exist-locally", max_length=16)
    assert isinstance(tok2, HashTokenizer)


def test_get_tokenizer_spm_path_argument(tmp_path, model_bytes):
    path = tmp_path / "m.spm"
    path.write_bytes(model_bytes)
    tok = get_tokenizer("nope/nope", spm_path=str(path))
    assert isinstance(tok, SpmTokenizer)


def test_corrupt_model_falls_back(tmp_path, monkeypatch):
    bad = tmp_path / "bad.model"
    bad.write_bytes(b"\xff\xff\xff\xff not a proto")
    tok = get_tokenizer("nope/nope", spm_path=str(bad))
    assert isinstance(tok, HashTokenizer)
