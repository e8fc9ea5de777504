"""Trainable WordPiece tokenizer: shapes, determinism, save/load, OOV."""

import numpy as np
import pytest

from mmd_tpu.data.tokenizer import WordPieceTokenizer, basic_tokenize

CORPUS = [
    "The quick brown fox jumps over the lazy dog",
    "Misinformation spreads quickly on social media platforms",
    "Claims require evidence from reliable sources",
    "the the the quick quick evidence evidence claims",
] * 5


@pytest.fixture(scope="module")
def tok():
    return WordPieceTokenizer.train(CORPUS, vocab_size=500)


def test_basic_tokenize():
    assert basic_tokenize("Hello, World!") == ["hello", ",", "world", "!"]


def test_encode_structure(tok):
    ids, types = tok.encode("the quick fox", max_length=16)
    assert ids[0] == tok.cls_id and ids[-1] == tok.sep_id
    assert len(ids) <= 16 and all(t == 0 for t in types)


def test_encode_batch_fixed_shapes(tok):
    ids, mask, types = tok.encode_batch(
        ["the quick fox", "evidence"], max_length=32)
    assert ids.shape == mask.shape == types.shape == (2, 32)
    assert ids.dtype == np.int32
    assert mask[0].sum() >= mask[1].sum() > 0
    assert (ids[0][mask[0] == 0] == tok.pad_id).all()


def test_pair_encoding_types(tok):
    ids, mask, types = tok.encode_batch(
        ["the claim"], pairs=["the evidence"], max_length=32)
    n = mask[0].sum()
    assert types[0, :n].max() == 1  # second segment marked
    assert ids[0, n - 1] == tok.sep_id


def test_oov_falls_back_to_subwords_or_unk(tok):
    ids, _ = tok.encode("zzzzqqqq floccinaucinihilipilification", max_length=32)
    assert all(0 <= i < tok.vocab_size for i in ids)


def test_roundtrip_save_load(tok, tmp_path):
    tok.save(tmp_path / "vocab.json")
    tok2 = WordPieceTokenizer.load(tmp_path / "vocab.json")
    a = tok.encode_batch(["the quick brown fox"], max_length=16)
    b = tok2.encode_batch(["the quick brown fox"], max_length=16)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_determinism(tok):
    a = tok.encode_batch(["evidence claims"], max_length=16)
    b = tok.encode_batch(["evidence claims"], max_length=16)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_truncation(tok):
    long = " ".join(["evidence"] * 100)
    ids, mask, _ = tok.encode_batch([long], max_length=16)
    assert ids.shape == (1, 16) and mask.sum() == 16
