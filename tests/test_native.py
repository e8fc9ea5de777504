"""Native C++ components: build, tokenizer parity vs Python, gather parity."""

import numpy as np
import pytest

from mmd_tpu.native import bindings


@pytest.fixture(scope="module", autouse=True)
def built():
    if not bindings.build():
        pytest.skip("native toolchain unavailable")


@pytest.fixture(scope="module")
def tok():
    from mmd_tpu.data.tokenizer import WordPieceTokenizer
    corpus = [
        "The quick brown fox jumps over the lazy dog!",
        "Misinformation spreads quickly on social media platforms.",
        "Claims require strong evidence, from reliable sources (always).",
    ] * 4
    return WordPieceTokenizer.train(corpus, vocab_size=600)


TEXTS = [
    "The quick brown fox",
    "claims require evidence!!!",
    "an unseen-word xylophone78 and punct... marks",
    "",
    "a",
    "word " * 200,  # truncation
]


def test_native_tokenizer_matches_python(tok):
    native = bindings.NativeTokenizer(tok.vocab)
    for L in (16, 64, 512):
        n_ids, n_mask, n_types = native.encode_batch(TEXTS, L)
        tok._native = False  # force the Python path
        p_ids, p_mask, p_types = tok.encode_batch(TEXTS, max_length=L)
        tok._native = None
        np.testing.assert_array_equal(n_ids, p_ids)
        np.testing.assert_array_equal(n_mask, p_mask)
        np.testing.assert_array_equal(n_types, p_types)


def test_dispatch_uses_native_for_ascii(tok):
    tok._native = None
    out = tok.encode_batch(["the quick fox"], max_length=16)
    assert tok._get_native() is not None
    tok._native = False
    ref = tok.encode_batch(["the quick fox"], max_length=16)
    tok._native = None
    for a, b in zip(out, ref):
        np.testing.assert_array_equal(a, b)


def test_non_ascii_falls_back_to_python(tok):
    # must not crash, and must match the Python path exactly
    texts = ["café naïve 北京 emoji 🙂", "plain ascii"]
    out = tok.encode_batch(texts, max_length=32)
    tok._native = False
    ref = tok.encode_batch(texts, max_length=32)
    tok._native = None
    for a, b in zip(out, ref):
        np.testing.assert_array_equal(a, b)


def test_gather_rows_parity(rng):
    src = np.ascontiguousarray(rng.standard_normal((1000, 37)).astype(np.float16))
    idx = rng.integers(0, 1000, 256)
    out = bindings.gather_rows(src, idx)
    assert out is not None
    np.testing.assert_array_equal(out, src[idx])


def test_gather_rows_3d(rng):
    src = np.ascontiguousarray(rng.integers(0, 255, (50, 4, 6), dtype=np.uint8))
    idx = np.array([0, 49, 7, 7, 13])
    out = bindings.gather_rows(src, idx)
    np.testing.assert_array_equal(out, src[idx])


def test_store_batches_use_native_gather(tmp_path, rng):
    from mmd_tpu.data.store import write_store
    arrays = {"x": rng.standard_normal((64, 8)).astype(np.float32)}
    store = write_store(tmp_path / "s", arrays)
    batches = list(store.batches(16, shuffle=True, seed=3))
    seen = np.concatenate([b["x"] for b in batches])
    np.testing.assert_allclose(np.sort(seen, axis=0),
                               np.sort(arrays["x"], axis=0))
