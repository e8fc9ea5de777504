"""SentencePiece-unigram tokenizer: proto round-trip + segmentation parity
against the Rust `tokenizers` Unigram oracle (the engine behind HF
DebertaV2TokenizerFast), fully offline."""

import numpy as np
import pytest

from mmd_tpu.data.spm import (
    CONTROL, NORMAL, UNKNOWN, PrecompiledCharsmap, UnigramTokenizer,
    build_charsmap, build_spm_model, parse_spm_model, parse_spm_model_full,
)

FIXTURES = [
    "hello world",
    "The quick brown fox jumps over the lazy dog.",
    "Misinformation detection at scale:  multimodal  evidence!",
    "claim vs document, text & image",
    "a",
    "",
    "    leading and trailing    ",
    "unicode éèê café naïve",
    "OOV glyphs ☃❤ mixed in",
    "numbers 12345 and 3.14159",
    "hyphen-ated co-operation e-mail",
]


def make_pieces(seed=0):
    """DeBERTa-convention unigram vocab: specials at 0-3, then single chars
    and English subwords with distinct pseudo-random scores."""
    rng = np.random.default_rng(seed)
    pieces = [("[PAD]", 0.0, CONTROL), ("[CLS]", 0.0, CONTROL),
              ("[SEP]", 0.0, CONTROL), ("[UNK]", 0.0, UNKNOWN)]
    chars = list("abcdefghijklmnopqrstuvwxyz"
                 "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789.,!&:-éè")
    subwords = ["▁the", "▁hello", "▁world", "▁quick",
                "▁brown", "▁fox", "▁over", "▁lazy",
                "▁dog", "ing", "tion", "▁mis", "inform", "ation",
                "▁detec", "▁multi", "modal", "▁evidence",
                "▁claim", "▁document", "▁text", "▁image",
                "▁and", "▁café", "▁na", "ïve",
                "▁num", "bers", "▁12", "345", "▁3", "14159",
                "▁co", "▁e", "mail", "oper", "▁a", "▁",
                "er", "at"]
    for tok in chars + subwords:
        pieces.append((tok, float(-1.0 - 12.0 * rng.random()), NORMAL))
    return pieces


def test_proto_round_trip():
    pieces = make_pieces()
    blob = build_spm_model(pieces)
    got = parse_spm_model(blob)
    assert [p for p, _, _ in got] == [p for p, _, _ in pieces]
    assert [t for _, _, t in got] == [t for _, _, t in pieces]
    # scores survive as float32
    np.testing.assert_allclose([s for _, s, _ in got],
                               np.float32([s for s, in
                                           [(s,) for _, s, _ in pieces]]),
                               rtol=0, atol=0)


def _oracle(pieces):
    """HF-tokenizers Unigram with the same normalization/pre-tokenization
    pipeline the DebertaV2 SpmConverter builds."""
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, normalizers, pre_tokenizers
    from tokenizers.models import Unigram

    vocab = [(p, s) for p, s, _ in pieces]
    tok = Tokenizer(Unigram(vocab, unk_id=3, byte_fallback=False))
    tok.normalizer = normalizers.Sequence([
        normalizers.NFKC(),
        normalizers.Replace(tokenizers.Regex(r"\s+"), " "),
        normalizers.Strip(),
    ])
    # spm's add_dummy_prefix=True (the DeBERTa models) = "always"
    tok.pre_tokenizer = pre_tokenizers.Metaspace(
        replacement="▁", prepend_scheme="always")
    return tok


def test_segmentation_parity_vs_rust_unigram():
    pieces = make_pieces()
    # feed our tokenizer the float32-rounded scores the proto would carry,
    # the same floats the oracle receives
    blob = build_spm_model(pieces)
    ours = UnigramTokenizer.from_spm_model(blob)
    oracle = _oracle(parse_spm_model(blob))
    for text in FIXTURES:
        want = oracle.encode(text).ids
        got = ours.tokenize_ids(text)
        assert got == want, (text, ours.tokenize(text),
                             oracle.encode(text).tokens)


def test_deberta_conventions_and_batch_contract():
    tok = UnigramTokenizer(make_pieces())
    assert (tok.pad_id, tok.cls_id, tok.sep_id, tok.unk_id) == (0, 1, 2, 3)
    ids, mask, types = tok.encode_batch(
        ["hello world", "the dog", ""], max_length=16)
    assert ids.shape == mask.shape == types.shape == (3, 16)
    assert ids.dtype == np.int32
    # [CLS] x [SEP] structure, PAD tail
    row = ids[0][mask[0] == 1]
    assert row[0] == tok.cls_id and row[-1] == tok.sep_id
    assert (ids[0][mask[0] == 0] == tok.pad_id).all()
    # empty text still yields [CLS][SEP]
    assert list(ids[2][mask[2] == 1]) == [tok.cls_id, tok.sep_id]
    # truncation keeps the trailing [SEP]
    long_ids, long_mask, _ = tok.encode_batch(
        ["the quick brown fox jumps over the lazy dog " * 20], max_length=12)
    assert long_mask.sum() == 12 and long_ids[0, -1] == tok.sep_id


def test_unknown_fusion_and_coverage():
    tok = UnigramTokenizer(make_pieces())
    # snowman+heart are OOV: consecutive unknowns fuse to ONE [UNK]
    ids = tok.tokenize_ids("☃❤")
    assert ids.count(tok.unk_id) >= 1
    fused = [i for i in ids if i == tok.unk_id]
    assert len(fused) == 1
    # every fixture encodes without error and round-trips id ranges
    for text in FIXTURES:
        for i in tok.tokenize_ids(text):
            assert 0 <= i < len(tok.pieces)


def test_save_load_round_trip(tmp_path):
    tok = UnigramTokenizer(make_pieces())
    tok.save(tmp_path / "spm.json")
    tok2 = UnigramTokenizer.load(tmp_path / "spm.json")
    for text in FIXTURES:
        assert tok.tokenize_ids(text) == tok2.tokenize_ids(text)


# -- precompiled charsmap (nmt_nfkc) -------------------------------------------
# Rules shaped like the real nmt_nfkc table: single-codepoint (or single-
# grapheme combining-sequence) sources — fullwidth forms, ligatures,
# enclosed digits, unicode spaces, control removals, NFC composition.

CHARSMAP_RULES = {
    " ": " ",            # NBSP -> space
    "　": " ",            # ideographic space
    "\t": " ",
    "\n": " ",
    "": "",             # control char removed
    "‍": "",             # zero-width joiner removed
    "Ａ": "A",            # fullwidth A
    "Ｂ": "B",
    "．": ".",            # fullwidth full stop
    "①": "1",            # circled digit one
    "é": "é",           # combining acute -> composed (one grapheme)
    "ﬁ": "fi",           # ligature fi
    "㍿": "株式会社",      # square corporation -> 4 CJK chars
    "é": "é",            # identity rule (composed stays composed)
}

CHARSMAP_FIXTURES = [
    "ＡＢC mixed width",
    "école française",       # combining marks (ç has no rule)
    "ﬁsh and ① chips",
    "foo bar　baz",
    "ctrlremoved‍here",
    "日本語テスト ㍿ 2026",
    "tabs\tand\nnewlines",
    "plain ascii unchanged.",
    "",
    "ééé composed identity",
]


def test_charsmap_matches_rust_precompiled_oracle():
    """Our darts-clone builder + byte-longest-prefix matcher agree with the
    independent Rust implementation (tokenizers.normalizers.Precompiled,
    the engine HF uses to apply real spm charsmaps)."""
    pytest.importorskip("tokenizers")
    from tokenizers.normalizers import Precompiled

    blob = build_charsmap(CHARSMAP_RULES)
    ours = PrecompiledCharsmap(blob)
    oracle = Precompiled(blob)
    for text in CHARSMAP_FIXTURES:
        assert ours.normalize(text) == oracle.normalize_str(text), text


def test_charsmap_longest_prefix_and_unmatched_copy():
    blob = build_charsmap(CHARSMAP_RULES)
    cm = PrecompiledCharsmap(blob)
    # combining sequence consumes BOTH codepoints (longest match), while a
    # bare 'e' (no rule) copies through
    assert cm.normalize("ée") == "ée"
    # unmatched multi-byte chars copy through unchanged
    assert cm.normalize("☃") == "☃"
    assert cm.normalize("ＡＢ") == "AB"


def test_charsmap_proto_round_trip_and_tokenize_parity():
    """ModelProto round-trips the charsmap; the full tokenize pipeline with
    charsmap normalization matches the HF-tokenizers pipeline driven by the
    SAME blob (the exact configuration DebertaV2 SpmConverter builds from a
    real spm.model)."""
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, normalizers, pre_tokenizers
    from tokenizers.models import Unigram

    cm_blob = build_charsmap(CHARSMAP_RULES)
    pieces = make_pieces()
    blob = build_spm_model(pieces, charsmap=cm_blob)
    got_pieces, got_cm = parse_spm_model_full(blob)
    assert got_cm == cm_blob
    assert [p for p, _, _ in got_pieces] == [p for p, _, _ in pieces]

    ours = UnigramTokenizer.from_spm_model(blob)
    assert ours.charsmap is not None
    vocab = [(p, s) for p, s, _ in got_pieces]
    oracle = Tokenizer(Unigram(vocab, unk_id=3, byte_fallback=False))
    oracle.normalizer = normalizers.Sequence([
        normalizers.Precompiled(cm_blob),
        normalizers.Replace(tokenizers.Regex(r" {2,}"), " "),
        normalizers.Strip(),
    ])
    oracle.pre_tokenizer = pre_tokenizers.Metaspace(
        replacement="▁", prepend_scheme="always")
    for text in FIXTURES + CHARSMAP_FIXTURES:
        want = oracle.encode(text).ids
        got = ours.tokenize_ids(text)
        assert got == want, (text, ours.tokenize(text),
                             oracle.encode(text).tokens)


def test_charsmap_save_load_round_trip(tmp_path):
    tok = UnigramTokenizer(make_pieces(), charsmap=build_charsmap(
        CHARSMAP_RULES))
    tok.save(tmp_path / "spm.json")
    tok2 = UnigramTokenizer.load(tmp_path / "spm.json")
    assert tok2.charsmap is not None
    for text in FIXTURES + CHARSMAP_FIXTURES:
        assert tok.tokenize_ids(text) == tok2.tokenize_ids(text)


def test_frozen_resolver_prefers_spm_vocab(tmp_path):
    """assets/spm.json (exported by convert_hf alongside the DeBERTa ckpt)
    must win over corpus-trained WordPiece, and feed fixed-shape batches."""
    from mmd_tpu.data.spm import UnigramTokenizer
    from mmd_tpu.models.frozen import load_or_init_frozen

    UnigramTokenizer(make_pieces()).save(tmp_path / "spm.json")
    enc = load_or_init_frozen(tmp_path, vocab_texts=["unused"], tiny=True)
    assert isinstance(enc.tokenizer, UnigramTokenizer)
    ids, mask, types = enc.tokenizer.encode_batch(
        ["hello world", "the dog"], max_length=32)
    assert ids.shape == (2, 32) and mask.sum() > 4


def test_native_viterbi_matches_python():
    """libmmdspm.so (native/spm.cpp byte-trie Viterbi + layout) is
    bit-identical to the Python encoder on the fixture set, including
    unicode, unknown fusion, empties, and truncation."""
    from mmd_tpu.native.bindings import build

    if not build():
        pytest.skip("native toolchain unavailable")
    tok = UnigramTokenizer(make_pieces())
    if tok._get_native() is None:
        pytest.skip("libmmdspm.so failed to load")
    pytok = UnigramTokenizer(make_pieces())
    pytok._native = None
    texts = FIXTURES + ["x" * 900, "café " * 300, "☃" * 40]
    for max_len in (16, 512):
        a = tok.encode_batch(texts, max_length=max_len)
        b = pytok.encode_batch(texts, max_length=max_len)
        for x, y, name in zip(a, b, ("ids", "mask", "types")):
            np.testing.assert_array_equal(x, y, err_msg=name)


def test_native_charsmap_matches_python():
    """Native precompiled-charsmap normalization == the Python byte loop
    (longest-prefix match, unmatched copy-through, multi-byte keys)."""
    import mmd_tpu.native.bindings as B
    from mmd_tpu.native.bindings import build, charsmap_normalize

    if not build():
        pytest.skip("native toolchain unavailable")
    blob = build_charsmap({"A": "a", "ßß": "ss", "É": "e", "\t": " ",
                           "abc": "xyz", "ab": "q"})
    pc = PrecompiledCharsmap(blob)
    texts = ["AÉßß\tx", "plain", "ÉÉÉ", "ßßß", "ß", "abcab", "ababc", ""]
    for t in texts:
        native = charsmap_normalize(blob, t)
        if native is None:
            pytest.skip("libmmdspm.so failed to load")
        old_lib, old_checked = B._spm_lib, B._spm_checked
        B._spm_lib, B._spm_checked = None, True
        try:
            py = pc.normalize(t)
        finally:
            B._spm_lib, B._spm_checked = old_lib, old_checked
        assert native == py, t
