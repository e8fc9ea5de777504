"""SentencePiece-unigram tokenizer: host-side encode matching HF DeBERTa-v2.

The reference tokenizes with HF `DebertaV2Tokenizer` (reference
train.py:136-140), which wraps a SentencePiece unigram model
(tokenization_deberta_v2.py SPMTokenizer: `spm.encode(text, out_type=str)`
plus the [PAD]=0/[CLS]=1/[SEP]=2/[UNK]=3 id convention). This module
re-derives that pipeline without the sentencepiece C++ dependency:

  * a minimal protobuf wire-format reader for spm `ModelProto` (pieces,
    scores, types only — ~the 3 fields the encoder needs), so
    tools/convert_hf.py can export the vocab from a downloaded spm.model
    with no extra deps, plus a writer used to build test fixtures;
  * Viterbi unigram segmentation over a piece trie (the SentencePiece /
    HF-`tokenizers` Unigram algorithm: maximize summed piece log-probs;
    characters not covered by any piece become unknowns at
    min_score - 10.0, consecutive unknowns fused — parity-tested against
    the Rust `tokenizers.models.Unigram` oracle in tests/test_spm.py);
  * metaspace pre-tokenization (" " -> "▁", dummy prefix) and NFKC
    normalization. NOTE: true spm models carry a precompiled charsmap
    (nmt_nfkc); NFKC + whitespace collapsing reproduces it for the
    English-dominant Factify corpus (34,969/35,000 train claims English,
    SURVEY.md §6) — the known approximation lives here, not in the
    segmentation, which is exact.

Batch output contract matches data/tokenizer.py: fixed-shape (B, L) int32
ids/mask/token_type_ids, [CLS] x [SEP] structure, so the DeBERTa encoder
sees reference-identical inputs end to end.
"""

from __future__ import annotations

import json
import struct
import unicodedata
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

METASPACE = "▁"
UNK_PENALTY = 10.0

# spm ModelProto.SentencePiece.type values
NORMAL, UNKNOWN, CONTROL, USER_DEFINED, UNUSED, BYTE = 1, 2, 3, 4, 5, 6


# -- minimal protobuf wire format (ModelProto pieces only) ---------------------

def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _skip_field(buf: bytes, pos: int, wire: int) -> int:
    if wire == 0:
        _, pos = _read_varint(buf, pos)
    elif wire == 1:
        pos += 8
    elif wire == 2:
        n, pos = _read_varint(buf, pos)
        pos += n
    elif wire == 5:
        pos += 4
    else:
        raise ValueError(f"unsupported wire type {wire}")
    return pos


def parse_spm_model(data: bytes) -> list[tuple[str, float, int]]:
    """spm ModelProto bytes -> [(piece, score, type)], in id order.
    ModelProto field 1 = repeated SentencePiece{piece:1 string,
    score:2 float, type:3 enum (default NORMAL)}."""
    pieces = []
    pos = 0
    while pos < len(data):
        tag, pos = _read_varint(data, pos)
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == 2:
            n, pos = _read_varint(data, pos)
            sub = data[pos:pos + n]
            pos += n
            piece, score, ptype = "", 0.0, NORMAL
            sp = 0
            while sp < len(sub):
                stag, sp = _read_varint(sub, sp)
                sfield, swire = stag >> 3, stag & 7
                if sfield == 1 and swire == 2:
                    ln, sp = _read_varint(sub, sp)
                    piece = sub[sp:sp + ln].decode("utf-8")
                    sp += ln
                elif sfield == 2 and swire == 5:
                    (score,) = struct.unpack("<f", sub[sp:sp + 4])
                    sp += 4
                elif sfield == 3 and swire == 0:
                    ptype, sp = _read_varint(sub, sp)
                else:
                    sp = _skip_field(sub, sp, swire)
            pieces.append((piece, float(score), int(ptype)))
        else:
            pos = _skip_field(data, pos, wire)
    return pieces


def _write_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def build_spm_model(pieces: Sequence[tuple[str, float, int]]) -> bytes:
    """Inverse of parse_spm_model (test fixtures / re-export)."""
    out = bytearray()
    for piece, score, ptype in pieces:
        sub = bytearray()
        raw = piece.encode("utf-8")
        sub += _write_varint((1 << 3) | 2) + _write_varint(len(raw)) + raw
        sub += _write_varint((2 << 3) | 5) + struct.pack("<f", score)
        if ptype != NORMAL:
            sub += _write_varint((3 << 3) | 0) + _write_varint(ptype)
        out += _write_varint((1 << 3) | 2) + _write_varint(len(sub)) + sub
    return bytes(out)


# -- unigram segmentation ------------------------------------------------------

class UnigramTokenizer:
    """SentencePiece-unigram encoder with the DeBERTa-v2 special-token
    convention ([PAD]=0, [CLS]=1, [SEP]=2, [UNK]=3 inside the spm vocab;
    [MASK] appended past the end, matching HF deberta-v3)."""

    def __init__(self, pieces: Sequence[tuple[str, float, int]]):
        self.pieces = [(p, float(s), int(t)) for p, s, t in pieces]
        self.piece_to_id = {p: i for i, (p, _, _) in enumerate(self.pieces)}
        self.unk_id = next(
            (i for i, (_, _, t) in enumerate(self.pieces) if t == UNKNOWN), 3)
        self.pad_id = self.piece_to_id.get("[PAD]", 0)
        self.cls_id = self.piece_to_id.get("[CLS]", 1)
        self.sep_id = self.piece_to_id.get("[SEP]", 2)
        self.mask_id = self.piece_to_id.get("[MASK]", len(self.pieces))
        scores = [s for _, s, t in self.pieces if t == NORMAL]
        self.min_score = min(scores) if scores else 0.0
        self.unk_score = self.min_score - UNK_PENALTY
        # prefix trie over encodable pieces: nested dicts, "\0" terminal
        # holding (piece_id, score)
        self._trie: dict = {}
        for i, (p, s, t) in enumerate(self.pieces):
            if t in (NORMAL, USER_DEFINED) and p:
                node = self._trie
                for ch in p:
                    node = node.setdefault(ch, {})
                node["\0"] = (i, s)
        self._max_piece_len = max(
            (len(p) for p, _, t in self.pieces if t in (NORMAL, USER_DEFINED)),
            default=1)

    # -- persistence -------------------------------------------------------

    def save(self, path: str | Path) -> None:
        Path(path).write_text(json.dumps({"pieces": self.pieces}))

    @classmethod
    def load(cls, path: str | Path) -> "UnigramTokenizer":
        return cls(json.loads(Path(path).read_text())["pieces"])

    @classmethod
    def from_spm_model(cls, data: bytes) -> "UnigramTokenizer":
        return cls(parse_spm_model(data))

    @property
    def vocab_size(self) -> int:
        return len(self.pieces) + (1 if self.mask_id == len(self.pieces) else 0)

    # -- pipeline ----------------------------------------------------------

    @staticmethod
    def normalize(text: str) -> str:
        """NFKC + whitespace collapsing (see module docstring on the
        precompiled-charsmap approximation)."""
        text = unicodedata.normalize("NFKC", str(text))
        text = "".join(" " if ch.isspace() else ch for ch in text)
        text = " ".join(text.split())
        return text

    def _viterbi(self, text: str) -> list[int]:
        """Maximize summed piece scores; uncovered chars -> unk at
        min_score - 10; consecutive unks fuse into ONE unk token (the
        HF-tokenizers Unigram fuse_unk semantics used for spm models)."""
        n = len(text)
        best = np.full(n + 1, -np.inf)
        best[0] = 0.0
        back: list[Optional[tuple[int, int]]] = [None] * (n + 1)  # (start, id)
        for start in range(n):
            if best[start] == -np.inf:
                continue
            node = self._trie
            for end in range(start, min(n, start + self._max_piece_len)):
                node = node.get(text[end])
                if node is None:
                    break
                term = node.get("\0")
                if term is not None:
                    cand = best[start] + term[1]
                    if cand > best[end + 1]:
                        best[end + 1] = cand
                        back[end + 1] = (start, term[0])
            # single-char unknown candidate (always available, as in spm)
            cand = best[start] + self.unk_score
            if cand > best[start + 1]:
                best[start + 1] = cand
                back[start + 1] = (start, self.unk_id)
        ids: list[int] = []
        pos = n
        while pos > 0:
            start, pid = back[pos]
            ids.append(pid)
            pos = start
        ids.reverse()
        # fuse consecutive unknowns
        fused: list[int] = []
        for pid in ids:
            if pid == self.unk_id and fused and fused[-1] == self.unk_id:
                continue
            fused.append(pid)
        return fused

    def tokenize_ids(self, text: str) -> list[int]:
        """Raw text -> spm piece ids (no specials)."""
        text = self.normalize(text)
        if not text:
            return []
        text = METASPACE + text.replace(" ", METASPACE)
        return self._viterbi(text)

    def tokenize(self, text: str) -> list[str]:
        return [self.pieces[i][0] if i < len(self.pieces) else "[UNK]"
                for i in self.tokenize_ids(text)]

    # -- fixed-shape batch encode (contract of data/tokenizer.py) ----------

    def encode(self, text: str, text_pair: Optional[str] = None,
               max_length: int = 512) -> tuple[list[int], list[int]]:
        ids = [self.cls_id] + self.tokenize_ids(text)
        ids = ids[: max_length - 1] + [self.sep_id]
        types = [0] * len(ids)
        if text_pair is not None:
            pair = self.tokenize_ids(text_pair)[: max_length - len(ids) - 1]
            ids = ids + pair + [self.sep_id]
            types = types + [1] * (len(pair) + 1)
        return ids[:max_length], types[:max_length]

    def encode_batch(self, texts: Sequence[str],
                     pairs: Optional[Sequence[str]] = None,
                     max_length: int = 512):
        b = len(texts)
        out = np.full((b, max_length), self.pad_id, np.int32)
        mask = np.zeros((b, max_length), np.int32)
        types = np.zeros((b, max_length), np.int32)
        for i, t in enumerate(texts):
            ids, ty = self.encode(t, pairs[i] if pairs is not None else None,
                                  max_length)
            out[i, :len(ids)] = ids
            mask[i, :len(ids)] = 1
            types[i, :len(ty)] = ty
        return out, mask, types

    def decode(self, ids) -> str:
        out = []
        for i in ids:
            i = int(i)
            if i in (self.pad_id, self.cls_id, self.sep_id):
                continue
            out.append(self.pieces[i][0] if i < len(self.pieces) else "[UNK]")
        return "".join(out).replace(METASPACE, " ").strip()
