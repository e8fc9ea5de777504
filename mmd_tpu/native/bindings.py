"""ctypes bindings for the native (C++) host-path components.

Libraries build with `make -C mmd_tpu/native` (g++, no external deps) and
load lazily; every caller has a pure-Python fallback, so the framework works
unbuilt and gets faster when built. `build()` compiles on demand.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_DIR = Path(__file__).resolve().parent
_I32P = ctypes.POINTER(ctypes.c_int32)


def build(quiet: bool = True) -> bool:
    """Compile the native libs in-tree. Returns True on success."""
    try:
        subprocess.run(
            ["make", "-C", str(_DIR)],
            check=True,
            stdout=subprocess.DEVNULL if quiet else None,
            stderr=subprocess.DEVNULL if quiet else None,
        )
        return True
    except Exception:
        return False


def _load(name: str, auto_build: bool = False) -> Optional[ctypes.CDLL]:
    path = _DIR / name
    if not path.exists():
        if not (auto_build and build()):
            return None
    try:
        return ctypes.CDLL(str(path))
    except OSError:
        return None


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

class NativeTokenizer:
    """Batch WordPiece encoder backed by libmmdtok.so.

    Exact parity with the Python encoder for ASCII text; callers should
    route non-ASCII batches through the Python path (the dispatch in
    data/tokenizer.py does this automatically).
    """

    def __init__(self, vocab: Sequence[str]):
        lib = _load("libmmdtok.so")
        if lib is None:
            raise RuntimeError("libmmdtok.so not built (make -C mmd_tpu/native)")
        lib.mmdtok_create.restype = ctypes.c_void_p
        lib.mmdtok_create.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32]
        lib.mmdtok_encode_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, _I32P, _I32P, ctypes.c_int32]
        lib.mmdtok_destroy.argtypes = [ctypes.c_void_p]
        self._lib = lib
        ids = {t: i for i, t in enumerate(vocab)}
        blob = "\n".join(vocab).encode("utf-8")
        self._handle = lib.mmdtok_create(
            blob, len(blob), ids["[PAD]"], ids["[UNK]"], ids["[CLS]"],
            ids["[SEP]"])
        if not self._handle:
            raise RuntimeError("mmdtok_create failed")

    def encode_batch(self, texts: Sequence[str], max_length: int,
                     num_threads: int = 0):
        n = len(texts)
        payload = b"\x00".join(str(t).encode("utf-8") for t in texts) + b"\x00"
        ids = np.empty((n, max_length), np.int32)
        mask = np.empty((n, max_length), np.int32)
        nt = num_threads or min(16, os.cpu_count() or 1)
        self._lib.mmdtok_encode_batch(
            self._handle, payload, len(payload), n, max_length,
            ids.ctypes.data_as(_I32P), mask.ctypes.data_as(_I32P), nt)
        types = np.zeros((n, max_length), np.int32)
        return ids, mask, types

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.mmdtok_destroy(self._handle)
        except Exception:
            pass


# ---------------------------------------------------------------------------
# SentencePiece-unigram (Viterbi) encoder + charsmap normalizer
# ---------------------------------------------------------------------------


class NativeSpm:
    """Batch SPM-unigram encoder backed by libmmdspm.so.

    Exact parity with data/spm.py::UnigramTokenizer for no-pair batches:
    the caller normalizes + metaspaces each text in Python, this runs the
    byte-trie Viterbi, unk-fusing, and [CLS]/[SEP]/pad layout in C++.
    """

    def __init__(self, pieces, unk_id: int, pad_id: int, cls_id: int,
                 sep_id: int, unk_score: float):
        lib = _load("libmmdspm.so", auto_build=True)
        if lib is None:
            raise RuntimeError("libmmdspm.so not built (make -C mmd_tpu/native)")
        lib.mmdspm_create.restype = ctypes.c_void_p
        lib.mmdspm_create.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), _I32P,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_double]
        lib.mmdspm_encode_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, _I32P, _I32P, _I32P]
        lib.mmdspm_destroy.argtypes = [ctypes.c_void_p]
        self._lib = lib
        blob = b"\x00".join(p.encode("utf-8") for p, _, _ in pieces) + b"\x00"
        scores = np.ascontiguousarray([s for _, s, _ in pieces], np.float64)
        types = np.ascontiguousarray([t for _, _, t in pieces], np.int32)
        self._handle = lib.mmdspm_create(
            blob, len(blob), scores.ctypes.data_as(
                ctypes.POINTER(ctypes.c_double)),
            types.ctypes.data_as(_I32P), len(pieces),
            unk_id, pad_id, cls_id, sep_id, unk_score)
        if not self._handle:
            raise RuntimeError("mmdspm_create failed")

    def encode_batch(self, prepared_texts: Sequence[str], max_length: int):
        """prepared_texts: already normalized + metaspace'd ("" = empty)."""
        n = len(prepared_texts)
        payload = b"\x00".join(t.encode("utf-8")
                               for t in prepared_texts) + b"\x00"
        ids = np.empty((n, max_length), np.int32)
        mask = np.empty((n, max_length), np.int32)
        types = np.empty((n, max_length), np.int32)
        self._lib.mmdspm_encode_batch(
            self._handle, payload, len(payload), n, max_length,
            ids.ctypes.data_as(_I32P), mask.ctypes.data_as(_I32P),
            types.ctypes.data_as(_I32P))
        return ids, mask, types

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.mmdspm_destroy(self._handle)
        except Exception:
            pass


_spm_lib: Optional[ctypes.CDLL] = None
_spm_checked = False


def charsmap_normalize(blob: bytes, text: str) -> Optional[str]:
    """Native precompiled-charsmap normalization; None when the lib is
    unavailable (caller falls back to the Python byte loop)."""
    global _spm_lib, _spm_checked
    if not _spm_checked:
        _spm_checked = True
        lib = _load("libmmdspm.so", auto_build=True)
        if lib is not None:
            lib.mmdspm_charsmap_normalize.restype = ctypes.c_int64
            lib.mmdspm_charsmap_normalize.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p,
                ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64]
            _spm_lib = lib
    if _spm_lib is None:
        return None
    data = text.encode("utf-8")
    cap = max(64, 4 * len(data))
    while True:
        out = ctypes.create_string_buffer(cap)
        n = _spm_lib.mmdspm_charsmap_normalize(
            blob, len(blob), data, len(data), out, cap)
        if n == -1:
            cap *= 2
            continue
        if n < 0:
            return None  # corrupt blob: fall back to the Python path
        return out.raw[:n].decode("utf-8")


# ---------------------------------------------------------------------------
# Row gather
# ---------------------------------------------------------------------------

_gather_lib: Optional[ctypes.CDLL] = None
_gather_checked = False


def gather_rows(src: np.ndarray, indices: np.ndarray,
                num_threads: int = 0) -> Optional[np.ndarray]:
    """Parallel src[indices] for a 2D+ C-contiguous array (memmap-friendly).
    Returns None when the native lib is unavailable (caller falls back)."""
    global _gather_lib, _gather_checked
    if not _gather_checked:
        _gather_checked = True
        # auto_build: the .so files are not committed (only the sources),
        # so the first caller in a fresh checkout must build them.
        lib = _load("libmmdgather.so", auto_build=True)
        if lib is not None:
            lib.mmdgather_rows.argtypes = [
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int32]
            _gather_lib = lib
    if _gather_lib is None or not src.flags["C_CONTIGUOUS"]:
        return None
    idx = np.ascontiguousarray(indices, np.int64)
    out = np.empty((len(idx), *src.shape[1:]), src.dtype)
    row_bytes = src.dtype.itemsize * int(np.prod(src.shape[1:], initial=1))
    nt = num_threads or min(16, os.cpu_count() or 1)
    _gather_lib.mmdgather_rows(
        ctypes.c_void_p(src.ctypes.data), row_bytes,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(idx),
        ctypes.c_void_p(out.ctypes.data), nt)
    return out
