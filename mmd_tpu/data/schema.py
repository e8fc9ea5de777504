"""Factify-2 column schema and project paths.

Column contract matches the reference (reference src/utils/data_utils.py:11-20
HEADERS; src/preprocess/preprocess.py renames the raw URL columns to
`*_original` and writes local relative paths into claim_image/evidence_image).
"""

from __future__ import annotations

import os
from pathlib import Path

HEADERS = [
    "id",
    "claim",
    "claim_image",
    "evidence",
    "evidence_image",
    "category",
    "claim_ocr",
    "evidence_ocr",
]

ENRICHED_COLUMNS = [
    "claim_image_caption",
    "evidence_image_caption",
    "claim_enriched",
    "evidence_enriched",
]


def get_project_root() -> Path:
    """Repo root; overridable via MMD_TPU_ROOT for tests and pipelines."""
    env = os.environ.get("MMD_TPU_ROOT")
    if env:
        return Path(env)
    return Path(__file__).resolve().parent.parent.parent


def raw_dir() -> Path:
    return get_project_root() / "data" / "raw" / "factify"


def preprocessed_dir() -> Path:
    return get_project_root() / "data" / "preprocessed"


def images_dir() -> Path:
    return raw_dir() / "extracted" / "images"
