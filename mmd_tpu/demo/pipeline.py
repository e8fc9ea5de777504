"""End-to-end claim verification: the demo's five steps as one offline,
batched pipeline.

Mirrors reference src/demo/app.py's flow (caption :45-54 -> enrich :57-61 ->
text retrieval :93-163 -> image retrieval :171-234 -> per-evidence classify
:242-263 -> two-stage path agreement :313-340 -> corpus majority vote
:343-371) with the reference's perf cliff removed: all retrieved evidence
pairs classify in ONE compiled batch instead of a tokenizer+encoder run per
pair (app.py:461-476).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional, Sequence

import pandas as pd

from mmd_tpu.inference.predictor import MisinformationPredictor
from mmd_tpu.inference.rules import (
    determine_final_classification, get_final_classification,
)


@dataclasses.dataclass
class Evidence:
    id: str
    text: str
    image_path: Optional[str]
    score: float
    source: str                           # "text" | "image"
    classification_result_all: Optional[tuple] = None
    classification_result_final: Optional[str] = None


@dataclasses.dataclass
class VerificationResult:
    claim: str
    claim_enriched: str
    caption: str
    final_classification: str
    contributing_indices: list
    evidences: list


class EvidenceIndex:
    """id -> (text, image_path) lookup over the enriched CSVs, with ids in
    the retrieval format f\"{split}_{id}\" (reference text2text corpus ids)."""

    def __init__(self, csv_by_split: dict[str, str | Path],
                 root: Optional[Path] = None):
        self.rows: dict[str, dict] = {}
        for split, csv_path in csv_by_split.items():
            df = pd.read_csv(csv_path)
            text_col = ("evidence_enriched" if "evidence_enriched" in df
                        else "evidence")
            for _, r in df.iterrows():
                img = r.get("evidence_image")
                if isinstance(img, str) and root is not None:
                    img = str(root / img)
                self.rows[f"{split}_{r['id']}"] = {
                    "text": str(r[text_col]),
                    "image": img if isinstance(img, str) else None,
                }

    def __getitem__(self, key: str) -> dict:
        return self.rows[key]

    def get(self, key: str, default=None):
        return self.rows.get(key, default)

    def text_lookup(self) -> dict[str, str]:
        return {k: v["text"] for k, v in self.rows.items()}


class ClaimVerificationPipeline:
    def __init__(self, predictor: MisinformationPredictor,
                 text_search=None, image_corpus=None,
                 caption_engine=None, evidence_index: EvidenceIndex = None,
                 image_id_resolver=None):
        """image_id_resolver: corpus image path -> evidence id in the index
        (default: `Path(p).stem` minus trailing `_evidence` -> `train_{id}`
        style left to the caller)."""
        self.predictor = predictor
        self.text_search = text_search
        self.image_corpus = image_corpus
        self.caption_engine = caption_engine
        self.index = evidence_index
        self.image_id_resolver = image_id_resolver or self._default_resolver

    @staticmethod
    def _default_resolver(path: str) -> Optional[str]:
        # evidence_corpus naming: {split}_{id}_evidence.jpg (reference
        # corpus_utils.py:7-32)
        name = Path(path).name
        if name.endswith("_evidence.jpg"):
            return name[: -len("_evidence.jpg")]
        return None

    def verify(self, claim_text: str, claim_image_path: Optional[str] = None,
               top_k: int = 5) -> VerificationResult:
        # Step 1-2: caption + enrich
        caption = ""
        if claim_image_path and self.caption_engine is not None:
            caption = self.caption_engine.caption_paths([claim_image_path])[0]
        claim_enriched = f"{claim_text}. {caption}" if caption else claim_text

        evidences: list[Evidence] = []

        # Step 3: text retrieval
        if self.text_search is not None:
            for eid, score in self.text_search.search(claim_enriched, top_k):
                row = self.index.get(eid) if self.index else None
                evidences.append(Evidence(
                    id=eid, text=row["text"] if row else "",
                    image_path=row["image"] if row else None,
                    score=float(score), source="text"))

        # Step 4: image retrieval
        if claim_image_path and self.image_corpus is not None:
            for path, score in self.image_corpus.retrieve_similar_images(
                    claim_image_path, top_k):
                eid = self.image_id_resolver(path)
                row = self.index.get(eid) if (self.index and eid) else None
                evidences.append(Evidence(
                    id=eid or path, text=row["text"] if row else "",
                    image_path=path, score=float(score), source="image"))

        # Step 5: classify ALL pairs in one batch
        if evidences:
            results = self.predictor.evaluate_batch(
                [claim_enriched] * len(evidences),
                [claim_image_path] * len(evidences),
                [e.text for e in evidences],
                [e.image_path for e in evidences])
            for e, r in zip(evidences, results):
                paths = (r["text_text"], r["text_image"],
                         r["image_text"], r["image_image"])
                e.classification_result_all = paths
                e.classification_result_final = get_final_classification(paths)

        final, contributing = determine_final_classification(
            [e.classification_result_final for e in evidences])
        return VerificationResult(
            claim=claim_text, claim_enriched=claim_enriched, caption=caption,
            final_classification=final, contributing_indices=contributing,
            evidences=evidences)
