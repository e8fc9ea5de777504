"""Streamlit demo shim over ClaimVerificationPipeline.

Parity entry point for `python -m streamlit run src/demo/app.py` (reference
src/demo/app.py:374-525). The heavy lifting lives in demo/pipeline.py (pure,
testable, batched); this file only renders. Streamlit is optional — absent,
the module still imports and `build_pipeline()` remains usable from scripts.

Run: python -m streamlit run mmd_tpu/demo/app.py
"""

from __future__ import annotations

import functools
import os
from pathlib import Path

from mmd_tpu.core.config import ModelConfig
from mmd_tpu.demo.pipeline import ClaimVerificationPipeline, EvidenceIndex
from mmd_tpu.inference.predictor import MisinformationPredictor

CATEGORY_MAPPING = {
    "support": "Support",
    "not_enough_information": "Not Enough Information",
    "refute": "Refute",
    None: "—",
}


@functools.lru_cache(maxsize=1)
def build_pipeline(root: str = ".", checkpoint: str | None = None,
                   assets: str = "assets/encoders") -> ClaimVerificationPipeline:
    root_p = Path(root)
    predictor = MisinformationPredictor(
        ModelConfig(), checkpoint_path=checkpoint, assets_dir=assets)

    text_search = None
    image_corpus = None
    index = None
    csvs = {}
    for split in ("train", "test"):
        p = root_p / "data" / "preprocessed" / f"{split}_enriched.csv"
        if p.exists():
            csvs[split] = p
    if csvs:
        index = EvidenceIndex(csvs, root=root_p)
        try:
            from mmd_tpu.retrieval.text import SemanticSearch, TextCorpus
            corpora = []
            for split in csvs:
                d = root_p / "data" / "retrieval" / f"text_{split}"
                if (d / "meta.json").exists():
                    corpora.append(TextCorpus(d, predictor.enc.tokenizer))
            if corpora:
                text_search = SemanticSearch(
                    corpora[0], corpora,
                    evidence_lookup=index.text_lookup())
        except Exception as e:
            print(f"[demo] text retrieval unavailable: {e}")
    img_store = root_p / "data" / "retrieval" / "image_corpus"
    if (img_store / "meta.json").exists():
        from mmd_tpu.retrieval.image import ImageCorpus
        image_corpus = ImageCorpus(img_store)

    caption_engine = None
    try:
        from mmd_tpu.pipelines.caption import CaptionEngine
        caption_engine = CaptionEngine(predictor.enc.tokenizer, batch_size=1)
    except Exception as e:
        print(f"[demo] captioner unavailable: {e}")

    return ClaimVerificationPipeline(
        predictor, text_search=text_search, image_corpus=image_corpus,
        caption_engine=caption_engine, evidence_index=index)


def main():
    import streamlit as st

    st.title("Multimodal Evidence-Based Misinformation Classification")
    st.write("Upload claims that have image and/or text content to verify.")
    uploaded_image = st.file_uploader("Upload an image (1 max)",
                                      type=["jpg", "jpeg", "png"])
    claim_text = st.text_area("Claim text", max_chars=4096)

    if st.button("Verify Claim") and claim_text:
        image_path = None
        if uploaded_image is not None:
            image_path = os.path.join("/tmp", uploaded_image.name)
            with open(image_path, "wb") as f:
                f.write(uploaded_image.getbuffer())
            st.image(image_path, width=320)

        pipe = build_pipeline()
        with st.spinner("Verifying..."):
            result = pipe.verify(claim_text, image_path)

        st.header(f"Verdict: {CATEGORY_MAPPING[result.final_classification]}")
        if result.caption:
            st.write(f"**Generated caption:** {result.caption}")
        st.write(f"**Enriched claim:** {result.claim_enriched}")
        if result.contributing_indices:
            st.write(f"**Contributing evidence:** "
                     f"{result.contributing_indices}")
        for i, ev in enumerate(result.evidences, 1):
            with st.expander(f"Evidence {i} ({ev.source}, score {ev.score:.3f})"):
                st.write(ev.text[:1000])
                if ev.image_path and os.path.exists(ev.image_path):
                    st.image(ev.image_path, width=240)
                if ev.classification_result_all:
                    tt, ti, it_, ii = ev.classification_result_all
                    st.write(f"text|text: {CATEGORY_MAPPING[tt]} · "
                             f"text|image: {CATEGORY_MAPPING[ti]} · "
                             f"image|text: {CATEGORY_MAPPING[it_]} · "
                             f"image|image: {CATEGORY_MAPPING[ii]}")
                st.write(f"**Final:** "
                         f"{CATEGORY_MAPPING[ev.classification_result_final]}")


if __name__ == "__main__":
    main()
