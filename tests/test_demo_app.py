"""Demo UI parity: drive the full streamlit page (mmd_tpu/demo/app.py)
with a recording fake `st` and assert the reference's structure is rendered
(reference src/demo/app.py:374-525: five progress steps, Text/Image evidence
tabs, per-evidence classification panels, final combined classification +
contributing evidences). Also covers the static HTML twin."""

import contextlib

import pytest

from mmd_tpu.demo.app import render_app
from mmd_tpu.demo.pipeline import Evidence


class FakeSt:
    """Minimal streamlit-compatible recorder."""

    def __init__(self, text_input="the claim", press_button=True):
        self.calls: list[tuple] = []
        self._text = text_input
        self._button = press_button

    def _rec(self, kind, *a):
        self.calls.append((kind, *a))

    # widgets
    def title(self, t): self._rec("title", t)
    def write(self, *a): self._rec("write", " ".join(map(str, a)))
    def subheader(self, t): self._rec("subheader", t)
    def error(self, t): self._rec("error", t)
    def warning(self, t): self._rec("warning", t)
    def image(self, *a, **k): self._rec("image", a[0] if a else None)
    def text_area(self, label, value="", **k):
        self._rec("text_area", label)
        return self._text if label.startswith("Enter text") else value
    def file_uploader(self, *a, **k): return None
    def slider(self, label, lo, hi, default, **k):
        self._rec("slider", label)
        return default
    def button(self, label, **k):
        self._rec("button", label)
        return self._button
    def divider(self): self._rec("divider")

    # containers
    @contextlib.contextmanager
    def _ctx(self, kind, label=None):
        self._rec(kind, label)
        yield self

    def container(self): return self._ctx("container")
    def spinner(self, label): return self._ctx("spinner", label)

    def columns(self, n):
        return [self._ctx("column") for _ in range(n)]

    def tabs(self, labels):
        self._rec("tabs", tuple(labels))
        return [self._ctx("tab", l) for l in labels]

    def progress(self, v):
        self._rec("progress", v)
        outer = self

        class P:
            def progress(self, v): outer._rec("progress", v)
        return P()

    def of(self, kind):
        return [c for c in self.calls if c[0] == kind]


class StubPipeline:
    """Canned five-step pipeline: 2 text + 1 image evidences."""

    def caption_step(self, image_path): return ""
    def enrich_step(self, text, caption):
        return f"{text}. {caption}" if caption else text

    def retrieve_text_step(self, q, k):
        return [Evidence(id=f"test_{i}", text=f"evidence {i}",
                         image_path=None, score=0.9 - i / 10, source="text")
                for i in range(2)]

    def retrieve_image_step(self, p, k):
        return []

    def classify_step(self, q, p, evidences):
        for e in evidences:
            e.classification_result_all = ("support", "support",
                                           "not_enough_information",
                                           "support")
            e.classification_result_final = "support"
        return "support", [1, 2]


def test_render_app_full_structure():
    st = FakeSt()
    render_app(st, pipeline_factory=StubPipeline)
    writes = [c[1] for c in st.of("write")]

    # five step headers, in order (reference app.py:418-459)
    steps = [w for w in writes if w.startswith("### Step")]
    assert steps == [
        "### Step 1: Generating caption...",
        "### Step 2: Enriching text...",
        "### Step 3: Retrieving evidences by text...",
        "### Step 4: Retrieving evidences by image...",
        "### Step 5: Verifying claim with retrieved evidences...",
    ]
    # progress bar hits 0..100
    assert [c[1] for c in st.of("progress")] == [0, 20, 40, 60, 80, 100]
    # both tabs exist (reference app.py:485)
    assert st.of("tabs") == [("tabs", ("Text Evidences", "Image Evidences"))]
    # per-evidence panels with per-path classification lines
    assert [c[1] for c in st.of("subheader")] == ["Evidence 1", "Evidence 2"]
    assert any(w.startswith("Claim Text | Evidence Text:") for w in writes)
    # image tab reports the missing modality (no image uploaded)
    assert "Image modality is missing from the input claim!" in writes
    # final combined classification + contributing evidences (app.py:508-521)
    assert "### Final Combined Classification" in writes
    assert "**Classification Result:** Support" in writes
    assert "Text Evidence 1" in writes and "Text Evidence 2" in writes


def test_render_app_empty_input_warns():
    st = FakeSt(text_input="")
    render_app(st, pipeline_factory=StubPipeline)
    assert st.of("warning") == [
        ("warning", "Please upload an image or enter text.")]
    assert not st.of("tabs")


def test_render_app_no_button_is_inert():
    st = FakeSt(press_button=False)
    render_app(st, pipeline_factory=StubPipeline)
    assert not st.of("progress") and not st.of("tabs")


def test_render_html_report(tmp_path):
    from mmd_tpu.demo.pipeline import VerificationResult
    from mmd_tpu.demo.render_html import render_html

    evs = StubPipeline().retrieve_text_step("q", 2)
    StubPipeline().classify_step("q", None, evs)
    result = VerificationResult(
        claim="the claim", claim_enriched="the claim. cap", caption="cap",
        final_classification="support", contributing_indices=[1],
        evidences=evs)
    out = tmp_path / "report.html"
    render_html(result, out)
    html = out.read_text()
    for needle in ("Final Combined Classification", "Support",
                   "Text Evidences", "Image Evidences", "Evidence 1",
                   "Contributing Evidences", "the claim. cap"):
        assert needle in html, needle
