"""Fusion rules, predictor contract, eval drivers, end-to-end demo pipeline."""

import dataclasses
import json

import numpy as np
import pytest

from mmd_tpu.inference.rules import (
    NEI, REFUTE, SUPPORT, determine_final_classification,
    get_final_classification, resolve_classification,
)


# ------------------------------- rules ---------------------------------------

def test_resolve_classification_table():
    assert resolve_classification(SUPPORT, SUPPORT) == SUPPORT
    assert resolve_classification(REFUTE, REFUTE) == REFUTE
    assert resolve_classification(SUPPORT, NEI) == SUPPORT
    assert resolve_classification(NEI, REFUTE) == REFUTE
    assert resolve_classification(SUPPORT, REFUTE) == NEI   # conflict -> NEI
    assert resolve_classification(NEI, NEI) == NEI


def test_get_final_classification_two_stage():
    # stage 1 (tt, ii) decides first
    assert get_final_classification((SUPPORT, REFUTE, REFUTE, SUPPORT)) == SUPPORT
    # stage 1 undecided -> stage 2 (ti, it)
    assert get_final_classification((NEI, REFUTE, REFUTE, NEI)) == REFUTE
    # both undecided
    assert get_final_classification((NEI, NEI, NEI, NEI)) == NEI
    assert get_final_classification((SUPPORT, NEI, NEI, REFUTE)) == NEI


def test_determine_final_classification_majority():
    label, idx = determine_final_classification(
        [SUPPORT, SUPPORT, REFUTE, NEI, None])
    assert label == SUPPORT and idx == [1, 2]
    label, _ = determine_final_classification([SUPPORT, REFUTE])
    assert label == NEI                       # tie
    label, _ = determine_final_classification([NEI, NEI])
    assert label == NEI                       # no decisive votes
    label, idx = determine_final_classification([])
    assert label == NEI and idx == []


# ------------------------------ predictor ------------------------------------

@pytest.fixture(scope="module")
def tiny_predictor(tmp_path_factory):
    from mmd_tpu.core.config import ModelConfig
    from mmd_tpu.inference.predictor import MisinformationPredictor
    from mmd_tpu.models.frozen import load_or_init_frozen
    assets = tmp_path_factory.mktemp("assets")
    enc = load_or_init_frozen(assets, vocab_texts=["claim evidence text"],
                              vocab_size=300, tiny=True)
    cfg = ModelConfig(text_input_dim=enc.text_cfg.hidden_size,
                      image_input_dim=enc.vit_cfg.hidden_size,
                      embed_dim=32, num_heads=4, hidden_dim=16,
                      compute_dtype="float32")
    return MisinformationPredictor(cfg, encoders=enc, batch_size=4)


def test_predictor_parallel_text_serving_matches_serial(tmp_path_factory):
    """Predictor with text_parallelism='pp'/'sp' over a (4, 2) mesh embeds
    texts identically to single-device serving — the parallel paths are
    deployable from the inference surface, not just the library."""
    import jax

    from mmd_tpu.core.config import ModelConfig
    from mmd_tpu.core.mesh import make_mesh
    from mmd_tpu.inference.predictor import MisinformationPredictor
    from mmd_tpu.models.frozen import load_or_init_frozen

    assets = tmp_path_factory.mktemp("assets_par")
    enc = load_or_init_frozen(assets, vocab_texts=["claim evidence text"],
                              vocab_size=300, tiny=True)
    cfg = ModelConfig(text_input_dim=enc.text_cfg.hidden_size,
                      image_input_dim=enc.vit_cfg.hidden_size,
                      embed_dim=32, num_heads=4, hidden_dim=16,
                      compute_dtype="float32")
    mesh = make_mesh(jax.devices(), model_parallel=2)
    texts = ["a first claim", "some evidence", "a third text"]

    base = MisinformationPredictor(cfg, encoders=enc, batch_size=4,
                                   max_length=16)
    want = base._encode_texts(texts)
    for mode in ("pp", "sp", "sp_ring"):
        enc_m = load_or_init_frozen(assets, tiny=True)
        pred = MisinformationPredictor(cfg, encoders=enc_m, batch_size=4,
                                       max_length=16, mesh=mesh,
                                       text_parallelism=mode)
        got = pred._encode_texts(texts)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6,
                                   err_msg=mode)

    with pytest.raises(ValueError, match="requires a mesh"):
        MisinformationPredictor(cfg, encoders=enc, text_parallelism="pp")


@pytest.fixture(scope="module")
def sample_image(tmp_path_factory):
    from PIL import Image
    rng = np.random.default_rng(0)
    p = tmp_path_factory.mktemp("img") / "claim.jpg"
    Image.fromarray(rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)).save(p)
    return str(p)


def test_predictor_all_paths_with_images(tiny_predictor, sample_image):
    out = tiny_predictor.evaluate("the claim", sample_image,
                                  "the evidence", sample_image)
    assert set(out) == {"text_text", "text_image", "image_text", "image_image"}
    for v in out.values():
        assert v in (SUPPORT, NEI, REFUTE)


def test_predictor_missing_images_give_none_paths(tiny_predictor):
    out = tiny_predictor.evaluate("claim", None, "evidence", None)
    assert out["text_text"] in (SUPPORT, NEI, REFUTE)
    assert out["text_image"] is None
    assert out["image_text"] is None
    assert out["image_image"] is None


def test_predictor_detailed_probabilities(tiny_predictor, sample_image):
    out = tiny_predictor.evaluate("claim", sample_image, "evidence",
                                  sample_image, detailed=True)
    d = out["text_text"]
    assert set(d) == {"label", "confidence", "probabilities"}
    assert abs(sum(d["probabilities"].values()) - 1.0) < 1e-6
    assert d["confidence"] == max(d["probabilities"].values())


def test_predictor_batch_matches_single(tiny_predictor, sample_image):
    single = tiny_predictor.evaluate("a claim", sample_image, "some evidence",
                                     sample_image)
    batch = tiny_predictor.evaluate_batch(
        ["a claim", "other"], [sample_image, None],
        ["some evidence", "e2"], [sample_image, None])
    assert batch[0] == single


# ----------------------------- eval drivers ----------------------------------

@pytest.fixture(scope="module")
def eval_store(tmp_path_factory):
    from mmd_tpu.data.store import write_store
    from mmd_tpu.data.synthetic import synthetic_preembed_batch
    rng = np.random.default_rng(0)
    b = synthetic_preembed_batch(rng, 20, text_seq=8, image_seq=4,
                                 text_dim=16, image_dim=24)
    return write_store(tmp_path_factory.mktemp("es") / "s", b)


def _tiny_cfg(**kw):
    from mmd_tpu.core.config import ModelConfig
    return ModelConfig(text_input_dim=16, image_input_dim=24, embed_dim=32,
                       num_heads=4, hidden_dim=16, compute_dtype="float32",
                       **kw)


def test_eval_models_multipath(eval_store, tmp_path):
    import jax
    from mmd_tpu.models.fusion import init_fusion_params
    from mmd_tpu.pipelines.eval_models import evaluate_store
    cfg = _tiny_cfg()
    params = init_fusion_params(jax.random.key(0), cfg)
    csv = tmp_path / "results.csv"
    m = evaluate_store(eval_store, cfg, params, batch_size=8,
                       results_csv=str(csv))
    assert "text_text/accuracy" in m and "unified/micro_f1" in m
    assert csv.exists()
    lines = csv.read_text().strip().splitlines()
    assert len(lines) == 6  # header + 4 paths + unified


def test_eval_factify(eval_store, tmp_path):
    import jax
    from mmd_tpu.models.fusion import init_fusion_params
    from mmd_tpu.pipelines.eval_factify import evaluate_factify
    cfg = _tiny_cfg(factify=True, num_classes=5)
    params = init_fusion_params(jax.random.key(1), cfg)
    png = tmp_path / "cm.png"
    m = evaluate_factify(eval_store, cfg, params, batch_size=8,
                         confusion_png=str(png))
    assert 0 <= m["accuracy"] <= 1 and 0 <= m["weighted_accuracy"] <= 1
    assert "accuracy/Refute" in m
    assert png.exists()


def test_eval_text_only(eval_store, tmp_path):
    import jax
    from mmd_tpu.models.fusion import init_fusion_params
    from mmd_tpu.pipelines.eval_text import evaluate_text_only
    cfg = _tiny_cfg(text_only=True, num_classes=3)
    params = init_fusion_params(jax.random.key(2), cfg)
    m = evaluate_text_only(eval_store, cfg, params, batch_size=8,
                           results_csv=str(tmp_path / "t.csv"))
    assert "f1/Support" in m and "micro_f1" in m


# ------------------------------ demo pipeline --------------------------------

def test_demo_pipeline_end_to_end(tiny_predictor, sample_image, tmp_path):
    """Text retrieval + batched classification + fused verdict, no network."""
    from mmd_tpu.demo.pipeline import ClaimVerificationPipeline, Evidence
    from mmd_tpu.models import text_encoder as te
    from mmd_tpu.retrieval.text import SemanticSearch, TextCorpus

    docs = ["the vaccine works well", "the team lost the game",
            "markets rallied today"]
    ids = [f"train_{i}" for i in range(3)]
    corpus = TextCorpus(tmp_path / "tc", tiny_predictor.enc.tokenizer,
                        cfg=te.TINY_TEST)
    corpus.encode_corpus(docs, ids, batch_size=4)
    search = SemanticSearch(corpus, [corpus])

    class FakeIndex:
        def get(self, key, default=None):
            i = int(key.split("_")[1])
            return {"text": docs[i], "image": None}
        def text_lookup(self):
            return dict(zip(ids, docs))

    pipe = ClaimVerificationPipeline(
        tiny_predictor, text_search=search, evidence_index=FakeIndex())
    result = pipe.verify("the vaccine works well", top_k=2)
    assert result.final_classification in (SUPPORT, NEI, REFUTE)
    assert len(result.evidences) == 2
    for ev in result.evidences:
        assert ev.classification_result_final in (SUPPORT, NEI, REFUTE)
        assert len(ev.classification_result_all) == 4
