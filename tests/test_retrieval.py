"""Retrieval subsystem: resnet contract, corpora build/search, experiments."""

import json
from pathlib import Path

import jax
import numpy as np
import pytest

from mmd_tpu.models.resnet import (
    RESNET_TEST, ResNetConfig, init_resnet, resnet_features,
)


def test_resnet_feature_contract_tiny(rng):
    import jax.numpy as jnp
    cfg = RESNET_TEST
    params = init_resnet(jax.random.key(0), cfg)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    f = resnet_features(params, x, cfg)
    assert f.shape == (2, cfg.feature_dim)
    assert np.isfinite(np.asarray(f)).all()


def test_resnet50_config_dims():
    assert ResNetConfig().feature_dim == 2048


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory, ):
    from PIL import Image
    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("imgs")
    # pairs of near-identical claim/evidence images per id; low-frequency
    # structured patterns so identity survives the 224px resize
    yy, xx = np.mgrid[0:64, 0:64] / 64.0
    for i in range(6):
        fx, fy = rng.uniform(1, 4, 2)
        phase = rng.uniform(0, 6.28, 3)
        chans = [np.sin(2 * np.pi * (fx * xx + fy * yy) + p) for p in phase]
        base = ((np.stack(chans, -1) * 0.5 + 0.5) * 255).astype(np.uint8)
        Image.fromarray(base).save(d / f"{i}_evidence.jpg")
        noisy = np.clip(base.astype(int) + rng.integers(-3, 4, base.shape), 0, 255)
        Image.fromarray(noisy.astype(np.uint8)).save(d / f"{i}_claim.jpg")
    return d


@pytest.fixture(scope="module")
def image_corpus(image_dir, tmp_path_factory):
    from mmd_tpu.retrieval.image import ImageCorpus
    corpus = ImageCorpus(tmp_path_factory.mktemp("store") / "corpus",
                         cfg=RESNET_TEST)
    paths = sorted(str(p) for p in image_dir.glob("*_evidence.jpg"))
    n = corpus.create_feature_corpus(paths, batch_size=4)
    assert n == 6
    return corpus


def test_image_retrieval_finds_near_duplicate(image_corpus, image_dir):
    results = image_corpus.retrieve_similar_images(
        str(image_dir / "2_claim.jpg"), top_k=3)
    assert len(results) >= 1
    top_path, top_score = results[0]
    assert Path(top_path).name == "2_evidence.jpg"
    assert top_score > 0.99


def test_image_retrieval_experiment_protocol(image_corpus, image_dir, tmp_path):
    from mmd_tpu.retrieval.experiments import image_retrieval_experiment
    queries = sorted(str(p) for p in image_dir.glob("*_claim.jpg"))
    acc = image_retrieval_experiment(
        image_corpus, queries, ks=(1, 2, 5),
        out_file=tmp_path / "img_topk.txt")
    assert acc[1] >= 0.8            # near-duplicates must be found at k=1
    assert acc[1] <= acc[2] <= acc[5] <= 1.0
    assert (tmp_path / "img_topk.txt").exists()


@pytest.fixture(scope="module")
def text_setup(tmp_path_factory):
    from mmd_tpu.data.tokenizer import WordPieceTokenizer
    from mmd_tpu.models import text_encoder as te
    from mmd_tpu.retrieval.text import SemanticSearch, TextCorpus
    docs = [
        "the supreme court ruled on immigration policy today",
        "a new vaccine study shows strong efficacy results",
        "the football team won the championship game",
        "stock markets fell sharply after the announcement",
        "scientists discovered a new species of frog",
        "the senate passed the infrastructure spending bill",
    ]
    ids = [f"train_{i}" for i in range(len(docs))]
    tok = WordPieceTokenizer.train(docs, vocab_size=400)
    d = tmp_path_factory.mktemp("tstore")
    corpus = TextCorpus(d / "train", tok, cfg=te.TINY_TEST)
    corpus.encode_corpus(docs, ids, batch_size=4)
    cross_params = te.init_cross_encoder(jax.random.key(3), corpus.cfg)
    search = SemanticSearch(
        corpus, [corpus],
        cross_encoder_params=cross_params, cross_cfg=corpus.cfg,
        evidence_lookup=dict(zip(ids, docs)), rerank_max_length=64)
    return docs, ids, corpus, search


def test_text_corpus_roundtrip(text_setup):
    docs, ids, corpus, _ = text_setup
    emb, loaded_ids = corpus.load()
    assert emb.shape == (6, corpus.cfg.hidden_size)
    assert loaded_ids == ids


def test_text_search_self_retrieval(text_setup):
    """Querying with a corpus document must retrieve itself at rank 1
    (bi-encoder cosine of identical text = 1)."""
    docs, ids, corpus, _ = text_setup
    from mmd_tpu.retrieval.text import SemanticSearch
    search = SemanticSearch(corpus, [corpus])  # no re-rank
    for i in (0, 3, 5):
        results = search.search(docs[i], top_k=2)
        assert results[0][0] == ids[i], results


def test_text_search_with_rerank_returns_k(text_setup):
    docs, ids, corpus, search = text_setup
    results = search.search(docs[1], top_k=3)
    assert len(results) == 3
    assert all(r[0] in ids for r in results)
    scores = [s for _, s in results]
    assert scores == sorted(scores, reverse=True)


def test_text_experiment_protocol(text_setup, tmp_path):
    from mmd_tpu.retrieval.experiments import text_retrieval_experiment
    docs, ids, corpus, _ = text_setup
    from mmd_tpu.retrieval.text import SemanticSearch
    search = SemanticSearch(corpus, [corpus])
    queries = [(docs[i], ids[i]) for i in range(len(docs))]
    acc = text_retrieval_experiment(search, queries, ks=(1, 5),
                                    out_file=tmp_path / "t.txt")
    assert acc[1] == 1.0  # identical-text queries must self-retrieve


def test_resolve_retrieval_encoders_roundtrip(tmp_path):
    """Converted bi/cross-encoder assets resolve with configs intact; absent
    assets resolve to None (seeded-init fallback)."""
    import dataclasses as dc
    import json

    import jax

    from mmd_tpu.core.checkpoint import save_params
    from mmd_tpu.models import text_encoder as te
    from mmd_tpu.models.transformer import TransformerConfig, init_transformer
    from mmd_tpu.retrieval.text import resolve_retrieval_encoders

    empty = resolve_retrieval_encoders(tmp_path)
    assert empty["bi_params"] is None and empty["cross_params"] is None

    cfg = TransformerConfig(vocab_size=64, hidden_size=16, num_layers=1,
                            num_heads=2, intermediate_size=32,
                            max_position=32, type_vocab_size=0,
                            relative_bias_buckets=8, mpnet_positions=True,
                            pad_token_id=1, compute_dtype="float32")
    save_params(str(tmp_path / "bi_encoder.ckpt"),
                init_transformer(jax.random.key(0), cfg))
    (tmp_path / "bi_encoder_config.json").write_text(
        json.dumps(dc.asdict(cfg), indent=1))
    got = resolve_retrieval_encoders(tmp_path)
    assert got["bi_cfg"].relative_bias_buckets == 8
    assert got["bi_cfg"].mpnet_positions
    assert "rel_bias" in got["bi_params"]


def test_text_corpus_int8_search_matches(text_setup):
    """int8-quantized corpus: self-retrieval still rank-1 and the returned
    ids match the bf16 path on this margin-rich corpus."""
    docs, ids, corpus, _ = text_setup
    from mmd_tpu.retrieval.text import SemanticSearch, TextCorpus

    c8 = TextCorpus(corpus.dir, corpus.tokenizer, cfg=corpus.cfg,
                    params=corpus.params, int8=True)
    search8 = SemanticSearch(c8, [c8])
    search = SemanticSearch(corpus, [corpus])
    for i in (0, 2, 4):
        r8 = search8.search(docs[i], top_k=2)
        r = search.search(docs[i], top_k=2)
        assert r8[0][0] == ids[i], r8
        assert [a for a, _ in r8] == [a for a, _ in r]


def test_image_corpus_int8_near_duplicate(image_corpus, image_dir):
    """ImageCorpus(int8=True) over the already-built store: the near-
    duplicate is still rank-1 (quantization error 1/127 << the margin)."""
    from mmd_tpu.retrieval.image import ImageCorpus

    c8 = ImageCorpus(image_corpus.dir, resnet_params=image_corpus.params,
                     cfg=image_corpus.cfg, int8=True)
    results = c8.retrieve_similar_images(
        str(image_dir / "2_claim.jpg"), top_k=3)
    assert Path(results[0][0]).name == "2_evidence.jpg"
    assert results[0][1] > 0.98
    import pytest as _pt
    with _pt.raises(ValueError, match="single-device"):
        ImageCorpus(image_corpus.dir, cfg=image_corpus.cfg, int8=True,
                    mesh=object())
