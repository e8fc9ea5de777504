"""Baselines: FakeNet forward/training, ensemble search, prompting protocols."""

import jax
import numpy as np
import pytest

from mmd_tpu.baselines import prompting as P
from mmd_tpu.baselines.fakenet import FAKENET_TEST, fakenet_forward, init_fakenet


def _batch(rng, cfg, b=8, lt=6, li=4):
    return {
        "claim_text_embeds": rng.standard_normal((b, lt, cfg.text_dim)).astype(np.float32),
        "doc_text_embeds": rng.standard_normal((b, lt, cfg.text_dim)).astype(np.float32),
        "claim_image_embeds": rng.standard_normal((b, li, cfg.image_dim)).astype(np.float32),
        "doc_image_embeds": rng.standard_normal((b, li, cfg.image_dim)).astype(np.float32),
        "add_feature": rng.standard_normal((b, cfg.add_feature_dim)).astype(np.float32),
        "category": rng.integers(0, 5, b).astype(np.int32),
    }


def test_fakenet_forward_contract(rng):
    cfg = FAKENET_TEST
    params = init_fakenet(jax.random.key(0), cfg)
    b = _batch(rng, cfg)
    logits, emb = fakenet_forward(
        params, cfg, b["claim_text_embeds"], b["claim_image_embeds"],
        b["doc_text_embeds"], b["doc_image_embeds"], b["add_feature"])
    assert logits.shape == (8, 5)
    assert emb.shape == (8, 16 + cfg.hidden_dim)
    assert np.isfinite(np.asarray(logits)).all()


def test_fakenet_trains(rng):
    from mmd_tpu.baselines.fakenet_train import train_fakenet
    cfg = FAKENET_TEST
    # plant signal: category shifts the claim text mean
    batches = []
    for _ in range(4):
        b = _batch(rng, cfg, b=16)
        b["claim_text_embeds"] += (b["category"][:, None, None] - 2) * 0.8
        batches.append(b)
    params, history = train_fakenet(
        cfg, lambda e: iter(batches), epochs=6, lr=3e-4, warmup_steps=4)
    assert history[-1]["weighted_f1"] > history[0]["weighted_f1"]
    assert history[-1]["loss"] < history[0]["loss"]


def test_ensemble_grid_search(rng):
    from mmd_tpu.baselines.fakenet_train import ensemble_grid_search
    y = rng.integers(0, 5, 100)
    good = np.full((100, 5), 0.1)
    good[np.arange(100), y] = 0.9                        # near-perfect model
    bad = rng.dirichlet(np.ones(5), 100)                 # noise model
    cfg, f1 = ensemble_grid_search([bad, good], y)
    assert f1 > 0.95
    assert cfg["weights"][1] > 0                          # good model selected


def test_parse_label_keywords():
    assert P.parse_label("The evidence supports the claim.") == P.SUPPORT
    assert P.parse_label("This is false and refuted.") == P.REFUTE
    assert P.parse_label("There is not enough information.") == P.NEI
    assert P.parse_label("hmm unclear") == P.NEI
    assert P.parse_label("it supports but also refutes") == P.NEI


def test_zero_shot_eval_with_fake_llm():
    def oracle_llm(prompt):
        if "sky is blue" in prompt:
            return " support"
        if "pigs fly" in prompt:
            return " refute, false"
        return " not enough information"
    pairs = [("sky is blue", "e"), ("pigs fly", "e"), ("quantum", "e")]
    out = P.evaluate_zero_shot(oracle_llm, pairs, [0, 2, 1])
    assert out["accuracy"] == 1.0 and out["micro_f1"] == 1.0


def test_yes_no_probability():
    assert P.yes_no_probability({"yes": 2.0, "no": 0.0}) == pytest.approx(
        1 / (1 + np.exp(-2)))
    assert P.yes_no_probability({"yes": 0.0, "no": 0.0}) == 0.5


def test_two_level_verify_majority():
    def score(prompt):
        if "enough information" in prompt:
            return 0.9 if "docA" in prompt or "docB" in prompt else 0.1
        return 0.9 if "docA" in prompt else 0.2
    label, votes = P.two_level_verify(score, "claim", ["docA", "docB", "docC"])
    assert votes == [P.SUPPORT, P.REFUTE, P.NEI]
    assert label == P.NEI  # 1 support vs 1 refute -> tie -> NEI
    label2, _ = P.two_level_verify(score, "claim", ["docA", "docA", "docB"])
    assert label2 == P.SUPPORT


def test_llm_rerank_orders_by_score():
    order = P.llm_rerank(lambda p: 0.9 if "GOODDOC" in p else 0.1,
                         "claim", ["junk", "GOODDOC text", "noise"])
    assert order[0] == 1


def test_retrieval_metrics():
    retrieved = ["a", "b", "c", "d"]
    relevant = {"b", "d"}
    assert P.precision_at_k(retrieved, relevant, 2) == 0.5
    assert P.recall_at_k(retrieved, relevant, 2) == 0.5
    assert P.recall_at_k(retrieved, relevant, 4) == 1.0
    # AP@4: hits at ranks 2 (1/2) and 4 (2/4) -> (0.5+0.5)/2 = 0.5
    assert P.average_precision_at_k(retrieved, relevant, 4) == pytest.approx(0.5)
    assert P.map_at_k([retrieved], [relevant], 4) == pytest.approx(0.5)
