"""Captioner: scan-decode correctness vs naive loop, loss, pipeline resume."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmd_tpu.models.captioner import (
    CAPTIONER_TEST, caption_loss, generate, init_captioner,
)
from mmd_tpu.models import vit as V
from mmd_tpu.models.transformer import (
    attention_mask_from_ids, causal_mask, embed, encoder_layer,
)


@pytest.fixture(scope="module")
def cap():
    cfg = CAPTIONER_TEST
    params = init_captioner(jax.random.key(0), cfg)
    return cfg, params


def naive_greedy_decode(params, cfg, images, bos, eos, pad, t_max):
    """Oracle: full-sequence re-forward at every step (no KV cache)."""
    from mmd_tpu.models.captioner import _decoder_stack, _lm_logits
    dcfg = cfg.decoder
    enc = V.vit_forward(params["vit"], cfg.vit, images)
    b = images.shape[0]
    seq = np.full((b, 1), bos, np.int32)
    done = np.zeros(b, bool)
    outs = []
    for _ in range(t_max):
        ids = jnp.asarray(seq)
        x = embed(params["decoder"]["embeddings"], dcfg, ids)
        t = ids.shape[1]
        x, _ = _decoder_stack(params, dcfg, x, causal_mask(t), enc, None)
        logits = np.asarray(_lm_logits(params, dcfg, x))[:, -1]
        nxt = logits.argmax(-1).astype(np.int32)
        nxt = np.where(done, pad, nxt)
        done = done | (nxt == eos)
        outs.append(nxt)
        seq = np.concatenate([seq, nxt[:, None]], axis=1)
    return np.stack(outs, axis=1)


def test_kv_cached_decode_matches_naive(cap, rng):
    cfg, params = cap
    images = jnp.asarray(rng.standard_normal(
        (2, cfg.vit.image_size, cfg.vit.image_size, 3)), jnp.float32)
    bos, eos, pad = 2, 3, 0
    fast = np.asarray(generate(params, cfg, images, bos, eos, pad,
                               max_new_tokens=8))
    slow = naive_greedy_decode(params, cfg, images, bos, eos, pad, 8)
    np.testing.assert_array_equal(fast, slow)


def naive_lm_decode(params, cfg, prompt_ids, prompt_mask, eos, pad, t_new):
    """Oracle for lm_generate: full-sequence re-forward each step, no cache,
    no cross-attention (encoder_states=None)."""
    from mmd_tpu.models.captioner import _decoder_stack, _lm_logits
    dcfg = cfg.decoder
    b = prompt_ids.shape[0]
    seq = np.asarray(prompt_ids, np.int32)
    msk = np.asarray(prompt_mask, np.int32)
    done = np.zeros(b, bool)
    outs = []
    for _ in range(t_new):
        ids = jnp.asarray(seq)
        t = ids.shape[1]
        x = embed(params["decoder"]["embeddings"], dcfg, ids)
        mask = causal_mask(t) + attention_mask_from_ids(jnp.asarray(msk), t)
        x, _ = _decoder_stack(params, dcfg, x, mask, None, None)
        logits = np.asarray(_lm_logits(params, dcfg, x))[:, -1]
        nxt = logits.argmax(-1).astype(np.int32)
        nxt = np.where(done, pad, nxt)
        done = done | (nxt == eos)
        outs.append(nxt)
        seq = np.concatenate([seq, nxt[:, None]], axis=1)
        msk = np.concatenate([msk, np.ones((b, 1), np.int32)], axis=1)
    return np.stack(outs, axis=1)


def test_lm_generate_matches_naive(cap, rng):
    """Text-only decode (prompting baselines): KV-cached prefill+scan ==
    full-recompute oracle, with LEFT-padded ragged prompts."""
    from mmd_tpu.models.captioner import lm_generate
    cfg, params = cap
    eos, pad = 3, 0
    plen, t_new = 6, 4
    assert plen + t_new <= cfg.decoder.max_position
    b = 3
    ids = np.full((b, plen), pad, np.int32)
    mask = np.zeros((b, plen), np.int32)
    lens = [6, 4, 2]
    for i, n in enumerate(lens):   # left-padded ragged prompts
        ids[i, plen - n:] = rng.integers(4, cfg.decoder.vocab_size,
                                         size=n)
        mask[i, plen - n:] = 1
    fast = np.asarray(lm_generate(params, cfg, jnp.asarray(ids),
                                  jnp.asarray(mask), eos_id=eos, pad_id=pad,
                                  max_new_tokens=t_new))
    slow = naive_lm_decode(params, cfg, ids, mask, eos, pad, t_new)
    np.testing.assert_array_equal(fast, slow)
    assert fast.shape == (b, t_new)


def test_captioner_llm_wrapper(tmp_path, cap):
    """eval_prompting --llm captioner end to end on seeded weights: prompts
    in, parseable text out, zero-shot protocol produces a report."""
    from mmd_tpu.baselines import prompting as P
    from mmd_tpu.baselines.eval_prompting import make_llm
    from mmd_tpu.data.tokenizer import WordPieceTokenizer

    tok = WordPieceTokenizer.train(
        ["claim text about support", "evidence refutes the statement",
         "not enough information to decide"], vocab_size=120)
    tok.save(tmp_path / "tokenizer.json")
    llm = make_llm("captioner", assets=str(tmp_path))
    text = llm("Claim: the sky is green. Evidence: the sky is blue. Answer:")
    assert isinstance(text, str)
    out = P.evaluate_zero_shot(
        llm, [("the sky is green", "the sky is blue")], [2])
    assert set(out) >= {"accuracy", "weighted_f1"}


def test_lvlm_scorer_two_level_verify(tmp_path, rng):
    """LVLM4FV protocol on the IN-TREE LVLM: yes/no first-token scoring
    (text-only AND image-conditioned), two-level verification, reranking."""
    from PIL import Image
    from mmd_tpu.baselines import prompting as P
    from mmd_tpu.baselines.eval_prompting import make_lvlm_scorer
    from mmd_tpu.data.tokenizer import WordPieceTokenizer

    tok = WordPieceTokenizer.train(
        ["yes no the claim is supported", "evidence refutes everything",
         "answer yes or no please"], vocab_size=120)
    tok.save(tmp_path / "tokenizer.json")
    score = make_lvlm_scorer(str(tmp_path))

    p1 = score("Claim: a. Evidence: b. Answer:")
    assert 0.0 <= p1 <= 1.0

    img = tmp_path / "img.jpg"
    Image.fromarray(rng.integers(0, 255, (32, 32, 3),
                                 dtype=np.uint8)).save(img)
    p2 = score("Claim: a. Evidence: b. Answer:", image_path=str(img))
    assert 0.0 <= p2 <= 1.0
    # the image must actually condition the logits (cross-attention ran)
    assert p1 != p2

    label, votes = P.two_level_verify(score, "a claim", ["ev1", "ev2"])
    assert label in (P.SUPPORT, P.NEI, P.REFUTE) and len(votes) == 2
    order = P.llm_rerank(score, "a claim", ["doc a", "doc b", "doc c"])
    assert sorted(order) == [0, 1, 2]


def test_generate_shapes_and_eos_padding(cap, rng):
    cfg, params = cap
    images = jnp.asarray(rng.standard_normal(
        (3, cfg.vit.image_size, cfg.vit.image_size, 3)), jnp.float32)
    out = np.asarray(generate(params, cfg, images, 2, 3, 0, 8))
    assert out.shape == (3, 8)
    for row in out:
        hit = np.nonzero(row == 3)[0]
        if len(hit):
            assert (row[hit[0] + 1:] == 0).all()  # pad after EOS


def test_caption_loss_decreases_under_training(cap, rng):
    import optax
    cfg, _ = cap
    params = init_captioner(jax.random.key(1), cfg)
    images = jnp.asarray(rng.standard_normal(
        (4, cfg.vit.image_size, cfg.vit.image_size, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(4, cfg.decoder.vocab_size, (4, 8)), jnp.int32)
    mask = jnp.ones((4, 8), jnp.int32)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    grad_fn = jax.jit(jax.value_and_grad(
        lambda p: caption_loss(p, cfg, images, ids, mask)))
    losses = []
    for _ in range(20):
        loss, g = grad_fn(params)
        updates, opt_state = opt.update(g, opt_state)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.5, losses


def test_mixed_encoder_decoder_dims(rng):
    """Decoder cross-attention must project from the ENCODER width (the
    production config is ViT 1024 -> decoder 384)."""
    import dataclasses
    from mmd_tpu.models import vit as V
    from mmd_tpu.models.captioner import CaptionerConfig
    from mmd_tpu.models.transformer import TransformerConfig
    cfg = CaptionerConfig(
        vit=dataclasses.replace(V.VIT_TEST, hidden_size=48, num_heads=4),
        decoder=TransformerConfig(
            vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
            intermediate_size=64, max_position=16, type_vocab_size=0,
            is_decoder=True, encoder_hidden_size=48,
            compute_dtype="float32"),
        max_caption_len=8)
    params = init_captioner(jax.random.key(5), cfg)
    images = jnp.asarray(rng.standard_normal(
        (2, cfg.vit.image_size, cfg.vit.image_size, 3)), jnp.float32)
    out = np.asarray(generate(params, cfg, images, 2, 3, 0, 6))
    assert out.shape == (2, 6)
    # loss path too
    ids = jnp.asarray(rng.integers(4, 64, (2, 8)), jnp.int32)
    loss = caption_loss(params, cfg, images, ids, jnp.ones((2, 8), jnp.int32))
    assert np.isfinite(float(loss))


def test_caption_pipeline_resume(tmp_path, rng):
    import pandas as pd
    from mmd_tpu.data.synthetic import synthetic_factify_tree
    from mmd_tpu.data.tokenizer import WordPieceTokenizer
    from mmd_tpu.pipelines.caption import (
        CaptionEngine, get_last_processed_index, process_csv,
    )
    from mmd_tpu.pipelines.preprocess import preprocess_csv

    synthetic_factify_tree(tmp_path, n_train=6, n_test=2, seed=5)
    preprocess_csv("train", tmp_path)
    tok = WordPieceTokenizer.train(["a b c d claim evidence"], 200)
    engine = CaptionEngine(tok, cfg=CAPTIONER_TEST, batch_size=4)

    out = process_csv("train", engine, tmp_path, save_every=4)
    df = pd.read_csv(out)
    assert {"claim_image_caption", "evidence_image_caption",
            "claim_enriched", "evidence_enriched"} <= set(df.columns)
    # enrichment contract: f"{claim}. {caption}" when captioned
    row = df[df["claim_image_caption"].notna()
             & (df["claim_image_caption"] != "")].head(1)
    if len(row):
        r = row.iloc[0]
        assert r["claim_enriched"].startswith(str(r["claim"]))
    assert get_last_processed_index(df) == len(df) - 1

    # Resume over a complete file is a fast no-op
    out2 = process_csv("train", engine, tmp_path)
    df2 = pd.read_csv(out2)
    pd.testing.assert_frame_equal(df, df2)
