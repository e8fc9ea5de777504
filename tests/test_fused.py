"""Fused device-centric pipeline (pipelines/fused.py): bank ingest parity
with the raw store, caption overlap hooks, on-device batch-gather training
equality with the plain raw step, streaming eval, and bank-built corpora."""

import os

import numpy as np
import pytest

from mmd_tpu.data.synthetic import synthetic_factify_tree


@pytest.fixture(scope="module")
def froot(tmp_path_factory):
    root = tmp_path_factory.mktemp("fused_factify")
    synthetic_factify_tree(root, n_train=24, n_test=8, seed=3)
    os.environ["MMD_TPU_ROOT"] = str(root)
    yield root
    os.environ.pop("MMD_TPU_ROOT", None)


@pytest.fixture(scope="module")
def setup(froot):
    import pandas as pd

    from mmd_tpu.models.frozen import load_or_init_frozen
    from mmd_tpu.pipelines.preprocess import preprocess_csv

    train_csv = preprocess_csv("train", froot)
    test_csv = preprocess_csv("test", froot)
    df = pd.read_csv(train_csv)
    texts = df["claim"].astype(str).tolist() + df["evidence"].astype(str).tolist()
    enc = load_or_init_frozen(froot / "assets", vocab_texts=texts,
                              vocab_size=512, tiny=True)
    return train_csv, test_csv, enc


@pytest.fixture(scope="module")
def bank(setup, froot):
    from mmd_tpu.pipelines.fused import ingest_split

    train_csv, _, enc = setup
    return ingest_split(train_csv, enc, image_size=enc.vit_cfg.image_size,
                        chunk=8, root=froot)


def test_ingest_matches_raw_store(setup, bank, froot):
    """Bank rows == pipelines/raw_store.py rows (same tokenize, same
    decode, same skip-and-count), modulo the capacity padding."""
    from mmd_tpu.pipelines.raw_store import build_raw_store

    train_csv, _, enc = setup
    store = build_raw_store(str(train_csv), enc.tokenizer,
                            image_size=enc.vit_cfg.image_size, batch_size=8,
                            store_path=str(froot / "rawref.store"))
    assert bank.n == len(store)
    assert bank.skipped + bank.n == 24
    for col in ("claim_ids", "doc_mask", "claim_image", "doc_image",
                "labels"):
        ref = store.col(col)[:]
        got = np.asarray(bank.data[col])[:bank.n]
        np.testing.assert_array_equal(got, ref, err_msg=col)
    np.testing.assert_array_equal(bank.ids, store.col("id")[:])


def test_bank_window_equals_plain_raw_steps(setup, bank):
    """K scanned bank-gather steps == K sequential raw steps on the same
    host batches (the on-device jnp.take gather changes nothing). Fused is
    single-device by design, so a 1-device mesh (the banks live in one
    chip's HBM)."""
    import jax
    import jax.numpy as jnp

    from mmd_tpu.core.config import DataConfig, ModelConfig, TrainConfig
    from mmd_tpu.core.mesh import make_mesh
    from mmd_tpu.pipelines.fused import BANK_COLS, make_bank_window
    from mmd_tpu.training.trainer import Trainer

    mesh1 = make_mesh(jax.devices()[:1])
    _, _, enc = setup
    model = ModelConfig(
        text_input_dim=enc.text_cfg.hidden_size,
        image_input_dim=enc.vit_cfg.hidden_size,
        embed_dim=32, num_heads=4, hidden_dim=16, dropout=0.0,
        compute_dtype="float32")
    cfg = TrainConfig(model=model, batch_size=4, lr=1e-3, epochs=1,
                      save_every=0, prefetch_depth=0,
                      data=DataConfig(text_seq_len=512, image_seq_len=64))
    trainer = Trainer(cfg, mesh1, encoders=enc)
    state0 = trainer.init()

    k, b = 2, 4
    idx = np.arange(k * b, dtype=np.int32).reshape(k, b) % bank.n
    window = make_bank_window(cfg, enc, k)
    frozen = {"text": enc.text_params, "vit": enc.vit_params}
    sw, auxw = window(state0, frozen, bank.data, jnp.asarray(idx))

    state = trainer.init()
    host = {c: np.asarray(bank.data[c])[:bank.n] for c in BANK_COLS}
    for step in range(k):
        batch = {c: host[c][idx[step]] for c in BANK_COLS}
        state, aux = trainer.train_step(state, trainer.shard_batch(batch))
        np.testing.assert_allclose(
            float(np.asarray(auxw["loss"])[step]),
            float(np.asarray(aux["loss"])), rtol=1e-5, atol=1e-6)
    for a, bb in zip(__import__("jax").tree_util.tree_leaves(sw.params),
                     __import__("jax").tree_util.tree_leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=2e-5, atol=1e-6)


def test_caption_hook_and_enriched_csv(setup, froot):
    import pandas as pd

    from mmd_tpu.models.captioner import CAPTIONER_TEST
    from mmd_tpu.pipelines.caption import CaptionEngine
    from mmd_tpu.pipelines.fused import (BankCaptioner, ingest_split,
                                         write_enriched_csv)

    train_csv, _, enc = setup
    engine = CaptionEngine(enc.tokenizer, cfg=CAPTIONER_TEST, batch_size=4)
    capt = BankCaptioner(engine, batch=4,
                         bank_image_size=enc.vit_cfg.image_size)
    bank2 = ingest_split(train_csv, enc, image_size=enc.vit_cfg.image_size,
                         chunk=8, keep_images=False,
                         on_chunk=capt.on_chunk, root=froot)
    assert "claim_image" not in bank2.data          # streamed, not banked
    cc, dc = capt.collect(bank2.n)
    assert len(cc) == bank2.n == len(dc)
    # dispatch_bank over the image-banked split produces the SAME captions
    # as the streaming on_chunk hook (same images, same engine)
    from mmd_tpu.pipelines.fused import ingest_split as _ing
    bank3 = _ing(train_csv, enc, image_size=enc.vit_cfg.image_size,
                 chunk=8, root=froot)
    capt2 = BankCaptioner(engine, batch=4,
                          bank_image_size=enc.vit_cfg.image_size)
    capt2.dispatch_bank(bank3)
    cc2, dc2 = capt2.collect(bank3.n)
    assert cc2 == cc and dc2 == dc

    out = write_enriched_csv(pd.read_csv(train_csv), bank2.ids, cc, dc,
                             froot / "train_enriched_fused.csv")
    df = pd.read_csv(out)
    banked = df["id"].isin(set(map(int, bank2.ids)))
    assert df.loc[banked, "claim_enriched"].notna().all()
    assert df.loc[~banked, "evidence_image_caption"].isna().all()


def test_streaming_eval_metrics(setup, froot):
    import jax

    from mmd_tpu.core.config import ModelConfig
    from mmd_tpu.models.fusion import init_fusion_params
    from mmd_tpu.pipelines.fused import (evaluate_from_bank,
                                         evaluate_streaming, ingest_split)

    _, test_csv, enc = setup
    model = ModelConfig(
        text_input_dim=enc.text_cfg.hidden_size,
        image_input_dim=enc.vit_cfg.hidden_size,
        embed_dim=32, num_heads=4, hidden_dim=16, compute_dtype="float32")
    params = init_fusion_params(jax.random.key(0), model)
    metrics = evaluate_streaming(
        test_csv, enc, model, params, batch_size=4,
        image_size=enc.vit_cfg.image_size,
        results_csv=str(froot / "eval_fused.csv"), root=froot)
    assert "unified/accuracy" in metrics
    assert (froot / "eval_fused.csv").exists()
    # banked eval == streaming eval (identical forwards, wrapped-tail drop)
    tb = ingest_split(test_csv, enc, image_size=enc.vit_cfg.image_size,
                      chunk=4, root=froot)
    metrics_b = evaluate_from_bank(tb, enc, model, params, batch_size=4)
    for key in ("unified/accuracy", "unified/micro_f1"):
        assert abs(metrics_b[key] - metrics[key]) < 1e-9, key


def test_image_corpus_from_bank(setup, bank, froot):
    from mmd_tpu.pipelines.fused import build_image_corpus_from_bank

    corpus = build_image_corpus_from_bank(bank, froot, tiny=True, batch=4)
    assert len(corpus) == bank.n
    assert len(corpus._ids) == bank.n
    # ids are the original evidence image paths (demo lookup contract)
    assert all(str(p).endswith(".jpg") for p in corpus._ids)
    hits = corpus.retrieve_similar_images(bank.doc_paths[0], top_k=1)
    assert hits


def test_embed_bank_matches_raw(setup, bank, froot):
    """embed_images banks (frozen vis embeddings instead of raw pixels)
    are numerics-equal to raw-image banks through ingest, the train
    window, and eval — the at-scale fused mode's correctness contract."""
    import jax
    import jax.numpy as jnp

    from mmd_tpu.core.config import ModelConfig, TrainConfig
    from mmd_tpu.core.mesh import make_mesh
    from mmd_tpu.pipelines.fused import (_make_chunk_embed,
                                         evaluate_from_bank, ingest_split,
                                         make_bank_window)
    from mmd_tpu.training.trainer import Trainer

    train_csv, _, enc = setup
    ebank = ingest_split(train_csv, enc, image_size=enc.vit_cfg.image_size,
                         chunk=8, embed_images=True, vis_dtype="float32",
                         root=froot)
    assert "claim_image" not in ebank.data
    assert "doc_image" not in ebank.data
    assert ebank.data["claim_vis"].dtype == jnp.float32
    assert ebank.n == bank.n
    np.testing.assert_array_equal(np.asarray(ebank.data["claim_ids"]),
                                  np.asarray(bank.data["claim_ids"]))

    # vis columns == the frozen encoder over the banked raw images
    embed = _make_chunk_embed(enc, "float32", sub=8)
    for vcol, icol in (("claim_vis", "claim_image"),
                       ("doc_vis", "doc_image")):
        want = np.asarray(embed(enc.vit_params, bank.data[icol][:8]))
        got = np.asarray(ebank.data[vcol][:8])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # train window: embed bank == raw bank (losses AND updated params)
    model = ModelConfig(
        text_input_dim=enc.text_cfg.hidden_size,
        image_input_dim=enc.vit_cfg.hidden_size,
        embed_dim=32, num_heads=4, hidden_dim=16,
        compute_dtype="float32", fused_attn=False)
    cfg = TrainConfig(model=model, batch_size=4, epochs=1, lr=1e-3,
                      output_dir=str(froot / "res_embed"), save_every=0)
    trainer = Trainer(cfg, make_mesh(jax.devices()[:1]), encoders=enc)
    window = make_bank_window(cfg, enc, 2)
    frozen = {"text": enc.text_params, "vit": enc.vit_params}
    idx = jnp.asarray(np.arange(8, dtype=np.int32).reshape(2, 4))
    s_r, aux_r = window(trainer.init(), frozen, bank.data, idx)
    s_e, aux_e = window(trainer.init(), frozen, ebank.data, idx)
    np.testing.assert_allclose(np.asarray(aux_e["loss"]),
                               np.asarray(aux_r["loss"]), rtol=1e-4)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(s_r.params),
            jax.tree_util.tree_leaves_with_path(s_e.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5, err_msg=str(pa))

    # eval: same metrics from either bank
    from mmd_tpu.models.fusion import init_fusion_params
    params = init_fusion_params(jax.random.key(1), model)
    m_r = evaluate_from_bank(bank, enc, model, params, batch_size=4)
    m_e = evaluate_from_bank(ebank, enc, model, params, batch_size=4)
    for key in ("unified/accuracy", "unified/micro_f1"):
        assert abs(m_e[key] - m_r[key]) < 1e-9, key


def test_resnet_feature_hook(setup, bank, froot):
    """Streamed per-chunk ResNet features (the embed_images mode's image
    corpus path) == the banked build_image_corpus_from_bank features."""
    from mmd_tpu.pipelines.fused import (BankResNetFeatures,
                                         build_image_corpus_from_bank)

    _, _, enc = setup
    ref = build_image_corpus_from_bank(bank, froot / "ref_corpus",
                                       tiny=True, batch=4)
    feats = BankResNetFeatures(tiny=True, sub=4)
    for lo in range(0, bank.n, 8):
        feats.on_chunk({"doc": bank.data["doc_image"][lo:lo + 8]},
                       lo, min(8, bank.n - lo))
    hook_corpus = feats.write(bank, froot / "hook_corpus")
    assert len(hook_corpus) == bank.n == len(ref)
    ref._load()
    hook_corpus._load()
    np.testing.assert_allclose(np.asarray(hook_corpus._features, np.float32),
                               np.asarray(ref._features, np.float32),
                               rtol=2e-2, atol=2e-2)
    hits = hook_corpus.retrieve_similar_images(bank.doc_paths[0], top_k=1)
    assert hits
