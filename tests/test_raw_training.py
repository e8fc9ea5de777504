"""Raw-path training: raw store build + frozen encoders inside the step."""

import numpy as np
import pytest

from mmd_tpu.core.config import DataConfig, ModelConfig, TrainConfig
from mmd_tpu.data.synthetic import synthetic_factify_tree
from mmd_tpu.training.trainer import Trainer


@pytest.fixture(scope="module")
def raw_setup(tmp_path_factory):
    import os
    import pandas as pd
    from mmd_tpu.models.frozen import load_or_init_frozen
    from mmd_tpu.pipelines.preprocess import preprocess_csv
    from mmd_tpu.pipelines.raw_store import build_raw_store

    root = tmp_path_factory.mktemp("rawtree")
    synthetic_factify_tree(root, n_train=12, n_test=4, seed=9)
    os.environ["MMD_TPU_ROOT"] = str(root)
    try:
        csv = preprocess_csv("train", root)
        df = pd.read_csv(csv)
        texts = df["claim"].astype(str).tolist() + df["evidence"].astype(str).tolist()
        enc = load_or_init_frozen(root / "assets", vocab_texts=texts,
                                  vocab_size=400, tiny=True)
        store = build_raw_store(str(csv), enc.tokenizer, max_length=16,
                                image_size=enc.vit_cfg.image_size,
                                batch_size=8)
        yield enc, store
    finally:
        os.environ.pop("MMD_TPU_ROOT", None)


def test_raw_store_columns(raw_setup):
    enc, store = raw_setup
    assert len(store) > 0
    s = store[0]
    assert s["claim_ids"].shape == (16,) and s["claim_ids"].dtype == np.int32
    assert s["claim_image"].shape == (enc.vit_cfg.image_size,
                                      enc.vit_cfg.image_size, 3)
    assert s["claim_image"].dtype == np.uint8
    assert s["labels"].shape == (4,)


def test_encoding_train_step_runs_and_learns(raw_setup, mesh8):
    enc, store = raw_setup
    model = ModelConfig(
        text_input_dim=enc.text_cfg.hidden_size,
        image_input_dim=enc.vit_cfg.hidden_size,
        embed_dim=32, num_heads=4, hidden_dim=16, compute_dtype="float32")
    cfg = TrainConfig(model=model, batch_size=8, lr=3e-3)
    tr = Trainer(cfg, mesh8, encoders=enc)
    state = tr.init()
    cols = ["claim_ids", "claim_mask", "doc_ids", "doc_mask",
            "claim_image", "doc_image", "labels"]
    losses = []
    for epoch in range(6):
        for batch in store.batches(8, shuffle=True, seed=epoch, columns=cols):
            state, aux = tr.train_step(state, tr.shard_batch(batch))
            losses.append(float(np.asarray(aux["loss"])))
    assert np.isfinite(losses).all()
    # fusion head fits the (tiny, fixed) encoder outputs
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_encoding_multi_step_matches_sequential(raw_setup, mesh8):
    """Scan window on the RAW/encoder-in-step path (VERDICT r1 #7): one
    windowed call equals per-step calls, bit-for-bit on params."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mmd_tpu.training.trainer import stack_batches

    enc, store = raw_setup
    model = ModelConfig(
        text_input_dim=enc.text_cfg.hidden_size,
        image_input_dim=enc.vit_cfg.hidden_size,
        embed_dim=32, num_heads=4, hidden_dim=16, compute_dtype="float32",
        dropout=0.0)
    cfg = TrainConfig(model=model, batch_size=8, lr=1e-3, steps_per_call=2)
    tr = Trainer(cfg, mesh8, encoders=enc)
    assert hasattr(tr, "train_window")
    cols = ["claim_ids", "claim_mask", "doc_ids", "doc_mask",
            "claim_image", "doc_image", "labels"]
    batches = list(store.batches(8, columns=cols))[:1] * 2

    s1 = tr.init()
    for b in batches:
        s1, _ = tr.train_step(s1, tr.shard_batch(b))

    s2 = tr.init()
    stacked = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh8, P(None, "data"))),
        stack_batches(batches))
    s2, aux = tr.train_window(s2, stacked)
    assert np.asarray(aux["loss"]).shape == (2,)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    assert int(s1.step) == int(s2.step) == 2


def test_run_training_raw_path_with_window(raw_setup, mesh8, tmp_path):
    """run_training drives the encoder-in-step path through the window,
    including the ragged tail (odd batch count)."""
    from mmd_tpu.training.loop import run_training
    enc, store = raw_setup
    model = ModelConfig(
        text_input_dim=enc.text_cfg.hidden_size,
        image_input_dim=enc.vit_cfg.hidden_size,
        embed_dim=32, num_heads=4, hidden_dim=16, compute_dtype="float32",
        dropout=0.0)
    cfg = TrainConfig(model=model, batch_size=8, lr=1e-3, steps_per_call=2,
                      epochs=1, log_every=2, save_every=0,
                      output_dir=str(tmp_path))
    tr = Trainer(cfg, mesh8, encoders=enc)
    cols = ["claim_ids", "claim_mask", "doc_ids", "doc_mask",
            "claim_image", "doc_image", "labels"]
    batches = list(store.batches(8, columns=cols))[:1] * 3  # ragged tail of 1
    state = run_training(tr, lambda e: iter(batches))
    assert int(state.step) == len(batches)


def test_frozen_encoders_receive_no_updates(raw_setup, mesh8):
    """Gradients flow only into the fusion params; frozen encoder params are
    passed replicated and untouched."""
    enc, store = raw_setup
    before = np.asarray(
        enc.text_params["embeddings"]["word"]).copy()
    model = ModelConfig(
        text_input_dim=enc.text_cfg.hidden_size,
        image_input_dim=enc.vit_cfg.hidden_size,
        embed_dim=32, num_heads=4, hidden_dim=16, compute_dtype="float32")
    tr = Trainer(TrainConfig(model=model, batch_size=8), mesh8, encoders=enc)
    state = tr.init()
    cols = ["claim_ids", "claim_mask", "doc_ids", "doc_mask",
            "claim_image", "doc_image", "labels"]
    batch = next(store.batches(8, columns=cols))
    state, _ = tr.train_step(state, tr.shard_batch(batch))
    np.testing.assert_array_equal(
        before, np.asarray(enc.text_params["embeddings"]["word"]))
