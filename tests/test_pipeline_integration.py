"""End-to-end slice over a synthetic Factify tree:
raw TSV -> preprocess -> embed (tiny encoders) -> train steps -> eval."""

import os

import numpy as np
import pytest

from mmd_tpu.data.store import ArrayStore
from mmd_tpu.data.synthetic import synthetic_factify_tree


@pytest.fixture(scope="module")
def factify_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("factify")
    synthetic_factify_tree(root, n_train=16, n_test=8, seed=1)
    os.environ["MMD_TPU_ROOT"] = str(root)
    yield root
    os.environ.pop("MMD_TPU_ROOT", None)


@pytest.fixture(scope="module")
def preprocessed(factify_root):
    from mmd_tpu.pipelines.preprocess import preprocess_csv
    train_csv = preprocess_csv("train", factify_root)
    test_csv = preprocess_csv("test", factify_root)
    assert train_csv and test_csv
    return train_csv, test_csv


def test_preprocess_schema(preprocessed, factify_root):
    import pandas as pd
    df = pd.read_csv(preprocessed[0])
    for col in ["id", "claim", "evidence", "category",
                "claim_image_original", "evidence_image_original",
                "claim_image", "evidence_image"]:
        assert col in df.columns, col
    # local paths point at existing files; missing downloads are None/NaN
    present = df["claim_image"].dropna()
    assert len(present) > 0
    for p in present:
        assert (factify_root / p).exists()


@pytest.fixture(scope="module")
def embedded(preprocessed, factify_root):
    import pandas as pd
    from mmd_tpu.models.frozen import load_or_init_frozen
    from mmd_tpu.pipelines.embed import embed_csv
    train_csv, test_csv = preprocessed
    df = pd.read_csv(train_csv)
    texts = df["claim"].astype(str).tolist() + df["evidence"].astype(str).tolist()
    enc = load_or_init_frozen(factify_root / "assets", vocab_texts=texts,
                              vocab_size=512, tiny=True)
    train_store = embed_csv(str(train_csv), enc, batch_size=8)
    test_store = embed_csv(str(test_csv), enc, batch_size=8)
    return enc, train_store, test_store


def test_embed_store_contract(embedded):
    enc, train_store, _ = embedded
    assert len(train_store) > 0
    s = train_store[0]
    assert s["claim_text_embeds"].shape == (512, enc.text_cfg.hidden_size)
    assert s["claim_image_embeds"].shape == (enc.vit_cfg.num_tokens,
                                             enc.vit_cfg.hidden_size)
    assert s["labels"].shape == (4,)
    assert s["claim_text_embeds"].dtype == np.float16
    assert np.isfinite(s["claim_text_embeds"].astype(np.float32)).all()
    # rows with missing images were skipped (synthetic tree drops ~15%)
    assert len(train_store) <= 16


def test_embed_deterministic_resume(embedded, preprocessed, factify_root):
    """Re-running embed over an existing complete store is a no-op."""
    import pandas as pd
    from mmd_tpu.models.frozen import load_or_init_frozen
    from mmd_tpu.pipelines.embed import embed_csv, store_path_for_csv
    enc0, train_store, _ = embedded
    enc = load_or_init_frozen(factify_root / "assets", tiny=True)
    before = train_store.col("claim_text_embeds").copy()
    store2 = embed_csv(str(preprocessed[0]), enc, batch_size=8)
    np.testing.assert_array_equal(before, store2.col("claim_text_embeds"))


def test_train_on_embedded_store(embedded, mesh8):
    from mmd_tpu.core.config import DataConfig, ModelConfig, TrainConfig
    from mmd_tpu.training.trainer import Trainer
    enc, train_store, _ = embedded
    model = ModelConfig(
        text_input_dim=enc.text_cfg.hidden_size,
        image_input_dim=enc.vit_cfg.hidden_size,
        embed_dim=32, num_heads=4, hidden_dim=16, compute_dtype="float32")
    cfg = TrainConfig(model=model, batch_size=8, lr=1e-3)
    tr = Trainer(cfg, mesh8)
    state = tr.init()
    losses = []
    for epoch in range(4):
        for batch in train_store.batches(8, shuffle=True, seed=epoch):
            batch = {k: v for k, v in batch.items() if k != "id"}
            state, aux = tr.train_step(state, tr.shard_batch(batch))
            losses.append(float(np.asarray(aux["loss"])))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] + 0.5  # sanity: not diverging
