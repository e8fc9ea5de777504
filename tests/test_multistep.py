"""Scan-windowed training: multi-step call equals per-step calls."""

import numpy as np
import pytest

from mmd_tpu.core.config import ModelConfig, TrainConfig
from mmd_tpu.data.synthetic import synthetic_preembed_batch
from mmd_tpu.training.trainer import Trainer, make_multi_step, stack_batches


def _cfg(**kw):
    model = ModelConfig(text_input_dim=16, image_input_dim=24, embed_dim=32,
                        num_heads=4, hidden_dim=16, compute_dtype="float32",
                        dropout=0.0)
    return TrainConfig(model=model, batch_size=8, lr=1e-3, **kw)


def test_multi_step_matches_sequential(mesh8, rng):
    import jax
    cfg = _cfg(steps_per_call=3)
    tr = Trainer(cfg, mesh8)
    batches = [synthetic_preembed_batch(rng, 8, text_seq=8, image_seq=4,
                                        text_dim=16, image_dim=24)
               for _ in range(3)]

    # sequential
    s1 = tr.init()
    for b in batches:
        s1, _ = tr.train_step(s1, tr.shard_batch(b))

    # windowed
    from jax.sharding import NamedSharding, PartitionSpec as P
    s2 = tr.init()
    stacked = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh8, P(None, "data"))),
        stack_batches(batches))
    s2, aux = tr.train_window(s2, stacked)
    assert np.asarray(aux["loss"]).shape == (3,)
    assert np.asarray(aux["preds"]).shape == (3, 8, 4)

    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    assert int(s1.step) == int(s2.step) == 3


def test_run_training_validation_and_best_model(mesh8, rng, tmp_path):
    """Per-epoch validation + best-model save (reference train.py:396-428)."""
    from mmd_tpu.core.checkpoint import load_params
    from mmd_tpu.training.loop import run_training
    cfg = _cfg(epochs=3, log_every=2, save_every=0,
               output_dir=str(tmp_path), validate_every_epoch=True,
               save_best=True, best_metric="avg_f1")
    tr = Trainer(cfg, mesh8)
    train = [synthetic_preembed_batch(rng, 8, text_seq=8, image_seq=4,
                                      text_dim=16, image_dim=24)
             for _ in range(3)]
    val = [synthetic_preembed_batch(rng, 8, text_seq=8, image_seq=4,
                                    text_dim=16, image_dim=24)]
    state = run_training(tr, lambda e: iter(train), lambda: iter(val))
    best_dir = tmp_path / "best_model"
    assert best_dir.exists()
    params = load_params(str(best_dir))
    import jax
    assert len(jax.tree_util.tree_leaves(params)) == len(
        jax.tree_util.tree_leaves(state.params))
    # metrics.jsonl carries val rows
    lines = (tmp_path / "metrics.jsonl").read_text().strip().splitlines()
    assert any('"val/avg_f1"' in l for l in lines)


def test_run_training_with_window(mesh8, rng, tmp_path):
    from mmd_tpu.training.loop import run_training
    cfg = _cfg(steps_per_call=2, epochs=2, log_every=2, save_every=0,
               output_dir=str(tmp_path))
    tr = Trainer(cfg, mesh8)
    batches = [synthetic_preembed_batch(rng, 8, text_seq=8, image_seq=4,
                                        text_dim=16, image_dim=24)
               for _ in range(5)]   # odd count -> ragged tail per epoch

    state = run_training(tr, lambda e: iter(batches))
    assert int(state.step) == 10
    assert (tmp_path / "metrics.jsonl").exists()
