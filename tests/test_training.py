"""DP train step over the 8-device CPU mesh: loss decreases, checkpoint
round-trips, eval metrics flow."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmd_tpu.core.config import DataConfig, ModelConfig, TrainConfig
from mmd_tpu.data.synthetic import synthetic_preembed_batch
from mmd_tpu.training.trainer import Trainer, TrainState


def small_cfg(**model_kw):
    model = ModelConfig(
        text_input_dim=16, image_input_dim=24, embed_dim=32, num_heads=4,
        hidden_dim=16, compute_dtype="float32", **model_kw)
    return TrainConfig(model=model, batch_size=16, lr=1e-3,
                       data=DataConfig(text_seq_len=8, image_seq_len=4))


def small_batch(rng, b=16):
    return synthetic_preembed_batch(
        rng, batch_size=b, text_seq=8, image_seq=4, text_dim=16, image_dim=24)


def test_train_step_loss_decreases(mesh8, rng):
    cfg = small_cfg()
    tr = Trainer(cfg, mesh8)
    state = tr.init()
    losses = []
    for i in range(30):
        batch = tr.shard_batch(small_batch(rng))
        state, aux = tr.train_step(state, batch)
        losses.append(float(np.asarray(aux["loss"])))
    # 4-path CE at chance is 4*ln(3) ~ 4.39; must fit the planted signal
    assert losses[0] > 3.0
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) - 0.3, losses


def test_train_step_batch_is_sharded(mesh8, rng):
    cfg = small_cfg()
    tr = Trainer(cfg, mesh8)
    batch = tr.shard_batch(small_batch(rng))
    shard_counts = {len(v.sharding.device_set) for v in batch.values()}
    assert shard_counts == {8}
    state = tr.init()
    assert len(state.params["representation"]["text_proj"]["w"].sharding.device_set) == 8


def test_preds_and_labels_shapes(mesh8, rng):
    cfg = small_cfg()
    tr = Trainer(cfg, mesh8)
    state = tr.init()
    batch = tr.shard_batch(small_batch(rng))
    state, aux = tr.train_step(state, batch)
    assert np.asarray(aux["preds"]).shape == (16, 4)
    assert np.asarray(aux["labels"]).shape == (16, 4)
    assert set(np.unique(np.asarray(aux["preds"]))) <= {0, 1, 2}


def test_factify_mode_train_step(mesh8, rng):
    cfg = small_cfg(factify=True, num_classes=5)
    tr = Trainer(cfg, mesh8)
    state = tr.init()
    batch = small_batch(rng)
    batch["labels"] = rng.integers(0, 5, size=16).astype(np.int32)
    state, aux = tr.train_step(state, tr.shard_batch(batch))
    assert np.asarray(aux["preds"]).shape == (16, 1)


def test_factify_training_from_path_labels(mesh8, rng):
    """Stores carry (B, 4) path labels; factify mode derives the 5-way
    target on device via the inverse table."""
    from mmd_tpu.data import labels as lb
    cfg = small_cfg(factify=True, num_classes=5)
    tr = Trainer(cfg, mesh8)
    state = tr.init()
    batch = small_batch(rng)           # labels are (16, 4)
    assert batch["labels"].shape == (16, 4)
    state, aux = tr.train_step(state, tr.shard_batch(batch))
    got = np.asarray(aux["labels"])[:, 0]
    want = lb.paths_to_category_idx(batch["labels"])
    np.testing.assert_array_equal(got, np.where(want >= 0, want, 2))


def test_text_only_training_from_path_labels(mesh8, rng):
    cfg = small_cfg(text_only=True, num_classes=3)
    tr = Trainer(cfg, mesh8)
    state = tr.init()
    batch = small_batch(rng)
    state, aux = tr.train_step(state, tr.shard_batch(batch))
    labels = np.asarray(aux["labels"])[:, 0]
    assert set(np.unique(labels)) <= {0, 1, 2}


def test_checkpoint_roundtrip(mesh8, rng, tmp_path):
    from mmd_tpu.core.checkpoint import CheckpointManager
    cfg = small_cfg()
    tr = Trainer(cfg, mesh8)
    state = tr.init()
    batch = tr.shard_batch(small_batch(rng))
    state, _ = tr.train_step(state, batch)

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(int(state.step), tuple(state), wait=True)

    state2 = TrainState(*mgr.restore(template=tuple(tr.init())))
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Resumed training continues bit-exact: same next step from both states
    s1, _ = tr.train_step(state, batch)
    state2 = jax.device_put(state2, state.step.sharding)
    s2, _ = tr.train_step(state2, batch)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_zero3_checkpoint_resume_bit_exact(mesh8, rng, tmp_path):
    """Checkpoint/resume of a ZeRO-3-sharded TrainState: orbax saves the
    global arrays off the 1/8-per-rank shards, and restoring into the
    sharded template brings them back PHYSICALLY sharded — continued
    training is bit-exact vs the uninterrupted run."""
    from mmd_tpu.core.checkpoint import CheckpointManager

    cfg = small_cfg()
    b1, b2 = small_batch(np.random.default_rng(1)), small_batch(
        np.random.default_rng(2))

    tr = Trainer(cfg, mesh8, zero3=True)
    state = tr.init()
    state, _ = tr.train_step(state, tr.shard_batch(b1))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(int(state.step), tuple(state), wait=True)

    # uninterrupted continuation
    s_direct, _ = tr.train_step(state, tr.shard_batch(b2))

    # resume in a FRESH ZeRO-3 trainer: restore into the sharded template
    tr2 = Trainer(cfg, mesh8, zero3=True)
    state2 = TrainState(*mgr.restore(template=tuple(tr2.init())))
    w = state2.params["representation"]["text_WQ"]["w"]
    assert w.sharding.spec[0] == "data", w.sharding          # still 1/8
    assert w.addressable_shards[0].data.shape[0] == w.shape[0] // 8
    s_resumed, _ = tr2.train_step(state2, tr2.shard_batch(b2))

    for a, b in zip(jax.tree_util.tree_leaves(s_direct.params),
                    jax.tree_util.tree_leaves(s_resumed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_eval_loop_and_metrics(mesh8, rng):
    from mmd_tpu.training.loop import evaluate
    cfg = small_cfg()
    tr = Trainer(cfg, mesh8)
    state = tr.init()
    batches = [small_batch(rng) for _ in range(3)]
    logs = evaluate(tr, state, iter(batches), cfg.model.num_classes)
    assert "val/loss" in logs and "val/avg_f1" in logs
    assert 0.0 <= logs["val/avg_f1"] <= 1.0


def test_grad_accumulation_matches_full_batch(mesh8, rng):
    """accum_steps=2/4 (micro-batched grads, one update) equals the
    full-batch gradient up to fp reassociation (dropout off). Params are
    NOT compared post-AdamW — near-zero grads make mhat/sqrt(vhat) amplify
    reassociation noise to update scale (see CLAUDE.md / test_tp.py);
    grads, loss, and the aux contract are the semantic claim."""
    import dataclasses

    import jax.numpy as jnp

    from mmd_tpu.training.trainer import _accum_grads, _loss_fn, init_state

    cfg = dataclasses.replace(small_cfg(dropout=0.0), accum_steps=1)
    batch = {k: jnp.asarray(v) for k, v in small_batch(rng).items()}
    params = init_state(cfg, jax.random.key(0)).params
    rng_key = jax.random.key(1)

    grad_fn = lambda p, mb, r: jax.value_and_grad(_loss_fn, has_aux=True)(
        p, cfg.model, mb, r)
    (l_full, aux_full), g_full = jax.jit(grad_fn)(params, batch, rng_key)

    for k in (2, 4):
        g_acc, aux = jax.jit(lambda p, b, r: _accum_grads(
            grad_fn, p, b, r, k))(params, batch, rng_key)
        np.testing.assert_allclose(float(np.asarray(aux["loss"])),
                                   float(np.asarray(l_full)), rtol=2e-6)
        assert aux["preds"].shape == aux_full["preds"].shape
        assert aux["labels"].shape == aux_full["labels"].shape
        # preds/labels stay PAIRED through the interleaved reorder
        np.testing.assert_array_equal(
            np.sort(np.asarray(aux["labels"]), axis=0),
            np.sort(np.asarray(aux_full["labels"]), axis=0))
        for (pa, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(g_full),
                jax.tree_util.tree_leaves_with_path(g_acc)):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            tol = 2e-5 * np.abs(a).max() + 1e-7
            assert np.abs(a - b).max() <= tol, (k, pa, np.abs(a - b).max())


def test_grad_accumulation_trains_and_raw_path(mesh8, rng):
    """Trainer-level accumulation: the pre-embedded step trains down and
    the raw encoder-in-step path (encoders run per micro-batch) produces
    the same loss as accum=1."""
    import dataclasses

    from mmd_tpu.models import text_encoder as te
    from mmd_tpu.models import vit as V
    from mmd_tpu.models.frozen import FrozenEncoders

    cfg = dataclasses.replace(small_cfg(), accum_steps=4)
    tr = Trainer(cfg, mesh8)
    state = tr.init()
    losses = []
    for i in range(12):
        state, aux = tr.train_step(state, tr.shard_batch(small_batch(rng)))
        losses.append(float(np.asarray(aux["loss"])))
    assert np.mean(losses[-3:]) < losses[0], losses

    tcfg = dataclasses.replace(te.TINY_TEST, vocab_size=128, dropout=0.0)
    vcfg = V.VIT_TEST
    enc = FrozenEncoders(
        tokenizer=None, text_cfg=tcfg,
        text_params=te.init_text_encoder(jax.random.key(4), tcfg),
        vit_cfg=vcfg, vit_params=V.init_vit(jax.random.key(5), vcfg))
    model = ModelConfig(
        text_input_dim=tcfg.hidden_size, image_input_dim=vcfg.hidden_size,
        embed_dim=32, num_heads=4, hidden_dim=16, compute_dtype="float32",
        dropout=0.0)
    rr = np.random.default_rng(9)
    B = 16
    batch = {
        "claim_ids": rr.integers(1, 100, (B, 16)).astype(np.int32),
        "claim_mask": np.ones((B, 16), np.int32),
        "doc_ids": rr.integers(1, 100, (B, 16)).astype(np.int32),
        "doc_mask": np.ones((B, 16), np.int32),
        "claim_image": rr.integers(0, 255, (B, 32, 32, 3)).astype(np.uint8),
        "doc_image": rr.integers(0, 255, (B, 32, 32, 3)).astype(np.uint8),
        "labels": np.stack([np.array([0, 1, 2, 1], np.int32)] * B),
    }

    def run(accum):
        c = TrainConfig(model=model, batch_size=B, accum_steps=accum,
                        data=DataConfig(text_seq_len=16, image_seq_len=16))
        t = Trainer(c, mesh8, encoders=enc)
        _, aux = t.train_step(t.init(seed=0), t.shard_batch(batch))
        return float(np.asarray(aux["loss"]))

    np.testing.assert_allclose(run(2), run(1), rtol=2e-6)


def test_accum_steps_validates_divisibility(mesh8):
    import dataclasses
    with pytest.raises(ValueError, match="accum_steps"):
        Trainer(dataclasses.replace(small_cfg(), accum_steps=3), mesh8)


def test_finetune_encoders_end_to_end(mesh8, rng):
    """finetune=True: encoder params join the trainable state — grads
    reach them (params actually move), loss decreases over steps, and
    ZeRO-3 composes (joint state sharded 1/8 per rank)."""
    import dataclasses

    from mmd_tpu.models import text_encoder as te
    from mmd_tpu.models import vit as V
    from mmd_tpu.models.frozen import FrozenEncoders

    tcfg = dataclasses.replace(te.TINY_TEST, vocab_size=128, dropout=0.0)
    vcfg = V.VIT_TEST
    enc = FrozenEncoders(
        tokenizer=None, text_cfg=tcfg,
        text_params=te.init_text_encoder(jax.random.key(4), tcfg),
        vit_cfg=vcfg, vit_params=V.init_vit(jax.random.key(5), vcfg))
    model = ModelConfig(
        text_input_dim=tcfg.hidden_size, image_input_dim=vcfg.hidden_size,
        embed_dim=32, num_heads=4, hidden_dim=16, compute_dtype="float32",
        dropout=0.0)
    cfg = TrainConfig(model=model, batch_size=16, lr=1e-3,
                      data=DataConfig(text_seq_len=16, image_seq_len=16))
    rr = np.random.default_rng(11)
    B = 16

    def batch():
        return {
            "claim_ids": rr.integers(1, 100, (B, 16)).astype(np.int32),
            "claim_mask": np.ones((B, 16), np.int32),
            "doc_ids": rr.integers(1, 100, (B, 16)).astype(np.int32),
            "doc_mask": np.ones((B, 16), np.int32),
            "claim_image": rr.integers(0, 255, (B, 32, 32, 3)).astype(np.uint8),
            "doc_image": rr.integers(0, 255, (B, 32, 32, 3)).astype(np.uint8),
            "labels": np.stack([np.array([0, 1, 2, 1], np.int32)] * B),
        }

    tr = Trainer(cfg, mesh8, encoders=enc, finetune=True)
    state = tr.init(seed=0)
    w0 = np.asarray(state.params["text"]["layers"][0]["q"]["w"]).copy()
    losses = []
    for _ in range(6):
        state, aux = tr.train_step(state, tr.shard_batch(batch()))
        losses.append(float(np.asarray(aux["loss"])))
    assert losses[-1] < losses[0], losses
    w1 = np.asarray(state.params["text"]["layers"][0]["q"]["w"])
    assert np.abs(w1 - w0).max() > 1e-6      # encoder params actually train
    # eval on raw batches with the joint params
    aux = tr.eval_step(state.params, tr.shard_batch(batch()))
    assert np.isfinite(float(np.asarray(aux["loss"])))

    # ZeRO-3 over the JOINT state: encoder weight physically 1/8 per rank
    trz = Trainer(cfg, mesh8, encoders=enc, finetune=True, zero3=True)
    sz = trz.init(seed=0)
    sz, auxz = trz.train_step(sz, trz.shard_batch(batch()))
    assert np.isfinite(float(np.asarray(auxz["loss"])))
    wz = sz.params["text"]["layers"][0]["q"]["w"]
    assert wz.sharding.spec[0] == "data", wz.sharding
    assert wz.addressable_shards[0].data.shape[0] == wz.shape[0] // 8


def test_finetune_requires_encoders(mesh8):
    with pytest.raises(ValueError, match="requires encoders"):
        Trainer(small_cfg(), mesh8, finetune=True)
