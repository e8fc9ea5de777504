"""Parallel end-to-end fine-tuning: gradients THROUGH the sp/pp encoders.

The shard_map serving paths (parallel/sp.py, parallel/pp.py) are
differentiable as-is — all_gather transposes to reduce-scatter, ppermute
to its inverse permutation, the GPipe schedule to the reverse pipeline —
so Trainer(finetune=True, text_parallelism=...) trains the text encoder
sequence- or pipeline-parallel over the model axis while the batch stays
DP-sharded over "data". These tests pin the semantics: joint-loss grads
equal the unsplit fine-tuning step's (up to fp reassociation: the ring
online-softmax and the pipeline's scatter-adds reorder sums, so the
tolerance is looser than the bit-tight all-gather path).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmd_tpu.core.config import DataConfig, ModelConfig, TrainConfig
from mmd_tpu.core.mesh import make_mesh
from mmd_tpu.models import text_encoder as te
from mmd_tpu.models import vit as V
from mmd_tpu.models.frozen import FrozenEncoders
from mmd_tpu.training.trainer import (Trainer, init_finetune_state,
                                      make_finetune_raw_step)


def _setup(text_cfg=None):
    tcfg = text_cfg or dataclasses.replace(te.TINY_TEST, vocab_size=128,
                                           dropout=0.0)
    vcfg = V.VIT_TEST
    enc = FrozenEncoders(
        tokenizer=None, text_cfg=tcfg,
        text_params=(te.init_text_encoder(jax.random.key(4), tcfg)
                     if not _is_deberta(tcfg) else _init_deberta(tcfg)),
        vit_cfg=vcfg, vit_params=V.init_vit(jax.random.key(5), vcfg))
    model = ModelConfig(
        text_input_dim=tcfg.hidden_size, image_input_dim=vcfg.hidden_size,
        embed_dim=32, num_heads=4, hidden_dim=16, compute_dtype="float32",
        dropout=0.0)
    cfg = TrainConfig(model=model, batch_size=16, lr=1e-3,
                      data=DataConfig(text_seq_len=16, image_seq_len=16))
    rr = np.random.default_rng(11)
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
    return enc, cfg, batch


def _is_deberta(cfg):
    from mmd_tpu.models.deberta import DebertaConfig
    return isinstance(cfg, DebertaConfig)


def _init_deberta(cfg):
    from mmd_tpu.models import deberta as D
    return D.init_deberta(jax.random.key(4), cfg)


def _joint_grads(cfg, enc, batch, text_mode=None, mesh=None):
    step = make_finetune_raw_step(cfg, enc, text_mode=text_mode, mesh=mesh)
    state = init_finetune_state(cfg, enc, jax.random.key(0))
    (loss, _), grads = jax.jit(jax.value_and_grad(
        step.joint_loss, has_aux=True))(state.params, batch,
                                        jax.random.key(1))
    return float(loss), grads


@pytest.mark.parametrize("mode,tol", [("sp", 1e-5), ("sp_ring", 1e-3),
                                      ("pp", 1e-3)])
def test_parallel_finetune_grads_match_unsplit(mode, tol):
    enc, cfg, batch = _setup()
    mesh = make_mesh(jax.devices(), model_parallel=2)   # (data 4, model 2)
    loss0, g0 = _joint_grads(cfg, enc, batch)
    loss1, g1 = _joint_grads(cfg, enc, batch, text_mode=mode, mesh=mesh)
    assert loss1 == pytest.approx(loss0, rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=tol)


def test_deberta_sp_finetune_grads_match_unsplit():
    from mmd_tpu.models import deberta as D

    tcfg = dataclasses.replace(D.DEBERTA_TEST, compute_dtype="float32")
    enc, cfg, batch = _setup(text_cfg=tcfg)
    mesh = make_mesh(jax.devices(), model_parallel=2)
    loss0, g0 = _joint_grads(cfg, enc, batch)
    loss1, g1 = _joint_grads(cfg, enc, batch, text_mode="sp", mesh=mesh)
    assert loss1 == pytest.approx(loss0, rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=2e-5)


def test_trainer_parallel_finetune_step_and_zero3():
    """The Trainer surface: one step under (data 4, model 2) with the
    text encoder sequence-parallel — loss finite, encoder params move;
    composes with ZeRO-3 (joint state sharded over data) and remat."""
    enc, base, batch = _setup()
    mesh = make_mesh(jax.devices(), model_parallel=2)
    cfg = dataclasses.replace(base, remat=True)
    tr = Trainer(cfg, mesh, encoders=enc, finetune=True,
                 text_parallelism="sp")
    state = tr.init(seed=0)
    w0 = np.asarray(state.params["text"]["layers"][0]["q"]["w"]).copy()
    state, aux = tr.train_step(state, tr.shard_batch(batch))
    assert np.isfinite(float(np.asarray(aux["loss"])))
    w1 = np.asarray(state.params["text"]["layers"][0]["q"]["w"])
    assert np.abs(w1 - w0).max() > 1e-6

    trz = Trainer(base, mesh, encoders=enc, finetune=True,
                  text_parallelism="pp", zero3=True)
    sz = trz.init(seed=0)
    sz, auxz = trz.train_step(sz, trz.shard_batch(batch))
    assert np.isfinite(float(np.asarray(auxz["loss"])))
    wz = sz.params["text"]["layers"][0]["q"]["w"]
    assert wz.sharding.spec[0] == "data", wz.sharding


def test_text_parallelism_validation():
    enc, cfg, _ = _setup()
    mesh = make_mesh(jax.devices(), model_parallel=2)
    with pytest.raises(ValueError, match="fine-tuning surface"):
        Trainer(cfg, mesh, text_parallelism="sp")
    with pytest.raises(ValueError, match="unknown text_parallelism"):
        Trainer(cfg, mesh, encoders=enc, finetune=True,
                text_parallelism="tp")
    dp_mesh = make_mesh(jax.devices())
    with pytest.raises(ValueError, match="model axis"):
        Trainer(cfg, dp_mesh, encoders=enc, finetune=True,
                text_parallelism="sp")
