"""Rematerialization (jax.checkpoint) and device-input prefetch.

remat trades ~1 extra forward of FLOPs for dropping intra-block
activations from the backward's live set — gradients must be EXACTLY the
same function (tested per encoder family and through the fine-tuning
step). prefetch_to_device merely pipelines host->device transfers —
batches must come out in order, already sharded, with the transfer
issued ahead of consumption.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmd_tpu.core.config import DataConfig, ModelConfig, TrainConfig


def _grads(fn, params, *args):
    g = jax.grad(lambda p: jnp.sum(fn(p, *args).astype(jnp.float32)))(params)
    return jax.tree_util.tree_leaves(g)


def _assert_tree_close(a, b, rtol=1e-6, atol=1e-7):
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


def test_transformer_remat_grads_equal(rng):
    from mmd_tpu.models import text_encoder as te

    cfg = dataclasses.replace(te.TINY_TEST, vocab_size=128, dropout=0.0)
    params = te.init_text_encoder(jax.random.key(0), cfg)
    ids = jnp.asarray(rng.integers(1, 100, (2, 16)), jnp.int32)
    mask = jnp.asarray(np.array([[1] * 16, [1] * 12 + [0] * 4]), jnp.int32)

    plain = lambda p, i, m, c=cfg: te.encode(p, c, i, m)
    rcfg = dataclasses.replace(cfg, remat=True)
    remat = lambda p, i, m, c=rcfg: te.encode(p, c, i, m)
    np.testing.assert_allclose(np.asarray(jax.jit(remat)(params, ids, mask)),
                               np.asarray(jax.jit(plain)(params, ids, mask)),
                               rtol=1e-6, atol=1e-7)
    _assert_tree_close(_grads(plain, params, ids, mask),
                       _grads(remat, params, ids, mask))


def test_deberta_remat_grads_equal(rng):
    from mmd_tpu.models import deberta as D

    cfg = dataclasses.replace(D.DEBERTA_TEST, compute_dtype="float32")
    params = D.init_deberta(jax.random.key(1), cfg)
    ids = jnp.asarray(rng.integers(1, 100, (2, 16)), jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32)

    plain = lambda p, i, m, c=cfg: D.deberta_encode(p, c, i, m)
    rcfg = dataclasses.replace(cfg, remat=True)
    remat = lambda p, i, m, c=rcfg: D.deberta_encode(p, c, i, m)
    _assert_tree_close(_grads(plain, params, ids, mask),
                       _grads(remat, params, ids, mask))


def test_vit_and_swin_remat_grads_equal(rng):
    from mmd_tpu.models import swin as S
    from mmd_tpu.models import vit as V

    vcfg = V.VIT_TEST
    vparams = V.init_vit(jax.random.key(2), vcfg)
    imgs = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    plain = lambda p, x, c=vcfg: V.vit_forward(p, c, x)
    rv = dataclasses.replace(vcfg, remat=True)
    remat = lambda p, x, c=rv: V.vit_forward(p, c, x)
    _assert_tree_close(_grads(plain, vparams, imgs),
                       _grads(remat, vparams, imgs))

    scfg = S.SwinConfig(image_size=16, patch_size=4, embed_dim=16,
                        depths=(2, 2), num_heads=(2, 4), window_size=2,
                        pretrained_window_sizes=(0, 0),
                        compute_dtype="float32")
    sparams = S.init_swin(jax.random.key(3), scfg)
    simgs = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    splain = lambda p, x, c=scfg: S.swin_forward(p, c, x)
    rs = dataclasses.replace(scfg, remat=True)
    sremat = lambda p, x, c=rs: S.swin_forward(p, c, x)
    _assert_tree_close(_grads(splain, sparams, simgs),
                       _grads(sremat, sparams, simgs))


def test_finetune_remat_step_equal(mesh8, rng):
    """Trainer(finetune=True) with cfg.remat=True takes the exact same
    optimizer step (the flag only changes what the backward keeps
    resident)."""
    from mmd_tpu.models import text_encoder as te
    from mmd_tpu.models import vit as V
    from mmd_tpu.models.frozen import FrozenEncoders
    from mmd_tpu.training.trainer import Trainer

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
    base = TrainConfig(model=model, batch_size=16, lr=1e-3,
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

    # Compare LOSSES and GRADS, not post-AdamW params: at step 1 the
    # update is ~lr*sign(g), so fp-reassociation noise in near-zero grads
    # flips full-size update entries (same caveat as TP-vs-DP, see
    # tests/test_tp.py).
    from mmd_tpu.training.trainer import init_finetune_state, \
        make_finetune_raw_step

    outs = []
    for remat in (False, True):
        cfg = dataclasses.replace(base, remat=remat)
        step = make_finetune_raw_step(cfg, enc)
        state = init_finetune_state(cfg, enc, jax.random.key(0))
        (loss, _), grads = jax.jit(jax.value_and_grad(
            step.joint_loss, has_aux=True))(state.params, batch,
                                            jax.random.key(1))
        outs.append((float(loss), jax.tree_util.tree_leaves(grads)))
    assert outs[0][0] == pytest.approx(outs[1][0], rel=1e-6)
    _assert_tree_close(outs[0][1], outs[1][1], rtol=2e-5, atol=1e-7)
    # and the Trainer surface runs with the flag on
    tr = Trainer(dataclasses.replace(base, remat=True), mesh8,
                 encoders=enc, finetune=True)
    st = tr.init(seed=0)
    st, aux = tr.train_step(st, tr.shard_batch(batch))
    assert np.isfinite(float(np.asarray(aux["loss"])))


def test_prefetch_to_device_order_and_lookahead():
    from mmd_tpu.training.loop import prefetch_to_device

    calls = []

    def shard(b):
        calls.append(b["i"])
        return {"i": b["i"], "sharded": True}

    batches = [{"i": i} for i in range(5)]
    it = prefetch_to_device(iter(batches), shard, depth=2)
    first = next(it)
    assert first == {"i": 0, "sharded": True}
    # with depth 2 the transfer of batches 1 and 2 was issued BEFORE
    # batch 0 was handed out
    assert calls == [0, 1, 2]
    rest = list(it)
    assert [b["i"] for b in rest] == [1, 2, 3, 4]
    assert all(b["sharded"] for b in rest)
    # depth 0 = pass-through, still sharded and ordered
    calls.clear()
    out = list(prefetch_to_device(iter(batches), shard, depth=0))
    assert [b["i"] for b in out] == list(range(5)) == calls


def test_run_training_with_prefetch(mesh8, rng, tmp_path):
    """run_training with prefetch_depth=2 reaches the same state as the
    unprefetched loop (numerics-neutral pipelining)."""
    from mmd_tpu.data.synthetic import synthetic_preembed_batch
    from mmd_tpu.training.loop import run_training
    from mmd_tpu.training.trainer import Trainer

    model = ModelConfig(
        text_input_dim=16, image_input_dim=24, embed_dim=32, num_heads=4,
        hidden_dim=16, compute_dtype="float32")
    batches = [synthetic_preembed_batch(np.random.default_rng(i), 8,
                                        text_seq=8, image_seq=4,
                                        text_dim=16, image_dim=24)
               for i in range(3)]
    states = []
    for depth in (0, 2):
        cfg = TrainConfig(model=model, batch_size=8, lr=1e-3, epochs=2,
                          log_every=2, save_every=0,
                          output_dir=str(tmp_path / f"d{depth}"),
                          prefetch_depth=depth,
                          data=DataConfig(text_seq_len=8, image_seq_len=4))
        tr = Trainer(cfg, mesh8)
        states.append(run_training(tr, lambda e: iter(batches)))
    assert int(states[0].step) == int(states[1].step) == 6
    _assert_tree_close(jax.tree_util.tree_leaves(states[0].params),
                       jax.tree_util.tree_leaves(states[1].params),
                       rtol=1e-6, atol=1e-7)
