"""Tensor parallelism over the mesh "model" axis (parallel/tp.py).

The semantics claim: Megatron-style sharding of the fusion model's
attention heads / MLP hidden / classifier hidden over "model" computes the
SAME losses and parameter trajectory as replicated DP — the split only
changes where the columns live; GSPMD's all-reduces at the row-sharded
projections replace local sums. The reference is single-GPU
(reference train.py:32,321); TP is new framework capability.
"""

import dataclasses

import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from mmd_tpu.core.config import DataConfig, ModelConfig, TrainConfig
from mmd_tpu.core.mesh import MODEL_AXIS, make_mesh
from mmd_tpu.data.synthetic import synthetic_preembed_batch
from mmd_tpu.parallel import tp
from mmd_tpu.training.trainer import Trainer, init_state


def _cfg(dropout=0.1):
    model = ModelConfig(
        text_input_dim=16, image_input_dim=24, embed_dim=32, num_heads=4,
        hidden_dim=16, compute_dtype="float32", dropout=dropout)
    return TrainConfig(model=model, batch_size=16, lr=1e-3,
                       data=DataConfig(text_seq_len=8, image_seq_len=4))


@pytest.fixture(scope="module")
def mesh_tp():
    return make_mesh(jax.devices(), model_parallel=2)   # (data 4, model 2)


def test_tp_specs_split_the_right_leaves():
    cfg = _cfg()
    state = jax.eval_shape(lambda: init_state(cfg, jax.random.key(0)))
    specs = tp.state_specs(state)
    p = specs.params["representation"]
    assert p["text_WQ"]["w"] == P(None, MODEL_AXIS)
    assert p["text_WQ"]["b"] == P(MODEL_AXIS)
    assert p["text_self_attn_out"]["w"] == P(MODEL_AXIS, None)
    assert p["text_self_attn_out"]["b"] == P()
    assert p["text_mlp"]["fc1"]["w"] == P(None, MODEL_AXIS)
    assert p["text_mlp"]["fc2"]["w"] == P(MODEL_AXIS, None)
    assert p["text_self_ln1"]["scale"] == P()
    assert p["text_proj"]["w"] == P()
    c = specs.params["cross_attn"]
    assert c["text_evidence_key"]["w"] == P(None, MODEL_AXIS)
    assert c["text_image_out"]["w"] == P(MODEL_AXIS, None)
    heads = specs.params["classifier"]["mlp_text_given_text"]
    assert heads["fc0"]["w"] == P(None, MODEL_AXIS)
    assert heads["fc1"]["w"] == P(MODEL_AXIS, None)
    # AdamW mu/nu mirror the params tree and pick up the same specs
    mu = specs.opt_state[0].mu["representation"]
    assert mu["text_WQ"]["w"] == P(None, MODEL_AXIS)
    assert mu["text_self_attn_out"]["w"] == P(MODEL_AXIS, None)
    assert specs.step == P() and specs.rng == P()


def test_tp_losses_match_dp(mesh8, mesh_tp, rng):
    """3 train steps (dropout active): TP(4x2) == DP(8) losses to f32
    reduction-order noise. (Param trajectories are NOT compared after
    multiple AdamW steps: mhat/sqrt(vhat) normalizes near-zero grads to
    full-size updates, so reduction-order noise flips update signs —
    test_tp_grads_match_replicated covers the grad semantics directly.)"""
    batches = [synthetic_preembed_batch(rng, 16, text_seq=8, image_seq=4,
                                        text_dim=16, image_dim=24)
               for _ in range(3)]

    def run(trainer):
        state = trainer.init(seed=0)
        losses = []
        for b in batches:
            state, aux = trainer.train_step(state, trainer.shard_batch(b))
            losses.append(float(np.asarray(aux["loss"])))
        return losses

    losses_dp = run(Trainer(_cfg(), mesh8))
    losses_tp = run(Trainer(_cfg(), mesh_tp, tensor_parallel=True))
    np.testing.assert_allclose(losses_tp, losses_dp, rtol=2e-5, atol=1e-6)


def test_tp_grads_match_replicated(mesh_tp, rng):
    """Grads of the mean loss with TP-sharded params == grads with
    replicated params on the same mesh: GSPMD's all-reduces at the
    row-sharded projections are exactly the local sums they replace."""
    from jax.sharding import NamedSharding
    from mmd_tpu.training.trainer import _loss_fn

    cfg = _cfg(dropout=0.0)
    tp_model = dataclasses.replace(cfg.model, tensor_parallel=True)
    params = init_state(cfg, jax.random.key(0)).params
    batch = synthetic_preembed_batch(rng, 16, text_seq=8, image_seq=4,
                                     text_dim=16, image_dim=24)

    def grads_with(params_sharded, mcfg):
        f = jax.jit(jax.grad(
            lambda p, b: _loss_fn(p, mcfg, b, None, deterministic=True)[0]))
        b = jax.device_put(batch, NamedSharding(mesh_tp, P("data")))
        return f(params_sharded, b)

    g_repl = grads_with(
        jax.device_put(params, NamedSharding(mesh_tp, P())), cfg.model)
    g_tp = grads_with(tp.shard_tree(params, mesh_tp), tp_model)
    flat_r = jax.tree_util.tree_leaves_with_path(g_repl)
    flat_t = jax.tree_util.tree_leaves_with_path(g_tp)
    for (path_r, leaf_r), (path_t, leaf_t) in zip(flat_r, flat_t):
        assert path_r == path_t
        np.testing.assert_allclose(
            np.asarray(leaf_t), np.asarray(leaf_r), rtol=5e-5, atol=1e-7,
            err_msg=jax.tree_util.keystr(path_r))


def test_tp_fused_kernels_match_replicated(mesh_tp, rng):
    """Round-3: with a tp_mesh the Pallas flash-attention kernels run
    device-locally under shard_map (each device owns num_heads/tp whole
    heads) instead of falling back to jnp — grads match the unmapped fused
    path. dh = 128/4 = 32 so the fused path actually engages (interpret
    mode off-TPU)."""
    from jax.sharding import NamedSharding
    from mmd_tpu.training.trainer import _loss_fn

    model = ModelConfig(
        text_input_dim=16, image_input_dim=24, embed_dim=128, num_heads=4,
        hidden_dim=16, compute_dtype="float32", dropout=0.0, fused_attn=True)
    cfg = TrainConfig(model=model, batch_size=16,
                      data=DataConfig(text_seq_len=128, image_seq_len=64))
    tp_model = dataclasses.replace(model, tensor_parallel=True)
    params = init_state(cfg, jax.random.key(0)).params
    batch = synthetic_preembed_batch(rng, 16, text_seq=128, image_seq=64,
                                     text_dim=16, image_dim=24)
    b = jax.device_put(batch, NamedSharding(mesh_tp, P("data")))

    f_repl = jax.jit(jax.grad(
        lambda p, b: _loss_fn(p, model, b, None, deterministic=True)[0]))
    g_repl = f_repl(jax.device_put(params, NamedSharding(mesh_tp, P())), b)
    f_tp = jax.jit(jax.grad(
        lambda p, b: _loss_fn(p, tp_model, b, None, deterministic=True,
                              tp_mesh=mesh_tp)[0]))
    g_tp = f_tp(tp.shard_tree(params, mesh_tp), b)
    for (pr, lr), (pt, lt) in zip(
            jax.tree_util.tree_leaves_with_path(g_repl),
            jax.tree_util.tree_leaves_with_path(g_tp)):
        assert pr == pt
        np.testing.assert_allclose(np.asarray(lt), np.asarray(lr),
                                   rtol=5e-4, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(pr))


def test_fused_mlp_tp_matches_dense(mesh_tp, rng):
    """fused_mlp under shard_map (fc1 column- / fc2 row-sharded, partials
    psummed with b2/tp) equals the unmapped kernel at rate=0."""
    import jax.numpy as jnp
    from mmd_tpu.ops.mlp import fused_mlp

    x = rng.standard_normal((16, 8, 128)).astype(np.float32)
    w1 = (rng.standard_normal((128, 256)) * 0.05).astype(np.float32)
    b1 = (rng.standard_normal(256) * 0.1).astype(np.float32)
    w2 = (rng.standard_normal((256, 128)) * 0.05).astype(np.float32)
    b2 = (rng.standard_normal(128) * 0.1).astype(np.float32)
    y_plain = jax.jit(lambda *a: fused_mlp(*a, rate=0.0, dtype=jnp.float32))(
        x, w1, b1, w2, b2)
    y_tp = jax.jit(lambda *a: fused_mlp(*a, rate=0.0, dtype=jnp.float32,
                                        tp_mesh=mesh_tp))(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_plain),
                               rtol=2e-5, atol=2e-6)


def test_tp_state_stays_sharded_across_steps(mesh_tp, rng):
    """The jitted step's out_shardings hold the TP layout — params AND
    AdamW moments stay split over "model" after updates (no silent
    gather-to-replicated drift)."""
    trainer = Trainer(_cfg(), mesh_tp, tensor_parallel=True)
    state = trainer.init(seed=0)
    batch = trainer.shard_batch(synthetic_preembed_batch(
        rng, 16, text_seq=8, image_seq=4, text_dim=16, image_dim=24))
    state, _ = trainer.train_step(state, batch)

    wq = state.params["representation"]["text_WQ"]["w"]
    assert wq.sharding.spec == P(None, MODEL_AXIS)
    local = wq.addressable_shards[0].data.shape
    assert local == (32, 16), local                      # 32 x (32/2)
    mu = state.opt_state[0].mu["representation"]["text_mlp"]["fc1"]["w"]
    assert mu.sharding.spec == P(None, MODEL_AXIS)
    out_w = state.params["representation"]["text_self_attn_out"]["w"]
    assert out_w.sharding.spec == P(MODEL_AXIS, None)
    assert out_w.addressable_shards[0].data.shape == (16, 32)


def test_encoder_tp_bert_matches_replicated(mesh_tp, rng):
    """Serving TP for the BERT-class stack: encoder params sharded by
    tp.encoder_specs produce the same last_hidden_state as replicated."""
    from jax.sharding import NamedSharding
    import mmd_tpu.models.text_encoder as te

    cfg = dataclasses.replace(te.TINY_TEST, fused_attn=False, dropout=0.0)
    params = te.init_text_encoder(jax.random.key(1), cfg)
    ids = rng.integers(1, 100, (8, 16)).astype(np.int32)
    mask = np.ones((8, 16), np.int32)
    mask[:, 12:] = 0

    f = jax.jit(lambda p, i, m: te.encode(p, cfg, i, m))
    data = NamedSharding(mesh_tp, P("data"))
    args = (jax.device_put(ids, data), jax.device_put(mask, data))
    out_repl = f(jax.device_put(params, NamedSharding(mesh_tp, P())), *args)
    p_tp = tp.shard_encoder(params, mesh_tp)
    assert (p_tp["layers"][0]["q"]["w"].sharding.spec
            == P(None, MODEL_AXIS))
    assert (p_tp["layers"][0]["ffn_out"]["w"].sharding.spec
            == P(MODEL_AXIS, None))
    assert p_tp["embeddings"]["word"].sharding.spec == P()
    out_tp = f(p_tp, *args)
    np.testing.assert_allclose(np.asarray(out_tp), np.asarray(out_repl),
                               rtol=2e-5, atol=2e-6)


def test_encoder_tp_deberta_matches_replicated(mesh_tp, rng):
    """Serving TP for the DeBERTa disentangled-attention jnp path."""
    from jax.sharding import NamedSharding
    from mmd_tpu.models import deberta as D

    cfg = D.DebertaConfig(
        vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position=16, position_buckets=8,
        compute_dtype="float32", fused_attn=False)
    params = D.init_deberta(jax.random.key(2), cfg)
    ids = rng.integers(1, 60, (8, 16)).astype(np.int32)
    mask = np.ones((8, 16), np.int32)
    mask[:, 13:] = 0

    f = jax.jit(lambda p, i, m: D.deberta_encode(p, cfg, i, m))
    data = NamedSharding(mesh_tp, P("data"))
    args = (jax.device_put(ids, data), jax.device_put(mask, data))
    out_repl = f(jax.device_put(params, NamedSharding(mesh_tp, P())), *args)
    p_tp = tp.shard_encoder(params, mesh_tp)
    assert (p_tp["layers"][1]["ffn_in"]["w"].sharding.spec
            == P(None, MODEL_AXIS))
    assert (p_tp["layers"][1]["attn_out"]["w"].sharding.spec
            == P(MODEL_AXIS, None))
    assert p_tp["rel_embeddings"].sharding.spec == P()
    out_tp = f(p_tp, *args)
    np.testing.assert_allclose(np.asarray(out_tp), np.asarray(out_repl),
                               rtol=2e-5, atol=2e-6)


def test_tp_zero1_composed(mesh_tp, rng):
    """TP + ZeRO-1 together: params keep the Megatron specs while the
    AdamW moments shard over data AND model — losses still equal plain
    DP."""
    batches = [synthetic_preembed_batch(rng, 16, text_seq=8, image_seq=4,
                                        text_dim=16, image_dim=24)
               for _ in range(3)]

    def run(trainer):
        state = trainer.init(seed=0)
        losses = []
        for b in batches:
            state, aux = trainer.train_step(state, trainer.shard_batch(b))
            losses.append(float(np.asarray(aux["loss"])))
        return losses, state

    losses_dp, _ = run(Trainer(_cfg(), mesh_tp))
    losses_tz, state = run(Trainer(_cfg(), mesh_tp, tensor_parallel=True,
                                   zero1=True))
    np.testing.assert_allclose(losses_tz, losses_dp, rtol=2e-5, atol=1e-6)
    # col-sharded (32, 32) weight's moment: P("data", "model") -> (8, 16)
    mu = state.opt_state[0].mu["representation"]["text_WQ"]["w"]
    assert mu.sharding.spec == P("data", MODEL_AXIS), mu.sharding.spec
    assert mu.addressable_shards[0].data.shape == (8, 16)
    # params keep the plain TP layout
    w = state.params["representation"]["text_WQ"]["w"]
    assert w.sharding.spec == P(None, MODEL_AXIS)


def test_raw_path_zero1_and_tp(mesh8, mesh_tp, rng):
    """The encoder-in-step (raw) path now accepts sharded trainable state:
    one ZeRO-1 step on the DP mesh and one TP step on the (4, 2) mesh,
    losses finite and moments/params physically sharded."""
    import dataclasses as dc
    import jax.numpy as jnp
    from mmd_tpu.models import text_encoder as te
    from mmd_tpu.models import vit as V
    from mmd_tpu.models.frozen import FrozenEncoders

    tcfg = dc.replace(te.TINY_TEST, vocab_size=128)
    vcfg = V.VIT_TEST
    enc = FrozenEncoders(
        tokenizer=None, text_cfg=tcfg,
        text_params=te.init_text_encoder(jax.random.key(0), tcfg),
        vit_cfg=vcfg, vit_params=V.init_vit(jax.random.key(1), vcfg))
    model = ModelConfig(text_input_dim=tcfg.hidden_size,
                        image_input_dim=vcfg.hidden_size,
                        embed_dim=32, num_heads=4, hidden_dim=16,
                        compute_dtype="float32")
    B = 16
    batch = {
        "claim_ids": rng.integers(1, 100, (B, 16)).astype(np.int32),
        "claim_mask": np.ones((B, 16), np.int32),
        "doc_ids": rng.integers(1, 100, (B, 16)).astype(np.int32),
        "doc_mask": np.ones((B, 16), np.int32),
        "claim_image": rng.integers(0, 255, (B, 32, 32, 3)).astype(np.uint8),
        "doc_image": rng.integers(0, 255, (B, 32, 32, 3)).astype(np.uint8),
        "labels": np.stack([np.array([0, 1, 1, 1], np.int32)] * B),
    }
    cfg = TrainConfig(model=model, batch_size=B,
                      data=DataConfig(text_seq_len=16, image_seq_len=16))

    trz = Trainer(cfg, mesh8, encoders=enc, zero1=True)
    state, aux = trz.train_step(trz.init(seed=0), trz.shard_batch(batch))
    assert np.isfinite(float(np.asarray(aux["loss"])))
    mu = state.opt_state[0].mu["representation"]["text_WQ"]["w"]
    assert mu.sharding.spec[0] == "data"

    trt = Trainer(cfg, mesh_tp, encoders=enc, tensor_parallel=True)
    state_t, aux_t = trt.train_step(trt.init(seed=0), trt.shard_batch(batch))
    assert np.isfinite(float(np.asarray(aux_t["loss"])))
    w = state_t.params["representation"]["text_WQ"]["w"]
    assert w.sharding.spec == P(None, MODEL_AXIS)


def test_tp_validation_rejects_indivisible_heads(mesh_tp):
    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, embed_dim=24, num_heads=3))
    with pytest.raises(ValueError, match="num_heads"):
        Trainer(cfg, mesh_tp, tensor_parallel=True)


def test_tp_requires_model_axis(mesh8):
    with pytest.raises(ValueError, match="model axis"):
        Trainer(_cfg(), mesh8, tensor_parallel=True)


def test_zero1_matches_dp_and_shards_moments(mesh8, rng):
    """ZeRO-1: AdamW mu/nu sharded over "data" (params replicated) — same
    losses as plain DP, moments actually split 1/8 per rank."""
    batches = [synthetic_preembed_batch(rng, 16, text_seq=8, image_seq=4,
                                        text_dim=16, image_dim=24)
               for _ in range(3)]

    def run(trainer):
        state = trainer.init(seed=0)
        losses = []
        for b in batches:
            state, aux = trainer.train_step(state, trainer.shard_batch(b))
            losses.append(float(np.asarray(aux["loss"])))
        return losses, state

    losses_dp, _ = run(Trainer(_cfg(), mesh8))
    losses_z, state_z = run(Trainer(_cfg(), mesh8, zero1=True))
    np.testing.assert_allclose(losses_z, losses_dp, rtol=2e-5, atol=1e-6)

    mu = state_z.opt_state[0].mu["representation"]["text_WQ"]["w"]
    assert mu.sharding.spec[0] == "data"                 # (32, 32) split 8x
    assert mu.addressable_shards[0].data.shape == (4, 32)
    head_b = state_z.opt_state[0].nu["classifier"][
        "mlp_text_given_text"]["fc1"]["b"]
    assert head_b.sharding.spec == P()                   # (3,) % 8 != 0
    w = state_z.params["representation"]["text_WQ"]["w"]
    assert w.sharding.spec == P()                        # params replicated


def test_zero3_matches_dp_and_shards_params(mesh8, rng):
    """ZeRO-3 / FSDP via GSPMD annotations: params AND moments live 1/8
    per DP rank (gather-on-use) — same losses as plain DP across steps,
    weights physically split."""
    batches = [synthetic_preembed_batch(rng, 16, text_seq=8, image_seq=4,
                                        text_dim=16, image_dim=24)
               for _ in range(3)]

    def run(trainer):
        state = trainer.init(seed=0)
        losses = []
        for b in batches:
            state, aux = trainer.train_step(state, trainer.shard_batch(b))
            losses.append(float(np.asarray(aux["loss"])))
        return losses, state

    losses_dp, _ = run(Trainer(_cfg(), mesh8))
    losses_z, state_z = run(Trainer(_cfg(), mesh8, zero3=True))
    np.testing.assert_allclose(losses_z, losses_dp, rtol=2e-5, atol=1e-6)

    w = state_z.params["representation"]["text_WQ"]["w"]
    assert w.sharding.spec[0] == "data"                  # (32, 32) split 8x
    assert w.addressable_shards[0].data.shape == (4, 32)
    mu = state_z.opt_state[0].mu["representation"]["text_WQ"]["w"]
    assert mu.sharding.spec[0] == "data"                 # moments too
    head_b = state_z.params["classifier"]["mlp_text_given_text"]["fc1"]["b"]
    assert head_b.sharding.spec == P()                   # (3,) % 8 != 0

    # eval forward works on the FSDP-sharded params
    ev = Trainer(_cfg(), mesh8, zero3=True)
    st = ev.init(seed=0)
    aux = ev.eval_step(st.params, ev.shard_batch(batches[0]))
    assert np.isfinite(float(np.asarray(aux["loss"])))


def test_zero3_excludes_other_strategies(mesh8):
    import pytest as _pt
    with _pt.raises(ValueError, match="exclusive"):
        Trainer(_cfg(), mesh8, zero3=True, zero1=True)


def test_accum_composes_with_zero3_and_tp(mesh8, mesh_tp, rng):
    """Gradient accumulation (accum_steps=2) composes with ZeRO-3/FSDP and
    with tensor parallelism: one-step losses equal the accum=1 variant of
    the same strategy (dropout off so micro-rng folding is irrelevant)."""
    import dataclasses

    batch = synthetic_preembed_batch(rng, 16, text_seq=8, image_seq=4,
                                     text_dim=16, image_dim=24)

    def one(mesh, accum, **tkw):
        cfg = dataclasses.replace(_cfg(dropout=0.0), accum_steps=accum)
        tr = Trainer(cfg, mesh, **tkw)
        _, aux = tr.train_step(tr.init(seed=0), tr.shard_batch(batch))
        return float(np.asarray(aux["loss"]))

    np.testing.assert_allclose(one(mesh8, 2, zero3=True),
                               one(mesh8, 1, zero3=True), rtol=2e-6)
    np.testing.assert_allclose(one(mesh_tp, 2, tensor_parallel=True),
                               one(mesh_tp, 1, tensor_parallel=True),
                               rtol=2e-6)
