"""Pipeline-parallel encoder serving (parallel/pp.py).

Semantics claim: GPipe-splitting the layer stack over the mesh "model"
axis with microbatched ppermute hand-off computes the SAME
last_hidden_state as the unsplit forward — the schedule only changes
where layers run and when microbatches flow.
"""

import dataclasses

import numpy as np
import pytest

import jax

from mmd_tpu.core.mesh import make_mesh
from mmd_tpu.parallel.pp import pipeline_encode


def _cfg(layers=4):
    import mmd_tpu.models.text_encoder as te
    return dataclasses.replace(
        te.TINY_TEST, vocab_size=120, num_layers=layers, fused_attn=False,
        dropout=0.0, compute_dtype="float32")


def _inputs(rng, b=8, t=16):
    ids = rng.integers(1, 100, (b, t)).astype(np.int32)
    mask = np.ones((b, t), np.int32)
    mask[:, 13:] = 0
    return ids, mask


@pytest.mark.parametrize("pp,m", [(2, 4), (4, 4), (2, 2)])
def test_pipeline_encode_matches_unsplit(rng, pp, m):
    import mmd_tpu.models.text_encoder as te

    cfg = _cfg(layers=4)
    params = te.init_text_encoder(jax.random.key(0), cfg)
    ids, mask = _inputs(rng)
    want = np.asarray(te.encode(params, cfg, ids, mask))

    mesh = make_mesh(jax.devices()[:pp * (8 // pp)][:pp * 2]
                     if pp * 2 <= 8 else jax.devices(),
                     model_parallel=pp)
    got = np.asarray(jax.jit(
        lambda p, i, a: pipeline_encode(p, cfg, i, a, mesh=mesh,
                                        num_microbatches=m))(
        params, ids, mask))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_pipeline_encode_no_mask(rng):
    import mmd_tpu.models.text_encoder as te

    cfg = _cfg(layers=4)
    params = te.init_text_encoder(jax.random.key(1), cfg)
    ids, _ = _inputs(rng)
    want = np.asarray(te.encode(params, cfg, ids))
    mesh = make_mesh(jax.devices(), model_parallel=2)
    got = np.asarray(pipeline_encode(params, cfg, ids, mesh=mesh))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_pipeline_encode_mpnet_rel_bias_matches_unsplit(rng):
    """The shared MPNet relative-position bias is per-model: replicated to
    every stage, the PP forward must equal the unsplit rel-bias path."""
    import mmd_tpu.models.text_encoder as te

    cfg = dataclasses.replace(
        _cfg(layers=4), relative_bias_buckets=8, mpnet_positions=True,
        type_vocab_size=0, pad_token_id=1)
    params = te.init_text_encoder(jax.random.key(3), cfg)
    ids, mask = _inputs(rng)
    want = np.asarray(te.encode(params, cfg, ids, mask))
    mesh = make_mesh(jax.devices(), model_parallel=2)
    got = np.asarray(jax.jit(
        lambda p, i, a: pipeline_encode(p, cfg, i, a, mesh=mesh,
                                        num_microbatches=4))(
        params, ids, mask))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("pp,m", [(2, 4), (4, 2)])
def test_pipeline_encode_deberta_matches_unsplit(rng, pp, m):
    """DeBERTa's shared rel-pos table replicates to every stage; only the
    per-layer weights shard. PP forward == deberta_encode (the
    reference's actual frozen text encoder, train.py:47)."""
    from mmd_tpu.models import deberta as D
    from mmd_tpu.parallel.pp import pipeline_encode_deberta

    cfg = dataclasses.replace(D.DEBERTA_TEST, num_layers=4,
                              compute_dtype="float32")
    params = D.init_deberta(jax.random.key(4), cfg)
    ids, mask = _inputs(rng)
    want = np.asarray(D.deberta_encode(params, cfg, ids, mask))
    mesh = make_mesh(jax.devices(), model_parallel=pp)
    got = np.asarray(jax.jit(
        lambda p, i, a: pipeline_encode_deberta(p, cfg, i, a, mesh=mesh,
                                                num_microbatches=m))(
        params, ids, mask))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_pipeline_encode_deberta_no_mask(rng):
    from mmd_tpu.models import deberta as D
    from mmd_tpu.parallel.pp import pipeline_encode_deberta

    cfg = dataclasses.replace(D.DEBERTA_TEST, num_layers=2,
                              compute_dtype="float32")
    params = D.init_deberta(jax.random.key(5), cfg)
    ids, _ = _inputs(rng)
    want = np.asarray(D.deberta_encode(params, cfg, ids))
    mesh = make_mesh(jax.devices(), model_parallel=2)
    got = np.asarray(pipeline_encode_deberta(params, cfg, ids, mesh=mesh))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_pipeline_encode_validates_divisibility(rng):
    import mmd_tpu.models.text_encoder as te

    cfg = _cfg(layers=3)
    params = te.init_text_encoder(jax.random.key(2), cfg)
    ids, mask = _inputs(rng)
    mesh = make_mesh(jax.devices(), model_parallel=2)
    with pytest.raises(ValueError, match="num_layers"):
        pipeline_encode(params, cfg, ids, mask, mesh=mesh)
