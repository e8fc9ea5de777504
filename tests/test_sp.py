"""Sequence-parallel encoder serving (parallel/sp.py).

Semantics claim: sharding activations along T over the mesh "model" axis
— per-token ops local, attention on local Q rows vs all-gathered K/V —
computes the SAME last_hidden_state as the unsplit forward.
"""

import dataclasses

import numpy as np
import pytest

import jax

from mmd_tpu.core.mesh import make_mesh
from mmd_tpu.parallel.sp import sequence_parallel_encode


def _cfg(**kw):
    import mmd_tpu.models.text_encoder as te
    kw.setdefault("vocab_size", 120)
    kw.setdefault("fused_attn", False)
    kw.setdefault("dropout", 0.0)
    kw.setdefault("compute_dtype", "float32")
    return dataclasses.replace(te.TINY_TEST, **kw)


def _inputs(rng, b=4, t=16):
    ids = rng.integers(1, 100, (b, t)).astype(np.int32)
    mask = np.ones((b, t), np.int32)
    mask[:, 13:] = 0
    return ids, mask


@pytest.mark.parametrize("sp", [2, 4, 8])
def test_sp_encode_matches_unsplit(rng, sp):
    import mmd_tpu.models.text_encoder as te

    cfg = _cfg()
    params = te.init_text_encoder(jax.random.key(0), cfg)
    ids, mask = _inputs(rng)
    want = np.asarray(te.encode(params, cfg, ids, mask))
    mesh = make_mesh(jax.devices(), model_parallel=sp)
    got = np.asarray(jax.jit(
        lambda p, i, a: sequence_parallel_encode(p, cfg, i, a, mesh=mesh))(
        params, ids, mask))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_sp_encode_no_mask(rng):
    import mmd_tpu.models.text_encoder as te

    cfg = _cfg()
    params = te.init_text_encoder(jax.random.key(1), cfg)
    ids, _ = _inputs(rng)
    want = np.asarray(te.encode(params, cfg, ids))
    mesh = make_mesh(jax.devices(), model_parallel=4)
    got = np.asarray(sequence_parallel_encode(params, cfg, ids, mesh=mesh))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_sp_encode_mpnet_rel_bias(rng):
    """The shared MPNet bias replicates; each rank slices its own query
    rows — SP forward == the unsplit rel-bias path."""
    import mmd_tpu.models.text_encoder as te

    cfg = _cfg(relative_bias_buckets=8, mpnet_positions=True,
               type_vocab_size=0, pad_token_id=1)
    params = te.init_text_encoder(jax.random.key(2), cfg)
    ids, mask = _inputs(rng)
    want = np.asarray(te.encode(params, cfg, ids, mask))
    mesh = make_mesh(jax.devices(), model_parallel=4)
    got = np.asarray(jax.jit(
        lambda p, i, a: sequence_parallel_encode(p, cfg, i, a, mesh=mesh))(
        params, ids, mask))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("sp", [2, 8])
def test_sp_ring_attention_matches_unsplit(rng, sp):
    """ring=True (K/V blocks hop the ICI ring under an online softmax)
    computes the same attention as the all-gather path up to fp
    reassociation — with and without key padding."""
    import mmd_tpu.models.text_encoder as te

    cfg = _cfg()
    params = te.init_text_encoder(jax.random.key(6), cfg)
    ids, mask = _inputs(rng)
    mesh = make_mesh(jax.devices(), model_parallel=sp)
    for m in (mask, None):
        want = np.asarray(te.encode(params, cfg, ids, m))
        got = np.asarray(jax.jit(
            lambda p, i, a: sequence_parallel_encode(p, cfg, i, a,
                                                     mesh=mesh, ring=True),
            static_argnums=())(params, ids, m))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_sp_ring_mpnet_rel_bias(rng):
    import mmd_tpu.models.text_encoder as te

    cfg = _cfg(relative_bias_buckets=8, mpnet_positions=True,
               type_vocab_size=0, pad_token_id=1)
    params = te.init_text_encoder(jax.random.key(7), cfg)
    ids, mask = _inputs(rng)
    want = np.asarray(te.encode(params, cfg, ids, mask))
    mesh = make_mesh(jax.devices(), model_parallel=4)
    got = np.asarray(jax.jit(
        lambda p, i, a: sequence_parallel_encode(p, cfg, i, a, mesh=mesh,
                                                 ring=True))(
        params, ids, mask))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("sp", [2, 4])
def test_sp_encode_deberta_matches_unsplit(rng, sp):
    """Disentangled attention under SP: local Q rows vs all-gathered K/V,
    one-hot selections offset by the rank's absolute row position."""
    from mmd_tpu.models import deberta as D
    from mmd_tpu.parallel.sp import sequence_parallel_encode_deberta

    cfg = dataclasses.replace(D.DEBERTA_TEST, compute_dtype="float32")
    params = D.init_deberta(jax.random.key(4), cfg)
    ids, mask = _inputs(rng)
    want = np.asarray(D.deberta_encode(params, cfg, ids, mask))
    mesh = make_mesh(jax.devices(), model_parallel=sp)
    got = np.asarray(jax.jit(
        lambda p, i, a: sequence_parallel_encode_deberta(
            p, cfg, i, a, mesh=mesh))(params, ids, mask))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("sp", [2, 4])
def test_sp_ring_deberta_matches_unsplit(rng, sp):
    """Ring-rotated K/V + per-block positional selections == the unsplit
    disentangled attention (up to fp reassociation)."""
    from mmd_tpu.models import deberta as D
    from mmd_tpu.parallel.sp import sequence_parallel_encode_deberta

    cfg = dataclasses.replace(D.DEBERTA_TEST, compute_dtype="float32")
    params = D.init_deberta(jax.random.key(8), cfg)
    ids, mask = _inputs(rng)
    mesh = make_mesh(jax.devices(), model_parallel=sp)
    for m in (mask, None):
        want = np.asarray(D.deberta_encode(params, cfg, ids, m))
        got = np.asarray(jax.jit(
            lambda p, i, a: sequence_parallel_encode_deberta(
                p, cfg, i, a, mesh=mesh, ring=True))(params, ids, m))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_sp_encode_deberta_no_mask(rng):
    from mmd_tpu.models import deberta as D
    from mmd_tpu.parallel.sp import sequence_parallel_encode_deberta

    cfg = dataclasses.replace(D.DEBERTA_TEST, compute_dtype="float32")
    params = D.init_deberta(jax.random.key(5), cfg)
    ids, _ = _inputs(rng)
    want = np.asarray(D.deberta_encode(params, cfg, ids))
    mesh = make_mesh(jax.devices(), model_parallel=2)
    got = np.asarray(sequence_parallel_encode_deberta(params, cfg, ids,
                                                      mesh=mesh))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_sp_validates_divisibility(rng):
    import mmd_tpu.models.text_encoder as te

    cfg = _cfg()
    params = te.init_text_encoder(jax.random.key(3), cfg)
    ids, mask = _inputs(rng, t=12)
    mesh = make_mesh(jax.devices(), model_parallel=8)
    with pytest.raises(ValueError, match="seq len"):
        sequence_parallel_encode(params, cfg, ids, mask, mesh=mesh)
