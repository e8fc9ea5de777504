"""Retrieval top-k: exact parity with brute-force cosine, sharded = single."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmd_tpu.ops import topk as T


def brute_force_cosine_topk(q, c, k):
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    cn = c / np.linalg.norm(c, axis=-1, keepdims=True)
    scores = qn @ cn.T
    idx = np.argsort(-scores, axis=1)[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx


def test_dense_topk_matches_bruteforce(rng):
    q = rng.standard_normal((5, 32)).astype(np.float32)
    c = rng.standard_normal((200, 32)).astype(np.float32)
    s, i = T.dense_topk(jnp.asarray(q), jnp.asarray(c), 10)
    bs, bi = brute_force_cosine_topk(q, c, 10)
    np.testing.assert_allclose(np.asarray(s), bs, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), bi)


def test_sharded_topk_matches_dense(mesh8, rng):
    q = rng.standard_normal((7, 16)).astype(np.float32)
    c = rng.standard_normal((640, 16)).astype(np.float32)
    k = 12
    fn = T.make_sharded_topk(mesh8, "data", n_corpus=640, k=k)
    from jax.sharding import NamedSharding, PartitionSpec as P
    qd = jax.device_put(jnp.asarray(q), NamedSharding(mesh8, P()))
    cd = jax.device_put(jnp.asarray(c), NamedSharding(mesh8, P("data")))
    s, i = fn(qd, cd)
    ds, di = T.dense_topk(jnp.asarray(q), jnp.asarray(c), k)
    np.testing.assert_allclose(np.asarray(s), np.asarray(ds), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(di))


def test_dot_product_mode(rng):
    q = rng.standard_normal((3, 8)).astype(np.float32)
    c = rng.standard_normal((50, 8)).astype(np.float32)
    s, i = T.dense_topk(jnp.asarray(q), jnp.asarray(c), 5, normalize=False)
    scores = q @ c.T
    bi = np.argsort(-scores, axis=1)[:, :5]
    np.testing.assert_array_equal(np.asarray(i), bi)


def test_exact_score_dedup():
    s = np.array([0.9, 0.9, 0.8, 0.7, 0.7, 0.6])
    i = np.array([1, 2, 3, 4, 5, 6])
    out_s, out_i = T.exact_score_dedup(s, i, k=3)
    assert out_s == [0.9, 0.8, 0.7]
    assert out_i == [1, 3, 4]
