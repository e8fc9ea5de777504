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


def test_int8_topk_top1_and_recall(rng):
    """int8 corpus scoring: with a real margin (query = corpus row + small
    noise) top-1 must match the exact path; on random near-tie data
    recall@10 stays high (quantization step ~1/127 per side)."""
    N, D, K = 1000, 256, 10
    corpus = rng.standard_normal((N, D)).astype(np.float32)
    picks = rng.integers(0, N, 16)
    queries = (corpus[picks]
               + 0.01 * rng.standard_normal((16, D))).astype(np.float32)

    q8, sc = jax.jit(lambda f: T.quantize_rows_int8(T.l2_normalize(f)))(
        jnp.asarray(corpus))
    s8, i8 = T.dense_topk_int8(jnp.asarray(queries), q8, sc, K)
    s_ref, i_ref = T.dense_topk(jnp.asarray(queries),
                                jnp.asarray(corpus), K)
    i8, i_ref = np.asarray(i8), np.asarray(i_ref)
    np.testing.assert_array_equal(i8[:, 0], picks)          # planted top-1
    recall = np.mean([len(set(a) & set(b)) / K
                      for a, b in zip(i8, i_ref)])
    assert recall >= 0.9, recall
    # reconstruction: q * scale approximates the normalized rows to 1/127
    rec = np.asarray(q8, np.float32) * np.asarray(sc)[:, None]
    ref = np.asarray(T.l2_normalize(jnp.asarray(corpus)), np.float32)
    assert np.abs(rec - ref).max() <= (np.asarray(sc).max() * 0.51)


def test_int8_topk_preserves_duplicate_ties(rng):
    """Duplicate corpus rows quantize identically, so the exact-score
    dedup heuristic (reference im2im_retrieval.py:94-103) survives the
    int8 path: the duplicates' scores are EXACTLY equal."""
    N, D = 64, 128
    corpus = rng.standard_normal((N, D)).astype(np.float32)
    corpus[20] = corpus[7]
    corpus[33] = corpus[7]
    q8, sc = T.quantize_rows_int8(T.l2_normalize(jnp.asarray(corpus)))
    query = (corpus[7] + 0.001 * rng.standard_normal(D)).astype(np.float32)
    s, i = T.dense_topk_int8(jnp.asarray(query[None]), q8, sc, 5)
    s, i = np.asarray(s)[0], np.asarray(i)[0]
    assert set(i[:3]) == {7, 20, 33}
    assert s[0] == s[1] == s[2]
    ds, di = T.exact_score_dedup(s, i, 5)
    assert sum(1 for j in di if j in (7, 20, 33)) == 1
