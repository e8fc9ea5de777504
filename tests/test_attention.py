"""Pallas fused attention vs jnp reference, and vs a NumPy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmd_tpu.ops.attention import attention_reference, multi_head_attention


def numpy_mha(q, k, v, num_heads):
    """Independent NumPy oracle: softmax(QK^T/sqrt(dh))V over heads."""
    b, t, d = q.shape
    s = k.shape[1]
    dh = d // num_heads
    qh = q.reshape(b, t, num_heads, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(b, s, num_heads, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(b, s, num_heads, dh).transpose(0, 2, 1, 3)
    scores = qh @ kh.transpose(0, 1, 3, 2) / np.sqrt(dh)
    scores = scores - scores.max(-1, keepdims=True)
    w = np.exp(scores)
    w = w / w.sum(-1, keepdims=True)
    ctx = w @ vh
    return ctx.transpose(0, 2, 1, 3).reshape(b, t, d)


@pytest.mark.parametrize("t,s", [(64, 64), (512, 64), (64, 512), (512, 512)])
def test_reference_matches_numpy(rng, t, s):
    b, d, h = 2, 256, 8
    q = rng.standard_normal((b, t, d)).astype(np.float32)
    k = rng.standard_normal((b, s, d)).astype(np.float32)
    v = rng.standard_normal((b, s, d)).astype(np.float32)
    got = np.asarray(attention_reference(jnp.asarray(q), jnp.asarray(k),
                                         jnp.asarray(v), h))
    want = numpy_mha(q, k, v, h)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("t,s", [(64, 64), (512, 64), (64, 512), (512, 512)])
def test_fused_matches_reference(rng, t, s):
    b, d, h = 2, 256, 8
    q = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    fused = multi_head_attention(q, k, v, h, fused=True)
    ref = multi_head_attention(q, k, v, h, fused=False)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_grads_close_to_reference(rng):
    b, t, s, d, h = 2, 64, 64, 256, 8
    q = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)

    def loss(fn):
        return lambda q_, k_, v_: jnp.sum(fn(q_, k_, v_, h) ** 2)

    g_fused = jax.grad(loss(lambda *a, **kw: multi_head_attention(*a, fused=True)),
                       argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss(lambda *a, **kw: multi_head_attention(*a, fused=False)),
                     argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("t,s", [(512, 64), (64, 512), (512, 512)])
def test_flash_backward_matches_reference_all_shapes(rng, t, s):
    b, d, h = 2, 256, 8
    q = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    co = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)

    def loss(fused):
        return lambda q_, k_, v_: jnp.sum(
            multi_head_attention(q_, k_, v_, h, fused=fused) * co)

    gf = jax.grad(loss(True), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss(False), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


def test_attention_dropout_statistics(rng):
    # Dropout on attention weights must preserve the expected value.
    b, t, d, h = 4, 32, 64, 4
    q = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    v = jnp.ones((b, t, d), jnp.float32)
    det = multi_head_attention(q, k, v, h)
    outs = []
    for i in range(32):
        outs.append(multi_head_attention(
            q, k, v, h, dropout_rate=0.3,
            dropout_rng=jax.random.key(i), deterministic=False))
    mean = np.mean(np.stack([np.asarray(o) for o in outs]), axis=0)
    # v = ones -> every output entry is ~1; dropout keeps the mean near 1.
    np.testing.assert_allclose(mean, np.asarray(det), rtol=0.15, atol=0.15)


def test_fused_key_mask_matches_additive_jnp(rng):
    """Fused kernel's in-kernel key-padding bias == the jnp additive-mask
    path (fwd + grads), including a fully 128-aligned S (packed-head
    route) and a ragged valid-length per row."""
    b, t, s, d, h = 4, 64, 128, 256, 8
    q = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    co = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    valid = np.array([s, s - 17, s // 2, 3])
    key_mask = jnp.asarray(
        np.arange(s)[None, :] < valid[:, None], jnp.int32)

    def loss(fused):
        return lambda q_, k_, v_: jnp.sum(multi_head_attention(
            q_, k_, v_, h, fused=fused, key_mask=key_mask) * co)

    of = multi_head_attention(q, k, v, h, fused=True, key_mask=key_mask)
    oj = multi_head_attention(q, k, v, h, fused=False, key_mask=key_mask)
    np.testing.assert_allclose(np.asarray(of), np.asarray(oj),
                               rtol=2e-5, atol=2e-5)
    gf = jax.grad(loss(True), argnums=(0, 1, 2))(q, k, v)
    gj = jax.grad(loss(False), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gj):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)
    # masked keys receive zero gradient
    np.testing.assert_allclose(np.asarray(gf[1][3, 3:]), 0.0, atol=1e-6)


def test_transformer_key_mask_routes_fused(rng):
    """transformer_forward with a pure padding mask must produce the same
    values whether attention runs fused (key_mask kernel path) or jnp."""
    import dataclasses
    from mmd_tpu.models.transformer import (
        TransformerConfig, init_transformer, transformer_forward,
    )
    cfg = TransformerConfig(vocab_size=130, hidden_size=64, num_layers=2,
                            num_heads=2, intermediate_size=128,
                            max_position=64, compute_dtype="float32")
    params = init_transformer(jax.random.key(0), cfg)
    ids = jnp.asarray(rng.integers(0, 130, (2, 16)), jnp.int32)
    mask = jnp.asarray([[1] * 16, [1] * 9 + [0] * 7], jnp.int32)
    yf = transformer_forward(params, cfg, ids, attention_mask=mask)
    yj = transformer_forward(params, dataclasses.replace(cfg, fused_attn=False),
                             ids, attention_mask=mask)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yj),
                               rtol=5e-5, atol=5e-5)


def test_fused_unaligned_s_pads_to_packed_path(rng):
    """S off the 128 boundary is padded with -1e9-biased keys inside
    multi_head_attention so head-packing engages; values and grads must
    match the jnp path, including combined with a ragged key_mask."""
    b, t, s, d, h = 2, 64, 80, 256, 8    # s=80 -> padded to 128, g=4
    q = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    co = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    key_mask = jnp.asarray(
        np.arange(s)[None, :] < np.array([s, 37])[:, None], jnp.int32)

    for km in (None, key_mask):
        of = multi_head_attention(q, k, v, h, fused=True, key_mask=km)
        oj = multi_head_attention(q, k, v, h, fused=False, key_mask=km)
        np.testing.assert_allclose(np.asarray(of), np.asarray(oj),
                                   rtol=2e-5, atol=2e-5)

        def loss(fused):
            return lambda q_, k_, v_: jnp.sum(multi_head_attention(
                q_, k_, v_, h, fused=fused, key_mask=km) * co)

        gf = jax.grad(loss(True), argnums=(0, 1, 2))(q, k, v)
        gj = jax.grad(loss(False), argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gf, gj):
            assert a.shape == b_.shape  # padding sliced back off the grads
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-4, atol=2e-4)


def test_fused_head_count_not_divisible_by_group(rng):
    """num_heads=6 with dh=32 would pack g=4 and slice past D with a
    ragged trailing group (the quality-suite crash); _group_size must
    shrink g to divide the head count."""
    from mmd_tpu.ops.attention import _group_size
    assert _group_size(32, 512, 8) == 4
    assert _group_size(32, 512, 6) == 2
    assert _group_size(32, 512, 3) == 1
    assert _group_size(64, 512, 6) == 2
    b, t, d, h = 2, 128, 192, 6   # dh=32, 6 % 4 != 0
    q = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    of = multi_head_attention(q, k, v, h, fused=True)
    oj = multi_head_attention(q, k, v, h, fused=False)
    np.testing.assert_allclose(np.asarray(of), np.asarray(oj),
                               rtol=2e-5, atol=2e-5)


def test_fused_fully_masked_row_is_finite(rng):
    """A query row whose key_mask is all zero must yield finite output
    (zeros) and finite grads: the masked forward takes its shared max on
    the RAW scores, so every key underflows to exactly 0 and l == 0 —
    the 1/max(l, tiny) guard keeps 0 * inf out of the kernel."""
    b, t, s, d, h = 2, 128, 128, 128, 4
    q = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    key_mask = jnp.asarray(
        np.broadcast_to(np.array([1, 0])[:, None], (b, s)), jnp.int32)

    o = multi_head_attention(q, k, v, h, fused=True, key_mask=key_mask)
    assert bool(jnp.all(jnp.isfinite(o)))
    np.testing.assert_allclose(np.asarray(o[1]), 0.0, atol=0.0)

    def loss(q_, k_, v_):
        return jnp.sum(multi_head_attention(
            q_, k_, v_, h, fused=True, key_mask=key_mask) ** 2)

    for grad in jax.grad(loss, argnums=(0, 1, 2))(q, k, v):
        assert bool(jnp.all(jnp.isfinite(grad)))
