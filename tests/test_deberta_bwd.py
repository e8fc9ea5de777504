"""Hand-derived Pallas backward for the DeBERTa disentangled-attention
kernel (models/deberta.py::_deberta_attn_bwd_kernel, interpret mode here).

The forward's strided diagonal roll is a permutation whose transpose is
another strided roll; everything else is standard masked-softmax
attention backward. Gradients of the custom_vjp wrapper must equal
autodiff of an operand-level jnp oracle implementing the identical math
— including the positional-TABLE grads (dPK/dPQ accumulate over the
batch grid) and masked-column zeroing.

Geometry note: interpret mode compiles the kernel body as ONE XLA:CPU
computation; above ~(t=192, 6 heads) LLVM segfaults on the unrolled
graph (compile-time crash, not a math/Mosaic property — the fwd kernel
with the same loop structure compiles and runs at T=512 on real TPU).
Hence t <= 128 here; benchmarks/validate_deberta_bwd_tpu.py covers the
production geometry on hardware.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmd_tpu.models import deberta as D


def _oracle(q, k, v, pk, pq, mask, num_heads, scale):
    """Same math as the kernel at the operand level (selection as a
    take_along_axis over the (T-1-t+s) mod 2T diagonal index)."""
    b, t, d = q.shape
    h = num_heads
    dh = d // h
    qh = q.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
    pkh = pk.reshape(2 * t, h, dh).transpose(1, 0, 2)      # (h, 2T, dh)
    pqh = pq.reshape(2 * t, h, dh).transpose(1, 0, 2)
    s = jnp.einsum("bhtd,bhsd->bhts", qh, kh)
    c2p = jnp.einsum("bhtd,hjd->bhtj", qh, pkh)            # (b, h, t, 2T)
    p2c = jnp.einsum("bhsd,hjd->bhsj", kh, pqh)
    tt = np.arange(t)[:, None]
    ss = np.arange(t)[None, :]
    idx = jnp.asarray((t - 1 - tt + ss) % (2 * t))[None, None]
    s = (s + jnp.take_along_axis(c2p, idx, axis=3)
         + jnp.swapaxes(jnp.take_along_axis(p2c, idx, axis=3), -1, -2))
    s = jnp.where(mask[:, None, None, :].astype(bool), s * scale,
                  jnp.finfo(jnp.float32).min)
    w = jax.nn.softmax(s, axis=-1)
    ctx = jnp.einsum("bhts,bhsd->bhtd", w, vh)
    return ctx.transpose(0, 2, 1, 3).reshape(b, t, d)


@pytest.mark.parametrize("t,heads,dim", [(64, 2, 64), (128, 4, 128)])
def test_deberta_trainable_kernel_grads_match_oracle(rng, t, heads, dim):
    b = 2
    scale = 1.0 / math.sqrt((dim // heads) * 3.0)
    q = jnp.asarray(rng.standard_normal((b, t, dim)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, dim)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, dim)), jnp.float32)
    pk = jnp.asarray(rng.standard_normal((2 * t, dim)), jnp.float32)
    pq = jnp.asarray(rng.standard_normal((2 * t, dim)), jnp.float32)
    m = np.ones((b, t), np.int32)
    m[1, t - 11:] = 0                                      # padded tail
    mask = jnp.asarray(m)

    def loss_kernel(q, k, v, pk, pq):
        out = D._deberta_attn_trainable(q, k, v, pk, pq, mask, heads, scale)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_oracle(q, k, v, pk, pq):
        out = _oracle(q, k, v, pk, pq, mask, heads, scale)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    # primal equality first
    np.testing.assert_allclose(
        float(loss_kernel(q, k, v, pk, pq)),
        float(loss_oracle(q, k, v, pk, pq)), rtol=1e-5)

    gk = jax.jit(jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4)))(
        q, k, v, pk, pq)
    go = jax.jit(jax.grad(loss_oracle, argnums=(0, 1, 2, 3, 4)))(
        q, k, v, pk, pq)
    for name, a, b_ in zip(("dq", "dk", "dv", "dPK", "dPQ"), gk, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-4, atol=5e-4, err_msg=name)


def test_deberta_layer_fused_train_grads_match_jnp(rng):
    """Full deberta_layer: fused (custom_vjp kernel, interpret) vs the jnp
    one-hot path — same layer grads, so fine-tuning can keep the kernel
    (DebertaConfig.fused_train)."""
    import dataclasses

    cfg = D.DebertaConfig(vocab_size=120, hidden_size=64, num_layers=1,
                          num_heads=2, intermediate_size=96,
                          max_position=64, position_buckets=16,
                          compute_dtype="float32")
    t = 64
    params = D.init_deberta(jax.random.key(0), cfg)
    p = params["layers"][0]
    c2p_map, p2c_map = D._diag_maps(t, cfg)
    x = jnp.asarray(rng.standard_normal((2, t, cfg.hidden_size)),
                    jnp.float32)
    rel = jnp.asarray(rng.standard_normal((cfg.pos_ebd_size * 2,
                                           cfg.hidden_size)), jnp.float32)
    m = np.ones((2, t), np.int32)
    m[0, 50:] = 0
    mask = jnp.asarray(m)

    def loss(p, x, rel, fused):
        y = D.deberta_layer(p, cfg, x, rel, c2p_map, p2c_map, mask,
                            jnp.float32, fused)
        return jnp.sum(y ** 2)

    (lf, gf) = jax.value_and_grad(lambda *a: loss(*a, True),
                                  argnums=(0, 1, 2))(p, x, rel)
    (lj, gj) = jax.value_and_grad(lambda *a: loss(*a, False),
                                  argnums=(0, 1, 2))(p, x, rel)
    assert float(lf) == pytest.approx(float(lj), rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gj)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-4)
