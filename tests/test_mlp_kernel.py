"""Fused MLP kernel (ops/mlp.py): the rate=0 path must match the plain
XLA composition (forward AND grads) in interpret mode. The dropout path
needs the TPU PRNG — validated on hardware by benchmarks/validate_mlp_tpu.py
(committed artifact benchmarks/MLP_TPU_VALIDATION.json)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmd_tpu.models import layers as L
from mmd_tpu.ops.mlp import fused_mlp


@pytest.fixture(scope="module")
def setup(rng=None):
    rng = np.random.default_rng(3)
    d, f = 256, 512
    p = L.mlp_init(jax.random.key(1), d, f / d)
    x = jnp.asarray(rng.standard_normal((4, 16, d)), jnp.float32)
    return p, x, d, f


def _plain(p, x, dtype):
    h = L.linear(p["fc1"], x, dtype)
    h = jax.nn.gelu(h, approximate=True)   # kernel uses the tanh form
    return L.linear(p["fc2"], h, dtype)


def test_fused_mlp_matches_plain_forward(setup):
    p, x, d, f = setup
    want = np.asarray(_plain(p, x, jnp.float32))
    got = np.asarray(fused_mlp(x, p["fc1"]["w"], p["fc1"]["b"],
                               p["fc2"]["w"], p["fc2"]["b"],
                               rate=0.0, dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_mlp_matches_plain_grads(setup):
    p, x, d, f = setup

    def loss_fused(p, x):
        y = fused_mlp(x, p["fc1"]["w"], p["fc1"]["b"],
                      p["fc2"]["w"], p["fc2"]["b"],
                      rate=0.0, dtype=jnp.float32)
        return (y * jnp.cos(y)).sum()

    def loss_plain(p, x):
        y = _plain(p, x, jnp.float32)
        return (y * jnp.cos(y)).sum()

    gf = jax.grad(loss_fused, argnums=(0, 1))(p, x)
    gp = jax.grad(loss_plain, argnums=(0, 1))(p, x)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_fused_dropout_gate_off_tpu(setup):
    """ops/dropout.use_fused must stay False off-TPU so the NumPy-oracle
    paths keep the jax.random.bernoulli masks; the kernel itself is
    hardware-validated (benchmarks/validate_mlp_tpu.py check 5)."""
    from mmd_tpu.ops.dropout import use_fused
    p, x, d, f = setup
    assert jax.default_backend() != "tpu"
    assert not use_fused(x, 0.1, deterministic=False)
    assert not use_fused(x, 0.0, deterministic=False)   # rate gate
    # dropout through layers keeps working and preserves scale on average
    y = L.dropout(x, 0.5, jax.random.key(7), deterministic=False)
    assert y.shape == x.shape
    kept = np.asarray(y) != 0
    np.testing.assert_allclose(kept.mean(), 0.5, atol=0.05)
    np.testing.assert_allclose(np.asarray(y)[kept],
                               np.asarray(x)[kept] * 2.0, rtol=1e-6)


def test_layers_mlp_unchanged_off_tpu(setup):
    """L.mlp must keep the plain path on CPU (fused path is TPU-gated)."""
    p, x, d, f = setup
    key = jax.random.key(0)
    y = L.mlp(p, x, 0.1, key, deterministic=False, dtype=jnp.float32)
    assert y.shape == x.shape
    # deterministic path has no dropout and matches plain erf composition
    y2 = L.mlp(p, x, 0.1, None, deterministic=True, dtype=jnp.float32)
    h = L.linear(p["fc1"], x, jnp.float32)
    want = L.linear(p["fc2"], jax.nn.gelu(h, approximate=False), jnp.float32)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
