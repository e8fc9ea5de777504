"""Functional building blocks: Linear, LayerNorm, MLP, dropout.

Pure param-pytree style: every layer is an `init(key, ...) -> dict` plus an
`apply(params, x, ...) -> array` pair. Params live in float32; matmuls run in
the configured compute dtype (bfloat16 on TPU); LayerNorm and softmax
accumulate in float32.

Math parity targets (reference src/model/layers.py):
  MLP   = Linear(D -> D*ratio) -> GELU(exact) -> Dropout -> Linear(-> D) -> Dropout
  init  = Xavier-uniform weights, zero bias; LN scale=1 bias=0
          (reference model.py:416-424)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def xavier_uniform(key: jax.Array, in_dim: int, out_dim: int) -> jax.Array:
    bound = (6.0 / (in_dim + out_dim)) ** 0.5
    return jax.random.uniform(
        key, (in_dim, out_dim), jnp.float32, minval=-bound, maxval=bound
    )


# -- Linear -------------------------------------------------------------------

def linear_init(key: jax.Array, in_dim: int, out_dim: int) -> dict:
    return {
        "w": xavier_uniform(key, in_dim, out_dim),
        "b": jnp.zeros((out_dim,), jnp.float32),
    }


def linear(params: dict, x: jax.Array, dtype: jnp.dtype = jnp.float32) -> jax.Array:
    y = jnp.dot(
        x.astype(dtype), params["w"].astype(dtype),
        preferred_element_type=jnp.float32,
    )
    return (y + params["b"].astype(jnp.float32)).astype(dtype)


# -- LayerNorm ----------------------------------------------------------------

def layernorm_init(dim: int) -> dict:
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def layernorm(params: dict, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * params["scale"] + params["bias"]).astype(orig_dtype)


# -- Dropout ------------------------------------------------------------------

def dropout(
    x: jax.Array,
    rate: float,
    rng: Optional[jax.Array],
    deterministic: bool,
    fused_ok: bool = True,
) -> jax.Array:
    if deterministic or rate <= 0.0:
        return x
    if rng is None:
        raise ValueError("dropout requires an rng when non-deterministic")
    from mmd_tpu.ops.dropout import fused_dropout, use_fused
    if fused_ok and use_fused(x, rate, deterministic):
        # TPU: in-kernel PRNG mask, regenerated bit-exactly in the backward
        # (ops/dropout.py) — nothing mask-sized touches HBM in either pass.
        return fused_dropout(x, rate, rng)
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    # Multiplicative-mask form (equivalent to where(keep, x/q, 0) up to one
    # rounding of the reciprocal in the compute dtype):
    # the backward is one multiply by the saved mask instead of a PRNG
    # regeneration + select pair — measured 5.18 -> ~2.8 ms on the
    # (256, 512, 1024) MLP fwd+bwd.
    scale = jnp.asarray(1.0 / (1.0 - rate), x.dtype)
    return x * (keep.astype(x.dtype) * scale)


# -- MLP ----------------------------------------------------------------------

def mlp_init(key: jax.Array, embed_dim: int, mlp_ratio: float = 4.0) -> dict:
    hidden = int(embed_dim * mlp_ratio)
    k1, k2 = jax.random.split(key)
    return {"fc1": linear_init(k1, embed_dim, hidden),
            "fc2": linear_init(k2, hidden, embed_dim)}


def mlp(
    params: dict,
    x: jax.Array,
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    dtype: jnp.dtype = jnp.float32,
    fused_ok: bool = True,
    tp_mesh=None,
) -> jax.Array:
    """GELU MLP (reference layers.py:5-21, torch nn.GELU = erf-exact).

    Under float32 the erf form is used (bit-parity with the NumPy oracles
    and torch). Under bfloat16 the tanh approximation is used: its max
    deviation from erf-GELU (~5e-4 relative) is below bf16 resolution
    (eps ~4e-3), while on TPU the erf polynomial costs ~2.25 ms per
    (256, 512, 1024) activation vs ~0 for tanh, which fuses into the matmul
    epilogue (measured 2026-08-16: 2.886 vs 0.632 ms per MLP forward).

    When dropout is ACTIVE on TPU (bf16, 128-aligned dims), the whole block
    runs as one Pallas kernel with in-kernel PRNG masks (ops/mlp.fused_mlp):
    bernoulli mask bits are otherwise the dominant HBM traffic of the
    trained MLP (5.2 -> ~2 ms fwd+bwd at (256, 512, 256))."""
    use_fused = (
        fused_ok
        and dropout_rate > 0.0 and not deterministic
        and jnp.dtype(dtype) == jnp.bfloat16
        and jax.default_backend() == "tpu"
        and x.shape[-1] % 128 == 0
        and params["fc1"]["w"].shape[1] % 128 == 0
    )
    if use_fused:
        from mmd_tpu.ops.mlp import fused_mlp
        return fused_mlp(x, params["fc1"]["w"], params["fc1"]["b"],
                         params["fc2"]["w"], params["fc2"]["b"],
                         rate=dropout_rate, rng=rng, dtype=dtype,
                         tp_mesh=tp_mesh)
    r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
    # Under TP the hidden activation is model-sharded; the elementwise
    # Pallas dropout cannot be GSPMD-partitioned, so fall to bernoulli.
    elem_ok = tp_mesh is None
    h = linear(params["fc1"], x, dtype)
    h = jax.nn.gelu(h, approximate=(jnp.dtype(dtype) == jnp.bfloat16))
    h = dropout(h, dropout_rate, r1, deterministic, fused_ok=elem_ok)
    h = linear(params["fc2"], h, dtype)
    return dropout(h, dropout_rate, r2, deterministic, fused_ok=elem_ok)


# -- Classifier-head MLPs (ReLU stacks; reference model.py:252-288) -----------

def head_init(key: jax.Array, dims: list[int]) -> dict:
    keys = jax.random.split(key, len(dims) - 1)
    return {f"fc{i}": linear_init(keys[i], dims[i], dims[i + 1])
            for i in range(len(dims) - 1)}


def head_apply(
    params: dict,
    x: jax.Array,
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    dtype: jnp.dtype = jnp.float32,
    fused_dropout_ok: bool = True,
) -> jax.Array:
    """Linear -> ReLU -> Dropout between every pair; final Linear bare."""
    n = len(params)
    rngs = (jax.random.split(rng, n) if rng is not None else [None] * n)
    for i in range(n):
        x = linear(params[f"fc{i}"], x, dtype)
        if i < n - 1:
            x = jax.nn.relu(x)
            x = dropout(x, dropout_rate, rngs[i], deterministic,
                        fused_ok=fused_dropout_ok)
    return x
