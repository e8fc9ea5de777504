"""Multi-head attention: Pallas fused kernel + jnp reference path.

Semantics follow the reference's stateless MHA (reference
src/model/layers.py:24-58): the caller passes ALREADY-PROJECTED Q, K, V; this
op reshapes to heads, does softmax(QK^T/sqrt(d_head))V (non-causal), and the
caller applies the output projection. The reference's `fused_attn` flag
(layers.py:44-49 F.scaled_dot_product_attention vs :50-54 explicit path)
maps here to Pallas-kernel vs jnp path.

TPU notes:
  * softmax statistics accumulate in float32 regardless of compute dtype;
  * the Pallas kernel fuses QK^T -> softmax -> PV in VMEM, one HBM round
    trip for the whole op. Sequence lengths in this workload are <= 512
    query x <= 512 kv, so a q-blocked kernel with the full kv in VMEM is
    both simple and bandwidth-optimal; the kv loop seam for longer
    contexts lives in `_attn_kernel` (extend the fori_loop over kv blocks).
  * attention-weight dropout (train-time, reference layers.py:53) runs in
    the jnp path; the Pallas path is used when dropout is inactive.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    b, t, d = x.shape
    return x.reshape(b, t, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    b, h, t, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dh)


def attention_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jax.Array:
    """jnp attention over (B, T, D) q and (B, S, D) k/v. Returns (B, T, D)."""
    orig_dtype = q.dtype
    qh = _split_heads(q, num_heads)
    kh = _split_heads(k, num_heads)
    vh = _split_heads(v, num_heads)
    dh = qh.shape[-1]
    scores = jnp.einsum(
        "bhtd,bhsd->bhts", qh, kh, preferred_element_type=jnp.float32
    ) / math.sqrt(dh)
    weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        if dropout_rng is None:
            raise ValueError("dropout_rng required for non-deterministic attention")
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0)
    ctx = jnp.einsum(
        "bhts,bhsd->bhtd",
        weights.astype(vh.dtype),
        vh,
        preferred_element_type=jnp.float32,
    )
    return _merge_heads(ctx).astype(orig_dtype)


# ----------------------------------------------------------------------------
# Pallas fused kernel
# ----------------------------------------------------------------------------

# VMEM budget per program (bytes), conservatively below the ~16 MB/core
# scoped limit to leave room for Mosaic's double-buffered pipeline copies.
_VMEM_BUDGET = 10 * 1024 * 1024


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale: float):
    # Blocks: q (G, block_q, dh), k/v (G, S, dh). Dots stay in the input
    # dtype (bf16 on the fast MXU path) and accumulate in float32; softmax
    # statistics are float32.
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * sm_scale                                 # (G, block_q, S) fp32
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) / l
    o_ref[:] = o.astype(o_ref.dtype)


def _vmem_bytes(g: int, block_q: int, s: int, dh: int, itemsize: int) -> int:
    """Estimated per-program VMEM: double-buffered q/k/v/out blocks plus the
    fp32 scores and exp(p) intermediates."""
    io = 2 * itemsize * (g * block_q * dh * 2 + g * s * dh * 2)
    scores = 2 * 4 * g * block_q * s  # s and p, both fp32
    return io + scores


def _pick_tiles(bh: int, t: int, s: int, dh: int, itemsize: int) -> tuple[int, int]:
    """Choose (G batch-heads per program, block_q) under the VMEM budget,
    preferring large G (amortizes grid overhead) then large block_q."""
    for g in (16, 8, 4, 2, 1):
        if bh % g != 0:
            continue
        block_q = t
        while (_vmem_bytes(g, block_q, s, dh, itemsize) > _VMEM_BUDGET
               and block_q > 128):
            block_q //= 2
        while t % block_q != 0:
            block_q //= 2
        if _vmem_bytes(g, block_q, s, dh, itemsize) <= _VMEM_BUDGET:
            return g, block_q
    return 1, min(t, 128)


def _flash_fwd(q3: jax.Array, k3: jax.Array, v3: jax.Array) -> jax.Array:
    """q3: (BH, T, dh), k3/v3: (BH, S, dh) -> (BH, T, dh)."""
    bh, t, dh = q3.shape
    s = k3.shape[1]
    g, block_q = _pick_tiles(bh, t, s, dh, q3.dtype.itemsize)
    sm_scale = 1.0 / math.sqrt(dh)
    grid = (bh // g, t // block_q)
    # Interpret on non-TPU backends so the same code path runs under the
    # 8-device CPU test mesh.
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        functools.partial(_attn_kernel, sm_scale=sm_scale),
        out_shape=jax.ShapeDtypeStruct((bh, t, dh), q3.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((g, block_q, dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, s, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, s, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, block_q, dh), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * t * s * dh,
            bytes_accessed=(q3.size + k3.size + v3.size) * q3.dtype.itemsize * 2,
            transcendentals=bh * t * s,
        ),
        interpret=interpret,
    )(q3, k3, v3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_attention(q, k, v, num_heads):
    qh = _split_heads(q, num_heads)
    kh = _split_heads(k, num_heads)
    vh = _split_heads(v, num_heads)
    b, h, t, dh = qh.shape
    s = kh.shape[2]
    o = _flash_fwd(
        qh.reshape(b * h, t, dh), kh.reshape(b * h, s, dh),
        vh.reshape(b * h, s, dh),
    )
    return _merge_heads(o.reshape(b, h, t, dh))


def _fused_attention_fwd(q, k, v, num_heads):
    return _fused_attention(q, k, v, num_heads), (q, k, v)


def _fused_attention_bwd(num_heads, res, g):
    # Recompute-based backward through the jnp reference math. XLA fuses this
    # well; a dedicated Pallas backward kernel is the seam for longer
    # sequences.
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: attention_reference(q_, k_, v_, num_heads), q, k, v
    )
    return vjp(g)


_fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    fused: bool = False,
) -> jax.Array:
    """Attention core (no projections), (B,T,D) x (B,S,D) -> (B,T,D)."""
    use_dropout = dropout_rate > 0.0 and not deterministic
    if fused and not use_dropout:
        return _fused_attention(q, k, v, num_heads)
    return attention_reference(
        q, k, v, num_heads,
        dropout_rate=dropout_rate,
        dropout_rng=dropout_rng,
        deterministic=deterministic,
    )
