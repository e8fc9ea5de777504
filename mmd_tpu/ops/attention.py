"""Multi-head attention: Pallas fused kernel + jnp reference path.

Semantics follow the reference's stateless MHA (reference
src/model/layers.py:24-58): the caller passes ALREADY-PROJECTED Q, K, V; this
op reshapes to heads, does softmax(QK^T/sqrt(d_head))V (non-causal), and the
caller applies the output projection. The reference's `fused_attn` flag
(layers.py:44-49 F.scaled_dot_product_attention vs :50-54 explicit path)
maps here to Pallas-kernel vs jnp path.

TPU notes:
  * softmax statistics accumulate in float32 regardless of compute dtype;
  * the Pallas forward fuses QK^T -> softmax -> PV in VMEM (one HBM round
    trip) and also emits the row log-sum-exp; the Pallas backward recomputes
    scores from (q, k, lse) per q-block with fp32 dk/dv accumulation over
    revisited output blocks — nothing (T x S)-sized ever touches HBM;
  * train-time attention-weight dropout (reference layers.py:53) runs
    INSIDE the kernels via the on-chip PRNG on TPU (identical tiling +
    per-block seeds make the fwd/bwd masks bit-exact); on other backends it
    falls back to the jnp path;
  * head dims < 32 waste most of the 128-wide MXU lanes in a custom kernel
    and are routed to XLA instead.
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
_VMEM_BUDGET = 8 * 1024 * 1024


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, sm_scale: float):
    # Blocks: q (G, block_q, dh), k/v (G, S, dh). Dots stay in the input
    # dtype (bf16 on the fast MXU path) and accumulate in float32; softmax
    # statistics are float32. Also emits the row log-sum-exp for the
    # backward kernel.
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
    lse_ref[:] = m + jnp.log(l)


def _bwd_core(q, k, v, o, do, lse, keep, inv, sm_scale):
    """Shared flash-backward math for one (G, BQ, S) block. `keep`/`inv` are
    the dropout mask and 1/(1-rate) (None / 1.0 when dropout is off).
    Returns (dq, dk_partial, dv_partial) with the partials in fp32 for
    cross-q-block accumulation."""
    do = do.astype(jnp.float32)
    o = o.astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * sm_scale                                         # (G, BQ, S)
    p = jnp.exp(s - lse)                                 # softmax probs
    u = p if keep is None else jnp.where(keep, p * inv, 0.0)
    # D_i = sum_j p_j dL/dp_j = rowsum(do * o) (holds with dropout too)
    d_row = jnp.sum(do * o, axis=-1, keepdims=True)      # (G, BQ, 1)
    dob = do.astype(v.dtype)
    dv = jax.lax.dot_general(
        u.astype(v.dtype), dob, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (G, S, dh)
    dp = jax.lax.dot_general(
        dob, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (G, BQ, S)
    if keep is not None:
        dp = jnp.where(keep, dp * inv, 0.0)
    ds = (p * (dp - d_row) * sm_scale).astype(q.dtype)
    dq = jax.lax.dot_general(
        ds, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (G, BQ, dh)
    dk = jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (G, S, dh)
    return dq, dk, dv


def _accumulate_kv(dk_ref, dv_ref, dk, dv):
    """dk/dv output blocks are revisited across the q-block grid dim; init
    at j == 0 then accumulate (fp32 output buffers)."""
    @pl.when(pl.program_id(1) == 0)
    def _():
        dk_ref[:] = jnp.zeros_like(dk_ref)
        dv_ref[:] = jnp.zeros_like(dv_ref)
    dk_ref[:] += dk
    dv_ref[:] += dv


def _attn_bwd_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
                     dq_ref, dk_ref, dv_ref, *, sm_scale: float):
    """Flash backward, one (G, BQ) q block per program with the full kv in
    VMEM; scores recomputed from (q, k, lse) — nothing (T x S)-sized ever
    touches HBM."""
    dq, dk, dv = _bwd_core(q_ref[:], k_ref[:], v_ref[:], o_ref[:], do_ref[:],
                           lse_ref[:], None, 1.0, sm_scale)
    dq_ref[:] = dq.astype(dq_ref.dtype)
    _accumulate_kv(dk_ref, dv_ref, dk, dv)


def _pad128(x: int) -> int:
    """Mosaic pads the last (lane) dim to 128; VMEM sizing must use the
    PADDED extent or small head dims blow the budget 16x."""
    return ((x + 127) // 128) * 128


def _vmem_bytes(g: int, block_q: int, s: int, dh: int, itemsize: int) -> int:
    """Estimated per-program VMEM: double-buffered q/k/v/out blocks plus the
    (T, S)-sized intermediates (fp32 scores, exp, and the low-precision cast
    of p for the PV matmul — Mosaic keeps ~3 such live)."""
    io = 2 * itemsize * (g * block_q * _pad128(dh) * 2
                         + g * s * _pad128(dh) * 2)
    scores = 3 * 4 * g * block_q * _pad128(s)
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


def _flash_fwd(q3: jax.Array, k3: jax.Array, v3: jax.Array):
    """q3: (BH, T, dh), k3/v3: (BH, S, dh) -> (o (BH, T, dh), lse (BH, T))."""
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
        out_shape=(
            jax.ShapeDtypeStruct((bh, t, dh), q3.dtype),
            jax.ShapeDtypeStruct((bh, t, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((g, block_q, dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, s, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, s, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((g, block_q, dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, block_q, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * t * s * dh,
            bytes_accessed=(q3.size + k3.size + v3.size) * q3.dtype.itemsize * 2,
            transcendentals=bh * t * s,
        ),
        interpret=interpret,
    )(q3, k3, v3)


# Largest kv length the whole-kv-in-VMEM backward handles; beyond this the
# jnp recompute VJP takes over (seam for a kv-looped backward).
_BWD_MAX_T = 2048


def _bwd_tiles(bh: int, t: int, s: int) -> tuple[int, int]:
    """(G, BQ): ~9 live (BQ, S)-sized fp32 intermediates per program in the
    backward/dropout kernels (scores, p, u, dp, masked dp, ds + pipeline
    copies)."""
    budget = 6 * 1024 * 1024
    sp = _pad128(s)
    for g in (16, 8, 4, 2, 1):
        if bh % g != 0:
            continue
        bq = t
        while 9 * g * bq * sp * 4 > budget and bq > 128:
            bq //= 2
        while t % bq != 0:
            bq //= 2
        if 9 * g * bq * sp * 4 <= budget:
            return g, bq
    return 1, min(t, 128)


def _bwd_specs(bh, t, s, dh, g, bq, scalar_prefetch=False):
    """(in_specs for q/k/v/o/do/lse, out_specs for dq/dk/dv). dk/dv blocks
    are revisited across the q-block dim (index map constant in j)."""
    def im(f):
        if scalar_prefetch:
            return lambda i, j, *_: f(i, j)
        return lambda i, j: f(i, j)
    qblk = pl.BlockSpec((g, bq, dh), im(lambda i, j: (i, j, 0)),
                        memory_space=pltpu.VMEM)
    kblk = pl.BlockSpec((g, s, dh), im(lambda i, j: (i, 0, 0)),
                        memory_space=pltpu.VMEM)
    lblk = pl.BlockSpec((g, bq, 1), im(lambda i, j: (i, j, 0)),
                        memory_space=pltpu.VMEM)
    in_specs = [qblk, kblk, kblk, qblk, qblk, lblk]
    out_specs = (qblk, kblk, kblk)
    return in_specs, out_specs


def _flash_bwd(q3, k3, v3, o3, lse, do3):
    bh, t, dh = q3.shape
    s = k3.shape[1]
    g, bq = _bwd_tiles(bh, t, s)
    sm_scale = 1.0 / math.sqrt(dh)
    interpret = jax.default_backend() != "tpu"
    in_specs, out_specs = _bwd_specs(bh, t, s, dh, g, bq)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, sm_scale=sm_scale),
        out_shape=(
            jax.ShapeDtypeStruct(q3.shape, q3.dtype),
            jax.ShapeDtypeStruct(k3.shape, jnp.float32),  # fp32 accumulators
            jax.ShapeDtypeStruct(v3.shape, jnp.float32),
        ),
        grid=(bh // g, t // bq),
        in_specs=in_specs,
        out_specs=out_specs,
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * t * s * dh,
            bytes_accessed=(3 * q3.size + 2 * k3.size + 2 * v3.size)
            * q3.dtype.itemsize,
            transcendentals=bh * t * s,
        ),
        interpret=interpret,
    )(q3, k3, v3, o3, do3, lse)
    return dq, dk.astype(k3.dtype), dv.astype(v3.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_attention(q, k, v, num_heads):
    qh = _split_heads(q, num_heads)
    kh = _split_heads(k, num_heads)
    vh = _split_heads(v, num_heads)
    b, h, t, dh = qh.shape
    s = kh.shape[2]
    o, _ = _flash_fwd(
        qh.reshape(b * h, t, dh), kh.reshape(b * h, s, dh),
        vh.reshape(b * h, s, dh),
    )
    return _merge_heads(o.reshape(b, h, t, dh))


def _fused_attention_fwd(q, k, v, num_heads):
    qh = _split_heads(q, num_heads)
    kh = _split_heads(k, num_heads)
    vh = _split_heads(v, num_heads)
    b, h, t, dh = qh.shape
    s = kh.shape[2]
    q3 = qh.reshape(b * h, t, dh)
    k3 = kh.reshape(b * h, s, dh)
    v3 = vh.reshape(b * h, s, dh)
    o3, lse = _flash_fwd(q3, k3, v3)
    out = _merge_heads(o3.reshape(b, h, t, dh))
    return out, (q3, k3, v3, o3, lse, (b, h))


def _fused_attention_bwd(num_heads, res, g):
    q3, k3, v3, o3, lse, (b, h) = res
    bh, t, dh = q3.shape
    s = k3.shape[1]
    do3 = _split_heads(g, num_heads).reshape(bh, t, dh)
    if max(t, s) <= _BWD_MAX_T:
        dq3, dk3, dv3 = _flash_bwd(q3, k3, v3, o3, lse, do3)
    else:
        # jnp recompute fallback for long sequences
        def f(q_, k_, v_):
            o_, _ = _flash_fwd(q_, k_, v_)
            return o_
        _, vjp = jax.vjp(
            lambda q_, k_, v_: attention_reference(
                _merge_heads(q_.reshape(b, h, t, dh)),
                _merge_heads(k_.reshape(b, h, s, dh)),
                _merge_heads(v_.reshape(b, h, s, dh)), num_heads),
            q3, k3, v3)
        dq3, dk3, dv3 = vjp(g)

    def unsplit(x3, tt):
        return _merge_heads(x3.reshape(b, h, tt, dh))

    return unsplit(dq3, t), unsplit(dk3, s), unsplit(dv3, s)


_fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


# ----------------------------------------------------------------------------
# In-kernel dropout variant (TPU only)
# ----------------------------------------------------------------------------
# Attention-weight dropout generated by the on-chip PRNG inside the kernel:
# the (BH, T, S) mask never exists in HBM and the backward regenerates it
# bit-exactly (same seed + same per-program tiling in fwd and bwd). This is
# what makes train-time dropout (reference layers.py:53) ~free instead of
# materializing multi-GB threefry masks.


def _keep_mask(shape, rate: float):
    bits = pltpu.prng_random_bits(shape)
    threshold = jnp.uint32(min(int((1.0 - rate) * 4294967296.0), 4294967295))
    return pltpu.bitcast(bits, jnp.uint32) < threshold


def _drop_seed(seed_ref):
    """Unique per-program PRNG seed; the fwd and bwd kernels share tiling so
    the streams match bit-exactly."""
    pltpu.prng_seed(seed_ref[0]
                    + pl.program_id(0) * pl.num_programs(1)
                    + pl.program_id(1))


def _attn_drop_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                          *, sm_scale: float, rate: float):
    _drop_seed(seed_ref)
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * sm_scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    pnorm = p / l
    keep = _keep_mask(pnorm.shape, rate)
    u = jnp.where(keep, pnorm * (1.0 / (1.0 - rate)), 0.0)
    o = jax.lax.dot_general(
        u.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[:] = o.astype(o_ref.dtype)
    lse_ref[:] = m + jnp.log(l)


def _attn_drop_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, do_ref,
                          lse_ref, dq_ref, dk_ref, dv_ref,
                          *, sm_scale: float, rate: float):
    _drop_seed(seed_ref)
    keep = _keep_mask((q_ref.shape[0], q_ref.shape[1], k_ref.shape[1]), rate)
    dq, dk, dv = _bwd_core(q_ref[:], k_ref[:], v_ref[:], o_ref[:], do_ref[:],
                           lse_ref[:], keep, 1.0 / (1.0 - rate), sm_scale)
    dq_ref[:] = dq.astype(dq_ref.dtype)
    _accumulate_kv(dk_ref, dv_ref, dk, dv)


def _drop_call(kernel, is_bwd, q3, k3, v3, extra_inputs, seed,
               sm_scale, rate):
    """Shared pallas_call builder for the dropout fwd/bwd kernels. BOTH use
    the same (G, BQ) tiling and per-(i, j) seed so the PRNG streams match."""
    bh, t, dh = q3.shape
    s = k3.shape[1]
    g, bq = _bwd_tiles(bh, t, s)
    in_specs, out_specs = _bwd_specs(bh, t, s, dh, g, bq,
                                     scalar_prefetch=True)
    qspec, kspec, lspec = in_specs[0], in_specs[1], in_specs[5]
    if not is_bwd:         # forward: outputs (o, lse)
        out_shape = (jax.ShapeDtypeStruct((bh, t, dh), q3.dtype),
                     jax.ShapeDtypeStruct((bh, t, 1), jnp.float32))
        out_specs = (qspec, lspec)
        in_specs = [qspec, kspec, kspec]
        inputs = (q3, k3, v3)
    else:                  # backward: outputs (dq, dk fp32, dv fp32)
        out_shape = (jax.ShapeDtypeStruct(q3.shape, q3.dtype),
                     jax.ShapeDtypeStruct(k3.shape, jnp.float32),
                     jax.ShapeDtypeStruct(v3.shape, jnp.float32))
        inputs = (q3, k3, v3) + tuple(extra_inputs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh // g, t // bq),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    return pl.pallas_call(
        functools.partial(kernel, sm_scale=sm_scale, rate=rate),
        out_shape=out_shape,
        grid_spec=grid_spec,
    )(seed, *inputs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fused_attention_dropout(q, k, v, seed, num_heads, rate):
    out, _ = _fused_attention_dropout_fwd(q, k, v, seed, num_heads, rate)
    return out


def _fused_attention_dropout_fwd(q, k, v, seed, num_heads, rate):
    qh = _split_heads(q, num_heads)
    kh = _split_heads(k, num_heads)
    vh = _split_heads(v, num_heads)
    b, h, t, dh = qh.shape
    s = kh.shape[2]
    q3 = qh.reshape(b * h, t, dh)
    k3 = kh.reshape(b * h, s, dh)
    v3 = vh.reshape(b * h, s, dh)
    sm_scale = 1.0 / math.sqrt(dh)
    o3, lse = _drop_call(_attn_drop_fwd_kernel, False, q3, k3, v3, (), seed,
                         sm_scale, rate)
    return (_merge_heads(o3.reshape(b, h, t, dh)),
            (q3, k3, v3, o3, lse, seed, (b, h)))


def _fused_attention_dropout_bwd(num_heads, rate, res, g):
    q3, k3, v3, o3, lse, seed, (b, h) = res
    bh, t, dh = q3.shape
    s = k3.shape[1]
    do3 = _split_heads(g, num_heads).reshape(bh, t, dh)
    sm_scale = 1.0 / math.sqrt(dh)
    dq3, dk3, dv3 = _drop_call(_attn_drop_bwd_kernel, True, q3, k3, v3,
                               (o3, do3, lse), seed, sm_scale, rate)
    return (_merge_heads(dq3.reshape(b, h, t, dh)),
            _merge_heads(dk3.astype(k3.dtype).reshape(b, h, s, dh)),
            _merge_heads(dv3.astype(v3.dtype).reshape(b, h, s, dh)),
            None)


_fused_attention_dropout.defvjp(_fused_attention_dropout_fwd,
                                _fused_attention_dropout_bwd)


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
    # Tiny head dims waste >75% of the MXU lanes in a hand-written kernel;
    # let XLA handle those shapes.
    if fused and q.shape[-1] // num_heads < 32:
        fused = False
    if fused and not use_dropout:
        return _fused_attention(q, k, v, num_heads)
    if (fused and use_dropout and dropout_rng is not None
            and jax.default_backend() == "tpu"
            and max(q.shape[1], k.shape[1]) <= _BWD_MAX_T):
        seed = jax.random.bits(
            dropout_rng, dtype=jnp.uint32).astype(jnp.int32).reshape(1)
        return _fused_attention_dropout(q, k, v, seed, num_heads,
                                        float(dropout_rate))
    return attention_reference(
        q, k, v, num_heads,
        dropout_rate=dropout_rate,
        dropout_rng=dropout_rng,
        deterministic=deterministic,
    )
