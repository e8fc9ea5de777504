"""Fused Swinv2 window-attention kernel (Pallas, fwd + hand-derived bwd).

The reference embeds images with Swinv2-base (reference
src/data_loader/preprocess_embeddings.py:26-28); models/swin.py re-derives
it exactly but runs window attention as XLA einsums over (B*nW, 64, C)
windows whose per-head matmuls contract over dh = 32 — a quarter of the
MXU's 128-wide contraction, plus f32 relayouts for the cosine normalize
and (64, 64) softmax tiles that pad to 128 lanes. This kernel applies the
same MXU head-packing as ops/attention.py (g = 128/dh = 4 heads per
block-diagonal matmul — every Swinv2-base stage has dh = 32) and keeps
the whole score -> bias -> softmax -> context chain in VMEM.

Division of labor (chosen so the kernel stays small — serving is
forward-only; fine-tuning differentiates through the custom_vjp whose
backward is _bwd_kernel, with the cotangents of everything placed
OUTSIDE handled by XLA):
  * OUTSIDE (XLA): q/k/v projections (good GEMMs), cosine normalization
    with the per-head clamped logit scale and the exp2 base change folded
    into q', and the combined additive bias (CPB + the HF double-counted
    shift mask) per (window, head).
  * INSIDE (Pallas): packed QK^T, shared-group max, per-segment
    exp2(s + bias - m), per-head sum, packed PV, deferred division.

Layout: windows transpose to (nW, B, n, C) so every program's rows share
ONE window index and the (nW, h, n, n) bias block is selected by the
grid's window coordinate — the bias never exists per-(B*nW) in HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mmd_tpu.ops.attention import _pack_blockdiag

_VMEM_BUDGET = 10 * 1024 * 1024


def _group_size(dh: int, heads: int) -> int:
    g = 128 // dh if (dh < 128 and 128 % dh == 0) else 1
    while g > 1 and heads % g != 0:
        g //= 2
    return g


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, heads: int, g: int):
    """Blocks: q/k/v/o (1, GB, n, C); bias (1, h//g, n, g*n) f32 — the
    per-head (n, n) biases pre-packed OUTSIDE into the same lane-segment
    layout the packed scores use, so no kernel-boundary array has a last
    dim < 128 (Mosaic pads those; CLAUDE.md gotcha). q arrives
    pre-normalized and pre-scaled (cosine attention's logit scale and the
    log2(e) base change folded in); k pre-normalized."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    n = q.shape[1]
    dh = q.shape[-1] // heads
    for grp, h0 in enumerate(range(0, heads, g)):
        cols = slice(h0 * dh, (h0 + g) * dh)
        kp = _pack_blockdiag(k, h0, g, dh)               # (GB, g*n, g*dh)
        s = jax.lax.dot_general(
            q[:, :, cols], kp, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (GB, n, g*n)
        # one add pass is unavoidable (the bias is genuinely (n, n) per
        # head), so the max runs on the BIASED scores — the true softmax
        # max; the shared group max is exact (per-head sums renormalize).
        sb = s + bias_ref[0, grp][None]
        m = jnp.max(sb, axis=-1, keepdims=True)
        p = jnp.exp2(sb - m)
        ls = [jnp.sum(p[:, :, j * n:(j + 1) * n], axis=-1, keepdims=True)
              for j in range(g)]
        p16 = p.astype(v.dtype)
        vp = _pack_blockdiag(v, h0, g, dh)
        o = jax.lax.dot_general(
            p16, vp, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (GB, n, g*dh)
        linv = jnp.concatenate(
            [jnp.broadcast_to(1.0 / jnp.maximum(ls[j], 1e-37),
                              (*ls[j].shape[:2], dh)) for j in range(g)],
            axis=-1)
        o_ref[0, :, :, cols] = (o * linv).astype(o_ref.dtype)


def _infer_kernel(q_ref, k_ref, v_ref, bias_ref, scale_ref, o_ref, *,
                  heads: int, g: int):
    """Serving-path kernel: q/k arrive RAW (post-projection, bf16) and the
    cosine normalization + clamped per-head logit scale run in VMEM.
    Measured 24.65 vs 25.99 ms/batch-32 forward against normalizing in
    XLA outside (bench_swin_ab, 2026-08-19).

    The per-segment sums of squares use ONE small MXU matmul against a
    block-diagonal ones matrix E (E[a,b] = [a//dh == b//dh]) so every
    lane ends up holding its own head's sum — no lane-concat assembly
    (a first cut that concatenated per-segment normalized slices cost
    +6 ms/call in kernel time).

    scale_ref is an (8, C) f32 row (sublane-padded; Mosaic dim-1 sublane
    blocks crash): lane h*dh..(h+1)*dh-1 holds head h's
    exp(min(logit_scale, ln 100)) * log2(e)."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    n = q.shape[1]
    dh = q.shape[-1] // heads
    f32 = jnp.float32
    gd = g * dh
    ia = jax.lax.broadcasted_iota(jnp.int32, (gd, gd), 0) // dh
    ib = jax.lax.broadcasted_iota(jnp.int32, (gd, gd), 1) // dh
    seg_ones = (ia == ib).astype(v.dtype)                  # (g*dh, g*dh)
    for grp, h0 in enumerate(range(0, heads, g)):
        cols = slice(h0 * dh, (h0 + g) * dh)
        qc = q[:, :, cols].astype(f32)
        kc = k[:, :, cols].astype(f32)
        sc = scale_ref[0:1, cols].astype(f32)[None]        # (1, 1, g*dh)

        def seg_norm(x2):
            # (GB, n, g*dh) squares -> same-shape per-segment sums
            return jax.lax.dot_general(
                x2.astype(v.dtype), seg_ones, (((2,), (0,)), ((), ())),
                preferred_element_type=f32)

        qn = jnp.maximum(jnp.sqrt(seg_norm(qc * qc)), 1e-12)
        kn = jnp.maximum(jnp.sqrt(seg_norm(kc * kc)), 1e-12)
        qg = (qc * (sc / qn)).astype(v.dtype)
        kg = (kc / kn).astype(v.dtype)
        kp = _pack_blockdiag(kg, 0, g, dh)                 # (GB, g*n, g*dh)
        s = jax.lax.dot_general(
            qg, kp, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)            # (GB, n, g*n)
        sb = s + bias_ref[0, grp][None]
        m = jnp.max(sb, axis=-1, keepdims=True)
        p = jnp.exp2(sb - m)
        ls = [jnp.sum(p[:, :, j * n:(j + 1) * n], axis=-1, keepdims=True)
              for j in range(g)]
        p16 = p.astype(v.dtype)
        vp = _pack_blockdiag(v, h0, g, dh)
        o = jax.lax.dot_general(
            p16, vp, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)            # (GB, n, g*dh)
        linv = jnp.concatenate(
            [jnp.broadcast_to(1.0 / jnp.maximum(ls[j], 1e-37),
                              (*ls[j].shape[:2], dh)) for j in range(g)],
            axis=-1)
        o_ref[0, :, :, cols] = (o * linv).astype(o_ref.dtype)


def swin_window_attention_infer(q: jax.Array, k: jax.Array, v: jax.Array,
                                bias: jax.Array, scale_row: jax.Array,
                                heads: int) -> jax.Array:
    """Forward-only serving variant: q/k/v RAW (nW, B, n, C) post-projection
    (no host-side normalize or scaling); bias (nW, h, n, n) f32 log2-domain;
    scale_row (8, C) f32 per-head logit scale * log2(e) repeated over each
    head's dh lanes. NOT differentiable — fine-tuning uses
    swin_window_attention (pre-normalized contract, custom_vjp)."""
    nw, b, n, c = q.shape
    dh = c // heads
    g = _group_size(dh, heads)
    gb = _rows_per_block(b, n, c, heads, q.dtype.itemsize)
    bias_g = _pack_bias(bias, heads, g)
    blk = pl.BlockSpec((1, gb, n, c), lambda i, j: (i, j, 0, 0),
                       memory_space=pltpu.VMEM)
    bias_blk = pl.BlockSpec((1, heads // g, n, g * n),
                            lambda i, j: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    scale_blk = pl.BlockSpec((8, c), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_infer_kernel, heads=heads, g=g),
        out_shape=jax.ShapeDtypeStruct((nw, b, n, c), q.dtype),
        grid=(nw, b // gb),
        in_specs=[blk, blk, blk, bias_blk, scale_blk],
        out_specs=blk,
        cost_estimate=pl.CostEstimate(
            flops=4 * nw * b * n * n * c,
            bytes_accessed=4 * nw * b * n * c * q.dtype.itemsize,
            transcendentals=nw * b * heads * n * n,
        ),
        interpret=jax.default_backend() != "tpu",
    )(q, k, v, bias_g, scale_row)


def _rows_per_block(b: int, n: int, c: int, heads: int, itemsize: int) -> int:
    dh = c // heads
    g = 128 // dh if (dh < 128 and 128 % dh == 0) else 1
    while g > 1 and heads % g != 0:
        g //= 2
    per_row = (4 * n * c * itemsize * 2            # q/k/v/o double-buffered
               + 3 * 4 * n * g * n                 # s/p/f32 temps per group
               + 2 * itemsize * g * n * max(g * dh, 128))   # packed k/v
    gb = b
    while gb > 1 and (gb * per_row > _VMEM_BUDGET or b % gb != 0):
        gb //= 2
    while b % gb != 0:
        gb //= 2
    return max(gb, 1)


def _pack_bias(bias: jax.Array, heads: int, g: int) -> jax.Array:
    """(nW, h, n, n) -> score-segment layout (nW, h//g, n, g*n): head
    h0+j's (n, n) tile sits at lanes [j*n, (j+1)*n) of its group row, so
    no kernel-boundary array has a last dim < 128 at production geometry."""
    nw, _, n, _ = bias.shape
    bias_g = bias.reshape(nw, heads // g, g, n, n)
    return bias_g.transpose(0, 1, 3, 2, 4).reshape(nw, heads // g, n, g * n)


def _call_fwd(q, k, v, bias_g, heads: int, g: int, gb: int):
    nw, b, n, c = q.shape
    blk = pl.BlockSpec((1, gb, n, c), lambda i, j: (i, j, 0, 0),
                       memory_space=pltpu.VMEM)
    bias_blk = pl.BlockSpec((1, heads // g, n, g * n),
                            lambda i, j: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, heads=heads, g=g),
        out_shape=jax.ShapeDtypeStruct((nw, b, n, c), q.dtype),
        grid=(nw, b // gb),
        in_specs=[blk, blk, blk, bias_blk],
        out_specs=blk,
        cost_estimate=pl.CostEstimate(
            flops=4 * nw * b * n * n * c,
            bytes_accessed=4 * nw * b * n * c * q.dtype.itemsize,
            transcendentals=nw * b * heads * n * n,
        ),
        interpret=jax.default_backend() != "tpu",
    )(q, k, v, bias_g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def swin_window_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                          bias: jax.Array, heads: int) -> jax.Array:
    """q/k/v (nW, B, n, C) — q pre-scaled by scale*log2(e), q/k L2-normalized
    per head; bias (nW, h, n, n) f32 additive logits in the LOG2 domain
    (pass bias*log2(e)). Returns (nW, B, n, C).

    Differentiable: the backward is the hand-derived Pallas kernel
    (_bwd_kernel) — log2-domain softmax-attention backward with the bias
    cotangent (the trainable CPB path under fine-tuning) accumulated over
    the batch grid. The cosine normalization and logit scaling live
    OUTSIDE in XLA, which differentiates them for free."""
    nw, b, n, c = q.shape
    dh = c // heads
    g = _group_size(dh, heads)
    gb = _rows_per_block(b, n, c, heads, q.dtype.itemsize)
    return _call_fwd(q, k, v, _pack_bias(bias, heads, g), heads, g, gb)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref, *, heads: int, g: int):
    """Blocks as the fwd (+ do like q, dbias like bias). dbias revisits
    its block across the batch grid dim: zero-init at j == 0, accumulate.
    exp2 domain: d(sb) = ln2 * P * (dP - rowsum(dP * P))."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    n = q.shape[1]
    dh = q.shape[-1] // heads
    ln2 = 0.6931471805599453
    f32 = jnp.float32

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    for grp, h0 in enumerate(range(0, heads, g)):
        cols = slice(h0 * dh, (h0 + g) * dh)
        kp = _pack_blockdiag(k, h0, g, dh)
        s = jax.lax.dot_general(
            q[:, :, cols], kp, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=f32)                    # (GB, n, g*n)
        sb = s + bias_ref[0, grp][None]
        m = jnp.max(sb, axis=-1, keepdims=True)
        p = jnp.exp2(sb - m)
        for j in range(g):
            seg = slice(j * n, (j + 1) * n)
            hc = slice((h0 + j) * dh, (h0 + j + 1) * dh)
            l = jnp.maximum(jnp.sum(p[:, :, seg], axis=-1, keepdims=True),
                            1e-37)
            pj = p[:, :, seg] / l                          # (GB, n, n) f32
            doh = do[:, :, hc].astype(f32)
            vh = v[:, :, hc].astype(f32)
            dv_j = jax.lax.dot_general(pj, doh,
                                       (((1,), (1,)), ((0,), (0,))),
                                       preferred_element_type=f32)
            dp = jax.lax.dot_general(doh, vh,
                                     (((2,), (2,)), ((0,), (0,))),
                                     preferred_element_type=f32)
            ds = ln2 * pj * (dp - jnp.sum(dp * pj, axis=-1, keepdims=True))
            qh = q[:, :, hc].astype(f32)
            kh = k[:, :, hc].astype(f32)
            dq_j = jax.lax.dot_general(ds, kh,
                                       (((2,), (1,)), ((0,), (0,))),
                                       preferred_element_type=f32)
            dk_j = jax.lax.dot_general(jnp.swapaxes(ds, 1, 2), qh,
                                       (((2,), (1,)), ((0,), (0,))),
                                       preferred_element_type=f32)
            dq_ref[0, :, :, hc] = dq_j.astype(dq_ref.dtype)
            dk_ref[0, :, :, hc] = dk_j.astype(dk_ref.dtype)
            dv_ref[0, :, :, hc] = dv_j.astype(dv_ref.dtype)
            dbias_ref[0, grp, :, seg] = (dbias_ref[0, grp, :, seg]
                                         + jnp.sum(ds, axis=0))


def _swin_attn_fwd(q, k, v, bias, heads):
    out = swin_window_attention.__wrapped__(q, k, v, bias, heads)
    return out, (q, k, v, bias)


def _swin_attn_bwd(heads, res, do):
    q, k, v, bias = res
    nw, b, n, c = q.shape
    dh = c // heads
    g = _group_size(dh, heads)
    gb = _rows_per_block(b, n, c, heads, q.dtype.itemsize)
    bias_g = _pack_bias(bias, heads, g)
    blk = pl.BlockSpec((1, gb, n, c), lambda i, j: (i, j, 0, 0),
                       memory_space=pltpu.VMEM)
    bias_blk = pl.BlockSpec((1, heads // g, n, g * n),
                            lambda i, j: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    f32 = jnp.float32
    dq, dk, dv, dbias_g = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads, g=g),
        grid=(nw, b // gb),
        in_specs=[blk, blk, blk, bias_blk, blk],
        out_specs=(blk, blk, blk, bias_blk),
        out_shape=(jax.ShapeDtypeStruct((nw, b, n, c), q.dtype),
                   jax.ShapeDtypeStruct((nw, b, n, c), q.dtype),
                   jax.ShapeDtypeStruct((nw, b, n, c), q.dtype),
                   jax.ShapeDtypeStruct((nw, heads // g, n, g * n), f32)),
        cost_estimate=pl.CostEstimate(
            flops=10 * nw * b * n * n * c,
            bytes_accessed=8 * nw * b * n * c * q.dtype.itemsize,
            transcendentals=nw * b * heads * n * n,
        ),
        interpret=jax.default_backend() != "tpu",
    )(q, k, v, bias_g, do.astype(q.dtype))
    # un-pack the bias cotangent back to (nW, h, n, n)
    dbias = dbias_g.reshape(nw, heads // g, n, g, n)
    dbias = dbias.transpose(0, 1, 3, 2, 4).reshape(nw, heads, n, n)
    return dq, dk, dv, dbias.astype(bias.dtype)


swin_window_attention.defvjp(_swin_attn_fwd, _swin_attn_bwd)
