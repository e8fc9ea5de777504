"""Fused (residual +) LayerNorm Pallas kernel for the serving paths.

PROFILE_SWIN.json (2026-08-19, post window-major + in-VMEM normalize)
attributes 24% of the Swinv2 forward to `convert_reduce_fusion` — the
f32-upcast LayerNorms (models/layers.py::layernorm): XLA materializes the
f32 intermediate and runs separate stats/apply passes. This kernel reads
the sublayer output once in VMEM, computes mean/var/normalize in f32
registers, applies scale/bias, adds the residual shortcut, and writes
bf16 — ~6 bytes/element of HBM traffic instead of ~20.

Differentiable: a custom VJP supplies the standard LayerNorm adjoint in
jnp (XLA-fused), so jax.grad through a fused_ln=True forward is exact.
The TRAINER still gates fused_ln off for fine-tuning (unmeasured in
training — same conservatism as SwinConfig.fused_train). Exact same
math as layers.py::layernorm (mean/var in f32, rsqrt(var + eps)), so
golden-parity tests hold to bf16 rounding.

Reference parity: this fuses the LayerNorm calls of Swinv2's post-norm
blocks (HF modeling_swinv2.Swinv2Layer — reference dependency of
src/data_loader/preprocess_embeddings.py:26-28); the math is identical
to torch.nn.LayerNorm(eps) over the channel dim.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 8 * 1024 * 1024
# scale in row 0, bias in row 1 of an (8, C) f32 operand — Mosaic crashes
# on dim-1 sublane blocks (CLAUDE.md gotcha), so the rows sublane-pad to 8.
_SB_ROWS = 8


def _ln_kernel(y_ref, sb_ref, o_ref, *, eps: float):
    y = y_ref[...].astype(jnp.float32)
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    out = (y - mean) * jax.lax.rsqrt(var + eps)
    out = out * sb_ref[0:1, :] + sb_ref[1:2, :]
    o_ref[...] = out.astype(o_ref.dtype)


def _ln_res_kernel(y_ref, x_ref, sb_ref, o_ref, *, eps: float):
    y = y_ref[...].astype(jnp.float32)
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    out = (y - mean) * jax.lax.rsqrt(var + eps)
    out = out * sb_ref[0:1, :] + sb_ref[1:2, :]
    out = out + x_ref[...].astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


def fused_ln_ok(shape, dtype=jnp.bfloat16) -> bool:
    """Geometry gate: C a lane multiple, rows a sublane multiple."""
    if len(shape) < 2:
        return False
    c = shape[-1]
    rows = 1
    for d in shape[:-1]:
        rows *= d
    return c % 128 == 0 and rows % 8 == 0


def _block_rows(rows: int, c: int) -> int:
    """Largest divisor of `rows` (multiple of 8) whose f32 tile fits VMEM."""
    cap = max(_VMEM_BUDGET // (c * 4 * 4), 8)   # y/x/o dbl-buffered + f32 tmp
    r = rows
    while r > cap or rows % r != 0 or r % 8 != 0:
        r //= 2
        if r < 8:
            return 8
    return r


def _scale_bias_rows(params: dict, c: int) -> jax.Array:
    sb = jnp.zeros((_SB_ROWS, c), jnp.float32)
    sb = sb.at[0].set(params["scale"].astype(jnp.float32))
    return sb.at[1].set(params["bias"].astype(jnp.float32))


def fused_layernorm(params: dict, y: jax.Array, eps: float = 1e-5,
                    shortcut: jax.Array | None = None) -> jax.Array:
    """layernorm(y) * scale + bias (+ shortcut), fused in VMEM.

    y (..., C) any leading shape; shortcut same shape or None. Returns
    y.dtype. Differentiable via a custom VJP whose backward is the plain
    jnp LayerNorm adjoint (XLA-fused) — training paths still default to
    models/layers.py::layernorm (the trainer gates fused_ln off:
    unmeasured in training, same policy as SwinConfig.fused_train).
    Falls back to the jnp math when the geometry gate fails.
    """
    if not fused_ln_ok(y.shape, y.dtype):
        from mmd_tpu.models import layers as L
        out = L.layernorm(params, y, eps)
        return out if shortcut is None else shortcut + out
    if shortcut is None:
        return _fused_ln(params, y, eps)
    return _fused_ln_res(params, y, shortcut, eps)


def _ln_pallas(params: dict, y: jax.Array, eps: float,
               shortcut: jax.Array | None) -> jax.Array:
    c = y.shape[-1]
    orig_shape = y.shape
    rows = y.size // c
    y2 = y.reshape(rows, c)
    r = _block_rows(rows, c)
    blk = pl.BlockSpec((r, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    sb_blk = pl.BlockSpec((_SB_ROWS, c), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    sb = _scale_bias_rows(params, c)
    interp = jax.default_backend() != "tpu"
    cost = pl.CostEstimate(flops=8 * rows * c,
                           bytes_accessed=(3 if shortcut is None else 4)
                           * rows * c * y.dtype.itemsize,
                           transcendentals=rows)
    if shortcut is None:
        out = pl.pallas_call(
            functools.partial(_ln_kernel, eps=eps),
            out_shape=jax.ShapeDtypeStruct((rows, c), y.dtype),
            grid=(rows // r,),
            in_specs=[blk, sb_blk], out_specs=blk,
            cost_estimate=cost, interpret=interp,
        )(y2, sb)
    else:
        out = pl.pallas_call(
            functools.partial(_ln_res_kernel, eps=eps),
            out_shape=jax.ShapeDtypeStruct((rows, c), y.dtype),
            grid=(rows // r,),
            in_specs=[blk, blk, sb_blk], out_specs=blk,
            cost_estimate=cost, interpret=interp,
        )(y2, shortcut.reshape(rows, c), sb)
    return out.reshape(orig_shape)


def _ln_adjoint(params: dict, y: jax.Array, eps: float, d: jax.Array):
    """Standard LayerNorm backward (jnp math, XLA-fused):
    out = scale * (y - mu) / sigma + bias;  g = scale * dout
    dy = (g - mean_C(g) - yhat * mean_C(g * yhat)) / sigma."""
    f32 = jnp.float32
    yf = y.astype(f32)
    mean = jnp.mean(yf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(yf - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    yhat = (yf - mean) * rstd
    df = d.astype(f32)
    red = tuple(range(y.ndim - 1))
    dscale = jnp.sum(df * yhat, axis=red)
    dbias = jnp.sum(df, axis=red)
    g = df * params["scale"].astype(f32)
    dy = (g - jnp.mean(g, axis=-1, keepdims=True)
          - yhat * jnp.mean(g * yhat, axis=-1, keepdims=True)) * rstd
    return ({"scale": dscale, "bias": dbias}, dy.astype(y.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _fused_ln(params: dict, y: jax.Array, eps: float) -> jax.Array:
    return _ln_pallas(params, y, eps, None)


def _fused_ln_fwd(params, y, eps):
    return _ln_pallas(params, y, eps, None), (params, y)


def _fused_ln_bwd(eps, res, d):
    params, y = res
    dp, dy = _ln_adjoint(params, y, eps, d)
    return dp, dy


_fused_ln.defvjp(_fused_ln_fwd, _fused_ln_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_ln_res(params: dict, y: jax.Array, shortcut: jax.Array,
                  eps: float) -> jax.Array:
    return _ln_pallas(params, y, eps, shortcut)


def _fused_ln_res_fwd(params, y, shortcut, eps):
    return _ln_pallas(params, y, eps, shortcut), (params, y)


def _fused_ln_res_bwd(eps, res, d):
    params, y = res
    dp, dy = _ln_adjoint(params, y, eps, d)
    return dp, dy, d


_fused_ln_res.defvjp(_fused_ln_res_fwd, _fused_ln_res_bwd)
