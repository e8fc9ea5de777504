"""Fused GELU-MLP Pallas kernel with in-kernel dropout (TPU).

The fusion model's hot MLP (reference src/model/layers.py:5-21:
Linear(d, 4d) -> GELU -> Dropout -> Linear(4d, d) -> Dropout) at flagship
shapes ((256, 512, 256) tokens, f=1024) is dominated by DROPOUT BITS when
trained: jax.random.bernoulli materializes a uint32 per hidden element
(~540 MB/step HBM for the hidden mask alone) and the two matmuls are split
around it. Measured 2026-08-16 on v5e: fwd+bwd 5.2 ms with dropout vs
1.9 ms without — the mask traffic IS the gap.

This kernel keeps the (BN, F) hidden activation in VMEM, generates the
keep-masks with the on-chip PRNG (one seed per row-block program, identical
grid in fwd and bwd so the backward regenerates the masks bit-exactly — the
same discipline as ops/attention.py), and runs both matmuls back to back:
nothing F-wide ever touches HBM. GELU uses the tanh form (bf16-equivalent
to erf; see models/layers.mlp).

Used automatically by models/layers.mlp on TPU when dropout is active;
rate=0 / eval / CPU keep the plain XLA path (already matmul-bound there).
Dropout masks cannot run under interpret mode (pltpu PRNG is TPU-only):
the rate=0 kernel path is equality-tested in tests/test_mlp_kernel.py and
the dropout path is validated on hardware by benchmarks/validate_mlp_tpu.py.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 10 * 1024 * 1024
_C = math.sqrt(2.0 / math.pi)
_K = 0.044715


def _gelu_tanh(a):
    return 0.5 * a * (1.0 + jnp.tanh(_C * (a + _K * a * a * a)))


def _keep_scale(shape, rate: float):
    bits = pltpu.prng_random_bits(shape)
    threshold = jnp.uint32(min(int((1.0 - rate) * 4294967296.0), 4294967295))
    keep = pltpu.bitcast(bits, jnp.uint32) < threshold
    return jnp.where(keep, jnp.float32(1.0 / (1.0 - rate)), jnp.float32(0.0))


def _rows_per_block(n: int, d: int, f: int, itemsize: int) -> int:
    """Rows per program, sized by the BACKWARD's footprint so both passes
    run the same grid (the PRNG streams must line up). Live per program:
    ~4 (BN, F) fp32 intermediates + w1/w2 + fp32 dw accumulators + io."""
    fixed = 4 * 2 * d * f + 2 * itemsize * 2 * d * f + 8 * (d + f)
    per_row = 4 * 4 * f + 3 * 2 * itemsize * d
    bn = 1024
    while bn > 128 and fixed + bn * per_row > _VMEM_BUDGET:
        bn //= 2
    while n % bn != 0 and bn > 1:
        bn //= 2
    return max(bn, 1)


def _dot(a, b, contract, preferred=jnp.float32):
    return jax.lax.dot_general(a, b, ((contract[0], contract[1]), ((), ())),
                               preferred_element_type=preferred)


def _fwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref,
                *, rate: float):
    """seed_ref is (2,): [0] seeds the hidden-dim (mid) mask stream, [1]
    the output mask stream. Separate streams let TP fold the model-rank
    into the mid seed only — each rank's F/tp hidden slice draws an
    independent mask — while the out mask stays model-replicated (the
    psum-exactness requirement, see fused_mlp)."""
    x = x_ref[:]
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    a = _dot(x, w1_ref[:], (((1,), (0,))))           # (BN, F) f32
    a = a + b1_ref[:].astype(jnp.float32)
    h = _gelu_tanh(a)
    if rate > 0.0:
        h = h * _keep_scale(h.shape, rate)
    y = _dot(h.astype(x.dtype), w2_ref[:], (((1,), (0,))))   # (BN, D)
    y = y + b2_ref[:].astype(jnp.float32)
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[1] + pl.program_id(0))
        y = y * _keep_scale(y.shape, rate)
    y_ref[:] = y.astype(y_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, dy_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                *, rate: float):
    """Recomputes the forward through the hidden block, regenerating the
    keep-masks from the SAME per-program seed and draw order as the
    forward; dw/db outputs accumulate in fp32 across row-block programs."""
    x = x_ref[:]
    w1 = w1_ref[:]
    w2 = w2_ref[:]

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    a = _dot(x, w1, (((1,), (0,))))
    a = a + b1_ref[:].astype(jnp.float32)
    g = _gelu_tanh(a)
    if rate > 0.0:
        # same seeds and draw order as the forward: mid stream then out
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        m1 = _keep_scale(g.shape, rate)
        h = g * m1
        pltpu.prng_seed(seed_ref[1] + pl.program_id(0))
        m2 = _keep_scale((x.shape[0], w2.shape[1]), rate)
    else:
        m1 = m2 = None
        h = g

    dy = dy_ref[:].astype(jnp.float32)
    if m2 is not None:
        dy = dy * m2
    dyb = dy.astype(x.dtype)
    hb = h.astype(x.dtype)
    # second linear: dh = dy @ w2^T; dw2 += h^T @ dy; db2 += sum(dy)
    dh = _dot(dyb, w2, (((1,), (1,))))                        # (BN, F)
    dw2_ref[:] += _dot(hb, dyb, (((0,), (0,))))               # (F, D)
    db2_ref[:] += jnp.sum(dy, axis=0, keepdims=True)
    if m1 is not None:
        dh = dh * m1
    # tanh-GELU derivative
    u = _C * (a + _K * a * a * a)
    t = jnp.tanh(u)
    dg = 0.5 * (1.0 + t) + 0.5 * a * (1.0 - t * t) * _C * (
        1.0 + 3.0 * _K * a * a)
    da = dh * dg
    dab = da.astype(x.dtype)
    dx_ref[:] = _dot(dab, w1, (((1,), (1,)))).astype(dx_ref.dtype)
    dw1_ref[:] += _dot(x, dab, (((0,), (0,))))                # (D, F)
    db1_ref[:] += jnp.sum(da, axis=0, keepdims=True)


def _specs(bn, d, f):
    row = pl.BlockSpec((bn, d), lambda i, *_: (i, 0),
                       memory_space=pltpu.VMEM)
    w1 = pl.BlockSpec((d, f), lambda i, *_: (0, 0), memory_space=pltpu.VMEM)
    b1 = pl.BlockSpec((1, f), lambda i, *_: (0, 0), memory_space=pltpu.VMEM)
    w2 = pl.BlockSpec((f, d), lambda i, *_: (0, 0), memory_space=pltpu.VMEM)
    b2 = pl.BlockSpec((1, d), lambda i, *_: (0, 0), memory_space=pltpu.VMEM)
    return row, w1, b1, w2, b2


def _mlp_fwd_call(x2, w1, b1, w2, b2, seed, rate: float):
    n, d = x2.shape
    f = w1.shape[1]
    bn = _rows_per_block(n, d, f, x2.dtype.itemsize)
    row, w1s, b1s, w2s, b2s = _specs(bn, d, f)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(n // bn,),
        in_specs=[row, w1s, b1s, w2s, b2s], out_specs=row)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, rate=rate),
        out_shape=jax.ShapeDtypeStruct((n, d), x2.dtype),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=4 * n * d * f,
            bytes_accessed=2 * n * d * x2.dtype.itemsize,
            transcendentals=n * f,
        ),
        interpret=jax.default_backend() != "tpu",
    )(seed, x2, w1, b1[None, :], w2, b2[None, :])


def _mlp_bwd_call(x2, w1, b1, w2, dy, seed, rate: float):
    n, d = x2.shape
    f = w1.shape[1]
    bn = _rows_per_block(n, d, f, x2.dtype.itemsize)
    row, w1s, b1s, w2s, b2s = _specs(bn, d, f)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(n // bn,),
        in_specs=[row, w1s, b1s, w2s, row],
        out_specs=(row, w1s, b1s, w2s, b2s))
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_bwd_kernel, rate=rate),
        out_shape=(jax.ShapeDtypeStruct((n, d), x2.dtype),
                   jax.ShapeDtypeStruct((d, f), jnp.float32),
                   jax.ShapeDtypeStruct((1, f), jnp.float32),
                   jax.ShapeDtypeStruct((f, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32)),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=12 * n * d * f,
            bytes_accessed=4 * n * d * x2.dtype.itemsize,
            transcendentals=2 * n * f,
        ),
        interpret=jax.default_backend() != "tpu",
    )(seed, x2, w1, b1[None, :], w2, dy)
    return dx, dw1, db1[0], dw2, db2[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _fused_mlp_core(x2, w1, b1, w2, b2, seed, rate):
    return _mlp_fwd_call(x2, w1, b1, w2, b2, seed, rate)


def _fused_mlp_core_fwd(x2, w1, b1, w2, b2, seed, rate):
    y = _mlp_fwd_call(x2, w1, b1, w2, b2, seed, rate)
    # b2 rides along only so the backward can cast db2 to ITS dtype (b1 and
    # b2 are both f32 at the fused_mlp call site today, but the cotangent
    # dtype must track its primal if that ever diverges); (d,) is free.
    return y, (x2, w1, b1, w2, b2, seed)


def _fused_mlp_core_bwd(rate, res, g):
    x2, w1, b1, w2, b2, seed = res
    dx, dw1, db1, dw2, db2 = _mlp_bwd_call(x2, w1, b1, w2,
                                           g.astype(x2.dtype), seed, rate)
    return (dx, dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype), None)


_fused_mlp_core.defvjp(_fused_mlp_core_fwd, _fused_mlp_core_bwd)


def fused_mlp(x: jax.Array, w1: jax.Array, b1: jax.Array, w2: jax.Array,
              b2: jax.Array, rate: float = 0.0,
              rng: Optional[jax.Array] = None,
              dtype: jnp.dtype = jnp.bfloat16,
              tp_mesh=None, data_axis: str = "data",
              model_axis: str = "model") -> jax.Array:
    """(..., D) -> (..., D) through Linear-GELU-Dropout-Linear-Dropout in
    one kernel. `rng` seeds the in-kernel PRNG when rate > 0.

    With `tp_mesh`, the kernel runs device-locally under jax.shard_map over
    a Megatron column/row split (w1 (D, F) sharded P(None, model), b1
    P(model), w2 (F, D) P(model, None), b2 replicated; rows over `data`):
    each device computes a full-D partial with b2/tp, and a psum over the
    model axis reconstructs the output EXACTLY because the final dropout
    mask is drawn from a model-replicated seed (identical on every model
    rank, so mask ⊙ Σ partials == Σ mask ⊙ partials). The mid (hidden-dim)
    dropout runs on its OWN seed stream with the model rank folded in, so
    each rank's F/tp hidden slice draws an independent mask — the sharded
    dropout distribution matches the unsharded model exactly."""
    shape = x.shape
    d = shape[-1]
    x2 = x.reshape(-1, d).astype(dtype)
    if rate > 0.0:
        assert rng is not None, "fused_mlp dropout requires an rng"
        seed = jax.random.bits(rng, (2,), jnp.uint32).astype(jnp.int32)
    else:
        seed = jnp.zeros((2,), jnp.int32)
    w1c, b1c = w1.astype(dtype), b1.astype(jnp.float32)
    w2c, b2c = w2.astype(dtype), b2.astype(jnp.float32)
    if tp_mesh is None:
        y = _fused_mlp_core(x2, w1c, b1c, w2c, b2c, seed, rate)
    else:
        from jax.sharding import PartitionSpec as P

        from mmd_tpu.ops.attention import _fold_seed

        tp = tp_mesh.shape[model_axis]
        rows = P(data_axis, None)

        def body(seed_, x_, w1_, b1_, w2_, b2_):
            # mid stream decorrelates over data AND model ranks (each rank
            # owns a distinct F/tp slice); out stream over data only (the
            # psum-exactness requirement — see docstring).
            s = jnp.concatenate([
                _fold_seed(seed_[0:1], data_axis, model_axis),
                _fold_seed(seed_[1:2], data_axis),
            ])
            y_p = _fused_mlp_core(x_, w1_, b1_, w2_,
                                  b2_ * (1.0 / tp), s, rate)
            return jax.lax.psum(y_p, model_axis) if tp > 1 else y_p

        y = jax.shard_map(
            body, mesh=tp_mesh,
            in_specs=(P(), rows, P(None, model_axis), P(model_axis),
                      P(model_axis, None), P()),
            out_specs=rows, check_vma=False,
        )(seed, x2, w1c, b1c, w2c, b2c)
    return y.reshape(shape)
