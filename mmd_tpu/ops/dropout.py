"""Elementwise Pallas dropout with in-kernel PRNG masks (TPU).

The fusion model's remaining jnp dropout sites (the out-projection dropouts
around attention and the classifier heads — reference src/model/model.py
applies nn.Dropout after every attention out-proj and inside the heads)
materialize a keep-mask over the full (B, T, D) activation in HBM on the
forward AND re-read it on the backward (~67 MB per site per direction at
flagship shapes). This kernel draws the mask from the on-chip PRNG instead
and the custom VJP regenerates it bit-exactly from the same per-program
seeds — the same discipline as ops/attention.py and ops/mlp.py: identical
grid, identical draw shapes/order in both passes, so nothing mask-sized
ever touches HBM.

Used by models/layers.dropout on TPU when the trailing dim is 128-aligned;
other backends/shapes keep the jax.random.bernoulli path (which is what the
NumPy-oracle tests exercise). pltpu PRNG is TPU-only (no interpret mode):
hardware validation lives in benchmarks/validate_mlp_tpu.py (mask-oracle
protocol) — see check "elemwise".
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 10 * 1024 * 1024


def _keep_scale(shape, rate: float):
    bits = pltpu.prng_random_bits(shape)
    threshold = jnp.uint32(min(int((1.0 - rate) * 4294967296.0), 4294967295))
    keep = pltpu.bitcast(bits, jnp.uint32) < threshold
    return jnp.where(keep, jnp.float32(1.0 / (1.0 - rate)), jnp.float32(0.0))


def _rows_per_block(n: int, d: int, itemsize: int) -> int:
    # live per program: x block, y block, f32 mask (+ double buffering)
    per_row = d * (2 * itemsize + 4) * 2
    bn = 4096
    while bn > 8 and bn * per_row > _VMEM_BUDGET:
        bn //= 2
    while n % bn != 0 and bn > 1:
        bn //= 2
    return max(bn, 1)


def _kernel(seed_ref, x_ref, y_ref, *, rate: float):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x = x_ref[:]
    y_ref[:] = (x.astype(jnp.float32) * _keep_scale(x.shape, rate)).astype(
        y_ref.dtype)


def _call(x2, seed, rate: float):
    n, d = x2.shape
    bn = _rows_per_block(n, d, x2.dtype.itemsize)
    row = pl.BlockSpec((bn, d), lambda i, *_: (i, 0),
                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(n // bn,),
        in_specs=[row], out_specs=row)
    return pl.pallas_call(
        functools.partial(_kernel, rate=rate),
        out_shape=jax.ShapeDtypeStruct((n, d), x2.dtype),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d,
            bytes_accessed=2 * n * d * x2.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(seed, x2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dropout_core(x2, seed, rate):
    return _call(x2, seed, rate)


def _dropout_core_fwd(x2, seed, rate):
    # the zero-size array only carries the primal DTYPE into the backward
    # (a raw np.dtype is not a valid residual leaf)
    return _call(x2, seed, rate), (seed, jnp.zeros((0,), x2.dtype))


def _dropout_core_bwd(rate, res, g):
    # cast the cotangent to the primal dtype so _rows_per_block picks the
    # SAME grid as the forward -> bit-exact mask regeneration
    seed, proto = res
    return _call(g.astype(proto.dtype), seed, rate), None


_dropout_core.defvjp(_dropout_core_fwd, _dropout_core_bwd)


def fused_dropout(x: jax.Array, rate: float, rng: jax.Array) -> jax.Array:
    """Inverted dropout on (..., D) with the mask generated in-kernel."""
    shape = x.shape
    d = shape[-1]
    x2 = x.reshape(-1, d)
    seed = jax.random.bits(rng, (1,), jnp.uint32).astype(jnp.int32)
    return _dropout_core(x2, seed, rate).reshape(shape)


def use_fused(x: jax.Array, rate: float, deterministic: bool) -> bool:
    return (rate > 0.0 and not deterministic
            and jax.default_backend() == "tpu"
            and x.ndim >= 2 and x.shape[-1] % 128 == 0
            and x.dtype in (jnp.bfloat16, jnp.float32))
