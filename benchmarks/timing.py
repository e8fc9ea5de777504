"""Honest device timing on tunneled TPUs: in-jit loop delta protocol.

On axon-tunneled devices, `jax.block_until_ready` returns before execution
finishes (110 TFLOP of chained matmuls "complete" in 0 ms) and any
device->host transfer permanently degrades later dispatch. The only reliable
measurement:

  1. run the workload K times inside ONE jit (lax.fori_loop) with a real
     data dependency between iterations;
  2. force completion with a single scalar D2H;
  3. time two loop lengths and report (T_large - T_small) / (K_large -
     K_small) — the per-dispatch overhead (whatever mode the tunnel is in)
     cancels in the delta.

Validated against a dependency-chained 8192^3 bf16 matmul: 175 TFLOP/s
measured vs ~197 peak on v5e.
"""

from __future__ import annotations

import time
from typing import Callable

import numpy as np


def data_dep(x, scalar):
    """Add a value-dependent (always-zero in practice) perturbation so XLA
    cannot hoist the workload out of the timing loop."""
    import jax.numpy as jnp
    flag = jnp.where(jnp.isnan(scalar), 1, 0)
    return x + flag.astype(x.dtype)


def bench_iter_time(
    step: Callable,   # step(scalar_carry, *args) -> new scalar (f32)
    args: tuple,
    k_small: int = 4,
    k_large: int = 24,
    reps: int = 5,
) -> float:
    """Seconds per iteration of `step`, via the delta protocol. `step` must
    thread its scalar carry into the workload (use `data_dep`) and return a
    scalar derived from the output."""
    import jax
    import jax.numpy as jnp

    def make(k):
        @jax.jit
        def run(*args):
            def body(i, c):
                return step(c, *args)
            out = jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
            return out
        return run

    f_small, f_large = make(k_small), make(k_large)
    float(f_small(*args))   # compile + sync
    float(f_large(*args))

    def wall(f):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*args))   # scalar D2H = true completion barrier
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_small, t_large = wall(f_small), wall(f_large)
    return max((t_large - t_small) / (k_large - k_small), 1e-9)
