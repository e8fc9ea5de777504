"""Hardware validation of the fused-MLP dropout path (ops/mlp.py).

pltpu PRNG primitives don't exist in interpret mode, so pytest can't reach
the dropout kernels; this script validates them on a real TPU and commits
the evidence (benchmarks/MLP_TPU_VALIDATION.json):

  1. rate=0 hardware parity — fused fwd + all five grads match the plain
     XLA composition on TPU (the interpret-mode pytest only proves CPU);
  2. mask statistics — E[y_dropout] over seeds matches the no-dropout
     output (inverted-dropout is mean-preserving through the 2nd linear),
     and the error halves when seeds quadruple (unbiasedness);
  3. fwd/bwd mask consistency — a replica kernel (same seed arithmetic,
     draw shapes, draw order, and grid as the real kernels) dumps the two
     keep-masks; a float64 host oracle then reproduces BOTH the real fused
     forward and every real VJP output from those masks. A mask mismatch
     in either pass flips ~10% of entries with O(1) effect; the comparison
     tolerance only has to absorb the ~4e-3 MXU bf16-truncation noise.
     (A finite-difference check is unusable here: TPU dots truncate f32
     inputs to bf16 at default precision, and that deterministic-but-
     input-dependent noise swamps an eps=1e-3 directional difference.)
  4. throughput of the fused vs plain (unfused XLA) path at flagship shape.

  5. elementwise dropout kernel (ops/dropout.py) — self-extracting masks:
     y/x recovers the forward's mask*scale values and a ones-cotangent VJP
     IS the backward's mask*scale; both patterns must agree entrywise.

Run: python benchmarks/validate_mlp_tpu.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax                      # noqa: E402
import jax.numpy as jnp         # noqa: E402

from mmd_tpu.models import layers as L    # noqa: E402
from mmd_tpu.ops.mlp import (              # noqa: E402
    _fused_mlp_core, _gelu_tanh, _keep_scale, _rows_per_block,
)

OUT = REPO / "benchmarks" / "MLP_TPU_VALIDATION.json"
RATE = 0.1


def _dump_masks(x2, w1, w2, seed, rate):
    """Replica of ops/mlp._fwd_kernel's PRNG usage (same seed arithmetic,
    draw shapes, draw order, grid) that RETURNS the two keep-masks. Uses
    the real _keep_scale/_rows_per_block so any drift in the kernel's
    draw pattern shows up here as an oracle mismatch."""
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = x2.shape
    f = w1.shape[1]

    def kernel(seed_ref, x_ref, w1_ref, w2_ref, m1_ref, m2_ref, *, rate):
        # two-seed layout (ops/mlp): [0] mid stream, [1] out stream
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        x = x_ref[:]
        a = jax.lax.dot_general(x, w1_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        h = _gelu_tanh(a)
        m1 = _keep_scale(h.shape, rate)
        y = jax.lax.dot_general((h * m1).astype(x.dtype), w2_ref[:],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        pltpu.prng_seed(seed_ref[1] + pl.program_id(0))
        m2 = _keep_scale((x.shape[0], w2_ref.shape[1]), rate)
        m1_ref[:] = m1
        m2_ref[:] = m2 + 0.0 * y   # keep the 2nd dot live, as in the kernel

    bn = _rows_per_block(n, d, f, x2.dtype.itemsize)
    row = pl.BlockSpec((bn, d), lambda i, *_: (i, 0),
                       memory_space=pltpu.VMEM)
    hid = pl.BlockSpec((bn, f), lambda i, *_: (i, 0),
                       memory_space=pltpu.VMEM)
    w1s = pl.BlockSpec((d, f), lambda i, *_: (0, 0), memory_space=pltpu.VMEM)
    w2s = pl.BlockSpec((f, d), lambda i, *_: (0, 0), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(n // bn,),
        in_specs=[row, w1s, w2s], out_specs=(hid, row))
    call = jax.jit(lambda s, x, a, b: pl.pallas_call(
        functools.partial(kernel, rate=rate),
        out_shape=(jax.ShapeDtypeStruct((n, f), jnp.float32),
                   jax.ShapeDtypeStruct((n, d), jnp.float32)),
        grid_spec=grid_spec)(s, x, a, b))
    return call(seed, x2, w1, w2)


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    results = {"backend": str(jax.devices()[0]), "rate": RATE}
    rng = np.random.default_rng(0)
    d, f, n = 256, 1024, 2048
    p = L.mlp_init(jax.random.key(1), d, f / d)
    w1 = p["fc1"]["w"].astype(jnp.bfloat16)
    b1 = p["fc1"]["b"].astype(jnp.float32)
    w2 = p["fc2"]["w"].astype(jnp.bfloat16)
    b2 = p["fc2"]["b"].astype(jnp.float32)
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.bfloat16)

    fused = jax.jit(lambda x, s, r: _fused_mlp_core(x, w1, b1, w2, b2, s, r),
                    static_argnums=2)

    # 1. rate=0 hardware parity vs plain XLA (fwd + all grads)
    def plain(x_, w1_, b1_, w2_, b2_):
        h = jax.nn.gelu(x_ @ w1_ + b1_, approximate=True)
        return h @ w2_ + b2_

    w1f32, w2f32 = w1.astype(jnp.float32), w2.astype(jnp.float32)
    xf32 = jnp.asarray(rng.standard_normal((512, d)), jnp.float32)
    dy32 = jnp.asarray(rng.standard_normal((512, d)), jnp.float32)
    zero_seed = jnp.zeros((2,), jnp.int32)
    gf = jax.jit(jax.grad(lambda *a: (_fused_mlp_core(*a, zero_seed, 0.0)
                                      * dy32).sum(), argnums=(0, 1, 2, 3, 4)))(
        xf32, w1f32, b1, w2f32, b2)
    gp = jax.jit(jax.grad(lambda *a: (plain(*a) * dy32).sum(),
                          argnums=(0, 1, 2, 3, 4)))(xf32, w1f32, b1, w2f32, b2)
    worst = 0.0
    for a_, b_ in zip(gf, gp):
        a_, b_ = np.asarray(a_, np.float64), np.asarray(b_, np.float64)
        worst = max(worst, float(np.abs(a_ - b_).max()
                                 / (np.abs(b_).max() + 1e-12)))
    results["rate0_grad_parity_max_rel"] = worst
    print(f"[mlp-val] rate=0 grads vs plain XLA on TPU: max rel {worst:.2e}")
    assert worst < 1e-3, worst

    # 2. mean preservation over seeds: inverted dropout is exactly
    # mean-preserving through the 2nd linear, so the seed-average must
    # converge to the no-dropout output at the Monte-Carlo rate. Check the
    # error at n and n/4 seeds: unbiased sampling halves it (x0.5 +- slack);
    # a biased mask would leave a floor instead.
    y0 = np.asarray(fused(x, jnp.zeros((2,), jnp.int32), 0.0),
                    np.float32)
    acc = np.zeros_like(y0)
    n_seeds = 256
    err_at = {}
    for s in range(n_seeds):
        acc += np.asarray(fused(x, jnp.asarray([s * 7919, s * 7919 + 104729], jnp.int32),
                                RATE), np.float32)
        if s + 1 in (n_seeds // 4, n_seeds):
            err_at[s + 1] = float(np.mean(np.abs(acc / (s + 1) - y0))
                                  / (np.mean(np.abs(y0)) + 1e-9))
    mean_err = err_at[n_seeds]
    results["mean_preservation_rel_err"] = err_at
    print(f"[mlp-val] mean preservation rel err: {err_at}")
    assert mean_err < 0.05, err_at
    assert mean_err < 0.75 * err_at[n_seeds // 4], err_at  # ~0.5 if unbiased

    # 3. fwd/bwd mask consistency via dumped masks + float64 host oracle.
    # Everything jitted: EAGER pallas dispatch through the axon tunnel
    # returns wrong values (verified 2026-08-16: the same checks pass
    # jitted and fail eagerly while the jitted kernel matches plain XLA
    # bit-for-bit), so all device calls here go through jax.jit.
    seed = jnp.asarray([12345, 54321], jnp.int32)
    nf = 512
    xf = jnp.asarray(rng.standard_normal((nf, d)), jnp.float32)
    dy = jnp.asarray(rng.standard_normal((nf, d)), jnp.float32)
    w1f, w2f = w1.astype(jnp.float32), w2.astype(jnp.float32)

    m1, m2 = map(lambda a: np.asarray(a, np.float64),
                 _dump_masks(xf, w1f, w2f, seed, RATE))
    results["mask_keep_rates"] = [float(m1.astype(bool).mean()),
                                  float(m2.astype(bool).mean())]
    for mr in results["mask_keep_rates"]:
        assert abs(mr - (1.0 - RATE)) < 0.01, results["mask_keep_rates"]

    # float64 host oracle using the dumped masks
    x64 = np.asarray(xf, np.float64)
    w1_64, b1_64 = np.asarray(w1f, np.float64), np.asarray(b1, np.float64)
    w2_64, b2_64 = np.asarray(w2f, np.float64), np.asarray(b2, np.float64)
    dy64 = np.asarray(dy, np.float64)
    c, kk = float(np.sqrt(2.0 / np.pi)), 0.044715
    a64 = x64 @ w1_64 + b1_64
    t64 = np.tanh(c * (a64 + kk * a64 ** 3))
    g64 = 0.5 * a64 * (1.0 + t64)
    h64 = g64 * m1
    y64 = (h64 @ w2_64 + b2_64) * m2

    f = jax.jit(lambda x_: _fused_mlp_core(x_, w1f, b1, w2f, b2, seed, RATE))
    y_dev = np.asarray(f(xf), np.float64)
    fwd_rel = float(np.abs(y_dev - y64).max() / (np.abs(y64).max() + 1e-12))
    results["fwd_vs_mask_oracle_max_rel"] = fwd_rel
    print(f"[mlp-val] fused fwd vs mask-oracle (f64): max rel {fwd_rel:.2e}")
    assert fwd_rel < 2e-2, fwd_rel   # MXU bf16 truncation only

    grads_dev = jax.jit(jax.grad(
        lambda x_, w1_, b1_, w2_, b2_: (_fused_mlp_core(
            x_, w1_, b1_, w2_, b2_, seed, RATE) * dy).sum(),
        argnums=(0, 1, 2, 3, 4)))(xf, w1f, b1, w2f, b2)
    dy0 = dy64 * m2
    dh = dy0 @ w2_64.T
    dgel = 0.5 * (1.0 + t64) + 0.5 * a64 * (1.0 - t64 ** 2) * c * (
        1.0 + 3.0 * kk * a64 ** 2)
    da = dh * m1 * dgel
    oracle = (da @ w1_64.T,            # dx
              x64.T @ da,              # dw1
              da.sum(0),               # db1
              h64.T @ dy0,             # dw2
              dy0.sum(0))              # db2
    worst_bwd = 0.0
    for name, dev, orc in zip(("dx", "dw1", "db1", "dw2", "db2"),
                              grads_dev, oracle):
        dev = np.asarray(dev, np.float64)
        rel = float(np.abs(dev - orc).max() / (np.abs(orc).max() + 1e-12))
        worst_bwd = max(worst_bwd, rel)
        print(f"[mlp-val]   {name} vs oracle: max rel {rel:.2e}")
    results["bwd_vs_mask_oracle_max_rel"] = worst_bwd
    assert worst_bwd < 2e-2, worst_bwd

    # 3. throughput: fused vs plain at flagship shape
    from benchmarks.timing import bench_iter_time, data_dep
    B, T = 256, 512
    xb = jnp.asarray(rng.standard_normal((B, T, d)), jnp.bfloat16)
    key = jax.random.key(0)

    def _plain_mlp(pp, xx):
        r1, r2 = jax.random.split(jax.random.fold_in(key, 3))
        h = L.linear(pp["fc1"], xx, jnp.bfloat16)
        h = jax.nn.gelu(h, approximate=True)
        h = L.dropout(h, RATE, r1, False)
        h = L.linear(pp["fc2"], h, jnp.bfloat16)
        return L.dropout(h, RATE, r2, False)

    def make_runner(mlp_fn):
        def run(c, p_, x_):
            x_ = data_dep(x_, c)
            g = jax.grad(lambda pp, xx: mlp_fn(pp, xx).sum().astype(
                jnp.float32))(p_, x_)
            return sum(y.sum() for y in jax.tree_util.tree_leaves(g)).astype(
                jnp.float32)
        return run

    fused_fn = lambda pp, xx: L.mlp(pp, xx, RATE, jax.random.fold_in(key, 3),
                                    False, jnp.bfloat16)
    dt = bench_iter_time(make_runner(fused_fn), (p, xb),
                         k_small=2, k_large=12, reps=3)
    dt_plain = bench_iter_time(make_runner(_plain_mlp), (p, xb),
                               k_small=2, k_large=12, reps=3)
    results["fused_mlp_fwd_bwd_drop_ms"] = round(dt * 1e3, 3)
    results["plain_mlp_fwd_bwd_drop_ms"] = round(dt_plain * 1e3, 3)
    print(f"[mlp-val] fwd+bwd dropout: fused {dt*1e3:.3f} ms vs plain "
          f"{dt_plain*1e3:.3f} ms")

    # 5. elementwise dropout kernel: self-extracting mask check. x has no
    # zeros, so m_fwd = y / x recovers mask*scale (0 or 1/(1-rate), up to
    # one f32 multiply rounding); vjp with a ones cotangent returns
    # EXACTLY the backward's mask*scale. Patterns and values must agree.
    from mmd_tpu.ops.dropout import fused_dropout
    key = jax.random.key(42)
    xe = jax.random.uniform(jax.random.key(5), (768, 256), jnp.float32,
                            minval=1.0, maxval=2.0)
    y = np.asarray(jax.jit(lambda x_: fused_dropout(x_, RATE, key))(xe),
                   np.float64)
    dx = np.asarray(jax.jit(lambda x_, g: jax.vjp(
        lambda q: fused_dropout(q, RATE, key), x_)[1](g)[0])(
        xe, jnp.ones_like(xe)), np.float64)
    m_fwd = y / np.asarray(xe, np.float64)
    inv = 1.0 / (1.0 - RATE)
    agree = float(((m_fwd > 0.5 * inv) == (dx > 0.5 * inv)).mean())
    keep_rate = float((dx > 0.5 * inv).mean())
    maxdiff = float(np.abs(m_fwd - dx).max())
    results["elemwise_dropout"] = {"pattern_agreement": agree,
                                   "keep_rate": keep_rate,
                                   "max_mask_value_diff": maxdiff}
    print(f"[mlp-val] elemwise dropout: pattern agree={agree:.6f} "
          f"keep={keep_rate:.4f} maxdiff={maxdiff:.2e}")
    assert agree == 1.0 and abs(keep_rate - (1 - RATE)) < 0.01, \
        results["elemwise_dropout"]
    assert maxdiff < 1e-5, maxdiff   # one f32 multiply rounding only

    OUT.write_text(json.dumps(results, indent=1))
    print(f"[mlp-val] all checks passed -> {OUT}")


if __name__ == "__main__":
    main()
