"""Same-process A/B: DeBERTa fused-kernel score intermediates, f32 vs bf16.

Round-5 profile (benchmarks/PROFILE_DEBERTA.json): the fused attention
kernel is 17 of the 26 ms bf16 forward at batch 64 against a ~4.7 ms
matmul floor — VMEM-pass-bound on the (T, 2T) positional intermediates
(matmul writes, two strided rolls, the p2c transpose) and the f32 softmax
chain. The lowp variant (deberta.LOWP_SCORES) keeps those intermediates
in bf16, halving the dominant traffic; softmax math stays in f32
registers.

Times deberta_encode at the embed workload (v3-xsmall, batch 64, T=512,
bf16) — in-jit fori-loop deltas compiled ONCE per variant INSIDE its
patched LOWP_SCORES window (jit traces at first call — round-5 gotcha),
5 interleaved reps, medians. Also records the lowp-vs-f32i output gap on
identical inputs. Run on the TPU chip:

    python benchmarks/bench_deberta_lowp_ab.py [--batch 64]

Reference context: the frozen text tower of src/model/train.py:47.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from timing import data_dep  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()

    from mmd_tpu.core.mesh import require_tpu
    require_tpu()
    import jax
    import jax.numpy as jnp
    from mmd_tpu.models import deberta as D

    B, T = args.batch, 512
    K_SMALL, K_LARGE = 2, 8
    rng = np.random.default_rng(0)
    cfg = dataclasses.replace(D.DEBERTA_V3_XSMALL, vocab_size=1000,
                              compute_dtype="bfloat16")
    params = D.init_deberta(jax.random.key(2), cfg)
    ids = jnp.asarray(rng.integers(1, 1000, (B, T)), jnp.int32)
    m = np.ones((B, T), np.int64)
    m[1, 400:] = 0
    m[3, 100:] = 0
    mask = jnp.asarray(m, jnp.int32)

    def build(lowp: bool):
        # trace + compile INSIDE the patched window: jit compiles at first
        # CALL, so a late call would silently bake the other variant.
        def step(p, c, i, k):
            out = D.deberta_encode(p, cfg, data_dep(i, c).astype(jnp.int32),
                                   k)
            return jnp.mean(out).astype(jnp.float32)

        def make(kk):
            @jax.jit
            def run(p, i, k):
                return jax.lax.fori_loop(
                    0, kk, lambda _, c: step(p, c, i, k), jnp.float32(0.0))
            return run

        @jax.jit
        def fwd(p, i, k):
            return D.deberta_encode(p, cfg, i, k)

        prev = D.LOWP_SCORES
        D.LOWP_SCORES = lowp
        try:
            fs, fl = make(K_SMALL), make(K_LARGE)
            t0 = time.time()
            float(fs(params, ids, mask))
            float(fl(params, ids, mask))
            out = np.asarray(fwd(params, ids, mask), np.float32)
            print(f"lowp={lowp}: compiled in {time.time()-t0:.0f}s",
                  file=sys.stderr)
        finally:
            D.LOWP_SCORES = prev
        return fs, fl, out

    variants = {"f32i": build(False), "lowp": build(True)}

    valid = m.astype(bool)
    diff = float(np.abs(variants["lowp"][2] - variants["f32i"][2])
                 [valid].max())
    scale = float(np.abs(variants["f32i"][2]).max())
    print(f"lowp vs f32i outputs: max|diff|={diff:.2e} scale={scale:.2f} "
          f"rel={diff/scale:.2e}")

    dts = {tag: [] for tag in variants}
    for _ in range(args.reps):
        for tag, (fs, fl, _o) in variants.items():
            t0 = time.perf_counter(); float(fs(params, ids, mask))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter(); float(fl(params, ids, mask))
            tl = time.perf_counter() - t0
            dts[tag].append((tl - ts) / (K_LARGE - K_SMALL))
    out = {}
    for tag, vals in dts.items():
        dt = float(np.median(vals))
        out[tag] = dt
        print(f"{tag}: {dt*1e3:.2f} ms/batch{B} -> {B/dt:,.0f} seq/s")
    delta = (out["f32i"] - out["lowp"]) / out["f32i"] * 100
    print(f"lowp vs f32i: {delta:+.1f}% faster")
    from ab_log import record
    record("deberta_lowp_ab", {
        "f32i_seq_per_s": round(B / out["f32i"], 1),
        "lowp_seq_per_s": round(B / out["lowp"], 1),
        "lowp_speedup_pct": round(delta, 1),
        "output_rel_gap": round(diff / scale, 5),
        "protocol": f"in-jit fori delta, {args.reps} interleaved reps, "
                    "medians; compiled inside the patched window"})


if __name__ == "__main__":
    main()
