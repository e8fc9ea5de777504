"""Same-process A/B: bf16 vs int8 corpus retrieval scoring on TPU.

ops/topk.dense_topk_int8 runs the (Q, N) score matmul int8 x int8 on the
MXU (2x the bf16 peak) against a corpus that occupies HALF the HBM
(int8 rows + one f32 scale per row). The retrieval matmul at im2im scale
(41,256 x 2048) is HBM-bandwidth-bound, so the expected win tracks the
traffic cut more than the peak ratio. Decide per the house protocol: 5
interleaved reps, medians; flip the corpus loaders' `int8` default only
on a clear win (correctness/recall is already pinned by
tests/test_topk.py + tests/test_retrieval.py).

Run on the TPU chip:  python benchmarks/bench_int8_ab.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def main():
    from mmd_tpu.core.mesh import require_tpu
    require_tpu()
    import jax
    import jax.numpy as jnp

    from timing import bench_iter_time, data_dep
    from mmd_tpu.ops.topk import (dense_topk, dense_topk_int8, l2_normalize,
                                  quantize_rows_int8)

    rng = np.random.default_rng(0)
    QB = 64
    results = {}
    for name, (n, d) in {"im2im": (41256, 2048),
                         "text2text": (42500, 768)}.items():
        corpus_f = rng.standard_normal((n, d)).astype(np.float32)
        corpus_bf = jnp.asarray(corpus_f, jnp.bfloat16)
        q8, sc = jax.jit(
            lambda f: quantize_rows_int8(l2_normalize(f)))(
                jnp.asarray(corpus_f))
        q = jnp.asarray(rng.standard_normal((QB, d)), jnp.bfloat16)
        qf = jnp.asarray(np.asarray(q, np.float32))

        def bf16_step(c, q, corpus):
            s, _ = dense_topk(data_dep(q, c), corpus, 10)
            return jnp.mean(s).astype(jnp.float32)

        def int8_step(c, q, q8, sc):
            s, _ = dense_topk_int8(data_dep(q, c), q8, sc, 10)
            return jnp.mean(s).astype(jnp.float32)

        ts, reps = [], 5
        for _ in range(reps):
            ts.append((bench_iter_time(bf16_step, (q, corpus_bf), 4, 24),
                       bench_iter_time(int8_step, (qf, q8, sc), 4, 24)))
        t_bf = float(np.median([a for a, _ in ts]))
        t_i8 = float(np.median([b for _, b in ts]))
        print(f"{name} ({n}x{d}): bf16 {QB/t_bf:,.0f} qps | "
              f"int8 {QB/t_i8:,.0f} qps | "
              f"speedup {t_bf/t_i8:.2f}x")
        results[name] = {"bf16_qps": round(QB / t_bf, 0),
                         "int8_qps": round(QB / t_i8, 0),
                         "speedup_x": round(t_bf / t_i8, 2)}
    from ab_log import record
    record("int8_retrieval_ab", {
        **results,
        "protocol": "in-jit fori delta, 5 interleaved reps, medians"})


if __name__ == "__main__":
    main()
