"""Same-process A/B over the fusion step's structural GEMM-tail variants.

Variants (all equality-tested vs the baseline layout in tests/):
  four_calls     baseline: 4 evidence-path attentions, 4 classifier heads
  merged         ModelConfig.merged_paths — two shared-K/V attention calls
                 (queries concatenated to 576 rows, padded to 640) + the
                 two shared-weight MLP calls batched per claim modality
  stacked        ModelConfig.stacked_heads — the four classifier heads as
                 one batched GEMM pair
  merged_stacked both flags

Times the FULL train step each way in one process (in-jit fori-loop
deltas, 5 interleaved reps, medians — the only A/B protocol whose deltas
are trustworthy on the tunneled chip).

Run on the TPU chip:  python benchmarks/bench_merged_ab.py
"""

from __future__ import annotations

import dataclasses
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    from mmd_tpu.core.mesh import require_tpu
    require_tpu()
    import jax
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mmd_tpu.core.config import ModelConfig, TrainConfig
    from mmd_tpu.core.mesh import make_mesh
    from mmd_tpu.data.synthetic import synthetic_preembed_batch
    from mmd_tpu.training.trainer import init_state, make_raw_step

    B = 256
    mesh = make_mesh(jax.devices()[:1])
    rng = np.random.default_rng(0)
    host = synthetic_preembed_batch(rng, B)
    for k in list(host):
        if host[k].dtype == np.float32:
            host[k] = host[k].astype(jnp.bfloat16)

    def build(tag, merged, stacked=False):
        model = ModelConfig(fused_attn=True, compute_dtype="bfloat16",
                            merged_paths=merged, stacked_heads=stacked)
        cfg = TrainConfig(model=model, batch_size=B)
        step = make_raw_step(cfg)
        state = jax.device_put(init_state(cfg, jax.random.key(0)),
                               NamedSharding(mesh, P()))
        batch = jax.device_put(host, NamedSharding(mesh, P("data")))

        def make(k):
            @jax.jit
            def run(state, batch):
                st = jax.lax.fori_loop(
                    0, k, lambda i, s: step(s, batch)[0], state)
                return step(st, batch)[1]["loss"]
            return run

        return tag, make(4), make(24), state, batch

    variants = [build("four_calls", False), build("merged", True),
                build("stacked", False, True),
                build("merged_stacked", True, True)]
    for tag, fs, fl, state, batch in variants:
        t0 = time.time()
        l1, l2 = float(fs(state, batch)), float(fl(state, batch))
        print(f"{tag}: compiled in {time.time()-t0:.0f}s "
              f"loss={l1:.4f}/{l2:.4f}", file=sys.stderr)

    times = {tag: [] for tag, *_ in variants}
    for rep in range(5):
        for tag, fs, fl, state, batch in variants:
            t0 = time.perf_counter(); float(fs(state, batch))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter(); float(fl(state, batch))
            tl = time.perf_counter() - t0
            times[tag].append((tl - ts) / 20.0)
    out = {}
    for tag, vals in times.items():
        dt = float(np.median(vals))
        out[tag] = dt
        print(f"{tag}: {dt*1e3:.2f} ms/step -> {B/dt:,.0f} samples/s")
    deltas = {}
    for tag in ("merged", "stacked", "merged_stacked"):
        delta = (out[tag] - out["four_calls"]) / out["four_calls"] * 100
        deltas[tag] = round(delta, 1)
        print(f"{tag} vs four-call: {delta:+.1f}%")
    from ab_log import record
    record("merged_paths_ab", {
        "samples_per_s": {t: round(B / v, 1) for t, v in out.items()},
        "vs_four_calls_pct": deltas,
        "protocol": "in-jit fori delta, 5 interleaved reps, medians"})


if __name__ == "__main__":
    main()
