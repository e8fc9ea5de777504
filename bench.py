"""Headline benchmark: fusion-model training throughput on TPU.

Runs the FULL training step (forward + backward + AdamW) of the flagship
fusion model at production shapes (text 512x384, image 64x1024 embeddings,
reference preprocess_embeddings.py:63-92; model defaults train.py:36-41) in
bfloat16, and prints ONE JSON line:

  {"metric": "fusion_train_samples_per_sec_per_chip", "value": N,
   "unit": "samples/s", "vs_baseline": R}

Timing uses the in-jit loop delta protocol (benchmarks/timing.py): K train
steps chained inside one jit, completion forced by a scalar D2H, per-step
time = (T_large - T_small) / dK. On tunneled TPU devices this is the only
honest clock — block_until_ready returns early and per-dispatch timing
measures tunnel overhead, not compute.

The reference publishes no numbers (BASELINE.md), so the baseline is
self-established: the first recorded value is stored in BENCH_BASELINE.json
and later runs report their ratio against it.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_BASELINE.json")
BATCH = 256
K_SMALL, K_LARGE, REPS = 2, 12, 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from mmd_tpu.core.mesh import require_tpu
    require_tpu()
    import jax
    # Hardware RBG keys: MLP-dropout mask generation is ~20% of the step
    # under threefry; rbg is statistically fine for dropout.
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    from mmd_tpu.core.config import ModelConfig, TrainConfig
    from mmd_tpu.core.mesh import make_mesh
    from mmd_tpu.data.synthetic import synthetic_preembed_batch
    from mmd_tpu.training.trainer import Trainer, make_raw_step

    n_chips = len(jax.devices())
    log(f"[bench] devices: {jax.devices()}")

    cfg = TrainConfig(
        model=ModelConfig(fused_attn=True, compute_dtype="bfloat16"),
        batch_size=BATCH)
    mesh = make_mesh()
    trainer = Trainer(cfg, mesh)
    state = trainer.init()
    raw_step = make_raw_step(cfg, trainer.optimizer)

    rng = np.random.default_rng(0)
    host = synthetic_preembed_batch(rng, BATCH)
    for k in list(host):
        if host[k].dtype == np.float32:
            host[k] = host[k].astype(jnp.bfloat16)
    batch = trainer.shard_batch(host)

    def make(k):
        @jax.jit
        def run(state, batch):
            def body(i, st):
                s, _ = raw_step(st, batch)
                return s
            st = jax.lax.fori_loop(0, k, body, state)
            _, aux = raw_step(st, batch)
            return aux["loss"]
        return run

    t0 = time.time()
    f_small, f_large = make(K_SMALL), make(K_LARGE)
    loss = float(f_small(state, batch))
    float(f_large(state, batch))
    log(f"[bench] compile: {time.time()-t0:.1f}s, loss={loss:.4f}")
    assert np.isfinite(loss), loss

    def wall(f):
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(f(state, batch))     # scalar D2H = completion barrier
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_small, t_large = wall(f_small), wall(f_large)
    dt = max((t_large - t_small) / (K_LARGE - K_SMALL), 1e-9)
    value = BATCH / dt / n_chips
    log(f"[bench] {dt*1e3:.3f} ms/step @ batch {BATCH} -> "
        f"{value:.0f} samples/s/chip (T{K_SMALL}={t_small:.3f}s "
        f"T{K_LARGE}={t_large:.3f}s)")

    baseline = None
    if os.path.exists(BASELINE_FILE):
        try:
            baseline = json.load(open(BASELINE_FILE)).get("value")
        except Exception:
            baseline = None
    if baseline is None:
        with open(BASELINE_FILE, "w") as f:
            json.dump({
                "metric": "fusion_train_samples_per_sec_per_chip",
                "value": value,
                "note": "self-established round-1 baseline (reference "
                        "publishes no numbers; see BASELINE.md); in-jit "
                        "delta-timing protocol",
            }, f, indent=1)
        baseline = value

    print(json.dumps({
        "metric": "fusion_train_samples_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "samples/s",
        "vs_baseline": round(value / baseline, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
