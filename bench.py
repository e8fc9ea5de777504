"""Headline benchmark: fusion-model training throughput on TPU.

Runs the FULL training step (forward + backward + AdamW) of the flagship
fusion model at production shapes (text 512x384, image 64x1024 embeddings,
reference preprocess_embeddings.py:63-92; model defaults train.py:36-41) in
bfloat16 with the Pallas fused-attention path, and prints ONE JSON line:

  {"metric": "fusion_train_samples_per_sec_per_chip", "value": N,
   "unit": "samples/s", "vs_baseline": R}

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
STEPS = 30


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from mmd_tpu.core.config import DataConfig, ModelConfig, TrainConfig
    from mmd_tpu.core.mesh import make_mesh
    from mmd_tpu.data.synthetic import synthetic_preembed_batch
    from mmd_tpu.training.trainer import Trainer

    n_chips = len(jax.devices())
    log(f"[bench] devices: {jax.devices()}")

    model = ModelConfig(fused_attn=True, compute_dtype="bfloat16")
    cfg = TrainConfig(model=model, batch_size=BATCH, data=DataConfig())
    mesh = make_mesh()
    trainer = Trainer(cfg, mesh)
    state = trainer.init()

    rng = np.random.default_rng(0)
    host = synthetic_preembed_batch(rng, BATCH)
    # bf16 on device: halves H2D volume and matches compute dtype
    for k in list(host):
        if host[k].dtype == np.float32:
            host[k] = host[k].astype(jnp.bfloat16)
    batch = trainer.shard_batch(host)

    t0 = time.time()
    state, aux = trainer.train_step(state, batch)
    jax.block_until_ready(aux["loss"])
    log(f"[bench] compile+first step: {time.time()-t0:.1f}s")

    # Warm. NOTE: no device->host transfer may happen anywhere before or
    # inside the timed loop — on tunneled TPU devices (axon) a single D2H
    # (even copy_to_host_async) permanently degrades every subsequent
    # dispatch in the process from ~1.3 ms to ~316 ms. block_until_ready
    # is safe; np.asarray/float() are not.
    for _ in range(5):
        state, aux = trainer.train_step(state, batch)
        jax.block_until_ready(aux["loss"])

    times = []
    for _ in range(STEPS):
        t0 = time.time()
        state, aux = trainer.train_step(state, batch)
        jax.block_until_ready(aux["loss"])
        times.append(time.time() - t0)
    dt = float(np.median(times))
    value = BATCH / dt / n_chips
    # Host pull AFTER timing: sanity-check the loss is finite.
    loss = float(np.asarray(aux["loss"]))
    assert np.isfinite(loss), loss
    log(f"[bench] {dt*1e3:.3f} ms/step @ batch {BATCH} -> "
        f"{value:.0f} samples/s/chip (final loss {loss:.4f})")

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
                        "publishes no numbers; see BASELINE.md)",
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
