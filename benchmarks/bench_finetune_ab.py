"""Same-process A/B: end-to-end fine-tuning step with vs without remat.

TrainConfig.remat wraps every trainable-encoder block in jax.checkpoint —
exact same gradients (tests/test_remat.py), ~1 extra encoder forward of
FLOPs in exchange for dropping intra-block activations from the
backward's live set. This measures the FLOPs tax at a realistic single
-chip fine-tuning shape so the flag's cost is a committed number, not a
guess (the memory win is what it buys: bigger fine-tune batches before
HBM OOM).

Protocol: in-jit fori-loop deltas (benchmarks/timing.py discipline), 5
interleaved reps, medians — same as every logged A/B.

Run on the TPU chip:  python benchmarks/bench_finetune_ab.py
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

    from mmd_tpu.core.config import DataConfig, ModelConfig, TrainConfig
    from mmd_tpu.core.mesh import make_mesh
    from mmd_tpu.models import text_encoder as te
    from mmd_tpu.models import vit as V
    from mmd_tpu.models.frozen import FrozenEncoders
    from mmd_tpu.training.trainer import (init_finetune_state,
                                          make_finetune_raw_step)

    B, T = 32, 256
    mesh = make_mesh(jax.devices()[:1])
    tcfg = dataclasses.replace(te.TEXT_ENCODER_XSMALL, vocab_size=30000,
                               max_position=T, dropout=0.0)
    vcfg = V.ViTConfig()                       # 256px/32 -> 64 tokens
    enc = FrozenEncoders(
        tokenizer=None, text_cfg=tcfg,
        text_params=te.init_text_encoder(jax.random.key(0), tcfg),
        vit_cfg=vcfg, vit_params=V.init_vit(jax.random.key(1), vcfg))
    model = ModelConfig(text_input_dim=tcfg.hidden_size,
                        image_input_dim=vcfg.hidden_size,
                        fused_attn=True, compute_dtype="bfloat16",
                        dropout=0.0)
    rr = np.random.default_rng(0)
    host = {
        "claim_ids": rr.integers(1, 29000, (B, T)).astype(np.int32),
        "claim_mask": np.ones((B, T), np.int32),
        "doc_ids": rr.integers(1, 29000, (B, T)).astype(np.int32),
        "doc_mask": np.ones((B, T), np.int32),
        "claim_image": rr.integers(0, 255, (B, 256, 256, 3)).astype(np.uint8),
        "doc_image": rr.integers(0, 255, (B, 256, 256, 3)).astype(np.uint8),
        "labels": np.stack([np.array([0, 1, 2, 1], np.int32)] * B),
    }

    def build(tag, remat):
        cfg = TrainConfig(model=model, batch_size=B, remat=remat,
                          data=DataConfig(text_seq_len=T, image_seq_len=64))
        step = make_finetune_raw_step(cfg, enc)
        state = jax.device_put(init_finetune_state(cfg, enc,
                                                   jax.random.key(0)),
                               NamedSharding(mesh, P()))
        batch = jax.device_put(host, NamedSharding(mesh, P("data")))

        def make(k):
            @jax.jit
            def run(state, batch):
                st = jax.lax.fori_loop(
                    0, k, lambda i, s: step(s, batch)[0], state)
                return step(st, batch)[1]["loss"]
            return run

        return tag, make(2), make(10), state, batch

    variants = [build("plain", False), build("remat", True)]
    for tag, fs, fl, state, batch in variants:   # compile both first
        print(f"[compile] {tag}", flush=True)
        float(fs(state, batch)); float(fl(state, batch))

    times = {tag: [] for tag, *_ in variants}
    for rep in range(5):                          # interleaved reps
        for tag, fs, fl, state, batch in variants:
            t0 = time.perf_counter(); float(fs(state, batch))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter(); float(fl(state, batch))
            tl = time.perf_counter() - t0
            times[tag].append((tl - ts) / 8.0)
    out = {}
    for tag, vals in times.items():
        dt = float(np.median(vals))
        out[tag] = dt
        print(f"{tag}: {dt*1e3:.2f} ms/step -> {B/dt:,.0f} samples/s")
    delta = (out["remat"] - out["plain"]) / out["plain"] * 100
    print(f"remat FLOPs tax: {delta:+.1f}% step time "
          f"(buys intra-block activation memory for bigger batches)")
    from ab_log import record
    record("finetune_remat_ab", {
        "plain_samples_per_s": round(B / out["plain"], 1),
        "remat_samples_per_s": round(B / out["remat"], 1),
        "remat_tax_pct": round(delta, 1),
        "protocol": "in-jit fori delta, interleaved reps, medians"})


if __name__ == "__main__":
    main()
