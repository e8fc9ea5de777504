"""Same-process A/B: DeBERTa fine-tuning with the trainable Pallas kernel
(DebertaConfig.fused_train) vs the jnp one-hot path.

The serving kernel is worth ~4x on the forward (1,971 vs 452 seq/s,
BENCHMARKS.md); this measures what the hand-derived backward
(_deberta_attn_bwd_kernel) buys END-TO-END when the reference's actual
text encoder is trained inside the step. Run AFTER
validate_deberta_bwd_tpu.py passes (the backlog orders them). Decide per
the house protocol: 5 interleaved reps, medians; flip fused_train's
default for fine-tuning on a clear win.

Run on the TPU chip:  python benchmarks/bench_deberta_ft_ab.py
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
    from mmd_tpu.models import deberta as D
    from mmd_tpu.models import vit as V
    from mmd_tpu.models.frozen import FrozenEncoders
    from mmd_tpu.training.trainer import (init_finetune_state,
                                          make_finetune_raw_step)

    B, T = 16, 256
    mesh = make_mesh(jax.devices()[:1])
    base_tcfg = dataclasses.replace(D.DEBERTA_V3_XSMALL, vocab_size=30000,
                                    compute_dtype="bfloat16")
    vcfg = V.ViTConfig()
    tparams = D.init_deberta(jax.random.key(0), base_tcfg)
    vparams = V.init_vit(jax.random.key(1), vcfg)
    model = ModelConfig(text_input_dim=base_tcfg.hidden_size,
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

    def build(tag, fused_train):
        tcfg = dataclasses.replace(base_tcfg, fused_attn=fused_train,
                                   fused_train=fused_train)
        enc = FrozenEncoders(tokenizer=None, text_cfg=tcfg,
                             text_params=tparams, vit_cfg=vcfg,
                             vit_params=vparams)
        cfg = TrainConfig(model=model, batch_size=B,
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

        return tag, make(2), make(8), state, batch

    variants = [build("jnp_path", False), build("fused_train", True)]
    for tag, fs, fl, state, batch in variants:
        print(f"[compile] {tag}", flush=True)
        float(fs(state, batch)); float(fl(state, batch))

    times = {tag: [] for tag, *_ in variants}
    for rep in range(5):
        for tag, fs, fl, state, batch in variants:
            t0 = time.perf_counter(); float(fs(state, batch))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter(); float(fl(state, batch))
            tl = time.perf_counter() - t0
            times[tag].append((tl - ts) / 6.0)
    out = {}
    for tag, vals in times.items():
        dt = float(np.median(vals))
        out[tag] = dt
        print(f"{tag}: {dt*1e3:.2f} ms/step -> {B/dt:,.0f} samples/s")
    delta = (out["jnp_path"] - out["fused_train"]) / out["jnp_path"] * 100
    print(f"trainable DeBERTa kernel saves {delta:+.1f}% of the "
          f"fine-tuning step")
    from ab_log import record
    record("deberta_fused_train_ab", {
        "jnp_samples_per_s": round(B / out["jnp_path"], 1),
        "fused_samples_per_s": round(B / out["fused_train"], 1),
        "fused_saves_pct": round(delta, 1),
        "protocol": "in-jit fori delta, 5 interleaved reps, medians"})


if __name__ == "__main__":
    main()
