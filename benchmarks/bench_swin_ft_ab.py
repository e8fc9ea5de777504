"""Same-process A/B: Swinv2 fine-tuning with the trainable window-attention
kernel (SwinConfig.fused_train, ops/swin_attention._bwd_kernel) vs the
einsum path.

The fused kernel is worth +36% on the serving forward (883 -> 1,203 img/s,
swin_fused_attn_ab); this measures what the hand-derived backward (log2-
domain softmax bwd + CPB bias cotangent) buys END-TO-END when the
reference's actual image encoder (preprocess_embeddings.py:26-28) is
trained inside the step. Run AFTER validate_swin_bwd_tpu.py passes (it
has: benchmarks/SWIN_BWD_TPU_VALIDATION.json). Decide per the house
protocol: 5 interleaved reps, medians; flip fused_train's default for
fine-tuning on a clear win.

Run on the TPU chip:  python benchmarks/bench_swin_ft_ab.py
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
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mmd_tpu.core.config import DataConfig, ModelConfig, TrainConfig
    from mmd_tpu.core.mesh import make_mesh
    from mmd_tpu.models import swin as SW
    from mmd_tpu.models import text_encoder as te
    from mmd_tpu.models.frozen import FrozenEncoders
    from mmd_tpu.training.trainer import (init_finetune_state,
                                          make_finetune_raw_step)

    B, T = 8, 256
    mesh = make_mesh(jax.devices()[:1])
    base_scfg = SW.SWIN_BASE_256
    tcfg = dataclasses.replace(te.TEXT_ENCODER_XSMALL,
                               compute_dtype="bfloat16")
    tparams = te.init_text_encoder(jax.random.key(0), tcfg)
    sparams = SW.init_swin(jax.random.key(1), base_scfg)
    model = ModelConfig(text_input_dim=tcfg.hidden_size,
                        image_input_dim=base_scfg.hidden_size,
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

    def build(tag, fused):
        scfg = dataclasses.replace(base_scfg, fused_attn=fused,
                                   fused_train=fused)
        enc = FrozenEncoders(tokenizer=None, text_cfg=tcfg,
                             text_params=tparams, vit_cfg=scfg,
                             vit_params=sparams)
        cfg = TrainConfig(model=model, batch_size=B,
                          data=DataConfig(text_seq_len=T,
                                          image_seq_len=scfg.num_tokens))
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

    variants = [build("einsum_path", False), build("fused_train", True)]
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
    delta = (out["einsum_path"] - out["fused_train"]) / out["einsum_path"] * 100
    print(f"trainable Swin kernel saves {delta:+.1f}% of the "
          f"fine-tuning step")
    from ab_log import record
    record("swin_fused_train_ab", {
        "einsum_samples_per_s": round(B / out["einsum_path"], 1),
        "fused_samples_per_s": round(B / out["fused_train"], 1),
        "fused_saves_pct": round(delta, 1),
        "protocol": "in-jit fori delta, 5 interleaved reps, medians"})


if __name__ == "__main__":
    main()
