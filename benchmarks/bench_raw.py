"""Raw-path train-step benchmark: frozen encoders INSIDE the compiled step.

The reference's non-pre_embed training path (reference train.py:134-143)
re-encodes every batch through the frozen text and image encoders before
the fusion update. Here that whole pipeline — DeBERTa-v3-xsmall x2 (claim +
doc, 512 tokens), image encoder x2 (uint8 -> device-normalize -> ViT), and
the fusion fwd/bwd/AdamW — runs as ONE compiled step
(training/trainer.py::make_encoding_raw_step). It is the heaviest graph in
the framework, so it lives in its own script: the remote compile alone can
take tens of minutes, and the fori_loop trip count is a TRACED argument so
one compile serves both timing loop lengths.

Merges `raw_train_samples_per_sec` into benchmarks/results.json and
regenerates BENCHMARKS.md via bench_suite.write_markdown.

Run: python benchmarks/bench_raw.py [--batch 64]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

REPO = Path(__file__).resolve().parent.parent


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--swin", action="store_true",
                   help="use the exact Swinv2-base image encoder (the "
                        "reference's) instead of the ViT substitute; "
                        "records raw_train_swin_samples_per_sec")
    args = p.parse_args()

    from mmd_tpu.core.mesh import require_tpu
    require_tpu()
    import jax
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from mmd_tpu.core.config import ModelConfig, TrainConfig
    from mmd_tpu.core.mesh import make_mesh
    from mmd_tpu.models import deberta as D
    from mmd_tpu.models import vit as V
    from mmd_tpu.models.frozen import FrozenEncoders
    from mmd_tpu.training.trainer import Trainer, make_encoding_raw_step

    rng = np.random.default_rng(0)
    RB = args.batch
    import dataclasses as _dc
    dcfg = _dc.replace(D.DEBERTA_V3_XSMALL, compute_dtype="bfloat16")
    if args.swin:
        from mmd_tpu.models import swin as SW
        vcfg = _dc.replace(SW.SWIN_BASE_256, fused_attn=True)
        vparams = SW.init_swin(jax.random.key(4), vcfg)
    else:
        vcfg = V.ViTConfig()
        vparams = V.init_vit(jax.random.key(4), vcfg)
    enc = FrozenEncoders(
        tokenizer=None, text_cfg=dcfg,
        text_params=D.init_deberta(jax.random.key(3), dcfg),
        vit_cfg=vcfg, vit_params=vparams)
    cfg = TrainConfig(model=ModelConfig(fused_attn=True,
                                        compute_dtype="bfloat16"),
                      batch_size=RB)
    trainer = Trainer(cfg, make_mesh())
    state = trainer.init()
    raw = make_encoding_raw_step(cfg, enc)
    frozen = {"text": enc.text_params, "vit": enc.vit_params}
    batch = {
        "claim_ids": jnp.asarray(
            rng.integers(0, dcfg.vocab_size, (RB, 512)), jnp.int32),
        "claim_mask": jnp.ones((RB, 512), jnp.int32),
        "doc_ids": jnp.asarray(
            rng.integers(0, dcfg.vocab_size, (RB, 512)), jnp.int32),
        "doc_mask": jnp.ones((RB, 512), jnp.int32),
        "claim_image": jnp.asarray(
            rng.integers(0, 255, (RB, 256, 256, 3)), jnp.uint8),
        "doc_image": jnp.asarray(
            rng.integers(0, 255, (RB, 256, 256, 3)), jnp.uint8),
        "labels": jnp.asarray(rng.integers(0, 3, (RB, 4)), jnp.int32),
    }

    @jax.jit
    def run_raw(k, state, frozen, batch):
        # the encoder inputs must depend on the loop carry, or XLA hoists
        # the ENTIRE frozen encode (loop-invariant batch + frozen params)
        # out of the fori_loop and the delta only times the fusion update
        # (observed: 35 ms/step "raw" == the fusion-only rate). flag is 0
        # in practice but underivable at compile time.
        def body(i, s):
            leaf = jax.tree_util.tree_leaves(s.params)[0]
            flag = jnp.where(jnp.isnan(jnp.sum(leaf)), 1, 0)
            b = dict(batch)
            for key in ("claim_ids", "doc_ids"):
                b[key] = b[key] + flag.astype(b[key].dtype)
            for key in ("claim_image", "doc_image"):
                b[key] = b[key] + flag.astype(b[key].dtype)
            return raw(s, frozen, b)[0]

        st = jax.lax.fori_loop(0, k, body, state)
        return raw(st, frozen, batch)[1]["loss"]

    t0 = time.time()
    loss = float(run_raw(1, state, frozen, batch))
    print(f"[raw] compile+first-run: {time.time()-t0:.0f}s loss={loss:.4f}",
          file=sys.stderr)

    def wall(k, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run_raw(k, state, frozen, batch))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    dt = max((wall(8) - wall(2)) / 6, 1e-9)
    rate = RB / dt
    print(f"[raw] {dt*1e3:.1f} ms/step @ batch {RB} -> {rate:,.0f} samples/s",
          file=sys.stderr)

    rj = REPO / "benchmarks" / "results.json"
    out = json.loads(rj.read_text()) if rj.exists() else {}
    key = ("raw_train_swin_samples_per_sec" if args.swin
           else "raw_train_samples_per_sec")
    out[key] = round(rate, 1)
    out["raw_train_batch"] = RB
    rj.write_text(json.dumps(out, indent=1))
    from bench_suite import write_markdown
    write_markdown(out)
    print(json.dumps({"raw_train_samples_per_sec": out[
        "raw_train_samples_per_sec"]}))


if __name__ == "__main__":
    main()
