"""Train the misinformation fusion model on TPU (data-parallel over ICI).

CLI contract mirrors the reference's root train.py (reference train.py:24-85):
  python train.py --pre_embed --train_data data/preprocessed/train.csv \
      --epochs 50 --batch_size 32 --lr 1e-4 [--val_data ... --save_best ...]

Differences by design:
  * runs on a jax.sharding.Mesh (all local devices) instead of one GPU id;
  * --pre_embed reads the ArrayStore written by the embed pipeline
    (mmd_tpu.pipelines.embed) instead of an h5 file;
  * checkpoints are orbax and RESUMABLE (--resume_from), unlike the
    reference's load-for-eval-only torch.save (train.py:233-242);
  * metrics go to <output_dir>/metrics.jsonl always, wandb only if --wandb.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args():
    from mmd_tpu.core.config import add_train_flags
    p = argparse.ArgumentParser(description="Train misinformation detection model")
    add_train_flags(p)
    p.add_argument("--wandb", action="store_true", help="also log to wandb")
    p.add_argument("--synthetic_samples", type=int, default=0,
                   help="train on N synthetic pre-embedded samples (smoke runs)")
    return p.parse_args()


def store_path_for_csv(csv_path: str, pre_embed: bool) -> str:
    """Derive the store dir from the csv path (reference dataset.py:137-139
    derives {base}.h5 / {base}_embeddings.h5 the same way)."""
    base = os.path.splitext(csv_path)[0]
    return base + ("_embeddings.store" if pre_embed else ".store")


def main():
    args = parse_args()
    import jax
    if jax.default_backend() == "tpu":
        # hardware RBG keys: dropout-mask generation is ~20% of the step
        # under threefry on TPU; rbg is statistically fine for dropout
        jax.config.update("jax_default_prng_impl", "rbg")
    from mmd_tpu.core.config import train_config_from_args
    from mmd_tpu.core.mesh import make_mesh
    from mmd_tpu.data.store import ArrayStore
    from mmd_tpu.data.synthetic import synthetic_preembed_batch
    from mmd_tpu.training.loop import run_training
    from mmd_tpu.training.trainer import Trainer

    cfg = train_config_from_args(args)
    mesh = make_mesh(model_parallel=cfg.mesh.model_parallel)
    trainer = Trainer(cfg, mesh, tensor_parallel=cfg.mesh.tensor_parallel,
                      zero1=cfg.mesh.zero1, zero3=cfg.mesh.zero3)
    print(f"[train] mesh: {mesh}")

    if args.synthetic_samples:
        rng = np.random.default_rng(cfg.seed)
        n_batches = max(1, args.synthetic_samples // cfg.batch_size)
        data = [synthetic_preembed_batch(rng, cfg.batch_size)
                for _ in range(n_batches)]

        def train_batches(epoch):
            return iter(data)
        val_batches = None
    elif cfg.data.pre_embed:
        store = ArrayStore(store_path_for_csv(cfg.data.train_data, True))
        print(f"[train] {len(store)} pre-embedded samples")

        def train_batches(epoch):
            return store.batches(cfg.batch_size, shuffle=cfg.data.shuffle,
                                 seed=cfg.seed + epoch, drop_last=True)

        val_batches = None
        if cfg.data.val_data:
            val_store = ArrayStore(store_path_for_csv(cfg.data.val_data, True))

            def val_batches():
                return val_store.batches(cfg.batch_size, drop_last=False)
    else:
        # Raw path (reference train.py default): frozen encoders run inside
        # the compiled step; the raw store auto-builds like the reference's
        # lazy h5 (dataset.py:141-146).
        import os
        import pandas as pd
        from mmd_tpu.models.frozen import load_or_init_frozen
        from mmd_tpu.pipelines.raw_store import build_raw_store, raw_store_path

        df = pd.read_csv(cfg.data.train_data)
        texts = (df["claim"].fillna("").astype(str).tolist()
                 + df["evidence"].fillna("").astype(str).tolist())
        enc = load_or_init_frozen("assets/encoders", vocab_texts=texts)
        sp = raw_store_path(cfg.data.train_data)
        if not os.path.exists(os.path.join(sp, "meta.json")):
            print(f"[train] raw store not found at {sp}; building...")
        store = build_raw_store(cfg.data.train_data, enc.tokenizer)
        print(f"[train] {len(store)} raw samples (on-the-fly encoding)")
        trainer = Trainer(cfg, mesh, encoders=enc,
                          tensor_parallel=cfg.mesh.tensor_parallel,
                          zero1=cfg.mesh.zero1, zero3=cfg.mesh.zero3,
                          finetune=getattr(args, "finetune_encoders", False),
                          text_parallelism=getattr(
                              args, "text_parallelism", None))

        def train_batches(epoch):
            return store.batches(cfg.batch_size, shuffle=cfg.data.shuffle,
                                 seed=cfg.seed + epoch, drop_last=True,
                                 columns=["claim_ids", "claim_mask",
                                          "doc_ids", "doc_mask",
                                          "claim_image", "doc_image",
                                          "labels"])
        val_batches = None

    state = run_training(trainer, train_batches, val_batches,
                         use_wandb=args.wandb)
    print(f"[train] done at step {int(state.step)}")


if __name__ == "__main__":
    main()
