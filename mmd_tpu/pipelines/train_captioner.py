"""Train the captioner on (image, caption) pairs.

The reference uses a pretrained BLIP checkpoint it cannot train
(caption.py:10-13). Here the captioner is a real trainable model
(models/captioner.py caption_loss): feed any CSV with an image-path column
and a caption column (e.g. a previously-enriched CSV, or any external
captions dataset mapped to the schema) and this driver teacher-forces the
decoder. The trained checkpoint saves to <assets>/captioner.ckpt and
CaptionEngine picks it up automatically.

Usage: python -m mmd_tpu.pipelines.train_captioner \
    --csv data/preprocessed/train_enriched.csv \
    --image_col claim_image --caption_col claim_image_caption \
    --epochs 3 [--tiny]
"""

from __future__ import annotations

import argparse
import os
import time
from pathlib import Path

import numpy as np
import pandas as pd


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--csv", required=True)
    p.add_argument("--image_col", default="claim_image")
    p.add_argument("--caption_col", default="claim_image_caption")
    p.add_argument("--assets", default="assets/encoders")
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--max_len", type=int, default=32)
    args = p.parse_args()

    import dataclasses
    import jax
    import jax.numpy as jnp
    import optax

    from mmd_tpu.core.checkpoint import save_params
    from mmd_tpu.data.schema import get_project_root
    from mmd_tpu.data.tokenizer import WordPieceTokenizer
    from mmd_tpu.models.captioner import (
        CAPTIONER_TEST, CaptionerConfig, caption_loss, init_captioner,
    )
    from mmd_tpu.ops.image_ops import TRAIN_TRANSFORM, load_images_parallel, normalize_on_device

    root = get_project_root()
    df = pd.read_csv(args.csv)
    df = df[df[args.caption_col].notna() & df[args.image_col].notna()]
    print(f"[train_captioner] {len(df)} (image, caption) pairs")

    tok_path = Path(args.assets) / "tokenizer.json"
    if tok_path.exists():
        tok = WordPieceTokenizer.load(tok_path)
    else:
        tok = WordPieceTokenizer.train(
            df[args.caption_col].astype(str).tolist(), 30000)
        tok_path.parent.mkdir(parents=True, exist_ok=True)
        tok.save(tok_path)

    base = CAPTIONER_TEST if args.tiny else CaptionerConfig()
    cfg = dataclasses.replace(
        base,
        decoder=dataclasses.replace(base.decoder, vocab_size=tok.vocab_size),
        max_caption_len=min(args.max_len, base.decoder.max_position))
    params = init_captioner(jax.random.key(0), cfg)
    opt = optax.adamw(args.lr)
    opt_state = opt.init(params)
    size = cfg.vit.image_size
    transform = (TRAIN_TRANSFORM if size == 256
                 else dataclasses.replace(TRAIN_TRANSFORM, size=size))

    @jax.jit
    def step(params, opt_state, u8, ids, mask):
        x = normalize_on_device(u8, transform,
                                jnp.dtype(cfg.vit.compute_dtype))
        loss, grads = jax.value_and_grad(caption_loss)(params, cfg, x, ids, mask)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    bs = args.batch_size
    max_len = cfg.max_caption_len
    t0 = time.time()
    n_steps = 0
    for epoch in range(args.epochs):
        order = np.random.default_rng(epoch).permutation(len(df))
        for lo in range(0, len(order) - bs + 1, bs):
            rows = df.iloc[order[lo:lo + bs]]
            paths = [(q if os.path.isabs(str(q)) else str(root / str(q)))
                     for q in rows[args.image_col]]
            imgs, ok = load_images_parallel(paths, transform)
            ids, mask, _ = tok.encode_batch(
                rows[args.caption_col].astype(str).tolist(),
                max_length=max_len)
            mask = mask * ok[:, None].astype(np.int32)  # drop failed decodes
            params, opt_state, loss = step(params, opt_state, imgs, ids, mask)
            n_steps += 1
        print(f"[train_captioner] epoch {epoch}: loss "
              f"{float(np.asarray(loss)):.4f}")
    save_params(str(Path(args.assets) / "captioner.ckpt"), params)
    import json
    with open(Path(args.assets) / "captioner_config.json", "w") as f:
        json.dump(dataclasses.asdict(cfg), f)
    print(f"[train_captioner] {n_steps} steps in {time.time()-t0:.1f}s -> "
          f"{args.assets}/captioner.ckpt")


if __name__ == "__main__":
    main()
