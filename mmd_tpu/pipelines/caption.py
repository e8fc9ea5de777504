"""Stage 2b: BLIP-style caption enrichment of the preprocessed CSVs.

Parity with `python -m src.preprocess.caption` (reference
src/preprocess/caption.py): caption both images of every row, append the
caption to the text (`claim_enriched = f"{claim}. {caption}"`, :34-47),
write `{split}_enriched.csv` with 4 new columns, RESUMABLE — restarts after
the last row whose `evidence_image_caption` is non-NA (:50-59) and flushes
every `save_every` rows (:84-117).

TPU re-architecture: images batch through ONE compiled KV-cached decode
(models/captioner.generate) instead of one HF generate() call per image.

Usage: python -m mmd_tpu.pipelines.caption [--datasets train test]
           [--batch_size 32] [--assets assets/encoders] [--tiny]
"""

from __future__ import annotations

import argparse
import os
import time
from pathlib import Path

import numpy as np
import pandas as pd

from mmd_tpu.data.schema import get_project_root
from mmd_tpu.data.tokenizer import WordPieceTokenizer
from mmd_tpu.models.captioner import (
    CAPTIONER_TEST, CaptionerConfig, generate, init_captioner,
)
from mmd_tpu.ops.image_ops import TRAIN_TRANSFORM, load_images_parallel, normalize_on_device

BATCH_SIZE = 32
SAVE_EVERY = 20  # rows, parity with reference BATCH_SIZE=20 flush cadence


class CaptionEngine:
    """Batched captioner around compiled generate()."""

    def __init__(self, tokenizer: WordPieceTokenizer,
                 cfg: CaptionerConfig | None = None, params=None,
                 seed: int = 21, batch_size: int = BATCH_SIZE):
        import dataclasses
        import jax
        self.tokenizer = tokenizer
        if cfg is None:
            cfg = CaptionerConfig()
        cfg = dataclasses.replace(
            cfg, decoder=dataclasses.replace(
                cfg.decoder, vocab_size=tokenizer.vocab_size))
        self.cfg = cfg
        self.params = params or init_captioner(jax.random.key(seed), cfg)
        self.batch_size = batch_size
        size = cfg.vit.image_size
        self.transform = TRAIN_TRANSFORM if size == 256 else \
            __import__("dataclasses").replace(TRAIN_TRANSFORM, size=size)

        # BLIP starts decoding from its [DEC] token (converted checkpoints
        # carry it in the exported vocab); otherwise [CLS] is the BOS
        bos = getattr(tokenizer, "token_to_id", {}).get(
            "[DEC]", tokenizer.cls_id)

        @jax.jit
        def _gen(params, u8):
            import jax.numpy as jnp
            x = normalize_on_device(u8, self.transform,
                                    jnp.dtype(cfg.vit.compute_dtype))
            return generate(params, self.cfg, x,
                            bos_id=bos, eos_id=tokenizer.sep_id,
                            pad_id=tokenizer.pad_id)
        self._gen = lambda u8: _gen(self.params, u8)

    def caption_paths(self, paths, io_workers: int = 16) -> list[str]:
        """Caption a list of image paths (None/missing -> ""). Any length;
        internally padded to the fixed batch."""
        out = [""] * len(paths)
        for lo in range(0, len(paths), self.batch_size):
            chunk = list(paths[lo:lo + self.batch_size])
            pad = chunk + [None] * (self.batch_size - len(chunk))
            imgs, ok = load_images_parallel(pad, self.transform, io_workers)
            tokens = np.asarray(self._gen(imgs))
            for j in range(len(chunk)):
                if ok[j]:
                    out[lo + j] = self.tokenizer.decode(tokens[j])
        return out


def get_last_processed_index(df: pd.DataFrame) -> int:
    """Last row index with a non-NA evidence_image_caption, -1 if none
    (reference caption.py:50-59 backwards-scan semantics)."""
    col = df.get("evidence_image_caption")
    if col is None:
        return -1
    notna = col.notna().to_numpy().nonzero()[0]
    return int(notna[-1]) if len(notna) else -1


def process_csv(dataset: str, engine: CaptionEngine,
                root: Path | None = None, save_every: int = SAVE_EVERY,
                batch_size: int | None = None) -> Path | None:
    root = Path(root) if root else get_project_root()
    in_csv = root / "data" / "preprocessed" / f"{dataset}.csv"
    out_csv = root / "data" / "preprocessed" / f"{dataset}_enriched.csv"
    if not in_csv.exists():
        print(f"CSV not found: {in_csv}")
        return None
    batch_size = batch_size or engine.batch_size

    if out_csv.exists():
        df = pd.read_csv(out_csv)
        start = get_last_processed_index(df) + 1
        print(f"[caption] resuming {dataset} at row {start}")
    else:
        df = pd.read_csv(in_csv)
        for col in ("claim_image_caption", "evidence_image_caption",
                    "claim_enriched", "evidence_enriched"):
            df[col] = pd.NA
        start = 0

    def abspath(p):
        if isinstance(p, str) and p:
            return p if os.path.isabs(p) else str(root / p)
        return None

    t0 = time.time()
    done = start
    last_flush = time.time()
    for lo in range(start, len(df), batch_size):
        rows = df.iloc[lo:lo + batch_size]
        # ONE captioner pass over claim+evidence together: half the
        # dispatches of two separate calls (each dispatch costs host
        # round-trip latency on tunneled devices)
        n = len(rows)
        caps = engine.caption_paths(
            [abspath(p) for p in rows["claim_image"]]
            + [abspath(p) for p in rows["evidence_image"]])
        c_caps, e_caps = caps[:n], caps[n:]
        for off, (i, row) in enumerate(rows.iterrows()):
            cc, ec = c_caps[off], e_caps[off]
            df.at[i, "claim_image_caption"] = cc
            df.at[i, "evidence_image_caption"] = ec
            df.at[i, "claim_enriched"] = (
                f"{row['claim']}. {cc}" if cc else str(row["claim"]))
            df.at[i, "evidence_enriched"] = (
                f"{row['evidence']}. {ec}" if ec else str(row["evidence"]))
        done = lo + len(rows)
        # The reference flushes the WHOLE CSV every 20 rows
        # (caption.py:84-117) — on a 25k-row frame that is ~1,250 full
        # rewrites, each O(n_rows), a quadratic host cost that dominated
        # the measured stage (round 5). Keep the resume granularity for
        # small frames but rate-limit flushes to one per 30 s: crash
        # recovery loses at most 30 s of captions, identical end state.
        if ((done - start) % save_every < batch_size
                and time.time() - last_flush > 30.0):
            df.to_csv(out_csv, index=False)
            last_flush = time.time()
    df.to_csv(out_csv, index=False)
    dt = time.time() - t0
    print(f"[caption] {dataset}: rows {start}..{done} captioned in {dt:.1f}s "
          f"({(done - start) / max(dt, 1e-9):.2f} rows/s) -> {out_csv}")
    return out_csv


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--datasets", nargs="+", default=["train", "test"])
    p.add_argument("--batch_size", type=int, default=BATCH_SIZE)
    p.add_argument("--assets", type=str, default="assets/encoders")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--root", type=str, default=None)
    args = p.parse_args()

    root = Path(args.root) if args.root else get_project_root()
    tok_path = Path(args.assets) / "tokenizer.json"
    if tok_path.exists():
        tok = WordPieceTokenizer.load(tok_path)
    else:
        df = pd.read_csv(root / "data" / "preprocessed" / f"{args.datasets[0]}.csv")
        texts = (df["claim"].fillna("").astype(str).tolist()
                 + df["evidence"].fillna("").astype(str).tolist())
        tok = WordPieceTokenizer.train(texts, 30000)
        tok_path.parent.mkdir(parents=True, exist_ok=True)
        tok.save(tok_path)

    cfg = CAPTIONER_TEST if args.tiny else None
    # trained (pipelines/train_captioner.py) or converted-BLIP
    # (tools/convert_hf.py --blip) checkpoint when available
    params = None
    ckpt = Path(args.assets) / "captioner.ckpt"
    if ckpt.exists():
        from mmd_tpu.models.captioner import load_captioner_assets
        tok, cfg, params = load_captioner_assets(args.assets)
        print(f"[caption] using captioner checkpoint from {ckpt}")
    engine = CaptionEngine(tok, cfg=cfg, params=params,
                           batch_size=args.batch_size)
    for ds in args.datasets:
        process_csv(ds, engine, root)


if __name__ == "__main__":
    main()
