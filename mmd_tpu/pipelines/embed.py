"""Stage 3: batch-embed the preprocessed CSV through the frozen encoders.

Parity with reference src/data_loader/preprocess_embeddings.py: every valid
sample (both images present — skip-and-count otherwise, reference
dataset.py:100-110) gets claim/doc text embeddings (512, text_dim) and
claim/doc image embeddings (64, image_dim), written to an ArrayStore at
`{csv_base}_embeddings.store` (the h5 replacement). Shapes are asserted
exactly as the reference does (preprocess_embeddings.py:83-88).

TPU-first: fixed-shape token batches (no dynamic padding -> no recompiles),
host-parallel image decode into uint8, device-side normalize, bf16 encoder
forwards, float16 storage.

Usage: python -m mmd_tpu.pipelines.embed --csv data/preprocessed/train.csv
           [--enriched] [--batch_size 64] [--tiny]
"""

from __future__ import annotations

import argparse
import os
import time
from pathlib import Path

import numpy as np
import pandas as pd

from mmd_tpu.data.labels import categories_to_label_array
from mmd_tpu.data.schema import get_project_root
from mmd_tpu.data.store import ArrayStore, ArrayStoreWriter
from mmd_tpu.models import text_encoder as te
from mmd_tpu.models import vit as V
from mmd_tpu.models.frozen import FrozenEncoders, load_or_init_frozen
from mmd_tpu.ops.image_ops import TRAIN_TRANSFORM, load_images_parallel, normalize_on_device


def store_path_for_csv(csv_path: str) -> str:
    return os.path.splitext(csv_path)[0] + "_embeddings.store"


def embed_csv(
    csv_path: str,
    enc: FrozenEncoders,
    enriched: bool = False,
    batch_size: int = 64,
    max_length: int = 512,
    store_path: str | None = None,
    io_workers: int = 16,
) -> ArrayStore:
    import jax
    import jax.numpy as jnp

    df = pd.read_csv(csv_path)
    claim_col = "claim_enriched" if enriched else "claim"
    doc_col = "evidence_enriched" if enriched else "evidence"

    text_dim = enc.text_cfg.hidden_size
    img_tokens = enc.vit_cfg.num_tokens
    img_dim = enc.vit_cfg.hidden_size
    root = get_project_root()

    # params as explicit jit args (closed-over arrays become HLO constants
    # and bloat the compile payload). ONE fused dispatch covers all four
    # encodes: per-dispatch host latency is the tax on tunneled devices
    # (round-5 probe: ~30-120 ms/forced sync), so 1 call/batch, not 4.
    @jax.jit
    def _encode_all(tparams, vparams, c_ids, c_mask, d_ids, d_mask,
                    c_u8, d_u8):
        from mmd_tpu.models.frozen import image_encode, text_encode
        dt = jnp.dtype(enc.vit_cfg.compute_dtype)
        return (
            text_encode(tparams, enc.text_cfg, c_ids, c_mask),
            text_encode(tparams, enc.text_cfg, d_ids, d_mask),
            image_encode(vparams, enc.vit_cfg,
                         normalize_on_device(c_u8, TRAIN_TRANSFORM, dt)),
            image_encode(vparams, enc.vit_cfg,
                         normalize_on_device(d_u8, TRAIN_TRANSFORM, dt)),
        )

    encode_all = lambda *a: _encode_all(enc.text_params, enc.vit_params, *a)

    store_path = store_path or store_path_for_csv(csv_path)
    writer = ArrayStoreWriter(
        store_path, capacity=len(df),
        columns={
            "id": ((), np.int64),
            "claim_text_embeds": ((max_length, text_dim), np.float16),
            "doc_text_embeds": ((max_length, text_dim), np.float16),
            "claim_image_embeds": ((img_tokens, img_dim), np.float16),
            "doc_image_embeds": ((img_tokens, img_dim), np.float16),
            "labels": ((4,), np.int32),
        },
    )

    # Resume: the CSV row cursor lives in the store's meta.json and is
    # written in the SAME atomic rename as the sample count (a separate
    # cursor file could lag the count across a crash and replay a batch,
    # appending duplicates). Legacy cursor.txt is honored for old stores.
    legacy_cursor = Path(store_path) / "cursor.txt"
    start_row = int(writer.extra.get(
        "csv_cursor",
        int(legacy_cursor.read_text()) if legacy_cursor.exists() else 0))
    skipped = 0
    t0 = time.time()
    from mmd_tpu.core.profiling import Stages
    stages = Stages()

    size = enc.vit_cfg.image_size
    transform = TRAIN_TRANSFORM if size == 256 else \
        __import__("dataclasses").replace(TRAIN_TRANSFORM, size=size)

    def prep(lo):
        """Host work for one batch: tokenize (native) + decode images."""
        rows = df.iloc[lo:lo + batch_size]
        n = len(rows)

        def pad(texts):
            return list(texts) + [""] * (batch_size - n)

        with stages.stage("tokenize", log=False):
            c_ids, c_mask, _ = enc.tokenizer.encode_batch(
                pad(rows[claim_col].fillna("").astype(str)),
                max_length=max_length)
            d_ids, d_mask, _ = enc.tokenizer.encode_batch(
                pad(rows[doc_col].fillna("").astype(str)),
                max_length=max_length)

        def paths(col):
            out = []
            for p in rows[col]:
                if isinstance(p, str) and p:
                    out.append(p if os.path.isabs(p) else str(root / p))
                else:
                    out.append(None)
            return out + [None] * (batch_size - n)

        with stages.stage("image_decode", log=False):
            c_imgs, c_ok = load_images_parallel(paths("claim_image"),
                                                transform, io_workers)
            d_imgs, d_ok = load_images_parallel(paths("evidence_image"),
                                                transform, io_workers)
        return (lo, rows, n, c_ok[:n] & d_ok[:n],
                (c_ids, c_mask, d_ids, d_mask, c_imgs, d_imgs))

    def write_out(lo, rows, n, valid, outs):
        """Pull one batch's embeddings D2H and append to the store."""
        nonlocal skipped
        with stages.stage("d2h_store", log=False):
            ct, dt, ci, di = (np.asarray(o, np.float16) for o in outs)
        assert ct.shape == (batch_size, max_length, text_dim), ct.shape
        assert ci.shape == (batch_size, img_tokens, img_dim), ci.shape
        skipped += int((~valid).sum())
        if valid.any():
            idx = np.nonzero(valid)[0]
            writer.append_batch({
                "id": rows["id"].to_numpy(np.int64)[idx],
                "claim_text_embeds": ct[idx],
                "doc_text_embeds": dt[idx],
                "claim_image_embeds": ci[idx],
                "doc_image_embeds": di[idx],
                "labels": categories_to_label_array(
                    rows["category"].tolist())[idx],
            }, extra={"csv_cursor": lo + n})
        else:
            writer.update_extra(csv_cursor=lo + n)

    # one-deep software pipeline: while batch i's encode runs on device,
    # the host preps batch i+1 (tokenize + decode) BEFORE pulling i's
    # results — device compute hides behind host prep instead of
    # serializing after it
    pending = None
    for lo in range(start_row, len(df), batch_size):
        lo_p, rows_p, n_p, valid_p, host = prep(lo)
        with stages.stage("encode_dispatch", log=False):
            outs = encode_all(*host)
        if pending is not None:
            write_out(*pending)
        pending = (lo_p, rows_p, n_p, valid_p, outs)
    if pending is not None:
        write_out(*pending)

    writer.finalize()
    dt_s = time.time() - t0
    done = writer.count
    print(f"[embed] {csv_path}: {done} samples embedded, {skipped} skipped "
          f"(missing images), {dt_s:.1f}s "
          f"({(len(df) - start_row) / max(dt_s, 1e-9):.1f} rows/s) -> {store_path}")
    print("[embed] " + stages.report().replace("\n", "\n[embed] "))
    return ArrayStore(store_path)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--csv", required=True)
    p.add_argument("--enriched", action="store_true")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--assets", type=str, default="assets/encoders")
    p.add_argument("--tiny", action="store_true",
                   help="tiny encoder configs (tests/smoke)")
    p.add_argument("--store", type=str, default=None)
    args = p.parse_args()

    df = pd.read_csv(args.csv)
    texts = (df["claim"].fillna("").astype(str).tolist()
             + df["evidence"].fillna("").astype(str).tolist())
    enc = load_or_init_frozen(args.assets, vocab_texts=texts, tiny=args.tiny)
    embed_csv(args.csv, enc, enriched=args.enriched,
              batch_size=args.batch_size, store_path=args.store)


if __name__ == "__main__":
    main()
