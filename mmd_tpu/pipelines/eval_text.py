"""Text-only model evaluation (reference src/experimental/eval_text.py).

Evaluates a `text_only=True` checkpoint over the pre-embedded store's text
columns: 3-class (Support/NEI/Refute, simplified from the 5-way category)
precision/recall/F1 + accuracy + micro-F1 appended to a CSV.

Usage: python -m mmd_tpu.pipelines.eval_text --store <dir> --checkpoint <dir>
"""

from __future__ import annotations

import argparse
import csv
import os
import time
from typing import Optional

import numpy as np

from mmd_tpu.core.config import ModelConfig
from mmd_tpu.data import labels as lb
from mmd_tpu.data.store import ArrayStore
from mmd_tpu.training import metrics as M


def evaluate_text_only(store: ArrayStore, model_cfg: ModelConfig,
                       fusion_params, batch_size: int = 192,
                       results_csv: Optional[str] = None) -> dict:
    import jax
    from mmd_tpu.models.fusion import fusion_forward

    assert model_cfg.text_only

    @jax.jit
    def _fwd(params, x_t, e_t):
        logits, _ = fusion_forward(params, model_cfg, X_t=x_t, E_t=e_t,
                                   deterministic=True)
        return logits

    fwd = lambda *a: _fwd(fusion_params, *a)

    preds, labels = [], []
    for batch in store.batches(batch_size, drop_last=False,
                               columns=["claim_text_embeds",
                                        "doc_text_embeds", "labels"]):
        mask = batch.pop("_pad_mask", None)
        logits = np.asarray(
            fwd(batch["claim_text_embeds"], batch["doc_text_embeds"]),
            np.float32)
        p = logits.argmax(-1)
        cat = lb.paths_to_category_idx(batch["labels"])
        y = np.where(cat >= 0, lb.SIMPLIFIED_TABLE[np.clip(cat, 0, 4)], 1)
        if mask is not None:
            p, y = p[mask], y[mask]
        preds.append(p)
        labels.append(y)
    y_pred, y_true = np.concatenate(preds), np.concatenate(labels)

    prec, rec, f1, support = M.precision_recall_f1(y_true, y_pred, 3)
    metrics = {
        "accuracy": M.accuracy(y_true, y_pred),
        "micro_f1": M.f1_score(y_true, y_pred, 3, "micro"),
        "weighted_f1": M.f1_score(y_true, y_pred, 3, "weighted"),
    }
    for c, name in enumerate(lb.CLASS_NAMES_3):
        metrics[f"precision/{name}"] = float(prec[c])
        metrics[f"recall/{name}"] = float(rec[c])
        metrics[f"f1/{name}"] = float(f1[c])

    if results_csv:
        exists = os.path.exists(results_csv)
        row = {"timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
               "n": len(y_true), **metrics}
        with open(results_csv, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(row.keys()))
            if not exists:
                w.writeheader()
            w.writerow(row)
    return metrics


def main():
    import jax
    from mmd_tpu.core.checkpoint import load_params
    from mmd_tpu.models.fusion import init_fusion_params

    p = argparse.ArgumentParser()
    p.add_argument("--store", required=True)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=192)
    p.add_argument("--text_input_dim", type=int, default=384)
    p.add_argument("--image_input_dim", type=int, default=1024)
    p.add_argument("--embed_dim", type=int, default=256)
    p.add_argument("--num_heads", type=int, default=8)
    p.add_argument("--hidden_dim", type=int, default=64)
    p.add_argument("--results_csv", type=str, default="eval_text_results.csv")
    args = p.parse_args()

    cfg = ModelConfig(
        text_input_dim=args.text_input_dim,
        image_input_dim=args.image_input_dim, embed_dim=args.embed_dim,
        num_heads=args.num_heads, hidden_dim=args.hidden_dim,
        num_classes=3, text_only=True)
    template = init_fusion_params(jax.random.key(0), cfg)
    params = (load_params(args.checkpoint, template)
              if args.checkpoint else template)
    metrics = evaluate_text_only(ArrayStore(args.store), cfg, params,
                                 args.batch_size, args.results_csv)
    for k, v in sorted(metrics.items()):
        print(f"{k}: {v:.4f}")


if __name__ == "__main__":
    main()
