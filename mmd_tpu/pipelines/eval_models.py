"""Offline classifier evaluation over a pre-embedded store.

Parity with reference src/experimental/eval_models.py: per-path accuracy +
micro-F1 + per-class P/R/F1 appended to a timestamped CSV (:108-122), plus a
UNIFIED row. The reference's unified (non-factify) branch calls functions
that don't exist anywhere (:92-100); here it is implemented: per-path labels
map to a final 3-class verdict through the demo's two-stage agreement rule
(inference/rules.py), for predictions and ground truth alike.

Usage: python -m mmd_tpu.pipelines.eval_models --store <dir> --checkpoint <dir>
           [--factify] [--batch_size 192]
"""

from __future__ import annotations

import argparse
import csv
import os
import time
from typing import Optional

import numpy as np

from mmd_tpu.core.config import ModelConfig
from mmd_tpu.data.labels import PATHS
from mmd_tpu.data.store import ArrayStore
from mmd_tpu.inference.rules import LABELS, get_final_classification
from mmd_tpu.training import metrics as M

IDX_TO_LABEL = {0: "support", 1: "not_enough_information", 2: "refute"}
LABEL_TO_IDX = {v: k for k, v in IDX_TO_LABEL.items()}


def predict_store(store: ArrayStore, model_cfg: ModelConfig, fusion_params,
                  batch_size: int = 192):
    """-> (preds (N, P), labels (N, P)) int arrays; P=4 multipath or 1."""
    import jax
    from mmd_tpu.models.fusion import fusion_forward

    @jax.jit
    def _fwd(params, x_t, x_i, e_t, e_i):
        out = fusion_forward(params, model_cfg, x_t, x_i, e_t, e_i,
                             deterministic=True)
        if model_cfg.factify or model_cfg.text_only:
            logits, _ = out
            return logits[:, None, :]
        (y_tt, y_ti), (y_it, y_ii) = out
        import jax.numpy as jnp
        return jnp.stack([y_tt, y_ti, y_it, y_ii], axis=1)

    fwd = lambda *a: _fwd(fusion_params, *a)
    preds, labels = [], []
    for batch in store.batches(batch_size, drop_last=False):
        mask = batch.pop("_pad_mask", None)
        logits = np.asarray(fwd(
            batch["claim_text_embeds"], batch["claim_image_embeds"],
            batch["doc_text_embeds"], batch["doc_image_embeds"]), np.float32)
        p = logits.argmax(-1)
        l = batch["labels"]
        if mask is not None:
            p, l = p[mask], l[mask]
        preds.append(p)
        labels.append(l)
    return np.concatenate(preds), np.concatenate(labels)


def unified_from_paths(path_preds: np.ndarray) -> np.ndarray:
    """(N, 4) per-path 3-class -> (N,) unified 3-class via agreement rule."""
    out = np.empty(len(path_preds), np.int32)
    for i, row in enumerate(path_preds):
        labels = [IDX_TO_LABEL[int(x)] for x in row]
        out[i] = LABEL_TO_IDX[get_final_classification(labels)]
    return out


def evaluate_store(store: ArrayStore, model_cfg: ModelConfig, fusion_params,
                   batch_size: int = 192, results_csv: Optional[str] = None,
                   num_classes: int = 3) -> dict:
    preds, labels = predict_store(store, model_cfg, fusion_params, batch_size)
    return metrics_from_preds(preds, labels, results_csv=results_csv,
                              num_classes=num_classes)


def metrics_from_preds(preds: np.ndarray, labels: np.ndarray,
                       results_csv: Optional[str] = None,
                       num_classes: int = 3) -> dict:
    """(N, P) preds/labels -> per-path + unified metric rows (+CSV append).
    Shared by the store-based and the fused streaming eval paths."""
    rows = []
    metrics: dict = {}

    def add_row(name, y_pred, y_true, ncls):
        acc = M.accuracy(y_true, y_pred)
        micro = M.f1_score(y_true, y_pred, ncls, "micro")
        weighted = M.f1_score(y_true, y_pred, ncls, "weighted")
        prec, rec, f1, support = M.precision_recall_f1(y_true, y_pred, ncls)
        metrics[f"{name}/accuracy"] = acc
        metrics[f"{name}/micro_f1"] = micro
        metrics[f"{name}/weighted_f1"] = weighted
        row = {"timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
               "path": name, "accuracy": acc, "micro_f1": micro,
               "weighted_f1": weighted, "n": len(y_true)}
        for c in range(ncls):
            row[f"class{c}_precision"] = prec[c]
            row[f"class{c}_recall"] = rec[c]
            row[f"class{c}_f1"] = f1[c]
        rows.append(row)

    if preds.shape[1] == 4:
        for p_idx, name in enumerate(PATHS):
            add_row(name, preds[:, p_idx], labels[:, p_idx], num_classes)
        add_row("unified", unified_from_paths(preds),
                unified_from_paths(labels), 3)
    else:
        add_row("unified", preds[:, 0], labels[:, 0], num_classes)

    if results_csv:
        os.makedirs(os.path.dirname(results_csv) or ".", exist_ok=True)
        exists = os.path.exists(results_csv)
        with open(results_csv, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            if not exists:
                w.writeheader()
            w.writerows(rows)
    return metrics


def main():
    import jax
    from mmd_tpu.core.checkpoint import load_params
    from mmd_tpu.models.fusion import init_fusion_params

    p = argparse.ArgumentParser()
    p.add_argument("--store", required=True)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=192)
    p.add_argument("--factify", action="store_true")
    p.add_argument("--num_classes", type=int, default=3)
    p.add_argument("--text_input_dim", type=int, default=384)
    p.add_argument("--image_input_dim", type=int, default=1024)
    p.add_argument("--embed_dim", type=int, default=256)
    p.add_argument("--num_heads", type=int, default=8)
    p.add_argument("--hidden_dim", type=int, default=64)
    p.add_argument("--results_csv", type=str, default="eval_results.csv")
    args = p.parse_args()

    cfg = ModelConfig(
        text_input_dim=args.text_input_dim,
        image_input_dim=args.image_input_dim, embed_dim=args.embed_dim,
        num_heads=args.num_heads, hidden_dim=args.hidden_dim,
        num_classes=args.num_classes, factify=args.factify)
    template = init_fusion_params(jax.random.key(0), cfg)
    params = (load_params(args.checkpoint, template)
              if args.checkpoint else template)
    metrics = evaluate_store(ArrayStore(args.store), cfg, params,
                             args.batch_size, args.results_csv,
                             args.num_classes)
    for k, v in sorted(metrics.items()):
        print(f"{k}: {v:.4f}")


if __name__ == "__main__":
    main()
