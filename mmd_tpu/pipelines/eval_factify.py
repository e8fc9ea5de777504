"""5-way Factify evaluation of a factify-mode checkpoint.

Parity with reference src/experimental/eval_factify.py: standard accuracy,
Refute-weighted (x4) accuracy (:59-83), per-category accuracy (:85-111), and
an optional confusion-matrix PNG (:47-57) when matplotlib is available.

Ground-truth 5-way categories derive from the store's 4-path label vectors
via the exact inverse table (data/labels.py).

Usage: python -m mmd_tpu.pipelines.eval_factify --store <dir>
           --checkpoint <dir> [--confusion_png out.png]
"""

from __future__ import annotations

import argparse
from typing import Optional

import numpy as np

from mmd_tpu.core.config import ModelConfig
from mmd_tpu.data import labels as lb
from mmd_tpu.data.store import ArrayStore
from mmd_tpu.pipelines.eval_models import predict_store
from mmd_tpu.training import metrics as M

REFUTE_WEIGHT = 4.0
REFUTE_IDX = lb.CATEGORY_TO_IDX["Refute"]


def evaluate_factify(store: ArrayStore, model_cfg: ModelConfig, fusion_params,
                     batch_size: int = 192,
                     confusion_png: Optional[str] = None) -> dict:
    assert model_cfg.factify and model_cfg.num_classes == 5
    preds, path_labels = predict_store(store, model_cfg, fusion_params,
                                       batch_size)
    y_pred = preds[:, 0]
    y_true = lb.paths_to_category_idx(path_labels)
    known = y_true >= 0
    y_pred, y_true = y_pred[known], y_true[known]

    metrics = {
        "accuracy": M.accuracy(y_true, y_pred),
        "weighted_accuracy": M.weighted_accuracy(
            y_true, y_pred, {REFUTE_IDX: REFUTE_WEIGHT}),
    }
    per_cat = M.per_category_accuracy(y_true, y_pred, 5)
    for i, cat in enumerate(lb.CATEGORIES):
        metrics[f"accuracy/{cat}"] = float(per_cat[i])

    if confusion_png:
        cm = M.confusion_matrix(y_true, y_pred, 5)
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            fig, ax = plt.subplots(figsize=(8, 8))
            ax.imshow(cm, cmap="Blues")
            ax.set_xticks(range(5), lb.CATEGORIES, rotation=45, ha="right")
            ax.set_yticks(range(5), lb.CATEGORIES)
            for i in range(5):
                for j in range(5):
                    ax.text(j, i, str(cm[i, j]), ha="center", va="center")
            ax.set_xlabel("Predicted")
            ax.set_ylabel("True")
            fig.tight_layout()
            fig.savefig(confusion_png)
            plt.close(fig)
        except ImportError:
            np.savetxt(str(confusion_png) + ".txt", cm, fmt="%d")
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
    p.add_argument("--confusion_png", type=str, default=None)
    args = p.parse_args()

    cfg = ModelConfig(
        text_input_dim=args.text_input_dim,
        image_input_dim=args.image_input_dim, embed_dim=args.embed_dim,
        num_heads=args.num_heads, hidden_dim=args.hidden_dim,
        num_classes=5, factify=True)
    template = init_fusion_params(jax.random.key(0), cfg)
    params = (load_params(args.checkpoint, template)
              if args.checkpoint else template)
    metrics = evaluate_factify(ArrayStore(args.store), cfg, params,
                               args.batch_size, args.confusion_png)
    for k, v in sorted(metrics.items()):
        print(f"{k}: {v:.4f}")


if __name__ == "__main__":
    main()
