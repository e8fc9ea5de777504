"""FakeNet training/eval/ensemble drivers.

Parity with the vendored Pre-CoFactv2 drivers: AdamW with linear warmup
(reference src/baselines/Pre-CoFactv2/train.py:150-155), weighted-F1-gated
best-checkpointing (:346-360), test-set prediction to an answer CSV with
per-class probabilities (evaluate.py), and the 3-model weighted-power
ensemble grid search over w in {0..1}, p in {1/8..2} (ensemble.py:36-96).

Data: pre-embedded ArrayStore with a 5-class `category` column and a 32-d
`add_feature` column (OCR stats in the original; zeros when absent).
"""

from __future__ import annotations

import itertools
from typing import Iterable, Optional, Sequence

import numpy as np
import optax

from mmd_tpu.baselines.fakenet import FakeNetConfig, fakenet_forward, init_fakenet
from mmd_tpu.training import metrics as M
from mmd_tpu.training.losses import cross_entropy


def make_fakenet_train_step(cfg: FakeNetConfig, optimizer):
    import jax

    def loss_fn(params, batch, rng):
        logits, _ = fakenet_forward(
            params, cfg, batch["claim_text_embeds"],
            batch["claim_image_embeds"], batch["doc_text_embeds"],
            batch["doc_image_embeds"], batch["add_feature"],
            rng=rng, deterministic=False)
        return cross_entropy(logits, batch["category"]), logits

    @jax.jit
    def step(params, opt_state, batch, rng):
        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        import jax.numpy as jnp
        return params, opt_state, loss, jnp.argmax(logits, -1)

    return step


def warmup_linear_schedule(lr: float, warmup_steps: int, total_steps: int):
    return optax.join_schedules([
        optax.linear_schedule(0.0, lr, max(warmup_steps, 1)),
        optax.linear_schedule(lr, 0.0, max(total_steps - warmup_steps, 1)),
    ], [warmup_steps])


def train_fakenet(cfg: FakeNetConfig, batches_per_epoch, epochs: int = 15,
                  lr: float = 5e-5, warmup_steps: int = 100,
                  val_batches=None, seed: int = 42):
    """batches_per_epoch(epoch) -> iterable of batch dicts. Returns
    (best_params, history). Best = highest weighted F1 on val (or train)."""
    import jax

    total = epochs * 100  # schedule horizon estimate; harmless if off
    optimizer = optax.adamw(warmup_linear_schedule(lr, warmup_steps, total))
    params = init_fakenet(jax.random.key(seed), cfg)
    opt_state = optimizer.init(params)
    step_fn = make_fakenet_train_step(cfg, optimizer)

    best_f1, best_params = -1.0, params
    history = []
    step_i = 0
    for epoch in range(epochs):
        preds, labels = [], []
        for batch in batches_per_epoch(epoch):
            rng = jax.random.fold_in(jax.random.key(seed + 1), step_i)
            params, opt_state, loss, pred = step_fn(params, opt_state, batch, rng)
            preds.append(np.asarray(pred))
            labels.append(np.asarray(batch["category"]))
            step_i += 1
        y_pred, y_true = np.concatenate(preds), np.concatenate(labels)
        if val_batches is not None:
            y_pred, y_true = predict_fakenet(params, cfg, val_batches())
        f1 = M.f1_score(y_true, y_pred, cfg.num_classes, "weighted")
        history.append({"epoch": epoch, "loss": float(np.asarray(loss)),
                        "weighted_f1": f1})
        if f1 > best_f1:
            best_f1, best_params = f1, params
    return best_params, history


def predict_fakenet(params, cfg: FakeNetConfig, batches,
                    return_probs: bool = False):
    import jax

    @jax.jit
    def _fwd(p, batch):
        logits, _ = fakenet_forward(
            p, cfg, batch["claim_text_embeds"],
            batch["claim_image_embeds"], batch["doc_text_embeds"],
            batch["doc_image_embeds"], batch["add_feature"],
            deterministic=True)
        return logits

    fwd = lambda batch: _fwd(params, batch)

    preds, labels, probs = [], [], []
    for batch in batches:
        logits = np.asarray(fwd(batch), np.float32)
        preds.append(logits.argmax(-1))
        probs.append(_softmax(logits))
        if "category" in batch:
            labels.append(np.asarray(batch["category"]))
    y_pred = np.concatenate(preds)
    y_true = np.concatenate(labels) if labels else None
    if return_probs:
        return y_pred, y_true, np.concatenate(probs)
    return y_pred, y_true


def _softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def ensemble_grid_search(prob_sets: Sequence[np.ndarray], y_true: np.ndarray,
                         weights: Sequence[float] = (0, 0.25, 0.5, 0.75, 1.0),
                         powers: Sequence[float] = (0.125, 0.25, 0.5, 1.0, 2.0)):
    """Weighted-power ensemble of per-model probability matrices
    (reference ensemble.py:36-96): score = sum_i w_i * probs_i ** p, maximize
    weighted F1 over the (w_1..w_n, p) grid. Returns (best_config, best_f1)."""
    n = len(prob_sets)
    best = (None, -1.0)
    for ws in itertools.product(weights, repeat=n):
        if not any(ws):
            continue
        for p in powers:
            mix = sum(w * probs ** p for w, probs in zip(ws, prob_sets))
            f1 = M.f1_score(y_true, np.argmax(mix, -1),
                            prob_sets[0].shape[1], "weighted")
            if f1 > best[1]:
                best = ({"weights": ws, "power": p}, f1)
    return best


def main():
    """CLI: train/evaluate FakeNet over a pre-embedded ArrayStore with a
    5-class `category` column (vendored Pre-CoFactv2 train.py/evaluate.py
    equivalents)."""
    import argparse
    import json

    from mmd_tpu.data import labels as lb
    from mmd_tpu.data.store import ArrayStore
    from mmd_tpu.baselines.fakenet import FakeNetConfig

    p = argparse.ArgumentParser()
    p.add_argument("--store", required=True)
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--batch_size", type=int, default=24)
    p.add_argument("--lr", type=float, default=5e-5)
    p.add_argument("--text_dim", type=int, default=384)
    p.add_argument("--image_dim", type=int, default=1024)
    p.add_argument("--hidden_dim", type=int, default=256)
    p.add_argument("--head", type=int, default=2)
    p.add_argument("--answer_csv", type=str, default="answer_fakenet.csv")
    args = p.parse_args()

    store = ArrayStore(args.store)
    cfg = FakeNetConfig(text_dim=args.text_dim, image_dim=args.image_dim,
                        hidden_dim=args.hidden_dim, head=args.head)

    def add_columns(batch):
        batch = dict(batch)
        cat = lb.paths_to_category_idx(batch["labels"])
        batch["category"] = np.where(cat >= 0, cat, 2).astype(np.int32)
        n = len(batch["category"])
        batch["add_feature"] = np.zeros((n, cfg.add_feature_dim), np.float32)
        return batch

    cols = ["claim_text_embeds", "doc_text_embeds", "claim_image_embeds",
            "doc_image_embeds", "labels"]

    def batches(epoch):
        for b in store.batches(args.batch_size, shuffle=True, seed=epoch,
                               columns=cols):
            yield add_columns(b)

    params, history = train_fakenet(cfg, batches, epochs=args.epochs,
                                    lr=args.lr)
    print(json.dumps(history[-1], indent=1))

    def eval_batches():
        for b in store.batches(args.batch_size, columns=cols):
            yield add_columns(b)

    y_pred, y_true, probs = predict_fakenet(params, cfg, eval_batches(),
                                            return_probs=True)
    import csv as csvmod
    with open(args.answer_csv, "w", newline="") as f:
        w = csvmod.writer(f)
        w.writerow(["idx", "pred"] + [f"p{i}" for i in range(cfg.num_classes)])
        for i, (pr, row) in enumerate(zip(y_pred, probs)):
            w.writerow([i, int(pr)] + [f"{x:.5f}" for x in row])
    f1 = M.f1_score(y_true, y_pred, cfg.num_classes, "weighted")
    print(f"weighted F1 on store: {f1:.4f}; answers -> {args.answer_csv}")


if __name__ == "__main__":
    main()
