"""Training loop driver: epochs over an ArrayStore (or any batch iterable),
metric accumulation, periodic checkpoints, per-epoch validation, best-model
tracking. Functional parity with reference train.py:109-246,388-434, rebuilt
around the compiled DP step.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Iterable, Optional

import jax
import numpy as np

from mmd_tpu.core.checkpoint import CheckpointManager, save_params
from mmd_tpu.core.metrics import MetricsLogger
from mmd_tpu.data.labels import PATHS
from mmd_tpu.training import metrics as M
from mmd_tpu.training.trainer import Trainer, TrainState


def prefetch_to_device(batches: Iterable[dict], shard_fn: Callable,
                       depth: int) -> Iterable[dict]:
    """Keep `depth` sharded batches in flight ahead of consumption.

    `jax.device_put` (inside shard_fn) is asynchronous, so issuing the
    next batches' host->device transfers before the current step is
    consumed lets the DMA overlap the running computation instead of
    serializing after it — the standard TPU input pipeline shape
    (double buffering at depth 1-2). Numerics-neutral: batches come out
    in order, merely already resident on device."""
    from collections import deque

    if depth <= 0:
        for b in batches:
            yield shard_fn(b)
        return
    queue: deque = deque()
    for b in batches:
        queue.append(shard_fn(b))
        if len(queue) > depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


def _accumulate(acc: dict, aux: dict) -> None:
    # Keep device arrays; D2H happens once per flush window, not per step
    # (host pulls are expensive on tunneled devices and serialize the stream).
    acc.setdefault("preds", []).append(aux["preds"])
    acc.setdefault("labels", []).append(aux["labels"])


def _flush_metrics(acc: dict, num_classes: int, prefix: str) -> dict:
    if not acc.get("preds"):
        return {}
    preds = np.concatenate([np.asarray(p) for p in acc["preds"]])   # (N, P)
    labels = np.concatenate([np.asarray(l) for l in acc["labels"]])
    out = {}
    npaths = preds.shape[1]
    names = PATHS if npaths == 4 else ("unified",)
    f1s, accs = [], []
    for p, name in enumerate(names):
        yp, yt = preds[:, p], labels[:, p]
        a = M.accuracy(yt, yp)
        f1 = M.f1_score(yt, yp, num_classes, "weighted")
        out[f"{prefix}/{name}_accuracy"] = a
        out[f"{prefix}/{name}_f1"] = f1
        accs.append(a)
        f1s.append(f1)
        for c, cf1 in enumerate(M.f1_score(yt, yp, num_classes, None)):
            out[f"{prefix}/{name}_class{c}_f1"] = float(cf1)
    out[f"{prefix}/avg_accuracy"] = float(np.mean(accs))
    out[f"{prefix}/avg_f1"] = float(np.mean(f1s))
    acc.clear()
    return out


def run_training(
    trainer: Trainer,
    train_batches: Callable[[int], Iterable[dict]],
    val_batches: Optional[Callable[[], Iterable[dict]]] = None,
    state: Optional[TrainState] = None,
    logger: Optional[MetricsLogger] = None,
    use_wandb: bool = False,
) -> TrainState:
    """train_batches(epoch) -> iterable of host batches (numpy dicts).

    Returns the final state. Checkpoints to cfg.output_dir; real resume via
    cfg.resume_from.
    """
    cfg = trainer.cfg
    num_classes = cfg.model.num_classes
    logger = logger or MetricsLogger(
        cfg.output_dir, use_wandb=use_wandb,
        wandb_project=cfg.wandb_project, wandb_entity=cfg.wandb_entity,
    )
    ckpt = CheckpointManager(os.path.join(cfg.output_dir, "checkpoints"))

    if state is None:
        state = trainer.init()
        if cfg.resume_from:
            mgr = CheckpointManager(cfg.resume_from)
            state = TrainState(*mgr.restore(template=tuple(state)))
            print(f"[train] resumed from {cfg.resume_from} @ step {int(state.step)}")

    best_metric = float("-inf")
    acc: dict = {}
    global_step = int(state.step)
    samples = 0
    t_window = time.time()

    window = getattr(trainer, "train_window", None)
    wsize = cfg.steps_per_call
    pending: list[dict] = []

    def flush_window():
        nonlocal state, samples, global_step
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        from mmd_tpu.training.trainer import stack_batches
        wshard = NamedSharding(trainer.mesh, P(None, "data"))
        stacked = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, wshard), stack_batches(pending))
        state, auxw = window(state, stacked)
        global_step += len(pending)
        samples += auxw["labels"].shape[0] * auxw["labels"].shape[1]
        preds = np.asarray(auxw["preds"])
        _accumulate(acc, {"preds": preds.reshape(-1, preds.shape[-1]),
                          "labels": np.asarray(auxw["labels"]).reshape(
                              -1, preds.shape[-1]),
                          "loss": auxw["loss"][-1]})
        pending.clear()
        return auxw["loss"][-1]

    for epoch in range(cfg.epochs):
        stream = ({k: v for k, v in b.items() if not k.startswith("_")}
                  for b in train_batches(epoch))
        presharded = (window is None
                      and getattr(cfg, "prefetch_depth", 0) > 0)
        if presharded:
            stream = prefetch_to_device(stream, trainer.shard_batch,
                                        cfg.prefetch_depth)
        for batch in stream:
            if window is not None:
                pending.append(batch)
                if len(pending) < wsize:
                    continue
                loss = flush_window()
                aux = {"loss": loss, "labels": np.zeros((0,))}
            else:
                if not presharded:
                    batch = trainer.shard_batch(batch)
                state, aux = trainer.train_step(state, batch)
                global_step += 1
                samples += aux["labels"].shape[0]
                _accumulate(acc, aux)

            if global_step % cfg.log_every < (wsize if window else 1):
                dt = time.time() - t_window
                logs = _flush_metrics(acc, num_classes, "train")
                logs["train/total_loss"] = float(np.asarray(aux["loss"]))
                logs["train/samples_per_sec"] = samples / max(dt, 1e-9)
                logs["train/learning_rate"] = cfg.lr
                logger.log(logs, step=global_step)
                samples, t_window = 0, time.time()

            if (cfg.save_every
                    and global_step % cfg.save_every < (wsize if window else 1)):
                ckpt.save(global_step, tuple(state))

        # ragged tail of a window epoch runs as single steps
        for batch in pending:
            b = trainer.shard_batch(batch)
            state, aux = trainer.train_step(state, b)
            global_step += 1
            samples += aux["labels"].shape[0]
            _accumulate(acc, aux)
        pending.clear()

        if cfg.validate_every_epoch and val_batches is not None:
            val_logs = evaluate(trainer, state, val_batches(), num_classes)
            val_logs["epoch"] = epoch
            logger.log(val_logs, step=global_step)
            if cfg.save_best:
                key = f"val/{cfg.best_metric}"
                cur = val_logs.get(key)
                if cur is not None and cur > best_metric:
                    best_metric = cur
                    save_params(
                        os.path.join(cfg.output_dir, "best_model"), state.params
                    )
                    logger.log({"val/best_metric": best_metric}, step=global_step)

    ckpt.save(global_step, tuple(state), wait=True)
    ckpt.close()
    return state


def evaluate(trainer: Trainer, state: TrainState,
             batches: Iterable[dict], num_classes: int) -> dict:
    acc: dict = {}
    nll_sum = 0.0
    nll_count = 0
    for batch in batches:
        mask = batch.pop("_pad_mask", None)
        batch = {k: v for k, v in batch.items() if not k.startswith("_")}
        batch = trainer.shard_batch(batch)
        aux = trainer.eval_step(state.params, batch)
        aux = {k: np.asarray(v) for k, v in aux.items()}
        # val/loss from per-sample nll so the ragged tail's padded duplicate
        # rows don't count and every VALID sample is weighted equally
        # (batch means would overweight the short tail batch).
        nll = aux.pop("nll")
        if mask is not None:
            aux["preds"] = aux["preds"][mask]
            aux["labels"] = aux["labels"][mask]
            nll = nll[mask]
        nll_sum += float(nll.sum())
        nll_count += int(nll.shape[0])
        _accumulate(acc, aux)
    logs = _flush_metrics(acc, num_classes, "val")
    logs["val/loss"] = nll_sum / nll_count if nll_count else 0.0
    return logs
