#!/usr/bin/env python
"""Quality-number suite: trains every model family on a learnable synthetic
Factify tree and records F1/accuracy/top-k per evaluation protocol into
QUALITY.md + benchmarks/QUALITY.json (VERDICT r1 #5: BASELINE.md's
"classifier F1 parity" and "retrieval top-K parity" targets need recorded
numbers; the reference publishes none, so these synthetic-convergence runs
establish that every protocol trains AND what it trains to).

One command, fully offline, deterministic (8-device virtual CPU mesh):

    python benchmarks/quality_suite.py

Protocols covered (reference file each re-derives):
  - 4-path fusion classifier + unified agreement rule  (train.py, eval_models.py)
  - factify 5-class head + Refute-weighted accuracy    (eval_factify.py:59-111)
  - text-only 3-class head                             (eval_text.py)
  - FakeNet baseline + weighted-power ensemble         (Pre-CoFactv2)
  - im2im retrieval top-k                              (experiment_image.py:7-63)
  - text2text retrieval top-k                          (experiment_text.py)
  - zero-shot prompting: stub + IN-TREE decoder LM     (kumar_et_al/eval_bloom.py)
"""

from __future__ import annotations

import argparse
import contextlib
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


@contextlib.contextmanager
def argv(*args):
    old = sys.argv
    sys.argv = [old[0], *map(str, args)]
    try:
        yield
    finally:
        sys.argv = old


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/mmd_quality")
    p.add_argument("--n_train", type=int, default=256)
    p.add_argument("--n_test", type=int, default=64)
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--platform", default="cpu", choices=["cpu", "native"],
                   help="cpu = 8-device virtual mesh (default, deterministic)")
    p.add_argument("--out_md", default=None)
    p.add_argument("--out_json", default=None)
    p.add_argument("--fast", action="store_true",
                   help="sanity tier for post-change re-runs: 128/32 rows, "
                        "12 epochs, one FakeNet seed, ~10x faster than the "
                        "canonical run on a 1-core host. Writes to "
                        "QUALITY_FAST.md / QUALITY_FAST.json so the "
                        "canonical numbers are never clobbered. Expected "
                        "deltas vs the full tier: fusion/factify/text-only "
                        "accuracies ~2-8 points lower (fewer epochs on "
                        "fewer rows), retrieval top-k within ~2 points, "
                        "prompting rows unchanged (protocol-bound).")
    args = p.parse_args()
    if args.fast:
        if args.root == "/tmp/mmd_quality":
            args.root = "/tmp/mmd_quality_fast"   # never share a stale tree
        args.n_train = min(args.n_train, 128)
        args.n_test = min(args.n_test, 32)
        args.epochs = min(args.epochs, 12)
    tag = "_FAST" if args.fast else ""
    if args.out_md is None:
        args.out_md = str(REPO / f"QUALITY{tag}.md")
    if args.out_json is None:
        args.out_json = str(REPO / "benchmarks" / f"QUALITY{tag}.json")

    if args.platform == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np
    import pandas as pd

    t0 = time.time()
    results: dict = {"config": vars(args),
                     "devices": len(jax.devices()),
                     "backend": jax.default_backend()}

    # ---- data: learnable synthetic tree -> preprocess -> embed ----------
    from mmd_tpu.data.synthetic import synthetic_factify_tree
    root = Path(args.root)
    synthetic_factify_tree(root, n_train=args.n_train, n_test=args.n_test,
                           learnable=True, seed=7)
    os.environ["MMD_TPU_ROOT"] = str(root)

    from mmd_tpu.pipelines.preprocess import preprocess_csv
    train_csv = preprocess_csv("train", root)
    test_csv = preprocess_csv("test", root)

    from mmd_tpu.models.frozen import load_or_init_frozen
    assets = root / "assets" / "encoders"
    df = pd.read_csv(train_csv)
    texts = (df["claim"].fillna("").astype(str).tolist()
             + df["evidence"].fillna("").astype(str).tolist())
    enc = load_or_init_frozen(assets, vocab_texts=texts, tiny=True)

    from mmd_tpu.pipelines.embed import embed_csv
    train_store = embed_csv(str(train_csv), enc, enriched=False,
                            batch_size=args.batch_size)
    test_store = embed_csv(str(test_csv), enc, enriched=False,
                           batch_size=args.batch_size)
    print(f"[quality] stores: train={len(train_store)} test={len(test_store)}")

    # ---- fusion classifiers: 4-path, factify, text_only -----------------
    from mmd_tpu.core.config import ModelConfig, TrainConfig
    from mmd_tpu.core.mesh import make_mesh
    from mmd_tpu.training.trainer import Trainer
    mesh = make_mesh()
    resdir = root / "results"
    resdir.mkdir(parents=True, exist_ok=True)

    def train_fusion(**model_kw):
        model = ModelConfig(
            text_input_dim=enc.text_cfg.hidden_size,
            image_input_dim=enc.vit_cfg.hidden_size,
            embed_dim=64, num_heads=4, hidden_dim=32,
            compute_dtype="float32", **model_kw)
        cfg = TrainConfig(model=model, batch_size=args.batch_size, lr=2e-3,
                          epochs=args.epochs, output_dir=str(resdir),
                          save_every=0, log_every=10**9)
        tr = Trainer(cfg, mesh)
        state = tr.init()
        cols = [c for c in train_store.columns if c != "id"]
        last = None
        for e in range(args.epochs):
            for b in train_store.batches(args.batch_size, shuffle=True,
                                         seed=e, columns=cols):
                state, aux = tr.train_step(state, tr.shard_batch(b))
                last = float(np.asarray(aux["loss"]))
        return model, state.params, last

    from mmd_tpu.pipelines.eval_models import evaluate_store
    model4, params4, loss4 = train_fusion()
    m4 = evaluate_store(test_store, model4, params4,
                        batch_size=args.batch_size,
                        results_csv=str(resdir / "eval_models.csv"))
    results["fusion_4path"] = {"final_train_loss": loss4, **m4}
    print(f"[quality] 4-path: unified_f1={m4['unified/weighted_f1']:.3f}")

    from mmd_tpu.pipelines.eval_factify import evaluate_factify
    model5, params5, loss5 = train_fusion(factify=True, num_classes=5)
    m5 = evaluate_factify(test_store, model5, params5,
                          batch_size=args.batch_size,
                          confusion_png=str(resdir / "confusion.png"))
    results["factify_5class"] = {"final_train_loss": loss5, **m5}
    print(f"[quality] factify: acc={m5['accuracy']:.3f} "
          f"weighted={m5['weighted_accuracy']:.3f}")

    from mmd_tpu.pipelines.eval_text import evaluate_text_only
    modelt, paramst, losst = train_fusion(text_only=True)
    mt = evaluate_text_only(test_store, modelt, paramst,
                            batch_size=args.batch_size,
                            results_csv=str(resdir / "eval_text.csv"))
    results["text_only"] = {"final_train_loss": losst, **mt}

    # ---- FakeNet baseline + power ensemble ------------------------------
    from mmd_tpu.baselines.fakenet import FakeNetConfig
    from mmd_tpu.baselines.fakenet_train import (
        ensemble_grid_search, predict_fakenet, train_fakenet,
    )
    from mmd_tpu.data import labels as lb
    from mmd_tpu.training import metrics as M

    fn_cfg = FakeNetConfig(text_dim=enc.text_cfg.hidden_size,
                           image_dim=enc.vit_cfg.hidden_size,
                           hidden_dim=64, head=2)
    fn_cols = ["claim_text_embeds", "doc_text_embeds",
               "claim_image_embeds", "doc_image_embeds", "labels"]

    def add_columns(batch):
        batch = dict(batch)
        cat = lb.paths_to_category_idx(batch["labels"])
        batch["category"] = np.where(cat >= 0, cat, 2).astype(np.int32)
        batch["add_feature"] = np.zeros(
            (len(batch["category"]), fn_cfg.add_feature_dim), np.float32)
        return batch

    def fn_batches(store):
        def gen(epoch=0):
            for b in store.batches(args.batch_size, shuffle=True, seed=epoch,
                                   columns=fn_cols):
                yield add_columns(b)
        return gen

    prob_sets, fn_f1s, y_true = [], [], None
    for seed in ((42,) if args.fast else (42, 43)):
        fn_params, hist = train_fakenet(
            fn_cfg, fn_batches(train_store),
            epochs=max(args.epochs // 2, 5), lr=5e-4, seed=seed)
        y_pred, y_true, probs = predict_fakenet(
            fn_params, fn_cfg,
            (add_columns(b) for b in test_store.batches(
                min(args.batch_size, len(test_store)), columns=fn_cols)),
            return_probs=True)
        fn_f1s.append(M.f1_score(y_true, y_pred, 5, "weighted"))
        prob_sets.append(probs)
    ens_cfg, ens_f1 = ensemble_grid_search(prob_sets, y_true)
    results["fakenet"] = {"weighted_f1_per_seed": fn_f1s,
                          "ensemble_f1": ens_f1, "ensemble": ens_cfg}
    print(f"[quality] fakenet: f1={fn_f1s} ensemble={ens_f1:.3f}")

    # ---- retrieval top-k -------------------------------------------------
    from mmd_tpu.pipelines.build_retrieval import (
        build_image_corpus, build_text_corpora,
    )
    from mmd_tpu.retrieval.experiments import (
        image_retrieval_experiment, text_retrieval_experiment,
    )
    text_corpora = build_text_corpora(["test"], enc.tokenizer, root,
                                      tiny=True, batch_size=args.batch_size)
    from mmd_tpu.retrieval.text import SemanticSearch
    search = SemanticSearch(text_corpora[0], text_corpora)
    df_test = pd.read_csv(test_csv)
    queries = [(str(r["claim"]), f"test_{r['id']}")
               for _, r in df_test.iterrows()]
    text_acc = text_retrieval_experiment(
        search, queries, out_file=str(resdir / "text_topk.txt"))
    results["text_retrieval_topk"] = {f"top{k}": v
                                      for k, v in text_acc.items()}
    print(f"[quality] text retrieval: {results['text_retrieval_topk']}")

    image_corpus = build_image_corpus(["test"], root, tiny=True,
                                      batch_size=args.batch_size)
    img_dir = root / "data" / "raw" / "factify" / "extracted" / "images" / "test"
    query_paths = sorted(str(p) for p in img_dir.glob("*_claim.jpg"))
    img_acc = image_retrieval_experiment(
        image_corpus, query_paths, out_file=str(resdir / "image_topk.txt"))
    results["image_retrieval_topk"] = {f"top{k}": v
                                       for k, v in img_acc.items()}
    print(f"[quality] image retrieval: {results['image_retrieval_topk']}")

    # ---- zero-shot prompting: stub protocol + in-tree decoder LM --------
    from mmd_tpu.pipelines import train_captioner
    with argv("--csv", train_csv, "--image_col", "claim_image",
              "--caption_col", "claim", "--assets", str(assets),
              "--tiny", "--epochs", "3",
              "--batch_size", str(args.batch_size)):
        train_captioner.main()

    from mmd_tpu.baselines import eval_prompting
    for llm in ("stub", "captioner"):
        out_json = resdir / f"prompting_{llm}.json"
        with argv("--csv", str(test_csv), "--llm", llm, "--assets",
                  str(assets), "--limit", str(args.n_test),
                  "--results_json", str(out_json)):
            eval_prompting.main()
        rep = json.loads(out_json.read_text())
        results[f"prompting_{llm}"] = {
            k: rep[k] for k in ("accuracy", "micro_f1", "weighted_f1")}
    print(f"[quality] prompting: {results['prompting_captioner']}")

    results["wall_s"] = round(time.time() - t0, 1)
    Path(args.out_json).write_text(json.dumps(results, indent=1,
                                              default=float))
    write_markdown(results, args)
    print(f"[quality] done in {results['wall_s']}s -> {args.out_md}")


def write_markdown(r: dict, args) -> None:
    date = time.strftime("%Y-%m-%d")
    f4 = r["fusion_4path"]
    f5 = r["factify_5class"]
    ft = r["text_only"]
    paths = ("text_text", "text_image", "image_text", "image_image")
    lines = [
        "# Quality numbers (synthetic convergence protocol)",
        "",
        f"Generated {date} by `python benchmarks/quality_suite.py"
        f"{' --fast' if args.fast else ''}` "
        f"({r['devices']}-device {r['backend']} mesh, "
        f"{args.n_train} train / {args.n_test} test learnable synthetic "
        f"rows, {args.epochs} epochs, wall {r['wall_s']}s).",
        "",
        "The reference publishes no quality numbers (BASELINE.md). This",
        "suite plants recoverable label/retrieval signal in a synthetic",
        "Factify tree (mmd_tpu/data/synthetic.py::CAT_SIGNAL_WORDS/CAT_TINT),",
        "trains EVERY model family through its real pipeline (preprocess ->",
        "embed -> train -> eval driver), and records what each protocol",
        "converges to — proving the full training/eval stack learns, not",
        "just runs. Regenerate with the one command above.",
        "",
        "## Fusion classifier (4-path, 3-class per path)",
        "",
        "| Path | Accuracy | Weighted F1 |",
        "|---|---|---|",
    ]
    for name in paths:
        lines.append(f"| {name} | {f4[f'{name}/accuracy']:.3f} | "
                     f"{f4[f'{name}/weighted_f1']:.3f} |")
    lines += [
        f"| **unified (agreement rule)** | {f4['unified/accuracy']:.3f} | "
        f"{f4['unified/weighted_f1']:.3f} |",
        "",
        f"Final train loss {f4['final_train_loss']:.3f} "
        "(4-path CE; chance = 4.39).",
        "",
        "## Factify 5-class head (eval_factify protocol)",
        "",
        "| Metric | Value |",
        "|---|---|",
        f"| accuracy | {f5['accuracy']:.3f} |",
        f"| weighted accuracy (Refute x4) | {f5['weighted_accuracy']:.3f} |",
    ]
    for k, v in f5.items():
        if k.startswith("accuracy/"):
            lines.append(f"| {k} | {v:.3f} |")
    lines += [
        "",
        "## Text-only head (eval_text protocol)",
        "",
        f"Accuracy {ft.get('accuracy', float('nan')):.3f}, "
        f"weighted F1 {ft.get('weighted_f1', float('nan')):.3f}.",
        "",
        "## FakeNet baseline (Pre-CoFactv2)",
        "",
        f"Weighted F1 per seed: "
        f"{', '.join(f'{x:.3f}' for x in r['fakenet']['weighted_f1_per_seed'])}; "
        f"weighted-power ensemble: {r['fakenet']['ensemble_f1']:.3f} "
        f"(grid pick {r['fakenet']['ensemble']}).",
        "",
        "## Retrieval top-k accuracy",
        "",
        "| k | text2text | im2im |",
        "|---|---|---|",
    ]
    for k in (1, 2, 5, 10):
        t = r["text_retrieval_topk"].get(f"top{k}", float("nan"))
        i = r["image_retrieval_topk"].get(f"top{k}", float("nan"))
        lines.append(f"| {k} | {t:.3f} | {i:.3f} |")
    ps, pc = r["prompting_stub"], r["prompting_captioner"]
    lines += [
        "",
        "Protocol: query = test claim (text) / test `{id}_claim.jpg` (image),",
        "relevant = same id's evidence — reference experiment_text.py /",
        "experiment_image.py. Signal: shared per-id entity token / base image.",
        "",
        "## Zero-shot prompting (kumar_et_al protocol)",
        "",
        "| LLM | Accuracy | Weighted F1 |",
        "|---|---|---|",
        f"| keyword stub (protocol ceiling) | {ps['accuracy']:.3f} | "
        f"{ps['weighted_f1']:.3f} |",
        f"| in-tree decoder LM (caption-trained) | {pc['accuracy']:.3f} | "
        f"{pc['weighted_f1']:.3f} |",
        "",
        "The in-tree decoder LM row is the honest offline number: a real",
        "(caption-trained, tiny) LM through the full prompt->generate->parse",
        "protocol — expected chance-level at fact-checking, recorded as such",
        "(no BLOOM-class weights exist offline; see",
        "mmd_tpu/baselines/eval_prompting.py).",
        "",
        "Raw artifacts: benchmarks/QUALITY.json (this table's source),",
        "plus per-protocol CSVs/PNGs under the run's results/ directory.",
    ]
    Path(args.out_md).write_text("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
