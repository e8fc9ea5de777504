"""End-to-end pipeline driver: preprocess -> caption -> embed ->
retrieval corpora -> train -> eval -> demo verification.

The offline, batched equivalent of the reference demo's five steps plus
training (BASELINE.json "end-to-end" config), with per-stage wall-clock
timings. `--synthetic N` fabricates a Factify-shaped tree first so the whole
thing runs anywhere (no network).

Usage:
  python -m mmd_tpu.pipelines.run_all --synthetic 64 --tiny --epochs 2
  python -m mmd_tpu.pipelines.run_all --epochs 5          # real data under ./data
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np
import pandas as pd


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", type=str, default=None)
    p.add_argument("--synthetic", type=int, default=0,
                   help="generate a synthetic Factify tree with N train rows")
    p.add_argument("--tiny", action="store_true",
                   help="tiny encoder/captioner configs (smoke)")
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--embed_dim", type=int, default=256)
    p.add_argument("--top_k", type=int, default=3)
    p.add_argument("--image_size", type=int, default=None,
                   help="synthetic image size (default 64; use 256 to price "
                        "production host decode)")
    p.add_argument("--reference_encoders", action="store_true",
                   help="seeded DeBERTa-v3-xsmall + Swinv2-base (the "
                        "reference's actual encoder families) instead of "
                        "the BERT-class/ViT substitutes")
    p.add_argument("--reuse_tree", action="store_true",
                   help="skip synthesis when the tree already exists at "
                        "--root (pre-generated)")
    p.add_argument("--timings_json", type=str, default=None,
                   help="dump per-stage wall-clock timings (plus row "
                        "counts) as JSON for BENCHMARKS.md")
    p.add_argument("--fused", action="store_true",
                   help="device-centric fused flow (pipelines/fused.py): "
                        "images cross the host<->device link ONCE into "
                        "resident banks; frozen embeddings recompute "
                        "inside the train step instead of materializing "
                        "(the TPU-first path for bandwidth-starved hosts)")
    p.add_argument("--train_batch", type=int, default=64,
                   help="fused train/eval batch (raw-path sweet spot)")
    p.add_argument("--steps_per_call", type=int, default=8,
                   help="fused: train steps scanned per dispatch")
    p.add_argument("--chunk", type=int, default=256,
                   help="fused: ingest chunk rows (H2D granularity)")
    args = p.parse_args()

    # Persistent XLA compilation cache: the remote compiles on tunneled
    # hosts cost minutes per big graph (captioner decode scan ~10 min);
    # keyed by HLO fingerprint, so repeat runs skip them entirely.
    try:
        import jax
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("MMD_JAX_CACHE", "/tmp/mmd_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception as e:
        print(f"[run_all] compilation cache unavailable: {e}")

    from mmd_tpu.core.profiling import Stages
    stages = Stages()

    if args.synthetic:
        from mmd_tpu.data.synthetic import synthetic_factify_tree
        root = Path(args.root or "/tmp/mmd_pipeline")
        marker = (root / "data" / "raw" / "factify" / "extracted"
                  / "train.csv")
        if args.reuse_tree and marker.exists():
            print(f"[run_all] reusing existing tree at {root}")
        else:
            with stages.stage("synthesize"):
                synthetic_factify_tree(root, n_train=args.synthetic,
                                       n_test=max(args.synthetic // 4, 4),
                                       image_size=args.image_size or 64)
        os.environ["MMD_TPU_ROOT"] = str(root)
    else:
        root = Path(args.root) if args.root else None
        if root:
            os.environ["MMD_TPU_ROOT"] = str(root)

    from mmd_tpu.data.schema import get_project_root
    root = get_project_root()
    assets = root / "assets" / "encoders"
    import time as _time
    stages.wall_t0 = _time.perf_counter()   # excludes synthesize

    # 1. preprocess
    from mmd_tpu.pipelines.preprocess import preprocess_csv
    with stages.stage("preprocess"):
        train_csv = preprocess_csv("train", root)
        test_csv = preprocess_csv("test", root)
    assert train_csv and test_csv

    # frozen encoder assets (tokenizer trains on first use)
    from mmd_tpu.models.frozen import load_or_init_frozen
    with stages.stage("assets"):
        df = pd.read_csv(train_csv)
        texts = (df["claim"].fillna("").astype(str).tolist()
                 + df["evidence"].fillna("").astype(str).tolist())
        enc = load_or_init_frozen(assets, vocab_texts=texts, tiny=args.tiny,
                                  reference_families=args.reference_encoders)

    if args.fused:
        return _run_fused(args, stages, root, train_csv, test_csv, enc)

    # 2. caption enrichment
    from mmd_tpu.models.captioner import CAPTIONER_TEST
    from mmd_tpu.pipelines.caption import CaptionEngine, process_csv
    with stages.stage("caption"):
        engine = CaptionEngine(enc.tokenizer,
                               cfg=CAPTIONER_TEST if args.tiny else None,
                               batch_size=min(args.batch_size, 32))
        process_csv("train", engine, root)
        process_csv("test", engine, root)

    # 3. embed
    from mmd_tpu.pipelines.embed import embed_csv
    with stages.stage("embed"):
        train_store = embed_csv(str(train_csv), enc, enriched=False,
                                batch_size=args.batch_size)
        test_store = embed_csv(str(test_csv), enc, enriched=False,
                               batch_size=args.batch_size)

    # 4. retrieval corpora
    from mmd_tpu.pipelines.build_retrieval import (
        build_image_corpus, build_text_corpora,
    )
    with stages.stage("retrieval_build"):
        text_corpora = build_text_corpora(["train", "test"], enc.tokenizer,
                                          root, tiny=args.tiny,
                                          batch_size=args.batch_size)
        image_corpus = build_image_corpus(["train"], root, tiny=args.tiny,
                                          batch_size=args.batch_size)

    # 5. train the fusion classifier
    from mmd_tpu.core.mesh import require_tpu
    require_tpu()
    import jax
    from mmd_tpu.core.config import ModelConfig, TrainConfig
    from mmd_tpu.core.mesh import make_mesh
    from mmd_tpu.training.loop import evaluate, run_training
    from mmd_tpu.training.trainer import Trainer
    model = ModelConfig(
        text_input_dim=enc.text_cfg.hidden_size,
        image_input_dim=enc.vit_cfg.hidden_size,
        embed_dim=args.embed_dim if not args.tiny else 32,
        num_heads=8 if not args.tiny else 4,
        hidden_dim=64 if not args.tiny else 16,
        fused_attn=jax.default_backend() == "tpu")
    bs = min(args.batch_size, max(len(train_store) // 2, 1))
    cfg = TrainConfig(model=model, batch_size=bs, epochs=args.epochs,
                      lr=1e-3, output_dir=str(root / "results"),
                      save_every=0, log_every=5)
    mesh = make_mesh()
    trainer = Trainer(cfg, mesh)
    with stages.stage("train"):
        state = run_training(
            trainer,
            lambda e: train_store.batches(bs, shuffle=True, seed=e,
                                          columns=[c for c in train_store.columns
                                                   if c != "id"]),
        )

    # 6. eval drivers
    from mmd_tpu.pipelines.eval_models import evaluate_store
    with stages.stage("eval"):
        metrics = evaluate_store(test_store, model, state.params,
                                 batch_size=bs,
                                 results_csv=str(root / "results" / "eval.csv"))
    print("[run_all] eval:", {k: round(v, 3) for k, v in metrics.items()
                              if "unified" in k})

    # 7. demo verification of one claim
    _demo_verify(args, stages, root, enc, engine, model, state.params,
                 text_corpora, image_corpus, test_csv, bs)
    _write_timings(args, stages, enc, len(train_store), len(test_store))


def _demo_verify(args, stages, root, enc, engine, model, fusion_params,
                 text_corpora, image_corpus, test_csv, bs):
    from mmd_tpu.demo.pipeline import ClaimVerificationPipeline, EvidenceIndex
    from mmd_tpu.inference.predictor import MisinformationPredictor
    from mmd_tpu.retrieval.text import SemanticSearch
    with stages.stage("demo_verify"):
        index = EvidenceIndex(
            {"train": root / "data" / "preprocessed" / "train_enriched.csv",
             "test": root / "data" / "preprocessed" / "test_enriched.csv"},
            root=root)
        search = SemanticSearch(text_corpora[0], text_corpora,
                                evidence_lookup=index.text_lookup())
        predictor = MisinformationPredictor(
            model, fusion_params=fusion_params, encoders=enc,
            batch_size=min(bs, 16))
        pipe = ClaimVerificationPipeline(
            predictor, text_search=search, image_corpus=image_corpus,
            caption_engine=engine, evidence_index=index)
        df_test = pd.read_csv(test_csv)
        row = df_test.iloc[0]
        img = row["claim_image"]
        img_path = str(root / img) if isinstance(img, str) else None
        result = pipe.verify(str(row["claim"]), img_path, top_k=args.top_k)
    print(f"[run_all] demo verdict for test row 0: "
          f"{result.final_classification} "
          f"({len(result.evidences)} evidences, caption={result.caption!r})")


def _write_timings(args, stages, enc, n_train, n_test):
    print(stages.report())
    if not args.timings_json:
        return
    import json
    import time as _time
    doc = {
        "date": _time.strftime("%Y-%m-%d"),
        "args": {k: v for k, v in vars(args).items()},
        "n_train_rows": int(n_train),
        "n_test_rows": int(n_test),
        "text_encoder": type(enc.text_cfg).__name__,
        "image_encoder": type(enc.vit_cfg).__name__,
        "stages_sec": {k: round(v, 2) for k, v in stages.summary().items()},
    }
    if hasattr(stages, "wall_t0"):
        # true wall clock excluding synthesize: overlapped stages (the
        # fused flow's ingest_test_overlap thread) make the stage SUM an
        # overcount, so record the honest end-to-end number too
        doc["wall_sec_excl_synthesize"] = round(
            _time.perf_counter() - stages.wall_t0, 2)
    Path(args.timings_json).write_text(json.dumps(doc, indent=1))
    print(f"[run_all] timings -> {args.timings_json}")


def _run_fused(args, stages, root, train_csv, test_csv, enc):
    """Device-centric flow (pipelines/fused.py), laid out to keep the
    host->device wire (the measured bottleneck: ~35 MB/s through the
    tunnel, benchmarks/ab_results.json tunnel_transfer_probe) busy
    end-to-end:

      * ingest banks FROZEN image embeddings (bf16, smaller than the raw
        uint8 pixels) computed per chunk; the raw chunk feeds the caption
        generator and the ResNet retrieval features before it is dropped,
        so every image crosses the wire exactly once;
      * the big XLA compiles (caption decode scan, train window) prewarm
        on threads while ingest streams, and land in the persistent
        compilation cache for later runs;
      * the TEST split ingests on a thread WHILE the train loop runs —
        its transfers ride the wire the train loop leaves idle."""
    from mmd_tpu.core.mesh import require_tpu
    require_tpu()
    import threading

    import jax

    from mmd_tpu.core.config import ModelConfig, TrainConfig
    from mmd_tpu.core.mesh import make_mesh
    from mmd_tpu.models.captioner import CAPTIONER_TEST
    from mmd_tpu.pipelines import fused as F
    from mmd_tpu.pipelines.build_retrieval import build_text_corpora
    from mmd_tpu.pipelines.caption import CaptionEngine
    from mmd_tpu.training.trainer import Trainer

    image_size = enc.vit_cfg.image_size
    cap_batch = 8 if args.tiny else 64
    chunk = max(args.chunk, cap_batch)
    chunk -= chunk % cap_batch            # caption slices must tile chunks
    engine = CaptionEngine(enc.tokenizer,
                           cfg=CAPTIONER_TEST if args.tiny else None,
                           batch_size=cap_batch)
    train_capt = F.BankCaptioner(engine, batch=cap_batch,
                                 bank_image_size=image_size)
    test_capt = F.BankCaptioner(engine, batch=cap_batch,
                                bank_image_size=image_size)
    resnet_feats = F.BankResNetFeatures(tiny=args.tiny)

    # ---- prewarm: big compiles ride the network WHILE ingest streams ----
    # (remote XLA compiles don't consume device time; the caption decode
    # scan alone costs ~10 min cold — hide it behind ingest)
    model = ModelConfig(
        text_input_dim=enc.text_cfg.hidden_size,
        image_input_dim=enc.vit_cfg.hidden_size,
        embed_dim=args.embed_dim if not args.tiny else 32,
        num_heads=8 if not args.tiny else 4,
        hidden_dim=64 if not args.tiny else 16,
        fused_attn=jax.default_backend() == "tpu")
    n_train_csv = len(pd.read_csv(train_csv))
    bs = min(args.train_batch, max(n_train_csv // 4, 1))
    k = max(1, min(args.steps_per_call, n_train_csv // max(bs, 1)))
    cfg = TrainConfig(model=model, batch_size=bs, epochs=args.epochs,
                      lr=1e-3, output_dir=str(root / "results"),
                      save_every=0, log_every=50)
    trainer = Trainer(cfg, make_mesh(), encoders=enc)
    vis = F.vis_embed_shape(enc, image_size, model.compute_dtype)
    warm: dict = {}

    def _warm_gen():
        import numpy as _np
        try:
            engine._gen(_np.zeros(
                (cap_batch, engine.cfg.vit.image_size,
                 engine.cfg.vit.image_size, 3), _np.uint8))
        except Exception as e:                    # fall back to lazy jit
            print(f"[run_all] caption prewarm failed: {e}")

    def _warm_window():
        try:
            data_sds = F.bank_column_shapes(
                n_train_csv, chunk, vis=vis, vis_dtype=model.compute_dtype)
            warm["window"] = F.precompile_train_window(trainer, k, data_sds)
        except Exception as e:
            print(f"[run_all] train-window prewarm failed "
                  f"(lazy compile instead): {e}")

    def _warm_predict():
        try:
            warm["predict"] = F.precompile_bank_predict(
                model, enc, bs, vis=vis, vis_dtype=model.compute_dtype)
        except Exception as e:
            print(f"[run_all] eval prewarm failed "
                  f"(lazy compile instead): {e}")

    warm_threads = [threading.Thread(target=f, daemon=True, name=n)
                    for f, n in ((_warm_gen, "mmd-warm-gen"),
                                 (_warm_window, "mmd-warm-window"),
                                 (_warm_predict, "mmd-warm-predict"))]
    for t in warm_threads:
        t.start()

    def train_hook(imgs, start, n):
        train_capt.on_chunk(imgs, start, n)
        resnet_feats.on_chunk(imgs, start, n)

    with stages.stage("ingest"):
        bank = F.ingest_split(train_csv, enc, image_size=image_size,
                              chunk=chunk, embed_images=True,
                              vis_dtype=model.compute_dtype,
                              on_chunk=train_hook, root=root)
    print(f"[run_all] fused ingest: train {bank.n} rows "
          f"({bank.skipped} skipped)")

    # ---- test split ingests on a thread while captions collect + the
    # train loop runs: its H2D rides the wire those stages leave idle ----
    test_box: dict = {}

    def _ingest_test():
        try:
            with stages.stage("ingest_test_overlap"):
                test_box["bank"] = F.ingest_split(
                    test_csv, enc, image_size=image_size, chunk=chunk,
                    embed_images=True, vis_dtype=model.compute_dtype,
                    on_chunk=test_capt.on_chunk, root=root)
        except Exception as e:                    # re-raised on join
            test_box["error"] = e

    test_thread = threading.Thread(target=_ingest_test, daemon=True,
                                   name="mmd-ingest-test")
    test_thread.start()

    pre = root / "data" / "preprocessed"
    with stages.stage("caption"):
        cc, dc = train_capt.collect(bank.n)
        F.write_enriched_csv(pd.read_csv(train_csv), bank.ids, cc, dc,
                             pre / "train_enriched.csv")

    with stages.stage("retrieval_build"):
        text_corpora = build_text_corpora(
            ["train"], enc.tokenizer, root, tiny=args.tiny,
            batch_size=max(args.batch_size, 64))
        image_corpus = resnet_feats.write(bank, root)

    for t in warm_threads:
        t.join()
    with stages.stage("train"):
        state = F.train_from_bank(trainer, bank, steps_per_call=k,
                                  log_every=cfg.log_every,
                                  compiled=warm.get("window"))

    test_thread.join()
    if "error" in test_box:
        raise test_box["error"]
    test_bank = test_box["bank"]
    print(f"[run_all] fused ingest: test {test_bank.n} rows "
          f"({test_bank.skipped} skipped)")

    with stages.stage("caption_test"):
        tcc, tdc = test_capt.collect(test_bank.n)
        F.write_enriched_csv(pd.read_csv(test_csv), test_bank.ids, tcc, tdc,
                             pre / "test_enriched.csv")
    with stages.stage("retrieval_build_test"):
        text_corpora += build_text_corpora(
            ["test"], enc.tokenizer, root, tiny=args.tiny,
            batch_size=max(args.batch_size, 64))

    with stages.stage("eval"):
        metrics = F.evaluate_from_bank(
            test_bank, enc, model, state.params, batch_size=bs,
            results_csv=str(root / "results" / "eval.csv"),
            compiled=warm.get("predict"))
    print("[run_all] eval:", {k_: round(v, 3) for k_, v in metrics.items()
                              if "unified" in k_})

    _demo_verify(args, stages, root, enc, engine, model, state.params,
                 text_corpora, image_corpus, test_csv, bs)
    _write_timings(args, stages, enc, bank.n, test_bank.n)


if __name__ == "__main__":
    main()
