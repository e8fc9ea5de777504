"""Full benchmark suite for the BASELINE.md target metrics, on real TPU.

Measures, per chip (in-jit loop delta protocol, see benchmarks/timing.py —
the only honest clock on tunneled devices):
  1. fusion train step throughput (samples/s)      — headline, same as bench.py
  2. text-encoder embeddings/s (512-token xsmall)  — embed-pipeline stage
  3. image-encoder embeddings/s (ViT 64x1024)      — embed-pipeline stage
  4. retrieval QPS: cosine top-k over im2im-scale (41,256 x 2048) and
     text-scale (42,500 x 768) corpora             — replaces O(N) host loops
  5. captioner greedy decode tokens/s (KV-cached scan)

Writes BENCHMARKS.md + benchmarks/results.json.

Run: python benchmarks/bench_suite.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from timing import bench_iter_time, data_dep  # noqa: E402

REPO = Path(__file__).resolve().parent.parent

# v5e bf16 peak (the timing protocol itself was validated at 175 TFLOP/s on
# chained 8192^3 bf16 matmuls against this number)
PEAK_BF16 = 197e12


def analytic_flops(fn, *args) -> float | None:
    """Per-call FLOPs from XLA's cost model, compiled for CPU (flop counts
    are shape-based, so the CPU lowering prices the same math; pass a
    Pallas-free twin of the benched fn — Mosaic kernels don't lower on
    CPU and their cost_estimate is not what XLA counts)."""
    import jax

    try:
        shapes = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), args)
        with jax.default_device(jax.devices("cpu")[0]):
            compiled = jax.jit(fn).lower(*shapes).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        f = float(cost.get("flops", 0.0))
        return f if f > 0 else None
    except Exception as e:  # pragma: no cover - probe is best-effort
        print(f"[mfu] flops probe failed: {e}", file=sys.stderr)
        return None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--write_only", action="store_true",
                   help="regenerate BENCHMARKS.md from benchmarks/results.json "
                        "without re-benchmarking")
    args = p.parse_args()
    if args.write_only:
        out = json.loads((REPO / "benchmarks" / "results.json").read_text())
        write_markdown(out)
        print("BENCHMARKS.md regenerated from results.json")
        return
    k_small, k_large = (2, 8) if args.quick else (4, 24)

    from mmd_tpu.core.mesh import require_tpu
    require_tpu()
    import jax
    # match the training entrypoints: hardware RBG keys for dropout masks
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    results = {}
    print(f"devices: {jax.devices()}", file=sys.stderr)

    # ---- 1. fusion train step -------------------------------------------
    from mmd_tpu.core.config import DataConfig, ModelConfig, TrainConfig
    from mmd_tpu.core.mesh import make_mesh
    from mmd_tpu.data.synthetic import synthetic_preembed_batch
    from mmd_tpu.training.trainer import Trainer, make_raw_step

    B = 256
    cfg = TrainConfig(model=ModelConfig(fused_attn=True,
                                        compute_dtype="bfloat16"),
                      batch_size=B)
    trainer = Trainer(cfg, make_mesh())
    state = trainer.init()
    raw_step = make_raw_step(cfg, trainer.optimizer)
    host = synthetic_preembed_batch(rng, B)
    for k in list(host):
        if host[k].dtype == np.float32:
            host[k] = host[k].astype(jnp.bfloat16)
    batch = trainer.shard_batch(host)

    def make_train(k):
        @jax.jit
        def run(state, batch):
            st = jax.lax.fori_loop(
                0, k, lambda i, s: raw_step(s, batch)[0], state)
            return raw_step(st, batch)[1]["loss"]
        return run

    fs, fl = make_train(k_small), make_train(k_large)
    float(fs(state, batch)); float(fl(state, batch))

    def wall(f, *a, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*a))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    dt = max((wall(fl, state, batch) - wall(fs, state, batch))
             / (k_large - k_small), 1e-9)
    results["fusion_train_samples_per_sec"] = B / dt
    print(f"fusion train: {dt*1e3:.2f} ms/step -> {B/dt:,.0f} samples/s",
          file=sys.stderr)
    # analytic MFU: FLOPs of a Pallas-free twin of the SAME step (the jnp
    # attention/MLP paths price identical matmul work). dropout=0 keeps
    # the fused Pallas dropout kernel out of the twin too (it can't lower
    # for the CPU cost model and adds no matmul FLOPs anyway).
    jnp_cfg = TrainConfig(model=ModelConfig(fused_attn=False,
                                            compute_dtype="bfloat16",
                                            dropout=0.0),
                          batch_size=B)
    jnp_step = make_raw_step(jnp_cfg, trainer.optimizer)
    fstep = analytic_flops(lambda s_, b_: jnp_step(s_, b_)[0], state, batch)
    if fstep:
        results["fusion_train_mfu_pct"] = 100.0 * fstep / dt / PEAK_BF16
        print(f"fusion train MFU: {results['fusion_train_mfu_pct']:.1f}% "
              f"({fstep/1e9:.1f} GFLOP/step)", file=sys.stderr)

    # ---- 2. text encoder ------------------------------------------------
    from mmd_tpu.models import text_encoder as te
    tcfg = te.TEXT_ENCODER_XSMALL
    tparams = te.init_text_encoder(jax.random.key(0), tcfg)
    TB = 64
    ids = jnp.asarray(rng.integers(0, tcfg.vocab_size, (TB, 512)), jnp.int32)
    mask = jnp.ones((TB, 512), jnp.int32)

    def text_step(c, params, ids, mask):
        out = te.encode(params, tcfg, data_dep(ids, c), mask)
        return jnp.mean(out).astype(jnp.float32)

    dt = bench_iter_time(text_step, (tparams, ids, mask), k_small, k_large)
    results["text_embeddings_per_sec"] = TB / dt
    print(f"text encode: {dt*1e3:.2f} ms/batch{TB} -> {TB/dt:,.0f} seq/s",
          file=sys.stderr)

    # ---- 2b. DeBERTa-v3-xsmall — the reference's ACTUAL text encoder ----
    from mmd_tpu.models import deberta as D
    import dataclasses as _dc
    # bf16 like every other serving-path encoder (the fusion model consumes
    # bf16 embeddings; DebertaConfig's f32 default is the HF-parity setting)
    dcfg = _dc.replace(D.DEBERTA_V3_XSMALL, compute_dtype="bfloat16")
    dparams = D.init_deberta(jax.random.key(2), dcfg)
    dids = jnp.asarray(rng.integers(0, dcfg.vocab_size, (TB, 512)), jnp.int32)

    def deberta_step(c, params, ids, mask):
        out = D.deberta_encode(params, dcfg, data_dep(ids, c), mask)
        return jnp.mean(out).astype(jnp.float32)

    dt = bench_iter_time(deberta_step, (dparams, dids, mask),
                         k_small, k_large)
    results["deberta_embeddings_per_sec"] = TB / dt
    print(f"deberta encode: {dt*1e3:.2f} ms/batch{TB} -> {TB/dt:,.0f} seq/s",
          file=sys.stderr)
    # Kernel-true FLOPs in closed form. The jnp twin is NOT a fair
    # numerator here: its one-hot positional selection is two extra
    # (T,2T)x(2T,T) matmuls per head per layer that the Pallas kernel
    # replaces with zero-MAC diagonal rolls — XLA's cost model counted
    # them and reported a nonsense 143.9% "MFU". Real matmuls per layer:
    # qkv+out proj 8TD^2, MLP 16TD^2, scores+context 4T^2D, c2p+p2c
    # positional q/k @ pos-table matmuls 8T^2D (tables are (2T, dh)).
    Tq, Dh, L = 512, dcfg.hidden_size, dcfg.num_layers
    fenc = TB * L * (24 * Tq * Dh**2 + 12 * Tq**2 * Dh)
    results["deberta_mfu_pct"] = 100.0 * fenc / dt / PEAK_BF16
    print(f"deberta MFU: {results['deberta_mfu_pct']:.1f}% "
          f"(kernel-true FLOPs, closed form)", file=sys.stderr)

    # ---- 3. image encoder -----------------------------------------------
    from mmd_tpu.models import vit as V
    vcfg = V.ViTConfig()
    vparams = V.init_vit(jax.random.key(1), vcfg)
    IB = 64
    imgs = jnp.asarray(rng.standard_normal((IB, 256, 256, 3)), jnp.bfloat16)

    def img_step(c, params, x):
        out = V.vit_forward(params, vcfg, data_dep(x, c))
        return jnp.mean(out).astype(jnp.float32)

    dt = bench_iter_time(img_step, (vparams, imgs), k_small, k_large)
    results["image_embeddings_per_sec"] = IB / dt
    print(f"image encode: {dt*1e3:.2f} ms/batch{IB} -> {IB/dt:,.0f} img/s",
          file=sys.stderr)

    # ---- 3b. Swinv2-base — the reference's ACTUAL image encoder ----------
    from mmd_tpu.models import swin as SW
    scfg = SW.SWIN_BASE_256
    sparams = SW.init_swin(jax.random.key(3), scfg)
    SB = 32
    simgs = jnp.asarray(rng.standard_normal((SB, 256, 256, 3)), jnp.bfloat16)

    def swin_step(c, params, x):
        out = SW.swin_forward(params, scfg, data_dep(x, c))
        return jnp.mean(out).astype(jnp.float32)

    dt = bench_iter_time(swin_step, (sparams, simgs), k_small, k_large)
    results["swin_embeddings_per_sec"] = SB / dt
    print(f"swin encode: {dt*1e3:.2f} ms/batch{SB} -> {SB/dt:,.0f} img/s",
          file=sys.stderr)
    # price FLOPs on the einsum twin: fused_attn defaults True now and the
    # Pallas kernel can't lower for the CPU cost model; the einsum path is
    # the same useful math (no extra selection matmuls, unlike DeBERTa)
    scfg_j = _dc.replace(scfg, fused_attn=False, fused_ln=False)
    fsw = analytic_flops(
        lambda p, x: SW.swin_forward(p, scfg_j, x), sparams, simgs)
    if fsw:
        results["swin_mfu_pct"] = 100.0 * fsw / dt / PEAK_BF16
        print(f"swin MFU: {results['swin_mfu_pct']:.1f}%", file=sys.stderr)

    # ---- 4. retrieval QPS --------------------------------------------------
    from mmd_tpu.ops.topk import dense_topk
    for name, (n, d) in {"im2im": (41256, 2048),
                         "text2text": (42500, 768)}.items():
        corpus = jnp.asarray(rng.standard_normal((n, d)), jnp.bfloat16)
        QB = 64
        q = jnp.asarray(rng.standard_normal((QB, d)), jnp.bfloat16)

        def topk_step(c, q, corpus):
            s, i = dense_topk(data_dep(q, c), corpus, 10)
            return jnp.mean(s).astype(jnp.float32)

        dt = bench_iter_time(topk_step, (q, corpus), k_small, k_large)
        results[f"retrieval_{name}_qps"] = QB / dt
        print(f"retrieval {name} ({n}x{d}): {dt*1e3:.2f} ms/batch{QB} "
              f"-> {QB/dt:,.0f} qps", file=sys.stderr)

    # ---- 5. captioner decode ---------------------------------------------
    from mmd_tpu.models.captioner import CaptionerConfig, generate, init_captioner
    ccfg = CaptionerConfig()
    cparams = init_captioner(jax.random.key(2), ccfg)
    CB = 32
    cimgs = jnp.asarray(rng.standard_normal((CB, 256, 256, 3)), jnp.bfloat16)

    def cap_step(c, params, x):
        toks = generate(params, ccfg, data_dep(x, c), 2, 3, 0, 32)
        return jnp.sum(toks).astype(jnp.float32)

    dt = bench_iter_time(cap_step, (cparams, cimgs),
                         max(k_small // 2, 1), max(k_large // 3, 4))
    results["caption_tokens_per_sec"] = CB * 32 / dt
    results["caption_images_per_sec"] = CB / dt
    print(f"caption: {dt*1e3:.1f} ms/batch{CB}x32tok -> "
          f"{CB*32/dt:,.0f} tok/s, {CB/dt:,.0f} img/s", file=sys.stderr)

    # ---- 6. end-to-end fine-tuning step (beyond-reference: the reference
    # can only freeze its encoders, train.py:47) --------------------------
    import dataclasses as _dc

    from mmd_tpu.models.frozen import FrozenEncoders
    from mmd_tpu.training.trainer import (init_finetune_state,
                                          make_finetune_raw_step)

    FB, FT = 16, 256
    ft_tcfg = _dc.replace(te.TEXT_ENCODER_XSMALL, vocab_size=30000,
                          max_position=FT, dropout=0.0)
    ft_vcfg = V.ViTConfig()
    ft_enc = FrozenEncoders(
        tokenizer=None, text_cfg=ft_tcfg,
        text_params=te.init_text_encoder(jax.random.key(7), ft_tcfg),
        vit_cfg=ft_vcfg, vit_params=V.init_vit(jax.random.key(8), ft_vcfg))
    ft_cfg = TrainConfig(
        model=ModelConfig(text_input_dim=ft_tcfg.hidden_size,
                          image_input_dim=ft_vcfg.hidden_size,
                          fused_attn=True, compute_dtype="bfloat16",
                          dropout=0.0),
        batch_size=FB,
        data=DataConfig(text_seq_len=FT, image_seq_len=64))
    ft_step = make_finetune_raw_step(ft_cfg, ft_enc)
    ft_state = init_finetune_state(ft_cfg, ft_enc, jax.random.key(9))
    rrf = np.random.default_rng(5)
    ft_batch = {
        "claim_ids": jnp.asarray(rrf.integers(1, 29000, (FB, FT)), jnp.int32),
        "claim_mask": jnp.ones((FB, FT), jnp.int32),
        "doc_ids": jnp.asarray(rrf.integers(1, 29000, (FB, FT)), jnp.int32),
        "doc_mask": jnp.ones((FB, FT), jnp.int32),
        "claim_image": jnp.asarray(rrf.integers(0, 255, (FB, 256, 256, 3)),
                                   jnp.uint8),
        "doc_image": jnp.asarray(rrf.integers(0, 255, (FB, 256, 256, 3)),
                                 jnp.uint8),
        "labels": jnp.asarray(np.stack([np.array([0, 1, 2, 1])] * FB),
                              jnp.int32),
    }

    def make_ft(k):
        @jax.jit
        def run(state, batch):
            st = jax.lax.fori_loop(
                0, k, lambda i, s: ft_step(s, batch)[0], state)
            return ft_step(st, batch)[1]["loss"]
        return run

    ffs, ffl = make_ft(2), make_ft(8)
    float(ffs(ft_state, ft_batch)); float(ffl(ft_state, ft_batch))
    dt = max((wall(ffl, ft_state, ft_batch) - wall(ffs, ft_state, ft_batch))
             / 6.0, 1e-9)
    results["finetune_train_samples_per_sec"] = FB / dt
    print(f"finetune step (BERT-class 12L + ViT, T={FT}, B={FB}): "
          f"{dt*1e3:.1f} ms -> {FB/dt:,.0f} samples/s", file=sys.stderr)

    # ---- write ------------------------------------------------------------
    # merge-preserve rows this run didn't measure (e.g. bench_raw.py's
    # raw_train_samples_per_sec)
    (REPO / "benchmarks").mkdir(exist_ok=True)
    rj = REPO / "benchmarks" / "results.json"
    prev = json.loads(rj.read_text()) if rj.exists() else {}
    out = {**prev, **{k: round(v, 1) for k, v in results.items()}}
    rj.write_text(json.dumps(out, indent=1))
    write_markdown(out)
    print(json.dumps(out))


def write_markdown(out: dict) -> None:
    """Regenerate BENCHMARKS.md from a results dict (see --write_only).

    EVERYTHING in BENCHMARKS.md must be emitted here — hand edits to the
    rendered file are clobbered by the next bench_suite/refresh run (that
    bug ate the round-5 decision rows once). Curated narrative (default
    decisions, host-floor analysis) therefore lives in this function,
    parameterized by ab_results.json / the timing JSONs."""
    ab_path = REPO / "benchmarks" / "ab_results.json"
    ab_entries = json.loads(ab_path.read_text()) if ab_path.exists() else {}
    ft_ab = ab_entries.get("finetune_remat_ab", {})
    if "plain_samples_per_s" in ft_ab:
        ft_row = (f"| fine-tuning step | {ft_ab['plain_samples_per_s']:,.0f} "
                  "samples/s | END-TO-END: encoders trained too (BERT-class "
                  "12L x2 + ViT x2 fwd+bwd+AdamW, T=256, batch 32; "
                  "finetune_remat_ab) — the reference can only freeze; remat "
                  f"variant {ft_ab['remat_samples_per_s']:,.0f} samples/s "
                  f"(+{ft_ab['remat_tax_pct']:.1f}% step time for "
                  "block-level activation memory) |")
    elif "finetune_train_samples_per_sec" in out:
        ft_row = (f"| fine-tuning step | "
                  f"{out['finetune_train_samples_per_sec']:,.0f} samples/s | "
                  "END-TO-END: encoders trained too (BERT-class 12L x2 + ViT "
                  "x2 fwd+bwd+AdamW, T=256, batch 16) — the reference can "
                  "only freeze |")
    else:
        ft_row = None
    lines = [
        "# Benchmarks (TPU v5e, 1 chip)",
        "",
        f"Measured by `benchmarks/bench_suite.py` on "
        f"{time.strftime('%Y-%m-%d')} with the in-jit delta-timing protocol "
        f"(benchmarks/timing.py; validated at 175 TFLOP/s on chained 8192^3 "
        "bf16 matmuls vs ~197 peak). bfloat16 compute. The reference "
        "publishes no numbers (BASELINE.md); these establish the targets it "
        "calls for.",
        "",
        "| Metric | Value | Notes |",
        "|---|---|---|",
        f"| fusion train step | {out['fusion_train_samples_per_sec']:,.0f} samples/s | fwd+bwd+AdamW, batch 256, text 512x384 / image 64x1024{_mfu(out, 'fusion_train_mfu_pct')} |",
    ] + ([
        f"| raw-path train step | {out['raw_train_samples_per_sec']:,.0f} samples/s | encoders IN the step: DeBERTa x2 + ViT x2 + fusion fwd+bwd+AdamW, batch {out.get('raw_train_batch', 64):.0f} (benchmarks/bench_raw.py) |",
    ] if "raw_train_samples_per_sec" in out else []) + ([
        f"| raw-path train step (Swinv2) | {out['raw_train_swin_samples_per_sec']:,.0f} samples/s | the reference's EXACT encoder pair in-step: DeBERTa x2 + Swinv2-base x2 + fusion fwd+bwd+AdamW, batch {out.get('raw_train_batch', 64):.0f} (bench_raw.py --swin) |",
    ] if "raw_train_swin_samples_per_sec" in out else []) + [
        f"| text embeddings | {out['text_embeddings_per_sec']:,.0f} seq/s | 12-layer 384-d BERT-class encoder, 512 tokens |",
        f"| DeBERTa embeddings | {out['deberta_embeddings_per_sec']:,.0f} seq/s | the reference's ACTUAL encoder (v3-xsmall, disentangled attention, fused Pallas kernel), 512 tokens{_mfu(out, 'deberta_mfu_pct')} |",
        f"| image embeddings | {out['image_embeddings_per_sec']:,.0f} img/s | ViT 12x1024, 256px, 64 tokens |",
    ] + ([
        f"| Swinv2 embeddings | {out['swin_embeddings_per_sec']:,.0f} img/s | the reference's ACTUAL image encoder (swinv2-base, cosine window attention, CPB), 256px -> 64x1024{_mfu(out, 'swin_mfu_pct')} |",
    ] if 'swin_embeddings_per_sec' in out else []) + [
    ] + ([ft_row] if ft_row else []) + [
        f"| im2im retrieval | {out['retrieval_im2im_qps']:,.0f} QPS | cosine top-10 over 41,256 x 2048 corpus (reference: O(N) host loop per query) |",
        f"| text2text retrieval | {out['retrieval_text2text_qps']:,.0f} QPS | cosine top-10 over 42,500 x 768 corpus |",
        f"| caption decode | {out['caption_tokens_per_sec']:,.0f} tok/s | KV-cached greedy, batch 32, 32 new tokens |",
        "",
    ]

    # Raw-path step attribution (VERDICT r4 #6): decompose the measured
    # step into its parts' individually measured rates. When the sum
    # matches the step, the path has no feeding/fusion overhead left and
    # the lever is whichever component dominates.
    if {"raw_train_samples_per_sec", "deberta_embeddings_per_sec",
            "image_embeddings_per_sec"} <= out.keys():
        rb = out.get("raw_train_batch", 64)
        step_ms = 1000.0 * rb / out["raw_train_samples_per_sec"]
        t_deb = 1000.0 * 2 * rb / out["deberta_embeddings_per_sec"]
        t_vit = 1000.0 * 2 * rb / out["image_embeddings_per_sec"]
        t_fus = 1000.0 * rb / out["fusion_train_samples_per_sec"]
        t_sum = t_deb + t_vit + t_fus
        lines += [
            "### Raw-path step attribution",
            "",
            f"The {step_ms:.1f} ms raw step (batch {rb:.0f}) decomposes "
            "into its parts at their independently measured rates: "
            f"DeBERTa fwd x2 {t_deb:.1f} ms ({100*t_deb/step_ms:.0f}%), "
            f"ViT fwd x2 {t_vit:.1f} ms, fusion fwd+bwd+AdamW "
            f"{t_fus:.1f} ms — sum {t_sum:.1f} ms vs {step_ms:.1f} "
            "measured, i.e. the step IS its encoders (no feeding or "
            "fusion overhead left to recover; re-measured post-"
            "fused_train flips at 733 samples/s, unchanged from 736 as "
            "expected — the flips change backwards only and these "
            "encoders are frozen here). The next structural lever is the "
            "dominant component: the DeBERTa forward — any MFU gain "
            "there (45.6% today) transfers ~1:1 to this step. The Swinv2 "
            "variant decomposes the same way"
            + (f": {1000.0 * rb / out['raw_train_swin_samples_per_sec']:.1f}"
               f" ms measured vs {t_deb + t_fus + 1000.0 * 2 * rb / out['swin_embeddings_per_sec']:.1f}"
               " ms from parts (DeBERTa + Swinv2 + fusion)"
               if {"raw_train_swin_samples_per_sec",
                   "swin_embeddings_per_sec"} <= out.keys() else "") +
            ". Same conclusion for the fine-tune step: 526 samples/s at "
            "batch 32 matches the encoders' fwd+bwd FLOP ratio (bwd ≈ 2x "
            "fwd), so it is encoder-compute-bound, not input- or "
            "optimizer-bound.",
            "",
        ]

    # Full-pipeline projection from the measured stage rates
    # (Factify-2: 35k train + 7.5k test rows, SURVEY §6)
    n_all = 42_500
    t_cap = 2 * n_all / out["caption_images_per_sec"]
    # text/image stages projected at the DeBERTa/Swinv2 rates — the
    # reference's ACTUAL encoders — not the faster substitutes
    t_et = 2 * n_all / out["deberta_embeddings_per_sec"]
    img_rate = out.get("swin_embeddings_per_sec",
                       out["image_embeddings_per_sec"])
    t_ei = 2 * n_all / img_rate
    t_corpus = (41_256 / img_rate
                + n_all / out["deberta_embeddings_per_sec"])
    t_train = 35_000 / out["fusion_train_samples_per_sec"]
    total_min = (t_cap + t_et + t_ei + t_corpus + t_train + 10) / 60
    lines += [
        "## Full-pipeline projection (Factify-2, from the measured rates)",
        "",
        "35,000 train + 7,500 test rows (SURVEY §6), single v5e chip:",
        "",
        "| Stage | Work | Time |",
        "|---|---|---|",
        f"| caption enrichment | 2 x 42.5k images | {t_cap:.0f} s |",
        f"| embed text (DeBERTa) | 2 x 42.5k seqs | {t_et:.0f} s |",
        f"| embed image (Swinv2) | 2 x 42.5k imgs | {t_ei:.0f} s |",
        f"| retrieval corpora | 41,256 imgs + 42.5k texts | {t_corpus:.0f} s |",
        f"| classifier train (1 epoch) | 35k samples | {t_train:.0f} s |",
        "| eval + retrieval experiments | 7.5k queries | <10 s |",
        "",
        f"End-to-end (1 train epoch): **~{total_min:.1f} min on ONE chip** vs "
        "the BASELINE.md target of <10 min on v5e-8 — inside target before "
        "any multi-chip scaling. (Host-side image decode can bound the "
        "embed/caption stages on slow disks; these are device rates with 16 "
        "decode workers.)",
        "",
    ]

    # MEASURED end-to-end run (pipelines/run_all.py --timings_json), when
    # one has been recorded — wall-clocks, not stage-rate arithmetic.
    pt = REPO / "benchmarks" / "pipeline_timings.json"
    staged_total = None
    if pt.exists():
        doc = json.loads(pt.read_text())
        st = doc["stages_sec"]
        total = staged_total = sum(
            v for k, v in st.items() if k != "synthesize")
        lines += [
            "## Measured end-to-end run "
            f"({doc.get('date', '?')}, `pipelines/run_all.py`)",
            "",
            f"{doc.get('n_train_rows', '?')} train / "
            f"{doc.get('n_test_rows', '?')} test rows embedded, "
            f"{doc.get('text_encoder', '?')} + {doc.get('image_encoder', '?')}"
            f" encoders, epochs={doc.get('args', {}).get('epochs', '?')}, "
            f"batch={doc.get('args', {}).get('batch_size', '?')} "
            "(source: benchmarks/pipeline_timings.json; regenerate with "
            "`python -m mmd_tpu.pipelines.run_all --synthetic 35000 "
            "--image_size 256 --reference_encoders --timings_json "
            "benchmarks/pipeline_timings.json`).",
            "",
            "| Stage | Measured wall-clock |",
            "|---|---|",
        ] + [
            f"| {k} | {v:,.1f} s |"
            for k, v in sorted(st.items(), key=lambda x: -x[1])
        ] + [
            f"| **total (excl. synthesize)** | **{total/60:,.1f} min** |",
            "",
        ]

    # MEASURED fused-driver run (run_all --fused), when recorded — the
    # round-5 device-centric pipeline: one ingest pass tokenizes (C++ SPM),
    # decodes, and banks both encoders' embeddings on device; every later
    # stage consumes the banks instead of re-encoding.
    ptf = REPO / "benchmarks" / "pipeline_timings_fused.json"
    if ptf.exists():
        doc = json.loads(ptf.read_text())
        st = doc["stages_sec"]
        total = sum(v for k, v in st.items() if k != "synthesize")
        a = doc.get("args", {})
        lines += [
            "## Measured end-to-end run, FUSED pipeline "
            f"({doc.get('date', '?')}, `run_all --fused`)",
            "",
            f"{doc.get('n_train_rows', '?')} train / "
            f"{doc.get('n_test_rows', '?')} test rows, "
            f"{doc.get('text_encoder', '?')} + {doc.get('image_encoder', '?')}"
            f", epochs={a.get('epochs', '?')}, train_batch="
            f"{a.get('train_batch', '?')}, steps_per_call="
            f"{a.get('steps_per_call', '?')}, chunk={a.get('chunk', '?')} "
            "(source: benchmarks/pipeline_timings_fused.json). Residual cost "
            "is the ingest stage's single-core image decode + tunnel H2D on "
            "this box, not the device.",
            "",
            "| Stage | Measured wall-clock |",
            "|---|---|",
        ] + [
            f"| {k} | {v:,.1f} s |"
            for k, v in sorted(st.items(), key=lambda x: -x[1])
            if k != "synthesize"
        ] + [
            f"| **total (excl. synthesize)** | **{total/60:,.1f} min** |",
            "",
        ]
        ingest = st.get("ingest", 0.0)
        if staged_total:
            lines += [
                f"**{staged_total/total:.1f}x end-to-end** vs the staged "
                "driver above. Every device-side stage runs at (or near) "
                "its kernel rate — train 42 → "
                f"{2*doc.get('n_train_rows', 0)/max(st.get('train',1),1):,.0f}"
                " samples/s, caption 51 → ~1,060 img/s, eval 11x. The "
                f"residual is ingest ({ingest:,.0f} s): single-core PIL "
                "decode + ~35 MB/s tunnel H2D of ~9.6 GB of u8 pixels on "
                "this box's ONE CPU core — a host floor, not the device "
                "(which absorbs the same stream in under a minute at the "
                "Swin rate). The chunked feeder is thread-safe; at the "
                "reference's 16 decode workers the projected total is "
                "**under 5 minutes**, inside the BASELINE.md <10-min "
                "target on ONE chip.",
                "",
            ]

    # Measured A/B decisions (each bench_*_ab.py records its outcome via
    # benchmarks/ab_log.record; this renders whatever has been measured)
    if ab_entries:
        entries = ab_entries

        def _cells(d):
            for k, v in d.items():
                if k in ("date", "protocol", "stats"):
                    continue
                if isinstance(v, dict):
                    inner = " ".join(f"{ik}={iv:g}" if isinstance(
                        iv, (int, float)) else f"{ik}={iv}"
                        for ik, iv in v.items())
                    yield f"{k}: {inner}"
                elif isinstance(v, (int, float)):
                    yield f"{k}={v:g}"
                else:
                    yield f"{k}={v}"

        lines += [
            "## Measured A/B results (benchmarks/ab_results.json)",
            "",
            "Recorded by the bench_*_ab.py scripts (same-process "
            "interleaved reps, medians — the house protocol). These "
            "justify each optimization flag's default.",
            "",
            "| A/B | Date | Result |",
            "|---|---|---|",
        ] + [
            f"| {name} | {e.get('date', '?')} | {'; '.join(_cells(e))} |"
            for name, e in sorted(entries.items())
        ] + [""]
        sw = entries.get("swin_fused_attn_ab", {})
        sw_gain = (100.0 * (sw["fused_img_per_s"] / sw["einsum_img_per_s"]
                            - 1.0)
                   if {"fused_img_per_s", "einsum_img_per_s"} <= sw.keys()
                   else None)
        lines += [
            "### Default decisions driven by the rows above (round 5)",
            "",
            "- **`TrainConfig.prefetch_depth` → 2 (FLIPPED ON)**: 2.47x "
            "measured wall-clock, numerics-neutral (losses bit-identical; "
            "`tests/test_remat.py::test_run_training_with_prefetch`).",
            "- **Retrieval `int8` → stays OPT-IN (DECLINED despite "
            "2.78x/1.98x)**: per-row int8 quantization perturbs similarity "
            "scores, so near-tie top-k ORDERING can differ from the "
            "reference's fp16 protocol (`text2text_retrieval.py:123-157`) — "
            "retrieved evidence feeding the demo/eval pipelines would "
            "silently change; and `int8=True` is exclusive with the "
            "sharded-corpus mesh path (a True default would make `mesh=` "
            "construction raise). Serving deployments that want the 2-3x "
            "take it with `--int8` / `TextCorpus(int8=True)`; parity paths "
            "keep exact bf16 scoring by default.",
            "- **`merged_paths` / `stacked_heads` → DELETED**: measured "
            "-8.2% / +0.3% (noise) in merged_paths_ab; the variants and "
            "their ~130 lines were removed from `models/fusion.py` round 5 "
            "(this table row is the surviving record).",
            "- **`SwinConfig.fused_train` → stays OFF (DECLINED on "
            "measurement)**: the hand-derived Pallas window-attention "
            "backward is TPU-validated (SWIN_BWD_TPU_VALIDATION.json) but "
            "the end-to-end fine-tune A/B measured **-4.8%** vs letting XLA "
            "differentiate the einsum path (swin_fused_train_ab) — the bwd "
            "kernel's extra VPU passes (log2-domain softmax bwd + per-batch "
            "CPB cotangent accumulation) cost more than the fused forward "
            "saves at fine-tune batch sizes. Serving keeps `fused_attn=True`"
            + (f" (+{sw_gain:.0f}% forward throughput, swin_fused_attn_ab)"
               if sw_gain is not None else "") +
            "; training keeps the einsum path. Contrast DeBERTa, where the "
            "same decision went the other way (+27%, fused_train default "
            "ON). NOTE: with fused_train=False the serving kernel is the "
            "non-differentiable in-VMEM-normalize variant "
            "(`swin_window_attention_infer`); the Trainer gates `fused_attn` "
            "off automatically when fine-tuning without `fused_train`.",
            "- **Swin fused_ln → ON (round 5)**: the profile attributed "
            "~2 ms/call to standalone f32-upcast LN passes + residual "
            "adds; ops/ln.py fuses stats+scale/bias+residual in one VMEM "
            "pass. Measured 1,550 → 1,621 img/s (swin_fused_attn_ab "
            "fused_ln arm); headline row re-measured 1,620 img/s, "
            "35.8% MFU.",
            "- **DeBERTa fused_ln → DECLINED and deleted (NEGATIVE, "
            "round 5)**: routing DeBERTa's ln1/ln2 (the pre-add "
            "LN(residual + sublayer) pattern) through a pre-add variant "
            "of the ops/ln.py kernel measured **+1.3%** serving time "
            "(deberta_fused_ln_ab) — XLA already superfuses that LN "
            "into the adjacent GEMM fusions, and a pallas_call boundary "
            "only breaks the superfusion. Swin wins because its "
            "post-add LNs + residual adds are standalone VPU passes. "
            "Wiring deleted per the measured-loser rule; do not retry "
            "for the BERT-class/MPNet post-LN stacks (same structure).",
            "- **Swin FFN superfusion: leave XLA alone (NEGATIVE, round "
            "5)**: the per-op trace shows XLA fuses dot→GELU→dot into "
            "one kOutput fusion running at 36 TF/s — far below the "
            "isolated GEMM rate (92+ TF/s), which looks like a bug but "
            "is not: splitting it with an optimization_barrier measured "
            "+1.6% step time, and removing GELU entirely (identity "
            "probe) changed nothing. The superfusion keeps the 4x-wide "
            "hidden tensor VMEM-resident; its HBM savings beat the "
            "naive GEMM rate. No Pallas MLP kernel for Swin either — "
            "same conclusion as the round-2 DeBERTa rate=0 A/B.",
            "- **serving_qps caveat**: steady_req_per_s is a TUNNEL floor "
            "(the 2.50 s logits D2H sync per 256-request wave is tunnel "
            "tax); attached_host_est_req_per_s is the steady-wave estimate "
            "excluding it (host 0.20 s + dispatch 0.21 s per wave). An "
            "earlier printed estimate of 15.1 was compile-poisoned (warmup "
            "compiles landed in dispatch_s) and is superseded.",
            "",
        ]

    # Multi-chip projection (hardware here is one chip; semantics verified
    # on the 8-device virtual mesh instead of measured)
    step_ms = 256_000.0 / out["fusion_train_samples_per_sec"]
    dp8 = out["fusion_train_samples_per_sec"] * 8 * (step_ms / (step_ms + 1))
    lines += [
        "## Multi-chip (v5e-8 projection)",
        "",
        "Hardware in this environment is one chip; the DP semantics are",
        "verified instead of measured: `tests/test_scaling.py` proves on the",
        "8-device virtual mesh that (a) grads of the sharded global batch",
        "equal single-device grads and (b) the 4-step weak-scaling parameter",
        "trajectory is locked (up to the zero-gradient Adam noise floor),",
        "and the driver's `dryrun_multichip` compiles + executes the full",
        "sharded train step, a ZeRO-1 step (moments physically 1/n per",
        "rank), a TP-sharded encoder forward, sharded retrieval top-k, and",
        "a raw encoder-in-step DP step on 8 virtual devices.",
        "",
        "The full sharded-training matrix is equality-tested in",
        "`tests/test_tp.py`: Megatron TP (params + AdamW moments over",
        "\"model\"; the fused Pallas kernels stay ON via jax.shard_map —",
        "each rank owns whole heads / MLP-hidden columns), ZeRO-1 (moments",
        "over \"data\"), TP+ZeRO-1 composed (moments over data AND model),",
        "and all of it on BOTH data paths (pre-embedded and raw",
        "encoder-in-step).",
        "",
        "Projection for v5e-8 (all stages embarrassingly data-parallel; the",
        "only collective in the train step is one grad all-reduce over ICI,",
        "~17 MB of fusion params at f32 — <1 ms on 186 GB/s ICI links, vs",
        f"the {step_ms:.0f} ms step):",
        "",
        "| Stage | 1 chip | v5e-8 (projected) |",
        "|---|---|---|",
        f"| fusion train step, global batch 2048 | "
        f"{out['fusion_train_samples_per_sec']:,.0f} samples/s | "
        f"~{dp8:,.0f} samples/s (1 ms all-reduce / {step_ms:.0f} ms step) |",
        "| embed / caption / retrieval stages | rates above | ~8x (pure DP "
        "sharding over rows, no cross-chip traffic) |",
        f"| full pipeline, 1 epoch | ~{total_min:.1f} min | "
        f"**~{total_min * 60 / 8 + 5:.0f} s** |",
    ]
    (REPO / "BENCHMARKS.md").write_text("\n".join(lines) + "\n")
    _update_baseline_status(out, total_min)


def _mfu(out: dict, key: str) -> str:
    return (f"; **{out[key]:.1f}% MFU** (analytic FLOPs / {PEAK_BF16/1e12:.0f}"
            " TFLOP/s bf16 peak)") if key in out else ""


_STATUS_BEGIN = "<!-- STATUS:BEGIN (generated by benchmarks/bench_suite.py) -->"
_STATUS_END = "<!-- STATUS:END -->"


def _pipeline_status_row(total_min: float) -> str:
    """Prefer the MEASURED fused-driver wall-clock over the projection."""
    ptf = REPO / "benchmarks" / "pipeline_timings_fused.json"
    if ptf.exists():
        doc = json.loads(ptf.read_text())
        meas = sum(v for k, v in doc["stages_sec"].items()
                   if k != "synthesize") / 60
        return (f"| full pipeline < 10 min | **MEASURED {meas:.1f} min** "
                f"({doc.get('n_train_rows', '?')}+"
                f"{doc.get('n_test_rows', '?')} rows, "
                f"{doc.get('args', {}).get('epochs', '?')} epochs, fused "
                "driver, one chip + ONE host core — device stages at kernel "
                "rate; residual is single-core image decode + tunnel H2D, "
                "<5 min projected at the reference's 16 decode workers) | "
                "BENCHMARKS.md fused-run table |")
    return (f"| full pipeline < 10 min | ~{total_min:.1f} min projected on "
            "ONE chip from measured stage rates | BENCHMARKS.md "
            "full-pipeline projection |")


def _update_baseline_status(out: dict, total_min: float) -> None:
    """Rewrite BASELINE.md's status-vs-targets block from the SAME run that
    produced BENCHMARKS.md (round-2 VERDICT weak #5: the two documents had
    drifted apart; every headline number now has exactly one source)."""
    path = REPO / "BASELINE.md"
    text = path.read_text()
    if _STATUS_BEGIN not in text or _STATUS_END not in text:
        print("BASELINE.md has no status markers; skipped", file=sys.stderr)
        return
    img = out.get("swin_embeddings_per_sec")
    img_cell = (f"image {img:,.0f} img/s (Swinv2, the reference's encoder)"
                if img else
                f"image {out['image_embeddings_per_sec']:,.0f} img/s (ViT)")
    block = "\n".join([
        _STATUS_BEGIN,
        f"## Status vs targets ({time.strftime('%Y-%m-%d')}, "
        "regenerated with BENCHMARKS.md from one bench_suite run)",
        "",
        "| Target | Achieved | Evidence |",
        "|---|---|---|",
        f"| embeddings/sec/chip | text "
        f"{out['text_embeddings_per_sec']:,.0f} (BERT-class) / "
        f"{out['deberta_embeddings_per_sec']:,.0f} (DeBERTa-v3, the "
        f"reference's encoder) seq/s; {img_cell} | BENCHMARKS.md |",
        f"| retrieval top-K QPS | {out['retrieval_im2im_qps']:,.0f} "
        f"(im2im 41k×2048) / {out['retrieval_text2text_qps']:,.0f} "
        "(text2text 42.5k×768) QPS on one chip; mesh-sharded variant "
        "equality-tested | BENCHMARKS.md; `ops/topk.py` |",
        _pipeline_status_row(total_min),
        "| retrieval top-K parity | protocol implemented + exercised; "
        "synthetic-convergence top-k recorded per k | QUALITY.md retrieval "
        "table |",
        "| classifier F1 parity | all heads trained to convergence on the "
        "synthetic protocol; per-path/factify/text-only F1 recorded | "
        "QUALITY.md |",
        _STATUS_END,
    ])
    head, rest = text.split(_STATUS_BEGIN, 1)
    _, tail = rest.split(_STATUS_END, 1)
    path.write_text(head + block + tail)


if __name__ == "__main__":
    main()
