"""Prompting-baseline evaluation CLI.

Runs the kumar_et_al zero-shot protocol (reference
src/baselines/kumar_et_al/eval_bloom.py: prompt -> generate -> keyword
parse -> 3-class P/R/F1) over a preprocessed CSV. The LLM is pluggable:

  --llm stub      deterministic keyword-echo stub (offline CI)
  --llm captioner the IN-TREE decoder LM: the captioner's decoder run
                  text-only (models/captioner.lm_generate), loading
                  <assets>/captioner.ckpt from pipelines/train_captioner.py
                  when present (seeded init otherwise). Caption-trained
                  weights => honest chance-level fact-check numbers.
  --llm hf:<id>   a HF causal LM when weights/network exist

Usage: python -m mmd_tpu.baselines.eval_prompting \
    --csv data/preprocessed/test.csv [--limit 100] [--llm stub]
"""

from __future__ import annotations

import argparse
import json

import numpy as np
import pandas as pd

from mmd_tpu.baselines import prompting as P
from mmd_tpu.data import labels as lb


def load_captioner_assets(assets: str):
    """(tokenizer, cfg, params); see models/captioner.load_captioner_assets."""
    from mmd_tpu.models.captioner import load_captioner_assets as _load
    return _load(assets)


def make_captioner_llm(assets: str):
    """Zero-shot LLM over the IN-TREE decoder LM (the captioner's decoder
    run text-only via models/captioner.lm_generate). With a checkpoint from
    pipelines/train_captioner.py this is the honest offline stand-in for the
    reference's BLOOM (src/baselines/kumar_et_al/eval_bloom.py:31-43): a
    real (if weak, caption-trained) LM scoring real prompts — expect
    chance-level fact-check accuracy, recorded as such in QUALITY.md."""
    import jax
    import numpy as np

    from mmd_tpu.models.captioner import lm_generate

    tok, cfg, params = load_captioner_assets(assets)
    t_new = max(min(8, cfg.decoder.max_position // 2), 1)
    plen = cfg.decoder.max_position - t_new

    @jax.jit
    def _gen(params, ids, mask):
        return lm_generate(params, cfg, ids, mask, eos_id=tok.sep_id,
                           pad_id=tok.pad_id, max_new_tokens=t_new)

    def llm(prompt: str) -> str:
        ids, _ = tok.encode(prompt, max_length=512)
        ids = ids[-plen:]   # keep the tail: instruction + answer slot
        off = plen - len(ids)
        row = np.full((1, plen), tok.pad_id, np.int32)   # LEFT padded
        mask = np.zeros((1, plen), np.int32)
        row[0, off:] = ids
        mask[0, off:] = 1
        out = np.asarray(_gen(params, row, mask))[0]
        return tok.decode(out)

    return llm


def make_lvlm_scorer(assets: str):
    """`score(prompt, image_path=None) -> P(yes)` over the in-tree LVLM (the
    captioner: image encoder + cross-attending decoder). Softmaxes only the
    yes/no entries of the first generated token's logits — the LVLM4FV
    verification primitive (reference LVLM4FV/models.py:60-73) — so
    two_level_verify and llm_rerank (prompting.py) run on real in-tree
    weights, with or without the image modality."""
    import jax
    import numpy as np

    from mmd_tpu.baselines.prompting import yes_no_probability
    from mmd_tpu.models.captioner import first_token_logits

    tok, cfg, params = load_captioner_assets(assets)
    plen = cfg.decoder.max_position

    def _first_piece(word: str) -> int:
        ids, _ = tok.encode(word)
        return int(ids[1])   # [CLS] piece ... [SEP]

    yes_id, no_id = _first_piece("yes"), _first_piece("no")

    @jax.jit
    def _logits_text(params, ids, mask):
        return first_token_logits(params, cfg, ids, mask)

    @jax.jit
    def _logits_image(params, ids, mask, u8):
        import dataclasses

        import jax.numpy as jnp

        from mmd_tpu.ops.image_ops import TRAIN_TRANSFORM, normalize_on_device
        tr = (TRAIN_TRANSFORM if cfg.vit.image_size == 256 else
              dataclasses.replace(TRAIN_TRANSFORM, size=cfg.vit.image_size))
        x = normalize_on_device(u8, tr, jnp.dtype(cfg.vit.compute_dtype))
        return first_token_logits(params, cfg, ids, mask, images=x)

    def score(prompt: str, image_path: str | None = None) -> float:
        ids, _ = tok.encode(prompt, max_length=512)
        ids = ids[-plen:]
        off = plen - len(ids)
        row = np.full((1, plen), tok.pad_id, np.int32)   # LEFT padded
        mask = np.zeros((1, plen), np.int32)
        row[0, off:] = ids
        mask[0, off:] = 1
        if image_path is not None:
            import dataclasses

            from mmd_tpu.ops.image_ops import (
                TRAIN_TRANSFORM, load_images_parallel,
            )
            tr = (TRAIN_TRANSFORM if cfg.vit.image_size == 256 else
                  dataclasses.replace(TRAIN_TRANSFORM,
                                      size=cfg.vit.image_size))
            imgs, _ok = load_images_parallel([image_path], tr, 1)
            logits = np.asarray(_logits_image(params, row, mask, imgs))[0]
        else:
            logits = np.asarray(_logits_text(params, row, mask))[0]
        return yes_no_probability({"yes": logits[yes_id],
                                   "no": logits[no_id]})

    return score


def make_llm(spec: str, assets: str = "assets/encoders"):
    if spec == "captioner":
        return make_captioner_llm(assets)
    if spec == "stub":
        def stub(prompt: str) -> str:
            # decisive keywords leak from the evidence into the answer —
            # a protocol smoke, not a model
            t = prompt.lower()
            if "refute" in t or "false" in t:
                return "refute"
            if "support" in t or "true" in t:
                return "support"
            return "not enough information"
        return stub
    if spec.startswith("hf:"):
        from transformers import AutoModelForCausalLM, AutoTokenizer
        import torch
        name = spec[3:]
        tok = AutoTokenizer.from_pretrained(name)
        model = AutoModelForCausalLM.from_pretrained(name)
        model.eval()

        def hf_llm(prompt: str) -> str:
            with torch.no_grad():
                ids = tok(prompt, return_tensors="pt",
                          truncation=True, max_length=1024)
                out = model.generate(**ids, max_new_tokens=64,
                                     do_sample=False)
            return tok.decode(out[0][ids["input_ids"].shape[1]:],
                              skip_special_tokens=True)
        return hf_llm
    raise SystemExit(f"unknown --llm {spec}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--csv", required=True)
    p.add_argument("--llm", default="stub")
    p.add_argument("--limit", type=int, default=200)
    p.add_argument("--assets", default="assets/encoders",
                   help="captioner assets dir for --llm captioner")
    p.add_argument("--results_json", default="prompting_results.json")
    args = p.parse_args()

    df = pd.read_csv(args.csv).head(args.limit)
    pairs = list(zip(df["claim"].astype(str), df["evidence"].astype(str)))
    cat_idx = np.array([lb.CATEGORY_TO_IDX.get(c, 2) for c in df["category"]])
    y_true = lb.SIMPLIFIED_TABLE[cat_idx].tolist()

    llm = make_llm(args.llm, assets=args.assets)
    out = P.evaluate_zero_shot(llm, pairs, y_true)
    report = {k: v for k, v in out.items() if k != "predictions"}
    print(json.dumps(report, indent=1))
    with open(args.results_json, "w") as f:
        json.dump({"llm": args.llm, "n": len(pairs), **report}, f, indent=1)


if __name__ == "__main__":
    main()
