"""Prompting-baseline evaluation CLI.

Runs the kumar_et_al zero-shot protocol (reference
src/baselines/kumar_et_al/eval_bloom.py: prompt -> generate -> keyword
parse -> 3-class P/R/F1) over a preprocessed CSV. The LLM is pluggable:

  --llm stub      deterministic keyword-echo stub (offline CI)
  --llm captioner ILLUSTRATIVE ONLY: scores prompts with this framework's
                  decoder-LM (untrained weights => chance-level results)
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


def make_llm(spec: str):
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
    p.add_argument("--results_json", default="prompting_results.json")
    args = p.parse_args()

    df = pd.read_csv(args.csv).head(args.limit)
    pairs = list(zip(df["claim"].astype(str), df["evidence"].astype(str)))
    cat_idx = np.array([lb.CATEGORY_TO_IDX.get(c, 2) for c in df["category"]])
    y_true = lb.SIMPLIFIED_TABLE[cat_idx].tolist()

    llm = make_llm(args.llm)
    out = P.evaluate_zero_shot(llm, pairs, y_true)
    report = {k: v for k, v in out.items() if k != "predictions"}
    print(json.dumps(report, indent=1))
    with open(args.results_json, "w") as f:
        json.dump({"llm": args.llm, "n": len(pairs), **report}, f, indent=1)


if __name__ == "__main__":
    main()
