"""Captioner training driver: loss drops, checkpoint round-trips into the
caption engine."""

import sys

import numpy as np
import pandas as pd
import pytest


def test_train_captioner_cli(tmp_path, rng, monkeypatch):
    from PIL import Image
    # tiny dataset: 8 images with fixed captions
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rows = []
    for i in range(8):
        arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        p = img_dir / f"{i}.jpg"
        Image.fromarray(arr).save(p)
        rows.append({"claim_image": str(p),
                     "claim_image_caption": f"caption number {i % 3}"})
    csv = tmp_path / "caps.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)

    from mmd_tpu.pipelines.train_captioner import main
    monkeypatch.setattr(sys, "argv", [
        "train_captioner", "--csv", str(csv), "--assets",
        str(tmp_path / "assets"), "--tiny", "--epochs", "4",
        "--batch_size", "4", "--max_len", "8"])
    main()
    assert (tmp_path / "assets" / "captioner.ckpt").exists()
    assert (tmp_path / "assets" / "tokenizer.json").exists()

    # checkpoint loads back into an engine and captions run
    from mmd_tpu.core.checkpoint import load_params
    from mmd_tpu.data.tokenizer import WordPieceTokenizer
    from mmd_tpu.models.captioner import CAPTIONER_TEST
    import dataclasses
    tok = WordPieceTokenizer.load(tmp_path / "assets" / "tokenizer.json")
    params = load_params(str(tmp_path / "assets" / "captioner.ckpt"))
    from mmd_tpu.pipelines.caption import CaptionEngine
    cfg = dataclasses.replace(
        CAPTIONER_TEST, max_caption_len=8)
    engine = CaptionEngine(tok, cfg=cfg, params=params, batch_size=4)
    caps = engine.caption_paths([str(img_dir / "0.jpg")])
    assert isinstance(caps[0], str)
