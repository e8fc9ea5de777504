"""Retrieval-corpora build pipeline + dataset stats over a synthetic tree."""

import json
import os

import numpy as np
import pytest

from mmd_tpu.data.synthetic import synthetic_factify_tree


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("rtree")
    synthetic_factify_tree(root, n_train=10, n_test=4, seed=11)
    os.environ["MMD_TPU_ROOT"] = str(root)
    from mmd_tpu.pipelines.preprocess import preprocess_csv
    preprocess_csv("train", root)
    preprocess_csv("test", root)
    yield root
    os.environ.pop("MMD_TPU_ROOT", None)


def test_build_text_and_image_corpora(tree):
    import pandas as pd
    from mmd_tpu.data.tokenizer import WordPieceTokenizer
    from mmd_tpu.pipelines.build_retrieval import (
        build_image_corpus, build_text_corpora,
    )
    df = pd.read_csv(tree / "data/preprocessed/train.csv")
    tok = WordPieceTokenizer.train(df["evidence"].astype(str), 300)
    corpora = build_text_corpora(["train", "test"], tok, tree, tiny=True,
                                 batch_size=4)
    assert len(corpora) == 2
    emb, ids = corpora[0].load()
    assert len(ids) == 10 and ids[0].startswith("train_")

    img_corpus = build_image_corpus(["train"], tree, tiny=True, batch_size=4)
    assert len(img_corpus) > 0
    # ids follow the flat evidence_corpus naming
    first = img_corpus._ids[0]
    assert "train_" in first and first.endswith("_evidence.jpg")


def test_dataset_stats(tree, capsys):
    from mmd_tpu.pipelines.dataset_stats import split_stats
    s = split_stats("train")
    assert s["rows"] == 10
    assert sum(s["categories"].values()) == 10
    assert 0 < s["claim_images_present"] <= 10


def test_parallel_package_exports():
    from mmd_tpu import parallel
    assert callable(parallel.make_mesh)
    assert callable(parallel.make_sharded_topk)
