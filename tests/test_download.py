"""Data acquisition with an injected offline fetcher: stats, idempotence,
zip extract/rename, corpus dir builder."""

import io
import json
import zipfile
from pathlib import Path

import numpy as np
import pytest

from mmd_tpu.data import download as dl
from mmd_tpu.data.schema import HEADERS


def make_jpeg_bytes(seed=0):
    from PIL import Image
    rng = np.random.default_rng(seed)
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
                    ).save(buf, format="JPEG")
    return buf.getvalue()


@pytest.fixture
def raw_tree(tmp_path):
    ext = tmp_path / "data" / "raw" / "factify" / "extracted"
    ext.mkdir(parents=True)
    rows = [
        ["1", "c1", "http://x/1c.jpg", "e1", "http://x/1e.jpg", "Refute", "[]", "[]"],
        ["2", "c2", "http://x/2c.jpg", "e2", "http://bad/2e.jpg", "Support_Text", "[]", "[]"],
        ["3", "c3", "", "e3", "http://x/3e.jpg", "Support_Text", "[]", "[]"],
    ]
    with open(ext / "train.csv", "w") as f:
        f.write("\t".join(HEADERS) + "\n")
        for r in rows:
            f.write("\t".join(r) + "\n")
    return tmp_path


def fake_fetch(url):
    if "bad" in url:
        raise IOError("404")
    return make_jpeg_bytes(hash(url) % 100)


@pytest.mark.parametrize("threading", [False, True])
def test_download_images_stats_and_files(raw_tree, threading):
    stats = dl.download_images("train", use_threading=threading,
                               root=raw_tree, fetch=fake_fetch)
    img_dir = raw_tree / "data/raw/factify/extracted/images/train"
    assert (img_dir / "1_claim.jpg").exists()
    assert (img_dir / "1_evidence.jpg").exists()
    assert not (img_dir / "2_evidence.jpg").exists()   # failed fetch
    assert not (img_dir / "3_claim.jpg").exists()      # empty url
    assert stats["successful_claim"] == 2
    assert stats["successful_evidence"] == 2
    cats = stats["categories"]
    assert cats["Refute"]["successful_claim"] == 1
    assert cats["Support_Text"]["total_claim"] == 2
    assert cats["Support_Text"]["successful_evidence"] == 1
    saved = json.loads((raw_tree / "data/raw/factify/extracted/"
                        "train_image_download_stats.json").read_text())
    assert saved["successful_claim"] == 2


def test_download_image_idempotent(tmp_path):
    calls = []
    def fetch(url):
        calls.append(url)
        return make_jpeg_bytes()
    p = tmp_path / "img.jpg"
    assert dl.download_image("http://x/a.jpg", p, fetch)
    assert dl.download_image("http://x/a.jpg", p, fetch)  # skip, no refetch
    assert len(calls) == 1


def test_extract_factify_zip_renames(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    zip_path = raw / "factify2.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        zf.writestr("factify2/train.csv", "id\tclaim\n")
        zf.writestr("factify2/val.csv", "id\tclaim\n")
    out = dl.extract_factify_zip(zip_path, raw)
    assert (out / "train.csv").exists()
    assert (out / "test.csv").exists()        # val.csv renamed
    assert not (out / "val.csv").exists()
    # idempotent second call
    out2 = dl.extract_factify_zip(zip_path, raw)
    assert out2 == out


def test_check_disk_space(tmp_path):
    assert dl.check_disk_space(tmp_path, required_gb=0.001)
    assert not dl.check_disk_space(tmp_path, required_gb=10 ** 9)


def test_evidence_corpus_dir_builder(raw_tree):
    dl.download_images("train", use_threading=False, root=raw_tree,
                       fetch=fake_fetch)
    from mmd_tpu.retrieval.corpus_utils import build_evidence_corpus_dir
    corpus = build_evidence_corpus_dir(["train"], root=raw_tree)
    names = sorted(p.name for p in corpus.glob("*.jpg"))
    assert names == ["train_1_evidence.jpg", "train_3_evidence.jpg"]


def test_rewrite_corpus_ids(tmp_path):
    from mmd_tpu.retrieval.corpus_utils import rewrite_corpus_ids
    d = tmp_path / "store"
    d.mkdir()
    (d / "ids.json").write_text(json.dumps(["/old/a.jpg", "/other/b.jpg"]))
    n = rewrite_corpus_ids(d, "/old/", "/new/")
    assert n == 1
    assert json.loads((d / "ids.json").read_text()) == ["/new/a.jpg", "/other/b.jpg"]
