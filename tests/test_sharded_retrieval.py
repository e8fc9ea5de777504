"""Mesh-sharded ImageCorpus serving matches single-device results."""

import numpy as np
import pytest

from mmd_tpu.models.resnet import RESNET_TEST


@pytest.fixture(scope="module")
def corpus_dirs(tmp_path_factory):
    from PIL import Image
    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("imgs")
    yy, xx = np.mgrid[0:64, 0:64] / 64.0
    for i in range(10):   # 10 images; pads to 16 over 8 devices
        fx, fy = rng.uniform(1, 4, 2)
        chans = [np.sin(2 * np.pi * (fx * xx + fy * yy) + p)
                 for p in rng.uniform(0, 6.28, 3)]
        arr = ((np.stack(chans, -1) * 0.5 + 0.5) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"{i}_evidence.jpg")
    return d, tmp_path_factory.mktemp("store")


def test_sharded_matches_single(corpus_dirs, mesh8):
    from mmd_tpu.retrieval.image import ImageCorpus
    img_dir, store_root = corpus_dirs
    paths = sorted(str(p) for p in img_dir.glob("*.jpg"))

    single = ImageCorpus(store_root / "c", cfg=RESNET_TEST)
    single.create_feature_corpus(paths, batch_size=4)
    sharded = ImageCorpus(store_root / "c", cfg=RESNET_TEST, mesh=mesh8)

    q = single.extract_features(paths[3])[None]
    r_single = single.retrieve_by_features(q, top_k=4)[0]
    r_sharded = sharded.retrieve_by_features(q, top_k=4)[0]
    assert [p for p, _ in r_single] == [p for p, _ in r_sharded]
    for (_, a), (_, b) in zip(r_single, r_sharded):
        assert abs(a - b) < 1e-2
