"""ServingEngine: fixed-shape batched serving (inference/server.py).

Concurrent submits collate into padded fixed-size batches (one XLA
program in steady state), results demux to the right futures and match
the direct predictor outputs bit-for-bit.
"""

import threading

import pytest


@pytest.fixture(scope="module")
def tiny_predictor(tmp_path_factory):
    from mmd_tpu.core.config import ModelConfig
    from mmd_tpu.inference.predictor import MisinformationPredictor
    from mmd_tpu.models.frozen import load_or_init_frozen
    assets = tmp_path_factory.mktemp("assets_srv")
    enc = load_or_init_frozen(assets, vocab_texts=["claim evidence text"],
                              vocab_size=300, tiny=True)
    cfg = ModelConfig(text_input_dim=enc.text_cfg.hidden_size,
                      image_input_dim=enc.vit_cfg.hidden_size,
                      embed_dim=32, num_heads=4, hidden_dim=16,
                      compute_dtype="float32")
    return MisinformationPredictor(cfg, encoders=enc, batch_size=4)


def test_serving_engine_batches_and_matches_direct(tiny_predictor):
    from mmd_tpu.inference.server import ServingEngine

    n = 7                                     # not a multiple of max_batch
    claims = [f"claim number {i} about topic {i % 3}" for i in range(n)]
    evs = [f"evidence text {i} with details" for i in range(n)]

    direct = tiny_predictor.evaluate_batch(
        claims, [None] * n, evs, [None] * n, detailed=True)

    eng = ServingEngine(tiny_predictor, max_batch=4, max_wait_ms=50.0)
    try:
        futures = [eng.submit(claims[i], None, evs[i], None, detailed=True)
                   for i in range(n)]
        results = [f.result(timeout=120) for f in futures]
    finally:
        eng.close()

    for got, want in zip(results, direct):
        assert set(got) == set(want)
        for path in got:
            if want[path] is None:
                assert got[path] is None
            else:
                assert got[path]["label"] == want[path]["label"]
                assert got[path]["confidence"] == pytest.approx(
                    want[path]["confidence"], rel=1e-6)

    st = eng.stats()
    assert st["served"] == n
    assert st["batches"] == 2                 # 4 + 3(padded to 4)
    assert st["padded_rows"] == 1
    assert st["latency_p50_ms"] > 0


def test_serving_engine_concurrent_submitters(tiny_predictor):
    from mmd_tpu.inference.server import ServingEngine

    eng = ServingEngine(tiny_predictor, max_batch=4, max_wait_ms=20.0)
    results = {}
    lock = threading.Lock()

    def client(i):
        out = eng.evaluate(f"concurrent claim {i}", None,
                           f"concurrent evidence {i}", None)
        with lock:
            results[i] = out

    try:
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=240)
    finally:
        eng.close()

    assert len(results) == 8
    for out in results.values():
        assert out["text_text"] in ("support", "not_enough_information",
                                    "refute")
    # closed engine refuses new work
    with pytest.raises(RuntimeError, match="closed"):
        eng.submit("x", None, "y", None)
