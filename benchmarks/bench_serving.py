"""End-to-end serving throughput through ServingEngine on TPU.

Measures requests/s for text-only pairs (tokenize -> encoder forwards ->
fusion -> host demux) through the fixed-shape batching engine
(inference/server.py), with concurrent submitters so batches actually
fill. This is the full production path including host work and D2H.

CAVEAT (tunneled TPU): on this environment one device->host transfer
degrades every later dispatch to ~300 ms (CLAUDE.md), and serving
inherently pulls results to host per batch — so the number recorded here
is a TUNNEL-dominated lower bound; on directly-attached hardware the
same path is device-bound. Record it as such.

Run on the TPU chip:  python benchmarks/bench_serving.py
"""

from __future__ import annotations

import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--tiny", action="store_true",
                   help="tiny encoders on CPU (wiring smoke, not a number)")
    args = p.parse_args()
    if args.tiny:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from mmd_tpu.core.mesh import require_tpu
    require_tpu()

    import tempfile

    from mmd_tpu.core.config import ModelConfig
    from mmd_tpu.inference.predictor import MisinformationPredictor
    from mmd_tpu.inference.server import ServingEngine
    from mmd_tpu.models.frozen import load_or_init_frozen

    corpus = [f"claim about topic {i} with supporting details" * 8
              for i in range(64)]
    with tempfile.TemporaryDirectory() as assets:
        enc = load_or_init_frozen(assets, vocab_texts=corpus,
                                  vocab_size=4000, tiny=args.tiny)
        cfg = ModelConfig(text_input_dim=enc.text_cfg.hidden_size,
                          image_input_dim=enc.vit_cfg.hidden_size)
        B = 16
        pred = MisinformationPredictor(cfg, encoders=enc, batch_size=B)
        eng = ServingEngine(pred, max_batch=B, max_wait_ms=10.0)

        def run_wave(n, tag):
            t0 = time.perf_counter()
            futs = []
            lock = threading.Lock()

            def client(k):
                f = eng.submit(corpus[k % len(corpus)], None,
                               corpus[(k * 7 + 3) % len(corpus)], None)
                with lock:
                    futs.append(f)

            threads = [threading.Thread(target=client, args=(k,))
                       for k in range(n)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            for f in list(futs):
                f.result(timeout=600)
            dt = time.perf_counter() - t0
            print(f"{tag}: {n} requests in {dt:.2f} s "
                  f"-> {n/dt:,.1f} req/s | stats={eng.stats()}")
            return n / dt

        run_wave(B * 2, "warmup (compiles)")
        warm = eng.stats()                 # snapshot to exclude compile time
        wst = warm.get("stages_s", {})
        qps = run_wave(256, "steady")
        stats = eng.stats()
        st = stats.get("stages_s", {})
        # steady-wave deltas only — the warmup wave's remote compiles land
        # in dispatch_s and would otherwise poison the estimate
        host_s = (st.get("tokenize_s", 0.0) - wst.get("tokenize_s", 0.0)
                  + st.get("decode_s", 0.0) - wst.get("decode_s", 0.0))
        disp_s = st.get("dispatch_s", 0.0) - wst.get("dispatch_s", 0.0)
        sync_s = st.get("d2h_s", 0.0) - wst.get("d2h_s", 0.0)
        served = stats.get("served", 1) - warm.get("served", 0)
        # attached-host estimate: the logits-sync pull is the tunnel tax
        # (on PCIe it is ~free); host prep + dispatch remain
        est = served / max(host_s + disp_s, 1e-9)
        print(f"steady-wave stage breakdown over {served} served: host "
              f"{host_s:.2f}s, dispatch {disp_s:.2f}s, "
              f"logits d2h sync {sync_s:.2f}s, queue wait mean "
              f"{stats.get('queue_wait_mean_ms', 0):.1f} ms")
        print(f"attached-host estimate (excl. d2h sync): {est:,.1f} req/s")
        print(f'{{"metric": "serving_requests_per_sec", "value": '
              f'{qps:.1f}, "unit": "req/s (tunnel lower bound)"}}')
        if not args.tiny:
            sys.path.insert(0, str(Path(__file__).resolve().parent))
            from ab_log import record
            record("serving_qps", {
                "steady_req_per_s": round(qps, 1),
                "attached_host_est_req_per_s": round(est, 1),
                "stats": stats,
                "protocol": "256 requests, concurrent submitters; embeddings "
                            "now stay on device (round-5 fix) so only "
                            "logits sync per batch; steady_req_per_s is "
                            "still a tunnel lower bound, the estimate "
                            "excludes the per-batch logits-sync tax"})
        eng.close()


if __name__ == "__main__":
    main()
