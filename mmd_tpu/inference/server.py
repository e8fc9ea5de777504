"""Production serving engine: fixed-shape request batching.

The reference serves one pair per request (streamlit demo,
reference app.py:374-525 -> evaluate.py:94-196) — every request pays a
whole forward, and a torch backend tolerates the resulting shape churn.
On TPU the discipline is FIXED SHAPES: one compiled XLA program, reused
for every dispatch. This engine accepts concurrent requests from any
thread, collates up to `max_batch` of them (waiting at most
`max_wait_ms` for stragglers once the first request of a batch arrives),
PADS the tail with blank rows so the fusion forward always runs at the
same batch shape (zero recompiles in steady state), and demuxes the
per-row results back to per-request futures.

Latency/throughput accounting rides along (`stats()`): served count,
batches, mean batch fill, p50/p95 request latency.
"""

from __future__ import annotations

import threading
import time
from collections import deque
from concurrent.futures import Future
from dataclasses import dataclass
from typing import Optional


@dataclass
class _Request:
    claim_text: str
    claim_image: Optional[str]
    evidence_text: str
    evidence_image: Optional[str]
    detailed: bool
    future: Future
    t_submit: float


class ServingEngine:
    """Batched, fixed-shape serving on top of MisinformationPredictor."""

    def __init__(self, predictor, max_batch: Optional[int] = None,
                 max_wait_ms: float = 5.0):
        self.predictor = predictor
        self.max_batch = int(max_batch or predictor.batch_size)
        self.max_wait = max_wait_ms / 1e3
        self._q: deque[_Request] = deque()
        self._cond = threading.Condition()
        self._closed = False
        self._lat: list[float] = []
        self._served = 0
        self._batches = 0
        self._rows = 0
        self._timings: dict = {}   # per-stage seconds from evaluate_batch
        self._wait_s = 0.0         # queue wait (submit -> dispatch start)
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="mmd-serving")
        self._thread.start()

    # -- client surface ----------------------------------------------------

    def submit(self, claim_text: str, claim_image: Optional[str],
               evidence_text: str, evidence_image: Optional[str],
               detailed: bool = False) -> Future:
        """Enqueue one pair; the Future resolves to the same structure
        MisinformationPredictor.evaluate returns."""
        f: Future = Future()
        req = _Request(str(claim_text), claim_image, str(evidence_text),
                       evidence_image, detailed, f, time.monotonic())
        with self._cond:
            if self._closed:
                raise RuntimeError("ServingEngine is closed")
            self._q.append(req)
            self._cond.notify()
        return f

    def evaluate(self, claim_text, claim_image, evidence_text,
                 evidence_image, detailed: bool = False):
        """Blocking convenience wrapper (single caller still gets batching
        benefits when other threads are submitting concurrently)."""
        return self.submit(claim_text, claim_image, evidence_text,
                           evidence_image, detailed).result()

    def stats(self) -> dict:
        with self._cond:
            lat = sorted(self._lat)
            out = {
                "served": self._served,
                "batches": self._batches,
                "mean_batch_fill": (self._served / self._batches
                                    if self._batches else 0.0),
                "padded_rows": self._rows - self._served,
            }
            if lat:
                out["latency_p50_ms"] = 1e3 * lat[len(lat) // 2]
                out["latency_p95_ms"] = 1e3 * lat[int(len(lat) * 0.95)
                                                  if len(lat) > 1 else -1]
            if self._served:
                out["queue_wait_mean_ms"] = 1e3 * self._wait_s / self._served
            # per-stage seconds across all batches (predictor-attributed:
            # host tokenize/decode, async device dispatch, logits D2H sync)
            out["stages_s"] = {k: round(v, 3)
                               for k, v in self._timings.items()}
            return out

    def close(self):
        with self._cond:
            self._closed = True
            self._cond.notify_all()
        self._thread.join(timeout=30)

    # -- dispatcher ----------------------------------------------------------

    def _take_batch(self) -> Optional[list[_Request]]:
        with self._cond:
            while not self._q and not self._closed:
                self._cond.wait()
            if not self._q:
                return None                        # closed and drained
            deadline = time.monotonic() + self.max_wait
            while (len(self._q) < self.max_batch and not self._closed):
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                self._cond.wait(timeout=left)
            n = min(len(self._q), self.max_batch)
            return [self._q.popleft() for _ in range(n)]

    def _loop(self):
        while True:
            batch = self._take_batch()
            if batch is None:
                return
            n = len(batch)
            pad = self.max_batch - n               # fixed-shape dispatch
            ct = [r.claim_text for r in batch] + [""] * pad
            ci = [r.claim_image for r in batch] + [None] * pad
            et = [r.evidence_text for r in batch] + [""] * pad
            ei = [r.evidence_image for r in batch] + [None] * pad
            t_start = time.monotonic()
            with self._cond:
                self._wait_s += sum(t_start - r.t_submit for r in batch)
            try:
                results = self.predictor.evaluate_batch(
                    ct, ci, et, ei, detailed=True, timings=self._timings)
            except Exception as e:                 # pragma: no cover
                for r in batch:
                    r.future.set_exception(e)
                continue
            t_done = time.monotonic()
            with self._cond:
                self._batches += 1
                self._rows += self.max_batch
                self._served += n
                for r in batch:
                    self._lat.append(t_done - r.t_submit)
            for r, res in zip(batch, results[:n]):
                if r.detailed:
                    r.future.set_result(res)
                else:
                    r.future.set_result(
                        {p: (d["label"] if d else None)
                         for p, d in res.items()})
