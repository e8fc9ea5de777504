"""Persist A/B benchmark outcomes to benchmarks/ab_results.json.

Every bench_*_ab.py / bench_serving.py run ends with
``record("tp_ab", {...})`` so its measured numbers survive the /tmp
session logs and BENCHMARKS.md can render them (bench_suite._write_md).
Entries merge by name: a re-run overwrites its own row, never others.
"""
from __future__ import annotations

import json
import time
from pathlib import Path

AB_PATH = Path(__file__).resolve().parent / "ab_results.json"


def record(name: str, payload: dict) -> None:
    doc = {}
    if AB_PATH.exists():
        try:
            doc = json.loads(AB_PATH.read_text())
        except (json.JSONDecodeError, OSError):
            doc = {}
    payload = dict(payload)
    payload["date"] = time.strftime("%Y-%m-%d")
    doc[name] = payload
    AB_PATH.write_text(json.dumps(doc, indent=1, sort_keys=True) + "\n")
