"""Where do Swinv2's device cycles go? (VERDICT r4 #4: 26.6% MFU vs
DeBERTa's 45.6% — find the dominant pass before touching the kernel.)

Traces jitted swin_forward calls (SWIN_BASE_256, fused window kernel ON
unless --einsum) through jax.profiler (device plane works through the
tunnel — round-2 finding) and aggregates device-plane op durations by
HLO op family. Writes benchmarks/PROFILE_SWIN.json.

    python benchmarks/profile_swin.py [--batch 32] [--einsum]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import re
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def parse_device_ops(trace_dir: str) -> dict:
    """Aggregate device-plane op durations (us) by name family from the
    newest *.trace.json.gz under trace_dir."""
    paths = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz",
                             recursive=True))
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    doc = json.loads(gzip.open(paths[-1], "rt").read())
    events = doc.get("traceEvents", [])
    # device planes: pid whose process_name mentions TPU/device
    dev_pids = set()
    for e in events:
        if (e.get("ph") == "M" and e.get("name") == "process_name"
                and re.search(r"TPU|/device:|XLA Op",
                              str(e.get("args", {}).get("name", "")),
                              re.I)):
            dev_pids.add(e["pid"])
    fam = collections.Counter()
    total = 0.0
    n_events = 0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        dur = float(e.get("dur", 0.0))
        name = str(e.get("name", "?"))
        if name.startswith(("run_", "Infeed", "Outfeed")):
            continue
        total += dur
        n_events += 1
        fam[re.sub(r"[.\d]+$", "", name)] += dur
    return {"total_us": total, "n_events": n_events,
            "by_family_us": dict(fam.most_common(25))}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--einsum", action="store_true",
                   help="profile the jnp window-attention path instead")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--out", default=str(REPO / "benchmarks" /
                                        "PROFILE_SWIN.json"))
    args = p.parse_args()

    from mmd_tpu.core.mesh import require_tpu
    require_tpu()
    import dataclasses

    import jax
    import jax.numpy as jnp

    from mmd_tpu.models import swin as S

    cfg = dataclasses.replace(S.SWIN_BASE_256,
                              fused_attn=not args.einsum)
    params = S.init_swin(jax.random.key(0), cfg)
    imgs = jnp.asarray(np.random.default_rng(0).standard_normal(
        (args.batch, cfg.image_size, cfg.image_size, 3)), jnp.bfloat16)

    fwd = jax.jit(lambda p, x: S.swin_forward(p, cfg, x))
    out = fwd(params, imgs)
    _ = float(jnp.sum(out[0, 0, :4]))          # force compile + first run

    tmp = tempfile.mkdtemp(prefix="swin_trace_")
    with jax.profiler.trace(tmp):
        for _ in range(args.reps):
            out = fwd(params, imgs)
        _ = float(jnp.sum(out[0, 0, :4]))      # real completion fence
    ops = parse_device_ops(tmp)

    per_call_ms = ops["total_us"] / args.reps / 1e3
    img_per_s = args.batch / (per_call_ms / 1e3)
    report = {
        "batch": args.batch,
        "path": "einsum" if args.einsum else "fused",
        "reps": args.reps,
        "device_ms_per_call": round(per_call_ms, 3),
        "img_per_s_device": round(img_per_s, 1),
        "by_family_ms_per_call": {
            k: round(v / args.reps / 1e3, 3)
            for k, v in ops["by_family_us"].items()},
        "n_events": ops["n_events"],
        "trace_dir": tmp,
    }
    Path(args.out).write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
