"""Where do DeBERTa-v3-xsmall's device cycles go? (round-5: the raw-path
step attribution names the DeBERTa forward — 45.7% MFU — as the next
structural lever; profile before touching the kernel.)

Traces jitted deberta_encode calls (DEBERTA_V3_XSMALL, bf16 serving
config, fused Pallas kernel ON unless --jnp) through jax.profiler
(device plane works through the tunnel — round-2 finding) and aggregates
device-plane op durations by HLO op family. Writes
benchmarks/PROFILE_DEBERTA.json.

    python benchmarks/profile_deberta.py [--batch 64] [--jnp]

Reference context: this encoder re-derives the frozen text tower the
reference loads at src/model/train.py:47.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from benchmarks.profile_swin import parse_device_ops  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--jnp", action="store_true",
                   help="profile the one-hot jnp path instead")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--out", default=str(REPO / "benchmarks" /
                                        "PROFILE_DEBERTA.json"))
    args = p.parse_args()

    from mmd_tpu.core.mesh import require_tpu
    require_tpu()

    import jax
    import jax.numpy as jnp

    from mmd_tpu.models import deberta as D

    cfg = dataclasses.replace(D.DEBERTA_V3_XSMALL,
                              compute_dtype="bfloat16",
                              fused_attn=not args.jnp)
    params = D.init_deberta(jax.random.key(2), cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (args.batch, 512)),
                      jnp.int32)
    mask = jnp.ones((args.batch, 512), jnp.int32)

    fwd = jax.jit(lambda p, i, m: D.deberta_encode(p, cfg, i, m))
    out = fwd(params, ids, mask)
    _ = float(jnp.sum(out[0, 0, :4]))          # force compile + first run

    tmp = tempfile.mkdtemp(prefix="deberta_trace_")
    with jax.profiler.trace(tmp):
        for _ in range(args.reps):
            out = fwd(params, ids, mask)
        _ = float(jnp.sum(out[0, 0, :4]))      # real completion fence
    ops = parse_device_ops(tmp)

    per_call_ms = ops["total_us"] / args.reps / 1e3
    seq_per_s = args.batch / (per_call_ms / 1e3)
    report = {
        "batch": args.batch,
        "path": "jnp" if args.jnp else "fused",
        "reps": args.reps,
        "device_ms_per_call": round(per_call_ms, 3),
        "seq_per_s_device": round(seq_per_s, 1),
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
