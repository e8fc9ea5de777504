"""Re-measure ONLY the Swinv2 row of results.json (standard protocol,
k=4/24 like bench_suite) and rewrite BENCHMARKS.md.

Exists because SwinConfig.fused_attn flipped default True after the full
2026-08-18 suite run (883 -> 1,203 img/s in bench_swin_ab); re-running the
whole suite to refresh one row wastes an hour of single-chip time. Same
timing protocol as benchmarks/bench_suite.py:209-227.

Run on the TPU chip:  python benchmarks/refresh_swin_row.py
"""

from __future__ import annotations

import dataclasses as _dc
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

REPO = Path(__file__).resolve().parent.parent


def main():
    from mmd_tpu.core.mesh import require_tpu
    require_tpu()
    import jax
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from bench_suite import (PEAK_BF16, analytic_flops, bench_iter_time,
                             data_dep, write_markdown)
    from mmd_tpu.models import swin as SW

    rng = np.random.default_rng(0)
    scfg = SW.SWIN_BASE_256
    sparams = SW.init_swin(jax.random.key(3), scfg)
    SB = 32
    simgs = jnp.asarray(rng.standard_normal((SB, 256, 256, 3)), jnp.bfloat16)

    def swin_step(c, params, x):
        out = SW.swin_forward(params, scfg, data_dep(x, c))
        return jnp.mean(out).astype(jnp.float32)

    dt = bench_iter_time(swin_step, (sparams, simgs), 4, 24)
    print(f"swin encode (fused_attn={scfg.fused_attn}): "
          f"{dt*1e3:.2f} ms/batch{SB} -> {SB/dt:,.0f} img/s", file=sys.stderr)

    scfg_j = _dc.replace(scfg, fused_attn=False, fused_ln=False)
    fsw = analytic_flops(
        lambda p, x: SW.swin_forward(p, scfg_j, x), sparams, simgs)

    path = REPO / "benchmarks" / "results.json"
    out = json.loads(path.read_text())
    out["swin_embeddings_per_sec"] = SB / dt
    if fsw:
        out["swin_mfu_pct"] = 100.0 * fsw / dt / PEAK_BF16
        print(f"swin MFU: {out['swin_mfu_pct']:.1f}%", file=sys.stderr)
    path.write_text(json.dumps(out, indent=1, sort_keys=True))
    write_markdown(out)
    print("results.json + BENCHMARKS.md refreshed (swin row only)")


if __name__ == "__main__":
    main()
