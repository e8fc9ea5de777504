"""Same-process A/B: Swinv2 forward, XLA einsum vs fused Pallas windows.

Times swin_forward at the production geometry (swinv2-base, 256px,
batch 32, bf16) with SwinConfig.fused_attn off/on — in-jit fori-loop
deltas compiled ONCE per variant, 5 interleaved reps, medians. Run on
the TPU chip:

    python benchmarks/bench_swin_ab.py [--batch 32]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from timing import data_dep  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()

    from mmd_tpu.core.mesh import require_tpu
    require_tpu()
    import jax
    import jax.numpy as jnp
    from mmd_tpu.models import swin as SW

    B = args.batch
    K_SMALL, K_LARGE = 2, 8
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((B, 256, 256, 3)), jnp.bfloat16)
    params = SW.init_swin(jax.random.key(3), SW.SWIN_BASE_256)

    def build(cfg):
        # params MUST be a jit argument: closed-over pytrees are baked into
        # the HLO as constants and the ~350 MB payload 413s the remote
        # compile helper (CLAUDE.md round-2 note).
        def step(p, c, x):
            out = SW.swin_forward(p, cfg, data_dep(x, c))
            return jnp.mean(out).astype(jnp.float32)

        def make(k):
            @jax.jit
            def run(p, x):
                return jax.lax.fori_loop(
                    0, k, lambda i, c: step(p, c, x), jnp.float32(0.0))
            return run

        return make(K_SMALL), make(K_LARGE)

    variants = {
        # fused_attn has defaulted ON since the measured +36%: force it
        # off for the einsum arm (it used to be the config default).
        "einsum": build(dataclasses.replace(SW.SWIN_BASE_256,
                                            fused_attn=False,
                                            fused_ln=False)),
        "fused": build(dataclasses.replace(SW.SWIN_BASE_256,
                                           fused_attn=True,
                                           fused_ln=False)),
        # + the forward-only residual+LN kernel (ops/ln.py): profile
        # showed the ffn_out GEMMs at 9-29% MFU with XLA's LN-stats
        # reduce fused into them; this arm de-fuses the epilogue.
        "fused_ln": build(dataclasses.replace(SW.SWIN_BASE_256,
                                              fused_attn=True,
                                              fused_ln=True)),
    }
    for tag, (fs, fl) in variants.items():
        t0 = time.time()
        float(fs(params, imgs)); float(fl(params, imgs))
        print(f"{tag}: compiled in {time.time()-t0:.0f}s", file=sys.stderr)

    dts = {tag: [] for tag in variants}
    for rep in range(args.reps):
        for tag, (fs, fl) in variants.items():
            t0 = time.perf_counter(); float(fs(params, imgs))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter(); float(fl(params, imgs))
            tl = time.perf_counter() - t0
            dts[tag].append((tl - ts) / (K_LARGE - K_SMALL))
    out = {}
    for tag, vals in dts.items():
        dt = float(np.median(vals))
        out[tag] = dt
        print(f"{tag}: {dt*1e3:.2f} ms/batch{B} -> {B/dt:,.0f} img/s")
    delta = (out["fused"] - out["einsum"]) / out["einsum"] * 100
    delta_ln = (out["fused_ln"] - out["fused"]) / out["fused"] * 100
    print(f"fused vs einsum: {delta:+.1f}%")
    print(f"fused_ln vs fused: {delta_ln:+.1f}%")
    from ab_log import record
    record("swin_fused_attn_ab", {
        "einsum_img_per_s": round(B / out["einsum"], 1),
        "fused_img_per_s": round(B / out["fused"], 1),
        "fused_ln_img_per_s": round(B / out["fused_ln"], 1),
        "fused_vs_einsum_pct": round(delta, 1),
        "fused_ln_vs_fused_pct": round(delta_ln, 1),
        "protocol": f"in-jit fori delta, {args.reps} interleaved reps, "
                    "medians"})


if __name__ == "__main__":
    main()
