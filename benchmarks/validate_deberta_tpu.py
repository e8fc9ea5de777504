"""TPU-run validation + benchmark of the fused DeBERTa attention kernel.

The fused path (models/deberta.py::_deberta_attn_fused, Mosaic strided-roll
diagonal selection) only runs on real TPU hardware; pytest exercises the jnp
one-hot path (itself HF-output-parity-tested in tests/test_hf_parity.py).
This script is the committed evidence that the kernel agrees with that
reference path and the measured speedup (DEBERTA_TPU_VALIDATION.json).

Agreement tolerance: both paths run their matmuls at default MXU precision
(bf16 passes, ~4e-3 relative per op), so outputs after 12 layers agree to
~1e-2 absolute at O(4) output scale — rounding, not a semantics gap; the
zero-extra-MACs selection itself is exact (integer roll).

Usage: python benchmarks/validate_deberta_tpu.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.timing import bench_iter_time, data_dep  # noqa: E402
from mmd_tpu.models import deberta as D  # noqa: E402


def main():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    results = {"backend": str(jax.devices()[0])}

    # agreement: fused vs jnp one-hot path, full-depth xsmall arch, f32
    cfg = dataclasses.replace(D.DEBERTA_V3_XSMALL, vocab_size=1000)
    params = D.init_deberta(jax.random.key(0), cfg)
    ids = jnp.asarray(rng.integers(1, 1000, (4, 512)), jnp.int32)
    m = np.ones((4, 512), np.int64)
    m[1, 400:] = 0
    m[3, 100:] = 0
    mask = jnp.asarray(m, jnp.int32)
    out = {}
    for fused in (True, False):
        c = dataclasses.replace(cfg, fused_attn=fused)
        out[fused] = np.asarray(jax.jit(
            lambda p, i, k, c=c: D.deberta_encode(p, c, i, k))(
                params, ids, mask))
    valid = m.astype(bool)
    diff = float(np.abs(out[True] - out[False])[valid].max())
    scale = float(np.abs(out[False]).max())
    ok = diff / scale < 1e-2
    results["agreement"] = {"max_abs_diff_valid": diff, "output_scale": scale,
                            "rel": diff / scale, "pass": ok}
    print(f"fused vs jnp: max|diff|={diff:.2e} scale={scale:.2f} "
          f"({'PASS' if ok else 'FAIL'})")

    # throughput at the embed workload (B=64, T=512)
    B, T = 64, 512
    ids = jnp.asarray(rng.integers(1, 1000, (B, T)), jnp.int32)
    ones = jnp.ones((B, T), jnp.int32)
    rates = {}
    for name, fused, dtype in [("jnp_onehot_f32", False, "float32"),
                               ("fused_f32", True, "float32"),
                               ("fused_bf16", True, "bfloat16")]:
        c = dataclasses.replace(cfg, fused_attn=fused, compute_dtype=dtype)

        def step(carry, params, ids, mask, c=c):
            o = D.deberta_encode(params, c,
                                 data_dep(ids, carry).astype(jnp.int32), mask)
            return o.astype(jnp.float32).mean()

        t = bench_iter_time(step, (params, ids, ones), k_small=2, k_large=8,
                            reps=3)
        rates[name] = round(B / t, 1)
        print(f"{name}: {B / t:.0f} seq/s")
    results["seq_per_sec"] = rates
    results["speedup_fused_vs_onehot"] = round(
        rates["fused_bf16"] / rates["jnp_onehot_f32"], 2)
    results["ok"] = bool(ok)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "DEBERTA_TPU_VALIDATION.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(("OK" if ok else "FAILED") + f" -> {out_path}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
