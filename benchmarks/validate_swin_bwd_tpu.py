"""Validate the Swin window-attention backward kernel ON REAL TPU.

tests/test_swin_bwd.py proves the math in interpret mode; this proves
the Mosaic compile + execution on hardware at a Swinv2-base stage-0
geometry (window 8, dh 32, packed g=4, shifted block included).
Compares full swin_forward grads fused-vs-einsum and writes
benchmarks/SWIN_BWD_TPU_VALIDATION.json. On pass, SwinConfig.fused_train
is safe to flip for fine-tuning runs.

Run on the TPU chip:  python benchmarks/validate_swin_bwd_tpu.py
"""

from __future__ import annotations

import dataclasses
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent


def main():
    from mmd_tpu.core.mesh import require_tpu
    require_tpu()
    import jax
    import jax.numpy as jnp

    from mmd_tpu.models import swin as S

    cfg = S.SwinConfig(image_size=64, patch_size=4, embed_dim=128,
                       depths=(2, 2), num_heads=(4, 8), window_size=8,
                       pretrained_window_sizes=(0, 0),
                       compute_dtype="float32")
    params = S.init_swin(jax.random.key(3), cfg)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((4, 64, 64, 3)), jnp.float32)

    def loss(p, x, fused):
        c = dataclasses.replace(cfg, fused_attn=fused)
        return jnp.sum(S.swin_forward(p, c, x) ** 2)

    gf = jax.jit(jax.grad(lambda p, x: loss(p, x, True),
                          argnums=(0, 1)))(params, imgs)
    gj = jax.jit(jax.grad(lambda p, x: loss(p, x, False),
                          argnums=(0, 1)))(params, imgs)
    import jax.tree_util as jtu
    report = {"geometry": "64px p4 e128 depths(2,2) heads(4,8) w8",
              "leaves": {}}
    worst = 0.0
    for (path, a), (_, b) in zip(jtu.tree_flatten_with_path(gf)[0],
                                 jtu.tree_flatten_with_path(gj)[0]):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        rel = float(np.abs(a - b).max() / (np.abs(b).max() + 1e-12))
        report["leaves"][jtu.keystr(path)] = round(rel, 8)
        worst = max(worst, rel)
    report["worst_rel_err"] = worst
    report["pass"] = bool(worst < 5e-3)
    (REPO / "benchmarks" / "SWIN_BWD_TPU_VALIDATION.json").write_text(
        json.dumps(report, indent=1))
    print(json.dumps({"worst_rel_err": worst, "pass": report["pass"]}))
    if not report["pass"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
