"""Validate the DeBERTa trainable-kernel backward ON REAL TPU.

tests/test_deberta_bwd.py proves the math in interpret mode; this script
proves the Mosaic compile + execution on hardware (the inverse strided
roll shift=2T-(T+1), stride=2T-1 is the one construct the fwd kernel
doesn't already exercise). Compares grads of the custom_vjp kernel
against the jnp one-hot path at the production geometry
(T=512, D=384, 6 heads) and writes
benchmarks/DEBERTA_BWD_TPU_VALIDATION.json. On success, flip
DebertaConfig.fused_train for fine-tuning runs.

Run on the TPU chip:  python benchmarks/validate_deberta_bwd_tpu.py
"""

from __future__ import annotations

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

    from mmd_tpu.models import deberta as D

    cfg = D.DebertaConfig(compute_dtype="float32")       # v3-xsmall dims
    t, b = 512, 4
    rng = np.random.default_rng(0)
    params = D.init_deberta(jax.random.key(0), cfg)
    p = params["layers"][0]
    c2p_map, p2c_map = D._diag_maps(t, cfg)
    x = jnp.asarray(rng.standard_normal((b, t, cfg.hidden_size)),
                    jnp.float32)
    rel = jnp.asarray(rng.standard_normal((cfg.pos_ebd_size * 2,
                                           cfg.hidden_size)), jnp.float32)
    m = np.ones((b, t), np.int32)
    m[1, 400:] = 0
    mask = jnp.asarray(m)

    def loss(p, x, rel, fused):
        y = D.deberta_layer(p, cfg, x, rel, c2p_map, p2c_map, mask,
                            jnp.float32, fused)
        return jnp.sum(y ** 2)

    gf = jax.jit(jax.grad(lambda *a: loss(*a, True),
                          argnums=(0, 1, 2)))(p, x, rel)
    gj = jax.jit(jax.grad(lambda *a: loss(*a, False),
                          argnums=(0, 1, 2)))(p, x, rel)
    report = {"geometry": f"B={b} T={t} D={cfg.hidden_size} "
                          f"H={cfg.num_heads}", "leaves": {}}
    worst = 0.0
    import jax.tree_util as jtu
    for (path, a), (_, bb) in zip(jtu.tree_flatten_with_path(gf)[0],
                                  jtu.tree_flatten_with_path(gj)[0]):
        a, bb = np.asarray(a, np.float64), np.asarray(bb, np.float64)
        denom = np.abs(bb).max() + 1e-12
        rel_err = float(np.abs(a - bb).max() / denom)
        report["leaves"][jtu.keystr(path)] = round(rel_err, 8)
        worst = max(worst, rel_err)
    report["worst_rel_err"] = worst
    report["pass"] = bool(worst < 5e-3)
    out = REPO / "benchmarks" / "DEBERTA_BWD_TPU_VALIDATION.json"
    out.write_text(json.dumps(report, indent=1))
    print(json.dumps({"worst_rel_err": worst, "pass": report["pass"]}))
    if not report["pass"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
