"""Validate the DeBERTa trainable-kernel backward ON REAL TPU.

tests/test_deberta_bwd.py proves the math in interpret mode; this script
proves the Mosaic compile + execution on hardware (the inverse diagonal
roll — per-row lane shift -(T+1+i), built as the stride-(+1) roll
conjugated with MXU exchange-matrix row reversals because Mosaic lowers
neither a stride-(2T-1) rotate nor a 2T-lane dynamic gather nor lax.rev
— is the one construct the fwd kernel doesn't already exercise).

Protocol: TPU dots truncate f32 inputs to bf16 at default precision, so
the TPU jnp path is NOT ground truth.  Both TPU paths are measured
against a CPU float32 oracle (exact fma dots) of the identical one-hot
math: PASS iff the fused kernel's deviation is no worse than 2x the TPU
jnp path's own deviation per leaf (5e-3 absolute floor).  Writes
benchmarks/DEBERTA_BWD_TPU_VALIDATION.json.  On success, flip
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

    # -- CPU float32 oracle of the identical jnp math ----------------------
    cpu = jax.devices("cpu")[0]
    gc = jax.jit(jax.grad(lambda *a: loss(*a, False), argnums=(0, 1, 2)))(
        jax.device_put(p, cpu), jax.device_put(x, cpu),
        jax.device_put(rel, cpu))

    import jax.tree_util as jtu

    def rel_errs(g, ref):
        out = {}
        for (path, a), (_, bb) in zip(jtu.tree_flatten_with_path(g)[0],
                                      jtu.tree_flatten_with_path(ref)[0]):
            a = np.asarray(a, np.float64)
            bb = np.asarray(bb, np.float64)
            out[jtu.keystr(path)] = float(
                np.abs(a - bb).max() / (np.abs(bb).max() + 1e-12))
        return out

    def cos_sims(g, ref):
        out = {}
        for (path, a), (_, bb) in zip(jtu.tree_flatten_with_path(g)[0],
                                      jtu.tree_flatten_with_path(ref)[0]):
            a = np.asarray(a, np.float64).ravel()
            bb = np.asarray(bb, np.float64).ravel()
            out[jtu.keystr(path)] = float(
                (a @ bb) / (np.linalg.norm(a) * np.linalg.norm(bb) + 1e-30))
        return out

    err_fused = rel_errs(gf, gc)
    err_jnp = rel_errs(gj, gc)
    cos_fused = cos_sims(gf, gc)
    cos_jnp = cos_sims(gj, gc)
    worst_f = max(err_fused.values())
    worst_j = max(err_jnp.values())
    bad = {k: (err_fused[k], err_jnp[k]) for k in err_fused
           if not (err_fused[k] <= max(5e-3, 2.0 * err_jnp[k]))}
    # Absolute supplement (advisor r4): max-abs rel-err is noise-floor
    # relative, so on high-noise leaves (k.w, table grads — jnp-vs-CPU up
    # to 1.2) a genuinely wrong kernel could slip through 2x headroom.
    # Cosine vs the CPU oracle is direction-sensitive and near 1.0 for
    # every correct path regardless of elementwise bf16 noise: require
    # each fused leaf to reach 0.98 or at least the jnp path's own cosine.
    bad_cos = {k: (cos_fused[k], cos_jnp[k]) for k in cos_fused
               if not (cos_fused[k] >= min(0.98, cos_jnp[k]))}
    # NaN anywhere (in either TPU path) must fail, and NaN makes the
    # comparisons above silently False — check finiteness explicitly.
    finite = (np.isfinite(list(err_fused.values())).all()
              and np.isfinite(list(err_jnp.values())).all()
              and np.isfinite(list(cos_fused.values())).all())
    ok = not bad and not bad_cos and bool(finite)
    report = {
        "geometry": f"B={b} T={t} D={cfg.hidden_size} H={cfg.num_heads}",
        "protocol": "both TPU paths vs CPU f32 oracle; pass iff per leaf "
                    "fused rel-err <= max(5e-3, 2x jnp) AND fused cosine "
                    ">= min(0.98, jnp cosine) AND all finite",
        "worst_fused_vs_cpu": worst_f,
        "worst_jnp_vs_cpu": worst_j,
        "min_cosine_fused": min(cos_fused.values()),
        "min_cosine_jnp": min(cos_jnp.values()),
        "leaves_fused_vs_cpu": {k: round(v, 8) for k, v in err_fused.items()},
        "leaves_jnp_vs_cpu": {k: round(v, 8) for k, v in err_jnp.items()},
        "cos_fused_vs_cpu": {k: round(v, 8) for k, v in cos_fused.items()},
        "failing_leaves": {k: [round(f, 8), round(j, 8)]
                           for k, (f, j) in bad.items()},
        "failing_cosine_leaves": {k: [round(f, 8), round(j, 8)]
                                  for k, (f, j) in bad_cos.items()},
        "all_finite": bool(finite),
        "pass": bool(ok),
    }
    out = REPO / "benchmarks" / "DEBERTA_BWD_TPU_VALIDATION.json"
    out.write_text(json.dumps(report, indent=1))
    print(json.dumps({"worst_fused_vs_cpu": worst_f,
                      "worst_jnp_vs_cpu": worst_j,
                      "failing_leaves": len(bad), "pass": bool(ok)}))
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
