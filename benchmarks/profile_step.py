"""Component breakdown of the flagship train step on TPU.

Times (in-jit delta protocol, benchmarks/timing.py) each piece of the
96 ms/step headline config — forward, backward, optimizer, dropout on/off,
fused vs jnp attention, per-block forwards — to locate the gap between the
measured step and the ~5 ms FLOP roofline (fusion fwd ~0.95 TFLOP bf16).

    python benchmarks/profile_step.py [--batch 256]

Writes benchmarks/PROFILE_STEP.json.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from benchmarks.timing import bench_iter_time, data_dep  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--out", default=str(REPO / "benchmarks" / "PROFILE_STEP.json"))
    p.add_argument("--only", default=None, help="comma list of case names")
    args = p.parse_args()

    import jax
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from mmd_tpu.core.config import ModelConfig, TrainConfig
    from mmd_tpu.core.mesh import make_mesh
    from mmd_tpu.data.synthetic import synthetic_preembed_batch
    from mmd_tpu.models.fusion import (
        _evidence_conditioning, _representation, _Rngs, fusion_forward,
        init_fusion_params,
    )
    from mmd_tpu.training.trainer import Trainer, make_raw_step

    B = args.batch
    rng = np.random.default_rng(0)
    host = synthetic_preembed_batch(rng, B)
    for k in list(host):
        if host[k].dtype == np.float32:
            host[k] = host[k].astype(jnp.bfloat16)

    results = {}

    def run_case(name, fn, *case_args, k_small=2, k_large=10):
        if args.only and name not in args.only.split(","):
            return
        t0 = time.time()
        dt = bench_iter_time(fn, case_args, k_small=k_small, k_large=k_large,
                             reps=3)
        results[name] = round(dt * 1e3, 3)
        print(f"[profile] {name:36s} {dt*1e3:8.3f} ms  "
              f"(compile+run {time.time()-t0:.0f}s)", flush=True)

    def cfg_of(dropout, fused):
        return TrainConfig(
            model=ModelConfig(fused_attn=fused, compute_dtype="bfloat16",
                              dropout=dropout),
            batch_size=B)

    mesh = make_mesh()

    # ---- full train step variants ---------------------------------------
    for name, dropout, fused in (
            ("step_drop0.1_fused", 0.1, True),
            ("step_drop0_fused", 0.0, True),
            ("step_drop0.1_jnp", 0.1, False),
    ):
        cfg = cfg_of(dropout, fused)
        tr = Trainer(cfg, mesh)
        state = tr.init()
        batch = tr.shard_batch(host)
        raw = make_raw_step(cfg, tr.optimizer)

        def step(c, st_params, st_opt, st_rng, batch, raw=raw):
            from mmd_tpu.training.trainer import TrainState
            st = TrainState(jnp.int32(c), st_params, st_opt, st_rng)
            b = dict(batch)
            b["claim_text_embeds"] = data_dep(b["claim_text_embeds"], c)
            st2, aux = raw(st, b)
            # touch every updated param so the backward + optimizer stay
            # live — returning only the loss lets XLA dead-code the whole
            # update (value_and_grad's value doesn't need the grads).
            upd = sum(x.sum().astype(jnp.float32)
                      for x in jax.tree_util.tree_leaves(st2.params))
            return aux["loss"].astype(jnp.float32) + upd * 1e-20

        run_case(name, step, state.params, state.opt_state, state.rng, batch)

    # ---- forward / backward isolation (dropout 0.1, fused) --------------
    cfg = cfg_of(0.1, True)
    mcfg = cfg.model
    tr = Trainer(cfg, mesh)
    state = tr.init()
    batch = tr.shard_batch(host)
    key = jax.random.key(0)

    def loss_of(params, b, rng_, det):
        out = fusion_forward(
            params, mcfg,
            X_t=b["claim_text_embeds"], X_i=b["claim_image_embeds"],
            E_t=b["doc_text_embeds"], E_i=b["doc_image_embeds"],
            rng=rng_, deterministic=det)
        (a, bb), (c, d) = out
        return sum(x.sum() for x in (a, bb, c, d)).astype(jnp.float32)

    def fwd_train(c, params, batch):
        b = dict(batch)
        b["claim_text_embeds"] = data_dep(b["claim_text_embeds"], c)
        return loss_of(params, b, jax.random.fold_in(key, 7), det=False)

    def fwd_eval(c, params, batch):
        b = dict(batch)
        b["claim_text_embeds"] = data_dep(b["claim_text_embeds"], c)
        return loss_of(params, b, None, det=True)

    def grad_train(c, params, batch):
        b = dict(batch)
        b["claim_text_embeds"] = data_dep(b["claim_text_embeds"], c)
        g = jax.grad(loss_of)(params, b, jax.random.fold_in(key, 7), False)
        return sum(x.sum() for x in jax.tree_util.tree_leaves(g)).astype(
            jnp.float32)

    run_case("fwd_train", fwd_train, state.params, batch)
    run_case("fwd_eval", fwd_eval, state.params, batch)
    run_case("fwd_bwd_train", grad_train, state.params, batch)

    # ---- per-block forward (train mode) ----------------------------------
    dtype = jnp.bfloat16

    def repr_only(c, params, batch):
        b = dict(batch)
        x = data_dep(b["claim_text_embeds"], c)
        rngs = _Rngs(jax.random.fold_in(key, 7))
        H_t, H_i = _representation(params["representation"], mcfg, x,
                                   b["claim_image_embeds"], rngs, False,
                                   dtype)
        return (H_t.sum() + H_i.sum()).astype(jnp.float32)

    def evid_only(c, params, batch):
        b = dict(batch)
        x = data_dep(b["claim_text_embeds"], c)
        rngs = _Rngs(jax.random.fold_in(key, 7))
        # feed claim embeds straight in as H (same shapes after proj)
        H_t = x[..., :mcfg.embed_dim].astype(dtype)
        H_i = b["claim_image_embeds"][..., :mcfg.embed_dim].astype(dtype)
        (S_t_t, S_t_i), (S_i_t, S_i_i) = _evidence_conditioning(
            params["cross_attn"], mcfg, H_t, H_i,
            b["doc_text_embeds"], b["doc_image_embeds"], rngs, False, dtype)
        return sum(s.sum() for s in (S_t_t, S_t_i, S_i_t, S_i_i)).astype(
            jnp.float32)

    run_case("repr_fwd_train", repr_only, state.params, batch)
    run_case("evid_fwd_train", evid_only, state.params, batch)

    # ---- microbenches: MLP and attention at flagship shapes -------------
    from mmd_tpu.models import layers as L
    mlp_p = L.mlp_init(jax.random.key(1), mcfg.embed_dim, mcfg.mlp_ratio)
    xin = jnp.asarray(rng.standard_normal((B, 512, mcfg.embed_dim)),
                      jnp.bfloat16)

    def mlp_fwd(c, p, x):
        x = data_dep(x, c)
        return L.mlp(p, x, 0.1, jax.random.fold_in(key, 3), False,
                     dtype).sum().astype(jnp.float32)

    def mlp_fwd_nodrop(c, p, x):
        x = data_dep(x, c)
        return L.mlp(p, x, 0.0, None, True, dtype).sum().astype(jnp.float32)

    run_case("mlp512_fwd_drop", mlp_fwd, mlp_p, xin)
    run_case("mlp512_fwd_nodrop", mlp_fwd_nodrop, mlp_p, xin)

    from mmd_tpu.ops.attention import multi_head_attention
    q = jnp.asarray(rng.standard_normal((B, 512, mcfg.embed_dim)), jnp.bfloat16)

    def attn_fused_drop(c, q):
        q = data_dep(q, c)
        o = multi_head_attention(q, q, q, mcfg.num_heads, dropout_rate=0.1,
                                 dropout_rng=jax.random.fold_in(key, 5),
                                 deterministic=False, fused=True)
        return o.sum().astype(jnp.float32)

    def attn_fused_nodrop(c, q):
        q = data_dep(q, c)
        o = multi_head_attention(q, q, q, mcfg.num_heads, dropout_rate=0.0,
                                 deterministic=True, fused=True)
        return o.sum().astype(jnp.float32)

    run_case("attn512_fused_drop", attn_fused_drop, q)
    run_case("attn512_fused_nodrop", attn_fused_nodrop, q)

    Path(args.out).write_text(json.dumps(
        {"batch": B, "ms": results}, indent=1))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
