"""Pipeline parallelism for encoder serving (GPipe-style, over ICI).

The reference serves its frozen encoders on one GPU; this is framework
capability beyond it, completing the parallelism matrix next to DP
(trainer), TP (tp.py), and ZeRO-1: the encoder's layer stack is split
into `pp` contiguous STAGES over a mesh axis, the batch into `M`
microbatches, and activations flow stage-to-stage over ICI via
`lax.ppermute` while different stages work on different microbatches
(the classic GPipe schedule: M + pp - 1 ticks, bubble fraction
(pp - 1) / (M + pp - 1)).

Implementation notes (TPU-first):
  * per-layer params stack into one pytree with a leading layer dim,
    sharded P(axis) — each device physically holds only its own
    num_layers/pp layer slice; inside shard_map a `lax.scan` walks the
    local slice, so one compiled block serves every stage;
  * embeddings, shared per-MODEL tables, and the final output stay
    replicated (serving-scale activations are small; the win PP targets
    is layer-WEIGHT memory and per-stage compute locality). Shared
    tables are per-model, not per-layer: MPNet's relative-position bias
    ((1, H, T, T), computed once from the bucket table) and DeBERTa's
    LN'd relative-position embeddings ((2*span, D)) replicate to every
    stage and ride into the stage body as broadcast operands;
  * bubble ticks compute on garbage and are masked out of the output —
    branch-free, so the whole schedule is one straight-line XLA program.

Covers all three served text-encoder families: BERT-class key-padding
(SBERT/MiniLM), MPNet relative-bias (multi-qa-mpnet, reference
text2text_retrieval.py:21-22), and DeBERTa-v3 disentangled attention
(the reference's actual frozen text encoder, reference train.py:47).
Equality vs the unsplit forwards is tested on the virtual mesh in
tests/test_pp.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mmd_tpu.core.mesh import MODEL_AXIS


def _gpipe_schedule(stage, x_mb, km_mb, axis: str, pp: int, m: int):
    """Run the static GPipe schedule inside shard_map: `stage(h, km)` is
    this device's layer-slice forward; activations hop stage-to-stage via
    ppermute; only the last stage's finished slots survive the psum."""
    i = jax.lax.axis_index(axis)
    out = jnp.zeros_like(x_mb)
    h = jnp.zeros(x_mb.shape[1:], x_mb.dtype)
    for t in range(m + pp - 1):                  # static schedule
        mb = t - i                               # this stage's microbatch
        mbc = jnp.clip(mb, 0, m - 1)
        x_in = jnp.where(
            i == 0,
            jax.lax.dynamic_index_in_dim(x_mb, mbc, 0, keepdims=False),
            h)
        km = (jax.lax.dynamic_index_in_dim(km_mb, mbc, 0, keepdims=False)
              if km_mb is not None else None)
        y = stage(x_in, km)
        valid = ((mb >= 0) & (mb < m))
        prev = jax.lax.dynamic_index_in_dim(out, mbc, 0, keepdims=False)
        out = jax.lax.dynamic_update_index_in_dim(
            out, jnp.where(valid, y, prev), mbc, 0)
        if t < m + pp - 2:
            h = jax.lax.ppermute(
                y, axis, [(s, s + 1) for s in range(pp - 1)])
    # only the LAST stage's slots hold finished activations
    out = jnp.where(i == pp - 1, out, jnp.zeros_like(out))
    return jax.lax.psum(out, axis)


def _split_microbatches(b: int, num_microbatches: Optional[int], pp: int,
                        n_layers: int):
    m = num_microbatches or pp
    if n_layers % pp != 0:
        raise ValueError(f"num_layers={n_layers} must divide by "
                         f"pipeline stages {pp}")
    if b % m != 0:
        raise ValueError(f"batch {b} must divide by microbatches {m}")
    return m, b // m


def _stack_layers(layers):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def _pp_batch_axis(mesh: Mesh, bm: int):
    """Shard the within-microbatch batch dim over the data axis when it
    divides evenly — full-mesh SPMD, so PP composes with DP (each data
    rank pipelines its local rows). Replicated otherwise."""
    from mmd_tpu.core.mesh import DATA_AXIS

    d = mesh.shape.get(DATA_AXIS, 1)
    return DATA_AXIS if (d > 1 and bm % d == 0) else None


def pipeline_encode(
    params: dict,
    cfg,
    input_ids: jax.Array,
    attention_mask: Optional[jax.Array] = None,
    *,
    mesh: Mesh,
    axis: str = MODEL_AXIS,
    num_microbatches: Optional[int] = None,
    token_type_ids: Optional[jax.Array] = None,
) -> jax.Array:
    """last_hidden_state (B, T, D) == text_encoder.encode, computed with
    the layer stack pipeline-split over `axis`. Handles both the
    key-padding path (BERT/MiniLM-class) and the MPNet relative-bias
    path (the shared (1, H, T, T) bias replicates to every stage and the
    per-microbatch additive mask is built inside the stage body)."""
    from mmd_tpu.models.transformer import (
        attention_mask_from_ids, embed, encoder_layer, mpnet_position_bias)

    pp = mesh.shape[axis]
    b = input_ids.shape[0]
    m, bm = _split_microbatches(b, num_microbatches, pp, cfg.num_layers)

    x = embed(params["embeddings"], cfg, input_ids, token_type_ids)
    t = x.shape[1]
    x_mb = x.reshape(m, bm, *x.shape[1:])
    km_mb = (attention_mask.reshape(m, bm, -1)
             if attention_mask is not None else None)
    stacked = _stack_layers(params["layers"])
    bias = (mpnet_position_bias(params, cfg, t)
            if getattr(cfg, "relative_bias_buckets", 0) else None)

    def make_stage(stk, bias):
        def stage(h, km):
            if bias is not None:
                # rel-bias layers take the additive-mask slot, matching
                # transformer_forward's routing
                mask = bias if km is None else (
                    bias + attention_mask_from_ids(km, t))
                kmask = None
            else:
                mask, kmask = None, km

            def f(carry, lp):
                y, _ = encoder_layer(lp, cfg, carry, mask, key_mask=kmask)
                return y, None
            if getattr(cfg, "remat", False):
                f = jax.checkpoint(f)          # scan-remat per layer
            return jax.lax.scan(f, h, stk)[0]
        return stage

    repl = P()
    ba = _pp_batch_axis(mesh, bm)
    mb_spec = P(None, ba)
    in_specs = [jax.tree_util.tree_map(lambda _: P(axis), stacked), mb_spec]
    args = [stacked, x_mb]
    if km_mb is not None:
        in_specs.append(mb_spec)
        args.append(km_mb)
    if bias is not None:
        in_specs.append(repl)
        args.append(bias)

    def body(stk, x_mb, *rest):
        rest = list(rest)
        km_mb_ = rest.pop(0) if attention_mask is not None else None
        bias_ = rest.pop(0) if bias is not None else None
        return _gpipe_schedule(make_stage(stk, bias_), x_mb, km_mb_,
                               axis, pp, m)

    out = jax.shard_map(body, mesh=mesh, in_specs=tuple(in_specs),
                        out_specs=mb_spec, check_vma=False)(*args)
    return out.reshape(b, *out.shape[2:])


def pipeline_encode_deberta(
    params: dict,
    cfg,
    input_ids: jax.Array,
    attention_mask: Optional[jax.Array] = None,
    *,
    mesh: Mesh,
    axis: str = MODEL_AXIS,
    num_microbatches: Optional[int] = None,
) -> jax.Array:
    """last_hidden_state (B, T, D) == deberta.deberta_encode, with the
    layer stack pipeline-split over `axis`.

    DeBERTa's disentangled attention carries SHARED tables — the LN'd
    relative-position embeddings (2*span, D) and the static diagonal
    permutation maps — which are per-model, not per-layer: the table
    replicates to every stage (a few hundred KB) and the maps are
    compile-time constants, so only the per-layer weights are sharded.
    This serves the reference's actual frozen text encoder
    (DeBERTa-v3-xsmall, reference train.py:47) under PP."""
    from mmd_tpu.models import deberta as D

    dtype = jnp.dtype(cfg.compute_dtype)
    pp = mesh.shape[axis]
    b = input_ids.shape[0]
    m, bm = _split_microbatches(b, num_microbatches, pp, cfg.num_layers)

    t = input_ids.shape[1]
    c2p_map, p2c_map = D._diag_maps(t, cfg)
    fused = D.use_fused_attn(cfg, t)
    x, rel_emb = D.deberta_embed(params, cfg, input_ids, attention_mask)
    x_mb = x.reshape(m, bm, *x.shape[1:])
    km_mb = (attention_mask.reshape(m, bm, -1)
             if attention_mask is not None else None)
    stacked = _stack_layers(params["layers"])

    def make_stage(stk, rel_emb):
        def stage(h, km):
            def f(carry, lp):
                y = D.deberta_layer(lp, cfg, carry, rel_emb, c2p_map,
                                    p2c_map, km, dtype, fused)
                return y, None
            if getattr(cfg, "remat", False):
                f = jax.checkpoint(f)          # scan-remat per layer
            return jax.lax.scan(f, h, stk)[0]
        return stage

    repl = P()
    ba = _pp_batch_axis(mesh, bm)
    mb_spec = P(None, ba)
    in_specs = [jax.tree_util.tree_map(lambda _: P(axis), stacked), mb_spec,
                repl]
    args = [stacked, x_mb, rel_emb]
    if km_mb is not None:
        in_specs.append(mb_spec)
        args.append(km_mb)

    def body(stk, x_mb, rel_emb_, km_mb_=None):
        return _gpipe_schedule(make_stage(stk, rel_emb_), x_mb, km_mb_,
                               axis, pp, m)

    out = jax.shard_map(body, mesh=mesh, in_specs=tuple(in_specs),
                        out_specs=mb_spec, check_vma=False)(*args)
    return out.reshape(b, *out.shape[2:])
