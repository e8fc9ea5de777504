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
  * embeddings and the final output stay replicated (serving-scale
    activations are small; the win PP targets is layer-WEIGHT memory and
    per-stage compute locality);
  * bubble ticks compute on garbage and are masked out of the output —
    branch-free, so the whole schedule is one straight-line XLA program;
  * restricted to the key-padding-mask path of the generic transformer
    stack (BERT/MPNet-class); DeBERTa's disentangled attention carries
    per-layer shared tables and stays on TP/DP serving.

Equality vs the unsplit forward is tested on the virtual mesh in
tests/test_pp.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mmd_tpu.core.mesh import MODEL_AXIS


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
    the layer stack pipeline-split over `axis`."""
    from mmd_tpu.models.transformer import embed, encoder_layer

    if getattr(cfg, "relative_bias_buckets", 0):
        raise NotImplementedError(
            "pipeline_encode supports the key-padding-mask path only")
    pp = mesh.shape[axis]
    n_layers = cfg.num_layers
    if n_layers % pp != 0:
        raise ValueError(f"num_layers={n_layers} must divide by "
                         f"pipeline stages {pp}")
    b = input_ids.shape[0]
    m = num_microbatches or pp
    if b % m != 0:
        raise ValueError(f"batch {b} must divide by microbatches {m}")
    bm = b // m

    x = embed(params["embeddings"], cfg, input_ids, token_type_ids)
    x_mb = x.reshape(m, bm, *x.shape[1:])
    km_mb = (attention_mask.reshape(m, bm, -1)
             if attention_mask is not None else None)
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *params["layers"])

    def stage(stk, h, km):
        def f(carry, lp):
            y, _ = encoder_layer(lp, cfg, carry, None, key_mask=km)
            return y, None
        return jax.lax.scan(f, h, stk)[0]

    def body(stk, x_mb, km_mb=None):
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
            y = stage(stk, x_in, km)
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

    repl = P()
    in_specs = [jax.tree_util.tree_map(lambda _: P(axis), stacked), repl]
    args = [stacked, x_mb]
    if km_mb is not None:
        in_specs.append(repl)
        args.append(km_mb)
    out = jax.shard_map(body, mesh=mesh, in_specs=tuple(in_specs),
                        out_specs=repl, check_vma=False)(*args)
    return out.reshape(b, *out.shape[2:])
