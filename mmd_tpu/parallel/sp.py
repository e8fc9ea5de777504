"""Sequence (context) parallelism for encoder serving, over ICI.

The reference serves every encoder single-device; next to DP (trainer),
TP (tp.py), ZeRO-1, and PP (pp.py) this completes the parallelism matrix
with the SEQUENCE axis: activations shard along T across `sp` ranks, so
the per-token work — projections, residuals, LayerNorms, the FFN (all
position-independent) — runs on T/sp tokens per device with REPLICATED
weights, and only attention needs communication.

TPU-first shape of that communication: query rows of a non-causal
attention are independent, so each rank keeps its local Q rows and
`all_gather`s the (much smaller than activations-squared) K/V blocks over
the model axis — one tiled ICI collective per layer, after which the
fused Pallas flash kernel runs device-locally on (B, T/sp, D) x (B, T, D)
(shard_map, same discipline as tp.py: GSPMD cannot partition a
pallas_call, but a device-local call needs no partitioning). The MPNet
relative-position bias is replicated and each rank slices its own query
rows; key-padding masks are replicated (they describe keys, which every
rank sees in full).

Covers the post-LN text-encoder stacks the reference actually serves
(BERT/MiniLM key-padding and MPNet relative-bias; reference
text2text_retrieval.py:21-24). Equality vs the unsplit forward is tested
on the virtual mesh in tests/test_sp.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mmd_tpu.core.mesh import DATA_AXIS, MODEL_AXIS


def _batch_axis(mesh: Mesh, b: int):
    """Shard the batch over the mesh's data axis when it divides evenly —
    this makes the shard_map full-mesh SPMD, so SP composes with DP (each
    data rank runs the sequence-parallel schedule on its local batch
    rows). Falls back to batch-replicated for ragged/serving batches."""
    d = mesh.shape.get(DATA_AXIS, 1)
    return DATA_AXIS if (d > 1 and b % d == 0) else None
from mmd_tpu.models import layers as L
from mmd_tpu.ops.attention import multi_head_attention


def _ring_attention(q, k_loc, v_loc, num_heads: int, axis: str, sp: int,
                    tl: int, i, km_full, bias_loc):
    """Blockwise ring attention (the SURVEY §5 long-context seam): each
    rank keeps its local Q rows and ROTATES the K/V blocks around the ICI
    ring with `lax.ppermute`, folding each arriving block into a running
    flash-style softmax (online max / denominator / output accumulators).
    Peak memory is ONE (B, h, T/sp, dh) K/V block instead of the full T,
    and on hardware each hop overlaps with the block's matmuls.

    km_full: optional (B, T) {0,1} replicated key-padding mask — the
    arriving block's absolute position is (i - step) mod sp, so its mask
    slice is computed locally from the replicated mask (no mask rotation
    traffic). bias_loc: optional (B|1, h, tl, T) additive bias for the
    LOCAL query rows (full key axis, sliced per arriving block).

    Same math as softmax(QK^T + bias) V up to fp reassociation."""
    b = q.shape[0]
    d = q.shape[-1]
    h = num_heads
    dh = d // h
    qh = q.reshape(b, tl, h, dh).transpose(0, 2, 1, 3)       # (B,h,tl,dh)
    kh = k_loc.reshape(b, tl, h, dh).transpose(0, 2, 1, 3)
    vh = v_loc.reshape(b, tl, h, dh).transpose(0, 2, 1, 3)
    scale = 1.0 / (dh ** 0.5)

    m = jnp.full((b, h, tl, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((b, h, tl, 1), jnp.float32)
    o = jnp.zeros((b, h, tl, dh), jnp.float32)
    perm = [(s, (s + 1) % sp) for s in range(sp)]
    for step in range(sp):
        # block arriving at rank i on this step originated at rank i-step
        src = (i - step) % sp
        s_blk = jnp.einsum("bhtd,bhsd->bhts", qh, kh,
                           preferred_element_type=jnp.float32) * scale
        if bias_loc is not None:
            s_blk = s_blk + jax.lax.dynamic_slice_in_dim(
                bias_loc, src * tl, tl, axis=3)
        if km_full is not None:
            km_blk = jax.lax.dynamic_slice_in_dim(km_full, src * tl, tl,
                                                  axis=1)
            s_blk = s_blk + (1.0 - km_blk[:, None, None, :]) * -1e9
        m_new = jnp.maximum(m, jnp.max(s_blk, axis=-1, keepdims=True))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(s_blk - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        o = o * corr + jnp.einsum("bhts,bhsd->bhtd",
                                  p.astype(vh.dtype), vh,
                                  preferred_element_type=jnp.float32)
        m = m_new
        if step < sp - 1:
            kh = jax.lax.ppermute(kh, axis, perm)
            vh = jax.lax.ppermute(vh, axis, perm)
    out = (o / l).astype(q.dtype)
    return out.transpose(0, 2, 1, 3).reshape(b, tl, d)


def sequence_parallel_encode(
    params: dict,
    cfg,
    input_ids: jax.Array,
    attention_mask: Optional[jax.Array] = None,
    *,
    mesh: Mesh,
    axis: str = MODEL_AXIS,
    token_type_ids: Optional[jax.Array] = None,
    ring: bool = False,
) -> jax.Array:
    """last_hidden_state (B, T, D) == text_encoder.encode, with the
    activations sequence-sharded over `axis` (weights replicated).
    ring=True swaps the per-layer K/V all-gather for blockwise ring
    attention (_ring_attention): K/V hop the ICI ring via ppermute while
    a flash-style online softmax folds each block in — peak memory one
    block, comm overlapped with compute."""
    from mmd_tpu.models.transformer import embed, mpnet_position_bias

    if getattr(cfg, "pre_ln", False) or getattr(cfg, "is_decoder", False):
        raise NotImplementedError(
            "sequence_parallel_encode serves the post-LN encoder stacks")
    sp = mesh.shape[axis]
    t = input_ids.shape[1]
    if t % sp != 0:
        raise ValueError(f"seq len {t} must divide by sp ranks {sp}")
    tl = t // sp
    dtype = jnp.dtype(cfg.compute_dtype)

    x = embed(params["embeddings"], cfg, input_ids, token_type_ids)
    bias = (mpnet_position_bias(params, cfg, t)
            if getattr(cfg, "relative_bias_buckets", 0) else None)
    km = (attention_mask.astype(jnp.float32)
          if attention_mask is not None else None)

    def layer(p, h_loc, k_full_mask, mask_loc, i):
        q = L.linear(p["q"], h_loc, dtype)
        k = L.linear(p["k"], h_loc, dtype)
        v = L.linear(p["v"], h_loc, dtype)
        if ring:
            # km folds into mask_loc on the bias path; otherwise the
            # replicated key mask is sliced per arriving block
            ctx = _ring_attention(
                q, k, v, cfg.num_heads, axis, sp, tl, i,
                None if mask_loc is not None else k_full_mask, mask_loc)
            return _finish(p, h_loc, ctx)
        # one tiled ICI collective per layer: K/V blocks -> full T
        k_full = jax.lax.all_gather(k, axis, axis=1, tiled=True)
        v_full = jax.lax.all_gather(v, axis, axis=1, tiled=True)
        if mask_loc is not None:
            # additive path (rel bias and/or padding), local query rows
            b, _, d = q.shape
            hn = cfg.num_heads
            dh = d // hn
            qh = q.reshape(b, tl, hn, dh).transpose(0, 2, 1, 3)
            kh = k_full.reshape(b, t, hn, dh).transpose(0, 2, 1, 3)
            vh = v_full.reshape(b, t, hn, dh).transpose(0, 2, 1, 3)
            scores = jnp.einsum("bhtd,bhsd->bhts", qh, kh,
                                preferred_element_type=jnp.float32)
            scores = scores / (dh ** 0.5) + mask_loc
            w = jax.nn.softmax(scores.astype(jnp.float32),
                               axis=-1).astype(vh.dtype)
            ctx = jnp.einsum("bhts,bhsd->bhtd", w, vh,
                             preferred_element_type=jnp.float32)
            ctx = ctx.astype(q.dtype).transpose(0, 2, 1, 3).reshape(b, tl, d)
        else:
            ctx = multi_head_attention(
                q, k_full, v_full, cfg.num_heads, fused=cfg.fused_attn,
                key_mask=k_full_mask)
        return _finish(p, h_loc, ctx)

    def _finish(p, h_loc, ctx):
        h_loc = L.layernorm(p["ln1"], h_loc + L.linear(p["attn_out"], ctx,
                                                       dtype),
                            cfg.layer_norm_eps)
        f = jax.nn.gelu(L.linear(p["ffn_in"], h_loc, dtype),
                        approximate=False)
        return L.layernorm(p["ln2"], h_loc + L.linear(p["ffn_out"], f,
                                                      dtype),
                           cfg.layer_norm_eps)

    def body(layers_p, x_loc, *rest):
        rest = list(rest)
        km_full = rest.pop(0) if km is not None else None
        bias_full = rest.pop(0) if bias is not None else None
        i = jax.lax.axis_index(axis)
        mask_loc = None
        if bias_full is not None:
            # slice this rank's query rows of the shared (1, H, T, T) bias
            mask_loc = jax.lax.dynamic_slice_in_dim(bias_full, i * tl, tl,
                                                    axis=2)
            if km_full is not None:
                mask_loc = mask_loc + (1.0 - km_full[:, None, None, :]) * -1e9
        lf = (jax.checkpoint(layer) if getattr(cfg, "remat", False)
              else layer)
        h = x_loc
        for p in layers_p:
            h = lf(p, h, km_full, mask_loc, i)
        return h

    repl = P()
    ba = _batch_axis(mesh, input_ids.shape[0])
    seq_sharded = P(ba, axis)
    layers_specs = jax.tree_util.tree_map(lambda _: repl, params["layers"])
    in_specs = [layers_specs, seq_sharded]
    args = [params["layers"], x]
    if km is not None:
        in_specs.append(P(ba))
        args.append(km)
    if bias is not None:
        in_specs.append(repl)
        args.append(bias)
    return jax.shard_map(body, mesh=mesh, in_specs=tuple(in_specs),
                         out_specs=seq_sharded, check_vma=False)(*args)


def sequence_parallel_encode_deberta(
    params: dict,
    cfg,
    input_ids: jax.Array,
    attention_mask: Optional[jax.Array] = None,
    *,
    mesh: Mesh,
    axis: str = MODEL_AXIS,
    ring: bool = False,
) -> jax.Array:
    """last_hidden_state (B, T, D) == deberta.deberta_encode, with the
    activations sequence-sharded over `axis`. ring=True rotates K/V
    blocks via ppermute under an online softmax (per-block positional
    selections regenerated from the block's absolute origin) instead of
    the per-layer all-gather.

    DeBERTa's disentangled attention joins the scheme the same way: local
    Q rows against all-gathered K/V, with the diagonal one-hot selections
    regenerated from iotas offset by each rank's absolute row position
    (deberta._disentangled_attention_sp). The shared rel-pos table and
    key-padding mask are replicated (they describe all positions/keys)."""
    from mmd_tpu.models import deberta as D

    sp = mesh.shape[axis]
    t = input_ids.shape[1]
    if t % sp != 0:
        raise ValueError(f"seq len {t} must divide by sp ranks {sp}")
    tl = t // sp
    dtype = jnp.dtype(cfg.compute_dtype)
    c2p_map, p2c_map = D._diag_maps(t, cfg)
    x, rel_emb = D.deberta_embed(params, cfg, input_ids, attention_mask)
    km = (attention_mask.astype(jnp.float32)
          if attention_mask is not None else None)

    def body(layers_p, x_loc, rel_emb_, *rest):
        km_full = rest[0] if km is not None else None
        rank = jax.lax.axis_index(axis)

        def lf(p, h, rel_emb_, km_full, rank):
            return D.deberta_layer_sp(p, cfg, h, rel_emb_, c2p_map, p2c_map,
                                      km_full, dtype, axis, t, rank * tl,
                                      sp=sp, rank=rank, ring=ring)

        if getattr(cfg, "remat", False):
            lf = jax.checkpoint(lf)
        h = x_loc
        for p in layers_p:
            h = lf(p, h, rel_emb_, km_full, rank)
        return h

    repl = P()
    ba = _batch_axis(mesh, input_ids.shape[0])
    seq_sharded = P(ba, axis)
    layers_specs = jax.tree_util.tree_map(lambda _: repl, params["layers"])
    in_specs = [layers_specs, seq_sharded, repl]
    args = [params["layers"], x, rel_emb]
    if km is not None:
        in_specs.append(P(ba))
        args.append(km)
    return jax.shard_map(body, mesh=mesh, in_specs=tuple(in_specs),
                         out_specs=seq_sharded, check_vma=False)(*args)
