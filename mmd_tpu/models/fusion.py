"""Evidence-conditioned multimodal fusion model (the trained component).

Functionally re-derives the reference's architecture
(reference src/model/model.py):

  1. MultiViewClaimRepresentation (model.py:6-121): project text/image claims
     to embed_dim, per-modality self-attention, then a second attention which
     in the reference REUSES the same modality's K/V (model.py:106,115 — i.e.
     effectively a second self-attention). `cfg.parity_cross_kv=True`
     replicates that trained function; False performs genuine cross-modal
     attention (text queries attend image K/V and vice versa).
  2. CrossAttentionEvidenceConditioning (model.py:124-237): 4 evidence paths
     (claim-rep x evidence-modality), each with its own out-proj + 2 LNs and
     a per-claim-modality shared MLP.
  3. ClassificationModule (model.py:240-347): per-path 2-layer heads over
     mean-pooled sequences, or a single 3-layer head over the concat
     (factify mode), or a text-only 3-layer head (model.py:393-403).

All attention runs through ops.attention (Pallas fused kernel when
cfg.fused_attn and dropout inactive). Params are a plain pytree; everything
jits and shards with pjit.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mmd_tpu.core.config import ModelConfig
from mmd_tpu.models import layers as L
from mmd_tpu.ops.attention import multi_head_attention


class _Rngs:
    """Deterministic stream of subkeys from one root key (None-safe)."""

    def __init__(self, key: Optional[jax.Array]):
        self._key = key
        self._i = 0

    def __call__(self) -> Optional[jax.Array]:
        if self._key is None:
            return None
        self._i += 1
        return jax.random.fold_in(self._key, self._i)


# -----------------------------------------------------------------------------
# Init
# -----------------------------------------------------------------------------

def _init_representation(key: jax.Array, cfg: ModelConfig) -> dict:
    d = cfg.embed_dim
    names_linear = {
        "text_proj": (cfg.text_input_dim, d),
        "image_proj": (cfg.image_input_dim, d),
        "text_WQ": (d, d), "text_WK": (d, d), "text_WV": (d, d),
        "image_WQ": (d, d), "image_WK": (d, d), "image_WV": (d, d),
        "text_self_attn_out": (d, d), "image_self_attn_out": (d, d),
        "text_cross_attn_out": (d, d), "image_cross_attn_out": (d, d),
    }
    keys = jax.random.split(key, len(names_linear) + 2)
    p = {
        name: L.linear_init(k, i, o)
        for k, (name, (i, o)) in zip(keys, names_linear.items())
    }
    for ln in ("text_self_ln1", "text_self_ln2", "image_self_ln1",
               "image_self_ln2", "text_cross_ln1", "text_cross_ln2",
               "image_cross_ln1", "image_cross_ln2"):
        p[ln] = L.layernorm_init(d)
    p["text_mlp"] = L.mlp_init(keys[-2], d, cfg.mlp_ratio)
    p["image_mlp"] = L.mlp_init(keys[-1], d, cfg.mlp_ratio)
    return p


def _init_cross_attn(key: jax.Array, cfg: ModelConfig) -> dict:
    d = cfg.embed_dim
    names_linear = {
        "text_WQ": (d, d), "image_WQ": (d, d),
        "text_evidence_key": (cfg.text_input_dim, d),
        "text_evidence_value": (cfg.text_input_dim, d),
        "image_evidence_key": (cfg.image_input_dim, d),
        "image_evidence_value": (cfg.image_input_dim, d),
        "text_text_out": (d, d), "text_image_out": (d, d),
        "image_text_out": (d, d), "image_image_out": (d, d),
    }
    keys = jax.random.split(key, len(names_linear) + 2)
    p = {
        name: L.linear_init(k, i, o)
        for k, (name, (i, o)) in zip(keys, names_linear.items())
    }
    for path in ("text_text", "text_image", "image_text", "image_image"):
        p[f"{path}_ln1"] = L.layernorm_init(d)
        p[f"{path}_ln2"] = L.layernorm_init(d)
    p["text_mlp"] = L.mlp_init(keys[-2], d, cfg.mlp_ratio)
    p["image_mlp"] = L.mlp_init(keys[-1], d, cfg.mlp_ratio)
    return p


def _init_classifier(key: jax.Array, cfg: ModelConfig) -> dict:
    d, h, c = cfg.embed_dim, cfg.hidden_dim, cfg.num_classes
    if cfg.text_only:
        return {"text_classifier": L.head_init(key, [d, h * 2, h, c])}
    if cfg.factify:
        return {"unified_mlp": L.head_init(key, [d * 4, h * 2, h, c])}
    keys = jax.random.split(key, 4)
    return {
        "mlp_text_given_text": L.head_init(keys[0], [d, h, c]),
        "mlp_text_given_image": L.head_init(keys[1], [d, h, c]),
        "mlp_image_given_text": L.head_init(keys[2], [d, h, c]),
        "mlp_image_given_image": L.head_init(keys[3], [d, h, c]),
    }


def init_fusion_params(key: jax.Array, cfg: ModelConfig) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "representation": _init_representation(k1, cfg),
        "cross_attn": _init_cross_attn(k2, cfg),
        "classifier": _init_classifier(k3, cfg),
    }


# -----------------------------------------------------------------------------
# Forward
# -----------------------------------------------------------------------------

def _attn(cfg: ModelConfig, q, k, v, out_proj, rngs: _Rngs, deterministic,
          dtype, tp_mesh=None):
    # TP shards the head dim over the mesh "model" axis. The jnp einsum path
    # partitions along heads under GSPMD; the Pallas kernels cannot be
    # GSPMD-partitioned, so with a tp_mesh they run device-locally under
    # shard_map (each device owns num_heads/tp whole heads — see
    # ops/attention._shard_mapped_attention). Without a mesh, TP falls back
    # to the jnp path as before.
    ctx = multi_head_attention(
        q, k, v, cfg.num_heads,
        dropout_rate=cfg.dropout, dropout_rng=rngs(),
        deterministic=deterministic,
        fused=cfg.fused_attn and (not cfg.tensor_parallel
                                  or tp_mesh is not None),
        tp_mesh=tp_mesh if cfg.tensor_parallel else None,
    )
    return L.linear(out_proj, ctx, dtype)


def _representation(
    p: dict, cfg: ModelConfig, X_t, X_i, rngs: _Rngs, deterministic, dtype,
    tp_mesh=None,
):
    """Multi-view claim representation. Returns (H_t, H_i) (either may be None)."""
    if X_t is not None:
        X_t = L.linear(p["text_proj"], X_t, dtype)
        tQ = L.linear(p["text_WQ"], X_t, dtype)
        tK = L.linear(p["text_WK"], X_t, dtype)
        tV = L.linear(p["text_WV"], X_t, dtype)
    if X_i is not None:
        X_i = L.linear(p["image_proj"], X_i, dtype)
        iQ = L.linear(p["image_WQ"], X_i, dtype)
        iK = L.linear(p["image_WK"], X_i, dtype)
        iV = L.linear(p["image_WV"], X_i, dtype)

    def _mlp(name, x):
        return L.mlp(p[name], x, cfg.dropout, rngs(), deterministic, dtype,
                     fused_ok=not cfg.tensor_parallel or tp_mesh is not None,
                     tp_mesh=tp_mesh if cfg.tensor_parallel else None)

    if X_t is not None and X_i is None:
        H_t = X_t + _attn(cfg, tQ, tK, tV, p["text_self_attn_out"],
                          rngs, deterministic, dtype, tp_mesh)
        H_t = L.layernorm(p["text_self_ln1"], H_t)
        H_t = H_t + _mlp("text_mlp", H_t)
        return L.layernorm(p["text_self_ln2"], H_t), None

    if X_i is not None and X_t is None:
        H_i = X_i + _attn(cfg, iQ, iK, iV, p["image_self_attn_out"],
                          rngs, deterministic, dtype, tp_mesh)
        H_i = L.layernorm(p["image_self_ln1"], H_i)
        H_i = H_i + _mlp("image_mlp", H_i)
        return None, L.layernorm(p["image_self_ln2"], H_i)

    # Multimodal. The second attention's K/V source is the parity quirk.
    H_t = X_t + _attn(cfg, tQ, tK, tV, p["text_self_attn_out"],
                      rngs, deterministic, dtype, tp_mesh)
    H_t = L.layernorm(p["text_self_ln1"], H_t)
    H_i = X_i + _attn(cfg, iQ, iK, iV, p["image_self_attn_out"],
                      rngs, deterministic, dtype, tp_mesh)
    H_i = L.layernorm(p["image_self_ln1"], H_i)

    t_kv = (tK, tV) if cfg.parity_cross_kv else (iK, iV)
    i_kv = (iK, iV) if cfg.parity_cross_kv else (tK, tV)

    C_t = H_t + _attn(cfg, H_t, *t_kv, p["text_cross_attn_out"],
                      rngs, deterministic, dtype, tp_mesh)
    C_t = L.layernorm(p["text_cross_ln1"], C_t)
    C_t = C_t + _mlp("text_mlp", C_t)
    C_t = L.layernorm(p["text_cross_ln2"], C_t)

    C_i = H_i + _attn(cfg, H_i, *i_kv, p["image_cross_attn_out"],
                      rngs, deterministic, dtype, tp_mesh)
    C_i = L.layernorm(p["image_cross_ln1"], C_i)
    C_i = C_i + _mlp("image_mlp", C_i)
    C_i = L.layernorm(p["image_cross_ln2"], C_i)
    return C_t, C_i


def _evidence_conditioning(
    p: dict, cfg: ModelConfig, H_t, H_i, E_t, E_i, rngs: _Rngs, deterministic,
    dtype, tp_mesh=None,
):
    """4-path evidence conditioning. Returns ((S_t_t, S_t_i), (S_i_t, S_i_i))."""
    tQ = L.linear(p["text_WQ"], H_t, dtype) if H_t is not None else None
    iQ = L.linear(p["image_WQ"], H_i, dtype) if H_i is not None else None
    etK = L.linear(p["text_evidence_key"], E_t, dtype) if E_t is not None else None
    etV = L.linear(p["text_evidence_value"], E_t, dtype) if E_t is not None else None
    eiK = L.linear(p["image_evidence_key"], E_i, dtype) if E_i is not None else None
    eiV = L.linear(p["image_evidence_value"], E_i, dtype) if E_i is not None else None

    def finish(H, ctx, name, mlp_name):
        """Out-projection + residual/LN/MLP tail of one evidence path."""
        s = L.linear(p[f"{name}_out"], ctx, dtype)
        s = L.layernorm(p[f"{name}_ln1"], H + s)
        s = s + L.mlp(p[mlp_name], s, cfg.dropout, rngs(), deterministic,
                      dtype,
                      fused_ok=not cfg.tensor_parallel or tp_mesh is not None,
                      tp_mesh=tp_mesh if cfg.tensor_parallel else None)
        return L.layernorm(p[f"{name}_ln2"], s)

    def attn_core(Q, K, V):
        return multi_head_attention(
            Q, K, V, cfg.num_heads,
            dropout_rate=cfg.dropout, dropout_rng=rngs(),
            deterministic=deterministic,
            fused=cfg.fused_attn and (not cfg.tensor_parallel
                                      or tp_mesh is not None),
            tp_mesh=tp_mesh if cfg.tensor_parallel else None)

    # NOTE: a merged two-kernel variant (shared-K/V paths with concatenated
    # queries) was built and measured at -8.2% on TPU (BENCHMARKS.md
    # merged_paths_ab, round 4) — deleted; keep the four separate paths.
    def path(H, Q, K, V, name, mlp_name):
        return finish(H, attn_core(Q, K, V), name, mlp_name)

    S_t_t = path(H_t, tQ, etK, etV, "text_text", "text_mlp") \
        if (H_t is not None and E_t is not None) else None
    S_t_i = path(H_t, tQ, eiK, eiV, "text_image", "text_mlp") \
        if (H_t is not None and E_i is not None) else None
    S_i_t = path(H_i, iQ, etK, etV, "image_text", "image_mlp") \
        if (H_i is not None and E_t is not None) else None
    S_i_i = path(H_i, iQ, eiK, eiV, "image_image", "image_mlp") \
        if (H_i is not None and E_i is not None) else None
    return (S_t_t, S_t_i), (S_i_t, S_i_i)


def _classify(p: dict, cfg: ModelConfig, S_t, S_i, rngs: _Rngs, deterministic, dtype):
    fd_ok = not cfg.tensor_parallel  # pallas dropout is not GSPMD-partitionable
    def pool(x):
        return jnp.mean(x.astype(jnp.float32), axis=1).astype(dtype)

    if cfg.factify:
        pooled = [pool(s) for s in (*S_t, *S_i) if s is not None]
        concat = jnp.concatenate(pooled, axis=-1)
        logits = L.head_apply(p["unified_mlp"], concat, cfg.dropout, rngs(),
                              deterministic, dtype, fused_dropout_ok=fd_ok)
        return logits.astype(jnp.float32), None

    def head(name, s):
        if s is None:
            return None
        out = L.head_apply(p[name], pool(s), cfg.dropout, rngs(),
                           deterministic, dtype, fused_dropout_ok=fd_ok)
        return out.astype(jnp.float32)

    (S_t_t, S_t_i), (S_i_t, S_i_i) = S_t, S_i
    # NOTE: a batch-stacked four-heads-as-one-GEMM variant measured +0.3%
    # (noise) on TPU (BENCHMARKS.md merged_paths_ab, round 4) — deleted.
    return (
        (head("mlp_text_given_text", S_t_t), head("mlp_text_given_image", S_t_i)),
        (head("mlp_image_given_text", S_i_t), head("mlp_image_given_image", S_i_i)),
    )


def fusion_forward(
    params: dict,
    cfg: ModelConfig,
    X_t: Optional[jax.Array] = None,
    X_i: Optional[jax.Array] = None,
    E_t: Optional[jax.Array] = None,
    E_i: Optional[jax.Array] = None,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    tp_mesh=None,
):
    """Full model forward.

    Returns, matching the reference's contract (model.py:426-468):
      text_only:  (logits (B, C), None)
      factify:    (logits (B, C), None)
      default:    ((y_t_t, y_t_i), (y_i_t, y_i_i)) each (B, C) or None
    """
    dtype = jnp.dtype(cfg.compute_dtype)
    rngs = _Rngs(rng)
    cast = lambda x: None if x is None else x.astype(dtype)
    X_t, X_i, E_t, E_i = cast(X_t), cast(X_i), cast(E_t), cast(E_i)

    if cfg.text_only:
        H_t, _ = _representation(params["representation"], cfg, X_t, None,
                                 rngs, deterministic, dtype, tp_mesh)
        (S_t_t, _), _ = _evidence_conditioning(
            params["cross_attn"], cfg, H_t, None, E_t, None,
            rngs, deterministic, dtype, tp_mesh)
        pooled = jnp.mean(S_t_t.astype(jnp.float32), axis=1).astype(dtype)
        logits = L.head_apply(params["classifier"]["text_classifier"], pooled,
                              cfg.dropout, rngs(), deterministic, dtype,
                              fused_dropout_ok=not cfg.tensor_parallel)
        return logits.astype(jnp.float32), None

    H_t, H_i = _representation(params["representation"], cfg, X_t, X_i,
                               rngs, deterministic, dtype, tp_mesh)
    S_t, S_i = _evidence_conditioning(params["cross_attn"], cfg, H_t, H_i,
                                      E_t, E_i, rngs, deterministic, dtype,
                                      tp_mesh)
    return _classify(params["classifier"], cfg, S_t, S_i, rngs,
                     deterministic, dtype)


class MisinformationDetectionModel:
    """Convenience bundle of config + init + apply (pure-functional inside)."""

    def __init__(self, cfg: Optional[ModelConfig] = None, **overrides):
        if cfg is None:
            cfg = ModelConfig(**overrides)
        self.cfg = cfg

    def init(self, key: jax.Array) -> dict:
        return init_fusion_params(key, self.cfg)

    def apply(self, params, X_t=None, X_i=None, E_t=None, E_i=None,
              rng=None, deterministic=True):
        return fusion_forward(params, self.cfg, X_t, X_i, E_t, E_i,
                              rng=rng, deterministic=deterministic)

    def param_count(self, params) -> int:
        return sum(x.size for x in jax.tree_util.tree_leaves(params))
