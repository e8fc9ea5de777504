"""Generic functional transformer encoder/decoder stack.

One implementation serves every frozen encoder the pipeline needs
(reference §2.5: DeBERTa-v3-xsmall text encoder, SBERT bi-encoder,
MiniLM cross-encoder, BLIP text decoder): BERT-style post-LN blocks with
learned positions, built on ops.attention (Pallas fused path on TPU).

Decoder mode adds causal self-attention + cross-attention over encoder
states and supports a KV cache for lax.scan autoregressive decode.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from mmd_tpu.models import layers as L
from mmd_tpu.ops.attention import attention_reference, multi_head_attention


@dataclasses.dataclass
class TransformerConfig:
    vocab_size: int = 30522
    hidden_size: int = 384
    num_layers: int = 12
    num_heads: int = 6
    intermediate_size: int = 1536
    max_position: int = 512
    type_vocab_size: int = 2
    dropout: float = 0.1
    layer_norm_eps: float = 1e-7
    is_decoder: bool = False         # causal self-attn + cross-attn
    pre_ln: bool = False             # pre-LN blocks (ViT-style); post-LN = BERT
    encoder_hidden_size: int = 0     # cross-attn K/V input dim (0 = hidden_size)
    fused_attn: bool = True
    compute_dtype: str = "bfloat16"
    # MPNet family (HF modeling_mpnet.py): a T5-style bucketed relative
    # position bias SHARED across all layers (0 = off), and RoBERTa-style
    # position ids counted from pad_token_id+1 over non-pad tokens
    relative_bias_buckets: int = 0
    mpnet_positions: bool = False
    pad_token_id: int = 0
    # Rematerialize each encoder block in the backward pass
    # (jax.checkpoint): only the (B, T, D) block boundaries stay resident
    # between forward and backward; the intra-block activations (FFN
    # hidden at 4x D, attention intermediates) are recomputed per block —
    # ~1 extra forward of FLOPs for an O(intermediate/hidden) cut in peak
    # activation memory. Matters only when gradients flow through the
    # stack (end-to-end fine-tuning, Trainer(finetune=True, remat=True));
    # frozen serving stores no activations either way.
    remat: bool = False

    @property
    def enc_dim(self) -> int:
        return self.encoder_hidden_size or self.hidden_size

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


# ----------------------------------------------------------------------------
# Init
# ----------------------------------------------------------------------------

def _dense_init(key, i, o):
    # BERT-style truncated-normal-ish init; xavier is fine for scratch training
    return L.linear_init(key, i, o)


def init_embeddings(key: jax.Array, cfg: TransformerConfig) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    std = 0.02
    p = {
        "word": jax.random.normal(k1, (cfg.vocab_size, cfg.hidden_size)) * std,
        "position": jax.random.normal(k2, (cfg.max_position, cfg.hidden_size)) * std,
        "ln": L.layernorm_init(cfg.hidden_size),
    }
    if cfg.type_vocab_size:
        p["token_type"] = (
            jax.random.normal(k3, (cfg.type_vocab_size, cfg.hidden_size)) * std
        )
    return p


def init_layer(key: jax.Array, cfg: TransformerConfig) -> dict:
    names = ["q", "k", "v", "attn_out", "ffn_in", "ffn_out"]
    if cfg.is_decoder:
        names += ["xq", "xk", "xv", "xattn_out"]
    keys = jax.random.split(key, len(names))
    d, f = cfg.hidden_size, cfg.intermediate_size
    e = cfg.enc_dim
    dims = {
        "q": (d, d), "k": (d, d), "v": (d, d), "attn_out": (d, d),
        "ffn_in": (d, f), "ffn_out": (f, d),
        "xq": (d, d), "xk": (e, d), "xv": (e, d), "xattn_out": (d, d),
    }
    p = {n: _dense_init(kk, *dims[n]) for kk, n in zip(keys, names)}
    p["ln1"] = L.layernorm_init(d)
    p["ln2"] = L.layernorm_init(d)
    if cfg.is_decoder:
        p["ln_x"] = L.layernorm_init(d)
    return p


def init_transformer(key: jax.Array, cfg: TransformerConfig) -> dict:
    keys = jax.random.split(key, cfg.num_layers + 2)
    p = {
        "embeddings": init_embeddings(keys[0], cfg),
        "layers": [init_layer(k, cfg) for k in keys[1:-1]],
    }
    if cfg.relative_bias_buckets:
        p["rel_bias"] = jax.random.normal(
            keys[-1], (cfg.relative_bias_buckets, cfg.num_heads)) * 0.02
    return p


# ----------------------------------------------------------------------------
# Forward
# ----------------------------------------------------------------------------

def embed(params: dict, cfg: TransformerConfig, input_ids: jax.Array,
          token_type_ids: Optional[jax.Array] = None,
          position_offset: int | jax.Array = 0) -> jax.Array:
    """(B, T) int32 -> (B, T, D). position_offset supports KV-cached decode."""
    e = params["word"][input_ids]
    t = input_ids.shape[1]
    if cfg.mpnet_positions:
        # RoBERTa/MPNet scheme: non-pad tokens numbered pad_id+1, pad_id+2,
        # ...; pad positions get the pad_id row (HF
        # create_position_ids_from_input_ids)
        not_pad = (input_ids != cfg.pad_token_id).astype(jnp.int32)
        pos_ids = jnp.cumsum(not_pad, axis=1) * not_pad + cfg.pad_token_id
        e = e + params["position"][pos_ids]
    else:
        pos = jnp.arange(t) + position_offset
        e = e + params["position"][pos][None, :, :]
    if "token_type" in params:
        # segment 0 by default (HF semantics: token_type_ids default to 0)
        if token_type_ids is None:
            e = e + params["token_type"][0]
        else:
            e = e + params["token_type"][token_type_ids]
    e = L.layernorm(params["ln"], e, cfg.layer_norm_eps)
    return e.astype(jnp.dtype(cfg.compute_dtype))


def _masked_attention(q, k, v, num_heads, mask, fused, key_mask=None):
    """mask: (B, 1, Tq, Tk) additive (-inf for masked) or None. key_mask:
    (B, Tk) {0,1} pure key-padding — stays on the fused kernel path (the
    kernel applies it in-VMEM); only causal/bias masks need the 4D slot."""
    if mask is None:
        return multi_head_attention(q, k, v, num_heads, fused=fused,
                                    key_mask=key_mask)
    # Additive-mask path stays in jnp (fused kernel handles the unmasked
    # fast path; padded batches use this).
    b, t, d = q.shape
    h = num_heads
    dh = d // h
    qh = q.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(b, -1, h, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(b, -1, h, dh).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhtd,bhsd->bhts", qh, kh,
                        preferred_element_type=jnp.float32) / (dh ** 0.5)
    scores = scores + mask
    w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(vh.dtype)
    ctx = jnp.einsum("bhts,bhsd->bhtd", w, vh,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return ctx.transpose(0, 2, 1, 3).reshape(b, t, d)


def encoder_layer(p: dict, cfg: TransformerConfig, x: jax.Array,
                  attn_mask: Optional[jax.Array] = None,
                  encoder_states: Optional[jax.Array] = None,
                  cross_mask: Optional[jax.Array] = None,
                  cache: Optional[dict] = None,
                  key_mask: Optional[jax.Array] = None,
                  cross_key_mask: Optional[jax.Array] = None):
    """Transformer block, post-LN (BERT) or pre-LN (ViT). Returns
    (x, new_cache)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    if cfg.pre_ln:
        assert not cfg.is_decoder, "pre-LN decoder not implemented"
        h = L.layernorm(p["ln1"], x, cfg.layer_norm_eps)
        q = L.linear(p["q"], h, dtype)
        k = L.linear(p["k"], h, dtype)
        v = L.linear(p["v"], h, dtype)
        ctx = _masked_attention(q, k, v, cfg.num_heads, attn_mask,
                                cfg.fused_attn, key_mask=key_mask)
        x = x + L.linear(p["attn_out"], ctx, dtype)
        h = L.layernorm(p["ln2"], x, cfg.layer_norm_eps)
        h = L.linear(p["ffn_in"], h, dtype)
        h = jax.nn.gelu(h, approximate=False)
        x = x + L.linear(p["ffn_out"], h, dtype)
        return x, None
    q = L.linear(p["q"], x, dtype)
    k = L.linear(p["k"], x, dtype)
    v = L.linear(p["v"], x, dtype)
    new_cache = None
    if cache is not None:
        # append current k/v at cache["idx"]
        idx = cache["idx"]
        ck = jax.lax.dynamic_update_slice(cache["k"], k, (0, idx, 0))
        cv = jax.lax.dynamic_update_slice(cache["v"], v, (0, idx, 0))
        k, v = ck, cv
        new_cache = {"k": ck, "v": cv, "idx": idx + x.shape[1]}
    ctx = _masked_attention(q, k, v, cfg.num_heads, attn_mask,
                            cfg.fused_attn, key_mask=key_mask)
    x = L.layernorm(p["ln1"], x + L.linear(p["attn_out"], ctx, dtype),
                    cfg.layer_norm_eps)
    if cfg.is_decoder and encoder_states is not None:
        xq = L.linear(p["xq"], x, dtype)
        xk = L.linear(p["xk"], encoder_states, dtype)
        xv = L.linear(p["xv"], encoder_states, dtype)
        xctx = _masked_attention(xq, xk, xv, cfg.num_heads, cross_mask,
                                 cfg.fused_attn, key_mask=cross_key_mask)
        x = L.layernorm(p["ln_x"], x + L.linear(p["xattn_out"], xctx, dtype),
                        cfg.layer_norm_eps)
    h = L.linear(p["ffn_in"], x, dtype)
    h = jax.nn.gelu(h, approximate=False)
    h = L.linear(p["ffn_out"], h, dtype)
    x = L.layernorm(p["ln2"], x + h, cfg.layer_norm_eps)
    return x, new_cache


def relative_position_bucket(t: int, num_buckets: int = 32,
                             max_distance: int = 128):
    """(t, t) int32 bucket ids, exactly HF
    MPNetEncoder.relative_position_bucket (T5-style: half the buckets for
    each sign, half of those exact, log-spaced beyond)."""
    import numpy as np
    pos = np.arange(t, dtype=np.int64)
    n = pos[:, None] - pos[None, :]        # -(memory - context) = ctx - mem
    num_buckets //= 2
    ret = (n < 0).astype(np.int64) * num_buckets
    n = np.abs(n)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    with np.errstate(divide="ignore"):
        val_if_large = max_exact + (
            np.log(np.maximum(n, 1).astype(np.float32) / max_exact)
            / np.log(max_distance / max_exact) * (num_buckets - max_exact)
        ).astype(np.int64)
    val_if_large = np.minimum(val_if_large, num_buckets - 1)
    ret += np.where(is_small, n, val_if_large)
    return ret.astype(np.int32)


def mpnet_position_bias(params: dict, cfg: TransformerConfig,
                        t: int) -> jax.Array:
    """(1, H, T, T) fp32 additive bias shared by every layer (HF
    MPNetEncoder.compute_position_bias; the bucket count is the table size,
    independent of padding)."""
    idx = jnp.asarray(relative_position_bucket(t, cfg.relative_bias_buckets))
    values = params["rel_bias"].astype(jnp.float32)[idx]   # (T, T, H)
    return values.transpose(2, 0, 1)[None]


def attention_mask_from_ids(attention_mask: jax.Array, tq: int) -> jax.Array:
    """(B, Tk) {0,1} -> additive (B, 1, tq, Tk) mask."""
    neg = jnp.asarray(-1e9, jnp.float32)
    m = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * neg
    return jnp.broadcast_to(m, (attention_mask.shape[0], 1, tq,
                                attention_mask.shape[1]))


def causal_mask(t: int) -> jax.Array:
    m = jnp.tril(jnp.ones((t, t), jnp.float32))
    return (1.0 - m)[None, None, :, :] * -1e9


def transformer_forward(
    params: dict, cfg: TransformerConfig, input_ids: jax.Array,
    attention_mask: Optional[jax.Array] = None,
    token_type_ids: Optional[jax.Array] = None,
    encoder_states: Optional[jax.Array] = None,
    encoder_mask: Optional[jax.Array] = None,
    causal: bool = False,
) -> jax.Array:
    """Full-sequence forward -> last_hidden_state (B, T, D)."""
    x = embed(params["embeddings"], cfg, input_ids, token_type_ids)
    t = x.shape[1]
    mask, key_mask = None, None
    if (attention_mask is not None and not causal
            and not cfg.relative_bias_buckets):
        # pure key-padding stays on the fused kernel path (in-kernel bias)
        key_mask = attention_mask
    elif attention_mask is not None:
        mask = attention_mask_from_ids(attention_mask, t)
    if causal:
        cm = causal_mask(t)
        mask = cm if mask is None else mask + cm
    if cfg.relative_bias_buckets:
        # rides the additive-mask slot ((1,H,T,T) broadcasts against
        # (B,1,T,T)); layers with a bias always take the jnp masked path
        bias = mpnet_position_bias(params, cfg, t)
        mask = bias if mask is None else mask + bias
    def apply_layer(p, x, mask, key_mask, encoder_states, encoder_mask):
        return encoder_layer(p, cfg, x, mask, encoder_states, None,
                             key_mask=key_mask, cross_key_mask=encoder_mask)[0]

    if cfg.remat:
        apply_layer = jax.checkpoint(apply_layer)
    for p in params["layers"]:
        x = apply_layer(p, x, mask, key_mask, encoder_states, encoder_mask)
    return x
