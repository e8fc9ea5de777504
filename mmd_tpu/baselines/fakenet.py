"""FakeNet (Pre-CoFactv2, AAAI-23 Factify-2 winner) as a JAX baseline.

Re-derives the vendored baseline's architecture (reference
src/baselines/Pre-CoFactv2/model.py:15-235, layers.py:26-96): four
Linear+ReLU embedders, a 16-way grid of cross-attention features built from
SIX shared post-LN attention modules + FFNs (module reuse preserved exactly,
including the crossed pos_ffn pairing at model.py:172-186 where the
image->text attention output goes through the text->image FFN and vice
versa), mean-pool, 16*hidden concat -> fusion -> concat with the 32-d OCR
add_features embedding -> 5-way classifier.

Attention here is the baseline's own post-LN variant (residual+LN INSIDE the
block, bias-free projections, temperature sqrt(d_k)) — distinct from the
main model's stateless MHA — and runs on the same fused attention op.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from mmd_tpu.models import layers as L
from mmd_tpu.ops.attention import multi_head_attention


@dataclasses.dataclass
class FakeNetConfig:
    text_dim: int = 1024      # deberta-large (baseline config.yaml)
    image_dim: int = 1024
    hidden_dim: int = 256
    head: int = 2
    dropout: float = 0.1
    add_feature_dim: int = 32
    num_classes: int = 5
    compute_dtype: str = "bfloat16"


FAKENET_TEST = FakeNetConfig(text_dim=16, image_dim=24, hidden_dim=32,
                             head=2, compute_dtype="float32")


def _nobias_init(key, i, o):
    return {"w": L.xavier_uniform(key, i, o)}


def _attn_init(key, d):
    ks = jax.random.split(key, 4)
    return {
        "w_qs": _nobias_init(ks[0], d, d), "w_ks": _nobias_init(ks[1], d, d),
        "w_vs": _nobias_init(ks[2], d, d), "fc": _nobias_init(ks[3], d, d),
        "ln": L.layernorm_init(d),
    }


def _ffn_init(key, d):
    k1, k2 = jax.random.split(key)
    return {"w1": L.linear_init(k1, d, d * 2), "w2": L.linear_init(k2, d * 2, d),
            "ln": L.layernorm_init(d)}


ATTN_NAMES = (
    "claim_document_text", "claim_document_image",
    "text_image", "image_text",
    "claim_document_text_image", "claim_document_image_text",
)


def init_fakenet(key: jax.Array, cfg: FakeNetConfig) -> dict:
    keys = iter(jax.random.split(key, 32))
    d = cfg.hidden_dim
    p: dict = {
        "text_embedding": L.linear_init(next(keys), cfg.text_dim, d),
        "document_text_embedding": L.linear_init(next(keys), cfg.text_dim, d),
        "image_embedding": L.linear_init(next(keys), cfg.image_dim, d),
        "document_image_embedding": L.linear_init(next(keys), cfg.image_dim, d),
    }
    for name in ATTN_NAMES:
        p[f"{name}_attention"] = _attn_init(next(keys), d)
        p[f"{name}_pos_ffn"] = _ffn_init(next(keys), d)
    p["attention_fusion"] = L.linear_init(next(keys), d * 16, d)
    p["feature_embedding"] = L.linear_init(next(keys), cfg.add_feature_dim, 16)
    p["classifier_fc1"] = L.linear_init(next(keys), 16 + d, 128)
    p["classifier_fc2"] = L.linear_init(next(keys), 128, cfg.num_classes)
    return p


def _nobias(params, x, dtype):
    return jnp.dot(x.astype(dtype), params["w"].astype(dtype),
                   preferred_element_type=jnp.float32).astype(dtype)


def _attn(p, cfg, q, k, v, rngs, deterministic, dtype):
    """Post-LN block: LN(q + dropout(fc(attn(Wq q, Wk k, Wv v))))."""
    residual = q
    qh = _nobias(p["w_qs"], q, dtype)
    kh = _nobias(p["w_ks"], k, dtype)
    vh = _nobias(p["w_vs"], v, dtype)
    ctx = multi_head_attention(
        qh, kh, vh, cfg.head, dropout_rate=cfg.dropout,
        dropout_rng=rngs(), deterministic=deterministic, fused=True)
    out = _nobias(p["fc"], ctx, dtype)
    out = L.dropout(out, cfg.dropout, rngs(), deterministic)
    return L.layernorm(p["ln"], residual + out, eps=1e-6)


def _ffn(p, cfg, x, rngs, deterministic, dtype):
    residual = x
    h = L.linear(p["w2"], jax.nn.gelu(L.linear(p["w1"], x, dtype),
                                      approximate=False), dtype)
    h = L.dropout(h, cfg.dropout, rngs, deterministic)
    return L.layernorm(p["ln"], residual + h, eps=1e-6)


class _Rngs:
    def __init__(self, key):
        self._key, self._i = key, 0

    def __call__(self):
        if self._key is None:
            return None
        self._i += 1
        return jax.random.fold_in(self._key, self._i)


def fakenet_forward(params: dict, cfg: FakeNetConfig,
                    claim_text, claim_image, document_text, document_image,
                    add_feature, rng: Optional[jax.Array] = None,
                    deterministic: bool = True):
    """-> (logits (B, 5), concat_embeddings (B, 16+hidden))."""
    dtype = jnp.dtype(cfg.compute_dtype)
    rngs = _Rngs(rng)

    def emb(name, x):
        return jax.nn.relu(L.linear(params[name], x.astype(dtype), dtype))

    ct = emb("text_embedding", claim_text)
    ci = emb("image_embedding", claim_image)
    dt = emb("document_text_embedding", document_text)
    di = emb("document_image_embedding", document_image)

    def block(attn_name, ffn_name, q, k):
        a = _attn(params[f"{attn_name}_attention"], cfg, q, k, k,
                  rngs, deterministic, dtype)
        return _ffn(params[f"{ffn_name}_pos_ffn"], cfg, a, rngs(),
                    deterministic, dtype)

    # claim-document attentions (shared modules, both directions)
    cd_t = block("claim_document_text", "claim_document_text", ct, dt)
    dc_t = block("claim_document_text", "claim_document_text", dt, ct)
    cd_i = block("claim_document_image", "claim_document_image", ci, di)
    dc_i = block("claim_document_image", "claim_document_image", di, ci)
    # text-image co-attentions (text_image / image_text modules, 3 uses each)
    c_ti = block("text_image", "text_image", ct, ci)
    c_it = block("image_text", "image_text", ci, ct)
    d_ti = block("text_image", "text_image", dt, di)
    d_it = block("image_text", "image_text", di, dt)
    ct_di = block("text_image", "text_image", ct, di)
    ci_dt = block("image_text", "image_text", ci, dt)
    # crossed ffn quirk (reference model.py:172-186)
    di_ct = block("claim_document_image_text", "claim_document_text_image", di, ct)
    dt_ci = block("claim_document_text_image", "claim_document_image_text", dt, ci)

    def pool(x):
        return jnp.mean(x.astype(jnp.float32), axis=1).astype(dtype)

    concat = jnp.concatenate([
        pool(ct), pool(ci), pool(dt), pool(di),
        pool(cd_t), pool(dc_t), pool(cd_i), pool(dc_i),
        pool(c_ti), pool(c_it), pool(d_ti), pool(d_it),
        pool(ct_di), pool(ci_dt), pool(di_ct), pool(dt_ci),
    ], axis=-1)

    fused = jax.nn.relu(L.linear(params["attention_fusion"], concat, dtype))
    feat = jax.nn.relu(L.linear(params["feature_embedding"],
                                add_feature.astype(dtype), dtype))
    concat_emb = jnp.concatenate([fused, feat], axis=-1)
    h = jax.nn.relu(L.linear(params["classifier_fc1"], concat_emb, dtype))
    logits = L.linear(params["classifier_fc2"], h, jnp.float32)
    return logits.astype(jnp.float32), concat_emb
