"""Frozen text encoders: claim/document encoder, retrieval bi-encoder,
cross-encoder re-ranker.

Replaces the reference's HF model loads (reference train.py:330-331
DeBERTa-v3-xsmall 384-d; text2text_retrieval.py:21-24 SBERT mpnet 768-d +
MiniLM cross-encoder). Architectures are BERT-class transformer encoders in
JAX with the same dims/contracts; pretrained HF weights convert in via
`load_hf_state_dict` when available (this environment has no network, so
scratch weights + fixed contracts are the default).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mmd_tpu.models import layers as L
from mmd_tpu.models.transformer import (
    TransformerConfig, init_transformer, transformer_forward,
)

# Dim-parity presets (hidden sizes per reference §2.5)
TEXT_ENCODER_XSMALL = TransformerConfig(     # deberta-v3-xsmall contract
    vocab_size=128100, hidden_size=384, num_layers=12, num_heads=6,
    intermediate_size=1536, max_position=512,
)
BI_ENCODER_BASE = TransformerConfig(         # multi-qa-mpnet-base-dot-v1
    vocab_size=30527, hidden_size=768, num_layers=12, num_heads=12,
    intermediate_size=3072, max_position=514, type_vocab_size=0,
    relative_bias_buckets=32, mpnet_positions=True, pad_token_id=1,
    layer_norm_eps=1e-5,                     # true mpnet arch: shared T5-style
)                                            # relative bias, RoBERTa positions
CROSS_ENCODER_MINI = TransformerConfig(      # ms-marco-MiniLM-L-6-v2 contract
    vocab_size=30522, hidden_size=384, num_layers=6, num_heads=12,
    intermediate_size=1536, max_position=512,
)
TINY_TEST = TransformerConfig(
    vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
    intermediate_size=64, max_position=64, compute_dtype="float32",
)


def init_text_encoder(key: jax.Array, cfg: TransformerConfig) -> dict:
    return init_transformer(key, cfg)


def encode(params: dict, cfg: TransformerConfig, input_ids: jax.Array,
           attention_mask: Optional[jax.Array] = None,
           token_type_ids: Optional[jax.Array] = None) -> jax.Array:
    """last_hidden_state (B, T, D) — the embedding the fusion model consumes
    (reference train.py:137 `.last_hidden_state`)."""
    return transformer_forward(params, cfg, input_ids,
                               attention_mask=attention_mask,
                               token_type_ids=token_type_ids)


def mean_pool(hidden: jax.Array, attention_mask: Optional[jax.Array] = None
              ) -> jax.Array:
    """Masked mean pooling (SBERT sentence embedding semantics)."""
    h = hidden.astype(jnp.float32)
    if attention_mask is None:
        return jnp.mean(h, axis=1)
    m = attention_mask[..., None].astype(jnp.float32)
    return (h * m).sum(1) / jnp.maximum(m.sum(1), 1e-9)


def cls_pool(hidden: jax.Array) -> jax.Array:
    return hidden[:, 0].astype(jnp.float32)


# -- Cross-encoder re-ranker ---------------------------------------------------

def init_cross_encoder(key: jax.Array, cfg: TransformerConfig) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "backbone": init_transformer(k1, cfg),
        "scorer": L.linear_init(k2, cfg.hidden_size, 1),
    }


def cross_encoder_score(params: dict, cfg: TransformerConfig,
                        input_ids: jax.Array, attention_mask: jax.Array,
                        token_type_ids: Optional[jax.Array] = None
                        ) -> jax.Array:
    """(B,) relevance score for [CLS] query [SEP] doc [SEP] pair inputs
    (re-rank contract of text2text_retrieval.py:69-95). Converted HF
    cross-encoders (BertForSequenceClassification) carry a pooler
    (dense+tanh on CLS) before the classifier; scratch models score raw
    CLS."""
    hidden = transformer_forward(params["backbone"], cfg, input_ids,
                                 attention_mask=attention_mask,
                                 token_type_ids=token_type_ids)
    pooled = cls_pool(hidden)
    if "pooler" in params:
        pooled = jnp.tanh(L.linear(params["pooler"], pooled, jnp.float32))
    return L.linear(params["scorer"], pooled, jnp.float32)[:, 0]


def load_hf_cross_encoder_state_dict(state_dict: dict,
                                     cfg: TransformerConfig) -> dict:
    """Map a HF BertForSequenceClassification state_dict (the ms-marco
    cross-encoder packaging, reference text2text_retrieval.py:24) onto
    backbone + pooler + classifier. Output-parity-tested."""
    def strip(prefix):
        return {k[len(prefix):]: v for k, v in state_dict.items()
                if k.startswith(prefix)}

    bert = strip("bert.")

    def lin(sd, prefix):
        return {"w": np.asarray(sd[f"{prefix}.weight"]).T.astype(np.float32),
                "b": np.asarray(sd[f"{prefix}.bias"]).astype(np.float32)}

    return {
        "backbone": load_hf_state_dict(bert, cfg),
        "pooler": lin(bert, "pooler.dense"),
        "scorer": lin(state_dict, "classifier"),
    }


# -- HF weight conversion ------------------------------------------------------

def load_hf_state_dict(state_dict: dict, cfg: TransformerConfig) -> dict:
    """Map a HF BERT-family torch state_dict (numpy-converted values) to our
    param tree. Supported naming: bert/mpnet/minilm-style
    `encoder.layer.{i}.attention.self.{query,key,value}` etc. Raises KeyError
    with the missing name when a checkpoint doesn't match."""
    def get(*names):
        for n in names:
            if n in state_dict:
                return np.asarray(state_dict[n])
        raise KeyError(names[0])

    def lin(prefix):
        return {"w": get(f"{prefix}.weight").T.astype(np.float32),
                "b": get(f"{prefix}.bias").astype(np.float32)}

    def ln(prefix):
        return {"scale": get(f"{prefix}.weight").astype(np.float32),
                "bias": get(f"{prefix}.bias").astype(np.float32)}

    emb = {
        "word": get("embeddings.word_embeddings.weight").astype(np.float32),
        "position": get("embeddings.position_embeddings.weight"
                        ).astype(np.float32)[:cfg.max_position],
        "ln": ln("embeddings.LayerNorm"),
    }
    try:
        emb["token_type"] = get("embeddings.token_type_embeddings.weight"
                                ).astype(np.float32)
    except KeyError:
        pass
    layers = []
    for i in range(cfg.num_layers):
        pre = f"encoder.layer.{i}"
        layers.append({
            "q": lin(f"{pre}.attention.self.query"),
            "k": lin(f"{pre}.attention.self.key"),
            "v": lin(f"{pre}.attention.self.value"),
            "attn_out": lin(f"{pre}.attention.output.dense"),
            "ln1": ln(f"{pre}.attention.output.LayerNorm"),
            "ffn_in": lin(f"{pre}.intermediate.dense"),
            "ffn_out": lin(f"{pre}.output.dense"),
            "ln2": ln(f"{pre}.output.LayerNorm"),
        })
    return {"embeddings": emb, "layers": layers}


def load_hf_mpnet_state_dict(state_dict: dict, cfg: TransformerConfig) -> dict:
    """Map a HF MPNetModel torch state_dict (numpy values) onto our tree.
    Requires an mpnet-arch config (relative_bias_buckets=32,
    mpnet_positions=True, pad_token_id=1, type_vocab_size=0) — the
    reference's SBERT bi-encoder family (text2text_retrieval.py:21-22).
    Output-parity-tested in tests/test_hf_parity.py."""
    assert cfg.relative_bias_buckets and cfg.mpnet_positions, (
        "mpnet conversion needs the mpnet-arch TransformerConfig flags")

    def get(name):
        return np.asarray(state_dict[name]).astype(np.float32)

    def lin(prefix):
        return {"w": get(f"{prefix}.weight").T, "b": get(f"{prefix}.bias")}

    def ln(prefix):
        return {"scale": get(f"{prefix}.weight"), "bias": get(f"{prefix}.bias")}

    emb = {
        "word": get("embeddings.word_embeddings.weight"),
        "position": get("embeddings.position_embeddings.weight"
                        )[:cfg.max_position],
        "ln": ln("embeddings.LayerNorm"),
    }
    layers = []
    for i in range(cfg.num_layers):
        pre = f"encoder.layer.{i}"
        layers.append({
            "q": lin(f"{pre}.attention.attn.q"),
            "k": lin(f"{pre}.attention.attn.k"),
            "v": lin(f"{pre}.attention.attn.v"),
            "attn_out": lin(f"{pre}.attention.attn.o"),
            "ln1": ln(f"{pre}.attention.LayerNorm"),
            "ffn_in": lin(f"{pre}.intermediate.dense"),
            "ffn_out": lin(f"{pre}.output.dense"),
            "ln2": ln(f"{pre}.output.LayerNorm"),
        })
    return {"embeddings": emb, "layers": layers,
            "rel_bias": get("encoder.relative_attention_bias.weight")}
