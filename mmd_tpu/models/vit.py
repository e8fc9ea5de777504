"""Frozen image encoder: ViT-class, Swinv2-base output contract.

The reference uses Swinv2-base-patch4-window8-256 purely as a frozen feature
extractor producing last_hidden_state (B, 64, 1024) — 8x8 tokens at 256 px
(reference preprocess_embeddings.py:26-28,83-88; train.py:332). A plain ViT
with 32-px patches on 256-px inputs yields the same 64x1024 token grid in one
stage, maps straight onto the MXU (one big conv + dense attention, no
windowing/shifting bookkeeping), and keeps the downstream contract identical.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from mmd_tpu.models import layers as L
from mmd_tpu.models.transformer import TransformerConfig, encoder_layer, init_layer


@dataclasses.dataclass
class ViTConfig:
    image_size: int = 256
    patch_size: int = 32            # 256/32 = 8 -> 64 tokens
    hidden_size: int = 1024         # Swinv2-base final hidden
    num_layers: int = 12
    num_heads: int = 16
    intermediate_size: int = 4096
    dropout: float = 0.0
    layer_norm_eps: float = 1e-6
    fused_attn: bool = True
    compute_dtype: str = "bfloat16"

    @property
    def num_tokens(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    def block_cfg(self) -> TransformerConfig:
        return TransformerConfig(
            hidden_size=self.hidden_size, num_heads=self.num_heads,
            intermediate_size=self.intermediate_size, dropout=self.dropout,
            layer_norm_eps=self.layer_norm_eps, fused_attn=self.fused_attn,
            compute_dtype=self.compute_dtype,
        )


VIT_TEST = ViTConfig(image_size=32, patch_size=8, hidden_size=32,
                     num_layers=2, num_heads=4, intermediate_size=64,
                     compute_dtype="float32")


def init_vit(key: jax.Array, cfg: ViTConfig) -> dict:
    kp, ke, kl = jax.random.split(key, 3)
    block = cfg.block_cfg()
    keys = jax.random.split(kl, cfg.num_layers)
    patch_dim = 3 * cfg.patch_size * cfg.patch_size
    return {
        "patch_embed": L.linear_init(kp, patch_dim, cfg.hidden_size),
        "pos_embed": jax.random.normal(
            ke, (cfg.num_tokens, cfg.hidden_size)) * 0.02,
        "ln_pre": L.layernorm_init(cfg.hidden_size),
        "ln_post": L.layernorm_init(cfg.hidden_size),
        "layers": [init_layer(k, block) for k in keys],
    }


def patchify(images: jax.Array, patch: int) -> jax.Array:
    """(B, H, W, 3) -> (B, (H/p)*(W/p), 3*p*p). NHWC layout; the patch
    projection then runs as one big matmul on the MXU."""
    b, h, w, c = images.shape
    x = images.reshape(b, h // patch, patch, w // patch, patch, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)          # b, gh, gw, c, p, p
    return x.reshape(b, (h // patch) * (w // patch), c * patch * patch)


def vit_forward(params: dict, cfg: ViTConfig, images: jax.Array) -> jax.Array:
    """(B, H, W, 3) float -> last_hidden_state (B, num_tokens, hidden)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    block = cfg.block_cfg()
    x = patchify(images.astype(dtype), cfg.patch_size)
    x = L.linear(params["patch_embed"], x, dtype)
    x = x + params["pos_embed"].astype(dtype)[None]
    x = L.layernorm(params["ln_pre"], x, cfg.layer_norm_eps)
    for p in params["layers"]:
        x, _ = encoder_layer(p, block, x)
    return L.layernorm(params["ln_post"], x, cfg.layer_norm_eps)
