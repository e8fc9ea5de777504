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
    pre_ln: bool = True            # standard ViT block order
    embed_ln: bool = True          # LN right after patch embed (scratch
                                   # training aid; HF ViT has none — the
                                   # conversion turns it off)
    use_cls: bool = False          # carry a CLS token through the blocks
                                   # (HF ViT; dropped from the output so the
                                   # (num_tokens, hidden) contract holds)
    keep_cls: bool = False         # keep CLS in the OUTPUT sequence (BLIP's
                                   # decoder cross-attends over all vision
                                   # tokens including CLS)
    remat: bool = False            # jax.checkpoint each block (fine-tuning
                                   # memory lever; exact grads, ~1 extra fwd)

    @property
    def num_tokens(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    def block_cfg(self) -> TransformerConfig:
        return TransformerConfig(
            hidden_size=self.hidden_size, num_heads=self.num_heads,
            intermediate_size=self.intermediate_size, dropout=self.dropout,
            layer_norm_eps=self.layer_norm_eps, fused_attn=self.fused_attn,
            compute_dtype=self.compute_dtype, pre_ln=self.pre_ln,
        )


VIT_TEST = ViTConfig(image_size=32, patch_size=8, hidden_size=32,
                     num_layers=2, num_heads=4, intermediate_size=64,
                     compute_dtype="float32")


def init_vit(key: jax.Array, cfg: ViTConfig) -> dict:
    kp, ke, kl = jax.random.split(key, 3)
    block = cfg.block_cfg()
    keys = jax.random.split(kl, cfg.num_layers)
    patch_dim = 3 * cfg.patch_size * cfg.patch_size
    n_pos = cfg.num_tokens + (1 if cfg.use_cls else 0)
    p = {
        "patch_embed": L.linear_init(kp, patch_dim, cfg.hidden_size),
        "pos_embed": jax.random.normal(
            ke, (n_pos, cfg.hidden_size)) * 0.02,
        "ln_pre": L.layernorm_init(cfg.hidden_size),
        "ln_post": L.layernorm_init(cfg.hidden_size),
        "layers": [init_layer(k, block) for k in keys],
    }
    if cfg.use_cls:
        p["cls_token"] = jnp.zeros((cfg.hidden_size,), jnp.float32)
    return p


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
    if cfg.use_cls:
        cls = jnp.broadcast_to(params["cls_token"].astype(dtype),
                               (x.shape[0], 1, cfg.hidden_size))
        x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(dtype)[None]
    if cfg.embed_ln:
        x = L.layernorm(params["ln_pre"], x, cfg.layer_norm_eps)
    layer_fn = lambda p, x: encoder_layer(p, block, x)[0]
    if cfg.remat:
        layer_fn = jax.checkpoint(layer_fn)
    for p in params["layers"]:
        x = layer_fn(p, x)
    x = L.layernorm(params["ln_post"], x, cfg.layer_norm_eps)
    return x[:, 1:] if (cfg.use_cls and not cfg.keep_cls) else x


def load_hf_vit_state_dict(state_dict: dict, cfg: ViTConfig) -> dict:
    """Map a HF ViTModel torch state_dict (numpy values) onto our tree. Use
    a ViTConfig with use_cls=True, embed_ln=False, pre_ln=True and matching
    image/patch/hidden sizes (the CLS token rides through attention exactly
    as in HF but is dropped from the output grid). The patch-projection
    Conv2d folds into the patchify linear."""
    import numpy as np

    def get(name):
        return np.asarray(state_dict[name])

    def lin(prefix):
        return {"w": get(f"{prefix}.weight").T.astype(np.float32),
                "b": get(f"{prefix}.bias").astype(np.float32)}

    def ln(prefix):
        return {"scale": get(f"{prefix}.weight").astype(np.float32),
                "bias": get(f"{prefix}.bias").astype(np.float32)}

    assert not cfg.embed_ln, "HF ViT has no post-embedding LayerNorm"
    assert cfg.use_cls, "HF ViT parity requires use_cls=True"
    conv = get("embeddings.patch_embeddings.projection.weight")  # (h,3,p,p)
    h = conv.shape[0]
    # our patchify flattens (c, py, px); conv is (h, c, py, px)
    patch_w = conv.reshape(h, -1).T.astype(np.float32)
    patch_b = get("embeddings.patch_embeddings.projection.bias").astype(np.float32)
    pos = get("embeddings.position_embeddings")[0].astype(np.float32)
    p = {
        "patch_embed": {"w": patch_w, "b": patch_b},
        "pos_embed": pos,
        "cls_token": get("embeddings.cls_token")[0, 0].astype(np.float32),
        "ln_pre": {"scale": np.ones(h, np.float32),
                   "bias": np.zeros(h, np.float32)},   # unused (embed_ln=False)
        "ln_post": ln("layernorm"),
        "layers": [],
    }
    for i in range(cfg.num_layers):
        pre = f"encoder.layer.{i}"
        p["layers"].append({
            "q": lin(f"{pre}.attention.attention.query"),
            "k": lin(f"{pre}.attention.attention.key"),
            "v": lin(f"{pre}.attention.attention.value"),
            "attn_out": lin(f"{pre}.attention.output.dense"),
            "ln1": ln(f"{pre}.layernorm_before"),
            "ffn_in": lin(f"{pre}.intermediate.dense"),
            "ffn_out": lin(f"{pre}.output.dense"),
            "ln2": ln(f"{pre}.layernorm_after"),
        })
    return p


def load_hf_blip_vision_state_dict(state_dict: dict, cfg: ViTConfig) -> dict:
    """Map a HF BlipVisionModel state_dict (keys relative to `vision_model.`,
    numpy values) onto our tree. BLIP vision is a pre-LN ViT with a combined
    qkv projection and NO post-embedding LayerNorm; its decoder consumes the
    FULL token sequence including CLS, so use a ViTConfig with use_cls=True,
    keep_cls=True, embed_ln=False, pre_ln=True (reference
    src/preprocess/caption.py:10-31 loads this encoder inside BLIP)."""
    import numpy as np

    def get(name):
        return np.asarray(state_dict[name])

    def ln(prefix):
        return {"scale": get(f"{prefix}.weight").astype(np.float32),
                "bias": get(f"{prefix}.bias").astype(np.float32)}

    assert not cfg.embed_ln and cfg.use_cls and cfg.keep_cls and cfg.pre_ln
    conv = get("embeddings.patch_embedding.weight")        # (h, 3, p, p)
    h = conv.shape[0]
    p = {
        "patch_embed": {
            "w": conv.reshape(h, -1).T.astype(np.float32),
            "b": get("embeddings.patch_embedding.bias").astype(np.float32)},
        "pos_embed": get("embeddings.position_embedding")[0].astype(
            np.float32),
        "cls_token": get("embeddings.class_embedding")[0, 0].astype(
            np.float32),
        "ln_pre": {"scale": np.ones(h, np.float32),
                   "bias": np.zeros(h, np.float32)},   # unused (embed_ln=False)
        "ln_post": ln("post_layernorm"),
        "layers": [],
    }
    for i in range(cfg.num_layers):
        pre = f"encoder.layers.{i}"
        qkv_w = get(f"{pre}.self_attn.qkv.weight").astype(np.float32)  # (3h, h)
        qkv_b = get(f"{pre}.self_attn.qkv.bias").astype(np.float32)
        qw, kw, vw = np.split(qkv_w, 3, axis=0)
        qb, kb, vb = np.split(qkv_b, 3, axis=0)
        p["layers"].append({
            "q": {"w": qw.T, "b": qb},
            "k": {"w": kw.T, "b": kb},
            "v": {"w": vw.T, "b": vb},
            "attn_out": {
                "w": get(f"{pre}.self_attn.projection.weight").T.astype(
                    np.float32),
                "b": get(f"{pre}.self_attn.projection.bias").astype(
                    np.float32)},
            "ln1": ln(f"{pre}.layer_norm1"),
            "ffn_in": {
                "w": get(f"{pre}.mlp.fc1.weight").T.astype(np.float32),
                "b": get(f"{pre}.mlp.fc1.bias").astype(np.float32)},
            "ffn_out": {
                "w": get(f"{pre}.mlp.fc2.weight").T.astype(np.float32),
                "b": get(f"{pre}.mlp.fc2.bias").astype(np.float32)},
            "ln2": ln(f"{pre}.layer_norm2"),
        })
    return p
