"""Image captioner: ViT encoder + cross-attending text decoder with
KV-cached greedy decode under lax.scan.

Replaces the reference's BLIP `generate()` usage (reference
src/preprocess/caption.py:10-31, one image at a time through HF generate)
with a batched, fully-compiled autoregressive loop: the image is encoded
once, per-layer self-attention K/V live in preallocated caches, each decode
step is one fused forward of the new token, and the whole loop is a single
lax.scan — no Python in the hot path, fixed shapes, no recompiles across
batches.

No pretrained BLIP weights exist in this environment; the architecture +
training loss (teacher-forced LM) are provided so the captioner can be
trained on (image, caption) pairs, and the caption pipeline is contract-
complete end to end.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from mmd_tpu.models import layers as L
from mmd_tpu.models import vit as V
from mmd_tpu.models.transformer import (
    TransformerConfig, attention_mask_from_ids, causal_mask, embed,
    encoder_layer, init_transformer,
)


@dataclasses.dataclass
class CaptionerConfig:
    vit: V.ViTConfig = dataclasses.field(default_factory=V.ViTConfig)
    decoder: TransformerConfig = dataclasses.field(
        default_factory=lambda: TransformerConfig(
            vocab_size=30000, hidden_size=384, num_layers=6, num_heads=6,
            intermediate_size=1536, max_position=64, type_vocab_size=0,
            is_decoder=True, encoder_hidden_size=1024))
    max_caption_len: int = 32


CAPTIONER_TEST = CaptionerConfig(
    vit=V.VIT_TEST,
    decoder=TransformerConfig(
        vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position=16, type_vocab_size=0,
        is_decoder=True, compute_dtype="float32"),
    max_caption_len=8,
)


def init_captioner(key: jax.Array, cfg: CaptionerConfig) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "vit": V.init_vit(k1, cfg.vit),
        "decoder": init_transformer(k2, cfg.decoder),
        # LM head tied to the word embedding (BLIP-style)
    }


def _decoder_stack(params, dcfg, x, self_mask, enc, cross_mask, caches=None):
    new_caches = []
    for i, p in enumerate(params["decoder"]["layers"]):
        cache = caches[i] if caches is not None else None
        x, nc = encoder_layer(p, dcfg, x, self_mask, enc, cross_mask, cache)
        new_caches.append(nc)
    return x, new_caches


def _lm_logits(params, dcfg, hidden):
    head = params.get("lm_head")
    if head is not None:
        # BERT-style prediction head (BLIP text_decoder.cls.predictions:
        # dense + gelu + LN, then an output projection with bias)
        h = L.linear(head["transform"], hidden.astype(jnp.float32),
                     jnp.float32)
        h = jax.nn.gelu(h, approximate=False)
        h = L.layernorm(head["ln"], h, dcfg.layer_norm_eps)
        return jnp.einsum("btd,vd->btv", h,
                          head["decoder_w"].astype(jnp.float32)
                          ) + head["bias"].astype(jnp.float32)
    w = params["decoder"]["embeddings"]["word"]
    return jnp.einsum("btd,vd->btv", hidden.astype(jnp.float32),
                      w.astype(jnp.float32))


def caption_loss(params: dict, cfg: CaptionerConfig, images: jax.Array,
                 input_ids: jax.Array, attention_mask: jax.Array
                 ) -> jax.Array:
    """Teacher-forced next-token CE. input_ids: (B, T) with BOS...EOS."""
    dcfg = cfg.decoder
    enc = V.vit_forward(params["vit"], cfg.vit, images)
    t = input_ids.shape[1]
    x = embed(params["decoder"]["embeddings"], dcfg, input_ids)
    self_mask = causal_mask(t) + attention_mask_from_ids(attention_mask, t)
    x, _ = _decoder_stack(params, dcfg, x, self_mask, enc, None)
    logits = _lm_logits(params, dcfg, x)[:, :-1]
    targets = input_ids[:, 1:]
    mask = attention_mask[:, 1:].astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]
    return (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def generate(params: dict, cfg: CaptionerConfig, images: jax.Array,
             bos_id: int, eos_id: int, pad_id: int = 0,
             max_new_tokens: Optional[int] = None) -> jax.Array:
    """Greedy batched decode -> (B, max_new_tokens) int32 token ids (padded
    with pad_id after EOS)."""
    dcfg = cfg.decoder
    b = images.shape[0]
    t_max = max_new_tokens or cfg.max_caption_len
    assert t_max <= dcfg.max_position
    dtype = jnp.dtype(dcfg.compute_dtype)

    enc = V.vit_forward(params["vit"], cfg.vit, images)

    d = dcfg.hidden_size
    caches = [
        {"k": jnp.zeros((b, t_max, d), dtype),
         "v": jnp.zeros((b, t_max, d), dtype),
         "idx": jnp.asarray(0, jnp.int32)}
        for _ in range(dcfg.num_layers)
    ]

    def step(carry, pos):
        tokens, caches, done = carry
        cur = tokens  # (B, 1)
        x = embed(params["decoder"]["embeddings"], dcfg, cur,
                  position_offset=pos)
        # self-attn mask over the cache: valid positions are <= pos
        valid = (jnp.arange(t_max) <= pos)
        self_mask = jnp.where(valid, 0.0, -1e9)[None, None, None, :]
        new_caches = []
        h = x
        for i, p in enumerate(params["decoder"]["layers"]):
            c = dict(caches[i])
            c["idx"] = pos
            h, nc = encoder_layer(p, dcfg, h, self_mask, enc, None, c)
            new_caches.append(nc)
        logits = _lm_logits(params, dcfg, h)[:, 0]        # (B, V)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, pad_id, nxt)
        done = done | (nxt == eos_id)
        return (nxt[:, None], new_caches, done), nxt

    init_tokens = jnp.full((b, 1), bos_id, jnp.int32)
    done0 = jnp.zeros((b,), bool)
    (_, _, _), out = jax.lax.scan(
        step, (init_tokens, caches, done0), jnp.arange(t_max))
    return out.T  # (B, t_max)


def load_captioner_assets(assets) -> tuple:
    """(tokenizer, cfg, params) from an assets dir holding tokenizer.json
    and optionally captioner.ckpt + captioner_config.json (written by
    pipelines/train_captioner.py or tools/convert_hf.py --blip). Seeded init
    when no checkpoint exists."""
    import dataclasses as dc
    import json
    from pathlib import Path

    from mmd_tpu.core.checkpoint import load_params
    from mmd_tpu.data.tokenizer import WordPieceTokenizer
    from mmd_tpu.models.transformer import TransformerConfig

    a = Path(assets)
    tok = WordPieceTokenizer.load(a / "tokenizer.json")
    cfg_path = a / "captioner_config.json"
    if cfg_path.exists():
        d = json.loads(cfg_path.read_text())
        cfg = CaptionerConfig(vit=V.ViTConfig(**d["vit"]),
                              decoder=TransformerConfig(**d["decoder"]),
                              max_caption_len=d["max_caption_len"])
    else:
        cfg = dc.replace(
            CAPTIONER_TEST,
            decoder=dc.replace(CAPTIONER_TEST.decoder,
                               vocab_size=tok.vocab_size))
    ckpt = a / "captioner.ckpt"
    if ckpt.exists():
        params = load_params(str(ckpt))
        print(f"[captioner] weights from {ckpt}")
    else:
        params = init_captioner(jax.random.key(21), cfg)
        print("[captioner] no captioner.ckpt — seeded-init weights")
    return tok, cfg, params


def blip_config(vision_cfg: dict, text_cfg: dict) -> CaptionerConfig:
    """CaptionerConfig mirroring a HF BlipConfig (dict forms of the vision
    and text sub-configs)."""
    vit = V.ViTConfig(
        image_size=vision_cfg["image_size"],
        patch_size=vision_cfg["patch_size"],
        hidden_size=vision_cfg["hidden_size"],
        num_layers=vision_cfg["num_hidden_layers"],
        num_heads=vision_cfg["num_attention_heads"],
        intermediate_size=vision_cfg["intermediate_size"],
        layer_norm_eps=vision_cfg.get("layer_norm_eps", 1e-5),
        pre_ln=True, embed_ln=False, use_cls=True, keep_cls=True,
        compute_dtype="float32")
    dec = TransformerConfig(
        vocab_size=text_cfg["vocab_size"],
        hidden_size=text_cfg["hidden_size"],
        num_layers=text_cfg["num_hidden_layers"],
        num_heads=text_cfg["num_attention_heads"],
        intermediate_size=text_cfg["intermediate_size"],
        max_position=text_cfg["max_position_embeddings"],
        type_vocab_size=0, is_decoder=True,
        encoder_hidden_size=vision_cfg["hidden_size"],
        layer_norm_eps=text_cfg.get("layer_norm_eps", 1e-12),
        compute_dtype="float32")
    return CaptionerConfig(vit=vit, decoder=dec,
                           max_caption_len=min(
                               64, text_cfg["max_position_embeddings"]))


def load_hf_blip_state_dict(state_dict: dict, cfg: CaptionerConfig) -> dict:
    """Map a HF BlipForConditionalGeneration state_dict (numpy values) onto
    the captioner tree, EXACTLY (parity test: tests/test_hf_parity.py).
    Covers the reference's pretrained captioner,
    src/preprocess/caption.py:10-31 (Salesforce/blip-image-captioning-base).
    Vision maps via vit.load_hf_blip_vision_state_dict; the text decoder is
    BERT-shaped with per-layer cross-attention; the LM head keeps its
    transform+bias (params['lm_head'])."""
    import numpy as np

    def sub(prefix):
        n = len(prefix)
        return {k[n:]: v for k, v in state_dict.items()
                if k.startswith(prefix)}

    def get(name):
        return np.asarray(state_dict[name])

    def lin(prefix):
        return {"w": get(f"{prefix}.weight").T.astype(np.float32),
                "b": get(f"{prefix}.bias").astype(np.float32)}

    def ln(prefix):
        return {"scale": get(f"{prefix}.weight").astype(np.float32),
                "bias": get(f"{prefix}.bias").astype(np.float32)}

    vit_params = V.load_hf_blip_vision_state_dict(
        sub("vision_model."), cfg.vit)

    emb = "text_decoder.bert.embeddings"
    decoder = {
        "embeddings": {
            "word": get(f"{emb}.word_embeddings.weight").astype(np.float32),
            "position": get(f"{emb}.position_embeddings.weight").astype(
                np.float32),
            "ln": ln(f"{emb}.LayerNorm"),
        },
        "layers": [],
    }
    for i in range(cfg.decoder.num_layers):
        pre = f"text_decoder.bert.encoder.layer.{i}"
        decoder["layers"].append({
            "q": lin(f"{pre}.attention.self.query"),
            "k": lin(f"{pre}.attention.self.key"),
            "v": lin(f"{pre}.attention.self.value"),
            "attn_out": lin(f"{pre}.attention.output.dense"),
            "ln1": ln(f"{pre}.attention.output.LayerNorm"),
            "xq": lin(f"{pre}.crossattention.self.query"),
            "xk": lin(f"{pre}.crossattention.self.key"),
            "xv": lin(f"{pre}.crossattention.self.value"),
            "xattn_out": lin(f"{pre}.crossattention.output.dense"),
            "ln_x": ln(f"{pre}.crossattention.output.LayerNorm"),
            "ffn_in": lin(f"{pre}.intermediate.dense"),
            "ffn_out": lin(f"{pre}.output.dense"),
            "ln2": ln(f"{pre}.output.LayerNorm"),
        })
    return {
        "vit": vit_params,
        "decoder": decoder,
        "lm_head": {
            "transform": lin("text_decoder.cls.predictions.transform.dense"),
            "ln": ln("text_decoder.cls.predictions.transform.LayerNorm"),
            "decoder_w": get("text_decoder.cls.predictions.decoder.weight"
                             ).astype(np.float32),
            "bias": get("text_decoder.cls.predictions.bias").astype(
                np.float32),
        },
    }


def first_token_logits(params: dict, cfg: CaptionerConfig,
                       prompt_ids: jax.Array, prompt_mask: jax.Array,
                       images: Optional[jax.Array] = None) -> jax.Array:
    """(B, V) logits of the FIRST generated token for a left-padded prompt,
    optionally conditioned on an image via cross-attention — the LVLM
    yes/no-token scoring primitive (reference LVLM4FV/models.py:60-73
    softmaxes only the yes/no entries of these logits)."""
    dcfg = cfg.decoder
    enc = (V.vit_forward(params["vit"], cfg.vit, images)
           if images is not None else None)
    plen = prompt_ids.shape[1]
    x = embed(params["decoder"]["embeddings"], dcfg, prompt_ids)
    mask = causal_mask(plen) + attention_mask_from_ids(prompt_mask, plen)
    h, _ = _decoder_stack(params, dcfg, x, mask, enc, None)
    return _lm_logits(params, dcfg, h)[:, -1]


def lm_generate(params: dict, cfg: CaptionerConfig, prompt_ids: jax.Array,
                prompt_mask: jax.Array, eos_id: int, pad_id: int = 0,
                max_new_tokens: Optional[int] = None) -> jax.Array:
    """Text-only causal-LM decode: the captioner's decoder runs WITHOUT
    cross-attention (encoder_states=None skips it) as a plain left-to-right
    LM, so the zero-shot prompting baselines (reference
    src/baselines/kumar_et_al/eval_bloom.py:44-81) can run on in-tree
    decoder weights.

    prompt_ids/prompt_mask: (B, P) LEFT-padded (pads first, all rows end at
    position P-1), so generation starts at one uniform position. One fused
    prefill fills the KV caches, then a lax.scan greedy loop, exactly like
    generate(). Returns (B, max_new_tokens) int32, pad_id after EOS."""
    dcfg = cfg.decoder
    b, plen = prompt_ids.shape
    t_new = max_new_tokens or cfg.max_caption_len
    total = plen + t_new
    assert total <= dcfg.max_position, (total, dcfg.max_position)
    dtype = jnp.dtype(dcfg.compute_dtype)
    d = dcfg.hidden_size

    caches = [
        {"k": jnp.zeros((b, total, d), dtype),
         "v": jnp.zeros((b, total, d), dtype),
         "idx": jnp.asarray(0, jnp.int32)}
        for _ in range(dcfg.num_layers)
    ]

    # prefill: whole prompt in one forward; mask = causal + key-padding over
    # the (total)-sized cache (cols >= plen are unwritten -> masked out)
    cols = jnp.arange(total)
    causal = cols[None, :] <= jnp.arange(plen)[:, None]          # (P, total)
    keymask = jnp.pad(prompt_mask, ((0, 0), (0, t_new)))          # (B, total)
    pre_mask = jnp.where(causal[None, None] & (keymask[:, None, None, :] > 0),
                         0.0, -1e9)
    x = embed(params["decoder"]["embeddings"], dcfg, prompt_ids)
    h = x
    new_caches = []
    for i, p in enumerate(params["decoder"]["layers"]):
        h, nc = encoder_layer(p, dcfg, h, pre_mask, None, None, caches[i])
        new_caches.append(nc)
    first = jnp.argmax(_lm_logits(params, dcfg, h)[:, -1], axis=-1)
    first = first.astype(jnp.int32)

    def step(carry, pos):
        tokens, caches, done = carry
        x = embed(params["decoder"]["embeddings"], dcfg, tokens,
                  position_offset=pos)
        valid = ((cols <= pos) & (keymask > 0)) | ((cols >= plen) & (cols <= pos))
        step_mask = jnp.where(valid, 0.0, -1e9)[:, None, None, :]
        h = x
        ncs = []
        for i, p in enumerate(params["decoder"]["layers"]):
            c = dict(caches[i])
            c["idx"] = pos
            h, nc = encoder_layer(p, dcfg, h, step_mask, None, None, c)
            ncs.append(nc)
        nxt = jnp.argmax(_lm_logits(params, dcfg, h)[:, 0], axis=-1)
        nxt = jnp.where(done, pad_id, nxt.astype(jnp.int32))
        done = done | (nxt == eos_id)
        return (nxt[:, None], ncs, done), nxt

    done0 = first == eos_id
    if t_new > 1:
        (_, _, _), rest = jax.lax.scan(
            step, (first[:, None], new_caches, done0),
            jnp.arange(plen, total - 1))
        out = jnp.concatenate([first[:, None], rest.T], axis=1)
    else:
        out = first[:, None]
    return out  # (B, t_new)
