"""Frozen-encoder asset management.

The reference pulls its frozen encoders from the HF hub at run time
(reference train.py:330-332, preprocess_embeddings.py:24-28). This
environment has no network, so encoders resolve in priority order:

  1. converted HF checkpoints under <assets>/[text_encoder|vit].ckpt
     (orbax dirs produced by tools/convert_hf.py on a machine with weights);
  2. deterministic seeded random init (same seed -> same params, so embed /
     train / eval runs stay mutually consistent without any disk state).

The tokenizer is data-dependent and therefore always persisted
(<assets>/tokenizer.json), trained on first use from the corpus text.
"""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path
from typing import Iterable, Optional

import jax

from mmd_tpu.data.tokenizer import WordPieceTokenizer
from mmd_tpu.models import text_encoder as te
from mmd_tpu.models import vit as V
from mmd_tpu.models.transformer import TransformerConfig


DEFAULT_ASSETS = "assets/encoders"


@dataclasses.dataclass
class FrozenEncoders:
    tokenizer: object         # WordPieceTokenizer, or UnigramTokenizer when
                              # a converted spm vocab is present (same
                              # encode_batch/vocab_size/save contract)
    text_cfg: object          # TransformerConfig (BERT-class) or DebertaConfig
    text_params: dict
    vit_cfg: object           # ViTConfig, or SwinConfig when a converted
    vit_params: dict          # Swinv2 checkpoint is present (both expose
                              # num_tokens/hidden_size/image_size/compute_dtype)


def text_encode(params: dict, cfg, input_ids, attention_mask=None):
    """Dispatch on the text-encoder family: BERT-class generic stack or
    DeBERTa-v2/v3 disentangled attention (converted checkpoints)."""
    from mmd_tpu.models.deberta import DebertaConfig, deberta_encode
    if isinstance(cfg, DebertaConfig):
        return deberta_encode(params, cfg, input_ids, attention_mask)
    return te.encode(params, cfg, input_ids, attention_mask)


def text_encode_parallel(params: dict, cfg, input_ids, attention_mask=None,
                         *, mesh, mode: str):
    """Serve text_encode under a parallelism strategy over `mesh`:

      "tp"  Megatron head/FFN-column split (params must already be
            device-put by tp.shard_encoder; this just runs the encode —
            GSPMD partitions it by the param shardings)
      "pp"  GPipe layer stages over the model axis (BERT/MPNet/DeBERTa)
      "sp"  sequence/context parallel (BERT/MPNet post-LN stacks)

    Same (B, T, D) contract as text_encode; every path is equality-tested
    vs the unsplit forward (tests/test_tp.py, test_pp.py, test_sp.py)."""
    from mmd_tpu.models.deberta import DebertaConfig

    is_deberta = isinstance(cfg, DebertaConfig)
    if mode == "tp":
        return text_encode(params, cfg, input_ids, attention_mask)
    if mode == "pp":
        from mmd_tpu.parallel.pp import (
            pipeline_encode, pipeline_encode_deberta)
        fn = pipeline_encode_deberta if is_deberta else pipeline_encode
        return fn(params, cfg, input_ids, attention_mask, mesh=mesh)
    if mode in ("sp", "sp_ring"):
        from mmd_tpu.parallel.sp import (
            sequence_parallel_encode, sequence_parallel_encode_deberta)
        fn = (sequence_parallel_encode_deberta if is_deberta
              else sequence_parallel_encode)
        return fn(params, cfg, input_ids, attention_mask, mesh=mesh,
                  ring=(mode == "sp_ring"))
    raise ValueError(f"unknown text parallelism mode: {mode!r}")


def image_encode(params: dict, cfg, images):
    """Dispatch on the image-encoder family: ViT substitute or Swinv2 (the
    reference's actual encoder, used when its converted checkpoint is
    present). images (B, H, W, 3) float NHWC -> (B, num_tokens, hidden)."""
    from mmd_tpu.models.swin import SwinConfig, swin_forward
    if isinstance(cfg, SwinConfig):
        return swin_forward(params, cfg, images)
    return V.vit_forward(params, cfg, images)


def _load_ckpt(path: Path):
    if not path.exists():
        return None
    from mmd_tpu.core.checkpoint import load_params
    return load_params(str(path))


def load_or_init_frozen(
    assets_dir: str | os.PathLike = DEFAULT_ASSETS,
    vocab_texts: Optional[Iterable[str]] = None,
    vocab_size: int = 30000,
    seed: int = 0,
    tiny: bool = False,
    reference_families: bool = False,
) -> FrozenEncoders:
    """`reference_families=True` makes the seeded-init fallbacks use the
    reference's ACTUAL encoder architectures (DeBERTa-v3-xsmall disentangled
    attention + Swinv2-base shifted windows — reference train.py:47,
    preprocess_embeddings.py:26-28) instead of the faster BERT-class/ViT
    substitutes, so pipeline measurements price the real encoder math even
    without converted weights. Converted checkpoints still take priority
    either way."""
    assets = Path(assets_dir)
    assets.mkdir(parents=True, exist_ok=True)

    # converted spm-unigram vocab takes priority: it reproduces the
    # reference's DebertaV2Tokenizer ids exactly (exported alongside the
    # DeBERTa checkpoint by tools/convert_hf.py)
    spm_path = assets / "spm.json"
    tok_path = assets / "tokenizer.json"
    if spm_path.exists():
        from mmd_tpu.data.spm import UnigramTokenizer
        tokenizer = UnigramTokenizer.load(spm_path)
    elif tok_path.exists():
        tokenizer = WordPieceTokenizer.load(tok_path)
    else:
        if vocab_texts is None:
            raise FileNotFoundError(
                f"no tokenizer at {tok_path}; pass vocab_texts to train one")
        tokenizer = WordPieceTokenizer.train(vocab_texts, vocab_size)
        tokenizer.save(tok_path)

    if tiny:
        text_cfg = dataclasses.replace(
            te.TINY_TEST, vocab_size=max(tokenizer.vocab_size, 128))
        vit_cfg = V.VIT_TEST
    else:
        text_cfg = dataclasses.replace(
            te.TEXT_ENCODER_XSMALL, vocab_size=tokenizer.vocab_size)
        # converted checkpoints carry their architecture in a sidecar
        vit_cfg_path = assets / "vit_config.json"
        if vit_cfg_path.exists():
            import json
            vit_cfg = V.ViTConfig(**json.loads(vit_cfg_path.read_text()))
        else:
            vit_cfg = V.ViTConfig()

    # converted DeBERTa checkpoint takes priority (the reference's encoder)
    deberta_params = None if tiny else _load_ckpt(assets / "deberta.ckpt")
    if deberta_params is not None:
        import json as _json
        from mmd_tpu.models.deberta import DebertaConfig
        text_cfg = DebertaConfig(
            **_json.loads((assets / "deberta_config.json").read_text()))
        text_params = deberta_params
    elif reference_families and not tiny:
        from mmd_tpu.models import deberta as D
        text_cfg = dataclasses.replace(
            D.DEBERTA_V3_XSMALL, vocab_size=max(tokenizer.vocab_size, 128),
            compute_dtype="bfloat16")
        text_params = D.init_deberta(jax.random.key(seed), text_cfg)
    else:
        text_params = _load_ckpt(assets / "text_encoder.ckpt")
        if text_params is None:
            text_params = te.init_text_encoder(jax.random.key(seed), text_cfg)
    # converted Swinv2 checkpoint takes priority (the reference's encoder)
    vit_params = None if tiny else _load_ckpt(assets / "swinv2.ckpt")
    if vit_params is not None:
        import json as _json
        from mmd_tpu.models.swin import SwinConfig
        vit_cfg = SwinConfig(
            **_json.loads((assets / "swinv2_config.json").read_text()))
    elif reference_families and not tiny:
        from mmd_tpu.models import swin as SW
        vit_cfg = SW.SWIN_BASE_256
        vit_params = SW.init_swin(jax.random.key(seed + 1), vit_cfg)
    else:
        vit_params = _load_ckpt(assets / "vit.ckpt")
        if vit_params is None:
            vit_params = V.init_vit(jax.random.key(seed + 1), vit_cfg)

    return FrozenEncoders(tokenizer, text_cfg, text_params, vit_cfg, vit_params)
