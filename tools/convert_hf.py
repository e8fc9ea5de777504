"""Convert pretrained HF/torchvision checkpoints into mmd_tpu encoder assets.

Run this on a machine WITH network/weights; copy the resulting
assets/encoders/ directory next to the repo on the TPU host. The frozen-
asset resolver (mmd_tpu/models/frozen.py) then picks the converted
checkpoints up automatically.

  python tools/convert_hf.py --text microsoft/deberta-v3-xsmall \
      --image microsoft/swinv2-base-patch4-window8-256 \
      --blip Salesforce/blip-image-captioning-base \
      --resnet --out assets/encoders

Notes:
  * --text dispatches on model_type: DeBERTa-v2/v3 converts EXACTLY into the
    disentangled-attention encoder (models/deberta.py, output-parity-tested
    in tests/test_hf_parity.py); BERT-family maps onto
    models/text_encoder.load_hf_state_dict;
  * --image dispatches on model_type: Swinv2 converts EXACTLY into
    models/swin.py (cosine window attention, continuous position bias —
    output-parity-tested); plain ViT maps onto models/vit.py;
  * torchvision resnet50 maps exactly (models/resnet.load_torchvision_state_dict).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _to_numpy_state_dict(model) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def convert_text(model_id: str, out: Path):
    import dataclasses
    from transformers import AutoConfig, AutoModel, AutoTokenizer

    from mmd_tpu.core.checkpoint import save_params
    from mmd_tpu.models import text_encoder as te
    from mmd_tpu.models.transformer import TransformerConfig

    hf_cfg = AutoConfig.from_pretrained(model_id)
    if hf_cfg.model_type == "deberta-v2":
        return convert_deberta(model_id, out)
    if hf_cfg.model_type == "mpnet":
        # mpnet is the SBERT bi-encoder family; a BERT-branch conversion
        # would silently drop its relative position bias
        return convert_bi_encoder(model_id, out)
    cfg = TransformerConfig(
        vocab_size=hf_cfg.vocab_size, hidden_size=hf_cfg.hidden_size,
        num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        intermediate_size=hf_cfg.intermediate_size,
        max_position=min(getattr(hf_cfg, "max_position_embeddings", 512), 512),
    )
    model = AutoModel.from_pretrained(model_id)
    sd = _to_numpy_state_dict(model)
    # strip common prefixes (deberta., bert., roberta., mpnet.)
    for prefix in ("deberta.", "bert.", "roberta.", "mpnet."):
        if any(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):] if k.startswith(prefix) else k: v
                  for k, v in sd.items()}
            break
    params = te.load_hf_state_dict(sd, cfg)
    save_params(str(out / "text_encoder.ckpt"), params)
    print(f"text encoder converted: {model_id} -> {out}/text_encoder.ckpt "
          f"({cfg.num_layers}L, {cfg.hidden_size}d)")

    # export the HF tokenizer vocab into our WordPiece format when possible
    try:
        tok = AutoTokenizer.from_pretrained(model_id)
        vocab = [None] * len(tok.get_vocab())
        for t, i in tok.get_vocab().items():
            vocab[i] = t
        from mmd_tpu.data.tokenizer import SPECIALS, WordPieceTokenizer
        if all(s in tok.get_vocab() for s in SPECIALS):
            WordPieceTokenizer(vocab).save(out / "tokenizer.json")
            print(f"tokenizer exported ({len(vocab)} tokens)")
        else:
            print("tokenizer NOT exported (non-WordPiece specials); "
                  "train one from the corpus instead")
    except Exception as e:
        print(f"tokenizer export skipped: {e}")


def convert_deberta(model_id: str, out: Path):
    """DeBERTa-v2/v3: exact conversion into the disentangled-attention
    encoder (models/deberta.py), output-parity-tested offline."""
    import dataclasses
    import json

    from transformers import AutoConfig, AutoModel

    from mmd_tpu.core.checkpoint import save_params
    from mmd_tpu.models import deberta as D

    hf_cfg = AutoConfig.from_pretrained(model_id)
    max_rel = getattr(hf_cfg, "max_relative_positions", -1)
    if max_rel < 1:
        max_rel = hf_cfg.max_position_embeddings
    cfg = D.DebertaConfig(
        vocab_size=hf_cfg.vocab_size, hidden_size=hf_cfg.hidden_size,
        num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        intermediate_size=hf_cfg.intermediate_size,
        max_position=max_rel,
        position_buckets=getattr(hf_cfg, "position_buckets", -1),
        layer_norm_eps=hf_cfg.layer_norm_eps,
        share_att_key=getattr(hf_cfg, "share_att_key", False))
    assert cfg.share_att_key, "only share_att_key=True DeBERTa supported (v3)"
    model = AutoModel.from_pretrained(model_id)
    params = D.load_hf_deberta_state_dict(_to_numpy_state_dict(model), cfg)
    save_params(str(out / "deberta.ckpt"), params)
    (out / "deberta_config.json").write_text(
        json.dumps(dataclasses.asdict(cfg), indent=1))
    print(f"deberta converted: {model_id} -> {out}/deberta.ckpt "
          f"({cfg.num_layers}L, {cfg.hidden_size}d, "
          f"buckets {cfg.position_buckets})")

    # export the spm-unigram vocab so runtime tokenization reproduces
    # DebertaV2Tokenizer ids exactly (reference train.py:136-140); parsed
    # with our own ModelProto reader — no sentencepiece needed here either
    try:
        from huggingface_hub import hf_hub_download

        from mmd_tpu.data.spm import UnigramTokenizer
        spm_file = hf_hub_download(model_id, "spm.model")
        tok = UnigramTokenizer.from_spm_model(Path(spm_file).read_bytes())
        tok.save(out / "spm.json")
        print(f"spm tokenizer exported ({len(tok.pieces)} pieces)")
    except Exception as e:
        print(f"spm tokenizer export skipped: {e}")


def convert_vit(model_id: str, out: Path):
    import dataclasses
    import json

    from transformers import ViTModel

    from mmd_tpu.core.checkpoint import save_params
    from mmd_tpu.models import vit as V

    model = ViTModel.from_pretrained(model_id, add_pooling_layer=False)
    hf_cfg = model.config
    cfg = V.ViTConfig(
        image_size=hf_cfg.image_size, patch_size=hf_cfg.patch_size,
        hidden_size=hf_cfg.hidden_size, num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        intermediate_size=hf_cfg.intermediate_size,
        layer_norm_eps=hf_cfg.layer_norm_eps,
        pre_ln=True, embed_ln=False, use_cls=True)
    params = V.load_hf_vit_state_dict(_to_numpy_state_dict(model), cfg)
    save_params(str(out / "vit.ckpt"), params)
    (out / "vit_config.json").write_text(json.dumps(
        {k: v for k, v in dataclasses.asdict(cfg).items()}, indent=1))
    print(f"vit converted: {model_id} -> {out}/vit.ckpt "
          f"({cfg.num_layers}L, {cfg.hidden_size}d, {cfg.num_tokens} tokens)")


def convert_bi_encoder(model_id: str, out: Path):
    """SBERT bi-encoder (multi-qa-mpnet-base-dot-v1 family): exact mpnet
    conversion incl. the shared relative position bias, saved as
    bi_encoder.ckpt for retrieval (reference text2text_retrieval.py:21-22)."""
    import dataclasses
    import json

    from transformers import AutoConfig, AutoModel, AutoTokenizer

    from mmd_tpu.core.checkpoint import save_params
    from mmd_tpu.models import text_encoder as te
    from mmd_tpu.models.transformer import TransformerConfig

    hf_cfg = AutoConfig.from_pretrained(model_id)
    assert hf_cfg.model_type == "mpnet", hf_cfg.model_type
    cfg = TransformerConfig(
        vocab_size=hf_cfg.vocab_size, hidden_size=hf_cfg.hidden_size,
        num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        intermediate_size=hf_cfg.intermediate_size,
        max_position=hf_cfg.max_position_embeddings,
        type_vocab_size=0, layer_norm_eps=hf_cfg.layer_norm_eps,
        relative_bias_buckets=hf_cfg.relative_attention_num_buckets,
        mpnet_positions=True, pad_token_id=hf_cfg.pad_token_id)
    model = AutoModel.from_pretrained(model_id)
    params = te.load_hf_mpnet_state_dict(_to_numpy_state_dict(model), cfg)
    save_params(str(out / "bi_encoder.ckpt"), params)
    (out / "bi_encoder_config.json").write_text(
        json.dumps(dataclasses.asdict(cfg), indent=1))
    # mpnet tokenizer is WordPiece with RoBERTa-style special names; rename
    # the specials to our canonical set (ids are unchanged, so converted
    # weights still line up)
    try:
        tok = AutoTokenizer.from_pretrained(model_id)
        vocab = [None] * len(tok.get_vocab())
        for t, i in tok.get_vocab().items():
            vocab[i] = {"<pad>": "[PAD]", "<unk>": "[UNK]", "<s>": "[CLS]",
                        "</s>": "[SEP]", "<mask>": "[MASK]"}.get(t, t)
        from mmd_tpu.data.tokenizer import WordPieceTokenizer
        WordPieceTokenizer(vocab).save(out / "bi_tokenizer.json")
        print(f"bi-encoder tokenizer exported ({len(vocab)} tokens)")
    except Exception as e:
        print(f"bi-encoder tokenizer export skipped: {e}")
    print(f"bi-encoder converted: {model_id} -> {out}/bi_encoder.ckpt "
          f"({cfg.num_layers}L, {cfg.hidden_size}d, mpnet arch)")


def convert_cross_encoder(model_id: str, out: Path):
    """Cross-encoder re-ranker (ms-marco-MiniLM family,
    BertForSequenceClassification packaging): backbone + pooler +
    classifier, saved as cross_encoder.ckpt (reference
    text2text_retrieval.py:24)."""
    import dataclasses
    import json

    from transformers import AutoConfig, AutoModelForSequenceClassification

    from mmd_tpu.core.checkpoint import save_params
    from mmd_tpu.models import text_encoder as te
    from mmd_tpu.models.transformer import TransformerConfig

    hf_cfg = AutoConfig.from_pretrained(model_id)
    cfg = TransformerConfig(
        vocab_size=hf_cfg.vocab_size, hidden_size=hf_cfg.hidden_size,
        num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        intermediate_size=hf_cfg.intermediate_size,
        max_position=hf_cfg.max_position_embeddings,
        layer_norm_eps=hf_cfg.layer_norm_eps)
    model = AutoModelForSequenceClassification.from_pretrained(model_id)
    params = te.load_hf_cross_encoder_state_dict(
        _to_numpy_state_dict(model), cfg)
    save_params(str(out / "cross_encoder.ckpt"), params)
    (out / "cross_encoder_config.json").write_text(
        json.dumps(dataclasses.asdict(cfg), indent=1))
    print(f"cross-encoder converted: {model_id} -> {out}/cross_encoder.ckpt")


def convert_image(model_id: str, out: Path):
    """Dispatch on the HF image-encoder family."""
    from transformers import AutoConfig

    model_type = AutoConfig.from_pretrained(model_id).model_type
    if model_type == "swinv2":
        return convert_swin(model_id, out)
    if model_type == "vit":
        return convert_vit(model_id, out)
    raise ValueError(f"unsupported image encoder family: {model_type} "
                     "(supported: swinv2, vit)")


def convert_swin(model_id: str, out: Path):
    """Swinv2: exact conversion into the windowed cosine-attention encoder
    (models/swin.py), output-parity-tested offline (the reference's actual
    image encoder, preprocess_embeddings.py:26-28)."""
    import dataclasses
    import json

    from transformers import Swinv2Model

    from mmd_tpu.core.checkpoint import save_params
    from mmd_tpu.models import swin as S

    model = Swinv2Model.from_pretrained(model_id, add_pooling_layer=False)
    cfg = S.config_from_hf(model.config)
    params = S.load_hf_swinv2_state_dict(_to_numpy_state_dict(model), cfg)
    save_params(str(out / "swinv2.ckpt"), params)
    (out / "swinv2_config.json").write_text(
        json.dumps(dataclasses.asdict(cfg), indent=1))
    print(f"swinv2 converted: {model_id} -> {out}/swinv2.ckpt "
          f"(depths {cfg.depths}, {cfg.hidden_size}d, "
          f"{cfg.num_tokens} tokens)")


def convert_resnet(out: Path):
    import torchvision

    from mmd_tpu.core.checkpoint import save_params
    from mmd_tpu.models.resnet import load_torchvision_state_dict

    model = torchvision.models.resnet50(weights="DEFAULT")
    params = load_torchvision_state_dict(_to_numpy_state_dict(model))
    save_params(str(out / "resnet50.ckpt"), params)
    print(f"resnet50 converted -> {out}/resnet50.ckpt")


def convert_blip(model_id: str, out: Path):
    """Salesforce/blip-image-captioning-base -> captioner.ckpt (+ config and
    a WordPiece tokenizer export). Output-parity-tested in
    tests/test_hf_parity.py::test_blip_conversion_output_parity; covers the
    reference's pretrained captioner (src/preprocess/caption.py:10-31)."""
    import dataclasses
    import json

    from transformers import AutoProcessor, BlipForConditionalGeneration

    from mmd_tpu.core.checkpoint import save_params
    from mmd_tpu.models.captioner import blip_config, load_hf_blip_state_dict

    model = BlipForConditionalGeneration.from_pretrained(model_id)
    model.eval()
    hf_cfg = model.config
    cfg = blip_config(hf_cfg.vision_config.to_dict(),
                      hf_cfg.text_config.to_dict())
    sd = _to_numpy_state_dict(model)
    params = load_hf_blip_state_dict(sd, cfg)
    save_params(str(out / "captioner.ckpt"), params)
    with open(out / "captioner_config.json", "w") as f:
        json.dump(dataclasses.asdict(cfg), f)
    print(f"captioner converted: {model_id} -> {out}/captioner.ckpt "
          f"(vision {cfg.vit.num_layers}L/{cfg.vit.hidden_size}d, "
          f"decoder {cfg.decoder.num_layers}L/{cfg.decoder.hidden_size}d)")
    try:
        tok = AutoProcessor.from_pretrained(model_id).tokenizer
        vocab = [None] * len(tok.get_vocab())
        for t, i in tok.get_vocab().items():
            vocab[i] = t
        from mmd_tpu.data.tokenizer import SPECIALS, WordPieceTokenizer
        if all(s in tok.get_vocab() for s in SPECIALS):
            WordPieceTokenizer(vocab).save(out / "tokenizer.json")
            print(f"captioner tokenizer exported ({len(vocab)} tokens)")
    except Exception as e:
        print(f"captioner tokenizer export skipped: {e}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--text", type=str, default=None)
    p.add_argument("--image", type=str, default=None,
                   help="swinv2 or vit model id (dispatches on model_type), "
                        "e.g. microsoft/swinv2-base-patch4-window8-256")
    p.add_argument("--vit", type=str, default=None,
                   help="alias of --image restricted to plain ViT")
    p.add_argument("--bi_encoder", type=str, default=None,
                   help="e.g. sentence-transformers/multi-qa-mpnet-base-dot-v1")
    p.add_argument("--cross_encoder", type=str, default=None,
                   help="e.g. cross-encoder/ms-marco-MiniLM-L-6-v2")
    p.add_argument("--blip", type=str, default=None,
                   help="e.g. Salesforce/blip-image-captioning-base")
    p.add_argument("--resnet", action="store_true")
    p.add_argument("--out", type=str, default="assets/encoders")
    args = p.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    if args.text:
        convert_text(args.text, out)
    if args.image:
        convert_image(args.image, out)
    if args.vit:
        convert_vit(args.vit, out)
    if args.bi_encoder:
        convert_bi_encoder(args.bi_encoder, out)
    if args.cross_encoder:
        convert_cross_encoder(args.cross_encoder, out)
    if args.blip:
        convert_blip(args.blip, out)
    if args.resnet:
        convert_resnet(out)


if __name__ == "__main__":
    main()
