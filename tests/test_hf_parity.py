"""Numeric parity of the HF weight-conversion paths, fully offline:
randomly-initialized HF torch models -> state-dict conversion -> our JAX
implementation must reproduce their outputs."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")


@pytest.fixture(scope="module")
def torch():
    return pytest.importorskip("torch")


def test_bert_conversion_output_parity(torch, rng):
    from transformers import BertConfig, BertModel

    from mmd_tpu.models import text_encoder as te
    from mmd_tpu.models.transformer import TransformerConfig

    hf_cfg = BertConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=48, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, layer_norm_eps=1e-12)
    hf = BertModel(hf_cfg, add_pooling_layer=False)
    hf.eval()

    cfg = TransformerConfig(
        vocab_size=120, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position=48, layer_norm_eps=1e-12,
        compute_dtype="float32", fused_attn=False)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = te.load_hf_state_dict(sd, cfg)

    ids = rng.integers(0, 120, (2, 16)).astype(np.int64)
    mask = np.ones((2, 16), np.int64)
    mask[1, 10:] = 0
    with torch.no_grad():
        want = hf(input_ids=torch.tensor(ids),
                  attention_mask=torch.tensor(mask)
                  ).last_hidden_state.numpy()
    got = np.asarray(te.encode(params, cfg, jnp.asarray(ids, jnp.int32),
                               jnp.asarray(mask, jnp.int32)))
    # padded positions differ (HF still computes them); compare real tokens
    np.testing.assert_allclose(got[0], want[0], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(got[1, :10], want[1, :10], rtol=2e-4, atol=2e-5)


def test_deberta_conversion_output_parity(torch, rng):
    """Disentangled attention (c2p + p2c, log buckets, shared att key) must
    reproduce HF DebertaV2Model outputs on random weights — the reference's
    actual text encoder family (deberta-v3-xsmall flags)."""
    from transformers import DebertaV2Config, DebertaV2Model

    from mmd_tpu.models import deberta as D

    hf_cfg = DebertaV2Config(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=32, relative_attention=True,
        position_buckets=8, norm_rel_ebd="layer_norm", share_att_key=True,
        pos_att_type=["p2c", "c2p"], position_biased_input=False,
        type_vocab_size=0, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, layer_norm_eps=1e-7,
        hidden_act="gelu")
    hf = DebertaV2Model(hf_cfg)
    hf.eval()

    cfg = D.DebertaConfig(vocab_size=120, hidden_size=32, num_layers=2,
                          num_heads=4, intermediate_size=64, max_position=32,
                          position_buckets=8, layer_norm_eps=1e-7)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = D.load_hf_deberta_state_dict(sd, cfg)

    ids = rng.integers(1, 120, (2, 16)).astype(np.int64)
    mask = np.ones((2, 16), np.int64)
    mask[1, 11:] = 0
    with torch.no_grad():
        want = hf(input_ids=torch.tensor(ids),
                  attention_mask=torch.tensor(mask)
                  ).last_hidden_state.numpy()
    got = np.asarray(D.deberta_encode(
        params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)))
    np.testing.assert_allclose(got[0], want[0], rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(got[1, :11], want[1, :11], rtol=3e-4, atol=3e-5)


def test_log_bucket_positions_match_hf(torch):
    import transformers.models.deberta_v2.modeling_deberta_v2 as hf_mod

    from mmd_tpu.models.deberta import build_relative_position
    for (q, bucket, maxp) in [(16, 8, 32), (64, 16, 128), (512, 256, 512)]:
        dummy = torch.zeros(1, q, 4)
        want = hf_mod.build_relative_position(
            dummy, dummy, bucket_size=bucket, max_position=maxp
        )[0].numpy()
        got = build_relative_position(q, q, bucket, maxp)
        np.testing.assert_array_equal(got, want)


def test_vit_conversion_output_parity(torch, rng):
    import dataclasses

    from transformers import ViTConfig as HFViTConfig, ViTModel

    from mmd_tpu.models import vit as V

    hf_cfg = HFViTConfig(
        image_size=32, patch_size=8, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, layer_norm_eps=1e-12,
        hidden_act="gelu")
    hf = ViTModel(hf_cfg, add_pooling_layer=False)
    hf.eval()

    cfg = V.ViTConfig(image_size=32, patch_size=8, hidden_size=32,
                      num_layers=2, num_heads=4, intermediate_size=64,
                      layer_norm_eps=1e-12, compute_dtype="float32",
                      pre_ln=True, embed_ln=False, use_cls=True,
                      fused_attn=False)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = V.load_hf_vit_state_dict(sd, cfg)

    imgs = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = hf(pixel_values=torch.tensor(
            imgs.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
    got = np.asarray(V.vit_forward(params, cfg, jnp.asarray(imgs)))
    # HF output row 0 is the CLS token; ours is the 16-patch grid
    np.testing.assert_allclose(got, want[:, 1:], rtol=3e-4, atol=3e-5)


def test_swinv2_conversion_output_parity(torch, rng):
    """Swinv2 (the reference's actual image encoder family,
    swinv2-base-patch4-window8-256): cosine window attention, continuous
    position bias, shifted windows (incl. HF's double-added mask), post-norm
    blocks, v2 patch merging — must reproduce HF Swinv2Model outputs on
    random weights. Reference preprocess_embeddings.py:26-28."""
    from transformers import Swinv2Config, Swinv2Model

    from mmd_tpu.models import swin as S

    hf_cfg = Swinv2Config(
        image_size=32, patch_size=4, embed_dim=16, depths=[2, 2],
        num_heads=[2, 4], window_size=4, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, drop_path_rate=0.0,
        layer_norm_eps=1e-5, hidden_act="gelu")
    hf = Swinv2Model(hf_cfg, add_pooling_layer=False)
    hf.eval()

    cfg = S.config_from_hf(hf_cfg)
    cfg.compute_dtype = "float32"
    # sanity: stage 0 (res 8 > window 4) must exercise the shifted path
    assert cfg.stage_window_shift(0, 1) == (4, 2)
    assert cfg.stage_window_shift(1, 1) == (4, 0)   # res == window: no shift
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = S.load_hf_swinv2_state_dict(sd, cfg)

    imgs = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = hf(pixel_values=torch.tensor(
            imgs.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
    got = np.asarray(S.swin_forward(params, cfg, jnp.asarray(imgs)))
    assert got.shape == want.shape == (2, 16, 32)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)


def test_mpnet_conversion_output_parity(torch, rng):
    """MPNet (the reference's SBERT bi-encoder family,
    multi-qa-mpnet-base-dot-v1): shared T5-style bucketed relative position
    bias + RoBERTa position ids must reproduce HF MPNetModel outputs on
    random weights. Reference text2text_retrieval.py:21-22."""
    from transformers import MPNetConfig, MPNetModel

    from mmd_tpu.models import text_encoder as te
    from mmd_tpu.models.transformer import TransformerConfig

    hf_cfg = MPNetConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=48, relative_attention_num_buckets=32,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-5)
    hf = MPNetModel(hf_cfg, add_pooling_layer=False)
    hf.eval()

    cfg = TransformerConfig(
        vocab_size=120, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position=48, layer_norm_eps=1e-5,
        type_vocab_size=0, relative_bias_buckets=32, mpnet_positions=True,
        pad_token_id=1, compute_dtype="float32", fused_attn=False)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = te.load_hf_mpnet_state_dict(sd, cfg)

    ids = rng.integers(3, 120, (2, 16)).astype(np.int64)
    mask = np.ones((2, 16), np.int64)
    mask[1, 10:] = 0
    ids[1, 10:] = 1                      # mpnet pad token id = 1
    with torch.no_grad():
        want = hf(input_ids=torch.tensor(ids),
                  attention_mask=torch.tensor(mask)
                  ).last_hidden_state.numpy()
    got = np.asarray(te.encode(params, cfg, jnp.asarray(ids, jnp.int32),
                               jnp.asarray(mask, jnp.int32)))
    np.testing.assert_allclose(got[0], want[0], rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(got[1, :10], want[1, :10], rtol=3e-4, atol=3e-5)


def test_mpnet_bucket_table_matches_hf(torch):
    from transformers.models.mpnet.modeling_mpnet import MPNetEncoder

    from mmd_tpu.models.transformer import relative_position_bucket

    for t in (8, 16, 64, 200, 512):
        pos = torch.arange(t, dtype=torch.long)
        rel = pos[None, :] - pos[:, None]       # memory - context
        want = MPNetEncoder.relative_position_bucket(rel).numpy()
        got = relative_position_bucket(t)
        np.testing.assert_array_equal(got, want)


def test_cross_encoder_conversion_output_parity(torch, rng):
    """ms-marco-MiniLM packaging (BertForSequenceClassification, 1 label):
    backbone + pooler(tanh) + classifier must reproduce HF logits.
    Reference text2text_retrieval.py:24,69-79."""
    from transformers import BertConfig, BertForSequenceClassification

    from mmd_tpu.models import text_encoder as te
    from mmd_tpu.models.transformer import TransformerConfig

    hf_cfg = BertConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=48, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, layer_norm_eps=1e-12,
        num_labels=1, classifier_dropout=0.0)
    hf = BertForSequenceClassification(hf_cfg)
    hf.eval()

    cfg = TransformerConfig(
        vocab_size=120, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position=48, layer_norm_eps=1e-12,
        compute_dtype="float32", fused_attn=False)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = te.load_hf_cross_encoder_state_dict(sd, cfg)

    ids = rng.integers(0, 120, (3, 20)).astype(np.int64)
    mask = np.ones((3, 20), np.int64)
    mask[2, 12:] = 0
    types = np.zeros((3, 20), np.int64)
    types[:, 10:] = 1
    with torch.no_grad():
        want = hf(input_ids=torch.tensor(ids),
                  attention_mask=torch.tensor(mask),
                  token_type_ids=torch.tensor(types)).logits.numpy()[:, 0]
    got = np.asarray(te.cross_encoder_score(
        params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        jnp.asarray(types, jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)


def test_blip_conversion_output_parity(torch, rng):
    """BLIP captioner conversion (vision tower + cross-attending text
    decoder + prediction head) must reproduce HF BlipForConditionalGeneration
    teacher-forced logits on random weights — the reference's pretrained
    captioner (src/preprocess/caption.py:10-31)."""
    from transformers import (
        BlipConfig, BlipForConditionalGeneration, BlipTextConfig,
        BlipVisionConfig,
    )

    from mmd_tpu.models.captioner import (
        blip_config, caption_loss, load_hf_blip_state_dict,
    )
    from mmd_tpu.models import vit as V
    from mmd_tpu.models.captioner import _decoder_stack, _lm_logits
    from mmd_tpu.models.transformer import (
        attention_mask_from_ids, causal_mask, embed,
    )

    vc = BlipVisionConfig(image_size=32, patch_size=8, hidden_size=32,
                          num_hidden_layers=2, num_attention_heads=4,
                          intermediate_size=64, projection_dim=16,
                          attention_dropout=0.0)
    tc = BlipTextConfig(vocab_size=100, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=64,
                        max_position_embeddings=32, encoder_hidden_size=32,
                        projection_dim=16, hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0)
    hf = BlipForConditionalGeneration(
        BlipConfig(text_config=tc.to_dict(), vision_config=vc.to_dict()))
    hf.eval()

    cfg = blip_config(vc.to_dict(), tc.to_dict())
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = load_hf_blip_state_dict(sd, cfg)

    images = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    ids = rng.integers(0, 100, (2, 10)).astype(np.int64)
    mask = np.ones((2, 10), np.int64)

    with torch.no_grad():
        # NCHW for torch
        pix = torch.tensor(images.transpose(0, 3, 1, 2))
        vis = hf.vision_model(pixel_values=pix).last_hidden_state.numpy()
        out = hf.text_decoder(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            encoder_hidden_states=hf.vision_model(
                pixel_values=pix).last_hidden_state,
            encoder_attention_mask=torch.ones(2, vis.shape[1],
                                              dtype=torch.long),
        )
        want_logits = out.logits.numpy()

    # vision tower parity (includes CLS: keep_cls=True)
    got_vis = np.asarray(V.vit_forward(params["vit"], cfg.vit,
                                       jnp.asarray(images)))
    np.testing.assert_allclose(got_vis, vis, rtol=2e-4, atol=2e-5)

    # teacher-forced decoder logits parity
    dcfg = cfg.decoder
    x = embed(params["decoder"]["embeddings"], dcfg,
              jnp.asarray(ids, jnp.int32))
    t = ids.shape[1]
    self_mask = causal_mask(t) + attention_mask_from_ids(
        jnp.asarray(mask, jnp.int32), t)
    h, _ = _decoder_stack(params, dcfg, x, self_mask,
                          jnp.asarray(got_vis), None)
    got_logits = np.asarray(_lm_logits(params, dcfg, h))
    np.testing.assert_allclose(got_logits, want_logits, rtol=2e-4, atol=2e-4)
