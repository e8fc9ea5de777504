"""Text/image encoder contracts, masking semantics, HF conversion mapping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmd_tpu.models import text_encoder as te
from mmd_tpu.models import vit as V
from mmd_tpu.models.transformer import TransformerConfig, init_transformer


def test_text_encoder_shapes_and_finite(rng):
    cfg = te.TINY_TEST
    params = te.init_text_encoder(jax.random.key(0), cfg)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)), jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32)
    out = te.encode(params, cfg, ids, mask)
    assert out.shape == (2, 16, cfg.hidden_size)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_padding_does_not_change_real_tokens(rng):
    """Encoding [x, PAD...] must equal encoding x alone on the real positions."""
    cfg = te.TINY_TEST
    params = te.init_text_encoder(jax.random.key(1), cfg)
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (1, 8)), jnp.int32)
    padded = jnp.concatenate([ids, jnp.zeros((1, 8), jnp.int32)], axis=1)
    mask = jnp.concatenate([jnp.ones((1, 8), jnp.int32),
                            jnp.zeros((1, 8), jnp.int32)], axis=1)
    out_short = te.encode(params, cfg, ids, jnp.ones((1, 8), jnp.int32))
    out_padded = te.encode(params, cfg, padded, mask)
    np.testing.assert_allclose(np.asarray(out_padded[:, :8]),
                               np.asarray(out_short), rtol=1e-4, atol=1e-5)


def test_mean_pool_respects_mask(rng):
    hidden = jnp.asarray(rng.standard_normal((2, 4, 8)), jnp.float32)
    mask = jnp.asarray([[1, 1, 0, 0], [1, 1, 1, 1]], jnp.int32)
    pooled = te.mean_pool(hidden, mask)
    np.testing.assert_allclose(
        np.asarray(pooled[0]), np.asarray(hidden[0, :2]).mean(0), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(pooled[1]), np.asarray(hidden[1]).mean(0), rtol=1e-6)


def test_cross_encoder_scores(rng):
    cfg = te.TINY_TEST
    params = te.init_cross_encoder(jax.random.key(2), cfg)
    ids, mask, types = np.zeros((3, 16), np.int32), np.ones((3, 16), np.int32), np.zeros((3, 16), np.int32)
    ids[:, :6] = rng.integers(1, cfg.vocab_size, (3, 6))
    s = te.cross_encoder_score(params, cfg, jnp.asarray(ids),
                               jnp.asarray(mask), jnp.asarray(types))
    assert s.shape == (3,) and np.isfinite(np.asarray(s)).all()


def test_vit_contract(rng):
    cfg = V.VIT_TEST
    params = V.init_vit(jax.random.key(3), cfg)
    imgs = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    out = V.vit_forward(params, cfg, imgs)
    assert out.shape == (2, cfg.num_tokens, cfg.hidden_size)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_vit_production_token_count():
    cfg = V.ViTConfig()
    assert cfg.num_tokens == 64 and cfg.hidden_size == 1024


def test_patchify_roundtrip(rng):
    imgs = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
    patches = np.asarray(V.patchify(jnp.asarray(imgs), 4))
    assert patches.shape == (1, 4, 3 * 16)
    # first patch = top-left 4x4 block, channel-major per pixel
    block = imgs[0, :4, :4, :]
    np.testing.assert_allclose(
        patches[0, 0], block.transpose(2, 0, 1).ravel(), rtol=1e-6)


def test_hf_state_dict_conversion(rng):
    """Round-trip: fabricate a BERT-style state dict, convert, check output
    of a known simple case (1 layer, identity-ish weights load in the right
    places)."""
    cfg = TransformerConfig(vocab_size=16, hidden_size=8, num_layers=1,
                            num_heads=2, intermediate_size=16,
                            max_position=8, compute_dtype="float32")
    sd = {}
    def w(shape):
        return rng.standard_normal(shape).astype(np.float32)
    sd["embeddings.word_embeddings.weight"] = w((16, 8))
    sd["embeddings.position_embeddings.weight"] = w((8, 8))
    sd["embeddings.token_type_embeddings.weight"] = w((2, 8))
    sd["embeddings.LayerNorm.weight"] = np.ones(8, np.float32)
    sd["embeddings.LayerNorm.bias"] = np.zeros(8, np.float32)
    for name in ["attention.self.query", "attention.self.key",
                 "attention.self.value", "attention.output.dense"]:
        sd[f"encoder.layer.0.{name}.weight"] = w((8, 8))
        sd[f"encoder.layer.0.{name}.bias"] = w((8,))
    sd["encoder.layer.0.intermediate.dense.weight"] = w((16, 8))
    sd["encoder.layer.0.intermediate.dense.bias"] = w((16,))
    sd["encoder.layer.0.output.dense.weight"] = w((8, 16))
    sd["encoder.layer.0.output.dense.bias"] = w((8,))
    for ln in ["attention.output.LayerNorm", "output.LayerNorm"]:
        sd[f"encoder.layer.0.{ln}.weight"] = np.ones(8, np.float32)
        sd[f"encoder.layer.0.{ln}.bias"] = np.zeros(8, np.float32)

    params = te.load_hf_state_dict(sd, cfg)
    np.testing.assert_array_equal(
        params["embeddings"]["word"], sd["embeddings.word_embeddings.weight"])
    # torch Linear stores (out, in); ours is (in, out)
    np.testing.assert_array_equal(
        params["layers"][0]["q"]["w"],
        sd["encoder.layer.0.attention.self.query.weight"].T)
    ids = jnp.asarray(rng.integers(0, 16, (2, 8)), jnp.int32)
    out = te.encode(params, cfg, ids, jnp.ones((2, 8), jnp.int32))
    assert out.shape == (2, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_swin_forward_shapes_and_finite(rng):
    from mmd_tpu.models import swin as S

    cfg = S.SWIN_TEST
    params = S.init_swin(jax.random.key(0), cfg)
    imgs = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    out = S.swin_forward(params, cfg, imgs)
    assert out.shape == (2, cfg.num_tokens, cfg.hidden_size) == (2, 16, 32)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_swin_shift_invariance_of_plain_windows(rng):
    """A shifted block with shift=0 mask must equal attention over rolled
    windows rolled back: sanity for the roll/partition plumbing — permuting
    batch order of identical images changes nothing."""
    from mmd_tpu.models import swin as S

    cfg = S.SWIN_TEST
    params = S.init_swin(jax.random.key(1), cfg)
    img = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    batch = jnp.asarray(np.concatenate([img, img]), jnp.float32)
    out = np.asarray(S.swin_forward(params, cfg, batch))
    np.testing.assert_allclose(out[0], out[1], rtol=1e-6, atol=1e-6)


def test_frozen_resolver_prefers_converted_swinv2(rng, tmp_path):
    """End-to-end asset path: convert_hf-style Swinv2 save -> frozen resolver
    -> image_encode must reproduce the HF model (the reference's encoder,
    preprocess_embeddings.py:26-28)."""
    torch = pytest.importorskip("torch")
    import dataclasses as dc
    import json

    from transformers import Swinv2Config, Swinv2Model

    from mmd_tpu.core.checkpoint import save_params
    from mmd_tpu.models import swin as S
    from mmd_tpu.models.frozen import image_encode, load_or_init_frozen

    hf = Swinv2Model(Swinv2Config(
        image_size=32, patch_size=4, embed_dim=16, depths=[2, 2],
        num_heads=[2, 4], window_size=4, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, drop_path_rate=0.0),
        add_pooling_layer=False)
    hf.eval()
    cfg = S.config_from_hf(hf.config)
    cfg.compute_dtype = "float32"
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    save_params(str(tmp_path / "swinv2.ckpt"),
                S.load_hf_swinv2_state_dict(sd, cfg))
    (tmp_path / "swinv2_config.json").write_text(
        json.dumps(dc.asdict(cfg), indent=1))

    enc = load_or_init_frozen(tmp_path, vocab_texts=["hello world"] * 4,
                              vocab_size=64)
    assert isinstance(enc.vit_cfg, S.SwinConfig)
    imgs = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    got = np.asarray(image_encode(enc.vit_params, enc.vit_cfg,
                                  jnp.asarray(imgs)))
    with torch.no_grad():
        want = hf(pixel_values=torch.tensor(
            imgs.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)


def test_swin_fused_window_attention_matches_einsum(rng):
    """fused_attn=True routes qualifying blocks (dh >= 32, 64-token
    windows) through the Pallas window-attention kernel — outputs equal
    the einsum path (interpret mode off-TPU). Geometry mirrors Swinv2-base
    stage 0 (window 8, dh 32) including a SHIFTED second block."""
    import dataclasses
    from mmd_tpu.models import swin as S

    cfg = S.SwinConfig(image_size=64, patch_size=4, embed_dim=128,
                       depths=(2,), num_heads=(4,), window_size=8,
                       pretrained_window_sizes=(0,),
                       compute_dtype="float32")
    assert cfg.stage_window_shift(0, 1)[1] > 0   # shifted block exercised
    params = S.init_swin(jax.random.key(3), cfg)
    imgs = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    ref = np.asarray(S.swin_forward(params, cfg, imgs))
    fused = np.asarray(S.swin_forward(
        params, dataclasses.replace(cfg, fused_attn=True), imgs))
    np.testing.assert_allclose(fused, ref, rtol=2e-5, atol=2e-5)


def test_reference_families_resolver(tmp_path):
    """load_or_init_frozen(reference_families=True) seeds the reference's
    actual encoder architectures (DeBERTa + Swinv2) when no converted
    checkpoints exist."""
    from mmd_tpu.models.deberta import DebertaConfig
    from mmd_tpu.models.frozen import load_or_init_frozen
    from mmd_tpu.models.swin import SwinConfig

    enc = load_or_init_frozen(tmp_path, vocab_texts=["some corpus text"],
                              vocab_size=300, reference_families=True)
    assert isinstance(enc.text_cfg, DebertaConfig)
    assert isinstance(enc.vit_cfg, SwinConfig)
    assert enc.text_cfg.vocab_size >= 128
    assert enc.vit_cfg.num_tokens == 64 and enc.vit_cfg.hidden_size == 1024


def test_swin_fused_ln_matches_jnp_layernorm(rng):
    """fused_ln=True routes every LayerNorm (block post-norms + residual
    adds, patch-merge norm, embed/final LN) through the forward-only
    Pallas residual+LN kernel (ops/ln.py) — outputs equal the jnp
    layernorm path (interpret mode off-TPU). Exercised together with the
    fused attention kernel, as served in production."""
    import dataclasses
    from mmd_tpu.models import swin as S

    cfg = S.SwinConfig(image_size=64, patch_size=4, embed_dim=128,
                       depths=(2,), num_heads=(4,), window_size=8,
                       pretrained_window_sizes=(0,),
                       compute_dtype="float32", fused_attn=True)
    params = S.init_swin(jax.random.key(3), cfg)
    imgs = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    ref = np.asarray(S.swin_forward(params, cfg, imgs))
    fused = np.asarray(S.swin_forward(
        params, dataclasses.replace(cfg, fused_ln=True), imgs))
    np.testing.assert_allclose(fused, ref, rtol=2e-5, atol=2e-5)


def test_fused_ln_kernel_matches_layernorm(rng):
    """ops/ln.py::fused_layernorm == layers.layernorm (+ shortcut) on a
    plain (B, T, C) tensor, bf16 and f32, plus the geometry fallback."""
    from mmd_tpu.models import layers as L
    from mmd_tpu.ops.ln import fused_layernorm

    p = {"scale": jnp.asarray(rng.standard_normal(256), jnp.float32),
         "bias": jnp.asarray(rng.standard_normal(256), jnp.float32)}
    y = jnp.asarray(rng.standard_normal((4, 16, 256)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((4, 16, 256)), jnp.float32)
    np.testing.assert_allclose(np.asarray(fused_layernorm(p, y, 1e-5)),
                               np.asarray(L.layernorm(p, y, 1e-5)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(fused_layernorm(p, y, 1e-5, shortcut=x)),
        np.asarray(x + L.layernorm(p, y, 1e-5)), rtol=1e-5, atol=1e-5)
    yb = y.astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(fused_layernorm(p, yb, 1e-5)).astype(np.float32),
        np.asarray(L.layernorm(p, yb, 1e-5)).astype(np.float32),
        rtol=2e-2, atol=2e-2)
    # odd geometry (C not a lane multiple) falls back to the jnp math
    p2 = {"scale": jnp.ones((100,), jnp.float32),
          "bias": jnp.zeros((100,), jnp.float32)}
    y2 = jnp.asarray(rng.standard_normal((3, 100)), jnp.float32)
    np.testing.assert_allclose(np.asarray(fused_layernorm(p2, y2, 1e-5)),
                               np.asarray(L.layernorm(p2, y2, 1e-5)),
                               rtol=1e-5, atol=1e-5)


def test_fused_ln_grads_match_jnp(rng):
    """jax.grad through fused_layernorm (custom VJP, jnp adjoint) equals
    grads of the jnp layernorm composition — params, input, and shortcut
    cotangents."""
    from mmd_tpu.models import layers as L
    from mmd_tpu.ops.ln import fused_layernorm

    p = {"scale": jnp.asarray(rng.standard_normal(128), jnp.float32),
         "bias": jnp.asarray(rng.standard_normal(128), jnp.float32)}
    y = jnp.asarray(rng.standard_normal((2, 8, 128)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 8, 128)), jnp.float32)

    def loss_fused(p, y, x):
        return jnp.sum(fused_layernorm(p, y, 1e-5, shortcut=x) ** 2)

    def loss_ref(p, y, x):
        return jnp.sum((x + L.layernorm(p, y, 1e-5)) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(p, y, x)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(p, y, x)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
