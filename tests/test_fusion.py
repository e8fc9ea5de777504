"""Golden-parity tests: fusion model vs an independent NumPy oracle.

The oracle re-derives the reference architecture's math
(reference src/model/model.py) directly in NumPy from the same param pytree,
so any divergence in the JAX implementation (layout, dtype, fusion) shows up
as a numeric mismatch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import special  # available via scipy bundled with sklearn deps

from mmd_tpu.core.config import ModelConfig
from mmd_tpu.models.fusion import MisinformationDetectionModel


# ----------------------------- NumPy oracle ---------------------------------

def _lin(p, x):
    return x @ np.asarray(p["w"]) + np.asarray(p["b"])


def _ln(p, x, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * np.asarray(p["scale"]) + np.asarray(p["bias"])


def _gelu(x):
    return 0.5 * x * (1.0 + special.erf(x / np.sqrt(2.0)))


def _mlp(p, x):
    return _lin(p["fc2"], _gelu(_lin(p["fc1"], x)))


def _head(p, x):
    n = len(p)
    for i in range(n):
        x = _lin(p[f"fc{i}"], x)
        if i < n - 1:
            x = np.maximum(x, 0.0)
    return x


def _mha(q, k, v, h):
    b, t, d = q.shape
    s = k.shape[1]
    dh = d // h
    qh = q.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(b, s, h, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(b, s, h, dh).transpose(0, 2, 1, 3)
    sc = qh @ kh.transpose(0, 1, 3, 2) / np.sqrt(dh)
    sc -= sc.max(-1, keepdims=True)
    w = np.exp(sc)
    w /= w.sum(-1, keepdims=True)
    return (w @ vh).transpose(0, 2, 1, 3).reshape(b, t, d)


def oracle_forward(params, cfg: ModelConfig, X_t, X_i, E_t, E_i):
    """Eval-mode (no dropout) forward, default multimodal 4-path mode."""
    r = params["representation"]
    h = cfg.num_heads

    X_t = _lin(r["text_proj"], X_t)
    X_i = _lin(r["image_proj"], X_i)
    tQ, tK, tV = (_lin(r[f"text_W{c}"], X_t) for c in "QKV")
    iQ, iK, iV = (_lin(r[f"image_W{c}"], X_i) for c in "QKV")

    H_t = _ln(r["text_self_ln1"],
              X_t + _lin(r["text_self_attn_out"], _mha(tQ, tK, tV, h)))
    H_i = _ln(r["image_self_ln1"],
              X_i + _lin(r["image_self_attn_out"], _mha(iQ, iK, iV, h)))
    # Parity quirk: second attention reuses same-modality K/V (model.py:106,115)
    C_t = _ln(r["text_cross_ln1"],
              H_t + _lin(r["text_cross_attn_out"], _mha(H_t, tK, tV, h)))
    C_t = _ln(r["text_cross_ln2"], C_t + _mlp(r["text_mlp"], C_t))
    C_i = _ln(r["image_cross_ln1"],
              H_i + _lin(r["image_cross_attn_out"], _mha(H_i, iK, iV, h)))
    C_i = _ln(r["image_cross_ln2"], C_i + _mlp(r["image_mlp"], C_i))

    c = params["cross_attn"]
    tQ2 = _lin(c["text_WQ"], C_t)
    iQ2 = _lin(c["image_WQ"], C_i)
    etK, etV = _lin(c["text_evidence_key"], E_t), _lin(c["text_evidence_value"], E_t)
    eiK, eiV = _lin(c["image_evidence_key"], E_i), _lin(c["image_evidence_value"], E_i)

    def path(H, Q, K, V, name, mlp_name):
        s = _ln(c[f"{name}_ln1"], H + _lin(c[f"{name}_out"], _mha(Q, K, V, h)))
        return _ln(c[f"{name}_ln2"], s + _mlp(c[mlp_name], s))

    S_t_t = path(C_t, tQ2, etK, etV, "text_text", "text_mlp")
    S_t_i = path(C_t, tQ2, eiK, eiV, "text_image", "text_mlp")
    S_i_t = path(C_i, iQ2, etK, etV, "image_text", "image_mlp")
    S_i_i = path(C_i, iQ2, eiK, eiV, "image_image", "image_mlp")

    cl = params["classifier"]
    if cfg.factify:
        concat = np.concatenate(
            [x.mean(1) for x in (S_t_t, S_t_i, S_i_t, S_i_i)], axis=-1)
        return _head(cl["unified_mlp"], concat), None
    return (
        (_head(cl["mlp_text_given_text"], S_t_t.mean(1)),
         _head(cl["mlp_text_given_image"], S_t_i.mean(1))),
        (_head(cl["mlp_image_given_text"], S_i_t.mean(1)),
         _head(cl["mlp_image_given_image"], S_i_i.mean(1))),
    )


def _np_params(params):
    return jax.tree_util.tree_map(np.asarray, params)


def _inputs(rng, b=2, lt=16, li=8, let=12, lei=8, td=384, idim=1024):
    return (
        rng.standard_normal((b, lt, td)).astype(np.float32),
        rng.standard_normal((b, li, idim)).astype(np.float32),
        rng.standard_normal((b, let, td)).astype(np.float32),
        rng.standard_normal((b, lei, idim)).astype(np.float32),
    )


# ------------------------------- tests ---------------------------------------

def _cfg(**kw):
    kw.setdefault("compute_dtype", "float32")
    kw.setdefault("dropout", 0.1)  # inactive when deterministic
    return ModelConfig(**kw)


def test_multimodal_golden_parity(rng):
    cfg = _cfg()
    model = MisinformationDetectionModel(cfg)
    params = model.init(jax.random.key(0))
    X_t, X_i, E_t, E_i = _inputs(rng)
    (y_tt, y_ti), (y_it, y_ii) = model.apply(
        params, jnp.asarray(X_t), jnp.asarray(X_i),
        jnp.asarray(E_t), jnp.asarray(E_i))
    npp = _np_params(params)
    (o_tt, o_ti), (o_it, o_ii) = oracle_forward(npp, cfg, X_t, X_i, E_t, E_i)
    for got, want in [(y_tt, o_tt), (y_ti, o_ti), (y_it, o_it), (y_ii, o_ii)]:
        np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-4)


def test_factify_golden_parity(rng):
    cfg = _cfg(factify=True, num_classes=5)
    model = MisinformationDetectionModel(cfg)
    params = model.init(jax.random.key(1))
    X_t, X_i, E_t, E_i = _inputs(rng)
    logits, none = model.apply(params, jnp.asarray(X_t), jnp.asarray(X_i),
                               jnp.asarray(E_t), jnp.asarray(E_i))
    assert none is None
    want, _ = oracle_forward(_np_params(params), cfg, X_t, X_i, E_t, E_i)
    assert logits.shape == (2, 5)
    np.testing.assert_allclose(np.asarray(logits), want, rtol=5e-4, atol=5e-4)


def test_output_shapes_all_modes(rng):
    X_t, X_i, E_t, E_i = (jnp.asarray(a) for a in _inputs(rng))

    m = MisinformationDetectionModel(_cfg())
    p = m.init(jax.random.key(2))
    (y_tt, y_ti), (y_it, y_ii) = m.apply(p, X_t, X_i, E_t, E_i)
    for y in (y_tt, y_ti, y_it, y_ii):
        assert y.shape == (2, 3)

    m = MisinformationDetectionModel(_cfg(text_only=True))
    p = m.init(jax.random.key(3))
    logits, none = m.apply(p, X_t=X_t, E_t=E_t)
    assert logits.shape == (2, 3) and none is None


def test_unimodal_paths(rng):
    X_t, X_i, E_t, E_i = (jnp.asarray(a) for a in _inputs(rng))
    m = MisinformationDetectionModel(_cfg())
    p = m.init(jax.random.key(4))
    # Text-claim only with text evidence: only the t_t path fires.
    (y_tt, y_ti), (y_it, y_ii) = m.apply(p, X_t=X_t, E_t=E_t)
    assert y_tt is not None and y_tt.shape == (2, 3)
    assert y_ti is None and y_it is None and y_ii is None
    # Image-claim only with image evidence: only the i_i path fires.
    (y_tt, y_ti), (y_it, y_ii) = m.apply(p, X_i=X_i, E_i=E_i)
    assert y_ii is not None and y_ii.shape == (2, 3)
    assert y_tt is None and y_ti is None and y_it is None


def test_bfloat16_close_to_fp32(rng):
    X_t, X_i, E_t, E_i = _inputs(rng)
    cfg32, cfg16 = _cfg(), _cfg(compute_dtype="bfloat16")
    m32 = MisinformationDetectionModel(cfg32)
    params = m32.init(jax.random.key(5))
    out32 = m32.apply(params, *(jnp.asarray(a) for a in (X_t, X_i, E_t, E_i)))
    m16 = MisinformationDetectionModel(cfg16)
    out16 = m16.apply(params, *(jnp.asarray(a) for a in (X_t, X_i, E_t, E_i)))
    flat32 = np.concatenate([np.asarray(x).ravel()
                             for x in jax.tree_util.tree_leaves(out32)])
    flat16 = np.concatenate([np.asarray(x).ravel()
                             for x in jax.tree_util.tree_leaves(out16)])
    # bf16 matmuls: loose tolerance, but must correlate strongly
    assert np.corrcoef(flat32, flat16)[0, 1] > 0.99


def test_dropout_changes_output_and_is_reproducible(rng):
    X_t, X_i, E_t, E_i = (jnp.asarray(a) for a in _inputs(rng))
    m = MisinformationDetectionModel(_cfg(dropout=0.2))
    p = m.init(jax.random.key(6))
    det = m.apply(p, X_t, X_i, E_t, E_i)
    r1 = m.apply(p, X_t, X_i, E_t, E_i, rng=jax.random.key(7), deterministic=False)
    r2 = m.apply(p, X_t, X_i, E_t, E_i, rng=jax.random.key(7), deterministic=False)
    r3 = m.apply(p, X_t, X_i, E_t, E_i, rng=jax.random.key(8), deterministic=False)
    a = np.asarray(det[0][0]); b = np.asarray(r1[0][0])
    assert not np.allclose(a, b)
    np.testing.assert_array_equal(np.asarray(r1[0][0]), np.asarray(r2[0][0]))
    assert not np.allclose(np.asarray(r1[0][0]), np.asarray(r3[0][0]))


def test_param_count_matches_analytic():
    # Default config: embed 256, heads 8, hidden 64, ratio 4, text 384, img 1024
    cfg = _cfg()
    m = MisinformationDetectionModel(cfg)
    p = m.init(jax.random.key(9))
    d, td, idim, hd, c, r = 256, 384, 1024, 64, 3, 4
    lin = lambda i, o: i * o + o
    rep = (lin(td, d) + lin(idim, d) + 10 * lin(d, d)
           + 8 * 2 * d + 2 * (lin(d, d * r) + lin(d * r, d)))
    cross = (2 * lin(d, d) + 2 * lin(td, d) + 2 * lin(idim, d) + 4 * lin(d, d)
             + 8 * 2 * d + 2 * (lin(d, d * r) + lin(d * r, d)))
    heads = 4 * (lin(d, hd) + lin(hd, c))
    assert m.param_count(p) == rep + cross + heads


# (stacked_heads / merged_paths equality tests removed round 5 with the
# variants themselves — both measured as losers on TPU, see BENCHMARKS.md.)
