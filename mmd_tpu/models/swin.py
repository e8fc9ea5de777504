"""Swinv2 image encoder — the reference's actual frozen image encoder.

The reference embeds images with HF `microsoft/swinv2-base-patch4-window8-256`
and takes `last_hidden_state` of shape (B, 64, 1024) (reference
src/data_loader/preprocess_embeddings.py:26-28,83-88; train.py:332;
evaluate.py:43-45). This module re-derives the Swinv2 math output-exactly
(parity-tested against `transformers.Swinv2Model` on random weights in
tests/test_hf_parity.py) so converted HF checkpoints reproduce the
reference's embeddings.

TPU-first layout decisions:
  * NHWC end to end; the 4x4 patch conv folds into patchify + one matmul
    (MXU), same trick as models/vit.py.
  * window partition/reverse are pure reshape+transpose (no gathers); the
    cyclic shift is two jnp.rolls. All shapes static -> one XLA program.
  * window attention runs as one batched einsum over (B*nW, w*w, C) with
    f32 softmax; at the production sizes (64-token windows) the MXU is fed
    by the (64, head_dim) tiles batched over B*nW*heads, which XLA maps
    well without a custom kernel (this is an offline embed stage).
  * the continuous-position-bias MLP runs on a static (2w-1)^2 x 2 table
    and is gathered with a static index -> XLA folds it to a constant-
    indexed reshape; computed once per layer per call, shared by all
    windows and batch entries.

Swinv2 specifics faithfully reproduced (HF modeling_swinv2.py):
  * cosine attention: L2-normalized q,k; per-head clamped-exp logit scale;
  * post-norm residual order (LN applied to the sublayer OUTPUT);
  * k-projection has no bias (q and v do);
  * continuous relative position bias: 2-layer MLP (2->512->heads) on a
    log-spaced coord table, 16*sigmoid, gathered per token pair;
  * patch merging concat order [x0; x1; x2; x3] = [(0,0),(1,0),(0,1),(1,1)]
    strides, Linear(4C->2C, no bias), THEN LayerNorm(2C) (v2 order);
  * window/shift shrink when resolution <= window (last stage: 8x8 grid,
    window 8 -> plain attention, no shift);
  * the shifted-window additive mask is applied TWICE, replicating the HF
    implementation exactly (modeling_swinv2.py Swinv2SelfAttention.forward
    adds `attention_mask` in two consecutive statements; the pretrained
    weights were trained/served under that -200 mask, so parity keeps it).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mmd_tpu.models import layers as L
from mmd_tpu.models.vit import patchify


@dataclasses.dataclass
class SwinConfig:
    image_size: int = 256
    patch_size: int = 4
    embed_dim: int = 128
    depths: tuple = (2, 2, 18, 2)
    num_heads: tuple = (4, 8, 16, 32)
    window_size: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    layer_norm_eps: float = 1e-5
    pretrained_window_sizes: tuple = (0, 0, 0, 0)
    compute_dtype: str = "bfloat16"
    # Fused Pallas window attention (ops/swin_attention.py): MXU
    # head-packed (every Swinv2-base stage has dh = 32 -> 4 heads per
    # matmul), scores/softmax/context in VMEM. Output-equal to the einsum
    # path; engages per block when the geometry qualifies (dh >= 32,
    # 128 % dh == 0, 64-token windows). Default ON: measured 883 ->
    # 1,203 img/s (-26.6% time) on v5e in benchmarks/bench_swin_ab.py
    # (2026-08-18, 5 interleaved reps, medians — ab_results.json).
    fused_attn: bool = True
    # jax.checkpoint each block across the backward (fine-tuning memory
    # lever: only stage activations stay resident; the window partitions,
    # cosine-attention intermediates, and 4x-MLP hidden recompute per
    # block). Exact same grads, ~1 extra forward.
    remat: bool = False
    # keep the fused window-attention kernel when FINE-TUNING: its
    # hand-derived Pallas backward (ops/swin_attention._bwd_kernel)
    # serves the VJP, CPB grads included. TPU-validated vs a CPU f32
    # oracle (benchmarks/SWIN_BWD_TPU_VALIDATION.json) and
    # interpret-validated (tests/test_swin_bwd.py). Default stays OFF on
    # measurement: the end-to-end fine-tune A/B (swin_fused_train_ab,
    # 2026-08-19) showed -4.8% vs XLA differentiating the einsum path —
    # the bwd kernel's extra VPU passes cost more than the fused forward
    # saves (the trainer gates fused_attn off in finetune when this is
    # False). Serving keeps fused_attn=True (+36% fwd).
    fused_train: bool = False
    # Fused residual+LayerNorm Pallas kernel (ops/ln.py) on the SERVING
    # path: PROFILE_SWIN.json attributes 24% of the forward to XLA's
    # f32-upcast LayerNorm fusions; the kernel computes stats + apply +
    # residual add in one VMEM pass. FORWARD-ONLY (no VJP): the trainer
    # gates it off when fine-tuning; the jnp layernorm keeps serving the
    # differentiable paths. Default ON: measured 1,550 -> 1,621 img/s
    # (-4.4% time, swin_fused_attn_ab fused_ln arm, 2026-08-19).
    fused_ln: bool = True

    def __post_init__(self):
        self.depths = tuple(self.depths)
        self.num_heads = tuple(self.num_heads)
        self.pretrained_window_sizes = tuple(self.pretrained_window_sizes)

    @property
    def num_stages(self) -> int:
        return len(self.depths)

    @property
    def hidden_size(self) -> int:
        """Final-stage channel dim (1024 for swinv2-base)."""
        return int(self.embed_dim * 2 ** (self.num_stages - 1))

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_tokens(self) -> int:
        """Output sequence length (64 for 256px/patch4/4 stages)."""
        return (self.grid_size // 2 ** (self.num_stages - 1)) ** 2

    def stage_dim(self, s: int) -> int:
        return int(self.embed_dim * 2 ** s)

    def stage_res(self, s: int) -> int:
        return self.grid_size // 2 ** s

    def stage_window_shift(self, s: int, block: int) -> tuple[int, int]:
        """(window, shift) after HF's _compute_window_shift shrink rule."""
        res = self.stage_res(s)
        window = min(res, self.window_size)
        shift = 0 if (block % 2 == 0 or res <= window) else window // 2
        return window, shift


SWIN_BASE_256 = SwinConfig()
SWIN_TEST = SwinConfig(image_size=32, patch_size=4, embed_dim=16,
                       depths=(2, 2), num_heads=(2, 4), window_size=4,
                       pretrained_window_sizes=(0, 0),
                       compute_dtype="float32")


# -- static tables -------------------------------------------------------------

def relative_coords_table(window: int, pretrained_window: int) -> np.ndarray:
    """(1, 2w-1, 2w-1, 2) log-spaced normalized coords (HF
    Swinv2SelfAttention.__init__)."""
    rel = np.arange(-(window - 1), window, dtype=np.float32)
    table = np.stack(np.meshgrid(rel, rel, indexing="ij"), axis=-1)[None]
    denom = (pretrained_window - 1) if pretrained_window > 0 else (window - 1)
    if denom > 0:
        table = table / denom
    table = table * 8.0
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8.0)
    return table.astype(np.float32)


def relative_position_index(window: int) -> np.ndarray:
    """(w*w, w*w) indices into the flattened (2w-1)^2 bias table."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))          # (2, w, w)
    flat = coords.reshape(2, -1)                            # (2, w*w)
    rel = flat[:, :, None] - flat[:, None, :]               # (2, n, n)
    rel = rel.transpose(1, 2, 0).copy()
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1).astype(np.int32)


def shift_attn_mask(res: int, window: int, shift: int) -> Optional[np.ndarray]:
    """(nW, w*w, w*w) additive mask (0 / -100) for shifted windows (HF
    Swinv2Layer.get_attn_mask). None when shift == 0."""
    if shift == 0:
        return None
    img = np.zeros((res, res), np.float32)
    slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    count = 0
    for hs in slices:
        for ws in slices:
            img[hs, ws] = count
            count += 1
    nw = res // window
    win = img.reshape(nw, window, nw, window).transpose(0, 2, 1, 3)
    win = win.reshape(-1, window * window)                  # (nW, w*w)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


# -- init ----------------------------------------------------------------------

def _init_block(key: jax.Array, dim: int, heads: int, mlp_ratio: float) -> dict:
    ks = jax.random.split(key, 8)
    inter = int(dim * mlp_ratio)
    return {
        "q": L.linear_init(ks[0], dim, dim),
        "k": {"w": L.xavier_uniform(ks[1], dim, dim)},      # no bias (v2)
        "v": L.linear_init(ks[2], dim, dim),
        "logit_scale": jnp.full((heads,), math.log(10.0), jnp.float32),
        "cpb1": L.linear_init(ks[3], 2, 512),
        "cpb2": {"w": L.xavier_uniform(ks[4], 512, heads)}, # no bias
        "attn_out": L.linear_init(ks[5], dim, dim),
        "ln1": L.layernorm_init(dim),
        "ffn_in": L.linear_init(ks[6], dim, inter),
        "ffn_out": L.linear_init(ks[7], inter, dim),
        "ln2": L.layernorm_init(dim),
    }


def init_swin(key: jax.Array, cfg: SwinConfig) -> dict:
    kp, kr = jax.random.split(key)
    patch_dim = 3 * cfg.patch_size * cfg.patch_size
    p = {
        "patch_embed": L.linear_init(kp, patch_dim, cfg.embed_dim),
        "embed_ln": L.layernorm_init(cfg.embed_dim),
        "stages": [],
        "ln_final": L.layernorm_init(cfg.hidden_size),
    }
    for s in range(cfg.num_stages):
        dim = cfg.stage_dim(s)
        kr, ks = jax.random.split(kr)
        bkeys = jax.random.split(ks, cfg.depths[s] + 1)
        stage = {"blocks": [
            _init_block(bkeys[i], dim, cfg.num_heads[s], cfg.mlp_ratio)
            for i in range(cfg.depths[s])
        ]}
        if s < cfg.num_stages - 1:
            stage["downsample"] = {
                "reduction": {"w": L.xavier_uniform(bkeys[-1], 4 * dim, 2 * dim)},
                "norm": L.layernorm_init(2 * dim),
            }
        p["stages"].append(stage)
    return p


# -- forward -------------------------------------------------------------------

def _window_partition(x: jax.Array, w: int) -> jax.Array:
    """(B, H, W, C) -> (B * nW, w*w, C)."""
    b, h, wd, c = x.shape
    x = x.reshape(b, h // w, w, wd // w, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w * w, c)


def _window_reverse(x: jax.Array, w: int, h: int, wd: int) -> jax.Array:
    """(B * nW, w*w, C) -> (B, H, W, C)."""
    c = x.shape[-1]
    x = x.reshape(-1, h // w, wd // w, w, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, h, wd, c)


def _window_partition_wm(x: jax.Array, w: int) -> jax.Array:
    """(B, H, W, C) -> window-major (nW, B, w*w, C): the Pallas kernels'
    native layout (grid dim 0 = window selects the bias block), produced
    by ONE transpose — the batch-major partition + a per-q/k/v `to_wb`
    transpose used to cost 4 extra copy passes per block (PROFILE_SWIN:
    copy+reshape families were 24% of the forward)."""
    b, h, wd, c = x.shape
    x = x.reshape(b, h // w, w, wd // w, w, c)
    x = x.transpose(1, 3, 0, 2, 4, 5)          # (h/w, wd/w, B, w, w, C)
    return x.reshape(-1, b, w * w, c)


def _window_reverse_wm(x: jax.Array, w: int, h: int, wd: int) -> jax.Array:
    """window-major (nW, B, w*w, C) -> (B, H, W, C)."""
    nw, b, _, c = x.shape
    x = x.reshape(h // w, wd // w, b, w, w, c)
    x = x.transpose(2, 0, 3, 1, 4, 5)
    return x.reshape(b, h, wd, c)


def _position_bias(bp: dict, window: int, pretrained_window: int,
                   heads: int) -> jax.Array:
    """(heads, w*w, w*w) fp32 continuous relative position bias."""
    table = jnp.asarray(relative_coords_table(window, pretrained_window))
    h = jax.nn.relu(L.linear(bp["cpb1"], table, jnp.float32))
    h = jnp.dot(h, bp["cpb2"]["w"].astype(jnp.float32))     # (1,2w-1,2w-1,H)
    flat = h.reshape(-1, heads)
    idx = jnp.asarray(relative_position_index(window).reshape(-1))
    bias = flat[idx].reshape(window * window, window * window, heads)
    return 16.0 * jax.nn.sigmoid(bias.transpose(2, 0, 1))


def _cosine_window_attention(bp: dict, x: jax.Array, heads: int,
                             bias: jax.Array, mask: Optional[jax.Array],
                             batch: int, dtype) -> jax.Array:
    """x (BW, n, C) windows; returns (BW, n, C). Cosine attention with the
    per-head clamped logit scale; mask added twice (HF parity, see module
    docstring)."""
    bw, n, c = x.shape
    dh = c // heads
    q = L.linear(bp["q"], x, dtype)
    k = jnp.dot(x.astype(dtype), bp["k"]["w"].astype(dtype),
                preferred_element_type=jnp.float32).astype(dtype)
    v = L.linear(bp["v"], x, dtype)

    def split(t):
        return t.reshape(bw, n, heads, dh).transpose(0, 2, 1, 3)

    qh = split(q).astype(jnp.float32)
    kh = split(k).astype(jnp.float32)
    qh = qh / jnp.maximum(jnp.linalg.norm(qh, axis=-1, keepdims=True), 1e-12)
    kh = kh / jnp.maximum(jnp.linalg.norm(kh, axis=-1, keepdims=True), 1e-12)
    scores = jnp.einsum("whnd,whmd->whnm", qh.astype(dtype), kh.astype(dtype),
                        preferred_element_type=jnp.float32)
    scale = jnp.exp(jnp.minimum(bp["logit_scale"].astype(jnp.float32),
                                math.log(1.0 / 0.01)))
    scores = scores * scale[None, :, None, None]
    scores = scores + bias[None]
    if mask is not None:
        nw = mask.shape[0]
        # window index = b*nW + w, so tiling the (nW, n, n) mask over the
        # batch lines each window up with its region mask
        m = jnp.tile(mask, (bw // nw, 1, 1))
        scores = scores + 2.0 * m[:, None]                  # HF adds it twice
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("whnm,whmd->whnd", probs.astype(dtype), split(v),
                     preferred_element_type=jnp.float32).astype(dtype)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(bw, n, c)
    return L.linear(bp["attn_out"], ctx, dtype)


_LOG2E = 1.4426950408889634


def _cosine_window_attention_fused(bp: dict, x: jax.Array, heads: int,
                                   bias: jax.Array,
                                   mask: Optional[jax.Array],
                                   dtype, differentiable: bool) -> jax.Array:
    """Same math as _cosine_window_attention through the Pallas kernels.
    x arrives WINDOW-MAJOR (nW, B, n, C) — the kernels' native layout
    (grid dim 0 selects the (nW, h, n, n) bias block), so q/k/v need no
    extra transpose (the former batch-major layout + per-tensor `to_wb`
    transposes cost ~5.5 ms/batch-32 call of copy passes,
    PROFILE_SWIN.json). Two variants:

      * differentiable=False (serving — the default, since fused_train is
        declined at -4.8%): swin_window_attention_infer takes RAW q/k and
        runs the cosine normalize + clamped logit scale in VMEM (measured
        24.65 vs 25.99 ms/call against normalizing outside).
      * differentiable=True (fine-tuning with SwinConfig.fused_train):
        the custom_vjp kernel keeps its pre-normalized contract; the
        normalization/scale stay OUTSIDE where XLA differentiates them."""
    from mmd_tpu.ops.swin_attention import (swin_window_attention,
                                            swin_window_attention_infer)

    nw, b, n, c = x.shape
    dh = c // heads
    q = L.linear(bp["q"], x, dtype)
    k = jnp.dot(x.astype(dtype), bp["k"]["w"].astype(dtype),
                preferred_element_type=jnp.float32).astype(dtype)
    v = L.linear(bp["v"], x, dtype)

    scale = jnp.exp(jnp.minimum(bp["logit_scale"].astype(jnp.float32),
                                math.log(1.0 / 0.01)))
    tot = bias * _LOG2E                                   # (h, n, n)
    if mask is not None:
        tot = tot[None] + (2.0 * _LOG2E) * mask[:, None]  # HF adds it twice
    else:
        tot = jnp.broadcast_to(tot[None], (nw, heads, n, n))

    if differentiable:
        def nrm(t):
            th = t.reshape(nw, b, n, heads, dh).astype(jnp.float32)
            return th / jnp.maximum(
                jnp.linalg.norm(th, axis=-1, keepdims=True), 1e-12)

        qh = (nrm(q) * (scale * _LOG2E)[None, None, None, :, None]
              ).reshape(nw, b, n, c).astype(dtype)
        kh = nrm(k).reshape(nw, b, n, c).astype(dtype)
        out = swin_window_attention(qh, kh, v.astype(dtype), tot, heads)
    else:
        scale_row = jnp.broadcast_to(
            jnp.repeat(scale * _LOG2E, dh)[None], (8, c)).astype(jnp.float32)
        out = swin_window_attention_infer(q.astype(dtype), k, v.astype(dtype),
                                          tot, scale_row, heads)
    return L.linear(bp["attn_out"], out, dtype)


def _fused_ok(window: int, dh: int, heads: int) -> bool:
    """Gate on the ACTUAL group size the kernel will use: _group_size
    shrinks g below 128//dh when heads % (128//dh) != 0 (e.g. heads=3 at
    dh=32 gives g=1), and a bias block with last dim g*n < 128 violates
    the Mosaic last-dim constraint (remote-compile SIGABRT)."""
    from mmd_tpu.ops.swin_attention import _group_size

    n = window * window
    g = _group_size(dh, heads)
    return dh >= 32 and 128 % dh == 0 and n % 8 == 0 and (g * n) % 128 == 0


def _block(bp: dict, x: jax.Array, res: int, heads: int, window: int,
           shift: int, pretrained_window: int, eps: float, dtype,
           fused: bool = False, fused_train: bool = False,
           fused_ln: bool = False) -> jax.Array:
    """One Swinv2 block on (B, res*res, C). Post-norm residual order."""
    b, _, c = x.shape
    shortcut = x
    h = x.reshape(b, res, res, c)
    if shift > 0:
        h = jnp.roll(h, (-shift, -shift), axis=(1, 2))
    bias = _position_bias(bp, window, pretrained_window, heads)
    mask = shift_attn_mask(res, window, shift)
    mask = jnp.asarray(mask) if mask is not None else None
    if fused and _fused_ok(window, c // heads, heads):
        windows = _window_partition_wm(h, window)
        attn = _cosine_window_attention_fused(bp, windows, heads, bias,
                                              mask, dtype,
                                              differentiable=fused_train)
        h = _window_reverse_wm(attn, window, res, res)
    else:
        windows = _window_partition(h, window)
        attn = _cosine_window_attention(bp, windows, heads, bias, mask, b,
                                        dtype)
        h = _window_reverse(attn, window, res, res)
    if shift > 0:
        h = jnp.roll(h, (shift, shift), axis=(1, 2))
    h = h.reshape(b, res * res, c)
    if fused_ln:
        from mmd_tpu.ops.ln import fused_layernorm
        x = fused_layernorm(bp["ln1"], h, eps, shortcut=shortcut)
    else:
        x = shortcut + L.layernorm(bp["ln1"], h, eps)

    # Leave the FFN to XLA: it superfuses dot->GELU->dot into ONE kOutput
    # fusion that keeps the 4x-wide hidden tensor VMEM-resident. The
    # per-op 36 TF/s looks slow against the isolated GEMMs (92+ TF/s)
    # but an optimization_barrier that splits the superfusion measured
    # +1.6% step time (2026-08-19 probe) — the fusion's HBM savings beat
    # the naive-GEMM rate. Don't "fix" this.
    ffn = L.linear(bp["ffn_in"], x, dtype)
    ffn = jax.nn.gelu(ffn, approximate=False)
    ffn = L.linear(bp["ffn_out"], ffn, dtype)
    if fused_ln:
        from mmd_tpu.ops.ln import fused_layernorm
        return fused_layernorm(bp["ln2"], ffn, eps, shortcut=x)
    return x + L.layernorm(bp["ln2"], ffn, eps)


def _patch_merge(dp: dict, x: jax.Array, res: int, eps: float,
                 dtype, fused_ln: bool = False) -> jax.Array:
    """(B, res*res, C) -> (B, (res/2)^2, 2C). Concat order [x0;x1;x2;x3] =
    strides [(0,0),(1,0),(0,1),(1,1)], reduce, THEN norm (v2)."""
    b, _, c = x.shape
    g = x.reshape(b, res, res, c)
    parts = [g[:, 0::2, 0::2], g[:, 1::2, 0::2],
             g[:, 0::2, 1::2], g[:, 1::2, 1::2]]
    h = jnp.concatenate(parts, axis=-1).reshape(b, (res // 2) ** 2, 4 * c)
    h = jnp.dot(h.astype(dtype), dp["reduction"]["w"].astype(dtype),
                preferred_element_type=jnp.float32).astype(dtype)
    if fused_ln:
        from mmd_tpu.ops.ln import fused_layernorm
        return fused_layernorm(dp["norm"], h, eps)
    return L.layernorm(dp["norm"], h, eps)


def swin_forward(params: dict, cfg: SwinConfig, images: jax.Array) -> jax.Array:
    """(B, H, W, 3) float NHWC -> last_hidden_state (B, num_tokens, hidden).

    Matches HF Swinv2Model.forward(pixel_values).last_hidden_state (final
    LayerNorm applied, no pooler)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    eps = cfg.layer_norm_eps
    # fused_ln is forward-only (no VJP); the trainer turns it off for
    # fine-tuning, and remat (a training-only flag) disables it here as a
    # second guard so jax.checkpoint never wraps a non-differentiable op.
    fln = cfg.fused_ln and not cfg.remat
    if fln:
        from mmd_tpu.ops.ln import fused_layernorm
    x = patchify(images.astype(dtype), cfg.patch_size)
    x = L.linear(params["patch_embed"], x, dtype)
    x = (fused_layernorm(params["embed_ln"], x, eps) if fln
         else L.layernorm(params["embed_ln"], x, eps))
    for s in range(cfg.num_stages):
        res = cfg.stage_res(s)
        stage = params["stages"][s]
        for i, bp in enumerate(stage["blocks"]):
            window, shift = cfg.stage_window_shift(s, i)
            blk = lambda bp, x, w=window, sh=shift, r=res, h=cfg.num_heads[s], \
                    pw=cfg.pretrained_window_sizes[s]: _block(
                bp, x, r, h, w, sh, pw, eps, dtype, fused=cfg.fused_attn,
                fused_train=cfg.fused_train, fused_ln=fln)
            if cfg.remat:
                blk = jax.checkpoint(blk)
            x = blk(bp, x)
        if "downsample" in stage:
            x = _patch_merge(stage["downsample"], x, res, eps, dtype,
                             fused_ln=fln)
    return L.layernorm(params["ln_final"], x, eps) if not fln else \
        fused_layernorm(params["ln_final"], x, eps)


# -- HF conversion -------------------------------------------------------------

def config_from_hf(hf_cfg) -> SwinConfig:
    return SwinConfig(
        image_size=hf_cfg.image_size, patch_size=hf_cfg.patch_size,
        embed_dim=hf_cfg.embed_dim, depths=tuple(hf_cfg.depths),
        num_heads=tuple(hf_cfg.num_heads), window_size=hf_cfg.window_size,
        mlp_ratio=hf_cfg.mlp_ratio, qkv_bias=hf_cfg.qkv_bias,
        layer_norm_eps=hf_cfg.layer_norm_eps,
        pretrained_window_sizes=tuple(
            getattr(hf_cfg, "pretrained_window_sizes", None)
            or (0,) * len(hf_cfg.depths)),
    )


def load_hf_swinv2_state_dict(state_dict: dict, cfg: SwinConfig) -> dict:
    """Map a HF Swinv2Model torch state_dict (numpy values) onto our tree.
    Output-exactness is asserted by tests/test_hf_parity.py."""

    def get(name):
        return np.asarray(state_dict[name]).astype(np.float32)

    def lin(prefix):
        return {"w": get(f"{prefix}.weight").T, "b": get(f"{prefix}.bias")}

    def ln(prefix):
        return {"scale": get(f"{prefix}.weight"), "bias": get(f"{prefix}.bias")}

    conv = get("embeddings.patch_embeddings.projection.weight")  # (E,3,p,p)
    e = conv.shape[0]
    p = {
        "patch_embed": {
            "w": conv.reshape(e, -1).T,  # patchify flattens (c, py, px)
            "b": get("embeddings.patch_embeddings.projection.bias"),
        },
        "embed_ln": ln("embeddings.norm"),
        "stages": [],
        "ln_final": ln("layernorm"),
    }
    for s in range(cfg.num_stages):
        sp = f"encoder.layers.{s}"
        stage = {"blocks": []}
        for b in range(cfg.depths[s]):
            bp = f"{sp}.blocks.{b}"
            ap = f"{bp}.attention.self"
            stage["blocks"].append({
                "q": lin(f"{ap}.query"),
                "k": {"w": get(f"{ap}.key.weight").T},
                "v": lin(f"{ap}.value"),
                "logit_scale": get(f"{ap}.logit_scale").reshape(-1),
                "cpb1": lin(f"{ap}.continuous_position_bias_mlp.0"),
                "cpb2": {"w": get(
                    f"{ap}.continuous_position_bias_mlp.2.weight").T},
                "attn_out": lin(f"{bp}.attention.output.dense"),
                "ln1": ln(f"{bp}.layernorm_before"),
                "ffn_in": lin(f"{bp}.intermediate.dense"),
                "ffn_out": lin(f"{bp}.output.dense"),
                "ln2": ln(f"{bp}.layernorm_after"),
            })
        if s < cfg.num_stages - 1:
            stage["downsample"] = {
                "reduction": {"w": get(f"{sp}.downsample.reduction.weight").T},
                "norm": ln(f"{sp}.downsample.norm"),
            }
        p["stages"].append(stage)
    return p
