"""DeBERTa-v2/v3 encoder with disentangled attention, weight-exact with HF.

The reference's actual claim/document encoder is microsoft/deberta-v3-xsmall
(reference train.py:47, preprocess_embeddings.py:24-25). The generic
BERT-class stack (models/transformer.py) matches its dims; THIS module
matches its math exactly — relative-position log buckets, shared-key
content<->position attention terms (c2p + p2c), scale sqrt(3*d_head) — so a
converted deberta-v3 checkpoint reproduces the reference's embeddings.

TPU notes: sequence lengths are static under jit, so the log-bucket relative
position indices are computed in NumPy at trace time and baked as constants;
the c2p/p2c "gathers" become take_along_axis with static index arrays that
XLA lowers to efficient dynamic-slices. deberta-v3 has no absolute position
embeddings (position_biased_input=false) and type_vocab_size=0.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mmd_tpu.models import layers as L


@dataclasses.dataclass
class DebertaConfig:
    vocab_size: int = 128100
    hidden_size: int = 384           # deberta-v3-xsmall
    num_layers: int = 12
    num_heads: int = 6
    intermediate_size: int = 1536
    max_position: int = 512          # max_relative_positions fallback
    position_buckets: int = 256
    layer_norm_eps: float = 1e-7
    share_att_key: bool = True       # v3: pos terms reuse query/key projs
    compute_dtype: str = "float32"
    fused_attn: bool = True          # Pallas disentangled-attention kernel
                                     # on TPU (strided-roll selection);
                                     # jnp one-hot path elsewhere
    remat: bool = False              # jax.checkpoint each layer: keep only
                                     # (B, T, D) block boundaries across the
                                     # backward (fine-tuning memory lever;
                                     # exact same grads, ~1 extra forward)
    fused_train: bool = True         # keep the Pallas kernel when FINE-
                                     # TUNING: the hand-derived backward
                                     # kernel (_deberta_attn_bwd_kernel)
                                     # serves the VJP. TPU-validated vs a
                                     # CPU f32 oracle (benchmarks/
                                     # DEBERTA_BWD_TPU_VALIDATION.json) and
                                     # measured +27% on the fine-tuning
                                     # step (ab_results.json
                                     # deberta_fused_train_ab: 278 -> 381
                                     # samples/s, 2026-08-18)
    # NOTE: no fused_ln here on purpose — routing ln1/ln2 through the
    # Pallas add+LN kernel measured +1.3% serving time
    # (deberta_fused_ln_ab, 2026-08-19): XLA already superfuses the
    # pre-add LN into the adjacent GEMM fusions, and the kernel boundary
    # only breaks that. Swin's LNs are standalone passes, which is why
    # SwinConfig.fused_ln wins there.

    @property
    def pos_ebd_size(self) -> int:
        return (self.position_buckets if self.position_buckets > 0
                else self.max_position)


DEBERTA_V3_XSMALL = DebertaConfig()
DEBERTA_TEST = DebertaConfig(vocab_size=120, hidden_size=32, num_layers=2,
                             num_heads=4, intermediate_size=64,
                             max_position=32, position_buckets=8)


# -- static relative-position tables ------------------------------------------

def make_log_bucket_position(rel_pos: np.ndarray, bucket_size: int,
                             max_position: int) -> np.ndarray:
    """NumPy port of the log-bucket mapping (HF modeling_deberta_v2.py:58-69
    semantics): positions within +-bucket/2 stay linear, beyond that they
    compress logarithmically into the remaining buckets."""
    sign = np.sign(rel_pos)
    mid = bucket_size // 2
    abs_pos = np.where((rel_pos < mid) & (rel_pos > -mid),
                       mid - 1, np.abs(rel_pos)).astype(np.float64)
    log_pos = (np.ceil(np.log(abs_pos / mid)
                       / math.log((max_position - 1) / mid) * (mid - 1))
               + mid)
    return np.where(np.abs(rel_pos) <= mid, rel_pos, (log_pos * sign)
                    ).astype(np.int64)


def build_relative_position(q_len: int, k_len: int, bucket_size: int,
                            max_position: int) -> np.ndarray:
    rel = np.arange(q_len)[:, None] - np.arange(k_len)[None, :]
    if bucket_size > 0 and max_position > 0:
        rel = make_log_bucket_position(rel, bucket_size, max_position)
    return rel.astype(np.int64)


# -- init ----------------------------------------------------------------------

def init_deberta(key: jax.Array, cfg: DebertaConfig) -> dict:
    keys = jax.random.split(key, cfg.num_layers + 2)
    std = 0.02
    p = {
        "embeddings": {
            "word": jax.random.normal(
                keys[0], (cfg.vocab_size, cfg.hidden_size)) * std,
            "ln": L.layernorm_init(cfg.hidden_size),
        },
        "rel_embeddings": jax.random.normal(
            keys[1], (cfg.pos_ebd_size * 2, cfg.hidden_size)) * std,
        "rel_ln": L.layernorm_init(cfg.hidden_size),
        "layers": [],
    }
    d, f = cfg.hidden_size, cfg.intermediate_size
    for k in keys[2:]:
        ks = jax.random.split(k, 6)
        p["layers"].append({
            "q": L.linear_init(ks[0], d, d),
            "k": L.linear_init(ks[1], d, d),
            "v": L.linear_init(ks[2], d, d),
            "attn_out": L.linear_init(ks[3], d, d),
            "ln1": L.layernorm_init(d),
            "ffn_in": L.linear_init(ks[4], d, f),
            "ffn_out": L.linear_init(ks[5], f, d),
            "ln2": L.layernorm_init(d),
        })
    return p


# -- forward --------------------------------------------------------------------

def _heads(x, h):
    b, t, d = x.shape
    return x.reshape(b, t, h, d // h).transpose(0, 2, 1, 3)


def _diag_maps(t: int, cfg: DebertaConfig):
    """The bucketed index matrices are Toeplitz (functions of t - s alone),
    so the per-element gather collapses to a static permutation over the
    position axis + a relative-shift reshape. Returns (c2p_map, p2c_map),
    each (2T-1,) int: attention-column for diagonal position q, laid out so
    that out[t, s] = att[t, map[T-1-t+s]]."""
    span = cfg.pos_ebd_size
    q_idx = np.arange(2 * t - 1)
    d = t - 1 - q_idx                                  # diagonal value t - s
    bucket = make_log_bucket_position(d, cfg.position_buckets,
                                      cfg.max_position)
    c2p_map = np.clip(bucket + span, 0, span * 2 - 1)
    p2c_map = np.clip(-bucket + span, 0, span * 2 - 1)
    return c2p_map.astype(np.int32), p2c_map.astype(np.int32)


def _rel_shift(expf: jax.Array, t: int, s: int) -> jax.Array:
    """expf (..., T, 2T-1) with out[t, s] = expf[t, T-1-t+s] -> (..., T, S)
    via pad-flatten-slice-reshape (no gather)."""
    lead = expf.shape[:-2]
    padded = jnp.pad(expf, [(0, 0)] * len(lead) + [(0, 0), (0, 1)])  # width 2T
    flat = padded.reshape(*lead, t * 2 * t)
    y = flat[..., t - 1: t - 1 + t * (2 * t - 1)]
    return y.reshape(*lead, t, 2 * t - 1)[..., :s]


# -- fused Pallas kernel (TPU fast path) ----------------------------------------
# The one-hot-einsum selection below costs ~16x the content matmul in MACs
# (T*(2T-1)*S inner dim vs dh). The kernel computes the positional terms as
# plain q/k @ pos-table matmuls (2x content cost) and performs the diagonal
# selection with Mosaic's strided circular roll — zero extra MACs, nothing
# (T, 2T)-sized ever in HBM:
#   c2p[t, s] = (q @ PK^T)[t, T-1-t+s]  -> roll(axis=-1, shift=T+1, stride=1)
#   p2c[t, s] = (k @ PQ^T)[s, T-1+t-s]  -> same roll, then one VMEM transpose
# (both index forms are the same lane roll because (s+T-1-i) mod 2T =
# (s-(T+1)-i) mod 2T; shift/stride must be non-negative in Mosaic).


def _deberta_attn_kernel(q_ref, k_ref, v_ref, pk_ref, pq_ref, mask_ref,
                         o_ref, *, num_heads: int, scale: float,
                         lowp_ok: bool = True):
    """Blocks: q/k/v/o (GB, T, D); pk/pq (2T, D); mask (GB, 1, T) int32.

    Heads run in MXU-packed groups of g = 128//dh against block-diagonal
    operands (same trick as ops/attention._pack_blockdiag: output
    columns/rows of a block-diagonal operand never mix heads, so one
    full-contraction matmul computes the whole group's content, c2p, p2c,
    and PV terms at full MXU width instead of dh/128 of it). The strided
    diagonal roll and the softmax run per T/2T segment — Mosaic's roll and
    the 1-sublane mask broadcast both operate within one head's lanes.

    lowp (bf16 inputs only): the kernel is VMEM-pass-bound, not MXU-bound
    (round-5 profile: 17 of the 26 ms forward at batch 64 is this kernel,
    vs a ~4.7 ms matmul floor), so the (T, T)/(T, 2T) score intermediates
    are kept in bf16 — matmul outputs, the two strided rolls, the p2c
    transpose, and the exp output all move half the bytes. The softmax
    itself still runs in f32 registers (operands upcast in the fused
    elementwise chain; row max and 1/sum in f32), and masked keys still
    hit exp(-inf) == 0 exactly, so only O(2^-8) rounding on score/weight
    operands differs from the f32 kernel — the same rounding class as the
    bf16 MXU dots both paths already use."""
    from jax.experimental.pallas import tpu as pltpu

    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    gb, t, d = q.shape
    dh = d // num_heads
    g = 128 // dh if (dh < 128 and 128 % dh == 0 and t % 128 == 0) else 1
    while g > 1 and num_heads % g != 0:
        g //= 2   # a partial trailing group would slice past D
    lowp = lowp_ok and q.dtype == jnp.bfloat16
    sdt = jnp.bfloat16 if lowp else jnp.float32
    neg = jnp.finfo(jnp.float32).min
    key_ok = mask_ref[:] > 0                               # (GB, 1, T)

    def pack3(x, h0):
        # (GB, S, D) -> (GB, g*S, g*dh) head-diagonal blocks
        return jnp.concatenate(
            [jnp.pad(x[:, :, (h0 + j) * dh:(h0 + j + 1) * dh],
                     ((0, 0), (0, 0), (j * dh, (g - 1 - j) * dh)))
             for j in range(g)], axis=1)

    def pack2(tab, h0):
        # (2T, D) table -> (g*2T, g*dh)
        return jnp.concatenate(
            [jnp.pad(tab[:, (h0 + j) * dh:(h0 + j + 1) * dh],
                     ((0, 0), (j * dh, (g - 1 - j) * dh)))
             for j in range(g)], axis=0)

    for h0 in range(0, num_heads, g):
        cols = slice(h0 * dh, (h0 + g) * dh)
        qg = q[:, :, cols]                                 # (GB, T, gdh)
        kp = pack3(k, h0)                                  # (GB, gT, gdh)
        # Mosaic requires a 32-bit matmul accumulator, so lowp casts the
        # content scores on the way out (epilogue write, not a pass). The
        # positional tensors stay f32: tpu.dynamic_rotate is 32-bit only.
        s_all = jax.lax.dot_general(
            qg, kp, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(sdt)  # (GB, T, gT)
        c2p_all = jax.lax.dot_general(
            qg, pack2(pk_ref[:], h0), (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (GB,T,g*2T)
        kg = k[:, :, cols]
        p2c_all = jax.lax.dot_general(
            kg, pack2(pq_ref[:], h0), (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (GB,T,g*2T)
        ws, linvs = [], []
        for j in range(g):
            c2p = pltpu.roll(c2p_all[:, :, j * 2 * t:(j + 1) * 2 * t],
                             shift=t + 1, axis=2, stride=1, stride_axis=1)
            p2c = pltpu.roll(p2c_all[:, :, j * 2 * t:(j + 1) * 2 * t],
                             shift=t + 1, axis=2, stride=1, stride_axis=1)
            # transpose in sdt (half the relayout bytes under lowp), all
            # operands upcast inside the fused elementwise chain
            s = (s_all[:, :, j * t:(j + 1) * t].astype(jnp.float32)
                 + c2p[:, :, :t]
                 + jnp.swapaxes(p2c[:, :, :t].astype(sdt), 1, 2)
                 .astype(jnp.float32))
            s = jnp.where(key_ok, s * scale, neg)
            # unnormalized exp with the division DEFERRED to the (T, gdh)
            # context — (w @ v) / l == (w / l) @ v, one (T, T) pass cheaper
            # per head (same trick as ops/attention._fwd_kernel)
            m = jnp.max(s, axis=-1, keepdims=True)
            # exp written straight in sdt: under lowp this folds the old
            # pre-matmul cast pass into the exp write (w_all is already
            # v.dtype); 1/sum still accumulates in f32
            e = jnp.exp(s - m).astype(sdt)
            linvs.append(1.0 / jnp.sum(e, axis=-1, keepdims=True,
                                       dtype=jnp.float32))
            ws.append(e)
        w_all = (jnp.concatenate(ws, axis=-1) if g > 1
                 else ws[0])                               # (GB, T, gT)
        vp = pack3(v, h0)
        ctx = jax.lax.dot_general(
            w_all.astype(v.dtype), vp, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)            # (GB, T, gdh)
        linv = jnp.concatenate(
            [jnp.broadcast_to(linvs[j], (gb, t, dh)) for j in range(g)],
            axis=-1)                                       # (GB, T, gdh)
        o_ref[:, :, cols] = (ctx * linv).astype(o_ref.dtype)


# bf16 score intermediates in the fused forward kernel (bf16 inputs only;
# f32 runs are byte-identical to before). Module-level so the one-process
# A/B can trace both variants (benchmarks/bench_deberta_lowp_ab.py).
LOWP_SCORES = True


def _deberta_attn_fused(q, k, v, pos_k_d, pos_q_d, mask, num_heads: int,
                        scale: float):
    """q/k/v (B, T, D), pos tables (2T, D), mask (B, T) -> ctx (B, T, D)."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, d = q.shape
    gb = 1
    qblk = pl.BlockSpec((gb, t, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    pblk = pl.BlockSpec((2 * t, d), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    mblk = pl.BlockSpec((gb, 1, t), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_deberta_attn_kernel, num_heads=num_heads,
                          scale=scale, lowp_ok=LOWP_SCORES),
        grid=(b // gb,),
        in_specs=[qblk, qblk, qblk, pblk, pblk, mblk],
        out_specs=qblk,
        out_shape=jax.ShapeDtypeStruct((b, t, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * t * t * d,
            bytes_accessed=4 * b * t * d * q.dtype.itemsize,
            transcendentals=b * num_heads * t * t,
        ),
        interpret=jax.default_backend() != "tpu",
    )(q, k, v, pos_k_d, pos_q_d, mask[:, None, :])


# -- fused backward (fine-tuning path) ------------------------------------------
# The fwd kernel's strided diagonal roll is a permutation, so its transpose
# is ANOTHER strided roll: y[i, j] = x[i, (j - shift - stride*i) mod N]
# inverts with shift' = (N - shift) mod N, stride' = (N - stride) mod N
# (both non-negative, lane axis — inside every Mosaic constraint the fwd
# already satisfies). Per head: recompute scores/softmax from the saved
# operands (nothing (T, T)-sized crosses HBM), then
#   dv   = P^T dO
#   ds   = P (dP - rowsum(dP P)),  dP = dO V^T, masked cols zeroed, *scale
#   dq   = ds K        + roll^{-1}(pad(ds))    PK
#   dk   = ds^T Q      + roll^{-1}(pad(ds^T))  PQ
#   dPK += roll^{-1}(pad(ds))^T   Q      (accumulated over the batch grid)
#   dPQ += roll^{-1}(pad(ds^T))^T K


def _deberta_attn_bwd_kernel(q_ref, k_ref, v_ref, pk_ref, pq_ref, mask_ref,
                             do_ref, dq_ref, dk_ref, dv_ref, dpk_ref,
                             dpq_ref, *, num_heads: int, scale: float):
    """Blocks: q/k/v/do/dq/dk/dv (GB, T, D); pk/pq/dpk/dpq (2T, D);
    mask (GB, 1, T). dpk/dpq revisit the same block every grid step
    (sequential on TPU), so they zero-init at step 0 and accumulate."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    do = do_ref[:]
    gb, t, d = q.shape
    dh = d // num_heads
    n2 = 2 * t
    key_ok = mask_ref[:] > 0                               # (GB, 1, T)
    neg = jnp.finfo(jnp.float32).min

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dpk_ref[:] = jnp.zeros_like(dpk_ref)
        dpq_ref[:] = jnp.zeros_like(dpq_ref)

    f32 = jnp.float32
    # Loop-invariant exchange matrix J (J[i, r] = [i + r == T-1]) used by
    # _rev_rows in every head iteration — built once, outside the loop.
    ii = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    rr = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    jrev = (ii + rr == t - 1).astype(f32)
    for h0 in range(num_heads):
        cols = slice(h0 * dh, (h0 + 1) * dh)
        qh = q[:, :, cols]
        kh = k[:, :, cols]
        vh = v[:, :, cols]
        doh = do[:, :, cols].astype(f32)
        pkh = pk_ref[:][:, cols]                           # (2T, dh)
        pqh = pq_ref[:][:, cols]

        # -- recompute the masked softmax exactly as the fwd kernel ----
        s = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=f32)  # (GB, T, T)
        c2p = jax.lax.dot_general(qh, pkh, (((2,), (1,)), ((), ())),
                                  preferred_element_type=f32)  # (GB, T, 2T)
        p2c = jax.lax.dot_general(kh, pqh, (((2,), (1,)), ((), ())),
                                  preferred_element_type=f32)
        c2p_r = pltpu.roll(c2p, shift=t + 1, axis=2, stride=1, stride_axis=1)
        p2c_r = pltpu.roll(p2c, shift=t + 1, axis=2, stride=1, stride_axis=1)
        s = s + c2p_r[:, :, :t] + jnp.swapaxes(p2c_r[:, :, :t], 1, 2)
        s = jnp.where(key_ok, s * scale, neg)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)         # (GB, T, T) f32

        # -- softmax/value backward -------------------------------------
        dv_h = jax.lax.dot_general(p, doh, (((1,), (1,)), ((0,), (0,))),
                                   preferred_element_type=f32)  # (GB, T, dh)
        dp = jax.lax.dot_general(doh, vh, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=f32)    # (GB, T, T)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        # the fwd `where` zeroes masked columns' cotangent; * the shared scale
        ds = jnp.where(key_ok, ds * scale, 0.0)            # (GB, T, T)

        # -- content terms ----------------------------------------------
        dq_h = jax.lax.dot_general(ds, kh, (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=f32)
        ds_t = jnp.swapaxes(ds, 1, 2)                      # (GB, T(k), T(q))
        dk_h = jax.lax.dot_general(ds_t, qh, (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=f32)

        # -- positional terms: invert the fwd's diagonal roll on the padded
        # cotangent, dc2p[i, m] = ds_pad[i, (m + T+1+i) mod 2T].  Mosaic
        # lowers NEITHER a stride-(2T-1) rotate ("max shift in a vreg >
        # width 128": within-vreg variation must stay under 8*stride <=
        # 128) NOR a 2T-lane dynamic gather ("multiple source vregs along
        # gather dimension") NOR lax.rev — so conjugate the SUPPORTED
        # stride-(+1) roll with a row reversal done on the MXU via the
        # exchange matrix J (J[i, r] = [i + r == T-1]):
        #     dc2p = R(w),  w = roll(concat([R(ds), 0]), shift=0, stride=1)
        # (per final row i the shift composes to -(T+1+i) mod 2T), and the
        # OUTER R folds into the consuming matmuls for free: contraction
        # over lanes gives R(w) @ PK = R(w @ PK) (reverse the narrow
        # result), contraction over rows pairs w with R(q)/R(k) instead.
        # Net extra MXU work ~0.7 GFLOP/program vs ~6 VPU gather passes.
        def _rev_rows(x):                     # (GB, T, X): row i <- T-1-i
            outs = [jax.lax.dot_general(jrev, x[bb],
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=f32)
                    for bb in range(gb)]
            return (outs[0][None] if gb == 1
                    else jnp.stack(outs, axis=0))

        zpad = jnp.zeros((gb, t, t), f32)

        def _inv_roll_rev(x):                 # (GB, T, T) -> w; dc2p = R(w)
            xr = jnp.concatenate([_rev_rows(x), zpad], axis=2)
            return pltpu.roll(xr, shift=0, axis=2, stride=1, stride_axis=1)

        w_c2p = _inv_roll_rev(ds)                          # (GB, T, 2T)
        w_p2c = _inv_roll_rev(ds_t)
        dq_h = dq_h + _rev_rows(jax.lax.dot_general(
            w_c2p, pkh, (((2,), (0,)), ((), ())),
            preferred_element_type=f32))
        dk_h = dk_h + _rev_rows(jax.lax.dot_general(
            w_p2c, pqh, (((2,), (0,)), ((), ())),
            preferred_element_type=f32))
        # table grads: contract over (GB, T) rows -> (2T, dh), accumulated;
        # rows of w are reversed, so pair them with row-reversed q/k
        rqh = _rev_rows(qh.astype(f32))
        rkh = _rev_rows(kh.astype(f32))
        dpk_h = jax.lax.dot_general(
            w_c2p.reshape(gb * t, n2), rqh.reshape(gb * t, dh),
            (((0,), (0,)), ((), ())), preferred_element_type=f32)
        dpq_h = jax.lax.dot_general(
            w_p2c.reshape(gb * t, n2), rkh.reshape(gb * t, dh),
            (((0,), (0,)), ((), ())), preferred_element_type=f32)

        dq_ref[:, :, cols] = dq_h.astype(dq_ref.dtype)
        dk_ref[:, :, cols] = dk_h.astype(dk_ref.dtype)
        dv_ref[:, :, cols] = dv_h.astype(dv_ref.dtype)
        dpk_ref[:, cols] = dpk_ref[:, cols] + dpk_h.astype(dpk_ref.dtype)
        dpq_ref[:, cols] = dpq_ref[:, cols] + dpq_h.astype(dpq_ref.dtype)


def _deberta_attn_fused_bwd_call(q, k, v, pos_k_d, pos_q_d, mask, do,
                                 num_heads: int, scale: float):
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, d = q.shape
    gb = 1
    qblk = pl.BlockSpec((gb, t, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    pblk = pl.BlockSpec((2 * t, d), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    mblk = pl.BlockSpec((gb, 1, t), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    f32 = jnp.float32
    return pl.pallas_call(
        functools.partial(_deberta_attn_bwd_kernel, num_heads=num_heads,
                          scale=scale),
        grid=(b // gb,),
        in_specs=[qblk, qblk, qblk, pblk, pblk, mblk, qblk],
        out_specs=(qblk, qblk, qblk, pblk, pblk),
        out_shape=(jax.ShapeDtypeStruct((b, t, d), q.dtype),
                   jax.ShapeDtypeStruct((b, t, d), q.dtype),
                   jax.ShapeDtypeStruct((b, t, d), q.dtype),
                   jax.ShapeDtypeStruct((2 * t, d), f32),
                   jax.ShapeDtypeStruct((2 * t, d), f32)),
        cost_estimate=pl.CostEstimate(
            flops=20 * b * t * t * d,
            bytes_accessed=8 * b * t * d * q.dtype.itemsize,
            transcendentals=b * num_heads * t * t,
        ),
        interpret=jax.default_backend() != "tpu",
    )(q, k, v, pos_k_d, pos_q_d, mask[:, None, :], do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _deberta_attn_trainable(q, k, v, pos_k_d, pos_q_d, mask, num_heads,
                            scale):
    """_deberta_attn_fused with a hand-derived Pallas backward — the
    fine-tuning fast path (DebertaConfig.fused_train). Grads equal the
    jnp one-hot path's (tests/test_deberta_bwd.py)."""
    return _deberta_attn_fused(q, k, v, pos_k_d, pos_q_d, mask, num_heads,
                               scale)


def _deberta_attn_trainable_fwd(q, k, v, pos_k_d, pos_q_d, mask, num_heads,
                                scale):
    out = _deberta_attn_fused(q, k, v, pos_k_d, pos_q_d, mask, num_heads,
                              scale)
    return out, (q, k, v, pos_k_d, pos_q_d, mask)


def _deberta_attn_trainable_bwd(num_heads, scale, res, g):
    q, k, v, pos_k_d, pos_q_d, mask = res
    dq, dk, dv, dpk, dpq = _deberta_attn_fused_bwd_call(
        q, k, v, pos_k_d, pos_q_d, mask, g.astype(q.dtype), num_heads,
        scale)
    return (dq, dk, dv, dpk.astype(pos_k_d.dtype),
            dpq.astype(pos_q_d.dtype), None)


_deberta_attn_trainable.defvjp(_deberta_attn_trainable_fwd,
                               _deberta_attn_trainable_bwd)


def _disentangled_attention_fused(p, cfg: DebertaConfig, x, rel_emb, c2p_map,
                                  p2c_map, key_mask, dtype):
    """TPU fast path: projections + pos-table gathers in XLA, everything
    (T x T)-shaped fused in the Pallas kernel."""
    t = x.shape[1]
    dh = cfg.hidden_size // cfg.num_heads
    scale = 1.0 / math.sqrt(dh * 3.0)
    q = L.linear(p["q"], x, dtype)
    k = L.linear(p["k"], x, dtype)
    v = L.linear(p["v"], x, dtype)
    # packed (2T, D) diagonal tables: head h lives at lanes [h*dh, (h+1)*dh)
    pos_k = L.linear(p["k"], rel_emb, dtype)               # (2*span, D)
    pos_q = L.linear(p["q"], rel_emb, dtype)
    pad = jnp.zeros((1, cfg.hidden_size), dtype)
    pos_k_d = jnp.concatenate([jnp.take(pos_k, jnp.asarray(c2p_map), axis=0),
                               pad])                       # (2T, D)
    pos_q_d = jnp.concatenate([jnp.take(pos_q, jnp.asarray(p2c_map), axis=0),
                               pad])
    if key_mask is None:
        key_mask = jnp.ones((x.shape[0], t), jnp.int32)
    # routed through the custom_vjp wrapper: the primal is the same fused
    # kernel; differentiation (fine-tuning) hits the hand-derived Pallas
    # backward instead of failing on an underivable pallas_call
    ctx = _deberta_attn_trainable(q, k, v, pos_k_d, pos_q_d,
                                  key_mask.astype(jnp.int32),
                                  cfg.num_heads, scale)
    return L.linear(p["attn_out"], ctx, dtype)


def _disentangled_attention(p, cfg: DebertaConfig, x, rel_emb, c2p_map,
                            p2c_map, key_mask, dtype):
    """One layer's attention with content<->position terms. c2p_map/p2c_map
    are static (2T-1,) diagonal->position-column permutations (no gathers in
    the hot path: static take + relative-shift reshape)."""
    h = cfg.num_heads
    dh = cfg.hidden_size // h
    t = x.shape[1]
    scale = math.sqrt(dh * 3.0)   # scale_factor = 1 + len({c2p, p2c})

    q = _heads(L.linear(p["q"], x, dtype), h)          # (B, h, T, dh)
    k = _heads(L.linear(p["k"], x, dtype), h)
    v = _heads(L.linear(p["v"], x, dtype), h)

    scores = jnp.einsum("bhtd,bhsd->bhts", q, k,
                        preferred_element_type=jnp.float32) / scale

    # position projections (share_att_key: reuse the content q/k projections)
    # pre-permuted by the static diagonal maps, so the (B,h,T,S) selection
    # below is a pure reshape
    pos_k = _heads(L.linear(p["k"], rel_emb[None], dtype), h)[0]  # (h, 2span, dh)
    pos_q = _heads(L.linear(p["q"], rel_emb[None], dtype), h)[0]
    pos_k_d = jnp.take(pos_k, jnp.asarray(c2p_map), axis=1)       # (h, 2T-1, dh)
    pos_q_d = jnp.take(pos_q, jnp.asarray(p2c_map), axis=1)

    # Selection as a dense one-hot matmul: gathers over (B,h,T,S) indices
    # crawl on the VPU and the rel-shift reshape forces unaligned relayouts;
    # a (2T-1 -> S) one-hot contraction rides the MXU instead. The one-hot
    # is regenerated on device from the tiny static diagonal map (never a
    # baked constant).
    # c2p: out[t', s] = c2p[t', T-1-t'+s]
    c2p = jnp.einsum("bhtd,hjd->bhtj", q, pos_k_d,
                     preferred_element_type=jnp.float32)          # (B,h,T,2T-1)
    p2c = jnp.einsum("bhsd,hjd->bhsj", k, pos_q_d,
                     preferred_element_type=jnp.float32)
    # one-hot (T, 2T-1, S): onehot[t', j, s] = (j == T-1-t'+s)
    tprime = jax.lax.broadcasted_iota(jnp.int32, (t, 2 * t - 1, t), 0)
    jq = jax.lax.broadcasted_iota(jnp.int32, (t, 2 * t - 1, t), 1)
    ss = jax.lax.broadcasted_iota(jnp.int32, (t, 2 * t - 1, t), 2)
    onehot = (jq == (t - 1) - tprime + ss).astype(dtype)
    c2p_sel = jnp.einsum("bhtj,tjs->bhts", c2p.astype(dtype), onehot,
                         preferred_element_type=jnp.float32)
    p2c_sel = jnp.einsum("bhtj,tjs->bhts", p2c.astype(dtype), onehot,
                         preferred_element_type=jnp.float32)
    scores = scores + c2p_sel / scale
    scores = scores + jnp.swapaxes(p2c_sel, -1, -2) / scale

    if key_mask is not None:
        neg = jnp.finfo(jnp.float32).min
        scores = jnp.where(key_mask[:, None, None, :].astype(bool),
                           scores, neg)
    w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dtype)
    ctx = jnp.einsum("bhts,bhsd->bhtd", w, v,
                     preferred_element_type=jnp.float32).astype(dtype)
    b, _, t, _ = ctx.shape
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, cfg.hidden_size)
    return L.linear(p["attn_out"], ctx, dtype)


def _disentangled_attention_sp(p, cfg: DebertaConfig, x_loc, rel_emb,
                               c2p_map, p2c_map, key_mask_full, dtype,
                               axis: str, t_full: int, row_offset):
    """Sequence-parallel variant of _disentangled_attention: x_loc holds
    this rank's T/sp query rows (absolute offset `row_offset`, traced);
    K/V are computed locally and all-gathered over `axis` to full T. The
    diagonal one-hot selections regenerate from iotas offset by the
    absolute row position, so every rank picks exactly its slice of the
    unsplit (T, 2T-1, T) selection — same math, 1/sp of the rows."""
    h = cfg.num_heads
    dh = cfg.hidden_size // h
    tl = x_loc.shape[1]
    t = t_full
    scale = math.sqrt(dh * 3.0)

    q = _heads(L.linear(p["q"], x_loc, dtype), h)          # (B, h, tl, dh)
    k_loc = _heads(L.linear(p["k"], x_loc, dtype), h)
    v_loc = _heads(L.linear(p["v"], x_loc, dtype), h)
    k = jax.lax.all_gather(k_loc, axis, axis=2, tiled=True)  # (B, h, T, dh)
    v = jax.lax.all_gather(v_loc, axis, axis=2, tiled=True)

    scores = jnp.einsum("bhtd,bhsd->bhts", q, k,
                        preferred_element_type=jnp.float32) / scale

    pos_k = _heads(L.linear(p["k"], rel_emb[None], dtype), h)[0]
    pos_q = _heads(L.linear(p["q"], rel_emb[None], dtype), h)[0]
    pos_k_d = jnp.take(pos_k, jnp.asarray(c2p_map), axis=1)   # (h, 2T-1, dh)
    pos_q_d = jnp.take(pos_q, jnp.asarray(p2c_map), axis=1)

    c2p = jnp.einsum("bhtd,hjd->bhtj", q, pos_k_d,
                     preferred_element_type=jnp.float32)      # (B,h,tl,2T-1)
    p2c = jnp.einsum("bhsd,hjd->bhsj", k, pos_q_d,
                     preferred_element_type=jnp.float32)      # (B,h,T,2T-1)

    # c2p rows are LOCAL queries: onehot[t',j,s] = (j == T-1-(t'+o)+s)
    tprime = (jax.lax.broadcasted_iota(jnp.int32, (tl, 2 * t - 1, t), 0)
              + row_offset)
    jq = jax.lax.broadcasted_iota(jnp.int32, (tl, 2 * t - 1, t), 1)
    ss = jax.lax.broadcasted_iota(jnp.int32, (tl, 2 * t - 1, t), 2)
    oh_c2p = (jq == (t - 1) - tprime + ss).astype(dtype)
    c2p_sel = jnp.einsum("bhtj,tjs->bhts", c2p.astype(dtype), oh_c2p,
                         preferred_element_type=jnp.float32)

    # p2c rows are FULL key positions, cols LOCAL queries:
    # onehot[s,j,t'] = (j == T-1-s+(t'+o))
    srow = jax.lax.broadcasted_iota(jnp.int32, (t, 2 * t - 1, tl), 0)
    jq2 = jax.lax.broadcasted_iota(jnp.int32, (t, 2 * t - 1, tl), 1)
    tcol = (jax.lax.broadcasted_iota(jnp.int32, (t, 2 * t - 1, tl), 2)
            + row_offset)
    oh_p2c = (jq2 == (t - 1) - srow + tcol).astype(dtype)
    p2c_sel = jnp.einsum("bhtj,tjs->bhts", p2c.astype(dtype), oh_p2c,
                         preferred_element_type=jnp.float32)  # (B,h,T,tl)

    scores = scores + c2p_sel / scale
    scores = scores + jnp.swapaxes(p2c_sel, -1, -2) / scale

    if key_mask_full is not None:
        neg = jnp.finfo(jnp.float32).min
        scores = jnp.where(key_mask_full[:, None, None, :].astype(bool),
                           scores, neg)
    w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dtype)
    ctx = jnp.einsum("bhts,bhsd->bhtd", w, v,
                     preferred_element_type=jnp.float32).astype(dtype)
    b = ctx.shape[0]
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, tl, cfg.hidden_size)
    return L.linear(p["attn_out"], ctx, dtype)


def _disentangled_attention_ring(p, cfg: DebertaConfig, x_loc, rel_emb,
                                 c2p_map, p2c_map, key_mask_full, dtype,
                                 axis: str, t_full: int, sp: int, rank):
    """Ring variant of _disentangled_attention_sp: K/V blocks rotate
    around the ICI ring via lax.ppermute under a flash-style online
    softmax, so peak memory is ONE (B, h, T/sp, dh) block. The content
    q @ pos_k term is precomputed once for the local rows; the per-block
    positional selections (c2p columns, the p2c term from the arriving
    K block) regenerate from iotas offset by the block's absolute origin
    (rank - step) mod sp. Same math as the unsplit attention up to fp
    reassociation."""
    h = cfg.num_heads
    dh = cfg.hidden_size // h
    tl = x_loc.shape[1]
    t = t_full
    scale = math.sqrt(dh * 3.0)
    b = x_loc.shape[0]

    q = _heads(L.linear(p["q"], x_loc, dtype), h)          # (B, h, tl, dh)
    kh = _heads(L.linear(p["k"], x_loc, dtype), h)
    vh = _heads(L.linear(p["v"], x_loc, dtype), h)

    pos_k = _heads(L.linear(p["k"], rel_emb[None], dtype), h)[0]
    pos_q = _heads(L.linear(p["q"], rel_emb[None], dtype), h)[0]
    pos_k_d = jnp.take(pos_k, jnp.asarray(c2p_map), axis=1)   # (h, 2T-1, dh)
    pos_q_d = jnp.take(pos_q, jnp.asarray(p2c_map), axis=1)

    # local-row content->position term, once (B, h, tl, 2T-1)
    c2p = jnp.einsum("bhtd,hjd->bhtj", q, pos_k_d,
                     preferred_element_type=jnp.float32).astype(dtype)
    q_off = rank * tl                                      # absolute q rows

    m = jnp.full((b, h, tl, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((b, h, tl, 1), jnp.float32)
    o = jnp.zeros((b, h, tl, dh), jnp.float32)
    perm = [(s, (s + 1) % sp) for s in range(sp)]
    for step in range(sp):
        src = (rank - step) % sp
        s_off = src * tl                                   # block's abs keys
        s_blk = jnp.einsum("bhtd,bhsd->bhts", q, kh,
                           preferred_element_type=jnp.float32)

        # c2p columns for this block: onehot[t',j,s] = (j == T-1-(t'+qo)+(s+so))
        tprime = (jax.lax.broadcasted_iota(jnp.int32, (tl, 2 * t - 1, tl), 0)
                  + q_off)
        jq = jax.lax.broadcasted_iota(jnp.int32, (tl, 2 * t - 1, tl), 1)
        ss = (jax.lax.broadcasted_iota(jnp.int32, (tl, 2 * t - 1, tl), 2)
              + s_off)
        oh_c2p = (jq == (t - 1) - tprime + ss).astype(dtype)
        s_blk = s_blk + jnp.einsum("bhtj,tjs->bhts", c2p, oh_c2p,
                                   preferred_element_type=jnp.float32)

        # p2c from the ARRIVING K block: rows are its abs key positions
        p2c = jnp.einsum("bhsd,hjd->bhsj", kh, pos_q_d,
                         preferred_element_type=jnp.float32).astype(dtype)
        srow = (jax.lax.broadcasted_iota(jnp.int32, (tl, 2 * t - 1, tl), 0)
                + s_off)
        jq2 = jax.lax.broadcasted_iota(jnp.int32, (tl, 2 * t - 1, tl), 1)
        tcol = (jax.lax.broadcasted_iota(jnp.int32, (tl, 2 * t - 1, tl), 2)
                + q_off)
        oh_p2c = (jq2 == (t - 1) - srow + tcol).astype(dtype)
        p2c_sel = jnp.einsum("bhtj,tjs->bhts", p2c, oh_p2c,
                             preferred_element_type=jnp.float32)
        s_blk = (s_blk + jnp.swapaxes(p2c_sel, -1, -2)) / scale

        if key_mask_full is not None:
            km_blk = jax.lax.dynamic_slice_in_dim(key_mask_full, s_off, tl,
                                                  axis=1)
            neg = jnp.finfo(jnp.float32).min
            s_blk = jnp.where(km_blk[:, None, None, :].astype(bool),
                              s_blk, neg)
        m_new = jnp.maximum(m, jnp.max(s_blk, axis=-1, keepdims=True))
        corr = jnp.exp(m - m_new)
        pw = jnp.exp(s_blk - m_new)
        l = l * corr + jnp.sum(pw, axis=-1, keepdims=True)
        o = o * corr + jnp.einsum("bhts,bhsd->bhtd", pw.astype(vh.dtype),
                                  vh, preferred_element_type=jnp.float32)
        m = m_new
        if step < sp - 1:
            kh = jax.lax.ppermute(kh, axis, perm)
            vh = jax.lax.ppermute(vh, axis, perm)
    ctx = (o / l).astype(dtype)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, tl, cfg.hidden_size)
    return L.linear(p["attn_out"], ctx, dtype)


def deberta_layer_sp(p: dict, cfg: DebertaConfig, x_loc, rel_emb, c2p_map,
                     p2c_map, key_mask_full, dtype, axis: str, t_full: int,
                     row_offset, sp: int = 0, rank=None, ring: bool = False):
    """deberta_layer with sequence-parallel attention; LN/FFN per-token.
    ring=True rotates K/V blocks via ppermute under an online softmax
    (_disentangled_attention_ring) instead of the per-layer all-gather."""
    if ring:
        a = _disentangled_attention_ring(p, cfg, x_loc, rel_emb, c2p_map,
                                         p2c_map, key_mask_full, dtype,
                                         axis, t_full, sp, rank)
    else:
        a = _disentangled_attention_sp(p, cfg, x_loc, rel_emb, c2p_map,
                                       p2c_map, key_mask_full, dtype, axis,
                                       t_full, row_offset)
    x = L.layernorm(p["ln1"], x_loc + a, cfg.layer_norm_eps)
    hdn = jax.nn.gelu(L.linear(p["ffn_in"], x, dtype),
                      approximate=(dtype == jnp.bfloat16))
    return L.layernorm(p["ln2"], x + L.linear(p["ffn_out"], hdn, dtype),
                       cfg.layer_norm_eps)


def deberta_embed(params: dict, cfg: DebertaConfig, input_ids: jax.Array,
                  attention_mask: Optional[jax.Array] = None):
    """(x, rel_emb): embedded tokens + the LN'd shared relative-position
    table. Split out of deberta_encode so pipeline parallelism
    (parallel/pp.pipeline_encode_deberta) can compute both once and
    replicate rel_emb to every stage."""
    dtype = jnp.dtype(cfg.compute_dtype)
    span = cfg.pos_ebd_size
    x = params["embeddings"]["word"][input_ids]
    x = L.layernorm(params["embeddings"]["ln"], x, cfg.layer_norm_eps)
    if attention_mask is not None:
        x = x * attention_mask[..., None].astype(x.dtype)
    x = x.astype(dtype)
    rel_emb = L.layernorm(params["rel_ln"],
                          params["rel_embeddings"][: span * 2],
                          cfg.layer_norm_eps).astype(dtype)
    return x, rel_emb


def use_fused_attn(cfg: DebertaConfig, t: int) -> bool:
    """Pallas path needs lane-aligned shapes: D and 2T multiples of 128."""
    return (cfg.fused_attn and jax.default_backend() == "tpu"
            and cfg.hidden_size % 128 == 0 and (2 * t) % 128 == 0)


def deberta_layer(p: dict, cfg: DebertaConfig, x: jax.Array,
                  rel_emb: jax.Array, c2p_map, p2c_map,
                  attention_mask, dtype, use_fused: bool) -> jax.Array:
    """One DeBERTa-v3 encoder block (disentangled attention + FFN)."""
    attn_fn = (_disentangled_attention_fused if use_fused
               else _disentangled_attention)
    a = attn_fn(p, cfg, x, rel_emb, c2p_map, p2c_map,
                attention_mask, dtype)
    x = L.layernorm(p["ln1"], x + a, cfg.layer_norm_eps)
    # erf-exact GELU under float32 (HF parity); tanh under bfloat16 —
    # the ~5e-4 relative gap is below bf16 resolution while the erf
    # polynomial costs ~2 ms per (256, 512, 1536) activation on TPU
    # (same rule as layers.mlp).
    hdn = jax.nn.gelu(L.linear(p["ffn_in"], x, dtype),
                      approximate=(dtype == jnp.bfloat16))
    return L.layernorm(p["ln2"], x + L.linear(p["ffn_out"], hdn, dtype),
                       cfg.layer_norm_eps)


def deberta_encode(params: dict, cfg: DebertaConfig, input_ids: jax.Array,
                   attention_mask: Optional[jax.Array] = None) -> jax.Array:
    """(B, T) int32 -> last_hidden_state (B, T, D)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    t = input_ids.shape[1]
    c2p_map, p2c_map = _diag_maps(t, cfg)
    x, rel_emb = deberta_embed(params, cfg, input_ids, attention_mask)
    fused = use_fused_attn(cfg, t)

    def layer_fn(p, x, rel_emb, attention_mask):
        return deberta_layer(p, cfg, x, rel_emb, c2p_map, p2c_map,
                             attention_mask, dtype, fused)

    if cfg.remat:
        layer_fn = jax.checkpoint(layer_fn)
    for p in params["layers"]:
        x = layer_fn(p, x, rel_emb, attention_mask)
    return x


# -- HF conversion ---------------------------------------------------------------

def load_hf_deberta_state_dict(state_dict: dict, cfg: DebertaConfig) -> dict:
    """Map a HF DebertaV2Model state_dict (numpy values) onto our tree."""
    def get(name):
        return np.asarray(state_dict[name]).astype(np.float32)

    def lin(prefix):
        return {"w": get(f"{prefix}.weight").T, "b": get(f"{prefix}.bias")}

    def ln(prefix):
        return {"scale": get(f"{prefix}.weight"), "bias": get(f"{prefix}.bias")}

    p = {
        "embeddings": {"word": get("embeddings.word_embeddings.weight"),
                       "ln": ln("embeddings.LayerNorm")},
        "rel_embeddings": get("encoder.rel_embeddings.weight"),
        "rel_ln": ln("encoder.LayerNorm"),
        "layers": [],
    }
    for i in range(cfg.num_layers):
        pre = f"encoder.layer.{i}"
        p["layers"].append({
            "q": lin(f"{pre}.attention.self.query_proj"),
            "k": lin(f"{pre}.attention.self.key_proj"),
            "v": lin(f"{pre}.attention.self.value_proj"),
            "attn_out": lin(f"{pre}.attention.output.dense"),
            "ln1": ln(f"{pre}.attention.output.LayerNorm"),
            "ffn_in": lin(f"{pre}.intermediate.dense"),
            "ffn_out": lin(f"{pre}.output.dense"),
            "ln2": ln(f"{pre}.output.LayerNorm"),
        })
    return p
