"""Device-centric fused pipeline: decode + upload each raw sample ONCE into
device-resident banks, then run caption / retrieval-corpus build / training /
eval from the banks with no further bulk host<->device traffic.

Why this exists (measured, round 5): the staged pipeline — the reference's
shape (preprocess_embeddings.py:11-116 materializes an h5 of embeddings,
train.py:109-246 streams it back per epoch) — moves ~60-90 GB across the
host<->device link for a 35k-row run (embeddings store D2H ~33 GB, train
H2D ~27 GB/epoch, images uploaded once per consuming stage). On a
bandwidth-starved host (the tunneled chip here measures ~30-40 MB/s each
way, benchmarks/ab_results.json tunnel_transfer_probe) that traffic IS the
88-minute wall clock. On TPU the frozen encoders are cheap: re-encoding
25k rows costs ~60 s of device time per epoch. FLOPs are cheaper than
bytes, so the fused flow

  * uploads images exactly once (uint8, the minimal representation),
  * recomputes frozen embeddings INSIDE the compiled train step (the raw
    encoder-in-step path, equality-tested against the pre-embedded path in
    tests/test_raw_training.py), and
  * never materializes the (N, 512, 384)+(N, 64, 1024) embedding tensors
    on the host at all.

The staged drivers (pipelines/embed.py, caption.py, ...) remain the parity
path — and the right choice when the store must be shared across jobs or
the host link is PCIe-fast.

Single-device by design: the banks live in one chip's HBM. Multi-chip
serving/training uses the sharded paths (parallel/, training/trainer.py).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from pathlib import Path
from typing import Callable, Optional

import numpy as np
import pandas as pd

from mmd_tpu.data.labels import categories_to_label_array
from mmd_tpu.data.schema import get_project_root
from mmd_tpu.ops.image_ops import TRAIN_TRANSFORM, load_images_parallel

BANK_COLS = ("claim_ids", "claim_mask", "doc_ids", "doc_mask",
             "claim_image", "doc_image", "labels")


@dataclasses.dataclass
class DeviceBank:
    """Capacity-padded device-resident raw sample bank for one split.

    `data[col]` are device arrays with capacity >= n rows; rows past `n`
    are zero padding and must never be indexed. Token/label columns mirror
    pipelines/raw_store.py; image columns are TRAIN_TRANSFORM uint8."""

    data: dict
    n: int
    ids: np.ndarray                 # (n,) int64 sample ids
    claim_paths: list
    doc_paths: list
    skipped: int = 0

    def free_images(self):
        """Drop the image buffers (the bulk of the HBM footprint)."""
        for col in ("claim_image", "doc_image"):
            arr = self.data.pop(col, None)
            if arr is not None:
                arr.delete()


_bank_write_fn = None


def _bank_write(buf, chunk, start):
    """Donated in-place chunk write: buf[start:start+chunk] = chunk.
    One compile per (shape, dtype); start is traced."""
    global _bank_write_fn
    import jax
    if _bank_write_fn is None:
        def write(b, c, s):
            idx = (s,) + (0,) * (b.ndim - 1)
            return jax.lax.dynamic_update_slice(b, c, idx)
        _bank_write_fn = jax.jit(write, donate_argnums=0)
    return _bank_write_fn(buf, chunk, start)


def vis_embed_shape(enc, image_size: int, vis_dtype="bfloat16"):
    """(num_tokens, hidden) of the frozen image encoder's output — shape
    only (jax.eval_shape, no device work). Used to size vis bank columns
    and the AOT train-window ShapeDtypeStructs."""
    import jax
    import jax.numpy as jnp

    from mmd_tpu.models.frozen import image_encode

    p_sds = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), enc.vit_params)
    x_sds = jax.ShapeDtypeStruct((1, image_size, image_size, 3),
                                 jnp.dtype(vis_dtype))
    out = jax.eval_shape(lambda p, x: image_encode(p, enc.vit_cfg, x),
                         p_sds, x_sds)
    return (out.shape[1], out.shape[2])


def _make_chunk_embed(enc, dtype, sub: int):
    """Jitted frozen image-encoder over one ingest chunk, sub-batched via
    lax.map so peak activations stay at `sub` images regardless of chunk
    size. EXACTLY mirrors the raw train step's image path
    (training/trainer.py make_encoding_raw_step: normalize_on_device with
    TRAIN_TRANSFORM stats at compute dtype, then image_encode); banking
    the result in `dtype` is numerics-identical to the raw path because
    fusion_forward casts its embedding inputs to compute_dtype at entry
    (models/fusion.py fusion_forward)."""
    import jax
    import jax.numpy as jnp

    from mmd_tpu.models.frozen import image_encode
    from mmd_tpu.ops.image_ops import normalize_on_device

    dt = jnp.dtype(dtype)

    @jax.jit
    def embed(vit_params, u8):
        def f(block):
            x = normalize_on_device(block, TRAIN_TRANSFORM, dt)
            return image_encode(vit_params, enc.vit_cfg, x).astype(dt)
        blocks = u8.reshape(u8.shape[0] // sub, sub, *u8.shape[1:])
        out = jax.lax.map(f, blocks)
        return out.reshape(u8.shape[0], *out.shape[2:])

    return embed


def ingest_split(
    csv_path,
    enc,
    max_length: int = 512,
    image_size: int = 256,
    chunk: int = 256,
    io_workers: int = 8,
    sync_every: int = 8,
    keep_images: bool = True,
    embed_images: bool = False,
    vis_dtype: str = "bfloat16",
    on_chunk: Optional[Callable] = None,
    root: Optional[Path] = None,
) -> DeviceBank:
    """Stream one CSV into a DeviceBank.

    Host work (tokenize via the native encoder, PIL decode) runs while the
    previous chunk's H2D transfer + donated bank write are still in flight
    (dispatch is async); a cheap scalar pull every `sync_every` chunks
    bounds the in-flight queue. Skip-and-count semantics match
    pipelines/raw_store.py (both images must decode, reference
    dataset.py:100-110).

    With keep_images=False only tokens/labels are banked (images are
    streamed to `on_chunk` and dropped) — used for the test split so the
    train bank and models keep headroom in HBM.

    With embed_images=True the bank stores the FROZEN image encoder's
    output per image (`claim_vis`/`doc_vis`, (n, tokens, hidden) in
    vis_dtype) instead of raw pixels, computed on device per chunk while
    the next chunk decodes on the host. This is the at-scale mode: the
    bf16 embedding (e.g. 64x1024 = 128 KB) is SMALLER than the raw uint8
    image (256x256x3 = 192 KB), halves-ish HBM, and drops the image
    encoder from every train/eval step — numerics-identical to the raw
    path because the encoder is frozen and fusion casts embeddings to
    compute_dtype at entry (equality-tested in tests/test_fused.py).
    Implies the raw images are NOT banked.

    on_chunk(images_dict, start_row, n_rows) is called after each chunk
    lands, with DEVICE uint8 arrays {"claim": (chunk, S, S, 3), "doc": ...}
    — the caption/feature-overlap hook.
    """
    import jax
    import jax.numpy as jnp

    df = pd.read_csv(csv_path)
    root = Path(root) if root else get_project_root()
    transform = (TRAIN_TRANSFORM if image_size == 256 else
                 dataclasses.replace(TRAIN_TRANSFORM, size=image_size))
    cap = len(df) + chunk

    shapes = {
        "claim_ids": ((max_length,), np.int32),
        "claim_mask": ((max_length,), np.int32),
        "doc_ids": ((max_length,), np.int32),
        "doc_mask": ((max_length,), np.int32),
        "labels": ((4,), np.int32),
    }
    embed_fn = None
    if embed_images:
        keep_images = False
        tok, hid = vis_embed_shape(enc, image_size, vis_dtype)
        shapes["claim_vis"] = ((tok, hid), np.dtype(vis_dtype))
        shapes["doc_vis"] = ((tok, hid), np.dtype(vis_dtype))
        sub = chunk
        while sub > 64 and sub % 2 == 0:
            sub //= 2
        embed_fn = _make_chunk_embed(enc, vis_dtype, sub)
    if keep_images:
        shapes["claim_image"] = ((image_size, image_size, 3), np.uint8)
        shapes["doc_image"] = ((image_size, image_size, 3), np.uint8)
    data = {col: jnp.zeros((cap, *shp), dt) for col, (shp, dt) in shapes.items()}

    staging = {col: np.zeros((chunk, *shp), dt)
               for col, (shp, dt) in shapes.items()
               if not col.endswith("_vis")}
    if not keep_images:
        staging["claim_image"] = np.zeros(
            (chunk, image_size, image_size, 3), np.uint8)
        staging["doc_image"] = np.zeros_like(staging["claim_image"])
    staged = 0
    cursor = 0
    n_flushed = 0
    skipped = 0
    kept_ids: list = []
    kept_claim_paths: list = []
    kept_doc_paths: list = []

    def abspaths(rows, col):
        out = []
        for p in rows[col]:
            if isinstance(p, str) and p:
                out.append(p if Path(p).is_absolute() else str(root / p))
            else:
                out.append(None)
        return out

    def flush():
        nonlocal staged, cursor, n_flushed
        if staged == 0:
            return
        start = jnp.int32(cursor)
        imgs = {}
        # The staging numpy buffers are REUSED for the next chunk, but on
        # non-TPU backends jax.device_put is ZERO-COPY for aligned numpy
        # arrays — the "device" array aliases host memory, so refilling
        # staging would corrupt chunks that async consumers (bank writes,
        # the on_chunk caption hook) have not executed yet. Snapshot on
        # those backends; the TPU path copies over the tunnel anyway.
        # (Caught as a load-dependent caption mismatch in
        # tests/test_fused.py under a full contended suite run.)
        snapshot = jax.default_backend() != "tpu"
        for col in staging:
            host_chunk = staging[col].copy() if snapshot else staging[col]
            dev_chunk = jax.device_put(host_chunk, jax.devices()[0])
            if col in data:
                data[col] = _bank_write(data[col], dev_chunk, start)
            if col in ("claim_image", "doc_image"):
                imgs[col.split("_")[0]] = dev_chunk
        if embed_fn is not None:
            for kind, col in (("claim", "claim_vis"), ("doc", "doc_vis")):
                vis = embed_fn(enc.vit_params, imgs[kind])
                data[col] = _bank_write(data[col], vis, start)
        if on_chunk is not None:
            on_chunk(imgs, cursor, staged)
        cursor += staged
        staged = 0
        n_flushed += 1
        if n_flushed % sync_every == 0:
            # real completion fence (block_until_ready lies on tunneled
            # devices — CLAUDE.md): pull one scalar through the graph
            float(jnp.sum(data["labels"][0]))

    claim_col = "claim"
    doc_col = "evidence"
    for lo in range(0, len(df), chunk):
        rows = df.iloc[lo:lo + chunk]
        n = len(rows)
        texts_c = rows[claim_col].fillna("").astype(str).tolist()
        texts_d = rows[doc_col].fillna("").astype(str).tolist()
        c_ids, c_mask, _ = enc.tokenizer.encode_batch(texts_c,
                                                      max_length=max_length)
        d_ids, d_mask, _ = enc.tokenizer.encode_batch(texts_d,
                                                      max_length=max_length)
        cpaths = abspaths(rows, "claim_image")
        dpaths = abspaths(rows, "evidence_image")
        c_img, c_ok = load_images_parallel(cpaths, transform, io_workers)
        d_img, d_ok = load_images_parallel(dpaths, transform, io_workers)
        valid = c_ok & d_ok
        skipped += int((~valid).sum())
        labels = categories_to_label_array(rows["category"].tolist())
        idx = np.nonzero(valid)[0]
        ids64 = rows["id"].to_numpy(np.int64)
        pos = 0
        while pos < len(idx):
            take = min(chunk - staged, len(idx) - pos)
            sel = idx[pos:pos + take]
            sl = slice(staged, staged + take)
            staging["claim_ids"][sl] = c_ids[sel]
            staging["claim_mask"][sl] = c_mask[sel]
            staging["doc_ids"][sl] = d_ids[sel]
            staging["doc_mask"][sl] = d_mask[sel]
            staging["labels"][sl] = labels[sel]
            staging["claim_image"][sl] = c_img[sel]
            staging["doc_image"][sl] = d_img[sel]
            kept_ids.extend(ids64[sel])
            kept_claim_paths.extend(cpaths[i] for i in sel)
            kept_doc_paths.extend(dpaths[i] for i in sel)
            staged += take
            pos += take
            if staged == chunk:
                flush()
    if staged:
        # zero the unused tail so padding rows stay inert
        for col in staging:
            staging[col][staged:] = 0
        flush()

    return DeviceBank(data=data, n=cursor,
                      ids=np.asarray(kept_ids, np.int64),
                      claim_paths=kept_claim_paths,
                      doc_paths=kept_doc_paths, skipped=skipped)


# ---------------------------------------------------------------------------
# Caption from device-resident images
# ---------------------------------------------------------------------------


class BankCaptioner:
    """Streams caption generation over bank/ingest image chunks.

    Dispatches are async (device token arrays are collected, pulled in
    one pass at the end), so captioning overlaps ingest transfers when
    used as the ingest on_chunk hook."""

    def __init__(self, engine, batch: int = 64,
                 bank_image_size: Optional[int] = None):
        self.engine = engine
        self.batch = batch
        self._pending: list = []          # (kind, start, n, device tokens)
        cap_size = engine.cfg.vit.image_size
        if bank_image_size is not None and bank_image_size != cap_size:
            import jax
            import jax.numpy as jnp

            @jax.jit
            def _resize(u8):
                x = jax.image.resize(
                    u8.astype(jnp.float32),
                    (u8.shape[0], cap_size, cap_size, 3), "bilinear")
                return jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)

            self._gen = lambda imgs: engine._gen(_resize(imgs))
        else:
            self._gen = lambda imgs: engine._gen(imgs)

    def on_chunk(self, imgs: dict, start: int, n: int):
        """Ingest hook. Blocks are ALWAYS full `batch` rows (the staging
        buffer is capacity-padded, so slicing past n reads zero rows) — a
        ragged tail must never trigger a fresh decode-scan compile. The
        first call blocks on the generate() compile; start the prewarm
        thread before ingest so that wait is already paid (it lands in
        the persistent compilation cache for later runs)."""
        b = self.batch
        for kind in ("claim", "doc"):
            arr = imgs[kind]
            for lo in range(0, n, b):
                hi = min(lo + b, n)
                block = arr[lo:lo + b]        # device slice, padded shape ok
                toks = self._gen(block)
                self._pending.append((kind, start + lo, hi - lo, toks))

    def dispatch_bank(self, bank: "DeviceBank"):
        """Async-dispatch caption generation over a bank's resident images
        (device slices — no extra HBM, no host traffic). Results are
        pulled later by collect()."""
        import jax
        import jax.numpy as jnp

        b = self.batch

        @jax.jit
        def _slice(buf, start):
            return jax.lax.dynamic_slice(
                buf, (start, 0, 0, 0), (b, *buf.shape[1:]))

        for kind, col in (("claim", "claim_image"), ("doc", "doc_image")):
            buf = bank.data[col]
            for lo in range(0, bank.n, b):
                toks = self._gen(_slice(buf, jnp.int32(lo)))
                self._pending.append((kind, lo, min(b, bank.n - lo), toks))

    def collect(self, n_rows: int) -> tuple:
        """Pull + decode all pending captions -> (claim_caps, doc_caps).
        Token arrays are concatenated ON DEVICE in groups and pulled with
        ONE sync each (per-array pulls pay ~30 ms of tunnel round-trip
        every time)."""
        import jax.numpy as jnp

        caps = {"claim": [""] * n_rows, "doc": [""] * n_rows}
        tok = self.engine.tokenizer
        group = 32
        for g0 in range(0, len(self._pending), group):
            entries = self._pending[g0:g0 + group]
            stacked = np.asarray(jnp.concatenate([e[3] for e in entries]))
            row = 0
            for kind, start, n, toks_dev in entries:
                b = toks_dev.shape[0]
                for j in range(n):
                    if start + j < n_rows:
                        caps[kind][start + j] = tok.decode(stacked[row + j])
                row += b
        self._pending.clear()
        return caps["claim"], caps["doc"]


def write_enriched_csv(df: pd.DataFrame, bank_ids: np.ndarray,
                       claim_caps, doc_caps, out_csv: Path):
    """Write {split}_enriched.csv with the reference's 4 columns
    (caption.py:34-47 semantics); rows skipped at ingest keep NA captions."""
    df = df.copy()
    for col in ("claim_image_caption", "evidence_image_caption",
                "claim_enriched", "evidence_enriched"):
        df[col] = pd.NA
    by_id = {int(i): k for k, i in enumerate(bank_ids)}
    cc_col = df.columns.get_loc("claim_image_caption")
    for ridx, rid in enumerate(df["id"]):
        k = by_id.get(int(rid))
        if k is None:
            continue
        cc, ec = claim_caps[k], doc_caps[k]
        df.iat[ridx, cc_col] = cc
        df.iat[ridx, cc_col + 1] = ec
        df.iat[ridx, cc_col + 2] = (f"{df.at[ridx, 'claim']}. {cc}"
                                    if cc else str(df.at[ridx, "claim"]))
        df.iat[ridx, cc_col + 3] = (f"{df.at[ridx, 'evidence']}. {ec}"
                                    if ec else str(df.at[ridx, "evidence"]))
    df.to_csv(out_csv, index=False)
    return out_csv


# ---------------------------------------------------------------------------
# Train / eval over banks
# ---------------------------------------------------------------------------


def bank_column_shapes(n_rows: int, chunk: int, max_length: int = 512,
                       image_size: int = 256, keep_images: bool = True,
                       vis: Optional[tuple] = None,
                       vis_dtype: str = "bfloat16"):
    """ShapeDtypeStructs of the bank's device buffers (capacity-padded the
    same way ingest_split allocates them) — lets the train window AOT-
    compile BEFORE/DURING ingest, off the critical path. `vis=(tok, hid)`
    (from vis_embed_shape) describes an embed_images bank instead of a
    raw-image bank."""
    import jax

    cap = n_rows + chunk
    out = {
        "claim_ids": jax.ShapeDtypeStruct((cap, max_length), np.int32),
        "claim_mask": jax.ShapeDtypeStruct((cap, max_length), np.int32),
        "doc_ids": jax.ShapeDtypeStruct((cap, max_length), np.int32),
        "doc_mask": jax.ShapeDtypeStruct((cap, max_length), np.int32),
        "labels": jax.ShapeDtypeStruct((cap, 4), np.int32),
    }
    if vis is not None:
        v = jax.ShapeDtypeStruct((cap, *vis), np.dtype(vis_dtype))
        out["claim_vis"] = v
        out["doc_vis"] = v
    elif keep_images:
        img = jax.ShapeDtypeStruct((cap, image_size, image_size, 3),
                                   np.uint8)
        out["claim_image"] = img
        out["doc_image"] = img
    return out


def precompile_train_window(trainer, steps_per_call: int, data_sds: dict):
    """AOT-compile the bank window from shapes only (no buffers touched):
    run this in a thread while ingest streams — the remote XLA compile
    rides the network alongside the H2D transfers. Returns the compiled
    callable for train_from_bank(compiled=...)."""
    import jax

    enc = trainer.encoders
    window = make_bank_window(trainer.cfg, enc, steps_per_call)
    sds = lambda t: jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), t)
    state_sds = jax.eval_shape(trainer.init)
    frozen_sds = sds({"text": enc.text_params, "vit": enc.vit_params})
    idx_sds = jax.ShapeDtypeStruct(
        (steps_per_call, trainer.cfg.batch_size), np.int32)
    return window.lower(state_sds, frozen_sds, data_sds, idx_sds).compile()


def make_bank_window(cfg, enc, steps_per_call: int):
    """One compiled call scanning `steps_per_call` raw-path train steps,
    each gathering its batch ON DEVICE from the resident bank (idx is the
    only per-call H2D: (K, B) int32). Encoders run frozen inside the step
    (training/trainer.py make_encoding_raw_step)."""
    import jax

    from mmd_tpu.training.trainer import make_encoding_raw_step, make_optimizer

    raw = make_encoding_raw_step(cfg, enc, make_optimizer(cfg))

    def window_fn(state, frozen, data, idx):
        import jax.numpy as jnp

        def body(st, i):
            batch = {k: jnp.take(data[k], i, axis=0) for k in data}
            st, aux = raw(st, frozen, batch)
            return st, {"loss": aux["loss"], "preds": aux["preds"],
                        "labels": aux["labels"]}
        return jax.lax.scan(body, state, idx)

    return jax.jit(window_fn, donate_argnums=(0,))


def train_from_bank(trainer, bank: DeviceBank, steps_per_call: int = 8,
                    log_every: int = 50, logger=None, compiled=None):
    """Epochs of globally-shuffled windows over the bank. Returns state.
    `compiled`: precompile_train_window result (AOT, overlapped with
    ingest); falls back to jit-on-first-call."""
    import jax
    import jax.numpy as jnp

    cfg = trainer.cfg
    enc = trainer.encoders
    b, k = cfg.batch_size, steps_per_call
    if bank.n < b * k:
        # skip-and-count shrank the bank below the (pre-ingest-estimated)
        # window; shrink the window and drop the stale AOT compile
        k = max(bank.n // max(b, 1), 1)
        b = min(b, bank.n)
        compiled = None
        print(f"[fused-train] bank smaller than window, using k={k} b={b}")
    window = compiled or make_bank_window(cfg, enc, k)
    state = trainer.init()
    frozen = {"text": enc.text_params, "vit": enc.vit_params}
    rng = np.random.default_rng(cfg.seed)
    step = 0
    t0 = time.time()
    samples = 0
    for epoch in range(cfg.epochs):
        perm = rng.permutation(bank.n)
        usable = (len(perm) // (b * k)) * b * k
        windows = perm[:usable].reshape(-1, k, b).astype(np.int32)
        for w in windows:
            state, aux = window(state, frozen, bank.data, jnp.asarray(w))
            step += k
            samples += b * k
            if step % log_every < k:
                loss = float(np.asarray(aux["loss"])[-1])
                dt = time.time() - t0
                rate = samples / max(dt, 1e-9)
                msg = {"train/total_loss": loss,
                       "train/samples_per_sec": rate}
                if logger is not None:
                    logger.log(msg, step=step)
                print(f"[fused-train] step {step} loss {loss:.4f} "
                      f"{rate:.0f} samples/s")
                samples, t0 = 0, time.time()
        # ragged tail: fold leftover rows into the next epoch's shuffle
        # (window-quantized epochs; the reference drops ragged tails of
        # its DataLoader batches the same way)
    out_dir = Path(cfg.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    from mmd_tpu.core.checkpoint import save_params
    save_params(str(out_dir / "final_model"), state.params)
    return state


def precompile_bank_predict(model_cfg, enc, batch_size: int,
                            max_length: int = 512, image_size: int = 256,
                            vis: Optional[tuple] = None,
                            vis_dtype: str = "bfloat16"):
    """AOT-compile the bank eval forward from shapes (prewarm). `vis`
    describes an embed_images bank (see bank_column_shapes)."""
    import jax

    batch_sds = {
        "claim_ids": jax.ShapeDtypeStruct((batch_size, max_length), np.int32),
        "claim_mask": jax.ShapeDtypeStruct((batch_size, max_length), np.int32),
        "doc_ids": jax.ShapeDtypeStruct((batch_size, max_length), np.int32),
        "doc_mask": jax.ShapeDtypeStruct((batch_size, max_length), np.int32),
        "labels": jax.ShapeDtypeStruct((batch_size, 4), np.int32),
    }
    if vis is not None:
        v = jax.ShapeDtypeStruct((batch_size, *vis), np.dtype(vis_dtype))
        batch_sds["claim_vis"] = v
        batch_sds["doc_vis"] = v
    else:
        img = jax.ShapeDtypeStruct(
            (batch_size, image_size, image_size, 3), np.uint8)
        batch_sds["claim_image"] = img
        batch_sds["doc_image"] = img
    sds = lambda t: jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), t)
    from mmd_tpu.models.fusion import init_fusion_params
    params_sds = jax.eval_shape(
        lambda: init_fusion_params(jax.random.key(0), model_cfg))
    frozen_sds = sds({"text": enc.text_params, "vit": enc.vit_params})
    predict = make_bank_predict(model_cfg, enc)
    return predict.lower(params_sds, frozen_sds, batch_sds).compile()


def make_bank_predict(model_cfg, enc):
    """Compiled raw-path inference: gather rows from (possibly image-free)
    column dict, encode frozen, fusion forward, argmax -> (B, P) preds."""
    import jax

    def predict_fn(fusion_params, frozen, batch):
        import jax.numpy as jnp

        from mmd_tpu.models.frozen import image_encode, text_encode
        from mmd_tpu.models.fusion import fusion_forward
        from mmd_tpu.ops.image_ops import normalize_on_device

        dtype = jnp.dtype(model_cfg.compute_dtype)
        text = lambda ids, mask: text_encode(frozen["text"], enc.text_cfg,
                                             ids, mask)
        image = lambda u8: image_encode(
            frozen["vit"], enc.vit_cfg,
            normalize_on_device(u8, TRAIN_TRANSFORM, dtype))
        if "claim_vis" in batch:            # embed_images bank
            vis_c, vis_d = batch["claim_vis"], batch["doc_vis"]
        else:
            vis_c = image(batch["claim_image"])
            vis_d = image(batch["doc_image"])
        out = fusion_forward(
            fusion_params, model_cfg,
            text(batch["claim_ids"], batch["claim_mask"]),
            vis_c,
            text(batch["doc_ids"], batch["doc_mask"]),
            vis_d,
            deterministic=True)
        if model_cfg.factify or model_cfg.text_only:
            logits, _ = out
            return jnp.argmax(logits, -1)[:, None]
        (y_tt, y_ti), (y_it, y_ii) = out
        return jnp.argmax(jnp.stack([y_tt, y_ti, y_it, y_ii], 1), -1)

    return jax.jit(predict_fn)


def evaluate_from_bank(bank: DeviceBank, enc, model_cfg, fusion_params,
                       batch_size: int = 64, results_csv=None,
                       compiled=None):
    """Raw-path eval over a banked split: batches gather on device (idx is
    the only H2D), only (B, P) preds return. Tail windows wrap modulo n;
    wrapped duplicate rows are dropped before the metrics."""
    import jax
    import jax.numpy as jnp

    from mmd_tpu.pipelines.eval_models import metrics_from_preds

    predict = compiled or make_bank_predict(model_cfg, enc)
    frozen = {"text": enc.text_params, "vit": enc.vit_params}
    preds, labels = [], []
    b = min(batch_size, max(bank.n, 1))
    if compiled is not None and b != batch_size:
        predict = make_bank_predict(model_cfg, enc)   # stale AOT shape
    for lo in range(0, bank.n, b):
        idx = (np.arange(lo, lo + b) % bank.n).astype(np.int32)
        valid = min(b, bank.n - lo)
        batch = {k: jnp.take(bank.data[k], jnp.asarray(idx), axis=0)
                 for k in bank.data}
        p = np.asarray(predict(fusion_params, frozen, batch))[:valid]
        l = np.asarray(batch["labels"])[:valid]
        preds.append(p)
        labels.append(l)
    return metrics_from_preds(np.concatenate(preds), np.concatenate(labels),
                              results_csv=results_csv)


def evaluate_streaming(csv_path, enc, model_cfg, fusion_params,
                       batch_size: int = 64, image_size: int = 256,
                       max_length: int = 512, io_workers: int = 8,
                       results_csv=None, root=None):
    """Raw-path eval: stream test images per batch (never bank-resident),
    tokenize on host, predict on device. Produces the same per-path +
    unified metric rows as pipelines/eval_models.evaluate_store."""
    import jax

    from mmd_tpu.pipelines.eval_models import metrics_from_preds

    df = pd.read_csv(csv_path)
    root = Path(root) if root else get_project_root()
    transform = (TRAIN_TRANSFORM if image_size == 256 else
                 dataclasses.replace(TRAIN_TRANSFORM, size=image_size))
    predict = make_bank_predict(model_cfg, enc)
    frozen = {"text": enc.text_params, "vit": enc.vit_params}
    preds, labels = [], []
    for lo in range(0, len(df), batch_size):
        rows = df.iloc[lo:lo + batch_size]
        n = len(rows)
        pad = batch_size - n
        texts_c = rows["claim"].fillna("").astype(str).tolist() + [""] * pad
        texts_d = rows["evidence"].fillna("").astype(str).tolist() + [""] * pad
        c_ids, c_mask, _ = enc.tokenizer.encode_batch(texts_c,
                                                      max_length=max_length)
        d_ids, d_mask, _ = enc.tokenizer.encode_batch(texts_d,
                                                      max_length=max_length)

        def paths(col):
            out = []
            for p in rows[col]:
                if isinstance(p, str) and p:
                    out.append(p if Path(p).is_absolute() else str(root / p))
                else:
                    out.append(None)
            return out + [None] * pad

        c_img, c_ok = load_images_parallel(paths("claim_image"), transform,
                                           io_workers)
        d_img, d_ok = load_images_parallel(paths("evidence_image"), transform,
                                           io_workers)
        valid = (c_ok & d_ok)[:n]
        batch = {"claim_ids": c_ids, "claim_mask": c_mask,
                 "doc_ids": d_ids, "doc_mask": d_mask,
                 "claim_image": c_img, "doc_image": d_img}
        p = np.asarray(predict(fusion_params, frozen, batch))[:n][valid]
        l = categories_to_label_array(rows["category"].tolist())[valid]
        preds.append(p)
        labels.append(l)
    preds = np.concatenate(preds)
    labels = np.concatenate(labels)
    return metrics_from_preds(preds, labels, results_csv=results_csv)


# ---------------------------------------------------------------------------
# Retrieval corpora from the bank
# ---------------------------------------------------------------------------


def _load_resnet(tiny: bool, assets):
    import jax

    from mmd_tpu.models.resnet import RESNET_TEST, ResNetConfig, init_resnet

    cfg = RESNET_TEST if tiny else ResNetConfig()
    params = None
    ckpt = Path(assets) / "resnet50.ckpt"
    if not tiny and ckpt.exists():
        from mmd_tpu.core.checkpoint import load_params
        params = load_params(str(ckpt))
    if params is None:
        params = init_resnet(jax.random.key(7), cfg)
    return params, cfg


class BankResNetFeatures:
    """Ingest hook computing the image-retrieval corpus features from the
    streamed evidence-image chunks (so embed_images banks never need the
    raw pixels resident). Same device math as build_image_corpus_from_bank:
    RESNET_TRANSFORM normalization + resize on device, bf16 ResNet
    (reference im2im_retrieval.py:14-17's precompute). Feature arrays stay
    on device until write() pulls them in one pass."""

    def __init__(self, tiny: bool = False, sub: int = 64,
                 assets="assets/encoders"):
        import jax
        import jax.numpy as jnp

        from mmd_tpu.models.resnet import resnet_features
        from mmd_tpu.ops.image_ops import RESNET_TRANSFORM

        self.params, self.cfg = _load_resnet(tiny, assets)
        self._chunks: list = []
        size = RESNET_TRANSFORM.size
        mean = jnp.asarray(RESNET_TRANSFORM.mean, jnp.float32) * 255.0
        std = jnp.asarray(RESNET_TRANSFORM.std, jnp.float32) * 255.0
        cfg = self.cfg

        @jax.jit
        def feat(params, u8):
            def f(block):
                x = (block.astype(jnp.float32) - mean) / std
                x = jax.image.resize(
                    x, (block.shape[0], size, size, 3), "bilinear")
                return resnet_features(params, x.astype(jnp.bfloat16), cfg)
            s = min(sub, u8.shape[0])
            while u8.shape[0] % s:
                s -= 1
            blocks = u8.reshape(u8.shape[0] // s, s, *u8.shape[1:])
            return jax.lax.map(f, blocks).reshape(u8.shape[0], -1)

        self._feat = feat

    def on_chunk(self, imgs: dict, start: int, n: int):
        self._chunks.append((start, n,
                             self._feat(self.params, imgs["doc"])))

    def write(self, bank: DeviceBank, root: Path):
        """Assemble (bank.n, feature_dim) f16 and write the corpus."""
        import jax.numpy as jnp

        from mmd_tpu.retrieval.image import ImageCorpus

        if self._chunks:
            stacked = np.asarray(
                jnp.concatenate([c[2] for c in self._chunks]), np.float16)
            rows = []
            off = 0
            for start, n, f in self._chunks:
                rows.append(stacked[off:off + n])
                off += f.shape[0]
            features = np.concatenate(rows)[:bank.n]
        else:
            features = np.zeros((0, self.cfg.feature_dim), np.float16)
        self._chunks.clear()
        corpus = ImageCorpus(root / "data" / "retrieval" / "image_corpus",
                             resnet_params=self.params, cfg=self.cfg)
        corpus.write_feature_corpus(features,
                                    [str(p) for p in bank.doc_paths])
        return corpus


def build_image_corpus_from_bank(bank: DeviceBank, root: Path,
                                 tiny: bool = False, batch: int = 64,
                                 assets="assets/encoders"):
    """ResNet feature corpus from the bank's device-resident evidence
    images: 256 -> 224 resize + RESNET_TRANSFORM normalization ON DEVICE
    (the staged path host-decodes at 224 — pixel-identical only up to the
    resize chain; ids are the ORIGINAL evidence image paths, so demo
    lookups behave the same)."""
    import jax
    import jax.numpy as jnp

    from mmd_tpu.models.resnet import resnet_features
    from mmd_tpu.ops.image_ops import RESNET_TRANSFORM
    from mmd_tpu.retrieval.image import ImageCorpus

    resnet_params, cfg = _load_resnet(tiny, assets)

    size = RESNET_TRANSFORM.size
    mean = jnp.asarray(RESNET_TRANSFORM.mean, jnp.float32) * 255.0
    std = jnp.asarray(RESNET_TRANSFORM.std, jnp.float32) * 255.0

    @jax.jit
    def feat_fn(params, data, start):
        u8 = jax.lax.dynamic_slice(
            data["doc_image"], (start, 0, 0, 0),
            (batch, *data["doc_image"].shape[1:]))
        x = (u8.astype(jnp.float32) - mean) / std
        x = jax.image.resize(x, (batch, size, size, 3), "bilinear")
        return resnet_features(params, x.astype(jnp.bfloat16), cfg)

    feats = []
    for lo in range(0, bank.n, batch):
        feats.append(np.asarray(
            feat_fn(resnet_params, bank.data, jnp.int32(lo)), np.float16))
    features = np.concatenate(feats)[:bank.n] if feats else \
        np.zeros((0, cfg.feature_dim), np.float16)
    corpus = ImageCorpus(root / "data" / "retrieval" / "image_corpus",
                         resnet_params=resnet_params, cfg=cfg)
    corpus.write_feature_corpus(features, [str(p) for p in bank.doc_paths])
    return corpus
