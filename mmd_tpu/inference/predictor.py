"""Single-pair and batched inference (reference evaluate.py parity).

MisinformationPredictor bundles the frozen encoders, tokenizer, and a trained
fusion checkpoint; `evaluate()` matches the reference contract
(reference evaluate.py:94-196): per-path labels with confidence + full
probability dicts, graceful None handling when an image fails to load
(the affected modality paths come back None).

TPU addition the reference lacks: `evaluate_batch()` classifies many
(claim, evidence) pairs in ONE compiled forward — the demo's per-evidence
loop (app.py:461-476 re-runs tokenizer+encoders per pair) becomes a single
batch.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from mmd_tpu.core.config import ModelConfig
from mmd_tpu.inference.rules import LABELS
from mmd_tpu.models import text_encoder as te
from mmd_tpu.models import vit as V
from mmd_tpu.models.frozen import FrozenEncoders, load_or_init_frozen
from mmd_tpu.models.fusion import fusion_forward, init_fusion_params
from mmd_tpu.ops.image_ops import EVAL_TRANSFORM, load_images_parallel, normalize_on_device

IDX_TO_LABEL = {0: "support", 1: "not_enough_information", 2: "refute"}
PATHS = ("text_text", "text_image", "image_text", "image_image")


class MisinformationPredictor:
    def __init__(self, model_cfg: ModelConfig, fusion_params=None,
                 checkpoint_path: Optional[str] = None,
                 encoders: Optional[FrozenEncoders] = None,
                 assets_dir: str = "assets/encoders",
                 max_length: int = 512, batch_size: int = 16,
                 mesh=None, text_parallelism: Optional[str] = None):
        """text_parallelism: serve the frozen text encoder over `mesh` —
        "tp" (Megatron split via tp.shard_encoder), "pp" (GPipe stages),
        or "sp" (sequence parallel). None = single-device serving, the
        reference's deployment shape (evaluate.py:12-33)."""
        import jax
        import jax.numpy as jnp

        self.cfg = model_cfg
        self.enc = encoders or load_or_init_frozen(assets_dir)
        self.max_length = max_length
        self.batch_size = batch_size
        if text_parallelism is not None and mesh is None:
            raise ValueError("text_parallelism requires a mesh")
        self._mesh = mesh
        self._text_mode = text_parallelism
        if fusion_params is None:
            if checkpoint_path:
                from mmd_tpu.core.checkpoint import load_params
                template = init_fusion_params(jax.random.key(0), model_cfg)
                fusion_params = load_params(checkpoint_path, template)
            else:
                fusion_params = init_fusion_params(jax.random.key(0), model_cfg)
        self.params = fusion_params

        vit_dtype = jnp.dtype(self.enc.vit_cfg.compute_dtype)

        # params as explicit jit args (closed-over arrays become HLO
        # constants and bloat the compile payload)
        if self._text_mode is None:
            @jax.jit
            def _text(p, ids, mask):
                from mmd_tpu.models.frozen import text_encode
                return text_encode(p, self.enc.text_cfg, ids, mask)
        else:
            from mmd_tpu.models.frozen import text_encode_parallel
            if self._text_mode == "tp":
                from mmd_tpu.parallel.tp import shard_encoder
                self.enc.text_params = shard_encoder(self.enc.text_params,
                                                     self._mesh)

            @jax.jit
            def _text(p, ids, mask):
                return text_encode_parallel(p, self.enc.text_cfg, ids, mask,
                                            mesh=self._mesh,
                                            mode=self._text_mode)

        @jax.jit
        def _image(p, u8):
            from mmd_tpu.models.frozen import image_encode
            x = normalize_on_device(u8, self._img_transform(), vit_dtype)
            return image_encode(p, self.enc.vit_cfg, x)

        @jax.jit
        def _fusion(p, x_t, x_i, e_t, e_i):
            (y_tt, y_ti), (y_it, y_ii) = fusion_forward(
                p, self.cfg, x_t, x_i, e_t, e_i, deterministic=True)
            return y_tt, y_ti, y_it, y_ii

        self._text_fn = lambda ids, mask: _text(self.enc.text_params, ids, mask)
        self._image_fn = lambda u8: _image(self.enc.vit_params, u8)
        self._fusion_fn = lambda *a: _fusion(self.params, *a)

    def _img_transform(self):
        import dataclasses
        size = self.enc.vit_cfg.image_size
        t = EVAL_TRANSFORM
        return t if t.size == size else dataclasses.replace(t, size=size)

    # ------------------------------------------------------------------

    def _encode_texts(self, texts: Sequence[str], timings=None):
        """-> DEVICE array (n, L, D): embeddings never visit the host —
        the fusion forward consumes them in place and only logits come
        back (each (B, 512, D) f32 pulled+re-pushed costs ~25 ms/MB each
        way on tunneled links; round 5 serving fix)."""
        import time as _t

        import jax.numpy as jnp

        n = len(texts)
        pad = list(map(str, texts)) + [""] * (self.batch_size - n % self.batch_size
                                              if n % self.batch_size else 0)
        out = []
        for lo in range(0, len(pad), self.batch_size):
            t0 = _t.perf_counter()
            ids, mask, _ = self.enc.tokenizer.encode_batch(
                pad[lo:lo + self.batch_size], max_length=self.max_length)
            t1 = _t.perf_counter()
            out.append(self._text_fn(ids, mask))
            if timings is not None:
                timings["tokenize_s"] = timings.get("tokenize_s", 0.) + t1 - t0
                timings["dispatch_s"] = (timings.get("dispatch_s", 0.)
                                         + _t.perf_counter() - t1)
        dev = out[0] if len(out) == 1 else jnp.concatenate(out)
        return dev[:n]

    def _encode_images(self, paths: Sequence[Optional[str]], timings=None):
        """-> (DEVICE array (n, T, D), ok (n,) bool host)."""
        import time as _t

        import jax.numpy as jnp

        n = len(paths)
        rem = n % self.batch_size
        pad = list(paths) + [None] * (self.batch_size - rem if rem else 0)
        embs, oks = [], []
        for lo in range(0, len(pad), self.batch_size):
            t0 = _t.perf_counter()
            imgs, ok = load_images_parallel(pad[lo:lo + self.batch_size],
                                            self._img_transform())
            t1 = _t.perf_counter()
            embs.append(self._image_fn(imgs))
            oks.append(ok)
            if timings is not None:
                timings["decode_s"] = timings.get("decode_s", 0.) + t1 - t0
                timings["dispatch_s"] = (timings.get("dispatch_s", 0.)
                                         + _t.perf_counter() - t1)
        dev = embs[0] if len(embs) == 1 else jnp.concatenate(embs)
        return dev[:n], np.concatenate(oks)[:n]

    @staticmethod
    def _softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    def _process_logits(self, logits_row) -> dict:
        probs = self._softmax(np.asarray(logits_row, np.float64))
        idx = int(probs.argmax())
        return {
            "label": IDX_TO_LABEL[idx],
            "confidence": float(probs[idx]),
            "probabilities": {IDX_TO_LABEL[i]: float(p)
                              for i, p in enumerate(probs)},
        }

    # ------------------------------------------------------------------

    def evaluate_batch(self, claim_texts, claim_image_paths,
                       evidence_texts, evidence_image_paths,
                       detailed: bool = False, timings=None) -> list:
        """Classify N pairs in batched compiled forwards. Returns, per pair,
        {path: label-or-None} (or full detail dicts when detailed=True).
        Embeddings stay ON DEVICE between the encoders and fusion; only
        the (N, 4, C) logits cross back to the host. `timings` (optional
        dict) accumulates per-stage seconds: tokenize/decode (host),
        dispatch (async device calls), d2h (logits sync pull)."""
        import time as _t

        x_t = self._encode_texts(claim_texts, timings)
        e_t = self._encode_texts(evidence_texts, timings)
        x_i, x_ok = self._encode_images(claim_image_paths, timings)
        e_i, e_ok = self._encode_images(evidence_image_paths, timings)
        t0 = _t.perf_counter()
        logits_dev = self._fusion_fn(x_t, x_i, e_t, e_i)
        t1 = _t.perf_counter()
        y_tt, y_ti, y_it, y_ii = (np.asarray(a, np.float32)
                                  for a in logits_dev)
        if timings is not None:
            timings["dispatch_s"] = timings.get("dispatch_s", 0.) + t1 - t0
            timings["d2h_s"] = (timings.get("d2h_s", 0.)
                                + _t.perf_counter() - t1)
            timings["batches"] = timings.get("batches", 0) + 1
        results = []
        for j in range(len(x_t)):
            avail = {
                "text_text": True,
                "text_image": bool(e_ok[j]),
                "image_text": bool(x_ok[j]),
                "image_image": bool(x_ok[j] and e_ok[j]),
            }
            logits = {"text_text": y_tt[j], "text_image": y_ti[j],
                      "image_text": y_it[j], "image_image": y_ii[j]}
            out = {}
            for path in PATHS:
                if not avail[path]:
                    out[path] = None
                    continue
                detail = self._process_logits(logits[path])
                out[path] = detail if detailed else detail["label"]
            results.append(out)
        return results

    def evaluate(self, claim_text, claim_image_path, evidence_text,
                 evidence_image_path, detailed: bool = False
                 ) -> Optional[dict]:
        """Single pair (reference evaluate.py:94-196 contract)."""
        try:
            return self.evaluate_batch(
                [claim_text], [claim_image_path],
                [evidence_text], [evidence_image_path], detailed=detailed)[0]
        except Exception as e:  # graceful None like the reference :194-196
            print(f"[predictor] evaluation error: {e}")
            return None
