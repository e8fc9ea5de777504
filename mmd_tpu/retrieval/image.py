"""Image-to-image evidence retrieval.

Re-architects the reference's pickle-dict corpus with its O(N) per-pair
cosine loop (reference im2im_retrieval.py:45-106 — ~41k sequential kernel
launches per query) into an HBM-resident (N, 2048) feature matrix scored by
ONE matmul + lax.top_k, sharded over the mesh when available. Build walks a
directory (or path list) through host-parallel decode + batched ResNet
forwards.

Store layout: ArrayStore(features (N, D) f16) + ids.json (ordered paths).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from mmd_tpu.data.store import ArrayStore, ArrayStoreWriter
from mmd_tpu.models.resnet import ResNetConfig, init_resnet, resnet_features
from mmd_tpu.ops.image_ops import RESNET_TRANSFORM, load_images_parallel, normalize_on_device
from mmd_tpu.ops.topk import dense_topk, exact_score_dedup


class ImageCorpus:
    def __init__(self, store_dir: str | Path, resnet_params=None,
                 cfg: ResNetConfig = ResNetConfig(), mesh=None,
                 int8: bool = False):
        """With `mesh`, corpus rows shard across its devices and queries run
        the local-topk -> ICI all-gather -> re-topk reduction
        (ops/topk.make_sharded_topk). With `int8`, the corpus lives as
        per-row-quantized int8 (+ f32 scales) and scoring runs the int8
        MXU path (ops/topk.dense_topk_int8: 2x bf16 peak, half the HBM
        traffic; near-tie ordering can differ by the ~1/127 quantization
        step). int8 is single-device (exclusive with mesh)."""
        import jax
        self.dir = Path(store_dir)
        self.cfg = cfg
        self.mesh = mesh
        if int8 and mesh is not None:
            raise ValueError("int8 corpus scoring is single-device "
                             "(exclusive with mesh)")
        self.int8 = int8
        self._scales = None
        self._sharded_fn = None
        if resnet_params is None:
            resnet_params = init_resnet(jax.random.key(7), cfg)
        self.params = resnet_params
        self._features = None
        self._ids: Optional[list] = None
        _feat = jax.jit(
            lambda params, u8: resnet_features(
                params, normalize_on_device(u8, RESNET_TRANSFORM), self.cfg))
        self._encode = lambda u8: _feat(self.params, u8)

    # -- build -----------------------------------------------------------

    def create_feature_corpus(self, image_paths: Sequence[str],
                              batch_size: int = 64, io_workers: int = 16
                              ) -> int:
        """Embed every image; failed decodes are skipped and counted
        (reference skip-and-count semantics). Returns corpus size."""
        paths = list(image_paths)
        writer = ArrayStoreWriter(
            self.dir, capacity=len(paths),
            columns={"features": ((self.cfg.feature_dim,), np.float16)})
        kept: list[str] = []
        skipped = 0
        for lo in range(0, len(paths), batch_size):
            chunk = paths[lo:lo + batch_size]
            pad = chunk + [None] * (batch_size - len(chunk))
            imgs, ok = load_images_parallel(pad, RESNET_TRANSFORM, io_workers)
            feats = np.asarray(self._encode(imgs), np.float16)
            ok = ok[: len(chunk)]
            skipped += int((~ok).sum())
            idx = np.nonzero(ok)[0]
            if len(idx):
                writer.append_batch({"features": feats[idx]})
                kept.extend(chunk[i] for i in idx)
        writer.finalize()
        (self.dir / "ids.json").write_text(json.dumps(kept))
        print(f"[im2im] corpus built: {len(kept)} images, {skipped} skipped")
        return len(kept)

    def write_feature_corpus(self, features: np.ndarray, ids) -> int:
        """Persist precomputed features (the fused pipeline computes them
        from device-resident banks; same on-disk layout as
        create_feature_corpus)."""
        features = np.asarray(features, np.float16)
        writer = ArrayStoreWriter(
            self.dir, capacity=max(len(features), 1),
            columns={"features": ((self.cfg.feature_dim,), np.float16)})
        if len(features):
            writer.append_batch({"features": features})
        writer.finalize()
        (self.dir / "ids.json").write_text(json.dumps(list(map(str, ids))))
        print(f"[im2im] corpus written: {len(features)} precomputed features")
        return len(features)

    # -- query -----------------------------------------------------------

    def _load(self):
        import jax
        import jax.numpy as jnp
        if self._features is None:
            store = ArrayStore(self.dir)
            feats = store.col("features")
            self._ids = json.loads((self.dir / "ids.json").read_text())
            if self.mesh is not None:
                # shard rows over the mesh (pad to divisibility with -inf-
                # normed rows that can never win)
                from jax.sharding import NamedSharding, PartitionSpec as P
                import numpy as np
                n_dev = self.mesh.devices.size
                pad = (-len(feats)) % n_dev
                if pad:
                    feats = np.concatenate(
                        [feats, np.zeros((pad, feats.shape[1]), feats.dtype)])
                self._features = jax.device_put(
                    jnp.asarray(feats, jnp.bfloat16),
                    NamedSharding(self.mesh, P("data")))
            elif self.int8:
                from mmd_tpu.ops.topk import l2_normalize, quantize_rows_int8
                q8, s = jax.jit(
                    lambda f: quantize_rows_int8(l2_normalize(f))
                )(jnp.asarray(feats, jnp.float32))
                self._features, self._scales = q8, s
            else:
                self._features = jnp.asarray(feats, jnp.bfloat16)

    def __len__(self):
        self._load()
        return len(self._ids)

    def extract_features(self, image_path: str) -> Optional[np.ndarray]:
        imgs, ok = load_images_parallel([image_path], RESNET_TRANSFORM)
        if not ok[0]:
            return None
        return np.asarray(self._encode(imgs))[0]

    def retrieve_similar_images(self, query_path: str, top_k: int = 5,
                                dedup: bool = True):
        """-> list[(path, score)] like the reference API
        (im2im_retrieval.py:80-106), incl. exact-score dedup of duplicate
        corpus images."""
        q = self.extract_features(query_path)
        if q is None:
            return []
        return self.retrieve_by_features(q[None], top_k, dedup)[0]

    def retrieve_by_features(self, queries: np.ndarray, top_k: int = 5,
                             dedup: bool = True):
        import jax.numpy as jnp
        self._load()
        fetch = min(top_k * 4, len(self._ids)) if dedup else min(top_k, len(self._ids))
        q = jnp.asarray(queries, jnp.bfloat16)
        if self.mesh is not None:
            from mmd_tpu.ops.topk import make_sharded_topk
            if self._sharded_fn is None:
                self._sharded_fn = make_sharded_topk(
                    self.mesh, "data", n_corpus=self._features.shape[0],
                    k=fetch)
            s, i = self._sharded_fn(q, self._features)
        elif self.int8:
            from mmd_tpu.ops.topk import dense_topk_int8
            s, i = dense_topk_int8(jnp.asarray(queries, jnp.float32),
                                   self._features, self._scales, fetch)
        else:
            s, i = dense_topk(q, self._features, fetch)
        s, i = np.asarray(s), np.asarray(i)
        # drop padded rows (they score ~0 and land last, but be safe)
        valid = i < len(self._ids)
        s = np.where(valid, s, -np.inf)
        out = []
        n_ids = len(self._ids)
        for row_s, row_i in zip(s, i):
            if dedup:
                ds, di = exact_score_dedup(row_s, row_i, top_k)
            else:
                ds, di = row_s[:top_k].tolist(), row_i[:top_k].tolist()
            out.append([(self._ids[j], float(v)) for v, j in zip(ds, di)
                        if j < n_ids and np.isfinite(v)])
        return out


def main():
    """CLI parity with `python -m src.evidence.im2im_retrieval` (reference
    im2im_retrieval.py:145-167: build the corpus, run one demo query)."""
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--store", type=str, default="data/retrieval/image_corpus")
    p.add_argument("--build_dir", type=str, default=None,
                   help="directory of images to (re)build the corpus from")
    p.add_argument("--query", type=str, default=None)
    p.add_argument("--top_k", type=int, default=5)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="serve the corpus int8-quantized (half the HBM, "
                        "int8 MXU scoring; ops/topk.dense_topk_int8)")
    args = p.parse_args()
    from mmd_tpu.models.resnet import RESNET_TEST, ResNetConfig
    corpus = ImageCorpus(args.store,
                         cfg=RESNET_TEST if args.tiny else ResNetConfig(),
                         int8=args.int8)
    if args.build_dir:
        paths = sorted(str(x) for x in Path(args.build_dir).glob("*.jpg"))
        corpus.create_feature_corpus(paths)
    if args.query:
        for path, score in corpus.retrieve_similar_images(args.query,
                                                          args.top_k):
            print(f"{score:.4f}  {path}")


if __name__ == "__main__":
    main()
