"""Text-to-text evidence retrieval: bi-encoder recall + cross-encoder re-rank.

Parity with the reference protocol (reference text2text_retrieval.py):
  * TextCorpus.encode_corpus: embed every `evidence_enriched` row with the
    bi-encoder (mean-pooled sentence embeddings, float16 store + ids
    `f"{split}_{id}"`, :123-157);
  * SemanticSearch.search(query, top_k): bi-encode the query, take top
    (top_k*5) from the train AND test corpora (:56-64), re-rank the union
    with the cross-encoder over [query, evidence] PAIRS (:69-95), merge,
    sort by cross score, exact-score dedup, truncate (:97-120).

TPU re-architecture: corpora live on device as one matrix per split; recall
is one matmul + top_k; the cross-encoder re-rank runs as ONE batched forward
over all candidate pairs instead of the reference's per-pair loop.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from mmd_tpu.data.store import ArrayStore, ArrayStoreWriter
from mmd_tpu.data.tokenizer import WordPieceTokenizer
from mmd_tpu.models import text_encoder as te
from mmd_tpu.ops.topk import exact_score_dedup


class TextCorpus:
    """Builds + serves one split's evidence-embedding matrix."""

    def __init__(self, store_dir: str | Path, tokenizer: WordPieceTokenizer,
                 cfg=None, params=None, seed: int = 11,
                 max_length: int = 512, int8: bool = False):
        """With `int8`, the corpus matrix lives per-row-quantized int8 in
        HBM (+ f32 scales) and scoring runs the int8 MXU path
        (ops/topk.dense_topk_int8) — half the corpus memory/traffic, 2x
        matmul peak, near-tie ordering within the ~1/127 step."""
        import jax
        self.dir = Path(store_dir)
        self.tokenizer = tokenizer
        self.cfg = cfg or te.BI_ENCODER_BASE
        if params is None:
            import dataclasses
            self.cfg = dataclasses.replace(
                self.cfg, vocab_size=tokenizer.vocab_size)
            params = te.init_text_encoder(jax.random.key(seed), self.cfg)
        self.params = params
        self.max_length = max_length
        self.int8 = int8
        self._emb = None
        self._q8 = None
        self._scales = None
        self._ids: Optional[list] = None

        @jax.jit
        def _enc(params, ids, mask):
            hidden = te.encode(params, self.cfg, ids, mask)
            return te.mean_pool(hidden, mask)
        self._encode_fn = lambda ids, mask: _enc(self.params, ids, mask)

    def encode_texts(self, texts: Sequence[str], batch_size: int = 64
                     ) -> np.ndarray:
        out = []
        texts = [str(t) for t in texts]
        for lo in range(0, len(texts), batch_size):
            chunk = texts[lo:lo + batch_size]
            pad = chunk + [""] * (batch_size - len(chunk))
            ids, mask, _ = self.tokenizer.encode_batch(pad, max_length=self.max_length)
            emb = np.asarray(self._encode_fn(ids, mask), np.float32)
            out.append(emb[: len(chunk)])
        return np.concatenate(out) if out else np.zeros((0, self.cfg.hidden_size))

    def encode_corpus(self, texts: Sequence[str], ids: Sequence[str],
                      batch_size: int = 64) -> int:
        emb = self.encode_texts(texts, batch_size).astype(np.float16)
        writer = ArrayStoreWriter(
            self.dir, capacity=len(emb),
            columns={"embeddings": ((self.cfg.hidden_size,), np.float16)})
        if len(emb):
            writer.append_batch({"embeddings": emb})
        writer.finalize()
        (self.dir / "ids.json").write_text(json.dumps(list(map(str, ids))))
        print(f"[text2text] corpus {self.dir}: {len(emb)} embeddings")
        return len(emb)

    def load(self):
        import jax
        import jax.numpy as jnp
        if self._ids is None:
            store = ArrayStore(self.dir)
            self._ids = json.loads((self.dir / "ids.json").read_text())
            feats = store.col("embeddings")
            if self.int8:
                from mmd_tpu.ops.topk import l2_normalize, quantize_rows_int8
                self._q8, self._scales = jax.jit(
                    lambda f: quantize_rows_int8(l2_normalize(f))
                )(jnp.asarray(feats, jnp.float32))
            else:
                self._emb = jnp.asarray(feats, jnp.bfloat16)
        return self._emb, self._ids

    def topk(self, queries, k: int):
        """(scores (Q, k) f32, indices (Q, k) i32) over this corpus —
        dispatches bf16 dense_topk / int8 MXU path per the `int8` flag."""
        import jax.numpy as jnp
        from mmd_tpu.ops.topk import dense_topk, dense_topk_int8
        self.load()
        if self.int8:
            return dense_topk_int8(jnp.asarray(queries, jnp.float32),
                                   self._q8, self._scales, k)
        return dense_topk(jnp.asarray(queries, jnp.bfloat16), self._emb, k)


def resolve_retrieval_encoders(assets_dir) -> dict:
    """Converted retrieval assets (tools/convert_hf.py --bi_encoder /
    --cross_encoder): {"bi_cfg","bi_params","bi_tokenizer","cross_cfg",
    "cross_params"}, entries None when no converted checkpoint is present
    (seeded-init fallback applies, models/frozen.py semantics)."""
    import json
    from pathlib import Path as _P

    from mmd_tpu.models.transformer import TransformerConfig

    assets = _P(assets_dir)
    out = {"bi_cfg": None, "bi_params": None, "bi_tokenizer": None,
           "cross_cfg": None, "cross_params": None}

    def ckpt(path):
        from mmd_tpu.core.checkpoint import load_params
        return load_params(str(path))

    if (assets / "bi_encoder.ckpt").exists():
        out["bi_cfg"] = TransformerConfig(**json.loads(
            (assets / "bi_encoder_config.json").read_text()))
        out["bi_params"] = ckpt(assets / "bi_encoder.ckpt")
        if (assets / "bi_tokenizer.json").exists():
            out["bi_tokenizer"] = WordPieceTokenizer.load(
                assets / "bi_tokenizer.json")
    if (assets / "cross_encoder.ckpt").exists():
        out["cross_cfg"] = TransformerConfig(**json.loads(
            (assets / "cross_encoder_config.json").read_text()))
        out["cross_params"] = ckpt(assets / "cross_encoder.ckpt")
    return out


class SemanticSearch:
    """Two-stage search over one or more corpora with optional re-rank."""

    def __init__(self, bi_encoder: TextCorpus, corpora: Sequence[TextCorpus],
                 cross_encoder_params=None, cross_cfg=None,
                 evidence_lookup=None, rerank_max_length: int = 256):
        """evidence_lookup: id -> evidence text (needed for re-ranking)."""
        import jax
        self.bi = bi_encoder
        self.corpora = list(corpora)
        self.lookup = evidence_lookup or {}
        self.cross_cfg = cross_cfg
        self.cross_params = cross_encoder_params
        self.rerank_max_length = rerank_max_length
        if cross_encoder_params is not None:
            @jax.jit
            def _score(params, ids, mask, types):
                return te.cross_encoder_score(
                    params, self.cross_cfg, ids, mask, types)
            self._cross_fn = (lambda ids, mask, types:
                              _score(self.cross_params, ids, mask, types))
        else:
            self._cross_fn = None

    def _cross_scores(self, query: str, cand_ids: list[str]) -> np.ndarray:
        texts = [str(self.lookup.get(c, "")) for c in cand_ids]
        n = len(texts)
        tok = self.bi.tokenizer
        ids, mask, types = tok.encode_batch(
            [query] * n, pairs=texts, max_length=self.rerank_max_length)
        return np.asarray(self._cross_fn(ids, mask, types), np.float32)

    def search(self, query: str, top_k: int = 5, recall_factor: int = 5,
               dedup: bool = True):
        """-> list[(id, score)]; cross-encoder scores when available, else
        bi-encoder cosine."""
        import jax.numpy as jnp
        q = self.bi.encode_texts([query])  # (1, D)
        cands: list[tuple[str, float]] = []
        fetch = top_k * recall_factor
        for corpus in self.corpora:
            _, ids = corpus.load()
            k = min(fetch, len(ids))
            if k == 0:
                continue
            s, i = corpus.topk(q, k)
            s, i = np.asarray(s)[0], np.asarray(i)[0]
            cands.extend((ids[j], float(v)) for v, j in zip(s, i))

        if self._cross_fn is not None and cands:
            cand_ids = [c for c, _ in cands]
            scores = self._cross_scores(query, cand_ids)
            cands = list(zip(cand_ids, scores.tolist()))

        cands.sort(key=lambda x: -x[1])
        if dedup:
            s, i = exact_score_dedup(
                np.array([c[1] for c in cands]),
                np.arange(len(cands)), top_k)
            return [(cands[j][0], v) for v, j in zip(s, i)]
        return cands[:top_k]


def main():
    """CLI parity with `python -m src.evidence.text2text_retrieval`
    (reference text2text_retrieval.py:160-195: build corpora, run one demo
    query)."""
    import argparse
    import pandas as pd
    from mmd_tpu.data.schema import get_project_root
    p = argparse.ArgumentParser()
    p.add_argument("--splits", nargs="+", default=["train", "test"])
    p.add_argument("--assets", type=str, default="assets/encoders")
    p.add_argument("--query", type=str, default=None)
    p.add_argument("--top_k", type=int, default=5)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="serve the corpora int8-quantized (half the "
                        "HBM, int8 MXU scoring)")
    args = p.parse_args()
    root = get_project_root()
    tok = WordPieceTokenizer.load(Path(args.assets) / "tokenizer.json")
    from mmd_tpu.models import text_encoder as te
    cfg = te.TINY_TEST if args.tiny else None
    corpora = []
    lookup = {}
    for split in args.splits:
        csv = root / "data" / "preprocessed" / f"{split}_enriched.csv"
        if not csv.exists():
            csv = root / "data" / "preprocessed" / f"{split}.csv"
        df = pd.read_csv(csv)
        col = "evidence_enriched" if "evidence_enriched" in df else "evidence"
        corpus = TextCorpus(root / "data" / "retrieval" / f"text_{split}",
                            tok, cfg=cfg, int8=args.int8)
        if not (corpus.dir / "meta.json").exists():
            corpus.encode_corpus(df[col].fillna("").astype(str).tolist(),
                                 [f"{split}_{i}" for i in df["id"]])
        lookup.update({f"{split}_{r['id']}": str(r[col])
                       for _, r in df.iterrows()})
        corpora.append(corpus)
    if args.query:
        search = SemanticSearch(corpora[0], corpora, evidence_lookup=lookup)
        for eid, score in search.search(args.query, args.top_k):
            print(f"{score:.4f}  {eid}  {lookup.get(eid, '')[:100]}")


if __name__ == "__main__":
    main()
