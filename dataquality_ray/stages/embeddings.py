"""Deterministic text-embedding generation (actor-pool stage).

Reference analog: the Titan embedding call per document
(/root/reference/backend/app/services/bedrock.py:415-453 — a network
model invoked sequentially per record, truncating input at 8000 chars).
Re-expressed Ray-Data-first: a feature-hashing projection embedder
whose projection matrix (frozen md5-derived INTEGER weights — see
PROJ_Q) is built ONCE PER ACTOR (``__init__``), applied to whole Arrow
batches in ``__call__`` — the same actor-pool shape a real encoder
(sentence-transformers, ONNX) would use; swap ``_embed_rows`` for a
model forward pass and nothing else changes. The integer weights make
the whole embedder value-checkable in SQL (doc_embedding_values).

The embedding is L2-normalized tf-weighted sum of per-token projection
rows (token → bucket via the frozen 64-bit token hash). Deterministic,
order-independent, and meaningful for similarity: texts sharing most
tokens land close in cosine — so the output feeds the ANN / cosine
near-dup operators (stages/similarity.py) directly.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np
import pyarrow as pa

from dataquality_ray.config import DEFAULT_CONFIG, PipelineConfig
from dataquality_ray.spec import TOKEN_PATTERN, token_hash_u64

EMBED_DIM = 64
HASH_BUCKETS = 4096
# integer projection weights in [-PROJ_Q, PROJ_Q]: accumulation is
# EXACT int64 (order/partition-independent), so the embedding —
# integer accumulator normalized in one float64 sqrt/divide and
# rounded to 6 — is bit-identical across engines and SQL-checkable
# (md5_number_upper % (2Q+1) - Q is the DuckDB twin). Overflow bound:
# acc <= 4000 tokens × Q = 2.6e8; Σ acc² over 64 dims <= 4.4e18 < 2^63.
PROJ_Q = 65536


def projection_weight(bucket: int, dim: int) -> int:
    """Frozen md5-derived projection weight in [-PROJ_Q, PROJ_Q]."""
    return int(token_hash_u64(f"proj:{bucket}:{dim}")
               % (2 * PROJ_Q + 1)) - PROJ_Q


class HashedProjectionEmbedder:
    """map_batches actor: append ``embedding`` (list<float32>, unit L2).

    State (projection matrix, compiled tokenizer, token-hash cache) is
    built once per actor — the lesson from the reference constructing a
    fresh client per call (bedrock.py:26-31).
    """

    def __init__(self, text_col: str = "text",
                 out_col: str = "embedding",
                 dim: int = EMBED_DIM,
                 buckets: int = HASH_BUCKETS,
                 max_chars: int = 8000,
                 cfg: PipelineConfig = DEFAULT_CONFIG) -> None:
        self.text_col = text_col
        self.out_col = out_col
        self.dim = dim
        self.buckets = buckets
        self.max_chars = max_chars   # reference truncates at 8000 chars
        self.proj = np.fromiter(
            (projection_weight(b, d)
             for b in range(buckets) for d in range(dim)),
            dtype=np.int64, count=buckets * dim).reshape(buckets, dim)
        self.token_rx = re.compile(TOKEN_PATTERN, re.ASCII)
        self._cache: Dict[str, int] = {}

    def _bucket(self, tok: str) -> int:
        b = self._cache.get(tok)
        if b is None:
            b = int(token_hash_u64(tok) % self.buckets)
            if len(self._cache) < 1_000_000:
                self._cache[tok] = b
        return b

    def _acc_rows(self, texts) -> np.ndarray:
        """Exact int64 tf x weight accumulators, one row per text —
        the order/partition-independent integer half of the embedding
        (all-zero row for token-less texts).

        Vectorized (the MinHashSimHash pattern, adapted after an A/B):
        Python truncate+lower per text (the pinned per-text semantics),
        ONE polars extract_all over the batch (TOKEN_PATTERN is
        quote-free ASCII — Rust regex == Python re here), token→bucket
        via ONE flat pass over the actor cache (np.unique on the
        string occurrences was measured 1.6x SLOWER than the dict —
        sort-based object unique costs more than 600k cached gets; see
        PERF_NOTES round 5), then one lexsort + segmented reduceat.
        All accumulation is exact int64, so the result is bit-identical
        to the original per-row scalar recipe (A/B-verified on fixture
        + adversarial-unicode inputs, tests/test_embeddings.py)."""
        import polars as pl
        n = len(texts)
        out = np.zeros((n, self.dim), dtype=np.int64)
        if n == 0:
            return out
        lowered = [(t or "")[: self.max_chars].lower() for t in texts]
        toks = pl.Series(lowered).str.extract_all(TOKEN_PATTERN)
        lens = toks.list.len().to_numpy().astype(np.int64)
        flat = toks.explode(empty_as_null=False).to_numpy()
        if len(flat) == 0:
            return out
        row_idx = np.repeat(np.arange(n), lens)
        cache, miss = self._cache, self._bucket
        bflat = np.fromiter(
            (cache.get(t) if t in cache else miss(t) for t in flat),
            dtype=np.int64, count=len(flat))
        # unique (row, bucket) pairs with tf, then one segmented sum of
        # tf * proj[bucket] per row (buckets ascending within a row —
        # the same order as the scalar np.unique path; int64 addition
        # is exact either way)
        order = np.lexsort((bflat, row_idx))
        r_s, b_s = row_idx[order], bflat[order]
        new = np.ones(len(r_s), dtype=bool)
        new[1:] = (r_s[1:] != r_s[:-1]) | (b_s[1:] != b_s[:-1])
        starts_pair = np.flatnonzero(new)
        tf = np.diff(np.append(starts_pair, len(r_s)))
        rows_u, buckets_u = r_s[starts_pair], b_s[starts_pair]
        contrib = tf[:, None] * self.proj[buckets_u]      # exact int64
        row_new = np.ones(len(rows_u), dtype=bool)
        row_new[1:] = rows_u[1:] != rows_u[:-1]
        seg = np.flatnonzero(row_new)
        out[rows_u[seg]] = np.add.reduceat(contrib, seg, axis=0)
        return out

    def _embed_rows(self, texts) -> np.ndarray:
        accs = self._acc_rows(texts)
        out = np.zeros((len(texts), self.dim), dtype=np.float64)
        for i in range(len(accs)):
            acc = accs[i]
            nsq = int(np.dot(acc, acc))                      # < 2^63
            if nsq > 0:
                # one correctly-rounded sqrt + divide from exact
                # integer inputs, then round-6 — bit-identical in any
                # engine computing the same float64 ops
                out[i] = np.round(acc / np.sqrt(float(nsq)), 6)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        emb = self._embed_rows(texts.to_pylist())
        return batch.append_column(
            self.out_col,
            pa.FixedSizeListArray.from_arrays(
                pa.array(emb.ravel(), pa.float64()), self.dim).cast(
                pa.list_(pa.float64())))


def embed_texts(ds, text_col: str = "text",
                cfg: PipelineConfig = DEFAULT_CONFIG,
                concurrency=None):
    """Attach an ``embedding`` column via the actor-pool embedder."""
    return ds.map_batches(
        HashedProjectionEmbedder,
        fn_constructor_kwargs={"text_col": text_col, "cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=concurrency or (1, cfg.actor_pool_size))
