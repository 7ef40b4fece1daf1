"""Similarity search stages: cosine top-k ANN and all-pairs similarity.

Patterns (reference analog: the O(n²) cosine dedup loop and the
one-vs-corpus ``find_duplicates``, metadata.py:182-211,514-624 — here
re-expressed as broadcast + blocked matmul so each Ray task does a
vectorized slice of the comparison matrix):

- **broadcast-small-side**: the query matrix / corpus token matrix is
  ``ray.put`` ONCE on the driver; every map_batches task reads the object
  ref (zero re-shipping per batch) and matmuls its batch against it.
- **blocked all-pairs**: each batch of rows × broadcast full matrix →
  emits only pairs above threshold with id_a < id_b (no duplicate pairs,
  no driver-side loop).

Scale path: for corpora where the broadcast side no longer fits a worker
(≳ millions of vectors), swap the broadcast for an IVF/LSH bucket
join — same groupby-shuffle shape as stages/dedup.py near_dup_pairs.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa

import ray


def _as_matrix(embeddings: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix."""
    if isinstance(embeddings, pa.ChunkedArray):
        embeddings = embeddings.combine_chunks()
    flat = embeddings.flatten().to_numpy(zero_copy_only=False)
    n = len(embeddings)
    return flat.reshape(n, -1).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0  # zero vector → cosine 0 (reference
    # convention: metadata.py:182-194 returns 0.0 for zero vectors)
    return m / norms


def cosine_topk(ds, query_ids: List[int], k: int = 10,
                id_col: str = "vec_id", emb_col: str = "embedding",
                exclude_self: bool = True):
    """Brute-force cosine top-k of every query vector against the dataset.

    The query matrix is materialized from the dataset itself (rows whose
    id is in ``query_ids`` — a tiny side), broadcast via ray.put, and each
    batch computes a (batch × queries) similarity block; per-batch partial
    top-k results are reduced on the driver (k × |queries| rows — small).

    Returns a pyarrow Table (query_id, vec_id, cosine_sim, rank) with
    cosine rounded to 6 decimals, rank 1..k ordered by (sim desc, vec_id).
    """
    qset = set(int(q) for q in query_ids)

    def grab_queries(batch: pa.Table) -> pa.Table:
        mask = pa.array([int(v) in qset for v in batch[id_col].to_pylist()])
        return batch.filter(mask)

    q_tab = (ds.map_batches(grab_queries, batch_format="pyarrow")
             .to_pandas())
    q_ids = q_tab[id_col].to_numpy()
    q_mat = _normalize(np.stack(
        [np.asarray(e, dtype=np.float64) for e in q_tab[emb_col]]))
    order = np.argsort(q_ids)
    q_ids, q_mat = q_ids[order], q_mat[order]
    ref = ray.put((q_ids, q_mat))

    def partial_topk(batch: pa.Table) -> pa.Table:
        ids_q, mat_q = ray.get(ref)
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        m = _normalize(_as_matrix(batch[emb_col]))
        sims = m @ mat_q.T                      # (batch, n_queries)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(ids_q)):
            col = sims[:, qi]
            cand = np.arange(len(ids))
            if exclude_self:
                keep_mask = ~np.isin(ids, ids_q)
                cand = cand[keep_mask]
            if len(cand) == 0:
                continue
            top = cand[np.argsort(-col[cand], kind="stable")[:k]]
            out_q.extend([int(ids_q[qi])] * len(top))
            out_v.extend(ids[top].tolist())
            out_s.extend(col[top].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "cosine_sim": pa.array(out_s, pa.float64()),
        })

    partials = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    # final reduce: global top-k per query with deterministic tie-break
    partials = partials.sort_values(
        ["query_id", "cosine_sim", "vec_id"],
        ascending=[True, False, True], kind="mergesort")
    topk = partials.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    topk["rank"] = topk.groupby("query_id", sort=True).cumcount() + 1
    topk["cosine_sim"] = topk["cosine_sim"].round(6)
    return pa.Table.from_pandas(topk, preserve_index=False)


def embedding_near_dup_pairs(ds, threshold: float,
                             id_col: str = "vec_id",
                             emb_col: str = "embedding"):
    """All pairs with cosine >= threshold (id_a < id_b), blocked matmul
    against a broadcast normalized corpus matrix."""
    full = ds.to_pandas()
    ids = full[id_col].to_numpy().astype(np.int64)
    mat = _normalize(np.stack(
        [np.asarray(e, dtype=np.float64) for e in full[emb_col]]))
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    ref = ray.put((ids, mat))

    def block_pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        bids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        bm = _normalize(_as_matrix(batch[emb_col]))
        sims = bm @ all_mat.T                   # (batch, n_all)
        ai, aj = np.where(sims >= threshold)
        ia, ib = bids[ai], all_ids[aj]
        keep = ia < ib                          # canonical ordering, no self
        return pa.table({
            "id_a": pa.array(ia[keep], pa.int64()),
            "id_b": pa.array(ib[keep], pa.int64()),
            "cosine_sim": pa.array(np.round(sims[ai, aj][keep], 6),
                                   pa.float64()),
        })

    return ds.map_batches(block_pairs, batch_format="pyarrow")


def token_jaccard_pairs(ds, threshold: float,
                        id_col: str, text_col: str = "text"):
    """All pairs with distinct-token-set Jaccard >= threshold, via a
    broadcast binary doc-term matrix and blocked integer matmul
    (exact — matches a SQL list_intersect oracle bit-for-bit).

    |A∩B| = M @ M.T over the 0/1 doc-term matrix; |A∪B| = |A|+|B|−|A∩B|.
    """
    from dataquality_ray.spec import tokenize

    full = ds.to_pandas()
    ids = full[id_col].to_numpy().astype(np.int64)
    token_sets = [set(tokenize(t)) for t in full[text_col]]
    vocab = {}
    for s in token_sets:
        for t in s:
            if t not in vocab:
                vocab[t] = len(vocab)
    m = np.zeros((len(ids), len(vocab)), dtype=np.float32)
    for i, s in enumerate(token_sets):
        for t in s:
            m[i, vocab[t]] = 1.0
    sizes = m.sum(axis=1)
    order = np.argsort(ids)
    ids, m, sizes = ids[order], m[order], sizes[order]
    ref = ray.put((ids, m, sizes, vocab))

    def block(batch: pa.Table) -> pa.Table:
        all_ids, all_m, all_sizes, voc = ray.get(ref)
        bids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        bsets = [set(tokenize(t)) for t in batch[text_col].to_pylist()]
        bm = np.zeros((len(bids), all_m.shape[1]), dtype=np.float32)
        for i, s in enumerate(bsets):
            for t in s:
                j = voc.get(t)
                if j is not None:
                    bm[i, j] = 1.0
        # counts are small ints, exactly representable in f32; divide in
        # f64 so the result is bit-identical to SQL double division
        inter = (bm @ all_m.T).astype(np.float64)
        bsizes = bm.sum(axis=1, dtype=np.float64)
        union = bsizes[:, None] + all_sizes.astype(np.float64)[None, :] - inter
        with np.errstate(divide="ignore", invalid="ignore"):
            jac = np.where(union > 0, inter / union, 1.0)
        ai, aj = np.where(jac >= threshold)
        ia, ib = bids[ai], all_ids[aj]
        # canonical ordering + zero-token guard (SQL oracle excludes
        # token-less rows from pairing)
        keep = (ia < ib) & (bsizes[ai] > 0) & (all_sizes[aj] > 0)
        return pa.table({
            "id_a": pa.array(ia[keep], pa.int64()),
            "id_b": pa.array(ib[keep], pa.int64()),
            "jaccard": pa.array(jac[ai, aj][keep].astype(np.float64),
                                pa.float64()),
        })

    return ds.map_batches(block, batch_format="pyarrow")
