"""Similarity search stages: cosine top-k ANN and all-pairs similarity.

Reference analog: the O(n²) cosine dedup loop and the one-vs-corpus
``find_duplicates`` (metadata.py:182-211,514-624), re-expressed as
distributed shuffle/broadcast shapes:

- ``cosine_topk``: **broadcast-small-side** — the (tiny) query matrix is
  ``ray.put`` ONCE; every map_batches task matmuls its batch against it
  and emits a partial top-k; the driver reduces k×|queries| rows.
- ``embedding_near_dup_pairs``: **triangle partitioning** — exact
  all-pairs without driver materialization; every unordered pair lands
  in exactly one of C(C+1)/2 chunk-pair groups.
- ``embedding_near_dup_lsh``: **random-hyperplane LSH** banding + exact
  cosine verify — the probabilistic-recall path for web-scale corpora.
- ``token_jaccard_pairs``: **MinHash-LSH candidates + exact verify** —
  same banded-shuffle topology as stages/dedup.py, keyed on int ids.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

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

    return reduce_topk(ds.map_batches(partial_topk, batch_format="pyarrow"),
                       k)


def reduce_topk(partials_ds, k: int) -> pa.Table:
    """Distributed final reduce for per-batch partial top-k streams:
    ``groupby(query_id)`` + per-group top-k BEFORE anything reaches the
    driver, so driver volume is O(|queries| × k) — not
    O(#batches × |queries| × k), which grows linearly with corpus size.
    Deterministic tie-break (sim desc, vec_id asc); cosine rounded to 6
    for the bit-deterministic oracle comparison."""
    import pandas as pd

    def group_topk(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["cosine_sim", "vec_id"],
                            ascending=[False, True], kind="mergesort")
        return df.head(k)

    topk = (partials_ds.groupby("query_id")
            .map_groups(group_topk, batch_format="pandas")
            .to_pandas())                      # |queries| × k rows only
    topk = topk.sort_values(
        ["query_id", "cosine_sim", "vec_id"],
        ascending=[True, False, True], kind="mergesort") \
        .reset_index(drop=True)
    topk["rank"] = topk.groupby("query_id", sort=True).cumcount() + 1
    topk["cosine_sim"] = topk["cosine_sim"].round(6)
    from dataquality_ray.arrowutil import from_pandas_clean
    return from_pandas_clean(topk)


def embedding_near_dup_pairs(ds, threshold: float,
                             id_col: str = "vec_id",
                             emb_col: str = "embedding",
                             num_chunks: int = 8):
    """All pairs with cosine >= threshold (id_a < id_b) via distributed
    *triangle partitioning* — EXACT (every pair is examined once) and
    fully streaming: no driver materialization, no broadcast of the
    corpus matrix.

    Each vector is assigned a chunk ``c = id % C`` and replicated into
    the C pair-groups {(min(c,o), max(c,o)) : o < C}; every unordered
    pair of vectors lands in exactly one group, where a vectorized
    matmul scores it. Shuffle volume = C × corpus (C ≈ √#tasks). This is
    the exactness-preserving shape; for web-scale corpora where C×corpus
    is too much, use ``embedding_near_dup_lsh`` (random-hyperplane
    banding + exact cosine verify — probabilistic recall).
    """
    C = num_chunks

    def explode(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        n = len(ids)
        chunk = ids % C
        others = np.arange(C, dtype=np.int64)
        a = np.minimum(chunk[:, None], others[None, :])
        b = np.maximum(chunk[:, None], others[None, :])
        gid = (a * C + b).ravel()              # (n*C,)
        idx = pa.array(np.repeat(np.arange(n), C))
        return pa.table({
            "gid": pa.array(gid, pa.int64()),
            "pid": pc.take(batch[id_col], idx),
            "emb": pc.take(batch[emb_col], idx),
        })

    def group_pairs(df) -> "pd.DataFrame":
        import pandas as pd
        if len(df) == 0:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64"),
                                 "cosine_sim": pd.Series(dtype="float64")})
        gid = int(df["gid"].iloc[0])
        ga, gb = divmod(gid, C)
        ids = df["pid"].to_numpy().astype(np.int64)
        mat = _normalize(np.stack(
            [np.asarray(e, dtype=np.float64) for e in df["emb"]]))
        chunk = ids % C
        if ga == gb:
            order = np.argsort(ids)
            ids, mat = ids[order], mat[order]
            sims = mat @ mat.T
            iu = np.triu_indices(len(ids), k=1)
            keep = sims[iu] >= threshold
            id_a, id_b = ids[iu[0][keep]], ids[iu[1][keep]]
            cs = sims[iu][keep]
        else:
            la, lb = chunk == ga, chunk == gb
            ia_all, ib_all = ids[la], ids[lb]
            if not len(ia_all) or not len(ib_all):
                return group_pairs(df.iloc[:0])
            sims = mat[la] @ mat[lb].T
            ai, bj = np.where(sims >= threshold)
            ia, ib = ia_all[ai], ib_all[bj]
            id_a = np.minimum(ia, ib)
            id_b = np.maximum(ia, ib)
            cs = sims[ai, bj]
        return pd.DataFrame({"id_a": id_a.astype(np.int64),
                             "id_b": id_b.astype(np.int64),
                             "cosine_sim": np.round(cs, 6)})

    return (ds.map_batches(explode, batch_format="pyarrow")
            .groupby("gid")
            .map_groups(group_pairs, batch_format="pandas")
            .map_batches(lambda t: t, batch_format="pyarrow"))


def rh_signatures(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """64-bit random-hyperplane (SimHash) signatures of row vectors."""
    bits = (mat @ planes.T > 0).astype(np.uint8)          # (n, 64)
    return np.packbits(bits, axis=1, bitorder="little") \
        .view(np.uint64).ravel()


def hyperplanes(dim: int, n_bits: int = 64, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim))


def embedding_near_dup_lsh(ds, threshold: float,
                           id_col: str = "vec_id",
                           emb_col: str = "embedding",
                           max_hamming: int = 24,
                           num_buckets: int = 32,
                           seed: int = 42):
    """Scale path for cosine near-dup: random-hyperplane 64-bit
    signatures → pigeonhole banding (``max_hamming + 1`` chunks; any pair
    within the Hamming budget must agree exactly on >= 1 chunk) → exact
    cosine verification inside each band group.

    Recall is probabilistic: a pair at cosine t has expected signature
    Hamming 64·arccos(t)/π, so choose ``max_hamming`` ≳ that + a few σ
    (t=0.9 → ≈9 expected; the default 24 gives recall ≈ 1 for t ≥ 0.8).
    Precision is exact (verified). No driver materialization. Carrying
    cost: the embedding payload ships once per band ((max_hamming+1)×)
    — for heavy payloads at corpus scale, reshape to slim band rows +
    hash joins as in stages/dedup.near_dup_pairs_join. Band groups are
    width-capped (max_lsh_bucket, logged — recall caveat applies to
    dropped members), identical member sets are verified once, and
    pairs are pre-deduped per bucket before the global distinct.
    """
    import pandas as pd

    from dataquality_ray.config import DEFAULT_CONFIG as _cfg
    from dataquality_ray.stages.dedup import _log_capped_groups

    n_chunks = max_hamming + 1
    bits = max(1, 64 // n_chunks)
    planes_ref = {}

    def explode(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        mat = _as_matrix(batch[emb_col])
        if "p" not in planes_ref:   # built once per worker (seeded)
            planes_ref["p"] = hyperplanes(mat.shape[1], seed=seed)
        sig = rh_signatures(_normalize(mat), planes_ref["p"])
        mask = np.uint64((1 << bits) - 1)
        shifts = (np.arange(n_chunks, dtype=np.uint64)
                  * np.uint64(bits))[None, :]
        chunks = (sig[:, None] >> shifts) & mask
        band = (np.arange(n_chunks, dtype=np.uint64)[None, :]
                << np.uint64(bits)) | chunks
        with np.errstate(over="ignore"):
            bucket = ((band * np.uint64(0xBF58476D1CE4E5B9))
                      >> np.uint64(33)) % np.uint64(num_buckets)
        idx = pa.array(np.repeat(np.arange(len(ids)), n_chunks))
        return pa.table({
            "band_key": pa.array(band.ravel()),
            "band_bucket": pa.array(bucket.ravel().astype(np.int32)),
            "pid": pc.take(batch[id_col], idx),
            "emb": pc.take(batch[emb_col], idx),
        })

    def bucket_pairs(df: "pd.DataFrame") -> "pd.DataFrame":
        out_a, out_b, out_s = [], [], []
        df = df.drop_duplicates(["band_key", "pid"])
        sizes = df.groupby("band_key", sort=False)["pid"].transform("size")
        n_capped, largest = 0, 0
        seen_groups: set = set()
        for _, g in df[sizes > 1].groupby("band_key", sort=False):
            if len(g) > _cfg.max_lsh_bucket:
                n_capped += 1
                largest = max(largest, len(g))
                g = g.sort_values("pid").head(_cfg.max_lsh_bucket)
            ids = g["pid"].to_numpy().astype(np.int64)
            order = np.argsort(ids)
            ids = ids[order]
            gkey = ids.tobytes()
            if gkey in seen_groups:   # identical member set: same pairs
                continue
            seen_groups.add(gkey)
            mat = _normalize(np.stack(
                [np.asarray(e, dtype=np.float64) for e in g["emb"]]))[order]
            sims = mat @ mat.T
            iu = np.triu_indices(len(ids), k=1)
            keep = sims[iu] >= threshold
            out_a.extend(ids[iu[0][keep]].tolist())
            out_b.extend(ids[iu[1][keep]].tolist())
            out_s.extend(np.round(sims[iu][keep], 6).tolist())
        if n_capped:
            _log_capped_groups("embedding_near_dup_lsh", n_capped,
                               _cfg.max_lsh_bucket, largest)
        return pd.DataFrame({"id_a": pd.Series(out_a, dtype="int64"),
                             "id_b": pd.Series(out_b, dtype="int64"),
                             "cosine_sim": pd.Series(out_s,
                                                     dtype="float64")}) \
            .drop_duplicates(["id_a", "id_b"])

    from dataquality_ray.stages.dedup import distinct_pairs
    pairs = (ds.map_batches(explode, batch_format="pyarrow")
             .groupby("band_bucket")
             .map_groups(bucket_pairs, batch_format="pandas"))
    return distinct_pairs(pairs, "id_a", "id_b", num_buckets)


def _group_pairs_matmul(ids: np.ndarray, toks, threshold: float,
                        tile: int = 2000):
    """Exact pairwise token-set Jaccard within one LSH band group, as
    dense 0/1 doc×local-vocab matmuls: intersections = Ma @ Mb.T in one
    BLAS call per tile pair (counts < 2^24 are exact in f32; union and
    division in f64 → bit-identical to the SQL double division).

    ``tile`` bounds MEMORY, not coverage: groups larger than the tile are
    processed block-by-block over the (upper-triangular) pair space, so
    no member is ever dropped — the verified pair output is the answer
    itself, and its size is inherent to the corpus. ``ids`` must be
    ascending (pairs come out id_a < id_b).
    """
    k = len(ids)
    lens = np.fromiter((len(t) for t in toks), dtype=np.int64, count=k)
    out_a, out_b, out_j = [], [], []

    def block(lo_i, hi_i, lo_j, hi_j):
        sub_i = toks[lo_i:hi_i]
        sub_j = toks[lo_j:hi_j]
        vocab, inv = np.unique(np.concatenate(sub_i + sub_j),
                               return_inverse=True)
        ni, nj = hi_i - lo_i, hi_j - lo_j
        li = lens[lo_i:hi_i]
        lj = lens[lo_j:hi_j]
        split = int(li.sum())
        mi = np.zeros((ni, len(vocab)), dtype=np.float32)
        mi[np.repeat(np.arange(ni), li), inv[:split]] = 1.0
        mj = np.zeros((nj, len(vocab)), dtype=np.float32)
        mj[np.repeat(np.arange(nj), lj), inv[split:]] = 1.0
        inter = (mi @ mj.T).astype(np.float64)
        union = li[:, None] + lj[None, :] - inter
        if lo_i == lo_j:
            iu, ju = np.triu_indices(ni, k=1)
            jac = inter[iu, ju] / union[iu, ju]
            keep = jac >= threshold
            out_a.append(ids[lo_i + iu[keep]])
            out_b.append(ids[lo_j + ju[keep]])
            out_j.append(jac[keep])
        else:
            jac = inter / union
            ai, bj = np.where(jac >= threshold)
            out_a.append(ids[lo_i + ai])
            out_b.append(ids[lo_j + bj])
            out_j.append(jac[ai, bj])

    for lo_i in range(0, k, tile):
        hi_i = min(k, lo_i + tile)
        for lo_j in range(lo_i, k, tile):
            block(lo_i, hi_i, lo_j, min(k, lo_j + tile))
    if not out_a:
        e = np.array([], dtype=np.int64)
        return e, e.copy(), np.array([], dtype=np.float64)
    return (np.concatenate(out_a), np.concatenate(out_b),
            np.concatenate(out_j))


def token_jaccard_pairs(ds, threshold: float,
                        id_col: str, text_col: str = "text",
                        cfg=None, ngram: int = 1):
    """All pairs with distinct-token-set Jaccard >= threshold, via
    MinHash-LSH candidate generation + EXACT token-set verification —
    no driver materialization, no dense doc-term matrix.

    ``ngram > 1`` switches the similarity unit from single tokens to
    overlapping word-ngram shingles (the classic document-shingling
    MinHash); candidates, verification and the reported Jaccard are
    then all over the per-row distinct SHINGLE sets.

    Topology (same shape as stages/dedup.py near_dup_pairs): per-row
    token-hash sets + MinHash signatures (actor pool, built once per
    actor) → vectorized banded keys → bucketed groupby → in-bucket exact
    Jaccard over the token-hash sets → distinct pairs.

    Exactness: the *verification* is exact set Jaccard, so reported
    values match the SQL ``list_intersect`` oracle bit-for-bit (counts
    divided in float64; 64-bit token hashes make a token collision
    ~2⁻⁶⁴ per vocab pair). Recall: a pair at Jaccard j is missed iff it
    collides in none of b bands of r rows — P = (1−j^r)^b ≈ 1.4e-15 at
    j=0.9 with the default 32×4 banding. Identical token sets always
    collide (P = 0 miss).
    """
    import pandas as pd

    from dataquality_ray.config import DEFAULT_CONFIG
    from dataquality_ray.stages.dedup import MinHashSimHash, _banded_indices

    import dataclasses

    cfg = cfg or DEFAULT_CONFIG
    # LSH recall guard: a pair at exactly `threshold` is missed with
    # P = (1-t^r)^b. The SQL oracle is exact, so a threshold low enough
    # to make that probability non-negligible would produce
    # hard-to-diagnose oracle mismatches — warn loudly instead of
    # leaving the hazard in a docstring.
    miss_p = (1.0 - threshold ** cfg.lsh_rows) ** cfg.lsh_bands
    if miss_p > 1e-6:
        import warnings
        warnings.warn(
            f"token_jaccard_pairs: threshold={threshold} gives LSH miss "
            f"probability {miss_p:.2e} per boundary pair with "
            f"{cfg.lsh_bands}x{cfg.lsh_rows} banding — results may drop "
            "pairs an exact oracle finds; raise the threshold or use "
            "more bands/fewer rows", stacklevel=2)
    # Fewer band buckets than cfg.num_buckets: a near-identical cluster's
    # 32 band groups then co-locate ~4 per bucket, so the member-set
    # dedup below (seen_groups) kills the redundant copies BEFORE the
    # matmul and before pair emission — on dup-heavy corpora this cuts
    # both compute and the distinct-shuffle volume ~4x.
    band_cfg = dataclasses.replace(cfg, num_buckets=max(
        8, cfg.num_buckets // 4))

    sketch = ds.map_batches(
        MinHashSimHash,
        fn_constructor_kwargs={"text_col": text_col, "cfg": cfg,
                               "ngram": ngram},
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=(1, cfg.actor_pool_size))

    def explode(batch: pa.Table) -> pa.Table:
        row_idx, keys, buckets = _banded_indices(batch, band_cfg)
        idx = pa.array(row_idx)
        return pa.table({
            "band_key": pa.array(keys),
            "band_bucket": pa.array(buckets),
            "pid": pc.take(batch[id_col], idx),
            "token_hashes": pc.take(batch["token_hashes"], idx),
        })

    def bucket_pairs(df: "pd.DataFrame") -> "pd.DataFrame":
        out_a, out_b, out_j = [], [], []
        df = df.drop_duplicates(["band_key", "pid"])
        sizes = df.groupby("band_key", sort=False)["pid"].transform("size")
        seen_groups: set = set()
        for _, g in df[sizes > 1].groupby("band_key", sort=False):
            ids = g["pid"].to_numpy().astype(np.int64)
            order = np.argsort(ids)
            ids = ids[order]
            # different bands often yield the SAME member set (near-
            # identical docs agree on most bands) — skip exact repeats
            gkey = ids.tobytes()
            if gkey in seen_groups:
                continue
            seen_groups.add(gkey)
            toks = [np.asarray(t, dtype=np.uint64)
                    for t in g["token_hashes"].iloc[order]]
            a, b, j = _group_pairs_matmul(ids, toks, threshold,
                                          tile=cfg.max_lsh_bucket)
            out_a.append(a)
            out_b.append(b)
            out_j.append(j)
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64"),
                                 "jaccard": pd.Series(dtype="float64")})
        # local pre-dedup: overlapping band groups in this bucket emit
        # mostly the same pairs — shrink them here so the global
        # distinct shuffle moves ~1x the answer, not ~bands x
        return pd.DataFrame({
            "id_a": np.concatenate(out_a),
            "id_b": np.concatenate(out_b),
            "jaccard": np.concatenate(out_j),
        }).drop_duplicates(["id_a", "id_b"])

    from dataquality_ray.stages.dedup import distinct_pairs
    pairs = (sketch.map_batches(explode, batch_format="pyarrow")
             .groupby("band_bucket")
             .map_groups(bucket_pairs, batch_format="pandas"))
    return distinct_pairs(pairs, "id_a", "id_b", cfg.num_buckets)
