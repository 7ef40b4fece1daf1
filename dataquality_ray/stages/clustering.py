"""Duplicate clustering + IVF-bucketed ANN (the scale paths promised by
stages/dedup.py and stages/similarity.py docstrings).

- ``dup_clusters``: near-dup pairs → connected components. The pair set is
  the (small) OUTPUT of LSH — orders of magnitude smaller than the corpus
  — so a driver-side union-find is appropriate (guide: union-find on the
  driver only when the candidate set is provably small; for pair sets
  beyond driver memory, run the distributed min-label-propagation loop in
  ``label_propagation_round`` until fixpoint).
- ``IVFIndex`` / ``ivf_topk``: deterministic k-means-lite coarse quantizer
  → per-batch cluster assignment → only candidates in the query's
  ``n_probe`` nearest clusters are scored. Approximate; recall is tested
  against the brute-force baseline.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import pyarrow as pa

import ray


# ---------------------------------------------------------------------------
# connected components over near-dup pairs
# ---------------------------------------------------------------------------

def dup_clusters(pairs_ds) -> pa.Table:
    """(key, cluster) for every key in a (key_a, key_b, ...) pair dataset;
    cluster = lexicographic min key of the component (deterministic)."""
    df = pairs_ds.to_pandas()
    parent: Dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra == rb:
            return
        lo, hi = sorted((ra, rb))
        parent[hi] = lo

    for a, b in zip(df["key_a"], df["key_b"]):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        union(a, b)

    keys = sorted(parent)
    # key type follows the input (string order_keys, int64 doc_ids);
    # empty input keeps the legacy string schema
    ktype = (pa.int64() if keys and isinstance(keys[0], (int, np.integer))
             else pa.string())
    return pa.table({
        "key": pa.array(keys, ktype),
        "cluster": pa.array([find(k) for k in keys], ktype),
    })


def _join_partitions(default: int = 4) -> int:
    try:
        return max(2, int(ray.cluster_resources().get("CPU", default)) // 2)
    except Exception:
        return default


def label_propagation_round(labels_ds, pairs_ds,
                            num_partitions: int | None = None):
    """One distributed min-label propagation round: labels (key, label)
    hash-JOINED onto the edge endpoints (no broadcast label map — the
    label table at dup scale is the same order as the pair set):

    messages = edges ⋈ labels(key_a) → (key_b, label_a)
             ∪ edges ⋈ labels(key_b) → (key_a, label_b)
             ∪ own labels
    new labels = groupby(key).min(candidate).
    """
    num_partitions = num_partitions or _join_partitions()
    from ray.data.aggregate import Min

    edges = pairs_ds.map_batches(
        lambda t: t.select(["key_a", "key_b"]), batch_format="pyarrow")

    def msg(side_from: str, side_to: str):
        joined = edges.join(labels_ds, join_type="inner",
                            num_partitions=num_partitions,
                            on=(side_from,), right_on=("key",))
        return joined.map_batches(
            lambda t: pa.table({"key": t[side_to], "cand": t["label"]}),
            batch_format="pyarrow")

    own = labels_ds.map_batches(
        lambda t: pa.table({"key": t["key"], "cand": t["label"]}),
        batch_format="pyarrow")
    # materialize the first join before building the second: each hash
    # join holds ``num_partitions`` aggregator actors, and two joins
    # live in one streaming DAG starve a small cluster's map tasks (the
    # CLAUDE.md invariant) — this keeps at most ONE join in flight
    m1 = msg("key_a", "key_b").materialize()
    msgs = m1.union(msg("key_b", "key_a")).union(own)
    return msgs.groupby("key").aggregate(Min("cand", alias_name="label"))


def _labels_signature(labels_ds) -> int:
    """Order-independent fingerprint of a (key, label) Dataset: sum of
    per-row deterministic 64-bit hashes (mod 2^64). Two consecutive
    rounds with equal signatures ⇒ fixpoint (labels only ever decrease,
    so a no-op round is exactly 'unchanged'; collision odds ~2⁻⁶⁴)."""
    import numpy as np
    import pandas as pd

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(
            df["key"] + "\x1f" + df["label"], index=False).to_numpy()
        # exact uint64 wraparound sum, reinterpreted as int64 two's
        # complement — NO per-batch mask: masking before the cross-batch
        # sum would make the signature depend on batch boundaries
        # (silently defeating fixpoint detection); int64 addition of the
        # partials wraps mod 2^64 identically, so the total is
        # partition-independent
        s = np.array([h.sum(dtype=np.uint64)], dtype=np.uint64)
        return pd.DataFrame({"h": s.view(np.int64)})

    total = int(labels_ds.map_batches(partial, batch_format="pandas")
                .sum("h"))
    return total & 0xFFFFFFFFFFFFFFFF


def dup_clusters_distributed(pairs_ds, num_partitions: int | None = None,
                             max_rounds: int = 32):
    """Connected components over a pair Dataset WITHOUT driver union-find:
    iterated hash-join min-label propagation with POINTER JUMPING until
    fixpoint. Label volume stays distributed (one row per key); each
    round is two hash joins (neighbor messages; label-of-label) + a
    groupby min. Pointer jumping (l(k) ← min(l(k), l(l(k)))) halves the
    remaining chain depth each round, so convergence is O(log diameter)
    — 2-4 rounds for dense LSH near-dup components. Convergence is
    detected by an order-independent label-table signature (no extra
    join).

    Returns a Dataset (key, cluster) like ``dup_clusters`` (cluster =
    lexicographic min key of the component).
    """
    num_partitions = num_partitions or _join_partitions()
    from ray.data.aggregate import Min

    def directed(t: pa.Table) -> pa.Table:
        a = t["key_a"].combine_chunks() \
            if isinstance(t["key_a"], pa.ChunkedArray) else t["key_a"]
        b = t["key_b"].combine_chunks() \
            if isinstance(t["key_b"], pa.ChunkedArray) else t["key_b"]
        return pa.table({"src": pa.concat_arrays([a, b]),
                         "dst": pa.concat_arrays([b, a])})

    # directed edges once; initial labels = self
    edges = pairs_ds.map_batches(directed,
                                 batch_format="pyarrow").materialize()
    labels = (edges.map_batches(
        lambda t: pa.table({"key": t["src"], "cand": t["src"]}),
        batch_format="pyarrow")
        .groupby("key").aggregate(Min("cand", alias_name="label"))
        .materialize())
    sig = _labels_signature(labels)

    for _ in range(max_rounds):
        # neighbor messages: ONE join (edges are directed, both
        # orientations present), then min over {neighbor labels, own}
        nbr = edges.join(labels, join_type="inner",
                         num_partitions=num_partitions,
                         on=("src",), right_on=("key",)) \
            .map_batches(lambda t: pa.table({"key": t["dst"],
                                             "cand": t["label"]}),
                         batch_format="pyarrow")
        own = labels.map_batches(
            lambda t: pa.table({"key": t["key"], "cand": t["label"]}),
            batch_format="pyarrow")
        # materialize between the two joins: each hash join holds
        # ``num_partitions`` aggregator ACTORS — two joins live in one
        # streaming DAG can starve a small cluster's map tasks
        stepped = nbr.union(own).groupby("key") \
            .aggregate(Min("cand", alias_name="label")).materialize()
        # pointer jumping: l(k) <- min(l(k), l(l(k)))
        lol = stepped.map_batches(
            lambda t: pa.table({"k2": t["key"], "l2": t["label"]}),
            batch_format="pyarrow")
        jumped = stepped.join(lol, join_type="left_outer",
                              num_partitions=num_partitions,
                              on=("label",), right_on=("k2",)) \
            .map_batches(_min_label_jump, batch_format="pyarrow")
        labels = jumped.materialize()
        new_sig = _labels_signature(labels)
        if new_sig == sig:
            break
        sig = new_sig
    return labels.map_batches(
        lambda t: pa.table({"key": t["key"], "cluster": t["label"]}),
        batch_format="pyarrow")


def _min_label_jump(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc
    lab = t["label"].combine_chunks() \
        if isinstance(t["label"], pa.ChunkedArray) else t["label"]
    l2 = t["l2"].combine_chunks() \
        if isinstance(t["l2"], pa.ChunkedArray) else t["l2"]
    take_l2 = pc.and_kleene(pc.is_valid(l2), pc.less(l2, lab))
    jumped = pc.if_else(pc.fill_null(take_l2, False), l2, lab)
    return pa.table({"key": t["key"], "label": jumped})


def dup_clusters_auto(pairs_ds, max_driver_pairs: int = 2_000_000):
    """Dispatch: driver union-find when the pair set is provably small
    (one count()), else the distributed hash-join fixpoint.

    The input is materialized first — count() would otherwise execute
    the (expensive) upstream near-dup lineage once and the dispatched
    clustering path a second time."""
    pairs_ds = pairs_ds.materialize()
    n = pairs_ds.count()
    if n <= max_driver_pairs:
        return dup_clusters(pairs_ds)
    return dup_clusters_distributed(pairs_ds)


# ---------------------------------------------------------------------------
# IVF coarse-quantized ANN
# ---------------------------------------------------------------------------

class IVFIndex:
    """Deterministic k-means-lite coarse quantizer built from a sample."""

    def __init__(self, sample: np.ndarray, n_clusters: int,
                 n_iters: int = 10, seed: int = 42) -> None:
        rng = np.random.default_rng(seed)
        sample = _normalize(sample.astype(np.float64))
        n = len(sample)
        init = rng.choice(n, size=min(n_clusters, n), replace=False)
        centroids = sample[np.sort(init)]
        for _ in range(n_iters):
            assign = np.argmax(sample @ centroids.T, axis=1)
            for c in range(len(centroids)):
                members = sample[assign == c]
                if len(members):
                    centroids[c] = members.mean(axis=0)
            centroids = _normalize(centroids)
        self.centroids = centroids

    def assign(self, vecs: np.ndarray) -> np.ndarray:
        return np.argmax(_normalize(vecs.astype(np.float64))
                         @ self.centroids.T, axis=1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def ivf_topk(ds, query_ids: List[int], k: int = 10,
             n_clusters: int = 16, n_probe: int = 4,
             id_col: str = "vec_id", emb_col: str = "embedding",
             sample_limit: int = 10_000) -> pa.Table:
    """Approximate cosine top-k: score only candidates whose IVF cluster
    is among each query's n_probe nearest clusters.

    Same output schema as similarity.cosine_topk (query_id, vec_id,
    cosine_sim, rank); recall < 1 by design — tested against brute force.
    """
    sample_df = ds.limit(sample_limit).to_pandas()
    sample = np.stack([np.asarray(e, dtype=np.float64)
                       for e in sample_df[emb_col]])
    index = IVFIndex(sample, n_clusters)

    qset = set(int(q) for q in query_ids)
    q_df = ds.map_batches(
        lambda t: t.filter(pa.array([int(v) in qset
                                     for v in t[id_col].to_pylist()])),
        batch_format="pyarrow").to_pandas()
    q_ids = q_df[id_col].to_numpy()
    q_mat = _normalize(np.stack([np.asarray(e, dtype=np.float64)
                                 for e in q_df[emb_col]]))
    order = np.argsort(q_ids)
    q_ids, q_mat = q_ids[order], q_mat[order]
    # per-query probed clusters
    sims_c = q_mat @ index.centroids.T
    probes = np.argsort(-sims_c, axis=1)[:, :n_probe]
    ref = ray.put((q_ids, q_mat, index.centroids, probes))

    def partial(batch: pa.Table) -> pa.Table:
        ids_q, mat_q, centroids, probe = ray.get(ref)
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        m = _normalize(np.stack([np.asarray(e, dtype=np.float64)
                                 for e in batch[emb_col].to_pylist()]))
        clusters = np.argmax(m @ centroids.T, axis=1)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(ids_q)):
            probed = set(probe[qi].tolist())
            mask = np.fromiter((c in probed for c in clusters),
                               dtype=bool, count=len(clusters))
            mask &= ~np.isin(ids, ids_q)
            cand = np.flatnonzero(mask)
            if not len(cand):
                continue
            col = m[cand] @ mat_q[qi]
            top = cand[np.argsort(-col, kind="stable")[:k]]
            out_q.extend([int(ids_q[qi])] * len(top))
            out_v.extend(ids[top].tolist())
            out_s.extend((m[top] @ mat_q[qi]).tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "cosine_sim": pa.array(out_s, pa.float64()),
        })

    from dataquality_ray.stages.similarity import reduce_topk
    return reduce_topk(ds.map_batches(partial, batch_format="pyarrow"), k)


# ---------------------------------------------------------------------------
# distributed k-means over embedding columns
# ---------------------------------------------------------------------------

KMEANS_K = 8
KMEANS_ITERS = 5
_KMEANS_FP = 1_000_000  # fixed-point scale for the partial-sum reduce


def _assign_batch(emb: np.ndarray, cents: np.ndarray
                  ) -> tuple[np.ndarray, np.ndarray]:
    """(centroid_id, cosine rounded 6) per row; ties -> smallest id.

    Cosine in float64 (the proven ann_topk recipe: matches DuckDB's
    list_cosine_similarity after round-6); argmax over the ROUNDED
    value so the tie-break is identical on both sides.
    """
    x = emb.astype(np.float64)
    xn = np.linalg.norm(x, axis=1, keepdims=True)
    cn = np.linalg.norm(cents, axis=1, keepdims=True)
    with np.errstate(invalid="ignore", divide="ignore"):
        sims = (x @ cents.T) / (xn * cn.T)
    sims = np.where(np.isfinite(sims), sims, 0.0)
    sims_r = np.round(sims, 6)
    cid = np.argmax(sims_r, axis=1)          # first max = smallest id
    return cid.astype(np.int64), sims_r[np.arange(len(x)), cid]


def _emb_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    e = batch[col]
    if isinstance(e, pa.ChunkedArray):
        e = e.combine_chunks()
    dim = len(e[0]) if len(e) else 0
    return np.asarray(e.flatten(), dtype=np.float64).reshape(-1, dim)


def kmeans_assign(ds, centroids: np.ndarray, id_col: str = "vec_id"):
    """(id, centroid_id, cosine_sim): nearest-centroid assignment by
    cosine — one stateless map_batches against the broadcast centroid
    matrix (`ray.put` once, read per task)."""
    cents_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(cents_ref)
        cid, sim = _assign_batch(_emb_matrix(batch), cents)
        return pa.table({
            id_col: batch[id_col],
            "centroid_id": pa.array(cid),
            "cosine_sim": pa.array(sim, pa.float64()),
        })

    return ds.map_batches(assign, batch_format="pyarrow",
                          zero_copy_batch=True)


def kmeans_fit(ds, k: int = KMEANS_K, iters: int = KMEANS_ITERS,
               id_col: str = "vec_id"):
    """Distributed Lloyd's k-means over an embedding column, fully
    deterministic under any partitioning:

    - init: the k vectors with the smallest ids (seed-free, reproducible);
    - assignment: cosine argmax against broadcast centroids (per-batch
      vectorized matmul — the training-data "cluster the corpus
      embeddings" step used for diversification / dedup-by-cluster);
    - update: per-cluster mean accumulated as FIXED-POINT int64 partial
      sums (round(x*1e6)) inside map_batches, reduced with integer
      addition (commutative — reduction order can't change the result),
      then normalized in one deterministic elementwise pass.

    Returns (labels_ds with (id, cluster), centroids ndarray). The
    centroid state per iteration is k×d ints — a driver-side reduce of
    per-batch partials, NOT corpus-proportional.
    """
    import pyarrow.compute as pc

    first = ds.sort(id_col).limit(k).to_pandas()
    cents = np.stack([np.asarray(v, np.float64)
                      for v in first["embedding"]])

    for _ in range(iters):
        cents_ref = ray.put(cents)

        def partials(batch: pa.Table) -> pa.Table:
            c = ray.get(cents_ref)
            emb = _emb_matrix(batch)
            cid, _ = _assign_batch(emb, c)
            fp = np.round(emb * _KMEANS_FP).astype(np.int64)
            k_, d = c.shape
            sums = np.zeros((k_, d), dtype=np.int64)
            np.add.at(sums, cid, fp)
            counts = np.bincount(cid, minlength=k_).astype(np.int64)
            return pa.table({
                "cluster": pa.array(np.arange(k_, dtype=np.int64)),
                "count": pa.array(counts),
                "sums": pa.array(list(sums), pa.list_(pa.int64())),
            })

        part = ds.map_batches(partials, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas()
        k_, d = cents.shape
        sums = np.zeros((k_, d), dtype=np.int64)
        counts = np.zeros(k_, dtype=np.int64)
        for cl, cnt, s in zip(part["cluster"], part["count"],
                              part["sums"]):
            sums[cl] += np.asarray(s, dtype=np.int64)
            counts[cl] += cnt
        new = cents.copy()
        nz = counts > 0
        new[nz] = sums[nz] / float(_KMEANS_FP) \
            / counts[nz, None].astype(np.float64)
        norms = np.linalg.norm(new, axis=1, keepdims=True)
        new = np.where(norms > 0, new / np.maximum(norms, 1e-300), new)
        cents = new

    labels = kmeans_assign(ds, cents, id_col=id_col).map_batches(
        lambda t: pa.table({id_col: t[id_col],
                            "cluster": t["centroid_id"]}),
        batch_format="pyarrow")
    return labels, cents


PAGERANK_ITERS = 5
PAGERANK_SCALE = 1_000_000_000
_PR_BASE = (15 * PAGERANK_SCALE) // 100


def pagerank(pairs_ds, iters: int = PAGERANK_ITERS,
             num_partitions: int | None = None,
             key_a: str = "id_a", key_b: str = "id_b"):
    """(doc_id, rank): INTEGER-deterministic PageRank over an
    undirected pair graph — rank' = 0.15·SCALE + 0.85·Σ(rank // deg)
    with every operation in int64 fixed point, so the result is
    bit-identical under any partitioning or summation order (the same
    reason kmeans_fit reduces in fixed point) and the whole iterative
    surface is SQL-checkable via a recursive CTE replaying the exact
    integer recurrence.

    Shape: fixed-iteration loop of hash joins — edges ⋈ ranks on src
    (contributions), groupby(dst) integer sum, then ⋈ degree to carry
    deg into the next round; the ranks/degree tables are O(nodes) and
    never touch the driver. Per the CLAUDE.md join invariant each
    round materializes between its two joins (one join in flight at a
    time). Iteration count is FIXED (power iteration converges
    geometrically; a fixpoint test would reintroduce the signature
    scan) — the operator is a transform, not a convergence search.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    num_partitions = num_partitions or _join_partitions()

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t[key_a]
        b = t[key_b]
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        if isinstance(b, pa.ChunkedArray):
            b = b.combine_chunks()
        return pa.table({
            "src": pa.concat_arrays([a, b]),
            "dst": pa.concat_arrays([b, a]),
        })

    edges = pairs_ds.map_batches(both_dirs, batch_format="pyarrow") \
        .materialize()   # reused every iteration
    deg = edges.groupby("src").aggregate(Count(alias_name="deg"))
    deg = deg.map_batches(
        lambda t: pa.table({"pr_node": t["src"],
                            "deg": pc.cast(t["deg"], pa.int64())}),
        batch_format="pyarrow").materialize()

    ranks = deg.map_batches(
        lambda t: pa.table({
            "node": t["pr_node"], "deg": t["deg"],
            "rank": pa.array(
                np.full(t.num_rows, PAGERANK_SCALE, dtype=np.int64)),
        }), batch_format="pyarrow").materialize()

    for _ in range(iters):
        joined = edges.join(ranks, join_type="inner",
                            num_partitions=num_partitions,
                            on=("src",), right_on=("node",))
        msgs = joined.map_batches(
            lambda t: pa.table({
                "node": t["dst"],
                "c": pa.array(
                    t["rank"].to_numpy(zero_copy_only=False)
                    // t["deg"].to_numpy(zero_copy_only=False)),
            }), batch_format="pyarrow")
        # materialize between the two hash joins of a round (CLAUDE.md
        # aggregator-starvation invariant)
        sums = msgs.groupby("node").aggregate(Sum("c", alias_name="s")) \
            .materialize()
        joined2 = sums.join(deg, join_type="inner",
                            num_partitions=num_partitions,
                            on=("node",), right_on=("pr_node",))
        ranks = joined2.map_batches(
            lambda t: pa.table({
                "node": t["node"], "deg": t["deg"],
                "rank": pa.array(
                    _PR_BASE
                    + (85 * t["s"].to_numpy(zero_copy_only=False))
                    // 100),
            }), batch_format="pyarrow").materialize()

    return ranks.map_batches(
        lambda t: pa.table({"doc_id": t["node"],
                            "rank": pc.cast(t["rank"], pa.int64())}),
        batch_format="pyarrow")


def ivf_exact_topk(ds, query_ids: List[int], k: int = 10,
                   id_col: str = "vec_id", emb_col: str = "embedding"):
    """(query_id, vec_id, cosine_sim, rank): IVF-semantics ANN with
    nprobe = 1 over the DETERMINISTIC seed centroids (vectors with
    id < KMEANS_K, the kmeans_assign seeds) — each query scans ONLY the
    corpus partition assigned to its own nearest centroid. Unlike the
    Lloyd-trained ivf_topk (rows-only: trained centroids are float
    artifacts), the fixed seed list makes the partitioning itself a
    pure function of the data, so this bucketed-ANN variant is fully
    SQL-checkable — the honest way to hash-check the IVF *shape*:
    candidate restriction + exact rerank, no recall uncertainty.

    Shape: centroids + queries are grabbed in one pass and broadcast
    (ray.put once); each batch assigns its rows to centroids
    (_assign_batch — identical round-6/tie arithmetic to the
    kmeans_assign oracle), masks per query, computes a partial top-k,
    and reduce_topk finishes with the groupby(query_id) distributed
    reduce (driver volume O(|queries|·k)).
    """
    import ray as _ray
    from dataquality_ray.stages.similarity import _normalize, reduce_topk

    qset = set(int(q) for q in query_ids)

    def grab(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        mask = pa.array((ids < KMEANS_K)
                        | np.isin(ids, np.fromiter(qset, np.int64)))
        return batch.filter(mask)

    side = ds.map_batches(grab, batch_format="pyarrow").to_pandas() \
        .sort_values(id_col)
    cents = np.stack([np.asarray(v, np.float64)
                      for v in side[side[id_col] < KMEANS_K][emb_col]])
    qrows = side[side[id_col].isin(list(qset))]
    q_ids = qrows[id_col].to_numpy(dtype=np.int64)
    q_mat = np.stack([np.asarray(v, np.float64) for v in qrows[emb_col]])
    q_cid = _assign_batch(q_mat, cents)[0]
    q_norm = _normalize(q_mat)
    ref = _ray.put((q_ids, q_norm, q_cid, cents))

    def partial_topk(batch: pa.Table) -> pa.Table:
        ids_q, mat_q, cid_q, cents_b = _ray.get(ref)
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        m = _emb_matrix(batch, emb_col)
        cid = _assign_batch(m, cents_b)[0]
        mn = _normalize(m)
        sims = mn @ mat_q.T
        not_query = ~np.isin(ids, ids_q)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(ids_q)):
            cand = np.nonzero(not_query & (cid == cid_q[qi]))[0]
            if len(cand) == 0:
                continue
            col = sims[:, qi]
            top = cand[np.argsort(-col[cand], kind="stable")[:k]]
            out_q.extend([int(ids_q[qi])] * len(top))
            out_v.extend(ids[top].tolist())
            out_s.extend(col[top].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "cosine_sim": pa.array(out_s, pa.float64()),
        })

    return reduce_topk(
        ds.map_batches(partial_topk, batch_format="pyarrow"), k)


SEMDEDUP_TAU = 0.4


def semantic_dedup(ds, tau: float = SEMDEDUP_TAU, k: int = KMEANS_K,
                   id_col: str = "vec_id", emb_col: str = "embedding",
                   tile: int = 4096):
    """(id, centroid_id, kept): SemDeDup-style semantic deduplication
    (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
    through semantic deduplication"): cluster the embedding space, then
    within each cluster drop every vector that has cosine similarity
    >= tau (round-6, the ann_topk float convention) to ANY lower-id
    member of the same cluster — the deterministic "keep first by id"
    variant of the paper's within-cluster epsilon-ball rule.

    Shape: nearest-seed-centroid assignment is a stateless broadcast
    map (identical round-6/tie arithmetic to ``kmeans_assign``); the
    pairwise check then happens INSIDE each cluster only — one shuffle
    on ``centroid_id``, a local tiled matmul per cluster, never a
    corpus-wide O(n^2) scan. At 100 TB k scales with the corpus
    (SemDeDup uses ~#docs/1000 clusters) so per-cluster pair work stays
    bounded; here k is the deterministic seed-centroid count
    (vectors with id < k) so the WHOLE surface — assignment and drop
    decisions — is SQL-checkable. Reference analog: the gated
    cosine>=0.95 duplicate rule
    (/root/reference/backend/app/services/metadata.py:599), recast from
    a corpus-wide O(n^2) loop to cluster-local comparisons.
    """
    import ray as _ray

    def grab_cents(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.filter(pc.less(batch[id_col], k))

    side = ds.map_batches(grab_cents, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas() \
        .sort_values(id_col)
    cents = np.stack([np.asarray(v, np.float64) for v in side[emb_col]])
    cents_ref = _ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = _ray.get(cents_ref)
        cid, _ = _assign_batch(_emb_matrix(batch, emb_col), c)
        return pa.table({
            id_col: batch[id_col],
            "centroid_id": pa.array(cid),
            emb_col: batch[emb_col],
        })

    assigned = ds.map_batches(assign, batch_format="pyarrow",
                              zero_copy_batch=True)

    def dedup_cluster(group: pa.Table) -> pa.Table:
        ids = np.asarray(group[id_col].to_pylist(), dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        m = _emb_matrix(group, emb_col)[order]
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        n = len(ids)
        hit = np.zeros(n, dtype=bool)
        # tile over the row blocks: block rows vs ALL strictly-lower-id
        # rows (ids are sorted, so "lower id" == "lower index").
        # Dot-then-divide in the SAME operation order as _assign_batch
        # (the pinned round-6 recipe) — pre-normalizing the matrix
        # would change float summation order and can flip a round-6
        # value at the tau boundary vs the DuckDB twin.
        for lo in range(1, n, tile):
            hi = min(lo + tile, n)
            with np.errstate(invalid="ignore", divide="ignore"):
                sims = (m[lo:hi] @ m[:hi].T) / (norms[lo:hi]
                                                * norms[:hi].T)
            sims = np.where(np.isfinite(sims), sims, 0.0)
            sims = np.round(sims, 6)
            # mask j >= i inside the block's own columns
            col_idx = np.arange(hi)
            row_idx = np.arange(lo, hi)[:, None]
            sims[col_idx[None, :] >= row_idx] = -2.0
            hit[lo:hi] = (sims >= tau).any(axis=1)
        cid = group["centroid_id"].to_pylist()
        cid0 = int(cid[0]) if cid else 0
        return pa.table({
            id_col: pa.array(ids),
            "centroid_id": pa.array(
                np.full(n, cid0, dtype=np.int64)),
            "kept": pa.array(~hit),
        })

    return assigned.groupby("centroid_id").map_groups(
        dedup_cluster, batch_format="pyarrow")
