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
    return pa.table({
        "key": pa.array(keys, pa.string()),
        "cluster": pa.array([find(k) for k in keys], pa.string()),
    })


def label_propagation_round(labels_ds, pairs_ds):
    """One distributed min-label propagation round (for pair sets too big
    for the driver): labels (key, label) ⊕ edges → updated labels.
    Iterate until a round changes nothing. Broadcasts the current label
    table; swap the broadcast for a hash join when labels outgrow memory.
    """
    import pandas as pd
    from ray.data.aggregate import Min

    label_map = dict(zip(*[labels_ds.to_pandas()[c]
                           for c in ("key", "label")]))
    ref = ray.put(label_map)

    def messages(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        a = batch["key_a"].to_pylist()
        b = batch["key_b"].to_pylist()
        keys: List[str] = []
        labs: List[str] = []
        for x, y in zip(a, b):
            lx, ly = m.get(x, x), m.get(y, y)
            keys.append(x)
            labs.append(ly)
            keys.append(y)
            labs.append(lx)
        return pa.table({"key": pa.array(keys, pa.string()),
                         "label": pa.array(labs, pa.string())})

    own = pa.table({
        "key": pa.array(list(label_map), pa.string()),
        "label": pa.array([label_map[k] for k in label_map], pa.string()),
    })
    msgs = pairs_ds.map_batches(messages, batch_format="pyarrow") \
        .union(ray.data.from_arrow(own))
    return msgs.groupby("key").aggregate(Min("label", alias_name="label"))


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

    partials = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    partials = partials.sort_values(
        ["query_id", "cosine_sim", "vec_id"],
        ascending=[True, False, True], kind="mergesort")
    topk = partials.groupby("query_id", sort=True).head(k) \
        .reset_index(drop=True)
    topk["rank"] = topk.groupby("query_id", sort=True).cumcount() + 1
    topk["cosine_sim"] = topk["cosine_sim"].round(6)
    return pa.Table.from_pandas(topk, preserve_index=False)
