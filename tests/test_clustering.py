"""Duplicate clustering (connected components), IVF ANN recall, and
distributed label propagation."""

import numpy as np
import pyarrow as pa
import ray


def _pairs_table(pairs):
    return ray.data.from_arrow(pa.table({
        "key_a": pa.array([a for a, _ in pairs], pa.string()),
        "key_b": pa.array([b for _, b in pairs], pa.string()),
        "jaccard": pa.array([1.0] * len(pairs), pa.float64()),
    }))


class TestDupClusters:
    def test_components(self, ray_session):
        from dataquality_ray.stages.clustering import dup_clusters
        # components: {a,b,c} via chain, {x,y}, singleton pairs absent
        out = dup_clusters(_pairs_table(
            [("b", "a"), ("b", "c"), ("x", "y")])).to_pydict()
        got = dict(zip(out["key"], out["cluster"]))
        assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}

    def test_label_propagation_converges(self, ray_session):
        from dataquality_ray.stages.clustering import (
            dup_clusters,
            label_propagation_round,
        )
        pairs = [("b", "a"), ("c", "b"), ("d", "c"), ("x", "y")]
        pairs_ds = _pairs_table(pairs)
        keys = sorted({k for p in pairs for k in p})
        labels = ray.data.from_arrow(pa.table({
            "key": pa.array(keys, pa.string()),
            "label": pa.array(keys, pa.string()),
        }))
        for _ in range(4):   # chain of length 4 needs ~log rounds
            # materialize per round: chaining N join rounds lazily stacks
            # N join actor pools into one DAG and starves a small cluster
            labels = label_propagation_round(labels, pairs_ds).materialize()
        got = dict(zip(*[labels.to_pandas()[c] for c in ("key", "label")]))
        want_tbl = dup_clusters(pairs_ds).to_pydict()
        want = dict(zip(want_tbl["key"], want_tbl["cluster"]))
        assert got == want

    def test_transcript_clusters_consistent(self, ray_session,
                                            small_transcripts):
        from dataquality_ray.pipelines.quality import (
            transcript_near_dup_pairs,
        )
        from dataquality_ray.stages.clustering import dup_clusters
        pairs = transcript_near_dup_pairs(
            ray.data.from_arrow(small_transcripts))
        pairs_df = pairs.to_pandas()
        out = dup_clusters(ray.data.from_pandas(pairs_df)).to_pydict()
        clu = dict(zip(out["key"], out["cluster"]))
        # every pair's endpoints share a cluster; cluster rep is minimal
        for a, b in zip(pairs_df["key_a"], pairs_df["key_b"]):
            assert clu[a] == clu[b]
            assert clu[a] <= min(a, b)


class TestIVF:
    def test_recall_vs_brute_force(self, ray_session):
        from dataquality_ray.stages.clustering import ivf_topk
        from dataquality_ray.stages.similarity import cosine_topk
        import ray.data as rd
        path = "/root/testdata/sf0.01/embeddings.parquet"
        brute = cosine_topk(rd.read_parquet(path), [0, 1, 2], k=10) \
            .to_pandas()
        approx = ivf_topk(rd.read_parquet(path), [0, 1, 2], k=10,
                          n_clusters=8, n_probe=4).to_pandas()
        recalls = []
        for q in (0, 1, 2):
            bset = set(brute[brute.query_id == q].vec_id)
            aset = set(approx[approx.query_id == q].vec_id)
            recalls.append(len(bset & aset) / len(bset))
        assert np.mean(recalls) >= 0.5, recalls  # random vectors: coarse
        # determinism
        again = ivf_topk(rd.read_parquet(path), [0, 1, 2], k=10,
                         n_clusters=8, n_probe=4).to_pandas()
        assert approx.equals(again)


class TestEmbeddingNearDupLSH:
    def test_precision_exact_recall_bounded(self, ray_session):
        """RH-LSH banded near-dup vs the exact triangle-join path:
        precision must be exact (verified cosine); recall bounded below
        (pigeonhole: exact for signature Hamming <= budget)."""
        import ray.data as rd
        from dataquality_ray.stages.similarity import (
            embedding_near_dup_pairs,
            embedding_near_dup_lsh,
        )
        path = "/root/testdata/sf0.01/embeddings.parquet"
        exact = embedding_near_dup_pairs(
            rd.read_parquet(path), 0.4).to_pandas()
        approx = embedding_near_dup_lsh(
            rd.read_parquet(path), 0.4, max_hamming=28).to_pandas()
        eset = set(zip(exact.id_a, exact.id_b))
        aset = set(zip(approx.id_a, approx.id_b))
        assert eset, "fixture must contain near-dup pairs"
        assert aset <= eset                      # exact precision
        assert len(aset & eset) / len(eset) >= 0.8, (
            f"LSH recall {len(aset & eset) / len(eset)}")
        # verified cosine values agree with the exact path
        ex = {(a, b): s for a, b, s in
              zip(exact.id_a, exact.id_b, exact.cosine_sim)}
        for a, b, s in zip(approx.id_a, approx.id_b, approx.cosine_sim):
            assert abs(ex[(a, b)] - s) < 1e-9


class TestDistributedClusters:
    def test_fixpoint_matches_union_find(self, ray_session):
        from dataquality_ray.stages.clustering import (
            dup_clusters,
            dup_clusters_distributed,
        )
        # chain (diameter 5, needs several rounds), one clique, one pair
        pairs = [("b", "a"), ("c", "b"), ("d", "c"), ("e", "d"),
                 ("f", "e"), ("p", "q"), ("p", "r"), ("q", "r"),
                 ("x", "y")]
        ds = _pairs_table(pairs)
        got_tbl = dup_clusters_distributed(ds).to_pandas()
        got = dict(zip(got_tbl["key"], got_tbl["cluster"]))
        want_tbl = dup_clusters(_pairs_table(pairs)).to_pydict()
        want = dict(zip(want_tbl["key"], want_tbl["cluster"]))
        assert got == want

    def test_auto_dispatch_beyond_driver_limit(self, ray_session):
        """Pair sets above the driver limit route to the distributed
        fixpoint and still match union-find."""
        from dataquality_ray.stages.clustering import (
            dup_clusters,
            dup_clusters_auto,
        )
        pairs = [(f"k{i:03d}", f"k{i + 1:03d}") for i in range(0, 40, 2)]
        pairs += [("k000", "k001")]  # join two chains' heads
        ds = _pairs_table(pairs)
        got_tbl = dup_clusters_auto(ds, max_driver_pairs=3).to_pandas()
        got = dict(zip(got_tbl["key"], got_tbl["cluster"]))
        want_tbl = dup_clusters(_pairs_table(pairs)).to_pydict()
        want = dict(zip(want_tbl["key"], want_tbl["cluster"]))
        assert got == want


class TestKMeans:
    def _ds(self, n=200, d=16, seed=7):
        rng = np.random.default_rng(seed)
        emb = rng.standard_normal((n, d)).astype(np.float32)
        return ray.data.from_arrow(pa.table({
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array([list(map(float, r)) for r in emb],
                                  pa.list_(pa.float32())),
        })), emb

    def _reference(self, emb, k, iters):
        """Single-process replica of kmeans_fit's exact arithmetic."""
        from dataquality_ray.stages.clustering import (
            _KMEANS_FP, _assign_batch)
        cents = emb[:k].astype(np.float64)
        for _ in range(iters):
            cid, _ = _assign_batch(emb, cents)
            fp = np.round(emb.astype(np.float64) * _KMEANS_FP) \
                .astype(np.int64)
            sums = np.zeros((k, emb.shape[1]), dtype=np.int64)
            np.add.at(sums, cid, fp)
            counts = np.bincount(cid, minlength=k).astype(np.int64)
            new = cents.copy()
            nz = counts > 0
            new[nz] = sums[nz] / float(_KMEANS_FP) \
                / counts[nz, None].astype(np.float64)
            norms = np.linalg.norm(new, axis=1, keepdims=True)
            cents = np.where(norms > 0, new / np.maximum(norms, 1e-300),
                             new)
        cid, _ = _assign_batch(emb, cents)
        return cid, cents

    def test_matches_single_process_reference(self, ray_session):
        from dataquality_ray.stages.clustering import kmeans_fit
        ds, emb = self._ds()
        labels, cents = kmeans_fit(ds, k=4, iters=3)
        got = labels.to_pandas().sort_values("vec_id")
        want_cid, want_cents = self._reference(emb, k=4, iters=3)
        np.testing.assert_array_equal(got["cluster"].to_numpy(), want_cid)
        np.testing.assert_array_equal(cents, want_cents)

    def test_partition_invariant(self, ray_session):
        from dataquality_ray.stages.clustering import kmeans_fit
        ds, _ = self._ds(seed=11)
        a, ca = kmeans_fit(ds.repartition(1), k=4, iters=3)
        b, cb = kmeans_fit(ds.repartition(7), k=4, iters=3)
        pa_ = a.to_pandas().sort_values("vec_id").reset_index(drop=True)
        pb_ = b.to_pandas().sort_values("vec_id").reset_index(drop=True)
        assert pa_.equals(pb_)
        np.testing.assert_array_equal(ca, cb)


def test_prototype_prune_boundary(ray_session, tmp_path):
    """Strict-below cutoff: equal-sim boundary members all survive;
    clusters with n_target = 0 keep everything."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dataquality_ray.pipelines.documents import (
        prototype_pruned_embeddings,
    )
    from dataquality_ray.stages.clustering import KMEANS_K

    # centroids = unit axes (vec_id < KMEANS_K); then members around
    # axis 0: three at a LOW identical sim (ties at the cutoff) and
    # five exactly on-axis; plus a 3-member cluster on axis 1 where
    # n_target = (3+1)*25//100 = 1 -> cutoff = its lowest sim
    dim = KMEANS_K
    rows = []
    for i in range(KMEANS_K):
        v = np.zeros(dim); v[i] = 1.0
        rows.append((i, v.tolist()))
    nxt = KMEANS_K
    low = np.zeros(dim); low[0] = 1.0; low[1] = 0.9   # sim ~0.743 to c0
    for _ in range(3):
        rows.append((nxt, low.tolist())); nxt += 1
    on = np.zeros(dim); on[0] = 1.0
    for _ in range(4):
        rows.append((nxt, on.tolist())); nxt += 1
    off1 = np.zeros(dim); off1[1] = 1.0; off1[2] = 0.5  # cluster 1, lowest
    rows.append((nxt, off1.tolist())); low1_id = nxt; nxt += 1
    on1 = np.zeros(dim); on1[1] = 1.0
    rows.append((nxt, on1.tolist())); nxt += 1

    tbl = pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([r[1] for r in rows],
                              pa.list_(pa.float64())),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, d / "embeddings.parquet")

    got = prototype_pruned_embeddings(str(d)).to_pandas() \
        .set_index("vec_id")
    # cluster 0 has 1 centroid + 3 low + 4 on-axis = 8 members;
    # n_target = 2 -> s* = 2nd smallest = the low sim; strict-below
    # means ALL three tied low members survive
    c0 = got[got["centroid_id"] == 0]
    assert c0["kept"].all()
    # cluster 1: 3 members, n_target = 0... (3*25)//100 = 0 -> all kept
    c1 = got[got["centroid_id"] == 1]
    assert c1["kept"].all()
    assert len(got) == len(rows)
