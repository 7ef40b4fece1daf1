"""Golden end-to-end: the Ray pipeline must match the oracle labeler.

north_rule contract: exact per-turn scrubbed-text equality under stable
(conv_id, turn_idx) ordering, keep/drop F1 >= 0.99 vs reference labels.
Ours matches exactly (deterministic models on both sides), so we assert
F1 == 1.0 and full column equality, plus invariance to batch size,
input order and block structure.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray

from dataquality_ray.config import DEFAULT_CONFIG
from dataquality_ray.oracle import label_transcripts, near_dup_pairs_exact
from dataquality_ray.pipelines.quality import (
    quality_pipeline,
    run_summary,
    transcript_near_dup_pairs,
)


def _run_pipeline(table: pa.Table, **kw) -> pa.Table:
    ds = ray.data.from_arrow(table)
    out = quality_pipeline(ds, **kw)
    result = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return result.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def _f1(pred, truth):
    pred = np.asarray(pred)
    truth = np.asarray(truth)
    tp = int((pred & truth).sum())
    fp = int((pred & ~truth).sum())
    fn = int((~pred & truth).sum())
    if tp == 0:
        return 0.0
    p = tp / (tp + fp)
    r = tp / (tp + fn)
    return 2 * p * r / (p + r)


class TestEndToEnd:
    def test_matches_oracle(self, small_transcripts, small_oracle):
        got = _run_pipeline(small_transcripts)
        assert got.num_rows == small_oracle.num_rows
        # exact text equality (the north_rule hard contract)
        assert got["text"].to_pylist() == small_oracle["text"].to_pylist()
        # all discrete columns exact
        for col in ("conv_id", "turn_idx", "n_email", "n_phone", "n_ssn",
                    "lang", "length_score", "repetition_score",
                    "symbol_score", "boilerplate_score", "lang_score",
                    "ppl_score", "timeliness_score",
                    "overall_quality_score", "action", "keep",
                    "content_hash", "dup_of"):
            assert got[col].to_pylist() == small_oracle[col].to_pylist(), col
        # keep/drop F1 (trivially 1.0 given exact match — assert the gate)
        f1 = _f1(got["keep"].to_pylist(), small_oracle["keep"].to_pylist())
        assert f1 >= 0.99
        assert f1 == 1.0

    def test_output_is_sorted(self, small_transcripts):
        ds = ray.data.from_arrow(small_transcripts)
        out = quality_pipeline(ds).to_pandas()
        keys = list(zip(out["conv_id"], out["turn_idx"]))
        assert keys == sorted(keys)

    def test_bucketed_mode_matches_and_orders(self, small_transcripts,
                                              small_oracle):
        """sort_mode='bucketed' (the bench/run.py path): same rows as
        the oracle, a deterministic (conv_bucket, conv_id, turn_idx)
        total order, and a bucket column that is a pure function of
        conv_id (the resumable-layout contract)."""
        from dataquality_ray.pipelines.quality import conv_bucket_of
        got = _run_pipeline(small_transcripts, sort_mode="bucketed")
        for col in ("text", "keep", "dup_of", "overall_quality_score"):
            assert got[col].to_pylist() == small_oracle[col].to_pylist(), col
        raw = quality_pipeline(ray.data.from_arrow(small_transcripts),
                               sort_mode="bucketed").to_pandas()
        keys = list(zip(raw["conv_bucket"], raw["conv_id"],
                        raw["turn_idx"]))
        assert keys == sorted(keys)
        expect = conv_bucket_of(
            pa.array(raw["conv_id"].tolist()),
            int(raw["conv_bucket"].max()) + 1).to_pylist()
        assert raw["conv_bucket"].tolist() == expect

    def test_dup_of_points_to_canonical(self, small_oracle):
        # every dup_of target exists and is not itself a dup
        keys = {f"{c}#{t:08d}"
                for c, t in zip(small_oracle["conv_id"].to_pylist(),
                                small_oracle["turn_idx"].to_pylist())}
        by_key = dict(zip(
            (f"{c}#{t:08d}" for c, t in zip(small_oracle["conv_id"].to_pylist(),
                                            small_oracle["turn_idx"].to_pylist())),
            small_oracle["dup_of"].to_pylist()))
        dups = [d for d in small_oracle["dup_of"].to_pylist() if d]
        assert dups, "fixture must contain exact dups"
        for d in dups:
            assert d in keys
            assert by_key[d] is None


class TestInvariance:
    """Results identical across batch size, block structure, input order."""

    def test_batch_size_invariance(self, small_transcripts, small_oracle):
        from dataclasses import replace
        cfg = replace(DEFAULT_CONFIG, batch_size=64)
        got = _run_pipeline(small_transcripts, cfg=cfg)
        assert got["keep"].to_pylist() == small_oracle["keep"].to_pylist()
        assert got["text"].to_pylist() == small_oracle["text"].to_pylist()
        assert got["dup_of"].to_pylist() == small_oracle["dup_of"].to_pylist()

    def test_input_order_invariance(self, small_transcripts, small_oracle):
        perm = np.random.default_rng(7).permutation(small_transcripts.num_rows)
        shuffled = small_transcripts.take(pa.array(perm))
        got = _run_pipeline(shuffled)
        assert got["text"].to_pylist() == small_oracle["text"].to_pylist()
        assert got["dup_of"].to_pylist() == small_oracle["dup_of"].to_pylist()

    def test_block_structure_invariance(self, small_transcripts, small_oracle):
        ds = ray.data.from_arrow(small_transcripts).repartition(13)
        out = quality_pipeline(ds)
        got = pa.Table.from_pandas(out.to_pandas(), preserve_index=False) \
            .sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        assert got["keep"].to_pylist() == small_oracle["keep"].to_pylist()
        assert got["dup_of"].to_pylist() == small_oracle["dup_of"].to_pylist()


class TestQualityRun:
    def test_checkpointed_run_equals_pipeline(self, tmp_path,
                                              small_transcripts,
                                              small_oracle):
        import pyarrow.dataset as pads
        from dataquality_ray.pipelines.quality import quality_run
        ds = ray.data.from_arrow(small_transcripts)
        final_dir = quality_run(ds, str(tmp_path / "qr"))
        got = pads.dataset(final_dir).to_table().sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending")])
        for col in ("conv_id", "turn_idx", "text", "keep", "action",
                    "dup_of", "overall_quality_score"):
            assert got[col].to_pylist() == small_oracle[col].to_pylist(), col


class TestNearDup:
    def test_lsh_pairs_match_exact_oracle(self, small_transcripts):
        expect = near_dup_pairs_exact(small_transcripts)
        assert expect, "fixture must contain near-dup pairs"
        ds = ray.data.from_arrow(small_transcripts)
        got_df = transcript_near_dup_pairs(ds).to_pandas()
        got = sorted(zip(got_df["key_a"], got_df["key_b"]))
        want = sorted((a, b) for a, b, _ in expect)
        # precision is exact (verified); recall bounded by LSH band choice
        assert set(got) <= set(want)
        recall = len(set(got) & set(want)) / len(want)
        assert recall >= 0.95, f"LSH recall {recall}"
        # jaccard values agree with oracle on common pairs
        jac = {(a, b): j for a, b, j in expect}
        for a, b, j in zip(got_df["key_a"], got_df["key_b"], got_df["jaccard"]):
            assert abs(jac[(a, b)] - j) < 1e-9


class TestSimHashNearDup:
    def test_matches_exact_hamming_oracle(self, small_transcripts):
        import functools

        import numpy as np

        from dataquality_ray.config import DEFAULT_CONFIG as cfg
        from dataquality_ray.spec import order_key as mk_key
        from dataquality_ray.stages.dedup import (
            MinHashSimHash,
            content_hash_batch,
            hamming64,
            simhash_near_dup,
        )
        from dataquality_ray.stages.scrub import scrub_batch

        ds = ray.data.from_arrow(small_transcripts)
        ds = ds.map_batches(
            functools.partial(scrub_batch, with_counts=False),
            batch_format="pyarrow")
        ds = ds.map_batches(content_hash_batch, batch_format="pyarrow")
        ds = ds.map_batches(MinHashSimHash, batch_format="pyarrow",
                            concurrency=(1, 2)).materialize()
        got = simhash_near_dup(ds).to_pandas()
        got_set = set(zip(got.key_a, got.key_b))

        # exact O(n²) oracle over the same simhashes; token-LESS rows
        # excluded (NOT the simhash==0 sentinel, NOT just normalized
        # emptiness — matches the pipeline's guard: a symbol-only or
        # non-ASCII-token text has no sketchable content)
        tab = ds.to_pandas()
        sims = tab["simhash"].to_numpy().astype(np.uint64)
        keys = tab["order_key"].to_numpy()
        nonempty = np.array([len(t) > 0 for t in tab["token_hashes"]])
        want = set()
        for i in range(len(keys)):
            if not nonempty[i]:
                continue
            rest = sims[i + 1:]
            d = hamming64(np.full(len(rest), sims[i], dtype=np.uint64),
                          rest)
            for j_off in np.flatnonzero(
                    (d <= cfg.simhash_max_hamming) & nonempty[i + 1:]):
                j = i + 1 + j_off
                if keys[i] != keys[j]:
                    want.add(tuple(sorted((keys[i], keys[j]))))
        assert want, "fixture must contain simhash near-dups"
        assert got_set == want   # pigeonhole banding: exact recall
        # hamming values correct
        by_key = {mk_key(c, t): s for c, t, s in zip(
            tab["conv_id"], tab["turn_idx"], sims)}
        for a, b, h in zip(got.key_a, got.key_b, got.hamming):
            d = hamming64(np.array([by_key[a]], dtype=np.uint64),
                          np.array([by_key[b]], dtype=np.uint64))[0]
            assert int(d) == h


class TestNearDupJoinStrategy:
    def test_join_strategy_equals_carry(self, small_transcripts):
        ds_a = ray.data.from_arrow(small_transcripts)
        ds_b = ray.data.from_arrow(small_transcripts)
        carry = transcript_near_dup_pairs(ds_a, strategy="carry").to_pandas()
        join = transcript_near_dup_pairs(ds_b, strategy="join").to_pandas()
        assert set(zip(carry.key_a, carry.key_b)) \
            == set(zip(join.key_a, join.key_b))


class TestRunSummary:
    def test_action_counts(self, small_transcripts, small_oracle):
        ds = ray.data.from_arrow(small_transcripts)
        out = run_summary(quality_pipeline(ds, sort_output=False)).to_pandas()
        import collections
        want = collections.Counter(small_oracle["action"].to_pylist())
        got = dict(zip(out["action"], out["n"]))
        assert got == dict(want)


class TestDedupModeEquivalence:
    def test_three_modes_identical(self, small_transcripts):
        """inline (side-channel), broadcast (materialize + map) and
        shuffle (bucketed groupby) dedup modes must produce identical
        final tables — same dup_of assignments, same everything."""
        import pandas as pd

        def run(mode):
            ds = ray.data.from_arrow(small_transcripts)
            df = quality_pipeline(ds, dedup_mode=mode).to_pandas()
            return df.sort_values(["conv_id", "turn_idx"]) \
                     .reset_index(drop=True)

        inline = run("inline")
        broadcast = run("broadcast")
        shuffle = run("shuffle")
        cols = sorted(inline.columns)
        assert sorted(broadcast.columns) == cols
        assert set(cols) <= set(shuffle.columns)  # shuffle keeps helpers
        pd.testing.assert_frame_equal(inline[cols], broadcast[cols])
        pd.testing.assert_frame_equal(inline[cols], shuffle[cols])


class TestInlineDupMapGuard:
    def test_cap_exceeded_fails_loudly(self, ray_session):
        """Pushing more distinct dedup_keys than cfg.max_inline_map_keys
        allows must raise a clear error (pointing at dedup_mode=
        'shuffle'), not OOM an aggregator actor."""
        from dataquality_ray.stages.dedup import make_dup_aggregators
        handles = make_dup_aggregators(num=2, max_total_keys=4)
        # 2 keys/shard cap; first add fits, second overflows its shard
        ray.get(handles[0].add.remote(b"b1", ["k1", "k2"],
                                      ["o1", "o2"], [1, 1]))
        with pytest.raises(ray.exceptions.RayTaskError,
                           match="dedup_mode='shuffle'"):
            ray.get(handles[0].add.remote(b"b2", ["k3", "k4", "k5"],
                                          ["o3", "o4", "o5"], [1, 1, 1]))
        # the failed batch is NOT marked seen: a retry raises again
        # rather than silently no-opping into a partial map
        with pytest.raises(ray.exceptions.RayTaskError):
            ray.get(handles[0].add.remote(b"b2", ["k3", "k4", "k5"],
                                          ["o3", "o4", "o5"], [1, 1, 1]))

    def test_shard_count_scales_with_cluster(self, ray_session):
        from dataquality_ray.stages.dedup import make_dup_aggregators
        handles = make_dup_aggregators()
        import ray as _ray
        cpus = int(_ray.cluster_resources().get("CPU", 8))
        assert len(handles) == max(4, cpus // 4)


class TestSimHashTokenlessGuard:
    def test_tokenless_texts_never_pair(self, ray_session):
        """Texts with no ASCII tokens (zh prose, symbol-only) all get
        simhash 0 — they must be EXCLUDED from banding, not paired with
        each other as hamming-0 'near-dups' (regression test)."""
        import functools
        from dataquality_ray.stages.dedup import (
            MinHashSimHash,
            content_hash_batch,
            simhash_near_dup,
        )
        from dataquality_ray.functions.corpora import LANG_CORPORA
        texts = LANG_CORPORA["zh"][:5] + ["!!! ###", "", "the quick fox"]
        tab = pa.table({
            "conv_id": pa.array([f"c{i}" for i in range(len(texts))]),
            "turn_idx": pa.array([0] * len(texts), pa.int32()),
            "text": pa.array(texts, pa.string()),
        })
        ds = ray.data.from_arrow(tab)
        ds = ds.map_batches(content_hash_batch, batch_format="pyarrow")
        ds = ds.map_batches(MinHashSimHash, batch_format="pyarrow",
                            concurrency=(1, 2))
        pairs = simhash_near_dup(ds).to_pandas()
        assert len(pairs) == 0, pairs


class TestGlobalSentenceDedupInvariance:
    def test_partition_invariant_and_conserving(self, ray_session):
        from dataquality_ray.pipelines.documents import (
            global_sentence_dedup)
        sf = "/root/testdata/sf0.001"
        a = global_sentence_dedup(sf, num_buckets=4).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        b = global_sentence_dedup(sf, num_buckets=17).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert a.equals(b)
        assert (a["n_kept"] <= a["n_sents"]).all()
        # every corpus-distinct sentence survives exactly once overall:
        # total kept == number of distinct trimmed sentences
        import duckdb
        n_distinct = duckdb.connect().execute(f"""
            SELECT count(DISTINCT s) FROM (
              SELECT unnest(list_filter(list_transform(
                string_split(text, '.'),
                x -> trim(x, ' ' || chr(9) || chr(13) || chr(10))),
                x -> x <> '')) AS s
              FROM '{sf}/documents.parquet')""").fetchone()[0]
        assert int(a["n_kept"].sum()) == int(n_distinct)
