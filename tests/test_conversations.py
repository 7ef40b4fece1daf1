"""Salted per-conversation aggregates must equal a plain pandas groupby
over the oracle labels (phase-splitting is lossless)."""

import pandas as pd
import ray


def test_conv_stats_matches_oracle(small_transcripts, small_oracle):
    from dataquality_ray.pipelines.conversations import conv_stats
    from dataquality_ray.pipelines.quality import quality_pipeline

    scored = quality_pipeline(
        ray.data.from_arrow(small_transcripts),
        with_dedup=False, sort_output=False)
    got = conv_stats(scored).to_pandas() \
        .sort_values("conv_id").reset_index(drop=True)

    df = small_oracle.select(
        ["conv_id", "turn_idx", "keep", "overall_quality_score"]
    ).to_pandas()
    want = (df.groupby("conv_id")
            .agg(n_turns=("turn_idx", "size"),
                 n_keep=("keep", "sum"),
                 sum_score=("overall_quality_score", "sum"),
                 first_turn=("turn_idx", "min"),
                 last_turn=("turn_idx", "max"))
            .reset_index())
    want["avg_quality"] = want["sum_score"] // want["n_turns"]
    want = want.drop(columns=["sum_score"]).sort_values("conv_id") \
        .reset_index(drop=True)

    assert len(got) == len(want)
    for col in ("conv_id", "n_turns", "n_keep", "avg_quality",
                "first_turn", "last_turn"):
        assert got[col].tolist() == want[col].tolist(), col


def test_hot_conversation_salting(small_transcripts):
    """The fixture's hot conversations (200+ turns) must aggregate
    correctly through the salted two-phase path."""
    from dataquality_ray.pipelines.conversations import conv_stats
    from dataquality_ray.pipelines.quality import quality_pipeline

    scored = quality_pipeline(
        ray.data.from_arrow(small_transcripts),
        with_dedup=False, sort_output=False)
    got = conv_stats(scored).to_pandas()
    sizes = (pd.Series(small_transcripts["conv_id"].to_pylist())
             .value_counts())
    hot = sizes[sizes >= 100]
    if len(hot):
        for conv_id, n in hot.items():
            assert int(got[got.conv_id == conv_id].n_turns.iloc[0]) == n


class TestBucketedOpsInvariance:
    """The bucketed-local-aggregation ops (CLAUDE.md huge-group-count
    shape) must be invariant to input partitioning."""

    def _tr_ds(self, n=3000):
        import ray
        from dataquality_ray.fixtures import transcripts_path
        return ray.data.read_parquet(transcripts_path(n, seed=42))

    def test_role_tool_stats_partition_invariant(self, ray_session):
        from dataquality_ray.pipelines.conversations import role_tool_stats
        ds = self._tr_ds()
        a = role_tool_stats(ds.repartition(1)).to_pandas()
        b = role_tool_stats(ds.repartition(7)).to_pandas()
        key = ["role", "tool"]
        a = a.sort_values(key).reset_index(drop=True)
        b = b.sort_values(key).reset_index(drop=True)
        assert a.equals(b)
        assert (a["n_turns"] >= a["n_convs"]).all()

    def test_conv_turn_gaps_partition_invariant(self, ray_session):
        from dataquality_ray.pipelines.conversations import conv_turn_gaps
        ds = self._tr_ds()
        key = ["conv_id", "turn_idx"]
        a = conv_turn_gaps(ds.repartition(1)).to_pandas() \
            .sort_values(key).reset_index(drop=True)
        b = conv_turn_gaps(ds.repartition(5)).to_pandas() \
            .sort_values(key).reset_index(drop=True)
        assert a.equals(b)
        # first turn of every conversation is the -1 sentinel
        assert (a.loc[a["turn_idx"] == a.groupby("conv_id")["turn_idx"]
                      .transform("min"), "gap_us"] == -1).all()

    def test_conv_training_docs_partition_invariant(self, ray_session):
        from dataquality_ray.pipelines.conversations import (
            conv_training_docs,
        )
        ds = self._tr_ds()
        a = conv_training_docs(ds.repartition(1)).to_pandas() \
            .sort_values("conv_id").reset_index(drop=True)
        b = conv_training_docs(ds.repartition(6)).to_pandas() \
            .sort_values("conv_id").reset_index(drop=True)
        assert a.equals(b)
        # every conversation present exactly once; line count == turns
        src = ds.to_pandas()
        assert set(a["conv_id"]) == set(src["conv_id"])
        n_lines = a["doc_text"].str.count("\n") + 1
        assert (n_lines.to_numpy() == a["n_turns"].to_numpy()).all()

    def test_turn_context_windows_partition_invariant(self, ray_session):
        from dataquality_ray.pipelines.conversations import (
            turn_context_windows,
        )
        ds = self._tr_ds()
        key = ["conv_id", "turn_idx"]
        a = turn_context_windows(ds.repartition(1)).to_pandas() \
            .sort_values(key).reset_index(drop=True)
        b = turn_context_windows(ds.repartition(5)).to_pandas() \
            .sort_values(key).reset_index(drop=True)
        assert a.equals(b)
        # first turn of every conversation has no predecessor
        first = a["turn_idx"] == a.groupby("conv_id")["turn_idx"] \
            .transform("min")
        assert (a.loc[first, "prev_text"] == "").all()


class TestHeavyHitters:
    def _exact(self, table):
        import polars as pl
        from dataquality_ray.spec import TOKEN_PATTERN
        toks = (pl.from_arrow(table["text"]).str.to_lowercase()
                .str.extract_all(TOKEN_PATTERN))
        cf = (pl.DataFrame({"term": toks}).explode("term").drop_nulls()
              .group_by("term").agg(pl.len().cast(pl.Int64).alias("cf")))
        thr = max(1, table.num_rows // 20)
        return (cf.filter(pl.col("cf") >= thr).sort("term")
                .to_pandas())

    def test_matches_exact_groupby(self, ray_session, small_transcripts):
        import ray
        from dataquality_ray.pipelines.conversations import (
            transcript_heavy_hitters,
        )
        got = transcript_heavy_hitters(
            ray.data.from_arrow(small_transcripts)).to_pandas() \
            .reset_index(drop=True)
        want = self._exact(small_transcripts).reset_index(drop=True)
        assert got.equals(want)
        assert len(got) > 0          # non-trivial on the fixture

    def test_prefilter_has_no_false_negatives_under_collisions(
            self, ray_session, small_transcripts):
        """A pathologically narrow sketch (width 4 → massive
        over-counting) must only ENLARGE the candidate set — the exact
        final filter still returns the exact answer."""
        import ray
        from dataquality_ray.pipelines.conversations import (
            transcript_heavy_hitters,
        )
        got = transcript_heavy_hitters(
            ray.data.from_arrow(small_transcripts),
            cms_width=4).to_pandas().reset_index(drop=True)
        want = self._exact(small_transcripts).reset_index(drop=True)
        assert got.equals(want)

    def test_prefilter_prunes_the_tail(self, ray_session,
                                       small_transcripts):
        """With the real width the candidate set must be a small
        fraction of the vocabulary (the whole point of the sketch)."""
        import numpy as np
        import polars as pl
        import ray
        from dataquality_ray.pipelines.conversations import (
            HH_CMS_DEPTH,
            HH_CMS_WIDTH,
            _hh_cell_hashes,
        )
        from dataquality_ray.spec import TOKEN_PATTERN
        toks = (pl.from_arrow(small_transcripts["text"])
                .str.to_lowercase().str.extract_all(TOKEN_PATTERN))
        cf = (pl.DataFrame({"term": toks}).explode("term").drop_nulls()
              .group_by("term")
              .agg(pl.len().cast(pl.Int64).alias("cf")))
        table = np.zeros((HH_CMS_DEPTH, HH_CMS_WIDTH), np.int64)
        terms = cf["term"]
        n = cf["cf"].to_numpy()
        for i in range(HH_CMS_DEPTH):
            np.add.at(table[i],
                      _hh_cell_hashes(terms, i, HH_CMS_WIDTH), n)
        est = np.min(np.stack([
            table[i, _hh_cell_hashes(terms, i, HH_CMS_WIDTH)]
            for i in range(HH_CMS_DEPTH)]), axis=0)
        thr = max(1, small_transcripts.num_rows // 20)
        n_candidates = int((est >= thr).sum())
        n_true = int((n >= thr).sum())
        assert (est >= n).all()                  # never under-counts
        assert n_candidates >= n_true            # exact recall
        assert n_candidates <= max(2 * n_true, n_true + 20)


class TestBigramMerges:
    def test_matches_brute_force_and_partition_invariant(
            self, ray_session, small_transcripts):
        import polars as pl
        import ray
        from dataquality_ray.pipelines.conversations import (
            token_bigram_merges,
        )
        from dataquality_ray.spec import TOKEN_PATTERN

        toks = (pl.from_arrow(small_transcripts["text"])
                .str.to_lowercase().str.extract_all(TOKEN_PATTERN))
        e = (pl.DataFrame({"toks": toks}).with_row_index("rid")
             .explode("toks").drop_nulls("toks"))
        e = e.with_columns(b=pl.col("toks").shift(-1).over("rid")) \
             .drop_nulls("b")
        want = (e.group_by(["toks", "b"])
                .agg(pl.len().cast(pl.Int64).alias("cf"))
                .rename({"toks": "a"})
                .sort(["cf", "a", "b"],
                      descending=[True, False, False])
                .head(50).to_pandas())

        ds = ray.data.from_arrow(small_transcripts)
        a = token_bigram_merges(ds, num_buckets=3).to_pandas() \
            .reset_index(drop=True)
        b2 = token_bigram_merges(ds.repartition(7), num_buckets=11) \
            .to_pandas().reset_index(drop=True)
        assert a.equals(want.reset_index(drop=True))
        assert a.equals(b2)


class TestConvNearDupBoilerplateCap:
    """CONV_DEDUP_DF_CAP semantics: turn hashes shared by more than the
    cap's worth of conversations are corpus boilerplate and carry no
    retake evidence — a clique of conversations related ONLY through a
    boilerplate turn must produce no pairs, while genuine retakes
    (distinctive shared turns) are still detected."""

    def _make_ds(self, n_boiler):
        import pyarrow as pa
        import ray
        from datetime import datetime

        rows = {"conv_id": [], "turn_idx": [], "role": [], "text": [],
                "tool": [], "ts": []}
        ts = datetime(2026, 1, 1)

        def add(conv, idx, text):
            rows["conv_id"].append(conv)
            rows["turn_idx"].append(idx)
            rows["role"].append("user")
            rows["text"].append(text)
            rows["tool"].append("")
            rows["ts"].append(ts)

        # n_boiler tiny conversations sharing ONE boilerplate turn and
        # otherwise unique content: 2 distinct hashes each, 1 shared ->
        # Jaccard(a, b) = 1/3 < 0.5 even un-capped, BUT the clique's
        # candidate set is n_boiler^2 — the cap must keep it out of the
        # index entirely. Give each pair of neighbours one more shared
        # turn so some pairs WOULD qualify without the cap: conv k and
        # k+1 share "ok" and "filler k" -> without the cap, Jaccard =
        # 2/4 = 0.5 (qualifying). With the cap "ok" is pruned, leaving
        # 1 shared of 3 union -> 0.33 (dropped).
        for k in range(n_boiler):
            c = f"boiler-{k:04d}"
            add(c, 0, "ok")
            add(c, 1, f"filler {k}")
            add(c, 2, f"filler {k + 1}")
        # two genuine retakes: 3 turns, 2 shared distinctive ones
        for c, extra in (("retake-a", "unique a"),
                         ("retake-b", "unique b")):
            add(c, 0, "let us plan the data migration")
            add(c, 1, "step one export the tables")
            add(c, 2, extra)
        tbl = pa.table({
            "conv_id": pa.array(rows["conv_id"]),
            "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
            "role": pa.array(rows["role"]),
            "text": pa.array(rows["text"]),
            "tool": pa.array(rows["tool"]),
            "ts": pa.array(rows["ts"], pa.timestamp("us")),
        })
        return ray.data.from_arrow(tbl).repartition(4)

    def test_cap_prunes_boilerplate_keeps_retakes(self, ray_session):
        from dataquality_ray.pipelines.conversations import (
            CONV_DEDUP_DF_CAP,
            conv_near_dup_pairs,
        )

        n_boiler = CONV_DEDUP_DF_CAP + 30     # "ok" is over the cap
        got = conv_near_dup_pairs(self._make_ds(n_boiler)).to_pandas()
        # exactly the retake pair survives
        assert len(got) == 1
        row = got.iloc[0]
        assert row["conv_a"] == "retake-a" and row["conv_b"] == "retake-b"
        assert row["n_shared"] == 2 and row["n_a"] == 3 and row["n_b"] == 3
        assert row["jaccard_milli"] == 500

    def test_below_cap_chain_pairs_detected(self, ray_session):
        from dataquality_ray.pipelines.conversations import (
            conv_near_dup_pairs,
        )

        # with only a few boiler convs, "ok" is under the cap and the
        # neighbour chain (2 shared of 4 union = 0.5) qualifies
        got = conv_near_dup_pairs(self._make_ds(5)).to_pandas()
        chain = got[got["conv_a"].str.startswith("boiler")]
        assert len(chain) == 4          # k ~ k+1 for k in 0..3
        assert (chain["jaccard_milli"] == 500).all()
        retake = got[got["conv_a"] == "retake-a"]
        assert len(retake) == 1


def test_windowed_turn_dedup_null_text(ray_session):
    """NULL text must behave like empty-normalized (ch='' -> is_dup
    False), matching the DuckDB twin where ch IS NULL, instead of
    crashing on None.encode() (round-5 ADVICE fix)."""
    import pyarrow as pa

    from dataquality_ray.pipelines.conversations import (
        windowed_turn_dedup,
    )

    tbl = pa.table({
        "conv_id": pa.array(["c1", "c1", "c2", "c2"]),
        "turn_idx": pa.array([0, 1, 0, 1], pa.int64()),
        "text": pa.array(["hello", None, None, "hello"]),
        "ts": pa.array([1, 2, 3, 4], pa.timestamp("us")),
    })
    got = (windowed_turn_dedup(ray.data.from_arrow(tbl))
           .to_pandas().set_index(["conv_id", "turn_idx"]))
    assert not got.loc[("c1", 1), "is_dup"]      # null -> never dup
    assert not got.loc[("c2", 0), "is_dup"]
    assert got.loc[("c2", 1), "is_dup"]          # real repeat in window
    assert not got.loc[("c1", 0), "is_dup"]


def test_conv_boilerplate_turns_edges(ray_session):
    """Cap boundary (> cap, not >=), null/empty text never boilerplate,
    ALL occurrences flagged (no surviving first copy), exact integer
    permille."""
    import pyarrow as pa

    from dataquality_ray.pipelines.conversations import (
        conv_boilerplate_turns,
    )

    # "hot" appears in 3 distinct convs (one conv twice: distinct
    # count, not occurrence count); "warm" in exactly cap=2 convs.
    tbl = pa.table({
        "conv_id": pa.array(["a", "a", "a", "b", "b", "c", "c", "d"]),
        "text": pa.array(["HOT ", "hot", "warm", " hot", "warm",
                          "hot", None, ""]),
    })
    got = (conv_boilerplate_turns(ray.data.from_arrow(tbl), cap=2)
           .to_pandas().set_index("conv_id"))
    # 'hot' normalized spans convs {a,b,c} = 3 > 2 -> boiler;
    # 'warm' spans {a,b} = 2, not > 2 -> kept
    assert got.loc["a", "n_turns"] == 3
    assert got.loc["a", "n_boiler"] == 2          # both copies flagged
    assert got.loc["a", "boiler_permille"] == 666
    assert got.loc["b", "n_boiler"] == 1
    assert got.loc["c", "n_turns"] == 2           # null counted, not boiler
    assert got.loc["c", "n_boiler"] == 1
    assert got.loc["d", "n_boiler"] == 0          # empty never boiler
    assert got.loc["d", "boiler_permille"] == 0


def test_role_length_profile_quantile_rule(ray_session):
    """The exact-histogram quantile must follow DuckDB quantile_disc's
    rule (sorted[ceil(q*n)-1]) — pinned against duckdb on an
    adversarial multiset (duplicates + skew + an even count)."""
    import duckdb
    import pyarrow as pa

    from dataquality_ray.pipelines.conversations import (
        role_length_profile,
    )

    lens = [0, 0, 3, 3, 3, 7, 100, 100, 2, 1]   # n=10, ties, skew
    tbl = pa.table({
        "role": pa.array(["user"] * len(lens)),
        "text": pa.array(["x" * n for n in lens]),
    })
    got = role_length_profile(ray.data.from_arrow(tbl))
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = duckdb.connect().execute(
        "SELECT CAST(quantile_disc(l, 0.5) AS BIGINT),"
        " CAST(quantile_disc(l, 0.9) AS BIGINT), MAX(l)"
        " FROM (SELECT unnest(?) AS l)", [lens]).fetchone()
    row = got.iloc[0]
    assert (row["med_len"], row["p90_len"], row["max_len"]) == want
    assert row["n_turns"] == len(lens)
