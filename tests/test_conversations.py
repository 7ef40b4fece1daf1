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
