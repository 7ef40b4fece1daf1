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
