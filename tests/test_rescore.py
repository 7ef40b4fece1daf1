"""Re-scoring from stored signals must equal a full re-run under the new
config — without re-running the models."""

from dataclasses import replace

import pyarrow as pa
import ray

from dataquality_ray.config import DEFAULT_CONFIG
from dataquality_ray.oracle import label_transcripts
from dataquality_ray.pipelines.quality import quality_pipeline
from dataquality_ray.pipelines.rescore import rescore


def test_rescore_matches_full_rerun(small_transcripts):
    strict = replace(DEFAULT_CONFIG, keep_min_overall=85)  # KEEP only

    scored = quality_pipeline(
        ray.data.from_arrow(small_transcripts),
        with_dedup=False, sort_output=False).materialize()

    got = pa.Table.from_pandas(
        rescore(scored, strict).to_pandas(), preserve_index=False) \
        .sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    want = label_transcripts(small_transcripts, strict)

    assert got["keep"].to_pylist() == want["keep"].to_pylist()
    assert got["action"].to_pylist() == want["action"].to_pylist()
    assert got["overall_quality_score"].to_pylist() == \
        want["overall_quality_score"].to_pylist()
    # policy actually changed something vs the default
    base = label_transcripts(small_transcripts, DEFAULT_CONFIG)
    assert sum(got["keep"].to_pylist()) < sum(base["keep"].to_pylist())
    # text untouched
    assert got["text"].to_pylist() == base["text"].to_pylist()


class TestRescoreOldCheckpoint:
    def test_checkpoint_without_toxicity_columns(self, ray_session,
                                                 small_transcripts,
                                                 small_oracle):
        """Checkpoints written before the toxicity signal existed must
        still rescore (toxicity recomputed from the stored text)."""
        import ray
        from dataquality_ray.pipelines.quality import quality_pipeline
        from dataquality_ray.pipelines.rescore import rescore
        scored = quality_pipeline(
            ray.data.from_arrow(small_transcripts),
            with_dedup=False, sort_output=False)
        old_style = scored.map_batches(
            lambda t: t.drop_columns(
                [c for c in ("toxicity_score", "n_toxic")
                 if c in t.column_names]),
            batch_format="pyarrow")
        out = rescore(old_style).to_pandas() \
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        want = small_oracle.to_pandas()
        assert out["overall_quality_score"].tolist() \
            == want["overall_quality_score"].tolist()
        assert out["action"].tolist() == want["action"].tolist()
