"""The step registry composes the same stages as the hand-built DAG."""

import pyarrow as pa
import pytest
import ray

from dataquality_ray.registry import apply_steps, list_steps, register_step


def test_builtin_steps_registered():
    steps = list_steps()
    for name in ("scrub", "heuristics", "models", "decision",
                 "content_hash", "sketches"):
        assert name in steps


def test_registry_chain_matches_pipeline(small_transcripts, small_oracle):
    ds = ray.data.from_arrow(small_transcripts)
    out = apply_steps(ds, ["scrub", "heuristics", "models", "decision"])
    got = pa.Table.from_pandas(out.to_pandas(), preserve_index=False) \
        .sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    for col in ("text", "overall_quality_score", "action", "keep", "lang"):
        assert got[col].to_pylist() == small_oracle[col].to_pylist(), col


def test_custom_step_and_unknown_error(small_transcripts):
    @register_step("test_uppercase_role", pass_cfg=False)
    def upper_role(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.set_column(
            batch.schema.get_field_index("role"), "role",
            pc.utf8_upper(batch["role"]))

    ds = ray.data.from_arrow(small_transcripts)
    out = apply_steps(ds, ["test_uppercase_role"]).take(1)
    assert out[0]["role"].isupper()

    with pytest.raises(KeyError, match="unknown step"):
        apply_steps(ds, ["nope"])
