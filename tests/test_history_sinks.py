"""History reader (S9/A4) and date-partitioned sink (S8)."""

import json
import os

import pyarrow.dataset as pads
import ray


def _fake_run(root, name, total, kept, committed_at):
    d = os.path.join(root, name)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "run_manifest.json"), "w") as f:
        json.dump({"input": "x", "total_rows": total, "kept": kept,
                   "duplicates": 1, "avg_quality": 80.0,
                   "committed_at": committed_at}, f)
    return d


class TestHistory:
    def test_history_sorted_and_stats(self, tmp_path):
        from dataquality_ray.state.history import history_stats, run_history
        root = str(tmp_path)
        _fake_run(root, "run_a", 100, 90, committed_at=1.0)
        _fake_run(root, "run_b", 200, 150, committed_at=2.0)
        os.makedirs(os.path.join(root, "not_a_run"), exist_ok=True)

        hist = run_history(root).to_pandas()
        assert len(hist) == 2
        # newest first (reference: sort desc, metadata.py:744-746)
        assert hist.iloc[0]["total_rows"] == 200
        stats = history_stats(root)
        assert stats == {"runs": 2, "total_rows": 300, "kept": 240,
                         "keep_rate": 0.8}

    def test_torn_manifest_ignored(self, tmp_path):
        from dataquality_ray.state.history import run_history
        root = str(tmp_path)
        _fake_run(root, "good", 10, 5, 1.0)
        bad = os.path.join(root, "bad")
        os.makedirs(bad)
        with open(os.path.join(bad, "run_manifest.json"), "w") as f:
            f.write("{truncated")
        assert run_history(root).num_rows == 1


class TestPartitionedSink:
    def test_write_by_day(self, ray_session, tmp_path):
        from dataquality_ray.sources.partitioned import (
            write_partitioned_by_day,
        )
        ds = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet")
        out = str(tmp_path / "by_day")
        write_partitioned_by_day(ds, out)
        # hive layout exists
        years = [p for p in os.listdir(out) if p.startswith("year=")]
        assert years
        # rows round-trip and partition values match the ts column
        back = pads.dataset(out, partitioning="hive").to_table()
        orig = pads.dataset(
            "/root/testdata/sf0.001/events.parquet").to_table()
        assert back.num_rows == orig.num_rows
        import pandas as pd
        df = back.to_pandas()
        assert (df["ts"].dt.month.astype("int64")
                == df["month"].astype("int64")).all()


class TestRunPlanManifest:
    def test_mismatch_refused(self, tmp_path):
        from dataquality_ray.state import manifest as mf
        out = str(tmp_path / "out")
        files = ["/data/a.parquet", "/data/b.parquet"]
        mf.ensure_run_plan(out, files, 4)
        mf.ensure_run_plan(out, list(reversed(files)), 4)  # order-insensitive
        import pytest
        with pytest.raises(RuntimeError, match="plan mismatch"):
            mf.ensure_run_plan(out, files, 8)      # different --partitions
        with pytest.raises(RuntimeError, match="plan mismatch"):
            mf.ensure_run_plan(out, files + ["/data/c.parquet"], 4)


class TestUriListing:
    def test_file_uri_listing(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from dataquality_ray.sources.transcripts import list_transcript_files
        d = tmp_path / "shards" / "nested"
        d.mkdir(parents=True)
        for i in range(3):
            pq.write_table(pa.table({"x": [i]}),
                           str(tmp_path / "shards" / f"p{i}.parquet"))
        pq.write_table(pa.table({"x": [9]}), str(d / "deep.parquet"))
        (tmp_path / "shards" / "notes.txt").write_text("skip me")
        uri = f"file://{tmp_path}/shards"
        got = list_transcript_files(uri)
        assert len(got) == 4
        # local URIs resolve to PLAIN paths (ray.data.read_parquet
        # rejects the file:// scheme); remote schemes stay prefixed
        assert all(g.startswith("/") and g.endswith(".parquet")
                   for g in got)
        assert got == sorted(got)
        # single-file file:// URI → plain path
        one = list_transcript_files(f"file://{got[0]}")
        assert one == [got[0]]
        # plain local path unchanged
        local = list_transcript_files(str(tmp_path / "shards"))
        assert local == got


class TestMissingPathSuggestions:
    """Missing local source paths raise with 'Did you mean' delete-1
    suggestions from the parent listing (reference S3 surface,
    s3.py:203-248)."""

    def test_typo_dir_suggested(self, tmp_path):
        import pytest

        from dataquality_ray.sources.transcripts import (
            list_transcript_files,
        )
        (tmp_path / "transcripts_v2").mkdir()
        (tmp_path / "archive").mkdir()
        with pytest.raises(FileNotFoundError) as ei:
            list_transcript_files(str(tmp_path / "transcripts_v"))
        assert "Did you mean" in str(ei.value)
        assert "transcripts_v2" in str(ei.value)
        assert "archive" not in str(ei.value)

    def test_case_whitespace_match(self, tmp_path):
        import pytest

        from dataquality_ray.sources.transcripts import (
            read_transcripts,
        )
        (tmp_path / "Data").mkdir()
        with pytest.raises(FileNotFoundError) as ei:
            read_transcripts(str(tmp_path / "data"))
        assert "Data" in str(ei.value)

    def test_no_match_message(self, tmp_path):
        import pytest

        from dataquality_ray.sources.transcripts import (
            list_transcript_files,
        )
        with pytest.raises(FileNotFoundError) as ei:
            list_transcript_files(str(tmp_path / "nothing_like_this"))
        assert "no close match" in str(ei.value)
