"""Resume-from-checkpoint: kill after k partitions, restart, verify
committed partitions are not recomputed and the final output is identical
to an uninterrupted run."""

import os
import subprocess
import sys

import pyarrow.dataset as pads
import pytest

from dataquality_ray.fixtures import transcripts_path

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_driver(args, expect_fail=False):
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "run.py"), *args],
        env=env, capture_output=True, text=True)
    if expect_fail:
        assert r.returncode != 0, r.stdout + r.stderr
    else:
        assert r.returncode == 0, r.stdout + r.stderr
    return r


@pytest.mark.slow
def test_resume_skips_committed_and_output_identical(tmp_path):
    inp = transcripts_path(3000, seed=42, root=str(tmp_path / "in"),
                           num_files=8)
    out_a = str(tmp_path / "run_uninterrupted")
    out_b = str(tmp_path / "run_resumed")
    common = ["--input", inp, "--partitions", "4", "--num-cpus", "4"]

    # uninterrupted reference run
    _run_driver(common + ["--output", out_a])

    # interrupted run: crash injected after 2 committed partitions
    _run_driver(common + ["--output", out_b, "--fail-after", "2"],
                expect_fail=True)
    manifests = os.listdir(os.path.join(out_b, "manifests"))
    assert len([m for m in manifests if m.endswith(".json")]) == 2
    mtimes_before = {
        m: os.path.getmtime(os.path.join(out_b, "manifests", m))
        for m in manifests}

    # resume
    _run_driver(common + ["--output", out_b])
    # committed partitions were NOT recomputed (manifests untouched)
    for m, t0 in mtimes_before.items():
        assert os.path.getmtime(os.path.join(out_b, "manifests", m)) == t0

    # final outputs identical
    ta = pads.dataset(os.path.join(out_a, "final")).to_table()
    tb = pads.dataset(os.path.join(out_b, "final")).to_table()
    ta = ta.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    tb = tb.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert ta.schema.names == tb.schema.names
    for col in ("conv_id", "turn_idx", "text", "keep", "action", "dup_of",
                "overall_quality_score"):
        assert ta[col].to_pylist() == tb[col].to_pylist(), col
