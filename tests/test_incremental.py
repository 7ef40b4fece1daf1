"""Incremental recompute-after-edit: the composed (final + patch)
state must be BIT-IDENTICAL to a full re-run over the edited corpus —
including dup_of reassignments for hash groups the edit created or
broke — while only the affected conv buckets are rewritten."""

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from dataquality_ray.fixtures import transcripts_path

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_driver(args):
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "run.py"), *args],
        env=env, capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(["conv_id", "turn_idx"],
                          kind="mergesort").reset_index(drop=True)


@pytest.mark.slow
def test_incremental_update_equals_full_rerun(tmp_path, ray_session):
    from dataquality_ray.pipelines.incremental import (
        incremental_update,
        patch_manifests,
        read_current,
    )

    inp = transcripts_path(3000, seed=42, root=str(tmp_path / "in"),
                           num_files=8)
    base_out = str(tmp_path / "base")
    _run_driver(["--input", inp, "--output", base_out,
                 "--partitions", "4", "--num-cpus", "4"])

    src = pads.dataset(inp).to_table().to_pandas()
    convs = sorted(src["conv_id"].unique())
    e_rewrite, e_dupmaker, donor = convs[3], convs[10], convs[25]

    # edit 1: rewrite every turn of one conversation (breaks any dup
    # group its old hashes were in)
    ed1 = src[src["conv_id"] == e_rewrite].copy()
    ed1["text"] = ed1["text"] + " EDITED"
    # edit 2: make another conversation's first turn an exact copy of
    # an UNEDITED donor conversation's turn (creates a NEW dup group
    # spanning an untouched bucket — the collateral-rewrite case)
    ed2 = src[src["conv_id"] == e_dupmaker].copy()
    donor_text = src[src["conv_id"] == donor].iloc[0]["text"]
    ed2.loc[ed2.index[0], "text"] = donor_text
    # edit 3: a brand-new conversation
    ed3 = src[src["conv_id"] == donor].iloc[:2].copy()
    ed3["conv_id"] = "zzz_brand_new_conv"
    edits = pd.concat([ed1, ed2, ed3], ignore_index=True)

    edits_path = str(tmp_path / "edits.parquet")
    pq.write_table(
        pa.Table.from_pandas(edits, preserve_index=False).cast(
            pads.dataset(inp).schema), edits_path)

    payload = incremental_update(base_out, edits_path)
    assert payload["status"] == "committed"
    assert payload["edited_convs"] == 3

    # full re-run over the edited corpus
    edited = pd.concat(
        [src[~src["conv_id"].isin({e_rewrite, e_dupmaker})], edits],
        ignore_index=True)
    in2 = tmp_path / "in2"
    in2.mkdir()
    chunks = np.array_split(np.arange(len(edited)), 8)
    for i, idx in enumerate(chunks):
        pq.write_table(
            pa.Table.from_pandas(edited.iloc[idx],
                                 preserve_index=False).cast(
                pads.dataset(inp).schema),
            str(in2 / f"part-{i:03d}.parquet"))
    full_out = str(tmp_path / "full")
    _run_driver(["--input", str(in2), "--output", full_out,
                 "--partitions", "4", "--num-cpus", "4"])

    got = _canon(read_current(base_out).to_pandas())
    want = _canon(
        pads.dataset(os.path.join(full_out, "final")).to_table()
        .to_pandas())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for col in got.columns:
        gv, wv = got[col].to_numpy(), want[col].to_numpy()
        same_null = pd.isna(gv) == pd.isna(wv)
        assert same_null.all(), col
        m = ~pd.isna(gv)
        assert (gv[m] == wv[m]).all(), (
            col, got.loc[~(np.where(m, gv == wv, True)),
                         ["conv_id", "turn_idx"]].head())

    # only a subset of buckets was rewritten, and the base final/
    # directory is untouched (the patch is a separate layer)
    rm = json.load(open(os.path.join(base_out, "run_manifest.json")))
    patches = patch_manifests(base_out)
    assert len(patches) == 1
    assert 0 < len(patches[0]["buckets"]) < int(rm["sort_buckets"])
    # the dup-group coupling really crossed conversations: the donor
    # conversation (never edited) must be inside the patched buckets
    from dataquality_ray.pipelines.quality import conv_bucket_of
    donor_bucket = conv_bucket_of(
        pa.array([donor]), int(rm["sort_buckets"]))[0].as_py()
    assert donor_bucket in set(patches[0]["buckets"])
