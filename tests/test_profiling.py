"""Profiling / constraint-suite operators on an adversarial synthetic
table: exercises every path the clean fixture never hits — NULLs in
every profiled column, duplicate primary keys, non-contiguous turn_idx,
timestamp inversions, out-of-range timestamps, unknown roles,
inconsistent tool/role pairs — checked against the SAME generated
DuckDB twins the driver gate uses (pointed at the synthetic parquet)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray


def _dirty_table() -> pa.Table:
    rows = []
    # clean conversation
    for i in range(4):
        rows.append(("c0", i, "user" if i % 2 == 0 else "assistant",
                     f"text {i}", "", 1_700_000_000_000_000 + i * 1000))
    # duplicate pk + ts inversion + tool/role inconsistency
    rows.append(("c1", 0, "user", "hello", "exec",
                 1_700_000_100_000_000))
    rows.append(("c1", 0, "assistant", "dup pk", "",
                 1_700_000_099_000_000))
    rows.append(("c1", 1, "tool", "result", "",
                 1_700_000_050_000_000))  # inversion + tool-role bad
    # non-contiguous conv (starts at 2) + unknown role + empty text
    rows.append(("c2", 2, "narrator", "", "", 1_400_000_000_000_000))
    # negative turn_idx + out-of-range ts (both bounds)
    rows.append(("c3", -1, "user", "neg", "", 1_999_999_999_000_000))
    t = pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows], pa.string()),
        "text": pa.array([r[3] for r in rows], pa.string()),
        "tool": pa.array([r[4] for r in rows], pa.string()),
        "ts": pa.array([r[5] for r in rows],
                       pa.timestamp("us")),
    })
    # a NULL in every column (one extra row per column, others filled)
    base = ("cN", 99, "user", "nulls", "", 1_700_000_000_000_000)
    null_rows = []
    for j in range(6):
        vals = list(base)
        vals[0] = f"cN{j}"
        vals[j] = None
        null_rows.append(vals)
    t2 = pa.table({
        "conv_id": pa.array([r[0] for r in null_rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in null_rows], pa.int32()),
        "role": pa.array([r[2] for r in null_rows], pa.string()),
        "text": pa.array([r[3] for r in null_rows], pa.string()),
        "tool": pa.array([r[4] for r in null_rows], pa.string()),
        "ts": pa.array([r[5] for r in null_rows], pa.timestamp("us")),
    })
    return pa.concat_tables([t, t2])


@pytest.fixture(scope="module")
def dirty_parquet(tmp_path_factory):
    d = tmp_path_factory.mktemp("dirty_transcripts")
    path = str(d / "part-0.parquet")
    pq.write_table(_dirty_table(), path)
    return path


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="mergesort") \
             .reset_index(drop=True)


def _assert_frames_equal(got: pd.DataFrame, want: pd.DataFrame):
    g, w = _canon(got), _canon(want)
    assert list(g.columns) == list(w.columns)
    assert len(g) == len(w)
    for col in g.columns:
        gv, wv = g[col].to_numpy(), w[col].to_numpy()
        assert (pd.isna(gv) == pd.isna(wv)).all(), col
        m = ~pd.isna(gv)
        assert (gv[m] == wv[m]).all(), (col, gv[m], wv[m])


def test_column_profile_dirty_vs_duckdb(dirty_parquet):
    from __ray_entry__ import _profile_oracle_sql
    from dataquality_ray.pipelines.profiling import column_profile
    ds = ray.data.read_parquet(dirty_parquet)
    got = column_profile(ds, num_buckets=4).to_pandas()
    want = duckdb.connect().execute(
        _profile_oracle_sql(dirty_parquet)).df()
    _assert_frames_equal(got, want)
    # spot assertions: the NULL rows are really counted
    by = got.set_index("col_name")
    assert (by["n_null"] == 1).all()
    assert int(by.loc["conv_id", "n_rows"]) == 15


def test_constraint_checks_dirty_vs_duckdb(dirty_parquet):
    from __ray_entry__ import _constraint_oracle_sql
    from dataquality_ray.pipelines.profiling import constraint_checks
    ds = ray.data.read_parquet(dirty_parquet)
    got = constraint_checks(ds, num_buckets=4).to_pandas()
    want = duckdb.connect().execute(
        _constraint_oracle_sql(dirty_parquet)).df()
    # DuckDB NULL semantics vs the Ray side's explicit null handling
    # differ on NULL inputs for row-local checks (CASE WHEN NULL → no
    # violation on both sides) — compare after aligning dtypes
    want = want.astype({"n_evaluated": "int64",
                        "n_violations": "int64", "passed": "int64"})
    _assert_frames_equal(got, want)
    by = got.set_index("check_name")
    # every injected defect is detected
    assert int(by.loc["pk_unique", "n_violations"]) >= 1
    assert int(by.loc["ts_monotone_per_conv", "n_violations"]) >= 1
    assert int(by.loc["turn_idx_contiguous", "n_violations"]) >= 1
    assert int(by.loc["turn_idx_nonneg", "n_violations"]) >= 1
    assert int(by.loc["ts_in_range", "n_violations"]) >= 2
    assert int(by.loc["role_in_set", "n_violations"]) >= 1
    assert int(by.loc["text_not_empty", "n_violations"]) >= 1
    assert int(by.loc["tool_role_consistent", "n_violations"]) >= 1
    assert (by["passed"] == 0).any() and not by["passed"].all()


def test_column_profile_partition_invariance(dirty_parquet):
    """Same answer regardless of block layout / bucket width."""
    from dataquality_ray.pipelines.profiling import column_profile
    t = pq.read_table(dirty_parquet)
    a = column_profile(
        ray.data.from_arrow(t), num_buckets=2).to_pandas()
    b = column_profile(
        ray.data.from_arrow(t).repartition(7), num_buckets=9) \
        .to_pandas()
    _assert_frames_equal(a, b)


def test_corpus_snapshot_diff_statuses():
    """Every status appears; the v2-synthesis rules are reflected
    exactly (added ids are offset; removed ids are the %17 class)."""
    from dataquality_ray.pipelines.documents import (
        DIFF_ADDED_OFFSET,
        corpus_snapshot_diff,
    )
    got = corpus_snapshot_diff("/root/testdata/sf0.001",
                               num_buckets=4).to_pandas()
    by = got.groupby("status")["doc_id"].apply(list).to_dict()
    assert set(by) == {"added", "removed", "changed", "unchanged"}
    assert all(i >= DIFF_ADDED_OFFSET for i in by["added"])
    assert all(i % 17 == 0 for i in by["removed"])
    assert all(i % 10 == 3 and i % 17 != 0 for i in by["changed"])
    # a doc in both the removed and changed classes is removed
    assert all(i % 17 != 0 for i in by["changed"])
    # partition-invariant
    again = corpus_snapshot_diff("/root/testdata/sf0.001",
                                 num_buckets=9).to_pandas()
    key = ["doc_id", "status"]
    assert got.sort_values(key).reset_index(drop=True).equals(
        again.sort_values(key).reset_index(drop=True))


def test_event_value_drift_detects_injected_shift(tmp_path):
    """Synthetic events where the second half's values are shifted by
    +50: KS must be near-maximal there, and ~0 for an unshifted type.
    Cross-checked against scipy-free brute force (numpy step CDFs)."""
    import pyarrow.parquet as pq
    from dataquality_ray.pipelines.metrics import event_value_drift

    n = 4000
    rng_vals = (np.arange(n) * 37 % 100).astype(np.float64) / 2.0
    day_us = 86_400_000_000
    ts = (20_000 * day_us + (np.arange(n) % 20) * day_us
          + np.arange(n))            # 20 days, split at day 10
    second = (ts // day_us - 20_000) >= 10
    shifted = rng_vals + np.where(second, 50.0, 0.0)
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(np.arange(n) % 7, pa.int64()),
        "event_type": pa.array(
            np.where(np.arange(n) % 2 == 0, "drifty", "stable")),
        "value": pa.array(
            np.where(np.frombuffer(
                np.array(np.arange(n) % 2 == 0).tobytes(),
                dtype=np.bool_), shifted, rng_vals), pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))
    got = event_value_drift(str(d)).to_pandas() \
        .set_index("event_type")
    # the shifted type is near-maximal, the unshifted one far below it
    # (not zero: the value pattern's period overlaps the day period)
    assert int(got.loc["drifty", "d_milli"]) >= 900
    assert int(got.loc["stable", "d_milli"]) <= 300

    vals_all = np.where(np.arange(n) % 2 == 0, shifted, rng_vals)

    def brute(mask):
        vals = np.floor(vals_all[mask] * 10).clip(0, 8191) \
            .astype(np.int64)
        sec = second[mask]
        a, b = np.sort(vals[~sec]), np.sort(vals[sec])
        bins = np.unique(vals)
        ca = np.searchsorted(a, bins, side="right") * 1000 // len(a)
        cb = np.searchsorted(b, bins, side="right") * 1000 // len(b)
        return int(np.abs(ca - cb).max())

    even = np.arange(n) % 2 == 0
    assert int(got.loc["drifty", "d_milli"]) == brute(even)
    assert int(got.loc["stable", "d_milli"]) == brute(~even)


def test_column_profile_hll_estimate_within_bound(ray_session):
    """The HLL profile's register estimates must track the exact
    per-column distinct counts from the digest-exact profile (the
    documented 100-TB default vs the exact path — same fixture, two
    operators)."""
    from dataquality_ray.fixtures import transcripts_path
    from dataquality_ray.pipelines.metrics import (
        HLL_REGISTERS,
        hll_estimate,
    )
    from dataquality_ray.pipelines.profiling import (
        column_profile,
        column_profile_hll,
    )
    import ray

    path = transcripts_path(20_000, seed=42)
    ds = ray.data.read_parquet(path)
    exact = column_profile(ds).to_pandas().set_index("col_name")
    regs = column_profile_hll(ray.data.read_parquet(path)).to_pandas()
    assert len(regs) > 0
    for col, part in regs.groupby("col_name"):
        r = dict(zip(part["reg"], part["rho"]))
        est = hll_estimate(r, HLL_REGISTERS)
        truth = exact.loc[col, "n_distinct"]
        # 1.04/sqrt(64) ~ 13% standard error; allow 3 sigma
        assert abs(est - truth) <= 0.40 * truth, (col, est, truth)
