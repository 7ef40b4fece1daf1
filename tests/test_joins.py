"""asof_join_backward: the custom temporal join operator (composition
of map_batches + bucketed groupby().map_groups; see stages/joins.py for
the documented partitioning assumption). The sf-fixture surface is
SQL-checked against DuckDB's native ASOF LEFT JOIN in
test_queries_vs_duckdb; here: edge semantics on a hand-built table."""

import numpy as np
import pyarrow as pa
import ray

from dataquality_ray.stages.joins import asof_join_backward


def _tables():
    left = pa.table({
        "user_id": pa.array([1, 1, 2, 3, 7], pa.int64()),
        "ts": pa.array([10, 25, 5, 100, 50], pa.int64()),
        "event_id": pa.array([100, 101, 102, 103, 104], pa.int64()),
    })
    right = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "ts": pa.array([10, 10, 20, 6, 4, 100], pa.int64()),
        "event_id": pa.array([5, 9, 7, 11, 12, 13], pa.int64()),
    })
    return left, right


class TestAsofJoinBackward:
    def test_semantics(self, ray_session):
        left, right = _tables()
        out = asof_join_backward(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            by="user_id", on="ts",
            left_cols=["event_id"], right_cols=["event_id", "ts"],
            tiebreak_col="event_id", num_buckets=4,
        ).to_pandas().set_index("event_id").sort_index()
        # exact match at equal ts; tie at (1, 10) resolves to MAX id 9
        assert out.loc[100, "event_id_r"] == 9
        assert out.loc[100, "ts_r"] == 10
        # backward: latest at-or-before 25 is ts=20
        assert out.loc[101, "event_id_r"] == 7
        # strictly-before only rows: user 2 at ts=5 -> right ts=4
        assert out.loc[102, "event_id_r"] == 12
        # exact boundary for user 3
        assert out.loc[103, "event_id_r"] == 13
        # user 7 has no right rows at all: nulls survive as NA
        assert out.loc[104, ["event_id_r", "ts_r"]].isna().all()
        assert len(out) == left.num_rows  # LEFT join: every left row once

    def test_bucket_invariance(self, ray_session):
        left, right = _tables()

        def run(nb):
            return asof_join_backward(
                ray.data.from_arrow(left), ray.data.from_arrow(right),
                by="user_id", on="ts",
                left_cols=["event_id"], right_cols=["event_id"],
                tiebreak_col="event_id", num_buckets=nb,
            ).to_pandas().sort_values("event_id").reset_index(drop=True)

        a, b = run(1), run(16)
        assert a.equals(b)

    def test_no_precision_loss_on_large_ids(self, ray_session):
        # ids past 2^53 — a float64 round-trip would corrupt them
        big = (1 << 60) + 1
        left = pa.table({
            "user_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([10, 10], pa.int64()),
            "event_id": pa.array([1, 2], pa.int64()),
        })
        right = pa.table({
            "user_id": pa.array([1], pa.int64()),
            "ts": pa.array([5], pa.int64()),
            "event_id": pa.array([big], pa.int64()),
        })
        ds = asof_join_backward(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            by="user_id", on="ts",
            left_cols=["event_id"], right_cols=["event_id"],
            num_buckets=2,
        )
        # read back as ARROW: a pandas readout would itself convert the
        # nullable int64 column to lossy float64
        tab = pa.concat_tables(
            ds.iter_batches(batch_size=None, batch_format="pyarrow"))
        got = dict(zip(tab["event_id"].to_pylist(),
                       tab["event_id_r"].to_pylist()))
        assert got[1] == big          # bit-exact past 2^53
        assert got[2] is None


class TestApproxPercentileSketch:
    def test_error_bounded_by_bin_width(self, ray_session):
        from dataquality_ray.pipelines.metrics import (
            SKETCH_BINS,
            approx_event_percentiles,
            event_value_percentiles,
        )
        sf = "/root/testdata/sf0.001"
        exact = event_value_percentiles(sf).to_pandas() \
            .set_index("event_type")
        approx = approx_event_percentiles(sf).to_pandas() \
            .set_index("event_type")
        assert set(exact.index) == set(approx.index)
        # estimate = upper edge of the chosen bin: never below the true
        # discrete quantile, and within one bin width of it
        import duckdb
        rng = duckdb.connect().execute(f"""
            SELECT event_type,
              max(CAST(floor(value*1000) AS BIGINT))
              - min(CAST(floor(value*1000) AS BIGINT)) + 1
            FROM '{sf}/events.parquet' GROUP BY 1""").fetchall()
        for t, span in rng:
            width = span // SKETCH_BINS + 1
            for p in (50, 90, 99):
                e = int(exact.loc[t, f"p{p}_milli"])
                a = int(approx.loc[t, f"p{p}_est"])
                assert a >= e
                assert abs(a - e) <= width, (t, p, a, e, width)


class TestPercentileRefine:
    def test_refine_matches_exact(self, ray_session):
        """The iterative histogram-refine path (no single-reducer-per-
        type) must reproduce the exact discrete quantiles bit-for-bit."""
        from dataquality_ray.pipelines.metrics import (
            event_value_percentiles,
            event_value_percentiles_refine,
        )
        sf = "/root/testdata/sf0.001"
        exact = event_value_percentiles(sf).to_pandas() \
            .sort_values("event_type").reset_index(drop=True)
        ref = event_value_percentiles_refine(sf).to_pandas() \
            .sort_values("event_type").reset_index(drop=True)
        assert exact[ref.columns].equals(ref)
