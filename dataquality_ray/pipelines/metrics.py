"""Event-table metric pipelines (dashboard analogs, reference
routes.py:441-574) — daily trends, top-k, timeliness flags.

Float determinism: averages/sums are rounded to 3 decimals AFTER
aggregation on both the Ray and the SQL side; day keys are emitted as
'YYYY-MM-DD' strings on both sides.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from dataquality_ray.config import DEFAULT_CONFIG, PipelineConfig


def _events(sf_dir: str, columns=None):
    return ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                                 columns=columns)


def daily_event_metrics(sf_dir: str):
    """day, event_type → n_events, avg_value_milli (A2 analog: per-day
    counts + means, reference routes.py:499-505). Two-phase aggregation:
    per-batch partials (sum/count) → small groupby — no full-row shuffle.

    Float determinism: values are fixed-pointed as floor(value*1000)
    BEFORE summation, so sums/averages are exact integer math and the SQL
    oracle matches bit-for-bit regardless of accumulation order.
    """
    from ray.data.aggregate import Sum
    ds = _events(sf_dir, columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["day"] = df["ts"].dt.strftime("%Y-%m-%d")
        df["v"] = np.floor(df["value"].to_numpy() * 1000).astype(np.int64)
        g = (df.groupby(["day", "event_type"], sort=False)
             .agg(n=("v", "size"), s=("v", "sum"))
             .reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby(["day", "event_type"]).aggregate(
        Sum("n", alias_name="n_events"), Sum("s", alias_name="sum_milli"))

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["n_events"].to_numpy(zero_copy_only=False)
        s = batch["sum_milli"].to_numpy(zero_copy_only=False)
        return pa.table({
            "day": batch["day"],
            "event_type": batch["event_type"],
            "n_events": pa.array(n.astype(np.int64)),
            "avg_value_milli": pa.array(s // n, pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def top_users_by_value(sf_dir: str, k: int = 20):
    """O3/O4 analog: groupby user → sum(value), sort desc, limit k
    (deterministic tie-break on user_id). Fixed-point integer sums so the
    ranking and values are exact (see daily_event_metrics)."""
    from ray.data.aggregate import Count, Sum
    ds = _events(sf_dir, columns=["user_id", "value"])

    def fixed_point(batch: pa.Table) -> pa.Table:
        v = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                     * 1000).astype(np.int64)
        return pa.table({"user_id": batch["user_id"],
                         "v": pa.array(v)})

    agg = ds.map_batches(fixed_point, batch_format="pyarrow") \
            .groupby("user_id").aggregate(
                Sum("v", alias_name="total_value_milli"),
                Count(alias_name="n_events"))
    top = agg.sort(["total_value_milli", "user_id"],
                   descending=[True, False]).limit(k)
    df = top.to_pandas()
    df["total_value_milli"] = df["total_value_milli"].astype("int64")
    df["n_events"] = df["n_events"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


def timeliness_events(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    """Per-event timeliness vs the table's max ts (the reference's
    upload-age rule, metadata.py:398-407, applied to the events stream):
    age_days (integer), timeliness_score 100/60."""
    ds = _events(sf_dir, columns=["event_id", "ts"])
    max_ts = ds.max("ts")           # small driver-side scalar
    max_us = np.int64(pd.Timestamp(max_ts).value // 1000)

    def score(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ts_us = pc.cast(batch["ts"], pa.int64()).to_numpy(
            zero_copy_only=False)
        age = (max_us - ts_us) // 86_400_000_000
        sc = np.where(age > cfg.timeliness_max_age_days,
                      cfg.timeliness_cap, 100).astype(np.int32)
        return pa.table({
            "event_id": batch["event_id"],
            "age_days": pa.array(age.astype(np.int64)),
            "timeliness_score": pa.array(sc),
        })

    return ds.map_batches(score, batch_format="pyarrow")
