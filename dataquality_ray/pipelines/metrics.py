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

from dataquality_ray.stages.bucketing import cluster_buckets

from dataquality_ray.config import DEFAULT_CONFIG, PipelineConfig
from dataquality_ray.arrowutil import from_pandas_clean


def _events(sf_dir: str, columns=None):
    from dataquality_ray.arrowutil import strip_meta
    return ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                                 columns=columns) \
        .map_batches(strip_meta, batch_format="pyarrow",
                     zero_copy_batch=True)


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
        return from_pandas_clean(g)

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


def daily_event_type_dense(sf_dir: str):
    """(day, event_type, n_events): the gap-filled calendar-spine
    variant of the daily trend — EVERY (day in [min_day, max_day],
    event_type) cell is present, zero-filled where no events occurred
    (dashboards and drift monitors need the dense grid; a sparse
    groupby silently hides outage days). The aggregate side is the
    same two-phase partial → small groupby; the spine is generated
    from the (bounded, output-sized) day range × type domain and
    merged with one vectorized outer join on the driver-side result —
    spine size is calendar-days × |types|, never corpus-proportional.
    """
    import polars as _pl
    from datetime import date, timedelta
    from ray.data.aggregate import Sum

    ds = _events(sf_dir, columns=["ts", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["day"] = df["ts"].dt.strftime("%Y-%m-%d")
        g = (df.groupby(["day", "event_type"], sort=False)
             .size().rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return from_pandas_clean(g)

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["day", "event_type"])
           .aggregate(Sum("n", alias_name="n_events"))
           .to_pandas())        # days × types rows — output-sized
    if len(agg) == 0:           # empty events -> empty grid (SQL twin)
        return pa.table({"day": pa.array([], pa.string()),
                         "event_type": pa.array([], pa.string()),
                         "n_events": pa.array([], pa.int64())})
    days = sorted(agg["day"])
    d0 = date.fromisoformat(days[0])
    d1 = date.fromisoformat(days[-1])
    spine_days = [(d0 + timedelta(days=i)).isoformat()
                  for i in range((d1 - d0).days + 1)]
    types = sorted(set(agg["event_type"]))
    spine = _pl.DataFrame({
        "day": [d for d in spine_days for _ in types],
        "event_type": types * len(spine_days),
    })
    got = _pl.from_pandas(agg).with_columns(
        _pl.col("n_events").cast(_pl.Int64))
    dense = (spine.join(got, on=["day", "event_type"], how="left")
             .with_columns(_pl.col("n_events").fill_null(0)))
    return dense.to_arrow().cast(pa.schema([
        ("day", pa.string()), ("event_type", pa.string()),
        ("n_events", pa.int64())]))


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
    return from_pandas_clean(df)


def latest_event_per_user(sf_dir: str, num_buckets: int = 0):
    """J3 analog (argmax join, reference routes.py:43-82): for each user,
    the event_type/value of their latest event (max ts; ties broken by
    max event_id). Two-phase: per-batch argmax partials → bucketed
    groupby argmax over the (small) per-batch winners — no full-row
    shuffle and no single-task ``repartition(1)`` reduce (the partials
    grow with users × map tasks; a hashed-bucket reduce keeps every
    stage parallel)."""
    num_buckets = num_buckets or cluster_buckets(minimum=16)
    ds = _events(sf_dir, columns=["event_id", "ts", "user_id",
                                  "event_type", "value"])

    def partial_argmax(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        top = df.groupby("user_id", sort=False).tail(1).copy()
        top["bucket"] = (top["user_id"].to_numpy() % num_buckets) \
            .astype(np.int32)
        return from_pandas_clean(top)

    def bucket_argmax(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        return df.groupby("user_id", sort=False).tail(1)

    final = (ds.map_batches(partial_argmax, batch_format="pyarrow")
             .groupby("bucket")
             .map_groups(bucket_argmax, batch_format="pandas"))

    def project(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        v = np.floor(df["value"].to_numpy() * 1000).astype(np.int64)
        return pa.table({
            "user_id": pa.array(df["user_id"].to_numpy()),
            "last_event_id": pa.array(df["event_id"].to_numpy()),
            "last_event_type": pa.array(df["event_type"], pa.string()),
            "last_value_milli": pa.array(v),
        })

    return final.map_batches(project, batch_format="pyarrow")


def event_windows(sf_dir: str):
    """Tumbling 1-hour windows per (user bucket): window start epoch-hour,
    event_type → count + fixed-point value sum (streaming-shaped analog;
    the reference has no windows — SURVEY §2.9 — so this is the
    training-pipeline extension expressed as groupby over ints)."""
    from ray.data.aggregate import Sum
    ds = _events(sf_dir, columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ts_us = pc.cast(batch["ts"], pa.int64()).to_numpy(
            zero_copy_only=False)
        hour = ts_us // 3_600_000_000
        v = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                     * 1000).astype(np.int64)
        df = pd.DataFrame({
            "window_hour": hour,
            "event_type": batch["event_type"].to_pylist(),
            "n": 1,
            "v": v,
        })
        g = (df.groupby(["window_hour", "event_type"], sort=False)
             .agg(n=("n", "sum"), v=("v", "sum")).reset_index())
        return from_pandas_clean(g)

    agg = ds.map_batches(partial, batch_format="pyarrow") \
            .groupby(["window_hour", "event_type"]).aggregate(
                Sum("n", alias_name="n_events"),
                Sum("v", alias_name="sum_value_milli"))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "window_hour": pa.array(
                batch["window_hour"].to_numpy(zero_copy_only=False)
                .astype(np.int64)),
            "event_type": batch["event_type"],
            "n_events": pa.array(
                batch["n_events"].to_numpy(zero_copy_only=False)
                .astype(np.int64)),
            "sum_value_milli": pa.array(
                batch["sum_value_milli"].to_numpy(zero_copy_only=False)
                .astype(np.int64)),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


SLIDE_HOP_US = 15 * 60 * 1_000_000        # 15-minute hop
SLIDE_WINDOWS_PER_EVENT = 4               # 1-hour window / 15-min hop


def sliding_event_windows(sf_dir: str):
    """SLIDING 1-hour windows hopping every 15 minutes (each event lands
    in exactly 4 overlapping windows — the tumbling variant above covers
    hop == size). Expansion happens INSIDE the per-batch partial
    aggregate: the batch is pre-reduced to (window, event_type) partials
    BEFORE the shuffle, so the exchange carries one row per distinct
    (window, type) per batch, not 4× the event stream. Fixed-point milli
    sums keep the aggregate bit-deterministic (CLAUDE.md invariant).
    Output: window_start_q (epoch // 15 min), event_type, n_events,
    sum_value_milli."""
    from ray.data.aggregate import Sum
    ds = _events(sf_dir, columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ts_us = pc.cast(batch["ts"], pa.int64()).to_numpy(
            zero_copy_only=False)
        tq = ts_us // SLIDE_HOP_US
        v = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                     * 1000).astype(np.int64)
        k = np.arange(SLIDE_WINDOWS_PER_EVENT, dtype=np.int64)
        df = pd.DataFrame({
            "window_start_q": (tq[:, None] - k[None, :]).reshape(-1),
            "event_type": np.repeat(
                np.asarray(batch["event_type"].to_pylist(), dtype=object),
                SLIDE_WINDOWS_PER_EVENT),
            "n": 1,
            "v": np.repeat(v, SLIDE_WINDOWS_PER_EVENT),
        })
        g = (df.groupby(["window_start_q", "event_type"], sort=False)
             .agg(n=("n", "sum"), v=("v", "sum")).reset_index())
        return from_pandas_clean(g)

    agg = ds.map_batches(partial, batch_format="pyarrow") \
            .groupby(["window_start_q", "event_type"]).aggregate(
                Sum("n", alias_name="n_events"),
                Sum("v", alias_name="sum_value_milli"))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "window_start_q": pa.array(
                batch["window_start_q"].to_numpy(zero_copy_only=False)
                .astype(np.int64)),
            "event_type": batch["event_type"],
            "n_events": pa.array(
                batch["n_events"].to_numpy(zero_copy_only=False)
                .astype(np.int64)),
            "sum_value_milli": pa.array(
                batch["sum_value_milli"].to_numpy(zero_copy_only=False)
                .astype(np.int64)),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


SESSION_GAP_US = 30 * 60 * 1_000_000   # 30-minute inactivity gap


def user_sessions(sf_dir: str, num_buckets: int = 0):
    """Session windows per user (gap > 30 min starts a new session) —
    the streaming-shaped operator the reference lacks (SURVEY §2.9),
    expressed as the guide's pattern: partition by key, sort by ts within
    partition, vectorized sessionization per group.

    Shuffle shape: users are hashed into ``num_buckets`` reducer groups
    (bounded group count — no per-user task overhead); inside each bucket
    one pandas pass sessionizes every user at once.
    Output: user_id, session_no (1-based per user), session_start_us,
    n_events, sum_value_milli.
    """
    num_buckets = num_buckets or cluster_buckets(minimum=16)
    from ray.data.aggregate import Sum  # noqa: F401 (doc: mergeable aggs)
    ds = _events(sf_dir, columns=["event_id", "ts", "user_id", "value"])

    def bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        b = (u % num_buckets).astype(np.int32)
        ts_us = pc.cast(batch["ts"], pa.int64())
        v = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                     * 1000).astype(np.int64)
        return pa.table({
            "bucket": pa.array(b),
            "user_id": batch["user_id"],
            "event_id": batch["event_id"],
            "ts_us": ts_us,
            "v": pa.array(v),
        })

    def sessionize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts_us", "event_id"],
                            kind="mergesort")
        new_user = df["user_id"].ne(df["user_id"].shift())
        gap = df["ts_us"].diff() > SESSION_GAP_US
        new_session = (new_user | gap)
        df["session_no"] = new_session.groupby(
            df["user_id"]).cumsum().astype(np.int64)
        g = (df.groupby(["user_id", "session_no"], sort=False)
             .agg(session_start_us=("ts_us", "min"),
                  n_events=("ts_us", "size"),
                  sum_value_milli=("v", "sum"))
             .reset_index())
        g["n_events"] = g["n_events"].astype(np.int64)
        return g

    return (ds.map_batches(bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(sessionize, batch_format="pandas")
            .map_batches(lambda t: t.drop_columns(["bucket"])
                         if "bucket" in t.column_names else t,
                         batch_format="pyarrow"))


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


RANGE_JOIN_WINDOW_US = 5 * 60 * 1_000_000   # 5-minute lookback window


def events_near_errors(sf_dir: str, num_buckets: int = 0):
    """Windowed range join: for every ERROR event, the count and
    value-sum of the SAME USER's non-error events with
    ts in (error_ts - 5 min, error_ts] — the interval-join operator Ray
    Data lacks (an as-of join returns one row; this aggregates a range).

    Shuffle shape: ONE hash shuffle on user-bucket (same bounded-group
    topology as user_sessions); inside each bucket, exact window bounds
    come from two ``pd.merge_asof`` lookups against per-user cumulative
    count/sum arrays — count(ts <= t) - count(ts <= t - W) — all
    vectorized, ties on ts included regardless of event order. Skew
    knob: a single pathological user stays in one bucket; salt the
    bucket key by time-range if a user exceeds a reducer's heap.
    Output: error_event_id, user_id, n_prior_events, sum_value_milli.
    """
    num_buckets = num_buckets or cluster_buckets(minimum=16)
    ds = _events(sf_dir,
                 columns=["event_id", "ts", "user_id", "event_type",
                          "value"])

    def bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        v = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                     * 1000).astype(np.int64)
        return pa.table({
            "bucket": pa.array((u % num_buckets).astype(np.int32)),
            "event_id": batch["event_id"],
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "is_err": pc.equal(batch["event_type"], "error"),
            "v": pa.array(v),
        })

    def window_agg(df: pd.DataFrame) -> pd.DataFrame:
        err = df[df["is_err"]][["event_id", "user_id", "ts_us"]] \
            .reset_index(drop=True)
        x = df[~df["is_err"]][["user_id", "ts_us", "v"]] \
            .sort_values(["user_id", "ts_us"], kind="mergesort")
        x["c"] = x.groupby("user_id").cumcount() + 1
        x["cv"] = x.groupby("user_id")["v"].cumsum()
        # merge_asof needs BOTH frames globally sorted by the on-key;
        # the stable re-sort keeps each user's rows ts-ascending, so
        # the backward match still lands on the max cumulative row
        right = x.rename(columns={"ts_us": "q"})[
            ["user_id", "q", "c", "cv"]] \
            .sort_values("q", kind="mergesort")

        def at_or_before(bound: pd.Series) -> pd.DataFrame:
            q = pd.DataFrame({"user_id": err["user_id"], "q": bound,
                              "i": np.arange(len(err))})
            q = q.sort_values("q", kind="mergesort")
            m = pd.merge_asof(q, right, on="q", by="user_id",
                              direction="backward")
            m = m.sort_values("i", kind="mergesort")
            return m[["c", "cv"]].fillna(0).reset_index(drop=True)

        hi = at_or_before(err["ts_us"])
        lo = at_or_before(err["ts_us"] - RANGE_JOIN_WINDOW_US)
        return pd.DataFrame({
            "error_event_id": err["event_id"],
            "user_id": err["user_id"],
            "n_prior_events": (hi["c"] - lo["c"]).astype(np.int64),
            "sum_value_milli": (hi["cv"] - lo["cv"]).astype(np.int64),
        })

    return (ds.map_batches(bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(window_agg, batch_format="pandas"))


PCT_POINTS = (50, 90, 99)    # integer percents — exact index math


def event_value_percentiles(sf_dir: str):
    """Per event_type: exact p50/p90/p99 of the fixed-point value
    (value_milli) + count. Discrete quantile with DuckDB's
    quantile_disc rule — index ceil(p*n) - 1 of the ascending sort,
    computed with pure integer math so both engines pick the identical
    element (no interpolation, no float index).

    Shuffle shape: ONE groupby on event_type (small key domain; each
    group reduces with O(n) np.partition selection, not a full sort).
    At corpus scale a per-type group is a single reducer — if a type
    outgrows one worker's heap, swap in a two-pass fixed-point
    histogram refine; the query contract (exact discrete quantile)
    is unchanged.
    """
    ds = _events(sf_dir, columns=["event_type", "value"])

    def fixed(batch: pa.Table) -> pa.Table:
        vm = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                      * 1000).astype(np.int64)
        return pa.table({"event_type": batch["event_type"],
                         "vm": pa.array(vm)})

    def pcts(df: pd.DataFrame) -> pd.DataFrame:
        vm = df["vm"].to_numpy()
        n = len(vm)
        out = {"event_type": [df["event_type"].iloc[0]],
               "n_events": np.array([n], dtype=np.int64)}
        for p in PCT_POINTS:
            idx = (p * n + 99) // 100 - 1          # ceil(p*n/100) - 1
            out[f"p{p}_milli"] = np.array(
                [np.partition(vm, idx)[idx]], dtype=np.int64)
        return pd.DataFrame(out)

    return (ds.map_batches(fixed, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("event_type")
            .map_groups(pcts, batch_format="pandas"))


def user_running_totals(sf_dir: str, num_buckets: int = 0):
    """Window-function operator: per event, the user's RUNNING count and
    fixed-point value sum in (ts, event_id) order — SQL's
    SUM() OVER (PARTITION BY user ORDER BY ts, event_id ROWS UNBOUNDED
    PRECEDING), expressed as the bucketed per-user ordered scan (the
    user_sessions shape): one hash shuffle on user-bucket, vectorized
    pandas cumulatives inside each bucket. Output: event_id, user_id,
    cum_n, cum_value_milli."""
    num_buckets = num_buckets or cluster_buckets(minimum=16)
    ds = _events(sf_dir, columns=["event_id", "ts", "user_id", "value"])

    def bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        v = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                     * 1000).astype(np.int64)
        return pa.table({
            "bucket": pa.array((u % num_buckets).astype(np.int32)),
            "event_id": batch["event_id"],
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "v": pa.array(v),
        })

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts_us", "event_id"],
                            kind="mergesort")
        g = df.groupby("user_id", sort=False)
        return pd.DataFrame({
            "event_id": df["event_id"],
            "user_id": df["user_id"],
            "cum_n": (g.cumcount() + 1).astype(np.int64),
            "cum_value_milli": g["v"].cumsum().astype(np.int64),
        })

    return (ds.map_batches(bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(scan, batch_format="pandas"))


def distinct_users_by_event_type(sf_dir: str, num_buckets: int = 0):
    """(event_type, n_users, n_events): exact COUNT(DISTINCT user_id)
    via the bucketed-distinct shape — per-batch distinct
    (event_type, user_id) partials first (the combiner), then ONE
    shuffle on user_id % K: every user lands in one bucket, so the
    per-(type, user) dedup and the per-type distinct counts complete
    LOCALLY (vectorized), leaving a tiny per-bucket final Sum — never
    a #users-sized Ray aggregate (CLAUDE.md huge-group-count note)."""
    num_buckets = num_buckets or cluster_buckets(minimum=32)
    import pandas as pd
    from ray.data.aggregate import Sum

    from dataquality_ray.arrowutil import from_pandas_clean

    ds = _events(sf_dir, columns=["event_type", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        g = (pd.DataFrame({
            "event_type": batch["event_type"].to_pylist(),
            "user_id": batch["user_id"].to_numpy(zero_copy_only=False)})
            .groupby(["event_type", "user_id"], sort=False)
            .size().rename("n").reset_index())
        g["part"] = (g["user_id"].to_numpy()
                     % num_buckets).astype(np.int32)
        return from_pandas_clean(g)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["event_type", "user_id"], sort=False)
             .agg(n=("n", "sum")).reset_index()
             .groupby("event_type", sort=False)
             .agg(n_users=("user_id", "size"), n_events=("n", "sum"))
             .reset_index())
        return g

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("part").map_groups(per_bucket, batch_format="pandas") \
        .groupby("event_type").aggregate(
            Sum("n_users", alias_name="n_users"),
            Sum("n_events", alias_name="n_events"))

    return agg.map_batches(
        lambda t: pa.table({
            "event_type": t["event_type"],
            "n_users": pa.compute.cast(t["n_users"], pa.int64()),
            "n_events": pa.compute.cast(t["n_events"], pa.int64()),
        }), batch_format="pyarrow")


HIGH_VALUE_MIN = 95.0   # high-value purchase threshold (anti-join side)


def users_without_purchase(sf_dir: str):
    """(user_id, n_events): the ANTI-JOIN / EXCEPT shape — users with
    events but no HIGH-VALUE purchase (value >= HIGH_VALUE_MIN), with
    their total event count. The excluded-user side is a small
    aggregate (≤ #users), broadcast via ray.put into a vectorized isin
    filter — no shuffle of the event stream beyond the per-user count
    groupby."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from dataquality_ray.arrowutil import from_pandas_clean

    ds = _events(sf_dir, columns=["user_id", "event_type", "value"])

    def purchasers(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch["event_type"].to_pylist())
        v = batch["value"].to_numpy(zero_copy_only=False)
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({"user_id": pa.array(
            np.unique(u[(et == "purchase") & (v >= HIGH_VALUE_MIN)]),
            pa.int64())})

    buyers = ds.map_batches(purchasers, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas()
    buyers_ref = ray.put(np.unique(buyers["user_id"].to_numpy()))

    def partial_counts(batch: pa.Table) -> pa.Table:
        b = ray.get(buyers_ref)
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        keep = ~np.isin(u, b)
        g = (pd.DataFrame({"user_id": u[keep], "n": 1})
             .groupby("user_id", sort=False).agg(n=("n", "sum"))
             .reset_index())
        return from_pandas_clean(g)

    agg = ds.map_batches(partial_counts, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("user_id").aggregate(Sum("n", alias_name="n_events"))
    return agg.map_batches(
        lambda t: pa.table({
            "user_id": t["user_id"],
            "n_events": pa.compute.cast(t["n_events"], pa.int64()),
        }), batch_format="pyarrow")


def event_outliers(sf_dir: str):
    """(event_id, event_type, value_milli, p99_milli): the TWO-PASS
    broadcast-threshold filter — pass 1 computes each event type's
    exact discrete p99 (the event_value_percentiles machinery), pass 2
    broadcasts the tiny per-type threshold map and streams the corpus
    through a vectorized filter keeping strict exceeders. The
    "clip/drop outliers before training" shape."""
    thresholds = event_value_percentiles(sf_dir).to_pandas()
    thr_ref = ray.put(dict(zip(thresholds["event_type"],
                               thresholds["p99_milli"].astype(np.int64))))

    ds = _events(sf_dir, columns=["event_id", "event_type", "value"])

    def flag(batch: pa.Table) -> pa.Table:
        thr = ray.get(thr_ref)
        et = np.asarray(batch["event_type"].to_pylist())
        vm = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                      * 1000).astype(np.int64)
        p99 = np.fromiter((thr[t] for t in et), dtype=np.int64,
                          count=len(et))
        keep = vm > p99
        return pa.table({
            "event_id": pa.array(
                batch["event_id"].to_numpy(zero_copy_only=False)[keep],
                pa.int64()),
            "event_type": pa.array(et[keep].tolist(), pa.string()),
            "value_milli": pa.array(vm[keep]),
            "p99_milli": pa.array(p99[keep]),
        })

    return ds.map_batches(flag, batch_format="pyarrow",
                          zero_copy_batch=True)


SKETCH_BINS = 4096   # histogram-sketch width (equal-width integer bins)


def approx_event_percentiles(sf_dir: str):
    """(event_type, n_events, p50_est, p90_est, p99_est): APPROXIMATE
    per-type percentiles from a bounded-memory MERGEABLE sketch — the
    scale path for quantiles when exact per-group selection
    (event_value_percentiles) would need the whole group in one place.

    Sketch = equal-width integer histogram over [min, max]:
    pass 1 aggregates exact (min, max, n) per type (tiny); pass 2
    broadcasts those ranges and bin-counts each batch (partials are
    int vectors — merging = addition, so ANY reduce order is exact);
    the estimate for percentile p is the upper edge of the first bin
    whose cumulative count reaches ceil(n·p) (the quantile_disc index
    rule). All integer math → the sketch itself is SQL-checkable;
    the error bound (≤ one bin width) is pytest-asserted vs the exact
    operator."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from dataquality_ray.arrowutil import from_pandas_clean

    ds = _events(sf_dir, columns=["event_type", "value"])

    def stats_partial(batch: pa.Table) -> pa.Table:
        vm = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                      * 1000).astype(np.int64)
        g = (pd.DataFrame({"event_type":
                           batch["event_type"].to_pylist(), "vm": vm})
             .groupby("event_type", sort=False)["vm"]
             .agg(mn="min", mx="max", n="size").reset_index())
        return from_pandas_clean(g)

    from ray.data.aggregate import Max, Min
    stats = ds.map_batches(stats_partial, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Min("mn", alias_name="mn"), Max("mx", alias_name="mx"),
            Sum("n", alias_name="n")).to_pandas()
    ranges = {r["event_type"]: (int(r["mn"]), int(r["mx"]), int(r["n"]))
              for _, r in stats.iterrows()}
    ranges_ref = ray.put(ranges)

    def hist_partial(batch: pa.Table) -> pa.Table:
        rg = ray.get(ranges_ref)
        et = np.asarray(batch["event_type"].to_pylist())
        vm = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                      * 1000).astype(np.int64)
        out = {"event_type": [], "bin": [], "c": []}
        for t in np.unique(et):
            mn, mx, _ = rg[t]
            span = mx - mn + 1
            bins = ((vm[et == t] - mn) * SKETCH_BINS) // span
            bc = np.bincount(bins, minlength=0)
            nz = np.nonzero(bc)[0]
            out["event_type"].extend([t] * len(nz))
            out["bin"].extend(nz.astype(np.int64))
            out["c"].extend(bc[nz].astype(np.int64))
        return from_pandas_clean(pd.DataFrame(out))

    hist = ds.map_batches(hist_partial, batch_format="pyarrow") \
        .groupby(["event_type", "bin"]).aggregate(
            Sum("c", alias_name="c"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        rg = ranges  # closure: tiny driver-known dict
        df = df.sort_values("bin", kind="mergesort")
        t = df["event_type"].iloc[0]
        mn, mx, n = rg[t]
        span = mx - mn + 1
        cum = df["c"].to_numpy().cumsum()
        bins = df["bin"].to_numpy()
        est = {}
        for p in (50, 90, 99):
            idx = (n * p + 99) // 100          # ceil(n*p/100)
            b = int(bins[np.searchsorted(cum, idx)])
            est[p] = mn + ((b + 1) * span) // SKETCH_BINS - 1
        return pd.DataFrame({
            "event_type": [t], "n_events": [np.int64(n)],
            "p50_est": [np.int64(est[50])],
            "p90_est": [np.int64(est[90])],
            "p99_est": [np.int64(est[99])],
        })

    return hist.groupby("event_type").map_groups(
        finish, batch_format="pandas")


BURST_HALF_US = 60_000_000          # error-burst window: ts ± 60 s
BURST_CELL_US = 2 * BURST_HALF_US   # time-cell width == window width


def events_in_error_bursts(sf_dir: str, num_buckets: int = 0):
    """GLOBAL interval join (no shared key): for every event, the number
    of error-burst windows [err_ts - 60s, err_ts + 60s] — from ANY
    user's error — that cover its timestamp; rows with n_bursts > 0.
    The range-join shape Ray Data lacks, built without broadcasting the
    window side (it scales with the corpus, unlike the tiny threshold
    maps elsewhere).

    Shape: time-cell co-partitioning. With cell width == window width,
    a window [lo, hi] overlaps EXACTLY cells lo//C and lo//C + 1, so
    each window row is replicated twice; each event goes to its own
    single cell ts//C — hence no double counting (an event is counted
    only by window copies in its own cell). Cells shuffle once on
    cell % K (bounded reducers); inside a bucket each cell resolves
    with two sorted searchsorteds: n = #(lo <= t) - #(hi < t). Skew
    note: one cell = 120 s of global traffic — if a single cell
    outgrows a reducer, shrink BURST_CELL_US (windows then replicate
    to ceil(W/C)+1 cells; the count identity is unchanged).
    """
    import pandas as pd

    num_buckets = num_buckets or cluster_buckets(minimum=16)
    ds = _events(sf_dir, columns=["event_id", "ts", "event_type"])

    def emit(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        tu = pc.cast(batch["ts"], pa.int64()).to_numpy()
        et = np.asarray(batch["event_type"].to_pylist())
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        # event rows: side 0, one cell each
        e_cell = tu // BURST_CELL_US
        # window rows: side 1, replicated to the two cells it overlaps
        err = et == "error"
        lo = tu[err] - BURST_HALF_US
        hi = tu[err] + BURST_HALF_US
        c1 = lo // BURST_CELL_US
        w_cell = np.concatenate([c1, c1 + 1])
        w_lo = np.concatenate([lo, lo])
        w_hi = np.concatenate([hi, hi])
        cell = np.concatenate([e_cell, w_cell])
        zeros_w = np.zeros(len(w_cell), dtype=np.int64)
        return pa.table({
            "bucket": pa.array((cell % num_buckets).astype(np.int32)),
            "cell": pa.array(cell),
            "side": pa.array(np.concatenate(
                [np.zeros(len(eid), np.int8),
                 np.ones(len(w_cell), np.int8)])),
            "event_id": pa.array(np.concatenate([eid, zeros_w])),
            "event_type": pa.array(
                et.tolist() + [""] * len(w_cell), pa.string()),
            "t": pa.array(np.concatenate([tu, zeros_w])),
            "lo": pa.array(np.concatenate(
                [np.zeros(len(eid), np.int64), w_lo])),
            "hi": pa.array(np.concatenate(
                [np.zeros(len(eid), np.int64), w_hi])),
        })

    def local(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, g in df.groupby("cell", sort=False):
            side = g["side"].to_numpy()
            ev = g[side == 0]
            w = g[side == 1]
            if not len(ev) or not len(w):
                continue
            los = np.sort(w["lo"].to_numpy())
            his = np.sort(w["hi"].to_numpy())
            t = ev["t"].to_numpy()
            n = (np.searchsorted(los, t, side="right")
                 - np.searchsorted(his, t, side="left"))
            keep = n > 0
            if keep.any():
                out.append(pd.DataFrame({
                    "event_id": ev["event_id"].to_numpy()[keep],
                    "event_type": ev["event_type"].to_numpy()[keep],
                    "n_bursts": n[keep].astype(np.int64),
                }))
        if not out:
            return pd.DataFrame({
                "event_id": pd.Series([], dtype=np.int64),
                "event_type": pd.Series([], dtype=object),
                "n_bursts": pd.Series([], dtype=np.int64),
            })
        return pd.concat(out, ignore_index=True)

    return (ds.map_batches(emit, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("bucket")
            .map_groups(local, batch_format="pandas"))


REFINE_BINS = 4096   # per-pass histogram width for the exact refine


def event_value_percentiles_refine(sf_dir: str):
    """Per event_type: EXACT discrete p50/p90/p99 of value_milli with
    NO single-reducer-per-type — the at-scale escape hatch promised in
    event_value_percentiles' docstring. Same output schema and the
    same DuckDB oracle as the exact operator.

    Iterative histogram refinement: pass 0 aggregates exact
    (min, max, n) per type (tiny); each refine pass bin-counts every
    live (type, percentile) bracket at REFINE_BINS resolution (partials
    are int vectors, merge = addition → any reduce order exact), then
    the driver narrows each bracket to the bin holding the target rank
    (quantile_disc index ceil(p*n/100), 1-based within-bracket) and
    rebases the rank. A bracket of span <= REFINE_BINS resolves in one
    more pass (integer bin width 1). Passes = ceil(log_BINS(span)) — 3
    scans for any span < 2^36 — each a streaming map_batches + a
    (types x 3 x BINS)-row aggregate; no group ever needs one worker's
    heap, so a single hot event_type cannot sink a reducer at corpus
    scale."""
    import pandas as pd
    from ray.data.aggregate import Max, Min, Sum

    from dataquality_ray.arrowutil import from_pandas_clean

    ds = _events(sf_dir, columns=["event_type", "value"])

    def stats_partial(batch: pa.Table) -> pa.Table:
        vm = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                      * 1000).astype(np.int64)
        g = (pd.DataFrame({"event_type":
                           batch["event_type"].to_pylist(), "vm": vm})
             .groupby("event_type", sort=False)["vm"]
             .agg(mn="min", mx="max", n="size").reset_index())
        return from_pandas_clean(g)

    stats = ds.map_batches(stats_partial, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Min("mn", alias_name="mn"), Max("mx", alias_name="mx"),
            Sum("n", alias_name="n")).to_pandas()

    # bracket state per (type, p): [lo, hi] known to contain the target
    # element, and its 1-based rank among bracket members.
    brackets: dict = {}
    counts: dict = {}
    for _, r in stats.iterrows():
        t, mn, mx, n = (r["event_type"], int(r["mn"]), int(r["mx"]),
                        int(r["n"]))
        counts[t] = n
        for p in PCT_POINTS:
            brackets[(t, p)] = (mn, mx, (p * n + 99) // 100)

    resolved: dict = {}
    while True:
        live = {k: v for k, v in brackets.items()
                if k not in resolved}
        for k, (lo, hi, _) in list(live.items()):
            if lo == hi:
                resolved[k] = lo
                del live[k]
        if not live:
            break
        live_ref = ray.put(live)

        def hist_pass(batch: pa.Table) -> pa.Table:
            br = ray.get(live_ref)
            et = np.asarray(batch["event_type"].to_pylist())
            vm = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                          * 1000).astype(np.int64)
            out = {"event_type": [], "p": [], "bin": [], "c": []}
            for (t, p), (lo, hi, _rank) in br.items():
                m = (et == t) & (vm >= lo) & (vm <= hi)
                if not m.any():
                    continue
                span = hi - lo + 1
                bins = ((vm[m] - lo) * REFINE_BINS) // span
                bc = np.bincount(bins)
                nz = np.nonzero(bc)[0]
                out["event_type"].extend([t] * len(nz))
                out["p"].extend([int(p)] * len(nz))
                out["bin"].extend(int(b) for b in nz)
                out["c"].extend(int(c) for c in bc[nz])
            return pa.table({
                "event_type": pa.array(out["event_type"], pa.string()),
                "p": pa.array(out["p"], pa.int64()),
                "bin": pa.array(out["bin"], pa.int64()),
                "c": pa.array(out["c"], pa.int64()),
            })

        hist = (ds.map_batches(hist_pass, batch_format="pyarrow",
                               zero_copy_batch=True)
                .groupby(["event_type", "p", "bin"])
                .aggregate(Sum("c", alias_name="c")).to_pandas())

        for (t, p), (lo, hi, rank) in live.items():
            h = hist[(hist["event_type"] == t) & (hist["p"] == p)] \
                .sort_values("bin", kind="mergesort")
            cum = h["c"].to_numpy().cumsum()
            bins = h["bin"].to_numpy()
            i = int(np.searchsorted(cum, rank))
            b = int(bins[i])
            span = hi - lo + 1
            new_lo = lo + (b * span + REFINE_BINS - 1) // REFINE_BINS
            new_lo = max(new_lo, lo)
            # smallest v with bin(v) == b is ceil(b*span/BINS)+lo;
            # largest is ceil((b+1)*span/BINS)-1+lo
            new_hi = lo + ((b + 1) * span + REFINE_BINS - 1) \
                // REFINE_BINS - 1
            below = int(cum[i - 1]) if i > 0 else 0
            brackets[(t, p)] = (new_lo, new_hi, rank - below)

    rows = sorted(counts)
    return pa.table({
        "event_type": pa.array(rows, pa.string()),
        "n_events": pa.array([counts[t] for t in rows], pa.int64()),
        **{f"p{p}_milli": pa.array([resolved[(t, p)] for t in rows],
                                   pa.int64())
           for p in PCT_POINTS},
    })


def event_type_transitions(sf_dir: str, num_buckets: int = 0):
    """(from_type, to_type, n): counts of consecutive event-type
    transitions within each user's (ts, event_id)-ordered stream — the
    first-order Markov transition matrix of the event log (sequence
    analytics; the LEAD window feeding an aggregate rather than a
    per-row surface).

    Shape: ONE user-bucket shuffle; each bucket orders its users'
    events and counts its local transition pairs in a vectorized
    pandas pass (partial matrices), then a tiny global groupby merges
    the per-bucket partials (output rows <= |types|^2).
    """
    num_buckets = num_buckets or cluster_buckets(minimum=16)
    from ray.data.aggregate import Sum

    ds = _events(sf_dir, columns=["event_id", "ts", "user_id",
                                  "event_type"])

    def bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array((u % num_buckets).astype(np.int32)),
            "user_id": batch["user_id"],
            "event_id": batch["event_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "event_type": batch["event_type"],
        })

    def transitions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts_us", "event_id"],
                            kind="mergesort")
        same_user = df["user_id"].eq(df["user_id"].shift(-1))
        nxt = df["event_type"].shift(-1)
        pairs = pd.DataFrame({
            "from_type": df["event_type"][same_user],
            "to_type": nxt[same_user],
        })
        g = (pairs.groupby(["from_type", "to_type"], sort=False)
             .size().rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    agg = ds.map_batches(bucket, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("bucket").map_groups(transitions, batch_format="pandas") \
        .groupby(["from_type", "to_type"]).aggregate(
            Sum("n", alias_name="n"))

    def clean(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "from_type": t["from_type"], "to_type": t["to_type"],
            "n": pc.cast(t["n"], pa.int64()),
        })

    return agg.map_batches(clean, batch_format="pyarrow")


def modal_event_type_per_user(sf_dir: str, num_buckets: int = 0):
    """(user_id, event_type, n): each user's most frequent event type
    (the MODE aggregate; ties -> lexicographically smallest type, so
    the answer is deterministic).

    Shape: per-batch (user, type) partial counts shrink the exchange
    to distinct pairs, ONE user-bucket shuffle, then the per-user
    argmax completes locally per bucket (sort + first) — the same
    bucketed-argmax topology as latest_event_per_user.
    """
    num_buckets = num_buckets or cluster_buckets(minimum=16)
    ds = _events(sf_dir, columns=["user_id", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            "event_type": batch["event_type"].to_pylist(),
        })
        g = (df.groupby(["user_id", "event_type"], sort=False)
             .size().rename("n").reset_index())
        g["bucket"] = (g["user_id"] % num_buckets).astype(np.int32)
        g["n"] = g["n"].astype(np.int64)
        return from_pandas_clean(g)

    def argmax(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["user_id", "event_type"], sort=False)["n"]
             .sum().reset_index())
        g = g.sort_values(["user_id", "n", "event_type"],
                          ascending=[True, False, True],
                          kind="mergesort")
        w = g.drop_duplicates("user_id", keep="first")
        return pd.DataFrame({
            "user_id": w["user_id"].to_numpy(),
            "event_type": w["event_type"].to_numpy(),
            "n": w["n"].to_numpy().astype(np.int64),
        })

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bucket").map_groups(argmax, batch_format="pandas")


FUNNEL_STAGES = ("signup", "click", "purchase")


def user_funnel_stages(sf_dir: str, num_buckets: int = 0):
    """(user_id, funnel_stage): ordered funnel analysis — the deepest
    stage each user reached, where stage k requires an event of type
    FUNNEL_STAGES[k-1] STRICTLY AFTER the timestamp that satisfied
    stage k-1 (signup -> click -> purchase). Users with events but no
    signup are stage 0.

    Shape: ONE user-bucket shuffle; within a bucket each stage is a
    vectorized conditional-min pass (filter type, ts > prev stage's
    ts, groupby min) — three passes regardless of user count, no
    per-user Python.
    """
    num_buckets = num_buckets or cluster_buckets(minimum=16)
    ds = _events(sf_dir, columns=["ts", "user_id", "event_type"])

    def bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array((u % num_buckets).astype(np.int32)),
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "event_type": batch["event_type"],
        })

    def funnel(df: pd.DataFrame) -> pd.DataFrame:
        users = pd.DataFrame({"user_id": df["user_id"].unique()})
        stage = pd.Series(np.zeros(len(users), dtype=np.int64),
                          index=users["user_id"].to_numpy())
        prev_ts = None
        for k, etype in enumerate(FUNNEL_STAGES, start=1):
            rows = df[df["event_type"] == etype]
            if prev_ts is not None:
                # inner merge keeps the bound in int64 — Series.map
                # would promote through float64 (NaN for absent users)
                # and lose exactness for values above 2^53
                pt = (prev_ts.rename("bound").rename_axis("user_id")
                      .reset_index())
                rows = rows.merge(pt, on="user_id", how="inner")
                rows = rows[rows["ts_us"] > rows["bound"]]
            cur = rows.groupby("user_id")["ts_us"].min()
            stage.loc[cur.index] = k
            prev_ts = cur
        return pd.DataFrame({
            "user_id": stage.index.to_numpy(),
            "funnel_stage": stage.to_numpy(),
        })

    return ds.map_batches(bucket, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("bucket").map_groups(funnel, batch_format="pandas")


def event_props_numeric_stats(sf_dir: str):
    """(event_type, n, sum_k, min_k, max_k, sum_v, sum_kk, sum_vv,
    sum_kv): parse the semi-structured `props` JSON column (reference
    analog: the never-crash LLM-JSON repair path, bedrock.py:322-341 —
    here a vectorized json-path extraction; malformed rows become
    nulls, never exceptions) and aggregate the exact integer
    SUFFICIENT STATISTICS for mean/variance/correlation between
    props.k and the event value — emitting the sums instead of the
    float correlation keeps the surface bit-deterministic and the
    partials mergeable by plain addition.

    Shape: per-batch polars partials (distinct event_type count is
    tiny) then one small groupby — shuffle volume is O(batches ×
    |types|). Scale note: int64 squared-sum capacity bounds this at
    ~1e12 rows for milli-scale values; past that the same partials
    merge hierarchically or widen to two-limb integers.
    """
    import polars as _pl
    from ray.data.aggregate import Max, Min, Sum

    ds = _events(sf_dir, columns=["event_type", "value", "props"])

    def partial(batch: pa.Table) -> pa.Table:
        v = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                     * 1000).astype(np.int64)
        df = _pl.DataFrame({
            "event_type": _pl.from_arrow(batch["event_type"]),
            "k": _pl.from_arrow(batch["props"])
            .str.json_path_match("$.k").cast(_pl.Int64, strict=False),
            "v": v,
        })
        g = (df.group_by("event_type")
             .agg(n=_pl.len().cast(_pl.Int64),
                  sum_k=_pl.col("k").sum(),
                  min_k=_pl.col("k").min(),
                  max_k=_pl.col("k").max(),
                  sum_v=_pl.col("v").sum(),
                  sum_kk=(_pl.col("k") * _pl.col("k")).sum(),
                  sum_vv=(_pl.col("v") * _pl.col("v")).sum(),
                  sum_kv=(_pl.col("k") * _pl.col("v")).sum()))
        return g.to_arrow()

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("event_type").aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_k", alias_name="sum_k"),
            Min("min_k", alias_name="min_k"),
            Max("max_k", alias_name="max_k"),
            Sum("sum_v", alias_name="sum_v"),
            Sum("sum_kk", alias_name="sum_kk"),
            Sum("sum_vv", alias_name="sum_vv"),
            Sum("sum_kv", alias_name="sum_kv"))

    def clean(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        cols = {"event_type": t["event_type"]}
        for c in ("n", "sum_k", "min_k", "max_k", "sum_v", "sum_kk",
                  "sum_vv", "sum_kv"):
            cols[c] = pc.cast(t[c], pa.int64())
        return pa.table(cols)

    return agg.map_batches(clean, batch_format="pyarrow")


HLL_REG_BITS = 6                 # 64 registers
HLL_REGISTERS = 1 << HLL_REG_BITS
_HLL_VALUE_BITS = 64 - HLL_REG_BITS
_HLL_MASK = (1 << _HLL_VALUE_BITS) - 1


def hll_reg_rho(hv: np.ndarray) -> tuple:
    """(register, rho) per 64-bit hash — register = top HLL_REG_BITS
    bits, rho = leading-zero count of the low bits + 1. bit_length must
    be EXACT (float log2 misrounds near powers of two), so it is a
    vectorized integer binary search. Shared by every HLL surface
    (distinct_users_hll, column_profile_hll) so the register arithmetic
    cannot fork."""
    reg = (hv >> np.uint64(_HLL_VALUE_BITS)).astype(np.int64)
    val = (hv & np.uint64(_HLL_MASK)).astype(np.uint64)
    bitlen = np.zeros(len(val), dtype=np.int64)
    v = val.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = v >= np.uint64(1 << shift)
        bitlen[big] += shift
        v[big] >>= np.uint64(shift)
    bitlen[val > 0] += 1
    rho = _HLL_VALUE_BITS + 1 - bitlen
    return reg, rho


def distinct_users_hll(sf_dir: str):
    """(event_type, reg, rho): HyperLogLog register sketch of distinct
    users per event type — register = top 6 bits of the frozen
    md5_u64(str(user_id)) hash, rho = leading-zero count of the low 58
    bits + 1, register value = MAX(rho). Registers merge by MAX, so
    partials combine under any partitioning; at 10^12 events the
    shuffle carries <= |types| * 64 rows instead of the distinct-pair
    stream an exact COUNT(DISTINCT) needs. The register surface is
    exact integers — SQL-checked against DuckDB recomputing the same
    hash/shift/bin arithmetic; the float ESTIMATE derived from the
    registers (hll_estimate) is pytest-bounded against the exact
    distinct counts instead (empty registers are implicit zeros on
    both sides).
    """
    import polars as _pl
    from ray.data.aggregate import Max
    from dataquality_ray.spec import token_hash_u64

    ds = _events(sf_dir, columns=["user_id", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        df = _pl.DataFrame({
            "event_type": _pl.from_arrow(batch["event_type"]),
            "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
        }).unique()
        users = df["user_id"].to_list()
        hv = np.fromiter((token_hash_u64(str(u)) for u in users),
                         dtype=np.uint64, count=len(users))
        reg, rho = hll_reg_rho(hv)
        g = (df.with_columns(reg=_pl.Series(reg), rho=_pl.Series(rho))
             .group_by(["event_type", "reg"])
             .agg(_pl.col("rho").max()))
        return g.to_arrow()

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby(["event_type", "reg"]).aggregate(
            Max("rho", alias_name="rho"))

    def clean(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "event_type": t["event_type"],
            "reg": pc.cast(t["reg"], pa.int64()),
            "rho": pc.cast(t["rho"], pa.int64()),
        })

    return agg.map_batches(clean, batch_format="pyarrow")


def hll_estimate(registers: "dict[int, int]",
                 m: int = HLL_REGISTERS) -> float:
    """Standard HLL estimate from a register dict (missing regs = 0),
    with the linear-counting small-range correction."""
    import math
    alpha = 0.709   # alpha_64
    s = sum(2.0 ** -registers.get(i, 0) for i in range(m))
    e = alpha * m * m / s
    zeros = sum(1 for i in range(m) if registers.get(i, 0) == 0)
    if e <= 2.5 * m and zeros:
        return m * math.log(m / zeros)
    return e


def user_event_type_sets(sf_dir: str, num_buckets: int = 0):
    """(user_id, event_types, n_types): SET-valued aggregation — each
    user's sorted distinct event types joined with ',' (the
    array_agg(DISTINCT ... ORDER BY) class; per-user behavioral
    signatures for cohorting).

    Shape: per-batch distinct (user, type) partials shrink the
    exchange to distinct pairs; ONE user-bucket shuffle; the set
    build + join completes locally per bucket via a vectorized polars
    sort + group agg.
    """
    num_buckets = num_buckets or cluster_buckets(minimum=32)
    import polars as _pl

    ds = _events(sf_dir, columns=["user_id", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        df = _pl.DataFrame({
            "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            "event_type": _pl.from_arrow(batch["event_type"]),
        }).unique()
        b = (df["user_id"].to_numpy() % num_buckets).astype(np.int32)
        return df.to_arrow().append_column("bucket", pa.array(b))

    def build(df: pd.DataFrame) -> pd.DataFrame:
        g = (_pl.from_pandas(df[["user_id", "event_type"]])
             .unique()
             .sort(["user_id", "event_type"])
             .group_by("user_id", maintain_order=True)
             .agg(event_types=_pl.col("event_type").str.join(","),
                  n_types=_pl.len().cast(_pl.Int64)))
        return g.to_pandas()

    return ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("bucket").map_groups(build, batch_format="pandas")


def customer_event_reconciliation(sf_dir: str, num_buckets: int = 0):
    """(key, match_status, n_events, mktsegment): FULL OUTER JOIN
    reconciliation of the customer dimension against per-user event
    activity — 'both' / 'customer_only' / 'events_only' rows all
    survive (the data-quality audit shape: which dimension rows have
    no activity, which activity has no dimension row).

    Shape: the event side first collapses to per-user counts
    (two-phase partials), then BOTH sides hash into the same key
    buckets — one co-shuffle, and the full-outer merge completes
    locally per bucket with a vectorized pandas outer merge. No side
    is broadcast: the pattern holds when both tables are large.
    """
    num_buckets = num_buckets or cluster_buckets(minimum=16)
    ds = _events(sf_dir, columns=["user_id"])

    def ev_partial(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        vals, cnt = np.unique(u, return_counts=True)
        return pa.table({
            "key": pa.array(vals.astype(np.int64)),
            "n": pa.array(cnt.astype(np.int64)),
            "bucket": pa.array((vals % num_buckets).astype(np.int32)),
            "side": pa.array(np.full(len(vals), "e"), pa.string()),
            "mktsegment": pa.array([""] * len(vals), pa.string()),
        })

    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"])

    def cust_rows(batch: pa.Table) -> pa.Table:
        k = batch["c_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "key": pa.array(k),
            "n": pa.array(np.zeros(len(k), np.int64)),
            "bucket": pa.array((k % num_buckets).astype(np.int32)),
            "side": pa.array(np.full(len(k), "c"), pa.string()),
            "mktsegment": batch["c_mktsegment"],
        })

    both = ds.map_batches(ev_partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .union(cust.map_batches(cust_rows, batch_format="pyarrow"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        ev = (df[df["side"] == "e"].groupby("key")["n"].sum()
              .rename("n_events").reset_index())
        cu = df[df["side"] == "c"][["key", "mktsegment"]] \
            .drop_duplicates("key")
        m = cu.merge(ev, on="key", how="outer")
        has_c = m["mktsegment"].notna()
        has_e = m["n_events"].notna()
        m["match_status"] = np.where(
            has_c & has_e, "both",
            np.where(has_c, "customer_only", "events_only"))
        return pd.DataFrame({
            "key": m["key"].to_numpy().astype(np.int64),
            "match_status": m["match_status"],
            "n_events": m["n_events"].fillna(0).to_numpy()
            .astype(np.int64),
            "mktsegment": m["mktsegment"].fillna("").to_numpy(),
        })

    return both.groupby("bucket").map_groups(merge,
                                             batch_format="pandas")


MOVING_WINDOW_ROWS = 4   # current row + 3 preceding


def user_moving_window(sf_dir: str, num_buckets: int = 0):
    """(event_id, user_id, win_n, win_sum_milli): BOUNDED moving window
    — SQL's SUM/COUNT OVER (PARTITION BY user ORDER BY ts, event_id
    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW). Complements
    user_running_totals (unbounded) with the sliding-frame shape.

    Exactness: the window sum is cumsum-difference arithmetic on int64
    milli values — never a pandas ``rolling`` (which promotes to
    float64; CLAUDE.md exactness rule).

    Scale shape: the bucketed ordered scan — ONE user-bucket shuffle,
    then a vectorized numpy pass per bucket (per-user segment starts
    via repeat; window start = max(i-3, segment start); sum = csum[i+1]
    - csum[start]).
    """
    num_buckets = num_buckets or cluster_buckets(minimum=16)
    import pandas as pd

    ds = _events(sf_dir, columns=["event_id", "ts", "user_id", "value"])

    def bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        vm = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                      * 1000).astype(np.int64)
        return pa.table({
            "bucket": pa.array((u % num_buckets).astype(np.int32)),
            "event_id": batch["event_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "user_id": batch["user_id"],
            "vm": pa.array(vm),
        })

    def scan(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["user_id", "ts_us", "event_id"],
                            kind="mergesort").reset_index(drop=True)
        u = df["user_id"].to_numpy()
        vm = df["vm"].to_numpy()
        n = len(df)
        idx = np.arange(n, dtype=np.int64)
        seg_start = idx[np.r_[True, u[1:] != u[:-1]]]
        seg_len = np.diff(np.r_[seg_start, n])
        ustart = np.repeat(seg_start, seg_len)
        start = np.maximum(idx - (MOVING_WINDOW_ROWS - 1), ustart)
        csum = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(vm, out=csum[1:])
        # sliding MIN/MAX (no cumsum identity exists): k shifted copies
        # with out-of-window lanes masked to the opposite extreme —
        # exact int64 end to end
        lanes_min = np.empty((MOVING_WINDOW_ROWS, n), dtype=np.int64)
        lanes_max = np.empty((MOVING_WINDOW_ROWS, n), dtype=np.int64)
        for j in range(MOVING_WINDOW_ROWS):
            src = np.empty(n, dtype=np.int64)
            src[j:] = vm[:n - j] if j else vm
            src[:j] = 0
            in_win = idx - j >= start
            lanes_min[j] = np.where(in_win, src, np.iinfo(np.int64).max)
            lanes_max[j] = np.where(in_win, src, np.iinfo(np.int64).min)
        return pd.DataFrame({
            "event_id": df["event_id"],
            "user_id": u,
            "win_n": (idx - start + 1).astype(np.int64),
            "win_sum_milli": csum[idx + 1] - csum[start],
            "win_min_milli": lanes_min.min(axis=0),
            "win_max_milli": lanes_max.max(axis=0),
        })

    return (ds.map_batches(bucket, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("bucket").map_groups(scan, batch_format="pandas"))


def customers_with_purchases(sf_dir: str, num_buckets: int = 0):
    """(c_custkey, c_mktsegment): the SEMI-JOIN / EXISTS shape —
    customers with at least one HIGH-VALUE purchase event
    (user_id = c_custkey, value >= HIGH_VALUE_MIN). Dual of
    users_without_purchase (anti-join), but via a DISTRIBUTED hash
    join instead of a broadcast: per-batch distinct purchaser partials
    → bucketed-local dedup (every key in exactly one bucket, so the
    deduped side is exact and never driver-materialized) → inner join
    against the streamed customer dimension. The pattern holds when
    the purchaser set is too large to broadcast.
    """
    num_buckets = num_buckets or cluster_buckets(minimum=16)
    import pandas as pd

    ds = _events(sf_dir, columns=["user_id", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch["event_type"].to_pylist())
        v = batch["value"].to_numpy(zero_copy_only=False)
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        buyers = np.unique(u[(et == "purchase") & (v >= HIGH_VALUE_MIN)])
        return pa.table({
            "user_id": pa.array(buyers, pa.int64()),
            "bucket": pa.array((buyers % num_buckets).astype(np.int32)),
        })

    def dedup(df: "pd.DataFrame") -> "pd.DataFrame":
        return df[["user_id"]].drop_duplicates()

    buyers = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby("bucket").map_groups(dedup, batch_format="pandas"))

    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"])
    from dataquality_ray.arrowutil import strip_meta
    cust = cust.map_batches(strip_meta, batch_format="pyarrow",
                            zero_copy_batch=True)
    j = cust.join(buyers, join_type="inner",
                  num_partitions=max(4, num_buckets // 4),
                  on=("c_custkey",), right_on=("user_id",))
    return j.map_batches(
        lambda t: t.select(["c_custkey", "c_mktsegment"]),
        batch_format="pyarrow")


def event_value_mad(sf_dir: str):
    """(event_type, n_events, median_milli, mad_milli): robust
    dispersion — the exact discrete median plus the MEDIAN ABSOLUTE
    DEVIATION (median of |x - median|), both with DuckDB's
    quantile_disc index rule (ceil(n/2) - 1 of the ascending sort) in
    pure integer math. A nested-quantile composition: the second
    median is taken over a DERIVED column that depends on the first —
    the two-pass shape a single window/aggregate cannot express.

    Shuffle shape: ONE event_type groupby (small key domain); each
    group reduces with two O(n) np.partition selections — no full
    sort. Same single-reducer-per-type caveat (and the same
    histogram-refine escape hatch) as event_value_percentiles.
    """
    ds = _events(sf_dir, columns=["event_type", "value"])

    def fixed(batch: pa.Table) -> pa.Table:
        vm = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                      * 1000).astype(np.int64)
        return pa.table({"event_type": batch["event_type"],
                         "vm": pa.array(vm)})

    def mad(df: "pd.DataFrame") -> "pd.DataFrame":
        vm = df["vm"].to_numpy()
        n = len(vm)
        idx = (n + 1) // 2 - 1                    # ceil(n/2) - 1
        med = np.partition(vm, idx)[idx]
        dev = np.abs(vm - med)
        madv = np.partition(dev, idx)[idx]
        return pd.DataFrame({
            "event_type": [df["event_type"].iloc[0]],
            "n_events": np.array([n], dtype=np.int64),
            "median_milli": np.array([med], dtype=np.int64),
            "mad_milli": np.array([madv], dtype=np.int64),
        })

    return (ds.map_batches(fixed, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("event_type")
            .map_groups(mad, batch_format="pandas"))


US_PER_DAY = 86_400_000_000


def user_retention_cohorts(sf_dir: str, num_buckets: int = 0):
    """(cohort_day, day_offset, n_users): classic retention triangle —
    users cohorted by their FIRST active day (integer epoch-day), and
    for every later day each cohort's distinct active-user count at
    that day offset (offset 0 row = cohort size). Pure integer day
    arithmetic on both engines.

    Shape: per-batch distinct-(user, day) combiner, then ONE shuffle on
    user-bucket — a user's whole history lands in one bucket, so the
    per-user MIN (cohort) and the (cohort, offset) distinct counts
    complete locally (never a #users-output Ray aggregate; CLAUDE.md
    huge-group-count rule); the final merge groups only
    (cohort_day × offset) partials — time-span-bounded, not
    corpus-proportional.
    """
    import polars as pl
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    num_buckets = num_buckets or cluster_buckets(minimum=32)
    ds = _events(sf_dir, columns=["user_id", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        day = pc.cast(batch["ts"], pa.int64()).to_numpy() // US_PER_DAY
        df = pl.DataFrame({"user_id": u, "day": day}).unique()
        uu = df["user_id"].to_numpy()
        return pa.table({
            "bucket": pa.array((uu % num_buckets).astype(np.int32)),
            "user_id": pa.array(uu),
            "day": pa.array(df["day"].to_numpy().astype(np.int64)),
        })

    def local(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g).unique(["user_id", "day"])
        f = df.group_by("user_id").agg(
            pl.col("day").min().alias("cohort_day"))
        out = (df.join(f, on="user_id")
               .with_columns((pl.col("day") - pl.col("cohort_day"))
                             .alias("day_offset"))
               .group_by(["cohort_day", "day_offset"])
               .agg(pl.len().alias("c"))
               .with_columns(pl.col("c").cast(pl.Int64)))
        return out.to_arrow().cast(pa.schema([
            ("cohort_day", pa.int64()), ("day_offset", pa.int64()),
            ("c", pa.int64())]))

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("bucket")
           .map_groups(local, batch_format="pyarrow")
           .groupby(["cohort_day", "day_offset"])
           .aggregate(Sum("c", alias_name="n_users")))

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        return pa.table({
            "cohort_day": _pc.cast(batch["cohort_day"], pa.int64()),
            "day_offset": _pc.cast(batch["day_offset"], pa.int64()),
            "n_users": _pc.cast(batch["n_users"], pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


DEBOUNCE_US = 600_000_000     # drop repeats within 10 min of the prior


def debounced_events(sf_dir: str, num_buckets: int = 0):
    """(event_id, user_id, event_type, gap_us): telemetry debounce —
    keep an event only if MORE than DEBOUNCE_US passed since the
    PREVIOUS event of the same (user, event_type) in (ts, event_id)
    order (first occurrence kept, gap_us = -1). The repeated-signal
    cleanup every event pipeline runs before sessionization; LAG
    semantics so both engines pick identical rows.

    Shape: ONE user-bucket shuffle; per bucket a vectorized pandas
    ordered scan computes the per-(user, type) LAG diff — the
    user_sessions topology, no corpus-proportional group count.
    """
    import pyarrow.compute as pc

    num_buckets = num_buckets or cluster_buckets(minimum=16)
    ds = _events(sf_dir, columns=["event_id", "ts", "user_id",
                                  "event_type"])

    def bucket(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array((u % num_buckets).astype(np.int32)),
            "event_id": batch["event_id"],
            "user_id": batch["user_id"],
            "event_type": batch["event_type"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
        })

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "event_type", "ts_us",
                             "event_id"], kind="mergesort")
        g = df.groupby(["user_id", "event_type"], sort=False)
        gap = (df["ts_us"] - g["ts_us"].shift()).fillna(-1) \
            .astype(np.int64)
        keep = (gap.to_numpy() == -1) | (gap.to_numpy() > DEBOUNCE_US)
        out = df[keep]
        return pd.DataFrame({
            "event_id": out["event_id"].astype(np.int64),
            "user_id": out["user_id"].astype(np.int64),
            "event_type": out["event_type"],
            "gap_us": gap.to_numpy()[keep],
        })

    return (ds.map_batches(bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(scan, batch_format="pandas"))


# --- distribution drift --------------------------------------------------

DRIFT_BINS = 8192       # value histogram resolution (floor(value*10))
DRIFT_BIN_SCALE = 10
_DAY_US = 86_400_000_000


def event_value_drift(sf_dir: str):
    """(event_type, n_first, n_second, d_milli): two-sample
    Kolmogorov–Smirnov drift statistic per event type — the value
    distribution of the FIRST half of the event timeline (by epoch
    day, split at the midpoint) vs the SECOND half, as the max
    CDF gap in exact integer milli (``cum*1000 // total``). The
    monitoring primitive for "did this feed's distribution move?".

    Exactness: the KS sup over step CDFs is attained at an observed
    bin, so evaluating |F_a − F_b| on the union of observed bins is
    the exact statistic at the chosen bin resolution; all arithmetic
    is integer, so the DuckDB twin matches bit-for-bit.

    Scale shape: a tiny min/max-day pre-pass (O(#blocks) driver rows),
    then ONE scan producing per-batch (type, side, bin) histogram
    partials — bounded by types × 2 × DRIFT_BINS per batch regardless
    of corpus size — and a per-type local CDF fold (output groups =
    #types)."""
    import polars as pl
    import pyarrow.compute as pc

    span = _events(sf_dir, columns=["ts"])

    def day_bounds(batch: pa.Table) -> pa.Table:
        d = pc.cast(batch["ts"], pa.int64()).to_numpy(
            zero_copy_only=False) // _DAY_US
        return pa.table({"mn": pa.array([int(d.min())], pa.int64()),
                         "mx": pa.array([int(d.max())], pa.int64())})

    rows = span.map_batches(day_bounds, batch_format="pyarrow",
                            zero_copy_batch=True).take_all()
    mn = min(r["mn"] for r in rows)
    mx = max(r["mx"] for r in rows)
    split = (mn + mx + 1) // 2

    ds = _events(sf_dir, columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.cast(batch["ts"], pa.int64()).to_numpy(
            zero_copy_only=False) // _DAY_US
        v = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                     * DRIFT_BIN_SCALE).astype(np.int64)
        df = pl.DataFrame({
            "event_type": pl.from_arrow(batch["event_type"]),
            "side": (day >= split).astype(np.int64),
            "bin": np.clip(v, 0, DRIFT_BINS - 1),
        })
        g = (df.group_by(["event_type", "bin"])
             .agg(ca=(pl.col("side") == 0).sum().cast(pl.Int64),
                  cb=(pl.col("side") == 1).sum().cast(pl.Int64)))
        return g.to_arrow().cast(pa.schema([
            ("event_type", pa.string()), ("bin", pa.int64()),
            ("ca", pa.int64()), ("cb", pa.int64())]))

    def ks(t: pa.Table) -> pa.Table:
        df = (pl.from_arrow(t.select(["event_type", "bin", "ca", "cb"]))
              .group_by("bin")
              .agg(pl.col("ca").sum(), pl.col("cb").sum())
              .sort("bin"))
        ta = int(df["ca"].sum())
        tb = int(df["cb"].sum())
        if ta == 0 or tb == 0:
            d = 1000
        else:
            cuma = df["ca"].cum_sum().cast(pl.Int64)
            cumb = df["cb"].cum_sum().cast(pl.Int64)
            d = int((cuma * 1000 // ta - cumb * 1000 // tb)
                    .abs().max())
        et = t["event_type"][0].as_py()
        return pa.table({
            "event_type": pa.array([et], pa.string()),
            "n_first": pa.array([ta], pa.int64()),
            "n_second": pa.array([tb], pa.int64()),
            "d_milli": pa.array([d], pa.int64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("event_type")
            .map_groups(ks, batch_format="pyarrow"))


def hll_users_cumulative_daily(sf_dir: str):
    """(day, reg, rho): cumulative HyperLogLog register timeline of
    distinct users — for every day in the events table, the register
    state a streaming HLL would hold after ingesting all events up to
    and including that day (register = top HLL_REG_BITS bits of the
    frozen md5_u64(str(user_id)), rho = leading-zero count + 1,
    cumulative value = running MAX over days). This is the "distinct
    users to date" growth curve at sketch cost: registers merge by
    MAX, so partials combine under any partitioning AND any day
    ordering, and the exchange is bounded by |days| * 64 rows — an
    exact cumulative COUNT(DISTINCT) timeline would need a
    per-(day, user) distinct exchange that grows with the corpus.
    Dense spine: all 64 registers emitted for every day (rho 0 =
    untouched register), so the grid shape is identical on both
    engines. The register surface is exact integers (SQL-checked);
    the float estimate derived via hll_estimate is pytest-bounded
    against exact cumulative distincts instead."""
    import polars as _pl
    from ray.data.aggregate import Max
    from dataquality_ray.spec import token_hash_u64

    ds = _events(sf_dir, columns=["ts", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["day"] = df["ts"].dt.strftime("%Y-%m-%d")
        d = df[["day", "user_id"]].drop_duplicates()
        users = d["user_id"].tolist()
        hv = np.fromiter((token_hash_u64(str(u)) for u in users),
                         dtype=np.uint64, count=len(users))
        reg, rho = hll_reg_rho(hv)
        g = (_pl.DataFrame({"day": d["day"].to_numpy(),
                            "reg": reg, "rho": rho})
             .group_by(["day", "reg"])
             .agg(rho=_pl.col("rho").max()))
        return g.to_arrow()

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["day", "reg"])
           .aggregate(Max("rho", alias_name="rho"))
           .to_pandas())           # <= |days| * 64 rows

    days = sorted(set(agg["day"].tolist()))
    mat = np.zeros((len(days), HLL_REGISTERS), dtype=np.int64)
    di = {d: i for i, d in enumerate(days)}
    for d, r, rh in zip(agg["day"], agg["reg"], agg["rho"]):
        mat[di[d], int(r)] = int(rh)
    np.maximum.accumulate(mat, axis=0, out=mat)
    nd, m = mat.shape
    return pa.table({
        "day": pa.array(np.repeat(np.array(days, dtype=object), m)),
        "reg": pa.array(np.tile(np.arange(m, dtype=np.int64), nd)),
        "rho": pa.array(mat.reshape(-1)),
    })


def event_disorder_stats(sf_dir: str, num_buckets: int = 0):
    """(user_id, n_events, n_late, max_late_us): out-of-order arrival
    audit per user — in ARRIVAL order (event_id ascending), count
    events whose timestamp is behind the user's running max and the
    worst lateness in microseconds. This is the watermark-planning
    stat for any streaming ingest (what allowed-lateness must a
    tumbling window tolerate before it drops data?).

    Shape: ONE user-bucket shuffle of slim (user, event_id, t) rows;
    the running max is a bucket-local vectorized pandas groupby
    cummax over (user, event_id)-sorted rows (each user lives in
    exactly one bucket), then a per-user fold — no corpus-sized
    aggregate, no keyed polars window."""
    num_buckets = num_buckets or cluster_buckets(minimum=32)
    ds = _events(sf_dir, columns=["event_id", "ts", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array((u % num_buckets).astype(np.int32)),
            "user_id": batch["user_id"],
            "event_id": batch["event_id"],
            "t": batch["ts"].cast(pa.int64()),
        })

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "event_id"],
                            kind="mergesort").reset_index(drop=True)
        t = df["t"].to_numpy(dtype=np.int64)
        cm = df.groupby("user_id", sort=False)["t"].cummax() \
            .to_numpy(dtype=np.int64)
        prev = np.empty_like(cm)
        prev[0] = 0
        prev[1:] = cm[:-1]
        u = df["user_id"].to_numpy()
        is_start = np.empty(len(u), dtype=bool)
        is_start[0] = True
        is_start[1:] = u[1:] != u[:-1]
        late = (~is_start) & (t < prev)
        amt = np.where(late, prev - t, 0)
        g = (pd.DataFrame({"user_id": u,
                           "late": late.astype(np.int64),
                           "amt": amt})
             .groupby("user_id", sort=False)
             .agg(n_events=("late", "size"),
                  n_late=("late", "sum"),
                  max_late_us=("amt", "max"))
             .reset_index())
        return g

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("bucket")
            .map_groups(scan, batch_format="pandas"))


def event_type_audience_overlap(sf_dir: str, num_buckets: int = 0):
    """(type_a, type_b, n_a, n_b, n_common, jaccard_ppm): EXACT
    audience overlap between event types — for every unordered type
    pair, how many distinct users did both, with the exact Jaccard of
    the two user sets (the co-visitation / feature-overlap analysis
    behind funnel design and dedup of tracking streams). The exact
    twin of what an HLL union would estimate at 100 TB.

    Shape: per-batch distinct (user, type) partials shrink the
    exchange to distinct pairs; ONE user-bucket shuffle; each bucket
    builds its users' type sets locally and emits per-pair partial
    counts (|types|^2-bounded per bucket — every user lives in
    exactly one bucket); the final aggregate and the per-type
    distinct totals are |types|-scale."""
    import polars as _pl
    from ray.data.aggregate import Sum

    num_buckets = num_buckets or cluster_buckets(minimum=32)
    ds = _events(sf_dir, columns=["user_id", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        df = _pl.DataFrame({
            "user_id": batch["user_id"].to_numpy(
                zero_copy_only=False),
            "event_type": _pl.from_arrow(batch["event_type"]),
        }).unique()
        b = (df["user_id"].to_numpy() % num_buckets).astype(np.int32)
        return df.to_arrow().append_column("bucket", pa.array(b))

    def scan(t: pa.Table) -> pa.Table:
        df = (_pl.from_arrow(t.select(["user_id", "event_type"]))
              .unique())
        singles = (df.group_by("event_type")
                   .agg(c=_pl.len().cast(_pl.Int64))
                   .select(ta=_pl.col("event_type"),
                           tb=_pl.lit(""),
                           c=_pl.col("c")))
        pairs = (df.join(df, on="user_id", suffix="_b")
                 .filter(_pl.col("event_type")
                         < _pl.col("event_type_b"))
                 .group_by(["event_type", "event_type_b"])
                 .agg(c=_pl.len().cast(_pl.Int64))
                 .select(ta=_pl.col("event_type"),
                         tb=_pl.col("event_type_b"),
                         c=_pl.col("c")))
        return _pl.concat([singles, pairs]).to_arrow().cast(
            pa.schema([("ta", pa.string()), ("tb", pa.string()),
                       ("c", pa.int64())]))

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("bucket").map_groups(scan, batch_format="pyarrow")
           .groupby(["ta", "tb"]).aggregate(Sum("c", alias_name="c"))
           .to_pandas())
    singles = {r.ta: int(r.c) for r in agg.itertuples()
               if r.tb == ""}
    pairs = {(r.ta, r.tb): int(r.c) for r in agg.itertuples()
             if r.tb != ""}
    types = sorted(singles)
    rows = []
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            na, nb = singles[a], singles[b]
            nc = pairs.get((a, b), 0)
            union = na + nb - nc
            rows.append((a, b, na, nb, nc,
                         1_000_000 * nc // max(union, 1)))
    return pa.table({
        "type_a": pa.array([r[0] for r in rows], pa.string()),
        "type_b": pa.array([r[1] for r in rows], pa.string()),
        "n_a": pa.array([r[2] for r in rows], pa.int64()),
        "n_b": pa.array([r[3] for r in rows], pa.int64()),
        "n_common": pa.array([r[4] for r in rows], pa.int64()),
        "jaccard_ppm": pa.array([r[5] for r in rows], pa.int64()),
    })


def hll_audience_union_registers(sf_dir: str):
    """(type_a, type_b, reg, rho): HyperLogLog UNION sketches for
    every unordered event-type pair — the sketch-algebra twin of
    event_type_audience_overlap: HLL registers merge under set UNION
    by element-wise MAX, so |A ∪ B| (and via inclusion-exclusion
    |A ∩ B|) is estimable from per-type sketches WITHOUT touching the
    (user, type) stream again — at 100 TB the per-type sketches are
    64 integers each and every pairwise union is a 64-element max,
    while the exact overlap needs a corpus-sized distinct exchange.
    The register surface is exact integers (SQL-checked); the float
    union/intersection estimates via hll_estimate are pytest-bounded
    against the exact overlap counts instead. Dense spine: all 64
    registers per pair (rho 0 = untouched).

    Shape: one run of the distinct_users_hll register pipeline
    (per-batch distinct partials, |types| x 64 aggregate); the
    pairwise max is driver arithmetic over that constant-size
    surface."""
    regs = distinct_users_hll(sf_dir).to_pandas()
    types = sorted(set(regs["event_type"].tolist()))
    mat = {t: np.zeros(HLL_REGISTERS, dtype=np.int64) for t in types}
    for t, r, rh in zip(regs["event_type"], regs["reg"],
                        regs["rho"]):
        mat[t][int(r)] = int(rh)
    ta, tb, rg, rh = [], [], [], []
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            u = np.maximum(mat[a], mat[b])
            ta.extend([a] * HLL_REGISTERS)
            tb.extend([b] * HLL_REGISTERS)
            rg.extend(range(HLL_REGISTERS))
            rh.extend(u.tolist())
    return pa.table({
        "type_a": pa.array(ta, pa.string()),
        "type_b": pa.array(tb, pa.string()),
        "reg": pa.array(rg, pa.int64()),
        "rho": pa.array(rh, pa.int64()),
    })
