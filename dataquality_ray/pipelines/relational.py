"""Relational multi-table join pipelines over the TPC-H-ish tables.

The reference's join surface is single-table lookups (routes.py); these
queries evidence the general join engine a data-processing user needs:
broadcast small dimensions, hash-join the big fact table, two-phase
fixed-point aggregation. All SQL-checked.

Scale shape notes (100 TB framing):
- ``nation`` (25 rows) is a DRIVER BROADCAST — `ray.put` once, read in
  every map task; never a shuffle.
- ``customer`` ⋈ ``orders`` and ``part`` ⋈ ``lineitem`` are hash joins
  (`Dataset.join`, num_partitions-bucketed) — both sides stream.
- Money is fixed-pointed to integer cents BEFORE summation, so sums are
  exact under any accumulation order and match DuckDB bit-for-bit.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from dataquality_ray.arrowutil import from_pandas_clean, strip_meta


def _table(sf_dir: str, name: str, columns=None):
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{name}.parquet"), columns=columns) \
        .map_batches(strip_meta, batch_format="pyarrow",
                     zero_copy_batch=True)


def orders_by_nation(sf_dir: str, num_partitions: int = 8):
    """(nation, n_orders, total_price_cents): orders joined through
    customer to nation, aggregated per nation name.

    nation→name is broadcast (25 rows); customer ⋈ orders is the hash
    join; the final aggregate is two-phase (per-batch partials → a
    25-group groupby)."""
    from ray.data.aggregate import Sum

    nation = _table(sf_dir, "nation",
                    columns=["n_nationkey", "n_name"]).to_pandas()
    n_map_ref = ray.put(dict(zip(nation["n_nationkey"].astype(int),
                                 nation["n_name"])))

    cust = _table(sf_dir, "customer",
                  columns=["c_custkey", "c_nationkey"])

    def attach_nation(batch: pa.Table) -> pa.Table:
        m = ray.get(n_map_ref)
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "c_custkey": batch["c_custkey"],
            "nation": pa.array([m[int(k)] for k in nk], pa.string()),
        })

    cust_n = cust.map_batches(attach_nation, batch_format="pyarrow",
                              zero_copy_batch=True)
    orders = _table(sf_dir, "orders",
                    columns=["o_custkey", "o_totalprice"])
    joined = orders.join(cust_n, join_type="inner",
                         num_partitions=num_partitions,
                         on=("o_custkey",), right_on=("c_custkey",))

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch["o_totalprice"].to_numpy(zero_copy_only=False)
            * 100).astype(np.int64)
        g = (pd.DataFrame({"nation": batch["nation"].to_pylist(),
                           "n": 1, "c": cents})
             .groupby("nation", sort=False)
             .agg(n=("n", "sum"), c=("c", "sum")).reset_index())
        return from_pandas_clean(g)

    agg = joined.map_batches(partial, batch_format="pyarrow") \
        .groupby("nation").aggregate(Sum("n", alias_name="n_orders"),
                                     Sum("c", alias_name="total_price_cents"))

    def clean(t: pa.Table) -> pa.Table:
        return pa.table({
            "nation": t["nation"],
            "n_orders": pc.cast(t["n_orders"], pa.int64()),
            "total_price_cents": pc.cast(t["total_price_cents"],
                                         pa.int64()),
        })

    return agg.map_batches(clean, batch_format="pyarrow")


def revenue_by_brand(sf_dir: str, num_partitions: int = 8):
    """(brand, n_items, revenue_cents): lineitem revenue
    floor(extendedprice * (1 - discount) * 100) fixed-pointed per row,
    pre-aggregated per partkey inside map_batches, hash-joined to part
    for the brand, then a small per-brand groupby."""
    from ray.data.aggregate import Sum

    li = _table(sf_dir, "lineitem",
                columns=["l_partkey", "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        dc = batch["l_discount"].to_numpy(zero_copy_only=False)
        cents = np.floor(ep * (1 - dc) * 100).astype(np.int64)
        g = (pd.DataFrame({"l_partkey":
                           batch["l_partkey"].to_numpy(
                               zero_copy_only=False),
                           "n": 1, "c": cents})
             .groupby("l_partkey", sort=False)
             .agg(n=("n", "sum"), c=("c", "sum")).reset_index())
        return from_pandas_clean(g)

    per_part = li.map_batches(partial, batch_format="pyarrow") \
        .groupby("l_partkey").aggregate(Sum("n", alias_name="n"),
                                        Sum("c", alias_name="c"))
    part = _table(sf_dir, "part", columns=["p_partkey", "p_brand"])
    joined = per_part.join(part, join_type="inner",
                           num_partitions=num_partitions,
                           on=("l_partkey",), right_on=("p_partkey",))

    agg = joined.groupby("p_brand").aggregate(
        Sum("n", alias_name="n_items"), Sum("c", alias_name="revenue_cents"))

    def clean(t: pa.Table) -> pa.Table:
        return pa.table({
            "brand": t["p_brand"],
            "n_items": pc.cast(t["n_items"], pa.int64()),
            "revenue_cents": pc.cast(t["revenue_cents"], pa.int64()),
        })

    return agg.map_batches(clean, batch_format="pyarrow")


# TPC-H Q1-style predicate cutoff (pinned; mirrored into the oracle SQL)
Q1_SHIP_CUTOFF = "1999-01-01"
# per-customer windowed-rank fanout (top-K orders per customer)
TOP_ORDERS_PER_CUSTOMER_K = 3


def lineitem_pricing_summary(sf_dir: str):
    """TPC-H Q1 analog: per (returnflag, linestatus) fixed-point pricing
    sums over lineitem rows with l_shipdate <= Q1_SHIP_CUTOFF.

    Scale shape: the predicate is pushed into the parquet read (row-group
    pruning at the scan — nothing past the cutoff leaves storage); per-row
    money/quantity fixed-pointed to integers BEFORE summation (exact under
    any accumulation order); per-batch pandas partials combine into a
    ~6-group final groupby, so the all-to-all moves a handful of rows.
    Integer averages use // (bit-deterministic vs DuckDB's //).
    """
    import pyarrow.compute as _pc
    from ray.data.aggregate import Sum

    cutoff = np.datetime64(Q1_SHIP_CUTOFF, "us")
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax", "l_shipdate"],
        filter=(_pc.field("l_shipdate") <= cutoff)) \
        .map_batches(strip_meta, batch_format="pyarrow",
                     zero_copy_batch=True)

    def partial(batch: pa.Table) -> pa.Table:
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        dc = batch["l_discount"].to_numpy(zero_copy_only=False)
        tx = batch["l_tax"].to_numpy(zero_copy_only=False)
        g = (pd.DataFrame({
            "returnflag": batch["l_returnflag"].to_pylist(),
            "linestatus": batch["l_linestatus"].to_pylist(),
            "n": 1,
            "q": np.floor(qty * 1000).astype(np.int64),
            "b": np.floor(ep * 100).astype(np.int64),
            "d": np.floor(ep * (1 - dc) * 100).astype(np.int64),
            "c": np.floor(ep * (1 - dc) * (1 + tx) * 100).astype(np.int64),
        }).groupby(["returnflag", "linestatus"], sort=False)
          .agg(n=("n", "sum"), q=("q", "sum"), b=("b", "sum"),
               d=("d", "sum"), c=("c", "sum")).reset_index())
        return from_pandas_clean(g)

    agg = li.map_batches(partial, batch_format="pyarrow") \
        .groupby(["returnflag", "linestatus"]).aggregate(
            Sum("n", alias_name="n_items"),
            Sum("q", alias_name="sum_qty_milli"),
            Sum("b", alias_name="sum_base_cents"),
            Sum("d", alias_name="sum_disc_cents"),
            Sum("c", alias_name="sum_charge_cents"))

    def clean(t: pa.Table) -> pa.Table:
        n = t["n_items"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = t["sum_qty_milli"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["sum_base_cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "returnflag": t["returnflag"],
            "linestatus": t["linestatus"],
            "n_items": pa.array(n),
            "sum_qty_milli": pa.array(q),
            "sum_base_cents": pa.array(b),
            "sum_disc_cents": pc.cast(t["sum_disc_cents"], pa.int64()),
            "sum_charge_cents": pc.cast(t["sum_charge_cents"], pa.int64()),
            "avg_qty_milli": pa.array(q // np.maximum(n, 1)),
            "avg_price_cents": pa.array(b // np.maximum(n, 1)),
        })

    return agg.map_batches(clean, batch_format="pyarrow")


def top_orders_per_customer(sf_dir: str,
                            k: int = TOP_ORDERS_PER_CUSTOMER_K):
    """Per-group windowed rank: the top-k orders of every customer by
    (totalprice desc, orderkey asc), with the rank emitted — the SQL
    ``row_number() OVER (PARTITION BY custkey ORDER BY ...)`` shape.

    Scale shape: two-phase — per-batch partial top-k per customer (the
    global top-k per key is always a subset of the union of per-batch
    top-ks), then the final per-customer rank as a BUCKETED-LOCAL pass:
    one shuffle on splitmix(custkey) % K and a vectorized pandas
    sort + group-head per bucket — never a #customers-output-group Ray
    aggregate (CLAUDE.md invariant). Only ≤k rows per customer cross
    the shuffle. Money fixed-pointed to cents so ordering/tie-breaks
    are integer-deterministic.
    """
    from dataquality_ray.stages.bucketing import (
        cluster_buckets,
        splitmix_bucket,
    )

    orders = _table(sf_dir, "orders",
                    columns=["o_custkey", "o_orderkey", "o_totalprice"])
    nb = cluster_buckets()

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "o_custkey": batch["o_custkey"].to_numpy(zero_copy_only=False),
            "o_orderkey": batch["o_orderkey"].to_numpy(zero_copy_only=False),
            "totalprice_cents": np.floor(
                batch["o_totalprice"].to_numpy(zero_copy_only=False)
                * 100).astype(np.int64),
        })
        df = df.sort_values(
            ["o_custkey", "totalprice_cents", "o_orderkey"],
            ascending=[True, False, True], kind="mergesort")
        df = df.groupby("o_custkey", sort=False).head(k)
        df = df.reset_index(drop=True)
        df["part"] = splitmix_bucket(
            df["o_custkey"].to_numpy().astype(np.int64), nb)
        return from_pandas_clean(df)

    def final_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["o_custkey", "totalprice_cents", "o_orderkey"],
            ascending=[True, False, True], kind="mergesort")
        g = g.groupby("o_custkey", sort=False).head(k).copy()
        g["rank"] = (g.groupby("o_custkey", sort=False).cumcount() + 1) \
            .astype(np.int64)
        return g.drop(columns=["part"])

    return orders.map_batches(partial, batch_format="pyarrow") \
        .groupby("part").map_groups(final_bucket, batch_format="pandas")


def regional_revenue(sf_dir: str, num_partitions: int = 8):
    """(region, n_items, revenue_cents): lineitem revenue rolled up
    through orders → customer → nation → region — the deepest join chain
    in the repo (two hash joins + one broadcast dim lookup).

    Scale shape: revenue is combined per orderkey INSIDE map_batches
    (batch-local combiner — lineitems of an order are near-contiguous,
    so partial rows ≈ #orders) and the partials join DIRECTLY against
    orders: because everything re-aggregates to 5 regions at the end,
    a GLOBAL per-orderkey aggregate (output ∝ corpus rows — the shape
    CLAUDE.md forbids) buys nothing and was the round-4 regression.
    lineitem⋈orders and orders⋈customer are bucketed hash joins with a
    materialize between them (CLAUDE.md invariant: never chain two Ray
    joins lazily on a small cluster); nation+region (25+5 rows) are a
    driver broadcast via ``ray.put``; the region rollup is a per-batch
    5-row partial → tiny final groupby.
    """
    from ray.data.aggregate import Sum

    nation = _table(sf_dir, "nation",
                    columns=["n_nationkey", "n_regionkey"]).to_pandas()
    region = _table(sf_dir, "region",
                    columns=["r_regionkey", "r_name"]).to_pandas()
    r_name = dict(zip(region["r_regionkey"].astype(int), region["r_name"]))
    n2r = {int(nk): r_name[int(rk)]
           for nk, rk in zip(nation["n_nationkey"],
                             nation["n_regionkey"])}
    # dense np lookup table (nationkeys are small ints) — vectorized
    # region attach instead of a per-row dict comprehension
    lut = np.empty(max(n2r) + 1, dtype=object)
    for k, v in n2r.items():
        lut[k] = v
    lut_ref = ray.put(lut)

    li = _table(sf_dir, "lineitem",
                columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        dc = batch["l_discount"].to_numpy(zero_copy_only=False)
        g = (pd.DataFrame({
            "l_orderkey": batch["l_orderkey"].to_numpy(
                zero_copy_only=False),
            "n": 1,
            "c": np.floor(ep * (1 - dc) * 100).astype(np.int64),
        }).groupby("l_orderkey", sort=False)
          .agg(n=("n", "sum"), c=("c", "sum")).reset_index())
        return from_pandas_clean(g)

    per_order = li.map_batches(partial, batch_format="pyarrow")
    orders = _table(sf_dir, "orders",
                    columns=["o_orderkey", "o_custkey"])
    j1 = per_order.join(orders, join_type="inner",
                        num_partitions=num_partitions,
                        on=("l_orderkey",), right_on=("o_orderkey",)) \
        .materialize()
    cust = _table(sf_dir, "customer",
                  columns=["c_custkey", "c_nationkey"])
    j2 = j1.join(cust, join_type="inner",
                 num_partitions=num_partitions,
                 on=("o_custkey",), right_on=("c_custkey",))

    def region_partial(batch: pa.Table) -> pa.Table:
        m = ray.get(lut_ref)
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        g = (pd.DataFrame({
            "region": m[nk],
            "n": batch["n"].to_numpy(zero_copy_only=False),
            "c": batch["c"].to_numpy(zero_copy_only=False),
        }).groupby("region", sort=False)
          .agg(n=("n", "sum"), c=("c", "sum")).reset_index())
        g["region"] = g["region"].astype(str)
        return from_pandas_clean(g)

    agg = j2.map_batches(region_partial, batch_format="pyarrow") \
        .groupby("region").aggregate(Sum("n", alias_name="n_items"),
                                     Sum("c", alias_name="revenue_cents"))

    def clean(t: pa.Table) -> pa.Table:
        return pa.table({
            "region": t["region"],
            "n_items": pc.cast(t["n_items"], pa.int64()),
            "revenue_cents": pc.cast(t["revenue_cents"], pa.int64()),
        })

    return agg.map_batches(clean, batch_format="pyarrow")


def orders_rollup(sf_dir: str):
    """(orderstatus, orderpriority, n_orders, total_price_cents) at all
    three ROLLUP levels — (status, priority), per-status subtotal, and
    grand total, with 'ALL' as the rolled-up sentinel (SQL's
    GROUP BY ROLLUP surface).

    Scale shape: ONE pass over orders — per-batch partials aggregate to
    the finest (status × priority) level (~15 groups), the higher
    levels are re-aggregations of that tiny finest-level table in a
    final map (never a second scan of the fact table).
    """
    from ray.data.aggregate import Sum

    orders = _table(sf_dir, "orders",
                    columns=["o_orderstatus", "o_orderpriority",
                             "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch["o_totalprice"].to_numpy(zero_copy_only=False)
            * 100).astype(np.int64)
        g = (pd.DataFrame({
            "orderstatus": batch["o_orderstatus"].to_pylist(),
            "orderpriority": batch["o_orderpriority"].to_pylist(),
            "n": 1, "c": cents})
            .groupby(["orderstatus", "orderpriority"], sort=False)
            .agg(n=("n", "sum"), c=("c", "sum")).reset_index())
        return from_pandas_clean(g)

    fine = orders.map_batches(partial, batch_format="pyarrow") \
        .groupby(["orderstatus", "orderpriority"]).aggregate(
            Sum("n", alias_name="n"), Sum("c", alias_name="c"))

    def expand(t: pa.Table) -> pa.Table:
        # t is the complete finest level (the groupby emits one block
        # per partition; coalesce first)
        df = t.to_pandas()
        by_status = (df.groupby("orderstatus", as_index=False)
                     .agg(n=("n", "sum"), c=("c", "sum")))
        by_status["orderpriority"] = "ALL"
        total = pd.DataFrame({
            "orderstatus": ["ALL"], "orderpriority": ["ALL"],
            "n": [df["n"].sum()], "c": [df["c"].sum()]})
        out = pd.concat([df, by_status, total], ignore_index=True)
        return pa.table({
            "orderstatus": pa.array(out["orderstatus"], pa.string()),
            "orderpriority": pa.array(out["orderpriority"], pa.string()),
            "n_orders": pa.array(out["n"].astype(np.int64)),
            "total_price_cents": pa.array(out["c"].astype(np.int64)),
        })

    return fine.repartition(1).map_batches(
        expand, batch_format="pyarrow", batch_size=None)


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def daily_event_type_pivot(sf_dir: str):
    """(day, n_click, n_error, n_purchase, n_signup, n_view,
    value_milli_purchase): the PIVOT shape — one row per day, one count
    column per event type (frozen EVENT_TYPES order) plus a pivoted
    fixed-point value sum for purchases. Conditional aggregation over
    indicator columns built in the scan; one small groupby(day).
    """
    from ray.data.aggregate import Sum

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "event_type", "value"]) \
        .map_batches(strip_meta, batch_format="pyarrow",
                     zero_copy_batch=True)

    def indicators(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch["ts"], pa.int64()).to_numpy(
            zero_copy_only=False)
        day_us = 86_400 * 1_000_000
        day = (ts // day_us) * day_us
        et = np.asarray(batch["event_type"].to_pylist())
        vm = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                      * 1000).astype(np.int64)
        cols = {"day": pa.array(day.astype("datetime64[us]"))}
        for t in EVENT_TYPES:
            cols[f"n_{t}"] = pa.array((et == t).astype(np.int64))
        cols["value_milli_purchase"] = pa.array(
            np.where(et == "purchase", vm, 0))
        return pa.table(cols)

    aggs = [Sum(f"n_{t}", alias_name=f"n_{t}") for t in EVENT_TYPES]
    aggs.append(Sum("value_milli_purchase",
                    alias_name="value_milli_purchase"))
    agg = ev.map_batches(indicators, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("day").aggregate(*aggs)

    def clean(t: pa.Table) -> pa.Table:
        cols = {"day": t["day"]}
        for c in t.column_names:
            if c != "day":
                cols[c] = pc.cast(t[c], pa.int64())
        return pa.table(cols)

    return agg.map_batches(clean, batch_format="pyarrow")


def orders_above_customer_avg(sf_dir: str, num_buckets: int = 0):
    """(o_orderkey, o_custkey, totalprice_cents, cust_n_orders,
    cust_sum_cents): orders whose price exceeds their OWN customer's
    average order price — the correlated-subquery shape
    (``WHERE price > (SELECT AVG(...) FROM orders o2 WHERE o2.cust =
    o.cust)``), decorrelated into aggregate + join-back.

    Exactness: the comparison is ``cents * n > sum_cents`` (cross-
    multiplied), so no division ever happens — float-free and safe
    for any magnitudes (CLAUDE.md exactness rule).

    Scale shape: per-batch partial (custkey → n, sum) combiner, ONE
    bucketed shuffle on splitmix(custkey) % K with a local polars merge
    (never a #customers-output-group Ray aggregate — CLAUDE.md
    invariant), then one hash join back against the streamed orders
    and a vectorized filter. Both sides of the join stay distributed.
    """
    import polars as _pl

    from dataquality_ray.stages.bucketing import (
        cluster_buckets,
        splitmix_bucket,
    )

    nb = num_buckets or cluster_buckets()
    orders = _table(sf_dir, "orders",
                    columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cents = np.floor(batch["o_totalprice"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        g = (_pl.DataFrame({"o_custkey": ck, "cents": cents})
             .group_by("o_custkey")
             .agg(n=_pl.len().cast(_pl.Int64),
                  s=_pl.col("cents").sum()))
        g = g.with_columns(
            part=_pl.Series(splitmix_bucket(
                g["o_custkey"].to_numpy().astype(np.int64), nb)))
        return g.to_arrow()

    def merge_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        g = (df.groupby("o_custkey", sort=False)
             .agg(cust_n_orders=("n", "sum"),
                  cust_sum_cents=("s", "sum")).reset_index())
        return g

    per_cust = (orders.map_batches(partial, batch_format="pyarrow")
                .groupby("part")
                .map_groups(merge_bucket, batch_format="pandas"))

    def with_cents(batch: pa.Table) -> pa.Table:
        cents = np.floor(batch["o_totalprice"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "o_custkey": batch["o_custkey"],
            "totalprice_cents": pa.array(cents),
        })

    joined = orders.map_batches(with_cents, batch_format="pyarrow") \
        .join(per_cust, join_type="inner",
              num_partitions=max(4, nb // 4), on=("o_custkey",))

    def above(batch: pa.Table) -> pa.Table:
        cents = batch["totalprice_cents"].to_numpy(zero_copy_only=False)
        n = batch["cust_n_orders"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        s = batch["cust_sum_cents"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return batch.filter(pa.array(cents * n > s))

    return joined.map_batches(above, batch_format="pyarrow")


CUBE_ALL = "ALL"   # subtotal marker (TPC-H dims never collide with it)


def revenue_cube(sf_dir: str, num_partitions: int = 8):
    """(nation, mktsegment, n_orders, total_price_cents) under GROUP BY
    CUBE(nation, mktsegment) — all four grouping sets, subtotals marked
    'ALL'. Complements orders_rollup (hierarchical) with the full
    cross-product grouping-set shape.

    Scale shape: orders⋈customer is a bucketed hash join (both sides
    corpus-proportional — no broadcast); the 25-row nation dim IS
    broadcast (ray.put) into the partial pass; every batch emits 4
    partial rows per observed (nation, segment) group — the cube
    expansion happens on combined partials, never on raw rows — and
    the final Ray groupby has ≤ (|nations|+1)×(|segments|+1) output
    groups (constant, not corpus-proportional).
    """
    from ray.data.aggregate import Sum

    nat = _table(sf_dir, "nation",
                 columns=["n_nationkey", "n_name"]).to_pandas()
    n2name_ref = ray.put(dict(zip(nat["n_nationkey"].astype(int),
                                  nat["n_name"])))

    orders = _table(sf_dir, "orders",
                    columns=["o_custkey", "o_totalprice"])
    cust = _table(sf_dir, "customer",
                  columns=["c_custkey", "c_nationkey", "c_mktsegment"])
    j = orders.join(cust, join_type="inner",
                    num_partitions=num_partitions,
                    on=("o_custkey",), right_on=("c_custkey",))

    def partial(batch: pa.Table) -> pa.Table:
        n2name = ray.get(n2name_ref)
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        names = np.asarray([n2name[int(k)] for k in
                            pd.unique(nk)], dtype=object)
        lut = {int(k): i for i, k in enumerate(pd.unique(nk))}
        nation = names[[lut[int(k)] for k in nk]]
        seg = np.asarray(batch["c_mktsegment"].to_pylist(), dtype=object)
        cents = np.floor(batch["o_totalprice"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        base = (pd.DataFrame({"nation": nation, "mktsegment": seg,
                              "n": 1, "c": cents})
                .groupby(["nation", "mktsegment"], sort=False)
                .agg(n=("n", "sum"), c=("c", "sum")).reset_index())
        # cube expansion over the COMBINED partials (4 grouping sets)
        parts = [base]
        for cols in (["nation"], ["mktsegment"], []):
            if cols:
                g = (base.groupby(cols, sort=False)
                     .agg(n=("n", "sum"), c=("c", "sum")).reset_index())
            else:
                g = pd.DataFrame({"n": [base["n"].sum()],
                                  "c": [base["c"].sum()]})
            for missing in {"nation", "mktsegment"} - set(cols):
                g[missing] = CUBE_ALL
            parts.append(g[["nation", "mktsegment", "n", "c"]])
        return from_pandas_clean(pd.concat(parts, ignore_index=True))

    agg = j.map_batches(partial, batch_format="pyarrow") \
        .groupby(["nation", "mktsegment"]) \
        .aggregate(Sum("n", alias_name="n_orders"),
                   Sum("c", alias_name="total_price_cents"))

    def clean(t: pa.Table) -> pa.Table:
        return pa.table({
            "nation": t["nation"],
            "mktsegment": t["mktsegment"],
            "n_orders": pc.cast(t["n_orders"], pa.int64()),
            "total_price_cents": pc.cast(t["total_price_cents"],
                                         pa.int64()),
        })

    return agg.map_batches(clean, batch_format="pyarrow")


Q3_CUTOFF = "1998-01-01"      # o_orderdate < cutoff, l_shipdate > cutoff
Q3_SEGMENT = "BUILDING"
Q3_TOP_K = 20


def shipping_priority_revenue(sf_dir: str, num_partitions: int = 8):
    """TPC-H Q3 analog: top-K unshipped-revenue orders for one market
    segment — (o_orderkey, revenue_cents, o_orderdate, o_orderpriority)
    for customers in Q3_SEGMENT, orders placed before Q3_CUTOFF,
    lineitems shipping after it; ranked by (revenue desc, o_orderkey)
    so the LIMIT is a total order.

    Scale shape: BOTH date predicates are pushed into the parquet scans
    (row-group pruning); revenue is combined per orderkey inside
    map_batches, and the BATCH-LOCAL partials join straight through —
    there is NO global per-orderkey aggregate (that output-∝-orders
    sort-based groupby is the shape CLAUDE.md forbids; both joins are
    1:1 on the partial side, so every partial row survives iff its
    order survives). Totals are completed AFTER the segment+date
    filters shrink the row set: orderkey-hash buckets → one local
    polars groupby per bucket, pruned to the bucket's own top-K, so
    the final sort sees only K_buckets × Q3_TOP_K rows. lineitem⋈orders
    then ⋈customer (segment-filtered at ITS scan) are bucketed hash
    joins with a materialize between (CLAUDE.md invariant). Sums are
    int64 cents — exact under any accumulation split.
    """
    import polars as pl
    import pyarrow.compute as _pc

    cutoff = np.datetime64(Q3_CUTOFF, "us")
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
        filter=(_pc.field("l_shipdate") > cutoff)) \
        .map_batches(strip_meta, batch_format="pyarrow",
                     zero_copy_batch=True)

    def partial(batch: pa.Table) -> pa.Table:
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        dc = batch["l_discount"].to_numpy(zero_copy_only=False)
        g = (pd.DataFrame({
            "l_orderkey": batch["l_orderkey"].to_numpy(
                zero_copy_only=False),
            "c": np.floor(ep * (1 - dc) * 100).astype(np.int64),
        }).groupby("l_orderkey", sort=False)
          .agg(c=("c", "sum")).reset_index())
        return from_pandas_clean(g)

    per_order = li.map_batches(partial, batch_format="pyarrow")

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderpriority"],
        filter=(_pc.field("o_orderdate") < cutoff)) \
        .map_batches(strip_meta, batch_format="pyarrow",
                     zero_copy_batch=True)
    j1 = per_order.join(orders, join_type="inner",
                        num_partitions=num_partitions,
                        on=("l_orderkey",), right_on=("o_orderkey",)) \
        .materialize()

    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
        filter=(_pc.field("c_mktsegment") == Q3_SEGMENT)) \
        .map_batches(strip_meta, batch_format="pyarrow",
                     zero_copy_batch=True)
    j2 = j1.join(cust, join_type="inner",
                 num_partitions=num_partitions,
                 on=("o_custkey",), right_on=("c_custkey",))

    n_buckets = 32

    def bucketize(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "l_orderkey": batch["l_orderkey"],
            "c": batch["c"],
            "o_orderdate": batch["o_orderdate"],
            "o_orderpriority": batch["o_orderpriority"],
            "part": pa.array(ok % n_buckets),
        })

    def per_bucket(group: pa.Table) -> pa.Table:
        # each orderkey lives in exactly one bucket, so the local
        # groupby COMPLETES its total; the bucket's own top-K prune is
        # then safe (a global winner wins its bucket too).
        g = (pl.from_arrow(group)
             .group_by("l_orderkey")
             .agg(pl.col("c").sum(),
                  pl.col("o_orderdate").first(),
                  pl.col("o_orderpriority").first())
             .sort(["c", "l_orderkey"], descending=[True, False])
             .head(Q3_TOP_K))
        return g.to_arrow()

    agg = j2.map_batches(bucketize, batch_format="pyarrow") \
        .groupby("part").map_groups(per_bucket, batch_format="pyarrow")

    top = agg.sort(["c", "l_orderkey"], descending=[True, False]) \
        .limit(Q3_TOP_K)
    df = top.to_pandas()
    out = pd.DataFrame({
        "o_orderkey": df["l_orderkey"].astype("int64"),
        "revenue_cents": df["c"].astype("int64"),
        "o_orderdate": pd.to_datetime(df["o_orderdate"])
            .dt.strftime("%Y-%m-%d"),
        "o_orderpriority": df["o_orderpriority"],
    })
    return from_pandas_clean(out)
