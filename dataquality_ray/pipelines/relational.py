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
