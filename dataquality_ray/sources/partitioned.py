"""Date-partitioned Parquet sink (reference S8: the "Iceberg-like"
``metadata/year=.../month=.../day=...`` layout, s3.py:89-128) —
re-expressed as hive-partitioned ``write_parquet(partition_cols=...)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def add_date_partitions(batch: pa.Table, ts_col: str = "ts") -> pa.Table:
    """Append year/month/day int32 columns derived from a timestamp col."""
    ts = batch[ts_col]
    if isinstance(ts, pa.ChunkedArray):
        ts = ts.combine_chunks()
    batch = batch.append_column(
        "year", pc.cast(pc.year(ts), pa.int32()))
    batch = batch.append_column(
        "month", pc.cast(pc.month(ts), pa.int32()))
    batch = batch.append_column(
        "day", pc.cast(pc.day(ts), pa.int32()))
    return batch


def write_partitioned_by_day(ds, out_dir: str, ts_col: str = "ts") -> None:
    """Write hive-style year=/month=/day= partitions — the resumable
    layout rule: one directory per partition key, never one giant file."""
    import functools
    ds = ds.map_batches(
        functools.partial(add_date_partitions, ts_col=ts_col),
        batch_format="pyarrow", zero_copy_batch=True)
    ds.write_parquet(out_dir, partition_cols=["year", "month", "day"])
