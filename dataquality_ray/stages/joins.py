"""Custom join operators Ray Data lacks natively.

``asof_join_backward`` — the classic time-series "latest right row at or
before each left row's timestamp, per key" join (reference analog: the
corpus lookup joins of routes.py:287-301 are equality lookups; as-of is
the temporal generalization a transcript/event pipeline needs).

Topology (the (a)-composition from the task brief: map_batches +
groupby().map_groups, no raw actors): both sides are tagged and
hash-bucketed on the ``by`` key, unioned into ONE dataset, and a single
``groupby(bucket).map_groups`` runs a vectorized ``pandas.merge_asof``
per bucket.

PARTITIONING ASSUMPTION (documented per the brief): all rows of a ``by``
key co-locate in one bucket — guaranteed by hashing the key itself; a
bucket therefore holds ~|data| / num_buckets rows and must fit one task.
``num_buckets`` is the scale knob (≈ total_bytes / 256 MB at 100 TB);
skew on a hot key is bounded by that key's own row count, never by
unrelated keys sharing a bucket hash.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from dataquality_ray.config import DEFAULT_CONFIG

_MIX = np.uint64(0x9E3779B97F4A7C15)     # splitmix64 constant


def _bucket_of_int_keys(arr: np.ndarray, num_buckets: int) -> np.ndarray:
    u = arr.astype(np.uint64, copy=False)
    with np.errstate(over="ignore"):
        h = u * _MIX
        h = h ^ (h >> np.uint64(29))
    return (h % np.uint64(num_buckets)).astype(np.int32)


def asof_join_backward(left_ds, right_ds, by: str, on: str,
                       left_cols: List[str], right_cols: List[str],
                       right_suffix: str = "_r",
                       tiebreak_col: Optional[str] = None,
                       num_buckets: int = DEFAULT_CONFIG.num_buckets):
    """Backward as-of LEFT join: for every left row, attach the right
    row of the same ``by`` key with the greatest ``on`` <= left ``on``
    (exact matches allowed); unmatched left rows keep nulls.

    ``right_cols`` are emitted with ``right_suffix`` appended (include
    ``on`` there to receive the matched right timestamp).
    ``tiebreak_col``: when several right rows share (by, on), the one
    with the MAX of this column wins (deterministic; mirrors a SQL
    ``GROUP BY by, on`` + ``max()`` pre-aggregation). ``by`` must be an
    integer key (hash-bucketed); extend ``_bucket_of_int_keys`` for
    string keys.
    """
    lschema = _base_schema(left_ds.schema())
    rschema = _base_schema(right_ds.schema())
    ltypes = {c: lschema.field(c).type for c in left_cols}
    rtypes = {c + right_suffix: rschema.field(c).type for c in right_cols}
    renamed = list(rtypes)

    def prep(batch: pa.Table, side: int) -> pa.Table:
        n = batch.num_rows
        keys = batch[by].to_numpy(zero_copy_only=False)
        cols: Dict[str, pa.Array] = {
            "bucket": pa.array(_bucket_of_int_keys(keys, num_buckets)),
            "side": pa.array(np.full(n, side, dtype=np.int8)),
            by: _chunkless(batch[by]),
            on: _chunkless(batch[on]),
        }
        for c in left_cols:
            cols[c] = _chunkless(batch[c]) if side == 0 \
                else pa.nulls(n, ltypes[c])
        for c in right_cols:
            cols[c + right_suffix] = _chunkless(batch[c]) if side == 1 \
                else pa.nulls(n, rtypes[c + right_suffix])
        return pa.table(cols)

    tagged = (left_ds.map_batches(functools.partial(prep, side=0),
                                  batch_format="pyarrow")
              .union(right_ds.map_batches(functools.partial(prep, side=1),
                                          batch_format="pyarrow")))

    tb_renamed = (tiebreak_col + right_suffix) if tiebreak_col else None

    def merge(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        # split sides in ARROW and convert integer payloads through a
        # nullable-Int64 mapper: a plain to_pandas turns int64-with-null
        # columns (the union's placeholder side) into float64, silently
        # corrupting ids past 2^53
        left = _side_frame(t, 0, by, on, left_cols) \
            .sort_values(on, kind="mergesort")
        right = _side_frame(t, 1, by, on, renamed)
        if tb_renamed is not None:
            # max-tiebreak per (by, on): merge_asof takes the LAST row
            # among equal timestamps, so sort the tiebreak ascending and
            # keep the last duplicate
            right = right.sort_values([on, tb_renamed], kind="mergesort") \
                .drop_duplicates([by, on], keep="last")
        else:
            right = right.sort_values(on, kind="mergesort")
        out = pd.merge_asof(left, right, on=on, by=by,
                            direction="backward",
                            allow_exact_matches=True)
        return _strip_to_arrow(
            pa.Table.from_pandas(out, preserve_index=False))

    joined = tagged.groupby("bucket").map_groups(
        merge, batch_format="pyarrow")
    return joined.map_batches(_strip_to_arrow, batch_format="pyarrow",
                              zero_copy_batch=True)


_INT64_MAPPER = (lambda t: pd.Int64Dtype()
                 if pa.types.is_integer(t) else None)


def _side_frame(t: pa.Table, side: int, by: str, on: str,
                payload: List[str]) -> pd.DataFrame:
    import pyarrow.compute as pc
    sub = t.filter(pc.equal(t["side"], side))
    df = pd.DataFrame({
        by: sub[by].to_numpy(zero_copy_only=False),
        on: sub[on].to_pandas(),      # timestamps keep datetime64 (NaT)
    })
    for c in payload:
        col = sub[c]
        if pa.types.is_integer(col.type):
            df[c] = col.to_pandas(types_mapper=_INT64_MAPPER)
        else:
            df[c] = col.to_pandas()
    return df


def _base_schema(schema) -> pa.Schema:
    return getattr(schema, "base_schema", schema)


def _chunkless(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _strip_to_arrow(t: pa.Table) -> pa.Table:
    from dataquality_ray.arrowutil import strip_meta
    return strip_meta(t)
