"""Small Arrow helpers shared across stages."""

from __future__ import annotations

import pyarrow as pa


def strip_meta(t: pa.Table) -> pa.Table:
    """Drop schema-level metadata (zero-copy).

    pyarrow hashes ``Schema.metadata`` as a plain dict, so any schema
    carrying metadata (the ``b'pandas'`` blob that ``Table.from_pandas``
    and pandas-written parquet attach) is UNHASHABLE — Ray Data's
    schema-deduplication fast path then logs "Failed to hash the
    schemas" once per block comparison and falls back to a full unify.
    Stripping at the source keeps every downstream schema hashable.
    """
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def from_pandas_clean(df, **kwargs) -> pa.Table:
    """``pa.Table.from_pandas(preserve_index=False)`` without the
    ``b'pandas'`` schema metadata (see strip_meta)."""
    kwargs.setdefault("preserve_index", False)
    return strip_meta(pa.Table.from_pandas(df, **kwargs))
