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


def md5_digests(arr: pa.Array) -> "list[bytes]":
    """16-byte md5 per element of a string array, hashing the utf-8
    bytes zero-copy off the Arrow buffer — Arrow's storage IS the
    utf-8 encoding, so no per-row str decode + re-encode round-trip
    (the content_hash_batch recipe, shared). Null elements hash like
    empty strings (zero-length slice); callers that need different
    null semantics must fill/filter first.
    """
    import hashlib

    import numpy as np
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) \
        else np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset: arr.offset + n + 1]
    buf = arr.buffers()[2]
    data = memoryview(buf) if buf is not None else memoryview(b"")
    md5 = hashlib.md5
    return [md5(data[offs[i]:offs[i + 1]]).digest() for i in range(n)]
