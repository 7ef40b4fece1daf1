"""Error-row routing (reference M6: metadata.py:284-299,477-492).

The reference never drops a failing document: extraction/LLM errors become
``{status: "error", error: ...}`` rows in the output. At 10^12-turn scale
the same property matters more — one malformed row must not kill a
multi-hour job, and silent row loss is unacceptable.

``route_errors(fn)`` wraps a map_batches function: if the batch fails, it
retries row-by-row; rows that still fail are emitted with their INPUT
columns intact, all fn-added columns null, ``status="error"`` and the
exception text in ``error``. Successful rows get ``status="success"`` and
a null ``error``.
"""

from __future__ import annotations

import functools
from typing import Callable, List

import pyarrow as pa


def _with_status(batch: pa.Table, status: str, error: str | None) -> pa.Table:
    n = batch.num_rows
    batch = batch.append_column(
        "status", pa.array([status] * n, pa.string()))
    batch = batch.append_column(
        "error", pa.array([error] * n, pa.string()))
    return batch


def _null_padded(row: pa.Table, success_schema: pa.Schema,
                 error: str) -> pa.Table:
    """One failed input row, padded to the success schema with nulls."""
    cols = {}
    for field in success_schema:
        if field.name == "status":
            cols[field.name] = pa.array(["error"], pa.string())
        elif field.name == "error":
            cols[field.name] = pa.array([error[:500]], pa.string())
        elif field.name in row.column_names:
            col = row[field.name]
            if col.type != field.type:
                col = col.cast(field.type)
            cols[field.name] = col
        else:
            cols[field.name] = pa.nulls(1, field.type)
    return pa.table(cols)


def route_errors(fn: Callable[[pa.Table], pa.Table]
                 ) -> Callable[[pa.Table], pa.Table]:
    """Wrap a pyarrow batch fn with row-level error routing."""

    @functools.wraps(fn)
    def wrapped(batch: pa.Table) -> pa.Table:
        try:
            return _with_status(fn(batch), "success", None)
        except Exception:
            pass
        # batch failed → isolate per row
        pieces: List[pa.Table] = []
        failures: List[tuple] = []
        success_schema = None
        for i in range(batch.num_rows):
            row = batch.slice(i, 1)
            try:
                ok = _with_status(fn(row), "success", None)
                success_schema = ok.schema
                pieces.append(ok)
            except Exception as exc:  # noqa: BLE001 — routed, not dropped
                failures.append((row, f"{type(exc).__name__}: {exc}"))
        if success_schema is None:
            if failures:
                raise RuntimeError(
                    f"route_errors: every row failed; first error: "
                    f"{failures[0][1]}")
            return _with_status(batch, "success", None)
        for row, err in failures:
            pieces.append(_null_padded(row, success_schema, err))
        return pa.concat_tables(pieces, promote_options="permissive")

    return wrapped
