"""Table-level data-quality profiling and constraint checking.

Deequ / Great-Expectations-style analyzers re-expressed Ray-Data-first
over the transcript table — the table-level analog of the reference's
per-document validation and completeness checks
(/root/reference/backend/app/services/metadata.py:151
``_validate_dimensions`` — presence + range validation of every quality
dimension with defaults for missing ones) and its scan-statistics
surface (/root/reference/backend/app/api/routes.py run summaries).

Three operators, all SQL-checked:

``column_profile``  — per-column (rows, nulls, exact distinct count,
min, max) over every transcript column.
``column_profile_hll`` — the 100-TB default: per-column HyperLogLog
register sketch of the distinct count (exchange bounded at #cols × 64
integer rows at any corpus size).
``constraint_checks`` — a declarative expectation suite: one row per
check with (n_evaluated, n_violations, passed).

Scale shape (the CLAUDE.md invariants): ONE pass of mergeable per-batch
partials for everything row-local (driver volume O(#blocks × #cols)),
and for the parts that genuinely need cross-row state — exact
COUNT(DISTINCT), primary-key uniqueness, per-conversation contiguity /
timestamp monotonicity — ONE bucketed exchange keyed by the frozen
64-bit md5 prefix of the value / conversation id: every key lives in
exactly one bucket, so the fine-grained work completes LOCALLY per
bucket with one vectorized polars kernel (never a #values-output-group
Ray aggregate), and the final reduce is O(buckets). Both partial streams
ride the SAME map_batches output (a ``kind`` discriminator column), so
the input is scanned exactly once.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from dataquality_ray.stages.bucketing import cluster_buckets

# profiled columns of the north-star transcript table, with the type
# class that decides the min/max representation + reduce order:
#   str — lexicographic (UTF-8 byte order == codepoint order, identical
#         in Python and DuckDB's binary collation)
#   int — numeric (repr is CAST(value AS VARCHAR), reduce compares ints)
#   ts  — epoch microseconds as int64 (DuckDB twin: epoch_us(ts))
PROFILE_COLUMNS: tuple[tuple[str, str], ...] = (
    ("conv_id", "str"),
    ("turn_idx", "int"),
    ("role", "str"),
    ("text", "str"),
    ("tool", "str"),
    ("ts", "ts"),
)

# constraint-suite constants (single source of truth — the DuckDB twins
# in __ray_entry__.oracle_sql() are generated from these)
ROLE_SET: tuple[str, ...] = ("assistant", "system", "tool", "user")
TS_LO_US = 1_577_836_800_000_000   # 2020-01-01T00:00:00Z
TS_HI_US = 1_893_456_000_000_000   # 2030-01-01T00:00:00Z

_EMPTY_I64 = pa.array([], pa.int64())


def _md5_u64_lut(strings: list[str]) -> np.ndarray:
    """Frozen 64-bit md5 prefix (little-endian — the repo-wide key
    hash) for each string; routing only, exactness never depends on it
    because every bucket dedups by the actual value."""
    return np.fromiter(
        (int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
         for s in strings),
        dtype=np.uint64, count=len(strings))


def _md5_digests(uniq: pa.Array) -> list[bytes]:
    """Full 16-byte md5 per distinct value — the COUNT(DISTINCT)
    exchange key. Shipping the digest instead of the value bounds the
    per-distinct exchange at 16 B regardless of value width (whole
    ``text`` values would otherwise approach corpus size at scale);
    md5-collision exactness is the same assumption the repo's
    content-hash dedup already makes. Hashes the utf-8 bytes zero-copy
    off the Arrow buffer (arrowutil.md5_digests)."""
    from dataquality_ray.arrowutil import md5_digests
    return md5_digests(uniq)


def _col_as_string_and_minmax(col: pa.Array, kind: str):
    """(repr string array with nulls preserved, min_repr, max_repr) for
    one column chunk; min/max are taken on the NATIVE type first and
    then rendered, so numeric columns are never compared as strings."""
    if kind == "ts":
        ints = pc.cast(col, pa.int64())
        vals = pc.cast(ints, pa.string())
        mm = pc.min_max(ints)
    elif kind == "int":
        ints = pc.cast(col, pa.int64())
        vals = pc.cast(ints, pa.string())
        mm = pc.min_max(ints)
    else:
        vals = col if pa.types.is_string(col.type) \
            else pc.cast(col, pa.string())
        mm = pc.min_max(vals)
    mn, mx = mm["min"].as_py(), mm["max"].as_py()
    return vals, (None if mn is None else str(mn)), \
        (None if mx is None else str(mx))


def column_profile(ds, num_buckets: int = 0):
    """Per-column profile of the transcript table: ``(col_name, n_rows,
    n_null, n_distinct, min_repr, max_repr)`` — exact distinct counts
    via per-batch local dedup → one digest-bucketed exchange carrying
    the 16-byte md5 of each distinct value (never the value itself, so
    the exchange for wide columns like ``text`` is 16 B/distinct) →
    per-bucket dedup by digest (each digest lives in exactly one
    bucket; md5-collision exact, the same assumption as content-hash
    dedup) → O(buckets) final sum. min/max stay in the per-batch
    native-type partial stream. SQL twin: UNION ALL of per-column
    COUNT / COUNT(DISTINCT) / MIN / MAX aggregates."""
    import polars as pl

    nb = num_buckets or cluster_buckets()

    def partial(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        pieces = []
        stat_col, stat_v, stat_v2, stat_a, stat_b = [], [], [], [], []
        for name, kind in PROFILE_COLUMNS:
            col = batch[name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            vals, mn_r, mx_r = _col_as_string_and_minmax(col, kind)
            uniq = pc.unique(pc.drop_null(vals))
            digs = _md5_digests(uniq)
            part = (np.fromiter(
                (int.from_bytes(d[:8], "little") for d in digs),
                dtype=np.uint64, count=len(digs))
                % np.uint64(nb)).astype(np.int32)
            k = len(uniq)
            pieces.append(pa.table({
                "kind": pa.array(np.zeros(k, np.int32)),
                "col": pa.array([name] * k, pa.string()),
                # 16-byte digest (hex) rides the exchange, NOT the
                # value — bounds the distinct exchange for wide
                # columns (text) at 16 B/distinct
                "v": pa.array([d.hex() for d in digs], pa.string()),
                "v2": pa.array([None] * k, pa.string()),
                "a": pa.array(np.zeros(k, np.int64)),
                "b": pa.array(np.zeros(k, np.int64)),
                "part": pa.array(part),
            }))
            stat_col.append(name)
            stat_v.append(mn_r)
            stat_v2.append(mx_r)
            stat_a.append(col.null_count)
            stat_b.append(n)
        pieces.append(pa.table({
            "kind": pa.array(np.ones(len(stat_col), np.int32)),
            "col": pa.array(stat_col, pa.string()),
            "v": pa.array(stat_v, pa.string()),
            "v2": pa.array(stat_v2, pa.string()),
            "a": pa.array(stat_a, pa.int64()),
            "b": pa.array(stat_b, pa.int64()),
            "part": pa.array(np.zeros(len(stat_col), np.int32)),
        }))
        return pa.concat_tables(pieces)

    def per_bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["kind", "col", "v", "v2", "a", "b"]))
        stats = df.filter(pl.col("kind") == 1)
        dist = (df.filter(pl.col("kind") == 0)
                .select(["col", "v"]).unique()
                .group_by("col")
                .agg(pl.len().cast(pl.Int64).alias("a"))
                .with_columns(
                    kind=pl.lit(2, pl.Int32),
                    v=pl.lit(None, pl.String),
                    v2=pl.lit(None, pl.String),
                    b=pl.lit(0, pl.Int64),
                ).select(["kind", "col", "v", "v2", "a", "b"]))
        out = pl.concat([stats.select(dist.columns), dist]).to_arrow()
        return out.cast(pa.schema([
            ("kind", pa.int32()), ("col", pa.string()),
            ("v", pa.string()), ("v2", pa.string()),
            ("a", pa.int64()), ("b", pa.int64())]))

    rows = (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("part")
            .map_groups(per_bucket, batch_format="pyarrow")
            .take_all())    # O(#blocks × #cols + buckets × #cols)

    int_like = {n for n, k in PROFILE_COLUMNS if k in ("int", "ts")}
    agg = {n: {"rows": 0, "null": 0, "dist": 0, "mn": None, "mx": None}
           for n, _ in PROFILE_COLUMNS}
    for r in rows:
        st = agg[r["col"]]
        if r["kind"] == 2:
            st["dist"] += r["a"]
            continue
        st["rows"] += r["b"]
        st["null"] += r["a"]
        for key, val, op in (("mn", r["v"], min), ("mx", r["v2"], max)):
            if val is None:
                continue
            cur = st[key]
            if cur is None:
                st[key] = val
            elif r["col"] in int_like:
                st[key] = str(op(int(cur), int(val)))
            else:
                st[key] = op(cur, val)

    names = sorted(agg)
    return pa.table({
        "col_name": pa.array(names, pa.string()),
        "n_rows": pa.array([agg[n]["rows"] for n in names], pa.int64()),
        "n_null": pa.array([agg[n]["null"] for n in names], pa.int64()),
        "n_distinct": pa.array([agg[n]["dist"] for n in names],
                               pa.int64()),
        "min_repr": pa.array([agg[n]["mn"] for n in names], pa.string()),
        "max_repr": pa.array([agg[n]["mx"] for n in names], pa.string()),
    })


def column_profile_hll(ds):
    """(col_name, reg, rho): HyperLogLog register sketch of per-column
    distinct counts — the documented 100-TB DEFAULT profile. Where
    ``column_profile`` ships one 16-byte digest per distinct value
    (exact, but the exchange still grows with the distinct count),
    this variant's exchange is <= #cols × 64 integer rows TOTAL at any
    corpus size: per-batch register partials merge by MAX under any
    partitioning. Register/rho arithmetic is byte-identical to
    distinct_users_hll (shared hll_reg_rho kernel over the frozen
    md5-u64 of the same per-kind value reprs column_profile uses), so
    the register surface is exact integers and SQL-checkable; the
    float estimate derives from the registers driver-side."""
    import polars as pl
    from ray.data.aggregate import Max

    from dataquality_ray.arrowutil import md5_digests
    from dataquality_ray.pipelines.metrics import hll_reg_rho

    def partial(batch: pa.Table) -> pa.Table:
        names, regs, rhos = [], [], []
        for name, kind in PROFILE_COLUMNS:
            col = batch[name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            vals, _, _ = _col_as_string_and_minmax(col, kind)
            uniq = pc.unique(pc.drop_null(vals))
            if len(uniq) == 0:
                continue
            # token_hash_u64 == first 8 md5 bytes LE; hash the utf-8
            # bytes zero-copy off the Arrow buffer
            hv = np.fromiter(
                (int.from_bytes(d[:8], "little")
                 for d in md5_digests(uniq)),
                dtype=np.uint64, count=len(uniq))
            reg, rho = hll_reg_rho(hv)
            names.append(np.full(len(reg), name, dtype=object))
            regs.append(reg)
            rhos.append(rho)
        if not names:
            return pa.table({"col_name": pa.array([], pa.string()),
                             "reg": _EMPTY_I64, "rho": _EMPTY_I64})
        g = (pl.DataFrame({
            "col_name": np.concatenate(names),
            "reg": np.concatenate(regs),
            "rho": np.concatenate(rhos),
        }).group_by(["col_name", "reg"])
          .agg(pl.col("rho").max()))
        return g.to_arrow().cast(pa.schema([
            ("col_name", pa.string()), ("reg", pa.int64()),
            ("rho", pa.int64())]))

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby(["col_name", "reg"]).aggregate(
            Max("rho", alias_name="rho"))

    def clean(t: pa.Table) -> pa.Table:
        return pa.table({
            "col_name": t["col_name"],
            "reg": pc.cast(t["reg"], pa.int64()),
            "rho": pc.cast(t["rho"], pa.int64()),
        })

    return agg.map_batches(clean, batch_format="pyarrow")


# (check_name, scope) in output order; scope decides n_evaluated
CHECKS: tuple[tuple[str, str], ...] = (
    ("pk_unique", "rows"),
    ("role_in_set", "rows"),
    ("text_not_empty", "rows"),
    ("tool_role_consistent", "rows"),
    ("ts_in_range", "rows"),
    ("ts_monotone_per_conv", "convs"),
    ("turn_idx_contiguous", "convs"),
    ("turn_idx_nonneg", "rows"),
)


def constraint_checks(ds, num_buckets: int = 0):
    """Declarative expectation suite over the transcript table:
    ``(check_name, n_evaluated, n_violations, passed)``.

    Row-local checks (role set, empty text, tool/role consistency,
    turn_idx sign, ts range) are vectorized per-batch counters summed on
    the driver. Cross-row checks — (conv_id, turn_idx) primary-key
    uniqueness, per-conversation turn_idx contiguity (min=0 and
    max+1 = #distinct turns) and timestamp monotonicity under
    (turn_idx, ts) order — ride ONE bucketed exchange keyed by
    md5(conv_id) % K carrying only (conv_id, turn_idx, ts_us), with the
    actual conv_id string kept so bucket-local dedup is exact (no
    hash-collision caveat)."""
    import polars as pl

    nb = num_buckets or cluster_buckets()
    role_arr = pa.array(list(ROLE_SET), pa.string())

    def _count(mask) -> int:
        s = pc.sum(pc.cast(mask, pa.int64())).as_py()
        return int(s or 0)

    def partial(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        role = batch["role"]
        tool = batch["tool"]
        ts_us = pc.cast(batch["ts"], pa.int64())
        counters = {
            "n_rows": n,
            # SQL NULL semantics: a NULL role is not a set violation
            # (it is surfaced by the profile's n_null instead)
            "v_role": _count(pc.and_(
                pc.is_valid(role),
                pc.invert(pc.is_in(role, value_set=role_arr)))),
            "v_empty": _count(pc.equal(pc.utf8_length(batch["text"]), 0)),
            "v_tool": _count(pc.xor(
                pc.equal(tool, ""), pc.not_equal(role, "tool"))),
            "v_neg": _count(pc.less(batch["turn_idx"], 0)),
            "v_ts": _count(pc.or_(pc.less(ts_us, TS_LO_US),
                                  pc.greater_equal(ts_us, TS_HI_US))),
        }
        conv = batch["conv_id"]
        if isinstance(conv, pa.ChunkedArray):
            conv = conv.combine_chunks()
        enc = conv.dictionary_encode()
        lut = _md5_u64_lut(
            [d if d is not None else ""
             for d in enc.dictionary.to_pylist()])
        # NULL conv_ids route to bucket 0 (they still form one group —
        # SQL GROUP BY keeps a NULL group; the conv_id column itself
        # stays null so bucket-local grouping is exact)
        idx = pc.fill_null(enc.indices, 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        part = np.where(
            pc.is_valid(conv).to_numpy(zero_copy_only=False),
            (lut[idx] % np.uint64(nb)).astype(np.int32),
            np.int32(0))
        conv_rows = pa.table({
            "kind": pa.array(np.zeros(n, np.int32)),
            "name": conv,
            "ti": pc.cast(batch["turn_idx"], pa.int64()),
            "ts": ts_us,
            "part": pa.array(part),
        })
        stat_rows = pa.table({
            "kind": pa.array(np.ones(len(counters), np.int32)),
            "name": pa.array(list(counters), pa.string()),
            "ti": pa.array([int(v) for v in counters.values()],
                           pa.int64()),
            "ts": pa.array(np.zeros(len(counters), np.int64)),
            "part": pa.array(np.zeros(len(counters), np.int32)),
        })
        return pa.concat_tables([conv_rows, stat_rows])

    def per_bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["kind", "name", "ti", "ts"]))
        stats = df.filter(pl.col("kind") == 1)
        conv = df.filter(pl.col("kind") == 0)
        out = {}
        if conv.height:
            out["v_dup_pk"] = conv.height - \
                conv.select(["name", "ti"]).unique().height
            g = conv.group_by("name").agg(
                mn=pl.col("ti").min(),
                mx=pl.col("ti").max(),
                # COUNT(DISTINCT turn_idx) — NULLs excluded, as in SQL
                d=pl.col("ti").drop_nulls().n_unique()
                .cast(pl.Int64))
            out["n_convs"] = g.height
            out["v_contig"] = g.filter(
                (pl.col("mn") != 0)
                | (pl.col("mx") + 1 != pl.col("d"))).height
            # nulls_last matches DuckDB's default ORDER BY placement;
            # comparisons against a NULL neighbor are NULL on both
            # sides and never count as an inversion
            mono = (conv.sort(["name", "ti", "ts"], nulls_last=True)
                    .with_columns(
                        bad=(pl.col("ts").diff().over("name") < 0)))
            out["v_mono"] = (mono.group_by("name")
                             .agg(pl.col("bad").any())
                             .filter(pl.col("bad")).height)
        extra = pl.DataFrame({
            "kind": pl.Series(
                [2] * len(out), dtype=pl.Int32),
            "name": pl.Series(list(out), dtype=pl.String),
            "ti": pl.Series([int(v) for v in out.values()],
                            dtype=pl.Int64),
            "ts": pl.Series([0] * len(out), dtype=pl.Int64),
        })
        out = pl.concat(
            [stats.select(["kind", "name", "ti", "ts"]), extra]
        ).to_arrow()
        return out.cast(pa.schema([
            ("kind", pa.int32()), ("name", pa.string()),
            ("ti", pa.int64()), ("ts", pa.int64())]))

    rows = (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("part")
            .map_groups(per_bucket, batch_format="pyarrow")
            .take_all())    # O(#blocks + buckets) tiny partial rows

    totals: dict[str, int] = {}
    for r in rows:
        totals[r["name"]] = totals.get(r["name"], 0) + int(r["ti"])

    n_rows = totals.get("n_rows", 0)
    n_convs = totals.get("n_convs", 0)
    viol = {
        "pk_unique": totals.get("v_dup_pk", 0),
        "role_in_set": totals.get("v_role", 0),
        "text_not_empty": totals.get("v_empty", 0),
        "tool_role_consistent": totals.get("v_tool", 0),
        "ts_in_range": totals.get("v_ts", 0),
        "ts_monotone_per_conv": totals.get("v_mono", 0),
        "turn_idx_contiguous": totals.get("v_contig", 0),
        "turn_idx_nonneg": totals.get("v_neg", 0),
    }
    names = [c for c, _ in CHECKS]
    n_eval = [n_rows if scope == "rows" else n_convs
              for _, scope in CHECKS]
    return pa.table({
        "check_name": pa.array(names, pa.string()),
        "n_evaluated": pa.array(n_eval, pa.int64()),
        "n_violations": pa.array([viol[c] for c in names], pa.int64()),
        "passed": pa.array([1 if viol[c] == 0 else 0 for c in names],
                           pa.int64()),
    })
