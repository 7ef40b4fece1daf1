"""Dedup stages — exact (content hash), MinHash-LSH near-dup, SimHash.

Replaces the reference's O(n²) pairwise gated-cosine loop
(metadata.py:514-624) with shuffle-based dedup:

- **exact**: normalize → md5 content hash → hash-bucket shuffle →
  per-bucket vectorized canonical assignment: canonical = min
  (conv_id, turn_idx) per hash, others get ``dup_of`` (analog of the
  reference's seen-pairs dedup, metadata.py:650-667).
- **near-dup**: word-token MinHash signatures (128 perms, frozen seeds) →
  banded LSH keys (32 bands × 4 rows: P[detect j=0.8] ≈ 1 − 5e-8) →
  bucket shuffle → candidate pairs within band groups → exact token-set
  Jaccard verification (precision is exact; the reference's gate ≥0.7 +
  cosine ≥0.95, metadata.py:536,599, maps to one Jaccard threshold).
- **SimHash**: 64-bit signature + Hamming distance as the cosine analog.

Shuffle pattern (the scale-critical choice): instead of
``groupby(key).map_groups`` — which pays per-group Python overhead for
millions of tiny groups — rows are assigned a **hash bucket**
(``md5(key)[:4] % B``) and grouped by bucket; inside each bucket one
vectorized pandas groupby handles all keys at once. B is the knob that
must scale with data volume (bucket ≈ rows/B must fit one task); empty
texts get a per-row unique key so no mega-group forms (skew guard).
"""

from __future__ import annotations

import functools
import hashlib
import logging
from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from dataquality_ray.config import DEFAULT_CONFIG, PipelineConfig
from dataquality_ray.spec import (
    TOKEN_PATTERN,
    minhash_params,
    token_hash_u64,
)

logger = logging.getLogger("dataquality_ray.dedup")


def _log_capped_groups(where: str, n_groups: int, max_size: int,
                       largest: int) -> None:
    """Counter/log for band groups truncated at cfg.max_lsh_bucket —
    truncation trades recall for bounded work on hot bands (see the
    simhash_near_dup docstring for the recall caveat)."""
    logger.warning(
        "%s: %d band group(s) exceeded max_lsh_bucket=%d (largest=%d); "
        "members beyond the cap were dropped from pairing",
        where, n_groups, max_size, largest)


def _drop_bucket_strip(t: pa.Table) -> pa.Table:
    """Drop the pair_bucket helper AND any schema metadata picked up by
    the pandas->arrow conversion (metadata-carrying schemas are
    unhashable — see arrowutil.strip_meta)."""
    from dataquality_ray.arrowutil import strip_meta
    return strip_meta(t.drop_columns(["pair_bucket"]))


def _bucket_of(key: str, num_buckets: int) -> int:
    return int.from_bytes(hashlib.md5(key.encode()).digest()[:4], "little") \
        % num_buckets


def distinct_pairs(ds, col_a: str = "key_a", col_b: str = "key_b",
                   num_buckets: int = DEFAULT_CONFIG.num_buckets):
    """Global distinct over a pair Dataset: bucket each pair by a hash
    of its two keys (string keys → md5; integer keys → splitmix mix),
    drop duplicates per bucket. The shared tail of every LSH/candidate
    pair pipeline (a pair can surface from multiple bands/terms)."""

    def add_pb(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        a, b = df[col_a], df[col_b]
        if pd.api.types.is_integer_dtype(a):
            ua = a.to_numpy().astype(np.uint64)
            ub = b.to_numpy().astype(np.uint64)
            with np.errstate(over="ignore"):
                df["pair_bucket"] = (((ua * _BAND_MIX_P1) ^ ub)
                                     % np.uint64(num_buckets)) \
                    .astype(np.int32)
        else:
            df["pair_bucket"] = [
                _bucket_of(f"{x}|{y}", num_buckets)
                for x, y in zip(a, b)]
        return df

    return (ds.map_batches(add_pb, batch_format="pandas")
            .groupby("pair_bucket")
            .map_groups(lambda g: g.drop_duplicates([col_a, col_b]),
                        batch_format="pandas")
            .map_batches(_drop_bucket_strip, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# content hash (exact dedup key)
# ---------------------------------------------------------------------------

def content_hash_batch(batch: pa.Table, text_col: str = "text",
                       num_buckets: int = DEFAULT_CONFIG.num_buckets
                       ) -> pa.Table:
    """Append content_hash, is_empty_norm, order_key, dedup_key, hash_bucket.

    Normalization (lower, trim, collapse whitespace) is vectorized in
    Arrow; the md5 loop is C-speed via hashlib. ``dedup_key`` is the
    content hash for non-empty rows and a per-row unique key for empty
    ones (skew guard: empties never form a group).
    """
    from dataquality_ray.spec import EDGE_WS_PATTERN, WS_PLUS_PATTERN
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    norm = pc.replace_substring_regex(
        pc.replace_substring_regex(pc.utf8_lower(text), EDGE_WS_PATTERN, ""),
        WS_PLUS_PATTERN, " ")

    if "order_key" not in batch.column_names:
        conv = batch["conv_id"]
        turn = pc.utf8_lpad(pc.cast(batch["turn_idx"], pa.string()), 8, "0")
        batch = batch.append_column(
            "order_key", pc.binary_join_element_wise(conv, turn, "#"))

    # md5 over zero-copy utf-8 slices straight off the Arrow buffer —
    # Arrow's storage IS the utf-8 encoding, so no per-row str decode +
    # re-encode round-trip
    n = len(norm)
    off_dtype = np.int64 if pa.types.is_large_string(norm.type) \
        else np.int32
    offs = np.frombuffer(norm.buffers()[1], dtype=off_dtype)[
        norm.offset: norm.offset + n + 1]
    data = memoryview(norm.buffers()[2])
    hashes: List[str] = [""] * n
    buckets = np.empty(n, dtype=np.int32)
    md5 = hashlib.md5
    from_bytes = int.from_bytes
    for i in range(n):
        digest = md5(data[offs[i]:offs[i + 1]]).digest()
        hashes[i] = digest.hex()
        # bucket straight from the digest bytes — one md5 per row
        buckets[i] = from_bytes(digest[:4], "little") % num_buckets
    dedup_keys: List[str] = hashes.copy()
    empties = np.flatnonzero(offs[1:] == offs[:-1])
    if len(empties):
        # per-row unique keys for empty-norm rows (skew guard: empties
        # never form a dedup group); order keys fetched only for these
        oks = batch["order_key"].take(pa.array(empties)).to_pylist()
        for j, i in enumerate(empties):
            dk = f"e:{oks[j]}"
            dedup_keys[i] = dk
            buckets[i] = _bucket_of(dk, num_buckets)

    empty = pc.equal(pc.utf8_length(norm), 0)
    batch = batch.append_column("content_hash", pa.array(hashes, pa.string()))
    batch = batch.append_column("is_empty_norm", empty)
    batch = batch.append_column("dedup_key", pa.array(dedup_keys, pa.string()))
    batch = batch.append_column("hash_bucket", pa.array(buckets))
    return batch


def fingerprint_batch(batch: pa.Table, text_col: str = "text",
                      out_col: str = "fingerprint") -> pa.Table:
    """Vectorized ``spec.rolling_fingerprint`` over a batch: one numpy
    polynomial-hash evaluation per row (codepoint array × powers of
    FP_MULT, uint64 wraparound = mod 2^64) instead of a per-character
    Python loop. Normalization (lower/trim/collapse) runs in Arrow RE2
    kernels. Bit-identical to the scalar spec (tested)."""
    from dataquality_ray.spec import EDGE_WS_PATTERN, WS_PLUS_PATTERN
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    norm = pc.replace_substring_regex(
        pc.replace_substring_regex(pc.utf8_lower(text), EDGE_WS_PATTERN, ""),
        WS_PLUS_PATTERN, " ")
    return batch.append_column(
        out_col, pa.array(fingerprints_of_norm(norm.to_pylist())))


def fingerprints_of_norm(norm_texts: List[str]) -> np.ndarray:
    """uint64 polynomial fingerprints of ALREADY-normalized strings."""
    from dataquality_ray.spec import FP_MULT, FP_OFFSET
    mult = np.uint64(FP_MULT)
    off = np.uint64(FP_OFFSET)
    out = np.empty(len(norm_texts), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, s in enumerate(norm_texts):
            codes = np.frombuffer(s.encode("utf-32-le"),
                                  dtype=np.uint32).astype(np.uint64)
            n = len(codes)
            if n == 0:
                out[i] = off
                continue
            powers = np.empty(n, dtype=np.uint64)
            powers[0] = 1
            if n > 1:
                np.cumprod(np.full(n - 1, mult, dtype=np.uint64),
                           out=powers[1:])
            out[i] = off * (powers[-1] * mult) \
                + np.sum(codes * powers[::-1], dtype=np.uint64)
    return out


def _bucket_dedup(df: pd.DataFrame) -> pd.DataFrame:
    """Per-bucket vectorized canonical assignment (one pandas groupby)."""
    df = df.sort_values(["dedup_key", "order_key"], kind="mergesort")
    canon = df.groupby("dedup_key", sort=False)["order_key"].transform("first")
    dup = np.where(canon.to_numpy() == df["order_key"].to_numpy(),
                   None, canon.to_numpy())
    df = df.copy()
    df["dup_of"] = pd.Series(dup, index=df.index, dtype=object)
    return df


def _to_arrow_dup(batch: pa.Table) -> pa.Table:
    """Coerce blocks back to Arrow and pin dup_of to string (an all-None
    pandas object column would otherwise infer as null type)."""
    idx = batch.schema.get_field_index("dup_of")
    if batch.schema.field(idx).type != pa.string():
        batch = batch.set_column(
            idx, "dup_of", pc.cast(batch["dup_of"], pa.string()))
    return batch


def exact_dedup(ds, cfg: PipelineConfig = DEFAULT_CONFIG):
    """Dataset-level exact dedup: bucket shuffle → dup_of column.

    Expects content_hash_batch columns. One all-to-all (groupby
    hash_bucket); B = cfg.num_buckets groups, each processed by one
    vectorized pandas pass. This is the general path (no assumption on
    duplicate-map size); the cheaper broadcast path below is preferred
    when the set of duplicated hashes fits in worker memory.
    """
    deduped = ds.groupby("hash_bucket").map_groups(
        _bucket_dedup, batch_format="pandas")
    return deduped.map_batches(_to_arrow_dup, batch_format="pyarrow",
                               zero_copy_batch=True)


# ---------------------------------------------------------------------------
# broadcast dup-map dedup (narrow-shuffle + broadcast join)
# ---------------------------------------------------------------------------

def compute_dup_map_from_hashed(hashed_ds,
                                cfg: PipelineConfig = DEFAULT_CONFIG
                                ) -> dict:
    """Duplicate map from a dataset that ALREADY carries dedup_key /
    order_key / hash_bucket / is_empty_norm (e.g. a narrow column-pruned
    read of a scored checkpoint — no re-scrub / re-hash)."""

    def partial(batch: pa.Table) -> pa.Table:
        tbl = pa.table({
            "bucket": batch["hash_bucket"],
            "dedup_key": batch["dedup_key"],
            "order_key": batch["order_key"],
        }).filter(pc.invert(
            batch["is_empty_norm"].combine_chunks()
            if isinstance(batch["is_empty_norm"], pa.ChunkedArray)
            else batch["is_empty_norm"]))
        g = tbl.group_by(["bucket", "dedup_key"]).aggregate(
            [("order_key", "min"), ("order_key", "count")])
        return g.rename_columns(["bucket", "dedup_key", "min_key", "cnt"])

    def reduce_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("dedup_key", sort=False)
             .agg(canonical=("min_key", "min"), n=("cnt", "sum"))
             .reset_index())
        return g[g["n"] >= 2][["dedup_key", "canonical"]]

    narrow = hashed_ds.map_batches(partial, batch_format="pyarrow") \
                      .repartition(max(8, cfg.num_buckets // 2))
    dups = (narrow.groupby("bucket")
            .map_groups(reduce_bucket, batch_format="pandas")
            .to_pandas())
    return dict(zip(dups["dedup_key"], dups["canonical"]))


def compute_dup_map(raw_ds, cfg: PipelineConfig = DEFAULT_CONFIG) -> dict:
    """Duplicate map {content_hash → canonical order_key} from a CHEAP
    side pipeline over the raw transcripts (scrub + normalize + hash only
    — no model scoring): per-batch partial (hash, min key, count) →
    narrow groupby → keep only hashes with count ≥ 2.

    Shuffle volume = two short strings + an int per row (vs full rows in
    ``exact_dedup``); the returned map holds only *duplicated* hashes, so
    it broadcasts. Scale limit: if the duplicated-hash set outgrows
    worker memory, fall back to ``exact_dedup`` (dedup_mode="shuffle").
    """
    from dataquality_ray.stages.scrub import scrub_batch

    def partial(batch: pa.Table) -> pa.Table:
        batch = scrub_batch(batch, with_counts=False)
        batch = content_hash_batch(batch, num_buckets=cfg.num_buckets)
        tbl = pa.table({
            "bucket": batch["hash_bucket"],
            "dedup_key": batch["dedup_key"],
            "order_key": batch["order_key"],
        }).filter(pc.invert(batch["is_empty_norm"]))
        g = tbl.group_by(["bucket", "dedup_key"]).aggregate(
            [("order_key", "min"), ("order_key", "count")])
        return g.rename_columns(["bucket", "dedup_key", "min_key", "cnt"])

    def reduce_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("dedup_key", sort=False)
             .agg(canonical=("min_key", "min"), n=("cnt", "sum"))
             .reset_index())
        return g[g["n"] >= 2][["dedup_key", "canonical"]]

    # groupby on the int32 bucket (cheap sort) — per-bucket pandas reduce.
    # Coalesce the narrow partials first: the groupby's sort shuffle costs
    # #blocks × #partitions scheduling, so fewer, larger blocks win.
    narrow = raw_ds.map_batches(partial, batch_format="pyarrow") \
                   .repartition(max(8, cfg.num_buckets // 2))
    dups = (narrow.groupby("bucket")
            .map_groups(reduce_bucket, batch_format="pandas")
            .to_pandas())
    return dict(zip(dups["dedup_key"], dups["canonical"]))


# ---------------------------------------------------------------------------
# inline dup-map side channel (zero extra pass over the corpus)
# ---------------------------------------------------------------------------
# The scoring pipeline's hash stage pushes per-batch partial aggregates
# (dedup_key → min order_key, count) to a small set of zero-CPU aggregator
# actors and AWAITS the acks, so "hash stage complete" ⇒ "dup map
# complete". Any full barrier downstream (the global sort, or an explicit
# materialize) then makes it safe for a later stage to read the merged
# map. Merges are min/sum — order-independent — and batches are
# content-addressed so a retried task cannot double-count.


def make_dup_aggregators(num: Optional[int] = None,
                         max_total_keys: int =
                         DEFAULT_CONFIG.max_inline_map_keys):
    """Zero-CPU dup-map shard actors. ``num`` defaults to cluster_CPUs/4
    (min 4) so the shard fan-in scales with the cluster instead of a
    fixed 8. ``max_total_keys`` caps the TOTAL distinct keys across all
    shards — the map is corpus-proportional, so past the cap the hash
    stage fails loudly (pointing at dedup_mode="shuffle") instead of
    letting a shard actor OOM."""
    import ray

    if num is None:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        num = max(4, cpus // 4)
    cap_per_shard = max(1, max_total_keys // num)

    @ray.remote(num_cpus=0)
    class DupMapAggregator:
        """Holds a shard of the {dedup_key → (min order_key, count)} map."""

        def __init__(self, cap: int) -> None:
            self.cap = cap
            self.min_key: Dict[str, str] = {}
            self.cnt: Dict[str, int] = {}
            self.seen: set = set()

        def add(self, batch_id: bytes, keys, order_keys, counts) -> None:
            if batch_id in self.seen:      # task retry replayed this batch
                return
            mk, ct = self.min_key, self.cnt
            # check BEFORE recording the batch: a raise must stay a
            # raise on retry, not a silent seen-set no-op
            if len(mk) + len(keys) > self.cap:
                raise RuntimeError(
                    f"inline dup-map shard would exceed its key cap "
                    f"({self.cap} keys/shard; cfg.max_inline_map_keys "
                    f"total): the corpus has more unique texts than the "
                    f"inline side-channel can hold in actor memory. Use "
                    f"dedup_mode='shuffle' (bucketed groupby, no size "
                    f"assumption) or raise cfg.max_inline_map_keys.")
            self.seen.add(batch_id)
            for k, ok, c in zip(keys, order_keys, counts):
                prev = mk.get(k)
                if prev is None or ok < prev:
                    mk[k] = ok
                ct[k] = ct.get(k, 0) + c

        def dups(self) -> dict:
            return {k: self.min_key[k]
                    for k, c in self.cnt.items() if c >= 2}

        def own_ref(self):
            """Publish THIS shard's dup map as two SORTED numpy byte
            arrays in plasma (computed once). Shards build their arrays
            CONCURRENTLY — there is no single serial whole-map merge
            (the old design's first caller paid an all-shard merge, a
            fixed serial cost that scaled with the corpus); workers read
            every shard's arrays zero-copy and route lookups by the same
            key-hash the push side shards on."""
            import numpy as _np

            import ray as _ray
            if not hasattr(self, "_own"):
                m = self.dups()
                if m:
                    ks = sorted(m)          # ASCII: str order == S order
                    keys = _np.array(ks, dtype="S")
                    vals = _np.array([m[k] for k in ks], dtype="S")
                else:
                    keys = _np.array([], dtype="S1")
                    vals = _np.array([], dtype="S1")
                self._own = _ray.put((keys, vals))
            return self._own

    return [DupMapAggregator.remote(cap_per_shard) for _ in range(num)]


def content_hash_with_side_map(batch: pa.Table, handles,
                               text_col: str = "text",
                               num_buckets: int = DEFAULT_CONFIG.num_buckets
                               ) -> pa.Table:
    """content_hash_batch + push this batch's dup-map partial to the
    aggregator shard actors (awaited, see module comment)."""
    import hashlib as _hashlib

    import ray

    batch = content_hash_batch(batch, text_col=text_col,
                               num_buckets=num_buckets)
    tbl = pa.table({
        "dedup_key": batch["dedup_key"],
        "order_key": batch["order_key"],
    }).filter(pc.invert(
        batch["is_empty_norm"].combine_chunks()
        if isinstance(batch["is_empty_norm"], pa.ChunkedArray)
        else batch["is_empty_norm"]))
    if tbl.num_rows:
        g = tbl.group_by("dedup_key").aggregate(
            [("order_key", "min"), ("order_key", "count")])
        keys = g["dedup_key"].to_pylist()
        mins = g["order_key_min"].to_pylist()
        cnts = g["order_key_count"].to_pylist()
        # content-addressed batch id (idempotent under task retry)
        bid = _hashlib.blake2b(
            "\x1f".join(tbl["order_key"].to_pylist()).encode(),
            digest_size=16).digest()
        n = len(handles)
        shard: List[List[int]] = [[] for _ in range(n)]
        for i, k in enumerate(keys):
            shard[int(k[:4], 16) % n].append(i)
        acks = []
        for si, idxs in enumerate(shard):
            if not idxs:
                continue
            acks.append(handles[si].add.remote(
                bid, [keys[i] for i in idxs], [mins[i] for i in idxs],
                [cnts[i] for i in idxs]))
        ray.get(acks)
    return batch


_AGG_DUPS_CACHE: dict = {}


_HEX_LUT = np.zeros(256, dtype=np.uint32)
for _c in b"0123456789":
    _HEX_LUT[_c] = _c - ord("0")
for _c in b"abcdef":
    _HEX_LUT[_c] = _c - ord("a") + 10


def _shards_of_keys(bkeys: np.ndarray, n_shards: int) -> np.ndarray:
    """Vectorized twin of the push side's ``int(k[:4], 16) % n`` shard
    routing, over an S<width> byte array. Non-hex keys (the
    'e:<order_key>' empty-row sentinels) map to SOME shard and simply
    miss the lookup — they are never pushed."""
    if bkeys.dtype.itemsize < 4:          # degenerate short keys: pad
        bkeys = bkeys.astype("S4")
    m = bkeys.dtype.itemsize
    chars = bkeys.view(np.uint8).reshape(len(bkeys), m)[:, :4]
    v = _HEX_LUT[chars]
    return (((v[:, 0] * 16 + v[:, 1]) * 16 + v[:, 2]) * 16 + v[:, 3]) \
        % np.uint32(n_shards)


def assign_dup_from_aggregators(batch: pa.Table, handles) -> pa.Table:
    """dup_of from the aggregators' PER-SHARD (sorted-array) dup maps:
    zero-copy plasma reads + lookups routed to each shard by the same
    key-hash the push side used — no whole-map merge anywhere (shards
    build their arrays concurrently on first request).
    ONLY safe after a full barrier (sort / materialize) downstream of
    content_hash_with_side_map."""
    import ray

    cache_key = tuple(h._actor_id.hex() for h in handles)
    shard_arrs = _AGG_DUPS_CACHE.get(cache_key)
    if shard_arrs is None:
        refs = ray.get([h.own_ref.remote() for h in handles])
        shard_arrs = ray.get(refs)
        _AGG_DUPS_CACHE.clear()
        _AGG_DUPS_CACHE[cache_key] = shard_arrs

    n = batch.num_rows
    dup = np.full(n, None, dtype=object)
    if n and any(len(k) for k, _ in shard_arrs):
        # auto-width bytes dtype: the map's keys are fixed-width md5 hex,
        # but batch keys include the longer 'e:<order_key>' empty-row
        # sentinels — a cast to a fixed S<width> would silently truncate
        # them (and a future dedup_key format change could turn that
        # into false dup_of assignments); numpy compares mixed widths
        # correctly
        bkeys = np.asarray(batch["dedup_key"].to_pylist(), dtype="S")
        shard_ids = _shards_of_keys(bkeys, len(handles))
        ok_arr = None
        for si, (keys_arr, vals_arr) in enumerate(shard_arrs):
            if not len(keys_arr):
                continue
            rows_s = np.flatnonzero(shard_ids == si)
            if not len(rows_s):
                continue
            sub = bkeys[rows_s]
            idx = np.searchsorted(keys_arr, sub)
            idx_c = np.minimum(idx, len(keys_arr) - 1)
            found = keys_arr[idx_c] == sub
            if not found.any():
                continue
            if ok_arr is None:
                ok_arr = np.asarray(batch["order_key"].to_pylist(),
                                    dtype="S")
            rows_f = rows_s[found]
            canon = vals_arr[idx_c[found]]
            is_dup = canon != ok_arr[rows_f]
            rows = rows_f[is_dup]
            dup[rows] = [c.decode() for c in canon[is_dup]]
    if "dup_of" in batch.column_names:
        batch = batch.drop_columns(["dup_of"])
    return batch.append_column("dup_of", pa.array(dup, pa.string()))


_DUP_MAP_CACHE: dict = {}


def assign_dup_from_map(batch: pa.Table, map_ref) -> pa.Table:
    """map_batches fn: dup_of from the broadcast duplicate map (None for
    canonical rows and non-duplicated hashes)."""
    import ray
    m = _DUP_MAP_CACHE.get(map_ref)
    if m is None:
        m = ray.get(map_ref)
        _DUP_MAP_CACHE.clear()   # hold at most one map per worker
        _DUP_MAP_CACHE[map_ref] = m
    keys = batch["dedup_key"].to_pylist()
    own = batch["order_key"].to_pylist()
    dup = [None] * len(keys)
    for i, k in enumerate(keys):
        c = m.get(k)
        if c is not None and c != own[i]:
            dup[i] = c
    if "dup_of" in batch.column_names:   # e.g. a null placeholder column
        batch = batch.drop_columns(["dup_of"])
    return batch.append_column("dup_of", pa.array(dup, pa.string()))


# ---------------------------------------------------------------------------
# MinHash signatures + SimHash
# ---------------------------------------------------------------------------

class MinHashSimHash:
    """Actor-pool stage: token-hash list, MinHash signature, SimHash.

    Permutation parameters are derived from frozen seeds in __init__ (once
    per actor). Appends: token_hashes (list<uint64>), minhash_sig
    (list<uint64>, cfg.minhash_perms entries), simhash (uint64).

    Fully vectorized (no per-row Python loop): polars tokenization +
    per-row distinct, md5 only on the batch's UNIQUE tokens (dict
    cache across batches), then segmented numpy reductions over the
    flattened token-hash array (``np.minimum.reduceat`` for MinHash,
    ``np.add.reduceat`` over unpacked bits for SimHash) — the
    langid/LM pattern (functions/langid.py:92). Bit-identical to the
    scalar per-row formulation (tests pin signatures).

    ``ngram > 1`` switches the unit from single tokens to overlapping
    word-ngram shingles (space-joined, order-preserving, then made
    per-row distinct) — the classic MinHash shingling for documents
    where token-set similarity is too permissive.
    """

    def __init__(self, text_col: str = "text",
                 cfg: PipelineConfig = DEFAULT_CONFIG,
                 ngram: int = 1) -> None:
        if ngram < 1:
            raise ValueError(f"ngram must be >= 1, got {ngram}")
        self.text_col = text_col
        self.cfg = cfg
        self.ngram = ngram   # >1: word-ngram shingles instead of tokens
        self.a, self.b = minhash_params(cfg.minhash_perms, cfg.seed)
        self.token_cache: Dict[str, int] = {}

    def _hash_unique(self, uniq_tokens: np.ndarray) -> np.ndarray:
        """md5-8 per UNIQUE token (cache hit skips the digest)."""
        cache = self.token_cache
        out = np.empty(len(uniq_tokens), dtype=np.uint64)
        for i, t in enumerate(uniq_tokens):
            h = cache.get(t)
            if h is None:
                h = token_hash_u64(t)
                if len(cache) < 1_000_000:
                    cache[t] = h
            out[i] = h
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl
        texts = batch[self.text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n = len(texts)
        n_perm = self.cfg.minhash_perms
        a, b = self.a, self.b

        s = pl.Series(texts).fill_null("")
        if self.ngram == 1:
            # per-row DISTINCT tokens, flattened: one polars pass, no loop
            toks = s.str.to_lowercase().str.extract_all(TOKEN_PATTERN) \
                .list.unique()
            lens = toks.list.len().to_numpy().astype(np.int64)
            flat_tokens = toks.explode(empty_as_null=False).to_numpy()
            uniq, inv = (np.unique(flat_tokens, return_inverse=True)
                         if len(flat_tokens) else
                         (np.array([], dtype=object),
                          np.array([], dtype=np.int64)))
            flat = self._hash_unique(uniq)[inv] if len(uniq) \
                else np.array([], dtype=np.uint64)
            # per-row sorted hash lists in one lexsort (row-major, asc)
            row_idx = np.repeat(np.arange(n), lens)
            order = np.lexsort((flat, row_idx))
            sorted_flat = flat[order]
        else:
            # ORDERED tokens (dups kept) → overlapping ngram shingles
            # joined by one space (matching the SQL oracle's
            # ``ts[i] || ' ' || ts[i+1] || ...``), hashed once per
            # UNIQUE shingle, per-row DISTINCT via one lexsort+mask
            g = self.ngram
            toks = s.str.to_lowercase().str.extract_all(TOKEN_PATTERN)
            lens0 = toks.list.len().to_numpy().astype(np.int64)
            flat0 = toks.explode(empty_as_null=False).to_numpy()
            row0 = np.repeat(np.arange(n), lens0)
            T0 = len(flat0)
            valid = (np.flatnonzero(row0[: T0 - g + 1] == row0[g - 1:])
                     if T0 >= g else np.array([], dtype=np.int64))
            if len(valid):
                sh = flat0[valid].astype(object)
                for k in range(1, g):
                    sh = sh + " "
                    sh = sh + flat0[valid + k].astype(object)
                uniq, inv = np.unique(sh, return_inverse=True)
                hashes = self._hash_unique(uniq)[inv]
                rows_v = row0[valid]
                order = np.lexsort((hashes, rows_v))
                hs, rs = hashes[order], rows_v[order]
                keep = np.ones(len(hs), dtype=bool)
                keep[1:] = (hs[1:] != hs[:-1]) | (rs[1:] != rs[:-1])
                sorted_flat, rows_kept = hs[keep], rs[keep]
                lens = np.bincount(rows_kept, minlength=n) \
                    .astype(np.int64)
            else:
                sorted_flat = np.array([], dtype=np.uint64)
                lens = np.zeros(n, dtype=np.int64)
        # empty lists contribute no rows, so offsets from `lens` line up
        # with the flat array; reductions below are order-independent
        # integer min/add, so the sorted layout is bit-identical
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        flat = sorted_flat
        tok_col = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()).cast(pa.int32()),
            pa.array(sorted_flat, pa.uint64()))

        nonempty = np.flatnonzero(lens > 0)
        starts = offsets[nonempty]           # segment starts, non-empty rows
        sigs = np.full((n, n_perm), np.uint64(0xFFFFFFFFFFFFFFFF),
                       dtype=np.uint64)
        simhashes = np.zeros(n, dtype=np.uint64)
        if len(nonempty):
            # MinHash: a*h + b (mod 2^64) per permutation, then a
            # segmented min. Arithmetic runs in int64 — same wraparound
            # bits, but numpy's int64 kernels are SIMD (uint64 mul is a
            # ~20x slower scalar loop on this target) — with the sign
            # bit XORed in so int64 ordering == uint64 ordering. The
            # permutation axis is chunked to bound memory at ~4M i8
            # elements per chunk.
            T = len(flat)
            SIGN = np.int64(-0x8000000000000000)
            flat_i = flat.view(np.int64)
            a_i, b_i = a.view(np.int64), b.view(np.int64)
            chunk = max(1, min(n_perm, 4_000_000 // max(T, 1) or 1))
            with np.errstate(over="ignore"):
                for lo in range(0, n_perm, chunk):
                    hi = min(n_perm, lo + chunk)
                    vals = flat_i[:, None] * a_i[None, lo:hi] \
                        + b_i[None, lo:hi]
                    vals ^= SIGN
                    red = np.minimum.reduceat(vals, starts, axis=0)
                    red ^= SIGN
                    sigs[nonempty, lo:hi] = red.view(np.uint64)
            # SimHash: unpack bits once, segmented sum of votes
            bits = np.unpackbits(flat.view(np.uint8).reshape(-1, 8),
                                 axis=1, bitorder="little")   # (T, 64)
            votes = np.add.reduceat(bits.astype(np.int64), starts, axis=0)
            votes = votes * 2 - lens[nonempty][:, None]
            out_bits = (votes > 0).astype(np.uint8)
            simhashes[nonempty] = np.packbits(
                out_bits, axis=1, bitorder="little").view(np.uint64).ravel()

        batch = batch.append_column("token_hashes", tok_col)
        batch = batch.append_column(
            "minhash_sig",
            pa.ListArray.from_arrays(
                pa.array(np.arange(0, (n + 1) * n_perm, n_perm,
                                   dtype=np.int32)),
                pa.array(sigs.ravel(), pa.uint64())))
        batch = batch.append_column("simhash", pa.array(simhashes))
        return batch


def _simhash_from_hashes(h: np.ndarray) -> np.uint64:
    """64-bit SimHash from token hashes (unweighted token set)."""
    bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1,
                         bitorder="little")  # (T, 64)
    votes = bits.sum(axis=0, dtype=np.int64) * 2 - len(h)  # +1/-1 votes
    out_bits = (votes > 0).astype(np.uint8)
    return np.packbits(out_bits, bitorder="little").view(np.uint64)[0]


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 arrays."""
    x = np.bitwise_xor(a, b)
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8),
                         axis=1).sum(axis=1)


# ---------------------------------------------------------------------------
# LSH banding → candidate pairs → exact-Jaccard verification
# ---------------------------------------------------------------------------

_BAND_MIX_P1 = np.uint64(0x9E3779B97F4A7C15)   # splitmix64 constants
_BAND_MIX_P2 = np.uint64(0xBF58476D1CE4E5B9)


def _band_key_matrix(sig_mat: np.ndarray, bands: int, rows: int
                     ) -> np.ndarray:
    """(n, bands) uint64 band keys from an (n, bands·rows) signature
    matrix — a vectorized splitmix-style fold over each band's ``rows``
    values plus a per-band offset, so equal band slices always produce
    equal keys (LSH correctness needs only that; a 64-bit mix makes
    cross-band/accidental collisions ~2⁻⁶⁴, and any false candidate is
    removed by the exact verification step)."""
    seg = sig_mat.reshape(len(sig_mat), bands, rows)
    with np.errstate(over="ignore"):
        h = np.zeros((len(sig_mat), bands), dtype=np.uint64)
        for ri in range(rows):                      # rows is small (4)
            h = (h ^ seg[:, :, ri]) * _BAND_MIX_P1
            h ^= h >> np.uint64(29)
        h = h + np.arange(bands, dtype=np.uint64)[None, :] * _BAND_MIX_P2
    return h


def _sig_matrix(batch: pa.Table) -> np.ndarray:
    sigs = batch["minhash_sig"]
    if isinstance(sigs, pa.ChunkedArray):
        sigs = sigs.combine_chunks()
    flat = sigs.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(batch.num_rows, -1).astype(np.uint64, copy=False)


def _banded_indices(batch: pa.Table, cfg: PipelineConfig):
    """Shared band-explosion core: (row_idx, band_key, band_bucket) for
    all rows with ≥1 token, fully vectorized (no per-row Python loop)."""
    toks = batch["token_hashes"]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    tok_len = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    keep = np.flatnonzero(tok_len > 0)
    b, r = cfg.lsh_bands, cfg.lsh_rows
    keys = _band_key_matrix(_sig_matrix(batch)[keep], b, r).ravel()
    row_idx = np.repeat(keep, b)
    with np.errstate(over="ignore"):
        buckets = ((keys * _BAND_MIX_P2) >> np.uint64(33)) \
            % np.uint64(cfg.num_buckets)
    return row_idx, keys, buckets.astype(np.int32)


def explode_bands(batch: pa.Table, cfg: PipelineConfig = DEFAULT_CONFIG
                  ) -> pa.Table:
    """One row per (row × band): band_key = vectorized 64-bit fold of the
    band's signature slice (+ band offset).

    Carries order_key + token_hashes for in-bucket exact verification.
    Rows with no tokens are dropped (they can never pair). Adds
    band_bucket = mix(band_key) % num_buckets for the bucketed shuffle.
    """
    row_idx, keys, buckets = _banded_indices(batch, cfg)
    idx = pa.array(row_idx)
    return pa.table({
        "band_key": pa.array(keys),
        "band_bucket": pa.array(buckets),
        "order_key": pc.take(batch["order_key"], idx),
        "token_hashes": pc.take(batch["token_hashes"], idx),
        "content_hash": pc.take(batch["content_hash"], idx),
    })


def _bucket_pairs(df: pd.DataFrame, cfg: PipelineConfig) -> pd.DataFrame:
    """Per-bucket pair generation: pandas groupby(band_key); only
    multi-member band groups do O(k²) verified-Jaccard work, with k capped
    at cfg.max_lsh_bucket."""
    out_a: List[str] = []
    out_b: List[str] = []
    out_j: List[float] = []
    # drop duplicate (band_key, order_key) — a doc appears once per band
    df = df.drop_duplicates(["band_key", "order_key"])
    sizes = df.groupby("band_key", sort=False)["order_key"].transform("size")
    multi = df[sizes > 1]
    n_capped, largest = 0, 0
    for _, g in multi.groupby("band_key", sort=False):
        if len(g) > cfg.max_lsh_bucket:
            n_capped += 1
            largest = max(largest, len(g))
            g = g.sort_values("order_key").head(cfg.max_lsh_bucket)
        keys = g["order_key"].to_numpy()
        toks = [frozenset(t) for t in g["token_hashes"]]
        ch = g["content_hash"].to_numpy()
        k = len(keys)
        for i in range(k):
            si = toks[i]
            for j in range(i + 1, k):
                if ch[i] == ch[j]:
                    continue  # exact dups are handled by exact_dedup
                sj = toks[j]
                inter = len(si & sj)
                union = len(si) + len(sj) - inter
                jac = inter / union if union else 1.0
                if jac >= cfg.near_dup_jaccard:
                    a, bkey = sorted((keys[i], keys[j]))
                    out_a.append(a)
                    out_b.append(bkey)
                    out_j.append(jac)
    if n_capped:
        _log_capped_groups("_bucket_pairs", n_capped, cfg.max_lsh_bucket,
                           largest)
    return pd.DataFrame({"key_a": out_a, "key_b": out_b, "jaccard": out_j})


def explode_bands_slim(batch: pa.Table,
                       cfg: PipelineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Band rows WITHOUT payload: (band_key, band_bucket, order_key) only —
    ~25 bytes/row instead of the token list. Used by the join-based
    variant (the 100 TB path)."""
    row_idx, keys, buckets = _banded_indices(batch, cfg)
    return pa.table({
        "band_key": pa.array(keys),
        "band_bucket": pa.array(buckets),
        "order_key": pc.take(batch["order_key"], pa.array(row_idx)),
    })


def _bucket_candidates(df: pd.DataFrame, cfg: PipelineConfig
                       ) -> pd.DataFrame:
    """Candidate (key_a < key_b) pairs within band groups of one bucket —
    no verification payload here."""
    out_a: List[str] = []
    out_b: List[str] = []
    df = df.drop_duplicates(["band_key", "order_key"])
    sizes = df.groupby("band_key", sort=False)["order_key"].transform("size")
    multi = df[sizes > 1]
    n_capped, largest = 0, 0
    for _, g in multi.groupby("band_key", sort=False):
        if len(g) > cfg.max_lsh_bucket:
            n_capped += 1
            largest = max(largest, len(g))
            g = g.sort_values("order_key").head(cfg.max_lsh_bucket)
        keys = sorted(g["order_key"])
        k = len(keys)
        for i in range(k):
            for j in range(i + 1, k):
                out_a.append(keys[i])
                out_b.append(keys[j])
    if n_capped:
        _log_capped_groups("_bucket_candidates", n_capped,
                           cfg.max_lsh_bucket, largest)
    return pd.DataFrame({"key_a": out_a, "key_b": out_b}) \
        .drop_duplicates()


def near_dup_pairs_join(ds, cfg: PipelineConfig = DEFAULT_CONFIG,
                        num_partitions: int | None = None):
    """Join-based LSH near-dup (the 100 TB shape): slim band rows →
    candidate pairs → two hash joins against the sketch table to attach
    each side's token set + content hash → exact-Jaccard verification.

    Shuffle volume: corpus sketches move twice (≈2× row payload) instead
    of ``lsh_bands``× as in ``near_dup_pairs`` — the carrying-cost
    crossover is at bands > 2, so this wins whenever payloads are
    non-trivial. Requires Ray's hash-partitioned ``Dataset.join``.
    ``num_partitions`` defaults to ~half the cluster CPUs (join
    aggregators are actors — oversizing deadlocks a small cluster).
    """
    if num_partitions is None:
        import ray
        try:
            num_partitions = max(2, int(
                ray.cluster_resources().get("CPU", 4)) // 2)
        except Exception:
            num_partitions = 4

    def pack_sketch(t: pa.Table) -> pa.Table:
        # Acero joins reject list<> non-key fields — pack the uint64 token
        # set into a binary blob for the join, unpack in verify.
        toks = t["token_hashes"].to_pylist()
        blobs = [np.asarray(x, dtype=np.uint64).tobytes() for x in toks]
        return pa.table({
            "order_key": t["order_key"],
            "content_hash": t["content_hash"],
            "token_bytes": pa.array(blobs, pa.binary()),
        })

    sketch = ds.map_batches(pack_sketch, batch_format="pyarrow")

    bands = ds.map_batches(
        functools.partial(explode_bands_slim, cfg=cfg),
        batch_format="pyarrow")
    cands = (bands.groupby("band_bucket")
             .map_groups(functools.partial(_bucket_candidates, cfg=cfg),
                         batch_format="pandas")
             .map_batches(lambda t: t, batch_format="pyarrow"))
    # distinct pairs across bands (bucketed drop_duplicates)
    cands = distinct_pairs(cands, "key_a", "key_b", cfg.num_buckets)

    a_joined = cands.join(sketch, join_type="inner",
                          num_partitions=num_partitions,
                          on=("key_a",), right_on=("order_key",))

    def rename_a(t: pa.Table) -> pa.Table:
        cols = {c: (c + "_a" if c in ("content_hash", "token_bytes")
                    else c)
                for c in t.column_names}
        t = t.rename_columns([cols[c] for c in t.column_names])
        if "order_key" in t.column_names:
            t = t.drop_columns(["order_key"])
        return t

    b_joined = a_joined.map_batches(rename_a, batch_format="pyarrow") \
        .join(sketch, join_type="inner", num_partitions=num_partitions,
              on=("key_b",), right_on=("order_key",))

    def verify(batch: pa.Table) -> pa.Table:
        ka = batch["key_a"].to_pylist()
        kb = batch["key_b"].to_pylist()
        ha = batch["content_hash_a"].to_pylist()
        hb = batch["content_hash"].to_pylist()
        ta = batch["token_bytes_a"].to_pylist()
        tb = batch["token_bytes"].to_pylist()
        out_a, out_b, out_j = [], [], []
        for i in range(len(ka)):
            if ha[i] == hb[i]:
                continue  # exact dups handled by exact_dedup
            sa = frozenset(np.frombuffer(ta[i], dtype=np.uint64))
            sb = frozenset(np.frombuffer(tb[i], dtype=np.uint64))
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            jac = inter / union if union else 1.0
            if jac >= cfg.near_dup_jaccard:
                out_a.append(ka[i])
                out_b.append(kb[i])
                out_j.append(jac)
        return pa.table({
            "key_a": pa.array(out_a, pa.string()),
            "key_b": pa.array(out_b, pa.string()),
            "jaccard": pa.array(out_j, pa.float64()),
        })

    return b_joined.map_batches(verify, batch_format="pyarrow")


def simhash_near_dup(ds, cfg: PipelineConfig = DEFAULT_CONFIG):
    """SimHash near-dup pairs: Hamming(simhash_a, simhash_b) <=
    cfg.simhash_max_hamming (the reference's cosine >= 0.95 analog,
    metadata.py:599), found without O(n²) via pigeonhole banding:

    the 64-bit signature is split into ``simhash_max_hamming + 1``
    contiguous bit chunks — any pair within the Hamming budget must agree
    EXACTLY on at least one chunk — so candidate generation is a
    groupby on (chunk_id, chunk_value) and verification is a vectorized
    Hamming check. Recall is exact by the pigeonhole argument EXCEPT for
    members dropped from band groups larger than ``cfg.max_lsh_bucket``
    (hot bands; logged when it happens); precision is exact (verified).

    Rows with NO TOKENS are excluded (they have no sketchable content —
    a zero SimHash from zero tokens would otherwise pair every token-
    less text with every other: symbol-only rows, and any text outside
    the ASCII token alphabet). The check is the ``token_hashes`` length
    when present, else ``is_empty_norm``, else — only as a last resort —
    the ``simhash == 0`` sentinel. A legitimately all-zero SimHash from
    a NON-empty token set (every bit vote <= 0) is still included.

    Input must carry order_key + simhash. Returns (key_a, key_b, hamming).
    """
    n_chunks = cfg.simhash_max_hamming + 1
    bits = 64 // n_chunks          # low 62/63 bits covered; remainder
    # bits beyond n_chunks*bits are ignored by banding but still verified

    def explode(batch: pa.Table) -> pa.Table:
        sims = batch["simhash"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64, copy=False)
        if "token_hashes" in batch.column_names:
            toks = batch["token_hashes"]
            if isinstance(toks, pa.ChunkedArray):
                toks = toks.combine_chunks()
            nonempty = pc.list_value_length(toks) \
                .to_numpy(zero_copy_only=False) > 0
        elif "is_empty_norm" in batch.column_names:
            col = batch["is_empty_norm"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            nonempty = ~col.to_numpy(zero_copy_only=False)
        else:
            nonempty = sims != 0
        keep = np.flatnonzero(nonempty)
        s = sims[keep]
        # (k, n_chunks) chunk values, vectorized shifts — band key packs
        # (chunk_id, chunk_value) into one uint64
        mask = np.uint64((1 << bits) - 1)
        shifts = (np.arange(n_chunks, dtype=np.uint64)
                  * np.uint64(bits))[None, :]
        chunks = (s[:, None] >> shifts) & mask
        band = (np.arange(n_chunks, dtype=np.uint64)[None, :]
                << np.uint64(bits)) | chunks
        with np.errstate(over="ignore"):
            bucket = ((band * _BAND_MIX_P2) >> np.uint64(33)) \
                % np.uint64(cfg.num_buckets)
        idx = pa.array(np.repeat(keep, n_chunks))
        return pa.table({
            "band_key": pa.array(band.ravel()),
            "band_bucket": pa.array(bucket.ravel().astype(np.int32)),
            "order_key": pc.take(batch["order_key"], idx),
            "simhash": pa.array(np.repeat(s, n_chunks)),
        })

    def bucket_pairs_sim(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_h = [], [], []
        df = df.drop_duplicates(["band_key", "order_key"])
        sizes = df.groupby("band_key", sort=False)["order_key"] \
                  .transform("size")
        n_capped, largest = 0, 0
        for _, g in df[sizes > 1].groupby("band_key", sort=False):
            if len(g) > cfg.max_lsh_bucket:
                n_capped += 1
                largest = max(largest, len(g))
                g = g.sort_values("order_key").head(cfg.max_lsh_bucket)
            keys = g["order_key"].to_numpy()
            sims = g["simhash"].to_numpy().astype(np.uint64)
            k = len(keys)
            for i in range(k):
                d = hamming64(np.full(k - i - 1, sims[i], dtype=np.uint64),
                              sims[i + 1:])
                for j_off in np.flatnonzero(
                        d <= cfg.simhash_max_hamming):
                    j = i + 1 + j_off
                    if keys[i] == keys[j]:
                        continue
                    a, b = sorted((keys[i], keys[j]))
                    out_a.append(a)
                    out_b.append(b)
                    out_h.append(int(d[j_off]))
        if n_capped:
            _log_capped_groups("bucket_pairs_sim", n_capped,
                               cfg.max_lsh_bucket, largest)
        return pd.DataFrame({"key_a": out_a, "key_b": out_b,
                             "hamming": out_h}).drop_duplicates(
                                 ["key_a", "key_b"])

    pairs = (ds.map_batches(explode, batch_format="pyarrow")
             .groupby("band_bucket")
             .map_groups(bucket_pairs_sim, batch_format="pandas"))
    return distinct_pairs(pairs, "key_a", "key_b", cfg.num_buckets)


def near_dup_pairs(ds, cfg: PipelineConfig = DEFAULT_CONFIG):
    """Full LSH near-dup pipeline over a dataset that already carries
    minhash_sig / token_hashes / order_key. Returns a distinct
    (key_a, key_b, jaccard) Dataset (each pair reported once)."""
    bands = ds.map_batches(
        functools.partial(explode_bands, cfg=cfg), batch_format="pyarrow")
    pairs = bands.groupby("band_bucket").map_groups(
        functools.partial(_bucket_pairs, cfg=cfg), batch_format="pandas")
    return distinct_pairs(pairs, "key_a", "key_b", cfg.num_buckets)
