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
from typing import Dict, List

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


def _bucket_of(key: str, num_buckets: int) -> int:
    return int.from_bytes(hashlib.md5(key.encode()).digest()[:4], "little") \
        % num_buckets


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
    order_keys = batch["order_key"].to_pylist()

    hashes: List[str] = []
    dedup_keys: List[str] = []
    buckets = np.empty(batch.num_rows, dtype=np.int32)
    md5 = hashlib.md5
    for i, s in enumerate(norm.to_pylist()):
        digest = md5(s.encode("utf-8")).digest()
        hashes.append(digest.hex())
        if s:
            dedup_keys.append(hashes[-1])
            # bucket straight from the digest bytes — one md5 per row
            buckets[i] = int.from_bytes(digest[:4], "little") % num_buckets
        else:
            dk = f"e:{order_keys[i]}"
            dedup_keys.append(dk)
            buckets[i] = _bucket_of(dk, num_buckets)

    empty = pc.equal(pc.utf8_length(norm), 0)
    batch = batch.append_column("content_hash", pa.array(hashes, pa.string()))
    batch = batch.append_column("is_empty_norm", empty)
    batch = batch.append_column("dedup_key", pa.array(dedup_keys, pa.string()))
    batch = batch.append_column("hash_bucket", pa.array(buckets))
    return batch


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
    """

    def __init__(self, text_col: str = "text",
                 cfg: PipelineConfig = DEFAULT_CONFIG) -> None:
        import re
        self.text_col = text_col
        self.cfg = cfg
        self.a, self.b = minhash_params(cfg.minhash_perms, cfg.seed)
        self.token_rx = re.compile(TOKEN_PATTERN, re.ASCII)
        self.token_cache: Dict[str, int] = {}

    def _token_hashes(self, text: str) -> np.ndarray:
        toks = set(self.token_rx.findall(text.lower()))
        cache = self.token_cache
        out = np.empty(len(toks), dtype=np.uint64)
        for i, t in enumerate(toks):
            h = cache.get(t)
            if h is None:
                h = token_hash_u64(t)
                if len(cache) < 1_000_000:
                    cache[t] = h
            out[i] = h
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n_perm = self.cfg.minhash_perms
        a, b = self.a, self.b

        tok_lists: List[np.ndarray] = []
        sigs = np.empty((len(texts), n_perm), dtype=np.uint64)
        simhashes = np.empty(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts.to_pylist()):
            h = self._token_hashes(t or "")
            tok_lists.append(np.sort(h))
            if len(h) == 0:
                sigs[i, :] = np.uint64(0xFFFFFFFFFFFFFFFF)
                simhashes[i] = 0
                continue
            # min over tokens of a*h + b (uint64 wrap-around, a odd) —
            # standard multiplicative MinHash family; exact, vectorized
            # across the 128 permutations.
            sigs[i, :] = (a[:, None] * h[None, :] + b[:, None]).min(axis=1)
            simhashes[i] = _simhash_from_hashes(h)

        batch = batch.append_column(
            "token_hashes",
            pa.array([tl.tolist() for tl in tok_lists],
                     pa.list_(pa.uint64())))
        batch = batch.append_column(
            "minhash_sig", pa.array(sigs.tolist(), pa.list_(pa.uint64())))
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

def explode_bands(batch: pa.Table, cfg: PipelineConfig = DEFAULT_CONFIG
                  ) -> pa.Table:
    """One row per (row × band): band_key = band_id ‖ md5(band slice).

    Carries order_key + token_hashes for in-bucket exact verification.
    Rows with no tokens are dropped (they can never pair). Adds
    band_bucket = hash(band_key) % num_buckets for the bucketed shuffle.
    """
    sigs = batch["minhash_sig"].combine_chunks() \
        if isinstance(batch["minhash_sig"], pa.ChunkedArray) \
        else batch["minhash_sig"]
    keys = batch["order_key"].to_pylist()
    toks = batch["token_hashes"].to_pylist()
    chashes = batch["content_hash"].to_pylist()
    sig_lists = sigs.to_pylist()
    b, r = cfg.lsh_bands, cfg.lsh_rows

    band_keys: List[str] = []
    buckets: List[int] = []
    out_keys: List[str] = []
    out_toks: List[list] = []
    out_ch: List[str] = []
    for i in range(len(keys)):
        if not toks[i]:
            continue
        row = np.asarray(sig_lists[i], dtype=np.uint64)
        for bi in range(b):
            seg = row[bi * r:(bi + 1) * r]
            digest = hashlib.md5(bytes([bi]) + seg.tobytes()).digest()
            bk = f"{bi}:{digest[:8].hex()}"
            band_keys.append(bk)
            buckets.append(int.from_bytes(digest[4:8], "little")
                           % cfg.num_buckets)
            out_keys.append(keys[i])
            out_toks.append(toks[i])
            out_ch.append(chashes[i])
    return pa.table({
        "band_key": pa.array(band_keys, pa.string()),
        "band_bucket": pa.array(buckets, pa.int32()),
        "order_key": pa.array(out_keys, pa.string()),
        "token_hashes": pa.array(out_toks, pa.list_(pa.uint64())),
        "content_hash": pa.array(out_ch, pa.string()),
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
    for _, g in multi.groupby("band_key", sort=False):
        if len(g) > cfg.max_lsh_bucket:
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
    return pd.DataFrame({"key_a": out_a, "key_b": out_b, "jaccard": out_j})


def _dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
    return df.drop_duplicates(["key_a", "key_b"])


def explode_bands_slim(batch: pa.Table,
                       cfg: PipelineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Band rows WITHOUT payload: (band_key, band_bucket, order_key) only —
    ~25 bytes/row instead of the token list. Used by the join-based
    variant (the 100 TB path)."""
    sigs = batch["minhash_sig"].combine_chunks() \
        if isinstance(batch["minhash_sig"], pa.ChunkedArray) \
        else batch["minhash_sig"]
    keys = batch["order_key"].to_pylist()
    toks = batch["token_hashes"].to_pylist()
    sig_lists = sigs.to_pylist()
    b, r = cfg.lsh_bands, cfg.lsh_rows
    band_keys: List[str] = []
    buckets: List[int] = []
    out_keys: List[str] = []
    for i in range(len(keys)):
        if not toks[i]:
            continue
        row = np.asarray(sig_lists[i], dtype=np.uint64)
        for bi in range(b):
            seg = row[bi * r:(bi + 1) * r]
            digest = hashlib.md5(bytes([bi]) + seg.tobytes()).digest()
            band_keys.append(f"{bi}:{digest[:8].hex()}")
            buckets.append(int.from_bytes(digest[4:8], "little")
                           % cfg.num_buckets)
            out_keys.append(keys[i])
    return pa.table({
        "band_key": pa.array(band_keys, pa.string()),
        "band_bucket": pa.array(buckets, pa.int32()),
        "order_key": pa.array(out_keys, pa.string()),
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
    for _, g in multi.groupby("band_key", sort=False):
        if len(g) > cfg.max_lsh_bucket:
            g = g.sort_values("order_key").head(cfg.max_lsh_bucket)
        keys = sorted(g["order_key"])
        k = len(keys)
        for i in range(k):
            for j in range(i + 1, k):
                out_a.append(keys[i])
                out_b.append(keys[j])
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
    cands = (cands.map_batches(
                lambda df: df.assign(
                    pair_bucket=[_bucket_of(f"{a}|{b}", cfg.num_buckets)
                                 for a, b in zip(df["key_a"], df["key_b"])]),
                batch_format="pandas")
             .groupby("pair_bucket")
             .map_groups(lambda g: g.drop_duplicates(["key_a", "key_b"]),
                         batch_format="pandas")
             .map_batches(lambda t: t.drop_columns(["pair_bucket"]),
                          batch_format="pyarrow"))

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
    Hamming check. Exact recall (pigeonhole guarantees it), exact
    precision (verified).

    Input must carry order_key + simhash. Returns (key_a, key_b, hamming).
    """
    n_chunks = cfg.simhash_max_hamming + 1
    bits = 64 // n_chunks          # low 62/63 bits covered; remainder
    # bits beyond n_chunks*bits are ignored by banding but still verified

    def explode(batch: pa.Table) -> pa.Table:
        sims = batch["simhash"].to_numpy(zero_copy_only=False)
        keys = batch["order_key"].to_pylist()
        out_key, out_band, out_bucket, out_sim = [], [], [], []
        for i in range(len(keys)):
            s = int(sims[i])
            if s == 0:
                continue   # empty texts never pair
            for c in range(n_chunks):
                chunk = (s >> (c * bits)) & ((1 << bits) - 1)
                band = f"{c}:{chunk:x}"
                out_key.append(keys[i])
                out_band.append(band)
                out_bucket.append(_bucket_of(band, cfg.num_buckets))
                out_sim.append(s)
        return pa.table({
            "band_key": pa.array(out_band, pa.string()),
            "band_bucket": pa.array(out_bucket, pa.int32()),
            "order_key": pa.array(out_key, pa.string()),
            "simhash": pa.array(np.array(out_sim, dtype=np.uint64)),
        })

    def bucket_pairs_sim(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_h = [], [], []
        df = df.drop_duplicates(["band_key", "order_key"])
        sizes = df.groupby("band_key", sort=False)["order_key"] \
                  .transform("size")
        for _, g in df[sizes > 1].groupby("band_key", sort=False):
            if len(g) > cfg.max_lsh_bucket:
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
        return pd.DataFrame({"key_a": out_a, "key_b": out_b,
                             "hamming": out_h}).drop_duplicates(
                                 ["key_a", "key_b"])

    pairs = (ds.map_batches(explode, batch_format="pyarrow")
             .groupby("band_bucket")
             .map_groups(bucket_pairs_sim, batch_format="pandas"))

    def add_pair_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["pair_bucket"] = [
            _bucket_of(f"{a}|{b}", cfg.num_buckets)
            for a, b in zip(df["key_a"], df["key_b"])]
        return df

    return (pairs.map_batches(add_pair_bucket, batch_format="pandas")
            .groupby("pair_bucket")
            .map_groups(lambda g: g.drop_duplicates(["key_a", "key_b"]),
                        batch_format="pandas")
            .map_batches(lambda t: t.drop_columns(["pair_bucket"]),
                         batch_format="pyarrow"))


def near_dup_pairs(ds, cfg: PipelineConfig = DEFAULT_CONFIG):
    """Full LSH near-dup pipeline over a dataset that already carries
    minhash_sig / token_hashes / order_key. Returns a distinct
    (key_a, key_b, jaccard) Dataset (each pair reported once)."""
    bands = ds.map_batches(
        functools.partial(explode_bands, cfg=cfg), batch_format="pyarrow")
    pairs = bands.groupby("band_bucket").map_groups(
        functools.partial(_bucket_pairs, cfg=cfg), batch_format="pandas")

    def add_pair_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["pair_bucket"] = [
            _bucket_of(f"{a}|{b}", cfg.num_buckets)
            for a, b in zip(df["key_a"], df["key_b"])]
        return df

    distinct = (pairs
                .map_batches(add_pair_bucket, batch_format="pandas")
                .groupby("pair_bucket")
                .map_groups(_dedup_pairs, batch_format="pandas")
                .map_batches(lambda t: t.drop_columns(["pair_bucket"]),
                             batch_format="pyarrow"))
    return distinct
