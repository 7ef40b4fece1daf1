"""Document-table pipelines — the SQL-oracle-checkable query surface.

Each function takes ``sf_dir`` (a driver testdata directory), builds a lazy
Ray Data pipeline over ``documents.parquet`` / ``embeddings.parquet`` and
returns a Dataset / Table whose columns match the corresponding
``oracle_sql()`` string in ``__ray_entry__`` name-for-name and
value-for-value (integer formulas + pinned float semantics — see spec.py).

SURVEY §2 coverage exercised here: M-ops (scrub/normalize/score), D1/D2
(near-dup via Jaccard), D4 (key dedup), A1-A3/A6 (aggregations), O1-O4
(sort+limit), J2 (broadcast corpus lookup = ANN top-k).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

import ray

from dataquality_ray.config import DEFAULT_CONFIG, PipelineConfig
from dataquality_ray.spec import STOPWORD_MARKERS, TOKEN_PATTERN
from dataquality_ray.stages.heuristics import heuristics_batch
from dataquality_ray.stages.scrub import scrub_batch
from dataquality_ray.stages.similarity import (
    cosine_topk,
    embedding_near_dup_pairs,
    token_jaccard_pairs,
)

NEAR_DUP_DOC_JACCARD = 0.9   # documents-table near-dup threshold
EMB_NEAR_DUP_COSINE = 0.4    # embeddings-table near-dup threshold
ANN_QUERY_IDS = [0, 1, 2, 3, 4]
ANN_K = 10


def _docs(sf_dir: str, columns=None):
    # strip the b'pandas' schema metadata the driver's writer attaches —
    # metadata-carrying schemas are unhashable and defeat Ray Data's
    # schema-dedup fast path (see arrowutil.strip_meta)
    from dataquality_ray.arrowutil import strip_meta
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=columns) \
        .map_batches(strip_meta, batch_format="pyarrow",
                     zero_copy_batch=True)


def _emb(sf_dir: str):
    from dataquality_ray.arrowutil import strip_meta
    return ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet")) \
        .map_batches(strip_meta, batch_format="pyarrow",
                     zero_copy_batch=True)


# ---------------------------------------------------------------------------
# scrub / heuristics / token stats
# ---------------------------------------------------------------------------

def scrub_documents(sf_dir: str):
    """doc_id, text (scrubbed), n_email, n_phone, n_ssn."""
    ds = _docs(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(scrub_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


def quality_documents(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    """Heuristic quality scores + action over raw document text.

    overall_quality_score = integer mean of the four heuristic scores
    (no ts column here, so no timeliness; the full 17-dim surface is the
    transcript pipeline's job)."""
    ds = _docs(sf_dir, columns=["doc_id", "text"])
    ds = ds.map_batches(functools.partial(heuristics_batch, cfg=cfg),
                        batch_format="pyarrow", zero_copy_batch=True)

    def finish(batch: pa.Table) -> pa.Table:
        import numpy as np
        from dataquality_ray.stages.heuristics import heuristic_overall4
        overall = heuristic_overall4(batch)
        action = np.select(
            [overall >= cfg.keep_action_threshold,
             overall >= cfg.review_action_threshold,
             overall >= cfg.quarantine_action_threshold],
            ["KEEP", "REVIEW", "QUARANTINE"], default="DISCARD")
        batch = batch.append_column(
            "overall_quality_score", pa.array(overall.astype(np.int32)))
        batch = batch.append_column("action", pa.array(action, pa.string()))
        return batch.select(
            ["doc_id", "n_chars", "n_tokens", "n_distinct",
             "length_score", "repetition_score", "symbol_score",
             "boilerplate_score", "overall_quality_score", "action"])

    return ds.map_batches(finish, batch_format="pyarrow")


def toxicity_documents(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    """Toxicity scrub + score (north_rule "PII/toxicity-scrub"; reference
    analog: LLM risk flagging, bedrock.py:211-214,250): doc_id, n_toxic
    (lexicon hits), toxicity_score (max(0, 100 - mult·hits)), text_masked
    (lowercased text with toxic phrases replaced by <TOX>). One zero-copy
    Arrow map_batches — RE2 kernels, no shuffle; SQL-checked."""
    from dataquality_ray.spec import TOX_TOKEN, TOXICITY_PATTERN

    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def score(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        lower = pc.utf8_lower(text)
        n_tox = pc.cast(pc.count_substring_regex(lower, TOXICITY_PATTERN),
                        pa.int32())
        tox_score = np.maximum(
            0, 100 - cfg.toxicity_penalty_mult
            * n_tox.to_numpy(zero_copy_only=False).astype(np.int64))
        masked = pc.replace_substring_regex(lower, TOXICITY_PATTERN,
                                            TOX_TOKEN)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_toxic": n_tox,
            "toxicity_score": pa.array(tox_score.astype(np.int32)),
            "text_masked": masked,
        })

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------

def exact_dedup_documents(sf_dir: str,
                          cfg: PipelineConfig = DEFAULT_CONFIG):
    """content_hash → canonical_doc_id (min), n_copies.

    The groupby(content_hash) is the exact-dedup shuffle (SURVEY §7.3);
    at transcript scale the same shape runs inside the quality pipeline.
    """
    from ray.data.aggregate import Count, Min
    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def add_hash(batch: pa.Table) -> pa.Table:
        import hashlib
        from dataquality_ray.spec import EDGE_WS_PATTERN, WS_PLUS_PATTERN
        norm = pc.replace_substring_regex(
            pc.replace_substring_regex(
                pc.utf8_lower(batch["text"]), EDGE_WS_PATTERN, ""),
            WS_PLUS_PATTERN, " ")
        from dataquality_ray.arrowutil import md5_digests
        hashes = [d.hex() for d in md5_digests(norm)]
        return pa.table({
            "doc_id": batch["doc_id"],
            "content_hash": pa.array(hashes, pa.string()),
        })

    ds = ds.map_batches(add_hash, batch_format="pyarrow")
    return ds.groupby("content_hash").aggregate(
        Min("doc_id", alias_name="canonical_doc_id"),
        Count(alias_name="n_copies"))


def near_dup_documents(sf_dir: str):
    """(id_a, id_b, jaccard) pairs with distinct-token Jaccard >= 0.9.

    SQL-oracle-checked against an EXACT all-pairs join; the pipeline's
    LSH candidate recall is threshold-dependent — P[miss] = (1-j^4)^32 ≈
    1.4e-15 at the configured 0.9, but ~1.5e-4 at j = 0.7. If
    NEAR_DUP_DOC_JACCARD is ever lowered, re-derive the banding (fewer
    rows per band) or the oracle comparison can mismatch on boundary
    pairs with no diagnostic pointing at LSH recall.
    """
    ds = _docs(sf_dir, columns=["doc_id", "text"])
    return token_jaccard_pairs(ds, NEAR_DUP_DOC_JACCARD, id_col="doc_id")


SHINGLE_NGRAM = 3            # word-ngram size for shingle near-dup
SHINGLE_NEAR_DUP_JACCARD = 0.8


def shingle_near_dup_documents(sf_dir: str):
    """(id_a, id_b, jaccard) pairs with 3-word-SHINGLE-set Jaccard >=
    0.8 — the order-sensitive n-gram Jaccard dedup (token-set Jaccard
    is permissive to word reorderings; shingles are not). Same
    MinHash-LSH + exact-verify topology as near_dup_documents, with
    shingle hashes as the unit; SQL-oracle-checked against an exact
    all-pairs list_intersect join over DuckDB-built shingles. LSH miss
    P at the 0.8 boundary = (1-0.8^4)^32 ~= 4.8e-8.
    """
    ds = _docs(sf_dir, columns=["doc_id", "text"])
    return token_jaccard_pairs(ds, SHINGLE_NEAR_DUP_JACCARD,
                               id_col="doc_id", ngram=SHINGLE_NGRAM)


def near_dup_source_matrix(sf_dir: str, num_partitions: int = 8):
    """(source_a, source_b, n_pairs): WHERE the near-duplication lives —
    near-dup pair mass between each unordered source pair (diagonal =
    within-source pairs). The datasheet stat that tells a corpus owner
    whether duplication is a mirror-site pair (one hot off-diagonal
    cell) or template reuse inside one source (a hot diagonal) before
    spending a full dedup pass.

    Scale shape: composes the LSH pair generator (already bounded) with
    two slim hash joins against the (doc_id, source) projection —
    repartition before/between the joins and a materialize in the
    middle per the chained-join invariant (CLAUDE.md); the per-batch
    pair-normalize + count partial keeps the final aggregate at
    ≤ |sources|² rows.
    """
    import pandas as pd

    from ray.data.aggregate import Sum
    from dataquality_ray.arrowutil import from_pandas_clean

    pairs = near_dup_documents(sf_dir)
    docs = _docs(sf_dir, columns=["doc_id", "source"])

    def _as_src(key, col):
        def rn(t: pa.Table) -> pa.Table:
            return pa.table({key: pc.cast(t["doc_id"], pa.int64()),
                             col: t["source"]})
        return rn

    src_a = docs.map_batches(_as_src("ka", "source_x"),
                             batch_format="pyarrow")
    src_b = docs.map_batches(_as_src("kb", "source_y"),
                             batch_format="pyarrow")
    slim = pairs.map_batches(lambda t: t.select(["id_a", "id_b"]),
                             batch_format="pyarrow")
    nparts = num_partitions
    j1 = slim.repartition(nparts) \
        .join(src_a, join_type="inner", num_partitions=nparts,
              on=("id_a",), right_on=("ka",)) \
        .repartition(nparts).materialize()
    j2 = j1.join(src_b, join_type="inner", num_partitions=nparts,
                 on=("id_b",), right_on=("kb",))

    def partial(t: pa.Table) -> pa.Table:
        sx = np.asarray(t["source_x"].to_pylist(), dtype=object)
        sy = np.asarray(t["source_y"].to_pylist(), dtype=object)
        g = (pd.DataFrame({"source_a": np.minimum(sx, sy),
                           "source_b": np.maximum(sx, sy)})
             .groupby(["source_a", "source_b"], sort=False)
             .size().rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return from_pandas_clean(g)

    return j2.map_batches(partial, batch_format="pyarrow") \
        .groupby(["source_a", "source_b"]) \
        .aggregate(Sum("n", alias_name="n_pairs"))


def max_similarity_per_doc(sf_dir: str):
    """Per doc appearing in near-dup pairs: its max Jaccard (A6 analog,
    reference routes.py:378)."""
    from ray.data.aggregate import Max
    pairs = near_dup_documents(sf_dir)

    def explode(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pa.concat_arrays([
                batch["id_a"].combine_chunks()
                if isinstance(batch["id_a"], pa.ChunkedArray) else batch["id_a"],
                batch["id_b"].combine_chunks()
                if isinstance(batch["id_b"], pa.ChunkedArray) else batch["id_b"],
            ]),
            "jaccard": pa.concat_arrays([
                batch["jaccard"].combine_chunks()
                if isinstance(batch["jaccard"], pa.ChunkedArray) else batch["jaccard"],
            ] * 2),
        })

    both = pairs.map_batches(explode, batch_format="pyarrow")
    return both.groupby("doc_id").aggregate(
        Max("jaccard", alias_name="max_jaccard"))


def union_dedup_documents(sf_dir: str):
    """D4/D5 analog: union of the full table with its first-100 subset,
    then key-level dedup (one row per doc_id, min n_chars meaningless —
    they're equal — count proves the dedup)."""
    from ray.data.aggregate import Count
    full = _docs(sf_dir, columns=["doc_id"])
    subset = _docs(sf_dir, columns=["doc_id"]).map_batches(
        lambda t: t.filter(pc.less(t["doc_id"], 100)),
        batch_format="pyarrow")
    unioned = full.union(subset)
    return unioned.groupby("doc_id").aggregate(Count(alias_name="n_rows"))


# ---------------------------------------------------------------------------
# language id (stopword-marker variant — SQL-expressible; the char-n-gram
# model is used by the transcript pipeline)
# ---------------------------------------------------------------------------

def _pred_lang_of(text: "pa.Array | pa.ChunkedArray") -> np.ndarray:
    """Vectorized stopword-marker language prediction (the pinned
    spec.STOPWORD_MARKERS rule; first max wins, zero markers -> und).
    Shared by langid_documents and curated_documents."""
    s = pl.from_arrow(text)
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    toks = s.str.to_lowercase().str.extract_all(TOKEN_PATTERN)
    counts = []
    for _, markers in STOPWORD_MARKERS:
        c = (toks.list.eval(
                pl.element().is_in(list(markers)).cast(pl.Int32))
             .list.sum().fill_null(0))
        counts.append(c.to_numpy())
    cmat = np.stack(counts, axis=1)          # (n, n_langs)
    best = cmat.max(axis=1)
    arg = cmat.argmax(axis=1)                # first max wins (pinned)
    langs = np.array([l for l, _ in STOPWORD_MARKERS])
    return np.where(best > 0, langs[arg], "und")


def langid_documents(sf_dir: str):
    """doc_id, pred_lang via the pinned spec.STOPWORD_MARKERS rule."""
    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def classify(batch: pa.Table) -> pa.Table:
        pred = _pred_lang_of(batch["text"])
        return pa.table({
            "doc_id": batch["doc_id"],
            "pred_lang": pa.array(pred.tolist(), pa.string()),
        })

    return ds.map_batches(classify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# per-source aggregate (A3 analog)
# ---------------------------------------------------------------------------

def doc_length_histogram(sf_dir: str):
    """(source, len_bucket, n_docs): per-source document-length
    distribution in log2 buckets (len_bucket = bit length of n_chars;
    0 for empty docs) — the datasheet/"dataset card" length profile.
    Exactness: bit length is computed with the vectorized integer
    binary search (float log2 misrounds near powers of two); the
    DuckDB twin measures the binary rendering's string length, which
    is exact by construction. Bounded two-phase aggregate
    (|sources| × ~64 cells)."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, columns=["doc_id", "source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        n = batch["n_chars"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        bitlen = np.zeros(len(n), dtype=np.int64)
        v = n.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            big = v >= np.uint64(1 << shift)
            bitlen[big] += shift
            v[big] >>= np.uint64(shift)
        bitlen[n > 0] += 1
        g = (pl.DataFrame({
            "source": pl.from_arrow(batch["source"]),
            "len_bucket": pl.Series(bitlen),
        }).group_by(["source", "len_bucket"])
            .agg(n=pl.len().cast(pl.Int64)))
        return g.to_arrow().cast(pa.schema([
            ("source", pa.string()), ("len_bucket", pa.int64()),
            ("n", pa.int64())]))

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["source", "len_bucket"])
           .aggregate(Sum("n", alias_name="n_docs")))

    def clean(t: pa.Table) -> pa.Table:
        return pa.table({
            "source": t["source"],
            "len_bucket": pc.cast(t["len_bucket"], pa.int64()),
            "n_docs": pc.cast(t["n_docs"], pa.int64()),
        })

    return agg.map_batches(clean, batch_format="pyarrow")


def quality_drift_by_source(sf_dir: str,
                            cfg: PipelineConfig = DEFAULT_CONFIG):
    """(source, n_docs, ks_milli): per-source distribution drift — the
    two-sample Kolmogorov–Smirnov statistic between each source's
    heuristic quality-score distribution and the REST of the corpus,
    in exact integer milli ("which domain's quality profile deviates",
    the per-source companion of event_value_drift). The sup of a
    step-CDF difference is attained at an observed score, so
    evaluating on the distinct observed scores is exact; the compare
    is cross-multiplied (|cs*(ng-ns) − (cg−cs)*ns|) so no division
    happens before the final milli floor.

    Shape: per-batch bincount partials shrink everything to
    (source, score) cells — a BOUNDED aggregate (|sources| × 101
    rows regardless of corpus size); the KS fold runs on that
    constant-size table."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, columns=["doc_id", "text", "source"])
    ds = ds.map_batches(functools.partial(heuristics_batch, cfg=cfg),
                        batch_format="pyarrow", zero_copy_batch=True)

    def partial(batch: pa.Table) -> pa.Table:
        from dataquality_ray.stages.heuristics import heuristic_overall4
        ov = heuristic_overall4(batch)
        g = (pl.DataFrame({
            "source": pl.from_arrow(batch["source"]),
            "overall": pl.Series(ov.astype(np.int64)),
        }).group_by(["source", "overall"])
            .agg(n=pl.len().cast(pl.Int64)))
        return g.to_arrow().cast(pa.schema([
            ("source", pa.string()), ("overall", pa.int64()),
            ("n", pa.int64())]))

    cells = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["source", "overall"])
             .aggregate(Sum("n", alias_name="n"))
             .to_pandas())          # |sources| x 101 rows — bounded

    scores = np.sort(cells["overall"].unique())
    sources = sorted(cells["source"].unique())
    pivot = {s: np.zeros(len(scores), dtype=np.int64) for s in sources}
    pos = {int(v): i for i, v in enumerate(scores)}
    for s, ov, n in zip(cells["source"], cells["overall"], cells["n"]):
        pivot[s][pos[int(ov)]] += int(n)
    total = np.zeros(len(scores), dtype=np.int64)
    for s in sources:
        total += pivot[s]
    cg = np.cumsum(total)
    ng = int(cg[-1])
    out_s, out_n, out_k = [], [], []
    for s in sources:
        cs = np.cumsum(pivot[s])
        ns = int(cs[-1])
        nr = ng - ns
        if nr == 0:
            ks = 0
        else:
            # python ints: cs*nr products exceed int64 at full scale
            num = max(abs(int(a) * nr - (int(b) - int(a)) * ns)
                      for a, b in zip(cs, cg))
            ks = (1000 * num) // (ns * nr)
        out_s.append(s)
        out_n.append(ns)
        out_k.append(ks)
    return pa.table({
        "source": pa.array(out_s, pa.string()),
        "n_docs": pa.array(out_n, pa.int64()),
        "ks_milli": pa.array(out_k, pa.int64()),
    })


def quality_by_source(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    """source → n_docs, avg overall quality (integer mean: sum // count)."""
    from ray.data.aggregate import Count, Sum
    ds = _docs(sf_dir, columns=["doc_id", "text", "source"])
    ds = ds.map_batches(functools.partial(heuristics_batch, cfg=cfg),
                        batch_format="pyarrow", zero_copy_batch=True)

    def overall(batch: pa.Table) -> pa.Table:
        s = {c: batch[c].to_numpy(zero_copy_only=False).astype(np.int64)
             for c in ("length_score", "repetition_score", "symbol_score",
                       "boilerplate_score")}
        ov = (s["length_score"] + s["repetition_score"]
              + s["symbol_score"] + s["boilerplate_score"]) // 4
        return pa.table({
            "source": batch["source"],
            "overall": pa.array(ov, pa.int64()),
        })

    agg = (ds.map_batches(overall, batch_format="pyarrow")
           .groupby("source")
           .aggregate(Count(alias_name="n_docs"),
                      Sum("overall", alias_name="sum_overall")))

    def int_mean(batch: pa.Table) -> pa.Table:
        avg = (batch["sum_overall"].to_numpy(zero_copy_only=False)
               // batch["n_docs"].to_numpy(zero_copy_only=False))
        return pa.table({
            "source": batch["source"],
            "n_docs": pc.cast(batch["n_docs"], pa.int64()),
            "avg_quality": pa.array(avg, pa.int64()),
        })

    return agg.map_batches(int_mean, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# entity / key-term extraction (reference: bedrock.py:225-232 entity
# metadata; metadata.py:218-243 consumes topics/key_terms in the dedup gate)
# ---------------------------------------------------------------------------

def key_terms_batch(batch: pa.Table, id_cols, text_col: str = "text",
                    k: int | None = None) -> pa.Table:
    """Vectorized spec.key_terms over a batch: polars tokenization +
    explode, pandas per-doc rank — each document is one row, so the whole
    computation is batch-local (no shuffle)."""
    import pandas as pd

    from dataquality_ray.spec import KEY_TERM_STOPWORDS, KEY_TERMS_TOP_K
    k = k or KEY_TERMS_TOP_K
    ids = {c: batch[c].to_pandas() for c in id_cols}
    toks = (pl.from_arrow(batch[text_col])
            .str.to_lowercase().str.extract_all(TOKEN_PATTERN))
    df = pl.DataFrame(dict(**{c: pl.Series(v) for c, v in ids.items()},
                           term=toks)) \
        .explode("term").drop_nulls() \
        .filter(~pl.col("term").is_in(list(KEY_TERM_STOPWORDS))) \
        .group_by(list(id_cols) + ["term"]).len().rename({"len": "tf"}) \
        .to_pandas()
    df = df.sort_values(list(id_cols) + ["tf", "term"],
                        ascending=[True] * len(id_cols) + [False, True],
                        kind="mergesort")
    df["rank"] = df.groupby(list(id_cols), sort=False).cumcount() + 1
    df = df[df["rank"] <= k]
    df["tf"] = df["tf"].astype("int64")
    df["rank"] = df["rank"].astype("int64")
    from dataquality_ray.arrowutil import from_pandas_clean
    return from_pandas_clean(df.reset_index(drop=True))


def doc_key_terms(sf_dir: str):
    """(doc_id, term, tf, rank): top-5 non-stopword tokens per document
    by (tf desc, term asc) — SQL-checked."""
    ds = _docs(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(
        functools.partial(key_terms_batch, id_cols=["doc_id"]),
        batch_format="pyarrow", zero_copy_batch=True)


def entities_batch(batch: pa.Table, id_cols, text_col: str = "text"
                   ) -> pa.Table:
    """Capitalized-span entity mentions per row with counts. Rust regex
    needs the (?-u) prefix so \\b is ASCII like RE2/Python-ASCII (spec
    comment at ENTITY_PATTERN)."""
    from dataquality_ray.spec import ENTITY_PATTERN
    ids = {c: batch[c].to_pandas() for c in id_cols}
    ents = pl.from_arrow(batch[text_col]) \
        .str.extract_all("(?-u)" + ENTITY_PATTERN)
    df = pl.DataFrame(dict(**{c: pl.Series(v) for c, v in ids.items()},
                           entity=ents)) \
        .explode("entity").drop_nulls() \
        .group_by(list(id_cols) + ["entity"]).len() \
        .rename({"len": "n_mentions"}) \
        .to_pandas()
    df["n_mentions"] = df["n_mentions"].astype("int64")
    from dataquality_ray.arrowutil import from_pandas_clean
    return from_pandas_clean(df)


COOC_TOP_K = 50


def key_term_cooccurrence(sf_dir: str):
    """(term_a, term_b, n_docs): global co-occurrence of each doc's
    top-5 key terms (term_a < term_b), top-50 by (count desc, terms
    asc). Pair explosion is bounded by the per-doc key-term cap (k·(k-1)/2
    = 10 pairs/doc), built batch-locally with a vectorized self-merge;
    the only shuffle is the pair-keyed count groupby + tiny top-k sort.
    SQL-checked."""
    import pandas as pd
    from ray.data.aggregate import Sum
    from dataquality_ray.arrowutil import from_pandas_clean

    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def pairs(batch: pa.Table) -> pa.Table:
        # key-term extraction AND pair building in ONE map: a doc's
        # terms never cross a block boundary (Ray may re-chunk between
        # operators, which would silently drop pairs)
        kt = key_terms_batch(batch, id_cols=["doc_id"])
        df = kt.select(["doc_id", "term"]).to_pandas()
        m = df.merge(df, on="doc_id", suffixes=("_a", "_b"))
        m = m[m["term_a"] < m["term_b"]]
        g = (m.groupby(["term_a", "term_b"], sort=False).size()
             .rename("n").reset_index())
        return from_pandas_clean(g)

    agg = ds.map_batches(pairs, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby(["term_a", "term_b"]) \
        .aggregate(Sum("n", alias_name="n_docs"))
    top = agg.sort(["n_docs", "term_a", "term_b"],
                   descending=[True, False, False]).limit(COOC_TOP_K)
    return top.map_batches(
        lambda t: pa.table({"term_a": t["term_a"],
                            "term_b": t["term_b"],
                            "n_docs": pc.cast(t["n_docs"], pa.int64())}),
        batch_format="pyarrow")


TFIDF_TOP_K = 5
TFIDF_IDF_SCALE = 1000


def doc_tfidf_terms(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    """(doc_id, term, tf, score, rank): top-5 non-stopword terms per doc
    by integer tf-idf — score = tf * ((N*{scale}) // df), df = the
    term's document frequency, N = corpus size. Integer idf keeps the
    ranking bit-deterministic across engines (no float log ordering).

    Topology (the 100-TB shape): batch-local tf → corpus df via a
    term-keyed groupby (vocab-sized, never on the driver) → df attached
    back with a hash join on term → per-doc top-k as a BUCKETED-LOCAL
    rank: shuffle once on splitmix(doc_id) % K (K ~ 2× cluster CPUs),
    then one vectorized pandas sort + group-head per bucket — never a
    #docs-output-group Ray aggregate (CLAUDE.md invariant; the
    role_tool_stats shape). Two shuffles, both hash-partitioned;
    nothing corpus-proportional is materialized.
    """
    import pandas as pd

    from dataquality_ray.arrowutil import from_pandas_clean
    from dataquality_ray.spec import KEY_TERM_STOPWORDS

    docs = _docs(sf_dir, columns=["doc_id", "text"])
    n_docs = docs.count()   # parquet metadata count — no scan

    def tf_batch(batch: pa.Table) -> pa.Table:
        toks = (pl.from_arrow(batch["text"])
                .str.to_lowercase().str.extract_all(TOKEN_PATTERN))
        df = pl.DataFrame({"doc_id": pl.Series(batch["doc_id"]
                                               .to_pandas()),
                           "term": toks}) \
            .explode("term").drop_nulls() \
            .filter(~pl.col("term").is_in(list(KEY_TERM_STOPWORDS))) \
            .group_by(["doc_id", "term"]).len().rename({"len": "tf"}) \
            .to_pandas()
        df["tf"] = df["tf"].astype("int64")
        return from_pandas_clean(df)

    # materialize: consumed twice (df aggregation + join probe side)
    tf = docs.map_batches(tf_batch, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    df_tbl = tf.groupby("term").count()

    scored = tf.join(df_tbl, join_type="inner",
                     num_partitions=max(4, cfg.num_buckets // 4),
                     on=("term",), right_on=("term",))

    from dataquality_ray.stages.bucketing import (
        cluster_buckets,
        splitmix_bucket,
    )

    nb = cluster_buckets()

    def score(batch: pa.Table) -> pa.Table:
        tfv = batch["tf"].to_numpy(zero_copy_only=False)
        dfv = batch["count()"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        s = tfv * ((n_docs * TFIDF_IDF_SCALE) // dfv)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "term": batch["term"],
            "tf": batch["tf"],
            "score": pa.array(s, pa.int64()),
            "part": pa.array(splitmix_bucket(ids, nb)),
        })

    def topk_bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["doc_id", "score", "term"],
                          ascending=[True, False, True],
                          kind="mergesort")
        g = g.groupby("doc_id", sort=False).head(TFIDF_TOP_K).copy()
        g["rank"] = (g.groupby("doc_id", sort=False).cumcount() + 1) \
            .astype(np.int64)
        return g.drop(columns=["part"])

    return (scored.map_batches(score, batch_format="pyarrow")
            .groupby("part")
            .map_groups(topk_bucket, batch_format="pandas"))


def token_count_documents(sf_dir: str):
    """(doc_id, n_ws_tokens, n_bpe_tokens, n_chars): token counting the
    way a training-data pipeline budgets text — whitespace tokens plus
    a BPE-ish GPT-style pre-tokenizer count (spec.BPE_TOKEN_PATTERN;
    the same regex runs in polars and DuckDB with identical
    leftmost-first semantics). One zero-copy vectorized map, no
    shuffle."""
    from dataquality_ray.spec import BPE_TOKEN_PATTERN, WS_TOKEN_PATTERN

    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def count(batch: pa.Table) -> pa.Table:
        s = pl.from_arrow(batch["text"])
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_ws_tokens": pa.array(
                s.str.count_matches(WS_TOKEN_PATTERN)
                .cast(pl.Int64).to_numpy(), pa.int64()),
            "n_bpe_tokens": pa.array(
                s.str.to_lowercase()
                .str.count_matches(BPE_TOKEN_PATTERN)
                .cast(pl.Int64).to_numpy(), pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(batch["text"]),
                               pa.int64()),
        })

    return ds.map_batches(count, batch_format="pyarrow",
                          zero_copy_batch=True)


def near_dup_kept_documents(sf_dir: str, num_partitions: int = 8):
    """(doc_id,): the documents that SURVIVE near-dup removal —
    connected components over the near-dup pair graph (same
    dup_clusters_auto dispatch as the transcript path: driver
    union-find under a provable pair limit, hash-join label
    propagation beyond it), keeping the min doc_id of each cluster.
    The removal side of the dedup story — pair detection alone isn't a
    pipeline a user can run. SQL-checked against a recursive-CTE
    component oracle + anti-join.
    """
    from dataquality_ray.stages.clustering import dup_clusters_auto

    pairs = near_dup_documents(sf_dir).map_batches(
        lambda t: pa.table({"key_a": t["id_a"], "key_b": t["id_b"]}),
        batch_format="pyarrow")
    clusters = dup_clusters_auto(pairs)          # (key, cluster)
    if isinstance(clusters, pa.Table):           # driver union-find path
        clusters = ray.data.from_arrow(clusters)

    def non_canonical(t: pa.Table) -> pa.Table:
        mask = pc.not_equal(t["key"], t["cluster"])
        return pa.table({
            "doc_id": t.filter(mask)["key"],
            "dropped": pa.array([True] * int(pc.sum(mask).as_py() or 0)),
        })

    drop = clusters.map_batches(non_canonical, batch_format="pyarrow")
    joined = _docs(sf_dir, columns=["doc_id"]).join(
        drop, join_type="left_outer", num_partitions=num_partitions,
        on=("doc_id",), right_on=("doc_id",))
    return joined.map_batches(
        lambda t: pa.table(
            {"doc_id": t.filter(pc.is_null(t["dropped"]))["doc_id"]}),
        batch_format="pyarrow")


def near_dup_longest_kept_documents(sf_dir: str,
                                    num_partitions: int = 8,
                                    num_buckets: int = 64):
    """(doc_id,): near-dup removal with QUALITY-AWARE survivor
    selection — per connected component of the near-dup pair graph,
    keep the LONGEST member (max n_chars, ties -> min doc_id) instead
    of near_dup_kept_documents' min-id rule. This is what production
    dedup actually ships: among near-identical copies, the longest is
    usually the superset (the others are truncations), so min-id keeps
    an arbitrary — possibly clipped — copy.

    Shape: the near-dup pair graph + dup_clusters_auto (driver
    union-find under a provable limit, distributed label propagation
    beyond), then ONE hash join against the 2-column (doc_id, n_chars)
    projection and a cluster%K-bucketed local argmax — winner selection
    never runs a Ray aggregate with #clusters output groups (dup-heavy
    corpora push #clusters toward #docs; CLAUDE.md huge-group rule).
    Repartitions guard both joins (label/groupby outputs can carry
    schemaless empty blocks — see CLAUDE.md chained-join invariant).
    """
    from dataquality_ray.stages.clustering import dup_clusters_auto

    pairs = near_dup_documents(sf_dir).map_batches(
        lambda t: pa.table({"key_a": t["id_a"], "key_b": t["id_b"]}),
        batch_format="pyarrow")
    clusters = dup_clusters_auto(pairs)          # (key, cluster)
    if isinstance(clusters, pa.Table):
        clusters = ray.data.from_arrow(clusters)

    nch = _docs(sf_dir, columns=["doc_id", "n_chars"])
    mem = clusters.repartition(num_partitions).join(
        nch, join_type="inner", num_partitions=num_partitions,
        on=("key",), right_on=("doc_id",))

    def add_bucket(t: pa.Table) -> pa.Table:
        cb = (t["cluster"].to_numpy(zero_copy_only=False)
              % num_buckets).astype(np.int32)
        return t.append_column("cb", pa.array(cb))

    def drops_bucket(t: pa.Table) -> pa.Table:
        d = pl.from_arrow(t.select(["key", "cluster", "n_chars"]))
        w = (d.sort(["n_chars", "key"], descending=[True, False])
             .group_by("cluster", maintain_order=True)
             .agg(win=pl.col("key").first()))
        drops = (d.join(w, on="cluster")
                 .filter(pl.col("key") != pl.col("win")))
        return pa.table({
            "doc_id": pa.array(drops["key"].to_list(), pa.int64()),
            "dropped": pa.array([True] * drops.height),
        })

    # materialize: the drop list is tiny, and WITHOUT this barrier the
    # two hash joins coexist in one streaming DAG — 2×num_partitions
    # aggregator actors starve the map tasks on a small cluster
    # (reproduced: full-gate deadlock at the 4-cpu test session;
    # CLAUDE.md chained-join invariant)
    drop = (mem.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("cb")
            .map_groups(drops_bucket, batch_format="pyarrow")
            .materialize())

    joined = _docs(sf_dir, columns=["doc_id"]).join(
        drop.repartition(num_partitions), join_type="left_outer",
        num_partitions=num_partitions,
        on=("doc_id",), right_on=("doc_id",))
    return joined.map_batches(
        lambda t: pa.table(
            {"doc_id": t.filter(pc.is_null(t["dropped"]))["doc_id"]}),
        batch_format="pyarrow")


def quality_length_matrix(sf_dir: str,
                          cfg: PipelineConfig = DEFAULT_CONFIG):
    """(score_bucket, len_bucket, n_docs): the joint
    quality-score × length distribution — score_bucket =
    overall_quality_score // 10 (0..10), len_bucket = exact bit length
    of n_chars (0 for empty docs, same integer binary search as
    doc_length_histogram — float log2 misrounds near powers of two).
    The 2-D table a curriculum / filtering planner reads to see whether
    "low quality" is just "short" (and pick thresholds per length band
    instead of one global cutoff).

    Shape: per-batch bincount partials over a bounded 11×~64 grid, one
    tiny grid-keyed aggregate — nothing corpus-proportional moves.
    """
    from ray.data.aggregate import Sum

    scored = quality_documents(sf_dir, cfg)

    def partial(batch: pa.Table) -> pa.Table:
        sb = (batch["overall_quality_score"]
              .to_numpy(zero_copy_only=False).astype(np.int64) // 10)
        n = batch["n_chars"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        bitlen = np.zeros(len(n), dtype=np.int64)
        v = n.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            big = v >= np.uint64(1 << shift)
            bitlen[big] += shift
            v[big] >>= np.uint64(shift)
        bitlen[n > 0] += 1
        g = (pl.DataFrame({"score_bucket": pl.Series(sb),
                           "len_bucket": pl.Series(bitlen)})
             .group_by(["score_bucket", "len_bucket"])
             .agg(n=pl.len().cast(pl.Int64)))
        return g.to_arrow()

    return (scored.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby(["score_bucket", "len_bucket"])
            .aggregate(Sum("n", alias_name="n_docs")))


def dup_cluster_size_histogram(sf_dir: str, num_buckets: int = 64):
    """(cluster_size, n_clusters): the size distribution of near-dup
    connected components — the first chart a dedup audit draws (a few
    giant components usually mean boilerplate gluing unrelated docs
    together; many 2-clusters mean genuine pair dups). Sizes count
    only docs that appear in at least one near-dup pair (singletons
    aren't components).

    Shape: component labels from dup_clusters_auto, per-cluster size
    via a cluster%K-bucketed local count (never a #clusters-output Ray
    aggregate), then a tiny size-keyed final fold (#distinct sizes
    rows).
    """
    from ray.data.aggregate import Sum

    from dataquality_ray.stages.clustering import dup_clusters_auto

    pairs = near_dup_documents(sf_dir).map_batches(
        lambda t: pa.table({"key_a": t["id_a"], "key_b": t["id_b"]}),
        batch_format="pyarrow")
    clusters = dup_clusters_auto(pairs)
    if isinstance(clusters, pa.Table):
        clusters = ray.data.from_arrow(clusters)

    def add_bucket(t: pa.Table) -> pa.Table:
        cb = (t["cluster"].to_numpy(zero_copy_only=False)
              % num_buckets).astype(np.int32)
        return t.append_column("cb", pa.array(cb))

    def sizes_bucket(t: pa.Table) -> pa.Table:
        g = (pl.from_arrow(t.select(["cluster"]))
             .group_by("cluster")
             .agg(sz=pl.len().cast(pl.Int64))
             .group_by("sz").agg(n=pl.len().cast(pl.Int64)))
        return pa.table({
            "cluster_size": pa.array(g["sz"].to_list(), pa.int64()),
            "n": pa.array(g["n"].to_list(), pa.int64()),
        })

    return (clusters.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("cb")
            .map_groups(sizes_bucket, batch_format="pyarrow")
            .groupby("cluster_size")
            .aggregate(Sum("n", alias_name="n_clusters")))


SAMPLE_PER_SOURCE = 10


def stratified_sample_documents(sf_dir: str):
    """(doc_id, source): deterministic stratified sample — per source,
    the SAMPLE_PER_SOURCE docs with the smallest frozen hash of
    str(doc_id) (ties impossible: doc_id unique). Hash-rank sampling is
    stable under re-partitioning and re-runs, and two-phase: per-batch
    partial top-n, then a groupby over the (tiny) per-batch winners —
    the latest_event_per_user argmax shape, nothing full-corpus moves.
    """
    from dataquality_ray.arrowutil import from_pandas_clean
    from dataquality_ray.spec import token_hash_u64
    import pandas as pd

    ds = _docs(sf_dir, columns=["doc_id", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["h"] = [token_hash_u64(str(i)) for i in df["doc_id"]]
        df = df.sort_values(["source", "h"], kind="mergesort")
        return from_pandas_clean(
            df.groupby("source", sort=False).head(SAMPLE_PER_SOURCE))

    def final(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values("h", kind="mergesort") \
            .head(SAMPLE_PER_SOURCE)
        return df[["doc_id", "source"]]

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("source")
            .map_groups(final, batch_format="pandas"))


VOCAB_TOP_K = 100


def corpus_vocab_stats(sf_dir: str):
    """(term, cf, df): the corpus's top-100 terms by collection
    frequency (ties → term asc), with document frequency. Two-phase:
    per-batch partial (cf, df) combine — each document lives in exactly
    one batch, so per-batch distinct-doc counts sum exactly — then a
    vocab-keyed groupby of the small partials and a tiny top-k sort.
    Nothing document-proportional crosses the shuffle.
    """
    from ray.data.aggregate import Sum
    from dataquality_ray.arrowutil import from_pandas_clean

    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        toks = (pl.from_arrow(batch["text"])
                .str.to_lowercase().str.extract_all(TOKEN_PATTERN))
        g = pl.DataFrame({"doc_id": pl.Series(batch["doc_id"]
                                              .to_pandas()),
                          "term": toks}) \
            .explode("term").drop_nulls() \
            .group_by("term") \
            .agg(cf=pl.len(), df=pl.col("doc_id").n_unique()) \
            .to_pandas()
        g["cf"] = g["cf"].astype("int64")
        g["df"] = g["df"].astype("int64")
        return from_pandas_clean(g)

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("term").aggregate(Sum("cf", alias_name="cf"),
                                      Sum("df", alias_name="df")))
    top = agg.sort(["cf", "term"], descending=[True, False]) \
        .limit(VOCAB_TOP_K)

    def clean(t: pa.Table) -> pa.Table:
        return pa.table({
            "term": t["term"],
            "cf": pc.cast(t["cf"], pa.int64()),
            "df": pc.cast(t["df"], pa.int64()),
        })

    return top.map_batches(clean, batch_format="pyarrow")


OOV_VOCAB_K = 20             # top-K corpus terms form the "tokenizer" vocab


def doc_oov_rate(sf_dir: str):
    """(doc_id, n_tokens, n_oov, oov_milli): per-document
    out-of-vocabulary rate against the corpus's top-OOV_VOCAB_K terms
    by collection frequency (ties → term asc) — the tokenizer-coverage
    / vocab-pruning health signal a training pipeline runs before
    committing to a vocabulary. Two stages: the tiny vocab is computed
    with the corpus_vocab_stats two-phase aggregate and BROADCAST
    (ray.put once); the per-doc pass is one vectorized polars
    membership map — the corpus never shuffles. oov_milli =
    n_oov*1000 // n_tokens (0 for token-less docs) keeps the rate
    integer-exact for the value-hash gate."""
    from ray.data.aggregate import Sum
    from dataquality_ray.arrowutil import from_pandas_clean

    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        toks = (pl.from_arrow(batch["text"])
                .str.to_lowercase().str.extract_all(TOKEN_PATTERN))
        g = pl.DataFrame({"term": toks}).explode("term").drop_nulls() \
            .group_by("term").agg(cf=pl.len()).to_pandas()
        g["cf"] = g["cf"].astype("int64")
        return from_pandas_clean(g)

    vocab_tbl = (ds.map_batches(partial, batch_format="pyarrow",
                                zero_copy_batch=True)
                 .groupby("term").aggregate(Sum("cf", alias_name="cf"))
                 .sort(["cf", "term"], descending=[True, False])
                 .limit(OOV_VOCAB_K).to_pandas())
    vocab_ref = ray.put(frozenset(vocab_tbl["term"].tolist()))

    def per_doc(batch: pa.Table) -> pa.Table:
        vocab = ray.get(vocab_ref)
        df = pl.DataFrame({
            "doc_id": pl.Series(batch["doc_id"].to_pandas()),
            "toks": (pl.from_arrow(batch["text"])
                     .str.to_lowercase()
                     .str.extract_all(TOKEN_PATTERN)),
        })
        out = df.with_columns(
            n_tokens=pl.col("toks").list.len().cast(pl.Int64),
            n_oov=pl.col("toks").list.eval(
                (~pl.element().is_in(sorted(vocab))).cast(pl.Int64)
            ).list.sum().fill_null(0).cast(pl.Int64),
        ).with_columns(
            oov_milli=pl.when(pl.col("n_tokens") > 0)
            .then(pl.col("n_oov") * 1000 // pl.col("n_tokens"))
            .otherwise(0).cast(pl.Int64),
        ).drop("toks")
        return out.to_arrow()

    return ds.map_batches(per_doc, batch_format="pyarrow",
                          zero_copy_batch=True)


DSIR_BUCKETS = 4096          # hashed-feature dimensionality
DSIR_TARGET_SOURCE = "src0"  # the "target distribution" exemplar slice


def dsir_importance_documents(sf_dir: str):
    """(doc_id, n_tokens, importance): DSIR-style hashed-n-gram
    importance weights (Xie et al. 2023, "Data Selection for Language
    Models via Importance Resampling") — the data-SELECTION primitive
    that reweights a raw corpus toward a target distribution. Target =
    the ``DSIR_TARGET_SOURCE`` slice; features = unigram occurrences of
    the lowered text hashed into DSIR_BUCKETS buckets with the frozen
    md5-u64 token hash; per-doc importance = Σ over token occurrences
    of a log2-QUANTIZED log-likelihood ratio
    ``bit_length(t[b]+1) - bit_length(r[b]+1)`` (t = target bucket
    count, r = raw/corpus bucket count). The quantization trades the
    paper's float log for exact integers so the whole surface is
    value-hash-checkable (DuckDB ``length(bin(x))`` == Python
    ``int.bit_length``, parity asserted in the oracle) — the repo's
    fixed-point precedent (CLAUDE.md exactness rule).

    Scale shape: learn pass emits ≤ 2×DSIR_BUCKETS bounded rows per
    batch into a constant-size aggregate (never a vocab groupby); the
    4096-int8-range weight table broadcasts via ``ray.put``; the score
    pass is one vectorized tokenize + gather + segmented reduceat per
    batch — the corpus never shuffles in either pass.
    """
    from ray.data.aggregate import Sum
    from dataquality_ray.spec import token_hash_u64

    ds = _docs(sf_dir, columns=["doc_id", "text", "source"])

    def _bucketize(texts: pa.ChunkedArray):
        """lowered-unigram → bucket codes; returns (lens, flat_buckets)."""
        toks = (pl.from_arrow(texts).str.to_lowercase()
                .str.extract_all(TOKEN_PATTERN))
        lens = toks.list.len().to_numpy().astype(np.int64)
        flat = toks.explode(empty_as_null=False).to_numpy()
        if len(flat) == 0:
            return lens, np.empty(0, np.int64)
        cache: dict = {}

        def miss(tok):
            b = cache[tok] = int(token_hash_u64(tok) % DSIR_BUCKETS)
            return b

        bflat = np.fromiter(
            (cache.get(t) if t in cache else miss(t) for t in flat),
            dtype=np.int64, count=len(flat))
        return lens, bflat

    def learn_partial(batch: pa.Table) -> pa.Table:
        lens, bflat = _bucketize(batch["text"])
        raw = np.bincount(bflat, minlength=DSIR_BUCKETS)
        is_tgt = pc.equal(batch["source"],
                          DSIR_TARGET_SOURCE).to_numpy(
                              zero_copy_only=False)
        tgt_mask = np.repeat(is_tgt, lens)
        tgt = np.bincount(bflat[tgt_mask], minlength=DSIR_BUCKETS)
        kinds, buckets, cnts = [], [], []
        for kind, cnt in ((0, raw), (1, tgt)):
            nz = np.nonzero(cnt)[0]
            kinds.append(np.full(len(nz), kind, np.int64))
            buckets.append(nz.astype(np.int64))
            cnts.append(cnt[nz].astype(np.int64))
        return pa.table({"kind": np.concatenate(kinds),
                         "bucket": np.concatenate(buckets),
                         "cnt": np.concatenate(cnts)})

    cells = (ds.map_batches(learn_partial, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby(["kind", "bucket"])
             .aggregate(Sum("cnt", alias_name="cnt"))
             .to_pandas())    # ≤ 2×DSIR_BUCKETS rows by construction
    r = np.zeros(DSIR_BUCKETS, np.int64)
    t = np.zeros(DSIR_BUCKETS, np.int64)
    for kind, arr in ((0, r), (1, t)):
        sel = cells[cells["kind"] == kind]
        arr[sel["bucket"].to_numpy()] = sel["cnt"].to_numpy()
    w = np.array([int(ti + 1).bit_length() - int(ri + 1).bit_length()
                  for ti, ri in zip(t, r)], dtype=np.int64)
    w_ref = ray.put(w)

    def score(batch: pa.Table) -> pa.Table:
        wt = ray.get(w_ref)
        lens, bflat = _bucketize(batch["text"])
        offsets = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=offsets[1:])
        contrib = wt[bflat]
        csum = np.zeros(len(contrib) + 1, np.int64)
        np.cumsum(contrib, out=csum[1:])
        imp = csum[offsets[1:]] - csum[offsets[:-1]]
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(lens, pa.int64()),
            "importance": pa.array(imp, pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)


DSIR_SELECT_N = 100          # documents kept by the selection step


def dsir_selected_documents(sf_dir: str):
    """(doc_id, n_tokens, importance, rate_milli): the SELECTION step
    completing DSIR — the DSIR_SELECT_N documents whose
    length-normalized importance (`importance*1000` trunc-div
    `n_tokens`, DuckDB ``//`` semantics; 0 for token-less docs) ranks
    highest, ties → doc_id asc. Deterministic top-N rather than the
    paper's Gumbel resampling so the selected SET is value-hash
    checkable (the repo-wide no-RNG rule; weighted_sample_documents is
    the sampling-flavored counterpart).

    Scale shape: composes on dsir_importance_documents (two
    non-shuffling passes) + the weighted_sample two-phase top-N —
    per-batch local top-N partials, then one tiny sort+limit over
    ≤ N·batches rows; the corpus never shuffles here either.
    """
    ds = dsir_importance_documents(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        nt = batch["n_tokens"].to_numpy(zero_copy_only=False)
        imp = batch["importance"].to_numpy(zero_copy_only=False)
        num = imp * 1000
        rate = np.where(nt > 0,
                        np.where(num >= 0, num // np.maximum(nt, 1),
                                 -((-num) // np.maximum(nt, 1))),
                        0).astype(np.int64)
        order = np.lexsort((ids, -rate))
        keep = order[:DSIR_SELECT_N]
        return pa.table({
            "doc_id": pa.array(ids[keep].astype(np.int64)),
            "n_tokens": pa.array(nt[keep].astype(np.int64)),
            "importance": pa.array(imp[keep].astype(np.int64)),
            "rate_milli": pa.array(rate[keep]),
        })

    return ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .sort(["rate_milli", "doc_id"], descending=[True, False]) \
        .limit(DSIR_SELECT_N)


SPLIT_BUCKETS = 100          # md5(doc_id) % 100 → deterministic split
SPLIT_TRAIN_LT = 80          # [0, 80) train
SPLIT_VAL_LT = 90            # [80, 90) val; [90, 100) test


def dataset_split_documents(sf_dir: str):
    """(doc_id, split): deterministic 80/10/10 train/val/test assignment
    by md5 of the stringified doc_id — stable under any re-partitioning
    or re-run (no RNG state), embarrassingly parallel, SQL-checked via
    DuckDB md5_number_upper on the same key string.
    """
    from dataquality_ray.spec import token_hash_u64

    ds = _docs(sf_dir, columns=["doc_id"])

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        b = np.fromiter((token_hash_u64(str(i)) % SPLIT_BUCKETS
                         for i in ids), dtype=np.int64, count=len(ids))
        split = np.where(b < SPLIT_TRAIN_LT, "train",
                         np.where(b < SPLIT_VAL_LT, "val", "test"))
        return pa.table({"doc_id": batch["doc_id"],
                         "split": pa.array(split.tolist(), pa.string())})

    return ds.map_batches(assign, batch_format="pyarrow",
                          zero_copy_batch=True)


METADATA_GATE_THRESHOLD = 0.7   # reference: metadata_similarity >= 0.7


def doc_metadata_gate(sf_dir: str):
    """Metadata-similarity dedup gate (reference metadata.py:213-243,
    524-536): gate = 0.5·[same source] + 0.5·Jaccard(key-term sets),
    pairs kept at gate >= 0.7 — the pre-filter the reference applies
    before its expensive pairwise cosine check.

    Shape: inverted-index candidate join — key-term posting lists
    (groupby term) generate candidate pairs (a pair passing the gate
    must share >= 1 key term, since 0.5 + 0.5·j >= 0.7 needs j >= 0.4 >
    0), then exact per-pair verification with the per-doc key-term sets
    + source ATTACHED VIA TWO HASH JOINS (the near_dup_pairs_join shape,
    stages/dedup.py) — nothing corpus-proportional touches the driver
    or any single worker's heap. Hot terms are the skew knob: posting
    lists beyond max_lsh_bucket are truncated (LOGGED when it happens —
    a pair of high-id docs whose shared terms are ALL hot can then be
    missed, diverging from the uncapped SQL oracle; the sf-scale check
    never hits the cap, and the gate's ≥0.4 set-Jaccard means real
    pairs share ≥3 of 5 terms, so all three would need to be hot).
    """
    import pandas as pd

    from dataquality_ray.config import DEFAULT_CONFIG as cfg
    from dataquality_ray.spec import token_hash_u64
    from dataquality_ray.stages.bucketing import (
        cluster_buckets,
        splitmix_bucket,
    )

    # materialize: the key-term table is consumed twice (join side
    # + candidate stream) — without it the tokenize/rank lineage would
    # re-execute for each consumer
    terms = doc_key_terms(sf_dir).materialize()   # (doc_id, term, tf, rank)
    docs = _docs(sf_dir, columns=["doc_id", "source"])
    nb = cluster_buckets()

    def candidates(batch: pa.Table) -> pa.Table:
        # posting rows: one per (term, doc), bucketed by the frozen
        # md5-u64 term hash — the pair build completes locally per
        # bucket (every term lives in exactly one bucket), so the Ray
        # groupby has K output groups, never vocabulary-many
        term = batch["term"]
        if isinstance(term, pa.ChunkedArray):
            term = term.combine_chunks()
        enc = term.dictionary_encode()
        lut = np.fromiter(
            (token_hash_u64(u) for u in enc.dictionary.to_pylist()),
            dtype=np.uint64, count=len(enc.dictionary))
        h = lut[enc.indices.to_numpy(zero_copy_only=False)]
        part = (h % np.uint64(nb)).astype(np.int32)
        return pa.table({
            "term": term,
            "doc_id": batch["doc_id"],
            "part": pa.array(part),
        })

    def term_pairs(df: "pd.DataFrame") -> "pd.DataFrame":
        from dataquality_ray.stages.dedup import _log_capped_groups
        out_a, out_b = [], []
        n_capped, largest = 0, 0
        for _, g in df.groupby("term", sort=False):
            ids = np.sort(g["doc_id"].to_numpy().astype(np.int64))
            if len(ids) < 2:
                continue
            if len(ids) > cfg.max_lsh_bucket:
                n_capped += 1
                largest = max(largest, len(ids))
                ids = ids[: cfg.max_lsh_bucket]
            iu, ju = np.triu_indices(len(ids), k=1)
            out_a.append(ids[iu])
            out_b.append(ids[ju])
        if n_capped:
            _log_capped_groups("doc_metadata_gate.term_pairs", n_capped,
                               cfg.max_lsh_bucket, largest)
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64")})
        return pd.DataFrame({
            "id_a": np.concatenate(out_a),
            "id_b": np.concatenate(out_b),
        }).drop_duplicates()

    # per-doc join side: key-term set packed into one \x1f-joined string
    # (Acero joins reject list<> non-key payloads) + source attached by
    # one hash join against the docs table. The pack is bucketed-local:
    # shuffle on splitmix(doc_id) % K, pack every doc inside its bucket
    # with one pandas groupby — never a #docs-output-group Ray groupby
    # (CLAUDE.md invariant).
    def pack_terms(df: "pd.DataFrame") -> "pd.DataFrame":
        from dataquality_ray.arrowutil import from_pandas_clean
        g = (df.sort_values(["doc_id", "term"], kind="mergesort")
             .groupby("doc_id", sort=False)["term"]
             .agg(lambda s: "\x1f".join(s)).reset_index()
             .rename(columns={"term": "term_pack"}))
        return from_pandas_clean(g)

    import ray as _ray

    def _n_parts() -> int:
        try:
            return max(2, int(
                _ray.cluster_resources().get("CPU", 4)) // 2)
        except Exception:
            return 4

    def slim(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": t["doc_id"], "term": t["term"],
                         "part": pa.array(splitmix_bucket(ids, nb))})

    n_parts = _n_parts()
    side = (terms.map_batches(slim, batch_format="pyarrow")
            .groupby("part")
            .map_groups(pack_terms, batch_format="pandas")
            .join(docs, join_type="inner", num_partitions=n_parts,
                  on=("doc_id",))
            .materialize())          # consumed by two joins below

    def verify(batch: pa.Table) -> pa.Table:
        # vectorized pair verification: polars list set-intersection
        # over the packed term strings (the sets are per-doc distinct by
        # construction). Float math matches the scalar spec exactly:
        # j = inter/union (one f64 division), gate = base + 0.5*j.
        df = pl.DataFrame({
            "id_a": pl.from_arrow(batch["id_a"]),
            "id_b": pl.from_arrow(batch["id_b"]),
            "ta": pl.from_arrow(batch["term_pack_a"]),
            "tb": pl.from_arrow(batch["term_pack"]),
            "sa": pl.from_arrow(batch["source_a"]),
            "sb": pl.from_arrow(batch["source"]),
        }).filter((pl.col("ta") != "") & (pl.col("tb") != ""))
        df = df.with_columns(
            A=pl.col("ta").str.split("\x1f"),
            B=pl.col("tb").str.split("\x1f"),
        ).with_columns(
            inter=pl.col("A").list.set_intersection(pl.col("B"))
            .list.len().cast(pl.Int64),
            na=pl.col("A").list.len().cast(pl.Int64),
            nb=pl.col("B").list.len().cast(pl.Int64),
        ).with_columns(
            gate=pl.when(pl.col("sa") == pl.col("sb"))
            .then(pl.lit(0.5)).otherwise(pl.lit(0.0))
            + 0.5 * (pl.col("inter")
                     / (pl.col("na") + pl.col("nb") - pl.col("inter"))),
        ).filter(pl.col("gate") >= METADATA_GATE_THRESHOLD)
        return pa.table({
            "id_a": pa.array(df["id_a"].to_numpy(), pa.int64()),
            "id_b": pa.array(df["id_b"].to_numpy(), pa.int64()),
            "gate": pa.array(df["gate"].to_numpy(), pa.float64()),
        })

    from dataquality_ray.stages.dedup import distinct_pairs

    cand = (terms.map_batches(candidates, batch_format="pyarrow")
            .groupby("part")
            .map_groups(term_pairs, batch_format="pandas"))
    cand = distinct_pairs(cand, "id_a", "id_b", cfg.num_buckets)

    # attach each side's (term_pack, source) via hash joins; materialize
    # between the two joins (CLAUDE.md invariant: two lazy joins in one
    # DAG starve map tasks on small clusters)
    a_joined = cand.join(side, join_type="inner",
                         num_partitions=n_parts,
                         on=("id_a",), right_on=("doc_id",))

    def rename_a(t: pa.Table) -> pa.Table:
        cols = {c: (c + "_a" if c in ("term_pack", "source") else c)
                for c in t.column_names}
        t = t.rename_columns([cols[c] for c in t.column_names])
        if "doc_id" in t.column_names:
            t = t.drop_columns(["doc_id"])
        return t

    b_joined = (a_joined.map_batches(rename_a, batch_format="pyarrow")
                .materialize()
                .join(side, join_type="inner", num_partitions=n_parts,
                      on=("id_b",), right_on=("doc_id",)))
    return b_joined.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# sketches (content hash + rolling fingerprint; SimHash/MinHash variant)
# ---------------------------------------------------------------------------

def doc_sketches(sf_dir: str):
    """doc_id, content_hash (md5 of normalized text), fingerprint
    (vectorized polynomial rolling hash, spec.rolling_fingerprint) —
    SQL-checked; single map_batches pass, one normalization, no shuffle.
    Reference analog: the embed-text composition + content identity the
    dedup gate keys on (metadata.py:318-347)."""
    import hashlib

    from dataquality_ray.spec import EDGE_WS_PATTERN, WS_PLUS_PATTERN
    from dataquality_ray.stages.dedup import fingerprints_of_norm

    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def sketch(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        norm = pc.replace_substring_regex(
            pc.replace_substring_regex(
                pc.utf8_lower(text), EDGE_WS_PATTERN, ""),
            WS_PLUS_PATTERN, " ").to_pylist()
        hashes = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in norm]
        return pa.table({
            "doc_id": batch["doc_id"],
            "content_hash": pa.array(hashes, pa.string()),
            "fingerprint": pa.array(fingerprints_of_norm(norm)),
        })

    return ds.map_batches(sketch, batch_format="pyarrow",
                          zero_copy_batch=True)


def _sketch_ds(sf_dir: str, cfg: PipelineConfig):
    from dataquality_ray.stages.dedup import MinHashSimHash

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(
        MinHashSimHash,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=(1, cfg.actor_pool_size))


def doc_sim_sketches(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    """doc_id, simhash — the per-document SimHash signature, SQL-checked:
    DuckDB derives the identical signature from md5_number_upper(token)
    (== spec.token_hash_u64) with 64 per-bit vote sums. Token-less
    documents carry the all-zero signature on both sides."""
    return _sketch_ds(sf_dir, cfg).map_batches(
        lambda t: t.select(["doc_id", "simhash"]),
        batch_format="pyarrow")


def doc_minhash_bands(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    """doc_id, band_id, v0..v{rows-1} — the MinHash signature in LSH band
    layout (lsh_bands rows per doc), SQL-checked: DuckDB recomputes every
    permutation min via limb-arithmetic mulmod over md5 token hashes.
    Token-less documents carry the all-max (2^64-1) signature."""
    bands, rows = cfg.lsh_bands, cfg.lsh_rows

    def reshape(t: pa.Table) -> pa.Table:
        n = len(t)
        sig_col = t["minhash_sig"]
        if isinstance(sig_col, pa.ChunkedArray):
            sig_col = sig_col.combine_chunks()
        sig = sig_col.flatten().to_numpy(zero_copy_only=False) \
            .reshape(n * bands, rows)
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        cols = {
            "doc_id": pa.array(np.repeat(doc, bands)),
            "band_id": pa.array(np.tile(np.arange(bands, dtype=np.int64),
                                        n)),
        }
        for r in range(rows):
            cols[f"v{r}"] = pa.array(sig[:, r], pa.uint64())
        return pa.table(cols)

    return _sketch_ds(sf_dir, cfg).map_batches(
        reshape, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# embeddings: ANN top-k + cosine near-dup pairs
# ---------------------------------------------------------------------------

def ann_topk_embeddings(sf_dir: str):
    return cosine_topk(_emb(sf_dir), ANN_QUERY_IDS, k=ANN_K)


def embedding_near_dup(sf_dir: str):
    return embedding_near_dup_pairs(_emb(sf_dir), EMB_NEAR_DUP_COSINE)


TOP_SOURCES_K = 3


def docs_from_top_sources(sf_dir: str):
    """(doc_id, source): broadcast semi-join — documents whose source is
    among the top-3 sources by doc count (ties → source asc). The
    aggregate side is tiny (source domain), so it is computed with a
    two-phase groupby and BROADCAST via ray.put into the filter map —
    the canonical small-side pattern; no shuffle of the fact table."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, columns=["doc_id", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd
        g = (pd.DataFrame({"source": batch["source"].to_pylist(), "n": 1})
             .groupby("source", sort=False).agg(n=("n", "sum"))
             .reset_index())
        from dataquality_ray.arrowutil import from_pandas_clean
        return from_pandas_clean(g)

    counts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("source").aggregate(Sum("n", alias_name="n")) \
        .to_pandas()
    counts = counts.sort_values(["n", "source"],
                                ascending=[False, True],
                                kind="mergesort")
    top = set(counts["source"].head(TOP_SOURCES_K))
    top_ref = ray.put(top)

    def keep(batch: pa.Table) -> pa.Table:
        t = ray.get(top_ref)
        mask = pa.array([s in t for s in batch["source"].to_pylist()])
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True)


# global sentence dedup: packed (doc_id, sent_idx) ordinal — sent_idx
# must fit in 20 bits so MIN over the packed int is lexicographic min
_SENT_IDX_BITS = 20

def global_sentence_dedup(sf_dir: str, num_partitions: int = 8,
                          num_buckets: int = 32):
    """(doc_id, n_sents, n_kept, kept_text): C4-style CROSS-document
    sentence dedup — a sentence occurrence survives iff it is the
    corpus-global first occurrence (min (doc_id, sent_idx)) of that
    trimmed sentence; docs are reassembled from their surviving
    sentences joined with '. '.

    The complement of transcript_sentence_dedup (intra-doc counts):
    this is the global variant real pretraining pipelines run (C4
    removed any three-sentence span occurring more than once).

    Scale shape: sentences explode in ONE fused map (split/trim/filter
    identical to the DuckDB oracle's chain), then TWO bucketed shuffles
    — never a per-sentence or per-doc Ray aggregate (distinct sentences
    ≈ corpus size; see the CLAUDE.md huge-group-count note):

    1. bucket by sentence-hash % K: every occurrence of a sentence
       lands in one bucket, so the global MIN winner and each
       occurrence's keep flag complete LOCALLY (vectorized groupby
       transform);
    2. bucket by doc_id % K: all of a doc's sentences land in one
       bucket, so per-doc reassembly completes locally.

    Empty docs are preserved via a left-outer join against the doc-id
    spine.
    """
    import pandas as pd

    from dataquality_ray.spec import token_hash_u64

    docs = _docs(sf_dir, columns=["doc_id", "text"])

    def extract(batch: pa.Table) -> pa.Table:
        s = pl.from_arrow(batch["text"])
        if isinstance(s, pl.DataFrame):
            s = s.to_series()
        segs = (s.fill_null("").str.split(".")
                .list.eval(pl.element().str.strip_chars(" \t\r\n"))
                .list.eval(pl.element().filter(pl.element() != "")))
        df = pl.DataFrame({
            "doc_id": pl.Series(batch["doc_id"].to_numpy(
                zero_copy_only=False)),
            "sentence": segs,
        }).with_columns(
            sent_idx=pl.int_ranges(0, pl.col("sentence").list.len(),
                                   dtype=pl.Int64)
        ).explode(["sentence", "sent_idx"]) \
         .filter(pl.col("sentence").is_not_null())
        doc_id = df["doc_id"].to_numpy()
        sent_idx = df["sent_idx"].to_numpy()
        if len(doc_id):
            assert int(sent_idx.max()) < (1 << _SENT_IDX_BITS), \
                "sent_idx overflows the packed ordinal"
        cache: dict = {}

        def _h(sent: str) -> int:
            v = cache.get(sent)
            if v is None:
                v = token_hash_u64(sent)
                cache[sent] = v
            return v

        h = np.fromiter((_h(x) for x in df["sentence"]),
                        dtype=np.uint64, count=len(df))
        return pa.table({
            "doc_id": pa.array(doc_id, pa.int64()),
            "sent_idx": pa.array(sent_idx, pa.int64()),
            "sentence": pa.array(df["sentence"].to_list(), pa.string()),
            "spart": pa.array((h % np.uint64(num_buckets))
                              .astype(np.int32)),
            # signed REINTERPRET of the u64 hash (equality key only)
            "h": pa.array(h.view(np.int64), pa.int64()),
            "packed": pa.array(
                (doc_id.astype(np.int64) << _SENT_IDX_BITS) + sent_idx,
                pa.int64()),
        })

    sents = docs.map_batches(extract, batch_format="pyarrow",
                             zero_copy_batch=True)

    def flag_bucket(t: pa.Table) -> pa.Table:
        # zero-copy arrow↔polars — sentence strings never box through
        # pandas; min-per-hash winner via a window min
        d = pl.from_arrow(t.select(
            ["doc_id", "sent_idx", "sentence", "h", "packed"]))
        d = d.with_columns(
            keep=pl.col("packed") == pl.col("packed").min().over("h"),
            dpart=(pl.col("doc_id") % num_buckets).cast(pl.Int32))
        return d.select(["doc_id", "sent_idx", "sentence", "keep",
                         "dpart"]).to_arrow()

    flagged = sents.groupby("spart").map_groups(
        flag_bucket, batch_format="pyarrow")

    def assemble_bucket(t: pa.Table) -> pa.Table:
        d = pl.from_arrow(t.select(
            ["doc_id", "sent_idx", "sentence", "keep"])) \
            .sort(["doc_id", "sent_idx"])
        g = d.group_by("doc_id", maintain_order=True).agg(
            n_sents=pl.len().cast(pl.Int64),
            n_kept=pl.col("keep").sum().cast(pl.Int64),
            kept_text=pl.col("sentence").filter(pl.col("keep"))
            .str.join(". "))
        return g.to_arrow()

    agg = flagged.groupby("dpart").map_groups(
        assemble_bucket, batch_format="pyarrow")

    spine = _docs(sf_dir, columns=["doc_id"])
    out = spine.join(agg, join_type="left_outer",
                     num_partitions=num_partitions,
                     on=("doc_id",), right_on=("doc_id",))

    def clean(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "n_sents": pc.coalesce(pc.cast(t["n_sents"], pa.int64()),
                                   pa.scalar(0, pa.int64())),
            "n_kept": pc.coalesce(pc.cast(t["n_kept"], pa.int64()),
                                  pa.scalar(0, pa.int64())),
            "kept_text": pc.coalesce(t["kept_text"], pa.scalar("")),
        })

    return out.map_batches(clean, batch_format="pyarrow")



def duplicate_span_removed_documents(sf_dir: str, num_buckets: int = 0):
    """(doc_id, n_tokens, n_removed, kept_text): the REMOVAL surface of
    exact-substring dedup (Lee et al. 2022) — every token covered by
    any rolling DUP_SPAN_K-token window whose identical text occurs in
    >= 2 distinct documents is dropped, and documents are reassembled
    from the surviving tokens (space-joined, order preserved).
    Complements duplicate_span_documents, which only reports the
    per-doc statistic.

    Scale shape (the global_sentence_dedup topology at window grain):
    windows explode once with their 1-based start positions; ONE
    window-hash bucket shuffle decides cross-doc duplication locally
    (every copy of a window hash lives in one bucket) and emits only
    the duplicated (doc_id, start) occurrences; a doc-hash bucket
    packs each doc's dup starts into one list row; ONE left-outer hash
    join attaches the (small) dup-start lists back to the full docs;
    the rebuild is pure vectorized polars (explode tokens with
    positions, anti-join the expanded removed ranges, ordered
    re-join). Full text crosses the network once (the join), the
    window exchange carries only (hash, doc, start) triples, and no
    Ray aggregate has corpus-proportional output groups.
    """
    import pandas as pd

    from dataquality_ray.spec import token_hash_u64
    from dataquality_ray.stages.bucketing import (
        cluster_buckets,
        splitmix_bucket,
    )

    nb = num_buckets or cluster_buckets()
    docs = _docs(sf_dir, columns=["doc_id", "text"])

    def windows(batch: pa.Table) -> pa.Table:
        s = pl.from_arrow(batch["text"])
        if isinstance(s, pl.DataFrame):
            s = s.to_series()
        toks = s.fill_null("").str.to_lowercase() \
            .str.extract_all(TOKEN_PATTERN)
        expr = pl.element()
        for j in range(1, DUP_SPAN_K):
            expr = expr + " " + pl.element().shift(-j)
        wins = toks.list.eval(expr.drop_nulls())
        df = (pl.DataFrame({
            "doc_id": pl.from_arrow(batch["doc_id"]),
            "w": wins,
        }).with_columns(
            start=pl.int_ranges(1, pl.col("w").list.len() + 1,
                                dtype=pl.Int64))
          .explode(["w", "start"]).drop_nulls("w"))
        wcol = df["w"].to_arrow()
        if isinstance(wcol, pa.ChunkedArray):
            wcol = wcol.combine_chunks()
        enc = wcol.dictionary_encode()
        lut = np.fromiter(
            (token_hash_u64(u) for u in enc.dictionary.to_pylist()),
            dtype=np.uint64, count=len(enc.dictionary))
        h = lut[enc.indices.to_numpy(zero_copy_only=False)]
        return pa.table({
            "spart": pa.array((h % np.uint64(nb)).astype(np.int32)),
            "h": pa.array(h.view(np.int64)),
            "doc_id": df["doc_id"].to_arrow(),
            "start": df["start"].to_arrow(),
        })

    def dup_occ(df: "pd.DataFrame") -> "pd.DataFrame":
        # a window hash lives entirely in this bucket -> the distinct-
        # doc test is exact here; only duplicated occurrences survive
        nd = df.groupby("h", sort=False)["doc_id"].transform("nunique")
        out = df.loc[nd >= 2, ["doc_id", "start"]].copy()
        out["dpart"] = splitmix_bucket(
            out["doc_id"].to_numpy().astype(np.int64), nb)
        return out

    occ = (docs.map_batches(windows, batch_format="pyarrow",
                            zero_copy_batch=True)
           .groupby("spart")
           .map_groups(dup_occ, batch_format="pandas"))

    def pack(t: pa.Table) -> pa.Table:
        # comma-joined string, not list<int64>: Acero joins reject
        # list-typed non-key fields
        g = (pl.from_arrow(t.select(["doc_id", "start"]))
             .group_by("doc_id")
             .agg(starts=pl.col("start").sort()
                  .cast(pl.String).str.join(",")))
        return g.to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()),
            ("starts", pa.string())]))

    # the repartition coalesces the schemaless zero-row blocks Ray's
    # groupby emits for dup-free buckets — a join cannot resolve its
    # key FieldRefs on those (same Ray issue conv_near_dup_pairs hit)
    packed = occ.groupby("dpart").map_groups(
        pack, batch_format="pyarrow").repartition(max(4, nb // 4))

    joined = docs.join(packed, join_type="left_outer",
                       num_partitions=max(4, nb // 4),
                       on=("doc_id",), right_on=("doc_id",))

    def rebuild(batch: pa.Table) -> pa.Table:
        d = pl.from_arrow(batch.select(["doc_id", "text", "starts"]))
        d = d.with_columns(
            toks=pl.col("text").fill_null("").str.to_lowercase()
            .str.extract_all(TOKEN_PATTERN))
        tokrows = (d.select(["doc_id", "toks"])
                   .with_columns(
                       p=pl.int_ranges(1, pl.col("toks").list.len() + 1,
                                       dtype=pl.Int64))
                   .explode(["toks", "p"])
                   .drop_nulls("toks")
                   .rename({"toks": "tk"}))
        rem = (d.select(["doc_id", "starts"])
               .drop_nulls("starts")
               .with_columns(
                   st=pl.col("starts").str.split(",")
                   .cast(pl.List(pl.Int64)))
               .explode("st").drop_nulls("st")
               .with_columns(
                   p=pl.int_ranges(pl.col("st"),
                                   pl.col("st") + DUP_SPAN_K,
                                   dtype=pl.Int64))
               .explode("p").select(["doc_id", "p"]).unique())
        kept = tokrows.join(rem, on=["doc_id", "p"], how="anti")
        stats = tokrows.group_by("doc_id").agg(
            n_tokens=pl.len().cast(pl.Int64))
        texts = (kept.sort(["doc_id", "p"])
                 .group_by("doc_id", maintain_order=True)
                 .agg(n_kept=pl.len().cast(pl.Int64),
                      kept_text=pl.col("tk").str.join(" ")))
        out = (d.select(["doc_id"])
               .join(stats, on="doc_id", how="left")
               .join(texts, on="doc_id", how="left")
               .with_columns(
                   n_tokens=pl.col("n_tokens").fill_null(0),
                   n_removed=(pl.col("n_tokens").fill_null(0)
                              - pl.col("n_kept").fill_null(0)),
                   kept_text=pl.col("kept_text").fill_null("")))
        return out.select(["doc_id", "n_tokens", "n_removed",
                           "kept_text"]).to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()), ("n_tokens", pa.int64()),
            ("n_removed", pa.int64()), ("kept_text", pa.string())]))

    return joined.map_batches(rebuild, batch_format="pyarrow")


def dup_ngram_stats(sf_dir: str):
    """(doc_id, n_bigrams, n_distinct_bigrams, dup_frac_milli,
    max_bigram_count): Gopher-style intra-document repetition signals
    over word 2-grams — the "fraction of duplicate n-grams" family of
    pretraining quality filters, reduced to integer fixed-point
    (dup_frac_milli = 1000*(n-distinct)//n) so the surface is
    bit-deterministic vs the SQL oracle.

    Zero shuffle: tokenization (the pinned cross-engine TOKEN_PATTERN on
    lowered text), adjacent-pair construction, per-row distinct and
    value counts all run as polars list kernels inside one map_batches.
    """
    docs = _docs(sf_dir, columns=["doc_id", "text"])

    def stats(batch: pa.Table) -> pa.Table:
        s = pl.from_arrow(batch["text"])
        if isinstance(s, pl.DataFrame):
            s = s.to_series()
        toks = s.fill_null("").str.to_lowercase() \
            .str.extract_all(TOKEN_PATTERN)
        bigrams = toks.list.eval(
            (pl.element() + " " + pl.element().shift(-1)).drop_nulls())
        n = bigrams.list.len().cast(pl.Int64).to_numpy()
        d = bigrams.list.n_unique().cast(pl.Int64).to_numpy()
        mx = (bigrams.list.eval(pl.element().unique_counts().max())
              .list.first().fill_null(0).cast(pl.Int64).to_numpy())
        dup = np.where(n > 0, (1000 * (n - d)) // np.maximum(n, 1), 0)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_bigrams": pa.array(n, pa.int64()),
            "n_distinct_bigrams": pa.array(d, pa.int64()),
            "dup_frac_milli": pa.array(dup.astype(np.int64)),
            "max_bigram_count": pa.array(mx, pa.int64()),
        })

    return docs.map_batches(stats, batch_format="pyarrow",
                            zero_copy_batch=True)


CONTAM_NGRAM = 4          # decontamination shingle width (word 4-grams)
CONTAM_BENCH_MOD = 97     # benchmark membership: doc_id % MOD == 0


def _contam_shingles(batch: pa.Table, bench: bool):
    """Per-row DISTINCT word-4-gram shingles of the benchmark
    (doc_id % MOD == 0) or corpus (!= 0) side of a batch — the shared
    front half of both decontamination operators."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    mask = (ids % CONTAM_BENCH_MOD == 0) if bench \
        else (ids % CONTAM_BENCH_MOD != 0)
    t = batch.filter(pa.array(mask))
    s = pl.from_arrow(t["text"])
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    toks = s.fill_null("").str.to_lowercase() \
        .str.extract_all(TOKEN_PATTERN)
    expr = pl.element()
    for k in range(1, CONTAM_NGRAM):
        expr = expr + " " + pl.element().shift(-k)
    sh = toks.list.eval(expr.drop_nulls()).list.unique()
    return t["doc_id"].to_numpy(zero_copy_only=False), sh


def contaminated_documents(sf_dir: str):
    """(doc_id, n_hits): benchmark decontamination — flag every
    non-benchmark document sharing at least one word-4-gram shingle
    with the benchmark suite (here: the deterministic pseudo-benchmark
    doc_id % 97 == 0), n_hits = number of its DISTINCT shingles that
    collide. The drop-side filter every pretraining pipeline runs
    before training (benchmark leakage removal).

    Scale shape: the benchmark suite is small BY CONSTRUCTION (a test
    set, not the corpus), so its distinct-shingle set is a driver
    broadcast — `ray.put` once, set-membership probed inside one
    map_batches over the corpus; the corpus itself never shuffles.
    """
    docs = _docs(sf_dir, columns=["doc_id", "text"])
    shingles_of = _contam_shingles

    def bench_shingles(batch: pa.Table) -> pa.Table:
        _, sh = shingles_of(batch, bench=True)
        return pa.table({"g": pa.array(
            sorted({g for row in sh.to_list() for g in row}),
            pa.string())})

    # the benchmark side is small by construction: distinct shingles of
    # the suite fit on the driver (this is the point of the operator)
    bench = docs.map_batches(bench_shingles, batch_format="pyarrow") \
        .to_pandas()
    bset_ref = ray.put(frozenset(bench["g"]))

    def flag(batch: pa.Table) -> pa.Table:
        bset = ray.get(bset_ref)
        ids, sh = shingles_of(batch, bench=False)
        hits = np.fromiter(
            (sum(1 for g in row if g in bset) for row in sh.to_list()),
            dtype=np.int64, count=len(ids))
        keep = hits > 0
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "n_hits": pa.array(hits[keep], pa.int64()),
        })

    return docs.map_batches(flag, batch_format="pyarrow",
                            zero_copy_batch=True)


BLOOM_BITS = 1 << 20      # fixed 128 KiB bitmap, whatever the benchmark
BLOOM_K = 3               # hash functions: md5("bloom:{j}:" + shingle)


def bloom_contaminated_documents(sf_dir: str):
    """(doc_id, n_hits): the BOUNDED-MEMORY decontamination path — same
    contract as contaminated_documents but membership is a fixed-size
    Bloom filter (BLOOM_BITS bits, BLOOM_K md5-derived hash functions)
    instead of the benchmark's distinct-shingle set. When the benchmark
    suite outgrows a driver broadcast, the broadcast here stays 128 KiB
    no matter how big the suite gets.

    Build: per-batch bitmap partials (np.bitwise_or over bit positions
    token_hash_u64(f"bloom:{{j}}:{{g}}") % BLOOM_BITS) — merge = OR, so
    ANY reduce order is exact; partials fold in a two-level
    repartition tree (the CMS dense-blob pattern), so the driver
    receives exactly ONE 128-KiB blob however many batches the suite
    spans — never #batches blobs.
    Probe: one map_batches over the corpus; a shingle hits iff all K
    bits are set. False positives are DETERMINISTIC (md5 bits), so the
    DuckDB oracle replays the identical probe — the operator is
    hash-checked INCLUDING its false positives, not just "close to"
    the exact answer."""
    from dataquality_ray.spec import token_hash_u64

    docs = _docs(sf_dir, columns=["doc_id", "text"])

    def _bits(g: str) -> list:
        return [int(token_hash_u64(f"bloom:{j}:{g}") % BLOOM_BITS)
                for j in range(BLOOM_K)]

    def bench_bitmap(batch: pa.Table) -> pa.Table:
        _, sh = _contam_shingles(batch, bench=True)
        bm = np.zeros(BLOOM_BITS // 8, dtype=np.uint8)
        seen: set = set()
        for row in sh.to_list():
            for g in row:
                if g not in seen:
                    seen.add(g)
                    for b in _bits(g):
                        bm[b >> 3] |= 1 << (b & 7)
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary())})

    def or_fold(batch: pa.Table) -> pa.Table:
        bm = np.zeros(BLOOM_BITS // 8, dtype=np.uint8)
        for b in batch["bm"].to_pylist():
            bm |= np.frombuffer(b, dtype=np.uint8)
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary())})

    folded = (docs.map_batches(bench_bitmap, batch_format="pyarrow",
                               batch_size=4096)
              .repartition(16)
              .map_batches(or_fold, batch_format="pyarrow",
                           batch_size=None)
              .repartition(1)
              .map_batches(or_fold, batch_format="pyarrow",
                           batch_size=None)
              .take_all())          # exactly one 128-KiB row
    bitmap = np.frombuffer(folded[0]["bm"], dtype=np.uint8).copy()
    bm_ref = ray.put(bitmap)

    def flag(batch: pa.Table) -> pa.Table:
        bm = ray.get(bm_ref)
        ids, sh = _contam_shingles(batch, bench=False)
        cache: dict = {}

        def hit(g: str) -> bool:
            h = cache.get(g)
            if h is None:
                h = all(bm[b >> 3] & (1 << (b & 7)) for b in _bits(g))
                cache[g] = h
            return h

        hits = np.fromiter(
            (sum(1 for g in row if hit(g)) for row in sh.to_list()),
            dtype=np.int64, count=len(ids))
        keep = hits > 0
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "n_hits": pa.array(hits[keep], pa.int64()),
        })

    return docs.map_batches(flag, batch_format="pyarrow",
                            zero_copy_batch=True)


def decontaminated_span_documents(sf_dir: str):
    """(doc_id, n_tokens, n_removed, kept_text) for non-benchmark docs:
    SPAN-level decontamination — instead of dropping a contaminated
    document wholesale (contaminated_documents), only the tokens
    covered by a benchmark-colliding word-CONTAM_NGRAM window are
    removed and the document is reassembled from the survivors (the
    FLAN-style surgical variant that keeps the clean remainder of a
    long document). Same window/tokenize recipe as the flag-side
    operators; same rebuild contract as duplicate_span_removed.

    Scale shape: strictly BETTER than duplicate_span_removed — the
    duplication decision is membership in the broadcast benchmark
    shingle set, not a cross-doc exchange, so window marking, span
    union and text rebuild all complete inside ONE map_batches; the
    corpus never shuffles and full text never crosses the network.
    """
    docs = _docs(sf_dir, columns=["doc_id", "text"])
    shingles_of = _contam_shingles

    def bench_shingles(batch: pa.Table) -> pa.Table:
        _, sh = shingles_of(batch, bench=True)
        return pa.table({"g": pa.array(
            sorted({g for row in sh.to_list() for g in row}),
            pa.string())})

    bench = docs.map_batches(bench_shingles, batch_format="pyarrow") \
        .to_pandas()
    bset_ref = ray.put(sorted(set(bench["g"])))

    def rebuild(batch: pa.Table) -> pa.Table:
        bset = ray.get(bset_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(ids % CONTAM_BENCH_MOD != 0))
        d = pl.DataFrame({
            "doc_id": pl.from_arrow(t["doc_id"]),
            "toks": pl.from_arrow(t["text"]).fill_null("")
            .str.to_lowercase().str.extract_all(TOKEN_PATTERN),
        })
        expr = pl.element()
        for k in range(1, CONTAM_NGRAM):
            expr = expr + " " + pl.element().shift(-k)
        wdf = (d.with_columns(
            w=pl.col("toks").list.eval(expr.drop_nulls()))
            .select(["doc_id", "w"])
            .with_columns(
                start=pl.int_ranges(1, pl.col("w").list.len() + 1,
                                    dtype=pl.Int64))
            .explode(["w", "start"]).drop_nulls("w"))
        rem = (wdf.filter(pl.col("w").is_in(bset))
               .with_columns(
                   p=pl.int_ranges(pl.col("start"),
                                   pl.col("start") + CONTAM_NGRAM,
                                   dtype=pl.Int64))
               .explode("p").select(["doc_id", "p"]).unique())
        tokrows = (d.with_columns(
            p=pl.int_ranges(1, pl.col("toks").list.len() + 1,
                            dtype=pl.Int64))
            .explode(["toks", "p"])
            .drop_nulls("toks").rename({"toks": "tk"}))
        kept = tokrows.join(rem, on=["doc_id", "p"], how="anti")
        stats = tokrows.group_by("doc_id").agg(
            n_tokens=pl.len().cast(pl.Int64))
        texts = (kept.sort(["doc_id", "p"])
                 .group_by("doc_id", maintain_order=True)
                 .agg(n_kept=pl.len().cast(pl.Int64),
                      kept_text=pl.col("tk").str.join(" ")))
        out = (d.select(["doc_id"])
               .join(stats, on="doc_id", how="left")
               .join(texts, on="doc_id", how="left")
               .with_columns(
                   n_tokens=pl.col("n_tokens").fill_null(0),
                   n_removed=(pl.col("n_tokens").fill_null(0)
                              - pl.col("n_kept").fill_null(0)),
                   kept_text=pl.col("kept_text").fill_null("")))
        return out.select(["doc_id", "n_tokens", "n_removed",
                           "kept_text"]).to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()), ("n_tokens", pa.int64()),
            ("n_removed", pa.int64()), ("kept_text", pa.string())]))

    return docs.map_batches(rebuild, batch_format="pyarrow",
                            zero_copy_batch=True)


def doc_token_buckets(sf_dir: str):
    """(doc_id, bucket, tf): the DETERMINISTIC front half of the
    feature-hash embedder (stages/embeddings.HashedProjectionEmbedder)
    exposed as a hard-checkable surface — token occurrences of the
    8000-char-truncated, lowered text, hashed with the frozen md5-u64
    token hash into HASH_BUCKETS buckets, counted per (doc, bucket).

    The embedding itself is this histogram times the frozen integer
    projection — also SQL-checked now (doc_embedding_values); this
    surface pins the front half — tokenizer, truncation order, hash,
    bucket arithmetic — against DuckDB's md5_number_upper in isolation.
    """
    import pandas as pd

    from dataquality_ray.arrowutil import from_pandas_clean
    from dataquality_ray.spec import token_hash_u64
    from dataquality_ray.stages.embeddings import HASH_BUCKETS

    docs = _docs(sf_dir, columns=["doc_id", "text"])

    def buckets(batch: pa.Table) -> pa.Table:
        # one polars extract_all over the batch + flat cached
        # token->bucket lookup (the embedder _acc_rows shape) instead
        # of a per-row Python findall loop; the (doc, bucket) counts
        # are integers, so the groupby reduce is exact either way
        import polars as _pl
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        lowered = [(t or "")[:8000].lower()
                   for t in batch["text"].to_pylist()]
        toks = _pl.Series(lowered).str.extract_all(TOKEN_PATTERN)
        lens = toks.list.len().to_numpy().astype(np.int64)
        flat = toks.explode(empty_as_null=False).to_numpy()
        if len(flat) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64()),
                             "tf": pa.array([], pa.int64())})
        cache: dict = {}

        def miss(tok):
            b = cache[tok] = int(token_hash_u64(tok) % HASH_BUCKETS)
            return b

        bflat = np.fromiter(
            (cache.get(t) if t in cache else miss(t) for t in flat),
            dtype=np.int64, count=len(flat))
        g = (pd.DataFrame({"doc_id": np.repeat(ids, lens)
                           .astype(np.int64),
                           "bucket": bflat})
             .groupby(["doc_id", "bucket"], sort=False)
             .size().rename("tf").reset_index())
        g["tf"] = g["tf"].astype(np.int64)
        return from_pandas_clean(g)

    return docs.map_batches(buckets, batch_format="pyarrow",
                            zero_copy_batch=True)


def kmeans_assign_embeddings(sf_dir: str):
    """(vec_id, centroid_id, cosine_sim): one k-means assignment step —
    every embedding assigned to its nearest (cosine, round-6,
    ties -> smallest id) of the KMEANS_K deterministic seed centroids
    (the vectors with vec_id < K). SQL-checked via DuckDB
    list_cosine_similarity — the hard-checkable core of the iterative
    kmeans_embeddings operator."""
    from dataquality_ray.stages.clustering import KMEANS_K, kmeans_assign

    emb = _emb(sf_dir)
    first = emb.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], KMEANS_K)),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    first = first.sort_values("vec_id")
    cents = np.stack([np.asarray(v, np.float64)
                      for v in first["embedding"]])
    return kmeans_assign(emb, cents)


PROTO_PRUNE_PCT = 25   # prune the least-prototypical quartile per cluster


def prototype_pruned_embeddings(sf_dir: str):
    """(vec_id, centroid_id, kept): SSL-prototypes data pruning
    (Sorscher et al. 2022, "Beyond neural scaling laws") — assign every
    vector to its nearest seed centroid (the kmeans_assign kernel,
    round-6 cosine), then within each cluster DROP vectors whose
    round-6 cosine to the centroid is STRICTLY BELOW s*, the
    n_target-th smallest cluster sim where
    n_target = (cluster_size * PROTO_PRUNE_PCT) // 100 — i.e. prune up
    to the least-prototypical quartile, exactly and deterministically
    (strict-below means no tie-break is ever needed: equal-sim boundary
    members all survive, on both engines).

    Shape: one stateless broadcast-centroid assignment map + ONE
    shuffle on centroid_id (K = KMEANS_K groups) with a local
    np.partition selection — the semantic_dedup topology. At 100 TB the
    per-cluster co-location becomes the bottleneck; the documented
    scale path is exact histogram partials (round-6 sims are integers
    in [-1e6, 1e6] after *1e6, so per-(cluster, sim_int) partial counts
    reduce to s* without moving the members), then a second stateless
    flag pass — same answer, no cluster materialization.
    """
    from dataquality_ray.stages.clustering import KMEANS_K, kmeans_assign

    emb = _emb(sf_dir)
    first = emb.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], KMEANS_K)),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    first = first.sort_values("vec_id")
    cents = np.stack([np.asarray(v, np.float64)
                      for v in first["embedding"]])
    asn = kmeans_assign(emb, cents)

    def prune_cluster(t: pa.Table) -> pa.Table:
        sims = t["cosine_sim"].to_numpy(zero_copy_only=False)
        n = len(sims)
        n_target = (n * PROTO_PRUNE_PCT) // 100
        if n_target >= 1:
            s_star = np.partition(sims, n_target - 1)[n_target - 1]
            kept = ~(sims < s_star)
        else:
            kept = np.ones(n, dtype=bool)
        return pa.table({
            "vec_id": t["vec_id"],
            "centroid_id": t["centroid_id"],
            "kept": pa.array(kept),
        })

    return asn.groupby("centroid_id").map_groups(
        prune_cluster, batch_format="pyarrow")


CLUSTER_SAMPLE_BUDGET = 100   # total vectors the balanced sample draws


def cluster_balanced_sample_embeddings(sf_dir: str):
    """(vec_id, centroid_id): a deterministic CLUSTER-BALANCED sample —
    allocate CLUSTER_SAMPLE_BUDGET draws across the KMEANS_K seed
    clusters by largest-remainder apportionment over
    floor(sqrt(cluster_size * MIXTURE_SQRT_SCALE)) (the
    mixture_allocation_plan integer recipe at cluster grain: sqrt
    flattens the head so small clusters keep representation — the
    diversity-preserving sampling step after corpus clustering), then
    per cluster take its alloc most-PROTOTYPICAL members (highest
    round-6 cosine to the centroid, ties -> min vec_id). A cluster
    smaller than its allocation contributes all members (the sample
    then under-fills the budget — disclosed, not silently rebalanced).

    Shape: broadcast-centroid assignment map + per-batch partial
    top-alloc per cluster (two-phase argmax, the stratified_sample
    shape) — the final selection touches ≤ K × alloc partial winners,
    never the corpus.
    """
    from dataquality_ray.stages.clustering import KMEANS_K, kmeans_assign

    emb = _emb(sf_dir)
    first = emb.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], KMEANS_K)),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    first = first.sort_values("vec_id")
    cents = np.stack([np.asarray(v, np.float64)
                      for v in first["embedding"]])
    asn = kmeans_assign(emb, cents).materialize()

    # per-cluster sizes: K-cell bincount partials, tiny driver fold
    def sizes(t: pa.Table) -> pa.Table:
        h = np.bincount(t["centroid_id"].to_numpy(zero_copy_only=False),
                        minlength=KMEANS_K).astype(np.int64)
        return pa.table({"h": pa.array([h.tobytes()], pa.binary())})

    parts = asn.map_batches(sizes, batch_format="pyarrow",
                            zero_copy_batch=True).take_all()
    n = np.zeros(KMEANS_K, dtype=np.int64)
    for r in parts:
        n += np.frombuffer(r["h"], dtype=np.int64)

    sq = np.floor(np.sqrt(n.astype(np.float64)
                          * MIXTURE_SQRT_SCALE)).astype(np.int64)
    tot = max(int(sq.sum()), 1)
    b = CLUSTER_SAMPLE_BUDGET
    base = (b * sq) // tot
    rem = (b * sq) % tot
    leftover = b - int(base.sum())
    order = np.argsort(-rem, kind="mergesort")   # ties -> centroid asc
    alloc = base.copy()
    alloc[order[:leftover]] += 1
    max_alloc = int(alloc.max()) if len(alloc) else 0

    def partial_top(t: pa.Table) -> pa.Table:
        d = (pl.from_arrow(t.select(["vec_id", "centroid_id",
                                     "cosine_sim"]))
             .sort(["cosine_sim", "vec_id"], descending=[True, False])
             .group_by("centroid_id", maintain_order=True)
             .head(max_alloc))
        return d.to_arrow()

    winners = pl.from_arrow(pa.Table.from_pylist(
        asn.map_batches(partial_top, batch_format="pyarrow",
                        zero_copy_batch=True).take_all(),
        schema=pa.schema([("vec_id", pa.int64()),
                          ("centroid_id", pa.int64()),
                          ("cosine_sim", pa.float64())])))
    out = (winners.sort(["cosine_sim", "vec_id"],
                        descending=[True, False])
           .with_columns(rn=pl.int_range(1, pl.len() + 1)
                         .over("centroid_id"))
           .with_columns(alloc=pl.col("centroid_id")
                         .replace_strict(list(range(KMEANS_K)),
                                         alloc.tolist(),
                                         return_dtype=pl.Int64))
           .filter(pl.col("rn") <= pl.col("alloc"))
           .sort(["centroid_id", "rn"]))
    return out.select(["vec_id", "centroid_id"]).to_arrow()


def kmeans_embeddings(sf_dir: str):
    """(vec_id, cluster): full distributed Lloyd's k-means
    (KMEANS_ITERS iterations, deterministic fixed-point update reduce —
    see stages/clustering.kmeans_fit). Rows-only at the driver gate
    (iterative float centroids aren't SQL-expressible); determinism and
    single-process-reference equality are pytest-enforced."""
    from dataquality_ray.stages.clustering import kmeans_fit

    labels, _ = kmeans_fit(_emb(sf_dir))
    return labels


def semantic_dedup_embeddings(sf_dir: str):
    """(vec_id, centroid_id, kept): SemDeDup over the embeddings table —
    assign every vector to its nearest deterministic seed centroid
    (the kmeans_assign kernel), then within each cluster drop vectors
    with cosine >= SEMDEDUP_TAU to any lower-id cluster member. One
    centroid_id shuffle + local tiled matmuls; SQL-checked (assignment
    oracle composed with a within-cluster EXISTS self-join)."""
    from dataquality_ray.stages.clustering import semantic_dedup

    return semantic_dedup(_emb(sf_dir))


SEARCH_TERMS = ("data", "join", "stream")


def docs_matching_terms(sf_dir: str):
    """(doc_id, n_matches): conjunctive token search — documents whose
    token set contains ALL of SEARCH_TERMS, with n_matches = total
    occurrences of the query terms. The inverted-index probe shape:
    query terms broadcast, per-doc token membership evaluated in one
    vectorized polars pass; the corpus never shuffles."""
    docs = _docs(sf_dir, columns=["doc_id", "text"])
    terms = list(SEARCH_TERMS)

    def probe(batch: pa.Table) -> pa.Table:
        s = pl.from_arrow(batch["text"])
        if isinstance(s, pl.DataFrame):
            s = s.to_series()
        toks = s.fill_null("").str.to_lowercase() \
            .str.extract_all(TOKEN_PATTERN)
        per_term = [
            toks.list.eval(pl.element().filter(pl.element() == t))
            .list.len().cast(pl.Int64).to_numpy()
            for t in terms
        ]
        counts = np.stack(per_term, axis=1)
        hit = (counts > 0).all(axis=1)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids[hit], pa.int64()),
            "n_matches": pa.array(counts.sum(axis=1)[hit]
                                  .astype(np.int64)),
        })

    return docs.map_batches(probe, batch_format="pyarrow",
                            zero_copy_batch=True)


def curated_documents(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG,
                      num_partitions: int = 8):
    """(doc_id, drop_reason, keep): the end-to-end corpus-curation
    surface a pretraining-data user actually runs — every doc labeled
    with the FIRST reason that disqualifies it, precedence:

        exact_dup > near_dup > non_english > toxic > low_quality > ok

    - exact_dup: not the min-doc_id of its normalized-text md5 group;
    - near_dup: non-canonical member of a >= NEAR_DUP_DOC_JACCARD
      token-Jaccard cluster (LSH + exact verify + connected components);
    - non_english: stopword-marker langid != 'en';
    - toxic: >= 1 lexicon hit; low_quality: heuristic overall < 60.

    Scale shape: one fused flags map (heuristics + langid + toxicity +
    content hash — the corpus is read ONCE); exact-dup canonicals via a
    ONE bucketed shuffle on the hash prefix (winner + is_exact complete
    locally per bucket — no per-hash Ray aggregate, no join back); the
    near-dup dropped set is the (small) output of the LSH pair
    pipeline, broadcast via ray.put. Entirely SQL-checked, including
    the recursive-CTE cluster precedence.
    """
    import hashlib

    import pandas as pd

    from dataquality_ray.spec import EDGE_WS_PATTERN, WS_PLUS_PATTERN
    from dataquality_ray.stages.clustering import dup_clusters_auto

    num_buckets = 32
    docs = _docs(sf_dir, columns=["doc_id", "text"])

    def flags(batch: pa.Table) -> pa.Table:
        b = heuristics_batch(batch, cfg=cfg)
        s = {c: b[c].to_numpy(zero_copy_only=False).astype(np.int64)
             for c in ("length_score", "repetition_score",
                       "symbol_score", "boilerplate_score")}
        overall = (s["length_score"] + s["repetition_score"]
                   + s["symbol_score"] + s["boilerplate_score"]) // 4
        pred = _pred_lang_of(batch["text"])
        norm = pc.replace_substring_regex(
            pc.replace_substring_regex(
                pc.utf8_lower(batch["text"]), EDGE_WS_PATTERN, ""),
            WS_PLUS_PATTERN, " ")
        from dataquality_ray.arrowutil import md5_digests
        dig = md5_digests(norm if not isinstance(norm, pa.ChunkedArray)
                          else norm.combine_chunks())
        ch = [d.hex() for d in dig]
        hpart = np.fromiter(
            (int.from_bytes(d[:4], "little") % num_buckets
             for d in dig), dtype=np.int32, count=len(dig))
        return pa.table({
            "doc_id": batch["doc_id"],
            "content_hash": pa.array(ch, pa.string()),
            "hpart": pa.array(hpart),
            "overall": pa.array(overall.astype(np.int64)),
            "n_toxic": pc.cast(b["n_toxic"], pa.int64()),
            "non_en": pa.array((pred != "en").tolist(), pa.bool_()),
        })

    flags_ds = docs.map_batches(flags, batch_format="pyarrow",
                                zero_copy_batch=True)

    # exact-dup canonicals: ONE bucketed shuffle on hash-prefix % K —
    # every content_hash lands in one bucket, so the MIN winner and the
    # is_exact flag complete locally (no per-hash Ray aggregate, no
    # join back; see the CLAUDE.md huge-group-count note)
    def flag_exact(df: pd.DataFrame) -> pd.DataFrame:
        win = df.groupby("content_hash", sort=False)["doc_id"] \
            .transform("min")
        out = df.loc[:, ["doc_id", "overall", "n_toxic", "non_en"]] \
            .copy()
        out["is_exact"] = df["doc_id"].to_numpy() != win.to_numpy()
        return out

    joined = flags_ds.groupby("hpart").map_groups(
        flag_exact, batch_format="pandas")

    # near-dup dropped set: clusters over the (small) LSH pair output
    pairs = near_dup_documents(sf_dir).map_batches(
        lambda t: pa.table({"key_a": t["id_a"], "key_b": t["id_b"]}),
        batch_format="pyarrow")
    clusters = dup_clusters_auto(pairs)
    cdf = clusters.to_pandas()   # pa.Table and Dataset both support it
    dropped = np.sort(np.asarray(
        cdf.loc[cdf["key"] != cdf["cluster"], "key"], dtype=np.int64))
    dropped_ref = ray.put(dropped)

    def decide(t: pa.Table) -> pa.Table:
        nd = ray.get(dropped_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        is_exact = np.asarray(t["is_exact"].to_pylist(), dtype=bool)
        is_near = np.isin(ids, nd)
        non_en = np.asarray(t["non_en"].to_pylist(), dtype=bool)
        toxic = t["n_toxic"].to_numpy(zero_copy_only=False) >= 1
        low_q = t["overall"].to_numpy(zero_copy_only=False) \
            < cfg.quarantine_action_threshold
        reason = np.select(
            [is_exact, is_near, non_en, toxic, low_q],
            ["exact_dup", "near_dup", "non_english", "toxic",
             "low_quality"],
            default="ok")
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "drop_reason": pa.array(reason.tolist(), pa.string()),
            "keep": pa.array(reason == "ok"),
        })

    return joined.map_batches(decide, batch_format="pyarrow")


def near_dup_triangle_counts(sf_dir: str):
    """(doc_id, n_triangles): graph analytics over the near-dup pair
    graph — for every document in at least one triangle, the number of
    triangles it belongs to. Dense near-dup cliques show up as high
    triangle counts (a cluster-cohesion signal pair lists alone hide).

    Scale shape: the pair graph is the (small) LSH output, so the
    adjacency index is a driver broadcast (the dup_clusters contract);
    counting distributes over the EDGE stream — for edge (a, b), each
    common neighbor c yields one triangle observation for a, b and c
    (every triangle observed exactly 3× across its edges → final // 3),
    accumulated per-batch and reduced in one small groupby.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    from dataquality_ray.arrowutil import from_pandas_clean

    pairs = near_dup_documents(sf_dir).map_batches(
        lambda t: pa.table({"id_a": t["id_a"], "id_b": t["id_b"]}),
        batch_format="pyarrow")
    pdf = pairs.to_pandas()
    adj: dict = {}
    for a, b in zip(pdf["id_a"].astype(int), pdf["id_b"].astype(int)):
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    adj = {k: np.unique(np.asarray(v, np.int64))
           for k, v in adj.items()}
    adj_ref = ray.put(adj)
    edges = ray.data.from_arrow(pa.Table.from_pandas(pdf))

    def count_edge_batch(t: pa.Table) -> pa.Table:
        a_ = ray.get(adj_ref)
        acc: dict = {}
        for a, b in zip(t["id_a"].to_numpy(zero_copy_only=False),
                        t["id_b"].to_numpy(zero_copy_only=False)):
            common = np.intersect1d(a_[int(a)], a_[int(b)],
                                    assume_unique=True)
            if len(common):
                acc[int(a)] = acc.get(int(a), 0) + len(common)
                acc[int(b)] = acc.get(int(b), 0) + len(common)
                for c in common:
                    acc[int(c)] = acc.get(int(c), 0) + 1
        g = pd.DataFrame({"doc_id": list(acc.keys()),
                          "cnt": list(acc.values())})
        return from_pandas_clean(g)

    agg = edges.map_batches(count_edge_batch, batch_format="pyarrow") \
        .groupby("doc_id").aggregate(Sum("cnt", alias_name="cnt"))
    return agg.map_batches(
        lambda t: pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "n_triangles": pa.array(
                t["cnt"].to_numpy(zero_copy_only=False) // 3,
                pa.int64()),
        }), batch_format="pyarrow")


INT8_SCALE = 64   # quantization scale: q = clamp(floor(x*64), -127, 127)


def int8_ann_embeddings(sf_dir: str):
    """(query_id, vec_id, int_dot, rank): top-k ANN over int8-QUANTIZED
    embeddings — the memory-bandwidth scale path for 100 TB ANN (4×
    smaller vectors, SIMD int dot products), with EXACT integer scoring:
    q = clamp(floor(x·64), -127, 127) per component, score = <q_a, q_b>
    in int32 — no float ties, so the whole surface is hash-checkable
    (ties broken by vec_id asc, the proven ann_topk recipe).

    Scale shape: queries broadcast as one small int matrix; per-batch
    numpy int matmul + partial top-k; final per-query top-k in a
    groupby (driver volume O(|queries|·k))."""
    import pandas as pd

    from dataquality_ray.arrowutil import from_pandas_clean

    emb = _emb(sf_dir)
    k = ANN_K
    qids = list(ANN_QUERY_IDS)

    def quantize(mat: np.ndarray) -> np.ndarray:
        return np.clip(np.floor(mat.astype(np.float64) * INT8_SCALE),
                       -127, 127).astype(np.int32)

    qdf = emb.map_batches(
        lambda t: t.filter(pc.is_in(t["vec_id"],
                                    pa.array(qids, pa.int64()))),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    qdf = qdf.sort_values("vec_id")
    qmat = quantize(np.stack([np.asarray(v, np.float64)
                              for v in qdf["embedding"]]))
    qid_arr = qdf["vec_id"].to_numpy()
    q_ref = ray.put((qid_arr, qmat))

    def score(batch: pa.Table) -> pa.Table:
        qid_a, qm = ray.get(q_ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        mask = ~np.isin(ids, qid_a)
        if not mask.any():
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "int_dot": pa.array([], pa.int64())})
        e = batch["embedding"]
        if isinstance(e, pa.ChunkedArray):
            e = e.combine_chunks()
        dim = len(e[0])
        mat = np.asarray(e.flatten(), dtype=np.float64) \
            .reshape(-1, dim)[mask]
        cand = ids[mask]
        dots = quantize(mat) @ qm.T                 # (n, |q|) int
        out = []
        for j, qid in enumerate(qid_a):
            d = dots[:, j]
            take = min(k, len(d))
            # partial top-k by (dot desc, vec_id asc)
            order = np.lexsort((cand, -d))[:take]
            out.append(pd.DataFrame({
                "query_id": qid, "vec_id": cand[order],
                "int_dot": d[order].astype(np.int64)}))
        return from_pandas_clean(pd.concat(out, ignore_index=True))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["int_dot", "vec_id"],
                            ascending=[False, True],
                            kind="mergesort").head(k)
        df = df.reset_index(drop=True)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df

    return emb.map_batches(score, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .groupby("query_id").map_groups(final, batch_format="pandas")


INCR_NEW_MOD = 10    # incoming-shard membership: doc_id % 10 == 0


def incremental_dedup_documents(sf_dir: str):
    """(doc_id, dup_of, jaccard): INCREMENTAL ingest dedup — for each
    doc of the incoming shard (doc_id % INCR_NEW_MOD == 0), the min-id
    COMMITTED doc whose distinct-token Jaccard >= NEAR_DUP_DOC_JACCARD,
    if any (the "is this new crawl page already in the corpus?"
    operation every continuously-fed training pipeline runs). Jaccard
    rounded to 6 (the proven float recipe).

    Scale shape: the INCOMING shard is small relative to the corpus by
    definition — its token sets broadcast once via ray.put; the
    committed corpus STREAMS through a vectorized per-batch
    intersection scorer (never shuffles), and the per-new-doc min-id
    reduce is a tiny groupby over match rows only. (The symmetric
    full-corpus variant is near_dup_documents' LSH path.)
    """
    import pandas as pd
    from ray.data.aggregate import Min

    from dataquality_ray.arrowutil import from_pandas_clean

    docs = _docs(sf_dir, columns=["doc_id", "text"])

    def token_sets(batch: pa.Table, new_side: bool):
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        mask = (ids % INCR_NEW_MOD == 0) if new_side \
            else (ids % INCR_NEW_MOD != 0)
        t = batch.filter(pa.array(mask))
        s = pl.from_arrow(t["text"])
        if isinstance(s, pl.DataFrame):
            s = s.to_series()
        toks = s.fill_null("").str.to_lowercase() \
            .str.extract_all(TOKEN_PATTERN).list.unique()
        return (t["doc_id"].to_numpy(zero_copy_only=False),
                [frozenset(x) for x in toks.to_list()])

    def new_sets(batch: pa.Table) -> pa.Table:
        ids, sets = token_sets(batch, new_side=True)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "toks": pa.array([sorted(x) for x in sets],
                             pa.list_(pa.string())),
        })

    ndf = docs.map_batches(new_sets, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    new_ids = ndf["doc_id"].to_numpy()
    new_tok = [frozenset(x) for x in ndf["toks"]]
    new_ref = ray.put((new_ids, new_tok))

    def score_committed(batch: pa.Table) -> pa.Table:
        nids, ntoks = ray.get(new_ref)
        cids, csets = token_sets(batch, new_side=False)
        out_new, out_old, out_j = [], [], []
        thr = NEAR_DUP_DOC_JACCARD
        for cid, cset in zip(cids, csets):
            if not cset:
                continue
            lc = len(cset)
            for nid, nset in zip(nids, ntoks):
                if not nset:
                    continue
                ln = len(nset)
                # size bound: J >= thr requires min/max >= thr
                if min(lc, ln) < thr * max(lc, ln):
                    continue
                inter = len(cset & nset)
                if inter == 0:
                    continue
                j = inter / (lc + ln - inter)
                if j >= NEAR_DUP_DOC_JACCARD:
                    out_new.append(int(nid))
                    out_old.append(int(cid))
                    out_j.append(round(j, 6))
        return pa.table({
            "doc_id": pa.array(out_new, pa.int64()),
            "cand": pa.array(out_old, pa.int64()),
            "jaccard": pa.array(out_j, pa.float64()),
        })

    # materialize: `matches` feeds both the min reduce and the winner
    # jaccard re-attach — without it the scorer would run twice
    matches = docs.map_batches(score_committed, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()
    agg = matches.groupby("doc_id").aggregate(
        Min("cand", alias_name="dup_of"))

    # re-attach the jaccard of the WINNING committed doc: match rows
    # are few (near-dups only), so a driver-side merge is fine
    mdf = matches.to_pandas()
    adf = agg.to_pandas()
    out = adf.merge(mdf, left_on=["doc_id", "dup_of"],
                    right_on=["doc_id", "cand"], how="left")
    out = out[["doc_id", "dup_of", "jaccard"]].astype(
        {"doc_id": np.int64, "dup_of": np.int64})
    return from_pandas_clean(out)


# --- context-window chunking (LLM training-data prep) -----------------

CHUNK_WINDOW = 400   # chars per training chunk
CHUNK_STRIDE = 300   # chunk start stride (CHUNK_WINDOW - overlap)


def doc_context_chunks(sf_dir: str):
    """(doc_id, chunk_idx, chunk_text, chunk_len): split each document
    into fixed context windows of CHUNK_WINDOW chars starting every
    CHUNK_STRIDE chars (overlapping by WINDOW-STRIDE) — the standard
    training-data prep that turns long documents into model-sized
    examples (reference analog: the 2000/8000-char truncations at
    metadata.py:347 and bedrock.py:424 keep only a prefix; chunking
    keeps everything).

    Shape: a pure flat-map — one vectorized polars explode per batch
    (int_ranges → explode → str.slice), zero shuffles, embarrassingly
    parallel at any corpus size. Empty docs are preserved as one empty
    chunk (never drop rows silently). Character semantics are identical
    across polars str.slice, Python slicing and DuckDB substr (all code
    points), so the surface is SQL-checked.
    """
    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def chunk(batch: pa.Table) -> pa.Table:
        df = pl.DataFrame({
            "doc_id": pl.from_arrow(batch["doc_id"]),
            "text": pl.from_arrow(batch["text"]),
        })
        n = pl.col("text").str.len_chars().cast(pl.Int64)
        n_chunks = pl.max_horizontal(
            (n + (CHUNK_STRIDE - 1)) // CHUNK_STRIDE, pl.lit(1))
        out = (
            df.with_columns(chunk_idx=pl.int_ranges(0, n_chunks,
                                                    dtype=pl.Int64))
            .explode("chunk_idx")
            .with_columns(
                chunk_text=pl.col("text").str.slice(
                    pl.col("chunk_idx") * CHUNK_STRIDE, CHUNK_WINDOW)
                .fill_null(""))
            .with_columns(
                chunk_len=pl.col("chunk_text").str.len_chars()
                .cast(pl.Int64))
            .select("doc_id", "chunk_idx", "chunk_text", "chunk_len"))
        return out.to_arrow()

    return ds.map_batches(chunk, batch_format="pyarrow",
                          zero_copy_batch=True)


# --- greedy sequence packing (fixed token budget) ----------------------

PACK_TOKEN_BUDGET = 512   # whitespace tokens per packed sequence
PACK_BUCKETS = 8          # independent packing streams (hash of doc_id)


def packed_sequence_documents(sf_dir: str):
    """(doc_id, bucket, seq_id, tok_offset, n_tokens): greedy sequence
    packing — assign documents to fixed-token-budget training sequences
    (first-fit in doc_id order; a doc longer than the budget gets its
    own sequence). Packing is inherently a sequential prefix scan with
    reset, so it CANNOT be a single global scan at corpus scale; the
    documented partitioning assumption is PACK_BUCKETS independent
    packing streams keyed by the frozen md5 hash of the doc id — each
    stream packs locally after ONE slim hash shuffle (doc_id + token
    count only, never text).

    The per-bucket scan is O(#sequences) numpy searchsorted hops over
    the cumulative token counts, not a per-row Python loop. SQL-checked
    against a recursive-CTE oracle that replays the same greedy rule.
    """
    from dataquality_ray.spec import WS_TOKEN_PATTERN, token_hash_u64

    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def prep(batch: pa.Table) -> pa.Table:
        s = pl.from_arrow(batch["text"])
        ids = batch["doc_id"].to_pylist()
        bucket = np.fromiter(
            (token_hash_u64(str(i)) % PACK_BUCKETS for i in ids),
            dtype=np.int64, count=len(ids))
        return pa.table({
            "doc_id": batch["doc_id"],
            "bucket": pa.array(bucket),
            "n_tokens": pa.array(
                s.str.count_matches(WS_TOKEN_PATTERN)
                .cast(pl.Int64).to_numpy(), pa.int64()),
        })

    def pack(df):
        import pandas as pd
        df = df.sort_values("doc_id", kind="mergesort")
        nt = df["n_tokens"].to_numpy(dtype=np.int64)
        cum = np.cumsum(nt)
        n = len(nt)
        starts = []          # first row index of each sequence
        pos, base = 0, 0     # base = cumulative tokens before this seq
        while pos < n:
            starts.append(pos)
            # include docs while the running total stays <= budget;
            # a single over-budget doc still gets its own sequence
            j = int(np.searchsorted(cum, base + PACK_TOKEN_BUDGET,
                                    side="right"))
            if j == pos:
                j = pos + 1
            base = int(cum[j - 1])
            pos = j
        starts = np.asarray(starts, dtype=np.int64)
        lengths = np.diff(np.append(starts, n))
        seq_id = np.repeat(np.arange(len(starts), dtype=np.int64),
                           lengths)
        seq_base = np.repeat(
            np.concatenate(([0], cum[starts[1:] - 1])), lengths)
        tok_offset = np.concatenate(([0], cum[:-1])) - seq_base
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "bucket": df["bucket"].to_numpy(),
            "seq_id": seq_id,
            "tok_offset": tok_offset.astype(np.int64),
            "n_tokens": nt,
        })

    return ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("bucket").map_groups(pack, batch_format="pandas")


# --- global NTILE ranking (quality deciles) -----------------------------

NTILE_BUCKETS = 10


def doc_quality_deciles(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    """(doc_id, overall_quality_score, decile): NTILE(10) OVER (ORDER BY
    score, doc_id) — global ranking WITHOUT a global sort. The score
    domain is bounded (0..100 integers), so exact global ranks come
    from histogram ranking: a tiny per-score count aggregate (<= 101
    rows on the driver) yields each score's global start offset; one
    hash shuffle on score then ranks rows locally within their score
    group by doc_id. The only data-volume-proportional exchange is that
    single bucketed shuffle.

    Scale note: a single score value can be hot (many docs share one
    score). The within-score rank only needs doc_id order, so at 100 TB
    the hot groups sub-bucket by doc_id range with a second count
    histogram — same pattern one level down; at test scale the direct
    per-score groups are exact and small enough.
    """
    from ray.data.aggregate import Sum

    scored = quality_documents(sf_dir, cfg)

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["doc_id", "overall_quality_score"])

    slim = scored.map_batches(project, batch_format="pyarrow") \
        .materialize()   # feeds both the histogram and the rank shuffle

    def hist_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd
        s = batch["overall_quality_score"].to_numpy(zero_copy_only=False)
        vals, cnt = np.unique(s, return_counts=True)
        return pa.table({"score": pa.array(vals.astype(np.int64)),
                         "n": pa.array(cnt.astype(np.int64))})

    hist = slim.map_batches(hist_partial, batch_format="pyarrow") \
        .groupby("score").aggregate(Sum("n", alias_name="n")) \
        .to_pandas().sort_values("score")
    counts = hist["n"].to_numpy(dtype=np.int64)
    scores = hist["score"].to_numpy(dtype=np.int64)
    offsets = dict(zip(scores.tolist(),
                       (np.cumsum(counts) - counts).tolist()))
    total = int(counts.sum())

    # SQL-standard NTILE: first (total % k) tiles get one extra row
    q, r = divmod(total, NTILE_BUCKETS)
    boundary = r * (q + 1)

    def rank_group(df):
        import pandas as pd
        df = df.sort_values("doc_id", kind="mergesort")
        score = int(df["overall_quality_score"].iloc[0])
        rank0 = offsets[score] + np.arange(len(df), dtype=np.int64)
        small = np.maximum(q, 1)   # q == 0 → every tile is an "extra" one
        tile = np.where(rank0 < boundary,
                        rank0 // (q + 1) + 1,
                        r + (rank0 - boundary) // small + 1)
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "overall_quality_score": df["overall_quality_score"]
            .to_numpy().astype(np.int64),
            "decile": tile.astype(np.int64),
        })

    return slim.groupby("overall_quality_score") \
        .map_groups(rank_group, batch_format="pandas")


# --- count-min sketch (mergeable heavy-hitter counters) ----------------

CMS_DEPTH = 4      # independent hash rows
CMS_WIDTH = 256    # counters per row
# frozen probe list: frequent terms, mid-frequency terms, and a term
# that cannot occur (CMS must return 0 for it — no false negatives)
CMS_QUERY_TERMS = ("table", "row", "value", "spark", "merge",
                   "window", "zzzabsentterm")


def term_counts_cms(sf_dir: str):
    """(term, est_count): count-min-sketch term-frequency estimates for
    the frozen probe terms. The sketch is DEPTH x WIDTH int64 counters
    (cell = md5_u64(f"{row}:{term}") % WIDTH, the repo's frozen token
    hash) built from per-batch partial counters that merge by plain
    addition — the canonical bounded-memory heavy-hitter structure for
    a 10^12-token corpus where an exact vocab groupby is unpayable.
    Every number here is an exact integer, so unlike most sketches the
    WHOLE surface — counters and estimates — is SQL-checkable
    (overestimate-only property pinned in pytest).

    Shape: one zero-copy tokenize map emitting <= DEPTH*WIDTH partial
    cells per batch; one tiny groupby merges cells; the probe runs on
    the driver against the <= 1024-row counter table.
    """
    from ray.data.aggregate import Sum
    from dataquality_ray.spec import token_hash_u64

    ds = _docs(sf_dir, columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        toks = (pl.from_arrow(batch["text"]).str.to_lowercase()
                .str.extract_all(TOKEN_PATTERN))
        cnt = (pl.DataFrame({"term": toks}).explode("term")
               .drop_nulls().group_by("term").len(name="n"))
        terms = cnt["term"].to_list()
        n = cnt["n"].cast(pl.Int64).to_numpy()
        rows, cols, cnts = [], [], []
        for i in range(CMS_DEPTH):
            h = np.fromiter(
                (token_hash_u64(f"{i}:{t}") % CMS_WIDTH for t in terms),
                dtype=np.int64, count=len(terms))
            rows.append(np.full(len(terms), i, dtype=np.int64))
            cols.append(h)
            cnts.append(n)
        # collapse per-batch cell collisions locally before the shuffle
        df = pl.DataFrame({
            "row_i": np.concatenate(rows) if terms else
            np.empty(0, np.int64),
            "col": np.concatenate(cols) if terms else
            np.empty(0, np.int64),
            "cnt": np.concatenate(cnts) if terms else
            np.empty(0, np.int64),
        }).group_by(["row_i", "col"]).agg(pl.col("cnt").sum())
        return df.to_arrow()

    counters = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .groupby(["row_i", "col"]).aggregate(Sum("cnt", alias_name="cnt")) \
        .to_pandas()   # <= DEPTH*WIDTH rows — driver-safe by construction
    table = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
    table[counters["row_i"].to_numpy(),
          counters["col"].to_numpy()] = counters["cnt"].to_numpy()

    est = [int(min(table[i, token_hash_u64(f"{i}:{t}") % CMS_WIDTH]
                   for i in range(CMS_DEPTH)))
           for t in CMS_QUERY_TERMS]
    return pa.table({
        "term": pa.array(list(CMS_QUERY_TERMS), pa.string()),
        "est_count": pa.array(est, pa.int64()),
    })


def pagerank_near_dup(sf_dir: str):
    """(doc_id, rank): integer PageRank over the near-dup pair graph —
    graph centrality as a data-quality signal (a document whose
    near-dup neighborhood is dense is template/boilerplate-like).
    Fully SQL-checked: the fixed-point recurrence replays exactly in a
    recursive CTE over the same exact-Jaccard edge set."""
    from dataquality_ray.stages.clustering import pagerank

    return pagerank(near_dup_documents(sf_dir))


WEIGHTED_SAMPLE_N = 50


def weighted_sample_documents(sf_dir: str):
    """(doc_id, priority): deterministic weight-biased sampling — the
    A-ES pattern with INTEGER priorities: priority =
    (md5_u64(str(doc_id)) >> 1) // (n_chars + 1), keep the N smallest
    (larger documents draw smaller expected priorities, so inclusion
    is weight-biased yet reproducible under any partitioning — no RNG
    state, same reason dataset_split_documents hashes). Two-phase:
    per-batch local top-N partials, then one tiny sort+limit over
    ≤ N·batches rows.
    """
    from dataquality_ray.spec import token_hash_u64

    ds = _docs(sf_dir, columns=["doc_id", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        w = batch["n_chars"].to_numpy(zero_copy_only=False) \
            .astype(np.int64) + 1
        h = np.fromiter(((token_hash_u64(str(i)) >> 1) for i in ids),
                        dtype=np.int64, count=len(ids))
        pr = h // w
        order = np.lexsort((np.asarray(ids, dtype=np.int64), pr))
        keep = order[:WEIGHTED_SAMPLE_N]
        return pa.table({
            "doc_id": pa.array(np.asarray(ids, np.int64)[keep]),
            "priority": pa.array(pr[keep]),
        })

    return ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .sort(["priority", "doc_id"]).limit(WEIGHTED_SAMPLE_N)


def doc_embedding_values(sf_dir: str):
    """(doc_id, dim, val): the GENERATED embeddings themselves,
    hash-checked — possible because the embedder's projection weights
    are frozen md5-derived INTEGERS (stages/embeddings.PROJ_Q): the
    tf × weight accumulation is exact int64 (order/partition
    independent), and the only float ops are one correctly-rounded
    sqrt + divide from exact integer inputs, rounded to 6 — so DuckDB
    replaying the same arithmetic produces bit-identical values.
    Upgrades embedding GENERATION from a rows-only surface to a
    value-checked one (doc_token_buckets pins the front half; this
    pins the whole thing)."""
    from dataquality_ray.stages.embeddings import EMBED_DIM, embed_texts

    ds = embed_texts(_docs(sf_dir, columns=["doc_id", "text"]))

    def explode(batch: pa.Table) -> pa.Table:
        emb = batch["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        n = len(batch)
        vals = np.asarray(emb.flatten(), dtype=np.float64)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, EMBED_DIM)),
            "dim": pa.array(np.tile(np.arange(EMBED_DIM, dtype=np.int64),
                                    n)),
            "val": pa.array(vals, pa.float64()),
        })

    return ds.map_batches(explode, batch_format="pyarrow")


def source_embedding_centroids(sf_dir: str):
    """(source, dim, n_docs, sum_acc, centroid_milli): per-source mean
    embedding — the "domain centroid" every curriculum/mixture pipeline
    wants — computed over the embedder's EXACT int64 accumulators
    (stages/embeddings._acc_rows), not the normalized floats, so the
    sum is order/partition independent and the whole surface is
    hash-checkable. centroid_milli = (1000*sum) trunc-div n_docs
    (DuckDB // semantics, mirrored with sign-aware numpy floor-div).

    Scale shape: the actor-pool partial stage reduces each batch to
    (sources x DIM) rows before any exchange; the final groupby's
    output group count is |sources| x DIM — constant, not
    corpus-proportional. Token-less docs contribute zero vectors but
    still count in n_docs (grid semantics of doc_embedding_values).
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    from dataquality_ray.arrowutil import from_pandas_clean
    from dataquality_ray.stages.embeddings import (
        EMBED_DIM,
        HashedProjectionEmbedder,
    )

    docs = _docs(sf_dir, columns=["source", "text"])

    class Partials(HashedProjectionEmbedder):
        def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
            texts = batch[self.text_col]
            if isinstance(texts, pa.ChunkedArray):
                texts = texts.combine_chunks()
            acc = self._acc_rows(texts.to_pylist())
            src = np.asarray(batch["source"].to_pylist())
            uniq, inv = np.unique(src, return_inverse=True)
            sums = np.zeros((len(uniq), EMBED_DIM), dtype=np.int64)
            np.add.at(sums, inv, acc)
            n = np.bincount(inv).astype(np.int64)
            return pa.table({
                "source": pa.array(np.repeat(uniq, EMBED_DIM).tolist(),
                                   pa.string()),
                "dim": pa.array(np.tile(
                    np.arange(EMBED_DIM, dtype=np.int64), len(uniq))),
                "sa": pa.array(sums.ravel()),
                "n": pa.array(np.repeat(n, EMBED_DIM)),
            })

    agg = (docs.map_batches(
        Partials, fn_constructor_kwargs={},
        concurrency=(1, DEFAULT_CONFIG.actor_pool_size),
        batch_size=DEFAULT_CONFIG.batch_size,
        batch_format="pyarrow")
        .groupby(["source", "dim"])
        .aggregate(Sum("sa", alias_name="sum_acc"),
                   Sum("n", alias_name="n_docs")))

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        sa = batch["sum_acc"].to_numpy(zero_copy_only=False)
        n = batch["n_docs"].to_numpy(zero_copy_only=False)
        num = sa * 1000
        cent = np.where(num >= 0, num // n, -((-num) // n))
        return pa.table({
            "source": batch["source"],
            "dim": pc.cast(batch["dim"], pa.int64()),
            "n_docs": pa.array(n.astype(np.int64)),
            "sum_acc": pa.array(sa.astype(np.int64)),
            "centroid_milli": pa.array(cent.astype(np.int64)),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def quality_percentile_by_source(sf_dir: str,
                                 cfg: PipelineConfig = DEFAULT_CONFIG):
    """(doc_id, source, overall, pr_micro): each document's PERCENT_RANK
    of overall quality WITHIN its source — SQL's
    ``(RANK() OVER (PARTITION BY source ORDER BY overall) - 1) * 1e6 //
    (COUNT(*) OVER (PARTITION BY source) - 1)`` as an exact integer
    (micro units; single-row sources → 0).

    Scale shape: overall scores are integers in [0, 100], so the window
    function collapses to a HISTOGRAM lookup — per-batch partial
    (source, overall) counts → one tiny Ray groupby (≤ |sources|×101
    output groups, constant) → broadcast cumulative histogram →
    vectorized per-row rank lookup. No per-source sort, no
    corpus-proportional shuffle: the only full pass is the scoring map
    itself. (RANK with ties = 1 + count of strictly-lower scores =
    exactly the cumulative histogram below the row's score.)
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, columns=["doc_id", "text", "source"])
    ds = ds.map_batches(functools.partial(heuristics_batch, cfg=cfg),
                        batch_format="pyarrow", zero_copy_batch=True)

    def scored(batch: pa.Table) -> pa.Table:
        from dataquality_ray.stages.heuristics import heuristic_overall4
        overall = heuristic_overall4(batch).astype(np.int64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "source": batch["source"],
            "overall": pa.array(overall),
        })

    scored_ds = ds.map_batches(scored, batch_format="pyarrow") \
        .materialize()    # consumed twice: histogram + rank lookup

    def hist_partial(batch: pa.Table) -> pa.Table:
        from dataquality_ray.arrowutil import from_pandas_clean
        g = (pd.DataFrame({
            "source": np.asarray(batch["source"].to_pylist()),
            "overall": batch["overall"].to_numpy(zero_copy_only=False),
            "n": 1,
        }).groupby(["source", "overall"], sort=False)
          .agg(n=("n", "sum")).reset_index())
        return from_pandas_clean(g)

    hist = scored_ds.map_batches(hist_partial, batch_format="pyarrow") \
        .groupby(["source", "overall"]) \
        .aggregate(Sum("n", alias_name="n")).to_pandas()
    # driver volume: |sources| × ≤101 rows — constant, never corpus-
    # proportional. Build per-source (cum_below[score], total).
    lut = {}
    for src, g in hist.groupby("source", sort=False):
        counts = np.zeros(101, dtype=np.int64)
        counts[g["overall"].to_numpy()] = g["n"].to_numpy()
        cum_below = np.zeros(101, dtype=np.int64)
        np.cumsum(counts[:-1], out=cum_below[1:])
        lut[src] = (cum_below, int(counts.sum()))
    lut_ref = ray.put(lut)

    def rank(batch: pa.Table) -> pa.Table:
        l = ray.get(lut_ref)
        src = np.asarray(batch["source"].to_pylist())
        ov = batch["overall"].to_numpy(zero_copy_only=False)
        pr = np.zeros(len(src), dtype=np.int64)
        for s in pd.unique(src):
            m = src == s
            cum_below, total = l[s]
            if total > 1:
                pr[m] = cum_below[ov[m]] * 1_000_000 // (total - 1)
        return batch.append_column("pr_micro", pa.array(pr))

    return scored_ds.map_batches(rank, batch_format="pyarrow")


DUP_SPAN_K = 8   # tokens per window (exact-substring dedup granularity)


def duplicate_span_documents(sf_dir: str, num_buckets: int = 0):
    """(doc_id, n_windows, n_dup_windows, dup_frac_milli): CROSS-document
    duplicate-span statistics — for every rolling 8-token window, is the
    identical window present in ≥ 2 DISTINCT documents? (The
    exact-substring dedup signal of "Deduplicating Training Data Makes
    Language Models Better" — Lee et al. 2022 — reduced to per-doc
    integer fixed-point; complements dup_ngram_stats, which is
    INTRA-document.) Docs with < K tokens have no windows and are
    omitted (the SQL twin filters identically).

    Window identity is `spec.token_hash_u64` of the space-joined window
    (the frozen md5-u64 hash — the DuckDB twin hashes with
    md5_number_upper, so both engines compare identical values).

    Scale shape: windows explode once (batch-local polars shifts),
    then TWO bucketed exchanges, both on hashes: (1) window-hash
    buckets decide cross-doc duplication locally (every window hash
    lives in exactly one bucket) and emit per-(doc, bucket) partial
    counts; (2) splitmix(doc) buckets sum the partials per doc locally.
    Neither exchange ever has corpus-proportional OUTPUT groups in a
    Ray aggregate (CLAUDE.md invariant), and full text never moves —
    only (hash, doc, count) triples.
    """
    import pandas as pd

    from dataquality_ray.spec import token_hash_u64
    from dataquality_ray.stages.bucketing import (
        cluster_buckets,
        splitmix_bucket,
    )

    nb = num_buckets or cluster_buckets()
    docs = _docs(sf_dir, columns=["doc_id", "text"])

    def windows(batch: pa.Table) -> pa.Table:
        s = pl.from_arrow(batch["text"])
        if isinstance(s, pl.DataFrame):
            s = s.to_series()
        toks = s.fill_null("").str.to_lowercase() \
            .str.extract_all(TOKEN_PATTERN)
        expr = pl.element()
        for j in range(1, DUP_SPAN_K):
            expr = expr + " " + pl.element().shift(-j)
        wins = toks.list.eval(expr.drop_nulls())
        df = (pl.DataFrame({
            "doc_id": pl.from_arrow(batch["doc_id"]),
            "w": wins,
        }).explode("w").drop_nulls("w")
          .group_by(["doc_id", "w"]).len().rename({"len": "n_pos"}))
        # frozen md5-u64 window hash, once per unique window string
        wcol = df["w"].to_arrow()
        enc = wcol.dictionary_encode()
        lut = np.fromiter(
            (token_hash_u64(u) for u in enc.dictionary.to_pylist()),
            dtype=np.uint64, count=len(enc.dictionary))
        h = lut[enc.indices.to_numpy(zero_copy_only=False)]
        return pa.table({
            "h": pa.array(h),
            "doc_id": df["doc_id"].to_arrow(),
            "n_pos": pa.array(df["n_pos"].cast(pl.Int64).to_numpy()),
            "part": pa.array((h % np.uint64(nb)).astype(np.int32)),
        })

    def dup_in_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        # a window hash lives entirely in this bucket → distinct-doc
        # counts are exact here. Partials may repeat (doc, h) across
        # source batches, so first collapse to true per-(h, doc) counts.
        g = (df.groupby(["h", "doc_id"], sort=False)
             .agg(n_pos=("n_pos", "sum")).reset_index())
        nd = g.groupby("h", sort=False)["doc_id"].transform("nunique")
        g["n_dup"] = np.where(nd >= 2, g["n_pos"], 0)
        out = (g.groupby("doc_id", sort=False)
               .agg(n_windows=("n_pos", "sum"), n_dup=("n_dup", "sum"))
               .reset_index())
        out["part"] = splitmix_bucket(
            out["doc_id"].to_numpy().astype(np.int64), nb)
        return out

    def per_doc(df: "pd.DataFrame") -> "pd.DataFrame":
        g = (df.groupby("doc_id", sort=False)
             .agg(n_windows=("n_windows", "sum"), n_dup=("n_dup", "sum"))
             .reset_index())
        g["dup_frac_milli"] = (1000 * g["n_dup"]) // g["n_windows"]
        return pd.DataFrame({
            "doc_id": g["doc_id"].astype(np.int64),
            "n_windows": g["n_windows"].astype(np.int64),
            "n_dup_windows": g["n_dup"].astype(np.int64),
            "dup_frac_milli": g["dup_frac_milli"].astype(np.int64),
        })

    return (docs.map_batches(windows, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("part").map_groups(dup_in_bucket,
                                        batch_format="pandas")
            .groupby("part").map_groups(per_doc, batch_format="pandas"))


def source_vocab_overlap(sf_dir: str, num_buckets: int = 0):
    """(source_a, source_b, n_common, n_a, n_b, jaccard_micro): exact
    vocabulary Jaccard between every PAIR of sources — corpus-diversity
    measurement (set similarity between GROUPS, not rows; the
    INTERSECT-shaped dual of the per-doc near-dup family).
    jaccard_micro = 1e6 * |A∩B| // |A∪B| (exact integer).

    Scale shape: per-batch distinct (source, term) partials → ONE
    term-hash bucket shuffle; inside each bucket every term's source
    set is complete, so pair-intersection counts and per-source vocab
    partials both finish locally (vectorized). The final reduce is
    |sources|² rows — constant. Vocabulary never assembles in one
    place.
    """
    import itertools

    import pandas as pd

    from dataquality_ray.spec import token_hash_u64
    from dataquality_ray.stages.bucketing import cluster_buckets

    nb = num_buckets or cluster_buckets()
    docs = _docs(sf_dir, columns=["text", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        s = pl.from_arrow(batch["text"])
        if isinstance(s, pl.DataFrame):
            s = s.to_series()
        toks = s.fill_null("").str.to_lowercase() \
            .str.extract_all(TOKEN_PATTERN)
        df = (pl.DataFrame({
            "source": pl.from_arrow(batch["source"]),
            "term": toks,
        }).explode("term").drop_nulls("term").unique())
        t = df["term"].to_arrow()
        enc = t.dictionary_encode()
        lut = np.fromiter(
            (token_hash_u64(u) for u in enc.dictionary.to_pylist()),
            dtype=np.uint64, count=len(enc.dictionary))
        h = lut[enc.indices.to_numpy(zero_copy_only=False)]
        return pa.table({
            "source": df["source"].to_arrow(),
            "term": t,
            "part": pa.array((h % np.uint64(nb)).astype(np.int32)),
        })

    def bucket_counts(df: "pd.DataFrame") -> "pd.DataFrame":
        # the bucket owns its terms entirely: dedup partials, then per
        # term emit every source pair + per-source vocab partials
        df = df[["source", "term"]].drop_duplicates()
        sizes = (df.groupby("source", sort=False).size()
                 .rename("n").reset_index())
        rows_a, rows_b = [], []
        for _, g in df.groupby("term", sort=False):
            ss = sorted(g["source"])
            if len(ss) >= 2:
                for a, b in itertools.combinations(ss, 2):
                    rows_a.append(a)
                    rows_b.append(b)
        pairs = (pd.DataFrame({"source_a": rows_a, "source_b": rows_b})
                 .groupby(["source_a", "source_b"], sort=False)
                 .size().rename("n_common").reset_index()) \
            if rows_a else pd.DataFrame(
                {"source_a": pd.Series(dtype=object),
                 "source_b": pd.Series(dtype=object),
                 "n_common": pd.Series(dtype=np.int64)})
        pairs["kind"] = "pair"
        sizes = sizes.rename(columns={"source": "source_a"})
        sizes["source_b"] = ""
        sizes["kind"] = "size"
        sizes = sizes.rename(columns={"n": "n_common"})
        out = pd.concat(
            [pairs[["source_a", "source_b", "n_common", "kind"]],
             sizes[["source_a", "source_b", "n_common", "kind"]]],
            ignore_index=True)
        out["n_common"] = out["n_common"].astype(np.int64)
        return out

    partials = (docs.map_batches(partial, batch_format="pyarrow",
                                 zero_copy_batch=True)
                .groupby("part")
                .map_groups(bucket_counts, batch_format="pandas")
                .to_pandas())    # |sources|² × buckets rows — tiny
    sizes = (partials[partials["kind"] == "size"]
             .groupby("source_a")["n_common"].sum().to_dict())
    pair = (partials[partials["kind"] == "pair"]
            .groupby(["source_a", "source_b"])["n_common"].sum()
            .reset_index())
    pair["n_a"] = pair["source_a"].map(sizes).astype(np.int64)
    pair["n_b"] = pair["source_b"].map(sizes).astype(np.int64)
    union = pair["n_a"] + pair["n_b"] - pair["n_common"]
    pair["jaccard_micro"] = (1_000_000 * pair["n_common"]) // union
    from dataquality_ray.arrowutil import from_pandas_clean
    return from_pandas_clean(pair.reset_index(drop=True))


# --- snapshot diff ------------------------------------------------------

# deterministic v2 synthesis from the v1 documents table (the DuckDB
# twin applies the same three rules, so both engines diff the same
# pair of snapshots): removed, changed-in-place, and added rows
DIFF_REMOVED_MOD = 17          # doc_id % 17 == 0 → dropped in v2
DIFF_CHANGED_MOD = 10          # doc_id % 10 == 3 → text || ' v2'
DIFF_ADDED_MOD = 25            # doc_id % 25 == 1 → new row
DIFF_ADDED_OFFSET = 1_000_000  # new row id = doc_id + offset


def _raw_md5_hex(text) -> list:
    """md5 hex of the RAW (un-normalized) text, read zero-copy off the
    Arrow utf-8 buffer — snapshot equality is byte equality, unlike the
    dedup path's normalized content_hash."""
    import hashlib
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n = len(text)
    off_dtype = np.int64 if pa.types.is_large_string(text.type) \
        else np.int32
    offs = np.frombuffer(text.buffers()[1], dtype=off_dtype)[
        text.offset: text.offset + n + 1]
    data = memoryview(text.buffers()[2] or b"")
    md5 = hashlib.md5
    return [md5(data[offs[i]:offs[i + 1]]).hexdigest() for i in range(n)]


def corpus_snapshot_diff(sf_dir: str, num_buckets: int = 0):
    """(doc_id, status): reconcile two corpus snapshots —
    'added' / 'removed' / 'changed' / 'unchanged' per document, the
    ingest-audit shape for an evolving training corpus (which shards
    need re-processing, which are stable).

    v2 is synthesized deterministically from v1 (rules above) so the
    operator is SQL-checkable end-to-end. Scale shape: ONE scan emits
    BOTH sides' slim rows (doc_id, raw-md5, side) — texts never leave
    their batch; both sides co-shuffle into the same doc_id-hash
    buckets and the FULL OUTER diff completes locally per bucket with
    one vectorized polars join (the customer_event_reconciliation
    pattern — neither snapshot is broadcast, so the shape holds when
    both are 100 TB)."""
    from dataquality_ray.stages.bucketing import (
        cluster_buckets,
        splitmix_bucket,
    )

    nb = num_buckets or cluster_buckets()
    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def both_sides(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        h1 = _raw_md5_hex(text)
        v1 = pa.table({
            "doc_id": pa.array(ids),
            "h": pa.array(h1, pa.string()),
            "side": pa.array(np.full(len(ids), "a"), pa.string()),
            "bucket": pa.array(splitmix_bucket(ids, nb)),
        })
        # v2: drop removed, rewrite changed, append added — suffixes
        # via one vectorized polars when/then
        df = pl.DataFrame({"doc_id": ids, "text": pl.from_arrow(text)})
        kept = (df.filter(pl.col("doc_id") % DIFF_REMOVED_MOD != 0)
                .with_columns(
                    text=pl.when(pl.col("doc_id")
                                 % DIFF_CHANGED_MOD == 3)
                    .then(pl.col("text") + pl.lit(" v2"))
                    .otherwise(pl.col("text"))))
        added = (df.filter(pl.col("doc_id") % DIFF_ADDED_MOD == 1)
                 .with_columns(
                     doc_id=pl.col("doc_id") + DIFF_ADDED_OFFSET,
                     text=pl.col("text") + pl.lit(" new")))
        v2df = pl.concat([kept, added])
        ids2 = v2df["doc_id"].to_numpy().astype(np.int64)
        h2 = _raw_md5_hex(v2df["text"].to_arrow())
        v2 = pa.table({
            "doc_id": pa.array(ids2),
            "h": pa.array(h2, pa.string()),
            "side": pa.array(np.full(len(ids2), "b"), pa.string()),
            "bucket": pa.array(splitmix_bucket(ids2, nb)),
        })
        return pa.concat_tables([v1, v2])

    def diff(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["doc_id", "h", "side"]))
        a = df.filter(pl.col("side") == "a").select(
            "doc_id", ha=pl.col("h"))
        b = df.filter(pl.col("side") == "b").select(
            "doc_id", hb=pl.col("h"))
        m = a.join(b, on="doc_id", how="full", coalesce=True)
        m = m.with_columns(
            status=pl.when(pl.col("ha").is_null())
            .then(pl.lit("added"))
            .when(pl.col("hb").is_null()).then(pl.lit("removed"))
            .when(pl.col("ha") == pl.col("hb"))
            .then(pl.lit("unchanged"))
            .otherwise(pl.lit("changed")))
        return m.select(["doc_id", "status"]).to_arrow().cast(
            pa.schema([("doc_id", pa.int64()),
                       ("status", pa.string())]))

    return (ds.map_batches(both_sides, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("bucket")
            .map_groups(diff, batch_format="pyarrow"))


# --- training-mixture utilities -----------------------------------------

MIXTURE_SQRT_SCALE = 1_000_000   # s = floor(sqrt(chars * SCALE))
MIXTURE_PPM = 1_000_000


def source_mixture_weights(sf_dir: str):
    """(source, n_docs, sum_chars, weight_ppm): temperature-0.5 data
    mixing weights per source — w_s ∝ sqrt(size_s), the standard
    corpus-mixing rule that upweights small domains (used for
    multilingual / multi-domain training mixtures). All math is exact:
    IEEE sqrt is correctly rounded, so floor(sqrt(int)) matches DuckDB
    bit-for-bit, and the normalization is integer ppm (``s * 1e6 //
    Σs``). One constant-size groupby over per-batch partials."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, columns=["source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        g = (pl.DataFrame({
            "source": pl.from_arrow(batch["source"]),
            "c": pl.from_arrow(batch["n_chars"]),
        }).group_by("source")
            .agg(n=pl.len().cast(pl.Int64),
                 c=pl.col("c").sum().cast(pl.Int64)))
        return g.to_arrow().cast(pa.schema([
            ("source", pa.string()), ("n", pa.int64()),
            ("c", pa.int64())]))

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("source")
           .aggregate(Sum("n", alias_name="n_docs"),
                      Sum("c", alias_name="sum_chars"))
           .to_pandas())       # #sources rows — constant-size result

    s = np.floor(np.sqrt(agg["sum_chars"].to_numpy().astype(np.float64)
                         * MIXTURE_SQRT_SCALE)).astype(np.int64)
    tot = int(s.sum())
    w = (s * MIXTURE_PPM) // max(tot, 1)
    out = pa.table({
        "source": pa.array(agg["source"].tolist(), pa.string()),
        "n_docs": pa.array(agg["n_docs"].to_numpy().astype(np.int64)),
        "sum_chars": pa.array(
            agg["sum_chars"].to_numpy().astype(np.int64)),
        "weight_ppm": pa.array(w),
    })
    return out.sort_by("source")


MIXTURE_BUDGET_DOCS = 1000   # total sampling budget the plan allocates


def mixture_allocation_plan(sf_dir: str):
    """(source, n_docs, alloc_docs): turn the sqrt mixing weights into
    an INTEGER per-source sampling plan for a fixed document budget —
    largest-remainder (Hamilton) apportionment, the step between
    "weights" and "how many docs to actually draw per source".
    base_s = B*sq_s // Σsq; the leftover B - Σbase goes to the largest
    exact remainders ((B*sq_s) mod Σsq, ties → source asc). All integer
    arithmetic on the constant-size per-source aggregate — same
    distributed two-phase front half as source_mixture_weights; the
    apportionment itself touches |sources| rows."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, columns=["source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        g = (pl.DataFrame({
            "source": pl.from_arrow(batch["source"]),
            "c": pl.from_arrow(batch["n_chars"]),
        }).group_by("source")
            .agg(n=pl.len().cast(pl.Int64),
                 c=pl.col("c").sum().cast(pl.Int64)))
        return g.to_arrow().cast(pa.schema([
            ("source", pa.string()), ("n", pa.int64()),
            ("c", pa.int64())]))

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("source")
           .aggregate(Sum("n", alias_name="n_docs"),
                      Sum("c", alias_name="sum_chars"))
           .to_pandas())       # #sources rows — constant-size result
    agg = agg.sort_values("source").reset_index(drop=True)

    sq = np.floor(np.sqrt(agg["sum_chars"].to_numpy()
                          .astype(np.float64)
                          * MIXTURE_SQRT_SCALE)).astype(np.int64)
    tot = max(int(sq.sum()), 1)
    b = MIXTURE_BUDGET_DOCS
    base = (b * sq) // tot
    rem = (b * sq) % tot
    leftover = b - int(base.sum())
    # largest remainder, ties -> source asc (agg is source-sorted, and
    # mergesort is stable, so equal remainders keep source order)
    order = np.argsort(-rem, kind="mergesort")
    extra = np.zeros(len(sq), dtype=np.int64)
    extra[order[:leftover]] = 1
    return pa.table({
        "source": pa.array(agg["source"].tolist(), pa.string()),
        "n_docs": pa.array(agg["n_docs"].to_numpy().astype(np.int64)),
        "alloc_docs": pa.array(base + extra),
    })


def quality_threshold_curve(sf_dir: str,
                            cfg: PipelineConfig = DEFAULT_CONFIG):
    """(threshold, n_kept, kept_ppm): how many documents survive a
    quality filter at every integer cutoff 0..100 — the curve you read
    before choosing a corpus filter threshold. Scores are the
    hash-checked quality_documents overall (integer 0..100), so the
    whole curve folds up from a 101-cell histogram: per-batch bincount
    partials, O(#blocks × 101) driver reduce, reverse cumulative sum.
    No shuffle at all."""
    ds = _docs(sf_dir, columns=["doc_id", "text"])
    ds = ds.map_batches(functools.partial(heuristics_batch, cfg=cfg),
                        batch_format="pyarrow", zero_copy_batch=True)

    def hist(batch: pa.Table) -> pa.Table:
        from dataquality_ray.stages.heuristics import heuristic_overall4
        h = np.bincount(np.clip(heuristic_overall4(batch), 0, 100),
                        minlength=101)
        return pa.table({"hist": pa.array([h.tobytes()], pa.binary())})

    rows = ds.map_batches(hist, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()
    total = np.zeros(101, dtype=np.int64)
    for r in rows:
        total += np.frombuffer(r["hist"], dtype=np.int64)
    n = int(total.sum())
    kept = np.cumsum(total[::-1])[::-1]      # n_kept at threshold t
    return pa.table({
        "threshold": pa.array(np.arange(101, dtype=np.int64)),
        "n_kept": pa.array(kept.astype(np.int64)),
        "kept_ppm": pa.array(kept.astype(np.int64) * 1_000_000
                             // max(n, 1)),
    })


# Gopher-style repetition thresholds (Rae et al. 2021 §A1.1, adapted to
# integer arithmetic): a document is repetition-flagged when any of the
# four signals crosses its percentage threshold. Interpolated into the
# DuckDB oracle — change here, and both engines move together.
GOPHER_DUP_LINE_PCT = 30        # duplicate line occurrences / lines
GOPHER_DUP_LINE_CHAR_PCT = 30   # chars in duplicate line occurrences
GOPHER_TOP2_CHAR_PCT = 20       # chars covered by the top 2-gram
GOPHER_DUP5_CHAR_PCT = 15       # chars in duplicate 5-gram occurrences


def _gopher_repetition_batch(batch: pa.Table) -> pa.Table:
    """Per-document repetition signals, entirely batch-local (one doc =
    one row, so there is no cross-batch entity-splitting hazard). All
    arithmetic is int64 in polars (nulls, never NaN — the
    user_funnel_stages exactness rule), so the DuckDB twin is
    bit-identical by construction."""
    df = pl.from_arrow(batch.select(["doc_id", "text"]))
    base = df.select(
        "doc_id",
        n_chars=pl.col("text").str.len_chars().cast(pl.Int64))

    # duplicate-line stats over non-empty lines (no trimming — the SQL
    # twin filters x <> '' on the raw split the same way)
    ln = (df.select("doc_id", l=pl.col("text").str.split("\n"))
            .explode("l")
            .filter(pl.col("l").is_not_null() & (pl.col("l") != "")))
    la = (ln.group_by("doc_id", "l")
            .agg(c=pl.len().cast(pl.Int64))
            .with_columns(L=pl.col("l").str.len_chars().cast(pl.Int64))
            .group_by("doc_id")
            .agg(n_lines=pl.col("c").sum(),
                 line_chars=(pl.col("c") * pl.col("L")).sum(),
                 dup_line_count=(pl.col("c") - 1).sum(),
                 dup_line_chars=((pl.col("c") - 1) * pl.col("L")).sum()))

    # token n-grams (the pinned quote-free ASCII TOKEN_PATTERN — same
    # regex string runs in polars' Rust regex and DuckDB's RE2)
    flat = (df.select("doc_id",
                      t=pl.col("text").str.to_lowercase()
                      .str.extract_all(TOKEN_PATTERN))
            .with_row_index("rid")
            .explode("t")
            .filter(pl.col("t").is_not_null()))
    sh = [pl.col("t").shift(-k).over("rid") for k in range(1, 5)]
    grams = flat.with_columns(
        g2=pl.col("t") + " " + sh[0],
        g5=pl.col("t") + " " + sh[0] + " " + sh[1] + " " + sh[2]
           + " " + sh[3])

    bgc = (grams.drop_nulls("g2")
           .group_by("doc_id", "g2").agg(c=pl.len().cast(pl.Int64)))
    top2 = (bgc.filter(pl.col("c") == pl.col("c").max().over("doc_id"))
            .group_by("doc_id")
            .agg(top2_gram=pl.col("g2").min(),
                 top2_count=pl.col("c").first())
            .with_columns(top2_chars=pl.col("top2_count")
                          * pl.col("top2_gram").str.len_chars()
                          .cast(pl.Int64)))

    d5 = (grams.drop_nulls("g5")
          .group_by("doc_id", "g5").agg(c=pl.len().cast(pl.Int64))
          .filter(pl.col("c") > 1)
          .with_columns(L=pl.col("g5").str.len_chars().cast(pl.Int64))
          .group_by("doc_id")
          .agg(dup5_chars=((pl.col("c") - 1) * pl.col("L")).sum()))

    out = (base.join(la, on="doc_id", how="left")
           .join(top2, on="doc_id", how="left")
           .join(d5, on="doc_id", how="left")
           .with_columns(pl.col("n_lines", "line_chars",
                                "dup_line_count", "dup_line_chars",
                                "top2_count", "top2_chars",
                                "dup5_chars").fill_null(0),
                         pl.col("top2_gram").fill_null("")))
    flag = (((pl.col("n_lines") > 0)
             & (100 * pl.col("dup_line_count")
                > GOPHER_DUP_LINE_PCT * pl.col("n_lines")))
            | ((pl.col("line_chars") > 0)
               & (100 * pl.col("dup_line_chars")
                  > GOPHER_DUP_LINE_CHAR_PCT * pl.col("line_chars")))
            | ((pl.col("n_chars") > 0)
               & (100 * pl.col("top2_chars")
                  > GOPHER_TOP2_CHAR_PCT * pl.col("n_chars")))
            | ((pl.col("n_chars") > 0)
               & (100 * pl.col("dup5_chars")
                  > GOPHER_DUP5_CHAR_PCT * pl.col("n_chars"))))
    out = out.select(
        "doc_id", "n_chars", "n_lines", "dup_line_count",
        "dup_line_chars", "top2_gram", "top2_count", "top2_chars",
        "dup5_chars",
        rep_flag=flag.cast(pl.Int64))
    return out.to_arrow()


def gopher_repetition_documents(sf_dir: str):
    """(doc_id, n_chars, n_lines, dup_line_count, dup_line_chars,
    top2_gram, top2_count, top2_chars, dup5_chars, rep_flag):
    Gopher-style repetition quality filter (duplicate-line fraction,
    top-2-gram character coverage, duplicate-5-gram character mass —
    Rae et al. 2021), complementing dup_ngram_stats' bigram
    diversity counts with the char-mass signals and the composite
    keep/drop flag. Zero shuffle: every signal is a function of one
    document row, so the whole operator is one vectorized
    map_batches."""
    docs = _docs(sf_dir, columns=["doc_id", "text"])
    return docs.map_batches(_gopher_repetition_batch,
                            batch_format="pyarrow",
                            zero_copy_batch=True)


# Gopher-style QUALITY thresholds (Rae et al. 2021 §A1.1 — the
# non-repetition half: word-count bounds, mean word length, symbol
# ratio, bullet/ellipsis line fractions, alphabetic-word fraction,
# stop-word presence), adapted to integer arithmetic so the DuckDB
# twin is bit-identical. Interpolated into the oracle — change here
# and both engines move together.
GOPHERQ_MIN_WORDS = 50
GOPHERQ_MAX_WORDS = 100_000
GOPHERQ_MIN_WORD_LEN = 3     # mean word length lower bound (chars)
GOPHERQ_MAX_WORD_LEN = 10    # mean word length upper bound
GOPHERQ_SYMBOL_PCT = 10      # ('#' + '...') occurrences per 100 words
GOPHERQ_BULLET_PCT = 10      # bullet-start lines per 100 lines
GOPHERQ_ELLIPSIS_PCT = 30    # '...'-ending lines per 100 lines
GOPHERQ_ALPHA_PCT = 80       # words containing a letter per 100 words
# Gopher's literal value is 2; the synthetic corpus' fixed vocabulary
# carries at most one of the eight stop words, so 2 flags 100% of
# docs — calibrated to 1 (same rule shape; the oracle interpolates
# this constant so both engines move together).
GOPHERQ_MIN_STOP = 1         # distinct stop words required
GOPHERQ_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have",
                     "with")


def _gopher_quality_batch(batch: pa.Table) -> pa.Table:
    """Per-document Gopher quality signals, entirely batch-local (one
    doc = one row). Counting conventions pinned cross-engine and
    prototyped for exact parity (see tests): words are
    spec.WS_TOKEN_PATTERN matches on the RAW text (no lowercasing, so
    char counts are exact); the alphabetic test is the case-insensitive
    class [A-Za-z]; '...' counts are leftmost non-overlapping (polars
    literal count_matches == DuckDB replace-length trick); stop-word
    hits are DISTINCT stop words present among lower-cased
    TOKEN_PATTERN tokens (polars list.set_intersection == DuckDB
    list_intersect). All arithmetic int64; NULL text behaves like ''."""
    from dataquality_ray.spec import WS_TOKEN_PATTERN

    df = pl.from_arrow(batch.select(["doc_id", "text"])) \
        .with_columns(text=pl.col("text").fill_null(""))
    t = pl.col("text")
    words = t.str.extract_all(WS_TOKEN_PATTERN)
    lines = t.str.split("\n")
    stop_lit = pl.lit(pl.Series("s", [list(GOPHERQ_STOPWORDS)]))
    out = df.select(
        "doc_id",
        n_words=t.str.count_matches(WS_TOKEN_PATTERN).cast(pl.Int64),
        word_chars=words.list.eval(
            pl.element().str.len_chars().cast(pl.Int64))
        .list.sum().fill_null(0).cast(pl.Int64),
        n_alpha_words=words.list.eval(
            pl.element().str.contains("[A-Za-z]").cast(pl.Int64))
        .list.sum().fill_null(0).cast(pl.Int64),
        n_hash=t.str.count_matches("#", literal=True).cast(pl.Int64),
        n_ellipsis=t.str.count_matches("...", literal=True)
        .cast(pl.Int64),
        n_lines=lines.list.eval(
            pl.element().filter(pl.element() != ""))
        .list.len().cast(pl.Int64),
        n_bullet_lines=lines.list.eval(
            ((pl.element() != "")
             & pl.element().str.contains("^[-*]")).cast(pl.Int64))
        .list.sum().fill_null(0).cast(pl.Int64),
        n_ellipsis_lines=lines.list.eval(
            ((pl.element() != "")
             & pl.element().str.ends_with("...")).cast(pl.Int64))
        .list.sum().fill_null(0).cast(pl.Int64),
        n_stop_hits=t.str.to_lowercase().str.extract_all(TOKEN_PATTERN)
        .list.set_intersection(stop_lit).list.len().cast(pl.Int64),
    )
    nw, nl = pl.col("n_words"), pl.col("n_lines")
    fail = (
        (nw < GOPHERQ_MIN_WORDS) | (nw > GOPHERQ_MAX_WORDS)
        | ((nw > 0)
           & ((pl.col("word_chars") < GOPHERQ_MIN_WORD_LEN * nw)
              | (pl.col("word_chars") > GOPHERQ_MAX_WORD_LEN * nw)))
        | ((nw > 0)
           & (100 * (pl.col("n_hash") + pl.col("n_ellipsis"))
              > GOPHERQ_SYMBOL_PCT * nw))
        | ((nl > 0)
           & (100 * pl.col("n_bullet_lines") > GOPHERQ_BULLET_PCT * nl))
        | ((nl > 0)
           & (100 * pl.col("n_ellipsis_lines")
              > GOPHERQ_ELLIPSIS_PCT * nl))
        | ((nw > 0)
           & (100 * pl.col("n_alpha_words") < GOPHERQ_ALPHA_PCT * nw))
        | (pl.col("n_stop_hits") < GOPHERQ_MIN_STOP))
    return out.with_columns(q_flag=fail.cast(pl.Int64)).to_arrow()


def gopher_quality_documents(sf_dir: str):
    """(doc_id, n_words, word_chars, n_alpha_words, n_hash, n_ellipsis,
    n_lines, n_bullet_lines, n_ellipsis_lines, n_stop_hits, q_flag):
    the Gopher QUALITY filter (Rae et al. 2021 §A1.1) — the
    non-repetition rules complementing gopher_repetition_documents'
    duplicate-mass signals. q_flag=1 means the document fails at least
    one rule (word-count bounds, mean-word-length bounds, symbol
    ratio, bullet/ellipsis line fractions, alpha-word fraction, <2
    stop words). Zero shuffle: every signal is a function of one
    document row, so the whole operator is one vectorized
    map_batches — at 100 TB this runs embarrassingly parallel at
    whatever the read throughput gives."""
    docs = _docs(sf_dir, columns=["doc_id", "text"])
    return docs.map_batches(_gopher_quality_batch,
                            batch_format="pyarrow",
                            zero_copy_batch=True)


def source_token_fertility(sf_dir: str):
    """(source, n_docs, n_ws_tokens, n_bpe_tokens, n_chars,
    bpe_per_ws_milli, bpe_per_100_chars): tokenizer-fertility audit by
    source — how many BPE-ish pre-tokens (spec.BPE_TOKEN_PATTERN) a
    source costs per whitespace token and per 100 chars. The number a
    mixture planner multiplies into its token budget before choosing
    per-source sampling rates (cf. source_mixture_weights). Per-batch
    polars partials reduce the exchange to one row per (batch, source);
    the final groupby is #sources-sized. Integer ratios (-1 when the
    denominator is 0) keep the DuckDB twin bit-identical."""
    from ray.data.aggregate import Sum

    from dataquality_ray.spec import BPE_TOKEN_PATTERN, WS_TOKEN_PATTERN

    ds = _docs(sf_dir, columns=["doc_id", "source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.DataFrame({
            "source": pl.from_arrow(batch["source"]),
            "ws": pl.from_arrow(batch["text"])
            .str.count_matches(WS_TOKEN_PATTERN).cast(pl.Int64),
            "bpe": pl.from_arrow(batch["text"]).str.to_lowercase()
            .str.count_matches(BPE_TOKEN_PATTERN).cast(pl.Int64),
            "c": pl.from_arrow(pc.cast(pc.utf8_length(batch["text"]),
                                       pa.int64())),
        })
        g = df.group_by("source").agg(
            n_docs=pl.len().cast(pl.Int64),
            ws=pl.col("ws").sum(), bpe=pl.col("bpe").sum(),
            c=pl.col("c").sum())
        return g.to_arrow()

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("source").aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("ws", alias_name="ws"),
            Sum("bpe", alias_name="bpe"),
            Sum("c", alias_name="c"))

    def finish(t: pa.Table) -> pa.Table:
        ws = t["ws"].to_numpy(zero_copy_only=False).astype(np.int64)
        bpe = t["bpe"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "source": t["source"],
            "n_docs": pc.cast(t["n_docs"], pa.int64()),
            "n_ws_tokens": pa.array(ws),
            "n_bpe_tokens": pa.array(bpe),
            "n_chars": pa.array(c),
            "bpe_per_ws_milli": pa.array(
                np.where(ws > 0, 1000 * bpe // np.maximum(ws, 1), -1)),
            "bpe_per_100_chars": pa.array(
                np.where(c > 0, 100 * bpe // np.maximum(c, 1), -1)),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


# C4-style line-level cleaning (Raffel et al. 2020 §2.2 — the public
# C4 heuristics: keep lines that end in terminal punctuation and carry
# at least 3 words, drop javascript boilerplate lines, flag pages with
# 'lorem ipsum' / '{' / too few surviving lines). Integer constants
# interpolated into the DuckDB twin — change here moves both engines.
C4_MIN_LINE_WORDS = 3
C4_MIN_KEPT_LINES = 5
C4_LINE_BLACKLIST = "javascript"
C4_PAGE_PHRASE = "lorem ipsum"


def _c4_line_batch(batch: pa.Table) -> pa.Table:
    """Per-document C4 line filter, entirely batch-local (one doc = one
    row, explode/agg never crosses rows of another doc in a different
    batch because the doc's lines all come from its own row). Counting
    conventions pinned cross-engine: lines are raw split on '\\n'
    trimmed with the pinned charset ' \\t\\r\\n' on both sides (same as
    the sentence-dedup trim, CLAUDE.md); words are spec.WS_TOKEN_PATTERN
    matches; the terminal-punctuation test is four literal ends_with
    checks; blacklist/page-phrase tests are lower() literal contains.
    Reference analog: the skip/cleanup gates of metadata.py:33-114
    re-expressed as the published C4 line rules."""
    from dataquality_ray.spec import WS_TOKEN_PATTERN

    df = pl.from_arrow(batch.select(["doc_id", "text"])) \
        .with_columns(text=pl.col("text").fill_null(""))
    ln = (df.select("doc_id",
                    l=pl.col("text").str.split("\n"))
          .explode("l")
          .with_columns(t=pl.col("l").str.strip_chars(" \t\r\n")))
    t = pl.col("t")
    ln = ln.with_columns(
        js=t.str.to_lowercase()
        .str.contains(C4_LINE_BLACKLIST, literal=True),
        term=(t.str.ends_with(".") | t.str.ends_with("!")
              | t.str.ends_with("?") | t.str.ends_with('"')),
        nw=t.str.count_matches(WS_TOKEN_PATTERN).cast(pl.Int64))
    ln = ln.with_columns(
        keep=(pl.col("term") & ~pl.col("js")
              & (pl.col("nw") >= C4_MIN_LINE_WORDS)))
    # flags first, plain sums second (polars fast-path rule, CLAUDE.md)
    agg = (ln.group_by("doc_id", maintain_order=True)
           .agg(n_lines=pl.len().cast(pl.Int64),
                n_kept_lines=pl.col("keep").cast(pl.Int64).sum(),
                n_js_lines=pl.col("js").cast(pl.Int64).sum(),
                clean_text=pl.col("t").filter(pl.col("keep"))
                .str.join("\n")))
    out = (df.select("doc_id", "text").join(agg, on="doc_id", how="left")
           .with_columns(clean_text=pl.col("clean_text").fill_null(""))
           .with_columns(
               clean_chars=pl.col("clean_text").str.len_chars()
               .cast(pl.Int64),
               page_flag=(pl.col("text").str.to_lowercase()
                          .str.contains(C4_PAGE_PHRASE, literal=True)
                          | pl.col("text").str.contains("{",
                                                        literal=True)
                          | (pl.col("n_kept_lines")
                             < C4_MIN_KEPT_LINES)).cast(pl.Int64)))
    return out.select("doc_id", "n_lines", "n_kept_lines", "n_js_lines",
                      "clean_chars", "page_flag",
                      "clean_text").to_arrow()


def c4_line_filtered_documents(sf_dir: str):
    """(doc_id, n_lines, n_kept_lines, n_js_lines, clean_chars,
    page_flag, clean_text): C4-style line-level cleaning (Raffel et
    al. 2020) — per-line terminal-punctuation / min-words /
    javascript-blacklist rules producing the cleaned text plus the
    page-level discard flag ('lorem ipsum', '{', <5 surviving lines).
    Zero shuffle: every rule is a function of one document row, so the
    operator is a single vectorized map_batches and scales at read
    throughput on 100 TB."""
    docs = _docs(sf_dir, columns=["doc_id", "text"])
    return docs.map_batches(_c4_line_batch, batch_format="pyarrow",
                            zero_copy_batch=True)


# Unicode hygiene / mojibake audit thresholds. The artifact test is the
# classic UTF-8-read-as-Latin-1 signature (a 'Ã' codepoint appearing in
# text); the control-char class excludes tab/newline/CR. Interpolated
# into the DuckDB twin — change here moves both engines.
MOJI_NONASCII_PCT = 20           # flag if >20% of chars are non-ASCII
MOJI_CTRL_CLASS = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"
MOJI_NONASCII_CLASS = r"[^\x00-\x7f]"


def _mojibake_batch(batch: pa.Table) -> pa.Table:
    """Per-document unicode hygiene signals, batch-local and zero
    shuffle. Char classes are quote-free ASCII hex ranges so the same
    pattern string runs in Rust regex (polars) and RE2 (DuckDB) with
    identical per-codepoint semantics; the replacement-char and
    Latin-1-artifact counts are literal counts (DuckDB replace-length
    trick on single-char needles). NULL text behaves like ''."""
    df = pl.from_arrow(batch.select(["doc_id", "text"])) \
        .with_columns(text=pl.col("text").fill_null(""))
    t = pl.col("text")
    out = df.select(
        "doc_id",
        n_chars=t.str.len_chars().cast(pl.Int64),
        n_nonascii=t.str.count_matches(MOJI_NONASCII_CLASS)
        .cast(pl.Int64),
        n_ctrl=t.str.count_matches(MOJI_CTRL_CLASS).cast(pl.Int64),
        n_repl=t.str.count_matches("�", literal=True)
        .cast(pl.Int64),
        n_latin_artifact=t.str.count_matches("Ã", literal=True)
        .cast(pl.Int64),
    )
    flag = ((pl.col("n_repl") > 0) | (pl.col("n_ctrl") > 0)
            | (pl.col("n_latin_artifact") > 0)
            | ((pl.col("n_chars") > 0)
               & (100 * pl.col("n_nonascii")
                  > MOJI_NONASCII_PCT * pl.col("n_chars"))))
    return out.with_columns(moji_flag=flag.cast(pl.Int64)).to_arrow()


def mojibake_documents(sf_dir: str):
    """(doc_id, n_chars, n_nonascii, n_ctrl, n_repl, n_latin_artifact,
    moji_flag): unicode hygiene / mojibake audit — replacement chars
    (U+FFFD), stray control chars, UTF-8-as-Latin-1 artifacts ('Ã'),
    and a non-ASCII density bound. The encoding-health gate a web-scale
    ingest runs before any tokenizer sees the text (CCNet/RefinedWeb
    keep an equivalent). Zero shuffle: one vectorized map_batches,
    scales at read throughput."""
    docs = _docs(sf_dir, columns=["doc_id", "text"])
    return docs.map_batches(_mojibake_batch, batch_format="pyarrow",
                            zero_copy_batch=True)


# Per-document tokenizer-compression gate (FineWeb-style fertility
# filter): documents whose chars-per-BPE-pre-token ratio falls outside
# these integer-milli bounds are flagged — too LOW means symbol soup /
# binary junk (every char its own token), too HIGH means pathological
# run-on tokens. Interpolated into the DuckDB twin.
COMPRESS_MIN_CPT_MILLI = 2000    # < 2.0 chars/token → symbol soup
COMPRESS_MAX_CPT_MILLI = 12000   # > 12.0 chars/token → run-on junk


def _compression_gate_batch(batch: pa.Table) -> pa.Table:
    """Per-document fertility signals, batch-local (the per-doc twin of
    source_token_fertility's per-source rollup — identical
    tokenization conventions: BPE pre-tokens on lowercased text via
    spec.BPE_TOKEN_PATTERN, whitespace tokens on raw text, char count
    exact). cpt_milli = 1000*n_chars//n_bpe_tokens, -1 when the doc has
    no tokens (empty/null text) — and tokenless docs are flagged."""
    from dataquality_ray.spec import BPE_TOKEN_PATTERN, WS_TOKEN_PATTERN

    df = pl.from_arrow(batch.select(["doc_id", "text"])) \
        .with_columns(text=pl.col("text").fill_null(""))
    t = pl.col("text")
    out = df.select(
        "doc_id",
        n_chars=t.str.len_chars().cast(pl.Int64),
        n_ws_tokens=t.str.count_matches(WS_TOKEN_PATTERN)
        .cast(pl.Int64),
        n_bpe_tokens=t.str.to_lowercase()
        .str.count_matches(BPE_TOKEN_PATTERN).cast(pl.Int64),
    )
    bpe = pl.col("n_bpe_tokens")
    cpt = (pl.when(bpe > 0)
           .then(1000 * pl.col("n_chars") // bpe)
           .otherwise(-1).cast(pl.Int64))
    out = out.with_columns(cpt_milli=cpt)
    flag = ((pl.col("cpt_milli") < COMPRESS_MIN_CPT_MILLI)
            | (pl.col("cpt_milli") > COMPRESS_MAX_CPT_MILLI))
    return out.with_columns(compress_flag=flag.cast(pl.Int64)) \
        .to_arrow()


def doc_compression_gate(sf_dir: str):
    """(doc_id, n_chars, n_ws_tokens, n_bpe_tokens, cpt_milli,
    compress_flag): per-document tokenizer-compression gate — the
    FineWeb-style fertility filter that drops documents whose
    chars-per-token ratio says 'symbol soup' or 'run-on junk' before
    any model-scoring stage spends compute on them. Zero shuffle: one
    vectorized map_batches; the per-source rollup lives in
    source_token_fertility."""
    docs = _docs(sf_dir, columns=["doc_id", "text"])
    return docs.map_batches(_compression_gate_batch,
                            batch_format="pyarrow",
                            zero_copy_batch=True)


# BM25 retrieval constants. All-integer BM25: k1=1.2 and b=0.75 as
# milli constants; idf is the exact floor of the RSJ ratio
# 1000*(N-df+0.5)/(df+0.5) computed as (1000*(2N-2df+1))//(2df+1) —
# no transcendental, so the DuckDB twin is bit-identical — capped so
# the int64 products stay in range; tf saturates at BM25_TF_CAP (BM25
# saturates in tf anyway, and the cap bounds the product at a 10^7-
# token pathological doc). Interpolated into the oracle.
BM25_QUERY_TERMS = SEARCH_TERMS          # ("data", "join", "stream")
BM25_K1_MILLI = 1200
BM25_B_MILLI = 750
BM25_IDF_CAP_MILLI = 1_000_000
BM25_TF_CAP = 10_000
BM25_TOPK = 20


def bm25_top_docs(sf_dir: str):
    """(doc_id, dl, n_terms_hit, score_milli): BM25 top-K retrieval
    over the documents table for the fixed BM25_QUERY_TERMS query —
    the lexical-IR counterpart to ann_topk_embeddings' vector search.
    score_milli is the integer-milli BM25 score (per-term floored,
    summed exactly — order-free), K = BM25_TOPK, ties broken by
    doc_id ASC.

    Scale shape (two passes, no corpus-wide shuffle):
    1. STATS: per-batch partials reduce to ONE slim row per batch
       (n_docs, n_tokens, df per query term — |Q| fixed columns);
       the global fold is a tiny driver-side sum over #batches rows.
    2. SCORE: the three scalars broadcast into a batch-local
       vectorized scorer (tf via token-list count, all int64 with
       caps); only matching docs (score > 0) survive the batch.
    3. TOP-K: per-batch local top-K, then one single-partition final
       top-K over #batches*K slim rows — never a global sort.
    At 100 TB both passes stream at read throughput; the exchange is
    #batches rows for stats and #batches*K rows for the reduce.
    Reference analog: the corpus-lookup / max-similarity surfaces
    (metadata.py:514-624) re-grounded in lexical retrieval."""
    import numpy as np
    from dataquality_ray.spec import TOKEN_PATTERN

    terms = list(BM25_QUERY_TERMS)
    docs = _docs(sf_dir, columns=["doc_id", "text"])

    def stats_partial(batch: pa.Table) -> pa.Table:
        d = pl.from_arrow(batch.select(["text"])) \
            .with_columns(toks=pl.col("text").fill_null("")
                          .str.to_lowercase()
                          .str.extract_all(TOKEN_PATTERN))
        cols = {
            "n_docs": pl.len().cast(pl.Int64),
            "n_tokens": pl.col("toks").list.len().cast(pl.Int64).sum(),
        }
        for i, t in enumerate(terms):
            cols[f"df_{i}"] = (pl.col("toks").list.contains(t)
                               .cast(pl.Int64).sum())
        return d.select(**cols).to_arrow()

    st = stats_partial  # stats rows: one per batch, folded on driver
    parts = docs.map_batches(st, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
    n_docs = int(parts["n_docs"].sum())
    n_tokens = int(parts["n_tokens"].sum())
    dfs = [int(parts[f"df_{i}"].sum()) for i in range(len(terms))]

    k1m, bm = BM25_K1_MILLI, BM25_B_MILLI
    idf = [min((1000 * (2 * n_docs - 2 * d + 1)) // (2 * d + 1),
               BM25_IDF_CAP_MILLI) if d > 0 else 0 for d in dfs]

    def score(batch: pa.Table) -> pa.Table:
        d = pl.from_arrow(batch.select(["doc_id", "text"])) \
            .with_columns(toks=pl.col("text").fill_null("")
                          .str.to_lowercase()
                          .str.extract_all(TOKEN_PATTERN))
        exprs = {"dl": pl.col("toks").list.len().cast(pl.Int64)}
        for i, t in enumerate(terms):
            exprs[f"tf_{i}"] = (pl.col("toks").list.count_matches(t)
                                .cast(pl.Int64))
        d = d.select("doc_id", **exprs)
        dl = d["dl"].to_numpy().astype(np.int64)
        rel_dl = np.where(n_tokens > 0,
                          1000 * dl * n_docs // max(n_tokens, 1), 0)
        denom_base = (k1m * (1000 - bm)
                      + (k1m * bm * rel_dl) // 1000)
        total = np.zeros(len(dl), dtype=np.int64)
        hits = np.zeros(len(dl), dtype=np.int64)
        for i in range(len(terms)):
            tf = np.minimum(d[f"tf_{i}"].to_numpy().astype(np.int64),
                            BM25_TF_CAP)
            num = idf[i] * tf * (k1m + 1000) * 1000
            den = 1_000_000 * tf + denom_base
            total += np.where(tf > 0, num // den, 0)
            hits += (tf > 0).astype(np.int64)
        out = pa.table({
            "doc_id": d["doc_id"].to_arrow(),
            "dl": pa.array(dl),
            "n_terms_hit": pa.array(hits),
            "score_milli": pa.array(total),
        })
        return out.filter(pc.greater(out["score_milli"], 0))

    def topk(t: pa.Table) -> pa.Table:
        d = pl.from_arrow(t).sort(
            ["score_milli", "doc_id"], descending=[True, False])
        return d.head(BM25_TOPK).to_arrow()

    return (docs.map_batches(score, batch_format="pyarrow",
                             zero_copy_batch=True)
            .map_batches(topk, batch_format="pyarrow")
            .repartition(1)
            .map_batches(topk, batch_format="pyarrow"))


# Winnowing fingerprint constants (Schleimer, Wilkerson, Aiken 2003 —
# "Winnowing: Local Algorithms for Document Fingerprinting", the MOSS
# algorithm). K tokens per k-gram, window of W consecutive k-gram
# hashes; the fingerprint set is the DISTINCT window minima (the
# deterministic, SQL-expressible formulation — winnowing's guarantee
# that every match of length >= W+K-1 tokens shares a fingerprint
# holds for it). DF-capped per the CLAUDE.md hot-posting invariant.
WINNOW_K = 4
WINNOW_W = 5
WINNOW_DF_CAP = 64
WINNOW_MIN_SHARED = 2


def winnow_dup_pairs(sf_dir: str, num_buckets: int = 0):
    """(doc_a, doc_b, n_shared): MOSS-style winnowing near-dup pairs —
    documents sharing >= WINNOW_MIN_SHARED winnowed fingerprints
    (distinct window minima of md5-u64 k-gram hashes). Positional
    fingerprinting catches long verbatim spans that token-set MinHash
    dilutes away, at ~2/(W+1) of the k-gram index cost.

    Scale shape (the conv_near_dup_pairs topology): window minima are
    computed batch-locally (one numpy sliding-window min across the
    whole batch, doc boundaries masked); the exchange ships slim
    (fingerprint-bucket, doc_id, u64) rows; each fingerprint lives in
    exactly ONE bucket, so the df-cap (> WINNOW_DF_CAP distinct docs
    -> boilerplate, dropped — the measured 4.19e9-pair lesson) and the
    vectorized triu pair expansion complete locally; pair partials
    then sum in pair-hash buckets (never a corpus-proportional Ray
    aggregate). Reference analog: the pairwise near-dup surface
    (metadata.py:514-624) re-grounded in positional fingerprints."""
    from numpy.lib.stride_tricks import sliding_window_view

    from dataquality_ray.spec import token_hash_u64
    from dataquality_ray.stages.bucketing import cluster_buckets

    nb = num_buckets or cluster_buckets(minimum=16)
    docs = _docs(sf_dir, columns=["doc_id", "text"])

    def fingerprints(batch: pa.Table) -> pa.Table:
        s = pl.from_arrow(batch["text"])
        if isinstance(s, pl.DataFrame):
            s = s.to_series()
        toks = s.fill_null("").str.to_lowercase() \
            .str.extract_all(TOKEN_PATTERN)
        expr = pl.element()
        for j in range(1, WINNOW_K):
            expr = expr + " " + pl.element().shift(-j)
        grams = toks.list.eval(expr.drop_nulls())
        did_t = batch.schema.field("doc_id").type
        df = (pl.DataFrame({
            "doc_id": pl.from_arrow(batch["doc_id"]),
            "g": grams,
        }).with_row_index("rid").explode("g").drop_nulls("g"))
        empty = pa.table({
            "fb": pa.array([], pa.int32()),
            "doc_id": pa.array([], did_t),
            "fp": pa.array([], pa.uint64()),
        })
        if len(df) < WINNOW_W:
            return empty
        # frozen md5-u64 hash once per unique k-gram (dictionary lut)
        enc = df["g"].to_arrow().dictionary_encode()
        lut = np.fromiter(
            (token_hash_u64(u) for u in enc.dictionary.to_pylist()),
            dtype=np.uint64, count=len(enc.dictionary))
        h = lut[enc.indices.to_numpy(zero_copy_only=False)]
        rid = df["rid"].to_numpy().astype(np.int64)
        # one sliding-window min across the batch; windows that cross
        # a document boundary are masked out (rows are contiguous and
        # in token order per doc after explode)
        mins = sliding_window_view(h, WINNOW_W).min(axis=1)
        valid = rid[:len(mins)] == rid[WINNOW_W - 1:]
        fps = (pl.DataFrame({
            "doc_id": df["doc_id"].gather(
                np.flatnonzero(valid)),
            "fp": mins[valid],
        }).unique())
        if not len(fps):
            return empty
        fp = fps["fp"].to_numpy()
        return pa.table({
            "fb": pa.array((fp % np.uint64(nb)).astype(np.int32)),
            "doc_id": fps["doc_id"].to_arrow().cast(did_t),
            "fp": pa.array(fp),
        })

    def pairs_local(g: pa.Table) -> pa.Table:
        did_t = g.schema.field("doc_id").type
        df = (pl.from_arrow(g.select(["doc_id", "fp"]))
              .unique(["doc_id", "fp"]))
        df = (df.with_columns(m=pl.len().over("fp"))
              .filter((pl.col("m") >= 2)
                      & (pl.col("m") <= WINNOW_DF_CAP)))
        out_schema = pa.schema([
            ("pb", pa.int32()), ("doc_a", did_t),
            ("doc_b", did_t), ("c", pa.int64())])
        if not len(df):
            return out_schema.empty_table()
        # dense codes in the doc_id's natural order (utf-8 byte order
        # == code-point order == DuckDB's binary collation on strings;
        # numeric order on ints), then the one-gather triu expansion
        df = df.with_columns(
            code=(pl.col("doc_id").rank("dense") - 1).cast(pl.Int64))
        uniq = (df.select(["code", "doc_id"]).unique()
                .sort("code")["doc_id"].to_numpy())
        posts = df.group_by("fp").agg(pl.col("code").sort().alias("cs"))
        sizes = posts["cs"].list.len().to_numpy().astype(np.int64)
        flat = posts["cs"].explode().to_numpy().astype(np.int64)
        starts = np.zeros(len(sizes) + 1, dtype=np.int64)
        np.cumsum(sizes, out=starts[1:])
        a_parts, b_parts = [], []
        for m in np.unique(sizes):
            sel = np.flatnonzero(sizes == m)
            mat = flat[starts[sel][:, None] + np.arange(m)]
            iu, ju = np.triu_indices(int(m), 1)
            a_parts.append(mat[:, iu].ravel())
            b_parts.append(mat[:, ju].ravel())
        a_all = np.concatenate(a_parts)
        b_all = np.concatenate(b_parts)
        nq = np.int64(len(uniq))
        key, cnt = np.unique(a_all * nq + b_all, return_counts=True)
        from dataquality_ray.spec import token_hash_u64 as _th
        da, db = uniq[(key // nq)], uniq[(key % nq)]
        pb = np.fromiter(
            (_th(f"{a}|{b}") % nb for a, b in zip(da, db)),
            dtype=np.int32, count=len(key))
        return pa.table({
            "pb": pa.array(pb),
            "doc_a": pa.array(da.tolist(), did_t),
            "doc_b": pa.array(db.tolist(), did_t),
            "c": pa.array(cnt.astype(np.int64)),
        })

    def merge(g: pa.Table) -> pa.Table:
        did_t = g.schema.field("doc_a").type
        df = (pl.from_arrow(g.select(["doc_a", "doc_b", "c"]))
              .group_by(["doc_a", "doc_b"])
              .agg(n_shared=pl.col("c").sum().cast(pl.Int64))
              .filter(pl.col("n_shared") >= WINNOW_MIN_SHARED))
        return df.to_arrow().cast(pa.schema([
            ("doc_a", did_t), ("doc_b", did_t),
            ("n_shared", pa.int64())]))

    parts = (docs.map_batches(fingerprints, batch_format="pyarrow",
                              zero_copy_batch=True)
             .groupby("fb")
             .map_groups(pairs_local, batch_format="pyarrow")
             .materialize())
    return (parts.groupby("pb")
            .map_groups(merge, batch_format="pyarrow"))


# --- privacy: k-anonymity audit over quasi-identifiers ------------------

K_ANON = 10          # minimum group size for a QI cell to be releasable


def _bit_length_i64(v: np.ndarray) -> np.ndarray:
    """Exact bit length per element (0 for v <= 0) — integer shifts
    only (never a float log2: exactness rule, CLAUDE.md)."""
    pos = v > 0
    w = np.where(pos, v, 1).astype(np.uint64)
    bl = np.zeros(len(w), dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        big = w >= np.uint64(1 << shift)
        bl[big] += shift
        w[big] >>= np.uint64(shift)
    bl += 1
    bl[~pos] = 0
    return bl


def k_anonymity_documents(sf_dir: str):
    """(lang, source, len_bucket, group_size, k_anonymous): k-anonymity
    audit over the released metadata columns — the quasi-identifier is
    (lang, source, log2-length bucket); a cell with fewer than K_ANON
    members re-identifies its docs and must be suppressed or coarsened
    before the metadata ships with a public corpus (Sweeney 2002 rule,
    applied at dataset-card grain). len_bucket is the exact bit length
    of n_chars (0 for empty docs) — integer shifts, no float log.

    Shape: per-batch polars partial counts over the bounded QI grid
    (|langs| x |sources| x <=64 buckets), one constant-size groupby —
    nothing corpus-proportional ever shuffles."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, columns=["lang", "source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        lb = _bit_length_i64(
            batch["n_chars"].to_numpy(zero_copy_only=False))
        g = (pl.DataFrame({
            "lang": pl.from_arrow(batch["lang"]),
            "source": pl.from_arrow(batch["source"]),
            "len_bucket": pl.Series(lb),
        }).group_by(["lang", "source", "len_bucket"])
            .agg(n=pl.len().cast(pl.Int64)))
        return g.to_arrow()

    def flag(batch: pa.Table) -> pa.Table:
        n = batch["group_size"]
        return batch.append_column(
            "k_anonymous", pc.greater_equal(n, K_ANON))

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["lang", "source", "len_bucket"])
            .aggregate(Sum("n", alias_name="group_size"))
            .map_batches(flag, batch_format="pyarrow"))


# --- mixtures: data-constrained repetition (epoch) planning -------------

EPOCH_BUDGET_MULT = 2   # token budget = MULT x total corpus chars
MAX_EPOCHS = 4          # repetition ceiling (data-constrained rule)


def epoch_plan_by_source(sf_dir: str):
    """(source, sum_chars, alloc_chars, epochs, achieved_chars,
    shortfall_chars): data-constrained repetition plan (Muennighoff et
    al. 2023) — give each source its sqrt-weight share of a budget of
    EPOCH_BUDGET_MULT x the corpus size, then answer "how many EPOCHS
    of this source do we run, and how much of its allocation can
    repetition actually fill under the MAX_EPOCHS ceiling?".
    alloc = (MULT * total * sq) // sum(sq) with the proven
    floor(sqrt(chars * SCALE)) weight recipe; epochs =
    min(MAX_EPOCHS, ceil(alloc / chars)); shortfall is the allocation
    repetition cannot cover (re-allocate it to unconstrained sources).

    All arithmetic is EXACT: the per-source aggregate is constant-size,
    and the plan math runs in Python big ints on the driver (its DuckDB
    twin uses HUGEINT), so the MULT*total*sq product can exceed int64
    without either engine overflowing.

    Shape: the source_mixture_weights two-phase front half (per-batch
    partials -> |sources|-row groupby); plan math touches only that."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, columns=["source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        g = (pl.DataFrame({
            "source": pl.from_arrow(batch["source"]),
            "c": pl.from_arrow(batch["n_chars"]),
        }).group_by("source")
            .agg(c=pl.col("c").sum().cast(pl.Int64)))
        return g.to_arrow().cast(pa.schema([
            ("source", pa.string()), ("c", pa.int64())]))

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("source")
           .aggregate(Sum("c", alias_name="sum_chars"))
           .to_pandas())       # |sources| rows — constant-size result
    agg = agg.sort_values("source").reset_index(drop=True)

    chars = [int(c) for c in agg["sum_chars"]]
    sq = [int(np.floor(np.sqrt(c * float(MIXTURE_SQRT_SCALE))))
          for c in chars]
    tot_c, tot_sq = sum(chars), max(sum(sq), 1)
    alloc = [(EPOCH_BUDGET_MULT * tot_c * s) // tot_sq for s in sq]
    epochs = [0 if c == 0 else min(MAX_EPOCHS, (a + c - 1) // c)
              for a, c in zip(alloc, chars)]
    achieved = [min(a, e * c) for a, e, c in zip(alloc, epochs, chars)]
    return pa.table({
        "source": pa.array(agg["source"].tolist(), pa.string()),
        "sum_chars": pa.array(chars, pa.int64()),
        "alloc_chars": pa.array(alloc, pa.int64()),
        "epochs": pa.array(epochs, pa.int64()),
        "achieved_chars": pa.array(achieved, pa.int64()),
        "shortfall_chars": pa.array(
            [a - g for a, g in zip(alloc, achieved)], pa.int64()),
    })


# --- output layout: balanced training-shard assignment ------------------

N_SHARDS = 16   # training shards the writer round-robins ranks into


def shard_plan_documents(sf_dir: str):
    """(shard, n_docs, sum_chars, max_chars, min_chars): balanced
    training-shard plan — rank every doc by (n_chars DESC, doc_id ASC)
    and deal ranks round-robin into N_SHARDS (the classic longest-first
    dealing rule: shard char totals end up within one max-doc of each
    other, unlike hash sharding which inherits the length skew). The
    output is the 16-row balance evidence table a writer consults
    before emitting one file per shard.

    Shape: exact global ranks WITHOUT a global sort — the
    doc_quality_deciles histogram-rank pattern over the bounded
    n_chars domain: a tiny per-length count aggregate gives each
    length its global start offset; one shuffle on n_chars ranks rows
    locally by doc_id; per-group partials fold into the 16-row plan.
    Hot lengths sub-bucket by doc_id range at 100 TB (same pattern one
    level down, documented at doc_quality_deciles)."""
    from ray.data.aggregate import Max, Min, Sum

    slim = _docs(sf_dir, columns=["doc_id", "n_chars"]).materialize()

    def hist_partial(batch: pa.Table) -> pa.Table:
        v = batch["n_chars"].to_numpy(zero_copy_only=False)
        vals, cnt = np.unique(v, return_counts=True)
        return pa.table({"n_chars": pa.array(vals.astype(np.int64)),
                         "n": pa.array(cnt.astype(np.int64))})

    hist = slim.map_batches(hist_partial, batch_format="pyarrow") \
        .groupby("n_chars").aggregate(Sum("n", alias_name="n")) \
        .to_pandas().sort_values("n_chars", ascending=False)
    counts = hist["n"].to_numpy(dtype=np.int64)
    lens = hist["n_chars"].to_numpy(dtype=np.int64)
    offsets = dict(zip(lens.tolist(),
                       (np.cumsum(counts) - counts).tolist()))

    def shard_group(t: pa.Table) -> pa.Table:
        ids = np.sort(t["doc_id"].to_numpy(zero_copy_only=False))
        c = int(t["n_chars"][0].as_py())
        rank0 = offsets[c] + np.arange(len(ids), dtype=np.int64)
        sh = rank0 % N_SHARDS
        g = (pl.DataFrame({"shard": pl.Series(sh),
                           "c": pl.Series(np.full(len(ids), c,
                                                  dtype=np.int64))})
             .group_by("shard")
             .agg(n=pl.len().cast(pl.Int64),
                  sc=pl.col("c").sum(),
                  mx=pl.col("c").max(),
                  mn=pl.col("c").min()))
        return g.to_arrow()

    return (slim.groupby("n_chars")
            .map_groups(shard_group, batch_format="pyarrow")
            .groupby("shard")
            .aggregate(Sum("n", alias_name="n_docs"),
                       Sum("sc", alias_name="sum_chars"),
                       Max("mx", alias_name="max_chars"),
                       Min("mn", alias_name="min_chars")))


# --- ANN compression: product quantization (PQ codes + ADC top-k) -------

PQ_SUB = 4    # subspaces (dim must divide evenly)
PQ_K = 16     # codebook entries per subspace: the vectors vec_id < PQ_K


def _pq_quantize(mat: np.ndarray) -> np.ndarray:
    """The proven int8 recipe (int8_ann_embeddings): clamp-floor at
    INT8_SCALE — identical on both engines, so every downstream dot
    product is EXACT integer arithmetic."""
    return np.clip(np.floor(mat.astype(np.float64) * INT8_SCALE),
                   -127, 127).astype(np.int64)


def _pq_codebook(sf_dir: str):
    """(codebook[s][k][sd] int64, sub_dim) from the PQ_K seed vectors —
    deterministic, seed-free (smallest vec_ids), like KMEANS_K init."""
    emb = _emb(sf_dir)
    first = emb.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], PQ_K)),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    first = first.sort_values("vec_id")
    mat = _pq_quantize(np.stack([np.asarray(v, np.float64)
                                 for v in first["embedding"]]))
    dim = mat.shape[1]
    assert dim % PQ_SUB == 0, (dim, PQ_SUB)
    sd = dim // PQ_SUB
    return mat.reshape(PQ_K, PQ_SUB, sd).transpose(1, 0, 2).copy(), sd


def _pq_codes_batch(batch: pa.Table, cb: np.ndarray, sd: int):
    """codes (n, PQ_SUB) + best int dot (n, PQ_SUB) for one batch —
    argmax of exact integer dots, ties -> smallest code id (np.argmax
    picks the first maximum)."""
    e = batch["embedding"]
    if isinstance(e, pa.ChunkedArray):
        e = e.combine_chunks()
    mat = np.asarray(e.flatten(), dtype=np.float64) \
        .reshape(len(batch), PQ_SUB * sd)
    q = _pq_quantize(mat).reshape(-1, PQ_SUB, sd)
    codes = np.empty((len(batch), PQ_SUB), dtype=np.int64)
    dots = np.empty((len(batch), PQ_SUB), dtype=np.int64)
    for s in range(PQ_SUB):
        d = q[:, s, :] @ cb[s].T          # (n, PQ_K) exact int64
        codes[:, s] = np.argmax(d, axis=1)
        dots[:, s] = d[np.arange(len(d)), codes[:, s]]
    return codes, dots


def pq_codes_embeddings(sf_dir: str):
    """(vec_id, subspace, code, int_dot): product-quantization codes —
    the FAISS-IVFPQ compression path for 100-TB ANN: each int8 vector
    splits into PQ_SUB contiguous subvectors and each subvector is
    replaced by the id of its nearest codebook entry (4 bytes/vector
    here vs 64 floats), with int_dot the exact integer dot against the
    chosen entry. Codebook = the PQ_K smallest-vec_id vectors
    (deterministic, seed-free); nearest = max EXACT int8 dot product
    (the int8_ann recipe — no float ties anywhere), ties -> smallest
    code id.

    Shape: codebook broadcast once via ray.put; one stateless
    map_batches emits the long-form code table — zero shuffles."""
    cb, sd = _pq_codebook(sf_dir)
    cb_ref = ray.put(cb)

    def assign(batch: pa.Table) -> pa.Table:
        cbm = ray.get(cb_ref)
        codes, dots = _pq_codes_batch(batch, cbm, sd)
        n = len(batch)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, PQ_SUB)),
            "subspace": pa.array(np.tile(
                np.arange(PQ_SUB, dtype=np.int64), n)),
            "code": pa.array(codes.ravel()),
            "int_dot": pa.array(dots.ravel()),
        })

    return _emb(sf_dir).map_batches(assign, batch_format="pyarrow",
                                    zero_copy_batch=True)


def pq_ann_topk_embeddings(sf_dir: str):
    """(query_id, vec_id, adc_dot, rank): asymmetric-distance ANN over
    the PQ codes — each query's int8 subvectors are dotted against the
    whole codebook ONCE (a PQ_SUB x PQ_K lookup table per query), and
    every corpus vector is scored as the SUM of table entries at its
    codes, never touching the original vector (the PQ memory-bandwidth
    win: 4 table lookups per candidate). Queries = ANN_QUERY_IDS,
    corpus = the rest, top ANN_K by (adc_dot DESC, vec_id ASC) — all
    integer, fully hash-checkable.

    Shape: codebook + LUTs broadcast once; per-batch partial top-k;
    final per-query top-k groupby (driver volume O(|queries| x k))."""
    import pandas as pd

    from dataquality_ray.arrowutil import from_pandas_clean

    cb, sd = _pq_codebook(sf_dir)
    qids = list(ANN_QUERY_IDS)
    emb = _emb(sf_dir)
    qdf = emb.map_batches(
        lambda t: t.filter(pc.is_in(t["vec_id"],
                                    pa.array(qids, pa.int64()))),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    qdf = qdf.sort_values("vec_id")
    qmat = _pq_quantize(np.stack([np.asarray(v, np.float64)
                                  for v in qdf["embedding"]]))
    nq = len(qdf)
    qsub = qmat.reshape(nq, PQ_SUB, sd)
    # lut[s]: (nq, PQ_K) exact int dots of every query subvector
    # against every codebook entry
    lut = np.stack([qsub[:, s, :] @ cb[s].T for s in range(PQ_SUB)])
    state_ref = ray.put((qdf["vec_id"].to_numpy(), lut, cb))
    k = ANN_K

    def score(batch: pa.Table) -> pa.Table:
        qid_a, lt, cbm = ray.get(state_ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        mask = ~np.isin(ids, qid_a)
        if not mask.any():
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "adc_dot": pa.array([], pa.int64())})
        sub = batch.filter(pa.array(mask))
        codes, _ = _pq_codes_batch(sub, cbm, sd)
        cand = ids[mask]
        # ADC: scores[q, i] = sum_s lut[s][q, codes[i, s]]
        scores = np.zeros((len(lt[0]), len(cand)), dtype=np.int64)
        for s in range(PQ_SUB):
            scores += lt[s][:, codes[:, s]]
        out = []
        for j, qid in enumerate(qid_a):
            d = scores[j]
            take = min(k, len(d))
            order = np.lexsort((cand, -d))[:take]
            out.append(pd.DataFrame({
                "query_id": qid, "vec_id": cand[order],
                "adc_dot": d[order]}))
        return from_pandas_clean(pd.concat(out, ignore_index=True))

    def final(df):
        df = df.sort_values(["adc_dot", "vec_id"],
                            ascending=[False, True],
                            kind="mergesort").head(k)
        df = df.reset_index(drop=True)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df

    return emb.map_batches(score, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .groupby("query_id").map_groups(final, batch_format="pandas")


# --- tokenizer planning: vocabulary coverage curve -----------------------

COVERAGE_MAX_K = 16   # curve points: vocab sizes 2^0 .. 2^16
COVERAGE_BUCKETS = 64


def vocab_coverage_curve(sf_dir: str):
    """(k, vocab_size, covered_cf, total_cf, coverage_ppm): the
    tokenizer-planning curve — for vocab sizes 2^0..2^COVERAGE_MAX_K
    (clamped to the true vocabulary), what fraction of corpus token
    mass the top-N terms by (cf DESC, term ASC) cover. The table a
    pipeline reads to pick a vocabulary size / OOV budget before
    training a tokenizer. Tie semantics are exact: terms tied at the
    boundary all share one cf, so the covered mass is
    cum_mass(before) + (N - cum_terms(before)) * boundary_cf
    regardless of which tied terms are "in".

    Shape: per-batch (term, cf) partials -> term-hash bucket shuffle ->
    per-bucket LOCAL term totals (each term lives in exactly one
    bucket) immediately reduced to a (cf, n_terms) histogram -> tiny
    cf-keyed groupby. The vocabulary itself never leaves its bucket,
    and the curve math runs on the bounded histogram on the driver."""
    from ray.data.aggregate import Sum

    from dataquality_ray.spec import token_hash_u64

    ds = _docs(sf_dir, columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        toks = (pl.from_arrow(batch["text"])
                .str.to_lowercase().str.extract_all(TOKEN_PATTERN))
        g = (pl.DataFrame({"term": toks}).explode("term").drop_nulls()
             .group_by("term").agg(cf=pl.len().cast(pl.Int64)))
        tb = np.fromiter(
            (token_hash_u64(t) % COVERAGE_BUCKETS for t in g["term"]),
            dtype=np.int32, count=g.height)
        return g.with_columns(tb=pl.Series(tb)).to_arrow()

    def local_hist(t: pa.Table) -> pa.Table:
        g = (pl.from_arrow(t.select(["term", "cf"]))
             .group_by("term").agg(cf=pl.col("cf").sum()))
        h = g.group_by("cf").agg(nt=pl.len().cast(pl.Int64))
        return h.to_arrow()

    hist = (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("tb").map_groups(local_hist, batch_format="pyarrow")
            .groupby("cf").aggregate(Sum("nt", alias_name="nt"))
            .to_pandas())
    hist = hist.sort_values("cf", ascending=False).reset_index(drop=True)
    cf = hist["cf"].to_numpy(dtype=np.int64)
    nt = hist["nt"].to_numpy(dtype=np.int64)
    cum_t = np.cumsum(nt)
    cum_m = np.cumsum(cf * nt)
    v_total = int(cum_t[-1]) if len(cum_t) else 0
    m_total = int(cum_m[-1]) if len(cum_m) else 0

    ks, vs, cov, ppm = [], [], [], []
    for k in range(COVERAGE_MAX_K + 1):
        vsize = min(1 << k, v_total)
        if v_total == 0:
            covered = 0
        else:
            i = int(np.searchsorted(cum_t, vsize, side="left"))
            covered = int(cum_m[i] - (cum_t[i] - vsize) * cf[i])
        ks.append(k)
        vs.append(vsize)
        cov.append(covered)
        ppm.append(covered * 1_000_000 // max(m_total, 1))
    return pa.table({
        "k": pa.array(ks, pa.int64()),
        "vocab_size": pa.array(vs, pa.int64()),
        "covered_cf": pa.array(cov, pa.int64()),
        "total_cf": pa.array([m_total] * len(ks), pa.int64()),
        "coverage_ppm": pa.array(ppm, pa.int64()),
    })


# --- mixtures: semantic source-similarity matrix -------------------------

def source_centroid_similarity(sf_dir: str):
    """(source_a, source_b, cosine_sim): pairwise cosine between the
    per-source embedding centroids — the SEMANTIC companion to
    source_vocab_overlap's lexical matrix (which sources are
    redundant? which pair should share a mixture weight?). Cosine is
    computed over the EXACT int64 accumulator sums (cosine is
    invariant to the 1/n mean scaling, so the sum vector gives the
    centroid's direction without the milli truncation), with the
    pinned dot-then-divide round-6 recipe and the zero-norm -> 0
    convention.

    Shape: everything after source_embedding_centroids' constant-size
    aggregate is |sources|^2 driver math."""
    df = source_embedding_centroids(sf_dir).to_pandas()
    df = df.sort_values(["source", "dim"])
    sources = sorted(df["source"].unique().tolist())
    dim = int(df["dim"].max()) + 1 if len(df) else 0
    m = df["sum_acc"].to_numpy(dtype=np.float64).reshape(
        len(sources), dim)
    norms = np.sqrt(np.einsum("ij,ij->i", m, m))
    sa, sb, cs = [], [], []
    for i in range(len(sources)):
        for j in range(i + 1, len(sources)):
            if norms[i] == 0 or norms[j] == 0:
                c = 0.0
            else:
                c = float(np.dot(m[i], m[j]) / (norms[i] * norms[j]))
            sa.append(sources[i])
            sb.append(sources[j])
            cs.append(round(c, 6))
    return pa.table({
        "source_a": pa.array(sa, pa.string()),
        "source_b": pa.array(sb, pa.string()),
        "cosine_sim": pa.array(cs, pa.float64()),
    })


# --- cross-source exact-duplication matrix --------------------------------

DUP_MATRIX_BUCKETS = 64


def exact_dup_source_matrix(sf_dir: str):
    """(source_a, source_b, n_dup_pairs, n_hashes): exact-duplication
    mass between every unordered source pair — the provenance matrix
    of VERBATIM copies (mirror sites, cross-posted content), the
    exact-dup companion to near_dup_source_matrix. Pairs are NEVER
    enumerated: for one content hash with per-source copy counts n_s,
    cross-source pair mass is n_a*n_b and within-source mass is
    n*(n-1)/2 — pure count arithmetic, so a hash shared by a million
    docs costs the same as one shared by two (the CLAUDE.md
    hot-posting rule satisfied by construction). Empty-normalized
    texts are excluded (the exact-dedup skew guard).

    Shape: per-batch (hash, source, cnt) partials -> ONE digest-bucket
    shuffle (16-byte keys, not text) -> per-bucket count math (each
    hash lives in exactly one bucket) -> |sources|^2 aggregate."""
    from ray.data.aggregate import Sum

    from dataquality_ray.arrowutil import md5_digests
    from dataquality_ray.spec import EDGE_WS_PATTERN, WS_PLUS_PATTERN

    docs = _docs(sf_dir, columns=["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        norm = pc.replace_substring_regex(
            pc.replace_substring_regex(
                pc.utf8_lower(pc.fill_null(text, "")),
                EDGE_WS_PATTERN, ""),
            WS_PLUS_PATTERN, " ")
        ok = pc.greater(pc.utf8_length(norm), 0).to_numpy(
            zero_copy_only=False)
        dig = md5_digests(norm)
        g = (pl.DataFrame({
            "h": pl.Series([d for d, k in zip(dig, ok) if k],
                           dtype=pl.Binary),
            "source": pl.Series(
                [s for s, k in zip(batch["source"].to_pylist(), ok)
                 if k]),
        }).group_by(["h", "source"])
            .agg(n=pl.len().cast(pl.Int64)))
        hb = np.fromiter(
            (int.from_bytes(d[:4], "little") % DUP_MATRIX_BUCKETS
             for d in g["h"]),
            dtype=np.int32, count=g.height)
        return g.with_columns(hb=pl.Series(hb)).to_arrow()

    def local(t: pa.Table) -> pa.Table:
        d = (pl.from_arrow(t.select(["h", "source", "n"]))
             .group_by(["h", "source"])
             .agg(n=pl.col("n").sum()))
        # within-source pairs: C(n, 2) per (hash, source)
        w = d.filter(pl.col("n") >= 2).select(
            sa=pl.col("source"), sb=pl.col("source"),
            p=pl.col("n") * (pl.col("n") - 1) // 2,
            h=pl.col("h"))
        # cross-source pairs: n_a * n_b per hash, source_a < source_b
        x = (d.join(d, on="h", suffix="_b")
             .filter(pl.col("source") < pl.col("source_b"))
             .select(sa=pl.col("source"), sb=pl.col("source_b"),
                     p=pl.col("n") * pl.col("n_b"),
                     h=pl.col("h")))
        both = pl.concat([w, x])
        g = (both.group_by(["sa", "sb"])
             .agg(p=pl.col("p").sum(),
                  nh=pl.col("h").n_unique().cast(pl.Int64)))
        return g.to_arrow().cast(pa.schema([
            ("sa", pa.string()), ("sb", pa.string()),
            ("p", pa.int64()), ("nh", pa.int64())]))

    pairs = (docs.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
             .groupby("hb").map_groups(local, batch_format="pyarrow")
             .groupby(["sa", "sb"])
             .aggregate(Sum("p", alias_name="n_dup_pairs"),
                        Sum("nh", alias_name="n_hashes"))
             .to_pandas())      # <= |sources|^2 rows
    # grid semantics: every unordered source pair appears, zero-filled
    # (a corpus with NO verbatim copies — e.g. the sf documents table —
    # must still produce a stable, schema-carrying result)
    su = (docs.map_batches(
        lambda t: pa.table({"source": pc.unique(t["source"])}),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas())
    sources = sorted(set(su["source"]))
    by_pair = {}
    for _, r in pairs.iterrows():
        by_pair[(r["sa"], r["sb"])] = (int(r["n_dup_pairs"]),
                                       int(r["n_hashes"]))
    sa, sb, p, nh = [], [], [], []
    for i, a in enumerate(sources):
        for b in sources[i:]:
            v = by_pair.get((a, b), (0, 0))
            sa.append(a)
            sb.append(b)
            p.append(v[0])
            nh.append(v[1])
    return pa.table({
        "source_a": pa.array(sa, pa.string()),
        "source_b": pa.array(sb, pa.string()),
        "n_dup_pairs": pa.array(p, pa.int64()),
        "n_hashes": pa.array(nh, pa.int64()),
    })


# --- corpus diversity: distinct-n-gram ratio per source ---------------------

def distinct_ngram_diversity(sf_dir: str, num_buckets: int = 0):
    """(source, n_bigrams, n_distinct, diversity_micro): per-source
    distinct-bigram diversity — the self-BLEU-adjacent datasheet stat
    (distinct-n of Li et al. 2016): what fraction of a source's
    adjacent word pairs are unique. A template-heavy or boilerplate
    source scores low before any dedup pass runs. diversity_micro =
    1e6 * n_distinct // n_bigrams. Distinctness is decided ON the
    frozen md5-u64 bigram hash (md5_number_upper in the DuckDB twin)
    so collisions merge identically on both engines.

    Scale shape: the distinct-bigram space grows with the corpus, so
    nothing corpus-sized touches a Ray aggregate — per-batch tokenize
    + whole-frame shift pairing (the pinned fast-path shape), batch
    dedup BEFORE hashing (one md5 per batch-distinct pair), then ONE
    hash-bucket shuffle of slim (source, u64) rows; each bucket counts
    its distinct hashes locally (every hash lives in exactly one
    bucket); totals ride the same discriminated union as constant-size
    per-batch partials. Final aggregate ≤ |sources| x |buckets| rows."""
    from ray.data.aggregate import Sum

    from dataquality_ray.arrowutil import md5_digests

    from dataquality_ray.stages.bucketing import cluster_buckets

    nb = num_buckets or cluster_buckets()
    docs = _docs(sf_dir, columns=["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        df = (pl.from_arrow(batch.select(["source", "text"]))
              .with_columns(toks=pl.col("text").fill_null("")
                            .str.to_lowercase()
                            .str.extract_all(TOKEN_PATTERN)))
        # per-source bigram totals (spine: every source in the batch
        # emits a row even with zero bigrams — the empty-result rule)
        tot = (df.group_by("source")
               .agg(cnt=(pl.col("toks").list.len().cast(pl.Int64) - 1)
                    .clip(lower_bound=0).sum()))
        e = (df.select(["source", "toks"]).with_row_index("rid")
             .explode("toks").drop_nulls("toks"))
        # whole-frame shift + same-row mask (never .over) — the pinned
        # polars fast-path shape
        e = (e.with_columns(b=pl.col("toks").shift(-1),
                            r2=pl.col("rid").shift(-1))
             .filter(pl.col("rid") == pl.col("r2"))
             .with_columns(bg=pl.col("toks") + " " + pl.col("b")))
        d = e.select(["source", "bg"]).unique()
        digs = md5_digests(d["bg"].to_arrow())
        if digs:
            hh = np.frombuffer(b"".join(digs),
                               dtype="<u8").reshape(-1, 2)[:, 0]
        else:
            hh = np.zeros(0, dtype=np.uint64)
        k0 = pa.table({
            "part": pa.array((hh % nb).astype(np.int32)),
            "source": d["source"].to_arrow(),
            "hh": pa.array(hh.view(np.int64)),
            "cnt": pa.array(np.zeros(len(d), dtype=np.int64)),
            "kind": pa.array(np.zeros(len(d), dtype=np.int8)),
        })
        k1 = pa.table({
            "part": pa.array(np.zeros(len(tot), dtype=np.int32)),
            "source": tot["source"].to_arrow(),
            "hh": pa.array(np.zeros(len(tot), dtype=np.int64)),
            "cnt": tot["cnt"].to_arrow(),
            "kind": pa.array(np.ones(len(tot), dtype=np.int8)),
        })
        return pa.concat_tables([k0, k1])

    def scan(t: pa.Table) -> pa.Table:
        d = pl.from_arrow(t.select(["source", "hh", "cnt", "kind"]))
        nd = (d.filter(pl.col("kind") == 0)
              .unique(subset=["source", "hh"])
              .group_by("source").agg(nd=pl.len().cast(pl.Int64)))
        nt = (d.filter(pl.col("kind") == 1)
              .group_by("source").agg(nt=pl.col("cnt").sum()))
        j = (nd.join(nt, on="source", how="full", coalesce=True)
             .with_columns(pl.col("nd").fill_null(0),
                           pl.col("nt").fill_null(0)))
        return j.to_arrow().cast(pa.schema([
            ("source", pa.string()), ("nd", pa.int64()),
            ("nt", pa.int64())]))

    agg = (docs.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
           .groupby("part").map_groups(scan, batch_format="pyarrow")
           .groupby("source")
           .aggregate(Sum("nt", alias_name="n_bigrams"),
                      Sum("nd", alias_name="n_distinct"))
           .to_pandas())

    src = agg["source"].tolist()
    nbg = agg["n_bigrams"].to_numpy(dtype=np.int64)
    ndt = agg["n_distinct"].to_numpy(dtype=np.int64)
    order = np.argsort(np.array(src, dtype=object), kind="stable")
    return pa.table({
        "source": pa.array([src[i] for i in order], pa.string()),
        "n_bigrams": pa.array(nbg[order]),
        "n_distinct": pa.array(ndt[order]),
        "diversity_micro": pa.array(
            1_000_000 * ndt[order] // np.maximum(nbg[order], 1)),
    })


# --- mixture planning: leave-one-source-out ablation -------------------------

def mixture_ablation_weights(sf_dir: str):
    """(held_out, source, weight_ppm, delta_ppm): leave-one-source-out
    sensitivity of the temperature-0.5 mixture — for every held-out
    source, the re-normalized sqrt weights of the remaining sources and
    their delta vs the full-mixture weights. The planning table a data
    ablation study reads before paying for N retraining runs: it says
    which sources' budgets move most when a candidate source is pulled.
    Same exact integer arithmetic as source_mixture_weights
    (floor(sqrt(chars * SCALE)), ppm trunc-div); |sources|^2 rows of
    driver math over the constant-size per-source aggregate — the
    corpus is read once, shuffled never."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, columns=["source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        g = (pl.DataFrame({
            "source": pl.from_arrow(batch["source"]),
            "c": pl.from_arrow(batch["n_chars"]),
        }).group_by("source")
            .agg(c=pl.col("c").sum().cast(pl.Int64)))
        return g.to_arrow().cast(pa.schema([
            ("source", pa.string()), ("c", pa.int64())]))

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("source")
           .aggregate(Sum("c", alias_name="sum_chars"))
           .to_pandas().sort_values("source"))

    src = agg["source"].tolist()
    sq = np.floor(np.sqrt(agg["sum_chars"].to_numpy()
                          .astype(np.float64)
                          * MIXTURE_SQRT_SCALE)).astype(np.int64)
    tot = int(sq.sum())
    base = sq * MIXTURE_PPM // max(tot, 1)
    held, kept, w, dl = [], [], [], []
    for i, h in enumerate(src):
        t_h = max(tot - int(sq[i]), 1)
        for j, s in enumerate(src):
            if j == i:
                continue
            wj = int(sq[j]) * MIXTURE_PPM // t_h
            held.append(h)
            kept.append(s)
            w.append(wj)
            dl.append(wj - int(base[j]))
    return pa.table({
        "held_out": pa.array(held, pa.string()),
        "source": pa.array(kept, pa.string()),
        "weight_ppm": pa.array(w, pa.int64()),
        "delta_ppm": pa.array(dl, pa.int64()),
    })


# --- hybrid retrieval: reciprocal-rank fusion of BM25 and ANN ----------------

RRF_K = 60  # the standard Cormack/Clarke/Buettcher 2009 constant


def hybrid_rrf_top_docs(sf_dir: str):
    """(doc_id, lex_rank, sem_rank, rrf_ppm): reciprocal-rank fusion
    (Cormack et al. 2009) of the two retrieval surfaces this engine
    already hash-checks — the BM25 lexical top-K (bm25_top_docs,
    query = BM25_QUERY_TERMS) and the embedding-cosine semantic top-K
    for the SAME query text embedded with the frozen hashed-projection
    embedder. rrf_ppm = sum over the lists containing the doc of
    1_000_000 // (RRF_K + rank) — integer-exact, so the fused score
    column is hash-stable; absent ranks emit 0. Semantic ranking is on
    ROUND-6 cosine (doc_id tiebreak), the cross-engine-safe order.

    Scale shape: two streaming passes (the BM25 two-pass and one
    embed+score pass against a broadcast 64-float query vector), each
    reducing per batch to K slim rows then one single-partition top-K;
    the fusion itself is 2K-row driver math. Nothing corpus-sized
    leaves the read. Reference analog: the corpus-lookup similarity
    surface (metadata.py:514-624) fused with lexical retrieval."""
    from dataquality_ray.stages.embeddings import (
        HashedProjectionEmbedder,
        embed_texts,
    )
    from dataquality_ray.stages.similarity import _as_matrix, _normalize

    qtext = " ".join(BM25_QUERY_TERMS)

    # lexical list: BM25 top-K (already a K-row single partition)
    lex = (bm25_top_docs(sf_dir).to_pandas()
           .sort_values(["score_milli", "doc_id"],
                        ascending=[False, True]).reset_index(drop=True))
    lex_rank = {int(d): i + 1 for i, d in enumerate(lex["doc_id"])}

    # semantic list: round-6 query vector from the frozen embedder
    # (driver-side — one 3-token text), broadcast into a batch scorer
    qvec = HashedProjectionEmbedder()._embed_rows([qtext])[0]
    qn = float(np.linalg.norm(qvec))
    qu = qvec / qn if qn > 0 else qvec
    qref = ray.put(qu)

    def sem_partial(batch: pa.Table) -> pa.Table:
        q = ray.get(qref)
        ids = np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64)
        m = _normalize(_as_matrix(batch["embedding"]))
        sims = np.round(m @ q, 6)           # round-6 BEFORE ranking
        order = np.lexsort((ids, -sims))[:BM25_TOPK]
        return pa.table({
            "doc_id": pa.array(ids[order]),
            "sim6": pa.array(sims[order], pa.float64()),
        })

    def sem_final(t: pa.Table) -> pa.Table:
        d = pl.from_arrow(t).sort(["sim6", "doc_id"],
                                  descending=[True, False])
        return d.head(BM25_TOPK).to_arrow()

    sem = (embed_texts(_docs(sf_dir, columns=["doc_id", "text"]))
           .map_batches(sem_partial, batch_format="pyarrow")
           .repartition(1)
           .map_batches(sem_final, batch_format="pyarrow")
           .to_pandas())
    sem_rank = {int(d): i + 1 for i, d in enumerate(sem["doc_id"])}

    all_ids = sorted(set(lex_rank) | set(sem_rank))
    lr = np.array([lex_rank.get(d, 0) for d in all_ids], dtype=np.int64)
    sr = np.array([sem_rank.get(d, 0) for d in all_ids], dtype=np.int64)
    rrf = (np.where(lr > 0, 1_000_000 // (RRF_K + lr), 0)
           + np.where(sr > 0, 1_000_000 // (RRF_K + sr), 0))
    order = np.lexsort((np.array(all_ids), -rrf))
    return pa.table({
        "doc_id": pa.array(np.array(all_ids, dtype=np.int64)[order]),
        "lex_rank": pa.array(lr[order]),
        "sem_rank": pa.array(sr[order]),
        "rrf_ppm": pa.array(rrf[order]),
    })


# --- per-source embedding outliers (distance to own domain centroid) --------

# round-6 cosine below this flags the doc as off-domain for its source
# (picked from the fixture distribution: p1 ~ 0.44-0.45 at both
# sf0.001 and sf0.01, so the flag carries real signal on the sf tables)
OUTLIER_COS_TAU = 0.45


def source_embedding_outliers(sf_dir: str):
    """(doc_id, source, cos_centroid, is_outlier): every document's
    round-6 cosine to its OWN source's mean-embedding centroid, with
    an off-domain flag (cos < OUTLIER_COS_TAU) — the curation signal
    that catches mislabeled provenance or scraper contamination inside
    a source before mixture planning trusts the source label.

    Exactness: the centroid is normalized from the per-source EXACT
    int64 accumulator sums (the source_embedding_centroids surface) —
    norm-squared summed in arbitrary-precision Python ints, one
    correctly-rounded sqrt+divide, round-6 (the _embed_rows recipe) —
    so both engines rank from identical round-6 unit vectors; the
    cosine then follows the proven doc_embedding_ann convention
    (normalize round-6 vectors, dot, round-6; zero vector -> 0).

    Scale shape: pass 1 reduces each batch to (sources x DIM) exact
    int64 partial sums before a constant-size groupby; the centroid
    dict (|sources| x 64 floats) broadcasts via ray.put; pass 2
    streams the embed+dot per batch. Nothing corpus-sized shuffles.
    Reference analog: max-similarity per doc (metadata.py:514-624)
    turned inward against the source's own centroid."""
    from ray.data.aggregate import Sum

    from dataquality_ray.stages.embeddings import (
        EMBED_DIM,
        HashedProjectionEmbedder,
    )

    docs = _docs(sf_dir, columns=["doc_id", "source", "text"])

    class AccPartials(HashedProjectionEmbedder):
        def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
            texts = batch[self.text_col]
            if isinstance(texts, pa.ChunkedArray):
                texts = texts.combine_chunks()
            acc = self._acc_rows(texts.to_pylist())
            src = np.asarray(batch["source"].to_pylist())
            uniq, inv = np.unique(src, return_inverse=True)
            sums = np.zeros((len(uniq), EMBED_DIM), dtype=np.int64)
            np.add.at(sums, inv, acc)
            return pa.table({
                "source": pa.array(np.repeat(uniq, EMBED_DIM).tolist(),
                                   pa.string()),
                "dim": pa.array(np.tile(
                    np.arange(EMBED_DIM, dtype=np.int64), len(uniq))),
                "sa": pa.array(sums.ravel()),
            })

    cent = (docs.map_batches(
        AccPartials, fn_constructor_kwargs={},
        concurrency=(1, DEFAULT_CONFIG.actor_pool_size),
        batch_size=DEFAULT_CONFIG.batch_size,
        batch_format="pyarrow")
        .groupby(["source", "dim"])
        .aggregate(Sum("sa", alias_name="sum_acc"))
        .to_pandas())

    centroids: dict[str, np.ndarray] = {}
    for s, grp in cent.groupby("source"):
        g = grp.sort_values("dim")
        sa = g["sum_acc"].to_numpy(dtype=np.int64)
        # exact integer norm-squared (python ints — int64 dot of the
        # per-source SUMS can overflow), then the _embed_rows recipe
        nsq = sum(int(x) * int(x) for x in sa)
        centroids[str(s)] = (
            np.round(sa / np.sqrt(float(nsq)), 6) if nsq > 0
            else np.zeros(EMBED_DIM, dtype=np.float64))
    cref = ray.put(centroids)

    class Scorer(HashedProjectionEmbedder):
        def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
            cmap = ray.get(cref)
            texts = batch[self.text_col]
            if isinstance(texts, pa.ChunkedArray):
                texts = texts.combine_chunks()
            emb = self._embed_rows(texts.to_pylist())
            src = [str(s) for s in batch["source"].to_pylist()]
            cm = np.asarray([cmap[s] for s in src], dtype=np.float64)
            from dataquality_ray.stages.similarity import _normalize
            sims = np.round(
                np.einsum("ij,ij->i", _normalize(emb), _normalize(cm)),
                6)
            return pa.table({
                "doc_id": batch["doc_id"],
                "source": batch["source"],
                "cos_centroid": pa.array(sims, pa.float64()),
                "is_outlier": pa.array(
                    (sims < OUTLIER_COS_TAU).astype(np.int64)),
            })

    return docs.map_batches(
        Scorer, fn_constructor_kwargs={},
        concurrency=(1, DEFAULT_CONFIG.actor_pool_size),
        batch_size=DEFAULT_CONFIG.batch_size,
        batch_format="pyarrow")


# --- asymmetric containment (Broder): sub-document inclusion -----------------

# token-shingle width; ALL distinct shingles count (set containment,
# not winnowing's positional minima)
CONT_K = 3
# hot-posting policy (CLAUDE.md invariant): shingles shared by more
# than CONT_DF_CAP docs are boilerplate and leave the universe —
# numerator AND denominator, mirrored in the oracle
CONT_DF_CAP = 64


def max_containment_per_doc(sf_dir: str, num_buckets: int = 0):
    """(doc_id, best_other, n_shared, n_shingles, cont_milli): per
    document, the best asymmetric CONTAINMENT match (Broder 1997):
    cont(d in o) = |shingles(d) ∩ shingles(o)| / |shingles(d)| over
    distinct CONT_K-token shingle hashes — the quote/subset detector
    Jaccard dilutes away (a page wholly copied into a 100x larger one
    has tiny Jaccard but containment 1.0). best = argmax by
    (cont_milli DESC, n_shared DESC, other ASC); docs with no match
    emit (-1, 0, n_shingles, 0) — every doc emits a row (the
    empty-result rule's doc spine). Distinctness and the df-cap are
    decided on the frozen md5-u64 shingle hash.

    Scale shape — three slim all-to-alls, nothing corpus-quadratic:
    (1) shingle-bucket shuffle of distinct (doc, hash) rows: the
    df-cap and per-doc capped counts resolve locally (every hash in
    exactly one bucket), pairs expand via the winnow_dup_pairs
    one-gather triu under the cap; (2) pair-hash buckets sum the pair
    partials (a pair's shared shingles span shingle buckets); (3)
    doc-hash buckets receive the DIRECTED pair rows, the count
    partials and the doc spine (forwarded through the same
    discriminated union), finishing the per-doc argmax + denominator
    join locally. Reference analog: the pairwise similarity surface
    (metadata.py:514-624) re-grounded in asymmetric containment."""
    from numpy.lib.stride_tricks import sliding_window_view  # noqa: F401

    from dataquality_ray.spec import token_hash_u64
    from dataquality_ray.stages.bucketing import cluster_buckets

    nb = num_buckets or cluster_buckets(minimum=16)
    docs = _docs(sf_dir, columns=["doc_id", "text"])

    def _doc_bucket(ids: np.ndarray) -> np.ndarray:
        return np.fromiter(
            (token_hash_u64(f"d:{int(i)}") % nb for i in ids),
            dtype=np.int32, count=len(ids))

    _UNION = pa.schema([
        ("kb", pa.int32()), ("kind", pa.int8()),
        ("a", pa.int64()), ("b", pa.int64()), ("c", pa.int64())])

    def shingles(batch: pa.Table) -> pa.Table:
        s = pl.from_arrow(batch["text"])
        if isinstance(s, pl.DataFrame):
            s = s.to_series()
        toks = s.fill_null("").str.to_lowercase() \
            .str.extract_all(TOKEN_PATTERN)
        expr = pl.element()
        for j in range(1, CONT_K):
            expr = expr + " " + pl.element().shift(-j)
        grams = toks.list.eval(expr.drop_nulls())
        ids = np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64)
        df = (pl.DataFrame({"doc_id": ids, "g": grams})
              .explode("g").drop_nulls("g")
              .unique(["doc_id", "g"]))
        # frozen md5-u64 once per batch-unique (doc, gram)
        enc = df["g"].to_arrow().dictionary_encode()
        lut = np.fromiter(
            (token_hash_u64(u) for u in enc.dictionary.to_pylist()),
            dtype=np.uint64, count=len(enc.dictionary))
        h = lut[enc.indices.to_numpy(zero_copy_only=False)] \
            if len(df) else np.zeros(0, dtype=np.uint64)
        k0 = pa.table({
            "kb": pa.array((h % np.uint64(nb)).astype(np.int32)),
            "kind": pa.array(np.zeros(len(df), dtype=np.int8)),
            "a": df["doc_id"].to_arrow().cast(pa.int64()),
            "b": pa.array(h.view(np.int64)),
            "c": pa.array(np.zeros(len(df), dtype=np.int64)),
        })
        # doc spine (kind 2): rides the same union straight through to
        # the doc-bucket stage so shingle-less docs still emit rows
        k2 = pa.table({
            "kb": pa.array(_doc_bucket(ids)),
            "kind": pa.array(np.full(len(ids), 2, dtype=np.int8)),
            "a": pa.array(ids),
            "b": pa.array(np.full(len(ids), -1, dtype=np.int64)),
            "c": pa.array(np.zeros(len(ids), dtype=np.int64)),
        })
        return pa.concat_tables([k0, k2]).cast(_UNION)

    def shingle_scan(g: pa.Table) -> pa.Table:
        d = pl.from_arrow(g.select(["kind", "a", "b"]))
        sh = (d.filter(pl.col("kind") == 0)
              .select(["a", "b"]).unique()
              .with_columns(m=pl.len().over("b")))
        capped = sh.filter(pl.col("m") <= CONT_DF_CAP)
        cnt = capped.group_by("a").agg(c=pl.len().cast(pl.Int64))
        k1 = pa.table({
            "kb": pa.array(_doc_bucket(cnt["a"].to_numpy())),
            "kind": pa.array(np.ones(cnt.height, dtype=np.int8)),
            "a": cnt["a"].to_arrow().cast(pa.int64()),
            "b": pa.array(np.full(cnt.height, -1, dtype=np.int64)),
            "c": cnt["c"].to_arrow(),
        })
        pairs = capped.filter(pl.col("m") >= 2)
        if pairs.height:
            posts = pairs.group_by("b").agg(
                cs=pl.col("a").sort())
            sizes = posts["cs"].list.len().to_numpy().astype(np.int64)
            flat = posts["cs"].explode().to_numpy().astype(np.int64)
            starts = np.zeros(len(sizes) + 1, dtype=np.int64)
            np.cumsum(sizes, out=starts[1:])
            a_parts, b_parts = [], []
            for m in np.unique(sizes):
                sel = np.flatnonzero(sizes == m)
                mat = flat[starts[sel][:, None] + np.arange(m)]
                iu, ju = np.triu_indices(int(m), 1)
                a_parts.append(mat[:, iu].ravel())
                b_parts.append(mat[:, ju].ravel())
            a_all = np.concatenate(a_parts)
            b_all = np.concatenate(b_parts)
            key = np.stack([a_all, b_all], axis=1)
            uk, cntp = np.unique(key, axis=0, return_counts=True)
            pb = np.fromiter(
                (token_hash_u64(f"{a}|{b}") % nb
                 for a, b in zip(uk[:, 0], uk[:, 1])),
                dtype=np.int32, count=len(uk))
            k0 = pa.table({
                "kb": pa.array(pb),
                "kind": pa.array(np.zeros(len(uk), dtype=np.int8)),
                "a": pa.array(uk[:, 0]),
                "b": pa.array(uk[:, 1]),
                "c": pa.array(cntp.astype(np.int64)),
            })
        else:
            k0 = _UNION.empty_table()
        # forwarded rows keep their original kb
        fwd_t = g.filter(
            pc.not_equal(g["kind"], 0)).select(
            ["kb", "kind", "a", "b", "c"])
        return pa.concat_tables(
            [k0.cast(_UNION), k1.cast(_UNION), fwd_t.cast(_UNION)])

    def pair_merge(g: pa.Table) -> pa.Table:
        d = pl.from_arrow(g.select(["kind", "a", "b", "c"]))
        p = (d.filter(pl.col("kind") == 0)
             .group_by(["a", "b"])
             .agg(c=pl.col("c").sum().cast(pl.Int64)))
        # expand to DIRECTED rows keyed by the subject doc's bucket
        da = np.concatenate([p["a"].to_numpy(), p["b"].to_numpy()]) \
            if p.height else np.zeros(0, dtype=np.int64)
        do = np.concatenate([p["b"].to_numpy(), p["a"].to_numpy()]) \
            if p.height else np.zeros(0, dtype=np.int64)
        dc = np.concatenate([p["c"].to_numpy(), p["c"].to_numpy()]) \
            if p.height else np.zeros(0, dtype=np.int64)
        k0 = pa.table({
            "kb": pa.array(_doc_bucket(da)),
            "kind": pa.array(np.zeros(len(da), dtype=np.int8)),
            "a": pa.array(da.astype(np.int64)),
            "b": pa.array(do.astype(np.int64)),
            "c": pa.array(dc.astype(np.int64)),
        })
        # forwarded rows keep their original kb
        fwd_t = g.filter(
            pc.not_equal(g["kind"], 0)).select(
            ["kb", "kind", "a", "b", "c"])
        return pa.concat_tables([k0.cast(_UNION), fwd_t.cast(_UNION)])

    def doc_final(g: pa.Table) -> pa.Table:
        d = pl.from_arrow(g.select(["kind", "a", "b", "c"]))
        spine = (d.filter(pl.col("kind") == 2)
                 .select(doc_id=pl.col("a")).unique())
        cnt = (d.filter(pl.col("kind") == 1)
               .group_by("a").agg(n_sh=pl.col("c").sum()))
        dirx = (d.filter(pl.col("kind") == 0)
                .group_by(["a", "b"])
                .agg(sh=pl.col("c").sum()))
        dirx = (dirx.join(cnt, on="a", how="left")
                .with_columns(
                    cont=(1000 * pl.col("sh"))
                    // pl.col("n_sh").fill_null(0).clip(lower_bound=1))
                .sort(["a", "cont", "sh", "b"],
                      descending=[False, True, True, False])
                .unique(subset="a", keep="first"))
        out = (spine.join(cnt.rename({"a": "doc_id"}),
                          on="doc_id", how="left")
               .join(dirx.rename({"a": "doc_id"}),
                     on="doc_id", how="left")
               .with_columns(
                   best_other=pl.col("b").fill_null(-1),
                   n_shared=pl.col("sh").fill_null(0),
                   n_shingles=pl.col("n_sh").fill_null(0),
                   cont_milli=pl.col("cont").fill_null(0)))
        return out.select(["doc_id", "best_other", "n_shared",
                           "n_shingles", "cont_milli"]) \
            .to_arrow().cast(pa.schema([
                ("doc_id", pa.int64()), ("best_other", pa.int64()),
                ("n_shared", pa.int64()), ("n_shingles", pa.int64()),
                ("cont_milli", pa.int64())]))

    return (docs.map_batches(shingles, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("kb").map_groups(shingle_scan,
                                      batch_format="pyarrow")
            .groupby("kb").map_groups(pair_merge,
                                      batch_format="pyarrow")
            .groupby("kb").map_groups(doc_final,
                                      batch_format="pyarrow"))


# --- provenance hygiene: language-label mismatch audit -----------------------

def langid_mismatch_by_source(sf_dir: str):
    """(source, n_docs, n_mismatch, mismatch_permille): per source, how
    often the pinned stopword-marker language classifier disagrees with
    the document's DECLARED lang label — the provenance-hygiene audit
    that catches a source whose metadata lies about language (scraper
    mixups, mislabeled crawls) before mixture planning trusts the
    label. Zero shuffle: batch-local classify + per-source integer
    partials into a |sources|-row aggregate."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, columns=["source", "lang", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        pred = _pred_lang_of(batch["text"])
        lab = np.asarray(batch["lang"].to_pylist(), dtype=object)
        mm = (pred != lab).astype(np.int64)
        g = (pl.DataFrame({
            "source": pl.from_arrow(batch["source"]),
            "mm": mm,
        }).group_by("source")
            .agg(n=pl.len().cast(pl.Int64), m=pl.col("mm").sum()))
        return g.to_arrow().cast(pa.schema([
            ("source", pa.string()), ("n", pa.int64()),
            ("m", pa.int64())]))

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("source")
           .aggregate(Sum("n", alias_name="n_docs"),
                      Sum("m", alias_name="n_mismatch"))
           .to_pandas().sort_values("source"))

    n = agg["n_docs"].to_numpy(dtype=np.int64)
    m = agg["n_mismatch"].to_numpy(dtype=np.int64)
    return pa.table({
        "source": pa.array(agg["source"].tolist(), pa.string()),
        "n_docs": pa.array(n),
        "n_mismatch": pa.array(m),
        "mismatch_permille": pa.array(1000 * m // np.maximum(n, 1)),
    })


# --- split QA: per-source balance of the hash split --------------------------

def split_balance_audit(sf_dir: str):
    """(source, split, n_docs, expected_n, dev_ppm): does the
    deterministic 80/10/10 hash split treat every source fairly?
    expected_n = source_total * split_global_total // corpus_total
    (the split's realized global share applied to the source);
    dev_ppm = 1e6 * (n_docs - expected_n) // max(expected_n, 1). A
    source whose val/test cells deviate hard means its doc_id space
    collides with the split hash non-uniformly — the audit a team runs
    before trusting per-source eval numbers. Full source x
    {train,val,test} grid (zero cells emit — the empty-result rule).
    Integer-exact; one pass, constant-size aggregate."""
    from ray.data.aggregate import Sum

    from dataquality_ray.spec import token_hash_u64

    ds = _docs(sf_dir, columns=["doc_id", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        b = np.fromiter((token_hash_u64(str(i)) % SPLIT_BUCKETS
                         for i in ids), dtype=np.int64, count=len(ids))
        split = np.where(b < SPLIT_TRAIN_LT, "train",
                         np.where(b < SPLIT_VAL_LT, "val", "test"))
        g = (pl.DataFrame({
            "source": pl.from_arrow(batch["source"]),
            "split": split,
        }).group_by(["source", "split"])
            .agg(n=pl.len().cast(pl.Int64)))
        return g.to_arrow().cast(pa.schema([
            ("source", pa.string()), ("split", pa.string()),
            ("n", pa.int64())]))

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["source", "split"])
           .aggregate(Sum("n", alias_name="n_docs"))
           .to_pandas())

    counts = {(s, sp): int(n) for s, sp, n in zip(
        agg["source"], agg["split"], agg["n_docs"])}
    sources = sorted({s for s, _ in counts})
    splits = ("test", "train", "val")          # grid in name order
    src_tot = {s: sum(counts.get((s, sp), 0) for sp in splits)
               for s in sources}
    split_tot = {sp: sum(counts.get((s, sp), 0) for s in sources)
                 for sp in splits}
    total = sum(src_tot.values())
    rows = []
    for s in sources:
        for sp in splits:
            n = counts.get((s, sp), 0)
            exp = src_tot[s] * split_tot[sp] // max(total, 1)
            # deviation can be negative: DuckDB // TRUNCATES while
            # Python // floors — mirror sign-aware (CLAUDE.md rule)
            num, den = 1_000_000 * (n - exp), max(exp, 1)
            dev = num // den if num >= 0 else -((-num) // den)
            rows.append((s, sp, n, exp, dev))
    return pa.table({
        "source": pa.array([r[0] for r in rows], pa.string()),
        "split": pa.array([r[1] for r in rows], pa.string()),
        "n_docs": pa.array([r[2] for r in rows], pa.int64()),
        "expected_n": pa.array([r[3] for r in rows], pa.int64()),
        "dev_ppm": pa.array([r[4] for r in rows], pa.int64()),
    })


# --- special-token / canary contamination census -----------------------------

# literal control/canary strings that must never appear in training
# text: tokenizer specials (they desync the tokenizer's special-token
# handling) and the BIG-bench-style eval canary marker. Quote-free
# literals so the identical strings run in polars contains(literal)
# and DuckDB contains().
SPECIAL_TOKEN_MARKERS = (
    "<|endoftext|>",
    "<|im_start|>",
    "<|im_end|>",
    "</s>",
    "[INST]",
    "### Instruction:",
    "canary GUID",
)


def special_token_contamination(sf_dir: str):
    """(source, marker, n_docs_hit, hit_permille): per-source census of
    tokenizer control strings and eval-canary markers leaking into
    document text — the curation gate that catches chat-format scrape
    artifacts (<|im_start|>, [INST]) and benchmark canaries before
    they train a model to emit its own special tokens. A doc counts
    once per marker it contains (case-sensitive literal match — these
    are exact control sequences). Full source x marker grid, so clean
    corpora still emit (zero) rows — the empty-result rule.

    Shape: zero shuffle — per-batch substring scans reduce to
    (source, marker-index) integer partials; the final aggregate is
    |sources| x |markers| rows."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, columns=["source", "text"])
    markers = list(SPECIAL_TOKEN_MARKERS)

    def partial(batch: pa.Table) -> pa.Table:
        d = pl.from_arrow(batch.select(["source", "text"])) \
            .with_columns(pl.col("text").fill_null(""))
        aggs = {"n": pl.len().cast(pl.Int64)}
        for i, mk in enumerate(markers):
            aggs[f"m{i}"] = (pl.col("text")
                             .str.contains(mk, literal=True)
                             .cast(pl.Int64).sum())
        g = d.group_by("source").agg(**aggs)
        return g.to_arrow().cast(pa.schema(
            [("source", pa.string()), ("n", pa.int64())]
            + [(f"m{i}", pa.int64()) for i in range(len(markers))]))

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("source")
           .aggregate(Sum("n", alias_name="n_docs"),
                      *[Sum(f"m{i}", alias_name=f"hit{i}")
                        for i in range(len(markers))])
           .to_pandas().sort_values("source"))

    src, mk_out, hits, perm = [], [], [], []
    for _, row in agg.iterrows():
        n = int(row["n_docs"])
        for i, mk in enumerate(markers):
            h = int(row[f"hit{i}"])
            src.append(str(row["source"]))
            mk_out.append(mk)
            hits.append(h)
            perm.append(1000 * h // max(n, 1))
    return pa.table({
        "source": pa.array(src, pa.string()),
        "marker": pa.array(mk_out, pa.string()),
        "n_docs_hit": pa.array(hits, pa.int64()),
        "hit_permille": pa.array(perm, pa.int64()),
    })


# --- FIM (fill-in-the-middle) split planning ---------------------------------

FIM_MIN_CHARS = 16      # docs shorter than this are not FIM-eligible


def fim_split_documents(sf_dir: str):
    """(doc_id, n_chars, cut1, cut2, n_prefix, n_middle, n_suffix,
    fim_eligible): deterministic fill-in-the-middle split planning
    (Bavarian et al. 2022): two hash-derived character cut points per
    document (md5-u64 of fim1:/fim2:doc_id mod the char length,
    ordered), so the prefix/middle/suffix decomposition is stable
    under any re-run or re-partitioning — no RNG state, the
    dataset_split_documents discipline applied to span selection.
    Offsets and span lengths only (the text itself stays in place);
    docs under FIM_MIN_CHARS chars emit fim_eligible = 0 with zeroed
    cuts. Char counts are Unicode code points on both engines
    (Python len == DuckDB length). Embarrassingly parallel."""
    from dataquality_ray.spec import token_hash_u64

    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def plan(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        n = len(ids)
        L = np.array([len(t or "") for t in texts], dtype=np.int64)
        r1 = np.fromiter(
            (token_hash_u64(f"fim1:{int(i)}") % max(int(ln), 1)
             for i, ln in zip(ids, L)), dtype=np.int64, count=n)
        r2 = np.fromiter(
            (token_hash_u64(f"fim2:{int(i)}") % max(int(ln), 1)
             for i, ln in zip(ids, L)), dtype=np.int64, count=n)
        elig = (L >= FIM_MIN_CHARS).astype(np.int64)
        c1 = np.where(elig == 1, np.minimum(r1, r2), 0)
        c2 = np.where(elig == 1, np.maximum(r1, r2), 0)
        return pa.table({
            "doc_id": pa.array(
                np.asarray(ids, dtype=np.int64)),
            "n_chars": pa.array(L),
            "cut1": pa.array(c1),
            "cut2": pa.array(c2),
            "n_prefix": pa.array(c1),
            "n_middle": pa.array(c2 - c1),
            "n_suffix": pa.array(np.where(elig == 1, L - c2, 0)),
            "fim_eligible": pa.array(elig),
        })

    return ds.map_batches(plan, batch_format="pyarrow",
                          zero_copy_batch=True)


# --- filter redundancy: pairwise agreement of the quality gates --------------

# (key, pipeline fn, flag column) — alphabetical keys; flag = 1 means
# the gate REJECTS the doc
FILTER_GATES = (
    ("c4_page", "c4_line_filtered_documents", "page_flag"),
    ("compression", "doc_compression_gate", "compress_flag"),
    ("gopher_quality", "gopher_quality_documents", "q_flag"),
    ("gopher_repetition", "gopher_repetition_documents", "rep_flag"),
    ("mojibake", "mojibake_documents", "moji_flag"),
)


def filter_agreement_matrix(sf_dir: str, num_buckets: int = 16):
    """(gate_a, gate_b, n_both, n_only_a, n_only_b, n_neither,
    jaccard_permille): pairwise agreement of the five document quality
    gates (Gopher quality/repetition, C4 page rule, compression gate,
    mojibake) — the filter-redundancy introspection a curation team
    reads before stacking gates: a pair with high Jaccard is
    double-charging the same docs; a gate whose rejections nobody else
    sees is the one to audit. Doc-level twin of the per-turn
    transcript_dim_cofail surface.

    Shape: each gate's existing batch-local kernel streams the corpus
    once and reduces to slim (doc-bucket, doc_id, gate, flag) rows;
    ONE union + doc-bucket shuffle co-locates a doc's five flags; the
    local pivot + pairwise conjunction counts reduce each bucket to
    C(5,2) = 10 rows; the final aggregate is 10 x |buckets| rows.
    Scale note: this composition pays five linear (doc_id, text)
    scans — no extra shuffles, but at 100 TB the five rule kernels
    should be lifted into ONE fused map over a single scan; the
    shipped shape trades that read amplification for zero rule-code
    duplication with the five hash-checked gate surfaces."""
    from ray.data.aggregate import Sum

    from dataquality_ray.spec import token_hash_u64

    import dataquality_ray.pipelines.documents as _self

    nb = num_buckets
    parts = []
    for gi, (key, fn_name, col) in enumerate(FILTER_GATES):
        gate_ds = getattr(_self, fn_name)(sf_dir)

        def slim(t: pa.Table, gi=gi, col=col) -> pa.Table:
            ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
            f = np.asarray(
                t[col].to_pylist()).astype(np.int64)
            db = np.fromiter(
                (token_hash_u64(f"d:{int(i)}") % nb for i in ids),
                dtype=np.int32, count=len(ids))
            return pa.table({
                "db": pa.array(db),
                "doc_id": pa.array(ids),
                "g": pa.array(np.full(len(ids), gi, dtype=np.int64)),
                "f": pa.array(f),
            })

        parts.append(gate_ds.map_batches(slim, batch_format="pyarrow"))

    u = parts[0].union(*parts[1:])
    n_gates = len(FILTER_GATES)
    keys = [k for k, _, _ in FILTER_GATES]

    def scan(t: pa.Table) -> pa.Table:
        d = pl.from_arrow(t.select(["doc_id", "g", "f"]))
        piv = d.pivot(on="g", index="doc_id", values="f")
        cols = {int(c): piv[c].to_numpy().astype(np.int64)
                for c in piv.columns if c != "doc_id"}
        n = piv.height
        ga, gb, b_, oa, ob, nn = [], [], [], [], [], []
        for i in range(n_gates):
            fi = cols.get(i, np.zeros(n, dtype=np.int64))
            for j in range(i + 1, n_gates):
                fj = cols.get(j, np.zeros(n, dtype=np.int64))
                both = int((fi & fj).sum())
                only_i = int((fi & (1 - fj)).sum())
                only_j = int(((1 - fi) & fj).sum())
                ga.append(keys[i])
                gb.append(keys[j])
                b_.append(both)
                oa.append(only_i)
                ob.append(only_j)
                nn.append(n - both - only_i - only_j)
        return pa.table({
            "gate_a": pa.array(ga, pa.string()),
            "gate_b": pa.array(gb, pa.string()),
            "b": pa.array(b_, pa.int64()),
            "oa": pa.array(oa, pa.int64()),
            "ob": pa.array(ob, pa.int64()),
            "nn": pa.array(nn, pa.int64()),
        })

    agg = (u.groupby("db").map_groups(scan, batch_format="pyarrow")
           .groupby(["gate_a", "gate_b"])
           .aggregate(Sum("b", alias_name="n_both"),
                      Sum("oa", alias_name="n_only_a"),
                      Sum("ob", alias_name="n_only_b"),
                      Sum("nn", alias_name="n_neither"))
           .to_pandas().sort_values(["gate_a", "gate_b"]))

    b = agg["n_both"].to_numpy(dtype=np.int64)
    oa = agg["n_only_a"].to_numpy(dtype=np.int64)
    ob = agg["n_only_b"].to_numpy(dtype=np.int64)
    return pa.table({
        "gate_a": pa.array(agg["gate_a"].tolist(), pa.string()),
        "gate_b": pa.array(agg["gate_b"].tolist(), pa.string()),
        "n_both": pa.array(b),
        "n_only_a": pa.array(oa),
        "n_only_b": pa.array(ob),
        "n_neither": pa.array(agg["n_neither"].to_numpy(np.int64)),
        "jaccard_permille": pa.array(
            1000 * b // np.maximum(b + oa + ob, 1)),
    })


# --- per-source threshold calibration to a target keep-rate ------------------

CALIB_TARGET_PERMILLE = 600   # aim: keep ~60% of each source


def calibrated_thresholds_by_source(sf_dir: str,
                                    cfg=None):
    """(source, n_docs, threshold, n_kept, kept_permille): per-source
    quality-threshold calibration — the smallest integer threshold
    whose keep-rate (docs with overall_quality_score >= threshold) is
    <= CALIB_TARGET_PERMILLE, per source. A single global threshold
    over-prunes clean sources and under-prunes noisy ones; this is the
    table a curation run reads to equalize keep-rates instead.
    Exact integer arithmetic over per-source score histograms
    (scores are 0..100 ints), so the calibration is bit-deterministic:
    threshold = min t such that 1000 * |score >= t| <= target * n
    (t = 101, keeping nothing, if even the top score bin overflows
    the target).

    Shape: zero shuffle — the heuristics stay batch-local and reduce
    to (source, score) histogram partials; the final aggregate is
    |sources| x 101 cells; threshold selection is driver math over
    that constant-size table."""
    import functools

    from ray.data.aggregate import Sum

    from dataquality_ray.config import DEFAULT_CONFIG
    from dataquality_ray.stages.heuristics import (
        heuristic_overall4,
        heuristics_batch,
    )

    cfg = cfg or DEFAULT_CONFIG
    ds = _docs(sf_dir, columns=["doc_id", "source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        scored = heuristics_batch(batch, cfg=cfg)
        overall = heuristic_overall4(scored).astype(np.int64)
        g = (pl.DataFrame({
            "source": pl.from_arrow(batch["source"]),
            "score": overall,
        }).group_by(["source", "score"])
            .agg(n=pl.len().cast(pl.Int64)))
        return g.to_arrow().cast(pa.schema([
            ("source", pa.string()), ("score", pa.int64()),
            ("n", pa.int64())]))

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["source", "score"])
           .aggregate(Sum("n", alias_name="n_docs"))
           .to_pandas())

    out_s, out_n, out_t, out_k, out_p = [], [], [], [], []
    for src, grp in agg.groupby("source"):
        hist = np.zeros(101, dtype=np.int64)
        for s, n in zip(grp["score"], grp["n_docs"]):
            hist[int(s)] = int(n)
        total = int(hist.sum())
        # kept_at[t] = |score >= t| for t in 0..101
        kept_at = np.concatenate(
            [np.cumsum(hist[::-1])[::-1], [0]])
        ts = np.flatnonzero(
            1000 * kept_at <= CALIB_TARGET_PERMILLE * total)
        t = int(ts[0]) if len(ts) else 101
        k = int(kept_at[t])
        out_s.append(str(src))
        out_n.append(total)
        out_t.append(t)
        out_k.append(k)
        out_p.append(1000 * k // max(total, 1))
    order = np.argsort(np.array(out_s, dtype=object), kind="stable")
    return pa.table({
        "source": pa.array([out_s[i] for i in order], pa.string()),
        "n_docs": pa.array(np.array(out_n)[order].astype(np.int64)),
        "threshold": pa.array(np.array(out_t)[order].astype(np.int64)),
        "n_kept": pa.array(np.array(out_k)[order].astype(np.int64)),
        "kept_permille": pa.array(
            np.array(out_p)[order].astype(np.int64)),
    })


# --- dedup -> mixture interaction: weight shift after near-dup removal -------

def mixture_dedup_shift(sf_dir: str):
    """(source, sum_chars_raw, sum_chars_kept, weight_raw_ppm,
    weight_kept_ppm, delta_ppm): how near-dup removal MOVES the
    temperature-0.5 mixture — sqrt weights computed on the raw corpus
    vs on the near-dup survivors (min-id winner per cluster), same
    exact integer arithmetic as source_mixture_weights. Duplicate-
    heavy sources lose budget to clean ones; this is the table that
    says by how much, and the reason dedup must run BEFORE mixture
    planning, not after.

    Shape: pair generation is the bounded LSH path; the cluster
    labels (pair-involved docs only — df-capped, never corpus-sized)
    collect to the driver where drops = members minus per-cluster
    min; ONE corpus scan then computes per-source raw and dropped
    char sums together against the broadcast sorted drop array
    (searchsorted membership); kept = raw - dropped. Weights are
    |sources|-row driver math."""
    import polars as _pl

    from ray.data.aggregate import Sum

    from dataquality_ray.stages.clustering import dup_clusters_auto

    pairs = near_dup_documents(sf_dir).map_batches(
        lambda t: pa.table({"key_a": t["id_a"], "key_b": t["id_b"]}),
        batch_format="pyarrow")
    clusters = dup_clusters_auto(pairs)          # (key, cluster)
    if isinstance(clusters, pa.Table):
        cl = _pl.from_arrow(clusters)
    else:   # distributed-label path: labels are slim (key, cluster)
        cl = _pl.from_pandas(clusters.to_pandas())
    win = cl.group_by("cluster").agg(w=_pl.col("key").min())
    drops = (cl.join(win, on="cluster")
             .filter(_pl.col("key") != _pl.col("w"))["key"]
             .to_numpy().astype(np.int64))
    dref = ray.put(np.sort(drops))

    docs = _docs(sf_dir, columns=["doc_id", "source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        dr = ray.get(dref)
        ids = np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64)
        ch = np.asarray(batch["n_chars"].to_pylist(), dtype=np.int64)
        pos = np.searchsorted(dr, ids)
        dropped = (pos < len(dr)) & (dr[np.clip(pos, 0, max(len(dr) - 1, 0))] == ids) \
            if len(dr) else np.zeros(len(ids), dtype=bool)
        g = (_pl.DataFrame({
            "source": _pl.from_arrow(batch["source"]),
            "cr": ch,
            "cd": np.where(dropped, ch, 0),
        }).group_by("source")
            .agg(cr=_pl.col("cr").sum(), cd=_pl.col("cd").sum()))
        return g.to_arrow().cast(pa.schema([
            ("source", pa.string()), ("cr", pa.int64()),
            ("cd", pa.int64())]))

    agg = (docs.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
           .groupby("source")
           .aggregate(Sum("cr", alias_name="sum_chars_raw"),
                      Sum("cd", alias_name="sum_chars_dropped"))
           .to_pandas().sort_values("source"))

    raw = agg["sum_chars_raw"].to_numpy(dtype=np.int64)
    kept = raw - agg["sum_chars_dropped"].to_numpy(dtype=np.int64)
    sq_r = np.floor(np.sqrt(raw.astype(np.float64)
                            * MIXTURE_SQRT_SCALE)).astype(np.int64)
    sq_k = np.floor(np.sqrt(kept.astype(np.float64)
                            * MIXTURE_SQRT_SCALE)).astype(np.int64)
    tr, tk = max(int(sq_r.sum()), 1), max(int(sq_k.sum()), 1)
    w_r = sq_r * MIXTURE_PPM // tr
    w_k = sq_k * MIXTURE_PPM // tk
    return pa.table({
        "source": pa.array(agg["source"].tolist(), pa.string()),
        "sum_chars_raw": pa.array(raw),
        "sum_chars_kept": pa.array(kept),
        "weight_raw_ppm": pa.array(w_r),
        "weight_kept_ppm": pa.array(w_k),
        "delta_ppm": pa.array(w_k - w_r),
    })


# --- split leakage via document near-dups ------------------------------------

def doc_near_dup_split_leakage(sf_dir: str):
    """(split_a, split_b, n_pairs): near-dup pairs bucketed by the
    train/val/test assignment of their two documents — the document-
    level completion of the leakage triad (transcript exact-dup and
    conversation near-dup variants exist). Off-diagonal cells are
    test-set contamination: a test doc near-identical to a train doc
    inflates eval. Split labels derive from the hash assignment
    BATCH-LOCALLY (no join — the split IS a function of doc_id);
    pair cells are normalized (alphabetical order) and the full 3x3
    unordered grid emits zero-filled (the empty-result rule).

    Shape: the bounded LSH pair generator plus one batch-local map
    to 6 constant cells; nothing new shuffles."""
    from ray.data.aggregate import Sum

    from dataquality_ray.spec import token_hash_u64

    pairs = near_dup_documents(sf_dir)

    def cells(t: pa.Table) -> pa.Table:
        a = np.asarray(t["id_a"].to_pylist(), dtype=np.int64)
        b = np.asarray(t["id_b"].to_pylist(), dtype=np.int64)

        def split_of(ids):
            h = np.fromiter(
                (token_hash_u64(str(int(i))) % SPLIT_BUCKETS
                 for i in ids), dtype=np.int64, count=len(ids))
            return np.where(h < SPLIT_TRAIN_LT, "train",
                            np.where(h < SPLIT_VAL_LT, "val", "test"))

        sa, sb = split_of(a), split_of(b)
        le = sa <= sb          # np.minimum has no unicode loop
        lo = np.where(le, sa, sb)
        hi = np.where(le, sb, sa)
        g = (pl.DataFrame({"split_a": lo, "split_b": hi})
             .group_by(["split_a", "split_b"])
             .agg(n=pl.len().cast(pl.Int64)))
        return g.to_arrow().cast(pa.schema([
            ("split_a", pa.string()), ("split_b", pa.string()),
            ("n", pa.int64())]))

    agg = (pairs.map_batches(cells, batch_format="pyarrow")
           .groupby(["split_a", "split_b"])
           .aggregate(Sum("n", alias_name="n_pairs"))
           .to_pandas())

    got = {(a, b): int(n) for a, b, n in zip(
        agg["split_a"], agg["split_b"], agg["n_pairs"])}
    names = ("test", "train", "val")
    rows = [(a, b, got.get((a, b), 0))
            for i, a in enumerate(names) for b in names[i:]]
    return pa.table({
        "split_a": pa.array([r[0] for r in rows], pa.string()),
        "split_b": pa.array([r[1] for r in rows], pa.string()),
        "n_pairs": pa.array([r[2] for r in rows], pa.int64()),
    })


# ---------------------------------------------------------------------------
# Kneser-Ney discount estimation (LM-training corpus statistics)
# ---------------------------------------------------------------------------

def kn_discount_stats(sf_dir: str, num_buckets: int = 0):
    """(n_bigrams, n_distinct, n1, n2, n3, n4, d1_micro, d2_micro,
    d3_micro): modified Kneser-Ney discount estimation over the corpus
    bigram distribution (Chen & Goodman 1998) — the count-of-counts
    n_c (number of distinct bigrams occurring exactly c times) and the
    closed-form discounts D1 = n1/(n1+2*n2), D2 = 2 - 3*Y*n3/n2,
    D3+ = 3 - 4*Y*n4/n3 with Y = n1/(n1+2*n2), emitted as exact
    floor-micro integers (discounts clamped at 0: DuckDB's `//`
    truncates toward zero while Python floors, so negative numerators
    are clamped identically on both engines BEFORE the division).
    This is the "what smoothing will my n-gram LM need" datasheet
    stat a tokenizer/LM-training pipeline computes before training.

    Scale shape: the bigram space grows with the corpus, so exact
    per-bigram counts never meet a Ray aggregate — per-batch polars
    group counts (one md5 per batch-distinct bigram), ONE
    hash-bucket shuffle of slim (part, u64, cnt) rows, exact totals +
    the count-of-counts histogram completed locally per bucket (each
    hash lives in exactly one bucket), then <= num_buckets
    constant-width rows to the driver. Distinctness is decided ON the
    frozen md5-u64 hash (md5_number_upper in the DuckDB twin)."""
    from dataquality_ray.arrowutil import md5_digests
    from dataquality_ray.stages.bucketing import cluster_buckets

    nb = num_buckets or cluster_buckets()
    docs = _docs(sf_dir, columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        df = (pl.from_arrow(batch.select(["text"]))
              .with_columns(toks=pl.col("text").fill_null("")
                            .str.to_lowercase()
                            .str.extract_all(TOKEN_PATTERN)))
        e = (df.select("toks").with_row_index("rid")
             .explode("toks").drop_nulls("toks"))
        e = (e.with_columns(b=pl.col("toks").shift(-1),
                            r2=pl.col("rid").shift(-1))
             .filter(pl.col("rid") == pl.col("r2"))
             .with_columns(bg=pl.col("toks") + " " + pl.col("b")))
        g = e.group_by("bg").agg(c=pl.len().cast(pl.Int64))
        digs = md5_digests(g["bg"].to_arrow())
        if digs:
            hh = np.frombuffer(b"".join(digs),
                               dtype="<u8").reshape(-1, 2)[:, 0]
        else:
            hh = np.zeros(0, dtype=np.uint64)
        return pa.table({
            "part": pa.array((hh % nb).astype(np.int32)),
            "hh": pa.array(hh.view(np.int64)),
            "c": g["c"].to_arrow(),
        })

    def scan(t: pa.Table) -> pa.Table:
        d = (pl.from_arrow(t.select(["hh", "c"]))
             .group_by("hh").agg(c=pl.col("c").sum()))
        c = d["c"].to_numpy()
        cols = {"tot": int(c.sum()) if len(c) else 0,
                "nd": int(len(c))}
        for k in (1, 2, 3, 4):
            cols[f"n{k}"] = int((c == k).sum()) if len(c) else 0
        return pa.table({k: pa.array([v], pa.int64())
                         for k, v in cols.items()})

    agg = (docs.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
           .groupby("part").map_groups(scan, batch_format="pyarrow")
           .to_pandas())           # <= num_buckets constant-width rows

    tot = int(agg["tot"].sum())
    nd = int(agg["nd"].sum())
    n1, n2, n3, n4 = (int(agg[f"n{k}"].sum()) for k in (1, 2, 3, 4))
    deno = max(n1 + 2 * n2, 1)
    d1 = 1_000_000 * n1 // deno
    d2 = max(2 * n2 * deno - 3 * n1 * n3, 0) * 1_000_000 \
        // max(n2 * deno, 1)
    d3 = max(3 * n3 * deno - 4 * n1 * n4, 0) * 1_000_000 \
        // max(n3 * deno, 1)
    return pa.table({
        "n_bigrams": pa.array([tot], pa.int64()),
        "n_distinct": pa.array([nd], pa.int64()),
        "n1": pa.array([n1], pa.int64()),
        "n2": pa.array([n2], pa.int64()),
        "n3": pa.array([n3], pa.int64()),
        "n4": pa.array([n4], pa.int64()),
        "d1_micro": pa.array([d1], pa.int64()),
        "d2_micro": pa.array([d2], pa.int64()),
        "d3_micro": pa.array([d3], pa.int64()),
    })


# ---------------------------------------------------------------------------
# Sequence-length bucketing / packing-efficiency planning
# ---------------------------------------------------------------------------

def length_bucket_packing_stats(sf_dir: str):
    """(bucket, seq_len, n_docs, sum_tokens, padded_tokens,
    pad_waste_ppm, packed_seqs): power-of-two sequence-length
    bucketing — the batch-shape planning stat for padded vs packed
    training. bucket = bit_length(n_tokens - 1) (0 for n <= 1), so
    bucket b holds docs with n_tokens in (2^(b-1), 2^b]; seq_len =
    2^bucket is the pad target. padded_tokens = n_docs * seq_len is
    the cost of pad-to-bucket batching, pad_waste_ppm its exact
    floor-ppm padding overhead, and packed_seqs =
    ceil(sum_tokens / seq_len) the sequence count a packer
    (packed_sequence_documents) would emit at the same seq_len —
    the padded-vs-packed tradeoff per length class in one table.

    Zero data shuffle: per-batch vectorized token counts + integer
    bit_length (the hll_reg_rho shift cascade — float log2 misrounds
    near powers of two) collapse to constant-width (bucket, n, sum)
    partials; the final aggregate is <= 64 rows."""
    from ray.data.aggregate import Sum

    docs = _docs(sf_dir, columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(["text"]))
        n = df.select(
            n=pl.col("text").fill_null("").str.to_lowercase()
            .str.count_matches(TOKEN_PATTERN).cast(pl.Int64)
        )["n"].to_numpy()
        v = np.maximum(n - 1, 0).astype(np.uint64)
        bitlen = np.zeros(len(v), dtype=np.int64)
        w = v.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            big = w >= np.uint64(1 << shift)
            bitlen[big] += shift
            w[big] >>= np.uint64(shift)
        bitlen[v > 0] += 1
        g = (pl.DataFrame({"bucket": bitlen, "n": n})
             .group_by("bucket")
             .agg(n_docs=pl.len().cast(pl.Int64),
                  sum_tokens=pl.col("n").sum().cast(pl.Int64)))
        return g.to_arrow()

    agg = (docs.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
           .groupby("bucket")
           .aggregate(Sum("n_docs", alias_name="n_docs"),
                      Sum("sum_tokens", alias_name="sum_tokens"))
           .to_pandas())            # <= 64 rows

    b = agg["bucket"].to_numpy(dtype=np.int64)
    ndocs = agg["n_docs"].to_numpy(dtype=np.int64)
    st = agg["sum_tokens"].to_numpy(dtype=np.int64)
    order = np.argsort(b, kind="stable")
    b, ndocs, st = b[order], ndocs[order], st[order]
    seq = np.int64(1) << b
    padded = ndocs * seq
    waste = 1_000_000 * (padded - st) // padded
    packed = (st + seq - 1) // seq
    return pa.table({
        "bucket": pa.array(b, pa.int64()),
        "seq_len": pa.array(seq, pa.int64()),
        "n_docs": pa.array(ndocs, pa.int64()),
        "sum_tokens": pa.array(st, pa.int64()),
        "padded_tokens": pa.array(padded, pa.int64()),
        "pad_waste_ppm": pa.array(waste, pa.int64()),
        "packed_seqs": pa.array(packed, pa.int64()),
    })


# ---------------------------------------------------------------------------
# Exact phrase search with token positions
# ---------------------------------------------------------------------------

# The phrase is a tuple of spec.TOKEN_PATTERN tokens matched ADJACENTLY
# in the tokenized document (positional-index semantics: a phrase query
# over an inverted index with positions). Interpolated into the oracle.
PHRASE_QUERY = ("spark", "window")


def phrase_match_documents(sf_dir: str):
    """(doc_id, n_matches, first_pos): exact phrase search — documents
    whose token stream contains PHRASE_QUERY as ADJACENT tokens, with
    the match count (overlapping starts each count) and the 0-based
    token position of the first match. The positional-index query
    shape: conjunctive term search (docs_matching_terms) answers
    "all words somewhere"; this answers "this exact phrase".

    Zero shuffle: tokenization, adjacency test and per-doc reduction
    are all batch-local (one doc = one row — the fused row-local rule,
    CLAUDE.md); position arithmetic is pure numpy on the exploded
    frame (whole-frame shifts + same-row masks, never keyed windows)."""
    docs = _docs(sf_dir, columns=["doc_id", "text"])
    k = len(PHRASE_QUERY)

    def scan(batch: pa.Table) -> pa.Table:
        df = (pl.from_arrow(batch.select(["doc_id", "text"]))
              .with_columns(toks=pl.col("text").fill_null("")
                            .str.to_lowercase()
                            .str.extract_all(TOKEN_PATTERN)))
        e = (df.select(["doc_id", "toks"]).with_row_index("rid")
             .explode("toks").drop_nulls("toks"))
        if not len(e):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_matches": pa.array([], pa.int64()),
                             "first_pos": pa.array([], pa.int64())})
        rid = e["rid"].to_numpy()
        toks = e["toks"].to_numpy()
        hit = toks == PHRASE_QUERY[0]
        for j in range(1, k):
            nxt = np.empty(len(toks), dtype=bool)
            tj = toks == PHRASE_QUERY[j]
            nxt[:-j] = tj[j:] & (rid[:-j] == rid[j:])
            nxt[len(toks) - j:] = False
            hit &= nxt
        # 0-based token position inside each doc: explode preserves
        # order, rids are contiguous runs
        starts = np.zeros(len(rid), dtype=np.int64)
        change = np.flatnonzero(rid[1:] != rid[:-1]) + 1
        starts[change] = change
        np.maximum.accumulate(starts, out=starts)
        pos = np.arange(len(rid), dtype=np.int64) - starts
        g = (pl.DataFrame({"doc_id": e["doc_id"].to_numpy(),
                           "pos": pos})
             .filter(pl.Series(hit))
             .group_by("doc_id")
             .agg(n_matches=pl.len().cast(pl.Int64),
                  first_pos=pl.col("pos").min().cast(pl.Int64)))
        return g.to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()), ("n_matches", pa.int64()),
            ("first_pos", pa.int64())]))

    return docs.map_batches(scan, batch_format="pyarrow",
                            zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Curriculum phases from exact global difficulty tertiles
# ---------------------------------------------------------------------------

def curriculum_phase_documents(sf_dir: str):
    """(doc_id, difficulty, phase): curriculum-learning phase
    assignment — difficulty = cpt_milli (the tokenizer-compression
    fertility signal, doc_compression_gate's exact integer), phases =
    exact global tertiles: phase 1 (easy/low-fertility) up to the
    rank-ceil(n/3) value, phase 2 up to rank-ceil(2n/3), else 3. The
    thresholds use the repo's pinned discrete-quantile rule (value
    histogram + rank = ceil(q*n), CLAUDE.md) — never a float quantile
    kernel.

    Two streaming passes, no corpus shuffle: pass 1 collapses to a
    bounded (difficulty value -> count) histogram (cpt_milli is a
    bounded-range integer, so the histogram is value-domain-sized,
    not corpus-sized); the driver derives the two thresholds; pass 2
    re-reads and assigns batch-locally against the broadcast
    thresholds."""
    from ray.data.aggregate import Sum

    def diffs(batch: pa.Table) -> pa.Table:
        t = _compression_gate_batch(batch.select(["doc_id", "text"]))
        return t.select(["doc_id", "cpt_milli"])

    hist = (_docs(sf_dir, columns=["doc_id", "text"])
            .map_batches(diffs, batch_format="pyarrow",
                         zero_copy_batch=True)
            .map_batches(lambda t: pl.from_arrow(t)
                         .group_by("cpt_milli")
                         .agg(c=pl.len().cast(pl.Int64)).to_arrow(),
                         batch_format="pyarrow")
            .groupby("cpt_milli").aggregate(Sum("c", alias_name="c"))
            .to_pandas())           # value-domain-sized
    v = hist["cpt_milli"].to_numpy(dtype=np.int64)
    c = hist["c"].to_numpy(dtype=np.int64)
    order = np.argsort(v, kind="stable")
    v, c = v[order], c[order]
    cum = np.cumsum(c)
    n = int(cum[-1]) if len(cum) else 0
    r1, r2 = (n + 2) // 3, (2 * n + 2) // 3
    t1 = int(v[np.searchsorted(cum, r1)]) if n else 0
    t2 = int(v[np.searchsorted(cum, r2)]) if n else 0

    def assign(batch: pa.Table) -> pa.Table:
        t = diffs(batch)
        d = t["cpt_milli"].to_numpy(zero_copy_only=False)
        phase = np.where(d <= t1, 1, np.where(d <= t2, 2, 3)) \
            .astype(np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "difficulty": t["cpt_milli"],
            "phase": pa.array(phase),
        })

    return (_docs(sf_dir, columns=["doc_id", "text"])
            .map_batches(assign, batch_format="pyarrow",
                         zero_copy_batch=True))


# ---------------------------------------------------------------------------
# Collocation / phrase-candidate mining (word2phrase)
# ---------------------------------------------------------------------------

# word2phrase scoring constants (Mikolov et al. 2013, "Distributed
# Representations of Words and Phrases"): score(a,b) =
# (count(ab) - DELTA) / (count(a) * count(b)), with the corpus-constant
# N factor dropped (ranking-equivalent) and all counts saturated at
# COLLOC_COUNT_CAP so every int64 product stays in range at ANY corpus
# size (the BM25_TF_CAP precedent). Interpolated into the oracle.
COLLOC_DELTA = 2
COLLOC_COUNT_CAP = 1_000_000
COLLOC_TOP_K = 30



_COLLOC_SCHEMA = pa.schema([
    ("part", pa.int32()), ("key", pa.string()),
    ("other", pa.string()), ("cnt", pa.int64()),
    ("c_a", pa.int64()), ("kind", pa.int8()),
])

def collocation_phrases(sf_dir: str, num_buckets: int = 0):
    """(a, b, c_a, c_b, c_ab, score_ppb): top-K phrase candidates by
    the word2phrase collocation score — adjacent token pairs whose
    co-occurrence beats what their unigram frequencies predict
    (score_ppb = max(min(c_ab,CAP) - DELTA, 0) * 1e9 //
    (min(c_a,CAP) * min(c_b,CAP)); exact integers, ties broken by
    (a, b) ascending). The phrase-vocabulary induction step a
    tokenizer/embedding pipeline runs before training.

    Scale shape: vocabulary and bigram space grow with the corpus, so
    neither meets a corpus-proportional Ray aggregate or a shuffle
    join — two slim hash-bucket passes of a discriminated union:
    pass 1 buckets unigram partials and bigram partials by hash(a),
    completes exact totals locally (every token/pair lives in exactly
    one bucket) and attaches c_a to each pair; pass 2 re-buckets the
    same union by hash(b), attaches c_b, scores, and keeps a local
    top-K per bucket (global top-K is a subset of the union of
    per-bucket top-Ks); the driver merges <= num_buckets * K rows."""
    from dataquality_ray.arrowutil import md5_digests
    from dataquality_ray.stages.bucketing import cluster_buckets

    nb = num_buckets or cluster_buckets()
    docs = _docs(sf_dir, columns=["text"])

    def _hash_part(arr: pa.Array) -> np.ndarray:
        digs = md5_digests(arr)
        if not digs:
            return np.zeros(0, dtype=np.int32)
        hh = np.frombuffer(b"".join(digs),
                           dtype="<u8").reshape(-1, 2)[:, 0]
        return (hh % nb).astype(np.int32)

    def partial(batch: pa.Table) -> pa.Table:
        df = (pl.from_arrow(batch.select(["text"]))
              .with_columns(toks=pl.col("text").fill_null("")
                            .str.to_lowercase()
                            .str.extract_all(TOKEN_PATTERN)))
        e = (df.select("toks").with_row_index("rid")
             .explode("toks").drop_nulls("toks"))
        ug = e.group_by("toks").agg(cnt=pl.len().cast(pl.Int64))
        eb = (e.with_columns(b=pl.col("toks").shift(-1),
                             r2=pl.col("rid").shift(-1))
              .filter(pl.col("rid") == pl.col("r2")))
        bg = (eb.group_by(["toks", "b"])
              .agg(cnt=pl.len().cast(pl.Int64)))
        k0 = pa.table({
            "part": pa.array(_hash_part(ug["toks"].to_arrow())),
            "key": ug["toks"].to_arrow(),
            "other": pa.array([""] * len(ug), pa.string()),
            "cnt": ug["cnt"].to_arrow(),
            "c_a": pa.array(np.zeros(len(ug), dtype=np.int64)),
            "kind": pa.array(np.zeros(len(ug), dtype=np.int8)),
        })
        k1 = pa.table({
            "part": pa.array(_hash_part(bg["toks"].to_arrow())),
            "key": bg["toks"].to_arrow(),
            "other": bg["b"].to_arrow(),
            "cnt": bg["cnt"].to_arrow(),
            "c_a": pa.array(np.zeros(len(bg), dtype=np.int64)),
            "kind": pa.array(np.ones(len(bg), dtype=np.int8)),
        })
        return pa.concat_tables([k0.cast(_COLLOC_SCHEMA),
                                 k1.cast(_COLLOC_SCHEMA)])

    def scan1(t: pa.Table) -> pa.Table:
        d = pl.from_arrow(t.select(
            ["key", "other", "cnt", "c_a", "kind"]))
        uni = (d.filter(pl.col("kind") == 0)
               .group_by("key").agg(tot=pl.col("cnt").sum()))
        big = (d.filter(pl.col("kind") == 1)
               .group_by(["key", "other"])
               .agg(cnt=pl.col("cnt").sum())
               .join(uni, on="key", how="left")
               .rename({"tot": "ca"}))
        # re-key the union by hash(b) for pass 2: unigram totals by
        # their own token, pairs by their SECOND token
        o0 = pa.table({
            "part": pa.array(_hash_part(uni["key"].to_arrow())),
            "key": uni["key"].to_arrow(),
            "other": pa.array([""] * len(uni), pa.string()),
            "cnt": uni["tot"].to_arrow(),
            "c_a": pa.array(np.zeros(len(uni), dtype=np.int64)),
            "kind": pa.array(np.zeros(len(uni), dtype=np.int8)),
        })
        o1 = pa.table({
            "part": pa.array(_hash_part(big["other"].to_arrow())),
            "key": big["key"].to_arrow(),
            "other": big["other"].to_arrow(),
            "cnt": big["cnt"].to_arrow(),
            "c_a": big["ca"].fill_null(0).to_arrow()
            .cast(pa.int64()),
            "kind": pa.array(np.ones(len(big), dtype=np.int8)),
        })
        return pa.concat_tables([o0.cast(_COLLOC_SCHEMA),
                                 o1.cast(_COLLOC_SCHEMA)])

    def scan2(t: pa.Table) -> pa.Table:
        d = pl.from_arrow(t.select(
            ["key", "other", "cnt", "c_a", "kind"]))
        uni = (d.filter(pl.col("kind") == 0)
               .select([pl.col("key").alias("other"),
                        pl.col("cnt").alias("cb")]))
        big = (d.filter(pl.col("kind") == 1)
               .join(uni, on="other", how="left")
               .with_columns(cb=pl.col("cb").fill_null(0)))
        cap = pl.lit(COLLOC_COUNT_CAP, dtype=pl.Int64)
        num = (pl.min_horizontal(pl.col("cnt"), cap)
               - COLLOC_DELTA).clip(lower_bound=0)
        den = (pl.min_horizontal(pl.col("c_a"), cap).clip(lower_bound=1)
               * pl.min_horizontal(pl.col("cb"), cap)
               .clip(lower_bound=1))
        big = (big.with_columns(
            score_ppb=(num * 1_000_000_000 // den).cast(pl.Int64))
            .sort(["score_ppb", "key", "other"],
                  descending=[True, False, False])
            .head(COLLOC_TOP_K))
        return big.select([
            pl.col("key").alias("a"), pl.col("other").alias("b"),
            pl.col("c_a"), pl.col("cb").alias("c_b"),
            pl.col("cnt").alias("c_ab"), pl.col("score_ppb"),
        ]).to_arrow().cast(pa.schema([
            ("a", pa.string()), ("b", pa.string()),
            ("c_a", pa.int64()), ("c_b", pa.int64()),
            ("c_ab", pa.int64()), ("score_ppb", pa.int64())]))

    cand = (docs.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("part").map_groups(scan1, batch_format="pyarrow")
            .groupby("part").map_groups(scan2, batch_format="pyarrow")
            .to_pandas())           # <= num_buckets * K rows
    cand = cand.sort_values(
        ["score_ppb", "a", "b"], ascending=[False, True, True],
        kind="mergesort").head(COLLOC_TOP_K).reset_index(drop=True)
    return pa.table({
        "a": pa.array(cand["a"], pa.string()),
        "b": pa.array(cand["b"], pa.string()),
        "c_a": pa.array(cand["c_a"].to_numpy(np.int64)),
        "c_b": pa.array(cand["c_b"].to_numpy(np.int64)),
        "c_ab": pa.array(cand["c_ab"].to_numpy(np.int64)),
        "score_ppb": pa.array(cand["score_ppb"].to_numpy(np.int64)),
    })


# ---------------------------------------------------------------------------
# Deterministic source-interleaved training order
# ---------------------------------------------------------------------------

def shard_interleave_plan(sf_dir: str):
    """(doc_id, source, src_rank, global_pos): deterministic
    source-interleaved training order — every doc gets an exact
    per-source rank by the frozen md5-u64 of 'ilv:<doc_id>' (a
    deterministic shuffle within each source) and a global position
    on the round-robin grid global_pos = src_rank * n_sources +
    source_idx, so a loader reading positions in order sees sources
    interleaved 1:1:...:1 (gaps where a source has exhausted are
    skipped by the loader; the grid keeps positions stable under
    source growth). The data-ORDERING twin of the mixture plan: what
    to feed when, not just how much.

    Shape: exact per-source ranks WITHOUT a per-source global sort —
    the shard_plan histogram-rank pattern keyed on (source, top hash
    byte): a bounded |sources| x 256 count aggregate gives each
    (source, byte) cell its start offset; one shuffle on the same
    compound key ranks rows locally by (hash, doc_id); hot cells
    sub-bucket by the next byte at 100 TB (same pattern one level
    down)."""
    from ray.data.aggregate import Sum
    from dataquality_ray.spec import token_hash_u64

    slim = _docs(sf_dir, columns=["doc_id", "source"]).materialize()

    def with_hash(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        hv = np.fromiter(
            (token_hash_u64(f"ilv:{i}") for i in ids),
            dtype=np.uint64, count=len(ids))
        return pa.table({
            "doc_id": batch["doc_id"],
            "source": batch["source"],
            "hv": pa.array(hv.view(np.int64)),
            "hb": pa.array((hv >> np.uint64(56)).astype(np.int64)),
        })

    hashed = slim.map_batches(with_hash, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    hist = (hashed.map_batches(
        lambda t: pl.from_arrow(t.select(["source", "hb"]))
        .group_by(["source", "hb"]).agg(n=pl.len().cast(pl.Int64))
        .to_arrow(), batch_format="pyarrow")
        .groupby(["source", "hb"]).aggregate(Sum("n", alias_name="n"))
        .to_pandas())               # <= |sources| * 256 rows
    hist = hist.sort_values(["source", "hb"], kind="mergesort")
    starts = (hist["n"].cumsum() - hist["n"]).to_numpy(np.int64)
    src_base = hist.groupby("source", sort=True)["n"].sum() \
        .cumsum().shift(fill_value=0)
    # per-(source, byte) start offset WITHIN the source
    offs = {}
    for (s, hb), st in zip(zip(hist["source"], hist["hb"]), starts):
        offs[(s, int(hb))] = int(st) - int(src_base[s])
    sources = sorted(src_base.index.tolist())
    sidx = {s: i for i, s in enumerate(sources)}
    n_src = len(sources)

    def rank_group(t: pa.Table) -> pa.Table:
        s = t["source"][0].as_py()
        hb = int(t["hb"][0].as_py())
        hv = t["hv"].to_numpy(zero_copy_only=False).view(np.uint64)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, hv))
        rank = np.empty(len(ids), dtype=np.int64)
        rank[order] = offs[(s, hb)] + np.arange(len(ids),
                                                dtype=np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "source": t["source"],
            "src_rank": pa.array(rank),
            "global_pos": pa.array(rank * n_src + sidx[s]),
        })

    return (hashed.groupby(["source", "hb"])
            .map_groups(rank_group, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# Temperature-sweep mixture weights (tau in {1, 3/4, 1/2, 1/4})
# ---------------------------------------------------------------------------

# Exact-parity temperature ladder: every rung is defined by nested
# floor(sqrt(double)) compositions (IEEE sqrt is correctly rounded and
# double products round identically in numpy and DuckDB, the
# source_mixture_weights precedent) — never a float pow(), whose libm
# result is engine-dependent. With K = MIXTURE_SQRT_SCALE:
#   tau=1     : c
#   tau=1/2   : m = floor(sqrt(c * K))
#   tau=1/4   : floor(sqrt(m * K))      ~ K^(3/4) * c^(1/4)
#   tau=3/4   : floor(sqrt(c * m))      ~ K^(1/4) * c^(3/4)
MIXTURE_TAUS_MILLI = (250, 500, 750, 1000)


def mixture_temperature_sweep(sf_dir: str):
    """(tau_milli, source, sum_chars, weight_ppm): the data-mixture
    temperature sweep — per-source sampling weights w_s proportional to
    size^tau for tau in {1/4, 1/2, 3/4, 1}, the knob every multi-domain
    training run tunes (tau=1 reproduces natural proportions, lower tau
    flattens toward uniform; tau=1/2 is source_mixture_weights). Exact
    integers end-to-end: the tau ladder is nested floor(sqrt(·))
    compositions (see MIXTURE_TAUS_MILLI), normalization is trunc-div
    ppm per tau. One constant-size per-source aggregate; the sweep
    itself is driver arithmetic over |sources| rows."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, columns=["source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        g = (pl.DataFrame({
            "source": pl.from_arrow(batch["source"]),
            "c": pl.from_arrow(batch["n_chars"]),
        }).group_by("source").agg(c=pl.col("c").sum()))
        return g.to_arrow().cast(pa.schema([
            ("source", pa.string()), ("c", pa.int64())]))

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("source").aggregate(Sum("c", alias_name="c"))
           .to_pandas().sort_values("source", kind="mergesort"))
    c = agg["c"].to_numpy(dtype=np.int64)
    cf = c.astype(np.float64)
    kf = float(MIXTURE_SQRT_SCALE)
    m = np.floor(np.sqrt(cf * kf)).astype(np.int64)
    rungs = {
        250: np.floor(np.sqrt(m.astype(np.float64) * kf))
        .astype(np.int64),
        500: m,
        750: np.floor(np.sqrt(cf * m.astype(np.float64)))
        .astype(np.int64),
        1000: c,
    }
    taus, srcs, chars, ppm = [], [], [], []
    for tau in MIXTURE_TAUS_MILLI:
        s = rungs[tau]
        tot = max(int(s.sum()), 1)
        taus.extend([tau] * len(agg))
        srcs.extend(agg["source"].tolist())
        chars.extend(c.tolist())
        ppm.extend((s.astype(object) * MIXTURE_PPM // tot).tolist())
    return pa.table({
        "tau_milli": pa.array(taus, pa.int64()),
        "source": pa.array(srcs, pa.string()),
        "sum_chars": pa.array(chars, pa.int64()),
        "weight_ppm": pa.array([int(x) for x in ppm], pa.int64()),
    })


# ---------------------------------------------------------------------------
# Heaps-law vocabulary growth curve from nested hash samples
# ---------------------------------------------------------------------------

VOCAB_SAMPLE_MOD = 256
VOCAB_SAMPLE_KEEPS = (1, 4, 16, 64, 256)


def vocab_growth_curve(sf_dir: str, num_buckets: int = 0):
    """(sample_keep, n_docs, n_tokens, n_vocab): the Heaps-law
    vocabulary growth curve from nested deterministic doc-hash
    samples — how fast does distinct vocabulary grow as the corpus
    grows? The tokenizer-planning twin of sampled_dup_rate: run the
    1/256 sample at 100 TB to extrapolate vocab size before training a
    tokenizer; the last row (keep = MOD) is the exact full-corpus
    answer, so convergence is visible and hash-checkable. A doc is in
    sample k iff md5_u64(str(doc_id)) % MOD < k (nested by
    construction); a token is in sample-k vocabulary iff the MIN
    sample key over its containing docs is < k.

    Scale shape: vocabulary grows with the corpus, so per-token MIN
    keys never meet a Ray aggregate — per-batch polars group-min per
    token (dedup before hashing), ONE token-hash bucket shuffle of
    slim (part, u64, key) rows, bucket-local exact MIN + a |KEEPS|-row
    cumulative histogram; per-key doc/token totals ride the same
    discriminated union as constant-size (256-row) partials."""
    from dataquality_ray.arrowutil import md5_digests
    from dataquality_ray.stages.bucketing import cluster_buckets
    from dataquality_ray.spec import token_hash_u64

    nb = num_buckets or cluster_buckets()
    docs = _docs(sf_dir, columns=["doc_id", "text"])
    schema = pa.schema([
        ("part", pa.int32()), ("hh", pa.int64()),
        ("key", pa.int64()), ("n", pa.int64()),
        ("kind", pa.int8())])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        keys = np.fromiter(
            (token_hash_u64(str(i)) % VOCAB_SAMPLE_MOD for i in ids),
            dtype=np.int64, count=len(ids))
        df = (pl.from_arrow(batch.select(["text"]))
              .with_columns(key=pl.Series(keys),
                            toks=pl.col("text").fill_null("")
                            .str.to_lowercase()
                            .str.extract_all(TOKEN_PATTERN)))
        # constant-size per-key doc/token totals (kind 1)
        tot = (df.group_by("key")
               .agg(nd=pl.len().cast(pl.Int64),
                    nt=pl.col("toks").list.len().cast(pl.Int64)
                    .sum()))
        # per-token min key within the batch (kind 0)
        e = (df.select(["key", "toks"]).explode("toks")
             .drop_nulls("toks")
             .group_by("toks").agg(key=pl.col("key").min()))
        digs = md5_digests(e["toks"].to_arrow())
        if digs:
            hh = np.frombuffer(b"".join(digs),
                               dtype="<u8").reshape(-1, 2)[:, 0]
        else:
            hh = np.zeros(0, dtype=np.uint64)
        k0 = pa.table({
            "part": pa.array((hh % nb).astype(np.int32)),
            "hh": pa.array(hh.view(np.int64)),
            "key": e["key"].to_arrow(),
            "n": pa.array(np.zeros(len(e), dtype=np.int64)),
            "kind": pa.array(np.zeros(len(e), dtype=np.int8)),
        }).cast(schema)
        k1a = pa.table({
            "part": pa.array(np.zeros(len(tot), dtype=np.int32)),
            "hh": pa.array(np.zeros(len(tot), dtype=np.int64)),
            "key": tot["key"].to_arrow(),
            "n": tot["nd"].to_arrow(),
            "kind": pa.array(np.full(len(tot), 1, dtype=np.int8)),
        }).cast(schema)
        k1b = pa.table({
            "part": pa.array(np.zeros(len(tot), dtype=np.int32)),
            "hh": pa.array(np.zeros(len(tot), dtype=np.int64)),
            "key": tot["key"].to_arrow(),
            "n": tot["nt"].to_arrow(),
            "kind": pa.array(np.full(len(tot), 2, dtype=np.int8)),
        }).cast(schema)
        return pa.concat_tables([k0, k1a, k1b])

    def scan(t: pa.Table) -> pa.Table:
        d = pl.from_arrow(t.select(["hh", "key", "n", "kind"]))
        vocab = (d.filter(pl.col("kind") == 0)
                 .group_by("hh").agg(mk=pl.col("key").min()))
        rows = []
        for k in VOCAB_SAMPLE_KEEPS:
            nv = int((vocab["mk"] < k).sum()) if len(vocab) else 0
            sub = d.filter(pl.col("key") < k)
            nd = int(sub.filter(pl.col("kind") == 1)["n"].sum() or 0)
            nt = int(sub.filter(pl.col("kind") == 2)["n"].sum() or 0)
            rows.append((k, nd, nt, nv))
        return pa.table({
            "sample_keep": pa.array([r[0] for r in rows], pa.int64()),
            "nd": pa.array([r[1] for r in rows], pa.int64()),
            "nt": pa.array([r[2] for r in rows], pa.int64()),
            "nv": pa.array([r[3] for r in rows], pa.int64()),
        })

    from ray.data.aggregate import Sum
    agg = (docs.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
           .groupby("part").map_groups(scan, batch_format="pyarrow")
           .groupby("sample_keep")
           .aggregate(Sum("nd", alias_name="n_docs"),
                      Sum("nt", alias_name="n_tokens"),
                      Sum("nv", alias_name="n_vocab"))
           .to_pandas().sort_values("sample_keep", kind="mergesort"))
    return pa.table({
        "sample_keep": pa.array(
            agg["sample_keep"].to_numpy(np.int64)),
        "n_docs": pa.array(agg["n_docs"].to_numpy(np.int64)),
        "n_tokens": pa.array(agg["n_tokens"].to_numpy(np.int64)),
        "n_vocab": pa.array(agg["n_vocab"].to_numpy(np.int64)),
    })


# ---------------------------------------------------------------------------
# Compute-optimal token-budget planning (Chinchilla ratios)
# ---------------------------------------------------------------------------

# Candidate model sizes and the compute-optimal tokens-per-parameter
# ratio (~20, Hoffmann et al. 2022). FLOPs ~ 6 * params * tokens,
# reported in units of 1e15 (peta) with exact Python-int products (the
# 6*N*D product overflows int64 at 100-TB corpora). Interpolated into
# the oracle.
BUDGET_MODEL_PARAMS = (125_000_000, 1_300_000_000, 13_000_000_000)
BUDGET_TOKENS_PER_PARAM = 20


def token_budget_plan(sf_dir: str):
    """(model_params, corpus_tokens, needed_tokens, epochs_milli,
    flops_peta): compute-optimal training-budget planning — for each
    candidate model size, the Chinchilla-ratio token requirement
    (20 tokens/param), how many corpus epochs that implies
    (floor-milli; >1000 means the corpus must repeat), and the exact
    compute cost of one compute-optimal run in peta-FLOPs. The "is
    this corpus big enough for that model" datasheet row. One
    constant-size token-count aggregate; the plan is driver
    arithmetic in unbounded Python ints."""
    from ray.data.aggregate import Sum

    docs = _docs(sf_dir, columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        n = (pl.from_arrow(batch.select(["text"]))
             .select(n=pl.col("text").fill_null("")
                     .str.to_lowercase()
                     .str.count_matches(TOKEN_PATTERN)
                     .cast(pl.Int64).sum()))["n"][0]
        return pa.table({"n": pa.array([int(n or 0)], pa.int64())})

    tot = int(docs.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
              .aggregate(Sum("n", alias_name="n"))["n"])
    rows = []
    for p in BUDGET_MODEL_PARAMS:
        need = p * BUDGET_TOKENS_PER_PARAM
        epochs = 1000 * need // max(tot, 1)
        flops = 6 * p * need // 10 ** 15
        rows.append((p, tot, need, epochs, flops))
    return pa.table({
        "model_params": pa.array([r[0] for r in rows], pa.int64()),
        "corpus_tokens": pa.array([r[1] for r in rows], pa.int64()),
        "needed_tokens": pa.array([r[2] for r in rows], pa.int64()),
        "epochs_milli": pa.array([r[3] for r in rows], pa.int64()),
        "flops_peta": pa.array([r[4] for r in rows], pa.int64()),
    })


# ---------------------------------------------------------------------------
# Inverted-index posting-list export (bounded head + exact df)
# ---------------------------------------------------------------------------

POSTING_HEAD_K = 20


def term_posting_lists(sf_dir: str):
    """(term, df, posting_head): inverted-index export for the
    SEARCH_TERMS dictionary — exact document frequency plus the first
    POSTING_HEAD_K doc_ids (ascending, comma-joined) of each term's
    posting list: the bounded "index shard sample" a search layer
    materializes. Lists cross a shuffle as delimited strings (Acero
    joins reject list payloads — CLAUDE.md).

    Scale shape: a common term's full posting list is
    corpus-proportional, so it never ships — per-batch partials
    pre-reduce to (term, local df, local smallest-K ids); the final
    per-term merge sees #batches * K ids, never the corpus."""
    docs = _docs(sf_dir, columns=["doc_id", "text"])
    terms = list(SEARCH_TERMS)

    def partial(batch: pa.Table) -> pa.Table:
        df = (pl.from_arrow(batch.select(["doc_id", "text"]))
              .with_columns(toks=pl.col("text").fill_null("")
                            .str.to_lowercase()
                            .str.extract_all(TOKEN_PATTERN)))
        out = []
        for t in terms:
            hit = df.filter(pl.col("toks").list.contains(t))
            ids = np.sort(hit["doc_id"].to_numpy())
            out.append((t, len(ids),
                        ",".join(str(i)
                                 for i in ids[:POSTING_HEAD_K])))
        return pa.table({
            "term": pa.array([o[0] for o in out], pa.string()),
            "df_n": pa.array([o[1] for o in out], pa.int64()),
            "head": pa.array([o[2] for o in out], pa.string()),
        })

    def merge(t: pa.Table) -> pa.Table:
        term = t["term"][0].as_py()
        dfn = int(pc.sum(t["df_n"]).as_py() or 0)
        ids = sorted({int(x) for h in t["head"].to_pylist()
                      if h for x in h.split(",")})
        return pa.table({
            "term": pa.array([term], pa.string()),
            "df": pa.array([dfn], pa.int64()),
            "posting_head": pa.array(
                [",".join(str(i) for i in ids[:POSTING_HEAD_K])],
                pa.string()),
        })

    return (docs.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("term").map_groups(merge, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# Hard-negative mining over embeddings (contrastive training prep)
# ---------------------------------------------------------------------------

HARD_NEG_K = 5


def hard_negative_topk_embeddings(sf_dir: str):
    """(query_id, query_label, vec_id, neg_label, cosine_sim, rank):
    hard-negative mining for contrastive training — for each query
    vector, the top-K most similar vectors with a DIFFERENT label
    (the negatives closest to the decision boundary, which carry the
    training signal). Same broadcast + per-batch partial top-k +
    distributed reduce topology as cosine_topk (the hash-checked
    ann_topk recipe: normalize-then-dot, round-6, (sim desc, vec_id)
    ties), with the label constraint applied inside each batch."""
    from dataquality_ray.stages.similarity import (
        _as_matrix,
        _normalize,
        reduce_topk,
    )

    ds = _emb(sf_dir)
    qset = set(int(q) for q in ANN_QUERY_IDS)

    def grab(batch: pa.Table) -> pa.Table:
        mask = pa.array([int(v) in qset
                         for v in batch["vec_id"].to_pylist()])
        return batch.filter(mask)

    q_tab = ds.map_batches(grab, batch_format="pyarrow").to_pandas()
    q_ids = q_tab["vec_id"].to_numpy(dtype=np.int64)
    q_lab = q_tab["label"].to_numpy(dtype=np.int64)
    q_mat = _normalize(np.stack(
        [np.asarray(e, dtype=np.float64)
         for e in q_tab["embedding"]]))
    order = np.argsort(q_ids)
    q_ids, q_lab, q_mat = q_ids[order], q_lab[order], q_mat[order]
    ref = ray.put((q_ids, q_lab, q_mat))

    def partial(batch: pa.Table) -> pa.Table:
        ids_q, lab_q, mat_q = ray.get(ref)
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        labs = np.asarray(batch["label"].to_pylist(), dtype=np.int64)
        m = _normalize(_as_matrix(batch["embedding"]))
        sims = m @ mat_q.T
        oq, oql, ov, onl, os_ = [], [], [], [], []
        for qi in range(len(ids_q)):
            cand = np.flatnonzero(labs != lab_q[qi])
            if not len(cand):
                continue
            col = sims[:, qi]
            top = cand[np.argsort(-col[cand],
                                  kind="stable")[:HARD_NEG_K]]
            oq.extend([int(ids_q[qi])] * len(top))
            oql.extend([int(lab_q[qi])] * len(top))
            ov.extend(ids[top].tolist())
            onl.extend(labs[top].tolist())
            os_.extend(col[top].tolist())
        return pa.table({
            "query_id": pa.array(oq, pa.int64()),
            "query_label": pa.array(oql, pa.int64()),
            "vec_id": pa.array(ov, pa.int64()),
            "neg_label": pa.array(onl, pa.int64()),
            "cosine_sim": pa.array(os_, pa.float64()),
        })

    return reduce_topk(
        ds.map_batches(partial, batch_format="pyarrow"), HARD_NEG_K)


# ---------------------------------------------------------------------------
# k-NN label probe (embedding-quality evaluation)
# ---------------------------------------------------------------------------

KNN_PROBE_N = 64


def knn_label_probe(sf_dir: str):
    """(query_label, nn_label, n_queries): 1-nearest-neighbor label
    confusion over a BOUNDED deterministic probe set — the cheap
    "are these embeddings any good" evaluation: pick the
    KNN_PROBE_N vectors with the smallest frozen md5-u64(str(vec_id))
    (a fixed-size sample at any corpus scale, unlike a fixed-RATE
    sample whose query count grows with the corpus), find each
    probe's nearest other vector, and tabulate query-label vs
    neighbor-label on the dense label grid (the empty-result spine
    rule). High diagonal mass = labels are linearly recoverable from
    the embedding geometry.

    Shape: probe selection is a per-batch smallest-N pre-reduce
    (#batches * N rows to the driver); scoring is one broadcast scan
    with per-batch top-1 partials and the distributed reduce_topk
    fold; the confusion aggregate is |labels|^2."""
    from dataquality_ray.spec import token_hash_u64
    from dataquality_ray.stages.similarity import (
        _as_matrix,
        _normalize,
        reduce_topk,
    )

    ds = _emb(sf_dir)

    def probe_partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        hv = np.fromiter((token_hash_u64(str(i)) for i in ids),
                         dtype=np.uint64, count=len(ids))
        top = np.lexsort((ids, hv))[:KNN_PROBE_N]
        return pa.table({
            "vec_id": pa.array(ids[top]),
            "hv": pa.array(hv[top].view(np.int64)),
        })

    cand = (ds.map_batches(probe_partial, batch_format="pyarrow")
            .to_pandas())
    hv = cand["hv"].to_numpy().view(np.uint64)
    ids = cand["vec_id"].to_numpy(dtype=np.int64)
    probe_ids = set(
        ids[np.lexsort((ids, hv))[:KNN_PROBE_N]].tolist())

    def grab(batch: pa.Table) -> pa.Table:
        mask = pa.array([int(v) in probe_ids
                         for v in batch["vec_id"].to_pylist()])
        return batch.filter(mask)

    q_tab = ds.map_batches(grab, batch_format="pyarrow").to_pandas()
    q_ids = q_tab["vec_id"].to_numpy(dtype=np.int64)
    q_lab = q_tab["label"].to_numpy(dtype=np.int64)
    q_mat = _normalize(np.stack(
        [np.asarray(e, dtype=np.float64)
         for e in q_tab["embedding"]]))
    order = np.argsort(q_ids)
    q_ids, q_lab, q_mat = q_ids[order], q_lab[order], q_mat[order]
    qlab_of = dict(zip(q_ids.tolist(), q_lab.tolist()))
    ref = ray.put((q_ids, q_mat))

    def partial(batch: pa.Table) -> pa.Table:
        ids_q, mat_q = ray.get(ref)
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        labs = np.asarray(batch["label"].to_pylist(), dtype=np.int64)
        m = _normalize(_as_matrix(batch["embedding"]))
        sims = m @ mat_q.T
        oq, ov, onl, os_ = [], [], [], []
        for qi in range(len(ids_q)):
            cand_i = np.flatnonzero(ids != ids_q[qi])
            if not len(cand_i):
                continue
            col = sims[:, qi]
            top = cand_i[np.argsort(-col[cand_i], kind="stable")[:1]]
            oq.extend([int(ids_q[qi])] * len(top))
            ov.extend(ids[top].tolist())
            onl.extend(labs[top].tolist())
            os_.extend(col[top].tolist())
        return pa.table({
            "query_id": pa.array(oq, pa.int64()),
            "vec_id": pa.array(ov, pa.int64()),
            "nn_label": pa.array(onl, pa.int64()),
            "cosine_sim": pa.array(os_, pa.float64()),
        })

    nn = reduce_topk(
        ds.map_batches(partial, batch_format="pyarrow"), 1) \
        .to_pandas()
    nn["query_label"] = nn["query_id"].map(qlab_of).astype(np.int64)

    def lab_partial(batch: pa.Table) -> pa.Table:
        v = np.unique(np.asarray(batch["label"].to_pylist(),
                                 dtype=np.int64))
        return pa.table({"label": pa.array(v)})

    labels = sorted(set(
        ds.map_batches(lab_partial, batch_format="pyarrow")
        .to_pandas()["label"].tolist()))
    got = (nn.groupby(["query_label", "nn_label"])
           .size().to_dict())
    rows = [(a, b, int(got.get((a, b), 0)))
            for a in labels for b in labels]
    return pa.table({
        "query_label": pa.array([r[0] for r in rows], pa.int64()),
        "nn_label": pa.array([r[1] for r in rows], pa.int64()),
        "n_queries": pa.array([r[2] for r in rows], pa.int64()),
    })


# ---------------------------------------------------------------------------
# Content-defined chunking (token-level CDC, rsync/LBFS rule)
# ---------------------------------------------------------------------------

CDC_MOD = 16    # expected chunk length = CDC_MOD tokens


def cdc_chunk_documents(sf_dir: str):
    """(doc_id, n_tokens, n_chunks, first_boundary,
    max_chunk_tokens, avg_chunk_tokens_milli): content-defined
    chunking — a chunk boundary falls AFTER every token whose frozen
    md5-u64 hash is ≡ 0 (mod CDC_MOD), the rsync/LBFS rule at token
    granularity: insertions shift at most the chunk they land in, so
    chunk hashes are the shift-resistant dedup unit (fixed-stride
    chunking breaks every downstream chunk). Emits the per-doc chunk
    geometry a CDC-dedup store plans with; first_boundary is the
    0-based position of the first boundary token (-1 if none).

    Zero shuffle: boundary detection and the per-doc segment fold are
    batch-local (fused row-local rule) — exploded token hashes,
    numpy segment arithmetic (reduceat over doc ranges), no Python
    per-row loop."""
    from dataquality_ray.arrowutil import md5_digests

    docs = _docs(sf_dir, columns=["doc_id", "text"])

    def scan(batch: pa.Table) -> pa.Table:
        df = (pl.from_arrow(batch.select(["doc_id", "text"]))
              .with_columns(toks=pl.col("text").fill_null("")
                            .str.to_lowercase()
                            .str.extract_all(TOKEN_PATTERN)))
        ids = df["doc_id"].to_numpy().astype(np.int64)
        nt = df["toks"].list.len().fill_null(0).to_numpy() \
            .astype(np.int64)
        e = (df.select("toks").with_row_index("rid")
             .explode("toks").drop_nulls("toks"))
        n_docs = len(ids)
        out_nt = nt
        out_nc = np.zeros(n_docs, dtype=np.int64)
        out_fb = np.full(n_docs, -1, dtype=np.int64)
        out_mx = np.zeros(n_docs, dtype=np.int64)
        if len(e):
            rid = e["rid"].to_numpy().astype(np.int64)
            digs = md5_digests(e["toks"].to_arrow())
            hh = np.frombuffer(b"".join(digs),
                               dtype="<u8").reshape(-1, 2)[:, 0]
            bnd = (hh % CDC_MOD) == 0
            # position within doc (contiguous rid runs)
            starts = np.zeros(len(rid), dtype=np.int64)
            change = np.flatnonzero(rid[1:] != rid[:-1]) + 1
            starts[change] = change
            np.maximum.accumulate(starts, out=starts)
            pos = np.arange(len(rid), dtype=np.int64) - starts
            doc_starts = np.zeros(n_docs, dtype=np.int64)
            present = np.flatnonzero(nt > 0)
            doc_starts[present] = np.concatenate(
                ([0], np.cumsum(nt[present])[:-1]))
            # boundary count + first boundary per doc
            red = np.add.reduceat(bnd.astype(np.int64),
                                  doc_starts[present])
            out_nc[present] = red
            fb = np.full(len(present), -1, dtype=np.int64)
            bidx = np.flatnonzero(bnd)
            if len(bidx):
                first = np.searchsorted(bidx, doc_starts[present])
                ends = doc_starts[present] + nt[present]
                has = (first < len(bidx)) & \
                    (bidx[np.minimum(first, len(bidx) - 1)]
                     < ends)
                fb[has] = pos[bidx[np.minimum(
                    first, len(bidx) - 1)][has]]
            out_fb[present] = fb
            # trailing partial chunk: last token of the doc is not a
            # boundary -> one extra chunk
            last_idx = doc_starts[present] + nt[present] - 1
            trailing = ~bnd[last_idx]
            out_nc[present] += trailing.astype(np.int64)
            # max chunk length: segment ends = boundary pos+1 plus
            # (for docs whose last token is not a boundary) the
            # trailing end nt; chunk lengths = within-doc diffs from 0
            end_rid = np.concatenate((rid[bnd], present[trailing]))
            end_val = np.concatenate((pos[bnd] + 1,
                                      nt[present][trailing]))
            order = np.lexsort((end_val, end_rid))
            er, ev = end_rid[order], end_val[order]
            if len(er):
                prev = np.zeros(len(ev), dtype=np.int64)
                prev[1:] = ev[:-1]
                seg_start = np.empty(len(er), dtype=bool)
                seg_start[0] = True
                seg_start[1:] = er[1:] != er[:-1]
                prev[seg_start] = 0
                lengths = ev - prev
                grp = np.flatnonzero(seg_start)
                mx = np.maximum.reduceat(lengths, grp)
                out_mx[er[grp]] = mx
        avg = np.where(out_nc > 0, 1000 * out_nt //
                       np.maximum(out_nc, 1), 0)
        return pa.table({
            "doc_id": pa.array(ids),
            "n_tokens": pa.array(out_nt),
            "n_chunks": pa.array(out_nc),
            "first_boundary": pa.array(out_fb),
            "max_chunk_tokens": pa.array(out_mx),
            "avg_chunk_tokens_milli": pa.array(avg.astype(np.int64)),
        })

    return docs.map_batches(scan, batch_format="pyarrow",
                            zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Multi-round distributed BPE trainer (word-frequency formulation)
# ---------------------------------------------------------------------------

# Training constants. Merge APPLICATION is pinned as BPE_APPLY_PASSES
# nested non-overlapping left-to-right literal replaces over the
# space-delimited symbol string (' a b ' -> ' ab '): Python
# str.replace and DuckDB replace() share that exact semantic, so the
# whole K-round trainer is value-hash-checkable; a single replace pass
# can miss alternating overlaps (shared delimiter space), which the
# repeated passes close for any word up to ~2^PASSES symbols.
BPE_TRAIN_ROUNDS = 4
BPE_APPLY_PASSES = 8


def bpe_train_merges(sf_dir: str, num_buckets: int = 0):
    """(round, sym_a, sym_b, merged, pair_count): a REAL multi-round
    BPE trainer (Sennrich et al. 2016) in the word-frequency
    formulation every production tokenizer trainer uses: ONE corpus
    pass collapses to an exact (word, freq) table — vocabulary-sized,
    not corpus-sized — and all K merge rounds run over that table
    (count weighted adjacent symbol pairs -> pick the global argmax
    pair (count desc, symbols asc) -> apply the merge). The corpus is
    never re-read after pass 1; token_bigram_merges is the one-round
    preview, this is the trainer.

    Scale shape: word frequencies via per-batch counts + one
    word-hash bucket shuffle (every word in exactly one bucket);
    each round is a vocabulary-sized pair aggregate (pair space is
    bounded by the symbol vocabulary, not the corpus), a driver
    argmax over that small table, and a broadcast batch-local merge
    apply; the word table is re-materialized per round (K cheap
    materializations of vocab-sized data)."""
    from ray.data.aggregate import Sum

    from dataquality_ray.arrowutil import md5_digests
    from dataquality_ray.stages.bucketing import cluster_buckets

    nb = num_buckets or cluster_buckets()
    docs = _docs(sf_dir, columns=["text"])

    def wcount(batch: pa.Table) -> pa.Table:
        g = (pl.from_arrow(batch.select(["text"]))
             .with_columns(toks=pl.col("text").fill_null("")
                           .str.to_lowercase()
                           .str.extract_all(TOKEN_PATTERN))
             .select("toks").explode("toks").drop_nulls("toks")
             .group_by("toks").agg(c=pl.len().cast(pl.Int64)))
        digs = md5_digests(g["toks"].to_arrow())
        hh = (np.frombuffer(b"".join(digs), dtype="<u8")
              .reshape(-1, 2)[:, 0] % nb).astype(np.int32) \
            if digs else np.zeros(0, dtype=np.int32)
        return pa.table({
            "part": pa.array(hh),
            "word": g["toks"].to_arrow().cast(pa.string()),
            "freq": g["c"].to_arrow(),
        })

    def wsum(t: pa.Table) -> pa.Table:
        g = (pl.from_arrow(t.select(["word", "freq"]))
             .group_by("word").agg(freq=pl.col("freq").sum()))
        sp = (" " + g["word"].str.split("").list.join(" ") + " ")
        return pa.table({
            "sp": sp.to_arrow().cast(pa.string()),
            "freq": g["freq"].to_arrow(),
        })

    wf = (docs.map_batches(wcount, batch_format="pyarrow",
                           zero_copy_batch=True)
          .groupby("part").map_groups(wsum, batch_format="pyarrow")
          .materialize())

    def pair_partial(batch: pa.Table) -> pa.Table:
        df = (pl.from_arrow(batch.select(["sp", "freq"]))
              .with_columns(syms=pl.col("sp")
                            .str.strip_chars(" ").str.split(" ")))
        e = (df.select(["freq", "syms"]).with_row_index("rid")
             .explode("syms"))
        e = (e.with_columns(b=pl.col("syms").shift(-1),
                            r2=pl.col("rid").shift(-1))
             .filter(pl.col("rid") == pl.col("r2")))
        g = (e.group_by(["syms", "b"])
             .agg(c=pl.col("freq").sum())
             .rename({"syms": "a"}))
        return g.to_arrow().cast(pa.schema([
            ("a", pa.string()), ("b", pa.string()),
            ("c", pa.int64())]))

    merges = []
    for rnd in range(1, BPE_TRAIN_ROUNDS + 1):
        pairs = (wf.map_batches(pair_partial, batch_format="pyarrow")
                 .groupby(["a", "b"]).aggregate(Sum("c",
                                                    alias_name="c"))
                 .to_pandas())
        if not len(pairs):
            break
        pairs = pairs.sort_values(["c", "a", "b"],
                                  ascending=[False, True, True],
                                  kind="mergesort")
        a, b, c = (pairs.iloc[0]["a"], pairs.iloc[0]["b"],
                   int(pairs.iloc[0]["c"]))
        merges.append((rnd, a, b, a + b, c))
        pat, rep = f" {a} {b} ", f" {a}{b} "

        def apply(batch: pa.Table, pat=pat, rep=rep) -> pa.Table:
            # vectorized: polars replace_all(literal) shares the
            # non-overlapping left-to-right semantic with Python
            # str.replace and DuckDB replace (pinned by test)
            s = pl.from_arrow(batch["sp"])
            for _ in range(BPE_APPLY_PASSES):
                s = s.str.replace_all(pat, rep, literal=True)
            return pa.table({
                "sp": s.to_arrow().cast(pa.string()),
                "freq": batch["freq"],
            })

        wf = wf.map_batches(apply,
                            batch_format="pyarrow").materialize()

    return pa.table({
        "round": pa.array([m[0] for m in merges], pa.int64()),
        "sym_a": pa.array([m[1] for m in merges], pa.string()),
        "sym_b": pa.array([m[2] for m in merges], pa.string()),
        "merged": pa.array([m[3] for m in merges], pa.string()),
        "pair_count": pa.array([m[4] for m in merges], pa.int64()),
    })


# ---------------------------------------------------------------------------
# Declared-vs-predicted language confusion matrix
# ---------------------------------------------------------------------------

LANG_PRED_DOMAIN = ("de", "en", "es", "fr", "und")


def lang_confusion_matrix(sf_dir: str):
    """(declared_lang, pred_lang, n_docs): the full declared-label vs
    classifier confusion GRID — langid_mismatch_by_source tells you
    WHICH source lies about language; this tells you HOW it lies
    (e.g. 'zh' declared, 'und' predicted = the classifier has no
    marker coverage; 'es' declared, 'en' predicted = mixed crawl).
    Dense spine: every (distinct declared lang) x (the 5-value
    classifier domain) cell is emitted, zero-filled (the empty-result
    rule), so the grid shape is identical on both engines.

    Zero data shuffle: batch-local classify (the pinned
    stopword-marker classifier shared with langid_documents) +
    (declared, pred) integer partials into a |langs| x 5 aggregate."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, columns=["lang", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        pred = _pred_lang_of(batch["text"])
        g = (pl.DataFrame({
            "declared_lang": pl.from_arrow(batch["lang"]),
            "pred_lang": pred,
        }).group_by(["declared_lang", "pred_lang"])
            .agg(n=pl.len().cast(pl.Int64)))
        return g.to_arrow().cast(pa.schema([
            ("declared_lang", pa.string()),
            ("pred_lang", pa.string()), ("n", pa.int64())]))

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["declared_lang", "pred_lang"])
           .aggregate(Sum("n", alias_name="n"))
           .to_pandas())
    got = {(d, p): int(n) for d, p, n in zip(
        agg["declared_lang"], agg["pred_lang"], agg["n"])}
    declared = sorted(set(agg["declared_lang"].tolist()))
    rows = [(d, p, got.get((d, p), 0))
            for d in declared for p in LANG_PRED_DOMAIN]
    return pa.table({
        "declared_lang": pa.array([r[0] for r in rows], pa.string()),
        "pred_lang": pa.array([r[1] for r in rows], pa.string()),
        "n_docs": pa.array([r[2] for r in rows], pa.int64()),
    })


# ---------------------------------------------------------------------------
# Quality-decile x duplication cross-tabulation
# ---------------------------------------------------------------------------

def quality_vs_dup_matrix(sf_dir: str,
                          cfg: PipelineConfig = DEFAULT_CONFIG):
    """(decile, is_dup, n_docs): does duplication concentrate in
    low-quality text? Cross-tabulation of the NTILE(10) quality
    decile (doc_quality_deciles' exact histogram-rank rule) against
    exact-duplicate membership (the doc's normalized-text md5 group
    has more than one member — exact_dedup_documents' identity).
    The curation-insight table that decides whether dedup and
    quality filtering are redundant or complementary on a corpus.
    Dense 10x2 spine (the empty-result rule).

    Shape: the decile side reuses doc_quality_deciles (histogram
    ranking, one score shuffle); the dup side is one content-hash
    bucket shuffle with bucket-local group counts (every hash in
    exactly one bucket; at 100 TB empty-norm docs need the dedup_key
    skew guard — the sf tables have none); the two doc-keyed sides
    then co-shuffle on doc_id buckets as a discriminated union and
    the join + cell counts complete locally; final aggregate is
    <= 20 cells."""
    from ray.data.aggregate import Sum

    from dataquality_ray.arrowutil import md5_digests
    from dataquality_ray.spec import EDGE_WS_PATTERN, WS_PLUS_PATTERN
    from dataquality_ray.stages.bucketing import cluster_buckets

    nb = cluster_buckets()
    schema = pa.schema([
        ("part", pa.int32()), ("doc_id", pa.int64()),
        ("val", pa.int64()), ("kind", pa.int8())])

    # dup side: content-hash bucket shuffle -> (doc_id, is_dup)
    def hash_partial(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        norm = pc.replace_substring_regex(
            pc.replace_substring_regex(
                pc.utf8_lower(pc.coalesce(text, pa.scalar(""))),
                EDGE_WS_PATTERN, ""),
            WS_PLUS_PATTERN, " ")
        digs = md5_digests(norm)
        hh = np.frombuffer(b"".join(digs),
                           dtype="<u8").reshape(-1, 2)[:, 0] \
            if digs else np.zeros(0, dtype=np.uint64)
        return pa.table({
            "part": pa.array((hh % nb).astype(np.int32)),
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "hh": pa.array(hh.view(np.int64)),
        })

    def dup_scan(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["doc_id", "hh"]))
        cnt = df.group_by("hh").agg(n=pl.len())
        j = df.join(cnt, on="hh")
        return pa.table({
            "part": pa.array((j["doc_id"].to_numpy() % nb)
                             .astype(np.int32)),
            "doc_id": j["doc_id"].to_arrow().cast(pa.int64()),
            "val": pl.Series((j["n"] > 1).cast(pl.Int64))
            .to_arrow().cast(pa.int64()),
            "kind": pa.array(np.zeros(len(j), dtype=np.int8)),
        }).cast(schema)

    dup = (_docs(sf_dir, columns=["doc_id", "text"])
           .map_batches(hash_partial, batch_format="pyarrow",
                        zero_copy_batch=True)
           .groupby("part").map_groups(dup_scan,
                                       batch_format="pyarrow"))

    # decile side re-keyed by doc_id bucket
    def dec_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "part": pa.array((ids % nb).astype(np.int32)),
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "val": batch["decile"].cast(pa.int64()),
            "kind": pa.array(np.ones(len(ids), dtype=np.int8)),
        }).cast(schema)

    dec = doc_quality_deciles(sf_dir, cfg) \
        .map_batches(dec_rows, batch_format="pyarrow")

    def join_cells(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["doc_id", "val", "kind"]))
        d = (df.filter(pl.col("kind") == 0)
             .select(["doc_id", pl.col("val").alias("is_dup")]))
        q = (df.filter(pl.col("kind") == 1)
             .select(["doc_id", pl.col("val").alias("decile")]))
        g = (q.join(d, on="doc_id", how="inner")
             .group_by(["decile", "is_dup"])
             .agg(n=pl.len().cast(pl.Int64)))
        return g.to_arrow().cast(pa.schema([
            ("decile", pa.int64()), ("is_dup", pa.int64()),
            ("n", pa.int64())]))

    agg = (dup.union(dec)
           .groupby("part").map_groups(join_cells,
                                       batch_format="pyarrow")
           .groupby(["decile", "is_dup"])
           .aggregate(Sum("n", alias_name="n"))
           .to_pandas())
    got = {(int(d), int(f)): int(n) for d, f, n in zip(
        agg["decile"], agg["is_dup"], agg["n"])}
    rows = [(d, f, got.get((d, f), 0))
            for d in range(1, 11) for f in (0, 1)]
    return pa.table({
        "decile": pa.array([r[0] for r in rows], pa.int64()),
        "is_dup": pa.array([r[1] for r in rows], pa.int64()),
        "n_docs": pa.array([r[2] for r in rows], pa.int64()),
    })


# ---------------------------------------------------------------------------
# Per-source style fingerprint
# ---------------------------------------------------------------------------

def source_style_profile(sf_dir: str):
    """(source, n_chars, caps_ppm, digit_ppm, punct_ppm,
    avg_word_len_milli): the per-source STYLE fingerprint — exact
    floor-ppm ratios of uppercase, digit and
    non-alphanumeric-non-space characters plus the mean
    whitespace-token length, aggregated from integer per-batch
    partials. Sources cluster by register (shouting ALL-CAPS crawls,
    number-heavy tables, punctuation-soup logs) before any model
    scoring spends compute on them. Zero shuffle; |sources|-row
    aggregate."""
    from ray.data.aggregate import Sum

    from dataquality_ray.spec import WS_TOKEN_PATTERN

    docs = _docs(sf_dir, columns=["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        df = (pl.from_arrow(batch.select(["source", "text"]))
              .with_columns(t=pl.col("text").fill_null("")))
        t = pl.col("t")
        g = (df.group_by("source").agg(
            nc=t.str.len_chars().cast(pl.Int64).sum(),
            caps=t.str.count_matches("[A-Z]").cast(pl.Int64).sum(),
            dig=t.str.count_matches("[0-9]").cast(pl.Int64).sum(),
            punct=t.str.count_matches("[^A-Za-z0-9 \\t\\r\\n]")
            .cast(pl.Int64).sum(),
            wtok=t.str.count_matches(WS_TOKEN_PATTERN)
            .cast(pl.Int64).sum(),
            wchars=(t.str.len_chars()
                    - t.str.count_matches("[ \\t\\r\\n]"))
            .cast(pl.Int64).sum(),
        ))
        return g.to_arrow().cast(pa.schema([
            ("source", pa.string()), ("nc", pa.int64()),
            ("caps", pa.int64()), ("dig", pa.int64()),
            ("punct", pa.int64()), ("wtok", pa.int64()),
            ("wchars", pa.int64())]))

    agg = (docs.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
           .groupby("source")
           .aggregate(Sum("nc", alias_name="nc"),
                      Sum("caps", alias_name="caps"),
                      Sum("dig", alias_name="dig"),
                      Sum("punct", alias_name="punct"),
                      Sum("wtok", alias_name="wtok"),
                      Sum("wchars", alias_name="wchars"))
           .to_pandas().sort_values("source", kind="mergesort"))
    nc = agg["nc"].to_numpy(dtype=np.int64)
    d = np.maximum(nc, 1)
    wt = np.maximum(agg["wtok"].to_numpy(dtype=np.int64), 1)
    return pa.table({
        "source": pa.array(agg["source"].tolist(), pa.string()),
        "n_chars": pa.array(nc),
        "caps_ppm": pa.array(
            1_000_000 * agg["caps"].to_numpy(np.int64) // d),
        "digit_ppm": pa.array(
            1_000_000 * agg["dig"].to_numpy(np.int64) // d),
        "punct_ppm": pa.array(
            1_000_000 * agg["punct"].to_numpy(np.int64) // d),
        "avg_word_len_milli": pa.array(
            1000 * agg["wchars"].to_numpy(np.int64) // wt),
    })
