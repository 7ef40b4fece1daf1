"""Per-conversation aggregates with explicit hot-key salting.

The 10^12-turn framing makes single hot conversations (hundreds of
thousands of turns) a real shuffle hazard (SURVEY §7.3). The pattern here
is the canonical two-phase salted aggregate:

1. per-batch partial aggregation keyed on ``(conv_id, salt)`` where
   ``salt = turn_idx % cfg.salt_buckets`` — a hot conversation's rows
   split across ``salt_buckets`` reducer keys instead of one;
2. a second, tiny groupby over the salted partials merges them per
   conversation.

Every aggregate carried is mergeable (counts/sums/min/max), so the split
is lossless.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from dataquality_ray.config import DEFAULT_CONFIG, PipelineConfig
from dataquality_ray.arrowutil import from_pandas_clean
from dataquality_ray.stages.bucketing import cluster_buckets


def conv_stats(scored_ds, cfg: PipelineConfig = DEFAULT_CONFIG):
    """conv_id → n_turns, n_keep, avg_quality (integer mean), first/last
    turn index. Input: a scored dataset (quality_pipeline output or the
    scored checkpoint) — requires conv_id, turn_idx, keep,
    overall_quality_score."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "conv_id": batch["conv_id"].to_pylist(),
            "turn_idx": batch["turn_idx"].to_numpy(zero_copy_only=False),
            "keep": batch["keep"].to_numpy(zero_copy_only=False),
            "score": batch["overall_quality_score"].to_numpy(
                zero_copy_only=False),
        })
        df["salt"] = df["turn_idx"] % cfg.salt_buckets
        g = (df.groupby(["conv_id", "salt"], sort=False)
             .agg(n=("score", "size"),
                  n_keep=("keep", "sum"),
                  sum_score=("score", "sum"),
                  min_turn=("turn_idx", "min"),
                  max_turn=("turn_idx", "max"))
             .reset_index())
        return from_pandas_clean(g)

    # phase 1: salted partials (hot conversations split across reducers)
    salted = scored_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["conv_id", "salt"]).aggregate(
            Sum("n", alias_name="n"),
            Sum("n_keep", alias_name="n_keep"),
            Sum("sum_score", alias_name="sum_score"),
            Min("min_turn", alias_name="min_turn"),
            Max("max_turn", alias_name="max_turn"))

    # phase 2: merge the (tiny) salted aggregates per conversation
    merged = salted.groupby("conv_id").aggregate(
        Sum("n", alias_name="n_turns"),
        Sum("n_keep", alias_name="n_keep"),
        Sum("sum_score", alias_name="sum_score"),
        Min("min_turn", alias_name="first_turn"),
        Max("max_turn", alias_name="last_turn"))

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["n_turns"].to_numpy(zero_copy_only=False)
        s = batch["sum_score"].to_numpy(zero_copy_only=False)
        return pa.table({
            "conv_id": batch["conv_id"],
            "n_turns": pa.array(n.astype(np.int64)),
            "n_keep": pa.array(
                batch["n_keep"].to_numpy(zero_copy_only=False)
                .astype(np.int64)),
            "avg_quality": pa.array((s // n).astype(np.int64)),
            "first_turn": pa.array(
                batch["first_turn"].to_numpy(zero_copy_only=False)
                .astype(np.int32)),
            "last_turn": pa.array(
                batch["last_turn"].to_numpy(zero_copy_only=False)
                .astype(np.int32)),
        })

    return merged.map_batches(finish, batch_format="pyarrow")


def conv_turn_gaps(ds, num_buckets: int = 0):
    """(conv_id, turn_idx, gap_us): per-turn inter-arrival time — the
    LAG window function (gap to the previous turn of the SAME
    conversation in turn_idx order; first turn → -1), expressed as the
    bucketed ordered scan: ONE hash shuffle on conv_bucket, vectorized
    pandas diff within each bucket. Complements user_running_totals
    (running SUM OVER) with the LAG OVER shape.
    """
    num_buckets = num_buckets or cluster_buckets(minimum=16)
    import pandas as pd
    import pyarrow.compute as pc

    from dataquality_ray.pipelines.quality import conv_bucket_of

    def bucket(batch: pa.Table) -> pa.Table:
        return pa.table({
            "bucket": conv_bucket_of(batch["conv_id"], num_buckets),
            "conv_id": batch["conv_id"],
            "turn_idx": batch["turn_idx"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
        })

    def scan(t: pa.Table) -> pa.Table:
        # polars diff stays Int64 end-to-end (the pandas groupby diff
        # promotes to float64 for the NaN — exactness rule) and the
        # conv_id strings never box through pandas
        import polars as _pl
        d = (_pl.from_arrow(t.select(["conv_id", "turn_idx", "ts_us"]))
             .sort(["conv_id", "turn_idx"])
             .with_columns(gap_us=_pl.col("ts_us").diff()
                           .over("conv_id").fill_null(-1)))
        return d.select(["conv_id", "turn_idx", "gap_us"]).to_arrow()

    return (ds.map_batches(bucket, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("bucket")
            .map_groups(scan, batch_format="pyarrow"))


def role_tool_stats(ds, num_buckets: int = 64):
    """(role, tool, n_turns, n_convs, sum_chars): per-(role, tool)
    usage aggregate over the transcript table — covers the input_hint's
    role/tool columns with a hard-checked surface.

    COUNT(DISTINCT conv_id) at scale: per-batch polars partials on
    (role, tool, conv-hash) first, then ONE bucketed shuffle keyed by
    conv_hash % num_buckets — every conversation lands in exactly one
    bucket, so both the per-conv dedup AND the per-(role, tool)
    distinct counts complete LOCALLY inside each bucket (a vectorized
    polars groupby, never a million-group Ray aggregate), leaving a
    7-rows-per-bucket final Sum. The conv key is the frozen 64-bit md5
    prefix (slim int64 shuffle; exactness per the fixed corpus +
    SQL-oracle gate)."""
    import hashlib

    import polars as _pl
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        conv = batch["conv_id"]
        if isinstance(conv, pa.ChunkedArray):
            conv = conv.combine_chunks()
        enc = conv.dictionary_encode()
        lut = np.fromiter(
            (int.from_bytes(hashlib.md5(u.encode()).digest()[:8],
                            "little")
             for u in enc.dictionary.to_pylist()),
            dtype=np.uint64, count=len(enc.dictionary))
        ch = lut[enc.indices.to_numpy(zero_copy_only=False)]
        df = _pl.DataFrame({
            "role": _pl.from_arrow(batch["role"]),
            "tool": _pl.from_arrow(batch["tool"]),
            "conv_h": ch.view(np.int64),
            "c": _pl.from_arrow(pc.cast(pc.utf8_length(batch["text"]),
                                        pa.int64())),
        })
        g = df.group_by(["role", "tool", "conv_h"]).agg(
            _pl.len().cast(_pl.Int64).alias("n"),
            _pl.col("c").sum().alias("c"))
        part = (g["conv_h"].to_numpy().view(np.uint64)
                % np.uint64(num_buckets)).astype(np.int32)
        return g.to_arrow().append_column("part", pa.array(part))

    def per_bucket(t: pa.Table) -> pa.Table:
        g = (_pl.from_arrow(t.select(["role", "tool", "conv_h",
                                      "n", "c"]))
             .group_by(["role", "tool", "conv_h"]).agg(
                 _pl.col("n").sum(), _pl.col("c").sum())
             .group_by(["role", "tool"]).agg(
                 _pl.col("n").sum().alias("n_turns"),
                 _pl.len().cast(_pl.Int64).alias("n_convs"),
                 _pl.col("c").sum().alias("sum_chars")))
        return g.to_arrow()

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("part").map_groups(per_bucket, batch_format="pyarrow") \
        .groupby(["role", "tool"]).aggregate(
            Sum("n_turns", alias_name="n_turns"),
            Sum("n_convs", alias_name="n_convs"),
            Sum("sum_chars", alias_name="sum_chars"))

    def clean(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        return pa.table({
            "role": t["role"], "tool": t["tool"],
            "n_turns": _pc.cast(t["n_turns"], pa.int64()),
            "n_convs": _pc.cast(t["n_convs"], pa.int64()),
            "sum_chars": _pc.cast(t["sum_chars"], pa.int64()),
        })

    return agg.map_batches(clean, batch_format="pyarrow")


def conv_lang_majority(ds, num_buckets: int = 0):
    """(conv_id, majority_lang, n_majority, n_turns): each
    conversation's majority per-turn language under the pinned
    spec.STOPWORD_MARKERS rule (ties → lang asc) — the
    "which language is this dialog in" gate a multilingual training
    pipeline applies before routing to per-language filters.

    Shape: language prediction is the vectorized stateless map
    (documents._pred_lang_of); per-batch polars partials shrink the
    exchange to distinct (conv, lang) count pairs, then ONE
    conv-bucket shuffle completes the majority vote locally per bucket
    (the modal_event_type bucketed-argmax topology — never a
    conv-proportional Ray aggregate)."""
    import polars as _pl
    from dataquality_ray.pipelines.quality import conv_bucket_of

    num_buckets = num_buckets or cluster_buckets(minimum=16)

    def partial(batch: pa.Table) -> pa.Table:
        from dataquality_ray.pipelines.documents import _pred_lang_of
        pred = _pred_lang_of(batch["text"])
        g = (_pl.DataFrame({
                "conv_id": _pl.from_arrow(batch["conv_id"]),
                "pred_lang": _pl.Series(pred),
             }).group_by(["conv_id", "pred_lang"])
             .agg(n=_pl.len().cast(_pl.Int64)))
        t = g.to_arrow()
        return t.append_column(
            "bucket", pa.array(conv_bucket_of(t["conv_id"],
                                              num_buckets)))

    def majority(t: pa.Table) -> pa.Table:
        g = (_pl.from_arrow(t.select(["conv_id", "pred_lang", "n"]))
             .group_by(["conv_id", "pred_lang"])
             .agg(_pl.col("n").sum()))
        g = g.with_columns(
            n_turns=_pl.col("n").sum().over("conv_id"))
        w = (g.sort(["conv_id", "n", "pred_lang"],
                    descending=[False, True, False])
             .unique(subset="conv_id", keep="first",
                     maintain_order=True))
        return w.select(
            _pl.col("conv_id"),
            _pl.col("pred_lang").alias("majority_lang"),
            _pl.col("n").alias("n_majority"),
            _pl.col("n_turns"),
        ).to_arrow()

    return ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("bucket").map_groups(majority, batch_format="pyarrow")


def conv_role_patterns(ds, num_buckets: int = 0):
    """(role_pattern, n_convs): dialog-structure mining — each
    conversation's turn_idx-ordered role sequence collapsed to a
    comma-joined pattern string, counted across the corpus (the
    "what dialog shapes exist / which are malformed" audit run before
    choosing a chat template).

    Shape: ONE conv-bucket shuffle of slim (conv_id, turn_idx, role)
    rows; pattern assembly is a local polars sort + join per bucket
    (string_agg ORDER BY — the conv_training_docs topology), then the
    tiny pattern-count aggregate."""
    import polars as _pl
    from ray.data.aggregate import Sum
    from dataquality_ray.pipelines.quality import conv_bucket_of

    num_buckets = num_buckets or cluster_buckets(minimum=16)

    def bucket(batch: pa.Table) -> pa.Table:
        return batch.select(["conv_id", "turn_idx", "role"]) \
            .append_column("bucket",
                           conv_bucket_of(batch["conv_id"],
                                          num_buckets))

    def patterns(t: pa.Table) -> pa.Table:
        g = (_pl.from_arrow(t.select(["conv_id", "turn_idx", "role"]))
             .sort(["conv_id", "turn_idx"])
             .group_by("conv_id", maintain_order=True)
             .agg(role_pattern=_pl.col("role").str.join(","))
             .group_by("role_pattern")
             .agg(n_convs=_pl.len().cast(_pl.Int64)))
        return g.to_arrow()

    agg = ds.map_batches(bucket, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("bucket").map_groups(patterns, batch_format="pyarrow") \
        .groupby("role_pattern").aggregate(
            Sum("n_convs", alias_name="n_convs"))

    def clean(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "role_pattern": t["role_pattern"],
            "n_convs": pc.cast(t["n_convs"], pa.int64()),
        })

    return agg.map_batches(clean, batch_format="pyarrow")


def conv_response_ratio(ds, num_buckets: int = 0):
    """(conv_id, assistant_chars, user_chars, ratio_milli): per-
    conversation assistant-to-user text volume ratio (integer milli;
    -1 when the conversation has no user text) — the "is the model
    doing all the talking" dialog-balance signal used when curating
    chat training data.

    Shape: per-batch polars partials reduce the exchange to
    (conv, a_chars, u_chars) pairs; ONE conv-bucket shuffle; the merge
    + ratio complete locally per bucket (the kept_conversations
    bucketed-local shape)."""
    import polars as _pl
    from dataquality_ray.pipelines.quality import conv_bucket_of

    num_buckets = num_buckets or cluster_buckets(minimum=16)

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        g = (_pl.DataFrame({
                "conv_id": _pl.from_arrow(batch["conv_id"]),
                "role": _pl.from_arrow(batch["role"]),
                "c": _pl.from_arrow(pc.cast(
                    pc.utf8_length(batch["text"]), pa.int64())),
             })
             .group_by("conv_id")
             .agg(a=_pl.col("c").filter(_pl.col("role") == "assistant")
                  .sum().fill_null(0).cast(_pl.Int64),
                  u=_pl.col("c").filter(_pl.col("role") == "user")
                  .sum().fill_null(0).cast(_pl.Int64)))
        t = g.to_arrow()
        return t.append_column(
            "bucket", conv_bucket_of(t["conv_id"], num_buckets))

    def ratio(t: pa.Table) -> pa.Table:
        g = (_pl.from_arrow(t.select(["conv_id", "a", "u"]))
             .group_by("conv_id")
             .agg(assistant_chars=_pl.col("a").sum(),
                  user_chars=_pl.col("u").sum())
             .with_columns(
                 ratio_milli=_pl.when(_pl.col("user_chars") > 0)
                 .then(_pl.col("assistant_chars") * 1000
                       // _pl.col("user_chars"))
                 .otherwise(-1).cast(_pl.Int64)))
        return g.to_arrow()

    return ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("bucket").map_groups(ratio, batch_format="pyarrow")


def conv_training_docs(ds, num_buckets: int = 0):
    """(conv_id, n_turns, n_chars, doc_text): reassemble each
    conversation into ONE training document — 'role: text' lines joined
    by newline in turn_idx order (the turns→documents construction step
    of a transcript training pipeline; SQL twin: string_agg(... ORDER BY
    turn_idx)).

    Shape: the bucketed ordered scan — ONE hash shuffle on
    conv_bucket(md5(conv_id) % K) co-locates every conversation's turns,
    then a vectorized polars sort + group agg assembles locally. Nothing
    conversation-proportional ever crosses a second exchange; the
    output is one row per conversation.
    """
    num_buckets = num_buckets or cluster_buckets(minimum=16)
    import polars as _pl
    from dataquality_ray.pipelines.quality import conv_bucket_of

    def bucket(batch: pa.Table) -> pa.Table:
        return pa.table({
            "bucket": conv_bucket_of(batch["conv_id"], num_buckets),
            "conv_id": batch["conv_id"],
            "turn_idx": batch["turn_idx"],
            "role": batch["role"],
            "text": batch["text"],
        })

    def assemble(t: pa.Table) -> pa.Table:
        # arrow → polars → arrow is zero-copy for the string payload;
        # the pandas route would box every text into a Python object
        g = (_pl.from_arrow(t.select(
                ["conv_id", "turn_idx", "role", "text"]))
             .sort(["conv_id", "turn_idx"])
             .group_by("conv_id", maintain_order=True)
             .agg(n_turns=_pl.len().cast(_pl.Int64),
                  doc_text=(_pl.col("role") + _pl.lit(": ")
                            + _pl.col("text")).str.join("\n"))
             .with_columns(n_chars=_pl.col("doc_text").str.len_chars()
                           .cast(_pl.Int64))
             .select("conv_id", "n_turns", "n_chars", "doc_text"))
        return g.to_arrow()

    return (ds.map_batches(bucket, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("bucket")
            .map_groups(assemble, batch_format="pyarrow"))


CONV_KEEP_FRAC_MILLI = 500   # keep a conversation if >=50% of turns keep


def heuristic_keep_turns(ds, cfg: PipelineConfig = DEFAULT_CONFIG):
    """scrub -> heuristics -> (conv_id, turn_idx, keep, score): the
    SQL-expressible per-turn keep signal (integer mean of the four
    heuristic scores vs cfg.keep_min_overall) used by the conv-level
    gating surfaces."""
    import functools

    from dataquality_ray.stages.heuristics import (
        heuristic_overall4,
        heuristics_batch,
    )
    from dataquality_ray.stages.scrub import scrub_batch

    ds = ds.map_batches(functools.partial(scrub_batch, with_counts=False),
                        batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(functools.partial(heuristics_batch, cfg=cfg),
                        batch_format="pyarrow", zero_copy_batch=True)

    def decide(t: pa.Table) -> pa.Table:
        overall = heuristic_overall4(t)
        return pa.table({
            "conv_id": t["conv_id"],
            "turn_idx": t["turn_idx"],
            "overall_quality_score": pa.array(overall.astype(np.int32)),
            "keep": pa.array(overall >= cfg.keep_min_overall),
        })

    return ds.map_batches(decide, batch_format="pyarrow")


def kept_conversations(ds, cfg: PipelineConfig = DEFAULT_CONFIG,
                       min_frac_milli: int = CONV_KEEP_FRAC_MILLI,
                       num_buckets: int = 64):
    """(conv_id, n_turns, n_keep, keep_frac_milli): conversation-level
    quality gating — keep whole conversations whose fraction of
    keep-quality turns reaches the threshold (training pipelines gate
    at the document/conversation grain, not just per turn; reference
    analog: the per-document action from aggregated dimension scores,
    metadata.py:419-434).

    Shape: the CLAUDE.md bucketed-local-aggregation rule — the output
    group count is per-conversation (huge), so a Ray
    groupby().aggregate() would pay the ~30 s/1.4M-group sort cost;
    instead per-batch polars partials shrink the exchange to
    (conv, count) pairs, ONE shuffle on conv_bucket co-locates each
    conversation, and the per-conv merge + milli filter complete
    locally per bucket (measured 63 s → ~14 s at sf0.1/32 cpus vs the
    salted conv_stats path).
    """
    import polars as _pl
    from dataquality_ray.pipelines.quality import conv_bucket_of

    scored = heuristic_keep_turns(ds, cfg)

    def partial(batch: pa.Table) -> pa.Table:
        g = (_pl.DataFrame({
                "conv_id": _pl.from_arrow(batch["conv_id"]),
                "keep": _pl.from_arrow(batch["keep"]),
             })
             .group_by("conv_id")
             .agg(n=_pl.len().cast(_pl.Int64),
                  k=_pl.col("keep").sum().cast(_pl.Int64)))
        t = g.to_arrow()
        return t.append_column(
            "bucket", conv_bucket_of(t["conv_id"], num_buckets))

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        g = (_pl.from_pandas(df)
             .group_by("conv_id")
             .agg(n_turns=_pl.col("n").sum(),
                  n_keep=_pl.col("k").sum())
             .with_columns(
                 keep_frac_milli=(_pl.col("n_keep") * 1000)
                 // _pl.col("n_turns"))
             .filter(_pl.col("keep_frac_milli") >= min_frac_milli))
        return g.to_pandas()

    return scored.map_batches(partial, batch_format="pyarrow") \
        .groupby("bucket").map_groups(gate, batch_format="pandas")


def turn_context_windows(ds, num_buckets: int = 0):
    """(conv_id, turn_idx, prev_text, next_text): attach each turn's
    neighboring turns — the LAG + LEAD window pair (context-conditioned
    training-example construction). First/last turns get '' (never
    null, so the surface hash-checks cleanly).

    Shape: the bucketed ordered scan — ONE conv-bucket shuffle, then a
    vectorized polars shift±1 over conv_id partitions locally.
    """
    num_buckets = num_buckets or cluster_buckets(minimum=16)
    import polars as _pl
    from dataquality_ray.pipelines.quality import conv_bucket_of

    def bucket(batch: pa.Table) -> pa.Table:
        return pa.table({
            "bucket": conv_bucket_of(batch["conv_id"], num_buckets),
            "conv_id": batch["conv_id"],
            "turn_idx": batch["turn_idx"],
            "text": batch["text"],
        })

    def scan(t: pa.Table) -> pa.Table:
        # zero-copy arrow↔polars — text never boxes through pandas
        g = (_pl.from_arrow(t.select(["conv_id", "turn_idx", "text"]))
             .sort(["conv_id", "turn_idx"])
             .with_columns(
                 prev_text=_pl.col("text").shift(1).over("conv_id")
                 .fill_null(""),
                 next_text=_pl.col("text").shift(-1).over("conv_id")
                 .fill_null(""))
             .select("conv_id", "turn_idx", "prev_text", "next_text"))
        return g.to_arrow()

    return (ds.map_batches(bucket, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("bucket")
            .map_groups(scan, batch_format="pyarrow"))


FUZZY_MIN_LEN = 3   # ignore 1-2 char tokens (noise)


def fuzzy_term_matches(ds, num_buckets: int = 0):
    """(term_a, term_b): all DISTINCT corpus-vocabulary term pairs at
    levenshtein distance exactly 1 — fuzzy string matching (reference
    analog: the fuzzy S3-key recovery that case/typo-matches a missing
    key against the listed prefix, s3.py:203-248; here the same
    capability over the transcript vocabulary, e.g. spell-variant
    clustering before term aggregation).

    Shape: SymSpell delete-1 blocking — two strings at distance 1
    ALWAYS share an entry of {term} ∪ {term minus one char}, so exact
    recall needs no all-pairs scan: (1) per-batch distinct terms,
    bucketed by term hash so global dedup is local; (2) each distinct
    term flat-maps to its ≤ len+1 deletion variants, shuffled by
    variant hash; (3) candidate pairs form inside each variant group
    and are verified with an exact distance-1 check; (4) one last
    pair-hash bucket dedupes pairs that shared several variants. The
    Python loops iterate the DISTINCT VOCABULARY (the small side — the
    corpus itself only ever passes through the vectorized tokenizer).
    """
    num_buckets = num_buckets or cluster_buckets(minimum=32)
    import polars as _pl
    from dataquality_ray.spec import token_hash_u64

    def terms_partial(batch: pa.Table) -> pa.Table:
        s = (_pl.from_arrow(batch["text"]).str.to_lowercase()
             .str.extract_all("[a-z]+"))
        t = (_pl.DataFrame({"term": s}).explode("term").drop_nulls()
             .filter(_pl.col("term").str.len_chars() >= FUZZY_MIN_LEN)
             .unique())
        terms = t["term"].to_list()
        b = np.fromiter((token_hash_u64(x) % num_buckets for x in terms),
                        dtype=np.int64, count=len(terms))
        return pa.table({"term": pa.array(terms, pa.string()),
                         "bucket": pa.array(b)})

    def variants(df: pd.DataFrame) -> pd.DataFrame:
        out_v, out_t = [], []
        for t in set(df["term"]):          # distinct vocab, small side
            out_v.append(t)
            out_t.append(t)
            for i in range(len(t)):
                out_v.append(t[:i] + t[i + 1:])
                out_t.append(t)
        vb = np.fromiter(
            (token_hash_u64(v) % num_buckets for v in out_v),
            dtype=np.int64, count=len(out_v))
        return pd.DataFrame({"variant": out_v, "term": out_t, "vb": vb})

    def _is_lev1(a: str, b: str) -> bool:
        la, lb = len(a), len(b)
        if la == lb:
            return sum(x != y for x, y in zip(a, b)) == 1
        if la > lb:
            a, b, la, lb = b, a, lb, la
        if lb - la != 1:
            return False
        i = 0
        while i < la and a[i] == b[i]:
            i += 1
        return a[i:] == b[i + 1:]

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, g in df.groupby("variant"):
            ts = sorted(set(g["term"]))
            for i in range(len(ts)):       # variant groups are tiny
                for j in range(i + 1, len(ts)):
                    if _is_lev1(ts[i], ts[j]):
                        out_a.append(ts[i])
                        out_b.append(ts[j])
        pb = np.fromiter(
            (token_hash_u64(a + "|" + b) % num_buckets
             for a, b in zip(out_a, out_b)),
            dtype=np.int64, count=len(out_a))
        return pd.DataFrame({"term_a": out_a, "term_b": out_b, "pb": pb})

    def dedupe(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["term_a", "term_b"])[
            ["term_a", "term_b"]]

    return (ds.map_batches(terms_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("bucket").map_groups(variants, batch_format="pandas")
            .groupby("vb").map_groups(pairs, batch_format="pandas")
            .groupby("pb").map_groups(dedupe, batch_format="pandas"))


def transcript_split_leakage(ds, num_buckets: int = 0):
    """(content_hash, n_copies, n_splits, canonical_conv_id): exact-
    content turn groups whose copies land in DIFFERENT train/val/test
    splits — the test-set leakage audit run after conversation-level
    splitting (a val/test turn whose exact text also sits in a train
    conversation invalidates the eval). Splits are assigned PER
    CONVERSATION (md5 of conv_id, the same frozen 80/10/10 rule as
    documents.dataset_split_documents), so leakage is text duplicated
    ACROSS conversations that straddle the split boundary — the
    fixture's injected cross-conversation duplicates exercise this for
    real (~2k leaking groups at the 20k-turn scale). Empty-normalized
    turns are excluded (they would form one giant degenerate group).

    Shape (bucketed-local rule): one shuffle on a content-hash-prefix
    bucket; every hash lives in exactly one bucket, so the per-group
    count / distinct-split / min completes locally in one vectorized
    polars groupby and only LEAKING groups leave the bucket — never a
    #turns-sized Ray aggregate.
    """
    import hashlib

    import polars as pl
    import pyarrow.compute as pc

    from dataquality_ray.pipelines.documents import (
        SPLIT_BUCKETS,
        SPLIT_TRAIN_LT,
        SPLIT_VAL_LT,
    )
    from dataquality_ray.spec import (
        EDGE_WS_PATTERN,
        WS_PLUS_PATTERN,
        token_hash_u64,
    )

    num_buckets = num_buckets or cluster_buckets(minimum=32)

    def add(batch: pa.Table) -> pa.Table:
        norm = pc.replace_substring_regex(
            pc.replace_substring_regex(
                pc.utf8_lower(batch["text"]), EDGE_WS_PATTERN, ""),
            WS_PLUS_PATTERN, " ")
        keep = pc.greater(pc.utf8_length(norm), 0)
        norm = norm.filter(keep) if isinstance(norm, pa.ChunkedArray) \
            else pa.chunked_array([norm]).filter(keep)
        convs = batch["conv_id"].filter(keep).to_pylist()
        from dataquality_ray.arrowutil import md5_digests
        digests = md5_digests(norm)
        b = np.fromiter(
            (token_hash_u64(c) % SPLIT_BUCKETS for c in convs),
            dtype=np.int64, count=len(convs))
        split = np.where(b < SPLIT_TRAIN_LT, "train",
                         np.where(b < SPLIT_VAL_LT, "val", "test"))
        bucket = np.fromiter(
            (int.from_bytes(d[:4], "little") % num_buckets
             for d in digests), dtype=np.int32, count=len(digests))
        return pa.table({
            "bucket": pa.array(bucket),
            "content_hash": pa.array([d.hex() for d in digests],
                                     pa.string()),
            "conv_id": pa.array(convs, pa.string()),
            "split": pa.array(split.tolist(), pa.string()),
        })

    def local(g: pa.Table) -> pa.Table:
        df = (pl.from_arrow(g)
              .group_by("content_hash")
              .agg(pl.len().alias("n_copies"),
                   pl.col("split").n_unique().alias("n_splits"),
                   pl.col("conv_id").min().alias("canonical_conv_id"))
              .filter(pl.col("n_splits") >= 2)
              .with_columns(pl.col("n_copies").cast(pl.Int64),
                            pl.col("n_splits").cast(pl.Int64)))
        return df.select(["content_hash", "n_copies", "n_splits",
                          "canonical_conv_id"]).to_arrow().cast(
            pa.schema([("content_hash", pa.string()),
                       ("n_copies", pa.int64()),
                       ("n_splits", pa.int64()),
                       ("canonical_conv_id", pa.string())]))

    return (ds.map_batches(add, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("bucket")
            .map_groups(local, batch_format="pyarrow"))


TURN_DEDUP_WINDOW_US = 7 * 86_400_000_000   # 7-day dedup horizon


def windowed_turn_dedup(ds, window_us: int = TURN_DEDUP_WINDOW_US,
                        num_buckets: int = 0):
    """(conv_id, turn_idx, is_dup): TIME-WINDOWED exact dedup — a turn
    is a duplicate iff an identical (normalized, non-empty) turn
    occurred within the previous `window_us` microseconds. The
    streaming-ingest rule production pipelines apply (recent repeats
    are spam/retries; the same content a year later is legitimately
    re-collectable), in contrast to the flagship's corpus-global
    exact dedup.

    Sufficiency: the predecessor in (ts, conv_id, turn_idx) order
    within the same content group is the LATEST earlier occurrence, so
    "any earlier occurrence within the window" reduces to ONE LAG gap
    check — SQL twin: LAG OVER (PARTITION BY content_hash ORDER BY
    ts, conv_id, turn_idx).

    Shape: one stateless hash map (same normalization as
    conv_near_dup_pairs), ONE content-hash bucket shuffle — every copy
    of a hash lands in one bucket, so the ordered LAG scan completes
    locally per bucket as a vectorized polars shift. Empty-normalized
    turns are never duplicates and bypass the group logic.
    """
    import hashlib

    import polars as _pl
    import pyarrow.compute as pc

    from dataquality_ray.spec import EDGE_WS_PATTERN, WS_PLUS_PATTERN

    num_buckets = num_buckets or cluster_buckets(minimum=32)

    def hash_map(batch: pa.Table) -> pa.Table:
        norm = pc.replace_substring_regex(
            pc.replace_substring_regex(
                pc.utf8_lower(batch["text"]),
                EDGE_WS_PATTERN, ""),
            WS_PLUS_PATTERN, " ")
        # NULL text behaves like empty-normalized (ch='' -> never a
        # duplicate), matching the SQL twin where ch IS NULL -> LAG
        # partition membership is moot and is_dup stays FALSE.
        norm = pc.fill_null(norm, "")
        if isinstance(norm, pa.ChunkedArray):
            norm = norm.combine_chunks()
        # md5 over zero-copy utf-8 slices straight off the Arrow
        # buffer (content_hash_batch recipe); empty-normalized rows
        # keep ch='' / hb=0 exactly as before
        n = len(norm)
        off_dtype = np.int64 if pa.types.is_large_string(norm.type) \
            else np.int32
        offs = np.frombuffer(norm.buffers()[1], dtype=off_dtype)[
            norm.offset: norm.offset + n + 1]
        data = memoryview(norm.buffers()[2])
        md5 = hashlib.md5
        from_bytes = int.from_bytes
        digests = [""] * n
        hb = np.zeros(n, dtype=np.int32)
        for i in range(n):
            lo, hi = offs[i], offs[i + 1]
            if lo == hi:
                continue
            d = md5(data[lo:hi]).digest()
            digests[i] = d.hex()
            hb[i] = from_bytes(d[:4], "little") % num_buckets
        return pa.table({
            "hb": pa.array(hb),
            "ch": pa.array(digests, pa.string()),
            "conv_id": batch["conv_id"],
            "turn_idx": batch["turn_idx"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
        })

    def lag_scan(t: pa.Table) -> pa.Table:
        d = (_pl.from_arrow(t.select(["ch", "conv_id", "turn_idx",
                                      "ts_us"]))
             .sort(["ch", "ts_us", "conv_id", "turn_idx"]))
        d = d.with_columns(
            gap=(_pl.col("ts_us")
                 - _pl.col("ts_us").shift(1).over("ch")))
        d = d.with_columns(
            is_dup=_pl.when(_pl.col("ch") == "")
            .then(False)
            .otherwise(_pl.col("gap").le(window_us).fill_null(False)))
        return d.select(["conv_id", "turn_idx", "is_dup"]).to_arrow()

    return ds.map_batches(hash_map, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("hb").map_groups(lag_scan, batch_format="pyarrow")


def conv_loss_mask_stats(ds, num_buckets: int = 0):
    """(conv_id, n_turns, total_ws_tokens, assistant_ws_tokens,
    trainable_permille): the loss-mask audit run before SFT — when
    training masks every non-assistant token, how much of each
    conversation is actually TRAINABLE. total/assistant whitespace
    tokens per spec.WS_TOKEN_PATTERN (the cross-engine-pinned count),
    trainable_permille = (1000 * assistant) // total, -1 when the
    conversation has zero tokens. Conversations that are all
    user/system boilerplate (permille ~0) cost context with no
    gradient signal; a mixture planner weighs them accordingly.

    Shape: per-batch polars partial per (conv_id) — counting happens
    where the text lives — then ONE conv-bucket shuffle of slim
    integer partials and a local fold (the role_tool_stats bucketed
    template; never a #convs-output Ray aggregate).
    """
    import hashlib

    import polars as _pl

    from dataquality_ray.spec import WS_TOKEN_PATTERN

    num_buckets = num_buckets or cluster_buckets(minimum=32)

    def partial(batch: pa.Table) -> pa.Table:
        df = _pl.DataFrame({
            "conv_id": _pl.from_arrow(batch["conv_id"]),
            "role": _pl.from_arrow(batch["role"]),
            "ws": _pl.from_arrow(batch["text"]).fill_null("")
            .str.count_matches(WS_TOKEN_PATTERN).cast(_pl.Int64),
        }).with_columns(
            aw=_pl.when(_pl.col("role") == "assistant")
            .then(_pl.col("ws")).otherwise(0))
        g = df.group_by("conv_id").agg(
            n=_pl.len().cast(_pl.Int64),
            ws=_pl.col("ws").sum(),
            aw=_pl.col("aw").sum())
        cb = np.fromiter(
            (int.from_bytes(hashlib.md5(c.encode()).digest()[:4],
                            "little") % num_buckets
             for c in g["conv_id"]),
            dtype=np.int32, count=g.height)
        return g.with_columns(cb=_pl.Series(cb)).to_arrow()

    def fold(t: pa.Table) -> pa.Table:
        g = (_pl.from_arrow(t.select(["conv_id", "n", "ws", "aw"]))
             .group_by("conv_id")
             .agg(n_turns=_pl.col("n").sum(),
                  total_ws_tokens=_pl.col("ws").sum(),
                  assistant_ws_tokens=_pl.col("aw").sum())
             .with_columns(
                 trainable_permille=_pl.when(
                     _pl.col("total_ws_tokens") > 0)
                 .then((1000 * _pl.col("assistant_ws_tokens"))
                       // _pl.col("total_ws_tokens"))
                 .otherwise(-1).cast(_pl.Int64)))
        return g.select(["conv_id", "n_turns", "total_ws_tokens",
                         "assistant_ws_tokens",
                         "trainable_permille"]).to_arrow()

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("cb").map_groups(fold, batch_format="pyarrow"))


def conv_ending_audit(ds, num_buckets: int = 0):
    """(conv_id, last_role, n_trailing, ends_with_assistant): dialog
    COMPLETENESS audit — SFT pipelines drop or truncate conversations
    that do not end on an assistant turn (a trailing user question has
    no supervised target; a trailing tool result is a dangling call).
    n_trailing = turns strictly after the conversation's LAST assistant
    turn (= n_turns when it has none) — i.e. how much to truncate to
    recover a trainable dialog.

    Shape: ONE conv-bucket shuffle of (conv_id, turn_idx, role); the
    per-conv last-assistant index and trailing count complete locally —
    flag columns first, plain sums in the agg (polars fast-path rule).
    """
    import hashlib

    import polars as _pl

    num_buckets = num_buckets or cluster_buckets(minimum=32)

    def slim(batch: pa.Table) -> pa.Table:
        convs = batch["conv_id"].to_pylist()
        cb = np.fromiter(
            (int.from_bytes(hashlib.md5(c.encode()).digest()[:4],
                            "little") % num_buckets for c in convs),
            dtype=np.int32, count=len(convs))
        return pa.table({
            "cb": pa.array(cb),
            "conv_id": batch["conv_id"],
            "turn_idx": batch["turn_idx"],
            "role": batch["role"],
        })

    def local(t: pa.Table) -> pa.Table:
        d = (_pl.from_arrow(t.select(["conv_id", "turn_idx", "role"]))
             .sort(["conv_id", "turn_idx"]))
        d = d.with_columns(
            ai=_pl.when(_pl.col("role") == "assistant")
            .then(_pl.col("turn_idx")).otherwise(None))
        la = (d.group_by("conv_id", maintain_order=True)
              .agg(last_role=_pl.col("role").last(),
                   last_asst=_pl.col("ai").max()))
        d = (d.join(la, on="conv_id")
             .with_columns(tr=(_pl.col("turn_idx")
                               > _pl.col("last_asst").fill_null(-1))
                           .cast(_pl.Int64)))
        g = (d.group_by("conv_id", maintain_order=True)
             .agg(last_role=_pl.col("last_role").first(),
                  n_trailing=_pl.col("tr").sum())
             .with_columns(
                 ends_with_assistant=(_pl.col("n_trailing") == 0)))
        return g.select(["conv_id", "last_role", "n_trailing",
                         "ends_with_assistant"]).to_arrow()

    return (ds.map_batches(slim, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("cb").map_groups(local, batch_format="pyarrow"))


def system_prompt_census(ds, num_buckets: int = 0):
    """(sys_hash, n_convs, n_turns, canonical_conv_id): the SYSTEM
    PROMPT census — system-role turns grouped by the md5 of their
    normalized text (the corpus-wide normalization chain). Production
    transcript corpora accrete hundreds of near-identical system-prompt
    variants; this is the table a template-consolidation or
    dedup-by-template pass starts from. canonical_conv_id = min conv_id
    of the group, for spot checks.

    Shape: stateless filter+hash map, ONE hash-bucket shuffle, local
    vectorized census per bucket (each hash lives in one bucket).
    """
    import polars as _pl
    import pyarrow.compute as pc

    from dataquality_ray.arrowutil import md5_digests
    from dataquality_ray.spec import EDGE_WS_PATTERN, WS_PLUS_PATTERN

    num_buckets = num_buckets or cluster_buckets(minimum=32)

    def hash_map(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch["role"], "system")
        txt = batch["text"].filter(keep)
        convs = batch["conv_id"].filter(keep)
        norm = pc.replace_substring_regex(
            pc.replace_substring_regex(
                pc.utf8_lower(pc.fill_null(txt, "")),
                EDGE_WS_PATTERN, ""),
            WS_PLUS_PATTERN, " ")
        if isinstance(norm, pa.ChunkedArray):
            norm = norm.combine_chunks()
        digests = md5_digests(norm)
        hb = np.fromiter(
            (int.from_bytes(d[:4], "little") % num_buckets
             for d in digests), dtype=np.int32, count=len(digests))
        return pa.table({
            "hb": pa.array(hb),
            "sys_hash": pa.array([d.hex() for d in digests],
                                 pa.string()),
            "conv_id": convs,
        })

    def census(t: pa.Table) -> pa.Table:
        g = (_pl.from_arrow(t.select(["sys_hash", "conv_id"]))
             .group_by("sys_hash")
             .agg(n_convs=_pl.col("conv_id").n_unique()
                  .cast(_pl.Int64),
                  n_turns=_pl.len().cast(_pl.Int64),
                  canonical_conv_id=_pl.col("conv_id").min()))
        return g.select(["sys_hash", "n_convs", "n_turns",
                         "canonical_conv_id"]).to_arrow()

    return (ds.map_batches(hash_map, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("hb").map_groups(census, batch_format="pyarrow"))


def tool_latency_histogram(ds, num_buckets: int = 0):
    """(tool, gap_bucket, n_calls): tool-call LATENCY profile for agent
    trajectories — for every 'tool' turn directly preceded (turn_idx
    order) by an 'assistant' turn in the same conversation, the ts gap
    to that call, bucketed by exact bit length of the microsecond gap
    (bucket 0 for gaps <= 0, i.e. clock regressions). A histogram
    TABLE, not per-tool quantiles: per-tool exact quantiles would
    either co-locate each tool's calls (few hot keys ~ whole corpus) or
    ship unbounded distinct-gap cells; the |tools| × ~64 grid is
    bounded by construction and quantiles read off its cumsum.

    Shape: ONE conv-bucket shuffle of slim rows; the LAG is a
    whole-frame shift + same-conv mask after one sort (the pinned
    polars fast-path shape); per-bucket partial histograms fold in a
    tiny grid-keyed aggregate.
    """
    import hashlib

    import polars as _pl
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    num_buckets = num_buckets or cluster_buckets(minimum=32)

    def slim(batch: pa.Table) -> pa.Table:
        convs = batch["conv_id"].to_pylist()
        cb = np.fromiter(
            (int.from_bytes(hashlib.md5(c.encode()).digest()[:4],
                            "little") % num_buckets for c in convs),
            dtype=np.int32, count=len(convs))
        return pa.table({
            "cb": pa.array(cb),
            "conv_id": batch["conv_id"],
            "turn_idx": batch["turn_idx"],
            "role": batch["role"],
            "tool": batch["tool"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
        })

    def local(t: pa.Table) -> pa.Table:
        d = (_pl.from_arrow(t.select(["conv_id", "turn_idx", "role",
                                      "tool", "ts_us"]))
             .sort(["conv_id", "turn_idx"]))
        d = d.with_columns(
            prev_role=_pl.col("role").shift(1),
            prev_ts=_pl.col("ts_us").shift(1),
            same=_pl.col("conv_id") == _pl.col("conv_id").shift(1))
        d = d.filter(_pl.col("same").fill_null(False)
                     & (_pl.col("role") == "tool")
                     & (_pl.col("prev_role") == "assistant"))
        gap = (d["ts_us"] - d["prev_ts"]).to_numpy()
        pos = gap > 0
        v = np.where(pos, gap, 1).astype(np.uint64)
        bitlen = np.zeros(len(v), dtype=np.int64)
        w = v.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            big = w >= np.uint64(1 << shift)
            bitlen[big] += shift
            w[big] >>= np.uint64(shift)
        bitlen += 1
        bitlen[~pos] = 0
        g = (_pl.DataFrame({"tool": d["tool"],
                            "gap_bucket": _pl.Series(bitlen)})
             .group_by(["tool", "gap_bucket"])
             .agg(n=_pl.len().cast(_pl.Int64)))
        return g.to_arrow()

    return (ds.map_batches(slim, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("cb").map_groups(local, batch_format="pyarrow")
            .groupby(["tool", "gap_bucket"])
            .aggregate(Sum("n", alias_name="n_calls")))


def conv_pii_stats(ds, num_buckets: int = 0):
    """(conv_id, n_email, n_phone, n_ssn, n_pii_turns): per-conversation
    PII exposure audit — match counts for the frozen spec.PII_RULES
    (RE2 on both engines, same pattern strings as the scrub stage) and
    the number of turns touching ANY rule. The gate a transcript corpus
    runs before release: conversations above a PII budget get routed to
    scrubbing (stages/scrub.scrub_batch) or quarantine.

    Counting note: rules count SEQUENTIALLY on the scrubbed-so-far text
    (identical to scrub_batch / sequential re.subn), so a phone-shaped
    substring inside an email match is not double-counted.

    Shape: per-batch zero-copy pc.count_substring_regex + per-(conv)
    integer partials, ONE conv-bucket shuffle, local fold (the
    role_tool_stats template).
    """
    import hashlib

    import polars as _pl
    import pyarrow.compute as pc

    from dataquality_ray.spec import PII_RULES

    num_buckets = num_buckets or cluster_buckets(minimum=32)

    def partial(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch["text"], "")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        counts = {}
        for name, pattern, replacement in PII_RULES:
            counts[name] = pc.cast(
                pc.count_substring_regex(text, pattern),
                pa.int64()).to_numpy(zero_copy_only=False)
            text = pc.replace_substring_regex(text, pattern,
                                              replacement)
        any_pii = (counts["email"] + counts["phone"]
                   + counts["ssn"]) > 0
        g = (_pl.DataFrame({
            "conv_id": _pl.from_arrow(batch["conv_id"]),
            "e": _pl.Series(counts["email"]),
            "p": _pl.Series(counts["phone"]),
            "s": _pl.Series(counts["ssn"]),
            "t": _pl.Series(any_pii.astype(np.int64)),
        }).group_by("conv_id")
            .agg(_pl.col("e").sum(), _pl.col("p").sum(),
                 _pl.col("s").sum(), _pl.col("t").sum()))
        cb = np.fromiter(
            (int.from_bytes(hashlib.md5(c.encode()).digest()[:4],
                            "little") % num_buckets
             for c in g["conv_id"]),
            dtype=np.int32, count=g.height)
        return g.with_columns(cb=_pl.Series(cb)).to_arrow()

    def fold(t: pa.Table) -> pa.Table:
        g = (_pl.from_arrow(t.select(["conv_id", "e", "p", "s", "t"]))
             .group_by("conv_id")
             .agg(n_email=_pl.col("e").sum(),
                  n_phone=_pl.col("p").sum(),
                  n_ssn=_pl.col("s").sum(),
                  n_pii_turns=_pl.col("t").sum()))
        return g.select(["conv_id", "n_email", "n_phone", "n_ssn",
                         "n_pii_turns"]).to_arrow()

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("cb").map_groups(fold, batch_format="pyarrow"))


def role_length_profile(ds):
    """(role, n_turns, med_len, p90_len, max_len): the dataset-card
    length profile BY ROLE — exact discrete quantiles
    (sorted[ceil(q*n)-1], DuckDB quantile_disc's rule, pinned by test)
    computed from a value HISTOGRAM, never by co-locating a role's
    turns: per-role turn counts are corpus-proportional and the
    role key space is tiny (4 values), so a role-keyed shuffle would
    put ~25% of the corpus in one task. Per-batch (role, len) sparse
    bincount partials reduce to a #distinct-lengths-bounded table; the
    quantile scan over cumulative counts runs on that tiny aggregate.
    """
    import polars as _pl
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = (_pl.DataFrame({
            "role": _pl.from_arrow(batch["role"]),
            "l": _pl.from_arrow(pc.cast(pc.utf8_length(
                pc.fill_null(batch["text"], "")), pa.int64())),
        }).group_by(["role", "l"])
            .agg(n=_pl.len().cast(_pl.Int64)))
        return g.to_arrow()

    hist = (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["role", "l"])
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas())    # #roles x #distinct lengths — tiny

    out = []
    for role, g in hist.groupby("role", sort=True):
        g = g.sort_values("l")
        lens = g["l"].to_numpy().astype(np.int64)
        cnt = g["n"].to_numpy().astype(np.int64)
        cum = np.cumsum(cnt)
        n = int(cum[-1])

        def disc(q_num: int, q_den: int) -> int:
            rank = (q_num * n + q_den - 1) // q_den   # ceil(q*n)
            return int(lens[np.searchsorted(cum, rank)])

        out.append((role, n, disc(1, 2), disc(9, 10), int(lens[-1])))
    return pa.table({
        "role": pa.array([r[0] for r in out], pa.string()),
        "n_turns": pa.array([r[1] for r in out], pa.int64()),
        "med_len": pa.array([r[2] for r in out], pa.int64()),
        "p90_len": pa.array([r[3] for r in out], pa.int64()),
        "max_len": pa.array([r[4] for r in out], pa.int64()),
    })


LEN_OUTLIER_MAD_MULT = 5    # dev > MULT*mad -> outlier ...
LEN_OUTLIER_ABS_FLOOR = 50  # ... and dev > floor (guards mad == 0)


def conv_length_outliers(ds, num_buckets: int = 0):
    """(conv_id, med_len, mad_len, n_outliers): robust per-conversation
    turn-length outlier detection — med = LOWER median of turn char
    lengths (sorted[(n-1)//2]: DuckDB quantile_disc(0.5) == polars
    quantile(0.5,'lower'), verified), mad = lower median of |len-med|,
    and a turn is an outlier iff |len-med| > LEN_OUTLIER_MAD_MULT*mad
    AND |len-med| > LEN_OUTLIER_ABS_FLOOR (the floor keeps the mad==0
    degenerate case — near-constant conversations — from flagging
    every slightly-different turn). Flags pasted blobs / runaway
    generations inside otherwise-normal dialogs; all exact integers.

    Shape: ONE conv-bucket shuffle of (conv_id, len) rows; both
    median passes and the outlier count complete locally per bucket.
    Per the polars fast-path rule (CLAUDE.md), the deviation and flag
    are materialized as COLUMNS between the two group_bys — no
    compound boolean inside an agg.
    """
    import hashlib

    import polars as _pl
    import pyarrow.compute as pc

    num_buckets = num_buckets or cluster_buckets(minimum=32)

    def slim(batch: pa.Table) -> pa.Table:
        convs = batch["conv_id"].to_pylist()
        cb = np.fromiter(
            (int.from_bytes(hashlib.md5(c.encode()).digest()[:4],
                            "little") % num_buckets for c in convs),
            dtype=np.int32, count=len(convs))
        return pa.table({
            "cb": pa.array(cb),
            "conv_id": batch["conv_id"],
            "len": pc.cast(pc.utf8_length(
                pc.fill_null(batch["text"], "")), pa.int64()),
        })

    def local(t: pa.Table) -> pa.Table:
        d = _pl.from_arrow(t.select(["conv_id", "len"]))
        med = (d.group_by("conv_id")
               .agg(med_len=_pl.col("len")
                    .quantile(0.5, interpolation="lower")
                    .cast(_pl.Int64)))
        d = d.join(med, on="conv_id")
        d = d.with_columns(dev=(_pl.col("len")
                                - _pl.col("med_len")).abs())
        mad = (d.group_by("conv_id")
               .agg(mad_len=_pl.col("dev")
                    .quantile(0.5, interpolation="lower")
                    .cast(_pl.Int64)))
        d = d.join(mad, on="conv_id")
        d = d.with_columns(
            fl=((_pl.col("dev") > LEN_OUTLIER_MAD_MULT
                 * _pl.col("mad_len"))
                & (_pl.col("dev") > LEN_OUTLIER_ABS_FLOOR))
            .cast(_pl.Int64))
        g = (d.group_by("conv_id")
             .agg(med_len=_pl.col("med_len").min(),
                  mad_len=_pl.col("mad_len").min(),
                  n_outliers=_pl.col("fl").sum()))
        return g.select(["conv_id", "med_len", "mad_len",
                         "n_outliers"]).to_arrow()

    return (ds.map_batches(slim, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("cb").map_groups(local, batch_format="pyarrow"))


# A normalized turn text occurring in more than this many DISTINCT
# conversations is corpus boilerplate — drop ALL its occurrences
# (Dolma / CCNet paragraph-frequency rule; stricter than dedup, which
# keeps the first copy). At the 20k-turn fixture the hottest text
# spans 82 conversations, so cap=30 exercises both branches.
BOILER_CONV_CAP = 30


def conv_boilerplate_turns(ds, cap: int = BOILER_CONV_CAP,
                           num_buckets: int = 0):
    """(conv_id, n_turns, n_boiler, boiler_permille): frequency-capped
    boilerplate-turn removal — a turn is boilerplate iff its normalized
    text is non-empty AND occurs in > `cap` DISTINCT conversations
    corpus-wide; ALL occurrences are flagged (the CCNet/Dolma
    paragraph-frequency rule — unlike dedup, no first copy survives,
    because a 13k-conversation greeting is noise in every copy).
    boiler_permille = (1000 * n_boiler) // n_turns, exact integers.

    Shape — two bucketed-local stages, no corpus-proportional Ray
    aggregate (CLAUDE.md huge-group-count rule):

    1. fused map: normalize (same chain as conv_near_dup_pairs) +
       zero-copy buffer-slice md5; non-empty rows bucket by hash so a
       text's corpus-wide distinct-conv count completes LOCALLY;
       empty-normalized rows (never boilerplate) bucket by conv hash
       instead — routing them to hash-bucket 0 would put every empty
       turn of the corpus in one task (skew);
    2. per hash bucket: one vectorized polars pass → per-(conv) partial
       (n_rows, n_boiler); partials shuffle on conv_bucket and sum
       locally — partial volume is #(conv, bucket) pairs, ≤ K per conv.

    Not a pair generator, so no hot-posting policy needed: the hottest
    hash contributes one count row, never cross-products.
    """
    import polars as _pl
    import pyarrow.compute as pc

    from dataquality_ray.arrowutil import md5_digests
    from dataquality_ray.spec import EDGE_WS_PATTERN, WS_PLUS_PATTERN

    num_buckets = num_buckets or cluster_buckets(minimum=32)

    def hash_map(batch: pa.Table) -> pa.Table:
        norm = pc.replace_substring_regex(
            pc.replace_substring_regex(
                pc.utf8_lower(batch["text"]), EDGE_WS_PATTERN, ""),
            WS_PLUS_PATTERN, " ")
        norm = pc.fill_null(norm, "")
        if isinstance(norm, pa.ChunkedArray):
            norm = norm.combine_chunks()
        digests = md5_digests(norm)
        convs = batch["conv_id"].to_pylist()
        n = len(convs)
        empty = pc.equal(pc.utf8_length(norm), 0).to_numpy(
            zero_copy_only=False)
        from zlib import crc32
        hb = np.fromiter(
            ((int.from_bytes(digests[i][:4], "little")
              if not empty[i] else crc32(convs[i].encode()))
             % num_buckets for i in range(n)),
            dtype=np.int32, count=n)
        return pa.table({
            "hb": pa.array(hb),
            "ch": pa.array([d.hex() if not e else ""
                            for d, e in zip(digests, empty)],
                           pa.string()),
            "conv_id": pa.array(convs, pa.string()),
        })

    def count_bucket(t: pa.Table) -> pa.Table:
        df = _pl.from_arrow(t.select(["ch", "conv_id"]))
        nonempty = df.filter(_pl.col("ch") != "")
        hot = (nonempty.group_by("ch")
               .agg(_pl.col("conv_id").n_unique().alias("nc"))
               .filter(_pl.col("nc") > cap)["ch"])
        out = (df.with_columns(
            fl=(_pl.col("ch") != "")
            & _pl.col("ch").is_in(hot.implode()))
            .group_by("conv_id")
            .agg(n=_pl.len().cast(_pl.Int64),
                 nb=_pl.col("fl").sum().cast(_pl.Int64)))
        return out.with_columns(
            cb=(_pl.col("conv_id").hash(seed=0)
                % num_buckets).cast(_pl.Int32)).to_arrow()

    def fold_conv(t: pa.Table) -> pa.Table:
        g = (_pl.from_arrow(t.select(["conv_id", "n", "nb"]))
             .group_by("conv_id")
             .agg(n_turns=_pl.col("n").sum(),
                  n_boiler=_pl.col("nb").sum())
             .with_columns(
                 boiler_permille=(1000 * _pl.col("n_boiler"))
                 // _pl.col("n_turns")))
        return g.select(["conv_id", "n_turns", "n_boiler",
                         "boiler_permille"]).to_arrow()

    return (ds.map_batches(hash_map, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("hb").map_groups(count_bucket,
                                      batch_format="pyarrow")
            .groupby("cb").map_groups(fold_conv,
                                      batch_format="pyarrow"))


def conv_boilerplate_removed_docs(ds, cap: int = BOILER_CONV_CAP,
                                  num_buckets: int = 0):
    """(conv_id, n_turns, n_kept, kept_text): the REMOVAL surface of
    conv_boilerplate_turns — conversations reassembled from their
    non-boilerplate turns (raw text, newline-joined, turn order
    preserved). The counts operator tells you how much boilerplate a
    corpus carries; this one is the pipeline a user actually runs to
    produce the cleaned corpus.

    Shape (the global_sentence_dedup topology at turn grain): raw text
    rides ONE hash-bucket shuffle (flag completes locally per hash),
    then ONE conv-bucket shuffle reassembles in turn order. Empty-
    normalized turns are never boilerplate and bucket by conv hash to
    avoid the single-bucket skew.
    """
    import polars as _pl
    import pyarrow.compute as pc

    from dataquality_ray.arrowutil import md5_digests
    from dataquality_ray.spec import EDGE_WS_PATTERN, WS_PLUS_PATTERN

    num_buckets = num_buckets or cluster_buckets(minimum=32)

    def hash_map(batch: pa.Table) -> pa.Table:
        norm = pc.replace_substring_regex(
            pc.replace_substring_regex(
                pc.utf8_lower(batch["text"]), EDGE_WS_PATTERN, ""),
            WS_PLUS_PATTERN, " ")
        norm = pc.fill_null(norm, "")
        if isinstance(norm, pa.ChunkedArray):
            norm = norm.combine_chunks()
        digests = md5_digests(norm)
        convs = batch["conv_id"].to_pylist()
        n = len(convs)
        empty = pc.equal(pc.utf8_length(norm), 0).to_numpy(
            zero_copy_only=False)
        from zlib import crc32
        hb = np.fromiter(
            ((int.from_bytes(digests[i][:4], "little")
              if not empty[i] else crc32(convs[i].encode()))
             % num_buckets for i in range(n)),
            dtype=np.int32, count=n)
        return pa.table({
            "hb": pa.array(hb),
            "ch": pa.array([d.hex() if not e else ""
                            for d, e in zip(digests, empty)],
                           pa.string()),
            "conv_id": pa.array(convs, pa.string()),
            "turn_idx": batch["turn_idx"],
            "text": pc.fill_null(batch["text"], ""),
        })

    def flag_bucket(t: pa.Table) -> pa.Table:
        df = _pl.from_arrow(t.select(["ch", "conv_id", "turn_idx",
                                      "text"]))
        hot = (df.filter(_pl.col("ch") != "")
               .group_by("ch")
               .agg(_pl.col("conv_id").n_unique().alias("nc"))
               .filter(_pl.col("nc") > cap)["ch"])
        out = df.with_columns(
            keep=~((_pl.col("ch") != "")
                   & _pl.col("ch").is_in(hot.implode())),
            cb=(_pl.col("conv_id").hash(seed=0)
                % num_buckets).cast(_pl.Int32))
        return out.select(["cb", "conv_id", "turn_idx", "text",
                           "keep"]).to_arrow()

    def assemble(t: pa.Table) -> pa.Table:
        d = (_pl.from_arrow(t.select(["conv_id", "turn_idx", "text",
                                      "keep"]))
             .sort(["conv_id", "turn_idx"]))
        g = (d.group_by("conv_id", maintain_order=True)
             .agg(n_turns=_pl.len().cast(_pl.Int64),
                  n_kept=_pl.col("keep").sum().cast(_pl.Int64),
                  kept_text=_pl.col("text").filter(_pl.col("keep"))
                  .str.join("\n")))
        g = g.with_columns(_pl.col("kept_text").fill_null(""))
        return g.select(["conv_id", "n_turns", "n_kept",
                         "kept_text"]).to_arrow()

    return (ds.map_batches(hash_map, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("hb").map_groups(flag_bucket,
                                      batch_format="pyarrow")
            .groupby("cb").map_groups(assemble,
                                      batch_format="pyarrow"))


CONV_NEAR_DUP_JACCARD_MILLI = 500   # pairs kept at Jaccard >= 0.5
# Boilerplate df cap: a normalized turn text occurring in more than
# this many DISTINCT conversations carries no retake evidence (it is
# corpus boilerplate — "ok", "thanks") and is EXCLUDED from every
# conversation's signature set, exactly like stopword/idf pruning in
# token-set similarity. This is what makes the operator scale-correct:
# measured at the 4M-turn fixture, the un-capped inverted index has a
# 13,523-conversation posting and 4.19e9 candidate pairs (3.93e9 from
# just 127 boilerplate hashes); with the cap, per-hash pair work is
# bounded by DF_CAP^2 and boilerplate cliques cannot explode the
# answer either.
CONV_DEDUP_DF_CAP = 100


def conv_near_dup_pairs(ds, num_buckets: int = 0):
    """(conv_a, conv_b, n_shared, n_a, n_b, jaccard_milli):
    CONVERSATION-level near-dup — pairs of conversations whose sets of
    distinct (normalized, non-empty, non-boilerplate: conversation
    frequency <= CONV_DEDUP_DF_CAP) turn content hashes have Jaccard
    >= 0.5. The whole-dialog dedup a transcript pipeline runs after
    turn-level dedup: two conversations that share most of their
    DISTINCTIVE turns are retakes/re-logs of each other even when no
    single turn group flags them.

    Exactness: a qualifying pair shares >= 1 surviving turn hash, so
    the inverted-index candidate generator (posting lists per hash)
    has EXACT recall over the capped sets; the verify is pure integer
    math (3*shared >= n_a + n_b  <=>  Jaccard >= 0.5) — SQL-checkable
    with no float anywhere (the DuckDB twin applies the identical
    HAVING df <= cap filter).

    Shape: ONE hash-bucket pass over the distinct (conv, hash) rows —
    every copy of a hash lives in exactly one bucket, so the df
    computation, the boilerplate filter, AND the posting-list pair
    partials all complete locally there (per-hash pair work is
    <= DF_CAP^2 by construction); the same pass emits the surviving
    rows, which a second narrow shuffle folds into per-conv sizes
    locally per CONV bucket (never a #convs-output Ray aggregate).
    Sizes attach to the (small) pair table via two distributed hash
    joins with a materialize between (CLAUDE.md join-starvation
    invariant). Python loops touch only multi-conversation posting
    lists, never corpus rows.
    """
    import hashlib

    import polars as _pl
    import pyarrow.compute as pc

    from dataquality_ray.spec import (
        EDGE_WS_PATTERN,
        WS_PLUS_PATTERN,
        token_hash_u64,
    )

    num_buckets = num_buckets or cluster_buckets(minimum=32)

    def hash_turns(batch: pa.Table) -> pa.Table:
        norm = pc.replace_substring_regex(
            pc.replace_substring_regex(
                pc.utf8_lower(batch["text"]), EDGE_WS_PATTERN, ""),
            WS_PLUS_PATTERN, " ")
        keep = pc.greater(pc.utf8_length(norm), 0)
        norm = norm.filter(keep)
        if isinstance(norm, pa.ChunkedArray):
            norm = norm.combine_chunks()
        convs = batch["conv_id"].filter(keep).to_pylist()
        # md5 over zero-copy utf-8 slices straight off the Arrow
        # buffer (the content_hash_batch recipe, stages/dedup.py) —
        # Arrow's storage IS the utf-8 encoding, so no per-row str
        # decode + re-encode round-trip
        n = len(norm)
        off_dtype = np.int64 if pa.types.is_large_string(norm.type) \
            else np.int32
        offs = np.frombuffer(norm.buffers()[1], dtype=off_dtype)[
            norm.offset: norm.offset + n + 1]
        data = memoryview(norm.buffers()[2])
        md5 = hashlib.md5
        from_bytes = int.from_bytes
        hashes = [""] * n
        hb = np.empty(n, dtype=np.int32)
        for i in range(n):
            d = md5(data[offs[i]:offs[i + 1]]).digest()
            hashes[i] = d
            hb[i] = from_bytes(d[:4], "little") % num_buckets
        cb = np.fromiter(
            (token_hash_u64(c) % num_buckets for c in convs),
            dtype=np.int32, count=len(convs))
        # ch rides the big shuffle as the RAW 16-byte digest (binary),
        # not 32-char hex — halves the widest exchanged column; only
        # hash identity matters downstream
        return pa.table({
            "hb": pa.array(hb),
            "cb": pa.array(cb),
            "conv_id": pa.array(convs, pa.string()),
            "ch": pa.array(hashes, pa.binary()),
        })

    hashed = ds.map_batches(hash_turns, batch_format="pyarrow",
                            zero_copy_batch=True)

    # ONE hash-bucket pass: every copy of a hash lands in one bucket,
    # so the global (conv, ch) dedup, the df computation, the
    # boilerplate cap, and the posting-list pair partials ALL complete
    # locally here. The pass emits a discriminated union — kind=0
    # surviving rows (feed the size count) and kind=1 pair partials —
    # so the expensive exchange happens exactly once.
    def pairs_local(g: pa.Table) -> pa.Table:
        df = (_pl.from_arrow(g.select(["cb", "conv_id", "ch"]))
              .unique(["conv_id", "ch"]))
        df = df.with_columns(m=_pl.len().over("ch")) \
            .filter(_pl.col("m") <= CONV_DEDUP_DF_CAP)
        # VECTORIZED posting-pair expansion (the round-4 probe, landed):
        # conv ids become dense integer codes whose order IS the
        # lexicographic conv order (rank("dense") over utf-8 strings ==
        # Python string order — utf-8 byte order preserves code-point
        # order), posting lists group by size, and each size class
        # expands through one precomputed triu index gather — no
        # per-pair Python floor. Pair partials then count via ONE
        # np.unique over packed int64 codes.
        df = df.with_columns(
            code=(_pl.col("conv_id").rank("dense") - 1)
            .cast(_pl.Int64))
        uniq_convs = (df.select(["code", "conv_id"]).unique()
                      .sort("code")["conv_id"].to_numpy())
        posts = (df.group_by("ch")
                 .agg(_pl.col("code").sort().alias("cs"))
                 .filter(_pl.col("cs").list.len() > 1))
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
        n_rows = len(df)
        rows_tbl = pa.table({
            "kind": pa.array(np.zeros(n_rows, dtype=np.int8)),
            "cb": df["cb"].to_arrow(),
            "conv_id": df["conv_id"].to_arrow(),
            "pb": pa.nulls(n_rows, pa.int32()),
            "conv_a": pa.nulls(n_rows, pa.string()),
            "conv_b": pa.nulls(n_rows, pa.string()),
            "c": pa.nulls(n_rows, pa.int64()),
        })
        if not a_parts:
            return rows_tbl
        a_all = np.concatenate(a_parts)
        b_all = np.concatenate(b_parts)
        nq = np.int64(len(uniq_convs))
        key, cnt = np.unique(a_all * nq + b_all, return_counts=True)
        part = _pl.DataFrame({
            "conv_a": uniq_convs[(key // nq)],
            "conv_b": uniq_convs[(key % nq)],
            "c": cnt.astype(np.int64),
        })
        pb = np.fromiter(
            (token_hash_u64(a + "|" + b) % num_buckets
             for a, b in zip(part["conv_a"].to_list(),
                             part["conv_b"].to_list())),
            dtype=np.int32, count=len(part))
        pairs_tbl = pa.table({
            "kind": pa.array(np.ones(len(part), dtype=np.int8)),
            "cb": pa.nulls(len(part), pa.int32()),
            "conv_id": pa.nulls(len(part), pa.string()),
            "pb": pa.array(pb),
            "conv_a": part["conv_a"].to_arrow(),
            "conv_b": part["conv_b"].to_arrow(),
            "c": part["c"].to_arrow(),
        }).cast(rows_tbl.schema)   # polars emits large_string; unify
        return pa.concat_tables([rows_tbl, pairs_tbl])

    union = (hashed.groupby("hb")
             .map_groups(pairs_local, batch_format="pyarrow")
             .materialize())

    # per-conv sizes over the SURVIVING rows (already globally
    # distinct): conv-bucket shuffle, local count per bucket
    def sizes_local(g: pa.Table) -> pa.Table:
        df = (_pl.from_arrow(g.select(["conv_id"]))
              .group_by("conv_id").agg(_pl.len().alias("n"))
              .with_columns(_pl.col("n").cast(_pl.Int64)))
        return df.to_arrow().cast(pa.schema([
            ("conv_id", pa.string()), ("n", pa.int64())]))

    def _rows_only(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        keep = _pc.equal(t["kind"], 0)
        return t.filter(keep).select(["cb", "conv_id"])

    sizes = (union.map_batches(_rows_only, batch_format="pyarrow",
                               zero_copy_batch=True)
             .groupby("cb")
             .map_groups(sizes_local, batch_format="pyarrow")
             .materialize())

    def pairs_merge(g: pa.Table) -> pa.Table:
        df = (_pl.from_arrow(g.select(["conv_a", "conv_b", "c"]))
              .group_by(["conv_a", "conv_b"])
              .agg(_pl.col("c").sum().alias("n_shared"))
              .with_columns(_pl.col("n_shared").cast(_pl.Int64)))
        return df.to_arrow().cast(pa.schema([
            ("conv_a", pa.string()), ("conv_b", pa.string()),
            ("n_shared", pa.int64())]))

    def _pairs_only(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        keep = _pc.equal(t["kind"], 1)
        return t.filter(keep).select(["pb", "conv_a", "conv_b", "c"])

    shared = (union.map_batches(_pairs_only, batch_format="pyarrow",
                                zero_copy_batch=True)
              .groupby("pb")
              .map_groups(pairs_merge, batch_format="pyarrow"))

    # attach set sizes: two distributed hash joins, materialize between
    def _as_sizes(key_name: str, n_name: str):
        empty = pa.schema([(key_name, pa.string()),
                           (n_name, pa.int64())]).empty_table()

        def rename(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return empty
            return pa.table({key_name: pc.cast(t["conv_id"],
                                               pa.string()),
                             n_name: pc.cast(t["n"], pa.int64())})
        return rename

    sizes_a = sizes.map_batches(_as_sizes("ca", "n_a"),
                                batch_format="pyarrow")
    sizes_b = sizes.map_batches(_as_sizes("cbk", "n_b"),
                                batch_format="pyarrow")
    nparts = max(4, num_buckets // 4)
    # the repartition between the joins is load-bearing beyond the
    # starvation invariant: Ray's join operator emits schemaless
    # zero-row blocks for hash partitions that received no rows, and a
    # SECOND join chained onto them fails FieldRef resolution in its
    # aggregator ("No match or multiple matches for key field
    # reference") — coalescing rewrites the empties into real blocks
    # (caught by the df-cap unit test on a 7-conversation input; cheap,
    # the pair table is small relative to the corpus)
    j1 = shared.join(sizes_a, join_type="inner", num_partitions=nparts,
                     on=("conv_a",), right_on=("ca",)) \
        .repartition(nparts).materialize()
    j2 = j1.join(sizes_b, join_type="inner", num_partitions=nparts,
                 on=("conv_b",), right_on=("cbk",))

    def finish(batch: pa.Table) -> pa.Table:
        sh = batch["n_shared"].to_numpy(zero_copy_only=False)
        na = batch["n_a"].to_numpy(zero_copy_only=False)
        nb = batch["n_b"].to_numpy(zero_copy_only=False)
        keep = 3 * sh >= na + nb
        jm = (1000 * sh[keep]) // (na[keep] + nb[keep] - sh[keep])
        return pa.table({
            "conv_a": batch["conv_a"].filter(pa.array(keep)),
            "conv_b": batch["conv_b"].filter(pa.array(keep)),
            "n_shared": pa.array(sh[keep].astype(np.int64)),
            "n_a": pa.array(na[keep].astype(np.int64)),
            "n_b": pa.array(nb[keep].astype(np.int64)),
            "jaccard_milli": pa.array(jm.astype(np.int64)),
        })

    return j2.map_batches(finish, batch_format="pyarrow")


def conv_dup_drops(ds, num_buckets: int = 0):
    """(conv_id, canonical_conv_id): the conversations REMOVED by
    whole-dialog near-dup dedup — connected components over
    conv_near_dup_pairs (same dup_clusters_auto dispatch: driver
    union-find under a provable pair limit, hash-join min-label
    propagation beyond it), every non-canonical member mapped to its
    cluster's min conv_id. The application side of conversation-level
    dedup; SQL-checked against a recursive-CTE component oracle.
    """
    import ray

    from dataquality_ray.stages.clustering import dup_clusters_auto

    pairs = conv_near_dup_pairs(ds, num_buckets).map_batches(
        lambda t: pa.table({"key_a": t["conv_a"], "key_b": t["conv_b"]}),
        batch_format="pyarrow")
    clusters = dup_clusters_auto(pairs)          # (key, cluster)
    if isinstance(clusters, pa.Table):           # driver union-find path
        clusters = ray.data.from_arrow(clusters)

    def drops(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        mask = pc.not_equal(t["key"], t["cluster"])
        f = t.filter(mask)
        return pa.table({"conv_id": f["key"],
                         "canonical_conv_id": f["cluster"]})

    return clusters.map_batches(drops, batch_format="pyarrow")


# --- heavy hitters -----------------------------------------------------

# prefilter count-min sketch, sized so cell noise (total_tokens/WIDTH)
# is ~0.5% of the threshold (total/20 / HH_CMS_WIDTH-to-threshold
# ratio) at ANY corpus size — the candidate set stays within a few
# percent of the true heavy-hitter set as the corpus grows. These are
# prefilter-internal constants (the OUTPUT is exact counts, so unlike
# term_counts_cms nothing here needs a DuckDB twin).
HH_CMS_DEPTH = 4
HH_CMS_WIDTH = 4096
HH_MIN_DIV = 20      # threshold = n_turns // HH_MIN_DIV


def _hh_cell_hashes(terms, row_i: int, width: int) -> np.ndarray:
    """Vectorized CMS cell index per term (polars xxhash, seeded by the
    sketch row). Prefilter-internal only: the hash never reaches an
    output or an oracle, so it needs determinism across this run's
    worker processes (polars' hash seed is fixed), not the frozen md5
    contract."""
    import polars as pl
    h = terms if isinstance(terms, pl.Series) \
        else pl.Series(list(terms), dtype=pl.String)
    return (h.hash(seed=row_i).to_numpy()
            % np.uint64(width)).astype(np.int64)


def transcript_heavy_hitters(ds, min_div: int = HH_MIN_DIV,
                             cms_width: int = HH_CMS_WIDTH):
    """(term, cf): EXACT corpus heavy hitters — every token (lowercased
    ``spec.TOKEN_PATTERN``) whose collection frequency is at least
    ``n_turns // min_div``.

    The naive shape — GROUP BY term over the full token stream — moves
    a vocabulary that scales with the corpus through the shuffle to
    discard almost all of it. Instead this is the classic two-pass
    sketch-prefiltered exact aggregate:

    1. ONE tokenize pass reduces each batch to its local (term, count)
       partials — the corpus's only text-proportional work — and
       MATERIALIZES them (vocab-compressed: orders of magnitude
       smaller than the corpus; the object store spills if needed).
    2. A constant-size count-min sketch folds up from the partials
       (≤ DEPTH×WIDTH int64 cells per batch, tiny reduce); the driver
       broadcasts the ≤128 KiB table via ray.put.
    3. A probe pass over the SAME materialized partials forwards only
       terms whose sketch estimate clears the threshold. CMS estimates
       never under-count, so the prefilter has NO false negatives —
       the final small groupby + exact HAVING filter returns exactly
       what the full-vocab groupby would (the DuckDB twin is the plain
       GROUP BY ... HAVING, no sketch involved).

    At 10^12 tokens the vocabulary tail (≈ all of it) never leaves its
    batch; only the few-hundred-term candidate set is shuffled, and
    the text is tokenized exactly once.
    """
    import ray
    import polars as pl
    from ray.data.aggregate import Sum
    from dataquality_ray.spec import TOKEN_PATTERN

    n_rows = ds.count()                    # parquet metadata only
    threshold = max(1, n_rows // min_div)

    def term_partial(batch: pa.Table) -> pa.Table:
        toks = (pl.from_arrow(batch["text"]).str.to_lowercase()
                .str.extract_all(TOKEN_PATTERN))
        cnt = (pl.DataFrame({"term": toks}).explode("term")
               .drop_nulls().group_by("term")
               .agg(pl.len().cast(pl.Int64).alias("n")))
        return cnt.to_arrow().cast(pa.schema([
            ("term", pa.string()), ("n", pa.int64())]))

    partials = ds.map_batches(term_partial, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    # the sketch merges by ADDITION over a constant-size dense array,
    # so the reduce is a blob fold (one 128 KiB binary row per block,
    # tree-folded to ≤ cluster_buckets rows before the driver sums) —
    # never a multi-million-cell-row Ray sort aggregate
    def dense_cms(batch: pa.Table) -> pa.Table:
        terms = pl.from_arrow(batch["term"])
        n = batch["n"].to_numpy(zero_copy_only=False)
        tbl = np.zeros((HH_CMS_DEPTH, cms_width), dtype=np.int64)
        for i in range(HH_CMS_DEPTH):
            np.add.at(tbl[i], _hh_cell_hashes(terms, i, cms_width), n)
        return pa.table({"cms": pa.array([tbl.tobytes()],
                                         pa.binary())})

    def fold_blobs(batch: pa.Table) -> pa.Table:
        acc = np.zeros(HH_CMS_DEPTH * cms_width, dtype=np.int64)
        for b in batch["cms"].to_pylist():
            acc += np.frombuffer(b, dtype=np.int64)
        return pa.table({"cms": pa.array([acc.tobytes()],
                                         pa.binary())})

    folded = (partials.map_batches(dense_cms, batch_format="pyarrow",
                                   zero_copy_batch=True)
              .repartition(cluster_buckets(minimum=8))
              .map_batches(fold_blobs, batch_format="pyarrow")
              .take_all())
    table = np.zeros(HH_CMS_DEPTH * cms_width, dtype=np.int64)
    for r in folded:
        table += np.frombuffer(r["cms"], dtype=np.int64)
    table = table.reshape(HH_CMS_DEPTH, cms_width)
    cms_ref = ray.put(table)

    import functools

    def candidates(batch: pa.Table, *, ref) -> pa.Table:
        cms = ray.get(ref)
        terms = pl.from_arrow(batch["term"])
        if not len(terms):
            return batch
        est = np.min(np.stack([
            cms[i, _hh_cell_hashes(terms, i, cms_width)]
            for i in range(HH_CMS_DEPTH)]), axis=0)
        # over-estimate only → exact recall
        return batch.filter(pa.array(est >= threshold))

    agg = (partials.map_batches(
        functools.partial(candidates, ref=cms_ref),
        batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term").aggregate(Sum("n", alias_name="cf")))

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = pa.table({"term": t["term"],
                      "cf": pc.cast(t["cf"], pa.int64())})
        return t.filter(pc.greater_equal(t["cf"], threshold))

    return agg.map_batches(finish, batch_format="pyarrow") \
        .sort("term")


BIGRAM_TOP_K = 50


def token_bigram_merges(ds, num_buckets: int = 0,
                        top_k: int = BIGRAM_TOP_K):
    """(a, b, cf): the top-K most frequent ADJACENT token pairs across
    the corpus — BPE merge-candidate mining, the inner statistic of one
    tokenizer-training round (pairs are within-turn, lowercased
    ``spec.TOKEN_PATTERN`` tokens in document order).

    Scale shape: distinct pairs grow with the corpus, so the pair
    totals never touch a Ray aggregate — per-batch vectorized pair
    combiner (polars shift-over-row), ONE pair-hash bucketed shuffle
    (each pair lives in exactly one bucket → local sums are the exact
    totals), per-bucket local top-K, then a tiny global top-K over
    ≤ buckets×K candidate rows. Ties break (cf desc, a asc, b asc) on
    both engines.
    """
    import polars as pl
    from dataquality_ray.spec import TOKEN_PATTERN

    nb = num_buckets or cluster_buckets()

    def partial(batch: pa.Table) -> pa.Table:
        toks = (pl.from_arrow(batch["text"]).str.to_lowercase()
                .str.extract_all(TOKEN_PATTERN))
        e = (pl.DataFrame({"toks": toks}).with_row_index("rid")
             .explode("toks").drop_nulls("toks"))
        e = e.with_columns(b=pl.col("toks").shift(-1).over("rid")) \
             .drop_nulls("b")
        g = (e.group_by(["toks", "b"])
             .agg(pl.len().cast(pl.Int64).alias("cf"))
             .rename({"toks": "a"}))
        # routing-only hash (every pair still lands in exactly one
        # bucket) — vectorized xxhash, not the frozen md5 contract
        part = ((pl.col("a") + "\x1f" + pl.col("b")).hash(seed=0)
                % nb).cast(pl.Int32)
        return g.with_columns(part=part).to_arrow().cast(
            pa.schema([("a", pa.string()), ("b", pa.string()),
                       ("cf", pa.int64()), ("part", pa.int32())]))

    def per_bucket(t: pa.Table) -> pa.Table:
        g = (pl.from_arrow(t.select(["a", "b", "cf"]))
             .group_by(["a", "b"]).agg(pl.col("cf").sum())
             .sort(["cf", "a", "b"], descending=[True, False, False])
             .head(top_k))
        return g.to_arrow().cast(pa.schema([
            ("a", pa.string()), ("b", pa.string()),
            ("cf", pa.int64())]))

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("part").map_groups(per_bucket,
                                        batch_format="pyarrow")
            .sort(["cf", "a", "b"], descending=[True, False, False])
            .limit(top_k))


def transcript_rare_tokens(ds, num_buckets: int = 0):
    """(conv_id, turn_idx, n_rare): memorization / PII-risk audit — per
    turn, how many of its tokens are CORPUS-UNIQUE, i.e. their frozen
    md5-u64 token hash occurs exactly once across the whole corpus. A
    corpus-unique string is learnable from exactly one place (the
    Carlini-style memorization-risk shape) and is where unscrubbed
    identifiers hide after the regex pass. Only turns with n_rare > 0
    are emitted (the contaminated_documents convention). Uniqueness is
    defined ON THE HASH so DuckDB's md5_number_upper replays the
    decision exactly, collisions included.

    Scale shape: the distinct-token space grows with the corpus, so
    totals never touch a Ray aggregate — per-batch tokenize (dictionary
    encode → one md5 per distinct term) with batch-local counts;
    batch-singleton hashes ship as slim (h, conv, turn) rows while
    multi-occurrence hashes collapse to ONE tombstone row each (no
    posting explosion, cf CONV_DEDUP_DF_CAP); ONE hash-bucket shuffle
    decides global uniqueness locally (every copy of a hash lives in
    one bucket); surviving per-turn partials complete in a turn-keyed
    bucket pass — each turn in exactly one bucket, never a
    corpus-proportional Ray aggregate.
    """
    import polars as pl

    from dataquality_ray.spec import TOKEN_PATTERN, token_hash_u64

    nb = num_buckets or cluster_buckets()

    _sing = pa.schema([
        ("hpart", pa.int32()), ("h", pa.int64()),
        ("conv_id", pa.string()), ("turn_idx", pa.int64()),
        ("n", pa.int64())])
    _part = pa.schema([
        ("part", pa.int32()), ("conv_id", pa.string()),
        ("turn_idx", pa.int64()), ("n_rare", pa.int64())])
    _out = pa.schema([
        ("conv_id", pa.string()), ("turn_idx", pa.int64()),
        ("n_rare", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        toks = (pl.from_arrow(batch["text"]).str.to_lowercase()
                .str.extract_all(TOKEN_PATTERN))
        e = (pl.DataFrame({
            "conv_id": pl.from_arrow(batch["conv_id"]),
            "turn_idx": pl.from_arrow(batch["turn_idx"])
            .cast(pl.Int64),
            "toks": toks,
        }).explode("toks").drop_nulls("toks"))
        tcol = e["toks"].to_arrow()
        if isinstance(tcol, pa.ChunkedArray):
            tcol = tcol.combine_chunks()
        if len(tcol) == 0:
            return _sing.empty_table()
        enc = tcol.dictionary_encode()
        lut = np.fromiter(
            (token_hash_u64(u) for u in enc.dictionary.to_pylist()),
            dtype=np.uint64, count=len(enc.dictionary))
        h = lut[enc.indices.to_numpy(zero_copy_only=False)]
        df = (e.drop("toks")
              .with_columns(h=pl.Series("h", h.view(np.int64))))
        cnt = df.group_by("h").agg(n=pl.len().cast(pl.Int64))
        singles = df.join(cnt.filter(pl.col("n") == 1), on="h",
                          how="inner")
        tomb = (cnt.filter(pl.col("n") >= 2)
                .with_columns(conv_id=pl.lit("", dtype=pl.String),
                              turn_idx=pl.lit(-1, dtype=pl.Int64),
                              n=pl.lit(2, dtype=pl.Int64)))
        rows = pl.concat([singles.select(["h", "conv_id", "turn_idx",
                                          "n"]),
                          tomb.select(["h", "conv_id", "turn_idx",
                                       "n"])])
        hp = (rows["h"].to_numpy().view(np.uint64)
              % np.uint64(nb)).astype(np.int32)
        return rows.with_columns(
            hpart=pl.Series("hpart", hp)).select(
            ["hpart", "h", "conv_id", "turn_idx", "n"]) \
            .to_arrow().cast(_sing)

    def decide(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["h", "conv_id", "turn_idx", "n"]))
        tot = df.group_by("h").agg(tot=pl.col("n").sum())
        singles = (df.filter(pl.col("turn_idx") >= 0)
                   .join(tot.filter(pl.col("tot") == 1), on="h",
                         how="inner"))
        g = (singles.group_by(["conv_id", "turn_idx"])
             .agg(n_rare=pl.len().cast(pl.Int64)))
        # routing-only hash for the turn-keyed completion pass
        part = ((pl.col("conv_id") + "\x1f"
                 + pl.col("turn_idx").cast(pl.String)).hash(seed=0)
                % nb).cast(pl.Int32)
        return g.with_columns(part=part).select(
            ["part", "conv_id", "turn_idx", "n_rare"]) \
            .to_arrow().cast(_part)

    def finish(t: pa.Table) -> pa.Table:
        g = (pl.from_arrow(t.select(["conv_id", "turn_idx", "n_rare"]))
             .group_by(["conv_id", "turn_idx"])
             .agg(pl.col("n_rare").sum()))
        return g.to_arrow().cast(_out)

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("hpart").map_groups(decide, batch_format="pyarrow")
            .groupby("part").map_groups(finish, batch_format="pyarrow"))


def conv_near_dup_split_leakage(ds, num_buckets: int = 0):
    """(conv_a, conv_b, split_a, split_b, jaccard_milli): NEAR-DUP
    split leakage — conversation near-dup pairs whose endpoints were
    assigned DIFFERENT train/val/test splits. The leakage exact-content
    audits miss: after exact dedup, what invalidates an eval is a val
    conversation that is a light retake of a train conversation. Splits
    are the frozen md5 80/10/10 rule (same as transcript_split_leakage
    / dataset_split_documents), a pure function of conv_id — so the
    flag pass needs NO join: one map over the (already bounded)
    near-dup pair table.
    """
    from dataquality_ray.pipelines.documents import (
        SPLIT_BUCKETS,
        SPLIT_TRAIN_LT,
        SPLIT_VAL_LT,
    )
    from dataquality_ray.spec import token_hash_u64

    pairs = conv_near_dup_pairs(ds, num_buckets)

    def flag(t: pa.Table) -> pa.Table:
        def split_of(ids):
            b = np.fromiter((token_hash_u64(c) % SPLIT_BUCKETS
                             for c in ids), dtype=np.int64,
                            count=len(ids))
            return np.where(b < SPLIT_TRAIN_LT, "train",
                            np.where(b < SPLIT_VAL_LT, "val", "test"))

        sa = split_of(t["conv_a"].to_pylist())
        sb = split_of(t["conv_b"].to_pylist())
        keep = sa != sb
        tt = t.filter(pa.array(keep))
        return pa.table({
            "conv_a": tt["conv_a"],
            "conv_b": tt["conv_b"],
            "split_a": pa.array(sa[keep], pa.string()),
            "split_b": pa.array(sb[keep], pa.string()),
            "jaccard_milli": tt["jaccard_milli"],
        })

    return pairs.map_batches(flag, batch_format="pyarrow")


def conv_structure_violations(ds, num_buckets: int = 0):
    """(conv_id, n_bad_start, n_role_repeat, n_orphan_tool,
    n_ts_regress, n_idx_gaps, is_valid): per-conversation structural
    validation of the transcript contract — the dialog-shape analog of
    the reference's per-record dimension validator
    (reference backend/app/services/metadata.py:425-451):

    - n_bad_start: first turn's role is neither 'user' nor 'system';
    - n_role_repeat: turns whose role equals the previous turn's role;
    - n_orphan_tool: 'tool' turns not directly preceded by an
      'assistant' turn (a tool result with no tool call);
    - n_ts_regress: turns whose timestamp precedes the previous turn's;
    - n_idx_gaps: first turn_idx != 0, plus any non-consecutive
      turn_idx step;
    - is_valid: 1 iff all counters are zero.

    Shape: ONE conv-bucket shuffle of slim (conv_id, turn_idx, role,
    ts_us) rows; every LAG comparison and the per-conv rollup complete
    LOCALLY per bucket in one vectorized polars pass (each conversation
    lives in exactly one bucket), so nothing downstream scales with
    corpus size beyond #conversations."""
    import polars as _pl
    import pyarrow.compute as pc
    from dataquality_ray.pipelines.quality import conv_bucket_of

    num_buckets = num_buckets or cluster_buckets(minimum=16)

    def bucket(batch: pa.Table) -> pa.Table:
        return pa.table({
            "bucket": conv_bucket_of(batch["conv_id"], num_buckets),
            "conv_id": batch["conv_id"],
            "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            "role": batch["role"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
        })

    def scan(t: pa.Table) -> pa.Table:
        # whole-frame shift(1) + a same-conv mask instead of per-conv
        # shift windows, and row-wise Int64 flag COLUMNS before the
        # groupby so the per-conv agg is plain column sums (polars'
        # fast path) — the windowed/group-expression variant measured
        # 160 s vs ~9 s for this shape at sf0.1/32
        d = (_pl.from_arrow(t.select(["conv_id", "turn_idx", "role",
                                      "ts_us"]))
             .sort(["conv_id", "turn_idx"]))
        same = (_pl.col("conv_id") == _pl.col("conv_id").shift(1)) \
            .fill_null(False)
        prev_role = _pl.col("role").shift(1)
        first = ~same
        d = d.with_columns(
            bad_start=(first & ~_pl.col("role")
                       .is_in(["user", "system"])).cast(_pl.Int64),
            role_repeat=(same & (_pl.col("role") == prev_role))
            .cast(_pl.Int64),
            orphan_tool=((_pl.col("role") == "tool")
                         & (first | (prev_role != "assistant")))
            .cast(_pl.Int64),
            ts_regress=(same & (_pl.col("ts_us")
                                < _pl.col("ts_us").shift(1)))
            .cast(_pl.Int64),
            idx_gap=((first & (_pl.col("turn_idx") != 0))
                     | (same & (_pl.col("turn_idx")
                                != _pl.col("turn_idx").shift(1) + 1)))
            .cast(_pl.Int64))
        g = d.group_by("conv_id").agg(
            n_bad_start=_pl.col("bad_start").sum(),
            n_role_repeat=_pl.col("role_repeat").sum(),
            n_orphan_tool=_pl.col("orphan_tool").sum(),
            n_ts_regress=_pl.col("ts_regress").sum(),
            n_idx_gaps=_pl.col("idx_gap").sum())
        g = g.with_columns(
            is_valid=((_pl.col("n_bad_start") + _pl.col("n_role_repeat")
                       + _pl.col("n_orphan_tool")
                       + _pl.col("n_ts_regress")
                       + _pl.col("n_idx_gaps")) == 0).cast(_pl.Int64))
        return g.to_arrow()

    return (ds.map_batches(bucket, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("bucket")
            .map_groups(scan, batch_format="pyarrow"))


# context-assembly budget (chars) for conv_context_budget — interpolated
# into the DuckDB oracle; chars, not tokens, so the rule is exact on
# both engines without a tokenizer in SQL.
CONTEXT_BUDGET_CHARS = 600


def conv_context_budget(ds, num_buckets: int = 0,
                        budget: int = CONTEXT_BUDGET_CHARS):
    """(conv_id, n_turns, total_chars, fit_turns, truncate_turn_idx):
    per-conversation context-window accounting — the running prefix sum
    of turn text length in (conv_id, turn_idx) order, reduced to how
    many leading turns fit a fixed context budget and the first turn
    index that overflows it (-1 if the whole conversation fits). The
    truncation plan a chat-training data builder computes before
    packing transcripts into fixed-length sequences
    (cf. packed_sequence_documents, which packs whole docs).

    Shape: ONE conv-bucket shuffle of slim (conv_id, turn_idx, len)
    rows; the cumulative sum and rollup complete LOCALLY per bucket in
    one vectorized polars pass."""
    import polars as _pl
    import pyarrow.compute as pc
    from dataquality_ray.pipelines.quality import conv_bucket_of

    num_buckets = num_buckets or cluster_buckets(minimum=16)

    def bucket(batch: pa.Table) -> pa.Table:
        return pa.table({
            "bucket": conv_bucket_of(batch["conv_id"], num_buckets),
            "conv_id": batch["conv_id"],
            "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            "len": pc.cast(pc.utf8_length(batch["text"]), pa.int64()),
        })

    def scan(t: pa.Table) -> pa.Table:
        d = (_pl.from_arrow(t.select(["conv_id", "turn_idx", "len"]))
             .sort(["conv_id", "turn_idx"])
             .with_columns(cum=_pl.col("len").cum_sum()
                           .over("conv_id")))
        over = _pl.col("cum") > budget
        g = d.group_by("conv_id").agg(
            n_turns=_pl.len().cast(_pl.Int64),
            total_chars=_pl.col("len").sum(),
            fit_turns=(~over).cast(_pl.Int64).sum(),
            truncate_turn_idx=_pl.when(over.any())
            .then(_pl.col("turn_idx").filter(over).min())
            .otherwise(-1).cast(_pl.Int64))
        return g.to_arrow()

    return (ds.map_batches(bucket, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("bucket")
            .map_groups(scan, batch_format="pyarrow"))


# inactivity threshold for conv_session_splits — interpolated into the
# DuckDB oracle (change here, both engines move).
SESSION_GAP_US = 240_000_000   # 4 minutes


def conv_session_splits(ds, num_buckets: int = 0,
                        gap_us: int = SESSION_GAP_US):
    """(conv_id, n_turns, n_sessions, max_session_turns):
    inactivity-based sessionization WITHIN each conversation — a new
    session starts when the gap to the previous turn exceeds
    ``gap_us``. The transcript-native sibling of user_sessions (which
    sessionizes the events table per user): long multi-sitting
    conversations get split before packing/dedup so one transcript
    doesn't span days of context.

    Shape: ONE conv-bucket shuffle of slim (conv_id, turn_idx, ts_us)
    rows; the gap flags, the running session index (cum_sum of flags)
    and the two-level rollup all complete LOCALLY per bucket in one
    vectorized polars pass."""
    import polars as _pl
    import pyarrow.compute as pc
    from dataquality_ray.pipelines.quality import conv_bucket_of

    num_buckets = num_buckets or cluster_buckets(minimum=16)

    def bucket(batch: pa.Table) -> pa.Table:
        return pa.table({
            "bucket": conv_bucket_of(batch["conv_id"], num_buckets),
            "conv_id": batch["conv_id"],
            "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            "ts_us": pc.cast(batch["ts"], pa.int64()),
        })

    def scan(t: pa.Table) -> pa.Table:
        d = (_pl.from_arrow(t.select(["conv_id", "turn_idx", "ts_us"]))
             .sort(["conv_id", "turn_idx"])
             .with_columns(
                 newsess=(_pl.col("ts_us")
                          - _pl.col("ts_us").shift(1).over("conv_id")
                          > gap_us).fill_null(False)))
        d = d.with_columns(
            sid=_pl.col("newsess").cast(_pl.Int64).cum_sum()
            .over("conv_id"))
        per_sess = d.group_by("conv_id", "sid").agg(
            n=_pl.len().cast(_pl.Int64))
        g = per_sess.group_by("conv_id").agg(
            n_turns=_pl.col("n").sum(),
            n_sessions=_pl.len().cast(_pl.Int64),
            max_session_turns=_pl.col("n").max())
        return g.to_arrow()

    return (ds.map_batches(bucket, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("bucket")
            .map_groups(scan, batch_format="pyarrow"))


def conv_loop_turns(ds, num_buckets: int = 0):
    """(conv_id, n_turns, n_echo_turns, first_echo_idx): agent-loop
    detection — a turn is an "echo" when its exact text already
    appeared at an earlier turn of the SAME conversation (the stuck
    tool-retry / repeated-assistant-reply pathology filtered out of
    agent-transcript training data). Complements windowed_turn_dedup
    (global, time-windowed) with the conversation-local exact repeat.

    Shape: ONE conv-bucket shuffle of slim (conv_id, turn_idx,
    16-byte md5-of-text) rows — the digest stands in for the text in
    the exchange AND the repeat test (the column_profile /
    conv_near_dup_pairs digest-for-value pattern; md5-collision-exact
    for equality, null text gets a 1-byte sentinel so it can't collide
    with '' the way a raw empty-slice hash would and stays its own
    DuckDB-style partition); the per-(conv, digest) first-occurrence
    test and the rollup complete LOCALLY per bucket in one vectorized
    polars pass."""
    import polars as _pl
    import pyarrow.compute as pc
    from dataquality_ray.arrowutil import md5_digests
    from dataquality_ray.pipelines.quality import conv_bucket_of

    num_buckets = num_buckets or cluster_buckets(minimum=16)

    def bucket(batch: pa.Table) -> pa.Table:
        txt = batch["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        digs = md5_digests(txt)
        if txt.null_count:
            nulls = pc.is_null(txt).to_numpy(zero_copy_only=False)
            digs = [b"\x00" if nulls[i] else d
                    for i, d in enumerate(digs)]
        return pa.table({
            "bucket": conv_bucket_of(batch["conv_id"], num_buckets),
            "conv_id": batch["conv_id"],
            "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            "h": pa.array(digs, type=pa.binary()),
        })

    def scan(t: pa.Table) -> pa.Table:
        # echo = not the FIRST occurrence of (conv_id, digest): one
        # hash-pass is_first_distinct over the (conv_id, turn_idx)-
        # sorted frame instead of a string-keyed cum_count window
        # (measured 69 s -> 22 s for the window->distinct rewrite,
        # then digest-shipping on top), and plain Int64 flag columns
        # before the groupby so the per-conv agg stays on polars'
        # fast path (same lesson as conv_structure_violations above).
        d = (_pl.from_arrow(t.select(["conv_id", "turn_idx", "h"]))
             .sort(["conv_id", "turn_idx"]))
        echo = ~_pl.struct(["conv_id", "h"]).is_first_distinct()
        d = d.with_columns(
            echo=echo.cast(_pl.Int64),
            echo_idx=_pl.when(echo).then(_pl.col("turn_idx"))
            .otherwise(None))
        g = d.group_by("conv_id").agg(
            n_turns=_pl.len().cast(_pl.Int64),
            n_echo_turns=_pl.col("echo").sum(),
            first_echo_idx=_pl.col("echo_idx").min()
            .fill_null(-1).cast(_pl.Int64))
        return g.to_arrow()

    return (ds.map_batches(bucket, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("bucket")
            .map_groups(scan, batch_format="pyarrow"))


def turn_echo_jaccard(ds, num_buckets: int = 0):
    """(conv_id, turn_idx, jaccard_milli): distinct-token Jaccard
    between each turn and its predecessor in the same conversation
    (integer milli; -1 when either side has no tokens; turn 0 of each
    conversation is excluded). The "assistant parrots the user /
    itself" near-echo signal read alongside conv_loop_turns' exact
    repeats.

    Shape: raw (conv_id, turn_idx, text) rows through ONE conv-bucket
    shuffle; tokenization (pinned TOKEN_PATTERN), the LAG, and the
    set-intersection arithmetic are all bucket-local vectorized polars
    (tokenizing after the shuffle keeps list columns out of the
    exchange — the Acero list-payload rule)."""
    import polars as _pl
    import pyarrow.compute as pc
    from dataquality_ray.pipelines.quality import conv_bucket_of
    from dataquality_ray.spec import TOKEN_PATTERN

    num_buckets = num_buckets or cluster_buckets(minimum=16)

    def bucket(batch: pa.Table) -> pa.Table:
        return pa.table({
            "bucket": conv_bucket_of(batch["conv_id"], num_buckets),
            "conv_id": batch["conv_id"],
            "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            "text": batch["text"],
        })

    def scan(t: pa.Table) -> pa.Table:
        d = (_pl.from_arrow(t.select(["conv_id", "turn_idx", "text"]))
             .sort(["conv_id", "turn_idx"])
             .with_columns(toks=_pl.col("text").str.to_lowercase()
                           .str.extract_all(TOKEN_PATTERN)
                           .list.unique()))
        d = d.with_columns(prev=_pl.col("toks").shift(1)
                           .over("conv_id")).drop_nulls("prev")
        na = _pl.col("toks").list.len().cast(_pl.Int64)
        nb = _pl.col("prev").list.len().cast(_pl.Int64)
        ni = (_pl.col("toks").list.set_intersection(_pl.col("prev"))
              .list.len().cast(_pl.Int64))
        d = d.with_columns(
            jaccard_milli=_pl.when((na > 0) & (nb > 0))
            .then(1000 * ni // (na + nb - ni))
            .otherwise(-1).cast(_pl.Int64))
        return d.select(["conv_id", "turn_idx",
                         "jaccard_milli"]).to_arrow()

    return (ds.map_batches(bucket, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("bucket")
            .map_groups(scan, batch_format="pyarrow"))


# first-K-turn template-opener window for conv_prefix_dup_groups —
# interpolated into the DuckDB oracle (change here, both engines move).
CONV_PREFIX_K = 2


def conv_prefix_dup_groups(ds, num_buckets: int = 0,
                           k: int = CONV_PREFIX_K):
    """(conv_id, prefix_hash, group_size, is_prefix_dup): template-
    opener dedup signal — conversations are grouped by the md5 of
    their first ``k`` turns' text (unit-separator-joined in turn
    order; null text as ''), and each conversation is annotated with
    how many conversations share its opener. Boilerplate greetings /
    scripted first exchanges are a known duplication mode that whole-
    conversation dedup misses when later turns diverge (the same
    curation concern conv_near_dup_pairs' df-cap exists for, at the
    prefix granularity).

    Shape: the corpus shrinks to ≤ k slim rows per conversation at
    the first map (turn_idx < k filter), then ONE conv-bucket shuffle
    assembles each opener locally and ONE digest-bucket shuffle of
    1-row-per-conversation (conv_id, 32-char hash) rows counts group
    sizes locally — both exchanges are bounded by #conversations,
    never corpus turns."""
    import numpy as np
    import polars as _pl
    import pyarrow.compute as pc
    from dataquality_ray.arrowutil import md5_digests
    from dataquality_ray.pipelines.quality import conv_bucket_of

    num_buckets = num_buckets or cluster_buckets(minimum=16)

    def bucket(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less(batch["turn_idx"], k))
        return pa.table({
            "bucket": conv_bucket_of(batch["conv_id"], num_buckets),
            "conv_id": batch["conv_id"],
            "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            "text": batch["text"],
        })

    def assemble(t: pa.Table) -> pa.Table:
        # polars group_by preserves within-group row order, so sorting
        # the frame by (conv_id, turn_idx) first makes str.join
        # reproduce SQL's string_agg(... ORDER BY turn_idx)
        d = (_pl.from_arrow(t.select(["conv_id", "turn_idx", "text"]))
             .sort(["conv_id", "turn_idx"])
             .group_by("conv_id", maintain_order=True)
             .agg(prefix=_pl.col("text").fill_null("")
                  .str.join("\x1f")))
        out = d.to_arrow()
        digs = md5_digests(out["prefix"])
        hx = pa.array([d.hex() for d in digs], pa.string())
        # digest-bucket for the group-size exchange straight off the
        # digest's first 4 bytes — no second md5 pass
        hb = np.array([int.from_bytes(d[:4], "little") % num_buckets
                       for d in digs], dtype=np.int32)
        return pa.table({"hbucket": pa.array(hb),
                         "conv_id": out["conv_id"],
                         "prefix_hash": hx})

    def size_groups(t: pa.Table) -> pa.Table:
        d = _pl.from_arrow(t.select(["conv_id", "prefix_hash"]))
        d = d.with_columns(
            group_size=_pl.len().over("prefix_hash").cast(_pl.Int64))
        d = d.with_columns(
            is_prefix_dup=(_pl.col("group_size") > 1).cast(_pl.Int64))
        return d.to_arrow()

    return (ds.map_batches(bucket, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("bucket")
            .map_groups(assemble, batch_format="pyarrow")
            .groupby("hbucket")
            .map_groups(size_groups, batch_format="pyarrow"))


def tool_transition_stats(ds, num_buckets: int = 0):
    """(from_kind, to_kind, n_transitions): first-order Markov counts
    over consecutive turns within each conversation, where a turn's
    kind is its role except tool turns, which carry the tool name
    ('tool:exec', 'tool:browse', ...). The transcript-native sibling
    of event_type_transitions (pipelines/metrics.py) — the agent-
    trajectory structure stat (which tools follow which, how often an
    assistant turn hands off to a tool) read alongside
    conv_structure_violations' contract checks.

    Shape: ONE conv-bucket shuffle of slim (conv_id, turn_idx, kind)
    rows; each bucket counts its local transition pairs with a whole-
    frame shift + same-conv mask (the conv_structure_violations fast
    path), then a tiny global groupby merges partials (output rows
    ≤ |kinds|², constant at any corpus size)."""
    import polars as _pl
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from dataquality_ray.pipelines.quality import conv_bucket_of

    num_buckets = num_buckets or cluster_buckets(minimum=16)

    def bucket(batch: pa.Table) -> pa.Table:
        role = batch["role"]
        kind = pc.if_else(
            pc.equal(role, "tool"),
            pc.binary_join_element_wise(
                "tool:", pc.fill_null(batch["tool"], ""), ""),
            role)
        return pa.table({
            "bucket": conv_bucket_of(batch["conv_id"], num_buckets),
            "conv_id": batch["conv_id"],
            "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            "kind": kind,
        })

    def transitions(t: pa.Table) -> pa.Table:
        d = (_pl.from_arrow(t.select(["conv_id", "turn_idx", "kind"]))
             .sort(["conv_id", "turn_idx"]))
        same = (_pl.col("conv_id") == _pl.col("conv_id").shift(1)) \
            .fill_null(False)
        d = (d.with_columns(from_kind=_pl.col("kind").shift(1),
                            same=same)
             .filter(_pl.col("same"))
             .group_by(["from_kind", "kind"])
             .agg(n=_pl.len().cast(_pl.Int64))
             .rename({"kind": "to_kind"}))
        return d.to_arrow()

    agg = (ds.map_batches(bucket, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("bucket")
           .map_groups(transitions, batch_format="pyarrow")
           .groupby(["from_kind", "to_kind"])
           .aggregate(Sum("n", alias_name="n_transitions")))

    def clean(t: pa.Table) -> pa.Table:
        return pa.table({
            "from_kind": t["from_kind"], "to_kind": t["to_kind"],
            "n_transitions": pc.cast(t["n_transitions"], pa.int64()),
        })

    return agg.map_batches(clean, batch_format="pyarrow")


def conv_ttr_stats(ds, num_buckets: int = 0):
    """(conv_id, role, n_tokens, n_distinct_tokens, ttr_milli):
    lexical diversity per conversation and role — total and distinct
    lowercased TOKEN_PATTERN tokens across the group's turns, and the
    integer milli type-token ratio (1000*distinct // total; -1 when
    the group has no tokens). Low assistant-side TTR is the
    "model says the same thing every turn" degeneracy signal, the
    statistical companion to conv_loop_turns' exact repeats and
    turn_echo_jaccard's near-echoes.

    Shape: raw slim rows through ONE conv-bucket shuffle; tokenization
    (after the shuffle — the Acero list-payload rule), the explode,
    and both rollups complete LOCALLY per bucket as whole-frame
    vectorized polars passes (no compound agg expressions — the
    conv_structure_violations fast-path lesson)."""
    import polars as _pl
    import pyarrow.compute as pc
    from dataquality_ray.pipelines.quality import conv_bucket_of
    from dataquality_ray.spec import TOKEN_PATTERN

    num_buckets = num_buckets or cluster_buckets(minimum=16)

    def bucket(batch: pa.Table) -> pa.Table:
        return pa.table({
            "bucket": conv_bucket_of(batch["conv_id"], num_buckets),
            "conv_id": batch["conv_id"],
            "role": batch["role"],
            "text": batch["text"],
        })

    def scan(t: pa.Table) -> pa.Table:
        d = (_pl.from_arrow(t.select(["conv_id", "role", "text"]))
             .with_columns(toks=_pl.col("text").fill_null("")
                           .str.to_lowercase()
                           .str.extract_all(TOKEN_PATTERN)))
        totals = (d.with_columns(nt=_pl.col("toks").list.len()
                                 .cast(_pl.Int64))
                  .group_by(["conv_id", "role"])
                  .agg(n_tokens=_pl.col("nt").sum()))
        dist = (d.select(["conv_id", "role", "toks"])
                .explode("toks").drop_nulls("toks")
                .unique()
                .group_by(["conv_id", "role"])
                .agg(n_distinct_tokens=_pl.len().cast(_pl.Int64)))
        g = totals.join(dist, on=["conv_id", "role"], how="left") \
            .with_columns(_pl.col("n_distinct_tokens").fill_null(0))
        g = g.with_columns(
            ttr_milli=_pl.when(_pl.col("n_tokens") > 0)
            .then(1000 * _pl.col("n_distinct_tokens")
                  // _pl.col("n_tokens"))
            .otherwise(-1).cast(_pl.Int64))
        return g.to_arrow()

    return (ds.map_batches(bucket, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("bucket")
            .map_groups(scan, batch_format="pyarrow"))


def conv_markdown_stats(ds, num_buckets: int = 0):
    """(conv_id, n_turns, n_fence_lines, fence_balanced,
    n_heading_lines, n_bullet_lines, n_table_lines, n_links,
    n_backticks): markdown / code-structure audit per conversation —
    code-fence delimiter lines (and whether they pair up), ATX heading
    lines, bullet-list lines, table lines, inline-link spans and
    backtick mass. The formatting-health signal a training-data
    curator reads before deciding whether transcripts need markdown
    stripping (unbalanced fences = truncated code blocks).

    Shape: per-turn counters are computed vectorized in the map stage,
    then PARTIALLY AGGREGATED per (conv_id, batch) before the exchange
    — the shuffle ships one slim int row per conversation per batch
    (~30x fewer rows than per-turn), and the per-conv rollup completes
    LOCALLY per conv bucket in one plain-sum polars groupby (every
    counter is mergeable; the salted-partial pattern of conv_stats).
    Line semantics pinned cross-engine: raw split on newline, pinned
    ' \\t\\r\\n' trim, literal prefix tests, replace-length literal
    counts in the DuckDB twin."""
    import polars as _pl
    from dataquality_ray.pipelines.quality import conv_bucket_of

    num_buckets = num_buckets or cluster_buckets(minimum=16)

    def bucket(batch: pa.Table) -> pa.Table:
        d = (_pl.from_arrow(batch.select(["conv_id", "text"]))
             .with_columns(text=_pl.col("text").fill_null("")))
        ls = (_pl.col("text").str.split("\n")
              .list.eval(_pl.element().str.strip_chars(" \t\r\n")))
        d = d.with_columns(
            fence=ls.list.eval(
                _pl.element().str.starts_with("```").cast(_pl.Int64))
            .list.sum().fill_null(0),
            heading=ls.list.eval(
                _pl.element().str.contains("^#").cast(_pl.Int64))
            .list.sum().fill_null(0),
            bullet=ls.list.eval(
                _pl.element().str.contains("^[-*+] ").cast(_pl.Int64))
            .list.sum().fill_null(0),
            tbl=ls.list.eval(
                _pl.element().str.starts_with("|").cast(_pl.Int64))
            .list.sum().fill_null(0),
            links=_pl.col("text").str.count_matches("](", literal=True)
            .cast(_pl.Int64),
            ticks=_pl.col("text").str.count_matches("`", literal=True)
            .cast(_pl.Int64))
        g = (d.group_by("conv_id")
             .agg(n_turns=_pl.len().cast(_pl.Int64),
                  fence=_pl.col("fence").sum(),
                  heading=_pl.col("heading").sum(),
                  bullet=_pl.col("bullet").sum(),
                  tbl=_pl.col("tbl").sum(),
                  links=_pl.col("links").sum(),
                  ticks=_pl.col("ticks").sum()))
        t = g.to_arrow()
        return t.append_column(
            "bucket", conv_bucket_of(t["conv_id"], num_buckets))

    def scan(t: pa.Table) -> pa.Table:
        g = (_pl.from_arrow(t.drop_columns(["bucket"]))
             .group_by("conv_id")
             .agg(n_turns=_pl.col("n_turns").sum(),
                  n_fence_lines=_pl.col("fence").sum(),
                  n_heading_lines=_pl.col("heading").sum(),
                  n_bullet_lines=_pl.col("bullet").sum(),
                  n_table_lines=_pl.col("tbl").sum(),
                  n_links=_pl.col("links").sum(),
                  n_backticks=_pl.col("ticks").sum()))
        g = g.with_columns(
            fence_balanced=(_pl.col("n_fence_lines") % 2 == 0)
            .cast(_pl.Int64))
        return g.select(
            "conv_id", "n_turns", "n_fence_lines", "fence_balanced",
            "n_heading_lines", "n_bullet_lines", "n_table_lines",
            "n_links", "n_backticks").to_arrow()

    return (ds.map_batches(bucket, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("bucket")
            .map_groups(scan, batch_format="pyarrow"))


# --- preference-pair mining (RLHF / DPO data construction) --------------

# packed argmax/argmin key: hscore * 2^20 + f(turn_idx). turn_idx < 2^20
# by fixture/spec bound; hscore <= 600, so keys stay far inside int64.
_PREF_TSPAN = 1 << 20


def conv_preference_pairs(ds, cfg: PipelineConfig = DEFAULT_CONFIG,
                          num_buckets: int = 0):
    """(conv_id, n_assistant, chosen_idx, chosen_score, rejected_idx,
    rejected_score, margin): preference-pair mining — for every
    conversation with >= 2 assistant turns, pair its BEST and WORST
    assistant turn by the deterministic heuristic score
    hscore = length + repetition + symbol + boilerplate + toxicity +
    timeliness (the six SQL-expressible spec dimensions on SCRUBBED
    text, 0..600 int), ties -> lower turn_idx on both sides. Pairs with
    margin == 0 carry no signal and are dropped. This is the
    "construct chosen/rejected pairs from existing trajectories" step
    of DPO-style preference-data pipelines, with the heuristic score
    standing in for the reward model (the model-backed variant rides
    the same shape with an actor-pool scorer).

    Argmax/argmin tie-breaking is packed into single int64 keys
    (max of hscore*2^20 + (2^20-1-turn_idx); min of
    hscore*2^20 + turn_idx) so every carried aggregate is a mergeable
    max/min/sum — the salted-partial contract.

    Shape: scrub + heuristics stay per-batch stateless maps; per-batch
    per-conv partials (n, max-key, min-key) -> ONE conv-bucket shuffle
    of 4-column rows -> local fold (the conv_pii_stats template)."""
    import hashlib

    import polars as _pl

    from dataquality_ray.stages.heuristics import heuristics_batch
    from dataquality_ray.stages.scrub import scrub_batch

    num_buckets = num_buckets or cluster_buckets(minimum=32)

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # scores are row-local: filter to assistant turns FIRST so the
        # scrub/heuristic kernels only touch the ~45% of rows that can
        # appear in a pair (measured ~12 s -> ~8 s at sf0.1/32)
        batch = batch.filter(pc.equal(batch["role"], "assistant"))
        if len(batch) == 0:
            return pa.table({
                "conv_id": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "km": pa.array([], pa.int64()),
                "kn": pa.array([], pa.int64()),
                "cb": pa.array([], pa.int32()),
            })
        batch = scrub_batch(batch)
        batch = heuristics_batch(batch, cfg=cfg)
        h = np.zeros(len(batch), dtype=np.int64)
        for col in ("length_score", "repetition_score", "symbol_score",
                    "boilerplate_score", "toxicity_score",
                    "timeliness_score"):
            h += batch[col].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
        ti = batch["turn_idx"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        g = (_pl.DataFrame({
            "conv_id": _pl.from_arrow(batch["conv_id"]),
            "km": _pl.Series(h * _PREF_TSPAN + (_PREF_TSPAN - 1 - ti)),
            "kn": _pl.Series(h * _PREF_TSPAN + ti),
        }).group_by("conv_id")
            .agg(n=_pl.len().cast(_pl.Int64),
                 km=_pl.col("km").max(),
                 kn=_pl.col("kn").min()))
        cb = np.fromiter(
            (int.from_bytes(hashlib.md5(c.encode()).digest()[:4],
                            "little") % num_buckets
             for c in g["conv_id"]),
            dtype=np.int32, count=g.height)
        return g.with_columns(cb=_pl.Series(cb)).to_arrow()

    def fold(t: pa.Table) -> pa.Table:
        g = (_pl.from_arrow(t.select(["conv_id", "n", "km", "kn"]))
             .group_by("conv_id")
             .agg(n=_pl.col("n").sum(),
                  km=_pl.col("km").max(),
                  kn=_pl.col("kn").min()))
        g = g.with_columns(
            chosen_score=_pl.col("km") // _PREF_TSPAN,
            chosen_idx=(_PREF_TSPAN - 1) - (_pl.col("km") % _PREF_TSPAN),
            rejected_score=_pl.col("kn") // _PREF_TSPAN,
            rejected_idx=_pl.col("kn") % _PREF_TSPAN,
        ).filter((_pl.col("n") >= 2)
                 & (_pl.col("chosen_score") > _pl.col("rejected_score")))
        g = g.with_columns(
            margin=_pl.col("chosen_score") - _pl.col("rejected_score"),
            n_assistant=_pl.col("n"))
        return g.select(["conv_id", "n_assistant", "chosen_idx",
                         "chosen_score", "rejected_idx",
                         "rejected_score", "margin"]).to_arrow()

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("cb").map_groups(fold, batch_format="pyarrow"))


# --- instruction-diversity census (Self-Instruct datasheet) --------------

VERB_TOP_K = 50


def instruction_verb_census(ds):
    """(token, n_turns): the instruction-diversity census from the
    Self-Instruct / instruction-tuning datasheets — the top-VERB_TOP_K
    opening tokens of USER turns (first spec.TOKEN_PATTERN match on
    the lowered text, the verb-proxy), counted corpus-wide, ties ->
    token asc. A skewed opener distribution means the instruction set
    is template-bound; the census is the evidence table.

    Shape: per-batch partial counts (batch-vocab-sized) -> one
    vocab-keyed groupby of the small partials -> tiny top-K sort (the
    corpus_vocab_stats template; nothing turn-proportional shuffles).
    """
    import polars as _pl
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from dataquality_ray.spec import TOKEN_PATTERN

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch["role"], "user"))
        first = (_pl.from_arrow(batch["text"])
                 .str.to_lowercase()
                 .str.extract(f"({TOKEN_PATTERN})", 1))
        g = (_pl.DataFrame({"token": first}).drop_nulls()
             .filter(_pl.col("token") != "")
             .group_by("token").agg(n=_pl.len().cast(_pl.Int64)))
        return g.to_arrow()

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("token").aggregate(Sum("n", alias_name="n_turns")))
    top = agg.sort(["n_turns", "token"], descending=[True, False]) \
        .limit(VERB_TOP_K)
    return top.map_batches(
        lambda t: pa.table({"token": t["token"],
                            "n_turns": pc.cast(t["n_turns"],
                                               pa.int64())}),
        batch_format="pyarrow")


# --- dedup observability: daily duplication-rate timeline -----------------

_DAY_US = 86_400_000_000


def dup_rate_daily(ds, num_buckets: int = 0, ts_ds=None):
    """(day, n_turns, n_dup_turns, dup_permille): the dedup
    OBSERVABILITY timeline — per UTC day, how many arriving turns are
    verbatim repeats (content-hash equality on the spec normalization,
    first occurrence by (ts, conv_id, turn_idx) global order) of
    anything seen before, corpus-wide. A rising curve is the signal a
    crawl/ingest source started recycling content; the per-release
    datasheet plots exactly this. Empty-normalized turns count in
    n_turns but can never be duplicates (the exact-dedup skew guard —
    md5('') would otherwise be the one hot key in the shuffle).

    Shape: day totals from a ts-only pruned read (no text touched);
    dup detection ships 16-byte digests through ONE hash-bucket
    shuffle, per-bucket sort + whole-frame shift mask (the pinned
    polars fast-path shape); both reduce to a <=|days| grid merged on
    the driver."""
    import polars as _pl
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from dataquality_ray.arrowutil import md5_digests
    from dataquality_ray.spec import EDGE_WS_PATTERN, WS_PLUS_PATTERN

    num_buckets = num_buckets or cluster_buckets(minimum=32)

    def totals_partial(batch: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(batch["ts"], pa.int64()), _DAY_US)
        g = (_pl.DataFrame({"day": _pl.from_arrow(day)})
             .group_by("day").agg(n=_pl.len().cast(_pl.Int64)))
        return g.to_arrow()

    # day totals never need text: callers pass ts_ds as a ts-only
    # pruned read so this pass doesn't decode the corpus twice
    totals = ((ts_ds if ts_ds is not None else ds)
              .map_batches(totals_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby("day").aggregate(Sum("n", alias_name="n_turns"))
              .to_pandas())

    def slim(batch: pa.Table) -> pa.Table:
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
        keep = np.flatnonzero(ok)
        sub = batch.take(pa.array(keep))
        digs = [dig[i] for i in keep]
        hb = np.fromiter(
            (int.from_bytes(d[:4], "little") % num_buckets
             for d in digs),
            dtype=np.int32, count=len(digs))
        return pa.table({
            "hb": pa.array(hb),
            "h": pa.array(digs, pa.binary()),
            "ts_us": pc.cast(sub["ts"], pa.int64()),
            "conv_id": sub["conv_id"],
            "turn_idx": pc.cast(sub["turn_idx"], pa.int64()),
        })

    def bucket_scan(t: pa.Table) -> pa.Table:
        d = (_pl.from_arrow(t.select(["h", "ts_us", "conv_id",
                                      "turn_idx"]))
             .sort(["h", "ts_us", "conv_id", "turn_idx"]))
        dup = (d["h"] == d["h"].shift(1)).fill_null(False)
        g = (_pl.DataFrame({
            "day": d["ts_us"] // _DAY_US,
            "dup": _pl.Series(dup.to_numpy().astype(np.int64)),
        }).group_by("day").agg(nd=_pl.col("dup").sum()))
        return g.to_arrow()

    dups = (ds.map_batches(slim, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("hb").map_groups(bucket_scan,
                                      batch_format="pyarrow")
            .groupby("day").aggregate(Sum("nd",
                                          alias_name="n_dup_turns"))
            .to_pandas())

    # int64 dict lookup, not an outer-merge fillna (CLAUDE.md
    # float-promotion exactness rule)
    nd_by_day = dict(zip((int(d) for d in dups["day"]),
                         (int(v) for v in dups["n_dup_turns"])))
    day = totals["day"].to_numpy(dtype=np.int64)
    nt = totals["n_turns"].to_numpy(dtype=np.int64)
    nd = np.array([nd_by_day.get(int(d), 0) for d in day],
                  dtype=np.int64)
    order = np.argsort(day, kind="stable")
    return pa.table({
        "day": pa.array(day[order]),
        "n_turns": pa.array(nt[order]),
        "n_dup_turns": pa.array(nd[order]),
        "dup_permille": pa.array(1000 * nd[order] // nt[order]),
    })


# --- multilingual hygiene: code-switching audit ----------------------------

def conv_lang_switches(ds, num_buckets: int = 0):
    """(conv_id, n_turns, n_switches, n_langs): code-switching audit —
    per conversation, how often the per-turn predicted language (the
    pinned spec.STOPWORD_MARKERS langid rule, shared with
    langid_documents / conv_lang_majority) CHANGES between adjacent
    turns (turn_idx order), and how many distinct languages appear. A
    conversation that flips languages mid-dialog is either genuine
    code-switching or (far more often, at corpus scale) a concatenation
    artifact — this is the routing gate's evidence table.

    Shape: language prediction is the vectorized stateless map; ONE
    conv-bucket shuffle of slim (conv_id, turn_idx, pred_lang) rows;
    the adjacent compare is a whole-frame shift + same-conv mask after
    one sort (the pinned polars fast-path shape), flags materialized
    as Int64 columns before a plain-sum agg."""
    import polars as _pl

    from dataquality_ray.pipelines.quality import conv_bucket_of

    num_buckets = num_buckets or cluster_buckets(minimum=32)

    def partial(batch: pa.Table) -> pa.Table:
        from dataquality_ray.pipelines.documents import _pred_lang_of
        pred = _pred_lang_of(batch["text"])
        t = pa.table({
            "conv_id": batch["conv_id"],
            "turn_idx": pa.array(
                batch["turn_idx"].to_numpy(zero_copy_only=False)
                .astype(np.int64)),
            "pred_lang": pa.array(pred, pa.string()),
        })
        return t.append_column(
            "cb", pa.array(conv_bucket_of(t["conv_id"], num_buckets)))

    def scan(t: pa.Table) -> pa.Table:
        d = (_pl.from_arrow(t.select(["conv_id", "turn_idx",
                                      "pred_lang"]))
             .sort(["conv_id", "turn_idx"]))
        same = (d["conv_id"] == d["conv_id"].shift(1)).fill_null(False)
        diff = (d["pred_lang"] != d["pred_lang"].shift(1)) \
            .fill_null(False)
        flags = (same & diff).to_numpy().astype(np.int64)
        g = (d.with_columns(sw=_pl.Series(flags))
             .group_by("conv_id")
             .agg(n_turns=_pl.len().cast(_pl.Int64),
                  n_switches=_pl.col("sw").sum(),
                  n_langs=_pl.col("pred_lang").n_unique()
                  .cast(_pl.Int64)))
        return g.to_arrow()

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("cb").map_groups(scan, batch_format="pyarrow"))


# --- dedup-rate estimation from deterministic hash-range samples ------------

# Nested content-hash samples: a turn is in sample k iff
# (md5_u64(norm_text) % DUP_SAMPLE_MOD) < k.  Sampling ON the content
# hash keeps every copy of a given content together (in or out as a
# group), so the sampled duplicate fraction is an unbiased estimate of
# the corpus rate — the property a row-random sample does NOT have
# (it thins groups and underestimates duplication).  KEEPS are nested
# (k' > k ⊇ sample k), and the last keep equals the modulus, so the
# final row IS the exact full-corpus answer — the output table shows
# the estimate converging to truth as the sample rate grows.
DUP_SAMPLE_MOD = 256
DUP_SAMPLE_KEEPS = (1, 4, 16, 64, 256)
# the slim pass reads the sample key as the FIRST digest byte, which
# equals md5_u64 % MOD only while MOD == 256 — changing the modulus
# requires changing that read (and the oracle interpolates MOD)
assert DUP_SAMPLE_MOD == 256
assert DUP_SAMPLE_KEEPS[-1] == DUP_SAMPLE_MOD


def sampled_dup_rate(ds, num_buckets: int = 0):
    """(sample_keep, n_turns, n_distinct, dup_permille): estimate the
    corpus exact-duplication rate from nested deterministic
    content-hash-range samples — the at-scale "measure before you pay
    for the full dedup shuffle" step.  At 100 TB you run the 1/256
    sample (k=1) to decide whether a dedup pass is worth scheduling;
    this operator also emits the larger samples up to the exact
    full-corpus row (k = DUP_SAMPLE_MOD) so the convergence is visible
    and hash-checkable.

    Scale shape: one slim pass batch-pre-aggregates (digest, n) counts
    — within-batch copies collapse before anything ships — then ONE
    digest-bucket shuffle; each bucket finishes its per-digest totals
    locally (every digest lives in exactly one bucket) and reduces to
    |KEEPS| rows; the final aggregate is |KEEPS| x |buckets| slim rows.
    Empty-normalized turns are excluded up front (the exact-dedup skew
    guard: md5('') would be the one hot key).  Normalization and
    hashing are the frozen dup_rate_daily conventions (spec EDGE_WS /
    WS_PLUS + buffer-slice md5; sample key = md5_u64 % MOD ==
    DuckDB md5_number_upper % MOD)."""
    import polars as _pl
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from dataquality_ray.arrowutil import md5_digests
    from dataquality_ray.spec import EDGE_WS_PATTERN, WS_PLUS_PATTERN

    num_buckets = num_buckets or cluster_buckets(minimum=32)

    def slim(batch: pa.Table) -> pa.Table:
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
        keep = np.flatnonzero(ok)
        digs = [dig[i] for i in keep]
        # within-batch pre-aggregation: copies collapse to one
        # (digest, n) row before the shuffle
        g = (_pl.DataFrame({"h": _pl.Series(digs,
                                            dtype=_pl.Binary)})
             .group_by("h").agg(n=_pl.len().cast(_pl.Int64)))
        hs = g["h"].to_list()
        hb = np.fromiter(
            (int.from_bytes(d[:4], "little") % num_buckets
             for d in hs),
            dtype=np.int32, count=len(hs))
        # sample key: md5_u64 % 256 == first digest byte (little-endian)
        sk = np.fromiter((d[0] for d in hs), dtype=np.int64,
                         count=len(hs))
        return pa.table({
            "hb": pa.array(hb),
            "h": pa.array(hs, pa.binary()),
            "sk": pa.array(sk),
            "n": g["n"].to_arrow(),
        })

    def bucket_scan(t: pa.Table) -> pa.Table:
        d = (_pl.from_arrow(t.select(["h", "sk", "n"]))
             .group_by("h")
             .agg(sk=_pl.col("sk").first(), n=_pl.col("n").sum()))
        sk = d["sk"].to_numpy()
        n = d["n"].to_numpy()
        rows = []
        for k in DUP_SAMPLE_KEEPS:
            m = sk < k
            rows.append((int(k), int(n[m].sum()), int(m.sum())))
        return pa.table({
            "sample_keep": pa.array([r[0] for r in rows], pa.int64()),
            "nt": pa.array([r[1] for r in rows], pa.int64()),
            "nd": pa.array([r[2] for r in rows], pa.int64()),
        })

    agg = (ds.map_batches(slim, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("hb").map_groups(bucket_scan,
                                     batch_format="pyarrow")
           .groupby("sample_keep")
           .aggregate(Sum("nt", alias_name="n_turns"),
                      Sum("nd", alias_name="n_distinct"))
           .to_pandas())

    # a zero-row Ray result loses its schema through to_pandas()
    # (the empty-result rule) — the spine below rebuilds the grid
    by = {} if len(agg) == 0 else {
        int(k): (int(t), int(d)) for k, t, d in zip(
            agg["sample_keep"], agg["n_turns"], agg["n_distinct"])}
    # spine: every configured keep emits a row even if its sample is
    # empty on a tiny corpus (the empty-result rule)
    keep = np.array(DUP_SAMPLE_KEEPS, dtype=np.int64)
    nt = np.array([by.get(int(k), (0, 0))[0] for k in keep],
                  dtype=np.int64)
    nd = np.array([by.get(int(k), (0, 0))[1] for k in keep],
                  dtype=np.int64)
    return pa.table({
        "sample_keep": pa.array(keep),
        "n_turns": pa.array(nt),
        "n_distinct": pa.array(nd),
        "dup_permille": pa.array(
            1000 * (nt - nd) // np.maximum(nt, 1)),
    })


# --- assistant refusal / canned-deflection census ---------------------------

# Lowercased substring patterns (quote-free ASCII so the identical
# literal runs in polars contains(literal) and DuckDB contains()).
# The first group are genuine refusal markers (absent from the
# synthetic fixture — unit tests plant them); the last two are canned
# deflection boilerplate the fixture DOES emit, so the per-day census
# carries real signal on the sf tables.
REFUSAL_PATTERNS = (
    "i cannot",
    "i am unable",
    "as an ai",
    "i will not",
    "this is an automated response",
    "please do not reply",
)


def assistant_refusal_census(ds):
    """(day, n_assistant_turns, n_refusal_turns, refusal_permille):
    per-UTC-day refusal / canned-deflection rate over ASSISTANT turns —
    the SFT-corpus health metric that catches a source (or a scrape
    window) dominated by non-answers before it trains a model to
    refuse.  A turn counts once if ANY pattern matches its lowercased
    text.

    Scale shape: zero shuffle — the role filter and pattern scan are
    batch-local (compiled-free: plain substring contains), reduced to
    per-batch (day, counts) partials into a <=|days| groupby.  The
    day spine comes from assistant turn counts, so rows exist (with
    zero refusals) on corpora with no matches — the empty-result
    rule."""
    import polars as _pl
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        d = (_pl.from_arrow(pa.table({
            "role": batch["role"],
            "text": batch["text"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
        })).filter(_pl.col("role") == "assistant")
            .with_columns(lt=_pl.col("text").fill_null("")
                          .str.to_lowercase()))
        hit = _pl.lit(False)
        for p in REFUSAL_PATTERNS:
            hit = hit | _pl.col("lt").str.contains(p, literal=True)
        g = (d.with_columns(day=_pl.col("ts_us") // _DAY_US,
                            r=hit.cast(_pl.Int64))
             .group_by("day")
             .agg(na=_pl.len().cast(_pl.Int64),
                  nr=_pl.col("r").sum()))
        return g.to_arrow().cast(pa.schema([
            ("day", pa.int64()), ("na", pa.int64()),
            ("nr", pa.int64())]))

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("day")
           .aggregate(Sum("na", alias_name="n_assistant_turns"),
                      Sum("nr", alias_name="n_refusal_turns"))
           .to_pandas())

    day = agg["day"].to_numpy(dtype=np.int64)
    na = agg["n_assistant_turns"].to_numpy(dtype=np.int64)
    nr = agg["n_refusal_turns"].to_numpy(dtype=np.int64)
    order = np.argsort(day, kind="stable")
    return pa.table({
        "day": pa.array(day[order]),
        "n_assistant_turns": pa.array(na[order]),
        "n_refusal_turns": pa.array(nr[order]),
        "refusal_permille": pa.array(
            1000 * nr[order] // np.maximum(na[order], 1)),
    })


# --- corpus freshness: per-day novel-bigram ratio ----------------------------

def ngram_novelty_daily(ds, num_buckets: int = 0):
    """(day, n_distinct, n_new, novelty_permille): per-UTC-day corpus
    novelty — of the distinct bigram hashes seen on a day, how many
    had never appeared on ANY earlier day. A crawl whose novelty decays
    to the floor is re-scraping itself; a day that spikes marks a new
    source coming online. Day 1 is 1000 by construction. Distinctness
    and first-seen are decided on the frozen md5-u64 bigram hash
    (md5_number_upper twin) so collisions merge identically.

    Scale shape: per-batch tokenize + row-local shift pairing (the
    pinned fast-path shape), batch-distinct (day, hash) BEFORE any
    exchange; ONE hash-bucket shuffle of slim (day, u64) rows — every
    hash lives in exactly one bucket, so first-day and per-day distinct
    counts complete locally; the day spine rides the same discriminated
    union (kind=1 distinct days from ALL turns), so zero-bigram days
    still emit rows (the empty-result rule). Final aggregate is
    |days| x |buckets| slim rows."""
    import polars as _pl
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from dataquality_ray.arrowutil import md5_digests
    from dataquality_ray.spec import TOKEN_PATTERN

    nb = num_buckets or cluster_buckets(minimum=32)

    def partial(batch: pa.Table) -> pa.Table:
        ts_us = pc.cast(batch["ts"], pa.int64())
        day = pc.divide(ts_us, _DAY_US)
        df = (_pl.from_arrow(pa.table({
            "day": day, "text": batch["text"]}))
            .with_columns(toks=_pl.col("text").fill_null("")
                          .str.to_lowercase()
                          .str.extract_all(TOKEN_PATTERN)))
        e = (df.select(["day", "toks"]).with_row_index("rid")
             .explode("toks").drop_nulls("toks"))
        e = (e.with_columns(b=_pl.col("toks").shift(-1),
                            r2=_pl.col("rid").shift(-1))
             .filter(_pl.col("rid") == _pl.col("r2"))
             .with_columns(bg=_pl.col("toks") + " " + _pl.col("b")))
        d = e.select(["day", "bg"]).unique()
        digs = md5_digests(d["bg"].to_arrow())
        if digs:
            hh = np.frombuffer(b"".join(digs),
                               dtype="<u8").reshape(-1, 2)[:, 0]
        else:
            hh = np.zeros(0, dtype=np.uint64)
        k0 = pa.table({
            "part": pa.array((hh % nb).astype(np.int32)),
            "day": d["day"].to_arrow().cast(pa.int64()),
            "hh": pa.array(hh.view(np.int64)),
            "kind": pa.array(np.zeros(len(d), dtype=np.int8)),
        })
        days = df["day"].unique()
        k1 = pa.table({
            "part": pa.array(np.zeros(len(days), dtype=np.int32)),
            "day": days.to_arrow().cast(pa.int64()),
            "hh": pa.array(np.zeros(len(days), dtype=np.int64)),
            "kind": pa.array(np.ones(len(days), dtype=np.int8)),
        })
        return pa.concat_tables([k0, k1])

    def scan(t: pa.Table) -> pa.Table:
        d = _pl.from_arrow(t.select(["day", "hh", "kind"]))
        h = (d.filter(_pl.col("kind") == 0)
             .unique(subset=["day", "hh"]))
        m0 = h.group_by("hh").agg(d0=_pl.col("day").min())
        a = (h.join(m0, on="hh")
             .group_by("day")
             .agg(nd=_pl.len().cast(_pl.Int64),
                  nn=(_pl.col("day") == _pl.col("d0"))
                  .cast(_pl.Int64).sum()))
        spine = (d.filter(_pl.col("kind") == 1)
                 .select("day").unique()
                 .with_columns(nd=_pl.lit(0, dtype=_pl.Int64),
                               nn=_pl.lit(0, dtype=_pl.Int64)))
        return _pl.concat([a, spine]).to_arrow().cast(pa.schema([
            ("day", pa.int64()), ("nd", pa.int64()),
            ("nn", pa.int64())]))

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("part").map_groups(scan, batch_format="pyarrow")
           .groupby("day")
           .aggregate(Sum("nd", alias_name="n_distinct"),
                      Sum("nn", alias_name="n_new"))
           .to_pandas())

    day = agg["day"].to_numpy(dtype=np.int64)
    nd = agg["n_distinct"].to_numpy(dtype=np.int64)
    nn = agg["n_new"].to_numpy(dtype=np.int64)
    order = np.argsort(day, kind="stable")
    return pa.table({
        "day": pa.array(day[order]),
        "n_distinct": pa.array(nd[order]),
        "n_new": pa.array(nn[order]),
        "novelty_permille": pa.array(
            1000 * nn[order] // np.maximum(nd[order], 1)),
    })


# --- privacy: assistant echoes of user-supplied PII --------------------------

def pii_echo_turns(ds, num_buckets: int = 0):
    """(conv_id, n_user_pii_values, n_echo_values, n_echo_turns): per
    conversation, the PII VALUES (exact matched substrings of the
    frozen spec.PII_RULES, extracted with the scrub stage's sequential
    semantics) that a USER turn introduced and an ASSISTANT turn later
    repeated verbatim — the privacy audit that catches a model parroting
    emails/SSNs/phones back into the transcript, which per-turn match
    COUNTS (conv_pii_stats) cannot see. "Later" = assistant turn_idx
    strictly greater than the value's first user turn_idx. Every
    conversation emits a row (zero-filled spine — the empty-result
    rule).

    Shape: extraction is batch-local (three sequential RE2 passes, the
    conv_pii_stats recipe); the exchange ships only slim PII-match rows
    (conv_id, turn_idx, role-flag, value) plus a distinct-conv spine on
    the same discriminated union; ONE conv-bucket shuffle, then the
    first-seen/echo joins complete locally (every conversation lives in
    exactly one bucket). PII rows are rare, so the exchange is tiny
    relative to the corpus."""
    import hashlib

    import polars as _pl
    import pyarrow.compute as pc

    from dataquality_ray.spec import PII_RULES

    num_buckets = num_buckets or cluster_buckets(minimum=32)

    def partial(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch["text"], "")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        role = batch["role"]
        conv = batch["conv_id"]
        ti = pc.cast(batch["turn_idx"], pa.int64())
        frames = []
        # sequential extraction: each rule matches on the text with the
        # PREVIOUS rules' matches already replaced (scrub semantics)
        cur = text
        for name, pattern, replacement in PII_RULES:
            d = (_pl.DataFrame({
                "conv_id": _pl.from_arrow(conv),
                "ti": _pl.from_arrow(ti),
                "role": _pl.from_arrow(role),
                "t": _pl.from_arrow(cur),
            }).with_columns(v=_pl.col("t").str.extract_all(pattern))
                .drop("t").explode("v").drop_nulls("v"))
            frames.append(d)
            cur = pc.replace_substring_regex(cur, pattern, replacement)
        m = (_pl.concat(frames)
             .filter(_pl.col("role").is_in(["user", "assistant"])))
        k0 = pa.table({
            "conv_id": m["conv_id"].to_arrow().cast(pa.string()),
            "ti": m["ti"].to_arrow(),
            "is_user": m["role"].to_arrow().cast(pa.string()),
            "v": m["v"].to_arrow().cast(pa.string()),
            "kind": pa.array(np.zeros(m.height, dtype=np.int8)),
        })
        convs = _pl.from_arrow(conv).unique()
        k1 = pa.table({
            "conv_id": convs.to_arrow().cast(pa.string()),
            "ti": pa.array(np.zeros(len(convs), dtype=np.int64)),
            "is_user": pa.array([""] * len(convs), pa.string()),
            "v": pa.array([""] * len(convs), pa.string()),
            "kind": pa.array(np.ones(len(convs), dtype=np.int8)),
        })
        t = pa.concat_tables([k0, k1])
        cb = np.fromiter(
            (int.from_bytes(hashlib.md5(c.encode()).digest()[:4],
                            "little") % num_buckets
             for c in t["conv_id"].to_pylist()),
            dtype=np.int32, count=len(t))
        return t.append_column("cb", pa.array(cb))

    def scan(t: pa.Table) -> pa.Table:
        d = _pl.from_arrow(t.select(
            ["conv_id", "ti", "is_user", "v", "kind"]))
        m = d.filter(_pl.col("kind") == 0)
        u = (m.filter(_pl.col("is_user") == "user")
             .group_by(["conv_id", "v"])
             .agg(fu=_pl.col("ti").min()))
        a = (m.filter(_pl.col("is_user") == "assistant")
             .select(["conv_id", "ti", "v"]).unique())
        e = (a.join(u, on=["conv_id", "v"])
             .filter(_pl.col("ti") > _pl.col("fu")))
        g = (e.group_by("conv_id")
             .agg(nev=_pl.col("v").n_unique().cast(_pl.Int64),
                  net=_pl.col("ti").n_unique().cast(_pl.Int64)))
        uv = (u.group_by("conv_id")
              .agg(nuv=_pl.len().cast(_pl.Int64)))
        spine = (d.filter(_pl.col("kind") == 1)
                 .select("conv_id").unique())
        out = (spine.join(uv, on="conv_id", how="left")
               .join(g, on="conv_id", how="left")
               .with_columns(_pl.col("nuv").fill_null(0),
                             _pl.col("nev").fill_null(0),
                             _pl.col("net").fill_null(0)))
        return out.rename({
            "nuv": "n_user_pii_values",
            "nev": "n_echo_values",
            "net": "n_echo_turns",
        }).to_arrow().cast(pa.schema([
            ("conv_id", pa.string()),
            ("n_user_pii_values", pa.int64()),
            ("n_echo_values", pa.int64()),
            ("n_echo_turns", pa.int64())]))

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("cb").map_groups(scan, batch_format="pyarrow"))


# --- SFT health: quality trend across the dialog -----------------------------

def conv_quality_trend(ds, cfg: PipelineConfig = DEFAULT_CONFIG,
                       num_buckets: int = 0):
    """(conv_id, n_assistant, first_sum, last_sum, trend): does
    assistant quality IMPROVE or DECAY over the dialog? Per
    conversation with >= 2 assistant turns, the hscore sums (the six
    SQL-expressible spec dimensions on scrubbed text, 0..600/turn —
    the conv_preference_pairs scorer) over the first k and last k
    assistant turns by turn_idx, k = n // 2 (the middle turn of an odd
    dialog belongs to neither half), trend = sign(last_sum -
    first_sum). Decaying conversations are truncation candidates
    (keep the good prefix); the corpus-level trend mix is an SFT
    datasheet stat. Integer-exact end to end.

    Shape: scrub + heuristics stay batch-local over assistant turns
    only; the exchange ships slim (conv_id, turn_idx, h) rows; ONE
    conv-bucket shuffle; the half-split is a sorted whole-frame numpy
    reduceat scan per bucket (the pinned fast-path shape, no keyed
    windows)."""
    import hashlib

    import polars as _pl

    from dataquality_ray.stages.heuristics import heuristics_batch
    from dataquality_ray.stages.scrub import scrub_batch

    num_buckets = num_buckets or cluster_buckets(minimum=32)

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.equal(batch["role"], "assistant"))
        if len(batch) == 0:
            return pa.table({
                "cb": pa.array([], pa.int32()),
                "conv_id": pa.array([], pa.string()),
                "ti": pa.array([], pa.int64()),
                "h": pa.array([], pa.int64()),
            })
        batch = scrub_batch(batch)
        batch = heuristics_batch(batch, cfg=cfg)
        h = np.zeros(len(batch), dtype=np.int64)
        for col in ("length_score", "repetition_score", "symbol_score",
                    "boilerplate_score", "toxicity_score",
                    "timeliness_score"):
            h += batch[col].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
        conv = batch["conv_id"].to_pylist()
        cb = np.fromiter(
            (int.from_bytes(hashlib.md5(c.encode()).digest()[:4],
                            "little") % num_buckets
             for c in conv),
            dtype=np.int32, count=len(conv))
        return pa.table({
            "cb": pa.array(cb),
            "conv_id": pa.array(conv, pa.string()),
            "ti": pc.cast(batch["turn_idx"], pa.int64()),
            "h": pa.array(h),
        })

    def scan(t: pa.Table) -> pa.Table:
        d = (_pl.from_arrow(t.select(["conv_id", "ti", "h"]))
             .sort(["conv_id", "ti"]))
        conv = d["conv_id"].to_numpy()
        h = d["h"].to_numpy().astype(np.int64)
        n = len(conv)
        if n == 0:
            return pa.table({
                "conv_id": pa.array([], pa.string()),
                "n_assistant": pa.array([], pa.int64()),
                "first_sum": pa.array([], pa.int64()),
                "last_sum": pa.array([], pa.int64()),
                "trend": pa.array([], pa.int64()),
            })
        new = np.ones(n, dtype=bool)
        new[1:] = conv[1:] != conv[:-1]
        starts = np.flatnonzero(new)
        seg_n = np.diff(np.append(starts, n))
        rank = np.arange(n, dtype=np.int64) - np.repeat(starts, seg_n)
        k = np.repeat(seg_n // 2, seg_n)
        nn = np.repeat(seg_n, seg_n)
        first_sum = np.add.reduceat(
            np.where(rank < k, h, 0), starts)
        last_sum = np.add.reduceat(
            np.where(rank >= nn - k, h, 0), starts)
        keep = seg_n >= 2
        fs, ls = first_sum[keep], last_sum[keep]
        return pa.table({
            "conv_id": pa.array(conv[starts[keep]].tolist(),
                                pa.string()),
            "n_assistant": pa.array(seg_n[keep].astype(np.int64)),
            "first_sum": pa.array(fs),
            "last_sum": pa.array(ls),
            "trend": pa.array(np.sign(ls - fs).astype(np.int64)),
        })

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("cb").map_groups(scan, batch_format="pyarrow"))


# --- grounding: assistant numbers with no prior support ----------------------

# digit-run tokens shorter than this are ignored (single digits are
# list markers / ordinals — noise, not claims)
GROUND_MIN_DIGITS = 2
NUMBER_PATTERN = "[0-9]+"   # quote-free; identical in re/Rust/RE2


def unsupported_number_turns(ds, num_buckets: int = 0):
    """(conv_id, n_assistant_numbers, n_unsupported, n_grounded_turns,
    n_ungrounded_turns): grounding audit over agent trajectories — for
    every ASSISTANT turn, its distinct digit-run tokens (>=
    GROUND_MIN_DIGITS digits) are checked against ALL earlier turns of
    the conversation (any role: user constraints, tool outputs, its own
    earlier statements). A number whose FIRST appearance is the
    assistant turn itself is UNSUPPORTED — the hallucinated-figure
    shape in tool-use traces. n_assistant_numbers counts distinct
    (turn, value) occurrences; a turn with >= 1 unsupported number is
    ungrounded. Every conversation emits a row (zero spine).

    Shape: the pii_echo_turns topology — batch-local extraction, slim
    (conv, turn, role, value) match rows + conv spine on one
    discriminated union, ONE conv-bucket shuffle, first-appearance
    joins local per bucket."""
    import hashlib

    import polars as _pl

    num_buckets = num_buckets or cluster_buckets(minimum=32)

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        d = (_pl.from_arrow(pa.table({
            "conv_id": batch["conv_id"],
            "ti": pc.cast(batch["turn_idx"], pa.int64()),
            "role": batch["role"],
            "t": pc.fill_null(batch["text"], ""),
        })).with_columns(v=_pl.col("t").str.extract_all(NUMBER_PATTERN))
            .drop("t").explode("v").drop_nulls("v")
            .filter(_pl.col("v").str.len_chars() >= GROUND_MIN_DIGITS)
            .unique())
        k0 = pa.table({
            "conv_id": d["conv_id"].to_arrow().cast(pa.string()),
            "ti": d["ti"].to_arrow(),
            "role": d["role"].to_arrow().cast(pa.string()),
            "v": d["v"].to_arrow().cast(pa.string()),
            "kind": pa.array(np.zeros(d.height, dtype=np.int8)),
        })
        convs = _pl.from_arrow(batch["conv_id"]).unique()
        k1 = pa.table({
            "conv_id": convs.to_arrow().cast(pa.string()),
            "ti": pa.array(np.zeros(len(convs), dtype=np.int64)),
            "role": pa.array([""] * len(convs), pa.string()),
            "v": pa.array([""] * len(convs), pa.string()),
            "kind": pa.array(np.ones(len(convs), dtype=np.int8)),
        })
        t = pa.concat_tables([k0, k1])
        cb = np.fromiter(
            (int.from_bytes(hashlib.md5(c.encode()).digest()[:4],
                            "little") % num_buckets
             for c in t["conv_id"].to_pylist()),
            dtype=np.int32, count=len(t))
        return t.append_column("cb", pa.array(cb))

    def scan(t: pa.Table) -> pa.Table:
        d = _pl.from_arrow(t.select(
            ["conv_id", "ti", "role", "v", "kind"]))
        m = d.filter(_pl.col("kind") == 0)
        first = (m.group_by(["conv_id", "v"])
                 .agg(fm=_pl.col("ti").min()))
        a = (m.filter(_pl.col("role") == "assistant")
             .select(["conv_id", "ti", "v"]).unique()
             .join(first, on=["conv_id", "v"])
             .with_columns(
                 uns=(_pl.col("ti") == _pl.col("fm"))
                 .cast(_pl.Int64)))
        g = (a.group_by("conv_id")
             .agg(nn=_pl.len().cast(_pl.Int64),
                  nu=_pl.col("uns").sum()))
        turns = (a.group_by(["conv_id", "ti"])
                 .agg(bad=_pl.col("uns").max())
                 .group_by("conv_id")
                 .agg(ngt=(1 - _pl.col("bad")).sum().cast(_pl.Int64),
                      nut=_pl.col("bad").sum().cast(_pl.Int64)))
        spine = (d.filter(_pl.col("kind") == 1)
                 .select("conv_id").unique())
        out = (spine.join(g, on="conv_id", how="left")
               .join(turns, on="conv_id", how="left")
               .with_columns(_pl.col("nn").fill_null(0),
                             _pl.col("nu").fill_null(0),
                             _pl.col("ngt").fill_null(0),
                             _pl.col("nut").fill_null(0)))
        return out.rename({
            "nn": "n_assistant_numbers", "nu": "n_unsupported",
            "ngt": "n_grounded_turns", "nut": "n_ungrounded_turns",
        }).to_arrow().cast(pa.schema([
            ("conv_id", pa.string()),
            ("n_assistant_numbers", pa.int64()),
            ("n_unsupported", pa.int64()),
            ("n_grounded_turns", pa.int64()),
            ("n_ungrounded_turns", pa.int64())]))

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("cb").map_groups(scan, batch_format="pyarrow"))


# --- corpus drift: daily embedding-centroid trajectory -----------------------

def semantic_drift_daily(ds):
    """(day, n_turns, cos_prev): the corpus's semantic trajectory — the
    round-6 cosine between each UTC day's exact-int embedding-centroid
    and the PREVIOUS present day's. A distribution-shift monitor for
    streaming ingestion: topical drift, a new source coming online, or
    a scraper failure all bend the trajectory; day 1 pins cos_prev =
    1.0. Centroids are normalized from the per-day EXACT int64
    accumulator sums (the source_embedding_outliers recipe: Python-int
    norm-squared, one sqrt+divide, round-6), so both engines compare
    identical round-6 unit vectors; the cosine follows the proven
    doc_embedding_ann convention (zero-vector day -> 0).

    Shape: an actor-pool partial reduces each batch to (days x DIM)
    exact int64 sums + per-day turn counts before a constant-size
    groupby; the LAG chain is |days| x DIM driver math. Nothing
    corpus-sized shuffles."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from dataquality_ray.spec import TOKEN_PATTERN as _EMB_TOKEN_PATTERN
    from dataquality_ray.stages.embeddings import (
        EMBED_DIM,
        HashedProjectionEmbedder,
    )

    class DayPartials(HashedProjectionEmbedder):
        # day-level accumulation is LINEAR in the per-turn accumulators
        # (sum over turns of tf*w == (sum tf)*w), so the per-ROW
        # accumulator rows are skipped entirely: tokenize, collapse to
        # per-(day, token) counts, bucket the batch-unique tokens once
        # through the actor cache, and project the per-(day, token)
        # rows straight into the (days x DIM) int64 sums — exact same
        # integers as routing through _acc_rows (A/B: oracle + pinned
        # unit tests unchanged; 41 s -> see PERF_NOTES).
        def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
            import polars as _pl
            texts = batch[self.text_col]
            if isinstance(texts, pa.ChunkedArray):
                texts = texts.combine_chunks()
            day = pc.divide(pc.cast(batch["ts"], pa.int64()),
                            _DAY_US).to_numpy(zero_copy_only=False)
            lowered = [(t or "")[: self.max_chars].lower()
                       for t in texts.to_pylist()]
            g = (_pl.DataFrame({
                "day": day,
                "tok": _pl.Series(lowered)
                .str.extract_all(_EMB_TOKEN_PATTERN),
            }).explode("tok").drop_nulls("tok")
                .group_by(["day", "tok"])
                .agg(tf=_pl.len().cast(_pl.Int64)))
            uniq, inv = np.unique(g["day"].to_numpy(),
                                  return_inverse=True) \
                if g.height else (np.unique(day)[:0], np.zeros(0, int))
            sums = np.zeros((len(uniq), EMBED_DIM), dtype=np.int64)
            if g.height:
                # per-(day, tok) rows are ~batch-unique tokens, so a
                # dictionary-encode pass saves nothing (A/B: 25 -> 30 s
                # window-adjusted neutral-to-worse); plain cache walk
                cache, miss = self._cache, self._bucket
                toks = g["tok"].to_list()
                buckets = np.fromiter(
                    (cache.get(t) if t in cache else miss(t)
                     for t in toks),
                    dtype=np.int64, count=len(toks))
                tf = g["tf"].to_numpy().astype(np.int64)
                contrib = tf[:, None] * self.proj[buckets]
                np.add.at(sums, inv, contrib)
            # the day spine (incl. token-less days) and turn counts
            # come from the raw day column, not the token rows
            duniq, dinv = np.unique(day, return_inverse=True)
            n = np.bincount(dinv).astype(np.int64)
            full = np.zeros((len(duniq), EMBED_DIM), dtype=np.int64)
            if len(uniq):
                full[np.searchsorted(duniq, uniq)] = sums
            return pa.table({
                "day": pa.array(np.repeat(duniq, EMBED_DIM)),
                "dim": pa.array(np.tile(
                    np.arange(EMBED_DIM, dtype=np.int64), len(duniq))),
                "sa": pa.array(full.ravel()),
                "n": pa.array(np.repeat(n, EMBED_DIM)),
            })

    agg = (ds.map_batches(
        DayPartials, fn_constructor_kwargs={},
        concurrency=(1, DEFAULT_CONFIG.actor_pool_size),
        batch_size=DEFAULT_CONFIG.batch_size,
        batch_format="pyarrow")
        .groupby(["day", "dim"])
        .aggregate(Sum("sa", alias_name="sum_acc"),
                   Sum("n", alias_name="n_rows"))
        .to_pandas())

    days = np.sort(agg["day"].unique())
    units, counts = {}, {}
    for dkey, grp in agg.groupby("day"):
        g = grp.sort_values("dim")
        sa = g["sum_acc"].to_numpy(dtype=np.int64)
        nsq = sum(int(x) * int(x) for x in sa)
        units[int(dkey)] = (
            np.round(sa / np.sqrt(float(nsq)), 6) if nsq > 0
            else np.zeros(len(sa), dtype=np.float64))
        counts[int(dkey)] = int(g["n_rows"].iloc[0])
    cos = []
    for i, dkey in enumerate(days):
        if i == 0:
            cos.append(1.0)
            continue
        a, b = units[int(days[i - 1])], units[int(dkey)]
        na, nb2 = np.linalg.norm(a), np.linalg.norm(b)
        if na == 0 or nb2 == 0:
            cos.append(0.0)
        else:
            cos.append(float(np.round(
                np.dot(a / na, b / nb2), 6)))
    return pa.table({
        "day": pa.array(days.astype(np.int64)),
        "n_turns": pa.array(
            np.array([counts[int(d)] for d in days], dtype=np.int64)),
        "cos_prev": pa.array(cos, pa.float64()),
    })


# --- dedup observability: the most-duplicated contents -----------------------

TOP_DUP_K = 20


def top_duplicated_turns(ds, num_buckets: int = 0):
    """(hash_hex, n_copies, conv_id, turn_idx, sample_text): the
    TOP_DUP_K most-duplicated turn CONTENTS corpus-wide — dedup
    observability that answers "what IS the boilerplate" (rates and
    histograms say how much; this says which strings). Content
    identity is the frozen normalize+md5 convention (dup_rate_daily /
    sampled_dup_rate family); ties break (n_copies DESC, hash_hex
    ASC); the sample is the copy at the MIN (conv_id, turn_idx) with
    its RAW text. Empty-normalized turns are excluded (the skew
    guard). Exact top-K: per-batch (digest, n) partials -> digest
    buckets complete totals locally and keep their top K -> one
    K x |buckets| driver reduce; a second pruned scan retrieves the
    sample rows for only the K winning digests (broadcast set).

    At 100 TB the exchange is the same slim digest stream the
    dup-rate surfaces already pay, plus K rows of text."""
    import polars as _pl
    import pyarrow.compute as pc

    import ray

    from dataquality_ray.arrowutil import md5_digests
    from dataquality_ray.spec import EDGE_WS_PATTERN, WS_PLUS_PATTERN

    num_buckets = num_buckets or cluster_buckets(minimum=32)

    def _norm(text):
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        return pc.replace_substring_regex(
            pc.replace_substring_regex(
                pc.utf8_lower(pc.fill_null(text, "")),
                EDGE_WS_PATTERN, ""),
            WS_PLUS_PATTERN, " ")

    def slim(batch: pa.Table) -> pa.Table:
        norm = _norm(batch["text"])
        ok = pc.greater(pc.utf8_length(norm), 0).to_numpy(
            zero_copy_only=False)
        dig = md5_digests(norm)
        keep = np.flatnonzero(ok)
        digs = [dig[i] for i in keep]
        g = (_pl.DataFrame({"h": _pl.Series(digs, dtype=_pl.Binary)})
             .group_by("h").agg(n=_pl.len().cast(_pl.Int64)))
        hb = np.fromiter(
            (int.from_bytes(d[:4], "little") % num_buckets
             for d in g["h"]),
            dtype=np.int32, count=g.height)
        return pa.table({
            "hb": pa.array(hb),
            "h": g["h"].to_arrow().cast(pa.binary()),
            "n": g["n"].to_arrow(),
        })

    def bucket_topk(t: pa.Table) -> pa.Table:
        d = (_pl.from_arrow(t.select(["h", "n"]))
             .group_by("h").agg(n=_pl.col("n").sum())
             .with_columns(hx=_pl.col("h").bin.encode("hex"))
             .sort(["n", "hx"], descending=[True, False])
             .head(TOP_DUP_K))
        return d.select(["hx", "n"]).to_arrow().cast(pa.schema([
            ("hx", pa.string()), ("n", pa.int64())]))

    top = (ds.map_batches(slim, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("hb").map_groups(bucket_topk,
                                     batch_format="pyarrow")
           .to_pandas()
           .sort_values(["n", "hx"], ascending=[False, True])
           .head(TOP_DUP_K))
    want = {bytes.fromhex(h): (h, int(n))
            for h, n in zip(top["hx"], top["n"])}
    wref = ray.put(set(want))

    def sample(batch: pa.Table) -> pa.Table:
        ws = ray.get(wref)
        norm = _norm(batch["text"])
        dig = md5_digests(norm)
        idx = [i for i, d in enumerate(dig) if d in ws]
        if not idx:
            return pa.table({
                "h": pa.array([], pa.binary()),
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int64()),
                "sample_text": pa.array([], pa.string()),
            })
        sub = batch.take(idx)
        t = pa.table({
            "h": pa.array([dig[i] for i in idx], pa.binary()),
            "conv_id": sub["conv_id"].combine_chunks().cast(
                pa.string()),
            "turn_idx": pc.cast(sub["turn_idx"], pa.int64()),
            "sample_text": pc.fill_null(
                sub["text"].combine_chunks(), "").cast(pa.string()),
        })
        # batch-local min pre-reduce: a hot content may have tens of
        # thousands of copies — ship at most K rows per batch
        return (_pl.from_arrow(t)
                .sort(["h", "conv_id", "turn_idx"])
                .unique(subset="h", keep="first")
                .to_arrow().cast(t.schema))

    def min_copy(t: pa.Table) -> pa.Table:
        d = (_pl.from_arrow(t)
             .sort(["h", "conv_id", "turn_idx"])
             .unique(subset="h", keep="first"))
        return d.to_arrow().cast(pa.schema([
            ("h", pa.binary()), ("conv_id", pa.string()),
            ("turn_idx", pa.int64()), ("sample_text", pa.string())]))

    samples = (ds.map_batches(sample, batch_format="pyarrow",
                              zero_copy_batch=True)
               .repartition(1)
               .map_batches(min_copy, batch_format="pyarrow")
               .to_pandas())
    by_h = {bytes(h): (c, int(ti), s) for h, c, ti, s in zip(
        samples["h"], samples["conv_id"], samples["turn_idx"],
        samples["sample_text"])}
    rows = sorted(((hx, n, *by_h[hb]) for hb, (hx, n) in want.items()),
                  key=lambda r: (-r[1], r[0]))
    return pa.table({
        "hash_hex": pa.array([r[0] for r in rows], pa.string()),
        "n_copies": pa.array([r[1] for r in rows], pa.int64()),
        "conv_id": pa.array([r[2] for r in rows], pa.string()),
        "turn_idx": pa.array([r[3] for r in rows], pa.int64()),
        "sample_text": pa.array([r[4] for r in rows], pa.string()),
    })


def turn_position_length_curve(ds):
    """(role, pos_bucket, bucket_lo, n_turns, sum_chars,
    avg_chars_milli): turn length vs conversation DEPTH — average
    turn length by role and turn position, positions 0-7 kept exact
    and deeper positions in power-of-two buckets (8-15, 16-31, ...:
    bucket = 4 + bit_length(turn_idx), an exact integer — never float
    log2). The "do turns degrade deep into the conversation"
    datasheet curve; a drooping assistant line is the signature of
    context-budget truncation or model fatigue, and it decides
    whether long-tail turns are worth keeping.

    Zero data shuffle: per-batch vectorized length + bucket partials
    collapse to (role, bucket) rows; the final aggregate is
    |roles| x |buckets|."""
    import polars as pl

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(["role", "turn_idx", "text"]))
        ti = df["turn_idx"].to_numpy().astype(np.int64)
        v = ti.astype(np.uint64)
        bitlen = np.zeros(len(v), dtype=np.int64)
        w = v.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            big = w >= np.uint64(1 << shift)
            bitlen[big] += shift
            w[big] >>= np.uint64(shift)
        bitlen[v > 0] += 1
        bucket = np.where(ti < 8, ti, 4 + bitlen)
        g = (df.select(
            role=pl.col("role"),
            ln=pl.col("text").fill_null("").str.len_chars()
            .cast(pl.Int64))
            .with_columns(bucket=pl.Series(bucket))
            .group_by(["role", "bucket"])
            .agg(n=pl.len().cast(pl.Int64),
                 s=pl.col("ln").sum()))
        return g.to_arrow().cast(pa.schema([
            ("role", pa.string()), ("bucket", pa.int64()),
            ("n", pa.int64()), ("s", pa.int64())]))

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["role", "bucket"])
           .aggregate(Sum("n", alias_name="n_turns"),
                      Sum("s", alias_name="sum_chars"))
           .to_pandas()
           .sort_values(["role", "bucket"], kind="mergesort"))
    b = agg["bucket"].to_numpy(dtype=np.int64)
    n = agg["n_turns"].to_numpy(dtype=np.int64)
    s = agg["sum_chars"].to_numpy(dtype=np.int64)
    lo = np.where(b < 8, b, np.int64(1) << (b - 5))
    return pa.table({
        "role": pa.array(agg["role"].tolist(), pa.string()),
        "pos_bucket": pa.array(b),
        "bucket_lo": pa.array(lo.astype(np.int64)),
        "n_turns": pa.array(n),
        "sum_chars": pa.array(s),
        "avg_chars_milli": pa.array(1000 * s // n, pa.int64()),
    })


# Instruction-format compliance kinds: (kind, request substring in the
# lowercased user turn, compliance marker in the following assistant
# turn). Interpolated into the oracle; the marker set is deliberately
# literal-substring (RE2/Python/polars-neutral).
FORMAT_KINDS = (
    ("json", "json", "{"),
    ("list", "list", "\n-"),
    ("code", "code", "```"),
)


def format_compliance_turns(ds, num_buckets: int = 0):
    """(kind, n_requests, n_compliant, compliance_ppm):
    instruction-format compliance — for every user turn whose text
    requests a format (contains 'json'/'list'/'code') and whose NEXT
    turn in the conversation is an assistant turn, did the assistant
    reply contain the corresponding structural marker ('{' / a
    newline-dash bullet / a code fence)? The SFT instruction-following
    audit: a corpus with many format requests and near-zero marker
    compliance teaches format-ignoring behavior. Fixed 3-row kind
    spine on both engines (the empty-result rule).

    Shape: the substring tests are evaluated batch-locally and only
    slim (conv_id, turn_idx, role flags, two 3-bit masks) rows ride
    the ONE conv-bucket shuffle — never the text (measured: shipping
    text cost 28.6 s at sf0.1/32; the flag exchange ~7 s). The
    (user turn -> next turn) pair scan is the pinned bucket-local
    shape — sort once, whole-frame shift(-1) + same-conv mask, flag
    columns, plain sums (never a keyed window)."""
    import polars as pl

    from ray.data.aggregate import Sum
    from dataquality_ray.arrowutil import md5_digests

    num_buckets = num_buckets or cluster_buckets(minimum=32)

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(["conv_id", "turn_idx", "role", "text"])
        df = pl.from_arrow(t)
        low = df["text"].fill_null("").str.to_lowercase()
        raw = df["text"].fill_null("")
        req = np.zeros(len(df), dtype=np.int8)
        mark = np.zeros(len(df), dtype=np.int8)
        for bit, (_, rq, mk) in enumerate(FORMAT_KINDS):
            req |= (low.str.contains(rq, literal=True)
                    .to_numpy().astype(np.int8) << bit)
            mark |= (raw.str.contains(mk, literal=True)
                     .to_numpy().astype(np.int8) << bit)
        conv = t["conv_id"].combine_chunks() \
            if isinstance(t["conv_id"], pa.ChunkedArray) \
            else t["conv_id"]
        digs = md5_digests(conv)
        b = (np.frombuffer(b"".join(digs), dtype="<u8")
             .reshape(-1, 2)[:, 0] % num_buckets).astype(np.int32) \
            if digs else np.zeros(0, dtype=np.int32)
        role = df["role"].to_numpy()
        return pa.table({
            "bucket": pa.array(b),
            "conv_id": t["conv_id"],
            "turn_idx": t["turn_idx"].cast(pa.int64()),
            "is_user": pa.array(role == "user"),
            "is_asst": pa.array(role == "assistant"),
            "req": pa.array(req),
            "mark": pa.array(mark),
        })

    def scan(t: pa.Table) -> pa.Table:
        df = (pl.from_arrow(t.select(
            ["conv_id", "turn_idx", "is_user", "is_asst",
             "req", "mark"]))
            .sort(["conv_id", "turn_idx"]))
        nxt_asst = df["is_asst"].shift(-1).fill_null(False)
        nxt_mark = df["mark"].shift(-1).fill_null(0).to_numpy()
        same = (df["conv_id"] == df["conv_id"].shift(-1)) \
            .fill_null(False)
        pair = (same & df["is_user"] & nxt_asst).to_numpy()
        req = df["req"].to_numpy()
        rows = []
        for bit, (kind, _, _) in enumerate(FORMAT_KINDS):
            is_req = pair & ((req >> bit) & 1).astype(bool)
            ok = is_req & ((nxt_mark >> bit) & 1).astype(bool)
            rows.append((kind, int(is_req.sum()), int(ok.sum())))
        return pa.table({
            "kind": pa.array([r[0] for r in rows], pa.string()),
            "nr": pa.array([r[1] for r in rows], pa.int64()),
            "nc": pa.array([r[2] for r in rows], pa.int64()),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("bucket").map_groups(scan, batch_format="pyarrow")
           .groupby("kind")
           .aggregate(Sum("nr", alias_name="n_requests"),
                      Sum("nc", alias_name="n_compliant"))
           .to_pandas())
    got = {k: (0, 0) for k, _, _ in FORMAT_KINDS}
    for k, nr, nc in zip(agg["kind"], agg["n_requests"],
                         agg["n_compliant"]):
        got[k] = (int(nr), int(nc))
    kinds = [k for k, _, _ in FORMAT_KINDS]
    nr = [got[k][0] for k in kinds]
    nc = [got[k][1] for k in kinds]
    return pa.table({
        "kind": pa.array(kinds, pa.string()),
        "n_requests": pa.array(nr, pa.int64()),
        "n_compliant": pa.array(nc, pa.int64()),
        "compliance_ppm": pa.array(
            [c * 1_000_000 // max(r, 1) for r, c in zip(nr, nc)],
            pa.int64()),
    })


EVAL_SAMPLE_K = 5    # per-day eval-refresh sample size


def daily_eval_sample(ds):
    """(day, rank, conv_id, turn_idx, sample_text): deterministic
    per-day eval-set refresh — for every day in the corpus, the
    EVAL_SAMPLE_K turns with the smallest frozen
    md5_u64('conv_id:turn_idx') (a fixed-size unbiased sample per day
    at any corpus scale; re-running on a grown corpus changes the
    sample only where smaller hashes arrived, so day-over-day eval
    sets are stable). The human-review / LLM-judge feed a quality
    pipeline refreshes daily.

    Shape: per-batch per-day smallest-K pre-reduce (text rides only
    for the <= K x |days| kept rows per batch), then a per-day final
    top-K — driver volume is |days| x K."""
    import polars as pl

    from dataquality_ray.spec import token_hash_u64

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(
            ["conv_id", "turn_idx", "role", "text", "ts"]))
        pdf = df.to_pandas()
        day = pdf["ts"].dt.strftime("%Y-%m-%d").to_numpy()
        conv = pdf["conv_id"].to_numpy()
        ti = pdf["turn_idx"].to_numpy().astype(np.int64)
        hv = np.fromiter(
            (token_hash_u64(f"{c}:{t}") for c, t in zip(conv, ti)),
            dtype=np.uint64, count=len(conv))
        g = pl.DataFrame({
            "day": day, "hv": hv, "conv_id": conv,
            "turn_idx": ti,
            "sample_text": pdf["text"].fillna("").to_numpy(),
        })
        keep = (g.sort(["day", "hv", "conv_id", "turn_idx"])
                .group_by("day", maintain_order=True)
                .head(EVAL_SAMPLE_K))
        return keep.to_arrow().cast(pa.schema([
            ("day", pa.string()), ("hv", pa.uint64()),
            ("conv_id", pa.string()), ("turn_idx", pa.int64()),
            ("sample_text", pa.string())]))

    def final(t: pa.Table) -> pa.Table:
        df = (pl.from_arrow(t.select(
            ["day", "hv", "conv_id", "turn_idx", "sample_text"]))
            .sort(["hv", "conv_id", "turn_idx"])
            .head(EVAL_SAMPLE_K)
            .with_row_index("rank", offset=1))
        return df.select(
            ["day", "rank", "conv_id", "turn_idx", "sample_text"]) \
            .to_arrow().cast(pa.schema([
                ("day", pa.string()), ("rank", pa.int64()),
                ("conv_id", pa.string()), ("turn_idx", pa.int64()),
                ("sample_text", pa.string())]))

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("day").map_groups(final, batch_format="pyarrow"))


def reply_length_covariance(ds, num_buckets: int = 0):
    """(n_pairs, sum_u, sum_a, sum_uu, sum_aa, sum_ua): exact integer
    sufficient statistics for the correlation between a user turn's
    length and the immediately following assistant reply's length —
    the verbosity-coupling audit (does the corpus teach 'long prompt
    -> long answer'?). Exact integers only (the repo's
    sufficient-statistics convention: the float correlation is one
    driver division away and engine-dependent, the sums are not).

    Shape: lengths are computed batch-locally and only slim
    (conv_id, turn_idx, role flags, len) rows ride the ONE
    conv-bucket shuffle (the slim-exchange rule); the pair scan is
    the pinned whole-frame-shift shape; output is a single row."""
    import polars as pl

    from ray.data.aggregate import Sum
    from dataquality_ray.arrowutil import md5_digests

    num_buckets = num_buckets or cluster_buckets(minimum=32)

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(["conv_id", "turn_idx", "role", "text"])
        df = pl.from_arrow(t)
        conv = t["conv_id"].combine_chunks() \
            if isinstance(t["conv_id"], pa.ChunkedArray) \
            else t["conv_id"]
        digs = md5_digests(conv)
        b = (np.frombuffer(b"".join(digs), dtype="<u8")
             .reshape(-1, 2)[:, 0] % num_buckets).astype(np.int32) \
            if digs else np.zeros(0, dtype=np.int32)
        role = df["role"].to_numpy()
        return pa.table({
            "bucket": pa.array(b),
            "conv_id": t["conv_id"],
            "turn_idx": t["turn_idx"].cast(pa.int64()),
            "is_user": pa.array(role == "user"),
            "is_asst": pa.array(role == "assistant"),
            "ln": pl.Series(df["text"].fill_null("")
                            .str.len_chars().cast(pl.Int64))
            .to_arrow().cast(pa.int64()),
        })

    def scan(t: pa.Table) -> pa.Table:
        df = (pl.from_arrow(t.select(
            ["conv_id", "turn_idx", "is_user", "is_asst", "ln"]))
            .sort(["conv_id", "turn_idx"]))
        same = (df["conv_id"] == df["conv_id"].shift(-1)) \
            .fill_null(False)
        pair = (same & df["is_user"]
                & df["is_asst"].shift(-1).fill_null(False)) \
            .to_numpy()
        u = df["ln"].to_numpy()[pair]
        a = df["ln"].shift(-1).fill_null(0).to_numpy()[pair]
        return pa.table({
            "n_pairs": pa.array([len(u)], pa.int64()),
            "sum_u": pa.array([int(u.sum())], pa.int64()),
            "sum_a": pa.array([int(a.sum())], pa.int64()),
            "sum_uu": pa.array([int((u * u).sum())], pa.int64()),
            "sum_aa": pa.array([int((a * a).sum())], pa.int64()),
            "sum_ua": pa.array([int((u * a).sum())], pa.int64()),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("bucket").map_groups(scan, batch_format="pyarrow")
           .aggregate(Sum("n_pairs", alias_name="n_pairs"),
                      Sum("sum_u", alias_name="sum_u"),
                      Sum("sum_a", alias_name="sum_a"),
                      Sum("sum_uu", alias_name="sum_uu"),
                      Sum("sum_aa", alias_name="sum_aa"),
                      Sum("sum_ua", alias_name="sum_ua")))
    return pa.table({k: pa.array([int(agg[k] or 0)], pa.int64())
                     for k in ("n_pairs", "sum_u", "sum_a",
                               "sum_uu", "sum_aa", "sum_ua")})


def role_vocab_overlap(ds, num_buckets: int = 0):
    """(role_a, role_b, v_a, v_b, v_common, jaccard_ppm): exact
    vocabulary overlap between ROLES — do users and assistants speak
    the same language? A low user-assistant vocab Jaccard flags
    register mismatch (jargon-heavy replies to plain-language
    prompts); tool-role rows profile the structured-output span. The
    role-axis twin of source_vocab_overlap.

    Shape: distinctness is decided on the frozen md5-u64 token hash;
    per-batch (role, token) dedup before hashing, ONE token-hash
    bucket shuffle of slim (part, hash, role-bit) rows, per-bucket
    exact per-role distinct counts + pairwise intersections (each
    hash lives in exactly one bucket), |roles|^2-bounded aggregate."""
    import polars as pl

    from ray.data.aggregate import Sum
    from dataquality_ray.arrowutil import md5_digests
    from dataquality_ray.spec import TOKEN_PATTERN

    nb = num_buckets or cluster_buckets()

    def partial(batch: pa.Table) -> pa.Table:
        df = (pl.from_arrow(batch.select(["role", "text"]))
              .with_columns(toks=pl.col("text").fill_null("")
                            .str.to_lowercase()
                            .str.extract_all(TOKEN_PATTERN))
              .select(["role", "toks"]).explode("toks")
              .drop_nulls("toks").unique())
        digs = md5_digests(df["toks"].to_arrow())
        hh = np.frombuffer(b"".join(digs),
                           dtype="<u8").reshape(-1, 2)[:, 0] \
            if digs else np.zeros(0, dtype=np.uint64)
        return pa.table({
            "part": pa.array((hh % nb).astype(np.int32)),
            "hh": pa.array(hh.view(np.int64)),
            "role": df["role"].to_arrow().cast(pa.string()),
        })

    def scan(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["hh", "role"])).unique()
        singles = (df.group_by("role")
                   .agg(c=pl.len().cast(pl.Int64))
                   .select(ra=pl.col("role"), rb=pl.lit(""),
                           c=pl.col("c")))
        pairs = (df.join(df, on="hh", suffix="_b")
                 .filter(pl.col("role") < pl.col("role_b"))
                 .group_by(["role", "role_b"])
                 .agg(c=pl.len().cast(pl.Int64))
                 .select(ra=pl.col("role"), rb=pl.col("role_b"),
                         c=pl.col("c")))
        return pl.concat([singles, pairs]).to_arrow().cast(
            pa.schema([("ra", pa.string()), ("rb", pa.string()),
                       ("c", pa.int64())]))

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("part").map_groups(scan, batch_format="pyarrow")
           .groupby(["ra", "rb"]).aggregate(Sum("c", alias_name="c"))
           .to_pandas())
    singles = {r.ra: int(r.c) for r in agg.itertuples() if r.rb == ""}
    pairs = {(r.ra, r.rb): int(r.c) for r in agg.itertuples()
             if r.rb != ""}
    roles = sorted(singles)
    rows = []
    for i, a in enumerate(roles):
        for b in roles[i + 1:]:
            va, vb = singles[a], singles[b]
            vc = pairs.get((a, b), 0)
            rows.append((a, b, va, vb, vc,
                         1_000_000 * vc // max(va + vb - vc, 1)))
    return pa.table({
        "role_a": pa.array([r[0] for r in rows], pa.string()),
        "role_b": pa.array([r[1] for r in rows], pa.string()),
        "v_a": pa.array([r[2] for r in rows], pa.int64()),
        "v_b": pa.array([r[3] for r in rows], pa.int64()),
        "v_common": pa.array([r[4] for r in rows], pa.int64()),
        "jaccard_ppm": pa.array([r[5] for r in rows], pa.int64()),
    })


def prefill_cost_curve(ds, num_buckets: int = 0):
    """(pos_bucket, bucket_lo, n_turns, sum_prefix_tokens,
    avg_prefix_tokens_milli): the serving/training PREFILL cost curve
    — for every turn, the cumulative token count of all PRIOR turns
    in its conversation (the context a model re-reads to process that
    turn), aggregated by the turn_position_length_curve depth buckets
    (0-7 exact, power-of-two deeper). Quadratic-in-depth context cost
    is why long conversations dominate compute budgets; this table
    prices it per depth class.

    Shape: token counts are computed batch-locally and only slim
    (conv_id, turn_idx, n_tok) rows ride the ONE conv-bucket shuffle
    (the slim-exchange rule); the exclusive prefix sum is a
    bucket-local vectorized pandas groupby cumsum over sorted rows;
    the aggregate is |buckets|-sized."""
    import polars as pl

    from ray.data.aggregate import Sum
    from dataquality_ray.arrowutil import md5_digests
    from dataquality_ray.spec import TOKEN_PATTERN

    num_buckets = num_buckets or cluster_buckets(minimum=32)

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(["conv_id", "turn_idx", "text"])
        df = pl.from_arrow(t)
        conv = t["conv_id"].combine_chunks() \
            if isinstance(t["conv_id"], pa.ChunkedArray) \
            else t["conv_id"]
        digs = md5_digests(conv)
        b = (np.frombuffer(b"".join(digs), dtype="<u8")
             .reshape(-1, 2)[:, 0] % num_buckets).astype(np.int32) \
            if digs else np.zeros(0, dtype=np.int32)
        return pa.table({
            "bucket": pa.array(b),
            "conv_id": t["conv_id"],
            "turn_idx": t["turn_idx"].cast(pa.int64()),
            "ntok": pl.Series(
                df["text"].fill_null("").str.to_lowercase()
                .str.count_matches(TOKEN_PATTERN).cast(pl.Int64))
            .to_arrow().cast(pa.int64()),
        })

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"],
                            kind="mergesort").reset_index(drop=True)
        cs = df.groupby("conv_id", sort=False)["ntok"].cumsum() \
            .to_numpy(dtype=np.int64)
        prefix = cs - df["ntok"].to_numpy(dtype=np.int64)
        ti = df["turn_idx"].to_numpy(dtype=np.int64)
        v = ti.astype(np.uint64)
        bitlen = np.zeros(len(v), dtype=np.int64)
        w = v.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            big = w >= np.uint64(1 << shift)
            bitlen[big] += shift
            w[big] >>= np.uint64(shift)
        bitlen[v > 0] += 1
        bucket = np.where(ti < 8, ti, 4 + bitlen)
        g = (pd.DataFrame({"pos_bucket": bucket, "p": prefix})
             .groupby("pos_bucket", sort=False)
             .agg(n=("p", "size"), s=("p", "sum")).reset_index())
        return g

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("bucket").map_groups(scan, batch_format="pandas")
           .groupby("pos_bucket")
           .aggregate(Sum("n", alias_name="n_turns"),
                      Sum("s", alias_name="sum_prefix_tokens"))
           .to_pandas().sort_values("pos_bucket", kind="mergesort"))
    b = agg["pos_bucket"].to_numpy(dtype=np.int64)
    n = agg["n_turns"].to_numpy(dtype=np.int64)
    s = agg["sum_prefix_tokens"].to_numpy(dtype=np.int64)
    lo = np.where(b < 8, b, np.int64(1) << (b - 5))
    return pa.table({
        "pos_bucket": pa.array(b),
        "bucket_lo": pa.array(lo.astype(np.int64)),
        "n_turns": pa.array(n),
        "sum_prefix_tokens": pa.array(s),
        "avg_prefix_tokens_milli": pa.array(1000 * s // n,
                                            pa.int64()),
    })


def role_run_lengths(ds, num_buckets: int = 0):
    """(role, run_len, n_runs): run-length histogram of consecutive
    same-role turns — the dialog-structure depth profile
    (assistant-assistant chains = multi-message replies or tool-loop
    spans; user-user chains = unanswered follow-ups). Exact run
    lengths are safe to histogram directly: run_len is bounded by
    conversation length, so the aggregate is |roles| x max_run.

    Shape: ONE conv-bucket shuffle of slim (conv_id, turn_idx, role)
    rows; run boundaries via the pinned whole-frame-shift shape (a
    run starts where conv or role changes); per-bucket run-length
    counts, tiny final aggregate."""
    import polars as pl

    from ray.data.aggregate import Sum
    from dataquality_ray.arrowutil import md5_digests

    num_buckets = num_buckets or cluster_buckets(minimum=32)

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(["conv_id", "turn_idx", "role"])
        conv = t["conv_id"].combine_chunks() \
            if isinstance(t["conv_id"], pa.ChunkedArray) \
            else t["conv_id"]
        digs = md5_digests(conv)
        b = (np.frombuffer(b"".join(digs), dtype="<u8")
             .reshape(-1, 2)[:, 0] % num_buckets).astype(np.int32) \
            if digs else np.zeros(0, dtype=np.int32)
        return t.append_column("bucket", pa.array(b))

    def scan(t: pa.Table) -> pa.Table:
        df = (pl.from_arrow(t.select(["conv_id", "turn_idx", "role"]))
              .sort(["conv_id", "turn_idx"]))
        conv = df["conv_id"].to_numpy()
        role = df["role"].to_numpy()
        n = len(conv)
        if not n:
            return pa.table({"role": pa.array([], pa.string()),
                             "run_len": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        start = np.empty(n, dtype=bool)
        start[0] = True
        start[1:] = (conv[1:] != conv[:-1]) | (role[1:] != role[:-1])
        sidx = np.flatnonzero(start)
        lens = np.diff(np.append(sidx, n))
        g = (pl.DataFrame({"role": role[sidx], "run_len": lens})
             .group_by(["role", "run_len"])
             .agg(n=pl.len().cast(pl.Int64)))
        return g.to_arrow().cast(pa.schema([
            ("role", pa.string()), ("run_len", pa.int64()),
            ("n", pa.int64())]))

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("bucket").map_groups(scan, batch_format="pyarrow")
            .groupby(["role", "run_len"])
            .aggregate(Sum("n", alias_name="n_runs")))


def tool_retry_stats(ds, num_buckets: int = 0):
    """(n_tool_turns, n_retries, n_recovered, retry_ppm): agent-loop
    health — a RETRY is a tool turn immediately followed by another
    tool turn in the same conversation (the model re-invoked a tool
    without an intervening assistant synthesis), a RECOVERY is a tool
    turn followed by an assistant turn. High retry share flags flaky
    tools or thrashing agents before those trajectories are kept for
    training. Single-row output.

    Shape: ONE conv-bucket shuffle of slim (conv_id, turn_idx,
    role flags) rows (the slim-exchange rule); the successor test is
    the pinned whole-frame-shift pair scan."""
    import polars as pl

    from ray.data.aggregate import Sum
    from dataquality_ray.arrowutil import md5_digests

    num_buckets = num_buckets or cluster_buckets(minimum=32)

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(["conv_id", "turn_idx", "role"])
        conv = t["conv_id"].combine_chunks() \
            if isinstance(t["conv_id"], pa.ChunkedArray) \
            else t["conv_id"]
        digs = md5_digests(conv)
        b = (np.frombuffer(b"".join(digs), dtype="<u8")
             .reshape(-1, 2)[:, 0] % num_buckets).astype(np.int32) \
            if digs else np.zeros(0, dtype=np.int32)
        role = pl.from_arrow(t["role"]).to_numpy()
        return pa.table({
            "bucket": pa.array(b),
            "conv_id": t["conv_id"],
            "turn_idx": t["turn_idx"].cast(pa.int64()),
            "is_tool": pa.array(role == "tool"),
            "is_asst": pa.array(role == "assistant"),
        })

    def scan(t: pa.Table) -> pa.Table:
        df = (pl.from_arrow(t.select(
            ["conv_id", "turn_idx", "is_tool", "is_asst"]))
            .sort(["conv_id", "turn_idx"]))
        same = (df["conv_id"] == df["conv_id"].shift(-1)) \
            .fill_null(False)
        tool = df["is_tool"]
        retry = (same & tool & df["is_tool"].shift(-1)
                 .fill_null(False))
        recov = (same & tool & df["is_asst"].shift(-1)
                 .fill_null(False))
        return pa.table({
            "nt": pa.array([int(tool.sum())], pa.int64()),
            "nr": pa.array([int(retry.sum())], pa.int64()),
            "nc": pa.array([int(recov.sum())], pa.int64()),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("bucket").map_groups(scan, batch_format="pyarrow")
           .aggregate(Sum("nt", alias_name="nt"),
                      Sum("nr", alias_name="nr"),
                      Sum("nc", alias_name="nc")))
    nt = int(agg["nt"] or 0)
    nr = int(agg["nr"] or 0)
    nc = int(agg["nc"] or 0)
    return pa.table({
        "n_tool_turns": pa.array([nt], pa.int64()),
        "n_retries": pa.array([nr], pa.int64()),
        "n_recovered": pa.array([nc], pa.int64()),
        "retry_ppm": pa.array([1_000_000 * nr // max(nt, 1)],
                              pa.int64()),
    })


def role_share_daily(ds):
    """(day, role, n_turns, share_ppm): daily role-mix timeline — the
    structure-drift monitor (a rising tool share = agentic traffic
    growth; a falling assistant share = broken ingest). share_ppm is
    the exact floor-ppm of the day's turns. Zero data shuffle:
    per-batch (day, role) integer partials into a |days| x |roles|
    aggregate; shares complete on the driver over that
    output-sized table."""
    import polars as pl

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(["ts", "role"]).to_pandas()
        df["day"] = df["ts"].dt.strftime("%Y-%m-%d")
        g = (pl.from_pandas(df[["day", "role"]])
             .group_by(["day", "role"])
             .agg(n=pl.len().cast(pl.Int64)))
        return g.to_arrow().cast(pa.schema([
            ("day", pa.string()), ("role", pa.string()),
            ("n", pa.int64())]))

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["day", "role"])
           .aggregate(Sum("n", alias_name="n_turns"))
           .to_pandas())
    tot = agg.groupby("day")["n_turns"].transform("sum") \
        .to_numpy()
    n = agg["n_turns"].to_numpy(dtype=np.int64)
    agg = agg.sort_values(["day", "role"], kind="mergesort")
    order = agg.index.to_numpy()
    return pa.table({
        "day": pa.array(agg["day"].tolist(), pa.string()),
        "role": pa.array(agg["role"].tolist(), pa.string()),
        "n_turns": pa.array(n[order]),
        "share_ppm": pa.array(
            (1_000_000 * n[order] // tot[order]).astype(np.int64)),
    })
