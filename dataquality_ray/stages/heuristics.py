"""Heuristic quality signals — vectorized Arrow/polars kernels.

Computes the integer quality scores defined in ``spec.py`` (length,
repetition/type-token-ratio, symbol density, boilerplate, timeliness) over
whole batches: pyarrow.compute for char/regex counts, polars for the
per-row distinct-token count (Rust-vectorized list ops — no Python loop).

Reference analogs: the 17-dimension rubric scored by an LLM
(bedrock.py:95-413) becomes these deterministic signals; the timeliness
rule is metadata.py:398-407; integer formulas are pinned in spec.py so a
DuckDB SQL oracle reproduces them bit-for-bit.
"""

from __future__ import annotations

import os

# One polars thread per worker: many concurrent Ray actors each spinning a
# full-width polars thread pool thrash the node (must be set before the
# first polars import anywhere in the process).
os.environ.setdefault("POLARS_MAX_THREADS", "1")

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

from dataquality_ray.config import DEFAULT_CONFIG, PipelineConfig
from dataquality_ray.spec import (
    BOILERPLATE_PATTERN,
    SYMBOL_PATTERN,
    TOKEN_PATTERN,
    TOXICITY_PATTERN,
)


def token_stats(text: pa.Array) -> tuple[pa.Array, pa.Array]:
    """(n_tokens, n_distinct_tokens) per row via polars list ops."""
    s = pl.from_arrow(text)
    if isinstance(s, pl.DataFrame):  # older polars may wrap
        s = s.to_series()
    toks = s.str.to_lowercase().str.extract_all(TOKEN_PATTERN)
    n_tok = toks.list.len().cast(pl.Int64)
    n_distinct = toks.list.n_unique().cast(pl.Int64)
    return n_tok.to_arrow(), n_distinct.to_arrow()


def heuristics_batch(batch: pa.Table, text_col: str = "text",
                     cfg: PipelineConfig = DEFAULT_CONFIG,
                     now: str | None = None) -> pa.Table:
    """Append n_chars, n_tokens, n_distinct and the five heuristic scores.

    ``now`` (ISO string) pins the timeliness reference instant; defaults to
    ``cfg.reference_now``.
    """
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()

    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_sym = pc.cast(pc.count_substring_regex(text, SYMBOL_PATTERN), pa.int64())
    n_tok, n_distinct = token_stats(text)
    if isinstance(n_tok, pa.ChunkedArray):
        n_tok = n_tok.combine_chunks()
        n_distinct = n_distinct.combine_chunks()

    nc = n_chars.to_numpy(zero_copy_only=False)
    ns = n_sym.to_numpy(zero_copy_only=False)
    nt = n_tok.to_numpy(zero_copy_only=False)
    nd = n_distinct.to_numpy(zero_copy_only=False)

    # spec.length_score: min(100, 100*n_chars // min_len)
    length = np.minimum(100, (100 * nc) // cfg.min_len_chars)
    # spec.repetition_score: 100 if no tokens else 100*distinct // tokens
    repetition = np.where(nt == 0, 100, (100 * nd) // np.maximum(nt, 1))
    # spec.symbol_score: 100 - min(100, 300*sym // chars); empty -> 100
    symbol = np.where(
        nc == 0, 100,
        100 - np.minimum(100, (cfg.symbol_penalty_mult * ns) // np.maximum(nc, 1)),
    )
    # boilerplate: any phrase hit -> 0
    lower = pc.utf8_lower(text)
    bp_hit = pc.match_substring_regex(lower, BOILERPLATE_PATTERN)
    boilerplate = np.where(bp_hit.to_numpy(zero_copy_only=False), 0, 100)
    # toxicity: spec.toxicity_score — lexicon hits on the lowered text
    n_tox = pc.cast(pc.count_substring_regex(lower, TOXICITY_PATTERN),
                    pa.int32())
    toxicity = np.maximum(
        0, 100 - cfg.toxicity_penalty_mult
        * n_tox.to_numpy(zero_copy_only=False).astype(np.int64))

    batch = batch.append_column("n_chars", n_chars)
    batch = batch.append_column("n_tokens", n_tok)
    batch = batch.append_column("n_distinct", n_distinct)
    batch = batch.append_column("n_toxic", n_tox)
    batch = batch.append_column("length_score", pa.array(length.astype(np.int32)))
    batch = batch.append_column("repetition_score", pa.array(repetition.astype(np.int32)))
    batch = batch.append_column("symbol_score", pa.array(symbol.astype(np.int32)))
    batch = batch.append_column("boilerplate_score", pa.array(boilerplate.astype(np.int32)))
    batch = batch.append_column("toxicity_score", pa.array(toxicity.astype(np.int32)))

    if "ts" in batch.column_names:
        now_iso = now or cfg.reference_now
        now_us = np.datetime64(now_iso, "us").astype(np.int64)
        ts = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        age_days = (now_us - ts) // (86_400 * 1_000_000)
        timeliness = np.where(
            age_days > cfg.timeliness_max_age_days,
            min(100, cfg.timeliness_cap), 100).astype(np.int32)
        batch = batch.append_column("age_days",
                                    pa.array(age_days.astype(np.int64)))
        batch = batch.append_column("timeliness_score", pa.array(timeliness))
    return batch


def sentence_stats_batch(batch, id_cols=("conv_id", "turn_idx"),
                         text_col: str = "text"):
    """Intra-document repetition signal (C4-style line/sentence dedup,
    reduced to counts so the surface stays integer-deterministic):
    segments = '.'-split, whitespace-trimmed, empties dropped — the
    IDENTICAL rule as the DuckDB oracle's
    list_filter(list_transform(string_split(...))) chain.
    Emits n_sentences, n_unique_sentences per row; zero shuffle."""
    import polars as pl
    import pyarrow as pa

    s = pl.from_arrow(batch[text_col]).fill_null("")
    segs = (s.str.split(".")
            .list.eval(pl.element().str.strip_chars(" \t\r\n"))
            .list.eval(pl.element().filter(pl.element() != "")))
    cols = {c: batch[c] for c in id_cols}
    cols["n_sentences"] = pa.array(
        segs.list.len().cast(pl.Int64).to_numpy(), pa.int64())
    cols["n_unique_sentences"] = pa.array(
        segs.list.unique().list.len().cast(pl.Int64).to_numpy(),
        pa.int64())
    return pa.table(cols)


def heuristic_overall4(batch: pa.Table) -> "np.ndarray":
    """Integer mean of the four text-heuristic scores — the single
    definition of the SQL-expressible heuristic 'overall' used by the
    document quality surface, the conv-level gating surfaces, and
    their oracles (any rule change must still be mirrored in the
    generated SQL, but now only ONE Python site).
    Input: a heuristics_batch-scored table."""
    s = [batch[c].to_numpy(zero_copy_only=False).astype(np.int64)
         for c in ("length_score", "repetition_score", "symbol_score",
                   "boilerplate_score")]
    return (s[0] + s[1] + s[2] + s[3]) // 4
