"""The flagship transcript quality pipeline (SURVEY §3.1 "our shape").

read_parquet → scrub (zero-copy Arrow regex) → heuristics (vectorized) →
model scoring (actor pool: langid + n-gram LM) → decision (17 dims,
overall, action, keep) → content hash → exact-dedup groupby shuffle →
stable (conv_id, turn_idx) sort.

The reference equivalent is the sequential per-file loop at
metadata.py:245-714; every step here is a streaming Ray Data stage with
backpressure — nothing materializes the full corpus.
"""

from __future__ import annotations

import functools
from typing import Optional

import pyarrow as pa

from dataquality_ray.config import DEFAULT_CONFIG, PipelineConfig
from dataquality_ray.stages.decision import decision_batch
from dataquality_ray.stages.dedup import (
    MinHashSimHash,
    content_hash_batch,
    exact_dedup,
    near_dup_pairs,
)
from dataquality_ray.stages.heuristics import heuristics_batch
from dataquality_ray.stages.model_scorers import CombinedModelScorer
from dataquality_ray.stages.scrub import scrub_batch

RESULT_COLUMNS = [
    "conv_id", "turn_idx", "role", "tool", "ts", "text",
    "n_email", "n_phone", "n_ssn",
    "lang", "lang_conf", "log2_ppl",
    "length_score", "repetition_score", "symbol_score", "boilerplate_score",
    "lang_score", "ppl_score", "timeliness_score",
    "overall_quality_score", "action", "keep",
    "content_hash", "dup_of",
]


def quality_pipeline(ds, cfg: PipelineConfig = DEFAULT_CONFIG,
                     now: Optional[str] = None,
                     with_dedup: bool = True,
                     dedup_mode: str = "broadcast",
                     with_sketches: bool = False,
                     with_evidence: bool = False,
                     sort_output: bool = True,
                     concurrency: Optional[int] = None):
    """Assemble the lazy quality DAG over a transcript Dataset.

    ``dedup_mode``:
      - "broadcast" (default): duplicate map computed by a cheap narrow
        side pipeline (scrub+hash only) and broadcast via ray.put — the
        main pipeline stays shuffle-free until the final sort. Right when
        the duplicated-hash set fits in worker memory.
      - "shuffle": the general bucketed groupby shuffle (exact_dedup) —
        no size assumption; full rows move once.
    ``with_sketches`` additionally computes MinHash/SimHash columns
    (needed when a near-dup pass follows). ``concurrency`` sizes the model
    actor pool (defaults to cfg.actor_pool_size).
    """
    raw = ds
    ds = ds.map_batches(
        functools.partial(scrub_batch),
        batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(
        functools.partial(heuristics_batch, cfg=cfg, now=now),
        batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(
        CombinedModelScorer,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        # autoscaling pool (min 1): never starves the non-actor stages on
        # a small cluster, scales up when CPUs are free
        concurrency=(1, concurrency or cfg.actor_pool_size))
    ds = ds.map_batches(
        functools.partial(decision_batch, cfg=cfg,
                          with_evidence=with_evidence),
        batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(content_hash_batch, batch_format="pyarrow",
                        zero_copy_batch=True)
    if with_sketches:
        ds = ds.map_batches(
            MinHashSimHash,
            fn_constructor_kwargs={"cfg": cfg},
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=(1, concurrency or cfg.actor_pool_size))
    if with_dedup and dedup_mode == "broadcast":
        import ray
        from dataquality_ray.stages.dedup import (
            assign_dup_from_map,
            compute_dup_map,
        )
        dup_map = compute_dup_map(raw, cfg)   # cheap narrow side pipeline
        map_ref = ray.put(dup_map)
        ds = ds.map_batches(
            functools.partial(assign_dup_from_map, map_ref=map_ref),
            batch_format="pyarrow", zero_copy_batch=True)
    elif with_dedup:
        ds = exact_dedup(ds, cfg)
    else:
        ds = ds.map_batches(
            lambda t: t.append_column(
                "dup_of", pa.nulls(t.num_rows, pa.string())),
            batch_format="pyarrow")
    if sort_output:
        ds = ds.sort(["conv_id", "turn_idx"])
    return ds


def transcript_near_dup_pairs(ds, cfg: PipelineConfig = DEFAULT_CONFIG,
                              concurrency: Optional[int] = None):
    """Side output: (key_a, key_b, jaccard) near-dup pairs over scrubbed
    transcript text (reference analog: similarity_pairs,
    metadata.py:592-597, computed there as an O(n²) loop)."""
    ds = ds.map_batches(functools.partial(scrub_batch, with_counts=False),
                        batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(content_hash_batch, batch_format="pyarrow")
    ds = ds.map_batches(
        MinHashSimHash,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=(1, concurrency or cfg.actor_pool_size))
    return near_dup_pairs(ds, cfg)


def run_summary(results_ds):
    """Run-level metrics (reference analog: consolidated run summary,
    metadata.py:639-646 + dashboard aggregates, routes.py:441-574)."""
    from ray.data.aggregate import Count, Mean
    return (results_ds
            .groupby("action")
            .aggregate(Count(alias_name="n"),
                       Mean("overall_quality_score", alias_name="avg_quality")))
