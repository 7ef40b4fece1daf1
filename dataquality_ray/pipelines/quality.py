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
    "n_email", "n_phone", "n_ssn", "n_toxic",
    "lang", "lang_conf", "log2_ppl",
    "length_score", "repetition_score", "symbol_score", "boilerplate_score",
    "lang_score", "ppl_score", "timeliness_score", "toxicity_score",
    "overall_quality_score", "action", "keep",
    "content_hash", "dup_of",
]


def default_pool_size(num_cpus: int) -> int:
    """Model-actor pool width for a given cluster CPU count: 3/4 of the
    cores, minus one reserved core per 16 (the task-pool stages —
    decision/hash/exchange/write — run CONCURRENTLY with the pool and
    starve when the pool holds too many reservations). Measured on the
    sf0.1 headline: at 32 CPUs pool=22 beats 24 (19.3 s vs 21.8 s) and
    16 (25.0 s); at 8 CPUs pool=6 beats 5 (50.0 s vs 52.4 s)."""
    return max(2, (3 * num_cpus) // 4 - num_cpus // 16)


def quality_pipeline(ds, cfg: PipelineConfig = DEFAULT_CONFIG,
                     now: Optional[str] = None,
                     with_dedup: bool = True,
                     dedup_mode: str = "inline",
                     with_sketches: bool = False,
                     with_evidence: bool = False,
                     sort_output: bool = True,
                     sort_mode: str = "global",
                     concurrency: Optional[int] = None):
    """Assemble the lazy quality DAG over a transcript Dataset.

    ``dedup_mode``:
      - "inline" (default): the hash stage pushes per-batch dup-map
        partials to zero-CPU aggregator actors as a SIDE CHANNEL of the
        one scoring pass (awaited per batch, so the downstream full
        barrier — the global sort, or a materialize when
        ``sort_output=False`` — guarantees the map is complete before
        ``dup_of`` is assigned). The whole pipeline is ONE streaming DAG:
        no second pass over the corpus and no mid-pipeline materialize.
      - "broadcast": score → materialize → narrow dup-map groupby over
        the checkpointed stream → broadcast map (the shape quality_run
        uses with a parquet checkpoint; keeps a reusable scored snapshot).
      - "shuffle": the general bucketed groupby shuffle (exact_dedup) —
        no size assumption; full rows move once.
    ``with_sketches`` additionally computes MinHash/SimHash columns
    (needed when a near-dup pass follows). ``concurrency`` sizes the model
    actor pool (defaults to cfg.actor_pool_size).

    ``sort_mode`` (when ``sort_output=True``):
      - "global": single range-partitioned sort on (conv_id, turn_idx) —
        total order, but the range boundaries come from a quantile-
        SAMPLING pass over every block's key column (a serial barrier
        that needs data statistics).
      - "bucketed" (the production/bench path): ``bucketed_sort`` —
        conv_bucket = md5(conv_id) % K as the primary key with EXPLICIT
        ``boundaries``, so the sampling pass disappears and partition i
        holds exactly bucket i (the layout is a pure function of conv_id
        and K: deterministic, resumable, no data statistics). Secondary
        keys keep (conv_id, turn_idx) order within each partition —
        a deterministic total order (conv_bucket, conv_id, turn_idx)
        with every conversation intact inside one partition, carried in
        an explicit ``conv_bucket`` output column.
    """
    ds = ds.map_batches(
        functools.partial(scrub_batch),
        batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(
        functools.partial(heuristics_batch, cfg=cfg, now=now),
        batch_format="pyarrow", zero_copy_batch=True)
    # explicit int concurrency → FIXED pool (all actors up immediately —
    # autoscaling ramp is too slow for short bench jobs); default →
    # autoscaling (1, cfg.actor_pool_size) so small test clusters never
    # starve the non-actor stages.
    model_conc = concurrency if concurrency is not None \
        else (1, cfg.actor_pool_size)
    ds = ds.map_batches(
        CombinedModelScorer,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=model_conc)
    ds = ds.map_batches(
        functools.partial(decision_batch, cfg=cfg,
                          with_evidence=with_evidence),
        batch_format="pyarrow", zero_copy_batch=True)

    inline = with_dedup and dedup_mode == "inline"
    agg_handles = None
    if inline:
        from dataquality_ray.stages.dedup import (
            content_hash_with_side_map,
            make_dup_aggregators,
        )
        agg_handles = make_dup_aggregators()
        ds = ds.map_batches(
            functools.partial(content_hash_with_side_map,
                              handles=agg_handles,
                              num_buckets=cfg.num_buckets),
            batch_format="pyarrow", zero_copy_batch=True)
    else:
        ds = ds.map_batches(content_hash_batch, batch_format="pyarrow",
                            zero_copy_batch=True)
    if with_sketches:
        ds = ds.map_batches(
            MinHashSimHash,
            fn_constructor_kwargs={"cfg": cfg},
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=model_conc)

    if with_dedup and dedup_mode == "broadcast":
        import ray
        from dataquality_ray.stages.dedup import (
            assign_dup_from_map,
            compute_dup_map_from_hashed,
        )
        ds = ds.materialize()
        dup_map = compute_dup_map_from_hashed(ds, cfg)
        map_ref = ray.put(dup_map)
        ds = ds.map_batches(
            functools.partial(assign_dup_from_map, map_ref=map_ref),
            batch_format="pyarrow", zero_copy_batch=True)
    elif with_dedup and dedup_mode == "shuffle":
        ds = exact_dedup(ds, cfg)
    elif inline and not sort_output:
        # no sort barrier downstream — materialize IS the barrier that
        # makes the aggregator map complete before assignment
        from dataquality_ray.stages.dedup import \
            assign_dup_from_aggregators
        ds = ds.materialize()
        ds = ds.map_batches(
            functools.partial(assign_dup_from_aggregators,
                              handles=agg_handles),
            batch_format="pyarrow", zero_copy_batch=True)
    elif not with_dedup:
        ds = ds.map_batches(
            lambda t: t.append_column(
                "dup_of", pa.nulls(t.num_rows, pa.string())),
            batch_format="pyarrow")

    if sort_output:
        # project away intermediates BEFORE the sort — the global sort is
        # the one unavoidable all-to-all; don't shuffle helper columns.
        # In inline mode dup_of does not exist yet: carry the two narrow
        # helper keys through the sort and assign dup_of after it (the
        # sort is the barrier that completes the aggregator map).
        extra = (["token_hashes", "minhash_sig", "simhash"]
                 if with_sketches else []) \
            + (["dimensions"] if with_evidence else [])
        if inline:
            keep_cols = [c for c in RESULT_COLUMNS if c != "dup_of"] \
                + extra + ["dedup_key", "order_key"]
        else:
            keep_cols = [c for c in RESULT_COLUMNS if c != "dup_of"] \
                + extra + ["dup_of"]
        if sort_mode == "bucketed":
            ds = ds.map_batches(
                functools.partial(_project, cols=keep_cols),
                batch_format="pyarrow", zero_copy_batch=True)
            ds = bucketed_sort(ds)
            if inline:
                from dataquality_ray.stages.dedup import \
                    assign_dup_from_aggregators
                ds = ds.map_batches(
                    functools.partial(assign_dup_from_aggregators,
                                      handles=agg_handles),
                    batch_format="pyarrow", zero_copy_batch=True)
            ds = ds.map_batches(
                functools.partial(_project,
                                  cols=RESULT_COLUMNS + extra
                                  + ["conv_bucket"]),
                batch_format="pyarrow", zero_copy_batch=True)
            return ds
        ds = ds.map_batches(
            functools.partial(_project, cols=keep_cols),
            batch_format="pyarrow", zero_copy_batch=True)
        # Coalesce before the global sort: a sort shuffle creates
        # #map_tasks × #reduce_partitions objects — with many small blocks
        # the scheduling latency of that task² fan-out dominates the sort
        # by 10×. Target ~num_cpus partitions locally; at real scale
        # choose partitions ≈ total_bytes / 256 MB instead.
        ds = ds.repartition(_sort_partitions())
        ds = ds.sort(["conv_id", "turn_idx"])
        if inline:
            from dataquality_ray.stages.dedup import \
                assign_dup_from_aggregators
            ds = ds.map_batches(
                functools.partial(assign_dup_from_aggregators,
                                  handles=agg_handles),
                batch_format="pyarrow", zero_copy_batch=True)
            ds = ds.map_batches(
                functools.partial(_project,
                                  cols=RESULT_COLUMNS + extra),
                batch_format="pyarrow", zero_copy_batch=True)
    return ds


def bucketed_sort(ds, num_buckets: Optional[int] = None):
    """Deterministic bucketed ordered exchange over any dataset carrying
    (conv_id, turn_idx): append conv_bucket = md5(conv_id) % K, coalesce,
    then ONE range exchange with EXPLICIT boundaries on the int bucket
    key — the sort's quantile-sampling pass (a serial barrier over every
    block's key column) disappears, partition i = bucket i
    deterministically (resumable layout, no data statistics), and the
    secondary keys give (conv_id, turn_idx) order within each partition:
    a total order on (conv_bucket, conv_id, turn_idx) with every
    conversation intact inside one partition. At 100 TB pick K ≈
    total_bytes / 256 MB."""
    nb = num_buckets or _sort_partitions()
    ds = ds.map_batches(
        functools.partial(_append_conv_bucket, num_buckets=nb),
        batch_format="pyarrow", zero_copy_batch=True)
    # coalesce before the exchange — a sort shuffle creates #map ×
    # #reduce objects; many small blocks turn that into pure
    # scheduling latency (see the global path note below)
    ds = ds.repartition(nb)
    return ds.sort(["conv_bucket", "conv_id", "turn_idx"],
                   boundaries=list(range(1, nb)))


def conv_bucket_of(conv_ids, num_buckets: int) -> "pa.Array":
    """Deterministic conv_id → bucket: md5(conv_id)[:4] % K, vectorized
    over the batch's (few) unique conversations via dictionary encoding.
    Pure function of (conv_id, K) — the partition layout is reproducible
    across runs, which is what makes the bucketed output resumable."""
    import hashlib
    import numpy as np
    if isinstance(conv_ids, pa.ChunkedArray):
        conv_ids = conv_ids.combine_chunks()
    enc = conv_ids.dictionary_encode()
    md5 = hashlib.md5
    lut = np.fromiter(
        (int.from_bytes(md5(u.encode("utf-8")).digest()[:4], "little")
         % num_buckets
         for u in enc.dictionary.to_pylist()),
        dtype=np.int32, count=len(enc.dictionary))
    idx = enc.indices.to_numpy(zero_copy_only=False)
    return pa.array(lut[idx], pa.int32())


def _append_conv_bucket(batch: pa.Table, num_buckets: int) -> pa.Table:
    return batch.append_column(
        "conv_bucket", conv_bucket_of(batch["conv_id"], num_buckets))




def _sort_partitions() -> int:
    import ray
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(8, cpus)


def _project(batch: pa.Table, cols) -> pa.Table:
    return batch.select([c for c in cols if c in batch.column_names])


def quality_run(ds, work_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG,
                now: Optional[str] = None,
                concurrency: Optional[int] = None) -> str:
    """Checkpointed 3-phase execution of the quality pipeline (the
    shape bench.py and large runs use; byte-equivalent to
    ``quality_pipeline`` with dedup — tests assert it):

    1. score: scrub → heuristics → models → decision → hash, streamed to
       a parquet checkpoint (this is also the resume point, see run.py);
    2. dup map: narrow column-pruned read of the checkpoint
       (dedup_key/order_key only — no re-scrub) → broadcast map;
    3. finalize: read checkpoint, assign dup_of, project, coalesce,
       global (conv_id, turn_idx) sort, write final parquet.

    Returns the final output directory.
    """
    import os
    import shutil

    import ray

    from dataquality_ray.stages.dedup import (
        assign_dup_from_map,
        compute_dup_map_from_hashed,
    )

    scored_dir = os.path.join(work_dir, "scored")
    final_dir = os.path.join(work_dir, "final")
    for d in (scored_dir, final_dir):
        if os.path.isdir(d):
            shutil.rmtree(d)

    scored = quality_pipeline(ds, cfg=cfg, now=now, with_dedup=False,
                              sort_output=False, concurrency=concurrency)
    scored.write_parquet(scored_dir)

    narrow = ray.data.read_parquet(
        scored_dir,
        columns=["dedup_key", "order_key", "hash_bucket", "is_empty_norm"])
    dup_map = compute_dup_map_from_hashed(narrow, cfg)
    map_ref = ray.put(dup_map)

    final = ray.data.read_parquet(scored_dir)
    final = final.map_batches(
        functools.partial(assign_dup_from_map, map_ref=map_ref),
        batch_format="pyarrow", zero_copy_batch=True)
    final = final.map_batches(
        functools.partial(_project, cols=RESULT_COLUMNS),
        batch_format="pyarrow", zero_copy_batch=True)
    final = final.repartition(_sort_partitions())
    final = final.sort(["conv_id", "turn_idx"])
    final.write_parquet(final_dir)
    return final_dir


def transcript_near_dup_pairs(ds, cfg: PipelineConfig = DEFAULT_CONFIG,
                              concurrency: Optional[int] = None,
                              strategy: str = "carry"):
    """Side output: (key_a, key_b, jaccard) near-dup pairs over scrubbed
    transcript text (reference analog: similarity_pairs,
    metadata.py:592-597, computed there as an O(n²) loop).

    ``strategy``: "carry" ships token sets inside the band rows (simple;
    volume × lsh_bands); "join" ships slim band rows and attaches token
    sets via two hash joins (the 100 TB path — corpus payload moves 2×
    instead of 32×). Both produce identical pairs (tested).
    """
    from dataquality_ray.stages.dedup import near_dup_pairs_join
    ds = ds.map_batches(functools.partial(scrub_batch, with_counts=False),
                        batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(content_hash_batch, batch_format="pyarrow")
    ds = ds.map_batches(
        MinHashSimHash,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=(1, concurrency or cfg.actor_pool_size))
    if strategy == "join":
        return near_dup_pairs_join(ds.materialize(), cfg)
    return near_dup_pairs(ds, cfg)


def run_summary(results_ds):
    """Run-level metrics (reference analog: consolidated run summary,
    metadata.py:639-646 + dashboard aggregates, routes.py:441-574)."""
    from ray.data.aggregate import Count, Mean
    return (results_ds
            .groupby("action")
            .aggregate(Count(alias_name="n"),
                       Mean("overall_quality_score", alias_name="avg_quality")))
