#!/usr/bin/env python
"""Resumable run driver for the transcript quality pipeline.

Two phases (SURVEY §7.1 steps 6-7):

1. **Per-partition scoring** (resumable): the input file list is split into
   deterministic partitions; each partition runs
   scrub → heuristics → model actors → decision → content-hash and is
   written atomically with a lineage manifest. On restart, committed
   partitions are skipped (reference analog: per-file incremental JSON +
   reconstruction scan, metadata.py:454-464, 868-944).
2. **Global dedup + final ordered write**: reads all partition outputs,
   runs the exact-dedup shuffle, sorts by (conv_id, turn_idx) and writes
   the final results + run manifest. Phase 2 is cheap relative to phase 1
   (no model scoring) and re-runs end-to-end on resume.

Usage:
    python run.py --input /path/transcripts --output /tmp/out \
                  [--partitions 16] [--num-cpus N] [--fail-after K]

``--fail-after K`` injects a crash after K committed partitions (used by
the resume test).
"""

from __future__ import annotations

import argparse
import os

os.environ.setdefault("POLARS_MAX_THREADS", "1")
# silence the core-worker "constructor arguments in the object store"
# advisory (ray#53727) that every actor-pool map emits — pure log
# noise in bench/driver tails
os.environ.setdefault("RAY_BACKEND_LOG_LEVEL", "FATAL")  # see bench.py

import time

import numpy as np
import ray

from dataquality_ray.config import DEFAULT_CONFIG, PipelineConfig
from dataquality_ray.pipelines.quality import default_pool_size, quality_pipeline
from dataquality_ray.sources.transcripts import list_transcript_files
from dataquality_ray.state import manifest as mf


def run_partitioned(input_path: str, out_dir: str, partitions: int = 16,
                    cfg: PipelineConfig = DEFAULT_CONFIG,
                    fail_after: int | None = None) -> dict:
    """Execute both phases; returns the run manifest payload."""
    files = list_transcript_files(input_path)
    if not files:
        raise FileNotFoundError(f"no parquet files under {input_path}")
    # persist/validate the plan identity: resuming with a different
    # --partitions or a changed input set is refused, not silently mixed
    mf.ensure_run_plan(out_dir, files, partitions)
    plan = mf.plan_partitions(files, partitions)
    done = mf.committed_partitions(out_dir)

    n_committed_this_run = 0
    for pid, pfiles in sorted(plan.items()):
        if pid in done:
            continue  # resume: skip committed work
        started = time.time()
        tmp = mf.begin_partition(out_dir, pid)
        ds = ray.data.read_parquet(pfiles)
        # phase-1 stages only: no dedup (global), no sort (global)
        # fixed pool sized to the cluster (the measured sweet spot —
        # see default_pool_size); the autoscaling default ramps too
        # slowly for per-partition jobs
        pool = default_pool_size(
            int(ray.cluster_resources().get("CPU", 4)))
        scored = quality_pipeline(ds, cfg=cfg, with_dedup=False,
                                  sort_output=False, concurrency=pool)
        scored = scored.drop_columns(["dup_of"])  # phase 2 recomputes it
        scored.write_parquet(tmp)
        # partition stats without pulling the column to the driver:
        # row count from parquet footers only; kept via a tiny
        # distributed partial-sum map (driver sees O(#blocks) ints)
        import pyarrow as pa
        import pyarrow.dataset as pads
        rows = pads.dataset(tmp).count_rows()
        kept = sum(
            int(p["kept"]) for p in ray.data.read_parquet(
                tmp, columns=["keep"])
            .map_batches(
                lambda t: pa.table({"kept": pa.array(
                    [int(t["keep"].to_numpy(
                        zero_copy_only=False).sum())], pa.int64())}),
                batch_format="pyarrow", zero_copy_batch=True)
            .take_all())
        mf.commit_partition(out_dir, pid, pfiles, int(rows), int(kept),
                            metrics={"phase": 1}, started_at=started)
        n_committed_this_run += 1
        if fail_after is not None and n_committed_this_run >= fail_after:
            raise RuntimeError(
                f"injected failure after {fail_after} partitions")

    # ---- phase 2: global dedup + stable ordered final output ----
    # The phase-1 checkpoint already carries dedup_key/order_key/
    # hash_bucket/is_empty_norm, so dedup needs only a NARROW
    # column-pruned pass (two short strings + an int + a bool per row)
    # to build the duplicate map, then a broadcast assign — instead of
    # the full-row exact_dedup groupby shuffle (the quality_run shape,
    # pipelines/quality.py). Full rows move exactly once: in the sort.
    import functools

    from dataquality_ray.pipelines.quality import (
        _sort_partitions,
        bucketed_sort,
    )
    from dataquality_ray.stages.dedup import (
        assign_dup_from_map,
        compute_dup_map_from_hashed,
    )

    started = time.time()
    part_root = os.path.join(out_dir, "partitions")
    narrow = ray.data.read_parquet(
        part_root,
        columns=["dedup_key", "order_key", "hash_bucket", "is_empty_norm"])
    dup_map = compute_dup_map_from_hashed(narrow, cfg)
    map_ref = ray.put(dup_map)
    scored = ray.data.read_parquet(part_root)
    final = scored.map_batches(
        functools.partial(assign_dup_from_map, map_ref=map_ref),
        batch_format="pyarrow", zero_copy_batch=True)
    # deterministic bucketed ordered exchange (no sampling pass; output
    # partition i = conv bucket i, (conv_id, turn_idx)-sorted within).
    # K is recorded in the run manifest: incremental patches must hash
    # conversations into the SAME bucket space on any later cluster.
    sort_buckets = _sort_partitions()
    final = bucketed_sort(final, num_buckets=sort_buckets)
    final_dir = os.path.join(out_dir, "final")
    tmp_final = final_dir + ".tmp"
    if os.path.isdir(tmp_final):
        import shutil
        shutil.rmtree(tmp_final)
    final.write_parquet(tmp_final)
    if os.path.isdir(final_dir):
        import shutil
        shutil.rmtree(final_dir)
    os.rename(tmp_final, final_dir)

    # Run stats WITHOUT an O(rows) driver read: rows/kept come from the
    # committed per-partition manifests (phase 2 only appends dup_of —
    # keep is untouched); duplicates/avg-quality from a tiny distributed
    # aggregate whose driver volume is O(#blocks), not O(rows).
    committed = mf.committed_partitions(out_dir)
    total_rows = sum(int(m["row_count"]) for m in committed.values())
    kept = sum(int(m["kept"]) for m in committed.values())

    import pyarrow as pa

    def _part_stats(t: "pa.Table") -> "pa.Table":
        q = t["overall_quality_score"].to_numpy(zero_copy_only=False)
        return pa.table({
            "rows": pa.array([t.num_rows], pa.int64()),
            "dups": pa.array(
                [t.num_rows - t["dup_of"].null_count], pa.int64()),
            "q_sum": pa.array([int(q.astype(np.int64).sum())],
                              pa.int64()),
        })

    partials = ray.data.read_parquet(
        final_dir, columns=["overall_quality_score", "dup_of"]) \
        .map_batches(_part_stats, batch_format="pyarrow",
                     zero_copy_batch=True).take_all()
    final_rows = sum(int(p["rows"]) for p in partials)
    dups = sum(int(p["dups"]) for p in partials)
    q_sum = sum(int(p["q_sum"]) for p in partials)
    assert final_rows == total_rows, (
        f"manifest rows {total_rows} != final output rows {final_rows}")
    payload = {
        "input": input_path,
        "partitions": len(plan),
        "sort_buckets": sort_buckets,
        "total_rows": total_rows,
        "kept": kept,
        "duplicates": dups,
        "avg_quality": (q_sum / total_rows) if total_rows else 0.0,
        "phase2_sec": time.time() - started,
        "committed_at": time.time(),
    }
    mf.write_run_manifest(out_dir, payload)
    return payload


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=False)
    ap.add_argument("--output", required=True)
    ap.add_argument("--partitions", type=int, default=16)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--fail-after", type=int, default=None)
    ap.add_argument("--patch-edits", default=None,
                    help="parquet of edited conversations: re-score "
                         "only those, patch only the affected conv "
                         "buckets of an existing --output run "
                         "(pipelines/incremental.py)")
    args = ap.parse_args()

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False
    try:
        if args.patch_edits:
            from dataquality_ray.pipelines.incremental import \
                incremental_update
            payload = incremental_update(args.output, args.patch_edits)
        else:
            if not args.input:
                ap.error("--input is required unless --patch-edits")
            payload = run_partitioned(args.input, args.output,
                                      partitions=args.partitions,
                                      fail_after=args.fail_after)
        print(payload)
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
