"""Incremental recompute-after-edit over a committed run.

Reference parity: M16/T3 — the reference re-analyzes ONE edited
document and patches its stored result without reprocessing the corpus
(/root/reference/backend/app/api/routes.py:718-1054 re-analyze loop;
per-file incremental JSON, metadata.py:454-464). This module is the
corpus-scale analog over run.py's committed output: conversations are
the edit unit, and the deterministic bucketed layout (output partition
i = md5(conv_id) % K — pipelines/quality.bucketed_sort) is what makes a
targeted patch possible at all.

``incremental_update(out_dir, edits_path)`` re-scores ONLY the edited
conversations with the model actors, recomputes duplicate assignments
ONLY for content-hash groups whose membership changed, and commits an
LSM-style patch layer superseding ONLY the conv buckets that contain
affected conversations. ``read_current(out_dir)`` composes the base
``final/`` output with the patch layers (later layers win per bucket).

Cost model at 100 TB:
- model scoring: O(|edits|) — the expensive stage never touches the
  unedited corpus;
- two NARROW passes over the composed corpus (conv_id, dedup_key,
  order_key, is_empty_norm, conv_bucket — a few short strings per row):
  the irreducible global work, because exact dedup is a corpus-wide
  property (an edit can change the canonical copy of a hash group whose
  members live anywhere);
- full-row I/O: only the affected buckets, found via parquet file
  pruning on the ``conv_bucket`` column (partition i holds exactly
  bucket i, so untouched buckets are never opened).

Correctness of the dup patch: a hash group's membership changes only if
some member's key changed, and only edited rows change keys — so
``affected_keys`` = old keys of edited conversations ∪ new keys of the
edits covers every group whose canonical/dup_of can differ; rows
outside those groups keep their stored dup_of verbatim. (Empty-norm
rows have per-row unique keys — stages/dedup.content_hash_batch — and
never interact.) The resulting composed state is BIT-IDENTICAL to a
full re-run on the edited corpus (pinned by tests/test_incremental.py).

Semantics: an edit file REPLACES every conversation it mentions, whole
(and may introduce new conversations). Deleting a conversation is out
of scope — express it upstream as an input change + fresh run.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from dataquality_ray.config import DEFAULT_CONFIG, PipelineConfig


def _patch_manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "patch_manifests")


def patch_manifests(out_dir: str) -> list:
    """Committed patch layers, oldest first."""
    d = _patch_manifest_dir(out_dir)
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        if not name.endswith(".json"):
            continue
        try:
            with open(os.path.join(d, name)) as f:
                m = json.load(f)
        except (json.JSONDecodeError, OSError):
            continue          # torn write → uncommitted
        if m.get("status") == "committed":
            out.append(m)
    return out


def read_current(out_dir: str, columns: Optional[list] = None):
    """The composed current state: base ``final/`` plus patch layers,
    where a bucket claimed by a later layer shadows every earlier
    layer. Bucket exclusion pushes down to parquet file pruning (each
    base partition file holds exactly one conv_bucket)."""
    import ray

    layers = [os.path.join(out_dir, "final")]
    claims = [None]           # buckets this layer OWNS (None = rest)
    for m in patch_manifests(out_dir):
        layers.append(os.path.join(out_dir, "patches", m["patch_id"]))
        claims.append(set(int(b) for b in m["buckets"]))

    parts = []
    for i, path in enumerate(layers):
        shadowed = set()
        for later in claims[i + 1:]:
            shadowed |= later
        if shadowed:
            expr = ~pc.field("conv_bucket").isin(
                pa.array(sorted(shadowed), pa.int32()))
            parts.append(ray.data.read_parquet(
                path, columns=columns, filter=expr))
        else:
            parts.append(ray.data.read_parquet(path, columns=columns))
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


_NARROW = ["conv_id", "dedup_key", "order_key", "is_empty_norm",
           "conv_bucket"]


def incremental_update(out_dir: str, edits_path: str,
                       cfg: PipelineConfig = DEFAULT_CONFIG) -> dict:
    """Apply a conversation-level edit set to a committed run. Returns
    the patch manifest payload. Crash-safe: the patch directory is
    renamed into place before its manifest is written, and an absent
    manifest means the patch is invisible to ``read_current``."""
    import ray

    from dataquality_ray.pipelines.quality import (
        conv_bucket_of,
        default_pool_size,
        quality_pipeline,
    )
    with open(os.path.join(out_dir, "run_manifest.json")) as f:
        run_m = json.load(f)
    nb = int(run_m["sort_buckets"])

    # ---- 1. model-score ONLY the edits (the O(|edits|) stage) ----
    edits = ray.data.read_parquet(edits_path)
    pool = default_pool_size(int(ray.cluster_resources().get("CPU", 4)))
    escored = quality_pipeline(edits, cfg=cfg, with_dedup=False,
                               sort_output=False, concurrency=pool)
    if "dup_of" in escored.schema().names:
        escored = escored.drop_columns(["dup_of"])
    escored = escored.materialize()       # small by contract

    e_convs = sorted(set(escored.unique("conv_id")))
    e_arr = pa.array(e_convs, pa.string())
    e_buckets = conv_bucket_of(e_arr, nb).to_pylist()

    def _slim(t: pa.Table, cols) -> pa.Table:
        return t.select(cols)

    new_keys = set()
    for r in (escored.map_batches(
            lambda t: _slim(t.filter(pc.invert(
                t["is_empty_norm"].combine_chunks()
                if isinstance(t["is_empty_norm"], pa.ChunkedArray)
                else t["is_empty_norm"])), ["dedup_key"]),
            batch_format="pyarrow").take_all()):
        new_keys.add(r["dedup_key"])

    # ---- 2. narrow pass A: old keys of the edited conversations ----
    cur_narrow = read_current(out_dir, columns=_NARROW)

    def _old_keys(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_in(t["conv_id"], value_set=e_arr),
                    pc.invert(t["is_empty_norm"].combine_chunks()
                              if isinstance(t["is_empty_norm"],
                                            pa.ChunkedArray)
                              else t["is_empty_norm"]))
        return _slim(t.filter(m), ["dedup_key"])

    old_keys = {r["dedup_key"] for r in cur_narrow.map_batches(
        _old_keys, batch_format="pyarrow").take_all()}
    affected_keys = sorted(old_keys | new_keys)
    k_arr = pa.array(affected_keys, pa.string())

    # ---- 3. narrow pass B: members of affected hash groups in the
    # NEW corpus (current minus edited convs), plus collateral convs —
    # driver volume is bounded by the edit set's duplicate fanout,
    # strictly smaller than the run's own corpus-wide dup map ----
    def _members(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_in(t["dedup_key"], value_set=k_arr),
                    pc.invert(pc.is_in(t["conv_id"], value_set=e_arr)))
        return _slim(t.filter(m),
                     ["conv_id", "dedup_key", "order_key",
                      "conv_bucket"])

    member_rows = cur_narrow.map_batches(
        _members, batch_format="pyarrow").take_all()
    e_member_rows = escored.map_batches(
        lambda t: _slim(t.filter(pc.invert(
            t["is_empty_norm"].combine_chunks()
            if isinstance(t["is_empty_norm"], pa.ChunkedArray)
            else t["is_empty_norm"])), ["dedup_key", "order_key"]),
        batch_format="pyarrow").take_all()

    groups: dict = {}
    for r in member_rows:
        g = groups.setdefault(r["dedup_key"], [0, None])
        g[0] += 1
        g[1] = r["order_key"] if g[1] is None \
            else min(g[1], r["order_key"])
    for r in e_member_rows:
        g = groups.setdefault(r["dedup_key"], [0, None])
        g[0] += 1
        g[1] = r["order_key"] if g[1] is None \
            else min(g[1], r["order_key"])
    patch_map = {k: v[1] for k, v in groups.items() if v[0] >= 2}

    buckets = set(e_buckets)
    for r in member_rows:
        buckets.add(int(r["conv_bucket"]))
    buckets = sorted(buckets)
    b_arr = pa.array(buckets, pa.int32())

    # ---- 4. rebuild ONLY the affected buckets ----
    cols = [c for c in read_current(out_dir).schema().names]

    keep_cur = read_current(out_dir).map_batches(
        lambda t: t.filter(pc.and_(
            pc.is_in(t["conv_bucket"], value_set=b_arr),
            pc.invert(pc.is_in(t["conv_id"], value_set=e_arr)))),
        batch_format="pyarrow", zero_copy_batch=True)

    def _finish_edits(t: pa.Table) -> pa.Table:
        t = t.append_column("conv_bucket",
                            conv_bucket_of(t["conv_id"], nb))
        t = t.append_column("dup_of",
                            pa.array([None] * t.num_rows, pa.string()))
        return t.select(cols)

    eb = escored.map_batches(_finish_edits, batch_format="pyarrow")

    map_ref = ray.put((set(affected_keys), patch_map))

    def _reassign(t: pa.Table) -> pa.Table:
        aff, m = ray.get(map_ref)
        keys = t["dedup_key"].to_pylist()
        own = t["order_key"].to_pylist()
        dup = t["dup_of"].to_pylist()
        for i, k in enumerate(keys):
            if k in aff:
                c = m.get(k)
                dup[i] = c if (c is not None and c != own[i]) else None
        t = t.drop_columns(["dup_of"])
        return t.append_column("dup_of", pa.array(dup, pa.string())) \
                .select(cols)

    patched = keep_cur.union(eb).map_batches(
        _reassign, batch_format="pyarrow") \
        .sort(["conv_bucket", "conv_id", "turn_idx"])

    # ---- 5. atomic commit ----
    patch_id = f"patch-{len(patch_manifests(out_dir)):04d}"
    pdir = os.path.join(out_dir, "patches", patch_id)
    tmp = pdir + ".tmp"
    if os.path.isdir(tmp):
        import shutil
        shutil.rmtree(tmp)
    os.makedirs(os.path.dirname(pdir), exist_ok=True)
    patched.write_parquet(tmp)
    import pyarrow.dataset as pads
    rows = pads.dataset(tmp).count_rows()
    if os.path.isdir(pdir):
        import shutil
        shutil.rmtree(pdir)
    os.rename(tmp, pdir)

    payload = {
        "patch_id": patch_id,
        "edits_path": edits_path,
        "edited_convs": len(e_convs),
        "buckets": buckets,
        "affected_keys": len(affected_keys),
        "rows": int(rows),
        "status": "committed",
    }
    os.makedirs(_patch_manifest_dir(out_dir), exist_ok=True)
    mpath = os.path.join(_patch_manifest_dir(out_dir),
                         f"{patch_id}.json")
    tmp_m = mpath + ".tmp"
    with open(tmp_m, "w") as f:
        json.dump(payload, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp_m, mpath)
    return payload
