"""Per-partition lineage manifests + atomic partition commits.

Reference analog: the reference writes one JSON per processed file next to
the source as an incremental checkpoint (metadata.py:454-464) and recovers
a lost consolidated result by re-scanning those files
(reconstruct_results, metadata.py:868-944). Our re-expression for a
partitioned batch engine:

- each output partition is written to ``<out>/partitions/<pid>.tmp/`` and
  atomically renamed to ``<pid>/`` on success;
- a manifest JSON ``<out>/manifests/<pid>.json`` is then written (tmp +
  fsync + rename) recording inputs, row counts and metrics;
- resume = read manifests, skip partitions already committed, re-run the
  rest (an uncommitted partial tmp dir is deleted and re-processed —
  idempotent because every stage is a pure function of the input).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any, Dict, List, Optional


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "manifests")


def partition_dir(out_dir: str, partition_id: str) -> str:
    return os.path.join(out_dir, "partitions", partition_id)


def manifest_path(out_dir: str, partition_id: str) -> str:
    return os.path.join(_manifest_dir(out_dir), f"{partition_id}.json")


def committed_partitions(out_dir: str) -> Dict[str, Dict[str, Any]]:
    """partition_id → manifest for every committed partition."""
    mdir = _manifest_dir(out_dir)
    out: Dict[str, Dict[str, Any]] = {}
    if not os.path.isdir(mdir):
        return out
    for name in sorted(os.listdir(mdir)):
        if not name.endswith(".json"):
            continue
        try:
            with open(os.path.join(mdir, name)) as f:
                m = json.load(f)
        except (json.JSONDecodeError, OSError):
            continue  # torn write → treated as uncommitted
        if m.get("status") == "committed":
            out[m["partition_id"]] = m
    return out


def begin_partition(out_dir: str, partition_id: str) -> str:
    """Returns a clean tmp dir to write the partition into."""
    tmp = partition_dir(out_dir, partition_id) + ".tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)  # leftover from a crashed attempt
    os.makedirs(tmp, exist_ok=True)
    return tmp


def commit_partition(out_dir: str, partition_id: str,
                     input_files: List[str],
                     row_count: int, kept: int,
                     metrics: Optional[Dict[str, Any]] = None,
                     started_at: Optional[float] = None) -> None:
    """Atomic rename of the tmp dir + fsync'd manifest write."""
    tmp = partition_dir(out_dir, partition_id) + ".tmp"
    final = partition_dir(out_dir, partition_id)
    if os.path.isdir(final):
        shutil.rmtree(final)
    os.rename(tmp, final)

    os.makedirs(_manifest_dir(out_dir), exist_ok=True)
    manifest = {
        "partition_id": partition_id,
        "input_files": input_files,
        "row_count": row_count,
        "kept": kept,
        "dropped": row_count - kept,
        "metrics": metrics or {},
        "status": "committed",
        "started_at": started_at,
        "committed_at": time.time(),
    }
    mpath = manifest_path(out_dir, partition_id)
    tmp_m = mpath + ".tmp"
    with open(tmp_m, "w") as f:
        json.dump(manifest, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp_m, mpath)


def write_run_manifest(out_dir: str, payload: Dict[str, Any]) -> None:
    """Run-level summary (reference analog: consolidated run JSON,
    metadata.py:639-673)."""
    path = os.path.join(out_dir, "run_manifest.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)


def plan_fingerprint(input_files: List[str], num_partitions: int) -> str:
    """Stable hash of (sorted input set + per-file sizes, partition
    count) — the identity of a partition plan. File sizes are folded in
    so a resume after an input file was REWRITTEN IN PLACE (same name,
    different rows) is refused instead of silently mixing stale
    committed partitions with new data; size comes from the filesystem
    when the path is readable (local or any pyarrow.fs URI) and falls
    back to 0 for schemes we cannot stat."""
    import hashlib
    h = hashlib.sha256()
    h.update(str(int(num_partitions)).encode())
    for f in sorted(input_files):
        h.update(b"\x00" + f.encode())
        h.update(b"\x01" + str(_file_size(f)).encode())
    return h.hexdigest()


def _file_size(path: str) -> int:
    try:
        if "://" in path:
            from pyarrow import fs as pafs
            fsys, rel = pafs.FileSystem.from_uri(path)
            info = fsys.get_file_info(rel)
            return int(info.size or 0)
        return int(os.path.getsize(path))
    except Exception:
        return 0


def ensure_run_plan(out_dir: str, input_files: List[str],
                    num_partitions: int) -> None:
    """Persist the partition plan identity on first run; on resume REFUSE
    to proceed if the input set or --partitions changed — a silently
    re-derived plan would mix stale committed partitions with a new
    layout, duplicating or dropping rows in the final output."""
    path = os.path.join(out_dir, "plan.json")
    fp = plan_fingerprint(input_files, num_partitions)
    if os.path.exists(path):
        with open(path) as f:
            saved = json.load(f)
        if saved.get("fingerprint") != fp:
            raise RuntimeError(
                f"resume plan mismatch for {out_dir}: committed output was "
                f"planned as {saved.get('num_partitions')} partitions over "
                f"{saved.get('n_files')} input files "
                f"(fingerprint {str(saved.get('fingerprint'))[:12]}…), but "
                f"this invocation asks for {num_partitions} partitions over "
                f"{len(input_files)} files. Re-run with the original "
                "--input/--partitions, or use a fresh --output.")
        return
    os.makedirs(out_dir, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"fingerprint": fp,
                   "num_partitions": int(num_partitions),
                   "n_files": len(input_files),
                   "input_files": sorted(input_files),
                   "created_at": time.time()}, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)


def plan_partitions(input_files: List[str], num_partitions: int
                    ) -> Dict[str, List[str]]:
    """Deterministic partition plan: sorted input files round-robin'd into
    ``num_partitions`` groups → {partition_id: [files]}."""
    files = sorted(input_files)
    n = max(1, min(num_partitions, len(files)))
    plan: Dict[str, List[str]] = {f"part-{i:05d}": [] for i in range(n)}
    for i, f in enumerate(files):
        plan[f"part-{i % n:05d}"].append(f)
    return plan
