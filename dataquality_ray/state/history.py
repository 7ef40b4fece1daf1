"""Run-history reader (reference S9/A4: metadata.py:716-781, 986-998).

The reference reconstructs dashboards by globbing its saved result JSONs;
our analog scans run output directories for ``run_manifest.json`` +
per-partition manifests and yields summary tables.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, List

import pyarrow as pa


def list_runs(root: str) -> List[str]:
    """Run output dirs under ``root`` (anything with a run_manifest.json),
    newest first by committed_at (reference analog: sort desc + limit,
    metadata.py:744-746)."""
    runs = []
    for path in glob.glob(os.path.join(root, "*", "run_manifest.json")):
        try:
            with open(path) as f:
                m = json.load(f)
        except (json.JSONDecodeError, OSError):
            continue
        runs.append((m.get("committed_at", 0), os.path.dirname(path)))
    return [d for _, d in sorted(runs, reverse=True)]


def run_history(root: str, limit: int = 50) -> pa.Table:
    """One row per run: totals from the run manifest."""
    rows: Dict[str, list] = {k: [] for k in (
        "run_dir", "input", "total_rows", "kept", "duplicates",
        "avg_quality", "committed_at")}
    for run_dir in list_runs(root)[:limit]:
        with open(os.path.join(run_dir, "run_manifest.json")) as f:
            m = json.load(f)
        rows["run_dir"].append(run_dir)
        rows["input"].append(str(m.get("input", "")))
        rows["total_rows"].append(int(m.get("total_rows", 0)))
        rows["kept"].append(int(m.get("kept", 0)))
        rows["duplicates"].append(int(m.get("duplicates", 0)))
        rows["avg_quality"].append(float(m.get("avg_quality", 0.0)))
        rows["committed_at"].append(float(m.get("committed_at", 0.0)))
    return pa.table({
        "run_dir": pa.array(rows["run_dir"], pa.string()),
        "input": pa.array(rows["input"], pa.string()),
        "total_rows": pa.array(rows["total_rows"], pa.int64()),
        "kept": pa.array(rows["kept"], pa.int64()),
        "duplicates": pa.array(rows["duplicates"], pa.int64()),
        "avg_quality": pa.array(rows["avg_quality"], pa.float64()),
        "committed_at": pa.array(rows["committed_at"], pa.float64()),
    })


def history_stats(root: str) -> Dict[str, float]:
    """A4 analog: totals across the recorded runs."""
    tab = run_history(root)
    n = tab.num_rows
    total = sum(tab["total_rows"].to_pylist())
    kept = sum(tab["kept"].to_pylist())
    return {
        "runs": n,
        "total_rows": total,
        "kept": kept,
        "keep_rate": (kept / total) if total else 0.0,
    }
