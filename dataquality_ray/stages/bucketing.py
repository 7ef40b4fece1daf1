"""Bucketed-local aggregation helpers (the CLAUDE.md invariant).

Ray's sort-based ``groupby().aggregate()/map_groups`` costs ~30 s per
1.4M OUTPUT groups on this class of node regardless of key type
(PERF_NOTES.md), so any operator whose natural key cardinality scales
with corpus rows must instead shuffle ONCE on ``hash(key) % K`` (K
sized to the cluster) and complete the fine-grained work LOCALLY per
bucket with one vectorized kernel — every key lives in exactly one
bucket, so per-key results are exact.

These helpers centralize the two pieces every such operator needs:
a deterministic cross-process bucket hash for int64 keys and a
cluster-sized bucket count.
"""
from __future__ import annotations

import numpy as np

_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def splitmix_bucket(ids: np.ndarray, num_buckets: int) -> np.ndarray:
    """Deterministic bucket of an int64/uint64 id array via the
    splitmix64 finalizer (wraparound uint64 arithmetic — identical in
    every worker process, unlike Python's salted ``hash``). Returns
    int32 buckets in [0, num_buckets)."""
    x = np.ascontiguousarray(ids).astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= _SM_M1
    x ^= x >> np.uint64(27)
    x *= _SM_M2
    x ^= x >> np.uint64(31)
    return (x % np.uint64(num_buckets)).astype(np.int32)


def cluster_buckets(minimum: int = 16, per_cpu: int = 2,
                    cap: int = 1024) -> int:
    """Shuffle width sized to the cluster: 2× CPUs (so the reduce side
    keeps every core busy even with stragglers), floored at ``minimum``
    for determinism-friendly small runs, capped so a huge cluster does
    not explode tiny queries into thousands of buckets."""
    import ray
    try:
        cpus = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        cpus = 0
    if cpus <= 0:
        return minimum
    return max(minimum, min(cap, per_cpu * cpus))
