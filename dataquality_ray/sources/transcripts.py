"""Transcript Parquet source/sink helpers.

Reference analogs: S3 listing/read (s3.py:130-167,188-251) → Ray Data's
parquet reader with column pruning; per-file JSON sink (metadata.py:453-464)
→ partitioned Parquet + manifests (see state/manifest.py).
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def list_transcript_files(path: str) -> List[str]:
    """Deterministic sorted listing of parquet files under a path."""
    if os.path.isfile(path):
        return [path]
    return sorted(glob.glob(os.path.join(path, "**", "*.parquet"),
                            recursive=True))


def read_transcripts(path, columns: Optional[List[str]] = None,
                     override_num_blocks: Optional[int] = None):
    """read_parquet with column pruning (only ship what the pipeline uses)."""
    import ray.data
    kwargs = {}
    if override_num_blocks:
        kwargs["override_num_blocks"] = override_num_blocks
    return ray.data.read_parquet(path, columns=columns or TRANSCRIPT_COLUMNS,
                                 **kwargs)
