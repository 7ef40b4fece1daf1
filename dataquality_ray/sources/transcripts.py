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
    """Deterministic sorted listing of parquet files under a path.

    Accepts plain local paths AND filesystem URIs ("file://", "s3://",
    …): URIs are resolved through ``pyarrow.fs.FileSystem.from_uri`` so
    partition planning works against any pyarrow-supported filesystem
    (reference analog: the S3 listing source, s3.py:130-167). Listed
    entries keep the original scheme prefix so ``ray.data.read_parquet``
    can consume them directly.
    """
    if "://" in path:
        return _list_uri(path)
    if os.path.isfile(path):
        return [path]
    return sorted(glob.glob(os.path.join(path, "**", "*.parquet"),
                            recursive=True))


def _list_uri(uri: str) -> List[str]:
    from pyarrow import fs as pafs
    filesystem, fs_path = pafs.FileSystem.from_uri(uri)
    scheme = uri.split("://", 1)[0]
    # local URIs resolve to plain paths: ray.data.read_parquet rejects
    # the file:// scheme ("Expected a local filesystem path, got a URI")
    # while remote schemes (s3://, gcs://, ...) must stay prefixed
    prefix = "" if isinstance(filesystem, pafs.LocalFileSystem) \
        else f"{scheme}://"
    info = filesystem.get_file_info(fs_path)
    if info.type == pafs.FileType.File:
        return [prefix + fs_path if prefix == "" else uri]
    selector = pafs.FileSelector(fs_path, recursive=True,
                                 allow_not_found=True)
    out = [prefix + i.path
           for i in filesystem.get_file_info(selector)
           if i.type == pafs.FileType.File
           and i.path.endswith(".parquet")]
    return sorted(out)


def read_transcripts(path, columns: Optional[List[str]] = None,
                     override_num_blocks: Optional[int] = None):
    """read_parquet with column pruning (only ship what the pipeline uses)."""
    import ray.data
    kwargs = {}
    if override_num_blocks:
        kwargs["override_num_blocks"] = override_num_blocks
    return ray.data.read_parquet(path, columns=columns or TRANSCRIPT_COLUMNS,
                                 **kwargs)
