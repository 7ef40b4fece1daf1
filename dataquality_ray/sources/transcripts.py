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


def _delete1_set(s: str) -> set:
    """{s} ∪ single-character deletions — the SymSpell d=1 block key
    set (same blocking as pipelines/conversations.fuzzy_term_matches:
    two strings within edit distance 1 of a common form always share
    an entry)."""
    return {s} | {s[:i] + s[i + 1:] for i in range(len(s))}


def path_suggestions(missing_name: str, candidates, limit: int = 5
                     ) -> List[str]:
    """'Did you mean' candidates for a missing path component: exact
    case/whitespace-insensitive matches plus names within one typo
    (shared delete-1 block). Reference analog: the fuzzy S3-key
    recovery + suggestion surface (s3.py:203-248)."""
    tgt = missing_name.strip().lower()
    tset = _delete1_set(tgt)
    out = []
    for c in candidates:
        cl = c.strip().lower()
        if cl == tgt or _delete1_set(cl) & tset:
            out.append(c)
    return sorted(out)[:limit]


def _raise_with_suggestions(path: str) -> None:
    parent = os.path.dirname(path.rstrip("/")) or "."
    sugg = []
    if os.path.isdir(parent):
        sugg = path_suggestions(os.path.basename(path.rstrip("/")),
                                os.listdir(parent))
    msg = f"Transcript path not found: {path}."
    if sugg:
        msg += " Did you mean: " + ", ".join(
            os.path.join(parent, s) for s in sugg) + "?"
    else:
        msg += " Parent directory is missing or has no close match."
    raise FileNotFoundError(msg)


def list_transcript_files(path: str) -> List[str]:
    """Deterministic sorted listing of parquet files under a path.

    Accepts plain local paths AND filesystem URIs ("file://", "s3://",
    …): URIs are resolved through ``pyarrow.fs.FileSystem.from_uri`` so
    partition planning works against any pyarrow-supported filesystem
    (reference analog: the S3 listing source, s3.py:130-167). Listed
    entries keep the original scheme prefix so ``ray.data.read_parquet``
    can consume them directly. A missing local path raises
    FileNotFoundError with delete-1 "Did you mean" suggestions from the
    parent listing (reference analog: s3.py:203-248).
    """
    if "://" in path:
        return _list_uri(path)
    if os.path.isfile(path):
        return [path]
    if not os.path.isdir(path):
        _raise_with_suggestions(path)
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
    if isinstance(path, str) and "://" not in path \
            and not os.path.exists(path):
        _raise_with_suggestions(path)
    kwargs = {}
    if override_num_blocks:
        kwargs["override_num_blocks"] = override_num_blocks
    return ray.data.read_parquet(path, columns=columns or TRANSCRIPT_COLUMNS,
                                 **kwargs)
