"""Flexible date parsing (reference M7: metadata.py:116-149).

The reference parses document dates leniently: ISO-8601 (with a trailing
``Z`` mapped to UTC) plus a list of US-style strptime formats, returning
None on failure instead of raising. Re-expressed here as a pure function
used by fixture generation and available as a batch kernel for any
string-date column.
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import List, Optional

# Lenient fallback formats, tried in order (reference analog: the
# strptime cascade at metadata.py:128-148).
_FORMATS = [
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%d",
    "%m/%d/%Y %H:%M:%S",
    "%m/%d/%Y",
    "%m-%d-%Y",
    "%d %b %Y",
    "%b %d, %Y",
    "%B %d, %Y",
]


def parse_flexible_date(value: Optional[str]) -> Optional[datetime]:
    """ISO-8601 first (``Z`` → +00:00), then the format cascade; None on
    failure (never raises)."""
    if not value or not isinstance(value, str):
        return None
    s = value.strip()
    if not s:
        return None
    iso = s[:-1] + "+00:00" if s.endswith("Z") else s
    try:
        return datetime.fromisoformat(iso)
    except ValueError:
        pass
    for fmt in _FORMATS:
        try:
            return datetime.strptime(s, fmt)
        except ValueError:
            continue
    return None


def parse_dates_batch(values: List[Optional[str]]) -> List[Optional[datetime]]:
    return [parse_flexible_date(v) for v in values]


def to_utc_naive(dt: Optional[datetime]) -> Optional[datetime]:
    """Normalize to UTC-naive (Arrow/DuckDB convention)."""
    if dt is None:
        return None
    if dt.tzinfo is not None:
        return dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt
