"""Date/time scalar helpers (SURVEY.md §2.7 X1-X3).

The reference stores dates as *days since epoch* in scores
(query-parser.yy:204-210) and epoch seconds in time-series offsets
(ca-load.cc:296-315).
"""

from __future__ import annotations

import calendar
import time
from datetime import datetime, timezone


def date_str_to_days(text: str) -> float:
    """X1: 'YYYY-MM-DD' -> days since epoch (timegm/86400)."""
    return calendar.timegm(time.strptime(text, "%Y-%m-%d")) / 86400.0


def day_to_date_minute(day: float) -> str:
    """CORRELATE range-bound rendering for timestamped keywords
    (correlate.cc:53-62 DayToDate): gmtime of day*86400, strftime
    ``'%Y-%m-%d %H:%M'``.  Distinct from X2's '%B %e, %Y' header
    format (days_to_date_string below)."""
    dt = datetime.fromtimestamp(day * 86400, tz=timezone.utc)
    return dt.strftime("%Y-%m-%d %H:%M")


def days_to_date_string(days: float) -> str:
    """X2: TimeToDateString (query.cc:158-169): days -> '%B %e, %Y' with
    the double-space collapse."""
    dt = datetime.fromtimestamp(days * 86400, tz=timezone.utc)
    out = dt.strftime("%B %e, %Y")
    return out.replace("  ", " ", 1) if "  " in out else out


def header_sort_key(index: int) -> str:
    """X8 (query.cc:923-927): threshold group index -> base-26 'AAAAA'
    sortable key."""
    out = []
    j = 26 ** 4
    while j > 0:
        out.append(chr(ord("A") + (index // j) % 26))
        j //= 26
    return "".join(out)


def double_to_string(v: float) -> str:
    """X7: shortest round-trip decimal (util.h:130-157).  Non-finite
    values render via repr ('nan'/'inf'/'-inf') — int(v) would raise
    ValueError/OverflowError before the integer short-circuit could
    decide (r10 review finding; reachable from engine._threshold_header
    on a non-finite threshold)."""
    import math
    if math.isfinite(v) and v == int(v) and abs(v) < 1e16:
        return str(int(v))
    return repr(v)
