"""Timezone parsing (mirrors /root/reference/timezone.go:10-43)."""

from __future__ import annotations

from datetime import timedelta, timezone
from typing import Optional

from .constants import RX_TZ_CODE
from .tz_data import TIMEZONE_OFFSETS


def parse_timezone_code(tz_code: str) -> Optional[timezone]:
    """'Z' → UTC; ±HH(:MM)? → fixed offset; else None (timezone.go:10-33)."""
    tz_code = tz_code.upper()
    if tz_code == "Z":
        return timezone.utc

    m = RX_TZ_CODE.search(tz_code)
    if m is not None:
        hour = int(m.group(2))
        minute = int(m.group(3)) if m.group(3) else 0
        offset = hour * 3600 + minute * 60
        if m.group(1) == "-":
            offset = -offset
        return timezone(timedelta(seconds=offset), tz_code)

    return None


def find_named_timezone(s: str) -> Optional[timezone]:
    """Whitespace-field scan against the named-TZ table (timezone.go:36-43)."""
    for field in s.split():
        offset = TIMEZONE_OFFSETS.get(field)
        if offset is not None:
            return timezone(timedelta(seconds=offset), field)
    return None
