"""CLP timestamp-pattern search, pure Python.

Reimplements the known-pattern list and first-match search of
clp/TimestampPattern.cpp:120-200 (pattern table) using compiled regexes
instead of a char-by-char strptime loop. Each pattern is
(num_spaces_before_ts, format); the first pattern that matches at the given
token offset wins, the matched span is removed from the message, and the
timestamp is returned as epoch milliseconds (UTC).

Supported format codes (TimestampPattern.cpp parse loop): %Y %y %m %d %e %b
%B %a %H %k %l %M %S %3 %p and the relative-millis pattern %#3.
"""

from __future__ import annotations

import calendar
import re
from dataclasses import dataclass

_MONTH_ABBR = {m: i + 1 for i, m in enumerate(
    ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
     "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"])}
_MONTH_FULL = {m: i + 1 for i, m in enumerate(
    ["January", "February", "March", "April", "May", "June", "July",
     "August", "September", "October", "November", "December"])}

_CODE_REGEX = {
    "Y": r"(?P<Y>\d{4})",
    "y": r"(?P<y>\d{2})",
    "m": r"(?P<m>\d{2})",
    "d": r"(?P<d>\d{2})",
    "e": r"(?P<e>[ \d]?\d)",
    "b": r"(?P<b>[A-Z][a-z]{2})",
    "B": r"(?P<B>[A-Z][a-z]+)",
    "a": r"(?P<a>[A-Z][a-z]{2})",
    "H": r"(?P<H>\d{2})",
    "k": r"(?P<k>[ \d]?\d)",
    "l": r"(?P<l>\d{1,2})",
    "M": r"(?P<M>\d{2})",
    "S": r"(?P<S>\d{2})",
    "3": r"(?P<ms>\d{3})",
    "p": r"(?P<p>[AP]M)",
}


@dataclass(frozen=True)
class TimestampPattern:
    num_spaces_before_ts: int
    fmt: str

    def __post_init__(self) -> None:
        object.__setattr__(self, "_rx", _compile(self.fmt))

    def match(self, line: str) -> tuple[int, int, int] | None:
        """Try to match at the position after num_spaces_before_ts spaces.

        Returns (epoch_ms, begin, end) or None.
        """
        pos = 0
        for _ in range(self.num_spaces_before_ts):
            nxt = line.find(" ", pos)
            if nxt < 0:
                return None
            pos = nxt + 1
        rx: re.Pattern[str] = self._rx  # type: ignore[attr-defined]
        m = rx.match(line, pos)
        if m is None:
            return None
        ts = _fields_to_epoch_ms(m)
        if ts is None:
            return None
        return ts, m.start(), m.end()


def _compile(fmt: str) -> re.Pattern[str]:
    parts: list[str] = []
    i = 0
    n = len(fmt)
    while i < n:
        c = fmt[i]
        if c == "%" and i + 1 < n:
            code = fmt[i + 1]
            if code == "#" and i + 2 < n and fmt[i + 2] == "3":
                parts.append(r"(?P<rel>\d+)")
                i += 3
                continue
            if code in _CODE_REGEX:
                parts.append(_CODE_REGEX[code])
                i += 2
                continue
            parts.append(re.escape(code))
            i += 2
        else:
            parts.append(re.escape(c))
            i += 1
    return re.compile("".join(parts))


def _fields_to_epoch_ms(m: re.Match[str]) -> int | None:
    g = m.groupdict()
    if g.get("rel") is not None:
        return int(g["rel"])  # relative timestamp in ms (%#3)
    year = 2015
    month = 1
    day = 1
    if g.get("Y"):
        year = int(g["Y"])
    elif g.get("y"):
        year = 2000 + int(g["y"])
    if g.get("m"):
        month = int(g["m"])
    elif g.get("b"):
        month = _MONTH_ABBR.get(g["b"], 0)
    elif g.get("B"):
        month = _MONTH_FULL.get(g["B"], 0)
    if g.get("d"):
        day = int(g["d"])
    elif g.get("e"):
        day = int(g["e"].strip())
    hour = 0
    if g.get("H"):
        hour = int(g["H"])
    elif g.get("k"):
        hour = int(g["k"].strip())
    elif g.get("l"):
        hour = int(g["l"])
        if g.get("p") == "PM" and hour != 12:
            hour += 12
        elif g.get("p") == "AM" and hour == 12:
            hour = 0
    minute = int(g["M"]) if g.get("M") else 0
    second = int(g["S"]) if g.get("S") else 0
    ms = int(g["ms"]) if g.get("ms") else 0
    if not (1 <= month <= 12 and 1 <= day <= 31 and hour <= 23
            and minute <= 59 and second <= 60):
        return None
    try:
        epoch = calendar.timegm((year, month, day, hour, minute, second, 0, 0, 0))
    except (ValueError, OverflowError):
        return None
    return epoch * 1000 + ms


# Pattern table in priority order (TimestampPattern.cpp:120-200).
KNOWN_TS_PATTERNS: tuple[TimestampPattern, ...] = tuple(
    TimestampPattern(n, f)
    for n, f in [
        (0, "%Y-%m-%dT%H:%M:%S.%3"),
        (0, "%Y-%m-%dT%H:%M:%S,%3"),
        (0, "%Y-%m-%d %H:%M:%S.%3"),
        (0, "%Y-%m-%d %H:%M:%S,%3"),
        (0, "%Y/%m/%dT%H:%M:%S.%3"),
        (0, "%Y/%m/%dT%H:%M:%S,%3"),
        (0, "%Y/%m/%d %H:%M:%S.%3"),
        (0, "%Y/%m/%d %H:%M:%S,%3"),
        (0, "[%Y-%m-%d %H:%M:%S,%3]"),
        (2, "%Y-%m-%d %H:%M:%S,%3"),
        (0, "<<<%Y-%m-%d %H:%M:%S:%3"),
        (0, "%d %b %Y %H:%M:%S,%3"),
        (0, "%Y-%m-%dT%H:%M:%S"),
        (0, "%Y-%m-%d %H:%M:%S"),
        (0, "%Y/%m/%dT%H:%M:%S"),
        (0, "%Y/%m/%d %H:%M:%S"),
        (0, "[%Y-%m-%dT%H:%M:%S"),
        (0, "[%Y%m%d-%H:%M:%S]"),
        (1, "%Y-%m-%d  %H:%M:%S"),
        (0, "%y/%m/%d %H:%M:%S"),
        (0, "%y%m%d %k:%M:%S"),
        (0, "%b %d, %Y %l:%M:%S %p"),
        (0, "%B %d, %Y %H:%M"),
        (1, "[%d/%b/%Y:%H:%M:%S"),
        (3, "[%d/%b/%Y:%H:%M:%S"),
        (3, "[%d/%m/%Y:%H:%M:%S"),
        (6, "%Y-%m-%d %H:%M:%S"),
        (1, "%Y-%m-%d %H:%M:%S"),
        (4, "%a %b %e %H:%M:%S %Y"),
        (0, "%a %b %e %H:%M:%S %Y"),
        (0, "%b %d %H:%M:%S"),
        (0, "%m-%d %H:%M:%S.%3"),
        (0, "%#3"),
    ]
)


def search_known_ts_patterns(line: str) -> tuple[int, int, int, int] | None:
    """First matching pattern wins. Returns (epoch_ms, begin, end, pattern_ix)."""
    for ix, pat in enumerate(KNOWN_TS_PATTERNS):
        hit = pat.match(line)
        if hit is not None:
            ts, b, e = hit
            return ts, b, e, ix
    return None


_MONTH_ABBR_INV = {v: k for k, v in _MONTH_ABBR.items()}
_MONTH_FULL_INV = {v: k for k, v in _MONTH_FULL.items()}
_DAY_ABBR = ["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"]


def format_timestamp(pattern_ix: int, epoch_ms: int) -> str:
    """Render epoch ms back into the pattern's textual form (decompression
    path: inverse of the pattern's parse — TimestampPattern insert/render)."""
    import time as _time

    fmt = KNOWN_TS_PATTERNS[pattern_ix].fmt
    if fmt == "%#3":
        return str(epoch_ms)
    tm = _time.gmtime(epoch_ms // 1000)
    ms = epoch_ms % 1000
    out: list[str] = []
    i = 0
    n = len(fmt)
    while i < n:
        c = fmt[i]
        if c == "%" and i + 1 < n:
            code = fmt[i + 1]
            i += 2
            if code == "Y":
                out.append(f"{tm.tm_year:04d}")
            elif code == "y":
                out.append(f"{tm.tm_year % 100:02d}")
            elif code == "m":
                out.append(f"{tm.tm_mon:02d}")
            elif code == "d":
                out.append(f"{tm.tm_mday:02d}")
            elif code == "e":
                out.append(f"{tm.tm_mday:2d}")
            elif code == "b":
                out.append(_MONTH_ABBR_INV[tm.tm_mon])
            elif code == "B":
                out.append(_MONTH_FULL_INV[tm.tm_mon])
            elif code == "a":
                out.append(_DAY_ABBR[tm.tm_wday])
            elif code == "H":
                out.append(f"{tm.tm_hour:02d}")
            elif code == "k":
                out.append(f"{tm.tm_hour:2d}")
            elif code == "l":
                h = tm.tm_hour % 12
                out.append(str(12 if h == 0 else h))
            elif code == "M":
                out.append(f"{tm.tm_min:02d}")
            elif code == "S":
                out.append(f"{tm.tm_sec:02d}")
            elif code == "3":
                out.append(f"{ms:03d}")
            elif code == "p":
                out.append("PM" if tm.tm_hour >= 12 else "AM")
            else:
                out.append(code)
        else:
            out.append(c)
            i += 1
    return "".join(out)


def strip_timestamp_pos(line: str) -> tuple[int | None, int, int, str]:
    """Extract the first known timestamp.

    Returns (epoch_ms, pattern_ix, begin_pos, rest): the matched span is
    removed from the line (the timestamp is a separate column, as in CLP
    archives); begin_pos allows exact re-insertion at decompression.
    pattern_ix = -1 / begin_pos = -1 when none matched.
    """
    hit = search_known_ts_patterns(line)
    if hit is None:
        return None, -1, -1, line
    ts, b, e, ix = hit
    return ts, ix, b, line[:b] + line[e:]


def strip_timestamp(line: str) -> tuple[int | None, int, str]:
    """(epoch_ms, pattern_ix, rest) — see strip_timestamp_pos."""
    ts, ix, _, rest = strip_timestamp_pos(line)
    return ts, ix, rest


# Patterns 0..8 are anchored at position 0 (num_spaces_before_ts == 0, '['
# literal or digit first): try them directly with C-level regex match and
# memoize the epoch conversion by the MATCHED TEXT (log timestamps repeat
# heavily — bounded distinct second-level values), skipping the Python-side
# field extraction on hits. Priority order is preserved; anything else falls
# back to the full 33-pattern search.
_N_ANCHORED = 9


def strip_timestamp_pos_cached(
    line: str, cache: dict
) -> tuple[int | None, int, int, str]:
    """strip_timestamp_pos with a per-executor epoch memo (hot path)."""
    for ix in range(_N_ANCHORED):
        pat = KNOWN_TS_PATTERNS[ix]
        m = pat._rx.match(line)  # type: ignore[attr-defined]
        if m is not None:
            txt = m.group(0)
            ts = cache.get(txt)
            if ts is None:
                ts = _fields_to_epoch_ms(m)
                if ts is None:
                    break  # invalid field values: use the full search
                cache[txt] = ts
            return ts, ix, 0, line[m.end():]
    out = search_known_ts_patterns(line)
    if out is None:
        return None, -1, -1, line
    ts, b, e, ix = out
    return ts, ix, b, line[:b] + line[e:]


def reinsert_timestamp(rest: str, ts: int | None, pattern_ix: int,
                       pos: int) -> str:
    """Inverse of strip_timestamp_pos (text reconstruction sink)."""
    if ts is None or pattern_ix < 0 or pos < 0:
        return rest
    rendered = format_timestamp(pattern_ix, ts)
    return rest[:pos] + rendered + rest[pos:]
