"""CLP wildcard-string semantics, pure Python.

``*`` matches zero or more chars, ``?`` matches exactly one; both can be
escaped with a preceding ``\\``. Behavior matched against
clp/string_utils/string_utils.cpp:132-260 (clean-up + match algorithm) — the
implementation here is a straightforward regex translation, not a port of the
bookmark-scanning loop.
"""

from __future__ import annotations

import re


def clean_up_wildcard_search_string(s: str) -> str:
    """Collapse consecutive '*'s; drop escapes of non-wildcard chars.

    Mirrors string_utils.cpp:132-167: an escape is kept only when it precedes
    a wildcard or another escape; a trailing lone escape is dropped.
    """
    out: list[str] = []
    i = 0
    n = len(s)
    is_escaped = False
    while i < n:
        c = s[i]
        if is_escaped:
            is_escaped = False
            if c in "*?\\":
                out.append("\\")
            out.append(c)
            i += 1
        elif c == "*":
            out.append(c)
            while i < n and s[i] == "*":
                i += 1
        else:
            if c == "\\":
                is_escaped = True
            else:
                out.append(c)
            i += 1
    return "".join(out)


def _to_regex(wild: str) -> str:
    parts: list[str] = []
    i = 0
    n = len(wild)
    while i < n:
        c = wild[i]
        if c == "\\" and i + 1 < n:
            parts.append(re.escape(wild[i + 1]))
            i += 2
        elif c == "*":
            parts.append(".*")
            i += 1
        elif c == "?":
            parts.append(".")
            i += 1
        else:
            parts.append(re.escape(c))
            i += 1
    return "".join(parts)


def wildcard_match(tame: str, wild: str, case_sensitive: bool = True) -> bool:
    """Full-string wildcard match (string_utils.cpp:169-181)."""
    if not case_sensitive:
        tame = tame.lower()
        wild = wild.lower()
    return re.fullmatch(_to_regex(wild), tame, flags=re.DOTALL) is not None


def wildcard_to_like(wild: str) -> str | None:
    """Translate a cleaned CLP wildcard string to a SQL LIKE pattern.

    Returns None when the string contains literal '%'/'_' that would need
    LIKE-escaping inconsistently across engines — callers fall back to RLIKE.
    """
    out: list[str] = []
    i = 0
    n = len(wild)
    while i < n:
        c = wild[i]
        if c == "\\" and i + 1 < n:
            nxt = wild[i + 1]
            # A literal backslash can't be emitted portably: Spark LIKE
            # treats '\' as its escape char ('\x' raises ESC_IN_THE_MIDDLE,
            # '\%' silently matches a literal '%'). Fall back to rlike.
            if nxt in "%_\\":
                return None
            out.append(nxt)
            i += 2
        elif c == "*":
            out.append("%")
            i += 1
        elif c == "?":
            out.append("_")
            i += 1
        elif c in "%_":
            return None
        else:
            out.append(c)
            i += 1
    return "".join(out)


def wildcard_to_java_regex(wild: str) -> str:
    """Translate a cleaned CLP wildcard string to a Java-compatible regex for
    Spark ``rlike`` (anchored). The subset emitted (literals via \\Q..\\E and
    .*/.) is identical in Python and Java regex dialects."""
    parts: list[str] = ["^"]
    i = 0
    n = len(wild)

    def lit(ch: str) -> str:
        return re.escape(ch)

    while i < n:
        c = wild[i]
        if c == "\\" and i + 1 < n:
            parts.append(lit(wild[i + 1]))
            i += 2
        elif c == "*":
            parts.append("(?s:.*)")
            i += 1
        elif c == "?":
            parts.append("(?s:.)")
            i += 1
        else:
            parts.append(lit(c))
            i += 1
    parts.append("$")
    return "".join(parts)
