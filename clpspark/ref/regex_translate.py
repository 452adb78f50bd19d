"""Regex -> CLP-wildcard query translation.

Re-expresses clp/regex_utils/regex_translation_utils.cpp (state-machine
translator) as a plain scanner; behavior matched against
tests/test-regex_utils.cpp, ported into tests/test_regex_translate.py.

Supported: literals, ``.``/``.*``/``.+`` (-> ``?``/``*``/``?*``), escaped
metacharacters, single-character charsets (incl. ``[xX]`` case folding with
``case_insensitive``), ``^``/``$`` anchors with optional ``*`` prefix/suffix
insertion. Everything a wildcard query can't express raises
:class:`RegexTranslationError` — callers fall back to a full regex scan.
"""

from __future__ import annotations

# Characters whose escape sequence is legal in the input regex
# (regex_utils/constants.hpp cRegexEscapeSeqMetaCharsLut).
_ESCAPABLE = set(r"*+?|^$.{}[]()<>-_/=!\\" + "\\")

# Wildcard metacharacters that must stay escaped in the OUTPUT.
_WILD_META = set("*?\\")


class RegexTranslationError(ValueError):
    """code mirrors regex_utils::ErrorCodeEnum names."""

    def __init__(self, code: str, pos: int, detail: str = ""):
        self.code = code
        self.pos = pos
        super().__init__(f"{code} at {pos}{': ' + detail if detail else ''}")


def _emit_literal(c: str, out: list[str]) -> None:
    if c in _WILD_META:
        out.append("\\")
    out.append(c)


def regex_to_wildcard(
    regex: str,
    case_insensitive: bool = False,
    add_prefix_suffix_wildcards: bool = False,
) -> str:
    """Translate a regex into an equivalent CLP wildcard string.

    With ``add_prefix_suffix_wildcards`` (substring-search semantics), an
    un-anchored pattern gains ``*`` on the un-anchored side(s).
    """
    out: list[str] = []
    i = 0
    n = len(regex)
    starts_anchored = regex.startswith("^")
    if starts_anchored:
        i = 1
    ended = False  # saw '$' end anchor

    while i < n:
        c = regex[i]
        if ended:
            if c == "$":
                i += 1
                continue
            raise RegexTranslationError("IllegalDollarSign", i)
        if c == ".":
            if i + 1 < n and regex[i + 1] == "*":
                if i + 2 < n and regex[i + 2] in "*+":
                    raise RegexTranslationError(
                        "UntranslatableStar" if regex[i + 2] == "*"
                        else "UntranslatablePlus", i + 2)
                out.append("*")
                i += 2
            elif i + 1 < n and regex[i + 1] == "+":
                out.append("?*")
                i += 2
            else:
                out.append("?")
                i += 1
        elif c == "\\":
            if i + 1 >= n:
                raise RegexTranslationError("IllegalEscapeSequence", i)
            nxt = regex[i + 1]
            if nxt not in _ESCAPABLE:
                raise RegexTranslationError("IllegalEscapeSequence", i, nxt)
            _emit_literal(nxt, out)
            i += 2
        elif c == "[":
            i = _translate_charset(regex, i, out, case_insensitive)
        elif c == "?":
            raise RegexTranslationError("UnsupportedQuestionMark", i)
        elif c == "*":
            raise RegexTranslationError("UntranslatableStar", i)
        elif c == "+":
            raise RegexTranslationError("UntranslatablePlus", i)
        elif c == "|":
            raise RegexTranslationError("UnsupportedPipe", i)
        elif c == "^":
            raise RegexTranslationError("IllegalCaret", i)
        elif c == "$":
            ended = True
            i += 1
        elif c in "(){}":
            raise RegexTranslationError("UnsupportedGroupOrQuantifier", i, c)
        else:
            _emit_literal(c, out)
            i += 1

    if add_prefix_suffix_wildcards:
        if not starts_anchored:
            out.insert(0, "*")
        if not ended:
            out.append("*")
    return "".join(out)


def _translate_charset(
    regex: str, i: int, out: list[str], case_insensitive: bool
) -> int:
    """Translate one ``[...]`` charset starting at ``i``; returns the index
    after the closing bracket. Only single-char sets (and ``[xX]`` under
    case-insensitive folding) are wildcard-expressible."""
    # scan to the unescaped closing bracket FIRST: an unclosed charset is
    # Incomplete regardless of its contents (reference state machine order)
    j = i + 1
    chars: list[tuple[str, bool]] = []  # (char, was_escaped)
    n = len(regex)
    closed = False
    while j < n:
        c = regex[j]
        if c == "\\":
            if j + 1 >= n:
                break
            chars.append((regex[j + 1], True))
            j += 2
        elif c == "]":
            closed = True
            j += 1
            break
        else:
            chars.append((c, False))
            j += 1
    if not closed:
        raise RegexTranslationError("IncompleteCharsetStructure", i)
    if len(chars) == 1:
        c, esc = chars[0]
        if esc or c != "^":  # a lone raw '^' is a negation, not a literal
            _emit_literal(c, out)
            return j
    elif (
        case_insensitive
        and len(chars) == 2
        and not chars[0][1] and not chars[1][1]
        and chars[0][0].isalpha()
        and chars[0][0].lower() == chars[1][0].lower()
    ):
        _emit_literal(chars[0][0].lower(), out)
        return j
    raise RegexTranslationError("UnsupportedCharsetPattern", i)
