"""KQL-subset -> pyspark Column compiler.

The reference parses KQL with ANTLR (clp_s/search/kql/Kql.g4:1-98) into an
AST of And/Or/Not/Filter expressions (clp_s/search/ast/*), then runs pass
pipelines (DNF, type narrowing, schema match) before a row-loop evaluator
(clp_s/search/QueryRunner.cpp:123-405). In Spark all of those passes are
Catalyst built-ins; this module only has to translate the query text into a
Column predicate, resolving dotted paths against the DataFrame schema:

  - ``field: value``  -> full wildcard match for strings (*/? with \\ escapes,
    clp/string_utils semantics), equality for numerics/booleans
  - ``field: *``      -> EXISTS (isNotNull) — ConvertToExists.cpp
  - ``field > v`` etc -> typed comparisons (FilterOperation.hpp:8-17)
  - AND / OR / NOT / parentheses
  - ``field: {a: x AND b: y}``  -> nested-object query: the outer column is
    prepended to every descriptor inside (kql.cpp visitNestedQuery)
  - ``field: (a OR b)`` / ``(AND a b)`` / ``(NOT a b)`` -> value lists
    (kql.cpp visitList_of_values; bare list = OR, NOT = AND of negations)
  - ``field >= date("...")`` / ``field: date(...)`` -> timestamp literal
    parsed with the known-timestamp-pattern search (DateLiteral.cpp:27-44),
    compared as epoch millis
  - paths resolving to array<struct> match ANY element
    (QueryRunner.cpp:302-307 array filters)

Grammar (recursive descent):
  expr    := or
  or      := and (OR and)*
  and     := not ((AND)? not)*        -- bare juxtaposition = AND, as in KQL
  not     := NOT not | prim
  prim    := '(' expr ')' | filter
  filter  := path ':' '{' expr '}'            -- nested object
           | path ':' '(' [AND|OR|NOT] value* ')'   -- value list
           | path (':' value | op value)
  value   := word | quoted | date_literal
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clpspark.ref.wildcard import (
    clean_up_wildcard_search_string,
    wildcard_to_java_regex,
    wildcard_to_like,
)

# ----------------------------------------------------------------- tokenizer

_TOKEN_RX = re.compile(
    r"""\s*(?:
        (?P<lparen>\() | (?P<rparen>\)) |
        (?P<lbrace>\{) | (?P<rbrace>\}) |
        (?P<op><=|>=|<|>) |
        (?P<colon>:) |
        (?P<date>date\(\s*(?:"(?:\\.|[^"\\])*"|[^)"]*)\s*\)) |
        (?P<quoted>"(?:\\.|[^"\\])*") |
        (?P<word>(?:\\.|[^\s():<>"{}\\])+)
    )""",
    re.VERBOSE,
)

_QUOTE_ESCAPES = {
    "n": "\n", "r": "\r", "t": "\t", '"': '"', "\\": "\\\\", "*": "\\*",
    "?": "\\?", "b": "\b", "f": "\f", "/": "/",
}


@dataclass
class _Tok:
    kind: str
    text: str


def _lex(q: str) -> list[_Tok]:
    toks: list[_Tok] = []
    pos = 0
    while pos < len(q):
        m = _TOKEN_RX.match(q, pos)
        if m is None or m.end() == pos:
            if q[pos:].strip() == "":
                break
            raise ValueError(f"KQL lex error at {pos}: {q[pos:pos+20]!r}")
        pos = m.end()
        for kind in ("lparen", "rparen", "lbrace", "rbrace", "op", "colon",
                     "date", "quoted", "word"):
            text = m.group(kind)
            if text is not None:
                toks.append(_Tok(kind, text))
                break
    return toks


def _unquote(s: str) -> str:
    """Unescape a quoted KQL value, keeping wildcard escapes (\\* \\?) so the
    wildcard matcher still sees them as literals."""
    out: list[str] = []
    i = 1
    end = len(s) - 1
    while i < end:
        c = s[i]
        if c == "\\" and i + 1 < end:
            nxt = s[i + 1]
            out.append(_QUOTE_ESCAPES.get(nxt, "\\" + nxt))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


# ------------------------------------------------------------------- parser


class _DateVal:
    """A date(...) literal resolved to epoch millis (DateLiteral.cpp:27-44)."""

    __slots__ = ("epoch_ms", "text")

    def __init__(self, epoch_ms: int, text: str):
        self.epoch_ms = epoch_ms
        self.text = text


def _parse_date_literal(tok_text: str) -> _DateVal:
    from clpspark.ref.timestamps import search_known_ts_patterns

    inner = tok_text[5:-1].strip()  # date( ... )
    if inner.startswith('"') and inner.endswith('"') and len(inner) >= 2:
        inner = inner[1:-1]
    hit = search_known_ts_patterns(inner)
    if hit is None:
        raise ValueError(f"invalid date literal: {tok_text!r}")
    return _DateVal(hit[0], inner)


class KqlParser:
    def __init__(self, df: DataFrame, case_sensitive: bool = True):
        self.df = df
        self.case_sensitive = case_sensitive
        self._prefix: list[str] = []  # nested-query column prefix stack

    def compile(self, query: str) -> Column:
        self._toks = _lex(query)
        self._ix = 0
        col = self._expr()
        if self._ix != len(self._toks):
            raise ValueError(f"trailing tokens: {self._toks[self._ix:]}")
        return col

    # -- grammar -------------------------------------------------------------
    def _peek(self) -> _Tok | None:
        return self._toks[self._ix] if self._ix < len(self._toks) else None

    def _next(self) -> _Tok:
        t = self._peek()
        if t is None:
            raise ValueError("unexpected end of query")
        self._ix += 1
        return t

    def _expr(self) -> Column:
        return self._or()

    def _or(self) -> Column:
        left = self._and()
        while (t := self._peek()) and t.kind == "word" and t.text.upper() == "OR":
            self._next()
            left = left | self._and()
        return left

    def _and(self) -> Column:
        left = self._not()
        while True:
            t = self._peek()
            if t is None or t.kind in ("rparen", "rbrace"):
                return left
            if t.kind == "word" and t.text.upper() == "OR":
                return left
            if t.kind == "word" and t.text.upper() == "AND":
                self._next()
                left = left & self._not()
            elif t.kind in ("word", "quoted", "lparen"):
                left = left & self._not()
            else:
                return left

    def _not(self) -> Column:
        t = self._peek()
        if t and t.kind == "word" and t.text.upper() == "NOT":
            self._next()
            return ~self._not()
        return self._prim()

    def _prim(self) -> Column:
        t = self._next()
        if t.kind == "lparen":
            col = self._expr()
            close = self._next()
            if close.kind != "rparen":
                raise ValueError("expected ')'")
            return col
        if t.kind in ("word", "quoted"):
            path = _unquote(t.text) if t.kind == "quoted" else t.text
            op = self._next()
            if op.kind == "colon":
                nxt = self._peek()
                if nxt is not None and nxt.kind == "lbrace":
                    return self._nested(path)
                if nxt is not None and nxt.kind == "lparen":
                    return self._value_list(path)
                v = self._next()
                return self._filter_eq(path, v)
            if op.kind == "op":
                v = self._next()
                full = self._apply_prefix(path)
                is_wild = any(c in full for c in "*?")
                cmp = self._compare_multi if is_wild else self._compare
                if v.kind == "date":
                    return cmp(full, op.text, _parse_date_literal(v.text))
                return cmp(full, op.text, v.text)
        raise ValueError(f"unexpected token {t}")

    def _apply_prefix(self, path: str) -> str:
        """Prepend the nested-query column prefix (kql.cpp prepend_column)."""
        if not self._prefix:
            return path
        base = path[1:].lstrip(".") if path.startswith("$") else path
        return ".".join(self._prefix + [base])

    def _filter_eq(self, path: str, v: _Tok) -> Column:
        path = self._apply_prefix(path)
        is_wild = any(c in path for c in "*?")
        matcher = self._match_multi if is_wild else self._match
        if v.kind == "quoted":
            return matcher(path, _unquote(v.text), quoted=True)
        if v.kind == "word":
            return matcher(path, v.text, quoted=False)
        if v.kind == "date":
            return matcher(path, _parse_date_literal(v.text), quoted=False)
        raise ValueError(f"bad value token {v}")

    def _nested(self, path: str) -> Column:
        """``col: {subquery}`` — prepend col to every descriptor inside
        (clp_s/search/kql/kql.cpp visitNestedQuery / prepend_column)."""
        self._next()  # consume '{'
        self._prefix.append(path)
        try:
            col = self._expr()
        finally:
            self._prefix.pop()
        close = self._next()
        if close.kind != "rbrace":
            raise ValueError("expected '}'")
        return col

    def _value_list(self, path: str) -> Column:
        """``col: (a OR b)`` value lists (kql.cpp visitList_of_values):
        bare list = OR of equals, AND = all must match, NOT = AND of
        negated equals."""
        self._next()  # consume '('
        combine = "OR"
        invert_each = False
        t = self._peek()
        if t is not None and t.kind == "word" and t.text.upper() in (
                "AND", "OR", "NOT"):
            kw = t.text.upper()
            self._next()
            if kw == "AND":
                combine = "AND"
            elif kw == "NOT":
                combine = "AND"
                invert_each = True
        filters: list[Column] = []
        while True:
            t = self._peek()
            if t is None:
                raise ValueError("unterminated value list")
            if t.kind == "rparen":
                self._next()
                break
            if t.kind not in ("word", "quoted", "date"):
                raise ValueError(f"bad value-list token {t}")
            # infix separators (convenience superset of the reference's
            # prefix-condition grammar): unquoted AND/OR between literals
            if (t.kind == "word" and t.text.upper() in ("AND", "OR")
                    and filters):
                combine = t.text.upper()
                self._next()
                continue
            self._next()
            f = self._filter_eq(path, t)
            filters.append(~f if invert_each else f)
        if not filters:
            raise ValueError("empty value list")
        out = filters[0]
        for f in filters[1:]:
            out = (out & f) if combine == "AND" else (out | f)
        return out

    # -- filter leaves ---------------------------------------------------------
    def _expand_paths(self, pattern: str) -> list[str]:
        """Resolve wildcard column descriptors ('$*.a.*', 'arr.*') against the
        schema's leaf paths (clp_s SchemaMatch.cpp wildcard columns).

        '*' matches one-or-more path segments, '?' one character within a
        segment; a leading '$' (clp_s root marker) is ignored.
        """
        import fnmatch

        from clpspark.sources.json_logs import leaf_paths

        pat = pattern[1:] if pattern.startswith("$") else pattern
        pat = pat.lstrip(".")
        leaves = leaf_paths(self.df.schema)
        # translate: '*' may span segments (match '.'), so map directly via
        # fnmatch on the dotted string with '*' greedy across dots.
        return [p for p in leaves if fnmatch.fnmatchcase(p, pat)]

    def _compatible(self, path: str, value, numeric_only: bool) -> bool:
        """Type narrowing (clp_s NarrowTypes.cpp): drop leaves whose type
        cannot match the literal."""
        _, leaf, _ = self._resolve(path)
        if isinstance(value, _DateVal):
            return isinstance(leaf, (T.DoubleType, T.FloatType, T.LongType,
                                     T.IntegerType, T.TimestampType,
                                     T.TimestampNTZType))
        if isinstance(leaf, T.StringType):
            return not numeric_only
        if isinstance(leaf, T.BooleanType):
            return value.lower() in ("true", "false") and not numeric_only
        if isinstance(leaf, (T.DoubleType, T.FloatType, T.LongType,
                             T.IntegerType, T.ShortType, T.ByteType)):
            try:
                float(value)
                return True
            except ValueError:
                return value == "*"
        if isinstance(leaf, (T.TimestampType, T.TimestampNTZType)):
            try:
                float(value)
                return True
            except ValueError:
                return value == "*"
        return False

    def _match_multi(self, path: str, value: str, quoted: bool) -> Column:
        cols = [
            p for p in self._expand_paths(path)
            if value == "*" or self._compatible(p, value, numeric_only=False)
        ]
        if not cols:
            return F.lit(False)
        out = self._match(cols[0], value, quoted)
        for p in cols[1:]:
            out = out | self._match(p, value, quoted)
        return out

    def _compare_multi(self, path: str, op: str, value: str) -> Column:
        cols = [
            p for p in self._expand_paths(path)
            if self._compatible(p, value, numeric_only=True)
        ]
        if not cols:
            return F.lit(False)
        out = self._compare(cols[0], op, value)
        for p in cols[1:]:
            out = out | self._compare(p, op, value)
        return out

    def _resolve(self, path: str) -> tuple[Column, T.DataType, bool]:
        """Resolve a dotted path -> (column, leaf type, is_array_of_struct).

        Descriptor tokens may escape dots ('a\\.b.c' -> ['a.b', 'c']), as in
        the reference's tokenize_column_descriptor (test-kql.cpp "Escape
        sequences in column name").
        """
        parts = _split_descriptor(path)
        if parts[0] not in self.df.schema.fieldNames():
            raise KeyError(f"no such column: {path}")
        # backtick-quote top-level names containing dots (escaped descriptors)
        col = F.col(f"`{parts[0]}`" if "." in parts[0] else parts[0])
        cur_dt: T.DataType = self.df.schema[parts[0]].dataType
        for p in parts[1:]:
            if isinstance(cur_dt, T.ArrayType):
                st = cur_dt.elementType
                if not isinstance(st, T.StructType) or p not in st.fieldNames():
                    raise KeyError(f"no such column: {path}")
                col = F.transform(col, _field_getter(p))
                cur_dt = T.ArrayType(st[p].dataType)
            else:
                if not isinstance(cur_dt, T.StructType) or p not in cur_dt.fieldNames():
                    raise KeyError(f"no such column: {path}")
                col = col.getField(p)
                cur_dt = cur_dt[p].dataType
        leaf = cur_dt.elementType if isinstance(cur_dt, T.ArrayType) else cur_dt
        return col, leaf, isinstance(cur_dt, T.ArrayType)

    def _str_match(self, col: Column, pattern: str) -> Column:
        cleaned = clean_up_wildcard_search_string(pattern)
        if not self.case_sensitive:
            col = F.lower(col)
            cleaned = cleaned.lower()
        like = wildcard_to_like(cleaned)
        if like is not None:
            return col.like(like)
        return col.rlike(wildcard_to_java_regex(cleaned))

    def _match(self, path: str, value, quoted: bool) -> Column:
        col, leaf, is_arr = self._resolve(path)
        if isinstance(value, _DateVal):
            col = _as_epoch_ms(col, leaf, is_arr)
            lit = F.lit(value.epoch_ms)
            if is_arr:
                return F.exists(col, lambda x: x == lit)
            return col == lit
        if value == "*" and not quoted:
            return (
                F.exists(col, lambda x: x.isNotNull()) if is_arr else col.isNotNull()
            )
        if isinstance(leaf, (T.StringType,)):
            if is_arr:
                return F.exists(col, lambda x: self._str_match(x, value))
            return self._str_match(col, value)
        lit = _typed_literal(value, leaf)
        if is_arr:
            return F.exists(col, lambda x: x == lit)
        return col == lit

    def _compare(self, path: str, op: str, value) -> Column:
        col, leaf, is_arr = self._resolve(path)
        if isinstance(value, _DateVal):
            col = _as_epoch_ms(col, leaf, is_arr)
            lit = F.lit(value.epoch_ms)
        elif isinstance(leaf, (T.TimestampType, T.TimestampNTZType)):
            col = _as_epoch_ms(col, leaf, is_arr)
            lit = F.lit(int(float(value)))
        else:
            lit = _typed_literal(value, leaf)

        def cmp(x: Column) -> Column:
            return {"<": x < lit, ">": x > lit, "<=": x <= lit, ">=": x >= lit}[op]

        if is_arr:
            return F.exists(col, cmp)
        return cmp(col)


def _split_descriptor(path: str) -> list[str]:
    """Split a dotted descriptor, honoring backslash-escaped chars
    ('a\\.b.c' -> ['a.b', 'c'])."""
    parts: list[str] = []
    cur: list[str] = []
    i = 0
    n = len(path)
    while i < n:
        c = path[i]
        if c == "\\" and i + 1 < n:
            cur.append(path[i + 1])
            i += 2
        elif c == ".":
            parts.append("".join(cur))
            cur = []
            i += 1
        else:
            cur.append(c)
            i += 1
    parts.append("".join(cur))
    return parts


def _as_epoch_ms(col: Column, leaf: T.DataType, is_arr: bool) -> Column:
    """Normalize a timestamp-ish column to epoch millis for date() compares."""
    if isinstance(leaf, (T.TimestampType, T.TimestampNTZType)):
        conv = lambda x: F.unix_millis(x.cast("timestamp"))  # noqa: E731
        if is_arr:
            return F.transform(col, lambda x: F.unix_millis(x.cast("timestamp")))
        return conv(col)
    return col  # numeric epoch-ms column already


def _field_getter(name: str):
    # NOTE: must be a single-arg lambda — F.transform treats two-parameter
    # lambdas (incl. defaulted ones) as (element, index) lambdas.
    return lambda x: x[name]


def _typed_literal(value: str, leaf: T.DataType):
    if isinstance(leaf, T.BooleanType):
        return F.lit(value.lower() == "true")
    if isinstance(leaf, (T.DoubleType, T.FloatType)):
        return F.lit(float(value))
    if isinstance(leaf, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        try:
            return F.lit(int(value))
        except ValueError:
            return F.lit(float(value))
    return F.lit(value)


def kql_filter(df: DataFrame, query: str, case_sensitive: bool = True) -> DataFrame:
    """Filter a DataFrame with a KQL-subset query string."""
    return df.where(KqlParser(df, case_sensitive).compile(query))
