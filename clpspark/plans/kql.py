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
  - paths resolving to array<struct> match ANY element
    (QueryRunner.cpp:302-307 array filters)

Grammar (recursive descent):
  expr    := or
  or      := and (OR and)*
  and     := not ((AND)? not)*        -- bare juxtaposition = AND, as in KQL
  not     := NOT not | prim
  prim    := '(' expr ')' | filter
  filter  := path (':' value | op number)
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
        (?P<op><=|>=|<|>) |
        (?P<colon>:) |
        (?P<quoted>"(?:\\.|[^"\\])*") |
        (?P<word>[^\s():<>"]+)
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
        for kind in ("lparen", "rparen", "op", "colon", "quoted", "word"):
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


class KqlParser:
    def __init__(self, df: DataFrame, case_sensitive: bool = True):
        self.df = df
        self.case_sensitive = case_sensitive

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
            if t is None or t.kind == "rparen":
                return left
            if t.kind == "word" and t.text.upper() == "OR":
                return left
            if t.kind == "word" and t.text.upper() == "AND":
                self._next()
                left = left & self._not()
            elif t.kind in ("word", "lparen"):
                if t.kind == "word" and t.text.upper() == "NOT":
                    left = left & self._not()
                else:
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
            is_wild = any(c in path for c in "*?")
            if op.kind == "colon":
                v = self._next()
                matcher = self._match_multi if is_wild else self._match
                if v.kind == "quoted":
                    return matcher(path, _unquote(v.text), quoted=True)
                if v.kind == "word":
                    return matcher(path, v.text, quoted=False)
                raise ValueError(f"bad value token {v}")
            if op.kind == "op":
                v = self._next()
                cmp = self._compare_multi if is_wild else self._compare
                return cmp(path, op.text, v.text)
        raise ValueError(f"unexpected token {t}")

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

    def _compatible(self, path: str, value: str, numeric_only: bool) -> bool:
        """Type narrowing (clp_s NarrowTypes.cpp): drop leaves whose type
        cannot match the literal."""
        _, leaf, _ = self._resolve(path)
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
        """Resolve a dotted path -> (column, leaf type, is_array_of_struct)."""
        parts = path.split(".")
        if parts[0] not in self.df.schema.fieldNames():
            raise KeyError(f"no such column: {path}")
        col = F.col(parts[0])
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

    def _match(self, path: str, value: str, quoted: bool) -> Column:
        col, leaf, is_arr = self._resolve(path)
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

    def _compare(self, path: str, op: str, value: str) -> Column:
        col, leaf, is_arr = self._resolve(path)
        lit = _typed_literal(value, leaf)

        def cmp(x: Column) -> Column:
            return {"<": x < lit, ">": x > lit, "<=": x <= lit, ">=": x >= lit}[op]

        if is_arr:
            return F.exists(col, cmp)
        return cmp(col)


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
