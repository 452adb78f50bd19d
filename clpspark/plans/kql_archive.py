"""KQL planner over ENCODED JSON archives (clp_s search path analog).

The reference evaluates a KQL AST against clp_s archives by routing each
filter to the right storage structure (clp_s/search/QueryRunner.cpp:
dictionary probes for string columns, typed column scans otherwise) and
combining per-schema results. Spark-first re-creation: reuse the repo's
KQL grammar (plans/kql.KqlParser) unchanged, but make the leaf methods
return a lazy DOC-ID SET NODE instead of a Column —

  - a filter on a CLP-encoded string leaf becomes a GrepEngine search over
    that leaf's sink partition (dictionary pre-filter, logtype isin,
    ordered-subsequence fold) — never a decoded string scan;
  - a VarString equality becomes a var-dict point lookup + semi-join
    (JsonArchive.match_varstring);
  - every other filter (ints, floats, bools, typed arrays, the DateString
    (pattern, epoch) struct) compiles to a Catalyst predicate over the
    records table;
  - AND/OR combine as doc_id semi-joins / unions; NOT follows the
    reference's absent-column semantics (test-clp_s-search.cpp golden
    ``NOT a: b -> {0}``: records LACKING column ``a`` do not match even
    the negated filter — SQL's 3-valued logic), so negation is pushed to
    the leaves: each node lazily knows both its matching set (pos) and
    the set where its negation is TRUE (neg = present-and-not-matching),
    and De Morgan — valid under 3VL because NULL propagates symmetrically
    — rewrites compound negations into those.

Everything stays distributed: doc-id sets are DataFrames, the only
driver-side state is the archive's leaf-name list (one tiny collect).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clpspark.plans.kql import KqlParser, _DateVal


class _Node:
    """Lazy doc-id set with 3-valued negation.

    ``pos()`` = ids where the predicate is TRUE; ``neg()`` = ids where its
    negation is TRUE (absent/NULL columns are in neither).

    Records-predicate fusion: a node born from a Catalyst predicate over
    the records table carries (``col``, ``df``); AND/OR/NOT of two such
    nodes combine the *predicates* (one records scan) instead of chaining
    per-filter doc-id semi-joins — ``a > 1 AND b < 5 AND NOT c: 3`` is one
    ``where()``, not three scans and two joins. Valid because Catalyst's
    3-valued logic matches the reference's absent-column semantics at the
    predicate level exactly as it does at the set level."""

    def __init__(self, pos: Callable[[], DataFrame],
                 neg: Callable[[], DataFrame],
                 col=None, df: DataFrame | None = None):
        self.pos = pos
        self.neg = neg
        self.col = col
        self.df = df

    @classmethod
    def from_col(cls, df: DataFrame, col) -> "_Node":
        return cls(
            lambda: df.where(col).select("doc_id"),
            lambda: df.where(~col).select("doc_id"),
            col=col, df=df,
        )

    def _fusable(self, other: "_Node") -> bool:
        return (self.col is not None and other.col is not None
                and self.df is other.df)

    def __and__(self, other: "_Node") -> "_Node":
        if self._fusable(other):
            return _Node.from_col(self.df, self.col & other.col)
        return _Node(
            lambda: self.pos().join(other.pos(), "doc_id", "left_semi"),
            # ¬(A ∧ B) = ¬A ∨ ¬B  (3VL De Morgan)
            lambda: self.neg().unionByName(other.neg()),
        )

    def __or__(self, other: "_Node") -> "_Node":
        if self._fusable(other):
            return _Node.from_col(self.df, self.col | other.col)
        return _Node(
            lambda: self.pos().unionByName(other.pos()),
            lambda: self.neg().join(other.neg(), "doc_id", "left_semi"),
        )

    def __invert__(self) -> "_Node":
        if self.col is not None:
            return _Node.from_col(self.df, ~self.col)
        return _Node(self.neg, self.pos)


def _date_struct_paths(schema: T.StructType, prefix: str = "") -> set[str]:
    """Paths of DateString-encoded leaves: struct<pattern,epoch,raw>."""
    out: set[str] = set()
    for f in schema.fields:
        path = f"{prefix}{f.name}"
        dt = f.dataType
        if isinstance(dt, T.StructType):
            names = {x.name for x in dt.fields}
            if names == {"pattern", "epoch", "raw"}:
                out.add(path)
            else:
                out.update(_date_struct_paths(dt, path + "."))
    return out


class _ArchiveKqlParser(KqlParser):
    def __init__(self, arch, case_sensitive: bool = True):
        records = arch.records
        super().__init__(records, case_sensitive)
        self._arch = arch
        # the archive's encoded string leaves (memoized on the archive
        # handle per version — leaf NAMES, not data)
        self._leaves = arch.leaf_names()
        self._dates = _date_struct_paths(records.schema)
        # set when a node actually needs the dictionaries (grep/VarString
        # leaf filters) — typed-records-only queries must not pay the
        # dictionary prewarm jobs
        self.uses_dicts = False

    # -- leaf dispatch ------------------------------------------------------
    def _match(self, path: str, value, quoted: bool) -> _Node:
        # "*" always means match-any (a literal asterisk must be escaped),
        # so quoted "*" keeps existence semantics too — ConvertToExists.cpp
        is_exists = value == "*" and not isinstance(value, _DateVal)
        if path in self._dates:
            if isinstance(value, _DateVal):
                col = F.col(f"{path}.epoch") == F.lit(value.epoch_ms)
            elif is_exists:
                col = F.col(f"{path}.epoch").isNotNull() | F.col(
                    f"{path}.raw"
                ).isNotNull()
            else:
                raise ValueError(
                    f"DateString leaf {path!r}: use date(...) literals"
                )
            return self._records_node(col)
        if path in self._leaves:
            if isinstance(value, _DateVal):
                return _Node(self._empty_ids,
                             lambda: self._leaf_presence(path))
            if is_exists:
                # EXISTS: isNotNull is never NULL, so the negation matches
                # exactly the docs where the leaf is absent
                return _Node(
                    lambda: self._leaf_presence(path),
                    lambda: self._all_ids().join(
                        self._leaf_presence(path), "doc_id", "left_anti"
                    ),
                )
            # single-token exact equality = VarString fast path: the value
            # was necessarily VarString-encoded (no space), so a var-dict
            # point lookup + semi-join replaces the grep plan entirely
            self.uses_dicts = True
            if (
                self.case_sensitive
                and " " not in value
                and not any(c in value for c in "*?\\")
            ):
                pos = lambda: self._arch.match_varstring(path, value)  # noqa: E731
            else:
                # CLP wildcard semantics over the encoded leaf: the full
                # grep dictionary pre-filter runs on ONE leaf partition
                pos = lambda: self._arch.grep_leaf(  # noqa: E731
                    path, value, ignore_case=not self.case_sensitive
                ).select("doc_id")
            # ¬(leaf: v) = present AND not matching (absent docs excluded)
            return _Node(
                pos,
                lambda: self._leaf_presence(path).join(
                    pos(), "doc_id", "left_anti"
                ),
            )
        try:
            col = KqlParser._match(self, path, value, quoted)
        except KeyError:
            # column absent from THIS archive's schema: clp_s semantics —
            # the filter (and its negation) never matches (schema drift
            # across a dataset's archives must not abort the search)
            return _Node(self._empty_ids, self._empty_ids)
        return self._records_node(col)

    def _compare(self, path: str, op: str, value) -> _Node:
        if path in self._dates:
            if isinstance(value, _DateVal):
                lit = F.lit(value.epoch_ms)
            else:
                # compare as double — int(float(...)) truncation would
                # shift the boundary for fractional literals
                lit = F.lit(float(value))
            col = F.col(f"{path}.epoch")
            cmp = {"<": col < lit, ">": col > lit,
                   "<=": col <= lit, ">=": col >= lit}[op]
            return self._records_node(cmp)
        if path in self._leaves:
            # range ops on a string leaf can't match typed values
            # (clp_s type narrowing -> EmptyExpr); its negation matches
            # every doc where the leaf is present
            return _Node(self._empty_ids,
                         lambda: self._leaf_presence(path))
        try:
            col = KqlParser._compare(self, path, op, value)
        except KeyError:
            return _Node(self._empty_ids, self._empty_ids)
        return self._records_node(col)

    def _match_multi(self, path: str, value, quoted: bool) -> _Node:
        """Wildcard column descriptor ('$*.a', 'm*g'): expand against BOTH
        the records schema and the encoded string leaves (top-level string
        leaves are dropped from records entirely, so the base expansion
        alone would silently miss them) and OR the per-path nodes."""
        rec_paths = [
            p for p in KqlParser._expand_paths(self, path)
            if p not in self._leaves
            and (value == "*"
                 or self._compatible(p, value, numeric_only=False))
        ]
        leafs = self._matching_leaves(path)
        dates = [
            d for d in sorted(self._dates)
            if self._seg_match(d, path)
            and (isinstance(value, _DateVal) or value == "*")
        ]
        nodes = [self._match(p, value, quoted)
                 for p in rec_paths + leafs + dates]
        return self._node_or(nodes)

    def _compare_multi(self, path: str, op: str, value) -> _Node:
        rec_paths = [
            p for p in KqlParser._expand_paths(self, path)
            if p not in self._leaves
            and self._compatible(p, value, numeric_only=True)
        ]
        dates = [d for d in sorted(self._dates) if self._seg_match(d, path)]
        nodes = [self._compare(p, op, value) for p in rec_paths + dates]
        return self._node_or(nodes)

    def _matching_leaves(self, pattern: str) -> list[str]:
        return [l for l in sorted(self._leaves)
                if self._seg_match(l, pattern)]

    @staticmethod
    def _seg_match(path: str, pattern: str) -> bool:
        import fnmatch

        pat = pattern[1:] if pattern.startswith("$") else pattern
        return fnmatch.fnmatchcase(path, pat.lstrip("."))

    def _node_or(self, nodes: list[_Node]) -> _Node:
        if not nodes:
            # no compatible column: EmptyExpr; its negation matches all
            # (same as the base compiler's ~lit(False))
            return _Node(self._empty_ids, self._all_ids)
        out = nodes[0]
        for n in nodes[1:]:
            out = out | n
        return out

    # -- helpers -------------------------------------------------------------
    def _records_node(self, col) -> _Node:
        # Catalyst's 3-valued logic gives reference negation semantics for
        # free: where(~col) excludes NULL/absent values. The (col, df) pair
        # rides along so adjacent records filters FUSE into one scan.
        return _Node.from_col(self.df, col)

    def _leaf_presence(self, path: str) -> DataFrame:
        return (
            self._arch.columns.where(F.col("leaf") == path)
            .select("doc_id")
        )

    def _all_ids(self) -> DataFrame:
        return self.df.select("doc_id")

    def _empty_ids(self) -> DataFrame:
        return self.df.select("doc_id").where(F.lit(False))


def kql_archive(arch, query: str, case_sensitive: bool = True,
                distinct: bool = True) -> DataFrame:
    """Matching doc_ids of ``query`` over an encoded JSON archive.

    ``distinct=False`` skips the final dedup exchange — sound for
    consumers that only LEFT-SEMI join the id set (duplicates can arise
    from OR branches and array-leaf element rows; a semi-join absorbs
    them for free)."""
    p = _ArchiveKqlParser(arch, case_sensitive=case_sensitive)
    result: _Node = p.compile(query)
    if p.uses_dicts:
        # overlap the cold dictionary jobs before the first action fires
        # them serially (no-op when the archive is warm); typed-records-
        # only queries never touch the dictionaries and skip this
        arch.prewarm()
    ids = result.pos()
    return ids.distinct() if distinct else ids
