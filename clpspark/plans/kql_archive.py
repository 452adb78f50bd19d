"""KQL planner over ENCODED JSON archives (clp_s search path analog).

The reference evaluates a KQL AST against clp_s archives by routing each
filter to the right storage structure (clp_s/search/QueryRunner.cpp:
dictionary probes for string columns, typed column scans otherwise) and
combining per-schema results. Spark-first re-creation: reuse the repo's
KQL grammar (plans/kql.KqlParser) unchanged, but make the leaf methods
return a lazy DOC-ID SET instead of a Column —

  - a filter on a CLP-encoded string leaf becomes a GrepEngine search over
    that leaf's sink partition (dictionary pre-filter, logtype isin,
    ordered-subsequence fold) — never a decoded string scan;
  - a VarString equality becomes a var-dict point lookup + semi-join
    (JsonArchive.match_varstring);
  - every other filter (ints, floats, bools, typed arrays, the DateString
    (pattern, epoch) struct) compiles to a Catalyst predicate over the
    records table;
  - AND/OR/NOT combine as joins / unions / anti-joins on doc_id
    (De Morgan keeps NOT lazy — the complement is only materialized once,
    against the records doc set, at the root).

Everything stays distributed: doc-id sets are DataFrames, the only
driver-side state is the archive's leaf-name list (one tiny collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clpspark.plans.kql import KqlParser, _DateVal


class _DocSet:
    """Lazy doc-id set with complement flag: (ids, negated).

    negated=True means "every doc EXCEPT ids" — resolved against the
    archive's full doc set only at materialization."""

    def __init__(self, ids: DataFrame, negated: bool = False):
        self.ids = ids
        self.negated = negated

    def __and__(self, other: "_DocSet") -> "_DocSet":
        a, b = self, other
        if not a.negated and not b.negated:
            return _DocSet(a.ids.join(b.ids, "doc_id", "left_semi"))
        if not a.negated and b.negated:
            return _DocSet(a.ids.join(b.ids, "doc_id", "left_anti"))
        if a.negated and not b.negated:
            return _DocSet(b.ids.join(a.ids, "doc_id", "left_anti"))
        # ¬A ∧ ¬B = ¬(A ∪ B)
        return _DocSet(a.ids.unionByName(b.ids), negated=True)

    def __or__(self, other: "_DocSet") -> "_DocSet":
        a, b = self, other
        if not a.negated and not b.negated:
            return _DocSet(a.ids.unionByName(b.ids))
        if not a.negated and b.negated:
            # A ∨ ¬B = ¬(B ∖ A)
            return _DocSet(b.ids.join(a.ids, "doc_id", "left_anti"),
                           negated=True)
        if a.negated and not b.negated:
            return _DocSet(a.ids.join(b.ids, "doc_id", "left_anti"),
                           negated=True)
        # ¬A ∨ ¬B = ¬(A ∩ B)
        return _DocSet(a.ids.join(b.ids, "doc_id", "left_semi"),
                       negated=True)

    def __invert__(self) -> "_DocSet":
        return _DocSet(self.ids, negated=not self.negated)

    def materialize(self, all_ids: DataFrame) -> DataFrame:
        ids = self.ids.select("doc_id").distinct()
        if self.negated:
            return all_ids.join(ids, "doc_id", "left_anti")
        return ids


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
        # the archive's encoded string leaves: one tiny driver collect
        # (leaf names, not data — same cardinality as the schema)
        self._leaves = {
            r["leaf"]
            for r in arch.columns.select("leaf").distinct().collect()
        }
        self._dates = _date_struct_paths(records.schema)

    # -- leaf dispatch ------------------------------------------------------
    def _match(self, path: str, value, quoted: bool) -> _DocSet:
        if path in self._dates:
            if isinstance(value, _DateVal):
                col = F.col(f"{path}.epoch") == F.lit(value.epoch_ms)
            elif value == "*" and not quoted:
                col = F.col(f"{path}.epoch").isNotNull() | F.col(
                    f"{path}.raw"
                ).isNotNull()
            else:
                raise ValueError(
                    f"DateString leaf {path!r}: use date(...) literals"
                )
            return self._records_set(col)
        if path in self._leaves:
            if isinstance(value, _DateVal):
                return _DocSet(self._empty_ids())
            if value == "*" and not quoted:
                ids = (
                    self._arch.columns.where(F.col("leaf") == path)
                    .select("doc_id")
                )
                return _DocSet(ids)
            # single-token exact equality = VarString fast path: the value
            # was necessarily VarString-encoded (no space), so a var-dict
            # point lookup + semi-join replaces the grep plan entirely
            if (
                self.case_sensitive
                and " " not in value
                and not any(c in value for c in "*?\\")
            ):
                return _DocSet(self._arch.match_varstring(path, value))
            # CLP wildcard semantics over the encoded leaf: the full grep
            # dictionary pre-filter runs on ONE leaf partition
            ids = self._arch.grep_leaf(
                path, value, ignore_case=not self.case_sensitive
            ).select("doc_id")
            return _DocSet(ids)
        return self._records_set(
            KqlParser._match(self, path, value, quoted)
        )

    def _compare(self, path: str, op: str, value) -> _DocSet:
        if path in self._dates:
            if isinstance(value, _DateVal):
                lit = F.lit(value.epoch_ms)
            else:
                lit = F.lit(int(float(value)))
            col = F.col(f"{path}.epoch")
            cmp = {"<": col < lit, ">": col > lit,
                   "<=": col <= lit, ">=": col >= lit}[op]
            return self._records_set(cmp)
        if path in self._leaves:
            # range ops on a string leaf can't match typed values
            # (clp_s type narrowing -> EmptyExpr)
            return _DocSet(self._empty_ids())
        return self._records_set(KqlParser._compare(self, path, op, value))

    def _match_multi(self, path: str, value, quoted: bool) -> _DocSet:
        return self._records_set(
            KqlParser._match_multi(self, path, value, quoted)
        )

    def _compare_multi(self, path: str, op: str, value) -> _DocSet:
        return self._records_set(
            KqlParser._compare_multi(self, path, op, value)
        )

    # -- helpers -------------------------------------------------------------
    def _records_set(self, col) -> _DocSet:
        return _DocSet(self.df.where(col).select("doc_id"))

    def _empty_ids(self) -> DataFrame:
        return self.df.select("doc_id").where(F.lit(False))


def kql_archive(arch, query: str, case_sensitive: bool = True) -> DataFrame:
    """Matching doc_ids of ``query`` over an encoded JSON archive."""
    p = _ArchiveKqlParser(arch, case_sensitive=case_sensitive)
    result: _DocSet = p.compile(query)
    all_ids = arch.records.select("doc_id")
    return result.materialize(all_ids)
