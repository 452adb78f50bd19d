"""Archive range index: arbitrary metadata KV per contiguous row range.

Re-expression (not a copy) of the reference's range index
(clp_s/RangeIndexWriter.hpp:17-36): a tiny per-archive metadata blob
``[{"s": .., "e": .., "f": {key: value, ..}}, ...]`` attaching fields like
``_filename`` / ``_file_split_number`` / ``_archive_creator_id`` to
non-overlapping row ranges, plus the query-side pruning pass
(clp_s/search/EvaluateRangeIndexFilters.cpp, wired at clp_s/clp-s.cpp:176-183):
``$``-namespace filters are evaluated against the index on the driver —
matching ranges rewrite into row-key range predicates pushed into the
parquet scan, a query matching no range becomes ``lit(False)`` (EmptyExpr).

Differences from the reference, by design:

- ranges are keyed on the archive's ordered row key (``doc_id``) with
  INCLUSIVE endpoints, not byte positions — ``doc_id BETWEEN s AND e`` is
  a sargable predicate parquet min/max stats prune on;
- the index is a JSON sidecar (it is driver-side metadata, exactly like
  the reference's msgpack blob; zstd would save bytes that don't matter
  at this size).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clpspark.ref.wildcard import wildcard_match

RANGE_INDEX_FILE = "range_index.json"


def build_range_index(
    df: DataFrame,
    key_col: str = "doc_id",
    group_col: str = "source",
    extra_fields: dict[str, str] | None = None,
    filename_key: str = "_filename",
) -> list[dict]:
    """One range per ``group_col`` value (CLP: per ingested input file):
    inclusive [min(key), max(key)] + fields. One tiny aggregate job — the
    result is per-file metadata, the same cardinality the reference holds
    in memory. Raises if ranges overlap (the reference forbids it; an
    overlap means ``key_col`` is not contiguous per group and the index
    would prune wrongly)."""
    rows = (
        df.groupBy(group_col)
        .agg(
            F.min(key_col).alias("s"),
            F.max(key_col).alias("e"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    ranges = sorted(
        (
            {
                "s": r["s"],
                "e": r["e"],
                "n": r["n"],
                "f": {filename_key: r[group_col], **(extra_fields or {})},
            }
            for r in rows
        ),
        key=lambda x: x["s"],
    )
    for a, b in zip(ranges, ranges[1:]):
        if b["s"] <= a["e"]:
            raise ValueError(
                f"overlapping ranges: {a['f']} [{a['s']},{a['e']}] vs "
                f"{b['f']} [{b['s']},{b['e']}] — key not contiguous per group"
            )
    return ranges


def write_range_index(work_dir: str, ranges: list[dict]) -> str:
    path = os.path.join(work_dir, RANGE_INDEX_FILE)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(ranges, f)
    os.replace(tmp, path)
    return path


def read_range_index(work_dir: str) -> list[dict] | None:
    path = os.path.join(work_dir, RANGE_INDEX_FILE)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def match_ranges(
    ranges: list[dict] | None,
    filters: dict[str, str],
    case_sensitive: bool = False,
) -> list[dict]:
    """Ranges whose fields satisfy EVERY filter (AND semantics, one
    FilterExpr per key — EvaluateRangeIndexFilters::evaluate_filter).
    Filter values are CLP wildcard patterns; ``"*"`` asserts presence
    (the golden ``$_archive_creator_id: *``). A missing key never
    matches."""
    out = []
    for r in ranges or []:
        fields = r.get("f", {})
        ok = True
        for key, pat in filters.items():
            val = fields.get(key)
            if val is None:
                ok = False
                break
            if not wildcard_match(
                str(val), str(pat), case_sensitive=case_sensitive
            ):
                ok = False
                break
        if ok:
            out.append(r)
    return out


def range_predicate(matched: list[dict], key_col: str = "doc_id") -> F.Column:
    """OR of inclusive row-key ranges — the rewritten log_event_idx filter
    of the reference; no matching range = EmptyExpr = lit(False)."""
    pred = F.lit(False)
    for r in matched:
        pred = pred | F.col(key_col).between(F.lit(r["s"]), F.lit(r["e"]))
    return pred
