#!/usr/bin/env python
"""Physical-plan audit: capture .explain(formatted) for the key operators and
assert the plan properties we rely on at scale (pushdown, broadcast, partial
aggregation, TakeOrdered, partition pruning). Writes BENCH/PLANS.md."""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    from pyspark.sql import functions as F

    from clpspark.session import get_spark

    spark = get_spark("plan-audit", master="local[8]", shuffle_partitions=8)
    sf = "/root/testdata/sf0.01"
    sections: list[tuple[str, str, list[str]]] = []

    # 1. filter + projection pushdown to parquet
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    q = li.where(F.col("l_shipdate") <= "1995-01-01").select(
        "l_orderkey", "l_quantity"
    )
    sections.append((
        "Scan pushdown (filter + column pruning)",
        plan_of(q),
        ["PushedFilters", "l_orderkey"],
    ))

    # 2. broadcast enrich join
    o = spark.read.parquet(f"{sf}/orders.parquet")
    c = spark.read.parquet(f"{sf}/customer.parquet")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).groupBy(
        "c_nationkey"
    ).count()
    sections.append((
        "Broadcast hash join (enrich) + two-phase aggregate",
        plan_of(j),
        ["BroadcastHashJoin", "HashAggregate"],
    ))

    # 3. top-k compiles to TakeOrderedAndProject
    ev = spark.read.parquet(f"{sf}/events.parquet")
    t = ev.orderBy(F.col("ts").desc(), "event_id").limit(10)
    sections.append((
        "Top-k latest (bounded, no global sort)",
        plan_of(t),
        ["TakeOrderedAndProject"],
    ))

    # 4. partition pruning on the routed fan-out
    import __spark_entry__ as entry

    work = entry._pipeline_outputs(spark, 20_000)
    routed = spark.read.parquet(f"{work}/routed")
    p = routed.where(F.col("logtype_id") == 0).select("doc_id")
    sections.append((
        "Partition pruning on logtype_id (GLT sink layout)",
        plan_of(p),
        ["PartitionFilters"],
    ))

    # 5. grep pre-filter plan: isin on partition column before decode
    from clpspark.plans.grep import GrepEngine

    import os as _os

    idx_path = f"{work}/var_index"
    eng = GrepEngine(
        routed,
        spark.read.parquet(f"{work}/logtype_dict"),
        spark.read.parquet(f"{work}/var_dict"),
        var_index=(spark.read.parquet(idx_path)
                   if _os.path.exists(idx_path) else None),
    )
    g = eng.search("* ERROR Connection to * refused after *")
    sections.append((
        "Grep with dictionary pre-filter (partition isin before decode)",
        plan_of(g),
        ["PartitionFilters"],
    ))

    # 5a1. all-dict-var query: the logtype LIKE pattern matches everything,
    # so only the (var_id, logtype_id) inverted index can prune sinks —
    # a dict-var token from the corpus keeps the isin list strict
    some_var = (
        spark.read.parquet(f"{work}/var_dict")
        .orderBy("var_id").select("var_str").first()["var_str"]
    )
    g_var = eng.search(f"* {some_var} *")
    sections.append((
        "All-dict-var grep pruned via the var_id->sink inverted index "
        f"(query var: {some_var!r})",
        plan_of(g_var),
        ["PartitionFilters"],
    ))

    # 5a2. ts-range search: predicate pushed to the scan (row-group pruning
    # against the time-ordered sink files)
    g_ts = eng.search("*", tge=1_462_700_000_000, tle=1_462_800_000_000)
    sections.append((
        "Grep time-range predicates pushed to parquet (time-ordered sinks)",
        plan_of(g_ts),
        ["GreaterThanOrEqual(ts", "LessThanOrEqual(ts"],
    ))

    # 5b. multi-var query: in-order subsequence fold as a JVM prefilter
    g2 = eng.search("* 123 * 1353 *")
    sections.append((
        "Grep ordered var-subsequence prefilter (Query.cpp matches_vars)",
        plan_of(g2),
        ["aggregate(encoded_vars"],
    ))

    # 6. routed sink carries ids only (no redundant string columns)
    routed_cols = ", ".join(routed.columns)
    sections.append((
        "Routed sink schema (ids only — logtype/var strings live in the "
        "dictionaries)",
        f"columns: {routed_cols}\n",
        [],
    ))
    assert not {"logtype", "dict_vars", "var_ids"} & set(routed.columns)

    # 7. ANN index probe: partition-pruned isin on the materialized sig
    import shutil

    from clpspark.operators.similarity import lsh_topk, write_ann_index

    ann_dir = "/tmp/clpspark_ann/audit"
    shutil.rmtree(ann_dir, ignore_errors=True)
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    write_ann_index(emb, ann_dir)
    indexed = spark.read.parquet(ann_dir)
    qv = [1.0 if i % 3 == 0 else (-1.0 if i % 3 == 1 else 0.5)
          for i in range(64)]
    a = lsh_topk(indexed, qv, k=10, probe_hamming=3)
    sections.append((
        "ANN probe over the materialized LSH index (storage-layer pruning)",
        plan_of(a),
        ["PartitionFilters: [sig"],
    ))

    # 7b. IVF probe: partition-pruned isin on the materialized centroid cell
    from clpspark.operators.similarity import (
        ivf_topk,
        read_ivf_centroids,
        write_ivf_index,
    )

    ivf_dir = "/tmp/clpspark_ann/audit_ivf"
    shutil.rmtree(ivf_dir, ignore_errors=True)
    C = write_ivf_index(emb, ivf_dir, n_centroids=16)
    assert (read_ivf_centroids(ivf_dir) == C).all()
    iv = ivf_topk(
        spark.read.parquet(ivf_dir), qv, k=10, nprobe=4, centroids=C
    )
    sections.append((
        "IVF ANN probe over the materialized cell-partitioned index",
        plan_of(iv),
        ["PartitionFilters: [centroid"],
    ))

    # 8. snapshot manifest file skipping: the ts-bounded scan addresses only
    # surviving files (fewer paths than the manifest lists), and a dict-var
    # query is additionally bloom-pruned — before Spark lists/opens footers
    seng = GrepEngine.from_snapshot(spark, work)
    n_total = len(seng._file_stats)
    s_ts = seng.search("*", tge=1_462_780_000_000)
    n_ts = seng.last_scan_files
    s_var = seng.search(f"* {some_var} *", tge=1_462_780_000_000)
    n_var = seng.last_scan_files
    assert n_ts is not None and n_ts < n_total
    assert n_var is not None and n_var <= n_ts
    sections.append((
        "Snapshot manifest file skipping (min/max ts + dict-var bloom)",
        f"manifest files: {n_total}\n"
        f"ts-bounded scan reads: {n_ts}\n"
        f"ts+dict-var scan reads: {n_var}\n"
        + plan_of(s_ts),
        ["GreaterThanOrEqual(ts"],
    ))

    # 9. range index: $-namespace metadata filter becomes a sargable doc_id
    # BETWEEN pushed into the parquet scan; a no-match filter short-circuits
    # to an empty plan (EvaluateRangeIndexFilters EmptyExpr analog)
    import __spark_entry__ as entrymod

    rl = entrymod._rangelog_fixture()
    rwork = f"{entrymod._WORK_CACHE}/rangelogs"
    from clpspark.pipeline import PipelineConfig, run_pipeline

    run_pipeline(spark, PipelineConfig(
        input_path=rl, work_dir=rwork, input_format="text",
        range_index=True, archive_creator_id="entry-fixture",
    ), resume=True)
    reng = GrepEngine.from_work_dir(spark, rwork)
    rq = reng.search("*", meta={"_filename": "svc1.log"})
    assert reng.search("*", meta={"_filename": "absent.log"}).count() == 0
    sections.append((
        "Range-index pruning ($_filename -> doc_id BETWEEN pushed to scan)",
        plan_of(rq),
        ["GreaterThanOrEqual(doc_id,svc1.log#", "LessThanOrEqual(doc_id"],
    ))

    # 10. structurized array leaf search: partition-pruned to the ONE leaf
    # sink (arr.d.e), dictionary prefilter applied
    arch = entrymod._json_array_archive_fixture(spark, sf)
    aq = arch.grep_leaf("arr.d.e", "item * tag3")
    sections.append((
        "Structurized-array leaf grep (leaf partition pruning)",
        plan_of(aq),
        ["PartitionFilters", "leaf"],
    ))

    # 11. archive KQL planner: AND of a typed array predicate and a leaf
    # grep combines as a doc_id semi-join (no cartesian, no collect)
    kq = arch.kql('arr.b > 1000 AND arr.d.e: "item * tag3"')
    sections.append((
        "Archive KQL (doc-id set algebra: semi-join AND, leaf pruning)",
        plan_of(kq),
        ["LeftSemi", "PartitionFilters"],
    ))

    # 12. records-predicate fusion (r5): AND/NOT over typed records fields
    # collapses to ONE records scan — exactly one LeftSemi (records x ids)
    # and a bounded exchange count, instead of a per-filter semi-join chain
    fq = arch.kql('arr.b > 1000 AND NOT arr.a >= 5000')
    fplan = fq._jdf.queryExecution().executedPlan().toString()
    n_semi, n_exch = fplan.count("LeftSemi"), fplan.count("Exchange")
    assert n_semi == 1, f"records-pred fusion broken: {n_semi} semi-joins"
    assert n_exch <= 4, f"exchange budget blown: {n_exch}"
    sections.append((
        f"Archive KQL records-predicate fusion (1 scan: semi={n_semi}, "
        f"exchanges={n_exch})",
        plan_of(fq),
        ["LeftSemi"],
    ))

    # 13. span dedup (r5): the duplicate decision is ONE shuffle keyed on
    # the window text (rank window), word rebuild is a hash aggregate —
    # no cartesian, no nested-loop join anywhere in the plan
    from clpspark.operators.curate import dedup_spans

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    sd = dedup_spans(docs, k=8)
    sd_plan = plan_of(sd)
    assert "CartesianProduct" not in sd_plan, "span dedup went quadratic"
    assert "BroadcastNestedLoopJoin" not in sd_plan
    sections.append((
        "Exact-substring span dedup (windowed rank, no cartesian)",
        sd_plan,
        ["Window", "HashAggregate"],
    ))

    # 14. LM perplexity (r5): the bigram LM join must partial-aggregate
    # (two-phase counts) and join without a cartesian; small LM sides are
    # AQE-broadcastable at runtime
    from clpspark.operators.tokenizer import lm_perplexity

    lm = lm_perplexity(docs, train_filter=F.col("lang") == "en")
    lm_plan = plan_of(lm)
    assert "CartesianProduct" not in lm_plan
    # r6: the tercile split must NOT be a global-sort window (the old
    # ntile funneled every scored doc through one task). A partition-less
    # windowspecdefinition starts with an ordering spec instead of a
    # partition column.
    import re

    global_windows = [
        spec for spec in re.findall(r"windowspecdefinition\(([^,]+),",
                                    lm_plan)
        if " ASC" in spec or " DESC" in spec
    ]
    assert not global_windows, (
        f"partition-less Window in lm_perplexity plan: {global_windows}"
    )
    sections.append((
        "LM perplexity (two-phase counts, join-based scoring)",
        lm_plan,
        ["HashAggregate", "Join"],
    ))

    # DSIR scoring: after the bounded distribution collects, the per-doc
    # weight pass must be SCAN-LOCAL — no KEY shuffle, no Join; the
    # log-ratio table rides in the UDF closure. (A round-robin rebalance
    # Exchange is allowed: it no-ops at scale when splits >= cores.)
    from clpspark.operators.curate import dsir_log_weights

    dsir = dsir_log_weights(docs, F.col("lang") == "en", n_buckets=64)
    dsir_plan = plan_of(dsir)
    assert "Exchange hashpartitioning" not in dsir_plan, \
        "DSIR scoring must not key-shuffle"
    assert "Exchange rangepartitioning" not in dsir_plan
    assert "Join" not in dsir_plan, "DSIR scoring must not join"
    sections.append((
        "DSIR importance weights (scan-local scoring, closure-broadcast "
        "log-ratio)",
        dsir_plan,
        ["ArrowEvalPython", "Scan parquet"],
    ))

    lines = ["# PLANS — physical-plan audit (explain formatted)\n"]
    ok_all = True
    for title, plan, required in sections:
        checks = []
        for r in required:
            hit = r in plan
            ok_all &= hit
            checks.append(f"{'OK' if hit else 'MISSING'}: `{r}`")
        lines.append(f"## {title}\n\n" + " · ".join(checks) + "\n")
        lines.append("```\n" + plan.strip()[:4000] + "\n```\n")
    with open(os.path.join(REPO, "BENCH", "PLANS.md"), "w") as f:
        f.write("\n".join(lines))
    print("wrote BENCH/PLANS.md; all checks pass:", ok_all)


if __name__ == "__main__":
    main()
