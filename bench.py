#!/usr/bin/env python
"""Benchmark harness: headline queries + end-to-end CLP pipeline throughput.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] (default 32) and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric is the end-to-end parse -> enrich -> route -> aggregate
wall time over a deterministic synthesized sequences corpus sized to the SF
(plus sequences/sec); per-query timings cover the operator families.

Env knobs:
  SPARK_GRAFT_SF_DIR   testdata dir (sf inferred from the name)
  SPARK_GRAFT_CPUS     local[] parallelism (default 32)
  CLPSPARK_BENCH_ROWS  override corpus row count
  CLPSPARK_BENCH_QUERIES  comma-separated subset to run (default all)
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import time


def _sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


BENCH_QUERY_NAMES = [
    "lineitem_pricing_summary",
    "revenue_by_nation",
    "top3_orders_per_cust",
    "events_count_by_time",
    "events_topk_latest",
    "events_wildcard_regex",
    "events_kql",
    "docs_text_stats",
    "docs_exact_dedup",
    "docs_minhash_pairs",
    "docs_ngram_jaccard",
    "docs_dedup_keep",
    "docs_hashes",
    "docs_sampling",
    "docs_pii_scrub",
    "docs_top_ngrams",
    "docs_decontaminate",
    "docs_line_dedup",
    "docs_pack_sequences",
    "clp_snapshot_search",
    "emb_cosine_topk",
    "emb_lsh_topk",
    "emb_ivf_topk",
    "emb_dup_pairs",
    "emb_semantic_dedup",
    "grok_parse",
    "text_log_ingest",
    "ir_roundtrip",
    "kv_ir_roundtrip",
    "json_kql_encoded",
    "json_kql_array",
    "json_roundtrip",
    "glt_columns",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_from_dir(sf_dir)
    # sized so the pipeline's ~10s fixed floor (commits, dict actions) is
    # amortized: at sf0.1 this is 1.2M sequences (~20s wall at local[32])
    n_rows = int(os.environ.get("CLPSPARK_BENCH_ROWS",
                                max(int(12_000_000 * sf), 20_000)))

    from clpspark.corpus import write_corpus
    from clpspark.pipeline import PipelineConfig, run_pipeline
    from clpspark.session import get_spark

    master = os.environ.get("CLPSPARK_MASTER", f"local[{cpus}]")
    spark = get_spark("clpspark-bench", master=master, shuffle_partitions=cpus)

    # corpus synthesis is a fixture, not the measured pipeline: cache it
    bench_tmp = os.environ.get(
        "CLPSPARK_BENCH_TMP",
        "/dev/shm/clpspark_bench" if os.path.isdir("/dev/shm") else "/tmp/clpspark_bench",
    )
    corpus_path = f"{bench_tmp}/corpus_n{n_rows}"
    if not os.path.exists(f"{corpus_path}/_SUCCESS"):
        # enough files that ANY parallelism level reads with >= cores input
        # splits (parquet can't split below one row group, and this corpus
        # cache is shared across cpu configs)
        write_corpus(spark, corpus_path, n_rows=n_rows, seed=42,
                     partitions=max(64, 2 * cpus))

    timings: dict[str, float] = {}

    # -- headline: end-to-end pipeline (fresh run, resume off) ---------------
    work = f"{bench_tmp}/work_n{n_rows}_c{cpus}"
    shutil.rmtree(work, ignore_errors=True)
    cfg = PipelineConfig(
        input_path=corpus_path,
        work_dir=work,
        materialize_parsed=os.environ.get("CLPSPARK_BENCH_MATERIALIZE", "0") == "1",
    )
    t0 = time.time()
    run_pipeline(spark, cfg, resume=False)
    pipeline_sec = time.time() - t0
    timings["clp_pipeline_e2e"] = round(pipeline_sec, 3)

    # -- compression ratio (CLP's headline metric): raw log-text bytes vs the
    # archive (routed sinks + both dictionaries) on disk -----------------------
    from clpspark.corpus import build_vocab

    vocab = build_vocab(42).vocab
    piece_len = [len(p.encode("utf-8")) for p in vocab]
    from pyspark.sql import functions as F

    lens_sql = ",".join(str(x) for x in piece_len)
    raw_bytes = (
        spark.read.parquet(corpus_path)
        .select(
            F.expr(
                f"aggregate(tokens, 0L, (acc, t) -> acc + "
                f"element_at(array({lens_sql}), t + 1))"
            ).alias("n")
        )
        .agg(F.sum("n"))
        .first()[0]
        or 0
    )
    # +1 per row for the newline a raw log file would carry
    raw_bytes += n_rows

    def _du(path: str) -> int:
        total = 0
        for root, _, files in os.walk(path):
            for fn in files:
                total += os.path.getsize(os.path.join(root, fn))
        return total

    archive_bytes = sum(
        _du(os.path.join(work, d))
        for d in ("routed", "logtype_dict", "var_dict")
        if os.path.exists(os.path.join(work, d))
    )
    compression_ratio = round(raw_bytes / archive_bytes, 2) if archive_bytes else None

    # -- grep over the routed output -----------------------------------------
    import __spark_entry__ as entrymod
    from clpspark.plans.grep import GrepEngine

    t0 = time.time()
    engine = GrepEngine.from_work_dir(spark, work)
    engine.search("* ERROR Connection to * refused after *").count()
    timings["clp_grep_search"] = round(time.time() - t0, 3)

    # -- operator query suite on the driver testdata -------------------------
    only = os.environ.get("CLPSPARK_BENCH_QUERIES")
    if only is not None:
        names = [n for n in only.split(",") if n]
    else:
        names = BENCH_QUERY_NAMES
    qs = entrymod.queries()
    # build the JSON-archive fixtures BEFORE timing: their synthesis is
    # test-data generation, not query work — a cold cache would otherwise
    # bill the whole encode pipeline to the first json_kql_* query
    if any(n.startswith("json_kql") for n in names):
        for fixture in (entrymod._json_archive_fixture,
                        entrymod._json_array_archive_fixture):
            try:
                fixture(spark, sf_dir)
            except Exception:
                pass  # fixture unavailable at this sf — query will report it
    # likewise the shared 20k-row pipeline work dir: the clp_* operator
    # queries read it, and on a cold cache whichever runs first would be
    # billed the whole fixture pipeline (observed: clp_snapshot_search
    # 2.8s warm -> 9.8s cold-cache)
    if any(n.startswith(("clp_", "glt_")) or n == "text_reconstruct"
           for n in names):
        try:
            entrymod._pipeline_outputs(spark, entrymod._PIPELINE_ROWS)
        except Exception:
            pass
    for name in names:
        fn = qs[name]
        t0 = time.time()
        fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)

    # -- JSON archive compression (clp_s typed column encodings) -------------
    json_raw = json_arch = 0
    json_ratio = None
    try:
        arch = entrymod._json_archive_fixture(spark, sf_dir)
        with open(f"{arch.dir}/_RAW_BYTES") as f:
            json_raw = int(f.read())
        json_arch = sum(
            _du(os.path.join(arch.dir, d))
            for d in ("columns", "records", "var_dict", "logtype_dict")
        )
        json_ratio = round(json_raw / json_arch, 2) if json_arch else None
    except Exception:
        pass  # fixture unavailable at this sf — omit the metric

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "end-to-end parse→enrich→route→aggregate + operator suite",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "sequences": n_rows,
                "pipeline_sec": round(pipeline_sec, 3),
                "sequences_per_sec": round(n_rows / pipeline_sec, 1),
                "raw_log_bytes": int(raw_bytes),
                "archive_bytes": int(archive_bytes),
                "compression_ratio": compression_ratio,
                "json_raw_bytes": json_raw,
                "json_archive_bytes": json_arch,
                "json_compression_ratio": json_ratio,
            }
        )
    )
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
