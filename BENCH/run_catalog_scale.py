"""Catalog-wide JSON KQL planning-cost probe (VERDICT r4 #1).

Builds N tiny encoded JSON archives (cached in /dev/shm, keyed by N), then
times the driver-side PLAN BUILD of a catalog-wide KQL search two ways:

  serial : the pre-r5 shape — one archive at a time, linear unionByName
  pooled : search_json_archives — thread-pooled per-archive plans,
           balanced tree union

and the end-to-end execution (plan + collect) for the pooled path. Planning
is pure driver/py4j work, so the serial-vs-pooled gap is what a 1000-archive
dataset search would feel on a real cluster scheduler node.

Usage: python BENCH/run_catalog_scale.py  [N_ARCHIVES=50]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("N_ARCHIVES", sys.argv[1] if len(sys.argv) > 1 else 50))
ROOT = f"/dev/shm/clpspark_catscale_{N}"
QUERY = 'service: "svc3" AND msg: "request*"'


def build(spark) -> str:
    from clpspark.catalog import register_archive
    from clpspark.operators.json_encode import write_json_archive

    cat = f"{ROOT}/cat"
    if os.path.exists(f"{cat}/archives"):
        return cat

    def mk(i: int) -> None:
        rows = [
            (f"a{i}-d{j}", f"2024-01-{i % 27 + 1:02d} 00:0{j}:00",
             f"svc{i % 5}", f"request took {100 * i + j} ms")
            for j in range(3)
        ]
        df = spark.createDataFrame(
            rows, "doc_id string, ts string, service string, msg string"
        )
        write_json_archive(df, f"{ROOT}/arch{i}", ts_leaf="ts")

    with ThreadPoolExecutor(8) as ex:
        list(ex.map(mk, range(N)))
    for i in range(N):
        register_archive(spark, cat, f"a{i:02d}", f"{ROOT}/arch{i}",
                         begin_ts=i * 1000, end_ts=i * 1000 + 999, n_rows=3)
    return cat


def serial_plan(spark, cat):
    """The pre-r5 loop: serial opens/plans + linear unionByName chain."""
    from pyspark.sql import functions as F

    from clpspark.catalog import select_archives
    from clpspark.operators.json_encode import JsonArchive
    from clpspark.plans.kql_archive import kql_archive

    out = None
    for aid, path, _ in select_archives(spark, cat):
        arch = JsonArchive.open(spark, path)
        ids = kql_archive(arch, QUERY)
        hits = arch.records.join(ids, "doc_id", "left_semi").withColumn(
            "archive_id", F.lit(aid)
        )
        out = hits if out is None else out.unionByName(
            hits, allowMissingColumns=True
        )
    return out


def main() -> None:
    from clpspark.catalog import search_json_archives
    from clpspark.operators.json_encode import _ARCHIVE_HANDLES
    from clpspark.session import get_spark

    spark = get_spark("catalog-scale", master="local[8]",
                      shuffle_partitions=8)
    t0 = time.time()
    cat = build(spark)
    t_build = time.time() - t0

    timings: dict[str, float] = {"build_sec": round(t_build, 2)}
    # interleaved best-of-3 (CLAUDE.md: never trust single timings); clear
    # the handle cache each rep so both modes pay cold per-archive memos
    for rep in range(3):
        for name, fn in (
            ("serial_plan_sec", lambda: serial_plan(spark, cat)),
            ("pooled_plan_sec",
             lambda: search_json_archives(spark, cat, QUERY)),
        ):
            _ARCHIVE_HANDLES.clear()
            t = time.time()
            df = fn()
            dt = time.time() - t
            timings[name] = min(timings.get(name, 1e9), round(dt, 2))
            if rep == 2 and name == "pooled_plan_sec":
                t = time.time()
                n = df.count()
                timings["pooled_exec_sec"] = round(time.time() - t, 2)
                timings["rows"] = n
    timings["n_archives"] = N
    timings["speedup"] = round(
        timings["serial_plan_sec"] / timings["pooled_plan_sec"], 2
    )
    print(json.dumps(timings))


if __name__ == "__main__":
    main()
