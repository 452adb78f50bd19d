"""Archive metadata catalog — tags + time-range pruning across archives.

The reference keeps a metadata DB of archives (begin/end timestamp, size)
and their tags (clp_py_utils/clp_metadata_db_utils.py:31-99), and the query
scheduler prunes the archive list by tag semi-join + timestamp-range overlap
before dispatching per-archive search tasks
(job_orchestration/scheduler/query/query_scheduler.py:409-415, 863).

Spark-first: the catalog is a pair of small parquet tables
(``archives``: archive_id, path, begin_ts, end_ts, n_rows;
``tags``: archive_id, tag). Pruning is a driver-side filtered read of the
small catalog (the same shape as the reference's SELECT against its DB);
the search then unions per-archive GrepEngine plans — each archive owns its
dictionaries, exactly like the reference's per-archive search tasks.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _tbl(catalog_dir: str, name: str) -> str:
    return os.path.join(catalog_dir, name)


def register_archive(
    spark: SparkSession,
    catalog_dir: str,
    archive_id: str,
    path: str,
    begin_ts: int | None,
    end_ts: int | None,
    n_rows: int,
    tags: list[str] | None = None,
) -> None:
    """Idempotent: re-registering an existing archive_id is a no-op."""
    os.makedirs(catalog_dir, exist_ok=True)
    arch_path = _tbl(catalog_dir, "archives")
    if os.path.exists(arch_path):
        existing = spark.read.parquet(arch_path)
        if existing.where(F.col("archive_id") == archive_id).limit(1).count():
            return
    row = spark.createDataFrame(
        [(archive_id, path, begin_ts, end_ts, n_rows)],
        "archive_id string, path string, begin_ts long, end_ts long, "
        "n_rows long",
    )
    row.write.mode("append").parquet(arch_path)
    if tags:
        tag_rows = spark.createDataFrame(
            [(archive_id, t) for t in tags], "archive_id string, tag string"
        )
        tag_rows.write.mode("append").parquet(_tbl(catalog_dir, "tags"))


def select_archives(
    spark: SparkSession,
    catalog_dir: str,
    tags: list[str] | None = None,
    tge: int | None = None,
    tle: int | None = None,
) -> list[tuple[str, str]]:
    """(archive_id, path) of archives surviving tag semi-join + ts-range
    overlap pruning — query_scheduler.py:409-415 semantics (an archive
    matches if it carries ANY of the requested tags)."""
    arch = spark.read.parquet(_tbl(catalog_dir, "archives"))
    if tags:
        t = spark.read.parquet(_tbl(catalog_dir, "tags"))
        matching = t.where(F.col("tag").isin(tags)).select("archive_id")
        arch = arch.join(matching, "archive_id", "left_semi")
    if tge is not None:
        # keep archives whose range overlaps [tge, ...] (null end = unknown)
        arch = arch.where(
            F.col("end_ts").isNull() | (F.col("end_ts") >= F.lit(tge))
        )
    if tle is not None:
        arch = arch.where(
            F.col("begin_ts").isNull() | (F.col("begin_ts") <= F.lit(tle))
        )
    # newest-first walk order (query_scheduler.py:419 ORDER BY end_timestamp
    # DESC) so top-k consumers can early-exit on the first archives
    arch = arch.orderBy(F.col("end_ts").desc_nulls_last(), "archive_id")
    return [(r["archive_id"], r["path"]) for r in arch.collect()]


def search_archives(
    spark: SparkSession,
    catalog_dir: str,
    query: str,
    tags: list[str] | None = None,
    tge: int | None = None,
    tle: int | None = None,
    **kw,
) -> DataFrame:
    """Union of per-archive grep plans over the pruned archive set."""
    from clpspark.plans.grep import GrepEngine

    selected = select_archives(spark, catalog_dir, tags=tags, tge=tge, tle=tle)
    if not selected:
        from clpspark.operators.parse import PARSED_SCHEMA

        empty = spark.createDataFrame([], PARSED_SCHEMA)
        return empty.select("doc_id", "source", "ts").withColumn(
            "message", F.lit(None).cast("string")
        )
    import os

    out: DataFrame | None = None
    for _, path in selected:
        idx_path = f"{path}/var_index"
        engine = GrepEngine(
            spark.read.parquet(f"{path}/routed"),
            spark.read.parquet(f"{path}/logtype_dict"),
            spark.read.parquet(f"{path}/var_dict"),
            var_index=(spark.read.parquet(idx_path)
                       if os.path.exists(idx_path) else None),
        )
        part = engine.search(query, tge=tge, tle=tle, **kw).select(
            "doc_id", "source", "ts", "message"
        )
        out = part if out is None else out.unionByName(part)
    return out
