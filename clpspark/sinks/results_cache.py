"""Results-cache sink: batched inserts with latest-N retention.

Reference: clp/clo ResultsCacheOutputHandler (OutputHandler.cpp:64-150)
keeps a min-heap of the ``max_num_results`` LATEST results by timestamp
(a new result evicts the smallest-ts entry once full), then flushes them
to a MongoDB collection in ``batch_size``-document inserts with keys
``orig_file_id / orig_file_path / log_event_ix / timestamp / message``
(clp/clo/constants.hpp:15-19).

Spark re-expression: the heap IS a distributed top-k —
``orderBy(ts desc).limit(n)`` compiles to TakeOrderedAndProject (per-
partition heaps + driver merge, no full sort, no shuffle of the
losers). The store backend is pluggable: a ``mongodb://`` URI uses
pymongo when installed (env-gated — not in this container); any other
URI is a local parquet results table with identical documents, which is
also what a downstream Spark job would actually want to read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from clpspark.sinks.network import _as_result_tuples

# clp/clo/constants.hpp:15-19
KEY_ORIG_FILE_ID = "orig_file_id"
KEY_ORIG_FILE_PATH = "orig_file_path"
KEY_LOG_EVENT_IX = "log_event_ix"
KEY_TIMESTAMP = "timestamp"
KEY_MESSAGE = "message"


def retain_latest(df: DataFrame, max_num_results: int | None,
                  ts_col: str = "timestamp") -> DataFrame:
    """Latest-N retention (the reference's eviction heap) as a bounded
    top-k: ties on ts are broken deterministically by the remaining
    result columns so reruns keep the same rows."""
    if max_num_results is None:
        return df
    if max_num_results <= 0:
        raise ValueError(
            f"max_num_results must be >= 1 or None, got {max_num_results}")
    ties = [c for c in df.columns if c != ts_col]
    return df.orderBy(F.col(ts_col).desc(), *ties).limit(max_num_results)


def write_results_cache(
    df: DataFrame,
    uri: str,
    collection: str = "results",
    batch_size: int = 1000,
    max_num_results: int | None = 1000,
    ts_col: str | None = "ts",
    message_col: str = "message",
    path_col: str | None = "source",
    file_id_col: str | None = None,
    ix_col: str | None = "doc_id",
) -> int:
    """Write search results to the cache; returns the retained count."""
    docs = _as_result_tuples(
        df, ts_col, message_col, path_col, file_id_col, ix_col)
    docs = retain_latest(docs, max_num_results)
    if uri.startswith("mongodb://"):
        return _write_mongo(docs, uri, collection, batch_size)
    return _write_local(docs, uri, collection,
                        single_file=max_num_results is not None)


def _write_local(docs: DataFrame, out_dir: str, collection: str,
                 single_file: bool = True) -> int:
    """Parquet results table, flush order = ascending ts like the
    reference's heap-pop flush loop (OutputHandler.cpp:97-101)."""
    import os

    path = os.path.join(out_dir, collection)
    ordered = docs.orderBy(KEY_TIMESTAMP, KEY_ORIG_FILE_ID, KEY_LOG_EVENT_IX)
    # one part file so readers actually SEE the flush order (Spark packs
    # multi-file scans by size, not write order); retention already
    # bounded the rows so a single writer is not a scale concern. An
    # UNbounded cache keeps parallel writers — order is then per-file.
    if single_file:
        ordered = ordered.coalesce(1)
    ordered.write.mode("overwrite").parquet(path)
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    return spark.read.parquet(path).count()


def _write_mongo(docs: DataFrame, uri: str, collection: str,
                 batch_size: int) -> int:
    """insert_many in batch_size chunks (OutputHandler.cpp:131-136).
    Retention already capped the rows, so the driver-side iteration is
    bounded by max_num_results, not the corpus."""
    try:
        import pymongo  # noqa: F401
    except ImportError as e:  # env-gated: no MongoDB in this container
        raise NotImplementedError(
            "mongodb:// results cache needs the pymongo package; use a "
            "local directory URI for the parquet-backed cache"
        ) from e
    client = pymongo.MongoClient(uri)
    dbname = pymongo.uri_parser.parse_uri(uri)["database"] or "clp"
    coll = client[dbname][collection]
    batch, n = [], 0
    for row in docs.toLocalIterator(prefetchPartitions=True):
        batch.append(row.asDict())
        if len(batch) >= batch_size:
            coll.insert_many(batch)
            n += len(batch)
            batch = []
    if batch:
        coll.insert_many(batch)
        n += len(batch)
    return n
