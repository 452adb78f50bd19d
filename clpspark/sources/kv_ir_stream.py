"""kv-pair (structured) IR stream source/sink — Spark integration.

The reference's modern ingestion format: logging libraries serialize
structured events as kv-pair IR (clp/ffi/ir_stream/Serializer.cpp) and
`clp_s` both ingests archives from it and searches it directly
(clp_s/kv_ir_search.cpp). Spark-first equivalents:

  - ``write_kv_ir_files``: partition-parallel sink; each task serializes its
    rows (auto-gen: timestamp; user-gen: the record) into one ``.clp.kvir``
    file with deterministic per-partition names (retries replace).
  - ``read_kv_ir_files``: binaryFile scan -> Arrow-batched deserialize ->
    (doc_id, source, ts, json) rows; the reconstructed user-gen JSON feeds
    the SAME clp_s ingestion path NDJSON does (json_logs.with_schema_id ->
    route_by_schema), which is exactly kv_ir_search's model: deserialize IR
    units, evaluate the query over the schema-tree values.
  - ``stream_kv_ir_files``: readStream over a kv-IR directory (real-time
    ingestion; file arrival == stream tailing).
  - ``kv_ir_ingest``: kv-IR -> typed DataFrame with schema_id, ready for
    route_by_schema / KQL (the kv_ir_search.cpp analog).

Files are the unit of parallelism (a kv IR stream is sequential: schema-tree
node ids chain across events), matching the reference's one-stream-per-origin
model.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clpspark.ref import kv_ir_format as KV

_BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)

# auto-generated keys this engine writes (the reference's serializers put
# producer-side fields — timestamps etc. — in the auto-gen schema tree)
AUTO_TS_KEY = "timestamp"

KV_READ_SCHEMA = "doc_id string, source string, ts long, json string"


def write_kv_ir_files(
    df: DataFrame,
    out_dir: str,
    ts_col: str = "ts",
    json_col: str = "json",
    four_byte: bool = True,
) -> None:
    """Serialize (ts, json) rows into one kv-pair IR file per partition.

    ``json_col`` holds one JSON object per row (the user-generated kv pairs);
    the timestamp becomes the auto-generated ``timestamp`` key, mirroring how
    reference producers emit auto-gen fields. Rows are ordered by doc_id
    within each partition when present, so streams are deterministic.
    """
    os.makedirs(out_dir, exist_ok=True)
    # deterministic names protect against task RETRIES, not cross-run
    # rewrites: a second write with fewer partitions would leave the
    # tail of the previous run's files for readers to glob back in —
    # clear prior generations first
    for stale in os.listdir(out_dir):
        if stale.startswith(("part-", ".part-")) and ".clp.kvir" in stale:
            os.remove(os.path.join(out_dir, stale))
    cols = [c for c in (ts_col, json_col, "doc_id") if c in df.columns]
    slim = df.select(*cols)
    if "doc_id" in cols:
        slim = slim.sortWithinPartitions("doc_id")

    def per_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ser = KV.KvIrSerializer(four_byte=four_byte)
        n = 0
        for pdf in batches:
            for ts, js in zip(pdf[ts_col], pdf[json_col]):
                auto = {} if pd.isna(ts) else {AUTO_TS_KEY: int(ts)}
                ser.serialize_event(auto, json.loads(js))
                n += 1
        if n:
            ser.eof()
            payload = ser.take()
            from pyspark import TaskContext

            ctx = TaskContext.get()
            pid = ctx.partitionId() if ctx is not None else 0
            name = f"part-{pid:05d}.clp.kvir"
            tmp = os.path.join(out_dir, f".{name}.{uuid.uuid4().hex[:8]}.tmp")
            with open(tmp, "wb") as f:
                f.write(payload)
            os.rename(tmp, os.path.join(out_dir, name))  # atomic publish
        yield pd.DataFrame({"n": [n]})

    slim.mapInPandas(per_partition, schema="n long").count()


def _decode_batches(path_s: pd.Series, content_s: pd.Series) -> pd.DataFrame:
    rows = []
    for path, content in zip(path_s, content_s):
        stream = KV.deserialize_kv_ir_stream(bytes(content))
        short = path.rsplit("/", 1)[-1]
        for i, ev in enumerate(stream.events):
            ts = ev.auto_gen.get(AUTO_TS_KEY)
            rows.append(
                (
                    f"{short}#{i:08d}",
                    short,
                    None if ts is None else int(ts),
                    json.dumps(ev.user_gen, separators=(",", ":")),
                )
            )
    return pd.DataFrame(rows, columns=["doc_id", "source", "ts", "json"])


def _decoder(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield _decode_batches(pdf["path"], pdf["content"])


def read_kv_ir_files(spark: SparkSession, path: str) -> DataFrame:
    """kv IR files -> (doc_id, source, ts, json) rows."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.clp.kvir")
        .load(path)
    )
    return files.select("path", "content").mapInPandas(
        _decoder, schema=KV_READ_SCHEMA
    )


def stream_kv_ir_files(spark: SparkSession, path: str,
                       max_files_per_trigger: int = 8) -> DataFrame:
    """Real-time kv-IR ingestion: readStream over a kv-IR directory."""
    files = (
        spark.readStream.format("binaryFile")
        .schema(_BINARYFILE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "*.clp.kvir")
        .load(path)
    )
    return files.select("path", "content").mapInPandas(
        _decoder, schema=KV_READ_SCHEMA
    )


def kv_ir_ingest(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """kv-IR directory -> typed records with schema_id (kv_ir_search.cpp
    analog: the deserialized kv pairs feed the same per-schema routing and
    KQL filters the NDJSON path uses).

    Pass ``schema`` for the scale path (one scan); otherwise the user-gen
    object schema is inferred with Spark's JSON inference (an extra pass over
    the decoded strings — fine for ad-hoc use, wasteful at 100 TB).
    """
    raw = read_kv_ir_files(spark, path)
    if schema is None:
        schema = spark.read.json(
            raw.select("json").rdd.map(lambda r: r[0])
        ).schema
    elif isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    base = raw.select(
        "doc_id", "source", "ts",
        F.from_json(F.col("json"), schema).alias("_rec"),
    )
    # schema_id over the RECORD leaves only (doc_id/source/ts are transport
    # metadata, not user-gen keys), computed WHILE the record is still a
    # struct so a user-gen key named ts/source/doc_id can't be shadowed —
    # same expression as the NDJSON path, so ids are hash-identical
    from clpspark.sources.json_logs import present_leaves

    base = base.withColumn(
        "schema_id", F.xxhash64(present_leaves(schema, prefix="_rec."))
    )
    # flatten; record fields colliding with the transport columns keep
    # their data under a '<name>_rec' alias instead of crashing the write
    # with duplicate column names (or silently shadowing the user leaf)
    reserved = {"doc_id", "source", "ts", "schema_id"}
    flat = [
        F.col("_rec").getField(f.name).alias(
            f.name if f.name not in reserved else f"{f.name}_rec"
        )
        for f in schema.fields
    ]
    return base.select("doc_id", "source", "ts", *flat, "schema_id")
