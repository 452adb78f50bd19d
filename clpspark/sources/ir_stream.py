"""CLP IR stream source/sink — Spark integration of the wire format.

The reference ingests IR streams in real time (logging libraries emit them;
clp/clp/IrMessageParser + job_orchestration compression workers consume them)
and can extract IR chunks back out (extract_stream_task.py). Spark-first
equivalents:

  - ``write_ir_files``: partition-parallel sink; every task serializes its
    rows into one ``.clp.ir`` file (the incremental-archive chunk analog).
  - ``read_ir_files``: ``binaryFile`` scan -> Arrow-batched deserialize +
    4->8-byte upgrade -> the SAME parsed-event schema the batch parse stage
    emits, so enrich/route/search run unchanged on IR input.
  - ``stream_ir_files``: the real-time path — ``readStream`` over a directory
    of IR files feeding the same decoder (file-arrival == stream ingestion,
    exactly how the reference's compression scheduler tails IR directories).

Files are the unit of parallelism (an IR stream is sequential by nature —
timestamp deltas chain); producers shard streams into files/chunks, which is
also the reference's model (one IR stream per origin log file).
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from clpspark.operators.parse import PARSED_SCHEMA
from clpspark.ref import ir_format as IR

_BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def write_ir_files(
    df: DataFrame,
    out_dir: str,
    four_byte: bool = True,
    ts_col: str = "ts",
    msg_col: str = "message",
) -> None:
    """Serialize (ts, message) rows into one IR file per input partition.

    Rows are ordered by (doc_id) within each partition when present so the
    4-byte delta chain is deterministic.
    """
    os.makedirs(out_dir, exist_ok=True)
    # deterministic names protect against task RETRIES, not cross-run
    # rewrites: a second write with fewer partitions would leave the
    # tail of the previous run's files for readers to glob back in —
    # clear prior generations first
    for stale in os.listdir(out_dir):
        if stale.startswith(("part-", ".part-")) and ".clp.ir" in stale:
            os.remove(os.path.join(out_dir, stale))
    cols = [c for c in (ts_col, msg_col, "doc_id") if c in df.columns]
    slim = df.select(*cols)
    if "doc_id" in cols:
        slim = slim.sortWithinPartitions("doc_id")

    def per_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        events: list[tuple[int, str]] = []
        for pdf in batches:
            for ts, msg in zip(pdf[ts_col], pdf[msg_col]):
                events.append((0 if pd.isna(ts) else int(ts), msg or ""))
        if events:
            payload = IR.serialize_ir_stream(events, four_byte=four_byte)
            # deterministic per-partition name: a retried / speculatively
            # re-executed task atomically REPLACES its own file instead of
            # publishing a duplicate under a fresh random name
            from pyspark import TaskContext

            ctx = TaskContext.get()
            pid = ctx.partitionId() if ctx is not None else 0
            name = f"part-{pid:05d}.clp.ir"
            tmp = os.path.join(out_dir, f".{name}.{uuid.uuid4().hex[:8]}.tmp")
            with open(tmp, "wb") as f:
                f.write(payload)
            os.rename(tmp, os.path.join(out_dir, name))  # atomic publish
            yield pd.DataFrame({"n": [len(events)]})
        else:
            yield pd.DataFrame({"n": [0]})

    # mapInPandas as a side-effecting sink: the count() action drives the
    # distributed write (same shape as foreachPartition, but Arrow-batched)
    slim.mapInPandas(per_partition, schema="n long").count()


def _decode_batches(path_s: pd.Series, content_s: pd.Series) -> pd.DataFrame:
    rows = []
    for path, content in zip(path_s, content_s):
        stream = IR.deserialize_ir_stream(bytes(content))
        short = path.rsplit("/", 1)[-1]
        for i, ev in enumerate(stream.events):
            lt, evars, dvars, dslots = IR.upgrade_event(ev, stream.four_byte)
            rows.append(
                (
                    f"{short}#{i:08d}",
                    short,
                    0,
                    ev.ts,
                    -1,  # no embedded timestamp text: pattern index n/a
                    0,
                    lt,
                    evars,
                    dvars,
                    dslots,
                )
            )
    return pd.DataFrame(
        rows,
        columns=[
            "doc_id", "source", "n_tok", "ts", "ts_pattern", "ts_pos",
            "logtype", "encoded_vars", "dict_vars", "dict_slots",
        ],
    )


def _decoder(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield _decode_batches(pdf["path"], pdf["content"])


def read_ir_files(spark: SparkSession, path: str) -> DataFrame:
    """IR files -> parsed-event DataFrame (4-byte vars upgraded to 8-byte);
    schema-compatible with parse_sequences output.

    pathGlobFilter on the directory, NOT a glob in load(): a glob path makes
    Spark's FileStreamSink.hasMetadata stat the literal '*.clp.ir' string and
    log a recovered FileNotFoundException stack trace into stderr."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.clp.ir")
        .load(path)
    )
    return files.select("path", "content").mapInPandas(
        _decoder, schema=PARSED_SCHEMA
    )


def extract_ir_chunks(
    events: DataFrame,
    var_dict: DataFrame,
    out_dir: str,
    logtype_dict: DataFrame | None = None,
    four_byte: bool = True,
) -> None:
    """Archive -> IR extraction (the reference's extract_stream_task.py):
    decode routed/enriched events and re-serialize them as IR chunk files.
    Decode strategy per decode.py (join path for huge dictionaries)."""
    from clpspark.operators.decode import decode_messages

    decoded = decode_messages(events, var_dict, logtype_dict=logtype_dict)
    write_ir_files(decoded, out_dir, four_byte=four_byte)


def stream_ir_files(spark: SparkSession, path: str,
                    max_files_per_trigger: int = 8) -> DataFrame:
    """Real-time IR ingestion: readStream over an IR directory -> parsed
    events (feed to stream_route / stream_count_by_time unchanged)."""
    files = (
        spark.readStream.format("binaryFile")
        .schema(_BINARYFILE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "*.clp.ir")
        .load(path)
    )
    return files.select("path", "content").mapInPandas(
        _decoder, schema=PARSED_SCHEMA
    )
