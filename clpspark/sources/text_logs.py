"""Unstructured text-log source with multiline event assembly.

The reference's MessageParser buffers lines: a line with a parseable
timestamp starts a new log event; timestamp-less lines append to the previous
event (clp/MessageParser.cpp:84-165). Files are the unit of parallelism in
CLP's ingestion (one compression-task per file group); we mirror that with a
whole-file read -> per-file event assembly in an Arrow-batched UDF, then the
standard parse stage.

Scale note: wholetext=true keeps a file in one task (required: multiline
grouping is inherently sequential within a file). Very large single files
should be pre-split upstream at event boundaries — the same constraint CLP's
`--target-encoded-file-size` file splitting addresses.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clpspark.ref.timestamps import search_known_ts_patterns

EVENTS_SCHEMA = "doc_id string, source string, message string"


def assemble_events(text: str) -> list[str]:
    """Group raw lines into log events (MessageParser semantics)."""
    events: list[str] = []
    cur: list[str] | None = None
    for line in text.splitlines():
        if search_known_ts_patterns(line) is not None or cur is None:
            if cur is not None:
                events.append("\n".join(cur))
            cur = [line]
        else:
            cur.append(line)
    if cur is not None:
        events.append("\n".join(cur))
    return events


def read_text_logs(
    spark: SparkSession,
    path: str | list[str],
    remove_path_prefix: str | None = None,
) -> DataFrame:
    """Text files -> one row per multiline-assembled event.

    doc_id = <file>#<event index> (stable within a file). ``path`` may be
    a directory/glob or an explicit file list (clp ``--files-from``).
    source = file basename, or — when ``remove_path_prefix`` is set — the
    full path with that prefix stripped (clp ``--remove-path-prefix``,
    CommandLineArguments.cpp's path adjustment; the reference stores the
    adjusted path as the file's archived path).
    """
    files = spark.read.text(path, wholetext=True).withColumn(
        "_file", F.input_file_name()
    )

    def source_name(fname: str) -> str:
        # input_file_name() is a percent-encoded URI — decode before any
        # name/prefix handling or paths with spaces etc. never match
        from urllib.parse import unquote

        p = unquote(fname)
        if p.startswith("file:"):
            p = "/" + p[5:].lstrip("/")
        if remove_path_prefix is None:
            return p.rsplit("/", 1)[-1]
        if p.startswith(remove_path_prefix):
            p = p[len(remove_path_prefix):].lstrip("/")
        return p

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for text, fname in zip(pdf["value"], pdf["_file"]):
                short = source_name(fname)
                for i, ev in enumerate(assemble_events(text or "")):
                    rows.append((f"{short}#{i:08d}", short, ev))
            yield pd.DataFrame(rows, columns=["doc_id", "source", "message"])

    return files.mapInPandas(run, schema=EVENTS_SCHEMA)


def ingest_text_logs(
    spark: SparkSession,
    path: str | list[str],
    remove_path_prefix: str | None = None,
) -> DataFrame:
    """Full unstructured ingestion: files -> events -> parsed CLP events."""
    from clpspark.operators.parse import parse_text

    return parse_text(
        read_text_logs(spark, path, remove_path_prefix=remove_path_prefix)
    )
