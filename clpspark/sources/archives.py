"""Compressed-archive ingestion (tar / tar.gz / tgz / tar.bz2 / zip).

The reference compresses archives member-by-member via libarchive
(clp/LibarchiveReader.cpp; clp/clp/FileCompressor.cpp:271
try_compressing_as_archive). Spark-first: a ``binaryFile`` scan hands each
archive to an Arrow-batched extractor (python stdlib tarfile/zipfile — no
native deps), which emits one row per multiline-assembled log event, exactly
like the plain text-log source; the standard parse stage runs downstream.

Scale note: container formats are not splittable — one archive occupies one
task, the same unit of parallelism as the reference's per-file compression
jobs. Shard large ingests into many archives upstream (the reference's
`--target-encoded-file-size` splitting makes the same assumption).
"""

from __future__ import annotations

import io
import os
import tarfile
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from clpspark.sources.text_logs import EVENTS_SCHEMA, assemble_events

_TAR_EXTS = (".tar", ".tar.gz", ".tgz", ".tar.bz2", ".tbz2")
_ZIP_EXTS = (".zip",)
ARCHIVE_GLOB = "*.{tar,tar.gz,tgz,tar.bz2,tbz2,zip}"


def _iter_members(name: str, payload: bytes) -> Iterator[tuple[str, str]]:
    """(member_name, text) pairs from one archive payload."""
    low = name.lower()
    if low.endswith(_ZIP_EXTS):
        with zipfile.ZipFile(io.BytesIO(payload)) as zf:
            for info in zf.infolist():
                if info.is_dir():
                    continue
                yield info.filename, zf.read(info).decode("utf-8", "replace")
    elif low.endswith(_TAR_EXTS):
        with tarfile.open(fileobj=io.BytesIO(payload)) as tf:
            for member in tf:
                if not member.isfile():
                    continue
                f = tf.extractfile(member)
                if f is not None:
                    yield member.name, f.read().decode("utf-8", "replace")
    else:
        raise ValueError(f"unsupported archive container: {name}")


def read_archive_logs(spark: SparkSession, path: str) -> DataFrame:
    """Archives -> one row per multiline-assembled log event.

    doc_id = <archive>!<member>#<event ix>; source = <archive>!<member>.
    """
    files = spark.read.format("binaryFile").option(
        "pathGlobFilter", ARCHIVE_GLOB
    ).load(path)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, payload in zip(pdf["path"], pdf["content"]):
                short = fpath.rsplit("/", 1)[-1]
                for member, text in _iter_members(short, bytes(payload)):
                    src = f"{short}!{os.path.basename(member)}"
                    for i, ev in enumerate(assemble_events(text)):
                        rows.append((f"{src}#{i:08d}", src, ev))
            yield pd.DataFrame(rows, columns=["doc_id", "source", "message"])

    return files.select("path", "content").mapInPandas(run, schema=EVENTS_SCHEMA)


def ingest_archive_logs(spark: SparkSession, path: str) -> DataFrame:
    """Full archive ingestion: containers -> events -> parsed CLP events."""
    from clpspark.operators.parse import parse_text

    return parse_text(read_archive_logs(spark, path))
