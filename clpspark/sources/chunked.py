"""Chunked ordered extraction — clp-s ``x --ordered
--target-ordered-chunk-size`` (JsonConstructor.cpp:97-175) as a Spark job.

The reference walks records in log order, accumulates marshalled bytes,
and cuts a new output file once the running size reaches the target,
naming each chunk ``{stream}_{first_idx}_{last_idx+1}{suffix}`` (end
exclusive) and recording a manifest entry (path, stream id, begin/end
event ix, is_last_chunk) per chunk (the stream-extraction workflow's
chunk metadata, extract_stream_task.py writes the same shape for IR).

Spark shape: chunk membership is a pure function of the byte prefix-sum
in event order — ``chunk = floor(bytes_before_event / target)`` — so it
distributes as the classic two-pass running sum (range-partition by
order key -> per-partition byte totals -> tiny driver cumulative offset
per partition -> in-partition cumsum), then ONE shuffle keyed on
(stream, chunk) where each ~target-sized chunk is written by its own
task. No global sort funnel, no driver residency of event data. Chunks
are target-ATTAINING like the reference's (a record straddling the
boundary belongs to the chunk where its first byte landed; the
reference puts it in the earlier chunk — boundary placement of single
records may differ, byte-completeness and ordering are identical).
"""

from __future__ import annotations

import os
import re
import uuid
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MANIFEST_SCHEMA = (
    "stream string, path string, first_idx long, last_idx long, "
    "n_bytes long"
)
# our own chunk naming — pre-write cleanup removes ONLY files matching it
# (a user's unrelated files in out_dir are not ours to delete)
_CHUNK_NAME_RE = re.compile(r".+_\d+_\d+$")


def _safe_stream_name(s: str) -> str:
    out = "".join(c if (c.isalnum() or c in "._-") else "_" for c in s)
    return out.lstrip(".") or "_"


def _safe_names(streams: list[str]) -> dict[str, str]:
    """Collision-free sanitized filename per stream: two sources that
    sanitize identically ('a/b.log' vs 'a_b.log') suffix instead of
    silently overwriting each other's chunks (cmd_extract's member-name
    guard, applied per stream)."""
    out: dict[str, str] = {}
    used: set[str] = set()
    for s in sorted(streams):
        name = _safe_stream_name(s)
        if name in used:
            i = 1
            while f"{name}.{i}" in used:
                i += 1
            name = f"{name}.{i}"
        used.add(name)
        out[s] = name
    return out


def write_ordered_chunks(
    df: DataFrame,
    out_dir: str,
    target_chunk_bytes: int,
    order_col: str,
    line_col: str = "json",
    stream_col: str | None = None,
    stream_id: str = "archive",
    suffix: str = ".jsonl",
) -> list[dict]:
    """Write ``line_col`` rows (newline-terminated) in ``order_col`` order
    as size-targeted chunk files; returns the chunk manifest
    (stream / path / first_idx / last_idx-exclusive / n_bytes / is_last),
    ordered. ``target_chunk_bytes=0`` disables chunking (one file per
    stream, the reference's default). ``stream_col`` chunks each stream
    independently (per-source text extraction); None = one stream named
    ``stream_id`` (archive-global JSON order)."""
    spark = df.sparkSession
    os.makedirs(out_dir, exist_ok=True)
    for stale in os.listdir(out_dir):
        full = os.path.join(out_dir, stale)
        if os.path.isdir(full):
            continue
        is_ours = (stale.endswith(suffix)
                   and _CHUNK_NAME_RE.match(stale[: -len(suffix)]))
        is_tmp = stale.startswith(".") and suffix + "." in stale
        if is_ours or is_tmp:
            os.remove(full)

    stream = (F.col(stream_col).cast("string") if stream_col
              else F.lit(stream_id))
    sized = df.select(
        stream.alias("_stream"),
        F.col(order_col).cast("long").alias("_ord"),
        F.col(line_col).alias("_line"),
        (F.octet_length(line_col) + F.lit(1)).alias("_bytes"),
    )
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # _pid is baked into the DATA during the eager checkpoint (its own
    # stage, where spark_partition_id() == the range-partition index);
    # TaskContext.partitionId() in the later passes would be the STAGE
    # partition id, which renumbers when a consumer unions this output
    # with other children.
    part = (
        sized.repartitionByRange(npart, "_stream", "_ord")
        .sortWithinPartitions("_stream", "_ord")
        .withColumn("_pid", F.spark_partition_id())
        # pin partitions: the offset pass and the chunk pass must see the
        # SAME rows in the same partitions (GC-released, not a cache leak)
        .localCheckpoint(eager=True)
    )

    def _totals(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = -1
        acc: dict[str, int] = {}
        bad = 0
        for pdf in batches:
            if len(pdf):
                pid = int(pdf["_pid"].iloc[0])
            bad += int(pdf["_ord"].isna().sum())
            for s, b in pdf.groupby("_stream")["_bytes"].sum().items():
                acc[s] = acc.get(s, 0) + int(b)
        if acc or bad:
            yield pd.DataFrame(
                {"pid": pid, "stream": list(acc) or [""],
                 "total": list(acc.values()) or [0],
                 "n_null_ord": [bad] + [0] * (max(len(acc), 1) - 1)}
            )

    rows = part.mapInPandas(
        _totals, "pid int, stream string, total long, n_null_ord long"
    ).collect()  # bounded: one row per (partition, stream)
    n_null = sum(r["n_null_ord"] for r in rows)
    if n_null:
        raise ValueError(
            f"{n_null} rows have a null/non-numeric '{order_col}' order "
            "key — chunked ordered extraction needs a numeric event index "
            "on every row"
        )
    safe = _safe_names(sorted({r["stream"] for r in rows if r["total"]}))
    offsets: dict[tuple[int, str], int] = {}
    running: dict[str, int] = {}
    for r in sorted(rows, key=lambda r: (r["stream"], r["pid"])):
        if not r["total"] and r["stream"] == "":
            continue  # null-count-only marker row
        offsets[(r["pid"], r["stream"])] = running.get(r["stream"], 0)
        running[r["stream"]] = running.get(r["stream"], 0) + r["total"]

    target = int(target_chunk_bytes)

    def _assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = -1
        local: dict[str, int] = {}
        for pdf in batches:
            if len(pdf) and pid < 0:
                pid = int(pdf["_pid"].iloc[0])
            before = []
            for s, b in zip(pdf["_stream"], pdf["_bytes"]):
                cum = local.get(s, offsets.get((pid, s), 0))
                before.append(cum)
                local[s] = cum + int(b)
            chunk = ([b // target for b in before] if target > 0
                     else [0] * len(before))
            yield pd.DataFrame({
                "_stream": pdf["_stream"], "_chunk": chunk,
                "_ord": pdf["_ord"], "_line": pdf["_line"],
            })

    assigned = part.mapInPandas(
        _assign, "_stream string, _chunk long, _ord long, _line string"
    )

    def _write(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_ord")
        stream = safe[str(pdf["_stream"].iloc[0])]
        first = int(pdf["_ord"].iloc[0])
        last_excl = int(pdf["_ord"].iloc[-1]) + 1
        payload = ("\n".join(pdf["_line"]) + "\n").encode("utf-8")
        name = f"{stream}_{first}_{last_excl}{suffix}"
        tmp = os.path.join(out_dir, f".{name}.{uuid.uuid4().hex[:8]}.tmp")
        with open(tmp, "wb") as f:
            f.write(payload)
        os.rename(tmp, os.path.join(out_dir, name))  # atomic publish
        return pd.DataFrame(
            [(str(pdf["_stream"].iloc[0]), os.path.join(out_dir, name),
              first, last_excl, len(payload))],
            columns=["stream", "path", "first_idx", "last_idx", "n_bytes"],
        )

    manifest = [
        r.asDict()
        for r in assigned.groupBy("_stream", "_chunk")
        .applyInPandas(_write, _MANIFEST_SCHEMA)
        .collect()  # bounded: one row per chunk
    ]
    manifest.sort(key=lambda m: (m["stream"], m["first_idx"]))
    last_per_stream = {m["stream"]: m["first_idx"] for m in manifest}
    for m in manifest:
        m["is_last"] = m["first_idx"] == last_per_stream[m["stream"]]
    return manifest
