"""Network socket results sink (clp clo NetworkOutputHandler analog).

The reference streams each matched message to a host:port as one
msgpack-packed 5-tuple ``(timestamp, message, orig_file_path,
orig_file_id, log_event_ix)`` over a long-lived TCP connection
(clp/clo/OutputHandler.cpp:20-44; clp_s/OutputHandlerImpl.cpp:39-54
sends the same tuple with archive_id in the file-id slot and an empty
path). Spark re-expression: ``foreachPartition`` — each task opens its
own connection and streams its partition, so results never pass through
the driver and N partitions fan out over N connections (the reference
gets the same effect from one connection per worker process).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

RESULT_COLS = ("timestamp", "message", "orig_file_path", "orig_file_id",
               "log_event_ix")


def _as_result_tuples(
    df: DataFrame,
    ts_col: str | None,
    message_col: str,
    path_col: str | None,
    file_id_col: str | None,
    ix_col: str | None,
) -> DataFrame:
    """Project to the wire tuple's five slots (missing slots get the
    reference's placeholders: 0 ts, empty strings, 0 ix)."""

    def col_or(name: str | None, default):
        return F.col(name) if name and name in df.columns else F.lit(default)

    # try_cast, not cast: the ix slot often rides an id column that may be
    # a string (the pipeline's doc_id is "doc<n>"), and ANSI cast throws.
    # A trailing digit run recovers the event index from such ids; anything
    # else falls to the reference's 0/"" value-type placeholders.
    ix = col_or(ix_col, 0)
    return df.select(
        F.coalesce(col_or(ts_col, 0).try_cast("long"),
                   F.lit(0)).alias("timestamp"),
        F.coalesce(F.col(message_col).cast("string"),
                   F.lit("")).alias("message"),
        F.coalesce(col_or(path_col, "").cast("string"),
                   F.lit("")).alias("orig_file_path"),
        F.coalesce(col_or(file_id_col, "").cast("string"),
                   F.lit("")).alias("orig_file_id"),
        F.coalesce(
            ix.try_cast("long"),
            F.regexp_extract(ix.cast("string"), r"(\d+)$", 1)
            .try_cast("long"),
            F.lit(0),
        ).alias("log_event_ix"),
    )


def send_results_to_socket(
    df: DataFrame,
    host: str,
    port: int,
    ts_col: str | None = "ts",
    message_col: str = "message",
    path_col: str | None = "source",
    file_id_col: str | None = None,
    ix_col: str | None = "doc_id",
    connect_timeout: float = 10.0,
) -> None:
    """Stream search results to ``host:port``, one msgpack tuple each.

    Executor-side: each partition task connects, streams, closes — no
    driver collect, no shuffle. Nulls follow the placeholder rule above
    (the reference never sends nulls; its slots are value types).
    """
    wire = _as_result_tuples(
        df, ts_col, message_col, path_col, file_id_col, ix_col)

    def send_partition(rows) -> None:
        import socket

        from clpspark.sinks.msgpack_lite import packb

        first = next(rows, None)
        if first is None:
            return  # empty partition: don't open a connection
        sock = socket.create_connection((host, port),
                                        timeout=connect_timeout)
        # the timeout bounds CONNECT only: a slow consumer filling the
        # TCP window must not fail the task mid-stream (a retry would
        # re-send the whole partition — duplicate tuples on the wire)
        sock.settimeout(None)
        try:
            # batch packed tuples so small results don't syscall per row
            buf = bytearray()
            for row in _chain_one(first, rows):
                buf += packb([
                    row["timestamp"] if row["timestamp"] is not None else 0,
                    row["message"] or "",
                    row["orig_file_path"] or "",
                    row["orig_file_id"] or "",
                    (row["log_event_ix"]
                     if row["log_event_ix"] is not None else 0),
                ])
                if len(buf) >= 1 << 20:
                    sock.sendall(buf)
                    buf.clear()
            if buf:
                sock.sendall(buf)
        finally:
            sock.close()

    wire.foreachPartition(send_partition)


def _chain_one(first, rest):
    yield first
    yield from rest


def stream_results_to_socket(
    stream_df: DataFrame,
    host: str,
    port: int,
    checkpoint_dir: str,
    **cols,
):
    """Structured-streaming variant: ``foreachBatch`` re-uses the batch
    writer per micro-batch (real-time search fan-out; the reference's clo
    keeps one handler per search job)."""
    return (
        stream_df.writeStream
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(
            lambda batch, _id: send_results_to_socket(
                batch, host, port, **cols)
        )
        .start()
    )
