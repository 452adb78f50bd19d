"""Text reconstruction sink — CLP decompression as a Spark operator.

Inverse of the parse stage (clp/clp/FileDecompressor.hpp:29,
EncodedVariableInterpreter.hpp:362-435 decode_variables_into_message +
TimestampPattern re-render): decode each routed row back to its original log
line, re-inserting the timestamp at its recorded position, and optionally
restore original file order (ordered decompression via the per-file event
index, clp_s delta-encoded log_event_idx analog — our doc_id is the stable
order key).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clpspark.ref import encoder as E
from clpspark.ref.timestamps import reinsert_timestamp


def reconstruct_text(events: DataFrame, var_dict: DataFrame) -> DataFrame:
    """Routed/enriched events -> (doc_id, source, line) original text."""
    spark = events.sparkSession
    var_map = {r["var_id"]: r["var_str"] for r in var_dict.collect()}
    bc = spark.sparkContext.broadcast(var_map)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vm = bc.value
        for pdf in batches:
            lines = []
            for lt, ev, ds, ts, pat, pos in zip(
                pdf["logtype"], pdf["encoded_vars"], pdf["dict_slots"],
                pdf["ts"], pdf["ts_pattern"], pdf["ts_pos"],
            ):
                slots = set(int(x) for x in ds)
                evs = [None if i in slots else int(v) for i, v in enumerate(ev)]
                dvs = [vm[int(ev[i])] for i in sorted(slots)]
                rest = E.decode_message(lt, evs, dvs)
                ts_val = None if pd.isna(ts) else int(ts)
                lines.append(
                    reinsert_timestamp(rest, ts_val, int(pat), int(pos))
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "source": pdf["source"],
                    "line": lines,
                }
            )

    return events.mapInPandas(run, schema="doc_id string, source string, line string")


def write_text(reconstructed: DataFrame, out_dir: str,
               ordered: bool = True) -> None:
    """Write reconstructed lines as text, one directory per source, in
    original order (orderBy doc_id = ordered decompression)."""
    df = reconstructed
    if ordered:
        df = df.repartitionByRange(
            int(df.sparkSession.conf.get("spark.sql.shuffle.partitions")),
            "source", "doc_id",
        ).sortWithinPartitions("source", "doc_id")
    df.select("source", "line").write.mode("overwrite").partitionBy(
        "source"
    ).text(out_dir)
