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

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clpspark.ref.timestamps import reinsert_timestamp


def reconstruct_text(
    events: DataFrame,
    var_dict: DataFrame,
    logtype_dict: DataFrame | None = None,
    mode: str = "auto",
) -> DataFrame:
    """Routed/enriched events -> (doc_id, source, line) original text.

    Decode strategy per decode.py (map broadcast while the var dictionary is
    small, join decode beyond — no driver collect on the 100 TB path); the
    logtype string joins back from its dictionary when routed data carries
    ids only. Timestamp re-rendering is a narrow JVM-adjacent UDF pass.
    """
    from clpspark.operators.decode import decode_messages

    decoded = decode_messages(
        events, var_dict, logtype_dict=logtype_dict, mode=mode, out_col="_rest"
    )

    @F.pandas_udf("string")
    def rerender(rest_s: pd.Series, ts_s: pd.Series, pat_s: pd.Series,
                 pos_s: pd.Series) -> pd.Series:
        lines = []
        for rest, ts, pat, pos in zip(rest_s, ts_s, pat_s, pos_s):
            ts_val = None if pd.isna(ts) else int(ts)
            lines.append(reinsert_timestamp(rest, ts_val, int(pat), int(pos)))
        return pd.Series(lines, dtype=object)

    return decoded.select(
        "doc_id",
        "source",
        rerender(
            F.col("_rest"), F.col("ts"), F.col("ts_pattern"), F.col("ts_pos")
        ).alias("line"),
    )


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
