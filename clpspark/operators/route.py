"""Route stage: GLT-style fan-out of events into per-logtype sinks.

The reference's GLT variant groups all rows of one logtype into its own
columnar table (glt/streaming_archive/writer/LogtypeTable.hpp:13-75). The
Spark-native equivalent is a partitioned write: ``partitionBy(sink_col)``
gives one directory (= sink table) per logtype family.

Skew handling (north rule): logtypes are zipf-heavy — one logtype can be ~40%
of all rows. A plain ``repartition(logtype_id)`` puts the heavy hitter in one
task. We salt the shuffle key with a *deterministic* per-row salt
(pmod(xxhash64(doc_id), salt)) so the hot logtype spreads over ``salt`` tasks
while the partitionBy layout still lands every row in the right sink dir.
AQE skew-join/coalesce remains enabled on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SINK_COL = "logtype_id"


def route(
    enriched: DataFrame,
    out_dir: str,
    salt: int = 8,
    num_partitions: int | None = None,
    sink_col: str = SINK_COL,
    mode: str = "overwrite",
) -> None:
    spark = enriched.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    salted = (
        enriched.withColumn("_salt", F.pmod(F.xxhash64("doc_id"), F.lit(salt)))
        .repartition(num_partitions, F.col(sink_col), F.col("_salt"))
        .drop("_salt")
    )
    salted.write.mode(mode).partitionBy(sink_col).parquet(out_dir)


def read_routed(spark, out_dir: str) -> DataFrame:
    """Read the fan-out back; partition pruning applies on sink_col filters."""
    return spark.read.parquet(out_dir)
