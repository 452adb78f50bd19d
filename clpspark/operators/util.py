"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def rebalance_for_udf(df: DataFrame) -> DataFrame:
    """Even out input partitions before an expensive python-UDF pass.

    A small single-file parquet input arrives as ONE partition, stranding
    the whole Arrow/python stage on one core (measured: the sf0.1
    shingle pass ran 1-of-32 tasks). At production scale input splits >>
    cores and this no-ops — same guard the pipeline's parse stage uses
    (pipeline.py _sequences).
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
