"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


# Logical-plan nodes whose presence means the input is already downstream
# of a shuffle (output partitions = spark.sql.shuffle.partitions): probing
# such a plan with df.rdd would EXECUTE its upstream stages under AQE
# (AdaptiveSparkPlanExec materializes query stages to answer
# getNumPartitions), and actions don't share Exchange reuse — the work
# would be thrown away and repeated.
_SHUFFLE_NODES = ("Join", "Aggregate", "Window", "Repartition", "Sort",
                  "Deduplicate", "GlobalLimit")


def rebalance_for_udf(df: DataFrame) -> DataFrame:
    """Even out input partitions before an expensive python-UDF pass.

    A small single-file parquet input arrives as ONE partition, stranding
    the whole Arrow/python stage on one core (measured: the sf0.1
    shingle pass ran 1-of-32 tasks). At production scale input splits >>
    cores and this no-ops — same guard the pipeline's parse stage uses.

    Shuffle-bearing inputs are returned untouched: they already run at
    shuffle-partition parallelism, and the partition-count probe on an
    adaptive plan would eagerly execute (and then discard) the upstream
    stages.
    """
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    if any(node in plan for node in _SHUFFLE_NODES):
        return df
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
