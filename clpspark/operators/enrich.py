"""Enrich stage: dictionary build + broadcast-join enrichment.

CLP's dictionaries (clp/VariableDictionaryWriter.cpp,
clp/LogTypeDictionaryEntry.cpp) dedup strings to dense u64 ids at ingest.
Spark-first equivalents here:

  - ``zip_with_index``: deterministic, collision-free dense id assignment
    (distinct -> range-partition by value -> per-partition offsets), the
    scalable zipWithIndex pattern — no global window, no per-partition
    counters, parallelism-invariant ids.
  - ``enrich``: broadcast hash join of events against the logtype dictionary
    plus dict-var id fill. Two var-dict strategies:
      * 'map'  (default): the var dict is broadcast as a Python dict into an
        Arrow-batched UDF that fills the null slots of ``encoded_vars`` —
        right when the dict fits in executor memory (CLP bounds dictionary
        size by splitting archives; we mirror that assumption).
      * 'join': posexplode -> shuffle join -> re-assemble; no memory bound,
        strictly more shuffle. Kept for the huge-dict regime and tested equal.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ENRICHED_EXTRA_COLS = ("logtype_id", "var_ids")

# Sentinel id for dict-var strings absent from the dictionary. Batch enrich
# never produces it (the dict is built from the same data), but streaming
# enriches future micro-batches against a fixed pre-built dictionary
# (streaming/ingest.py:stream_route) — the first unseen variable must not
# fail the query. Decode renders it as an <unk> marker.
UNKNOWN_VAR_ID = -1


def zip_with_index(df: DataFrame, value_col: str, id_col: str,
                   num_partitions: int | None = None,
                   already_distinct: bool = False) -> DataFrame:
    """Assign deterministic dense ids 0..N-1 ordered by ``value_col``.

    Scalable two-phase pattern: range-partition + sort by value, compute
    per-partition counts, then offset a per-partition row_number. Ids depend
    only on the value set, not on parallelism. Extra columns of an
    ``already_distinct`` input (e.g. per-value counts) are carried through.
    """
    if num_partitions is None:
        num_partitions = max(df.sparkSession.sparkContext.defaultParallelism, 8)
    if not already_distinct:
        df = df.select(F.col(value_col)).distinct()
    carry = [c for c in df.columns if c != value_col]
    d = (
        df.where(F.col(value_col).isNotNull())
        .repartitionByRange(num_partitions, value_col)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {
        r["_pid"]: r["cnt"]
        for r in d.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if not offsets:
        empty = d.select(
            F.col(value_col), F.lit(None).cast("bigint").alias(id_col), *carry
        ).localCheckpoint(eager=True)
        d.unpersist()
        return empty
    off_expr = F.create_map(
        *[x for pid, off in offsets.items() for x in (F.lit(pid), F.lit(off))]
    )
    w = Window.partitionBy("_pid").orderBy(value_col)
    out = (
        d.withColumn("_local", F.row_number().over(w) - 1)
        .withColumn(id_col, (off_expr[F.col("_pid")] + F.col("_local")).cast("bigint"))
        .select(value_col, id_col, *carry)
    )
    # Materialize eagerly (localCheckpoint RDDs are freed by the
    # ContextCleaner on GC) so d's explicit cache can be released now —
    # a plain persist here leaked storage across repeated dict builds in
    # long-lived bench/scaling sessions.
    out = out.localCheckpoint(eager=True)
    d.unpersist()
    return out


def build_logtype_dict(parsed: DataFrame) -> DataFrame:
    """logtype string -> dense logtype_id + occurrence count.

    One shuffle: groupBy(logtype).count() is both the distinct and the
    dictionary stats (SchemaTree m_count analog); counts also drive the
    route stage's frequency-aware salting.
    """
    counted = parsed.groupBy("logtype").agg(F.count("*").alias("n_rows"))
    return zip_with_index(counted, "logtype", "logtype_id",
                          already_distinct=True)


def build_var_dict(parsed: DataFrame) -> DataFrame:
    """distinct dict-var strings -> dense var_id + occurrence count."""
    counted = (
        parsed.select(F.explode("dict_vars").alias("var_str"))
        .groupBy("var_str")
        .agg(F.count("*").alias("n_occurrences"))
    )
    return zip_with_index(counted, "var_str", "var_id", already_distinct=True)


# JVM-side fill of dict slots from var_ids by position (codegen-friendly,
# tiny per-row arrays). encoded_vars carries no nulls (see parse.py: Arrow
# null-coercion corrupts int64); dict_slots indexes the positions to fill.
_FILL_EXPR = """
    transform(encoded_vars, (v, i) ->
      CASE WHEN array_position(dict_slots, i) > 0
           THEN var_ids[CAST(array_position(dict_slots, i) AS INT) - 1]
           ELSE v END)
"""


def _fill_var_ids_map(parsed: DataFrame, var_map_bc) -> DataFrame:
    """Fill dict slots of encoded_vars via a broadcast Python map.

    Only the ``dict_vars`` column round-trips through Arrow (a scalar
    pandas_udf); every other column stays in the JVM. Shipping whole rows
    through mapInPandas costs ~10x more than the lookup itself.
    """

    @F.pandas_udf("array<bigint>")
    def to_ids(dv: pd.Series) -> pd.Series:
        vm = var_map_bc.value
        return pd.Series([[vm.get(x, UNKNOWN_VAR_ID) for x in row] for row in dv])

    return parsed.withColumn("var_ids", to_ids(F.col("dict_vars"))).withColumn(
        "encoded_vars", F.expr(_FILL_EXPR)
    )


def enrich(
    parsed: DataFrame,
    logtype_dict: DataFrame,
    var_dict: DataFrame,
    mode: str = "auto",
) -> DataFrame:
    """Attach logtype_id (broadcast hash join) and fill dict-var ids.

    ``mode="auto"`` selects the strategy by dictionary size: the python-map
    broadcast while the dictionary is collectable, the shuffle join beyond —
    a tens-of-GB var dictionary at 100 TB must never reach the driver.
    """
    spark = parsed.sparkSession
    if mode == "auto":
        from clpspark.operators.decode import resolve_decode_mode

        # entry-count AND byte-size gated (huge-string dicts must not be
        # collected to the driver even below the entry cap)
        mode = resolve_decode_mode(var_dict)
    if mode == "map":
        var_map = {r["var_str"]: r["var_id"] for r in var_dict.collect()}
        var_map_bc = spark.sparkContext.broadcast(var_map)
        filled = _fill_var_ids_map(parsed, var_map_bc)
    elif mode == "join":
        filled = _fill_var_ids_join(parsed, var_dict)
    else:
        raise ValueError(f"unknown enrich mode: {mode}")
    return filled.join(
        F.broadcast(logtype_dict.select("logtype", "logtype_id")), "logtype", "left"
    )


def _fill_var_ids_join(parsed: DataFrame, var_dict: DataFrame) -> DataFrame:
    """Shuffle-join variant: posexplode dict_vars -> join -> reassemble.

    Used when the var dictionary exceeds broadcastable size. One extra
    shuffle on doc_id; keyed reassembly preserves variable order via pos.
    """
    base = parsed
    exploded = base.select(
        "doc_id", F.posexplode_outer("dict_vars").alias("pos", "var_str")
    )
    joined = exploded.join(var_dict, "var_str", "left")
    ids = joined.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct("pos", "var_id"))
        ).alias("_pv")
    ).select(
        "doc_id",
        F.expr(
            # coalesce: unknown strings (no dict hit) -> UNKNOWN_VAR_ID, and
            # encoded_vars stays null-free (Arrow null-coercion corrupts int64)
            "transform(filter(_pv, x -> x.pos is not null),"
            " x -> coalesce(x.var_id, CAST(-1 AS BIGINT)))"
        ).alias("var_ids"),
    )
    out = base.join(ids, "doc_id", "left").withColumn(
        "var_ids", F.coalesce(F.col("var_ids"), F.array().cast("array<bigint>"))
    )
    # fill dict slots from var_ids by position (JVM-side, codegen'd)
    return out.withColumn(
        "encoded_vars",
        F.expr(
            """
            transform(encoded_vars, (v, i) ->
              CASE WHEN array_position(dict_slots, i) > 0
                   THEN var_ids[CAST(array_position(dict_slots, i) AS INT) - 1]
                   ELSE v END)
            """
        ),
    )
