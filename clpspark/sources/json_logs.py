"""Semi-structured (NDJSON) ingestion — the clp_s path, Spark-first.

clp_s infers a Merged Parse Tree of (parent, key, type) nodes at ingest
(clp_s/JsonParser.cpp:326-483), assigns each record a schema_id = the set of
leaf nodes present (clp_s/SchemaMap.cpp), and stores one columnar table per
schema (clp_s/SchemaWriter.hpp). Spark equivalents:

  - schema inference: spark.read.json (Catalyst's inferred StructType is the
    MPT; per-key type unioning included)
  - schema_id: xxhash64 over the sorted list of present leaf paths — computed
    with built-in Column ops from the static schema (null = absent, exactly
    clp_s's presence semantics)
  - per-schema tables: route/partitionBy(schema_id) — same fan-out operator
    as the GLT per-logtype route
  - reconstruction: to_json drops null fields, mirroring
    SchemaReader::generate_json_string ordering by the inferred schema
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def leaf_paths(schema: T.StructType, prefix: str = "") -> list[str]:
    """All leaf column paths of a (possibly nested) schema — the MPT leaves."""
    out: list[str] = []
    for f in schema.fields:
        path = f"{prefix}{f.name}"
        if isinstance(f.dataType, T.StructType):
            out.extend(leaf_paths(f.dataType, path + "."))
        else:
            out.append(path)
    return out


def present_leaves(df, prefix: str = "") -> F.Column:
    """Sorted array of the leaf paths present (non-null) in each record —
    clp_s's per-record leaf set (null is how Spark represents an absent key).

    ``df`` may be a DataFrame or a StructType; ``prefix`` lets callers
    address leaves still nested under a struct column (kv-IR ingest passes
    ``"_rec."`` so its schema_id is hash-identical to the NDJSON path's)."""
    schema = df if not hasattr(df, "schema") else df.schema
    leaves = leaf_paths(schema)
    return F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        F.col(prefix + p).isNotNull(), F.lit(p)
                    ).otherwise(F.lit(None))
                    for p in leaves
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )


def with_schema_id(df: DataFrame) -> DataFrame:
    """Attach schema_id = xxhash64(sorted list of present leaf paths)."""
    return df.withColumn("schema_id", F.xxhash64(present_leaves(df)))


def read_ndjson(spark: SparkSession, path: str,
                schema: T.StructType | str | None = None) -> DataFrame:
    """NDJSON -> typed DataFrame with schema_id (clp_s ingest)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return with_schema_id(reader.json(path))


def route_by_schema(df: DataFrame, out_dir: str, salt: int = 4) -> None:
    """Per-schema columnar tables (ArchiveWriter per-schema SchemaWriter)."""
    from clpspark.operators.route import route

    route(df, out_dir, salt=salt, sink_col="schema_id")


def reconstruct_json(df: DataFrame, drop_cols: tuple[str, ...] = ("schema_id",)):
    """Rebuild NDJSON strings (JsonConstructor analog): null keys dropped."""
    cols = [c for c in df.columns if c not in drop_cols]
    return df.select(F.to_json(F.struct(*cols)).alias("json"))
