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


# column-metadata key marking reader-minted METADATA columns (schema_id,
# source_file, log_event_idx) so downstream stages can tell them from
# same-named user DATA fields (JSON field names are unrestricted)
META_KEY = "clpspark.meta"


def fresh_name(base: str, taken) -> str:
    """Underscore-probe a name absent from ``taken``. Case-INSENSITIVE:
    Spark resolves columns case-insensitively by default, so 'SOURCE_FILE'
    in the data must push the metadata column off 'source_file' too."""
    low = {t.lower() for t in taken}
    name = base
    while name.lower() in low:
        name = "_" + name
    return name


def meta_col(df: DataFrame, base: str) -> str | None:
    """Resolve the reader-minted metadata column for ``base`` on ``df``:
    prefer the column TAGGED via META_KEY (collision-proof), fall back to
    the plain name for hand-built frames, None when absent entirely."""
    for f in df.schema.fields:
        if f.metadata.get(META_KEY) == base:
            return f.name
    return base if base in df.columns else None


def with_schema_id(df: DataFrame) -> DataFrame:
    """Attach schema_id = xxhash64(sorted list of present leaf paths),
    tagged via META_KEY as reader-minted metadata.

    ``schema_id`` is reserved by the archive format: withColumn would
    silently REPLACE a user data field of that name (round-trip data
    loss), so collide loudly instead."""
    if any(c.lower() == "schema_id" for c in df.columns):
        raise ValueError(
            "'schema_id' is reserved by the archive format; rename the "
            "input field before ingest"
        )
    return df.select(
        "*",
        F.xxhash64(present_leaves(df)).alias(
            "schema_id", metadata={META_KEY: "schema_id"}),
    )


def ordered_meta_names(schema: T.StructType) -> dict[str, str]:
    """Collision-free names for read_ndjson_ordered's metadata columns.

    JSON field names are unrestricted, so a user field named
    ``log_event_idx`` / ``source_file`` must stay data; the reader's
    metadata columns shift to an underscore-probed variant instead.
    Deterministic in the schema — callers (cmd_compress_json) recompute
    it to learn the actual names."""
    taken = {f.name for f in schema.fields}
    out: dict[str, str] = {}
    for base in ("source_file", "log_event_idx"):
        name = fresh_name(base, taken)
        out[base] = name
        taken.add(name)
    return out


def read_ndjson(spark: SparkSession, path: str,
                schema: T.StructType | str | None = None) -> DataFrame:
    """NDJSON -> typed DataFrame with schema_id (clp_s ingest)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return with_schema_id(reader.json(path))


def read_ndjson_ordered(spark: SparkSession, path: str,
                        schema: T.StructType | str | None = None) -> DataFrame:
    """NDJSON -> typed DataFrame with ``schema_id`` plus ``log_event_idx`` =
    the record's original position within its source file.

    The reference delta-encodes a per-event index so decompression can
    reproduce the original log order (clp_s/ColumnWriter.cpp:22-37,
    test-clp_s-delta-encode-log-order.cpp); parquet delta-encodes the
    monotone column natively. Spark-first order recovery that keeps the
    line scan SPLITTABLE (no wholetext single-task-per-file):
    ``_metadata.file_block_start`` orders the splits of a file, and
    ``monotonically_increasing_id`` is monotone within a partition, so
    (block_start, intra-partition id) totally orders the lines of each
    file at any parallelism. ``source_file`` is kept so multi-file inputs
    can order by (source_file, log_event_idx)."""
    from pyspark.sql import Window

    if schema is None:
        schema = spark.read.json(path).schema
    # blank/whitespace-only lines are skipped by the json DataSource read
    # (read_ndjson) but kept by the text scan — drop them BEFORE numbering
    # so both readers agree on indices/row counts for dirty input (trim()
    # strips spaces only; tabs etc. need the \S class)
    if not isinstance(schema, T.StructType):
        schema = T._parse_datatype_string(schema)
    # user fields named like our metadata columns stay data — the
    # metadata shifts to probed names (ordered_meta_names is the contract)
    names = ordered_meta_names(schema)
    sf_col, idx_col = names["source_file"], names["log_event_idx"]
    lines = spark.read.text(path).where(
        F.col("value").rlike(r"\S")
    ).select(
        "value",
        F.col("_metadata.file_path").alias(
            sf_col, metadata={META_KEY: "source_file"}),
        F.col("_metadata.file_block_start").alias("_block"),
        F.monotonically_increasing_id().alias("_mid"),
    )
    w = Window.partitionBy(sf_col).orderBy("_block", "_mid")
    rec = lines.select(
        F.from_json("value", schema).alias("_rec"),
        sf_col,
        (F.row_number().over(w) - 1).cast("long").alias(
            idx_col, metadata={META_KEY: "log_event_idx"}),
    )
    out = rec.select("_rec.*", sf_col, idx_col)
    # schema_id over the DATA leaves only — hash-identical to read_ndjson
    # (reserved name: with_schema_id would raise, so guard here too)
    if any(f.name.lower() == "schema_id" for f in schema.fields):
        raise ValueError(
            "'schema_id' is reserved by the archive format; rename the "
            "input field before ingest"
        )
    return out.select(
        "*",
        F.xxhash64(present_leaves(schema)).alias(
            "schema_id", metadata={META_KEY: "schema_id"}),
    )


def reconstruct_json_ordered(
    df: DataFrame,
    drop_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Ordered decompression (clp_s --ordered analog): rebuild NDJSON
    strings and return them in original ingest order, index included.

    The metadata columns to drop from the JSON and to order by resolve
    via the reader's META_KEY column tags, so a USER data field named
    log_event_idx/source_file/schema_id stays in the JSON and never
    hijacks the sort; plain names are the fallback for untagged frames.
    ``drop_cols`` overrides the drop set entirely when given."""
    meta = [m for m in (meta_col(df, "schema_id"),
                        meta_col(df, "log_event_idx"),
                        meta_col(df, "source_file")) if m is not None]
    drop = set(meta if drop_cols is None else drop_cols)
    cols = [c for c in df.columns if c not in drop]
    order = [m for m in (meta_col(df, "source_file"),
                         meta_col(df, "log_event_idx"))
             if m is not None and m in df.columns]
    q = [F.col("`{}`".format(c.replace("`", "``"))) for c in cols]
    return df.select(
        *order, F.to_json(F.struct(*q)).alias("json")
    ).orderBy(*order)


def route_by_schema(df: DataFrame, out_dir: str, salt: int = 4) -> None:
    """Per-schema columnar tables (ArchiveWriter per-schema SchemaWriter)."""
    from clpspark.operators.route import route

    route(df, out_dir, salt=salt, sink_col="schema_id")


def reconstruct_json(df: DataFrame, drop_cols: tuple[str, ...] = ("schema_id",)):
    """Rebuild NDJSON strings (JsonConstructor analog): null keys dropped."""
    cols = [c for c in df.columns if c not in drop_cols]
    return df.select(F.to_json(F.struct(*cols)).alias("json"))
