"""Snapshot-atomic table commits + file-level skipping stats.

SURVEY §1.5 maps CLP's archive metadata database onto an Iceberg-style
table layout. The real Iceberg runtime isn't available in this sandbox, so
this module implements the three properties the mapping actually relies on,
directly over parquet:

1. **Snapshot-atomic multi-table commit** — one pipeline run writes several
   tables (routed fan-out, dictionaries, aggregates). The reference commits
   an archive's metadata to its DB in one transaction as the archive
   completes (job-orchestration compression_task.py:404-489); Iceberg does
   the same with a manifest + atomic pointer swap. Here: a manifest JSON
   listing the EXACT data files of every table in the snapshot, published
   with write-to-temp + ``os.replace`` of a tiny pointer file. Readers that
   go through :meth:`SnapshotStore.read_table` see either the old snapshot
   or the new one, never a half-published commit. Caveat (single-writer
   contract): this guards the PUBLISH step; it does not make old versions
   immortal under writers that rewrite table files in place — Spark's
   ``mode=overwrite`` deletes the files older manifests point to, so
   time travel and long-lived readers require append-only/fresh-named
   writes per run (true Iceberg keeps unique file names for this reason).
   The pipeline re-publishes a fresh snapshot whenever any stage re-ran.

2. **File-level min/max stats** — per data file of the routed table:
   ``n_rows, min_ts, max_ts``. A time-bounded query drops whole files from
   the read plan before Spark even lists/opens their footers — the analog
   of the reference's per-segment timestamp ranges in the metadata DB
   (clp/streaming_archive/writer/Archive.cpp:487-526) and of Iceberg
   manifest-level pruning. Parquet row-group pruning still applies inside
   the surviving files.

3. **Bloom membership on dictionary-variable ids** — parquet keeps no
   useful stats for ids *inside* the ``encoded_vars`` array, so a
   dict-var-constrained grep must otherwise scan every file of a candidate
   sink partition. Per file we store a small Bloom filter (k hash
   positions, m bits) over the dict-var ids it contains; the grep engine
   skips files that provably lack a required variable. False positives
   only — correctness never depends on the filter, exactly like the
   engine's other pre-filters.

Scale bound: a per-file stats entry is ~300 bytes (256-byte bloom + ts
bounds), collected to the driver and stored in one manifest JSON. That is
comfortable to ~100k files per table (≈30 MB manifest); beyond it, shard
the manifest into per-partition manifest files and prune hierarchically —
exactly why Iceberg has a manifest-list level. The file-count itself is
bounded upstream: the route stage's frequency-aware salting targets
O(sinks + heavy-sink-splits) files, not O(tasks x sinks).

Hash parity note: bloom positions are computed with Spark's ``xxhash64``
(salted with a literal seed column). Probe-side positions are computed by
the SAME Spark expression over the candidate ids (a one-row-per-id local
job), so build and probe agree by construction — no Python reimplementation
of Spark's hash to drift out of sync.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Bloom sizing: m=2048 bits / k=2 keeps the per-file overhead at 256 bytes
# and the false-positive rate under ~6% at 250 distinct dict vars per file
# ((1-e^(-kn/m))^k). Files at real scale hold more rows but not many more
# DISTINCT dict vars per sink (a sink is one logtype family); bump
# ``bloom_bits`` at build time if vocabulary-per-file grows.
BLOOM_BITS = 2048
BLOOM_SEEDS = (101, 202)

_DICT_VAR_IDS = "transform(dict_slots, s -> encoded_vars[s])"


def _rel(file_uri: str, root: str) -> str:
    p = file_uri[7:] if file_uri.startswith("file://") else file_uri
    root = os.path.abspath(root)
    return os.path.relpath(p, root)


def collect_file_stats(
    routed: DataFrame,
    root: str,
    bloom_bits: int = BLOOM_BITS,
) -> list[dict]:
    """Per-data-file skipping stats for a routed fan-out.

    One column-pruned scan feeds two aggregations: (a) per-file row count +
    ts min/max, (b) per-file distinct bloom-bit positions of the dict-var
    ids (explode → pmod(xxhash64(id, seed), m) → collect_set). Both group
    by ``input_file_name()`` — output is #files rows, tiny relative to the
    data, same shape as an Iceberg manifest.
    """
    # ONE scan + ONE shuffle: posexplode_outer keeps empty-array rows (as a
    # null element), so per-file row counts and ts bounds come from the same
    # exploded frame as the bloom positions (rows = elements with index 0 or
    # null; min/max ts are explode-invariant). Map-side partial aggregation
    # collapses the exploded rows to per-file position sets (≤ bloom_bits
    # entries each) before anything moves.
    #
    # The same pass also yields the route stage's per-sink audit inputs
    # (sink_audit_from_stats): partitionBy layout means one file ⊂ one sink,
    # so per-file (logtype_id, doc_id-XOR checksum) roll up exactly.
    cols = set(routed.columns)
    ex = routed.select(
        F.input_file_name().alias("file"),
        "ts",
        *(["logtype_id"] if "logtype_id" in cols else []),
        *(["doc_id"] if "doc_id" in cols else []),
        F.posexplode_outer(F.expr(_DICT_VAR_IDS)).alias("i", "v"),
    )
    is_row = F.col("i").isNull() | (F.col("i") == 0)
    # xxhash64(NULL, seed) is a non-null constant — guard the padding rows
    # posexplode_outer emits for empty arrays, or every dict-var-less file
    # gets a spurious bloom bit (collect_set skips nulls)
    pos_sets = [
        F.collect_set(
            F.when(
                F.col("v").isNotNull(),
                F.pmod(F.xxhash64(F.col("v"), F.lit(seed)), F.lit(bloom_bits)),
            )
        ).alias(f"s{j}")
        for j, seed in enumerate(BLOOM_SEEDS)
    ]
    extra = []
    if "logtype_id" in cols:
        extra.append(F.first("logtype_id").alias("logtype_id"))
    if "doc_id" in cols:
        # aggregates skip nulls: only each row's first exploded element
        # contributes, so duplicates can't cancel the XOR
        extra.append(
            F.expr("bit_xor(CASE WHEN i IS NULL OR i = 0 "
                   "THEN xxhash64(doc_id) END)").alias("checksum")
        )
    rows = (
        ex.groupBy("file")
        .agg(
            F.count(F.when(is_row, 1)).alias("n_rows"),
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
            *extra,
            *pos_sets,
        )
        .collect()
    )
    out = []
    for r in rows:
        bits = bytearray(bloom_bits // 8)
        for j in range(len(BLOOM_SEEDS)):
            for p in r[f"s{j}"]:
                bits[p // 8] |= 1 << (p % 8)
        d = {
            "file": _rel(r["file"], root),
            "n_rows": r["n_rows"],
            "min_ts": r["min_ts"],
            "max_ts": r["max_ts"],
            "bloom_bits": bloom_bits,
            "bloom": bytes(bits).hex(),
        }
        if "logtype_id" in cols:
            d["logtype_id"] = r["logtype_id"]
        if "doc_id" in cols:
            d["checksum"] = r["checksum"]
        out.append(d)
    out.sort(key=lambda d: d["file"])
    return out


def collect_file_stats_and_var_index(
    routed: DataFrame,
    root: str,
    bloom_bits: int = BLOOM_BITS,
):
    """Fused post-route metadata pass: per-file stats AND the
    (var_id, logtype_id) inverted index from TWO narrow scans (instead of
    three full ones — the standalone stats + var_index jobs were
    near-constant-cost additions that ate scaling efficiency):

      1. row grain, no explode: per-file counts / ts bounds / audit
         checksum / owning sink (cheap: 2 narrow columns);
      2. (file, dict-var) grain: explode → DISTINCT PAIRS first (the only
         full-data shuffle, and it dedups map-side), then the tiny pair
         table — #files x per-file vocabulary — yields both the bloom
         position sets and the inverted index (sink recovered from the
         partitionBy path, no join). localCheckpoint keeps the pair table
         from recomputing across its two consumers.

    Returns (stats, var_index_df) — var_index_df has build_var_index's
    exact schema/content (pinned by pytest).
    """
    # the row-grain stats collect and the (file, var_id) pair distinct are
    # independent jobs over different columns of the same fan-out: run them
    # concurrently so each back-fills the other's straggler tail (guide §2.6)
    from concurrent.futures import ThreadPoolExecutor

    def _rows():
        return (
            routed.select(
                F.input_file_name().alias("file"), "ts", "logtype_id",
                "doc_id"
            )
            .groupBy("file")
            .agg(
                F.count("*").alias("n_rows"),
                F.min("ts").alias("min_ts"),
                F.max("ts").alias("max_ts"),
                F.first("logtype_id").alias("logtype_id"),
                F.expr("bit_xor(xxhash64(doc_id))").alias("checksum"),
            )
            .collect()
        )

    def _pairs():
        return (
            routed.select(
                F.input_file_name().alias("file"),
                F.explode(F.expr(_DICT_VAR_IDS)).alias("var_id"),
            )
            .distinct()
            .localCheckpoint(eager=True)
        )

    with ThreadPoolExecutor(max_workers=2) as pool:
        rows_f = pool.submit(_rows)
        pairs_f = pool.submit(_pairs)
        rows = rows_f.result()
        pairs = pairs_f.result()
    var_index = pairs.select(
        F.regexp_extract("file", r"logtype_id=(-?[0-9]+)", 1)
        .cast("bigint")
        .alias("logtype_id"),
        "var_id",
    ).distinct().select("logtype_id", "var_id")
    pos_cols = [
        F.collect_set(
            F.pmod(F.xxhash64(F.col("var_id"), F.lit(seed)), F.lit(bloom_bits))
        ).alias(f"s{j}")
        for j, seed in enumerate(BLOOM_SEEDS)
    ]
    bloom_rows = pairs.groupBy("file").agg(*pos_cols).collect()
    blooms: dict[str, bytes] = {}
    for r in bloom_rows:
        bits = bytearray(bloom_bits // 8)
        for j in range(len(BLOOM_SEEDS)):
            for p in r[f"s{j}"]:
                bits[p // 8] |= 1 << (p % 8)
        blooms[r["file"]] = bytes(bits)
    stats = []
    for r in rows:
        stats.append(
            {
                "file": _rel(r["file"], root),
                "n_rows": r["n_rows"],
                "min_ts": r["min_ts"],
                "max_ts": r["max_ts"],
                "bloom_bits": bloom_bits,
                "bloom": blooms.get(
                    r["file"], bytes(bloom_bits // 8)
                ).hex(),
                "logtype_id": r["logtype_id"],
                "checksum": r["checksum"],
            }
        )
    stats.sort(key=lambda d: d["file"])
    return stats, var_index


def sink_audit_from_stats(stats: list[dict]) -> list[dict]:
    """Per-sink audit rows (count + order-insensitive doc_id checksum)
    rolled up from per-file stats — XOR of group XORs equals the XOR over
    all rows, so this matches a direct per-sink aggregation bit for bit."""
    agg: dict[int, dict] = {}
    for s in stats:
        a = agg.setdefault(s["logtype_id"], {"n_rows": 0, "checksum": 0})
        a["n_rows"] += s["n_rows"]
        if s.get("checksum") is not None:
            a["checksum"] ^= s["checksum"]
    return [
        {"logtype_id": k, "n_rows": v["n_rows"], "checksum": str(v["checksum"])}
        for k, v in sorted(agg.items())
    ]


def probe_positions(
    spark: SparkSession, var_ids: list[int], bloom_bits: int
) -> dict[int, list[int]]:
    """Bloom bit positions for candidate var ids — computed with the SAME
    Spark xxhash64 expression as the build side (hash parity by
    construction). One local job over len(var_ids) rows."""
    if not var_ids:
        return {}
    df = spark.createDataFrame([(int(v),) for v in var_ids], "v: long")
    cols = [
        F.pmod(F.xxhash64(F.col("v"), F.lit(seed)), F.lit(bloom_bits)).alias(
            f"p{j}"
        )
        for j, seed in enumerate(BLOOM_SEEDS)
    ]
    return {
        r["v"]: [r[f"p{j}"] for j in range(len(BLOOM_SEEDS))]
        for r in df.select("v", *cols).collect()
    }


def _bloom_may_contain(bloom_hex: str, positions: list[int]) -> bool:
    if not bloom_hex:
        return False  # file provably holds no dict vars at all
    bits = bytes.fromhex(bloom_hex)
    return all(bits[p // 8] & (1 << (p % 8)) for p in positions)


def prune_files(
    spark: SparkSession,
    stats: list[dict],
    tge: int | None = None,
    tle: int | None = None,
    dict_hits: list[list[int]] | None = None,
    pos_cache: dict[int, list[int]] | None = None,
) -> list[dict]:
    """Manifest-level file skipping: keep a file only if its ts range
    intersects [tge, tle] AND, for EVERY query variable, at least one of
    its acceptable dict ids passes the file's bloom filter. ``pos_cache``
    (var_id -> bit positions) is consulted and filled in place, so repeated
    searches over one engine skip the probe job for already-seen ids."""
    keep = []
    for s in stats:
        if tge is not None and s["max_ts"] is not None and s["max_ts"] < tge:
            continue
        if tle is not None and s["min_ts"] is not None and s["min_ts"] > tle:
            continue
        keep.append(s)
    if dict_hits:
        pos = pos_cache if pos_cache is not None else {}
        bloom_bits = stats[0]["bloom_bits"] if stats else BLOOM_BITS
        missing = sorted({i for ids in dict_hits for i in ids} - pos.keys())
        if missing:
            pos.update(probe_positions(spark, missing, bloom_bits))
        keep = [
            s
            for s in keep
            if all(
                any(_bloom_may_contain(s["bloom"], pos[i]) for i in ids)
                for ids in dict_hits
            )
        ]
    return keep


class SnapshotStore:
    """Manifest-pointer snapshot log under ``<root>/_snapshots/``.

    ``v<NNNNN>.json`` manifests are immutable; ``_current`` holds the live
    version and is swapped atomically (``os.replace``). ``commit`` of any
    number of tables is therefore all-or-nothing — the Iceberg commit
    protocol, minus the catalog server.
    """

    def __init__(self, root: str):
        # construction is side-effect free: read-only query paths build
        # stores speculatively (catalog search, from_work_dir probes) and
        # must work against read-only storage; commit() creates the dir
        self.root = os.path.abspath(root)
        self.dir = os.path.join(self.root, "_snapshots")

    # ------------------------------------------------------------- writing
    def _next_version(self) -> int:
        if not os.path.isdir(self.dir):
            return 1
        vs = [
            int(f[1:6])
            for f in os.listdir(self.dir)
            if f.startswith("v") and f.endswith(".json")
        ]
        return (max(vs) + 1) if vs else 1

    def table_files(self, df: DataFrame) -> list[str]:
        return sorted(_rel(f, self.root) for f in df.inputFiles())

    def commit(self, tables: dict[str, dict]) -> int:
        """Atomically publish a snapshot. ``tables`` maps table name ->
        {"files": [rel paths], optional "stats": [per-file dicts],
        optional "base": rel dir for partition-column recovery}."""
        os.makedirs(self.dir, exist_ok=True)
        v = self._next_version()
        manifest = {
            "version": v,
            "committed_at": time.time(),
            "tables": tables,
        }
        mpath = os.path.join(self.dir, f"v{v:05d}.json")
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, mpath)
        ptmp = os.path.join(self.dir, "_current.tmp")
        with open(ptmp, "w") as f:
            f.write(str(v))
        os.replace(ptmp, os.path.join(self.dir, "_current"))  # THE commit
        return v

    # ------------------------------------------------------------- reading
    def current_version(self) -> int | None:
        p = os.path.join(self.dir, "_current")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return int(f.read().strip())

    def manifest(self, version: int | None = None) -> dict | None:
        v = self.current_version() if version is None else version
        if v is None:
            return None
        with open(os.path.join(self.dir, f"v{v:05d}.json")) as f:
            return json.load(f)

    def read_table(
        self,
        spark: SparkSession,
        name: str,
        files: list[str] | None = None,
        version: int | None = None,
    ) -> DataFrame:
        """Read EXACTLY the snapshot's files (or a pruned subset of them).
        ``basePath`` keeps directory-derived partition columns (logtype_id)
        alive even when single files are addressed directly."""
        m = self.manifest(version)
        if m is None or name not in m["tables"]:
            raise KeyError(f"no snapshot table: {name}")
        t = m["tables"][name]
        rel = files if files is not None else t["files"]
        base = os.path.join(self.root, t.get("base", ""))
        paths = [os.path.join(self.root, f) for f in rel]
        if not paths:
            # empty prune: preserve schema from the full table
            full = spark.read.option("basePath", base).parquet(
                *[os.path.join(self.root, f) for f in t["files"]]
            )
            return full.where(F.lit(False))
        return spark.read.option("basePath", base).parquet(*paths)

    def stats(self, name: str, version: int | None = None) -> list[dict]:
        m = self.manifest(version)
        if m is None or name not in m["tables"]:
            return []
        return m["tables"][name].get("stats", [])


def snapshot_pipeline_tables(
    spark: SparkSession,
    work_dir: str,
    with_stats: bool = True,
    routed_stats: list[dict] | None = None,
) -> int:
    """Commit every pipeline output table of ``work_dir`` as ONE snapshot
    (the multi-table transactional commit the reference gets from its
    metadata DB). Routed gets per-file skipping stats; pass
    ``routed_stats`` when the route stage already collected them (the
    pipeline does) to avoid re-scanning — the stats' file list then also
    replaces the routed directory listing."""
    store = SnapshotStore(work_dir)
    tables: dict[str, dict] = {}
    for name in (
        "routed",
        "logtype_dict",
        "var_dict",
        "var_index",
        "agg_sink_counts",
        "agg_source_stats",
        "agg_by_time",
    ):
        path = os.path.join(work_dir, name)
        if not os.path.exists(path):
            continue
        if name == "routed":
            stats = routed_stats
            if stats is None and with_stats:
                stats = collect_file_stats(
                    spark.read.parquet(path), work_dir
                )
            if stats is not None:
                entry = {
                    "files": sorted(s["file"] for s in stats),
                    "base": name,
                    "stats": stats,
                }
            else:
                entry = {
                    "files": store.table_files(spark.read.parquet(path)),
                    "base": name,
                }
        else:
            entry = {
                "files": store.table_files(spark.read.parquet(path)),
                "base": name,
            }
        tables[name] = entry
    return store.commit(tables)
