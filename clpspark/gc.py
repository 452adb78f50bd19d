"""Retention garbage collection — expired archives + expired search results.

The reference runs a garbage-collector service with two sweepers:

* Archive GC (job_orchestration/garbage_collector/
  archive_garbage_collector.py:37-149): computes a SAFE expiry epoch —
  ``now - retention``, pulled back to ``oldest_running_query.creation_time
  - retention`` when a query job is running (the scheduler guarantees a
  job never searches archives older than its own creation minus
  retention; jobs older than ``now - retention`` are treated as hanging
  and ignored) — then deletes archives with ``end_ts < expiry AND end_ts
  != 0`` in two crash-safe phases: remove from the metadata DB while
  persisting the doomed ids to a recovery buffer, then delete storage,
  then clear the buffer. A crash between the phases replays the deletion
  on the next sweep.
* Search-results GC (search_result_garbage_collector.py:44-70): drops
  per-job result collections whose newest document was INSERTED before
  the expiry epoch.

Spark re-expression: the catalog is a small parquet pair
(archives/tags), so "delete from the metadata DB" is an atomic rewrite
of those tables; running queries register as tiny JSON markers under
``{catalog}/query_jobs`` (the QUERY_JOBS-table analog); the recovery
buffer is ``{catalog}/gc_pending.json``. The results-cache sweep walks
the parquet store's per-collection directories using file mtimes as the
insert-time analog of Mongo ObjectId generation times.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_PENDING = "gc_pending.json"
_JOBS_DIR = "query_jobs"


# ---------------------------------------------------------------- queries

def begin_query(catalog_dir: str, job_id: str | None = None,
                now_ms: int | None = None) -> str:
    """Register a running query job (query_jobs-table RUNNING row analog).
    The GC never sweeps archives a job registered before it could still
    search. Returns the job id for ``end_query``."""
    job_id = job_id or uuid.uuid4().hex
    d = os.path.join(catalog_dir, _JOBS_DIR)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".{job_id}.tmp")
    with open(tmp, "w") as f:
        json.dump({"created_ms": now_ms if now_ms is not None
                   else int(time.time() * 1000)}, f)
    os.replace(tmp, os.path.join(d, f"{job_id}.json"))
    return job_id


def end_query(catalog_dir: str, job_id: str) -> None:
    """Deregister a finished/failed query job (idempotent)."""
    try:
        os.remove(os.path.join(catalog_dir, _JOBS_DIR, f"{job_id}.json"))
    except FileNotFoundError:
        pass


def _running_job_starts(catalog_dir: str) -> list[int]:
    d = os.path.join(catalog_dir, _JOBS_DIR)
    try:
        names = os.listdir(d)
    except FileNotFoundError:
        return []
    out = []
    for n in names:
        if not n.endswith(".json") or n.startswith("."):
            continue
        try:
            with open(os.path.join(d, n)) as f:
                out.append(int(json.load(f)["created_ms"]))
        except (OSError, ValueError, KeyError):
            continue  # partially-written marker: next sweep sees it whole
    return out


def safe_expiry_ms(catalog_dir: str, retention_ms: int,
                   now_ms: int | None = None) -> int:
    """_get_archive_safe_expiry_epoch semantics: expiry = now - retention,
    pulled back to the OLDEST running job's creation time - retention;
    jobs created before now - retention are treated as hanging and do not
    hold the expiry line back."""
    now_ms = now_ms if now_ms is not None else int(time.time() * 1000)
    floor = now_ms - retention_ms
    live = [s for s in _running_job_starts(catalog_dir) if s >= floor]
    anchor = min(live) if live else now_ms
    return anchor - retention_ms


# ---------------------------------------------------------------- archives

def sweep_expired_archives(
    spark: SparkSession,
    catalog_dir: str,
    retention_ms: int,
    now_ms: int | None = None,
    dry_run: bool = False,
) -> list[str]:
    """Delete archives whose ``end_ts`` predates the safe expiry epoch
    (``end_ts < expiry AND end_ts IS NOT NULL`` — null = timestamps
    unknown, never expired, the reference's ``end_timestamp != 0``).

    Two crash-safe phases like the reference: (1) persist the doomed
    (id, path) list to ``gc_pending.json`` and atomically rewrite the
    catalog tables without those rows; (2) delete the archive storage;
    then clear the buffer. A pending buffer left by a crash is replayed
    IN FULL — catalog rows for the pending ids are removed too, so a
    crash between the buffer write and the table rewrite can never leave
    dangling rows pointing at deleted storage — before the new sweep
    (never during ``dry_run``: a preview must not mutate anything).
    Returns the swept archive ids (candidates only when ``dry_run``)."""
    from clpspark.catalog import _read_archives, _tbl

    _recover_tables(catalog_dir)
    if not dry_run:
        _replay_pending(spark, catalog_dir)

    arch_tbl = _tbl(catalog_dir, "archives")
    if not os.path.exists(arch_tbl):
        return []
    expiry = safe_expiry_ms(catalog_dir, retention_ms, now_ms)
    arch = _read_archives(spark, catalog_dir)
    doomed_rows = arch.where(
        F.col("end_ts").isNotNull() & (F.col("end_ts") < F.lit(expiry))
    ).select("archive_id", "path").collect()
    if not doomed_rows:
        return []
    doomed = [(r["archive_id"], r["path"]) for r in doomed_rows]
    ids = [a for a, _p in doomed]
    if dry_run:
        return ids

    # phase 1: recovery buffer + metadata removal (buffer FIRST — if the
    # rewrite crashes midway the next sweep replays the storage deletes;
    # catalog rewrites themselves are atomic directory swaps)
    pending = os.path.join(catalog_dir, _PENDING)
    tmp = pending + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"archives": [{"archive_id": a, "path": p}
                                for a, p in doomed]}, f)
    os.replace(tmp, pending)

    _remove_from_catalog(spark, catalog_dir, ids)

    # phase 2: storage
    for _aid, path in doomed:
        _delete_storage(path)
    os.remove(pending)

    # evict stale shared handles so a future archive at the same path
    # can't resolve to a deleted one's memos
    _evict_archive_handles([p for _a, p in doomed])
    return ids


def _remove_from_catalog(spark: SparkSession, catalog_dir: str,
                         ids: list[str]) -> None:
    from clpspark.catalog import _read_archives, _tbl

    # anti-join, not isin: a backlogged sweep can carry thousands of ids
    # (Column.isin pays ~1ms/id of py4j conversion)
    doomed_df = F.broadcast(
        spark.createDataFrame([(a,) for a in ids], "archive_id string")
    )
    arch_tbl = _tbl(catalog_dir, "archives")
    if os.path.exists(arch_tbl):
        keep = _read_archives(spark, catalog_dir).join(
            doomed_df, "archive_id", "left_anti")
        _atomic_overwrite(spark, keep, arch_tbl)
    tags_tbl = _tbl(catalog_dir, "tags")
    if os.path.exists(tags_tbl):
        tags = spark.read.parquet(tags_tbl)
        _atomic_overwrite(
            spark, tags.join(doomed_df, "archive_id", "left_anti"), tags_tbl
        )


def _recover_tables(catalog_dir: str) -> None:
    """Finish an interrupted _atomic_overwrite: a crash between its two
    renames leaves the live table missing and the __gc_old copy intact —
    restore it so readers (and this sweep) see a whole table again."""
    from clpspark.catalog import _tbl

    for name in ("archives", "tags"):
        tbl = _tbl(catalog_dir, name)
        old = tbl.rstrip("/") + "__gc_old"
        if not os.path.exists(tbl) and os.path.exists(old):
            os.rename(old, tbl)


def _replay_pending(spark: SparkSession, catalog_dir: str) -> None:
    """Replay a crashed sweep's pending buffer END TO END: remove the
    pending ids' catalog rows (idempotent — they may already be gone) AND
    their storage, so neither dangling rows nor orphan directories can
    survive a crash at any point between the phases."""
    pending = os.path.join(catalog_dir, _PENDING)
    if not os.path.exists(pending):
        return
    try:
        with open(pending) as f:
            entries = json.load(f).get("archives", [])
    except (OSError, ValueError):
        entries = []
    ids = [e["archive_id"] for e in entries if e.get("archive_id")]
    if ids:
        _remove_from_catalog(spark, catalog_dir, ids)
    for e in entries:
        _delete_storage(e.get("path", ""))
    os.remove(pending)


def _delete_storage(path: str) -> None:
    """Remove an archive directory or single-file (.clpa) archive;
    idempotent (recovery replays may hit already-deleted paths)."""
    if not path:
        return
    if os.path.isdir(path):
        shutil.rmtree(path, ignore_errors=True)
    else:
        try:
            os.remove(path)
        except FileNotFoundError:
            pass


def _atomic_overwrite(spark: SparkSession, df, table_dir: str) -> None:
    """Rewrite a small catalog parquet table in place via tmp-dir swap.
    A reader sees the old or the new table; a crash between the two
    renames leaves the __gc_old copy, which _recover_tables restores at
    the start of the next sweep (a plain directory rename cannot be made
    atomic as a pair — the recovery hook closes that window)."""
    tmp = table_dir.rstrip("/") + "__gc_tmp"
    old = table_dir.rstrip("/") + "__gc_old"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    os.rename(table_dir, old)
    os.rename(tmp, table_dir)
    shutil.rmtree(old, ignore_errors=True)


def _evict_archive_handles(paths: list[str]) -> None:
    """Drop shared JsonArchive handles whose directory was (or lived
    under) a deleted archive path. Handles are keyed on abspath; match
    on exact dir or true prefix + separator so '/data/ab' never evicts
    for '/data/a'. Single-file (.clpa) handles key on their extraction
    cache dir — unreachable once the file is gone, so no eviction
    needed."""
    from clpspark.operators import json_encode as JE

    roots = [os.path.abspath(p) for p in paths if p]
    with JE._ARCHIVE_HANDLES_LOCK:
        for key in [
            k for k in JE._ARCHIVE_HANDLES
            if any(k[1] == r or k[1].startswith(r + os.sep) for r in roots)
        ]:
            JE._ARCHIVE_HANDLES.pop(key, None)


# ------------------------------------------------------------- results TTL

def sweep_expired_results(
    cache_dir: str,
    retention_ms: int,
    now_ms: int | None = None,
    dry_run: bool = False,
) -> list[str]:
    """Drop result collections whose NEWEST insert predates the expiry
    epoch (search_result_garbage_collector.py semantics: the freshest
    document's insert time is the collection's timestamp; one late write
    keeps the whole collection). Insert time for the parquet store is
    the newest file mtime under the collection directory. Returns the
    dropped collection names."""
    now_ms = now_ms if now_ms is not None else int(time.time() * 1000)
    expiry = now_ms - retention_ms
    try:
        names = sorted(os.listdir(cache_dir))
    except FileNotFoundError:
        return []
    dropped = []
    for name in names:
        coll = os.path.join(cache_dir, name)
        if not os.path.isdir(coll):
            continue
        newest = 0.0
        for root, _dirs, files in os.walk(coll):
            for fn in files:
                try:
                    newest = max(newest,
                                 os.path.getmtime(os.path.join(root, fn)))
                except FileNotFoundError:
                    continue
        if newest * 1000 >= expiry:
            continue
        if not dry_run:
            shutil.rmtree(coll, ignore_errors=True)
        dropped.append(name)
    return dropped
