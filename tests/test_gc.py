"""Retention GC: expired-archive sweep (safe expiry with running-query
pullback, two-phase crash recovery, catalog rewrite atomicity) + results
TTL sweep + the CLI gc verb. Mirrors the reference's garbage_collector
service semantics (archive_garbage_collector.py,
search_result_garbage_collector.py)."""

from __future__ import annotations

import json
import os

import pytest

HOUR = 3_600_000
NOW = 1_700_000_000_000  # fixed 'now' so tests are deterministic


def _mk_catalog(spark, root: str, specs):
    """Register simple JSON archives; specs = [(archive_id, end_ts)]."""
    from clpspark.catalog import register_archive
    from clpspark.operators.json_encode import write_json_archive

    cat = os.path.join(root, "cat")
    for aid, end_ts in specs:
        path = os.path.join(root, f"arch_{aid}")
        df = spark.createDataFrame(
            [(f"{aid}-d0", f"hello from {aid}")], "doc_id string, msg string"
        )
        write_json_archive(df, path)
        register_archive(
            spark, cat, aid, path,
            begin_ts=None if end_ts is None else end_ts - HOUR,
            end_ts=end_ts, n_rows=1,
        )
    return cat


def test_sweep_expired_archives(spark, tmp_path):
    """end_ts older than now - retention sweeps (catalog row, tags row,
    and storage together); recent and null-end_ts archives survive and
    stay searchable."""
    from clpspark.catalog import search_json_archives, select_archives
    from clpspark.gc import sweep_expired_archives

    root = str(tmp_path)
    cat = _mk_catalog(spark, root, [
        ("old", NOW - 100 * HOUR),
        ("new", NOW - 1 * HOUR),
        ("unknown", None),  # timestamps unknown: never expires
    ])

    swept = sweep_expired_archives(spark, cat, retention_ms=24 * HOUR,
                                   now_ms=NOW)
    assert swept == ["old"]
    assert not os.path.exists(os.path.join(root, "arch_old"))
    assert os.path.exists(os.path.join(root, "arch_new"))
    left = {a for a, _p, _d in select_archives(spark, cat)}
    assert left == {"new", "unknown"}
    # surviving archives still searchable through the rewritten catalog
    got = search_json_archives(spark, cat, 'msg: "hello*"')
    assert {r["archive_id"] for r in got.collect()} == {"new", "unknown"}
    # pending buffer cleared after the storage phase
    assert not os.path.exists(os.path.join(cat, "gc_pending.json"))


def test_sweep_dry_run_touches_nothing(spark, tmp_path):
    from clpspark.catalog import select_archives
    from clpspark.gc import sweep_expired_archives

    root = str(tmp_path)
    cat = _mk_catalog(spark, root, [("old", NOW - 100 * HOUR)])
    swept = sweep_expired_archives(spark, cat, retention_ms=24 * HOUR,
                                   now_ms=NOW, dry_run=True)
    assert swept == ["old"]
    assert os.path.exists(os.path.join(root, "arch_old"))
    assert {a for a, _p, _d in select_archives(spark, cat)} == {"old"}


def test_running_query_pulls_expiry_back(spark, tmp_path):
    """A RUNNING query registered at T guarantees archives with
    end_ts >= T - retention stay; once the query ends they sweep.
    A job older than now - retention is treated as hanging and ignored."""
    from clpspark.gc import (
        begin_query,
        end_query,
        safe_expiry_ms,
        sweep_expired_archives,
    )

    root = str(tmp_path)
    # expired vs now-24h, but NOT vs (query_start=now-30h) - 24h
    end_ts = NOW - 40 * HOUR
    cat = _mk_catalog(spark, root, [("boundary", end_ts)])

    job = begin_query(cat, now_ms=NOW - 30 * HOUR)
    # hanging job from long ago must NOT hold the line back further
    hang = begin_query(cat, now_ms=NOW - 500 * HOUR)

    # retention window large enough that the 30h-old job is live
    ret = 48 * HOUR
    assert safe_expiry_ms(cat, ret, NOW) == (NOW - 30 * HOUR) - ret
    swept = sweep_expired_archives(spark, cat, retention_ms=ret, now_ms=NOW)
    assert swept == []  # guarded by the running query

    end_query(cat, job)
    end_query(cat, hang)
    assert safe_expiry_ms(cat, ret, NOW) == NOW - ret
    swept = sweep_expired_archives(spark, cat, retention_ms=ret, now_ms=NOW)
    assert swept == []  # end_ts = NOW-40h >= NOW-48h: still in retention

    swept = sweep_expired_archives(spark, cat, retention_ms=24 * HOUR,
                                   now_ms=NOW)
    assert swept == ["boundary"]


def test_pending_buffer_replays_after_crash(spark, tmp_path):
    """A gc_pending.json left by a crash between the metadata and storage
    phases is replayed (storage deleted) before the next sweep."""
    from clpspark.gc import sweep_expired_archives

    root = str(tmp_path)
    cat = _mk_catalog(spark, root, [("live", NOW - HOUR)])
    orphan = os.path.join(root, "arch_orphan")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "junk"), "w") as f:
        f.write("x")
    with open(os.path.join(cat, "gc_pending.json"), "w") as f:
        json.dump({"archives": [{"archive_id": "orphan", "path": orphan}]}, f)

    swept = sweep_expired_archives(spark, cat, retention_ms=24 * HOUR,
                                   now_ms=NOW)
    assert swept == []  # nothing newly expired
    assert not os.path.exists(orphan)  # crash-recovery replayed
    assert not os.path.exists(os.path.join(cat, "gc_pending.json"))


def test_dry_run_never_replays_pending(spark, tmp_path):
    """--dry-run is a PREVIEW: a pending buffer left by a crash must not
    be replayed (deleting storage) during it."""
    from clpspark.gc import sweep_expired_archives

    root = str(tmp_path)
    cat = _mk_catalog(spark, root, [("live", NOW - HOUR)])
    orphan = os.path.join(root, "arch_orphan")
    os.makedirs(orphan)
    with open(os.path.join(cat, "gc_pending.json"), "w") as f:
        json.dump({"archives": [{"archive_id": "orphan", "path": orphan}]}, f)
    swept = sweep_expired_archives(spark, cat, retention_ms=24 * HOUR,
                                   now_ms=NOW, dry_run=True)
    assert swept == []
    assert os.path.exists(orphan)  # untouched
    assert os.path.exists(os.path.join(cat, "gc_pending.json"))


def test_replay_also_removes_catalog_rows(spark, tmp_path):
    """Crash between the buffer write and the table rewrite: the replay
    must remove the pending ids' catalog rows too, never leaving rows
    pointing at deleted storage."""
    from clpspark.catalog import select_archives
    from clpspark.gc import sweep_expired_archives

    root = str(tmp_path)
    cat = _mk_catalog(spark, root, [("old", NOW - 100 * HOUR),
                                    ("new", NOW - HOUR)])
    # simulate the crashed phase-1: buffer written, tables NOT rewritten
    with open(os.path.join(cat, "gc_pending.json"), "w") as f:
        json.dump({"archives": [{"archive_id": "old",
                                 "path": os.path.join(root, "arch_old")}]},
                  f)
    swept = sweep_expired_archives(spark, cat, retention_ms=10 ** 6 * HOUR,
                                   now_ms=NOW)  # nothing newly expired
    assert swept == []
    assert not os.path.exists(os.path.join(root, "arch_old"))
    assert {a for a, _p, _d in select_archives(spark, cat)} == {"new"}


def test_recover_interrupted_table_swap(spark, tmp_path):
    """Crash between _atomic_overwrite's two renames leaves the table
    missing and __gc_old intact; the next sweep restores it."""
    from clpspark.catalog import select_archives
    from clpspark.gc import sweep_expired_archives

    root = str(tmp_path)
    cat = _mk_catalog(spark, root, [("a", NOW - HOUR)])
    tbl = os.path.join(cat, "archives")
    os.rename(tbl, tbl + "__gc_old")  # mid-swap crash state
    swept = sweep_expired_archives(spark, cat, retention_ms=24 * HOUR,
                                   now_ms=NOW)
    assert swept == []
    assert os.path.exists(tbl)
    assert {a for a, _p, _d in select_archives(spark, cat)} == {"a"}


def test_sweep_expired_results(tmp_path):
    """Collections whose newest file mtime predates the expiry drop; a
    single fresh write keeps the whole collection (reference: latest doc
    timestamp governs)."""
    from clpspark.gc import sweep_expired_results

    cache = str(tmp_path / "cache")
    for name, ages_h in (("job_1", [100, 90]), ("job_2", [100, 1])):
        d = os.path.join(cache, name)
        os.makedirs(d)
        for i, age in enumerate(ages_h):
            p = os.path.join(d, f"part-{i}.parquet")
            with open(p, "w") as f:
                f.write("x")
            ts = (NOW - age * HOUR) / 1000
            os.utime(p, (ts, ts))

    dropped = sweep_expired_results(cache, retention_ms=24 * HOUR,
                                    now_ms=NOW)
    assert dropped == ["job_1"]
    assert not os.path.exists(os.path.join(cache, "job_1"))
    assert os.path.exists(os.path.join(cache, "job_2"))
    # dry run reports without deleting
    dropped = sweep_expired_results(cache, retention_ms=HOUR // 2,
                                    now_ms=NOW, dry_run=True)
    assert dropped == ["job_2"]
    assert os.path.exists(os.path.join(cache, "job_2"))


def test_cli_gc_verb(spark, tmp_path, capsys):
    from clpspark.cli import main

    root = str(tmp_path)
    cat = _mk_catalog(spark, root, [("old", NOW - 100 * HOUR),
                                    ("new", NOW - HOUR)])
    # CLI uses wall-clock now; both archives are ancient vs 2026, so give
    # a retention wide enough to keep 'new': use dry-run determinism via
    # a huge retention for keep, then a real sweep of everything expired
    rc = main(["--cpus", "4", "gc", "--catalog", cat,
               "--retention-mins", str(10 ** 9), "--dry-run"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["archives_swept"] == [] and out["dry_run"] is True

    rc = main(["--cpus", "4", "gc", "--catalog", cat,
               "--retention-mins", "1"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert sorted(out["archives_swept"]) == ["new", "old"]
    assert not os.path.exists(os.path.join(root, "arch_old"))
