"""Compressed-archive ingestion: tar/tar.gz/zip containers -> events."""

from __future__ import annotations

import io
import tarfile
import zipfile

from clpspark.sources.archives import ingest_archive_logs, read_archive_logs


def _log_text(prefix: str, n: int) -> str:
    lines = []
    for i in range(n):
        lines.append(f"2016-05-08 07:{i % 60:02d}:{(i * 3) % 60:02d}.000 "
                     f"INFO {prefix} job {i} took {i}.{i % 10} s")
        if i % 7 == 0:
            lines.append("  multiline continuation")
    return "\n".join(lines)


def _make_archives(d):
    tar_path = d / "logs_a.tar.gz"
    with tarfile.open(tar_path, "w:gz") as tf:
        for name in ("svc1.log", "nested/svc2.log"):
            data = _log_text(name.split("/")[-1], 50).encode()
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    zip_path = d / "logs_b.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        zf.writestr("svc3.log", _log_text("svc3.log", 30))
        zf.writestr("emptydir/", "")
    return d


def test_read_archive_logs(spark, tmp_path):
    d = _make_archives(tmp_path)
    events = read_archive_logs(spark, str(d))
    rows = events.collect()
    by_source = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    assert set(by_source) == {
        "logs_a.tar.gz!svc1.log",
        "logs_a.tar.gz!svc2.log",
        "logs_b.zip!svc3.log",
    }
    assert len(by_source["logs_a.tar.gz!svc1.log"]) == 50  # events, not lines
    assert len(by_source["logs_b.zip!svc3.log"]) == 30
    # multiline continuation folded into its event
    ev0 = sorted(by_source["logs_b.zip!svc3.log"],
                 key=lambda r: r["doc_id"])[0]
    assert ev0["message"].endswith("\n  multiline continuation")


def test_ingest_archive_logs_parses(spark, tmp_path):
    d = _make_archives(tmp_path)
    parsed = ingest_archive_logs(spark, str(d))
    rows = sorted(parsed.collect(), key=lambda r: r["doc_id"])
    assert len(rows) == 130
    r7 = [r for r in rows if r["doc_id"] == "logs_b.zip!svc3.log#00000007"][0]
    assert r7["ts"] == 1462691241000  # 2016-05-08 07:07:21.000 UTC
    # vars: dict("svc3.log"), int(7), float(7.7)
    assert list(r7["encoded_vars"])[1] == 7  # "job 7"
    assert list(r7["dict_vars"]) == ["svc3.log"]
