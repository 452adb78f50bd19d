"""Single-file archive packaging (clp_s single_file_archive analog).

Mirrors the reference's e2e parameter matrix: its end-to-end test runs
over single_file_archive x structurize_arrays
(components/core/tests/test-clp_s-end_to_end.cpp:99-100) — same GENERATE
grid here, with search + decode parity between the packed file and the
directory form.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def _docs(spark):
    rows = [
        (f"d{i}", f"2024-05-0{i % 5 + 1} 12:00:0{i % 10}",
         f"task {i} {'failed' if i % 3 == 0 else 'done'} on node{i % 4}",
         f"w{i % 3}", i, [f"e{i} a", f"e{i} b"][: i % 3])
        for i in range(30)
    ]
    return spark.createDataFrame(
        rows, "doc_id string, ts string, msg string, worker string, "
              "n long, arr array<string>",
    )


@pytest.mark.parametrize("structurize", [False, True])
@pytest.mark.parametrize("single_file", [False, True])
def test_single_file_archive_matrix(spark, tmp_path, structurize,
                                    single_file):
    from clpspark.operators.json_encode import JsonArchive, write_json_archive

    out = str(tmp_path / "arch")
    arch = write_json_archive(
        _docs(spark), out, ts_leaf="ts",
        structurize_arrays=structurize, single_file=single_file,
    )
    if single_file:
        assert os.path.isfile(out + ".clpa")
        assert not os.path.exists(out)  # directory replaced by the file
    q = 'msg: "task * failed *" AND worker: w0'
    got = sorted(r["doc_id"] for r in arch.kql(q).collect())
    # i % 3 == 0 rows are the 'failed' ones, and they all carry worker w0
    want = sorted(f"d{i}" for i in range(30) if i % 3 == 0)
    assert got == want and got  # non-empty
    dec = dict(
        (r["doc_id"], r["value"]) for r in arch.decode_leaf("msg").collect()
    )
    assert dec["d0"] == "task 0 failed on node0"
    assert len(dec) == 30


def test_single_file_open_transparent_and_rewrite_safe(spark, tmp_path):
    """Opening the packed file is equivalent to opening the directory, and
    repacking with NEW content must not serve stale extractions."""
    import time

    from clpspark.operators.json_encode import JsonArchive, write_json_archive
    from clpspark.single_file import pack_archive

    out = str(tmp_path / "arch")
    write_json_archive(_docs(spark), out, ts_leaf="ts")
    packed = pack_archive(out)
    a_dir = JsonArchive.open(spark, out)
    a_file = JsonArchive.open(spark, packed)
    q = 'worker: w1'
    assert sorted(r["doc_id"] for r in a_file.kql(q).collect()) == sorted(
        r["doc_id"] for r in a_dir.kql(q).collect()
    )
    # rewrite: different corpus, repack over the same file path
    df2 = spark.createDataFrame(
        [("x0", "2024-06-01 00:00:00", "only row here", "w9", 1, None)],
        "doc_id string, ts string, msg string, worker string, n long, "
        "arr array<string>",
    )
    import shutil

    shutil.rmtree(out)
    write_json_archive(df2, out, ts_leaf="ts")
    time.sleep(0.01)  # ensure distinct mtime_ns on coarse filesystems
    pack_archive(out, out_path=packed)
    a2 = JsonArchive.open(spark, packed)
    rows = a2.kql('msg: "only*"').select("doc_id").collect()
    assert [r["doc_id"] for r in rows] == ["x0"]
    assert a2.kql('worker: w1').count() == 0  # old content gone


def test_pack_rejects_traversal(tmp_path):
    import zipfile

    import pytest as _pytest

    from clpspark.single_file import unpack_archive

    evil = tmp_path / "evil.clpa"
    with zipfile.ZipFile(evil, "w") as z:
        z.writestr("_CLPA_FORMAT", "clpspark-sfa-1")
        z.writestr("../escape.txt", "nope")
    with _pytest.raises(ValueError, match="unsafe member"):
        unpack_archive(str(evil), cache_root=str(tmp_path / "cache"))


def test_catalog_search_finds_packed_archives(spark, tmp_path):
    """A .clpa archive registered in the catalog must be searched, not
    silently classified as non-JSON (review finding r5)."""
    from clpspark.catalog import register_archive, search_json_archives
    from clpspark.operators.json_encode import write_json_archive

    out = str(tmp_path / "arch")
    write_json_archive(_docs(spark), out, ts_leaf="ts", single_file=True)
    cat = str(tmp_path / "cat")
    register_archive(spark, cat, "a0", out + ".clpa", begin_ts=None,
                     end_ts=None, n_rows=30)
    res = search_json_archives(spark, cat, 'worker: w1')
    assert res is not None
    assert sorted(r["doc_id"] for r in res.collect()) == sorted(
        f"d{i}" for i in range(30) if i % 3 == 1
    )
