"""Round-6 ADVICE regression tests: truncated netpbm headers fail fast,
leaf_names surfaces real listing errors, projection accepts doc_id,
catalog limit never displaces newest-archive rows."""

import numpy as np
import pytest


def test_pnm_truncated_header_raises():
    """A malformed/truncated P5/P6 header must raise, not spin the
    executor forever (the old tokenizer looped on b'' slices at EOF)."""
    from clpspark.operators.multimodal import _decode_pnm

    with pytest.raises(ValueError):
        _decode_pnm(b"P5 6 4")  # EOF mid-token (maxval missing)
    with pytest.raises(ValueError):
        _decode_pnm(b"P5\n")  # EOF between tokens
    with pytest.raises(ValueError):
        _decode_pnm(b"P6 3")  # one token then EOF
    # a comment ending at EOF (no newline) raises too, not hangs
    with pytest.raises(ValueError):
        _decode_pnm(b"P5 6 #trailing comment")
    # sanity: a whole header still decodes
    g = np.arange(24, dtype=np.uint8).reshape(4, 6)
    ok = _decode_pnm(b"P5 6 4 255\n" + g.tobytes())
    assert (ok == g).all()


def test_leaf_names_listing_error_surfaces(spark, tmp_path):
    """Only FileNotFoundError means 'no string leaves'; a columns path
    that exists but cannot be listed must raise, not silently return
    zero results for every string-leaf query."""
    import os

    from clpspark.operators.json_encode import JsonArchive, write_json_archive

    df = spark.createDataFrame(
        [("d0", "hello world")], "doc_id string, msg string"
    )
    out = str(tmp_path / "arch")
    write_json_archive(df, out)
    arch = JsonArchive.open(spark, out)
    assert "msg" in arch.leaf_names()

    # replace the columns dir with a regular file: listdir now raises
    # NotADirectoryError (an OSError that is NOT FileNotFoundError) —
    # the old code swallowed it into an empty leaf set
    import shutil

    shutil.rmtree(os.path.join(out, "columns"))
    with open(os.path.join(out, "columns"), "w") as f:
        f.write("not a directory")
    # fresh handle: JsonArchive.open memoizes per (path, version) and the
    # records version did not change
    arch2 = JsonArchive(spark, out)
    with pytest.raises(NotADirectoryError):
        arch2.leaf_names()


def test_kql_projection_doc_id_not_duplicated(spark, tmp_path):
    """project=['doc_id', ...] must not emit doc_id twice (it is always
    the first output column)."""
    from clpspark.operators.json_encode import JsonArchive, write_json_archive

    df = spark.createDataFrame(
        [("d0", "alpha beta", 1), ("d1", "gamma", 2)],
        "doc_id string, msg string, n long",
    )
    out = str(tmp_path / "arch")
    write_json_archive(df, out)
    arch = JsonArchive.open(spark, out)
    got = arch.kql('msg: "alpha*"', project=["doc_id", "msg", "n"])
    assert got.columns == ["doc_id", "msg", "n"]
    row = got.first()
    assert (row["doc_id"], row["msg"], row["n"]) == ("d0", "alpha beta", 1)


def test_dataset_namespacing_never_crosses(spark, tmp_path):
    """First-class datasets (clp-package search.py --dataset): two
    datasets with the SAME tags; scoped searches see only their own
    archives, unscoped searches see only unscoped archives."""
    from clpspark.catalog import (
        register_archive,
        search_json_archives,
        select_archives,
    )
    from clpspark.operators.json_encode import write_json_archive

    root = str(tmp_path)
    cat = f"{root}/cat"
    for name, ds in (("p", "prod"), ("s", "staging"), ("u", None)):
        df = spark.createDataFrame(
            [(f"{name}-d0", f"event in {name}")], "doc_id string, msg string"
        )
        write_json_archive(df, f"{root}/arch_{name}")
        register_archive(spark, cat, f"a_{name}", f"{root}/arch_{name}",
                         begin_ts=0, end_ts=1000, n_rows=1,
                         tags=["shared"], dataset=ds)

    def ids(ds):
        return {a for a, _p, _d in
                select_archives(spark, cat, tags=["shared"], dataset=ds)}

    assert ids("prod") == {"a_p"}
    assert ids("staging") == {"a_s"}
    assert ids(None) == {"a_u"}  # unscoped is its own namespace

    got = search_json_archives(spark, cat, 'msg: "event*"', dataset="prod")
    assert {r["archive_id"] for r in got.collect()} == {"a_p"}
    got = search_json_archives(spark, cat, 'msg: "event*"')
    assert {r["archive_id"] for r in got.collect()} == {"a_u"}


def test_catalog_limit_keeps_newest_batch_rows(spark, tmp_path):
    """search_json_archives(limit=) walks archives newest-first in batches
    of 8; when the FINAL batch overshoots the limit, only that batch is
    trimmed — every row from newer batches must survive (the old trailing
    union.limit() could displace them arbitrarily)."""
    from clpspark.catalog import register_archive, search_json_archives
    from clpspark.operators.json_encode import write_json_archive

    root = str(tmp_path)
    cat = f"{root}/cat"
    n_arch, docs_per = 10, 2
    for i in range(n_arch):
        rows = [(f"a{i}-d{j}", f"match {i} {j}") for j in range(docs_per)]
        df = spark.createDataFrame(rows, "doc_id string, msg string")
        write_json_archive(df, f"{root}/arch{i}")
        register_archive(spark, cat, f"a{i:02d}", f"{root}/arch{i}",
                         begin_ts=i * 1000, end_ts=i * 1000 + 999,
                         n_rows=docs_per)

    # batch 1 = newest 8 archives (a09..a02) -> 16 rows; limit=17 forces
    # batch 2 (a01, a00 -> 4 rows) to trim to exactly 1
    got = search_json_archives(spark, cat, 'msg: "match*"', limit=17)
    rows = [(r["archive_id"], r["doc_id"]) for r in got.collect()]
    assert len(rows) == 17
    newest = {f"a{i:02d}" for i in range(2, 10)}
    from_newest = [a for a, _ in rows if a in newest]
    assert len(from_newest) == 16  # ALL newer-batch rows retained
    assert sum(1 for a, _ in rows if a in ("a00", "a01")) == 1
