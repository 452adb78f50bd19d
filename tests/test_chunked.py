"""Chunked ordered extraction (clp-s x --ordered
--target-ordered-chunk-size / JsonConstructor.cpp chunk split): chunk
boundaries respect event order, concatenated chunks equal the unchunked
output byte-for-byte, manifests carry the reference's metadata shape."""

from __future__ import annotations

import glob
import json
import os

import pytest


def test_write_ordered_chunks_single_stream(spark, tmp_path):
    from clpspark.sources.chunked import write_ordered_chunks

    lines = [f"event {i:04d} " + "x" * (i % 37) for i in range(500)]
    df = spark.createDataFrame(
        [(i, l) for i, l in enumerate(lines)], "idx long, json string"
    ).repartition(8)  # scrambled input: order must come from idx
    out = str(tmp_path / "chunks")
    target = 2000
    manifest = write_ordered_chunks(
        df, out, target, order_col="idx", stream_id="arch1"
    )
    assert len(manifest) > 3
    # contiguous, ordered, exclusive-end indexes; is_last on the final one
    assert manifest[0]["first_idx"] == 0
    assert manifest[-1]["last_idx"] == 500
    for a, b in zip(manifest, manifest[1:]):
        assert a["last_idx"] == b["first_idx"]
        assert not a["is_last"]
    assert manifest[-1]["is_last"]
    # chunk files exist under the reference naming and sizes ~= target
    for m in manifest:
        assert os.path.basename(m["path"]) == \
            f"arch1_{m['first_idx']}_{m['last_idx']}.jsonl"
        assert m["n_bytes"] == os.path.getsize(m["path"])
        if not m["is_last"]:
            # floor-rule chunks span at least target minus one record
            assert m["n_bytes"] >= target - (11 + 36 + 1)
    # concatenation in manifest order == the unchunked ordered output
    got = b"".join(open(m["path"], "rb").read() for m in manifest)
    want = ("\n".join(lines) + "\n").encode()
    assert got == want


def test_write_ordered_chunks_per_stream_and_unchunked(spark, tmp_path):
    from clpspark.sources.chunked import write_ordered_chunks

    rows = [(s, i, f"{s} line {i} " + "y" * 20)
            for s in ("a.log", "b.log") for i in range(100)]
    df = spark.createDataFrame(rows, "src string, idx long, line string")
    out = str(tmp_path / "c")
    manifest = write_ordered_chunks(
        df, out, 900, order_col="idx", line_col="line", stream_col="src",
        suffix=".txt",
    )
    streams = {m["stream"] for m in manifest}
    assert streams == {"a.log", "b.log"}
    for s in streams:
        ms = [m for m in manifest if m["stream"] == s]
        assert len(ms) > 1
        assert ms[0]["first_idx"] == 0 and ms[-1]["last_idx"] == 100
        assert [m["is_last"] for m in ms] == [False] * (len(ms) - 1) + [True]
        got = b"".join(open(m["path"], "rb").read() for m in ms)
        want = ("\n".join(f"{s} line {i} " + "y" * 20 for i in range(100))
                + "\n").encode()
        assert got == want

    # target 0 = no chunking: one file per stream (reference default)
    out2 = str(tmp_path / "c0")
    manifest0 = write_ordered_chunks(
        df, out2, 0, order_col="idx", line_col="line", stream_col="src",
        suffix=".txt",
    )
    assert len(manifest0) == 2
    assert all(m["is_last"] for m in manifest0)


def test_chunked_colliding_stream_names_and_user_files(spark, tmp_path):
    """Two streams sanitizing to the same filename suffix instead of
    overwriting each other; unrelated user files in out_dir survive the
    pre-write cleanup (only our own chunk naming is cleared)."""
    from clpspark.sources.chunked import write_ordered_chunks

    rows = [(s, i, f"{s}|{i}") for s in ("a/b.log", "a_b.log")
            for i in range(10)]
    df = spark.createDataFrame(rows, "src string, idx long, line string")
    out = tmp_path / "o"
    out.mkdir()
    (out / "notes.txt").write_text("keep me")
    (out / "old_1_5.txt").write_text("stale chunk from a prior run")
    manifest = write_ordered_chunks(
        df, str(out), 0, order_col="idx", line_col="line",
        stream_col="src", suffix=".txt",
    )
    paths = {m["stream"]: m["path"] for m in manifest}
    assert len(set(paths.values())) == 2  # no silent overwrite
    for s in ("a/b.log", "a_b.log"):
        got = open(paths[s]).read()
        assert got == "\n".join(f"{s}|{i}" for i in range(10)) + "\n"
    assert (out / "notes.txt").read_text() == "keep me"  # not ours
    assert not (out / "old_1_5.txt").exists()  # ours: cleared


def test_chunked_null_order_key_fails_fast(spark, tmp_path):
    from clpspark.sources.chunked import write_ordered_chunks

    df = spark.createDataFrame(
        [("x", None, "line")], "src string, idx long, line string"
    )
    with pytest.raises(ValueError, match="order"):
        write_ordered_chunks(df, str(tmp_path / "z"), 100,
                             order_col="idx", line_col="line",
                             stream_col="src")


def test_cli_extract_json_chunked_roundtrip(tmp_path, capsys):
    """extract-json --target-ordered-chunk-size: concatenated chunks ==
    the unchunked extraction byte-for-byte; one manifest JSON line per
    chunk on stdout."""
    from clpspark.cli import main

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    lines = [
        json.dumps({"msg": f"job {i} finished in {i * 3} ms", "n": i,
                    "ts": f"2024-07-01 08:{i % 60:02d}:00"},
                   sort_keys=True, separators=(",", ":"))
        for i in range(200)
    ]
    (src_dir / "a.ndjson").write_text("\n".join(lines) + "\n")
    arch = str(tmp_path / "arch")
    assert main(["--cpus", "4", "compress-json", str(src_dir), arch,
                 "--timestamp-key", "ts"]) == 0
    capsys.readouterr()

    plain = str(tmp_path / "plain")
    assert main(["--cpus", "4", "extract-json", arch, plain]) == 0
    capsys.readouterr()
    want = b""
    for part in sorted(glob.glob(os.path.join(plain, "part-*"))):
        with open(part, "rb") as f:
            want += f.read()

    out = str(tmp_path / "chunked")
    assert main(["--cpus", "4", "extract-json", arch, out,
                 "--target-ordered-chunk-size", "3000"]) == 0
    printed = [json.loads(l)
               for l in capsys.readouterr().out.strip().splitlines()]
    assert len(printed) > 2
    files = sorted(glob.glob(os.path.join(out, "arch_*.jsonl")),
                   key=lambda p: int(os.path.basename(p).split("_")[1]))
    assert [m["path"] for m in printed] == files
    got = b"".join(open(p, "rb").read() for p in files)
    assert got == want


def test_cli_extract_text_chunked_roundtrip(tmp_path, capsys):
    """extract --target-ordered-chunk-size: per-source chunks concatenate
    to the original log files byte-for-byte."""
    from clpspark.cli import main

    logs = tmp_path / "logs"
    logs.mkdir()
    orig = {}
    for fname in ("app.log", "db.log"):
        body = "\n".join(
            f"2016-05-08 07:{i % 60:02d}:00.{i:03d} INFO {fname} event {i} "
            f"took {i}.{i % 10} ms"
            for i in range(150)
        ) + "\n"
        (logs / fname).write_text(body)
        orig[fname] = body.encode()
    arch = str(tmp_path / "arch")
    assert main(["--cpus", "4", "compress", str(logs), arch,
                 "--format", "text"]) == 0
    capsys.readouterr()

    out = str(tmp_path / "restored")
    assert main(["--cpus", "4", "extract", arch, out,
                 "--target-ordered-chunk-size", "2500"]) == 0
    printed = [json.loads(l)
               for l in capsys.readouterr().out.strip().splitlines()]
    for fname, body in orig.items():
        ms = sorted((m for m in printed if m["stream"] == fname),
                    key=lambda m: m["first_idx"])
        assert len(ms) > 1, fname
        got = b"".join(open(m["path"], "rb").read() for m in ms)
        assert got == body, fname
