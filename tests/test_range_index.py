"""Archive range index (clp_s RangeIndexWriter.hpp:17-36 +
search/EvaluateRangeIndexFilters.cpp analog): per-ingested-file metadata KV
ranges, $-namespace pruning, and the CLI surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def range_run(spark, tmp_path_factory):
    from clpspark.pipeline import PipelineConfig, run_pipeline

    logs = tmp_path_factory.mktemp("rlogs")
    for f in range(3):
        lines = [
            f"2016-05-08 09:{i % 60:02d}:{(i * 3) % 60:02d}.000"
            f" INFO job {f * 100 + i} done in {i}.{f} ms"
            for i in range(40)
        ]
        (logs / f"node{f}.log").write_text("\n".join(lines))
    work = str(tmp_path_factory.mktemp("rwork") / "work")
    cfg = PipelineConfig(
        input_path=str(logs), work_dir=work, input_format="text",
        range_index=True, archive_creator_id="test-creator-7",
    )
    run_pipeline(spark, cfg, resume=True)
    return work


def test_range_index_written_per_file(range_run):
    from clpspark.range_index import read_range_index

    ranges = read_range_index(range_run)
    assert ranges is not None and len(ranges) == 3
    by_file = {r["f"]["_filename"]: r for r in ranges}
    assert set(by_file) == {"node0.log", "node1.log", "node2.log"}
    for r in ranges:
        assert r["n"] == 40
        assert r["f"]["_archive_creator_id"] == "test-creator-7"
        assert r["f"]["_file_split_number"] == "0"
        assert r["s"] <= r["e"]


def test_meta_filter_prunes_equals_plain_filter(spark, range_run):
    """Pruned-vs-plain equality: a $_filename-filtered search returns
    exactly the rows a plain source filter returns."""
    from clpspark.plans.grep import GrepEngine

    eng = GrepEngine.from_work_dir(spark, range_run)
    pruned = {
        r["doc_id"]
        for r in eng.search(
            "* INFO job * done in *", meta={"_filename": "node1.log"}
        ).collect()
    }
    plain = {
        r["doc_id"]
        for r in eng.search("* INFO job * done in *").where(
            F.col("source") == "node1.log"
        ).collect()
    }
    assert pruned == plain and len(pruned) == 40


def test_meta_wildcard_and_presence(spark, range_run):
    from clpspark.plans.grep import GrepEngine

    eng = GrepEngine.from_work_dir(spark, range_run)
    # wildcard over the creator id + presence assertion (the golden
    # '$_archive_creator_id: *') keeps every range
    n = eng.search(
        "*", meta={"_archive_creator_id": "test-*", "_filename": "*"}
    ).count()
    assert n == 120
    # no matching range -> EmptyExpr -> zero rows, no scan errors
    assert eng.search("*", meta={"_filename": "absent.log"}).count() == 0
    # a key the index never recorded never matches
    assert eng.search("*", meta={"_no_such_key": "*"}).count() == 0


def test_meta_filter_regex_fallback_path(spark, range_run):
    """The untranslatable-regex fallback must apply meta pruning too."""
    from clpspark.plans.grep import GrepEngine

    eng = GrepEngine.from_work_dir(spark, range_run)
    out = eng.search_regex(
        r"job (1[0-9]{2}) done", meta={"_filename": "node1.log"}
    )
    assert out.count() == 40


def test_overlapping_ranges_rejected(spark):
    from clpspark.range_index import build_range_index

    df = spark.createDataFrame(
        [("a", "g1"), ("c", "g1"), ("b", "g2"), ("d", "g2")],
        "doc_id string, source string",
    )
    with pytest.raises(ValueError, match="overlap"):
        build_range_index(df)


def test_cli_search_meta(spark, range_run, capsys):
    from clpspark import cli

    rc = cli.main(
        ["search", range_run, "* INFO job * done in *",
         "--meta", "_filename=node2.log", "--count"]
    )
    assert rc == 0
    assert capsys.readouterr().out.strip() == "40"


def test_non_contiguous_corpus_degrades_gracefully(spark, tmp_path):
    """A corpus whose doc_ids interleave across part files (shuffled write)
    must still compress: the range-index stage skips with a recorded
    reason instead of aborting, and no stale index is left behind."""
    from clpspark.corpus import SEQUENCES_SCHEMA, generate_pdf, build_vocab
    from clpspark.pipeline import PipelineConfig, run_pipeline
    from clpspark.range_index import read_range_index

    import numpy as np

    meta = build_vocab(42)
    pdf = generate_pdf(np.arange(400), meta, seed=42)
    inp = str(tmp_path / "seq")
    # shuffle so every part file spans the whole doc_id range
    spark.createDataFrame(pdf, schema=SEQUENCES_SCHEMA).repartition(4) \
        .write.parquet(inp)
    work = str(tmp_path / "work")
    metrics = run_pipeline(
        spark,
        PipelineConfig(input_path=inp, work_dir=work, range_index=True),
    )
    assert metrics["range_index"]["n_ranges"] == 0
    assert "skipped" in metrics["range_index"]
    assert read_range_index(work) is None
