"""Archive catalog: tag semi-join + ts-range pruning across archives
(query_scheduler.py archive selection semantics)."""

from __future__ import annotations

import pytest

from clpspark.catalog import search_archives, select_archives
from clpspark.corpus import write_corpus
from clpspark.pipeline import PipelineConfig, run_pipeline


@pytest.fixture(scope="module")
def two_archives(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("cat")
    catalog = str(base / "catalog")
    paths = {}
    for name, n, tags in (("prod", 400, ("prod", "logs")),
                          ("dev", 300, ("dev",))):
        corpus = str(base / f"corpus_{name}")
        write_corpus(spark, corpus, n_rows=n, seed=42)
        work = str(base / f"work_{name}")
        cfg = PipelineConfig(input_path=corpus, work_dir=work,
                             catalog_dir=catalog, tags=tags)
        run_pipeline(spark, cfg)
        paths[name] = work
    return catalog, paths


def test_select_archives_by_tag(spark, two_archives):
    catalog, paths = two_archives
    assert {p for _, p, _dp in select_archives(spark, catalog)} == set(paths.values())
    assert [p for _, p, _dp in select_archives(spark, catalog, tags=["prod"])] == [
        paths["prod"]
    ]
    assert [p for _, p, _dp in select_archives(spark, catalog, tags=["dev"])] == [
        paths["dev"]
    ]
    # ANY-of semantics
    assert {p for _, p, _dp in
            select_archives(spark, catalog, tags=["dev", "logs"])} == set(
        paths.values()
    )
    assert select_archives(spark, catalog, tags=["nope"]) == []


def test_select_archives_ts_pruning(spark, two_archives):
    catalog, paths = two_archives
    arch = spark.read.parquet(f"{catalog}/archives").collect()
    end_max = max(r["end_ts"] for r in arch)
    # a range beyond every archive's end prunes everything
    assert select_archives(spark, catalog, tge=end_max + 1) == []
    assert len(select_archives(spark, catalog, tge=end_max - 1)) >= 1
    assert select_archives(spark, catalog, tle=0) == []


def test_search_archives_tag_scoped(spark, two_archives):
    catalog, paths = two_archives
    both = search_archives(spark, catalog, "*heartbeat*").collect()
    prod = search_archives(spark, catalog, "*heartbeat*",
                           tags=["prod"]).collect()
    assert prod and both
    # the dev archive (rows 0..299, same corpus seed) duplicates every
    # prod doc_id it shares; tag pruning must halve those
    prod_ids = [r["doc_id"] for r in prod]
    assert len(prod_ids) == len(set(prod_ids))
    both_ids = [r["doc_id"] for r in both]
    assert len(both_ids) > len(prod_ids)


def test_register_archive_idempotent(spark, two_archives):
    from clpspark.catalog import register_archive

    catalog, paths = two_archives
    n_before = spark.read.parquet(f"{catalog}/archives").count()
    existing = spark.read.parquet(f"{catalog}/archives").first()
    register_archive(
        spark, catalog, archive_id=existing["archive_id"],
        path=existing["path"], begin_ts=0, end_ts=1, n_rows=1, tags=["x"],
    )
    assert spark.read.parquet(f"{catalog}/archives").count() == n_before


def test_search_archives_no_match_empty(spark, two_archives):
    catalog, _ = two_archives
    out = search_archives(spark, catalog, "*heartbeat*", tags=["nope"])
    assert out.count() == 0
