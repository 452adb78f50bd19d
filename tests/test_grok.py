"""Schema-based tokenizer (user-defined variable schemas) + KQL wildcard
columns."""

from __future__ import annotations

import pytest

from clpspark.operators.grok import (
    EASY_SCHEMA_TEXT,
    ParseSchema,
    parse_text_with_schema,
    parse_with_schema,
)
from clpspark.plans.kql import kql_filter


@pytest.fixture(scope="module")
def easy_schema():
    return ParseSchema.from_schema_text(EASY_SCHEMA_TEXT)


def test_schema_file_parsing(easy_schema):
    assert [n for n, _ in easy_schema.rules] == ["int", "double", "hex"]
    assert easy_schema.timestamp is not None
    assert " " in easy_schema.delimiters and "\t" in easy_schema.delimiters


def test_classify_priority(easy_schema):
    assert easy_schema.classify("123") == "int"
    assert easy_schema.classify("-42") == "int"
    assert easy_schema.classify("1.5") == "double"
    assert easy_schema.classify("deadbeef") == "hex"
    assert easy_schema.classify("word") is None
    assert easy_schema.classify("1x2") is None  # no rule fully matches


def test_parse_with_schema(easy_schema):
    msg = "2016-05-08 07:33:05 job 42 took 1.5 sec at cafe node"
    ts_text, lt, ev, dv, ds, rules = parse_with_schema(msg, easy_schema)
    assert ts_text == "2016-05-08 07:33:05"
    assert rules == ["int", "double", "hex"]
    assert ev[0] == 42
    assert dv == ["cafe"]
    assert "\x11" in lt and "\x13" in lt and "\x12" in lt
    # constants survive in the logtype
    assert "job" in lt and "took" in lt and "node" in lt


def test_parse_text_with_schema_spark(spark, easy_schema):
    df = spark.createDataFrame(
        [("d1", "s", "run 7 scored 2.25 id abc"),
         ("d2", "s", "2016-05-08 07:33:05 boot 99")],
        "doc_id string, source string, message string",
    )
    out = {r["doc_id"]: r for r in
           parse_text_with_schema(df, easy_schema).collect()}
    assert list(out["d1"]["var_rules"]) == ["int", "double", "hex"]
    assert out["d1"]["ts"] is None
    assert out["d2"]["ts"] == 1462692785000
    assert list(out["d2"]["encoded_vars"]) == [99]


def test_kql_wildcard_columns(spark):
    df = spark.createDataFrame(
        [
            (1, ("clp", 10), None),
            (2, ("other", 20), "x"),
            (3, None, "clp"),
        ],
        "idx long, rec struct<name: string, num: long>, top string",
    )
    got = {r["idx"] for r in kql_filter(df, '$*name*: "clp"').collect()}
    assert got == {1}
    got = {r["idx"] for r in kql_filter(df, "rec.*: clp").collect()}
    assert got == {1}
    got = {r["idx"] for r in kql_filter(df, "*: clp").collect()}
    assert got == {1, 3}
    got = {r["idx"] for r in kql_filter(df, "rec.* > 15").collect()}
    assert got == {2}
    got = {r["idx"] for r in kql_filter(df, 'nomatch.*: "clp"').collect()}
    assert got == set()
