"""Mimic the driver's correctness gate: run every queries() entry at sf0.01
and compare against its oracle_sql() via DuckDB (row count + column names +
order-insensitive values)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if hasattr(v, "item"):  # numpy / decimal-ish
        return _canon(v.item() if hasattr(v, "item") else float(v))
    import decimal

    if isinstance(v, decimal.Decimal):
        return round(float(v), 6)
    return v

def _rowset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = [tuple(_canon(r[i]) for i in order) for r in rows]
    return sorted(canon, key=lambda t: tuple(str(x) for x in t))


ORACLE_KEYS = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(entrymod.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row counts differ"
    assert _rowset(srows, scols) == _rowset(drows, dcols), f"{name}: values differ"


def test_rows_only_queries_run(spark):
    """Non-SQL queries must at least run and return a stable schema."""
    qs = entrymod.queries()
    for name in sorted(set(qs) - set(ORACLE_KEYS)):
        df = qs[name](spark, SF_DIR)
        n = df.count()
        assert n >= 0 and df.columns, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"logtype_id", "logtype", "n_rows"} <= set(df.columns)
    assert sum(r["n_rows"] for r in rows) == 20_000
