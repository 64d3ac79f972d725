"""Replicates the driver's correctness gate locally: every queries()
entry vs its oracle_sql() in DuckDB on the same parquet tables —
row-count, column names, and order-insensitive value equality."""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("HUNT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(rows, cols):
    # order-insensitive, column-name-sorted compare (driver protocol)
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(r[i] for i in idx) for r in rows)


ALL = sorted(entrymod.queries())
WITH_ORACLE = sorted(set(ALL) & set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    df = q(spark, SF_DIR)
    got_cols = df.columns
    got = _norm([tuple(r) for r in df.collect()], got_cols)
    res = ddb.sql(entrymod.oracle_sql()[name])
    want_cols = res.columns
    want = _norm(res.fetchall(), want_cols)
    assert sorted(got_cols) == sorted(want_cols), f"{name}: column names differ"
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    assert got == want, f"{name}: values differ\n got[:5]={got[:5]}\nwant[:5]={want[:5]}"


@pytest.mark.parametrize("name", sorted(set(ALL) - set(WITH_ORACLE)))
def test_query_without_oracle_runs(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"doc_id", "score_x1e4"}
