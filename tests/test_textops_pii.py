"""PII scan / redaction semantics on crafted strings (the planted
counterpart of the txt_pii cross-engine gate)."""

from __future__ import annotations

import pytest

from hunt_spark.operators.textops import pii_scan, redact_pii


@pytest.fixture(scope="module")
def pii_docs(spark):
    rows = [
        (1, "write to jane.doe+spam@mail.example.org for details"),
        (2, "server at 192.168.1.254 and backup 10.0.0.1 went down"),
        (3, "call 555-867-5309 or 555.867.5309 today"),
        (4, "card 4111 1111 1111 1111 exp 12/27"),
        (5, "ssn 078-05-1120 on file"),
        (6, "clean document with no sensitive content at all"),
        (7, "mixed: a@b.io, 8.8.8.8, 555-123-4567, 999-99-9999"),
        (8, "not an ip 1234.5.6.7890 and not a phone 12-345-6789"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_counts(pii_docs):
    got = {r["doc_id"]: r for r in pii_scan(pii_docs).collect()}
    assert got[1]["n_email"] == 1 and got[1]["n_pii"] == 1
    assert got[2]["n_ipv4"] == 2 and got[2]["n_pii"] == 2
    assert got[3]["n_phone"] == 2
    assert got[4]["n_ccnum"] == 1
    assert got[5]["n_ssn"] == 1
    assert got[6]["n_pii"] == 0
    assert (got[7]["n_email"], got[7]["n_ipv4"], got[7]["n_phone"],
            got[7]["n_ssn"]) == (1, 1, 1, 1)
    assert got[7]["n_pii"] == 4


def test_pii_negative_shapes(pii_docs):
    """Over-long runs must not match: 1234.5.6.7890 is not an IPv4,
    12-345-6789 is not a phone."""
    got = {r["doc_id"]: r for r in pii_scan(pii_docs).collect()}
    assert got[8]["n_pii"] == 0


def test_redact(pii_docs):
    got = {r["doc_id"]: r["text_redacted"] for r in redact_pii(pii_docs).collect()}
    assert got[1] == "write to <EMAIL> for details"
    assert got[2] == "server at <IPV4> and backup <IPV4> went down"
    assert got[3] == "call <PHONE> or <PHONE> today"
    assert got[4] == "card <CCNUM> exp 12/27"
    assert got[5] == "ssn <SSN> on file"
    assert got[6] == "clean document with no sensitive content at all"
    # nothing sensitive left anywhere
    for t in got.values():
        assert "@" not in t or "<EMAIL>" in t


def test_gate_parity_with_duckdb(spark):
    """Run the txt_pii gate's Spark query and its DuckDB oracle twin on
    the same parquet and compare values — the driver's check, in-repo."""
    import duckdb

    import __spark_entry__ as entry

    sf_dir = "/root/testdata/sf0.001"
    sdf = entry.queries()["txt_pii"](spark, sf_dir).orderBy("doc_id")
    spark_rows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    sql = entry.oracle_sql()["txt_pii"]
    duck_rows = con.sql(f"SELECT * FROM ({sql}) ORDER BY doc_id").fetchall()
    assert spark_rows == duck_rows
    assert any(r[-1] > 0 for r in spark_rows)  # planted PII actually hit
