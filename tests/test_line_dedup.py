"""Pins for corpus-level line deduplication (the C4 boilerplate rule:
strip lines occurring min_dup_count+ times across the whole corpus).
Gate parity vs DuckDB is covered by __spark_entry__ (txt_line_dedup);
these pin the semantics on crafted docs — order preservation,
trimming, empty-line handling, the all-banned and no-line edge rows,
and layout-independence of the result."""

from __future__ import annotations

from pyspark.sql import functions as F

from hunt_spark.operators import textops


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_banned_lines_removed_order_preserved(spark):
    docs = _docs(
        spark,
        [
            (1, "cookie banner\nreal prose one\ncookie banner\nreal prose two"),
            (2, "cookie banner\nother prose"),
            (3, "unique only"),
        ],
    )
    out = {r["doc_id"]: r for r in textops.line_dedup(docs).collect()}
    # "cookie banner" occurs 3x corpus-wide -> banned everywhere
    assert out[1]["n_lines"] == 4
    assert out[1]["n_kept"] == 2
    assert out[1]["kept_text"] == "real prose one\nreal prose two"
    assert out[2]["kept_text"] == "other prose"
    assert out[3]["kept_text"] == "unique only"


def test_trim_and_empty_lines(spark):
    # "  nav  " and "nav" trim to the same line -> count 2 -> banned;
    # blank / whitespace-only lines never count and never survive
    docs = _docs(spark, [(1, "  nav  \n\n   \nkeep me"), (2, "nav")])
    out = {r["doc_id"]: r for r in textops.line_dedup(docs).collect()}
    assert out[1]["n_lines"] == 2  # blanks not counted
    assert out[1]["kept_text"] == "keep me"
    # doc 2's only line is banned -> row stays with empty kept_text
    assert out[2]["n_kept"] == 0
    assert out[2]["kept_text"] == ""


def test_doc_with_no_nonempty_lines_emits_no_row(spark):
    docs = _docs(spark, [(1, "   \n  "), (2, "text")])
    ids = {r["doc_id"] for r in textops.line_dedup(docs).collect()}
    assert ids == {2}


def test_within_doc_repeats_count(spark):
    # C4 counts occurrences, not distinct docs: a line repeated twice
    # inside ONE doc is already "more than once in the dataset"
    docs = _docs(spark, [(1, "twice\nmiddle\ntwice")])
    row = textops.line_dedup(docs).collect()[0]
    assert row["n_kept"] == 1
    assert row["kept_text"] == "middle"


def test_threshold_and_shuffle_join_agree(spark):
    docs = _docs(
        spark,
        [(i, "common\nrare %d" % i) for i in range(5)],
    )
    # min_dup_count=6: nothing banned
    all_kept = textops.line_dedup(docs, min_dup_count=6).collect()
    assert all(r["n_kept"] == 2 for r in all_kept)
    # broadcast and shuffle paths produce identical results
    a = sorted(
        textops.line_dedup(docs, broadcast_banned=True).collect()
    )
    b = sorted(
        textops.line_dedup(docs, broadcast_banned=False).collect()
    )
    assert a == b


def test_layout_independence(spark):
    rows = [(i, "shared line\nline %d" % (i % 3)) for i in range(12)]
    docs = _docs(spark, rows)
    one = sorted(textops.line_dedup(docs.coalesce(1)).collect())
    many = sorted(textops.line_dedup(docs.repartition(8)).collect())
    assert one == many
