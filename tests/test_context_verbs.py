"""Runtime InsertContext / DeleteContext verbs (Hunt
Interpreter/Command.hs:71-75): schema registry lifecycle, incremental
per-context append, partition drop, stats refresh, and WAND-gate
staleness across the mutations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hunt_spark.engine import HuntEngine
from hunt_spark.operators.build import BuildConfig
from hunt_spark.sources.corpus import CORPUS_SCHEMA, corpus_pandas


@pytest.fixture()
def eng(spark, tmp_path_factory):
    e = HuntEngine(
        spark,
        str(tmp_path_factory.mktemp("cx_verbs_idx")),
        BuildConfig(n_shards=4, salt_buckets=2),
    )
    docs = spark.createDataFrame(corpus_pandas(60), schema=CORPUS_SCHEMA)
    e.build(docs, {"text": F.col("text")}, build_id="cxv")
    return e


def test_insert_context_lifecycle(spark, eng):
    # registering twice fails (InterpreterTests 'inserting a context twice')
    eng.insert_context("tag", ctype="text", weight=2.0)
    with pytest.raises(ValueError, match="already exists"):
        eng.insert_context("tag")

    # the context exists immediately: empty result, NOT unknown-context
    assert eng.search("tag:anything", k=5).count() == 0

    # postings arrive through a later insert carrying the new context
    new = spark.createDataFrame(
        [("https://example.org/tagged", "some body words", "urgent beta")],
        "url string, text string, tag string",
    )
    eng.insert(new, {"text": F.col("text"), "tag": F.col("tag")})
    hits = eng.search("tag:urgent", k=5).collect()
    assert [r["url"] for r in hits] == ["https://example.org/tagged"]
    # context weight from the schema applies (weight 2.0, single hit)
    one_cx = eng.search("tag:'urgent'", k=5).collect()[0]
    both = eng.search("'urgent'", k=5).collect()[0]
    assert one_cx["score"] == both["score"] > 0

    # inserting into an unregistered context fails (InterpreterTests
    # 'insert into non-existent context')
    with pytest.raises(KeyError, match="unknown contexts"):
        eng.insert(new, {"nope": F.col("tag")})


def test_insert_typed_context_at_runtime(spark, eng):
    # a typed context added at runtime normalizes its values (int
    # ZeroFill) and answers numeric ranges
    eng.insert_context("year", ctype="int")
    new = spark.createDataFrame(
        [("https://example.org/y1", "body", "1999"),
         ("https://example.org/y2", "body", "7")],
        "url string, text string, year string",
    )
    eng.insert(new, {"text": F.col("text"), "year": F.col("year")})
    got = {r["url"] for r in eng.search("year:[0 TO 2000]", k=10).collect()}
    assert got == {"https://example.org/y1", "https://example.org/y2"}

    # reopened engine sees the schema (durable, not just in-memory cfg)
    reopened = HuntEngine(eng.spark, eng.catalog.root, BuildConfig(n_shards=4))
    got2 = {r["url"] for r in reopened.search("year:[0 TO 2000]", k=10).collect()}
    assert got2 == got


def test_insert_position_rtree_context_at_runtime(spark, eng):
    # the reference wire name "position-rtree" (ctPositionRTree,
    # Interpreter.hs:185, Schema.hs:173-179) registers, keeps its
    # declared name on the durable schema, and answers rect queries
    # through the z-order layout after reopen
    eng.insert_context("spot", ctype="position-rtree")
    new = spark.createDataFrame(
        [("https://example.org/p1", "body", "10.5-20.5"),
         ("https://example.org/p2", "body", "80.0-170.0")],
        "url string, text string, spot string",
    )
    eng.insert(new, {"text": F.col("text"), "spot": F.col("spot")})

    def rect_urls(e):
        got = e.search("spot:[10.0-20.0 TO 11.0-21.0]", k=10)
        return {r["url"] for r in got.collect()}

    assert rect_urls(eng) == {"https://example.org/p1"}
    reopened = HuntEngine(eng.spark, eng.catalog.root, BuildConfig(n_shards=4))
    assert rect_urls(reopened) == {"https://example.org/p1"}
    # declared name survives on the schema surface
    assert reopened._schema()["spot"][0] == "position-rtree"


def test_delete_context_drops_partitions_and_reopens_wand(spark, eng):
    eng.insert_context("tag")
    new = spark.createDataFrame(
        [("https://example.org/tagged", "fresh body", "urgent")],
        "url string, text string, tag string",
    )
    eng.insert(new, {"text": F.col("text"), "tag": F.col("tag")})
    assert eng.search("tag:urgent", k=5).count() == 1

    eng.delete_context("tag")
    with pytest.raises(KeyError, match="unknown contexts"):
        eng.search("tag:urgent", k=5).count()
    # the doc itself survives in the remaining contexts
    assert eng.search("'fresh'", k=5).count() == 1
    # stats no longer carry the dropped context
    cstats = {r["context"] for r in eng.catalog.read(spark, "context_stats").collect()}
    assert cstats == {"text"}
    with pytest.raises(KeyError, match="unknown context"):
        eng.delete_context("tag")

    # single-context again + compact -> blocks rebuilt, WAND gate open
    eng.compact()
    assert eng.wand() is not None
    w = eng.search("'the'", k=5, use_wand=True).collect()
    f = eng.search("'the'", k=5, use_wand=False).collect()
    assert [r["doc_id"] for r in w] == [r["doc_id"] for r in f]
