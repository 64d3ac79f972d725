"""Structured-Streaming ingest: drained stream + stat refresh must be
indistinguishable from a one-shot batch build of the same corpus."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hunt_spark.engine import HuntEngine
from hunt_spark.operators.build import BuildConfig
from hunt_spark.sources.corpus import CORPUS_SCHEMA, corpus_pandas
from hunt_spark.streaming.ingest import stream_ingest, windowed_doc_counts

N_BASE, N_STREAM = 150, 150
QUERIES = ["brain", "'the' 'new'", '"pinky and the brain"', "cat OR dog"]


def _chunk_df(spark, n, offset):
    return spark.createDataFrame(corpus_pandas(n, offset), schema=CORPUS_SCHEMA)


@pytest.fixture(scope="module")
def streamed_engine(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    inbox = str(base / "inbox")
    cxs = {"text": F.col("text")}

    eng = HuntEngine(
        spark, str(base / "idx"), BuildConfig(n_shards=4, salt_buckets=2)
    )
    eng.build(_chunk_df(spark, N_BASE, 0), cxs, build_id="stream_base")

    # two files land after the base build
    _chunk_df(spark, 75, N_BASE).coalesce(1).write.mode("append").parquet(inbox)
    _chunk_df(spark, 75, N_BASE + 75).coalesce(1).write.mode("append").parquet(inbox)

    q = stream_ingest(
        spark, eng, inbox, cxs, checkpoint=str(base / "ckpt"), available_now=True
    )
    q.awaitTermination(120)
    assert not q.isActive
    eng._refresh_stats()
    return eng


@pytest.fixture(scope="module")
def batch_engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("stream_batch_idx"))
    eng = HuntEngine(spark, root, BuildConfig(n_shards=4, salt_buckets=2))
    eng.build(
        _chunk_df(spark, N_BASE + N_STREAM, 0),
        {"text": F.col("text")},
        build_id="batch_equiv",
    )
    return eng


@pytest.mark.parametrize("q", QUERIES)
def test_streamed_equals_batch(streamed_engine, batch_engine, q):
    a = streamed_engine.search(q, k=10, use_wand=False).collect()
    b = batch_engine.search(q, k=10, use_wand=False).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    for x, y in zip(a, b):
        assert math.isclose(x["score"], y["score"], rel_tol=0, abs_tol=1e-9)


def test_streamed_doc_count(streamed_engine):
    assert streamed_engine.doc_meta().count() == N_BASE + N_STREAM


def test_checkpoint_no_reprocess(spark, streamed_engine, tmp_path_factory):
    # exactly-once: draining again with the same checkpoint is a no-op
    before = streamed_engine.doc_meta().count()
    ckpt = streamed_engine.catalog.root.replace("/idx", "/ckpt")
    inbox = streamed_engine.catalog.root.replace("/idx", "/inbox")
    q = stream_ingest(
        spark, streamed_engine, inbox, {"text": F.col("text")}, checkpoint=ckpt
    )
    q.awaitTermination(60)
    streamed_engine._refresh_stats()
    assert streamed_engine.doc_meta().count() == before


def test_windowed_counts_batch_semantics(spark):
    # the window+watermark shape evaluated on a bounded frame
    df = _chunk_df(spark, 200, 0)
    out = windowed_doc_counts(df, window="1 minute").collect()
    assert sum(r["n_docs"] for r in out) == 200
    for r in out:
        assert r["lang"] in ("en", "de")
