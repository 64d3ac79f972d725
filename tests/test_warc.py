"""WARC source: pure-parser round-trips (writer twin -> parser) and
the Spark read path (binaryFile -> mapInPandas), gz and plain, plus
the crawl-corpus hand-off (WARC -> documents -> index -> query)."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from hunt_spark.sources import warc


def _recs(n: int, status: int = 200):
    return [
        {
            "type": "response",
            "uri": f"http://site.example.com/p/{i}",
            "date": dt.datetime(2021, 3, 4, 5, 6, 7),
            "record_id": f"<urn:uuid:{i}>",
            "http_status": status,
            "content_type": "text/html",
            "body": f"<html><p>doc {i} body</p></html>".encode(),
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("gz", [True, False])
def test_roundtrip_pure(gz):
    data = warc.write_warc_bytes(_recs(5), gzipped=gz)
    got = list(warc.parse_warc_bytes(data, gzipped=gz))
    assert len(got) == 5
    headers, block = got[3]
    assert headers["warc-target-uri"] == "http://site.example.com/p/3"
    status, ctype, body = warc.http_response_body(block)
    assert (status, ctype) == (200, "text/html")
    assert body == b"<html><p>doc 3 body</p></html>"


def test_multi_member_gzip_boundaries():
    # each record its own gzip member; parser must walk members, not
    # stop after the first
    data = warc.write_warc_bytes(_recs(3), gzipped=True)
    # concatenating two shards is also valid (members just continue)
    got = list(warc.parse_warc_bytes(data + data, gzipped=True))
    assert len(got) == 6


def test_non_response_records_and_raw_blocks():
    recs = [
        {"type": "warcinfo", "record_id": "<urn:uuid:info>",
         "body": b"software: test\r\n"},
        *_recs(2),
        {"type": "request", "uri": "http://site.example.com/p/0",
         "record_id": "<urn:uuid:req>", "body": b"GET /p/0 HTTP/1.1\r\n"},
    ]
    data = warc.write_warc_bytes(recs, gzipped=False)
    got = list(warc.parse_warc_bytes(data, gzipped=False))
    assert [h["warc-type"] for h, _ in got] == [
        "warcinfo", "response", "response", "request",
    ]
    status, ctype, body = warc.http_response_body(got[0][1])
    assert status is None and body == b"software: test\r\n"


def test_http_envelope_edge_cases():
    assert warc.http_response_body(b"not http") == (None, None, b"not http")
    s, c, b = warc.http_response_body(b"HTTP/1.1 301 Moved\r\n\r\n")
    assert (s, c, b) == (301, None, b"")


def test_truncated_gzip_raises():
    data = warc.write_warc_bytes(_recs(2), gzipped=True)
    with pytest.raises(ValueError, match="truncated"):
        list(warc.parse_warc_bytes(data[:-7], gzipped=True))


@pytest.mark.parametrize("gz", [True, False])
def test_warc_df_reads_shards(spark, tmp_path, gz):
    ext = "warc.gz" if gz else "warc"
    for shard in range(3):
        recs = [
            {
                "type": "response",
                "uri": f"http://s{shard}.example.com/p/{i}",
                "date": dt.datetime(2022, 1, 1 + shard),
                "record_id": f"<urn:uuid:{shard}-{i}>",
                "http_status": 200,
                "content_type": "text/html",
                "body": f"<p>s{shard} d{i}</p>".encode(),
            }
            for i in range(4)
        ]
        (tmp_path / f"shard{shard}.{ext}").write_bytes(
            warc.write_warc_bytes(recs, gzipped=gz)
        )
    df = warc.warc_df(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 12
    r = {x["target_uri"]: x for x in rows}["http://s1.example.com/p/2"]
    assert r["http_status"] == 200
    assert bytes(r["payload"]) == b"<p>s1 d2</p>"
    assert r["warc_date"] == dt.datetime(2022, 1, 2)
    # one input task per shard file: partition count == file count
    assert df.rdd.getNumPartitions() >= 1


def test_warc_df_response_only_filter(spark, tmp_path):
    recs = [
        {"type": "warcinfo", "record_id": "<urn:uuid:i>", "body": b"x"},
        *_recs(2),
    ]
    p = tmp_path / "a.warc"
    p.write_bytes(warc.write_warc_bytes(recs, gzipped=False))
    assert warc.warc_df(spark, str(p)).count() == 2
    allrec = warc.warc_df(spark, str(p), response_only=False)
    assert allrec.count() == 3
    assert (
        allrec.filter(F.col("warc_type") == "warcinfo").count() == 1
    )


def test_warc_to_index_handoff(spark, tmp_path):
    """WARC shard -> extracted docs -> HuntEngine build -> query hit:
    the upstream-crawl entry point feeds the same pipeline."""
    import tempfile

    from hunt_spark.engine import HuntEngine
    from hunt_spark.operators.build import BuildConfig

    recs = _recs(6)
    recs[4]["body"] = b"<html><p>pinky and the brain</p></html>"
    (tmp_path / "crawl.warc.gz").write_bytes(warc.write_warc_bytes(recs))
    docs = (
        warc.warc_df(spark, str(tmp_path))
        .filter(F.col("http_status") == 200)
        .select(
            F.col("target_uri").alias("url"),
            F.col("payload").cast("string").alias("html"),
        )
        .withColumn("doc_id", F.xxhash64("url"))
    )
    eng = HuntEngine(
        spark, tempfile.mkdtemp(), BuildConfig(n_shards=2, block_size=64)
    )
    eng.build(
        docs,
        {"body": F.regexp_extract(F.col("html").cast("string"), r"<p>(.*?)</p>", 1)},
        build_id="warc",
    )
    top = eng.search('"pinky and the brain"', k=2).collect()
    assert top and top[0]["doc_id"] == docs.filter(
        F.col("url").endswith("/p/4")
    ).collect()[0]["doc_id"]
