"""Multimodal plumbing: schema/batch-shape/partition-invariance of the
binary-payload kernels (decode itself is stubbed — no codec libs here;
the Spark-side contract is what's under test)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from hunt_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def payloads(spark, corpus):
    return mm.attach_payload(
        corpus.withColumn("doc_id", F.xxhash64("url")).select("doc_id", "text")
    )


def test_payload_meta_matches_python(payloads):
    rows = mm.payload_meta(payloads).collect()
    raw = {r["doc_id"]: bytes(r["payload"]) for r in payloads.collect()}
    assert len(rows) == len(raw)
    for r in rows:
        p = raw[r["doc_id"]]
        assert r["n_bytes"] == len(p)
        assert r["payload_md5"] == hashlib.md5(p).hexdigest()
        assert r["width"] == len(p) % 1024
        assert r["height"] == (len(p) // 1024) % 1024


def test_decode_real_path_nulls_undecodable(payloads):
    """The real decode path (stdlib PNG/WAV codecs, r5) must not fail
    the job on undecodable payloads — these text blobs are not PNGs,
    so every row yields features=NULL (corrupt blobs are routine at
    100 TB; decode health is a downstream null-count, not a job
    abort)."""
    rows = mm.decode_image(payloads).collect()
    assert rows and all(r["features"] is None for r in rows)


def test_decode_fake_deterministic_across_partitioning(payloads):
    a = mm.decode_image(payloads, dim=32, fake=True)
    b = mm.decode_image(payloads.repartition(7), dim=32, fake=True)
    fa = {r["doc_id"]: r["features"] for r in a.collect()}
    fb = {r["doc_id"]: r["features"] for r in b.collect()}
    assert fa.keys() == fb.keys()
    for k in fa:
        assert len(fa[k]) == 32
        assert fa[k] == fb[k]
        assert all(-1.0 <= x < 1.0 for x in fa[k])


def test_frame_sample_stride_and_cap(spark):
    payload = bytes(range(256)) * 40  # 40 frames of 256B
    df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
    out = mm.frame_sample(df, frame_bytes=256, every_n=4, max_frames=64).collect()
    assert [r["frame_idx"] for r in out] == list(range(0, 40, 4))
    for r in out:
        assert bytes(r["frame"]) == payload[r["frame_idx"] * 256:(r["frame_idx"] + 1) * 256]
    # cap: 1000 frames, every_n=2, max 10 -> indices 0,2,...,18
    big = spark.createDataFrame([(2, b"x" * 256 * 1000)], "doc_id long, payload binary")
    capped = mm.frame_sample(big, frame_bytes=256, every_n=2, max_frames=10).collect()
    assert len(capped) == 10


def test_near_dup_by_features_finds_exact_dups(spark):
    rows = [(i, f"unique text number {i} " * 5) for i in range(20)]
    rows.append((100, rows[3][1]))  # exact dup of doc 3
    df = mm.attach_payload(
        spark.createDataFrame(rows, "doc_id long, text string"), "text"
    )
    feats = mm.decode_image(df, dim=32, fake=True)
    pairs = mm.near_dup_by_features(feats, threshold=0.999).collect()
    assert {(r["doc_id_a"], r["doc_id_b"]) for r in pairs} == {(3, 100)}
    assert abs(pairs[0]["cosine"] - 1.0) < 1e-6
