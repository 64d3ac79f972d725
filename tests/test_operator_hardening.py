"""Operator hardening: degenerate inputs that must not crash or
degenerate at corpus scale — zero-norm embeddings under ANSI mode,
empty frames, invalid LSH banding, full-long-range synthesized urls,
pathological token lengths in the SimHash kernel."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hunt_spark.operators.similarity import cosine_topk, lsh_ann_topk
from hunt_spark.operators.textops import (
    _fnv1a64_batch,
    minhash_lsh_pairs,
    simhash,
)


def test_zero_norm_embedding_does_not_crash_cosine(spark):
    # ANSI mode (Spark 4 default) throws on division by zero; a
    # missing/padded all-zero vector must score cosine 0, not kill the job
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 0.0, 0.0]),  # zero norm
        (2, [1.0, 1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["probe_id"], r["neighbor_id"]): r["cosine_x1e4"]
        for r in cosine_topk(emb, probe_ids=[0], k=3).collect()
    }
    assert got[(0, 1)] == 0  # degenerate pair scores 0
    assert got[(0, 2)] == round(10000 / np.sqrt(2))


def test_lsh_ann_empty_frame_returns_empty(spark):
    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert lsh_ann_topk(emb, probe_ids=[1]).collect() == []


def test_minhash_rejects_degenerate_banding(spark):
    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="multiple"):
        minhash_lsh_pairs(docs, n_hashes=8, bands=16)
    with pytest.raises(ValueError, match="multiple"):
        minhash_lsh_pairs(docs, n_hashes=8, bands=3)


def test_synthesized_urls_unique_and_ordered_for_full_long_range(spark):
    from hunt_spark.engine import HuntEngine
    from hunt_spark.operators.build import BuildConfig

    import tempfile

    big = 2**62
    docs = spark.createDataFrame(
        [
            (-big, "negative big"),
            (-5, "negative small"),
            (0, "zero"),
            (7, "small"),
            (big, "positive big"),
            (1234567890123456, "sixteen digits"),  # lpad(12) truncated this
            (1234567890129999, "sixteen digits b"),
        ],
        "doc_id long, text string",
    )
    eng = HuntEngine(spark, tempfile.mkdtemp(), BuildConfig(n_shards=4))
    eng.build(docs, {"text": F.col("text")}, build_id="u")
    meta = eng.doc_meta().select("doc_id", "url").collect()
    urls = {r["doc_id"]: r["url"] for r in meta}
    assert len(set(urls.values())) == len(urls)  # no collisions
    assert all(len(u) == 20 for u in urls.values())
    # lexicographic url order == numeric doc_id order (biased encoding)
    by_id = [u for _, u in sorted(urls.items())]
    assert by_id == sorted(by_id)


def test_fnv_kernel_survives_pathological_token(spark):
    # one unbroken 200k-char \w+ run among normal tokens: the dense
    # matrix would multiply every term by its length; the sliced kernel
    # must stay exact and bounded
    long_tok = "a" * 200_000
    docs = spark.createDataFrame(
        [(1, f"normal words here {long_tok}"), (2, "normal words here")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert set(rows) == {1, 2}

    def ref(sx: str) -> int:
        h = 14695981039346656037
        for c in sx:
            h = ((h ^ ord(c)) * 1099511628211) % (1 << 64)
        return h

    got = _fnv1a64_batch(np.array(["ab", long_tok], dtype=object))
    assert int(got[0]) == ref("ab")
    assert int(got[1]) == ref(long_tok)
