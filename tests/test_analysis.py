"""Analysis-chain unit tests (SURVEY.md §5 model: AnalyzerTests)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hunt_spark.functions.analysis import (
    _extract_one,
    extract_text_udf,
    tokenize_col,
    tokenize_py,
)
from hunt_spark.functions.varbyte import (
    delta_varbyte_decode,
    delta_varbyte_encode,
)
from hunt_spark.sources.corpus import corpus_df, corpus_pandas


def test_tokenize_parity_jvm_python(spark):
    samples = [
        "Hello, world! foo_bar 42 x",
        "  multiple   spaces\tand\nnewlines ",
        "punct-only !!! ... ??",
        "",
        "Ünïcode wörds straße",
        "a1 b2 c3 under_score",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "text string")
    got = df.select(tokenize_col("text").alias("t")).collect()
    for row, s in zip(got, samples):
        assert row["t"] == tokenize_py(s), s


def test_positions_are_one_based_over_surviving_tokens():
    # Hunt Analyze.hs:62-84 — positions count surviving tokens only
    toks = tokenize_py("the, quick ... fox")
    assert toks == ["the", "quick", "fox"]


def test_extract_text_byte_identity_local():
    pdf = corpus_pandas(50)
    for html, text in zip(pdf["html"], pdf["text"]):
        assert _extract_one(html) == text


def test_extract_text_udf_spark(spark, corpus):
    bad = corpus.withColumn("x", extract_text_udf("html")).filter(
        F.col("x") != F.col("text")
    )
    assert bad.count() == 0


def test_extract_strips_script_style_comments():
    html = b"<html><body><script>var x=1;</script><p>keep me</p><!-- no --><style>a{}</style></body></html>"
    assert _extract_one(html) == "keep me"


def test_extract_unescapes_entities():
    # &nbsp; unescapes to \xa0 which is whitespace — normalizeWS
    # (words >>> unwords; Haskell isSpace includes \xa0) collapses it
    assert _extract_one(b"<p>a &amp; b&nbsp;c</p>") == "a & b c"


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200))
def test_varbyte_roundtrip(values):
    a = np.array(sorted(values), dtype=np.int64)
    assert list(delta_varbyte_decode(delta_varbyte_encode(a))) == sorted(values)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=100))
def test_varbyte_roundtrip_signed_first(values):
    # doc ids are signed xxhash64 values; the first delta may be negative
    a = np.array(sorted(values), dtype=np.int64)
    assert list(delta_varbyte_decode(delta_varbyte_encode(a))) == sorted(values)


def test_fused_html_extraction_build_equals_text_build(spark, tmp_path_factory):
    """cfg.extract_html runs extraction inside the tokenize kernel; the
    resulting index must be identical to building from the pre-
    extracted text column (the byte-identity contract, fused)."""
    import math

    from pyspark.sql import functions as F

    from hunt_spark.engine import HuntEngine
    from hunt_spark.operators.build import BuildConfig
    from hunt_spark.sources.corpus import corpus_df

    docs = corpus_df(spark, 150, partitions=2)
    a = HuntEngine(
        spark, str(tmp_path_factory.mktemp("ix_text")),
        BuildConfig(n_shards=4, salt_buckets=2),
    )
    a.build(docs, {"text": F.col("text")}, build_id="t")
    b = HuntEngine(
        spark, str(tmp_path_factory.mktemp("ix_html")),
        BuildConfig(n_shards=4, salt_buckets=2, extract_html=True),
    )
    b.build(docs, {"text": F.col("html")}, build_id="h")
    for q in ("brain", "'the' 'new'", '"pinky and the brain"'):
        ra = a.search(q, k=10, use_wand=False).collect()
        rb = b.search(q, k=10, use_wand=False).collect()
        assert [r["doc_id"] for r in ra] == [r["doc_id"] for r in rb], q
        for x, y in zip(ra, rb):
            assert math.isclose(x["score"], y["score"], rel_tol=0, abs_tol=1e-9)


def test_jvm_and_python_invert_strategies_identical(spark):
    """The codegen'd posexplode+groupBy inversion and the Arrow kernel
    must produce identical postings rows (term, tf, positions, dl)."""
    from pyspark.sql import functions as F

    from hunt_spark.operators.build import BuildConfig, postings_from_contexts
    from hunt_spark.sources.corpus import corpus_df

    docs = corpus_df(spark, 120, partitions=2).withColumn(
        "doc_id", F.xxhash64("url")
    )
    cxs = {"text": F.col("text")}

    def rows(strategy):
        p = postings_from_contexts(
            docs, cxs, BuildConfig(n_shards=4, invert_strategy=strategy)
        )
        return sorted(
            (r["doc_id"], r["context"], r["term"], r["tf"],
             tuple(r["positions"]), r["dl"], r["term_lc"], r["shard"])
            for r in p.collect()
        )

    want = rows("jvm")
    assert want == rows("python")
    assert want == rows("arrow")


def test_arrow_invert_html_extraction_identical(spark):
    """extract_html path: the fused python kernel and the
    extract-UDF + JVM-tokenize + Arrow kernel pipeline must produce
    identical postings (the byte-identical-extraction contract)."""
    from pyspark.sql import functions as F

    from hunt_spark.operators.build import BuildConfig, postings_from_contexts
    from hunt_spark.sources.corpus import corpus_df

    docs = corpus_df(spark, 80, partitions=2).withColumn(
        "doc_id", F.xxhash64("url")
    )
    cxs = {"text": F.col("html")}

    def rows(strategy):
        p = postings_from_contexts(
            docs, cxs,
            BuildConfig(n_shards=4, invert_strategy=strategy, extract_html=True),
        )
        return sorted(
            (r["doc_id"], r["term"], r["tf"], tuple(r["positions"]), r["dl"])
            for r in p.collect()
        )

    assert rows("python") == rows("arrow")


def test_corpus_determinism_spark_vs_pandas(spark):
    want = corpus_pandas(40)
    got = (
        corpus_df(spark, 40, partitions=3)
        .orderBy("url")
        .toPandas()
    )
    want = want.sort_values("url").reset_index(drop=True)
    got = got.sort_values("url").reset_index(drop=True)
    assert list(got["url"]) == list(want["url"])
    assert list(got["text"]) == list(want["text"])
    assert [bytes(b) for b in got["html"]] == [bytes(b) for b in want["html"]]
    assert list(got["lang"]) == list(want["lang"])


def test_pack_strategies_identical(spark):
    """The Arrow-native whole-batch blocks pack and the pandas
    per-group kernel must emit identical block rows — including
    byte-identical delta+varbyte buffers and float-identical maxima."""
    from pyspark.sql import functions as F

    from hunt_spark.operators.build import (
        BuildConfig, build_blocks, context_stats, postings_from_contexts,
        term_stats,
    )
    from hunt_spark.sources.corpus import corpus_df

    docs = corpus_df(spark, 150, partitions=2).withColumn(
        "doc_id", F.xxhash64("url")
    )
    cfg = BuildConfig(n_shards=4, block_size=64)
    p = postings_from_contexts(docs, {"text": F.col("text")}, cfg)
    ts, cs = term_stats(p), context_stats(p)

    def rows(strategy):
        cfgx = BuildConfig(n_shards=4, block_size=64, pack_strategy=strategy)
        bl = build_blocks(spark, p, ts, cs, cfgx)
        return sorted(
            (r["context"], r["shard"], r["term_lc"], r["block_id"],
             r["n_postings"], r["max_bm25"], r["df"], r["n_blocks"],
             bytes(r["doc_ids_vb"]), tuple(r["variants"]),
             tuple(r["tfs"]), tuple(r["dls"]))
            for r in bl.collect()
        )

    assert rows("python") == rows("arrow")


def test_context_stats_single_shuffle_equals_per_doc_form(engine):
    # the one-pass form (sum(tf)/countDistinct) must equal the former
    # two-level groupBy exactly: dl == sum(tf) per (context, doc) by
    # construction, so the sums are the same integers
    from pyspark.sql import functions as F

    from hunt_spark.operators.build import context_stats

    p = engine.compiler().postings
    got = {
        r["context"]: (r["n_docs"], r["avg_dl"])
        for r in context_stats(p).collect()
    }
    per_doc = p.groupBy("context", "doc_id").agg(F.max("dl").alias("dl"))
    want = {
        r["context"]: (r["n_docs"], r["avg_dl"])
        for r in per_doc.groupBy("context")
        .agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avg_dl"))
        .collect()
    }
    assert got == want
