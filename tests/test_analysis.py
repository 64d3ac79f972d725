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
