"""Per-context selector-configurable HTML extraction (html-hunter
"-c CONTEXT[:XPATH]" feeds, HtmlHunter.hs:107-142,288-340): predefined
body/title/headlines selectors and the //tag and /a/b/c forms, the
getAllText whitespace contract, and a two-context build where each
context indexes a different document part."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hunt_spark.engine import HuntEngine
from hunt_spark.functions.analysis import (
    compile_selector,
    extract_by_selector,
)
from hunt_spark.operators.build import BuildConfig

DOC = b"""<html><head><title>The Title Words</title>
<script>var tracked = "scriptnoise";</script></head>
<body><h1>Big Headline</h1>
<p>Body paragraph &amp; entity text.</p>
<div><h2>Nested   Headline</h2><p>more body</p></div>
<style>.c { color: red }</style>
</body></html>"""


def x(sel: str, doc: bytes = DOC) -> str:
    return extract_by_selector(doc, compile_selector(sel))


def test_predefined_selectors_byte_identity():
    # getHtmlTitle = html/head/title; getHtmlPlainText = html/body;
    # getHtmlHeadlines = h1-h6 under body (HtmlHunter.hs:389-400),
    # parts space-separated then normalizeWS (unwords . words)
    assert x("title") == "The Title Words"
    assert x("headlines") == "Big Headline Nested Headline"
    assert (
        x("body")
        == "Big Headline Body paragraph & entity text. Nested Headline more body"
    )


def test_descendant_and_path_selectors():
    assert x("//p") == "Body paragraph & entity text. more body"
    assert x("//h2") == "Nested Headline"
    assert x("/html/head/title") == x("title")
    # absolute path does not match the same tag elsewhere
    assert x("/html/head", b"<html><head>a</head><body><head>b</head></body></html>") == "a"


def test_script_style_comments_never_emit():
    assert "scriptnoise" not in x("body")
    assert "color" not in x("body")
    assert x("//p", b"<html><body><p>ok<!-- hidden words --></p></body></html>") == "ok"


def test_tolerates_malformed_html():
    # stray close tags and unclosed elements must not crash or leak
    assert x("//p", b"</div><p>one<p>two</body>") == "one two"
    assert x("title", b"<title>no html wrapper</title>") == ""


def test_bad_selector_rejected():
    for bad in ("", "frob", "//", "//a/b"):
        with pytest.raises(ValueError):
            compile_selector(bad)


@pytest.fixture(scope="module")
def selector_engine(spark, tmp_path_factory):
    rows = [
        (
            f"sel://doc{i}",
            (
                f"<html><head><title>titleword{i} shared</title></head>"
                f"<body><h1>headword{i}</h1><p>bodyword{i} shared</p></body></html>"
            ).encode(),
        )
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "url string, html binary")
    eng = HuntEngine(
        spark,
        str(tmp_path_factory.mktemp("sel_idx")),
        BuildConfig(
            n_shards=4,
            salt_buckets=2,
            extract_html=True,
            context_selectors={
                "title": "title",
                "heads": "headlines",
                "body": "body",
            },
        ),
    )
    h = F.col("html")
    eng.build(
        docs, {"title": h, "heads": h, "body": h}, build_id="sel"
    )
    return eng


def test_contexts_index_disjoint_parts(selector_engine):
    eng = selector_engine
    # title context sees only title text
    assert eng.search("title:titleword7", k=5).count() == 1
    assert eng.search("title:bodyword7", k=5).count() == 0
    assert eng.search("title:headword7", k=5).count() == 0
    # headlines context sees only h1 text
    assert eng.search("heads:headword7", k=5).count() == 1
    assert eng.search("heads:titleword7", k=5).count() == 0
    # body includes the headline (h1 is under body) but not the title
    assert eng.search("body:headword7", k=5).count() == 1
    assert eng.search("body:titleword7", k=5).count() == 0
    # a term in both title and body resolves per context
    assert eng.search("title:shared", k=100).count() == 30
    assert eng.search("body:shared", k=100).count() == 30
    assert eng.search("heads:shared", k=100).count() == 0
