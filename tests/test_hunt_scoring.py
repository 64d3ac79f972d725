"""Reference-native scoring mode, pinned to the LIVE evaluator's
arithmetic: word hit = sim x tf (Intermediate.hs:432-437); boosts
multiply; AND adds leg scores (intersectionWith (<+>)); OR keeps the
per-doc max (Score monoid, Score.hs:66-71); contexts collapse with the
same Score monoid, i.e. per-doc MAX across contexts
(boostAndAggregateCx, Intermediate.hs:267-278) — so a word hit in two
weight-1 contexts scores 1.0, not 2.0. (The retired RankingTests.hs
pinned 2.0, but it is commented out of the reference suite,
test/Hunt.hs:16, and imports a module that no longer exists.)"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hunt_spark.engine import HuntEngine
from hunt_spark.operators.build import BuildConfig
from hunt_spark.oracle import OracleIndex

ROWS = [
    # url, title, body
    ("uA", "brain", "pinky"),
    ("uB", "word", "word"),
    ("uC", "empty", "cat cat dog"),
    ("uD", "empty", "x x x"),
]


@pytest.fixture(scope="module")
def hunt_engine(spark, tmp_path_factory):
    df = spark.createDataFrame(ROWS, "url string, title string, body string")
    eng = HuntEngine(
        spark,
        str(tmp_path_factory.mktemp("hunt_score_idx")),
        BuildConfig(n_shards=2, salt_buckets=1),
        scoring="hunt",
    )
    eng.build(df, {"title": F.col("title"), "body": F.col("body")}, build_id="h")
    return eng


@pytest.fixture(scope="module")
def hunt_oracle(spark):
    ids = {
        r["url"]: r["id"]
        for r in spark.createDataFrame([(r[0],) for r in ROWS], "url string")
        .select("url", F.xxhash64("url").alias("id"))
        .collect()
    }
    docs = [(ids[u], u, 1.0) for u, _t, _b in ROWS]
    cx = {
        "title": {ids[u]: t for u, t, _b in ROWS},
        "body": {ids[u]: b for u, _t, b in ROWS},
    }
    return OracleIndex(docs, cx, scoring="hunt"), ids


def _score_of(eng, q, url):
    rows = eng.search(q, k=10, use_wand=False).collect()
    by_url = {r["url"]: r["score"] for r in rows}
    return by_url.get(url)


def test_boost_multiplies(hunt_engine):
    # single hit, tf=1, sim=1.0, boost 2 => exactly 2.0 (RankingTests
    # "boost=2 -> score 2.0")
    assert math.isclose(_score_of(hunt_engine, "'brain'^2", "uA"), 2.0)


def test_and_adds_boosted_legs(hunt_engine):
    # 4*1.0 + 8*1.0 = 12 (RankingTests AND-of-boosts case)
    assert math.isclose(
        _score_of(hunt_engine, "'brain'^4 AND 'pinky'^8", "uA"), 12.0
    )


def test_word_in_two_weight1_contexts_scores_1(hunt_engine):
    # boostAndAggregateCx folds contexts with the Score monoid (max):
    # a tf=1 hit in both title and body collapses to 1.0, not 2.0
    assert math.isclose(_score_of(hunt_engine, "'word'", "uB"), 1.0)


def test_tf_counts(hunt_engine):
    assert math.isclose(_score_of(hunt_engine, "'x'", "uD"), 3.0)


def test_or_keeps_per_doc_max(hunt_engine):
    # uC: cat tf=2 (leg 2.0), dog tf=1 (leg 1.0) -> OR = max = 2.0
    # (bm25 mode would sum; hunt mode pins the Score monoid)
    assert math.isclose(_score_of(hunt_engine, "'cat' OR 'dog'", "uC"), 2.0)


@pytest.mark.parametrize(
    "q", ["'brain'^2", "'brain'^4 AND 'pinky'^8", "'word'", "'cat' OR 'dog'", "'x'"]
)
def test_hunt_mode_engine_matches_oracle(hunt_engine, hunt_oracle, q):
    oracle, _ids = hunt_oracle
    got = [
        (r["doc_id"], r["score"])
        for r in hunt_engine.search(q, k=10, use_wand=False).collect()
    ]
    want = [(d, s) for d, _u, s in oracle.search(q, k=10)]
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert math.isclose(g[1], w[1], abs_tol=1e-9)


def test_wand_gated_off_in_hunt_mode(hunt_engine):
    assert hunt_engine.wand() is None
