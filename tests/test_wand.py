"""Block-max WAND executor: rank- and score-identity vs the full plan,
plus evidence that pruning actually skips blocks (the whole point).

Mirrors the reference's guarantee that its bounded-priority-queue top-k
(hunt: Data/LimitedPriorityQueue.hs:43-101) returns exactly the global
best k — here the pruned candidate set must reproduce the unpruned
ranking bit-for-bit on doc ids and to 1e-9 on scores.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hunt_spark.engine import HuntEngine
from hunt_spark.operators.build import BuildConfig
from hunt_spark.plans.parser import parse_query
from hunt_spark.plans.wand import compile_wand
from hunt_spark.sources.corpus import corpus_df

K = 10

WAND_QUERIES = [
    "'brain'",
    "'the' OR 'brain' OR 'pinky'",   # left-nested parser chain flattens
    "'the' 'and' 'new' AND 'york'",
    "'the'",                      # hottest term, most blocks
    "'brain' 'pinky'",            # AND
    "'the' 'and' 'of'",           # hot-term AND
    "'cat' OR 'dog'",
    "'the' OR 'brain'",
    "'brain'^2.5 OR 'pinky'",
    "!'Brain'",                   # case-sensitive exact word
    "'nosuchtermxyz'",            # empty result
    "'nosuchtermxyz' OR 'brain'",
]

NON_WAND = ["bra", '"pinky and the brain"', "[ba TO bd]", "cat AND NOT dog"]


@pytest.fixture(scope="module")
def wand_engine(spark, tmp_path_factory):
    """Single-context index with tiny blocks so pruning has teeth."""
    root = str(tmp_path_factory.mktemp("wand_index"))
    eng = HuntEngine(
        spark, root, BuildConfig(n_shards=4, salt_buckets=2, block_size=64)
    )
    docs = corpus_df(spark, 400, partitions=4)
    eng.build(docs, {"text": F.col("text")}, build_id="wand_test")
    return eng


def test_compile_wand_shapes():
    assert compile_wand(parse_query("'a' 'b'"))[0] == "and"
    assert compile_wand(parse_query("'a' OR 'b'"))[0] == "or"
    op, legs = compile_wand(parse_query("'a'^3 OR 'b'"))
    assert op == "or" and legs[0].boost == 3.0
    for q in NON_WAND:
        assert compile_wand(parse_query(q)) is None


@pytest.mark.parametrize("q", WAND_QUERIES)
def test_wand_matches_full_plan(wand_engine, q):
    full = wand_engine.search(q, k=K, use_wand=False).collect()
    pruned = wand_engine.search(q, k=K, use_wand=True).collect()
    assert [r["doc_id"] for r in pruned] == [r["doc_id"] for r in full]
    for a, b in zip(pruned, full):
        assert math.isclose(a["score"], b["score"], rel_tol=0, abs_tol=1e-9)


def test_wand_actually_prunes(wand_engine):
    # k=1 on the hottest term: θ == the global best score, so every
    # block whose max_bm25 is below the seed block's max is skipped.
    # (At bench/cluster scale pruning bites at realistic k too — small
    # corpora have near-uniform block maxima; see BENCH/BASELINE.md.)
    full = wand_engine.search("'the'", k=1, use_wand=False).collect()
    pruned = wand_engine.search("'the'", k=1, use_wand=True).collect()
    assert [r["doc_id"] for r in pruned] == [r["doc_id"] for r in full]
    st = wand_engine.wand().last_stats
    assert st["blocks_total"] > 4
    assert st["blocks_scanned"] < st["blocks_total"], st


def test_wand_fallback_on_multi_context(engine):
    # session engine has two contexts -> gate must route to the full plan
    assert engine.wand() is None
    res = engine.search("'brain' OR 'pinky'", k=K)  # auto falls back
    assert res.columns == ["doc_id", "url", "score"]


def test_wand_rejects_unshaped_when_forced(wand_engine):
    with pytest.raises(ValueError):
        wand_engine.search('"pinky and the brain"', k=K, use_wand=True)


def test_wand_forced_names_gate_reason_when_unavailable(engine):
    # WAND-able shape, but the session engine's gate is closed
    # (multi-context index): the error must say why, not claim the
    # query shape is wrong
    with pytest.raises(RuntimeError, match="WAND unavailable: multi-context"):
        engine.search("'brain' OR 'pinky'", k=K, use_wand=True)


def test_xxhash64_driver_twin_matches_jvm(spark):
    """Shard pruning relies on a driver-side xxhash64 twin; pin parity
    with Spark's expression over representative lengths (tail paths:
    0/4/1-byte; word path; 32-byte stripes) and non-ASCII."""
    from hunt_spark.functions.xxh64 import spark_xxhash64

    words = ["", "a", "abc", "brain", "pinky", "12345678", "x" * 15,
             "y" * 31, "z" * 32, "w" * 100, "heiß-über-straße", "漢字"]
    got = {
        r["t"]: r["h"]
        for r in spark.createDataFrame([(w,) for w in words], "t string")
        .select("t", F.xxhash64("t").alias("h"))
        .collect()
    }
    for w in words:
        assert got[w] == spark_xxhash64(w), w


@pytest.mark.parametrize("q", ["'the'", "'the' OR 'brain'", "'the' 'and' 'of'"])
def test_wand_bounded_stats_collect_identical(wand_engine, q):
    """Force a tiny driver cap: stats must be grouped executor-side
    (granularity > 1, rows <= cap + slack) and results must stay
    rank+score identical — group-level pruning is exact by
    construction (group max >= member max)."""
    from hunt_spark.plans.wand import WandExecutor, compile_wand as cw

    wx = wand_engine.wand()
    tiny = WandExecutor(
        wand_engine.spark, wx.blocks, wand_engine.cfg.n_shards,
        wx.n_docs, wx.avg_dl, max_stats_rows=4,
    )
    op, legs = cw(parse_query(q))
    full = wand_engine.search(q, k=K, use_wand=False).collect()
    cand = tiny.topk_candidates(op, legs, K, ("text",))
    got = (
        wand_engine.compiler().collapse_contexts(cand)
        .join(wand_engine.doc_meta().select("doc_id", "url", "weight"), "doc_id")
        .select("doc_id", (F.col("score") * F.col("weight")).alias("score"), "url")
        .orderBy(F.desc("score"), F.asc("url"))
        .limit(K)
        .collect()
    )
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in full]
    for a, b in zip(got, full):
        assert math.isclose(a["score"], b["score"], rel_tol=0, abs_tol=1e-9)
    st = tiny.last_stats
    assert st["granularity"] > 1, st
    # the bound: grouped rows <= cap + one partial group per (cx, term)
    assert st["stats_rows_collected"] <= 4 + len(legs), st


def test_or_seed_job_folded_when_upside_small(wand_engine):
    # the θ-seed is an extra Spark job that only pays if it can prune
    # real work; when seed coverage (>= seed_factor*k postings) already
    # spans most candidates, the executor must skip it and scan
    # everything in the main pass — same results, one job fewer
    eng = wand_engine
    total = (
        eng.compiler()
        .postings.filter(F.col("term_lc").isin(["the", "brain"]))
        .count()
    )
    k_big = max(2, int(total * 0.15))  # seed covers ~60% -> rest < covered
    full = eng.search("'the' OR 'brain'", k=k_big, use_wand=False).collect()
    pruned = eng.search("'the' OR 'brain'", k=k_big, use_wand=True).collect()
    assert [r["doc_id"] for r in pruned] == [r["doc_id"] for r in full]
    assert eng.wand().last_stats["seed_jobs"] == 0
    # ...while a genuinely prunable query (tiny k, hot term) still seeds
    eng.search("'the' OR 'brain'", k=1, use_wand=True).collect()
    assert eng.wand().last_stats["seed_jobs"] == 1
