"""Rank-identity gate: Spark engine vs pure-Python oracle on the
reference query set (FIXTURES.md §3) — top-k docIDs identical, BM25
scores equal to atol 1e-6, tie-break (score DESC, url ASC)."""

from __future__ import annotations

import math

import pytest

from hunt_spark.plans.parser import parse_query

K = 10

REFERENCE_QUERIES = {
    "q01": "brain",
    "q02": "!Brain",
    "q03": "bra",
    "q04": "new york",
    "q05": "new AND york AND city",
    "q06": "cat OR dog",
    "q07": "cat AND NOT dog",
    "q08": '"pinky and the brain"',
    "q09": "pinky NEAR 3 brain",
    "q10": "pinky FOLLOW 5 brain",
    "q11": "title:brain",
    "q12": "[ba TO bd]",  # FIXTURES.md has [aa TO ac] but the vocab has no terms there
    "q13": "brain^2.5 OR pinky",
    "q14": '(cat OR dog) AND NOT "stupid questions"',
}


def run_both(engine, oracle, q, k=K):
    got = [
        (r["doc_id"], r["url"], r["score"])
        for r in engine.search(q, k=k).collect()
    ]
    want = oracle.search(q, k=k)
    return got, want


@pytest.mark.parametrize("qid", sorted(REFERENCE_QUERIES))
def test_rank_identity(engine, oracle, qid):
    q = REFERENCE_QUERIES[qid]
    got, want = run_both(engine, oracle, q)
    assert len(got) > 0, f"{qid}: engine returned no hits"
    assert [g[0] for g in got] == [w[0] for w in want], (
        f"{qid}: doc ranking differs\n got={got}\nwant={want}"
    )
    for g, w in zip(got, want):
        assert math.isclose(g[2], w[2], abs_tol=1e-6), f"{qid}: {g} vs {w}"


def test_completion_rank_identity(engine, oracle):
    got = [(r["term"], r["score"]) for r in engine.completion("bra", k=10).collect()]
    want = oracle.completion("bra", k=10)
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert math.isclose(g[1], w[1], abs_tol=1e-6)


def test_completion_dictionary_path_equals_postings_path(engine, monkeypatch):
    # the no-doc-filter path serves from the vocab-sized term_totals
    # dictionary; forcing the fallback must give identical suggestions
    # AND scores (sim is constant per term, so sum(sim*tf) == sim*sum_tf)
    assert engine._fresh_term_totals() is not None  # fast path active
    fast = [(r["term"], r["score"]) for r in engine.completion("bra", k=20).collect()]
    monkeypatch.setattr(engine, "_fresh_term_totals", lambda: None)
    engine._plan_cache.clear()  # else the cached dictionary plan serves
    slow = [(r["term"], r["score"]) for r in engine.completion("bra", k=20).collect()]
    assert [f[0] for f in fast] == [s[0] for s in slow]
    for f, s in zip(fast, slow):
        assert math.isclose(f[1], s[1], abs_tol=1e-9)


@pytest.mark.parametrize(
    "q",
    ["pinky bra", "'the' AND pinky AND bra", "title:bra", '"pinky and the bra"'],
    ids=["and2", "and3", "context", "phrase"],
)
def test_query_completion_rank_identity(engine, oracle, q):
    # Hunt processQueryScoredWords: AND head as doc-set filter on the
    # last leg's prefix expansion (Processor.hs:311-366)
    got = [
        (r["term"], r["score"])
        for r in engine.complete_query(q, k=10).collect()
    ]
    want = oracle.complete_query(q, k=10)
    assert [g[0] for g in got] == [w[0] for w in want], (got, want)
    for g, w in zip(got, want):
        assert math.isclose(g[1], w[1], abs_tol=1e-6)


def test_word_limit_parity(spark, engine, oracle):
    """Hunt's wordLimit knob (Processor.hs:79-90): prefix expansion
    capped to the N shortest terms per context; engine and oracle must
    agree under the cap, and the cap must actually bite."""
    from hunt_spark.engine import HuntEngine

    limited = HuntEngine(spark, engine.catalog.root, engine.cfg, word_limit=1)
    old = oracle.word_limit
    oracle.word_limit = 1
    try:
        got = [
            (r["doc_id"], r["score"])
            for r in limited.search("bra", k=10, use_wand=False).collect()
        ]
        want = oracle.search("bra", k=10)
        assert [g[0] for g in got] == [w[0] for w in want]
        for g, w in zip(got, want):
            assert math.isclose(g[1], w[2], abs_tol=1e-6)
    finally:
        oracle.word_limit = old
    # the cap must actually bite: docs whose only match was a dropped
    # expansion term disappear from the full result set
    n_limited = limited.search("bra", k=100000, use_wand=False).count()
    n_full = engine.search("bra", k=100000, use_wand=False).count()
    assert n_limited < n_full


def test_doc_limit_parity(spark, engine, oracle):
    """Hunt's docLimit knob (Processor.hs:79-90, default 500 there;
    truncation Intermediate.hs:327-342): every primary scan keeps
    matched words in word order until their cumulative doc count
    reaches the limit, keeping the crossing word whole. Engine and
    oracle must agree under the cap, and the cap must bite."""
    from hunt_spark.engine import HuntEngine

    limited = HuntEngine(spark, engine.catalog.root, engine.cfg, doc_limit=3)
    old = oracle.doc_limit
    oracle.doc_limit = 3
    try:
        for q in ("bra", "'the'", "[ba TO bd]"):
            got = [
                (r["doc_id"], r["score"])
                for r in limited.search(q, k=10, use_wand=False).collect()
            ]
            want = oracle.search(q, k=10)
            assert [g[0] for g in got] == [w[0] for w in want], q
            for g, w in zip(got, want):
                assert math.isclose(g[1], w[2], abs_tol=1e-6)
    finally:
        oracle.doc_limit = old
    n_limited = limited.search("bra", k=100000, use_wand=False).count()
    n_full = engine.search("bra", k=100000, use_wand=False).count()
    assert n_limited < n_full
    # a single word whose df exceeds the limit survives whole (the
    # crossing word is kept): result set identical to the exact plan
    n_hot = limited.search("'the'", k=100000, use_wand=False).count()
    n_hot_full = engine.search("'the'", k=100000, use_wand=False).count()
    assert n_hot == n_hot_full > 3


def test_case_sensitive_excludes_lowercase(engine, oracle):
    # only the planted doc 1 contains capital "Brain"
    got, want = run_both(engine, oracle, "!Brain")
    assert [g[0] for g in got] == [w[0] for w in want]
    assert len(got) >= 1


def test_phrase_subset_of_and(engine):
    phrase = {r["doc_id"] for r in engine.select('"pinky and the brain"').collect()}
    conj = {
        r["doc_id"]
        for r in engine.select("'pinky' 'and' 'the' 'brain'").collect()
    }
    assert phrase and phrase <= conj


def test_and_subset_of_or(engine):
    a = {r["doc_id"] for r in engine.select("'cat' 'dog'").collect()}
    o = {r["doc_id"] for r in engine.select("'cat' OR 'dog'").collect()}
    assert a <= o


def test_offset_pagination(engine, oracle):
    got = [r["doc_id"] for r in engine.search("the", k=5, offset=5).collect()]
    want = [w[0] for w in oracle.search("the", k=5, offset=5)]
    assert got == want


def test_near_symmetric_follow_directed(engine, oracle):
    # planted doc 6 "brain one two three pinky": NEAR 4 matches both orders,
    # FOLLOW 4 only brain-then-pinky
    near = {r["doc_id"] for r in engine.select("'pinky' NEAR 4 'brain'").collect()}
    follow = {r["doc_id"] for r in engine.select("'pinky' FOLLOW 4 'brain'").collect()}
    o_near = {k[1] for k in oracle.eval(parse_query("'pinky' NEAR 4 'brain'"))}
    assert near == o_near
    assert follow <= near


def test_completion_word_limit_parity(spark, engine, oracle):
    """wordLimit caps completion expansion like any other prefix scan;
    engine and oracle must agree under the cap, which must bite."""
    from hunt_spark.engine import HuntEngine

    limited = HuntEngine(spark, engine.catalog.root, engine.cfg, word_limit=2)
    old = oracle.word_limit
    oracle.word_limit = 2
    try:
        got = [
            (r["term"], r["score"])
            for r in limited.completion("bra", k=10).collect()
        ]
        want = oracle.completion("bra", k=10)
        assert [g[0] for g in got] == [w[0] for w in want], (got, want)
        for g, w in zip(got, want):
            assert math.isclose(g[1], w[1], abs_tol=1e-6)
    finally:
        oracle.word_limit = old
    full = [r["term"] for r in engine.completion("bra", k=10).collect()]
    assert len(got) < len(full)  # the cap actually bit


def test_near_chain_flattening_parity(spark, engine, oracle):
    """Nested same-dist NEAR chains flatten associatively on BOTH
    sides (cumulative bounds — c within 2*dist of a), so a 3-term
    chain ranks identically."""
    q = "'the' NEAR 3 'brain' NEAR 3 'the'"
    got = [r["doc_id"] for r in engine.search(q, k=10).collect()]
    want = [w[0] for w in oracle.search(q, k=10)]
    assert got == want


def test_empty_phrase_oracle_matches_engine(engine, oracle):
    assert engine.search('""', k=5).collect() == []
    assert oracle.search('""', k=5) == []
