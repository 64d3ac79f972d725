"""Prefix absorption (Grammar.hs:238-266): a recall-equivalent rewrite
(doc SETS identical; scores may differ, which is why the reference
ships it off by default — same here, callers opt in)."""

from __future__ import annotations

from hunt_spark.plans.ast import QBoost, QSeq, QWord
from hunt_spark.plans.optimize import optimize_query
from hunt_spark.plans.parser import parse_query


def test_and_keeps_more_specific():
    q = optimize_query(parse_query("bra AND brain"))
    assert q == QWord("brain", "nocase")


def test_or_keeps_laxer():
    q = optimize_query(parse_query("bra OR brain"))
    assert q == QWord("bra", "nocase")


def test_mixed_case_sensitivity_never_absorbs():
    q = optimize_query(parse_query("!Bra AND brain"))
    assert isinstance(q, QSeq) and len(q.legs) == 2


def test_boosted_legs_untouched():
    q = optimize_query(parse_query("bra^2 AND brain"))
    assert isinstance(q, QSeq) and len(q.legs) == 2
    assert any(isinstance(x, QBoost) for x in q.legs)


def test_nested_levels_optimized():
    q = optimize_query(parse_query("(bra OR brain) AND cat"))
    assert isinstance(q, QSeq) and q.op == "and"
    assert QWord("bra", "nocase") in q.legs


def test_doc_set_equivalence_on_engine(engine):
    for text in ("bra AND brain", "bra OR brain"):
        orig = {r["doc_id"] for r in engine.select(text).collect()}
        opt = {
            r["doc_id"]
            for r in engine.select(optimize_query(parse_query(text))).collect()
        }
        assert orig == opt, text


def test_fuzzy_words_never_absorb():
    """Fuzzy expansion is not prefix-monotone: ~bra's variant set does
    not contain ~brain's, so absorption would change the doc set."""
    from hunt_spark.plans.optimize import optimize_query
    from hunt_spark.plans.parser import parse_query

    q = parse_query("~bra OR ~brain")
    assert optimize_query(q) == q
