"""Randomized engine-vs-oracle doc-set identity over generated query
ASTs — the fuzz companion to the fixed rank-identity suite. Doc sets
(unscored Select semantics) are exact set equality; random shapes
cover word ops, phrases, boolean combinators, positional sequences,
boosts, context restrictions, and ranges, nested up to depth 3."""

from __future__ import annotations

import random

import pytest

from hunt_spark.plans.ast import (
    QBoost,
    QContext,
    QFullWord,
    QPhrase,
    QRange,
    QSeq,
    QWord,
)

# seed vocabulary: real stems (high hit rates), full planted words,
# case variants, and garbage (no-hit paths)
_WORDS = [
    "the", "brain", "Brain", "bra", "pinky", "narf", "world", "take",
    "over", "zz_nothing", "a", "sc", "spark",
]
_OPS = ["nocase", "nocase", "case", "fuzzy"]


def _gen(rng: random.Random, depth: int):
    roll = rng.random()
    if depth <= 0 or roll < 0.35:
        w = rng.choice(_WORDS)
        op = rng.choice(_OPS)
        if rng.random() < 0.25:
            return QFullWord(w, op)
        return QWord(w, op)
    if roll < 0.45:
        words = rng.sample(_WORDS[:8], k=rng.randint(1, 3))
        return QPhrase(" ".join(words), "nocase")
    if roll < 0.5:
        lo, hi = sorted(rng.sample(["a", "brain", "m", "take", "z"], k=2))
        return QRange(lo, hi)
    if roll < 0.6:
        cx = rng.choice([("title",), ("body",), ("title", "body")])
        return QContext(cx, _gen(rng, depth - 1))
    if roll < 0.68:
        return QBoost(rng.choice([0.5, 2.0, 3.0]), _gen(rng, depth - 1))
    op = rng.choice(["and", "or", "andnot", "near", "follow", "phrase"])
    if op in ("near", "follow", "phrase"):
        # positional sequences need word-form legs
        legs = tuple(
            QWord(rng.choice(_WORDS[:8]), "nocase")
            for _ in range(rng.randint(2, 3))
        )
        return QSeq(op, legs, rng.randint(1, 4) if op != "phrase" else 1)
    legs = tuple(_gen(rng, depth - 1) for _ in range(rng.randint(2, 3)))
    return QSeq(op, legs)


@pytest.mark.parametrize("seed", range(40))
def test_fuzz_doc_set_identity(engine, oracle, seed):
    rng = random.Random(seed * 7919 + 13)
    ast = _gen(rng, 3)
    got = {r["doc_id"] for r in engine.select(ast).collect()}
    want = set(oracle._collapse(oracle.eval(ast)).keys())
    assert got == want, f"ast={ast!r}"


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_print_parse_select_identity(engine, seed):
    """print_query of a generated AST reparses to a query with the
    SAME doc set (the stronger cross-check of printer, parser, and
    evaluator against each other; AST equality is pinned elsewhere
    for the parser-expressible subset)."""
    from hunt_spark.plans.ast import print_query
    from hunt_spark.plans.parser import parse_query

    rng = random.Random(seed * 104729 + 1)
    ast = _gen(rng, 2)
    printed = print_query(ast)
    reparsed = parse_query(printed)
    got = {r["doc_id"] for r in engine.select(ast).collect()}
    rep = {r["doc_id"] for r in engine.select(reparsed).collect()}
    assert got == rep, f"ast={ast!r} printed={printed!r} reparsed={reparsed!r}"


@pytest.mark.parametrize("seed", range(30))
def test_fuzz_json_wire_roundtrip(seed):
    """Grammar.hs ToJSON/FromJSON identity over generated ASTs —
    driver-only, no Spark."""
    from hunt_spark.plans.ast import query_from_json, query_to_json

    rng = random.Random(seed * 31337 + 5)
    ast = _gen(rng, 3)
    assert query_from_json(query_to_json(ast)) == ast
