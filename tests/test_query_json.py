"""Structured-query JSON wire codec — the reference's ToJSON/FromJSON
Query instances (Hunt/Query/Language/Grammar.hs:84-165): clients can
POST query ASTs as JSON objects instead of query-language strings."""

from __future__ import annotations

import pytest

from hunt_spark.plans.ast import (
    QBoost,
    QContext,
    QFullWord,
    QPhrase,
    QRange,
    QSeq,
    QueryJsonError,
    QWord,
    query_from_json,
    query_to_json,
)
from hunt_spark.plans.parser import parse_query

CASES = [
    QWord("spar", "nocase"),
    QFullWord("spark", "case"),
    QPhrase("pinky and the brain", "nocase"),
    QContext(("title", "body"), QWord("bra", "nocase")),
    QBoost(2.5, QFullWord("x", "nocase")),
    QRange("aaa", "zzz"),
    QSeq("and", (QWord("a"), QWord("b"), QWord("c"))),
    QSeq("andnot", (QFullWord("a"), QFullWord("b"))),
    QSeq("near", (QFullWord("a"), QFullWord("b")), 3),
    QSeq("follow", (QFullWord("a"), QFullWord("b")), 2),
    QSeq("phrase", (QFullWord("a"), QFullWord("b"))),
]


@pytest.mark.parametrize("q", CASES, ids=lambda q: type(q).__name__)
def test_roundtrip(q):
    assert query_from_json(query_to_json(q)) == q


def test_reference_wire_shapes_decode():
    # literal shapes from Grammar.hs:84-127, incl. the binary forms
    assert query_from_json(
        {"type": "word", "op": "nocase", "word": "foo"}
    ) == QWord("foo", "nocase")
    assert query_from_json(
        {
            "type": "and not",
            "query1": {"type": "word", "op": "case", "word": "a"},
            "query2": {"type": "word", "op": "case", "word": "b"},
        }
    ) == QSeq("andnot", (QWord("a", "case"), QWord("b", "case")))
    assert query_from_json(
        {
            "type": "seq",
            "op": "near 4",
            "args": [
                {"type": "fullword", "op": "nocase", "word": "a"},
                {"type": "fullword", "op": "nocase", "word": "b"},
            ],
        }
    ) == QSeq("near", (QFullWord("a"), QFullWord("b")), 4)


def test_matches_text_parser():
    # the codec and the text parser meet at the same AST
    assert query_to_json(parse_query("'spark' OR 'hash'")) == {
        "type": "seq",
        "op": "or",
        "args": [
            {"type": "fullword", "op": "nocase", "word": "spark"},
            {"type": "fullword", "op": "nocase", "word": "hash"},
        ],
    }


@pytest.mark.parametrize(
    "bad",
    [
        {"type": "word", "op": "shout", "word": "x"},
        # missing 'op' is rejected like the reference FromJSON
        # (Grammar.hs o .: "op" -> mzero), not defaulted
        {"type": "word", "word": "x"},
        {"type": "phrase", "phrase": "a b"},
        {"type": "frob"},
        {"no": "type"},
        {"type": "seq", "op": "near x", "args": []},
        {"type": "seq", "op": "or", "args": [{"type": "word", "op": "case", "word": "a"}]},
        {"type": "context", "contexts": [], "query": {"type": "word", "op": "case", "word": "a"}},
        {"type": "boost", "weight": 1.0},
    ],
)
def test_malformed_rejected(bad):
    with pytest.raises(QueryJsonError):
        query_from_json(bad)
