"""Parser unit tests — grammar model: Hunt/Query/Language/Parser.hs
precedence OR < AND < NEAR/FOLLOW/++ < juxtaposition and the syntax
forms of hunt-searchengine/test/Hunt/QueryParserTests.hs."""

from __future__ import annotations

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
from hunt_spark.plans.parser import ParseError, parse_query


def test_bare_word_is_prefix_nocase():
    assert parse_query("brain") == QWord("brain", "nocase")


def test_bang_is_case_sensitive():
    assert parse_query("!Brain") == QWord("Brain", "case")


def test_tilde_is_fuzzy():
    assert parse_query("~brain") == QWord("brain", "fuzzy")


def test_quoted_word_is_full_word():
    assert parse_query("'brain'") == QFullWord("brain", "nocase")


def test_phrase():
    assert parse_query('"pinky and the brain"') == QPhrase("pinky and the brain", "nocase")


def test_juxtaposition_is_and():
    assert parse_query("new york") == QSeq("and", (QWord("new"), QWord("york")))


def test_or_lower_precedence_than_and():
    q = parse_query("a b OR c")
    assert q == QSeq("or", (QSeq("and", (QWord("a"), QWord("b"))), QWord("c")))


def test_and_not():
    q = parse_query("cat AND NOT dog")
    assert q == QSeq("andnot", (QWord("cat"), QWord("dog")))


def test_near_follow():
    assert parse_query("a NEAR 3 b") == QSeq("near", (QWord("a"), QWord("b")), 3)
    assert parse_query("a FOLLOW 5 b") == QSeq("follow", (QWord("a"), QWord("b")), 5)


def test_plusplus_is_phrase_seq():
    assert parse_query("a ++ b") == QSeq("phrase", (QWord("a"), QWord("b")), 1)


def test_context_restriction():
    assert parse_query("title:brain") == QContext(("title",), QWord("brain"))
    q = parse_query("title,body:(cat OR dog)")
    assert isinstance(q, QContext) and q.contexts == ("title", "body")


def test_range():
    assert parse_query("[aa TO ac]") == QRange("aa", "ac")


def test_boost():
    assert parse_query("brain^2.5") == QBoost(2.5, QWord("brain"))


def test_nested_parens():
    q = parse_query('(cat OR dog) AND NOT "stupid questions"')
    assert q == QSeq(
        "andnot",
        (QSeq("or", (QWord("cat"), QWord("dog"))), QPhrase("stupid questions")),
    )


def test_escapes():
    assert parse_query(r"foo\:bar") == QWord("foo:bar", "nocase")


def test_precedence_near_tighter_than_and():
    q = parse_query("a AND b NEAR 2 c")
    assert q == QSeq("and", (QWord("a"), QSeq("near", (QWord("b"), QWord("c")), 2)))


def test_errors():
    with pytest.raises(ParseError):
        parse_query('"unterminated')
    with pytest.raises(ParseError):
        parse_query("a NEAR x b")
    with pytest.raises(ParseError):
        parse_query("(a OR b")
