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


# --- keyword case-sensitivity (Parser.hs matches literal uppercase
# tokens; the word rule rejects only OR/AND/++/NEAR/FOLLOW, so
# lowercase operators — and standalone NOT/TO — are plain words) ---


def test_lowercase_operators_are_plain_words():
    assert parse_query("fly to paris") == QSeq(
        "and", (QWord("fly"), QWord("to"), QWord("paris"))
    )
    assert parse_query("cat and dog") == QSeq(
        "and", (QWord("cat"), QWord("and"), QWord("dog"))
    )
    assert parse_query("not now") == QSeq("and", (QWord("not"), QWord("now")))
    assert parse_query("near miss") == QSeq("and", (QWord("near"), QWord("miss")))


def test_uppercase_not_and_to_are_words_outside_operator_position():
    # the reference's word rule rejects only OR/AND/++/NEAR/FOLLOW
    assert parse_query("NOT") == QWord("NOT")
    assert parse_query("a NOT b") == QSeq(
        "and", (QWord("a"), QWord("NOT"), QWord("b"))
    )
    assert parse_query("TO") == QWord("TO")
    # ...while the operator positions still work
    assert parse_query("a AND NOT b") == QSeq("andnot", (QWord("a"), QWord("b")))
    assert parse_query("[a TO b]") == QRange("a", "b")


def test_escaped_bang_tilde_are_literal_word_chars():
    assert parse_query(r"\!foo") == QWord("!foo")
    assert parse_query(r"\~foo") == QWord("~foo")
    # print/parse round-trip for words starting with operators
    from hunt_spark.plans.ast import print_query

    for q in (QWord("!foo"), QWord("~x"), QWord("to"), QWord("and")):
        assert parse_query(print_query(q)) == q


def test_escaped_keyword_is_a_word():
    assert parse_query(r"\AND") == QWord("AND")
    assert parse_query(r"A\ND") == QWord("AND")


def test_near_distance_must_be_integer():
    with pytest.raises(ParseError, match="integer distance"):
        parse_query("a NEAR 2.9 b")


def test_boost_print_parse_roundtrip_small_weights():
    from hunt_spark.plans.ast import QBoost, print_query

    for w in (1e-05, 0.5, 2.0, 1.25e-07, 123.456):
        q = QBoost(w, QWord("a"))
        printed = print_query(q)
        assert "e" not in printed and "E" not in printed
        assert parse_query(printed) == q


def test_empty_phrase_parses():
    assert parse_query('""') == QPhrase("", "nocase")


def test_uppercase_keyword_words_roundtrip_via_escape():
    from hunt_spark.plans.ast import print_query

    for w in ("AND", "OR", "NEAR", "FOLLOW", "TO", "NOT"):
        q = QWord(w)
        assert parse_query(print_query(q)) == q
