"""Query-parser parity with the reference's own test set — every case
from test/Hunt/QueryParserTests.hs (and/or/specifier/andnot/case/boost/
range/parenthese/fuzzy/word/phrase groups), pinned against OUR AST.

Shape note: the reference parser nests right-associative binary
And/Or nodes; ours flattens runs of the same operator into one n-ary
QSeq (Q4 n-ary flatten) and keeps AND NOT left-nested. Evaluation
semantics are identical; the pins below encode the flattened form.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hunt_spark.plans.ast import (
    QBoost,
    QContext,
    QFullWord,
    QPhrase,
    QRange,
    QSeq,
    QWord,
)
from hunt_spark.plans.parser import parse_query


def w(x):
    return QWord(x, "nocase")


def cw(x):
    return QWord(x, "case")


def fw(x):
    return QWord(x, "fuzzy")


def p(x):
    return QPhrase(x, "nocase")


def cp(x):
    return QPhrase(x, "case")


def a(*legs):
    return QSeq("and", tuple(legs))


def o(*legs):
    return QSeq("or", tuple(legs))


def an(*legs):
    return QSeq("andnot", tuple(legs))


def s(cxs, q):
    return QContext(tuple(cxs), q)


CASES = [
    # andTests (QueryParserTests.hs:91-115)
    ("abc def", a(w("abc"), w("def"))),
    ("abc def ghi", a(w("abc"), w("def"), w("ghi"))),
    (" \rabc \r  def  \tghi \njkl \r\n ",
     a(w("abc"), w("def"), w("ghi"), w("jkl"))),
    ("wurst:abc def ghi wurst:jkl",
     a(s(["wurst"], w("abc")), w("def"), w("ghi"), s(["wurst"], w("jkl")))),
    ("Apple Anna ANDroid", a(w("Apple"), w("Anna"), w("ANDroid"))),
    ("abc AND def", a(w("abc"), w("def"))),
    # orTests (:118-152)
    ("abc OR def", o(w("abc"), w("def"))),
    ("wurst:abc def OR ghi wurst:jkl",
     o(a(s(["wurst"], w("abc")), w("def")),
       a(w("ghi"), s(["wurst"], w("jkl"))))),
    ("Operation ORganism", a(w("Operation"), w("ORganism"))),
    # specifierTests (:155-187)
    (" wurst:\t abc \nbatzen : \r def ",
     a(s(["wurst"], w("abc")), s(["batzen"], w("def")))),
    ("abc wurst: def wurst: ghi OR wurst: jkl",
     o(a(w("abc"), s(["wurst"], w("def")), s(["wurst"], w("ghi"))),
       s(["wurst"], w("jkl")))),
    ("wurst: (abc def ghi) batzen: (abc OR def)",
     a(s(["wurst"], a(w("abc"), w("def"), w("ghi"))),
       s(["batzen"], o(w("abc"), w("def"))))),
    ("wurst \t: (abc def ghi) batzen \n : (abc OR def)",
     a(s(["wurst"], a(w("abc"), w("def"), w("ghi"))),
       s(["batzen"], o(w("abc"), w("def"))))),
    ("wurst,batzen,schinken: (abc def ghi)",
     s(["wurst", "batzen", "schinken"], a(w("abc"), w("def"), w("ghi")))),
    ("wurst , \n batzen \t, schinken: (abc def ghi)",
     s(["wurst", "batzen", "schinken"], a(w("abc"), w("def"), w("ghi")))),
    ('wurst , \n batzen \t, schinken: "this is A Test"',
     s(["wurst", "batzen", "schinken"], p("this is A Test"))),
    # andNotTests (:190-211); reference nests left — ours too
    ("abc AND NOT def", an(w("abc"), w("def"))),
    ("abc AND NOT def AND NOT ghi", an(an(w("abc"), w("def")), w("ghi"))),
    ("Apple AND NOT Anna ANDNOTtingham",
     an(w("Apple"), a(w("Anna"), w("ANDNOTtingham")))),
    # caseTests (:238-250)
    ("!batzen", cw("batzen")),
    ('!"this is a test"', cp("this is a test")),
    (" ! test", cw("test")),
    # boostTests (:253-278)
    ("word^9", QBoost(9.0, w("word"))),
    ("foo^2 bar", a(QBoost(2.0, w("foo")), w("bar"))),
    ("word^9.5", QBoost(9.5, w("word"))),
    ('"word"^9', QBoost(9.0, p("word"))),
    ("(w AND k OR p)^9", QBoost(9.0, o(a(w("w"), w("k")), w("p")))),
    ("(con:word)^9", QBoost(9.0, s(["con"], w("word")))),
    # rangeTests (:281-298)
    ("[30 TO 40]", QRange("30", "40")),
    ("con:[30 TO 40]", s(["con"], QRange("30", "40"))),
    ("con1,con2:[30 TO 40]", s(["con1", "con2"], QRange("30", "40"))),
    ("con1:[30 TO 40] AND con2:[59 TO 100]",
     a(s(["con1"], QRange("30", "40")), s(["con2"], QRange("59", "100")))),
    # parentheseTests (:302-318)
    ("abc (def OR ghi)", a(w("abc"), o(w("def"), w("ghi")))),
    ("(abc OR def) ghi", a(o(w("abc"), w("def")), w("ghi"))),
    (" ( abc OR def ) ", o(w("abc"), w("def"))),
    (" ( abc def ) ", a(w("abc"), w("def"))),
    # fuzzyTests (:321-329)
    ("~test", fw("test")),
    (" ~ test", fw("test")),
    # wordTests (:332-346)
    ("'abc'", QFullWord("abc", "nocase")),
    ("'a b c'", QFullWord("a b c", "nocase")),
    ("'a\\'b'", QFullWord("a'b", "nocase")),
    # phraseTests (:349-358)
    ('  \t \n "wurst schinken batzen" \t ', p("wurst schinken batzen")),
    ('  \t \n ! "wurst schinken batzen" \t ', cp("wurst schinken batzen")),
]


@pytest.mark.parametrize(
    "text,want", CASES, ids=[repr(c[0])[:40] for c in CASES]
)
def test_reference_parser_case(text, want):
    got = parse_query(text)
    # flatten-insensitive compare: our n-ary runs vs the reference's
    # nested same-op binaries are the same query
    assert _norm(got) == _norm(want), f"{text!r}: {got} != {want}"


def test_print_parse_roundtrip_pins():
    from hunt_spark.plans.ast import print_query

    for _text, q in CASES:
        assert _norm(parse_query(print_query(q))) == _norm(q), print_query(q)


# prop_ParseAnd (QueryParserTests.hs:404): print-parse round-trip over
# random query trees, with the reference generator's word alphabet
_word = st.text(
    alphabet="0123456789ABCabcXYZxyz", min_size=1, max_size=8
)


def _queries(depth):
    leaf = st.one_of(
        st.builds(QWord, _word, st.sampled_from(["nocase", "case", "fuzzy"])),
        st.builds(QFullWord, _word, st.sampled_from(["nocase", "case"])),
        st.builds(
            QPhrase,
            st.lists(_word, min_size=1, max_size=3).map(" ".join),
            st.sampled_from(["nocase", "case"]),
        ),
        st.builds(QRange, _word, _word),
    )
    if depth == 0:
        return leaf
    sub = _queries(depth - 1)
    return st.one_of(
        leaf,
        st.builds(
            lambda op, legs: QSeq(op, tuple(legs)),
            st.sampled_from(["and", "or", "andnot", "phrase"]),
            st.lists(sub, min_size=2, max_size=3),
        ),
        st.builds(
            lambda op, d, legs: QSeq(op, tuple(legs), d),
            st.sampled_from(["near", "follow"]),
            st.integers(1, 9),
            st.lists(sub, min_size=2, max_size=3),
        ),
        st.builds(
            lambda cxs, q: QContext(tuple(cxs), q),
            st.lists(_word, min_size=1, max_size=2),
            sub,
        ),
        st.builds(QBoost, st.integers(1, 9).map(float), sub),
    )


@given(_queries(2))
@settings(max_examples=300, deadline=None)
def test_print_parse_roundtrip_property(q):
    from hunt_spark.plans.ast import print_query

    assert _norm(parse_query(print_query(q))) == _norm(q)


def _norm(q):
    """Canonical form mirroring the compiler's evaluation-time
    flattening (QueryCompiler._flatten): same-op and/or runs and
    same-op-same-dist positional runs collapse to one n-ary node;
    AND NOT left-nesting splices into the first position (the binary
    fold evaluates both shapes identically)."""
    if isinstance(q, QSeq) and q.op in ("and", "or", "phrase", "follow", "near"):
        legs = []
        for leg in q.legs:
            nl = _norm(leg)
            if isinstance(nl, QSeq) and nl.op == q.op and nl.dist == q.dist:
                legs.extend(nl.legs)
            else:
                legs.append(nl)
        return QSeq(q.op, tuple(legs), q.dist)
    if isinstance(q, QSeq) and q.op == "andnot":
        legs = [_norm(x) for x in q.legs]
        if isinstance(legs[0], QSeq) and legs[0].op == "andnot":
            legs = list(legs[0].legs) + legs[1:]
        return QSeq(q.op, tuple(legs), q.dist)
    if isinstance(q, QSeq):
        return QSeq(q.op, tuple(_norm(x) for x in q.legs), q.dist)
    if isinstance(q, QContext):
        return QContext(q.contexts, _norm(q.query))
    if isinstance(q, QBoost):
        return QBoost(q.weight, _norm(q.query))
    return q


# ---------------------------------------------------------------------------
# word-lexeme parity: ':' and ',' are word characters in the reference
# (Grammar.hs:229 notWordChar), carved out only by a successful
# context-spec parse (Parser.hs:148-159 `try contextSpec`), whose
# names are many1 (alphaNum <|> '_') (Parser.hs:289-293)
# ---------------------------------------------------------------------------

COLON_WORD_CASES = [
    # datetime/timezone range endpoints parse whole
    (
        "when:[2013-01-01T00:00:00+02:00 TO 2014]",
        QContext(("when",), QRange("2013-01-01T00:00:00+02:00", "2014")),
    ),
    # a word whose alnum prefix is NOT followed by ':' keeps its colons
    ("2013-01-01T12:00:00", QWord("2013-01-01T12:00:00", "nocase")),
    # primaryQuery has no context branch: after a context spec the
    # rest is one word, colons included (Parser.hs:161-171)
    ("foo:bar:baz", QContext(("foo",), QWord("bar:baz", "nocase"))),
    # a non-[alnum_] "name" before ':' backtracks into the word
    ("a-b:q", QWord("a-b:q", "nocase")),
    # the reference's context parser happily takes a digit-run name
    ("12:30", QContext(("12",), QWord("30", "nocase"))),
    # URL: scheme parses as a context (exactly what parsec does)
    ("http://x.org", QContext(("http",), QWord("//x.org", "nocase"))),
    # '!' binds after the (failed) context try: one case word
    ("!foo:bar", QWord("foo:bar", "case")),
    ("! foo:bar", QWord("foo:bar", "case")),
    # spaces are allowed around ':' and ',' in a context spec
    ("a , b : w", QContext(("a", "b"), QWord("w", "nocase"))),
    # ',' without a following ':' is a word char too
    ("a,b", QWord("a,b", "nocase")),
    # a word may start with ':' (still just a word char)
    (":foo", QWord(":foo", "nocase")),
]


@pytest.mark.parametrize("text,want", COLON_WORD_CASES)
def test_colon_word_lexeme_parity(text, want):
    assert parse_query(text) == want
