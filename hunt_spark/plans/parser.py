"""Hunt text query parser — recursive descent, pure driver-side code.

Reimplements the grammar of hunt's Parsec parser
(Hunt/Query/Language/Parser.hs:60-250): precedence
OR < AND (incl. AND NOT) < NEAR/FOLLOW/++ < juxtaposition(=AND);
``!w`` case-sensitive, ``~w`` fuzzy, ``"…"`` phrase, ``'…'`` exact
word, ``cx,cx2:(q)`` context restriction, ``[a TO b]`` range,
``q^boost``, backslash escapes, parens.
"""

from __future__ import annotations

import re

from hunt_spark.plans.ast import (
    QBoost,
    QContext,
    QFullWord,
    QPhrase,
    QRange,
    QSeq,
    QWord,
)

_NUM_RE = re.compile(r"\d+(\.\d+)?")
_SPECIAL = set('()[]^:,"\' \t\n')


class ParseError(ValueError):
    pass


class _Lexer:
    """Token stream with adjacency: the reference's word lexeme is
    ``many1 (noneOf notWordChar)`` where notWordChar is only
    ``\\ " ' ) ( [ ] ^`` and whitespace (Grammar.hs:229) — ':' and ','
    ARE word characters there, carved out of a word only when a
    context-spec parse succeeds (Parser.hs:148-159 backtracks into the
    plain word otherwise). We still emit ':'/',' as tokens (the
    context path needs them, with spaces allowed), but record whether
    each token was GLUED to its predecessor so the parser can
    reassemble a glued run back into the reference's single word
    (datetime range endpoints, URLs, "bar:baz" after a context)."""

    def __init__(self, s: str):
        self.s = s
        self.i = 0
        self.toks: list[tuple[str, str]] = []
        self._glue: list[bool] = []
        self._esc0: list[bool] = []  # token's first char came escaped
        self._lex()
        self.p = 0

    def _append(
        self, tok: tuple[str, str], start: int, end: int, esc0: bool = False
    ) -> None:
        self.toks.append(tok)
        self._glue.append(start == self._prev_end)
        self._esc0.append(esc0)
        self._prev_end = end

    def _lex(self) -> None:
        s, n = self.s, len(self.s)
        self._prev_end = -1
        i = 0
        while i < n:
            c = s[i]
            if c in " \t\n\r":
                i += 1
                continue
            if c in "()[]^:,":
                self._append((c, c), i, i + 1)
                i += 1
                continue
            if c in "\"'":
                quote, j, buf = c, i + 1, []
                while j < n and s[j] != quote:
                    if s[j] == "\\" and j + 1 < n:
                        buf.append(s[j + 1])
                        j += 2
                    else:
                        buf.append(s[j])
                        j += 1
                if j >= n:
                    raise ParseError(f"unterminated {quote} at {i}")
                self._append(
                    ("PHRASE" if quote == '"' else "QWORD", "".join(buf)),
                    i,
                    j + 1,
                )
                i = j + 1
                continue
            # bare word (with escapes)
            buf = []
            j = i
            esc0 = escaped = False
            while j < n and (s[j] == "\\" or s[j] not in _SPECIAL):
                if s[j] == "\\" and j + 1 < n:
                    if not buf:
                        esc0 = True
                    escaped = True
                    buf.append(s[j + 1])
                    j += 2
                else:
                    buf.append(s[j])
                    j += 1
            word = "".join(buf)
            # keywords are the reference's literal UPPERCASE tokens
            # (Parser.hs string "AND" etc.) — 'and'/'to'/'not' are plain
            # words there, and an escaped token is never a keyword
            if not escaped and (
                word in ("AND", "OR", "NOT", "NEAR", "FOLLOW", "TO", "++")
            ):
                self._append((word, word), i, j)
            else:
                self._append(("WORD", word), i, j, esc0=esc0)
            i = j
        self._append(("EOF", ""), n + 1, n + 1)

    def peek(self, k: int = 0) -> tuple[str, str]:
        return self.toks[min(self.p + k, len(self.toks) - 1)]

    def glued(self, k: int = 0) -> bool:
        """True when token p+k starts exactly where its predecessor
        ended (no intervening whitespace)."""
        return self._glue[min(self.p + k, len(self.toks) - 1)]

    def esc0(self, k: int = 0) -> bool:
        """True when token p+k's first character was written escaped —
        an escaped '!'/'~' is a literal word char, not a case/fuzzy
        operator (print_query escapes them expecting exactly this)."""
        return self._esc0[min(self.p + k, len(self.toks) - 1)]

    def next(self) -> tuple[str, str]:
        t = self.peek()
        self.p += 1
        return t

    def expect(self, kind: str) -> str:
        k, v = self.next()
        if k != kind:
            raise ParseError(f"expected {kind}, got {k}({v!r})")
        return v


def parse_query(s: str):
    lx = _Lexer(s)
    q = _or_expr(lx)
    if lx.peek()[0] != "EOF":
        raise ParseError(f"trailing input at token {lx.peek()}")
    return q


def _or_expr(lx):
    left = _and_expr(lx)
    while lx.peek()[0] == "OR":
        lx.next()
        left = QSeq("or", (left, _and_expr(lx)))
    return left


def _and_expr(lx):
    left = _near_expr(lx)
    while lx.peek()[0] == "AND":
        lx.next()
        if lx.peek()[0] == "NOT":
            lx.next()
            left = QSeq("andnot", (left, _near_expr(lx)))
        else:
            left = QSeq("and", (left, _near_expr(lx)))
    return left


def _near_expr(lx):
    left = _juxt_expr(lx)
    while lx.peek()[0] in ("NEAR", "FOLLOW", "++"):
        k, _ = lx.next()
        if k == "++":
            right = _juxt_expr(lx)
            left = QSeq("phrase", (left, right))
        else:
            kind, num = lx.next()
            # the reference reads many1 digit (Parser.hs:126-133);
            # '2.9' must not silently truncate to 2
            if kind != "WORD" or not num.isdigit():
                raise ParseError(f"{k} requires an integer distance, got {num!r}")
            right = _juxt_expr(lx)
            left = QSeq(k.lower(), (left, right), int(num))
    return left


# NOT/TO lex as keyword tokens but the reference's word rule rejects
# only OR/AND/++/NEAR/FOLLOW (Parser.hs:232) — standalone 'NOT'/'TO'
# are plain words there, consumed by their operators only positionally
# (after AND; inside [a TO b])
_PRIMARY_START = ("WORD", "PHRASE", "QWORD", "(", "[", ":", ",", "NOT", "TO")


def _juxt_expr(lx):
    legs = [_postfix(lx)]
    while lx.peek()[0] in _PRIMARY_START:
        legs.append(_postfix(lx))
    return legs[0] if len(legs) == 1 else QSeq("and", tuple(legs))


def _postfix(lx):
    q = _primary(lx)
    while lx.peek()[0] == "^":
        lx.next()
        kind, num = lx.next()
        if kind != "WORD" or not _NUM_RE.fullmatch(num):
            raise ParseError(f"boost requires a number, got {num!r}")
        q = QBoost(float(num), q)
    return q


def _word_op(w: str) -> tuple[str, str]:
    if w.startswith("!"):
        return w[1:], "case"
    if w.startswith("~"):
        return w[1:], "fuzzy"
    return w, "nocase"


# the reference's context name: many1 (alphaNum <|> '_')
# (Parser.hs:289-293) — anything else before ':' stays a word char
_CX_NAME_RE = re.compile(r"\w+")

# token kinds whose characters are word chars in the reference lexeme
# (Grammar.hs:229): a glued run of these is ONE word there
_WORD_GLUE_KINDS = ("WORD", ":", ",", "TO", "AND", "OR", "NOT", "NEAR",
                    "FOLLOW", "++")


def _reassemble_word(lx) -> str:
    """Consume a maximal glued run of word-char tokens into the single
    word the reference lexer would have produced ("2013-01-01T00:00:00",
    "http://x.org", "bar:baz") — ':'/',' only leave a word via a
    successful context-spec parse, which the callers try first."""
    parts = [lx.next()[1]]
    while lx.peek()[0] in _WORD_GLUE_KINDS and lx.glued():
        parts.append(lx.next()[1])
    return "".join(parts)


def _primary(lx):
    # context restriction (Parser.hs:148-159): cx[,cx2]*:primary with
    # [alphaNum_]+ names; on any mismatch the reference backtracks and
    # the colon/comma chars fall back into the word
    kind, val = lx.peek()
    if kind in ("WORD", "NOT", "TO") and _CX_NAME_RE.fullmatch(val):
        cxs, k, ok = [val], 1, True
        while lx.peek(k)[0] == ",":
            nk, nv = lx.peek(k + 1)
            if nk != "WORD" or not _CX_NAME_RE.fullmatch(nv):
                ok = False
                break
            cxs.append(nv)
            k += 2
        if ok and lx.peek(k)[0] == ":":
            for _ in range(k + 1):
                lx.next()
            # primaryQuery (Parser.hs:161-171) has no context branch —
            # "foo:bar:baz" is context foo over the WORD "bar:baz";
            # nesting needs parens
            return QContext(tuple(cxs), _primary_nocx(lx))
    return _primary_nocx(lx)


def _primary_nocx(lx):
    kind, val = lx.peek()
    if kind == "(":
        lx.next()
        q = _or_expr(lx)
        lx.expect(")")
        return q
    if kind == "[":
        lx.next()
        if lx.peek()[0] != "WORD":
            raise ParseError(f"expected WORD, got {lx.peek()[0]}")
        lo = _reassemble_word(lx)
        lx.expect("TO")
        if lx.peek()[0] != "WORD":
            raise ParseError(f"expected WORD, got {lx.peek()[0]}")
        hi = _reassemble_word(lx)
        lx.expect("]")
        return QRange(lo, hi)
    if kind == "PHRASE":
        lx.next()
        return QPhrase(val, "nocase")
    if kind == "QWORD":
        lx.next()
        return QFullWord(val, "nocase")
    if kind in ("WORD", ":", ",", "NOT", "TO"):
        # a word may START with ':'/',' in the reference (word chars,
        # Grammar.hs:229); NOT/TO out of operator position are words
        first_esc = lx.esc0()
        word = _reassemble_word(lx)
        # an escaped first char is literal: '\!foo' is the word
        # '!foo', never a case operator (print/parse round-trip)
        w, op = (word, "nocase") if first_esc else _word_op(word)
        if not w:
            # '!' / '~' as a standalone token before the operand — the
            # reference accepts whitespace here (" ! test" -> case word,
            # " ~ test" -> fuzzy; QueryParserTests.hs caseTests/fuzzyTests)
            if op != "nocase" and lx.peek()[0] in ("PHRASE", "QWORD"):
                kind2, val2 = lx.next()
                return (
                    QPhrase(val2, op) if kind2 == "PHRASE" else QFullWord(val2, op)
                )
            if op != "nocase" and lx.peek()[0] == "WORD":
                # caseQuery/fuzzyQuery operands are word forms only
                # (Parser.hs:192-206) — never a context
                sub = _primary_nocx(lx)
                if isinstance(sub, QWord):
                    return QWord(sub.word, op)
                if isinstance(sub, QPhrase):
                    return QPhrase(sub.phrase, op)
                raise ParseError(f"{'!' if op == 'case' else '~'} needs a word")
            raise ParseError("empty word")
        return QWord(w, op)
    raise ParseError(f"unexpected token {kind}({val!r})")
