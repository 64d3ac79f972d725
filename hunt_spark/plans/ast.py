"""Query AST — Python mirror of Hunt's query algebra
(hunt: Hunt/Query/Language/Grammar.hs:50-78) plus the smart-constructor
builder surface (Hunt/Query/Language/Builder.hs:45-234).

Case ops: ``case`` | ``nocase`` | ``fuzzy`` (Grammar.hs:62-68; fuzzy is
evaluated as nocase, matching Processor.hs:606,615's TODO behavior).
Seq ops: ``and`` | ``or`` | ``andnot`` | ``phrase`` | ``follow`` |
``near`` with distance for the last two.
"""

from __future__ import annotations

from dataclasses import dataclass, field

Query = object  # union alias for docs


@dataclass(frozen=True)
class QWord:
    """Prefix search (Hunt: bare word => QWord => PrefixCase/PrefixNoCase,
    Processor.hs:599-619)."""

    word: str
    op: str = "nocase"


@dataclass(frozen=True)
class QFullWord:
    """Exact word lookup ('quoted word' syntax)."""

    word: str
    op: str = "nocase"


@dataclass(frozen=True)
class QPhrase:
    phrase: str
    op: str = "nocase"


@dataclass(frozen=True)
class QSeq:
    op: str
    legs: tuple = ()
    dist: int = 1  # FOLLOW/NEAR distance

    def __post_init__(self):
        assert self.op in ("and", "or", "andnot", "phrase", "follow", "near")


@dataclass(frozen=True)
class QContext:
    contexts: tuple
    query: object


@dataclass(frozen=True)
class QBoost:
    weight: float
    query: object


@dataclass(frozen=True)
class QRange:
    lo: str
    hi: str


# ---- JSON wire codec (Grammar.hs:84-165 ToJSON/FromJSON Query) ----
class QueryJsonError(ValueError):
    """Malformed structured-query JSON (the reference's parser mzero)."""


_OPS = ("case", "nocase", "fuzzy")


def _binop_from_json(s) -> tuple[str, int]:
    """BinOp wire strings (Grammar.hs:144-163): "and" | "or" |
    "and not" | "phrase" | "follow D" | "near D"."""
    words = str(s).split()
    if words == ["and"]:
        return "and", 1
    if words == ["or"]:
        return "or", 1
    if words == ["and", "not"]:
        return "andnot", 1
    if words == ["phrase"]:
        return "phrase", 1
    if len(words) == 2 and words[0] in ("follow", "near"):
        try:
            return words[0], int(words[1])
        except ValueError:
            pass
    raise QueryJsonError(f"unknown seq op {s!r}")


def _binop_to_json(op: str, dist: int) -> str:
    if op == "andnot":
        return "and not"
    if op in ("follow", "near"):
        return f"{op} {dist}"
    return op


def query_from_json(j):
    """Decode the reference's structured query JSON (the wire shape
    clients POST in search commands — Grammar.hs:98-127 FromJSON,
    incl. the binary and/or/"and not" forms and n-ary "seq")."""
    if not isinstance(j, dict) or "type" not in j:
        raise QueryJsonError("query object needs a 'type'")
    t = j["type"]
    try:
        if t in ("word", "fullword", "phrase"):
            # the reference's FromJSON requires 'op' (Grammar.hs
            # o .: "op" → mzero on absence); defaulting it would mask
            # malformed client payloads, so reject like the reference
            if "op" not in j:
                raise QueryJsonError(f"{t} query object needs an 'op'")
            op = j["op"]
            if op not in _OPS:
                raise QueryJsonError(f"unknown search op {op!r}")
            if t == "word":
                return QWord(j["word"], op)
            if t == "fullword":
                return QFullWord(j["word"], op)
            return QPhrase(j["phrase"], op)
        if t == "context":
            cxs = j["contexts"]
            if not isinstance(cxs, list) or not cxs:
                raise QueryJsonError("contexts must be a non-empty list")
            return QContext(tuple(cxs), query_from_json(j["query"]))
        if t == "boost":
            return QBoost(float(j["weight"]), query_from_json(j["query"]))
        if t == "range":
            return QRange(j["lower"], j["upper"])
        if t in ("and", "or", "and not"):
            op = "andnot" if t == "and not" else t
            return QSeq(
                op,
                (query_from_json(j["query1"]), query_from_json(j["query2"])),
            )
        if t == "seq":
            op, dist = _binop_from_json(j["op"])
            legs = j["args"]
            if not isinstance(legs, list) or len(legs) < 2:
                raise QueryJsonError("seq needs >= 2 args")
            return QSeq(op, tuple(query_from_json(x) for x in legs), dist)
    except KeyError as e:
        raise QueryJsonError(f"query {t!r} missing field {e}") from e
    raise QueryJsonError(f"unknown query type {t!r}")


def query_to_json(q) -> dict:
    """Encode to the reference wire shape (Grammar.hs:84-96 ToJSON)."""
    if isinstance(q, QWord):
        return {"type": "word", "op": q.op, "word": q.word}
    if isinstance(q, QFullWord):
        return {"type": "fullword", "op": q.op, "word": q.word}
    if isinstance(q, QPhrase):
        return {"type": "phrase", "op": q.op, "phrase": q.phrase}
    if isinstance(q, QContext):
        return {
            "type": "context",
            "contexts": list(q.contexts),
            "query": query_to_json(q.query),
        }
    if isinstance(q, QBoost):
        return {
            "type": "boost", "weight": q.weight,
            "query": query_to_json(q.query),
        }
    if isinstance(q, QRange):
        return {"type": "range", "lower": q.lo, "upper": q.hi}
    if isinstance(q, QSeq):
        return {
            "type": "seq",
            "op": _binop_to_json(q.op, q.dist),
            "args": [query_to_json(x) for x in q.legs],
        }
    raise QueryJsonError(f"not a query node: {type(q).__name__}")


# ---- pretty printer (Grammar.hs:291-375 printQuery) ----
_WORD_SPECIALS = set("\\\"')([]^:,~!+ \n\r\t")


def _print_word(w: str) -> str:
    if any(c in _WORD_SPECIALS for c in w):
        return "".join("\\" + c if c in _WORD_SPECIALS else c for c in w)
    if w in ("AND", "OR", "NOT", "NEAR", "FOLLOW", "TO", "++"):
        # a bare keyword can't reparse as a word; an escaped first char
        # keeps it a WORD token (the reference's printer has no such
        # out — its escape set can't cover letters — and simply emits
        # an unparseable token here)
        return "\\" + w
    return w


def _print_quoted(w: str, quote: str) -> str:
    body = "".join(
        "\\" + c if c in (quote, "\\") else c for c in w
    )
    return f"{quote}{body}{quote}"


_OP_STRS = {"and": " ", "or": " OR ", "andnot": " AND NOT ", "phrase": " ++ "}


def _print_par(q) -> str:
    """Parenthesize non-atomic sub-queries (printQPar)."""
    if isinstance(q, (QWord, QFullWord, QPhrase, QRange, QContext)):
        return print_query(q)
    return f"({print_query(q)})"


def print_query(q) -> str:
    """Query AST -> Hunt query syntax such that
    ``parse_query(print_query(q)) == q`` (up to same-op flattening) —
    the reference's printQuery with our parser's quoting conventions
    ('w' = full word, \"w\" = phrase; the reference prints both as
    phrases and relies on print-normal-form identity instead)."""
    mark = {"nocase": "", "case": "!", "fuzzy": "~"}
    if isinstance(q, QWord):
        return mark[q.op] + _print_word(q.word)
    if isinstance(q, QFullWord):
        return mark[q.op] + _print_quoted(q.word, "'")
    if isinstance(q, QPhrase):
        return mark[q.op] + _print_quoted(q.phrase, '"')
    if isinstance(q, QContext):
        return ",".join(q.contexts) + ":(" + print_query(q.query) + ")"
    if isinstance(q, QBoost):
        w = float(q.weight)
        if w.is_integer():
            num = str(int(w))
        else:
            # plain decimal expansion, never scientific: the parser's
            # boost grammar (simplePositiveFloat, \d+(\.\d+)?) can't
            # read '1e-05'. Decimal(repr(w)) keeps repr's shortest
            # round-trip digits; format 'f' removes the exponent at any
            # magnitude. Negative weights (wire-JSON only — the text
            # grammar is positive like the reference's
            # simplePositiveFloat) still print but don't reparse.
            from decimal import Decimal

            num = format(Decimal(repr(w)), "f")
        return f"{_print_par(q.query)}^{num}"
    if isinstance(q, QRange):
        return f"[{q.lo} TO {q.hi}]"
    if isinstance(q, QSeq):
        if not q.legs:
            return ""
        if len(q.legs) == 1:
            return print_query(q.legs[0])
        if q.op in _OP_STRS:
            op = _OP_STRS[q.op]
        else:  # follow/near carry the distance (printOp)
            op = f" {q.op.upper()} {q.dist} "
        return op.join(_print_par(x) for x in q.legs)
    raise TypeError(f"not a query node: {type(q).__name__}")


# ---- builder API (Builder.hs analogue) ----
def qand(*legs) -> QSeq:
    return QSeq("and", tuple(legs))


def qor(*legs) -> QSeq:
    return QSeq("or", tuple(legs))


def qandnot(*legs) -> QSeq:
    return QSeq("andnot", tuple(legs))


def qphrase(s: str, op: str = "nocase") -> QPhrase:
    return QPhrase(s, op)


def qcontext(cxs: list[str], q) -> QContext:
    return QContext(tuple(cxs), q)


def qboost(w: float, q) -> QBoost:
    return QBoost(w, q)


def qnear(d: int, *legs) -> QSeq:
    return QSeq("near", tuple(legs), d)


def qfollow(d: int, *legs) -> QSeq:
    return QSeq("follow", tuple(legs), d)
