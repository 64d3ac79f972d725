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
