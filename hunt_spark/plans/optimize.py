"""Query optimizer: prefix absorption (hunt:
Hunt/Query/Language/Grammar.hs:238-266 optimizeQuery — recursive,
OFF by default in the reference, Processor.hs:89-90; same default
here — callers opt in via ``optimize_query``).

Rules over prefix-search words (QWord) within one associative level:
- AND:  ``a AND ab  ->  ab``  (every match of the longer prefix also
  matches the shorter; the more specific term absorbs the laxer one)
- OR:   ``a OR ab   ->  a``   (the laxer prefix already covers the
  more specific one)

Case handling mirrors the reference's variants: two case-sensitive
words compare raw prefixes, two case-insensitive words compare
lowercased prefixes; mixed sensitivity never absorbs. Only bare QWord
legs participate — full words, phrases, boosts and nested ops pass
through untouched (a boost changes scores, so absorbing it would
change results).
"""

from __future__ import annotations

from hunt_spark.plans.ast import QBoost, QContext, QSeq, QWord


def _absorbs(shorter: QWord, longer: QWord) -> bool:
    if shorter.op != longer.op:
        return False
    if shorter.op == "fuzzy":
        # fuzzy expansion is not prefix-monotone: ~bra's variant set
        # does not contain ~brain's (a fuzzed 'brian' can match docs
        # 'bra' never reaches), so absorption would change the doc set
        return False
    if shorter.op == "case":
        return longer.word.startswith(shorter.word)
    return longer.word.lower().startswith(shorter.word.lower())


def optimize_query(q):
    """Return an equivalent query with prefix-absorbed AND/OR levels."""
    if isinstance(q, QSeq):
        legs = [optimize_query(x) for x in q.legs]
        if q.op in ("and", "or"):
            words = [(i, x) for i, x in enumerate(legs) if isinstance(x, QWord)]
            drop: set[int] = set()
            for i, a in words:
                for j, b in words:
                    if i == j or i in drop or j in drop:
                        continue
                    if _absorbs(a, b):
                        # AND keeps the longer (j), OR keeps the shorter (i)
                        drop.add(i if q.op == "and" else j)
            legs = [x for i, x in enumerate(legs) if i not in drop]
            if len(legs) == 1:
                return legs[0]
        return QSeq(q.op, tuple(legs), q.dist)
    if isinstance(q, QContext):
        return QContext(q.contexts, optimize_query(q.query))
    if isinstance(q, QBoost):
        return QBoost(q.weight, optimize_query(q.query))
    return q
