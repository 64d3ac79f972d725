"""Pure-Python reference scorer (the rank-identity oracle).

Mirrors the Spark query compiler semantics exactly (plans/compiler.py)
over an in-memory index; used by pytest to assert rank-identical top-k
doc ids and BM25 scores (atol 1e-6) for the reference query set
(FIXTURES.md §3) — the role Hunt's golden tests play
(hunt-searchengine/test/Hunt/InterpreterTests.hs:144-217,
test/Hunt/RankingTests.hs:92-145).

No Spark imports — numpy/stdlib only.
"""

from __future__ import annotations

import math
from collections import defaultdict

from hunt_spark.functions.analysis import tokenize_py
from hunt_spark.operators.build import BM25_B, BM25_K1
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


def sim(searched: str, found: str) -> float:
    """Hunt/Scoring/Keys.hs:42-54 similar'."""
    if searched == found:
        return 1.0
    ls, lf = len(searched), len(found)
    if ls == lf:
        return 0.75
    if ls < lf:
        return 0.5 * ls / lf
    return 0.0


class OracleIndex:
    def __init__(
        self, docs, context_texts, context_weights=None, word_limit=0,
        doc_limit=0,
        context_norms=None,
        scoring="bm25",
        context_types=None,
    ):
        self.word_limit = word_limit
        self.doc_limit = doc_limit
        self.scoring = scoring
        from hunt_spark.functions.analysis import canonical_ctype

        self.context_types = {
            cx: canonical_ctype(t) for cx, t in (context_types or {}).items()
        }
        # per-context query-constant normalizers (typed contexts);
        # mirrors QueryCompiler.context_norms
        self.context_norms = context_norms or {}
        """docs: iterable of (doc_id, url, weight);
        context_texts: {context: {doc_id: text}}."""
        self.urls: dict[int, str] = {}
        self.weights: dict[int, float] = {}
        for doc_id, url, w in docs:
            self.urls[doc_id] = url
            self.weights[doc_id] = w
        self.context_weights = context_weights or {}
        # postings[(cx, term)] = {doc_id: [positions]} (term original case)
        self.postings: dict[tuple[str, str], dict[int, list[int]]] = defaultdict(dict)
        self.dl: dict[tuple[str, int], int] = {}
        self.df: dict[tuple[str, str], int] = defaultdict(int)  # keyed term_lc
        self.n_docs: dict[str, int] = {}
        self.avg_dl: dict[str, float] = {}
        self.contexts = sorted(context_texts)
        for cx, by_doc in context_texts.items():
            tot_dl, n = 0, 0
            for doc_id, text in by_doc.items():
                toks = tokenize_py(text)
                if not toks:
                    continue
                n += 1
                tot_dl += len(toks)
                self.dl[(cx, doc_id)] = len(toks)
                seen_lc = set()
                for pos, t in enumerate(toks, start=1):
                    self.postings[(cx, t)].setdefault(doc_id, []).append(pos)
                    seen_lc.add(t.lower())
                for tl in seen_lc:
                    self.df[(cx, tl)] += 1
            self.n_docs[cx] = n
            self.avg_dl[cx] = tot_dl / n if n else 0.0
        self.terms_by_cx: dict[str, list[str]] = defaultdict(list)
        for cx, t in self.postings:
            self.terms_by_cx[cx].append(t)

    # ---- scoring primitives (must match operators/build.py) ----
    def idf(self, cx: str, term_lc: str) -> float:
        n = self.n_docs[cx]
        df = self.df.get((cx, term_lc), 0)
        return math.log(1.0 + (n - df + 0.5) / (df + 0.5))

    def tf_norm(self, cx: str, doc_id: int, tf: int) -> float:
        dl = self.dl[(cx, doc_id)]
        return (tf * (BM25_K1 + 1.0)) / (
            tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / self.avg_dl[cx])
        )

    # ---- leg scans ----
    def _matching_terms(self, cx, word, op, prefix):
        wl = word.lower()
        allowed = None
        if prefix and self.word_limit > 0:
            # mirror the engine's cap: N shortest matching term_lc per
            # context (case predicate applied after the cap, like the
            # postings join does)
            lcs = sorted(
                {t.lower() for t in self.terms_by_cx[cx] if t.lower().startswith(wl)},
                key=lambda s: (len(s), s),
            )
            allowed = set(lcs[: self.word_limit])
        for t in self.terms_by_cx[cx]:
            if op == "case":
                ok = t.startswith(word) if prefix else t == word
            else:
                tl = t.lower()
                ok = tl.startswith(wl) if prefix else tl == wl
            if ok and (allowed is None or t.lower() in allowed):
                yield t

    def _limit_docs(self, cx, terms):
        """Hunt docLimit truncation (Intermediate.hs:327-342): keep
        words in word order until their cumulative doc count reaches
        the limit; the crossing word stays."""
        terms = sorted(terms)
        if self.doc_limit <= 0:
            return terms
        out, budget = [], self.doc_limit
        for t in terms:
            out.append(t)
            budget -= len(self.postings[(cx, t)])
            if budget <= 0:
                break
        return out

    def _scan(self, word, op, prefix, cxs, raw):
        out = {}  # (cx, doc) -> [score, positions set]
        for cx in cxs:
            norm = self.context_norms.get(cx)
            w = norm(word) if norm else word
            if w is None:
                continue
            for t in self._limit_docs(cx, self._matching_terms(cx, w, op, prefix)):
                s_term = sim(w, t)
                if s_term <= 0:
                    continue
                idf = self.idf(cx, t.lower())
                for doc_id, poss in self.postings[(cx, t)].items():
                    if self.scoring == "hunt":
                        contrib = s_term * len(poss)
                    else:
                        contrib = s_term * idf * self.tf_norm(cx, doc_id, len(poss))
                    if contrib <= 0:
                        continue
                    key = (cx, doc_id)
                    if key not in out:
                        out[key] = [contrib, set(poss)]
                    else:
                        out[key][0] = max(out[key][0], contrib)
                        out[key][1] |= set(poss)
        if raw:
            return {k: (v[0], sorted(v[1])) for k, v in out.items()}
        return {k: v[0] for k, v in out.items()}

    def _scan_range(self, lo, hi, cxs):
        out = {}
        for cx in cxs:
            norm = self.context_norms.get(cx)
            lo_cx = (norm(lo) if norm else lo.lower())
            hi_cx = (norm(hi) if norm else hi.lower())
            if lo_cx is None or hi_cx is None:
                continue
            gaussian = (
                self.scoring == "hunt"
                and self.context_types.get(cx) == "int"
            )
            if gaussian:
                def dec(z):
                    v = int(z[1:])
                    return v if z[0] == "1" else v - 10**20
                # Keys.hs:78-90: sigma = max(|mu|, 10) / 10, midpoint-only
                mu = (dec(lo_cx) + dec(hi_cx)) / 2.0
                sigma = max(abs(mu), 10.0) / 10.0
            in_range = [
                t for t in self.terms_by_cx[cx] if lo_cx <= t.lower() <= hi_cx
            ]
            if self.context_types.get(cx) == "geo":
                # rect containment on de-interleaved axes
                # (PrefixTreeIndex2Dim.hs:96 Dim2Search.lookupRange)
                in_range = [
                    t
                    for t in in_range
                    if lo_cx[0::2] <= t[0::2] <= hi_cx[0::2]
                    and lo_cx[1::2] <= t[1::2] <= hi_cx[1::2]
                ]
            for t in self._limit_docs(cx, in_range):
                tl = t.lower()
                idf = self.idf(cx, tl)
                for doc_id, poss in self.postings[(cx, t)].items():
                    if gaussian:
                        x = float(dec(tl))
                        contrib = math.exp(
                            -((x - mu) ** 2) / (2.0 * sigma * sigma)
                        )
                    elif self.scoring == "hunt":
                        contrib = float(len(poss))
                    else:
                        contrib = idf * self.tf_norm(cx, doc_id, len(poss))
                    key = (cx, doc_id)
                    out[key] = max(out.get(key, 0.0), contrib)
        return out

    # ---- combinators (on context-collapsed ScoredDocs, like the
    # reference: Processor.hs:513-517 over DocIdMap Score) ----
    def _collapse(self, scored):
        """{(cx, doc): s} -> {doc: s} with context weights; identity if
        already doc-keyed. bm25 mode sums contexts; hunt mode keeps the
        per-doc MAX across contexts — boostAndAggregateCx folds with the
        Score monoid (Intermediate.hs:267-278, Score.hs:66-71 mappend =
        max)."""
        if not scored or not isinstance(next(iter(scored)), tuple):
            return dict(scored)
        out = defaultdict(float)
        for (cx, doc_id), s in scored.items():
            v = s * self.context_weights.get(cx, 1.0)
            if self.scoring == "hunt":
                out[doc_id] = max(out[doc_id], v)
            else:
                out[doc_id] += v
        return dict(out)

    def _and(self, legs):
        legs = [self._collapse(x) for x in legs]
        acc = legs[0]
        for leg in legs[1:]:
            acc = {k: acc[k] + leg[k] for k in acc.keys() & leg.keys()}
        return acc

    def _or(self, legs):
        acc = {}
        for leg in legs:
            for k, v in self._collapse(leg).items():
                if self.scoring == "hunt":
                    acc[k] = max(acc.get(k, float("-inf")), v)
                else:
                    acc[k] = acc.get(k, 0.0) + v
        return acc

    def _andnot(self, legs):
        acc = self._collapse(legs[0])
        for leg in legs[1:]:
            for k in self._collapse(leg):
                acc.pop(k, None)
        return acc

    @staticmethod
    def _sequence(legs, op, dist):
        acc = dict(legs[0])
        for j, leg in enumerate(legs[1:], 1):
            if op == "phrase":
                lb, ub = j, j
            elif op == "follow":
                lb, ub = 1, j * dist
            else:
                lb, ub = -j * dist, j * dist
            nxt = {}
            for k in acc.keys() & leg.keys():
                s1, p1 = acc[k]
                s2, p2 = leg[k]
                keep = [p for p in p1 if any(lb <= q - p <= ub for q in p2)]
                if keep:
                    nxt[k] = (s1 + s2, keep)
            acc = nxt
        return acc

    # ---- evaluation ----
    def eval(self, q, cxs=None, raw=False):
        cxs = cxs or tuple(self.contexts)
        if isinstance(q, QWord):
            return self._scan(q.word, q.op, True, cxs, raw)
        if isinstance(q, QFullWord):
            return self._scan(q.word, q.op, False, cxs, raw)
        if isinstance(q, QPhrase):
            words = q.phrase.split()
            if not words:  # '""' parses; mirror the compiler's guard
                return {} if not raw else {}
            if len(words) == 1:
                return self._scan(words[0], q.op, False, cxs, raw)
            legs = [self._scan(w, q.op, False, cxs, True) for w in words]
            res = self._sequence(legs, "phrase", 1)
            return res if raw else {k: v[0] for k, v in res.items()}
        if isinstance(q, QRange):
            return self._scan_range(q.lo, q.hi, cxs)
        if isinstance(q, QContext):
            return self.eval(q.query, tuple(q.contexts), raw)
        if isinstance(q, QBoost):
            r = self.eval(q.query, cxs, raw)
            if raw:
                return {k: (s * q.weight, p) for k, (s, p) in r.items()}
            return {k: s * q.weight for k, s in r.items()}
        if isinstance(q, QSeq):
            from hunt_spark.plans.compiler import QueryCompiler

            # same associative flattening as the engine (a NEAR 3 b
            # NEAR 3 c = 3 legs with cumulative bounds, not a nested
            # pair with tighter ones — Processor.hs collectAssoc)
            legs_q = QueryCompiler._flatten(q)
            if not legs_q:
                return {}
            if q.op in ("phrase", "follow", "near"):
                legs = [self.eval(leg, cxs, raw=True) for leg in legs_q]
                res = self._sequence(legs, q.op, q.dist)
                return res if raw else {k: v[0] for k, v in res.items()}
            legs = [self.eval(leg, cxs, raw=False) for leg in legs_q]
            if q.op == "and":
                return self._and(legs)
            if q.op == "or":
                return self._or(legs)
            return self._andnot(legs)
        raise TypeError(type(q))

    def search(self, query, k=10, offset=0):
        ast = parse_query(query) if isinstance(query, str) else query
        by_doc = self._collapse(self.eval(ast))
        ranked = sorted(
            (
                (doc_id, self.urls[doc_id], s * self.weights[doc_id])
                for doc_id, s in by_doc.items()
            ),
            key=lambda r: (-r[2], r[1]),
        )
        return ranked[offset : offset + k]

    def completion(self, prefix, k=10, contexts=None, doc_filter=None):
        cxs = contexts or self.contexts
        scores = defaultdict(float)
        for cx in cxs:
            for t in self._matching_terms(cx, prefix, "nocase", True):
                s_term = sim(prefix, t)
                if s_term <= 0:
                    continue
                for doc_id, poss in self.postings[(cx, t)].items():
                    if doc_filter is not None and doc_id not in doc_filter:
                        continue
                    scores[t] += s_term * len(poss)
        return sorted(scores.items(), key=lambda r: (-r[1], r[0]))[:k]

    def complete_query(self, query, k=10):
        """Hunt processQueryScoredWords (Processor.hs:311-366): AND
        head as unscored doc set, last word as filtered prefix scan."""
        ast = parse_query(query) if isinstance(query, str) else query
        cxs = None
        if isinstance(ast, QContext):
            cxs = list(ast.contexts)
            ast = ast.query
        if isinstance(ast, (QWord, QFullWord)):
            return self.completion(ast.word, k=k, contexts=cxs)
        if isinstance(ast, QPhrase):
            words = ast.phrase.split()
            if len(words) == 1:
                return self.completion(words[0], k=k, contexts=cxs)
            head = QPhrase(" ".join(words[:-1]), ast.op)
            doc_set = set(
                self._collapse(self.eval(head, cxs and tuple(cxs))).keys()
            )
            return self.completion(
                words[-1], k=k, contexts=cxs, doc_filter=doc_set
            )
        # mirror the engine's clean errors (assert would vanish under
        # python -O, and last.word on a phrase leg is an AttributeError)
        if not (isinstance(ast, QSeq) and ast.op == "and"):
            raise ValueError(f"unsupported completion query shape: {ast!r}")
        last = ast.legs[-1]
        if not isinstance(last, (QWord, QFullWord)):
            raise ValueError("completion needs a word as the last leg")
        head = (
            ast.legs[0] if len(ast.legs) == 2 else QSeq("and", tuple(ast.legs[:-1]))
        )
        doc_set = set(self._collapse(self.eval(head, cxs and tuple(cxs))).keys())
        return self.completion(last.word, k=k, contexts=cxs, doc_filter=doc_set)
