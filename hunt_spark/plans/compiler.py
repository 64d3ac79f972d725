"""Query compiler: Query AST -> declarative DataFrame plan.

The distributed analogue of Hunt's query processor
(Hunt/Query/Processor.hs:250-366 tree walk, posting-set algebra
Hunt/Common/Occurrences.hs:88-117 + Positions.hs:93-114, aggregation
Hunt/Query/Intermediate.hs:267-484). Every operator is expressed with
built-in pyspark.sql functions so Catalyst applies predicate pushdown,
column pruning (positions are only read for phrase/NEAR/FOLLOW legs),
broadcast join selection and partition pruning (the ``shard`` filter
constant-folds to a partition predicate).

Operator mapping (SURVEY.md §2.4-2.6):
    AND        inner join on (context, doc_id), score = sum of legs
    OR         unionByName + groupBy(context, doc_id).sum(score)
    AND NOT    left anti join, keeps left score
    phrase     fold: keep first-word positions p with p+j in pos(w_j)
    FOLLOW d   interval [1, j*d]   (Intermediate.hs:513-524)
    NEAR d     interval [-j*d, j*d] (Intermediate.hs:526-538)
    boost      score * w
    context    predicate on the context column
    range      term BETWEEN lo AND hi

Scoring: BM25 (k1=1.2, b=0.75, idf = ln(1+(N-df+0.5)/(df+0.5))),
multiplied by the Hunt word-similarity weight for prefix expansion
(Hunt/Scoring/Keys.hs:42-54: equal=1.0, same-length=0.75, prefix=
0.5*|q|/|w|). A prefix leg aggregates expanded terms per doc with MAX.
Deliberate deviation from Hunt's native scorer: OR sums leg scores
(standard disjunctive BM25) instead of Hunt's per-doc max; the pytest
oracle defines rank-identity and mirrors this exactly.

Final ranking: total = doc_weight * sum_cx(cx_weight * score_cx)
(hunt mode: max_cx — the Score-monoid fold of boostAndAggregateCx);
tie-break (score DESC, url ASC) — Hunt's RankedDoc total order
(Intermediate.hs:371-384).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hunt_spark.operators.build import idf_col, tf_norm_col
from hunt_spark.plans.ast import (
    QBoost,
    QContext,
    QFullWord,
    QPhrase,
    QRange,
    QSeq,
    QWord,
)

SCORED = ("context", "doc_id", "score")
RAW = ("context", "doc_id", "score", "positions")


@dataclass
class IndexStats:
    """Per-context collection stats, collected once (tiny) and folded
    into scoring expressions as literal maps — the broadcast-stats
    pattern without a join."""

    n_docs: dict[str, int]
    avg_dl: dict[str, float]
    context_weights: dict[str, float]

    def lit_map(self, d: dict[str, float]) -> Column:
        if not d:
            # empty index (e.g. every doc tombstoned): a bare
            # create_map() is map<void,void> and map()[string_col]
            # fails analysis — pin the key/value types instead
            return F.create_map().cast("map<string,double>")
        pairs = []
        for k, v in d.items():
            pairs += [F.lit(k), F.lit(float(v))]
        return F.create_map(*pairs)


def _decode_zerofill(term_lc: Column) -> Column:
    """Inverse of the int ZeroFill normalizer: 21-char packed string ->
    numeric value (sign digit '1' non-negative; negatives stored as
    10^20 + n)."""
    digits = F.substring(term_lc, 2, 20).cast("decimal(21,0)")
    return F.when(
        F.substring(term_lc, 1, 1) == "1", digits.cast("double")
    ).otherwise((digits - F.lit(str(10**20)).cast("decimal(21,0)")).cast("double"))


def _gaussian_range_score(lo_norm: str, hi_norm: str) -> Column:
    """exp(-(x-mu)^2 / (2 sigma^2)) with mu the interval midpoint and
    sigma = max(|mu|, 10) / 10 — the reference's similarRangeInt'/
    similarFloat arithmetic (Hunt/Scoring/Keys.hs:78-90: `sigma x =
    (abs x `max` 10.0) / 10.0`, a function of the midpoint only; the
    reference computes in Float, here in IEEE double)."""
    def dec(z: str) -> int:
        v = int(z[1:])
        return v if z[0] == "1" else v - 10**20

    lo_v, hi_v = dec(lo_norm), dec(hi_norm)
    mu = (lo_v + hi_v) / 2.0
    sigma = max(abs(mu), 10.0) / 10.0
    x = _decode_zerofill(F.col("term_lc"))
    return F.exp(-((x - F.lit(mu)) ** 2) / F.lit(2.0 * sigma * sigma))


def sim_col(searched: str, found: Column) -> Column:
    """Hunt/Scoring/Keys.hs:42-54 similar'."""
    ls = len(searched)
    lf = F.length(found)
    return (
        F.when(found == F.lit(searched), F.lit(1.0))
        .when(lf == F.lit(ls), F.lit(0.75))
        .when(F.lit(ls) < lf, F.lit(0.5) * F.lit(float(ls)) / lf.cast("double"))
        .otherwise(F.lit(0.0))
    )


class QueryCompiler:
    def __init__(
        self,
        postings: DataFrame,
        term_stats: DataFrame,
        stats: IndexStats,
        n_shards: int,
        all_contexts: list[str] | None = None,
        word_limit: int = 0,
        doc_limit: int = 0,
        context_norms: dict | None = None,
        scoring: str = "bm25",
        context_types: dict | None = None,
        default_contexts: list[str] | None = None,
    ):
        self.postings = postings
        self.term_stats = term_stats
        self.stats = stats
        self.n_shards = n_shards
        self.all_contexts = tuple(all_contexts or sorted(stats.n_docs))
        # the unrestricted-query fan-out set (cxDefault, Schema.hs:89;
        # Processor.hs:189): a subset of all_contexts — explicit
        # QContext restriction still validates against the full set
        self.default_contexts = (
            tuple(default_contexts)
            if default_contexts is not None
            else self.all_contexts
        )
        # per-context query-constant normalizers (Hunt normQueryCx,
        # Processor.hs:165-181): typed contexts (int/date/geo) rewrite
        # query words/range bounds with the same chain the build used;
        # a normalizer returning None rejects the word for that context
        self.context_norms = context_norms or {}
        # Hunt's wordLimit knob (Processor.hs:79-90, default 100 there):
        # cap prefix expansion to the N shortest matching terms
        # (StringMap toListShortestFirst order). 0 = exact/unlimited —
        # the default here and what the oracle gate pins.
        self.word_limit = word_limit
        # Hunt's docLimit knob (Processor.hs:79-90, default 500 there;
        # truncation Intermediate.hs:327-342 limitRawResult): every
        # primary scan keeps matched words in word order until their
        # cumulative doc count reaches the limit, always keeping the
        # word that crosses it. 0 = exact/unlimited (the default here
        # and what the oracle gate pins).
        self.doc_limit = doc_limit
        # "bm25" (the rebuild's ranking per the north star) or "hunt"
        # (the reference's native arithmetic: word hit = sim * tf,
        # OR keeps per-doc MAX of leg scores — Score monoid,
        # Hunt/Scoring/Score.hs:66-71; pinned by RankingTests.hs:92-145
        # replicas in tests/test_hunt_scoring.py)
        if scoring not in ("bm25", "hunt"):
            raise ValueError(f"unknown scoring mode {scoring!r}")
        self.scoring = scoring
        # planning only needs storage semantics — collapse reference
        # wire names ("position"/"position-rtree") onto their storage
        # type so the geo/int branch tests below see canonical names
        from hunt_spark.functions.analysis import canonical_ctype

        self.context_types = {
            cx: canonical_ctype(t) for cx, t in (context_types or {}).items()
        }
        self._n_map = stats.lit_map({k: float(v) for k, v in stats.n_docs.items()})
        self._avgdl_map = stats.lit_map(stats.avg_dl)

    # ------------------------------------------------------------------
    # primary scans
    # ------------------------------------------------------------------
    def _term_predicate(self, word: str, op: str, prefix: bool) -> Column:
        wl = word.lower()
        if op == "case":
            c = F.col("term").startswith(word) if prefix else (F.col("term") == word)
            # lowercase shard/minmax pruning is still valid for cased lookups
            c = c & (
                F.col("term_lc").startswith(wl) if prefix else (F.col("term_lc") == wl)
            )
        else:  # nocase / fuzzy (fuzzy evaluates as nocase, Processor.hs:606)
            c = F.col("term_lc").startswith(wl) if prefix else (F.col("term_lc") == wl)
        return c

    def _group_by_norm(self, word: str, cxs: tuple) -> dict[str, list[str]]:
        """Group target contexts by the normalized form of the query
        constant; contexts whose validator rejects the word drop out."""
        groups: dict[str, list[str]] = {}
        for cx in cxs:
            norm = self.context_norms.get(cx)
            w = norm(word) if norm else word
            if w is not None:
                groups.setdefault(w, []).append(cx)
        return groups

    def _scan(
        self, word: str, op: str, prefix: bool, cxs: tuple, raw: bool
    ) -> DataFrame:
        """One query word -> scored (and optionally position-bearing)
        per-(context, doc) rows; fans out per normalized-constant group
        when typed contexts are in play."""
        groups = self._group_by_norm(word, cxs)
        if not groups:
            return self._empty(raw)
        if len(groups) > 1 or next(iter(groups)) != word:
            parts = [
                self._scan_one(w, op, prefix, tuple(g), raw)
                for w, g in groups.items()
            ]
            u = parts[0]
            for p in parts[1:]:
                u = u.unionByName(p)
            return u
        # single group, unchanged constant — but scan ONLY the group's
        # contexts: a context whose validator rejected the word must not
        # be scanned with the raw constant (e.g. a date context rejects
        # '20130101' as a token but a prefix scan on it would match
        # every packed '20130101HHMMSS' key; the oracle skips the
        # context entirely)
        return self._scan_one(word, op, prefix, tuple(groups[word]), raw)

    def _empty(self, raw: bool) -> DataFrame:
        schema = (
            "context string, doc_id long, score double, positions array<int>"
            if raw
            else "context string, doc_id long, score double"
        )
        return self.postings.sparkSession.createDataFrame([], schema)

    def _scan_one(
        self, word: str, op: str, prefix: bool, cxs: tuple, raw: bool
    ) -> DataFrame:
        wl = word.lower()
        p = self.postings.filter(F.col("context").isin(list(cxs)))
        p = p.filter(self._term_predicate(word, op, prefix))
        if not prefix:
            # constant-folds to a partition-pruning predicate on shard
            p = p.filter(
                F.col("shard")
                == F.pmod(F.xxhash64(F.lit(wl)), F.lit(self.n_shards)).cast("int")
            )
        ts = self.term_stats.filter(
            F.col("term_lc").startswith(wl) if prefix else (F.col("term_lc") == wl)
        ).select("context", "term_lc", "df")
        if prefix and self.word_limit > 0:
            # shortest-first expansion cap per context (Hunt limitWords
            # over the per-context StringMap's toListShortestFirst)
            from pyspark.sql.window import Window

            w = Window.partitionBy("context").orderBy(
                F.length("term_lc"), F.col("term_lc")
            )
            ts = (
                ts.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= self.word_limit)
                .drop("_rn")
            )
        j = p.join(F.broadcast(ts), ["context", "term_lc"])
        j = self._apply_doc_limit(j)
        n = self._n_map[F.col("context")]
        avgdl = self._avgdl_map[F.col("context")]
        if self.scoring == "hunt":
            # reference arithmetic: word hit = sim * tf
            # (Intermediate.hs:432-437 Aggregate ScoredOccs ScoredDocs)
            contrib = sim_col(word, F.col("term")) * F.col("tf").cast("double")
        else:
            contrib = (
                sim_col(word, F.col("term"))
                * idf_col(F.col("df"), n)
                * tf_norm_col(F.col("tf"), F.col("dl"), avgdl)
            )
        j = j.withColumn("contrib", contrib).filter(F.col("contrib") > 0)
        if raw:
            # merge expanded terms per doc: positions unioned, score = max
            return j.groupBy("context", "doc_id").agg(
                F.max("contrib").alias("score"),
                F.array_sort(
                    F.array_distinct(F.flatten(F.collect_list("positions")))
                ).alias("positions"),
            )
        return j.groupBy("context", "doc_id").agg(F.max("contrib").alias("score"))

    def _scan_range(self, lo: str, hi: str, cxs: tuple) -> DataFrame:
        # typed contexts: normalize both bounds (lexicographic range on
        # zero-filled / digit-packed forms == numeric/chronological)
        lo_g = self._group_by_norm(lo, cxs)
        hi_g = self._group_by_norm(hi, cxs)
        keys = set()
        for w, g in lo_g.items():
            for cx in g:
                hw = next((w2 for w2, g2 in hi_g.items() if cx in g2), None)
                if hw is not None:
                    keys.add((w, hw, cx))
        pairs: dict[tuple[str, str], list[str]] = {}
        for w, hw, cx in keys:
            pairs.setdefault((w, hw), []).append(cx)
        if not pairs:
            return self._empty(False)
        parts = [
            self._scan_range_one(w, hw, tuple(g)) for (w, hw), g in pairs.items()
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u

    @staticmethod
    def _geo_rect_pred(lo: str, hi: str) -> Column:
        """Exact in-rect predicate over z-interleaved '0'/'1' terms:
        every even-position char (lat axis) and odd-position char (lon
        axis) substring must fall in the corners' per-axis ranges —
        fixed-length bit strings order lexicographically == numerically."""
        lat = F.regexp_replace(F.col("term_lc"), "(.)(.)", "$1")
        lon = F.regexp_replace(F.col("term_lc"), "(.)(.)", "$2")
        return lat.between(lo[0::2], hi[0::2]) & lon.between(lo[1::2], hi[1::2])

    def _apply_doc_limit(self, j: DataFrame) -> DataFrame:
        """Hunt docLimit truncation (Intermediate.hs:327-342
        limitRawResult via Processor.hs:630-631/646-647): per context,
        keep matched words in word order (the raw-result order — the
        prefix tree's key order, i.e. lexicographic on the stored cased
        word), accumulating each word's doc count, until the cumulative
        count reaches the limit; the crossing word is kept whole.
        ``j`` is the postings-side scan (one row per (context, term,
        doc)), so count(*) per (context, term) is that word's doc count.
        """
        if self.doc_limit <= 0:
            return j
        from pyspark.sql.window import Window

        tdf = j.groupBy("context", "term").agg(F.count("*").alias("_df"))
        w = (
            Window.partitionBy("context")
            .orderBy("term")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        allowed = (
            tdf.withColumn("_cum", F.sum("_df").over(w))
            .filter(F.col("_cum") - F.col("_df") < F.lit(self.doc_limit))
            .select("context", "term")
        )
        return j.join(F.broadcast(allowed), ["context", "term"], "left_semi")

    def _scan_range_one(self, lo: str, hi: str, cxs: tuple) -> DataFrame:
        p = self.postings.filter(F.col("context").isin(list(cxs)))
        p = p.filter(F.col("term_lc").between(lo.lower(), hi.lower()))
        ts = self.term_stats.filter(
            F.col("term_lc").between(lo.lower(), hi.lower())
        ).select("context", "term_lc", "df")
        if all(self.context_types.get(cx) == "geo" for cx in cxs):
            # 2-dim rect containment (PrefixTreeIndex2Dim.hs:96
            # Dim2Search.lookupRange): terms are z-interleaved bit
            # strings (lat bits even, lon bits odd). The lexicographic
            # z-interval [lo, hi] above is the standard coarse bound
            # (min corner <= z(p) <= max corner for any p in the rect);
            # the EXACT filter de-interleaves each axis JVM-side and
            # applies per-axis BETWEEN — rect semantics without driver-
            # side BIGMIN interval decomposition, and Catalyst still
            # pushes the coarse z-range to the parquet scan.
            rect = self._geo_rect_pred(lo, hi)
            p = p.filter(rect)
            ts = ts.filter(rect)
        j = p.join(F.broadcast(ts), ["context", "term_lc"])
        j = self._apply_doc_limit(j)
        n = self._n_map[F.col("context")]
        avgdl = self._avgdl_map[F.col("context")]
        if self.scoring == "hunt":
            if all(self.context_types.get(cx) == "int" for cx in cxs):
                # I9 lookupRangeSc (PrefixTreeIndex.hs:266-270,
                # Keys.hs:70-99): Gaussian bell vs the interval midpoint
                # over the decoded numeric value; sigma = half-width
                contrib = _gaussian_range_score(lo, hi)
            else:
                contrib = F.col("tf").cast("double")  # scored like a word hit
        else:
            contrib = idf_col(F.col("df"), n) * tf_norm_col(
                F.col("tf"), F.col("dl"), avgdl
            )
        return (
            j.withColumn("contrib", contrib)
            .groupBy("context", "doc_id")
            .agg(F.max("contrib").alias("score"))
        )

    # ------------------------------------------------------------------
    # combinators — Hunt combines boolean legs on *aggregated*
    # ScoredDocs, i.e. AFTER the per-leg context collapse (context
    # weights applied), so cross-context conjunctions work:
    # `name:foo AND city:bar` (Processor.hs:513-517 over ScoredDocs =
    # DocIdMap Score; collapse = boostAndAggregateCx,
    # Intermediate.hs:267-278). Output of a boolean node is doc-level.
    # ------------------------------------------------------------------
    def _and(self, legs: list[DataFrame]) -> DataFrame:
        legs = [self.collapse_contexts(x) for x in legs]
        acc = legs[0]
        for i, leg in enumerate(legs[1:], 1):
            r = leg.withColumnRenamed("score", f"_s{i}")
            acc = acc.join(r, ["doc_id"]).withColumn(
                "score", F.col("score") + F.col(f"_s{i}")
            ).drop(f"_s{i}")
        return acc.select("doc_id", "score")

    def _or(self, legs: list[DataFrame]) -> DataFrame:
        u = self.collapse_contexts(legs[0])
        for leg in legs[1:]:
            u = u.unionByName(self.collapse_contexts(leg))
        # hunt: OR-ed identical docs keep MAX of leg scores (Score
        # monoid, Score.hs:66-71); bm25 mode sums (disjunctive BM25 —
        # the documented deviation, oracle mirrors)
        comb = F.max("score") if self.scoring == "hunt" else F.sum("score")
        return u.groupBy("doc_id").agg(comb.alias("score"))

    def _andnot(self, legs: list[DataFrame]) -> DataFrame:
        acc = self.collapse_contexts(legs[0])
        for leg in legs[1:]:
            acc = acc.join(
                self.collapse_contexts(leg).select("doc_id"), ["doc_id"], "left_anti"
            )
        return acc.select("doc_id", "score")

    def _check_positional(self, cxs: tuple) -> None:
        """Positional queries need stored positions. A "text-small"
        context (ctTextSimple, Schema.hs:138-144 — DocIdSet tier, no
        positions) cannot answer them: when EVERY target context is
        positions-free the query is rejected; in a mixed fan-out the
        text-small contexts simply contribute no phrase matches (their
        null positions drop in the sequence fold)."""
        small = [
            cx for cx in cxs if self.context_types.get(cx) == "text-small"
        ]
        if small and len(small) == len(cxs):
            raise ValueError(
                f"positional (phrase/near/follow) query on positions-free "
                f"text-small context(s) {small}"
            )

    @staticmethod
    def _sequence(legs: list[DataFrame], op: str, dist: int) -> DataFrame:
        """Positional fold (Intermediate.hs:502-538 evalSequence/Follow/Near):
        keep first-leg positions p where some q in leg_j satisfies
        q - p in [lb_j, ub_j]."""
        acc = legs[0]
        for j, leg in enumerate(legs[1:], 1):
            if op == "phrase":
                lb, ub = j, j
            elif op == "follow":
                lb, ub = 1, j * dist
            else:  # near
                lb, ub = -j * dist, j * dist
            r = leg.withColumnRenamed("score", f"_s{j}").withColumnRenamed(
                "positions", f"_p{j}"
            )
            acc = (
                acc.join(r, ["context", "doc_id"])
                .withColumn(
                    "positions",
                    F.filter(
                        F.col("positions"),
                        lambda p: F.exists(
                            F.col(f"_p{j}"),
                            lambda q: (q - p).between(F.lit(lb), F.lit(ub)),
                        ),
                    ),
                )
                .filter(F.size("positions") > 0)
                .withColumn("score", F.col("score") + F.col(f"_s{j}"))
                .drop(f"_s{j}", f"_p{j}")
            )
        return acc.select(*RAW)

    # ------------------------------------------------------------------
    # evaluation
    # ------------------------------------------------------------------
    def eval(self, q, cxs: tuple | None = None, raw: bool = False) -> DataFrame:
        cxs = cxs or self.default_contexts
        if isinstance(q, QWord):
            return self._scan(q.word, q.op, True, cxs, raw)
        if isinstance(q, QFullWord):
            return self._scan(q.word, q.op, False, cxs, raw)
        if isinstance(q, QPhrase):
            words = q.phrase.split()
            if not words:  # '""' parses; zero legs must not IndexError
                return self._empty(raw)
            if len(words) == 1:
                return self._scan(words[0], q.op, False, cxs, raw)
            self._check_positional(cxs)
            legs = [self._scan(w, q.op, False, cxs, True) for w in words]
            res = self._sequence(legs, "phrase", 1)
            return res if raw else res.select(*SCORED)
        if isinstance(q, QRange):
            if raw:
                raise ValueError("range query inside a positional sequence")
            return self._scan_range(q.lo, q.hi, cxs)
        if isinstance(q, QContext):
            missing = set(q.contexts) - set(self.all_contexts)
            if missing:
                raise KeyError(f"unknown contexts: {sorted(missing)}")
            return self.eval(q.query, tuple(q.contexts), raw)
        if isinstance(q, QBoost):
            r = self.eval(q.query, cxs, raw)
            return r.withColumn("score", F.col("score") * F.lit(float(q.weight)))
        if isinstance(q, QSeq):
            legs_q = self._flatten(q)
            if not legs_q:  # builder API admits QSeq('and', ())
                return self._empty(raw)
            if q.op in ("phrase", "follow", "near"):
                self._check_positional(cxs)
                legs = [self.eval(leg, cxs, raw=True) for leg in legs_q]
                res = self._sequence(legs, q.op, q.dist)
                return res if raw else res.select(*SCORED)
            if raw:
                raise ValueError(f"{q.op} not supported inside a positional sequence")
            legs = [self.eval(leg, cxs, raw=False) for leg in legs_q]
            if q.op == "and":
                return self._and(legs)
            if q.op == "or":
                return self._or(legs)
            return self._andnot(legs)
        raise TypeError(f"unknown query node {type(q)}")

    @staticmethod
    def _flatten(q: QSeq) -> list:
        """Associative n-ary flattening (Processor.hs:482-501
        collectAssoc); AND NOT stays left-assoc (binary fold handles it)."""
        out = []
        for leg in q.legs:
            if (
                isinstance(leg, QSeq)
                and leg.op == q.op
                and q.op in ("and", "or")
            ):
                out.extend(QueryCompiler._flatten(leg))
            elif (
                isinstance(leg, QSeq)
                and leg.op == q.op
                and q.op in ("phrase", "follow", "near")
                and leg.dist == q.dist
            ):
                out.extend(QueryCompiler._flatten(leg))
            else:
                out.append(leg)
        return out

    # ------------------------------------------------------------------
    # final aggregation (Intermediate.hs:267-278 boostAndAggregateCx +
    # :348-361 toDocsResult)
    # ------------------------------------------------------------------
    def collapse_contexts(self, scored: DataFrame) -> DataFrame:
        """Context dimension -> per-doc score with context weights
        (boostAndAggregateCx). Identity on already-collapsed (doc-level
        boolean) results.

        bm25 mode SUMS weighted contexts (the rebuild's ranking — a doc
        matching in more fields ranks higher). hunt mode keeps the
        per-doc MAX: boostAndAggregateCx folds boosted per-context
        ScoredDocs with `<>` (Intermediate.hs:267-278), and the Score
        monoid is max (Score.hs:66-71). Note the reference's retired
        RankingTests.hs pinned SUM for this case, but that module is
        commented out of the suite (test/Hunt.hs:16) and imports a
        module that no longer exists; the live evaluator is max."""
        if "context" not in scored.columns:
            return scored
        w = self.stats.lit_map(
            {c: self.stats.context_weights.get(c, 1.0) for c in self.all_contexts}
        )
        comb = F.max if self.scoring == "hunt" else F.sum
        return scored.groupBy("doc_id").agg(
            comb(F.col("score") * w[F.col("context")]).alias("score")
        )
