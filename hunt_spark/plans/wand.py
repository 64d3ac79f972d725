"""Block-max-WAND-style pruned BM25 top-k over the compressed blocks
artifact (SURVEY.md §4.3.3; north-star "block-max WAND over
posting-list intersections").

The reference scores candidates with a bounded priority queue over
in-memory posting lists (hunt: Data/LimitedPriorityQueue.hs:43-101);
at cluster scale the analogous trick is *block skipping*: the build
stage stores, per (context, term_lc, doc-range block), a conservative
BM25 upper bound ``max_bm25`` (operators/build.py build_blocks). At
query time:

1. collect the query terms' block *stats* to the driver — BOUNDED:
   if the terms' total block count exceeds ``max_stats_rows`` (a hot
   term at 10^12 docs has millions of blocks), stats are pre-
   aggregated executor-side into block *groups* of S consecutive
   block ids (S chosen so collected rows <= the cap) and pruning runs
   at group granularity. A group's max is >= each member block's max,
   so group-level pruning is still exact — only less selective;
2. seed a threshold θ: decode only the highest-ub blocks covering
   ≥ seed_factor·k postings, aggregate, take the k-th best partial
   score (for OR, any partial score is a lower bound of the true
   score, so θ is valid);
3. prune: block B of term t can be skipped iff
   ``ub(B) = Σ_t' boost_t' · max(max_bm25 of t'-blocks overlapping
   B's doc-range) < θ`` — ub(B) bounds the *total* score of every doc
   in B, so no top-k doc is lost (proof: doc d ∈ B has all its query
   postings in blocks overlapping B's range; each contribution ≤ the
   per-term overlap max). For AND, a block whose range no block of
   some other term overlaps is pruned outright (its docs cannot
   satisfy the conjunction);
4. scan the surviving blocks once (Spark mapInPandas varbyte decode,
   vectorized), aggregate per doc, top-k.

Exactness: any doc whose computed score ≥ θ has no pruned block
(else its true score — and hence its computed partial — would be
< θ), so its computed score is exact; and ≥ k seed docs score ≥ θ.
Rank-identity with the unpruned plan is pinned by tests.

Block intervals use exact integer arithmetic over the u32 = top-32-
bits doc-hash space (build-side block_id = (u32·n_blocks) >> 32), so
driver-side overlap checks cannot drift at boundaries.
"""

from __future__ import annotations

from bisect import bisect_right
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hunt_spark.functions.varbyte import delta_varbyte_decode
from hunt_spark.plans.ast import QBoost, QFullWord, QSeq

U32_SPAN = 1 << 32


@dataclass(frozen=True)
class WandLeg:
    word: str      # query word, original case (sim reference)
    boost: float
    op: str        # "case" | "nocase"

    @property
    def term_lc(self) -> str:
        return self.word.lower()


def compile_wand(q) -> tuple[str, list[WandLeg]] | None:
    """Match the WAND-able query shapes: a flat AND/OR of exact words
    (optionally boosted), or a single exact word. Returns None when the
    query needs the general compiler (phrase/near/prefix/range/nested).
    """
    def leg(node, boost: float) -> WandLeg | None:
        if isinstance(node, QBoost):
            return leg(node.query, boost * float(node.weight))
        if isinstance(node, QFullWord) and node.op in ("case", "nocase", "fuzzy"):
            op = "case" if node.op == "case" else "nocase"
            return WandLeg(node.word, boost, op)
        return None

    def flatten(node, op):
        # the parser builds left-nested binary chains; associative
        # same-op nesting flattens (QueryCompiler._flatten's rule)
        if isinstance(node, QSeq) and node.op == op:
            out = []
            for x in node.legs:
                out.extend(flatten(x, op))
            return out
        return [node]

    single = leg(q, 1.0)
    if single is not None:
        return ("or", [single])
    if isinstance(q, QSeq) and q.op in ("and", "or"):
        legs = [leg(n, 1.0) for n in flatten(q, q.op)]
        if all(x is not None for x in legs):
            # duplicate term_lc legs would need per-leg aggregation; bail
            lcs = [x.term_lc for x in legs]
            if len(set(lcs)) == len(lcs):
                return (q.op, legs)
    return None


def _block_range(bid: int, nb: int) -> tuple[int, int]:
    """Half-open u32 interval [lo, hi) of docs with (u32*nb)>>32 == bid."""
    lo = -((-bid * U32_SPAN) // nb)          # ceil(bid * 2^32 / nb)
    hi = -((-(bid + 1) * U32_SPAN) // nb)
    return lo, hi


class _TermBlocks:
    """Sorted block-group ranges + maxima for one (context, term_lc).

    Each row is a group of >= 1 consecutive block ids [bid_lo, bid_hi]
    (single blocks when the stats fit the driver cap un-grouped); the
    group's doc-hash interval is the union of its members' intervals
    and its max is the group max — a conservative superset, so pruning
    against it is exact at any granularity."""

    def __init__(self, rows: list[dict]):
        rows = sorted(rows, key=lambda r: r["bid_lo"])
        self.bid_lo = [r["bid_lo"] for r in rows]
        self.bid_hi = [r["bid_hi"] for r in rows]
        self.nb = rows[0]["n_blocks"]
        self.lo = [_block_range(r["bid_lo"], r["n_blocks"])[0] for r in rows]
        self.hi = [_block_range(r["bid_hi"], r["n_blocks"])[1] for r in rows]
        self.maxima = [r["max_bm25"] for r in rows]
        self.n_postings = [r["n_postings"] for r in rows]

    def overlap_max(self, lo: int, hi: int) -> float | None:
        """max(max_bm25) over blocks overlapping [lo, hi), None if none."""
        i = bisect_right(self.lo, lo) - 1
        if i >= 0 and self.hi[i] <= lo:
            i += 1
        i = max(i, 0)
        best = None
        while i < len(self.lo) and self.lo[i] < hi:
            if self.hi[i] > lo:
                m = self.maxima[i]
                best = m if best is None or m > best else best
            i += 1
        return best


def _decode(
    blocks: DataFrame,
    legs: list[WandLeg],
    keep: dict[tuple[str, str], list[tuple[int, int]]],
    n_docs: dict[str, float],
    avg_dl: dict[str, float],
) -> DataFrame:
    """Scan the kept ((context, term_lc) -> block_id set) blocks; emit per
    (context, doc_id, term_lc) the similarity-weighted boosted BM25
    contribution (max over case variants — mirrors compiler._scan).

    Scores are recomputed from the stored (tf, dl, df) with the same
    IEEE double expression shape as idf_col/tf_norm_col, so the pruned
    path reproduces the full plan's arithmetic."""
    from hunt_spark.operators.build import BM25_B, BM25_K1

    conds = None
    for (cx, t), ivs in keep.items():
        ic = None
        for lo_b, hi_b in ivs:
            c = F.col("block_id").between(int(lo_b), int(hi_b))
            ic = c if ic is None else (ic | c)
        # pruning runs per context (per-cx theta) — the predicate must
        # keep that key, or intervals kept for context B re-admit the
        # same term's pruned blocks in context A (exact but unpruned)
        c = (F.col("context") == cx) & (F.col("term_lc") == t) & ic
        conds = c if conds is None else (conds | c)
    sel = blocks.filter(conds).select(
        "context", "term_lc", "df", "doc_ids_vb", "variants", "tfs", "dls"
    )
    by_lc = {x.term_lc: x for x in legs}

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ctx_o, doc_o, lc_o, sc_o = [], [], [], []
            for ctx, lc, df_v, vb, variants, tfs, dls in zip(
                b["context"], b["term_lc"], b["df"], b["doc_ids_vb"],
                b["variants"], b["tfs"], b["dls"],
            ):
                leg = by_lc[lc]
                ids = delta_varbyte_decode(bytes(vb))
                tf = np.asarray(tfs, dtype=np.float64)
                dl = np.asarray(dls, dtype=np.float64)
                n_d, a_dl = n_docs[ctx], avg_dl[ctx]
                idf = np.log(1.0 + (n_d - float(df_v) + 0.5) / (float(df_v) + 0.5))
                s = idf * (
                    (tf * (BM25_K1 + 1.0))
                    / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / a_dl))
                )
                # resolve original-case variants (null == lowercase term)
                varr = np.asarray(variants, dtype=object)
                varr[pd.isna(varr)] = lc
                if leg.op == "case":
                    m = varr == leg.word
                    ids, s = ids[m], s[m]  # sim == 1.0 on exact variant
                else:
                    # Keys.hs similar': equal -> 1.0, same length (always
                    # true within a term_lc group) -> 0.75
                    s = s * np.where(varr == leg.word, 1.0, 0.75)
                if len(ids) == 0:
                    continue
                s = s * leg.boost
                ctx_o.extend([ctx] * len(ids))
                doc_o.append(ids)
                lc_o.extend([lc] * len(ids))
                sc_o.append(s)
            yield pd.DataFrame(
                {
                    "context": pd.Series(ctx_o, dtype=object),
                    "doc_id": np.concatenate(doc_o) if doc_o else np.array([], dtype=np.int64),
                    "term_lc": pd.Series(lc_o, dtype=object),
                    "contrib": np.concatenate(sc_o) if sc_o else np.array([], dtype=np.float64),
                }
            )

    return sel.mapInPandas(
        go, schema="context string, doc_id long, term_lc string, contrib double"
    )


def _aggregate(decoded: DataFrame, op: str, n_legs: int) -> DataFrame:
    """(context, doc_id, term_lc, contrib) -> (context, doc_id, score).
    Per (doc, term) the max over case variants (compiler._scan), then
    OR: sum of legs; AND: sum with presence of all legs required."""
    per_term = decoded.groupBy("context", "doc_id", "term_lc").agg(
        F.max("contrib").alias("contrib")
    )
    agg = per_term.groupBy("context", "doc_id").agg(
        F.sum("contrib").alias("score"), F.count("*").alias("_n")
    )
    if op == "and":
        agg = agg.filter(F.col("_n") == n_legs)
    return agg.select("context", "doc_id", "score")


def _coalesce(ivs: list[tuple[int, int]], cap: int = 256) -> list[tuple[int, int]]:
    """Merge adjacent/overlapping [lo, hi] block-id intervals; if more
    than ``cap`` disjoint runs remain, widen to the convex hull — a
    superset keep is always exact (extra blocks only add candidates
    whose scores are computed exactly), it just scans more."""
    ivs = sorted(ivs)
    out = [list(ivs[0])]
    for lo, hi in ivs[1:]:
        if lo <= out[-1][1] + 1:
            out[-1][1] = max(out[-1][1], hi)
        else:
            out.append([lo, hi])
    if len(out) > cap:
        return [(out[0][0], out[-1][1])]
    return [(a, b) for a, b in out]


class WandExecutor:
    def __init__(
        self,
        spark: SparkSession,
        blocks: DataFrame,
        n_shards: int,
        n_docs: dict[str, float],
        avg_dl: dict[str, float],
        seed_factor: int = 4,
        max_stats_rows: int = 65536,
    ):
        self.spark = spark
        self.blocks = blocks
        self.n_shards = n_shards
        self.n_docs = {k: float(v) for k, v in n_docs.items()}
        self.avg_dl = {k: float(v) for k, v in avg_dl.items()}
        self.seed_factor = seed_factor
        # hard bound on driver-collected stats rows: a stopword term at
        # 10^12 docs has df/4096 ~ millions of blocks; grouping keeps
        # the collect O(max_stats_rows) regardless of df
        self.max_stats_rows = max_stats_rows
        self.last_stats: dict | None = None  # pruning observability

    def _shards_for(self, terms: list[str]) -> list[int]:
        # driver-side xxhash64 twin (functions/xxh64.py) — no Spark job
        # for a 2-3 element hash (VERDICT r1 "What's wrong" #4)
        from hunt_spark.functions.xxh64 import spark_shard

        return sorted({spark_shard(t, self.n_shards) for t in terms})

    def _collect_stats(self, bl: DataFrame) -> tuple[list, int]:
        """Block(-group) stats rows bounded by max_stats_rows.

        Common case (cold terms): one probe collect with LIMIT cap+1 —
        if everything fits, done, single job. Hot-term case: a tiny
        count aggregate picks the grouping factor S, then an executor-
        side aggregate collapses S consecutive block ids per collected
        row, so the driver never holds more than ~max_stats_rows."""
        sel = bl.select(
            "context", "term_lc",
            F.col("block_id").alias("bid_lo"),
            F.col("block_id").alias("bid_hi"),
            "n_blocks", "max_bm25", "n_postings",
        )
        rows = sel.limit(self.max_stats_rows + 1).collect()
        if len(rows) <= self.max_stats_rows:
            return rows, 1
        total = bl.count()
        gran = -(-total // self.max_stats_rows)  # ceil
        rows = (
            bl.groupBy(
                "context", "term_lc",
                (F.col("block_id") / F.lit(gran)).cast("long").alias("_g"),
            )
            .agg(
                F.min("block_id").alias("bid_lo"),
                F.max("block_id").alias("bid_hi"),
                F.first("n_blocks").alias("n_blocks"),
                F.max("max_bm25").alias("max_bm25"),
                F.sum("n_postings").alias("n_postings"),
            )
            .drop("_g")
            .collect()
        )
        return rows, gran

    def topk_candidates(
        self, op: str, legs: list[WandLeg], k: int, contexts: tuple
    ) -> DataFrame:
        """Return (context, doc_id, score) containing every doc whose
        score can reach the global top-k (exact scores)."""
        terms = [x.term_lc for x in legs]
        bl = self.blocks.filter(
            F.col("context").isin(list(contexts))
            & F.col("shard").isin(self._shards_for(terms))  # partition pruning
            & F.col("term_lc").isin(terms)
        )
        stats, gran = self._collect_stats(bl)
        empty = self.spark.createDataFrame(
            [], "context string, doc_id long, score double"
        )
        if not stats:
            return empty

        boost = {x.term_lc: x.boost for x in legs}
        # group stats per (context, term)
        per_ct: dict[tuple[str, str], list[dict]] = {}
        for r in stats:
            per_ct.setdefault((r["context"], r["term_lc"]), []).append(r.asDict())
        tb = {key: _TermBlocks(rows) for key, rows in per_ct.items()}

        keep: dict[tuple[str, str], list[tuple[int, int]]] = {}
        n_total = n_kept = n_seed_jobs = 0
        cxs = sorted({c for c, _ in tb})
        for cx in cxs:
            cx_terms = [t for c, t in tb if c == cx]
            if op == "and" and len(cx_terms) < len(legs):
                continue  # some term absent in this context entirely

            # --- seed θ: highest-ub groups covering >= seed_factor*k postings
            cand = []  # (ub, term, (bid_lo, bid_hi), n_postings)
            for t in cx_terms:
                tbk = tb[(cx, t)]
                for j in range(len(tbk.bid_lo)):
                    lo, hi = tbk.lo[j], tbk.hi[j]
                    ub = 0.0
                    dead = False
                    for t2 in cx_terms:
                        m = (
                            tbk.maxima[j]
                            if t2 == t
                            else tb[(cx, t2)].overlap_max(lo, hi)
                        )
                        if m is None:
                            if op == "and":
                                dead = True
                                break
                            continue
                        ub += boost[t2] * m
                    if not dead:
                        cand.append(
                            (ub, t, (tbk.bid_lo[j], tbk.bid_hi[j]), tbk.n_postings[j])
                        )
            n_total += sum(len(tb[(cx, t)].bid_lo) for t in cx_terms)
            if not cand:
                continue
            cand.sort(key=lambda x: -x[0])

            theta = float("-inf")
            if op == "or" and len(cand) > 1:
                seed, covered = [], 0
                for ub, t, iv, np_ in cand:
                    seed.append((t, iv))
                    covered += np_
                    if covered >= self.seed_factor * k:
                        break
                # the seed θ-job only pays when pruning can remove real
                # work: if the non-seed remainder is small relative to
                # what the seed job itself must decode, skip the extra
                # Spark job and scan everything in the main pass (the
                # cold-query job-count fix — a seed covering ~all
                # candidate postings used to cost one full extra job to
                # prune almost nothing)
                rest = sum(np_ for _, _, _, np_ in cand) - covered
                if len(seed) < len(cand) and rest > covered:
                    seed_keep: dict[tuple[str, str], list[tuple[int, int]]] = {}
                    for t, iv in seed:
                        seed_keep.setdefault((cx, t), []).append(iv)
                    seed_keep = {
                        key: _coalesce(v) for key, v in seed_keep.items()
                    }
                    part = _aggregate(
                        _decode(
                            bl.filter(F.col("context") == cx), legs, seed_keep,
                            self.n_docs, self.avg_dl,
                        ),
                        "or",
                        len(legs),
                    )
                    n_seed_jobs += 1
                    top = part.orderBy(F.desc("score")).limit(k).collect()
                    if len(top) >= k:
                        theta = top[-1]["score"]  # partial => lower bound

            # 1e-9 slack: block maxima are numpy doubles, full-plan
            # scores JVM doubles — ulp-level drift must never prune a
            # true top-k block
            for ub, t, iv, _np in cand:
                if ub >= theta - 1e-9:
                    keep.setdefault((cx, t), []).append(iv)
                    n_kept += 1

        self.last_stats = {
            "blocks_total": n_total,
            "blocks_scanned": n_kept,
            "pruned_frac": round(1 - n_kept / n_total, 4) if n_total else 0.0,
            "granularity": gran,
            "stats_rows_collected": len(stats),
            "seed_jobs": n_seed_jobs,
        }
        if not keep:
            return empty
        keep = {key: _coalesce(v) for key, v in keep.items()}
        return _aggregate(
            _decode(bl, legs, keep, self.n_docs, self.avg_dl), op, len(legs)
        )
