"""HuntEngine — the public API tying build, query, completion and
index maintenance together (the Spark analogue of Hunt's command
interpreter surface, Hunt/Interpreter/BasicCommand.hs:30-79:
Search/Completion/Select/InsertList/DeleteDocs/DeleteByQuery/
LoadIx/StoreIx/Status).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hunt_spark.operators.build import (
    BuildConfig,
    build_index,
    context_stats,
    postings_from_contexts,
    term_stats,
)
from hunt_spark.plans.compiler import IndexStats, QueryCompiler, sim_col
from hunt_spark.plans.parser import parse_query
from hunt_spark.sources.catalog import IndexCatalog


class HuntEngine:
    def __init__(
        self,
        spark: SparkSession,
        catalog_root: str,
        cfg: BuildConfig | None = None,
    ):
        self.spark = spark
        self.catalog = IndexCatalog(catalog_root)
        self.cfg = cfg or BuildConfig()
        self._compiler: QueryCompiler | None = None
        self._doc_meta: DataFrame | None = None

    # ------------------------------------------------------------------
    # build / load
    # ------------------------------------------------------------------
    def build(
        self,
        docs: DataFrame,
        context_cols: dict[str, Column],
        build_id: str = "full",
        resume: bool = True,
    ) -> dict[str, dict]:
        entries = build_index(
            self.spark, docs, context_cols, self.catalog, self.cfg, build_id, resume
        )
        self._invalidate()
        return entries

    def _invalidate(self) -> None:
        self._compiler = None
        self._doc_meta = None

    def _tombstones(self) -> DataFrame | None:
        try:
            return self.catalog.read(self.spark, "tombstones")
        except FileNotFoundError:
            return None

    def _postings(self) -> DataFrame:
        p = self.catalog.read(self.spark, "postings")
        t = self._tombstones()
        if t is not None:
            # merge-on-read deletes (Iceberg-style tombstones; Hunt
            # SegmentIndex delete generations, IndexWriter.hs:38-42)
            p = p.join(F.broadcast(t.select("doc_id")), "doc_id", "left_anti")
        return p

    def doc_meta(self) -> DataFrame:
        if self._doc_meta is None:
            m = self.catalog.read(self.spark, "doc_meta")
            t = self._tombstones()
            if t is not None:
                m = m.join(F.broadcast(t.select("doc_id")), "doc_id", "left_anti")
            self._doc_meta = m
        return self._doc_meta

    def compiler(self) -> QueryCompiler:
        if self._compiler is None:
            cstats = self.catalog.read(self.spark, "context_stats").collect()
            stats = IndexStats(
                n_docs={r["context"]: r["n_docs"] for r in cstats},
                avg_dl={r["context"]: r["avg_dl"] for r in cstats},
                context_weights=self.cfg.context_weights,
            )
            self._compiler = QueryCompiler(
                self._postings(),
                self.catalog.read(self.spark, "term_stats"),
                stats,
                self.cfg.n_shards,
            )
        return self._compiler

    # ------------------------------------------------------------------
    # query surface
    # ------------------------------------------------------------------
    def _ast(self, query):
        return parse_query(query) if isinstance(query, str) else query

    def search(self, query, k: int = 10, offset: int = 0) -> DataFrame:
        """Scored top-k retrieval: (doc_id, url, score), tie-break
        (score DESC, url ASC) — Hunt's RankedDoc order
        (Intermediate.hs:371-384) via TakeOrderedAndProject."""
        c = self.compiler()
        scored = c.collapse_contexts(c.eval(self._ast(query)))
        meta = self.doc_meta().select("doc_id", "url", "weight")
        res = scored.join(meta, "doc_id").select(
            "doc_id",
            "url",
            (F.col("score") * F.col("weight")).alias("score"),
        )
        res = res.orderBy(F.desc("score"), F.asc("url"))
        if offset:
            res = res.offset(offset)
        return res.limit(k)

    def select(self, query) -> DataFrame:
        """Unscored doc-id set (Hunt Select / DeleteByQuery evaluation,
        Processor.hs:194-246 — no limits, payloads collapsed to a set)."""
        c = self.compiler()
        return c.eval(self._ast(query)).select("doc_id").distinct()

    def completion(self, prefix: str, k: int = 10, contexts=None) -> DataFrame:
        """Scored word suggestions: word score = sum over docs of
        sim * tf (Intermediate.hs:479-484), top-k words."""
        c = self.compiler()
        cxs = tuple(contexts) if contexts else c.all_contexts
        p = c.postings.filter(F.col("context").isin(list(cxs)))
        p = p.filter(F.col("term_lc").startswith(prefix.lower()))
        return (
            p.withColumn("sim", sim_col(prefix, F.col("term")))
            .filter(F.col("sim") > 0)
            .groupBy("term")
            .agg(F.sum(F.col("sim") * F.col("tf")).alias("score"))
            .orderBy(F.desc("score"), F.asc("term"))
            .limit(k)
        )

    # ------------------------------------------------------------------
    # maintenance verbs (InsertList / DeleteDocs / DeleteByQuery /
    # Update — Interpreter.hs:323-368 dispatch)
    # ------------------------------------------------------------------
    def insert(self, docs: DataFrame, context_cols: dict[str, Column]) -> None:
        """Incremental insert: append postings/doc_meta snapshots, then
        recompute stats (Iceberg appends on a cluster)."""
        docs = docs.withColumn("doc_id", F.xxhash64("url"))
        if "weight" not in docs.columns:
            docs = docs.withColumn("weight", F.lit(1.0))
        new_p = postings_from_contexts(docs, context_cols, self.cfg)
        self.catalog.commit(
            new_p,
            "postings",
            f"insert/{docs.semanticHash() if hasattr(docs, 'semanticHash') else id(docs)}",
            partition_by=["context", "shard"],
            sort_within_by=["term_lc", "doc_id"],
            mode="append",
        )
        meta_cols = [
            c for c in ("doc_id", "url", "weight", "lang", "warc_ts") if c in docs.columns
        ]
        self.catalog.commit(
            docs.select(*meta_cols), "doc_meta", "insert/meta", mode="append"
        )
        self._refresh_stats()

    def delete_docs(self, urls: list[str]) -> None:
        t = self.spark.createDataFrame([(u,) for u in urls], "url string").select(
            F.xxhash64("url").alias("doc_id")
        )
        self.catalog.commit(t, "tombstones", "delete/docs", mode="append")
        self._refresh_stats()

    def delete_by_query(self, query) -> None:
        ids = self.select(query)
        self.catalog.commit(ids, "tombstones", "delete/query", mode="append")
        self._refresh_stats()

    def _refresh_stats(self) -> None:
        self._invalidate()
        p = self._postings()
        self.catalog.commit(context_stats(p), "context_stats", "refresh/context_stats")
        self.catalog.commit(
            term_stats(p), "term_stats", "refresh/term_stats",
            sort_within_by=["context", "term_lc"],
        )
        self._invalidate()

    def compact(self) -> None:
        """Rewrite postings minus tombstones as a fresh base snapshot
        (Hunt segment merge; Iceberg rewrite_data_files)."""
        p = self._postings()
        self.catalog.commit(
            p, "postings", "compact/postings",
            partition_by=["context", "shard"], sort_within_by=["term_lc", "doc_id"],
        )
        m = self.doc_meta()
        self.catalog.commit(m, "doc_meta", "compact/doc_meta")
        # tombstones consumed
        empty = self.spark.createDataFrame([], "doc_id long")
        self.catalog.commit(empty, "tombstones", "compact/tombstones")
        self._invalidate()

    def status(self) -> dict:
        snaps = self.catalog.snapshots()
        return {
            "tables": sorted({e["table"] for e in snaps}),
            "snapshots": len(snaps),
            "latest": snaps[-1]["snapshot_id"] if snaps else None,
        }
