"""Structured-Streaming ingest: continuous index maintenance.

The reference's ingest is a synchronous command loop (hunt:
Hunt/Interpreter.hs:421-480 execInsertList); the cluster-scale
analogue is a stream of document files landing in object storage,
consumed with ``readStream`` and applied through ``foreachBatch`` as
catalog append-snapshots (SURVEY.md §2.10 marks this as the optional
widening — Iceberg appends + incremental stat refresh).

Semantics:
- each micro-batch appends ``postings`` + ``doc_meta`` delta snapshots
  via ``HuntEngine.insert`` (same code path as batch inserts — one
  write path to reason about);
- the streaming checkpoint gives exactly-once file consumption; the
  catalog manifest gives atomic visibility of each batch;
- collection stats (df/N/avgdl) are refreshed once at the end of an
  ``availableNow`` drain (or on demand) rather than per batch — BM25
  scores are defined against the refreshed snapshot, matching a full
  rebuild on the same corpus (pinned by tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from hunt_spark.engine import HuntEngine
from hunt_spark.sources.corpus import CORPUS_SCHEMA


def stream_ingest(
    spark: SparkSession,
    engine: HuntEngine,
    input_path: str,
    context_cols: dict[str, Column],
    checkpoint: str,
    schema: str = CORPUS_SCHEMA,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    refresh_on_drain: bool = True,
) -> StreamingQuery:
    """Consume document parquet files from ``input_path`` into the
    index. ``available_now=True`` drains the backlog and stops (the
    resumable-batch pattern) — and, with ``refresh_on_drain`` (the
    default), awaits the drain and refreshes collection stats so newly
    streamed vocabulary is immediately searchable (the compiler inner-
    joins postings with term_stats; without the refresh, new terms
    simply don't exist). False keeps a continuous micro-batch stream
    running — call ``engine.refresh_stats()`` on whatever cadence the
    deployment wants scores to advance."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(input_path)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # validate_uris off: URI checks cost two jobs per micro-batch
        # and replayed source files would spuriously fail them —
        # exactly-once dedup belongs to the source/checkpoint contract
        engine.insert(
            batch_df, context_cols, refresh_stats=False, validate_uris=False
        )

    writer = (
        src.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .queryName("hunt_spark_ingest")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
        q = writer.start()
        if refresh_on_drain:
            q.awaitTermination()
            engine.refresh_stats()
        return q
    return writer.start()


def windowed_doc_counts(
    docs_stream: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time ingest monitoring: docs per (lang, window) with a
    watermark bounding state for late arrivals — the standard
    watermark + windowed-agg shape, usable as a streaming sink for
    per-partition ingest metrics."""
    w = F.window("warc_ts", window, slide) if slide else F.window("warc_ts", window)
    return (
        docs_stream.withWatermark("warc_ts", watermark)
        .groupBy(w.alias("win"), "lang")
        .agg(F.count("*").alias("n_docs"))
        .select("win.start", "win.end", "lang", "n_docs")
    )
