from hunt_spark.streaming.ingest import stream_ingest, windowed_doc_counts

__all__ = ["stream_ingest", "windowed_doc_counts"]
