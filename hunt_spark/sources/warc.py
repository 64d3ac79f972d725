"""WARC (ISO 28500) source — the container format a Common-Crawl-style
corpus actually ships in (one crawl = tens of thousands of ~1 GB
``.warc.gz`` shard files; ~100 TB total).

``warc_df`` reads a directory of ``.warc`` / ``.warc.gz`` files into

    (warc_file string, record_id string, warc_type string,
     target_uri string, warc_date timestamp, http_status int,
     content_type string, payload binary)

Spark-first shape: ``spark.read.format("binaryFile")`` lists and ships
whole files (CC's sharding into ~1 GB members IS the partitioning —
one task per shard file, linear scale-out with executors, no shared
state); each file parses inside one Arrow-batched ``mapInPandas``
worker with the stdlib-only parser below. WARC's gzip convention —
every record an independently-compressed gzip member, members
concatenated — decompresses with ``zlib`` member-at-a-time; a
file-level ``gzip.decompress`` would also work but needs the whole
uncompressed shard in memory at once (the member loop keeps only one
record buffered).

The reference ingests crawl results via its crawler pipeline
(hunt-crawler/src/Holumbus/Crawler/IndexerCore.hs:41-48 — fetched page
-> RawDoc); this source is the equivalent entry point when the crawl
already happened upstream (the Common Crawl case): WARC response
records carry the fetched page bodies, and ``http_response_body``
splits the HTTP envelope off so the rest of the pipeline (HTML
extraction, tokenize, invert) is identical to the crawler hand-off.

A deterministic writer twin (``write_warc_bytes``) exists so tests and
the driver gate can synthesize valid shards without fixture files.
"""

from __future__ import annotations

import datetime as dt
import gzip
import io
import zlib
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_SCHEMA = (
    "warc_file string, record_id string, warc_type string, "
    "target_uri string, warc_date timestamp, http_status int, "
    "content_type string, payload binary"
)

_CRLF = b"\r\n"


# ---------------------------------------------------------------------------
# parsing (pure python, no Spark — unit-testable and reused by the UDF)
# ---------------------------------------------------------------------------


def _gzip_members(data: bytes) -> Iterator[bytes]:
    """Decompress concatenated gzip members one at a time (the WARC
    convention: record == member). Keeps a single member in memory."""
    # memoryview: a bytes slice would COPY the whole remaining shard
    # per member — O(members x shard_bytes) memcpy on a ~1 GB CC shard
    # with tens of thousands of records; mv[pos:] is zero-copy
    mv = memoryview(data)
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        out = d.decompress(mv[pos:])
        if not d.eof:  # truncated trailing member
            raise ValueError("truncated gzip member in WARC file")
        yield out
        consumed = len(data) - pos - len(d.unused_data)
        pos += consumed


def _split_records(raw: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield (warc_headers, block) from an uncompressed WARC stream.
    Each record: version line, header lines, CRLF CRLF, Content-Length
    bytes of block, CRLF CRLF separator."""
    pos = 0
    n = len(raw)
    while pos < n:
        # tolerate extra separator padding between records
        while raw.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            return
        head_end = raw.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            raise ValueError("unterminated WARC header block")
        head = raw[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line: {lines[0]!r}")
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers["content-length"])
        body_start = head_end + 4
        yield headers, raw[body_start : body_start + length]
        pos = body_start + length


def parse_warc_bytes(
    data: bytes, gzipped: bool
) -> Iterator[tuple[dict[str, str], bytes]]:
    """(warc_headers, block) for every record in a shard's bytes."""
    if gzipped:
        for member in _gzip_members(data):
            yield from _split_records(member)
    else:
        yield from _split_records(data)


def http_response_body(block: bytes) -> tuple[int | None, str | None, bytes]:
    """Split a response record's block into (status, content_type,
    body). WARC response blocks hold the raw HTTP response: status
    line + headers + CRLF CRLF + body. Non-HTTP blocks pass through
    with (None, None, block)."""
    if not block.startswith(b"HTTP/"):
        return None, None, block
    head_end = block.find(_CRLF + _CRLF)
    if head_end < 0:
        return None, None, block
    head = block[:head_end].decode("utf-8", "replace")
    lines = head.split("\r\n")
    parts = lines[0].split(None, 2)
    try:
        status: int | None = int(parts[1])
    except (IndexError, ValueError):
        status = None
    ctype = None
    for line in lines[1:]:
        k, _, v = line.partition(":")
        if k.strip().lower() == "content-type":
            ctype = v.strip()
            break
    return status, ctype, block[head_end + 4 :]


def _parse_date(s: str | None) -> dt.datetime | None:
    if not s:
        return None
    try:
        return dt.datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ")
    except ValueError:
        return None


# ---------------------------------------------------------------------------
# the Spark source
# ---------------------------------------------------------------------------


def warc_df(
    spark: SparkSession,
    path: str | Sequence[str],
    response_only: bool = True,
) -> DataFrame:
    """Read WARC shard files under ``path`` (glob ok). One task per
    shard file (binaryFile source); parse is Arrow-batched python.
    With ``response_only`` (default) only ``WARC-Type: response``
    records survive — the fetched pages — and the HTTP envelope is
    stripped into (http_status, content_type, payload=body). With it
    off, every record type flows through with the raw block as
    payload."""
    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: list[tuple] = []
            for fpath, content in zip(b["path"], b["content"]):
                gz = fpath.endswith(".gz")
                for headers, block in parse_warc_bytes(bytes(content), gz):
                    wtype = headers.get("warc-type", "")
                    if response_only and wtype != "response":
                        continue
                    status, ctype, body = (
                        http_response_body(block)
                        if wtype == "response"
                        else (None, None, block)
                    )
                    rows.append(
                        (
                            fpath,
                            headers.get("warc-record-id", ""),
                            wtype,
                            headers.get("warc-target-uri", ""),
                            _parse_date(headers.get("warc-date")),
                            status,
                            ctype,
                            body,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "warc_file",
                    "record_id",
                    "warc_type",
                    "target_uri",
                    "warc_date",
                    "http_status",
                    "content_type",
                    "payload",
                ],
            )

    out = files.select("path", "content").mapInPandas(parse, schema=WARC_SCHEMA)
    return out.withColumn("warc_date", F.col("warc_date").cast("timestamp"))


# ---------------------------------------------------------------------------
# writer twin (tests / gate synthesis)
# ---------------------------------------------------------------------------


def write_warc_bytes(
    records: Sequence[dict],
    gzipped: bool = True,
) -> bytes:
    """Serialize records to WARC/1.0 bytes (one gzip member per record
    when ``gzipped``, the CC convention). Each record dict:
    ``{"type": "response"|"request"|"warcinfo"|..., "uri": str,
    "date": datetime, "record_id": str, "body": bytes,
    "http_status": int | None, "content_type": str | None}`` — with an
    http_status, the block is wrapped in an HTTP response envelope."""
    out = io.BytesIO()
    for r in records:
        status = r.get("http_status")
        body: bytes = r.get("body", b"")
        if status is not None:
            ctype = r.get("content_type") or "text/html"
            block = (
                f"HTTP/1.1 {status} OK\r\n"
                f"Content-Type: {ctype}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode() + body
        else:
            block = body
        date = r.get("date") or dt.datetime(2020, 1, 1)
        head = [
            "WARC/1.0",
            f"WARC-Type: {r.get('type', 'response')}",
            f"WARC-Record-ID: {r.get('record_id', '<urn:uuid:0>')}",
            f"WARC-Date: {date.strftime('%Y-%m-%dT%H:%M:%SZ')}",
        ]
        uri = r.get("uri")
        if uri:
            head.append(f"WARC-Target-URI: {uri}")
        head.append(f"Content-Length: {len(block)}")
        rec = "\r\n".join(head).encode() + _CRLF + _CRLF + block + _CRLF + _CRLF
        if gzipped:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                g.write(rec)
            out.write(buf.getvalue())
        else:
            out.write(rec)
    return out.getvalue()
