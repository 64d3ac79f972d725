"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed with Arrow-batched ``mapInPandas`` kernels.

A 100 TB training-data pipeline carries images/audio/video as binary
columns next to text. The *Spark-side* contract — schema, partitioning,
UDF signatures, bounded batch shapes — is real and tested here; the
codec step itself is STUBBED (this container has no image/audio libs):
``decode_image``/``decode_audio`` raise ``NotImplementedError`` unless
``fake=True``, which substitutes a deterministic, seedable kernel so
the distributed plumbing can be exercised end-to-end and checked
against an oracle.

Design notes for scale:
- every kernel is ``mapInPandas`` (Arrow batches, vectorized numpy) —
  no per-row Python, no driver collect;
- outputs carry the input's join key (``doc_id``) so downstream stages
  can re-join without re-reading payloads;
- frame sampling explodes rows map-side (no shuffle) and caps frames
  per doc, so one pathological video cannot blow a task;
- ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory
  (binary payloads can be MBs each; see session.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

META_SCHEMA = "doc_id long, n_bytes long, payload_md5 string, width int, height int"
FRAME_SCHEMA = "doc_id long, frame_idx int, frame bytes".replace("bytes", "binary")
FEAT_SCHEMA = "doc_id long, features array<float>"


def attach_payload(df: DataFrame, source_col: str = "text") -> DataFrame:
    """Test/bench helper: wrap a string column as the opaque binary
    payload column ``payload`` (stand-in for a real image/audio blob)."""
    return df.withColumn("payload", F.encode(F.col(source_col), "UTF-8"))


def payload_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata for an opaque payload column.

    Pure JVM-side expressions (no Python): byte length, content hash,
    and the (stubbed) container header fields — width/height derived
    deterministically from the length so an ANSI-SQL oracle can verify
    the full distributed pipeline.
    """
    n = F.octet_length(F.col(payload_col))
    return df.select(
        "doc_id",
        n.cast("long").alias("n_bytes"),
        F.md5(F.col(payload_col)).alias("payload_md5"),
        F.pmod(n, F.lit(1024)).cast("int").alias("width"),
        F.pmod(F.floor(n / F.lit(1024)), F.lit(1024)).cast("int").alias("height"),
    )


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder+embedder: expand the
    payload digest into `dim` floats in [-1, 1). Stable across
    partitionings and runs."""
    h = hashlib.sha256(payload).digest()
    reps = (dim * 4) // len(h) + 1
    buf = (h * reps)[: dim * 4]
    raw = np.frombuffer(buf, dtype=np.uint32).astype(np.float64)
    return (raw / 2**31 - 1.0).astype(np.float32)


def _image_features(payload: bytes, dim: int) -> np.ndarray:
    """REAL image kernel (stdlib codec, functions/codecs.py): decode
    PNG -> grayscale -> mean-pool onto a fixed sqrt(dim) x sqrt(dim)
    grid -> flatten to `dim` floats in [0, 1]. The pooled-luma grid is
    the classic cheap visual fingerprint (what aHash pools before
    thresholding); swap in a vision encoder where one exists."""
    from hunt_spark.functions.codecs import decode_png

    img = decode_png(payload).astype(np.float64)
    luma = img[:, :, :3].mean(axis=2) if img.shape[2] >= 3 else img[:, :, 0]
    g = int(np.sqrt(dim))
    h, w = luma.shape
    ys = np.linspace(0, h, g + 1).astype(int)
    xs = np.linspace(0, w, g + 1).astype(int)
    pooled = np.zeros(g * g, dtype=np.float32)
    for i in range(g):
        for j in range(g):
            cell = luma[ys[i]:max(ys[i + 1], ys[i] + 1),
                        xs[j]:max(xs[j + 1], xs[j] + 1)]
            pooled[i * g + j] = cell.mean() / 255.0
    out = np.zeros(dim, dtype=np.float32)
    out[: g * g] = pooled
    return out


def _audio_features(payload: bytes, dim: int) -> np.ndarray:
    """REAL audio kernel (stdlib codec): decode WAV PCM -> mono ->
    `dim` windowed RMS-energy values (the standard cheap loudness
    envelope; a real pipeline would swap in a spectrogram encoder)."""
    from hunt_spark.functions.codecs import decode_wav

    x, _rate = decode_wav(payload)
    mono = x.mean(axis=1)
    n = len(mono)
    if n == 0:
        return np.zeros(dim, dtype=np.float32)
    edges = np.linspace(0, n, dim + 1).astype(int)
    out = np.zeros(dim, dtype=np.float32)
    for i in range(dim):
        seg = mono[edges[i]:max(edges[i + 1], edges[i] + 1)]
        out[i] = np.sqrt(np.mean(seg.astype(np.float64) ** 2))
    return out


def _decode_op(kernel, kernel_name: str):
    """Shared Arrow plumbing for payload -> features operators: one
    mapInPandas pass; a payload the codec rejects yields features=NULL
    (at 100 TB corrupt blobs are routine — one bad row must not fail
    the job; count nulls downstream to monitor decode health)."""

    def op(
        df: DataFrame,
        payload_col: str = "payload",
        dim: int = 64,
        fake: bool = False,
    ) -> DataFrame:
        sel = df.select("doc_id", payload_col)

        def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for b in batches:
                feats = []
                for p in b[payload_col]:
                    if p is None:
                        feats.append(None)
                        continue
                    if fake:
                        feats.append(_fake_features(bytes(p), dim))
                        continue
                    try:
                        feats.append(kernel(bytes(p), dim))
                    except ValueError:
                        feats.append(None)  # undecodable payload
                yield pd.DataFrame({"doc_id": b["doc_id"], "features": feats})

        return sel.mapInPandas(go, schema=FEAT_SCHEMA)

    op.__name__ = kernel_name
    return op


#: payload -> feature vector (array<float>), Arrow-batched. The REAL
#: path decodes stdlib-supported formats (PNG for images, PCM WAV for
#: audio — functions/codecs.py); undecodable payloads yield NULL
#: features. ``fake=True`` keeps the deterministic digest kernel for
#: oracle-checked plumbing tests. Formats needing external codec libs
#: (JPEG/MP3/H.264) remain out of scope in this environment — the
#: sandbox installs no PIL/soundfile (pinned env note, r5).
decode_image = _decode_op(_image_features, "decode_image")
decode_audio = _decode_op(_audio_features, "decode_audio")


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    frame_bytes: int = 256,
    every_n: int = 4,
    max_frames: int = 64,
) -> DataFrame:
    """Sample every ``every_n``-th fixed-size frame of each payload
    (the video-keyframe pattern), map-side, capped per doc.

    With a real container format the frame boundaries come from the
    demuxer; the fixed-stride split is the stub. The explode happens
    inside the Arrow kernel — no shuffle, no driver involvement.
    """
    sel = df.select("doc_id", payload_col)

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            doc_o, idx_o, fr_o = [], [], []
            for doc_id, p in zip(b["doc_id"], b[payload_col]):
                if p is None:
                    continue
                p = bytes(p)
                n_frames = min((len(p) + frame_bytes - 1) // frame_bytes,
                               max_frames * every_n)
                for j in range(0, n_frames, every_n):
                    doc_o.append(doc_id)
                    idx_o.append(j)
                    fr_o.append(p[j * frame_bytes : (j + 1) * frame_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(doc_o, dtype="int64"),
                    "frame_idx": pd.Series(idx_o, dtype="int32"),
                    "frame": fr_o,
                }
            )

    return sel.mapInPandas(go, schema=FRAME_SCHEMA)


def near_dup_by_features(
    feats: DataFrame, threshold: float = 0.95, n_bands: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup over decoded features: sign-random-
    projection LSH bucketing (cheap candidate generation, one shuffle)
    then exact cosine on candidates — the scale path for pairwise
    similarity that a cross join cannot survive.

    feats: (doc_id, features array<float>).
    Returns (doc_id_a, doc_id_b, cosine) with doc_id_a < doc_id_b.
    Pass ``dim`` when known to skip the dimension-probe job.
    """
    if dim is None:
        dim_row = feats.select(F.size("features").alias("d")).first()
        if dim_row is None:
            return feats.sparkSession.createDataFrame(
                [], "doc_id_a long, doc_id_b long, cosine double"
            )
        dim = dim_row["d"]
    rng = np.random.Generator(np.random.Philox(key=[7, dim]))
    planes = rng.normal(size=(n_bands, dim)).astype(np.float64)

    def sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            m = np.stack([np.asarray(v, dtype=np.float64) for v in b["features"]])
            bits = (m @ planes.T) > 0
            band = bits.astype(np.int64) @ (1 << np.arange(n_bands, dtype=np.int64))
            yield pd.DataFrame(
                {"doc_id": b["doc_id"], "band": band, "features": b["features"]}
            )

    sigs = feats.mapInPandas(
        sig, schema="doc_id long, band long, features array<float>"
    )
    from hunt_spark.operators.similarity import _dot, _norm

    a = sigs.alias("a")
    b = sigs.alias("b")
    # reuse similarity's helpers: elements cast to double BEFORE the
    # products (float32 rounding at a threshold boundary would disagree
    # with a float64 oracle) and the denominator nullif-guarded (an
    # all-zero features row must score 0, not throw DIVIDE_BY_ZERO
    # under ANSI mode)
    den = F.nullif(
        _norm(F.col("a.features")) * _norm(F.col("b.features")), F.lit(0.0)
    )
    cos = F.coalesce(
        _dot(F.col("a.features"), F.col("b.features")) / den, F.lit(0.0)
    )
    pairs = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
    return pairs.dropDuplicates(["doc_id_a", "doc_id_b"])
