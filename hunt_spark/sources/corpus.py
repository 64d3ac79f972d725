"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1).

Schema per BASELINE.json input_hint:
    (url string, warc_ts timestamp, html binary, text string, lang string)

Properties:
- fully deterministic per (seed, doc index) — independent of Spark
  partitioning, so the distributed generator and the pandas generator
  produce byte-identical rows (tested);
- ``text`` is exactly the whitespace-normalized text-node concatenation
  of ``html`` (the byte-identity extraction target, mirroring Hunt's
  getAllText/normalizeWS contract — Holumbus/Crawler/Html.hs:140-147);
- Zipfian vocabulary (V=5000, s=1.07), lognormal doc lengths
  (mu=ln 120, sigma=0.6, clamped [5, 2000]);
- planted documents 0..N with known token sequences for exact
  phrase/NEAR/FOLLOW assertions (mirrors Hunt's pinky/brain fixtures,
  hunt-searchengine/test/Hunt/TestHelper.hs:225-244).

Generation is distributed via ``spark.range(n).mapInPandas`` — scales
linearly with executors; no driver materialization.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42
VOCAB_SIZE = 5000
ZIPF_S = 1.07
LEN_MU = np.log(120.0)
LEN_SIGMA = 0.6
LEN_MIN, LEN_MAX = 5, 2000
EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

# Words the reference query set needs, placed at fixed Zipf ranks so
# small corpora still hit them with predictable frequencies.
_SPECIAL = [
    "the", "and", "of", "to", "a", "in", "new", "york", "city",
    "cat", "dog", "pinky", "brain", "stupid", "questions", "data",
    "text", "search", "index", "query",
]

_SYL = [
    "ba", "ce", "di", "fo", "gu", "ha", "je", "ki", "lo", "mu",
    "na", "pe", "ri", "so", "tu", "va", "we", "xi", "yo", "zu",
]

CORPUS_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

# Planted docs: (title, body). Doc i < len(PLANTED) uses these verbatim.
PLANTED: list[tuple[str, str]] = [
    ("pinky and the brain", "pinky and the brain take over the world tonight"),
    ("brain lab", "the Brain thinks while pinky asks stupid questions all day"),
    ("new york city", "new york city is a big city in the new world"),
    ("cats and dogs", "the cat chased the dog and the dog chased the cat"),
    ("brain food", "brain brain brain bravo brave bracket braid"),
    ("follow test", "pinky one two brain three four five brain"),
    ("near test", "brain one two three pinky"),
    ("york only", "york is a fine old town to visit in the north"),
]


def build_vocab() -> list[str]:
    """Deterministic vocabulary: specials at the head (most frequent
    Zipf ranks), then pseudo-words from syllable digits."""
    vocab = list(_SPECIAL)
    i = 0
    n_syl = len(_SYL)
    while len(vocab) < VOCAB_SIZE:
        w, k = "", i
        for _ in range(3):
            w += _SYL[k % n_syl]
            k //= n_syl
        vocab.append(w + str(i % 7))
        i += 1
    return vocab[:VOCAB_SIZE]


_VOCAB = build_vocab()
_ZIPF_W = 1.0 / np.power(np.arange(1, VOCAB_SIZE + 1, dtype=np.float64), ZIPF_S)
_ZIPF_CDF = np.cumsum(_ZIPF_W / _ZIPF_W.sum())


def _doc_tokens(i: int) -> tuple[str, str]:
    """(title, body) for doc index i — deterministic, partition-independent."""
    if i < len(PLANTED):
        return PLANTED[i]
    rng = np.random.Generator(np.random.Philox(key=[SEED, int(i)]))
    length = int(np.clip(np.exp(rng.normal(LEN_MU, LEN_SIGMA)), LEN_MIN, LEN_MAX))
    title_len = int(rng.integers(2, 6))
    draws = rng.random(length + title_len)
    idx = np.searchsorted(_ZIPF_CDF, draws, side="left")
    words = [_VOCAB[j] for j in idx]
    return " ".join(words[:title_len]), " ".join(words[title_len:])


def _rows_for_ids(ids: np.ndarray) -> pd.DataFrame:
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for i in ids:
        i = int(i)
        lang = "de" if i % 10 == 7 else "en"
        title, body = _doc_tokens(i)
        html = (
            f"<html><head><title>{title}</title></head>"
            f"<body><p>{body}</p></body></html>"
        )
        urls.append(f"https://example.org/{lang}/doc{i:08d}")
        tss.append(EPOCH + dt.timedelta(seconds=i))
        htmls.append(html.encode("utf-8"))
        texts.append(f"{title} {body}")
        langs.append(lang)
    return pd.DataFrame(
        {"url": urls, "warc_ts": tss, "html": htmls, "text": texts, "lang": langs}
    )


def corpus_pandas(n: int, offset: int = 0) -> pd.DataFrame:
    """Driver-side generator (tests / oracle); identical rows to corpus_df."""
    return _rows_for_ids(np.arange(offset, offset + n))


def corpus_df(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Distributed generator: spark.range -> mapInPandas (Arrow-batched)."""
    partitions = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _rows_for_ids(b["id"].to_numpy())

    rng_df = spark.range(0, n, 1, partitions)
    df = rng_df.mapInPandas(gen, schema=CORPUS_SCHEMA)
    return df.withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
