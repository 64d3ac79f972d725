"""End-to-end Common-Crawl-shaped workflow: WARC shards -> HTML text
extraction -> URL filter -> URL-level dedup -> per-domain cap ->
curation chain -> index build -> BM25 query. Every stage is a gated
operator; this pins that they COMPOSE — the workflow a user of the
reference platform would actually run over a web crawl."""

from __future__ import annotations

import datetime as dt
import tempfile

from pyspark.sql import functions as F

from hunt_spark.engine import HuntEngine
from hunt_spark.operators import textops, urlops
from hunt_spark.operators.build import BuildConfig
from hunt_spark.sources import warc


def _make_crawl(tmp_path, n=120):
    """Two WARC shards: n pages over 6 hosts, every 4th page a messy
    re-spelling of page i-1's URL (recrawl dup), hosts h5 full of
    casino spam, one planted phrase page."""
    recs = []
    for i in range(n):
        host = f"h{i % 6}.example.com"
        if i % 4 == 3:  # recrawl of i-1 under a messy spelling
            tgt = i - 1
            uri = f"HTTP://WWW.h{tgt % 6}.example.com:80/p/{tgt // 4}#frag"
            body = f"<html><p>recrawl body {tgt} shorter</p></html>"
        else:
            uri = f"http://{host}/p/{i // 4}"
            words = " ".join(f"w{(i * 7 + k) % 40}" for k in range(40))
            body = f"<html><p>page {i} {words}</p></html>"
        if i == 17:  # planted page on its own host: survives filter+cap
            uri = "http://planted.example.com/only"
            tail = " ".join(f"t{k}" for k in range(40))  # non-repetitive:
            # a repeated filler word would (correctly) trip the
            # curation chain's repetition ceiling
            body = f"<html><p>pinky and the brain {tail}</p></html>"
        if "h5.example.com" in uri.lower():
            uri += "?casino=1"
        recs.append(
            {
                "type": "response",
                "uri": uri,
                "date": dt.datetime(2023, 5, 1),
                "record_id": f"<urn:uuid:{i}>",
                "http_status": 200,
                "content_type": "text/html",
                "body": body.encode(),
            }
        )
    half = len(recs) // 2
    (tmp_path / "a.warc.gz").write_bytes(warc.write_warc_bytes(recs[:half]))
    (tmp_path / "b.warc.gz").write_bytes(warc.write_warc_bytes(recs[half:]))


def test_warc_to_query_full_pipeline(spark, tmp_path):
    _make_crawl(tmp_path)

    pages = (
        warc.warc_df(spark, str(tmp_path))
        .filter(F.col("http_status") == 200)
        .select(
            F.col("target_uri").alias("url"),
            F.col("payload").cast("string").alias("html"),
        )
        # id of the RECORD (raw spelling), not the canonical URL —
        # recrawls must stay distinct rows for url_dedup to collapse
        .withColumn("doc_id", F.xxhash64("url"))
        .withColumn(
            "text", F.regexp_extract(F.col("html"), r"<p>(.*?)</p>", 1)
        )
        .withColumn("n_chars", F.length("text"))
    )
    assert pages.count() == 120

    # URL filtering drops the casino host's pages
    ok = urlops.url_filter(
        pages, banned_patterns=["casino"], max_score=0, key_col="doc_id"
    )
    filtered = pages.join(ok.select("doc_id"), "doc_id", "left_semi")
    n_filtered = filtered.count()
    assert n_filtered < 120 and n_filtered >= 90

    # URL-level dedup: recrawls (messy spellings of the same canonical
    # URL) collapse to the best (longest) body
    keep = urlops.url_dedup(filtered, quality_col="n_chars", key_col="doc_id")
    deduped = filtered.join(
        keep.select(F.col("keep_doc_id").alias("doc_id")), "doc_id", "left_semi"
    )
    n_dedup = deduped.count()
    assert n_dedup < n_filtered  # recrawls existed and were collapsed
    # no canonical URL appears twice afterwards
    assert (
        deduped.select(urlops.canonicalize_url(F.col("url")).alias("c"))
        .groupBy("c")
        .count()
        .filter(F.col("count") > 1)
        .count()
        == 0
    )

    # per-domain cap bounds every host's contribution
    capped_ids = urlops.domain_cap(deduped, cap=8, key_col="doc_id")
    capped = deduped.join(capped_ids.select("doc_id"), "doc_id", "left_semi")
    per_host = (
        capped.groupBy(urlops.host_of(F.col("url")).alias("h"))
        .count()
        .collect()
    )
    assert per_host and all(r["count"] <= 8 for r in per_host)

    # curation keeps the real pages (40-word bodies pass the 30-token
    # floor; planted page has a long tail) and emits the release frame
    curated = textops.curate(
        capped.withColumn("lang", F.lit("en")), min_tokens=10
    )
    kept_ids = {r["doc_id"] for r in curated.collect()}
    assert kept_ids

    # index the kept corpus and hit the planted phrase
    final = capped.join(
        spark.createDataFrame([(i,) for i in kept_ids], "doc_id long"),
        "doc_id",
        "left_semi",
    )
    eng = HuntEngine(
        spark, tempfile.mkdtemp(), BuildConfig(n_shards=2, block_size=64)
    )
    eng.build(final, {"body": F.col("text")}, build_id="web")
    top = eng.search('"pinky and the brain"', k=3).collect()
    planted = final.filter(F.col("text").contains("pinky")).collect()
    assert planted and top and top[0]["doc_id"] == planted[0]["doc_id"]

    # the library-level composition emits the same release set as the
    # hand-composed chain above
    composed = urlops.web_curate(
        pages.withColumn("lang", F.lit("en")),
        banned_patterns=["casino"],
        max_url_score=0,
        domain_cap_n=8,
        quality_col="n_chars",
        min_tokens=10,
    )
    assert {r["doc_id"] for r in composed.collect()} == kept_ids


def test_web_curate_optional_clean_and_dup_budget(spark):
    """clean=True normalizes before hashing (the two unicode spellings
    of one page become exact duplicates and collapse), and
    max_dup_frac_x1e4 drops boilerplate-dominated docs — judged on the
    exact-dedup canonicals so mutual copies don't self-condemn."""
    boiler = " ".join(f"bp{k}" for k in range(12))
    body = " ".join(f"w{k}" for k in range(20))  # no intra-doc repeats
    rows = [
        # same content, decomposed vs composed e-acute + extra spaces:
        # only clean_text makes these exact-dedup into one
        (1, "http://a.com/1", f"cafe\u0301 one {body}"),
        (2, "http://a.com/2", f"caf\u00e9  one {body}"),
        # boilerplate-dominated docs: 12 of 14 tokens duplicated
        # cross-doc (NOT exact dups of each other)
        (3, "http://a.com/3", f"u1 u2 {boiler}"),
        (4, "http://a.com/4", f"v1 v2 {boiler}"),
        # a normal doc
        (5, "http://a.com/5", " ".join(f"n{k}" for k in range(25))),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, url string, text string"
    ).withColumn("lang", F.lit("en")).withColumn("n_chars", F.length("text"))
    out = urlops.web_curate(
        docs,
        quality_col="n_chars",
        clean=True,
        max_dup_frac_x1e4=5000,
        dup_k=6,
        min_tokens=3,
    )
    kept = {r["doc_id"] for r in out.collect()}
    # docs 1+2 collapse to ONE canonical (exact dedup after clean; the
    # budget judges the deduped corpus, so the mutual copy does not
    # count against its canonical); 3,4 dropped by the budget
    # (12/14 duplicated > 50%); 5 kept
    assert 5 in kept
    assert len(kept & {1, 2}) == 1
    assert not kept & {3, 4}
