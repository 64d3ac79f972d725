"""Pins for URL canonicalization and the deterministic per-domain cap.
Gate parity vs DuckDB is covered by __spark_entry__
(web_url_canonical / web_domain_cap); these pin each canonical rule on
crafted URLs and the cap's determinism / layout-independence / exact
top-k-per-host semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from hunt_spark.operators import urlops
from hunt_spark.operators.textops import _key_hash


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["c"]
        for r in df.select(
            urlops.canonicalize_url(F.col("url")).alias("c")
        ).collect()
    ]


def test_canonical_rules(spark):
    got = _canon(
        spark,
        [
            "HTTP://WWW.Example.COM:80/Docs/A?q=1#frag",
            "https://Example.com:443/",
            "https://example.com/a/b/",
            "http://example.com/p?utm_source=x&utm_medium=y&q=2",
            "http://example.com/p?utm_source=x",
            "http://example.com/p?a=1&utm_c=2&b=3",
            "http://example.com:8080/keep-port",
            "http://example.com/CaseSensitivePath",
        ],
    )
    assert got == [
        "http://example.com/Docs/A?q=1",
        "https://example.com",
        "https://example.com/a/b",
        # adjacent tracking params both removed (the regex-replace trap)
        "http://example.com/p?q=2",
        "http://example.com/p",
        "http://example.com/p?a=1&b=3",
        "http://example.com:8080/keep-port",
        "http://example.com/CaseSensitivePath",
    ]


def test_host_of(spark):
    df = spark.createDataFrame(
        [("HTTPS://WWW.Sub.Host.ORG:443/x?y#z",)], "url string"
    )
    assert (
        df.select(urlops.host_of(F.col("url")).alias("h")).collect()[0]["h"]
        == "sub.host.org"
    )


def _docs(spark, n_hosts, per_host):
    rows = [
        (h * per_host + i, f"http://host{h}.example.com/p/{i}")
        for h in range(n_hosts)
        for i in range(per_host)
    ]
    return spark.createDataFrame(rows, "doc_id long, url string")


def test_domain_cap_exact_and_deterministic(spark):
    docs = _docs(spark, 3, 12)
    cap = 5
    kept = urlops.domain_cap(docs, cap).collect()
    by_host: dict[str, list[int]] = {}
    for r in kept:
        by_host.setdefault(r["host"], []).append(r["doc_id"])
    assert all(len(v) == cap for v in by_host.values())
    # the kept set is EXACTLY the cap smallest (hash, doc_id) per host
    hashes = {
        r["doc_id"]: r["h"]
        for r in docs.select("doc_id", _key_hash("doc_id").alias("h")).collect()
    }
    for host, ids in by_host.items():
        hnum = int(host.removeprefix("host").split(".")[0])
        all_ids = list(range(hnum * 12, hnum * 12 + 12))
        want = sorted(all_ids, key=lambda d: (hashes[d], d))[:cap]
        assert sorted(ids) == sorted(want)


def test_domain_cap_under_cap_hosts_untouched(spark):
    docs = _docs(spark, 4, 3)
    kept = urlops.domain_cap(docs, 10).collect()
    assert len(kept) == 12  # nothing dropped


def test_domain_cap_layout_independent(spark):
    docs = _docs(spark, 5, 9)
    a = sorted(
        (r["doc_id"], r["host"])
        for r in urlops.domain_cap(docs.coalesce(1), 4).collect()
    )
    b = sorted(
        (r["doc_id"], r["host"])
        for r in urlops.domain_cap(docs.repartition(16), 4).collect()
    )
    assert a == b and len(a) == 20
