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


def test_url_dedup_keeps_best_quality_then_min_key(spark):
    rows = [
        # three spellings of ONE canonical url, varying quality
        (1, "http://www.a.com/p", 10),
        (2, "HTTP://A.com/p/", 30),
        (3, "http://a.com/p#frag", 30),  # quality tie with 2 -> min key
        # a singleton
        (9, "https://b.org/x", 5),
    ]
    got = {
        r["canon_url"]: (r["n_docs"], r["keep_doc_id"])
        for r in urlops.url_dedup(
            spark.createDataFrame(rows, "doc_id long, url string, q int"),
            quality_col="q",
        ).collect()
    }
    assert got == {"http://a.com/p": (3, 2), "https://b.org/x": (1, 9)}


def test_url_dedup_no_quality_keeps_min_key(spark):
    rows = [(5, "http://a.com/p"), (2, "http://www.a.com/p")]
    got = urlops.url_dedup(
        spark.createDataFrame(rows, "doc_id long, url string")
    ).collect()
    assert len(got) == 1 and got[0]["keep_doc_id"] == 2


def test_url_dedup_negative_long_key_safe(spark):
    # xxhash64 doc ids can be LONG_MIN: the ~key tie-break must not
    # overflow where unary minus would
    lmin = -(2**63)
    rows = [(lmin, "http://a.com/p"), (7, "http://a.com/p")]
    got = urlops.url_dedup(
        spark.createDataFrame(rows, "doc_id long, url string")
    ).collect()
    assert got[0]["keep_doc_id"] == lmin


def test_url_filter_blocklist_and_score(spark):
    rows = [
        (1, "http://good.com/page"),
        (2, "http://Blocked.com/page"),  # host blocked (case-folded)
        (3, "http://good.com/casino-page"),  # score 1
        (4, "http://good.com/casino-poker"),  # score 2 > max_score
    ]
    kept = urlops.url_filter(
        spark.createDataFrame(rows, "doc_id long, url string"),
        blocked_hosts=["blocked.com"],
        banned_patterns=["casino", "poker"],
        max_score=1,
    ).collect()
    got = {r["doc_id"]: (r["host"], r["url_score"]) for r in kept}
    assert got == {1: ("good.com", 0), 3: ("good.com", 1)}


def test_url_filter_empty_config_keeps_all(spark):
    rows = [(1, "http://a.com/x"), (2, "http://b.com/y")]
    kept = urlops.url_filter(
        spark.createDataFrame(rows, "doc_id long, url string")
    ).collect()
    assert sorted(r["doc_id"] for r in kept) == [1, 2]


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
