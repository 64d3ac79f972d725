"""Web-corpus URL operators: canonicalization and per-domain capping.

A Common-Crawl-style pipeline sees the same page under many spellings
(scheme/host case, default ports, `www.`, tracking params, fragments,
trailing slashes) and sees a few giant hosts contribute an outsized
share of documents. Canonicalization collapses the spellings so
URL-level dedup and host statistics work; the domain cap bounds any
single host's contribution to the training mixture (the FineWeb /
RefinedWeb "limit documents per domain" rule) deterministically, so
reruns and resumes keep the identical subset.

Everything here is built-in Catalyst expressions except the domain
cap's per-partition top-k pre-prune, which is an Arrow-batched
mapInPandas combiner (see domain_cap for why a plain window doesn't
survive a hot host at scale).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hunt_spark.operators.textops import _key_hash

# scheme://authority prefix (RFC 3986 scheme chars), used to split the
# case-insensitive part of a URL from the case-sensitive path/query
_AUTHORITY_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"


def canonicalize_url(url: Column) -> Column:
    """One canonical spelling per resource. Rules, in order:

    1. drop the fragment (`#...` — client-side only, never sent);
    2. lowercase the scheme and authority (case-insensitive per RFC
       3986 §3.1/§3.2.2) — the path/query keep their case;
    3. drop default ports (`:80` for http, `:443` for https);
    4. drop a leading `www.`;
    5. drop `utm_*` tracking parameters, preserving the order of the
       survivors (parameter order is NOT normalized — it can be
       semantically significant, so sorting would over-merge);
    6. drop a trailing slash from the path.

    All six are single-pass Catalyst expressions (regex + array ops,
    no lookaround — RE2-safe so the DuckDB oracle can mirror them
    exactly). The utm filter splits the query on `&` and rebuilds it,
    because a global regex replace cannot handle adjacent tracking
    params (the scan resumes after each replacement and misses the
    next one)."""
    u = F.regexp_replace(url, "#.*", "")
    auth = F.regexp_extract(u, f"({_AUTHORITY_RE[1:]})", 1)
    rest = F.regexp_replace(u, _AUTHORITY_RE, "")
    u = F.concat(F.lower(auth), rest)
    u = F.regexp_replace(u, r"^(http://[^/?#:]+):80([/?#].*)?$", "$1$2")
    u = F.regexp_replace(u, r"^(https://[^/?#:]+):443([/?#].*)?$", "$1$2")
    u = F.regexp_replace(u, r"^(https?://)www\.", "$1")
    base = F.regexp_replace(F.regexp_replace(u, r"\?.*", ""), "/$", "")
    qs = F.regexp_extract(u, r"\?(.*)$", 1)
    params = F.filter(
        F.split(qs, "&"),
        lambda p: (~p.startswith("utm_")) & (p != ""),
    )
    return F.concat(
        base,
        F.when(
            F.size(params) > 0,
            F.concat(F.lit("?"), F.array_join(params, "&")),
        ).otherwise(F.lit("")),
    )


def host_of(url: Column) -> Column:
    """Lowercased host of the canonical URL (port and `www.` already
    stripped by canonicalization)."""
    return F.regexp_extract(
        canonicalize_url(url), r"^[a-z][a-z0-9+.-]*://([^/?#:]+)", 1
    )


def url_dedup(
    docs: DataFrame,
    url_col: str = "url",
    key_col: str = "doc_id",
    quality_col: str | None = None,
) -> DataFrame:
    """One document per canonical URL. A Common-Crawl-style corpus
    carries the same page many times (recrawls, spelling variants);
    this keeps, per canonical URL, the highest-``quality_col`` row
    (ties and the no-quality case → smallest ``key_col``). Returns
    (canon_url, n_docs, keep_doc_id).

    Single shuffle on canon_url with map-side partial aggregation — a
    lexicographic struct max, not a window over the raw corpus. The
    descending key tie-break rides in the same max as ``~key``
    (bitwise NOT is order-reversing on the full long range — unary
    minus overflows at LONG_MIN under ANSI mode)."""
    base = docs.select(
        canonicalize_url(F.col(url_col)).alias("canon_url"),
        F.col(key_col).cast("long").alias("k"),
        (
            F.col(quality_col).cast("double") if quality_col else F.lit(0.0)
        ).alias("q"),
    )
    best = base.groupBy("canon_url").agg(
        F.count("*").alias("n_docs"),
        F.max(F.struct(F.col("q"), F.bitwise_not(F.col("k")).alias("nk"))).alias(
            "b"
        ),
    )
    return best.select(
        "canon_url", "n_docs", F.bitwise_not(F.col("b.nk")).alias("keep_doc_id")
    )


def url_filter(
    docs: DataFrame,
    blocked_hosts: Sequence[str] = (),
    banned_patterns: Sequence[str] = (),
    max_score: int = 0,
    url_col: str = "url",
    key_col: str = "doc_id",
) -> DataFrame:
    """RefinedWeb-style URL filtering: drop documents whose canonical
    host is on the blocklist, and score the lowercased canonical URL
    against banned patterns (1 per matching pattern), keeping rows with
    ``url_score <= max_score``. Returns (doc_id, host, url_score) of
    the kept rows.

    The blocklist joins as a broadcast LEFT ANTI on host — list-sized,
    never a shuffle of the corpus (real blocklists run to ~10^6 hosts:
    fine to broadcast, fatal to `isin`-inline into the plan). The
    pattern score is a sum of `rlike` flags, one JVM regex pass each —
    keep patterns RE2-compatible (no lookaround) so an oracle can
    mirror them."""
    u = F.lower(canonicalize_url(F.col(url_col)))
    score = F.lit(0)
    for p in banned_patterns:
        score = score + F.when(u.rlike(p), 1).otherwise(0)
    base = docs.select(
        F.col(key_col).cast("long").alias("doc_id"),
        host_of(F.col(url_col)).alias("host"),
        score.cast("int").alias("url_score"),
    )
    if blocked_hosts:
        blk = docs.sparkSession.createDataFrame(
            [(h,) for h in blocked_hosts], "host string"
        )
        base = base.join(F.broadcast(blk), "host", "left_anti")
    return base.filter(F.col("url_score") <= max_score).select(
        "doc_id", "host", "url_score"
    )


def web_curate(
    docs: DataFrame,
    blocked_hosts: Sequence[str] = (),
    banned_patterns: Sequence[str] = (),
    max_url_score: int = 0,
    domain_cap_n: int | None = None,
    url_col: str = "url",
    key_col: str = "doc_id",
    quality_col: str | None = None,
    clean: bool = False,
    max_dup_frac_x1e4: int | None = None,
    dup_k: int = 50,
    **curate_kwargs,
) -> DataFrame:
    """The whole web-corpus curation front-end as ONE composed plan:
    optional ``clean_text`` normalization → URL filter (blocklist +
    banned patterns) → URL-level keep-best dedup → optional per-domain
    cap → optional duplicated-substring budget filter
    (``dup_span_stats``: drop docs whose corpus-duplicated-token
    fraction exceeds ``max_dup_frac_x1e4``) → the text curation chain
    (``textops.curate``: quality floor → repetition ceiling → langid
    drop → exact-dedup canonical keep → stratified sample). Returns
    curate()'s release frame (doc_id, strata, n_tokens).

    Each URL stage reduces to a doc_id keep-set joined LEFT SEMI onto
    the corpus, so nothing document-sized is carried through the
    URL stages and Catalyst is free to reorder the semi-joins; the
    text stages then run only on URL-surviving rows. This is the
    composition tests/test_web_pipeline.py drives end-to-end from a
    WARC crawl through to a BM25 query."""
    from hunt_spark.operators.textops import clean_text, dup_span_stats

    kept = docs
    if clean:
        if key_col != "doc_id":
            raise ValueError("clean=True requires key_col='doc_id'")
        cleaned = clean_text(kept).withColumnRenamed("text_clean", "text")
        kept = kept.drop("text").join(cleaned, "doc_id")
    if blocked_hosts or banned_patterns:
        ok = url_filter(
            kept, blocked_hosts, banned_patterns, max_url_score,
            url_col=url_col, key_col=key_col,
        )
        kept = kept.join(
            ok.select(F.col("doc_id").alias(key_col)), key_col, "left_semi"
        )
    keep = url_dedup(
        kept, url_col=url_col, key_col=key_col, quality_col=quality_col
    )
    kept = kept.join(
        keep.select(F.col("keep_doc_id").alias(key_col)), key_col, "left_semi"
    )
    if domain_cap_n is not None:
        capped = domain_cap(kept, domain_cap_n, url_col=url_col, key_col=key_col)
        kept = kept.join(
            capped.select(F.col("doc_id").alias(key_col)), key_col, "left_semi"
        )
    from hunt_spark.operators.textops import curate

    if key_col != "doc_id":  # curate()/dup_span_stats key on doc_id
        kept = kept.withColumnRenamed(key_col, "doc_id")
    if max_dup_frac_x1e4 is not None:
        # budget runs on exact-dedup CANONICALS: mutual exact
        # duplicates are 100% substring-duplicated by construction and
        # would all die here, when the policy is collapse-then-budget;
        # non-canonical copies drop out with their canonical's verdict
        # (curate's own exact-dedup stage would drop them anyway)
        from hunt_spark.operators.textops import dedup_exact

        canon = dedup_exact(kept).select(
            F.col("keep_doc_id").alias("doc_id")
        )
        canon_docs = kept.join(canon, "doc_id", "left_semi")
        ok_budget = dup_span_stats(canon_docs, k=dup_k).filter(
            F.col("dup_frac_x1e4") <= max_dup_frac_x1e4
        )
        kept = kept.join(ok_budget.select("doc_id"), "doc_id", "left_semi")
    return curate(kept, **curate_kwargs)


def domain_cap(
    docs: DataFrame,
    cap: int,
    url_col: str = "url",
    key_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``cap`` documents per host, chosen deterministically
    as the ``cap`` smallest ``(key_hash, key)`` pairs — a pure function
    of the row, so the kept subset is identical under rerun, resume and
    any partition layout (the same property sample_stratified relies
    on). Returns (doc_id, host) of the kept rows.

    Scale: per-group top-k, NOT a window over the raw corpus — a plain
    ``row_number() over (partition by host)`` shuffles every row of a
    hot host (a 10^8-page domain at CC scale) to one task and sorts it
    there: the classic straggler. Instead, a map-side combiner
    (mapInPandas, Arrow batches) keeps each PARTITION's cap-smallest
    rows per host — bounded memory, never more rows held than seen —
    which is a superset of every host's global top-cap (any global
    winner is its partition's local winner too). Only the pruned
    stream, <= cap x n_partitions rows per host, flows into the exact
    final window. Hosts with <= cap rows pass the prune untouched, so
    no separate under-cap fast path is needed."""
    base = docs.select(
        F.col(key_col).cast("long").alias("doc_id"),
        host_of(F.col(url_col)).alias("host"),
        _key_hash(key_col).alias("h"),
    )

    def prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # accumulate batches and compact with ONE vectorized
        # sort + groupby-head pass whenever the buffer exceeds the
        # compaction threshold (and once at the end) — the former
        # per-batch per-host python loop paid a pandas sort per (host,
        # batch). The buffer is bounded by construction: after each
        # compaction it holds <= cap rows per distinct host seen, and
        # between compactions at most `limit` + one batch of rows.
        limit = max(64 * 1024, 8 * cap)
        acc: list[pd.DataFrame] = []
        held = 0

        def compact() -> pd.DataFrame:
            merged = pd.concat(acc, ignore_index=True) if len(acc) > 1 else acc[0]
            return (
                merged.sort_values(["h", "doc_id"], kind="stable")
                .groupby("host", sort=False)
                .head(cap)
            )

        for pdf in batches:
            if len(pdf) == 0:
                continue
            acc.append(pdf)
            held += len(pdf)
            if held > limit:
                kept = compact()
                acc, held = [kept], len(kept)
        if acc:
            yield compact()

    pruned = base.mapInPandas(prune, schema="doc_id long, host string, h long")
    w = Window.partitionBy("host").orderBy("h", "doc_id")
    return (
        pruned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= cap)
        .select("doc_id", "host")
    )
