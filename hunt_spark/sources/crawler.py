"""Distributed BFS web crawler — the hunt-crawler counterpart (S3).

The reference's crawler (hunt-crawler/src/Holumbus/Crawler/Core.hs) is
a single-process loop over an in-memory state: a leveled to-be-processed
URI set, an already-processed set, a per-host robots.txt cache and a
result accumulator. Each iteration takes the next ``maxParDocs`` URIs
(capped by the remaining ``maxNoOfDocs`` budget, Core.hs:157-172), marks
them processed *before* the robots check (Core.hs:172-173), drops the
robots-disallowed ones (Core.hs:173, Robots.hs:58-74), fetches and
processes the rest in parallel (mapFold), collects each page's hrefs
(Html.hs:51-63: a/frame/iframe href+src, made absolute against the doc
base, fragments stripped), filters them through the configured
follow-ref predicate (Util.hs:25-46 allow/deny regex lists), assigns
level+1 and unions them into the frontier with MIN-level semantics
(Core.hs:73-77), skipping anything already processed. Redirected
documents mark BOTH the request URI and the real (Location) URI as
processed (Core.hs:215-231, getRealDocURI). State checkpoints every
``saveIntervall`` documents and a crawl is resumable from the last
checkpoint (Core.hs:123-151).

This module re-expresses that loop Spark-first: the frontier, the seen
set and the accumulated documents are DataFrames; one BFS *round* is a
handful of narrow DataFrame ops plus one distributed fetch stage
(``mapInPandas`` over the batch, partitioned BY HOST so requests to one
host run sequentially inside a task — per-host politeness — while
distinct hosts fetch in parallel). Per-round state is
``localCheckpoint``-ed so lineage stays bounded over arbitrarily many
rounds, and checkpoint/resume rides the same snapshot catalog the index
build uses (sources/catalog.py) — the crawler's save/resume contract
(Core.hs:45-55,123-151) becomes committed ``crawl_*`` tables.

Scale shape: the frontier/seen/docs tables are never collected to the
driver; per round the driver holds only scalar counts and the per-host
robots rule cache (hosts << URIs — the reference keeps the same map in
its state, Robots.hs:35-45). The fetch batch is bounded by
``batch_docs`` (the maxParDocs analog), so each round's shuffle is
batch-sized regardless of corpus size; the seen-set anti-join is the
only frontier-sized operation and it is an equality join on ``url``.

The sandbox has no network, so the fetcher is injected: any callable
``url -> (final_url, status, html_bytes)``. ``synthetic_site(...)``
builds a deterministic in-process site (pages, links, robots.txt,
redirects) used by tests and the ``crawl_frontier`` driver gate; a real
deployment passes an HTTP fetcher with the same signature.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser
from typing import Callable, Iterator
from urllib.parse import urljoin, urlsplit

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

Fetcher = Callable[[str], tuple[str, int, bytes | None]]

# ---------------------------------------------------------------------------
# robots.txt — parser + matcher mirroring Robots.hs


def parse_robots_txt(agent: str, text: str) -> list[tuple[str, bool]]:
    """robots.txt -> ordered [(path_prefix, allow)] for ``agent``.

    Mirrors evalRobotsTxt (Robots.hs:147-191): strip comments and
    blanks, keep only known directives, drop everything before the
    first ``User-agent`` line matching ``*`` or a prefix of ``agent``,
    then collect the Allow/Disallow lines of that one section (stopping
    at the next User-agent). Other directives are ignored like the
    reference (Robots.hs:189).
    """
    kept: list[tuple[str, str]] = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        if key in (
            "disallow", "allow", "user-agent", "crawl-delay",
            "request-rate", "visit-time", "sitemap",
        ):
            kept.append((key, val.strip()))
    i = 0
    while i < len(kept) and not (
        kept[i][0] == "user-agent"
        and (kept[i][1] == "*" or agent.startswith(kept[i][1]))
    ):
        i += 1
    rules: list[tuple[str, bool]] = []
    for key, val in kept[i + 1:]:
        if key == "user-agent":
            break
        if key == "disallow":
            rules.append((val, False))
        elif key == "allow":
            rules.append((val, True))
    return rules


def robots_disallow(rules: list[tuple[str, bool]], path: str) -> bool:
    """First rule whose non-empty prefix matches the path decides
    (Robots.hs:58-74 — the foldr evaluates the leftmost match first);
    no match => allowed."""
    for prefix, allow in rules:
        if prefix and path.startswith(prefix):
            return not allow
    return False


# ---------------------------------------------------------------------------
# href extraction — Html.hs getHtmlReferences


class _HrefCollector(HTMLParser):
    """Collect a/frame/iframe href+src values (Html.hs:51-63)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.refs: list[str] = []

    def handle_starttag(self, tag, attrs):  # noqa: D102
        if tag in ("a", "frame", "iframe"):
            for k, v in attrs:
                if k in ("href", "src") and v:
                    self.refs.append(v)


def extract_refs(html: bytes | str | None, base: str) -> list[str]:
    """Absolute, fragment-stripped refs of one page (toAbsRef,
    Html.hs:69-80: expand against the doc base, drop the #fragment)."""
    if html is None:
        return []
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    p = _HrefCollector()
    try:
        p.feed(html)
        p.close()
    except Exception:  # noqa: BLE001 — a broken page yields no refs
        return []
    out = []
    for ref in p.refs:
        try:
            absu = urljoin(base, ref).split("#", 1)[0]
        except ValueError:
            continue
        if absu:
            out.append(absu)
    return out


# ---------------------------------------------------------------------------
# config


@dataclass
class CrawlConfig:
    """The CrawlerConfig subset this engine supports (Types.hs:58-84)."""

    seeds: list[str]
    fetcher: Fetcher
    # simpleFollowRef' allow/deny regex lists (Util.hs:25-46); like the
    # reference's =~ the match is unanchored; empty allow-list follows
    # nothing (defaultCrawlerConfig: cc_followRef = const False,
    # Types.hs:249)
    follow_allow: list[str] = field(default_factory=list)
    follow_deny: list[str] = field(default_factory=list)
    max_docs: int = 1_000_000  # theMaxNoOfDocs
    max_depth: int = 2**31 - 1  # theClickLevel
    batch_docs: int = 4096  # theMaxParDocs — URIs taken per round
    save_interval: int = 0  # theSaveIntervall, in docs; 0 = no checkpoints
    robots_enabled: bool = True  # enableRobotsTxt
    agent: str = "hunt-spark"
    # beyond-reference politeness: cap URIs taken from one host per
    # round (the rest stay in the frontier); None = no cap
    per_host_cap: int | None = None

    def follow_ref_col(self, url):
        """The follow-ref predicate as a JVM-side Column (no UDF)."""
        if not self.follow_allow:
            return F.lit(False)
        allowed = F.lit(False)
        for pat in self.follow_allow:
            allowed = allowed | url.rlike(pat)
        for pat in self.follow_deny:
            allowed = allowed & ~url.rlike(pat)
        return allowed


def _host_of(url: str) -> str:
    try:
        return urlsplit(url).netloc
    except ValueError:
        return ""


def _is_robots_scheme(url: str) -> bool:
    # robots.txt applies to http(s) only (Robots.hs:37,62 isRobotsScheme)
    return urlsplit(url).scheme in ("http", "https")


FETCH_SCHEMA = (
    "url string, level int, final_url string, status int, html binary"
)


class Crawler:
    """Driver object holding the per-host robots cache (the analog of
    CrawlerState's theRobots map) and the crawl loop."""

    def __init__(self, spark: SparkSession, cfg: CrawlConfig):
        self.spark = spark
        self.cfg = cfg
        self._robots: dict[str, list[tuple[str, bool]]] = {}

    # -- robots ------------------------------------------------------
    def _robots_rules(self, host: str, scheme: str = "http") -> list[tuple[str, bool]]:
        # host is an authority (host[:port]); cache case-insensitively
        key = host.lower()
        if key not in self._robots:
            # load-on-first-contact like robotsAddHost (Robots.hs:35-45)
            rules: list[tuple[str, bool]] = []
            try:
                _u, status, body = self.cfg.fetcher(f"{scheme}://{host}/robots.txt")
                if status == 200 and body is not None:
                    if isinstance(body, (bytes, bytearray)):
                        body = body.decode("utf-8", errors="replace")
                    rules = parse_robots_txt(self.cfg.agent, body)
            except Exception:  # noqa: BLE001 — unreachable robots = allow
                rules = []
            self._robots[key] = rules
        return self._robots[key]

    def _robots_filter(self, taken: DataFrame) -> DataFrame:
        """Drop robots-disallowed URIs from the round's batch. The batch
        is bounded by batch_docs, so collecting its distinct hosts is a
        bounded driver action; the per-URI check itself runs as a
        broadcast-rules pandas UDF over the batch."""
        if not self.cfg.robots_enabled:
            return taken
        # key rules by LOWERCASED AUTHORITY (host[:port]) and fetch
        # robots.txt on the page's own scheme+authority: the old code
        # keyed by parse_url HOST (no port) but looked up by
        # urlsplit().netloc (with port), so robots.txt was silently
        # un-enforced for any URL with an explicit port or uppercase
        # host — and always fetched over plain http, which https-only
        # sites refuse. Per RFC 9309 rules bind to scheme+authority.
        auths = {
            r["a"].lower(): (r["s"] or "http", r["a"])
            for r in taken.select(
                F.expr("parse_url(url, 'AUTHORITY')").alias("a"),
                F.expr("parse_url(url, 'PROTOCOL')").alias("s"),
            ).distinct().collect()
            if r["a"]
        }
        rules = {
            key: self._robots_rules(auth, scheme=scheme)
            for key, (scheme, auth) in auths.items()
        }
        bc = self.spark.sparkContext.broadcast(rules)

        @F.pandas_udf("boolean")
        def allowed(urls: pd.Series) -> pd.Series:
            rmap = bc.value

            def ok(u: str) -> bool:
                if not _is_robots_scheme(u):
                    return True
                parts = urlsplit(u)
                return not robots_disallow(
                    rmap.get(parts.netloc.lower(), []), parts.path or ""
                )

            return urls.map(ok)

        return taken.where(allowed(F.col("url")))

    # -- fetch + parse -----------------------------------------------
    def _fetch(self, batch: DataFrame) -> DataFrame:
        """Distributed fetch of one round's batch: partition BY HOST so
        one task owns a host's requests (sequential per host = polite;
        hosts fetch in parallel), then apply the injected fetcher per
        row inside Arrow batches. Fetch failures become status=-1 rows
        (the reference's withDefault: an erroring page contributes no
        refs and no doc result, Core.hs:319-353)."""
        fetcher = self.cfg.fetcher
        n_parts = max(1, self.spark.sparkContext.defaultParallelism)

        def fetch_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                finals, statuses, htmls = [], [], []
                for u in pdf["url"]:
                    try:
                        fu, st, body = fetcher(u)
                    except Exception:  # noqa: BLE001
                        fu, st, body = u, -1, None
                    finals.append(fu)
                    statuses.append(st)
                    htmls.append(bytes(body) if body is not None else None)
                yield pd.DataFrame({
                    "url": pdf["url"], "level": pdf["level"],
                    "final_url": finals, "status": statuses, "html": htmls,
                })

        return (
            batch
            .withColumn("host", F.expr("parse_url(url, 'HOST')"))
            .repartition(n_parts, "host")
            .drop("host")
            .mapInPandas(fetch_batches, FETCH_SCHEMA)
        )

    # -- one round ---------------------------------------------------
    def _round(
        self, frontier: DataFrame, seen: DataFrame, budget: int,
    ) -> tuple[DataFrame, DataFrame, DataFrame, int]:
        """Process one batch; returns (frontier', seen', docs, n_taken)."""
        cfg = self.cfg
        take_n = min(cfg.batch_docs, budget)
        ordered = frontier.orderBy("level", "url")
        if cfg.per_host_cap is not None:
            from pyspark.sql import Window

            w = (
                Window.partitionBy(F.expr("parse_url(url, 'HOST')"))
                .orderBy("level", "url")
            )
            ordered = (
                frontier.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") <= cfg.per_host_cap)
                .drop("rn")
                .orderBy("level", "url")
            )
        taken = ordered.limit(take_n).localCheckpoint(eager=True)
        n_taken = taken.count()
        if n_taken == 0:
            return frontier, seen, None, 0

        # processed BEFORE the robots check, like urisProcessed
        # (Core.hs:172-173) — a disallowed URI is never retried
        frontier = frontier.join(taken.select("url"), "url", "left_anti")
        seen = seen.unionByName(taken.select("url")).distinct()

        allowed = self._robots_filter(taken)
        fetched = self._fetch(allowed).localCheckpoint(eager=True)

        # redirects: the real URI is processed too (Core.hs:267-268)
        seen = (
            seen.unionByName(fetched.select(F.col("final_url").alias("url")))
            .distinct()
        )

        # refs -> next-level frontier candidates (processDoc',
        # Core.hs:215-231): only pages below the click level expand,
        # refs run through the follow-ref predicate, unseen ones join
        # the frontier with MIN-level union semantics (Core.hs:73-77)
        @F.pandas_udf("array<string>")
        def refs_udf(html: pd.Series, base: pd.Series) -> pd.Series:
            return pd.Series(
                [extract_refs(h, b or "") for h, b in zip(html, base)]
            )

        expandable = fetched.where(
            (F.col("status") == 200) & (F.col("level") < F.lit(cfg.max_depth))
        )
        cand = (
            expandable
            .select(
                F.explode(refs_udf(F.col("html"), F.col("final_url")))
                .alias("url"),
                (F.col("level") + 1).alias("level"),
            )
            .where(cfg.follow_ref_col(F.col("url")))
            .groupBy("url").agg(F.min("level").alias("level"))
            .join(seen, "url", "left_anti")
        )
        frontier = (
            frontier.unionByName(cand)
            .groupBy("url").agg(F.min("level").alias("level"))
            # a redirect's final_url may ALREADY be queued in the
            # frontier from a normal link; it just became seen, so it
            # must leave the queue or a later round fetches it a second
            # time (double budget spend; cand's own anti-join can't see
            # carried-over frontier rows)
            .join(seen, "url", "left_anti")
            .localCheckpoint(eager=True)
        )
        seen = seen.localCheckpoint(eager=True)
        docs = fetched.where(
            (F.col("status") == 200) & F.col("html").isNotNull()
        )
        return frontier, seen, docs, n_taken

    # -- the loop ----------------------------------------------------
    def crawl(
        self,
        catalog=None,
        resume: bool = False,
    ) -> DataFrame:
        """Run the crawl to budget/frontier exhaustion (crawlerLoop,
        Core.hs:102-121); returns the accumulated documents
        ``(url, level, status, html)`` with ``url`` the real (post-
        redirect) URI, deduplicated at min level. With ``catalog`` set,
        state snapshots commit every ``save_interval`` fetched docs
        (crawlerCheckSaveState, Core.hs:130-136) and ``resume=True``
        continues from the last committed state (crawlerResume)."""
        spark, cfg = self.spark, self.cfg
        n_docs = 0
        doc_parts: list[DataFrame] = []
        empty_docs = spark.createDataFrame([], FETCH_SCHEMA)

        if resume and catalog is not None:
            frontier = catalog.read(spark, "crawl_frontier")
            seen = catalog.read(spark, "crawl_seen")
            saved_docs = catalog.read(spark, "crawl_docs")
            doc_parts.append(saved_docs)
            last = catalog.snapshots("crawl_frontier")[-1]
            n_docs = int(last.get("meta", {}).get("n_docs", 0))
        else:
            frontier = spark.createDataFrame(
                [(u, 0) for u in cfg.seeds], "url string, level int"
            ).groupBy("url").agg(F.min("level").alias("level"))
            seen = spark.createDataFrame([], "url string")

        n_saved = n_docs
        while n_docs < cfg.max_docs:
            frontier, seen, docs, n_taken = self._round(
                frontier, seen, cfg.max_docs - n_docs
            )
            if n_taken == 0:
                break
            n_docs += n_taken  # counts robots-rejected too (Core.hs:168)
            if docs is not None:
                doc_parts.append(docs)
            if (
                catalog is not None
                and cfg.save_interval > 0
                and n_docs - n_saved >= cfg.save_interval
            ):
                self._save_state(catalog, frontier, seen, doc_parts, n_docs)
                n_saved = n_docs

        out = doc_parts[0] if doc_parts else empty_docs
        for d in doc_parts[1:]:
            out = out.unionByName(d)
        # a redirect target fetched via two paths appears once, at its
        # min level (the doc table keyed by the real URI)
        from pyspark.sql import Window

        w = Window.partitionBy("final_url").orderBy("level", "url")
        out = (
            out.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(
                F.col("final_url").alias("url"), "level", "status", "html",
            )
        )
        if catalog is not None and cfg.save_interval > 0 and n_docs > n_saved:
            self._save_state(catalog, frontier, seen, doc_parts, n_docs)
        return out

    def _save_state(self, catalog, frontier, seen, doc_parts, n_docs):
        acc = doc_parts[0]
        for d in doc_parts[1:]:
            acc = acc.unionByName(d)
        meta = {"n_docs": n_docs}
        catalog.commit(acc, "crawl_docs", f"crawl_docs@{n_docs}",
                       extra_meta=meta)
        catalog.commit(seen, "crawl_seen", f"crawl_seen@{n_docs}",
                       extra_meta=meta)
        catalog.commit(frontier, "crawl_frontier", f"crawl_frontier@{n_docs}",
                       extra_meta=meta)


def crawl(spark: SparkSession, cfg: CrawlConfig, catalog=None,
          resume: bool = False) -> DataFrame:
    """Convenience wrapper: run a crawl, return the documents frame."""
    return Crawler(spark, cfg).crawl(catalog=catalog, resume=resume)


def crawl_to_documents(docs: DataFrame) -> DataFrame:
    """Shape crawl output into the engine's input table (input_hint:
    url, warc_ts, html, text, lang) — the IndexerCore hand-off
    (IndexerCore.hs:41-48: crawler results become index input). The
    text column reuses the byte-identical extraction contract."""
    from hunt_spark.functions.analysis import extract_text_udf

    return docs.select(
        "url",
        F.current_timestamp().alias("warc_ts"),
        "html",
        extract_text_udf(F.col("html")).alias("text"),
        F.lit("en").alias("lang"),
    )


# ---------------------------------------------------------------------------
# deterministic synthetic site (tests + the crawl_frontier gate)


def synthetic_site(
    n: int,
    n_hosts: int = 3,
    robots_mod: int = 17,
    robots_rem: int = 3,
    redirect_mod: int = 0,
) -> Fetcher:
    """A pure in-process web site over doc ids 0..n-1.

    - page i lives at ``http://h{i % n_hosts}.test/d{i:06d}``;
    - it links to (2i+1) % n, (3i+7) % n and — RELATIVELY, exercising
      the distributed urljoin path — its same-host successor
      i+n_hosts (when < n); fixed-width paths so robots prefix rules
      match exactly one page;
    - each host's robots.txt disallows its pages with
      ``i % robots_mod == robots_rem`` (one Disallow line per page,
      under ``User-agent: *``);
    - with ``redirect_mod`` m > 0, page i with i % m == m-1 answers 301
      to page (i+1) % n (the fetcher follows it and reports the real
      URI + that page's body, like HXT's redirect-following read).
    The graph, being pure arithmetic, is reproducible in SQL — the
    driver gate's DuckDB oracle walks the same graph with a recursive
    CTE.
    """
    width = 6

    def url_of(i: int) -> str:
        return f"http://h{i % n_hosts}.test/d{i:0{width}d}"

    def html_of(i: int) -> bytes:
        links = "".join(
            f'<a href="{url_of(t)}">t{t}</a>'
            for t in ((2 * i + 1) % n, (3 * i + 7) % n)
            if 0 <= t < n
        )
        if i + n_hosts < n:
            # relative (no leading slash): resolves against the page's
            # own host+path, and i+n_hosts IS on the same host
            links += f'<a href="d{i + n_hosts:0{width}d}">next</a>'
        return (
            f"<html><head><title>doc {i}</title></head>"
            f"<body>synthetic page {i} {links}</body></html>"
        ).encode()

    def fetch(url: str) -> tuple[str, int, bytes | None]:
        parts = urlsplit(url)
        if parts.path == "/robots.txt":
            host_id = int(parts.netloc[1:].split(".", 1)[0])
            lines = ["User-agent: *"] + [
                f"Disallow: /d{i:0{width}d}"
                for i in range(host_id, n, n_hosts)
                if robots_mod and i % robots_mod == robots_rem
            ]
            return url, 200, "\n".join(lines).encode()
        m = re.fullmatch(r"/d(\d+)", parts.path)
        if not m:
            return url, 404, None
        i = int(m.group(1))
        if i >= n or url_of(i) != url:
            return url, 404, None
        if redirect_mod and i % redirect_mod == redirect_mod - 1:
            j = (i + 1) % n
            return url_of(j), 200, html_of(j)
        return url, 200, html_of(i)

    return fetch
