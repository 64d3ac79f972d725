"""Analysis chain: HTML text extraction + tokenization + normalization.

Reimplements the behavior of the reference's analysis stage
(hunt: Hunt/Index/Schema/Analyze.hs:38-92, tokenizer regex
Hunt/Index/Schema.hs:130, HTML extraction
hunt-crawler/src/Holumbus/Crawler/Html.hs:136-147,182-183) with
Spark-native primitives:

- ``extract_text_udf`` — vectorized Arrow UDF, html binary -> text
  string. Contract ("byte-identical extracted text per url"): the
  whitespace-normalized concatenation of all text nodes in document
  order — tags stripped, script/style dropped, entities unescaped,
  tokens joined by single spaces (Hunt's ``normalizeWS = words >>>
  unwords``).
- ``tokenize_col`` — JVM-side tokenizer (``regexp_extract_all``),
  the hot build path; stays inside WholeStageCodegen, no Python.
- ``tokenize_py`` — the same tokenizer for driver-side query terms
  and the pytest oracle; parity is pinned by tests.

Position semantics (Analyze.hs:62-84): scan -> drop empty -> 1-based
positions over the *surviving* token stream.
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from html.parser import HTMLParser as _HTMLParser

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# Hunt's default text tokenizer is XMLSchema \w* minus empties
# (Schema.hs:130, Analyze.hs:62-67). We pin Unicode word-chars in both
# engines: Java needs the (?U) flag for unicode \w, Python \w is
# unicode by default.
TOKEN_PATTERN_JAVA = r"(?U)\w+"
TOKEN_PATTERN_PY = re.compile(r"\w+", re.UNICODE)

# The reference's per-context-type default scan regexes (ContextType
# ctRegEx, Schema.hs:125-179), usable as BuildConfig.context_regexes
# values — the cxRegEx per-context override surface (ContextSchema,
# Schema.hs:77-92): scanTextRE tokenizes with the regex, empties are
# dropped, the validator+normalizer chain runs on the matches. The
# ``*`` forms are written ``+`` here: scan-then-drop-empties is
# match-all-then-filter either way, and the non-empty forms keep
# regexp_extract_all from emitting an empty match at every boundary.
# Note the reference's date default scans bare YYYY-MM-DD only — a
# datetime in a date context indexes as its date part unless the
# context overrides the regex (exactly the reference behavior).
REFERENCE_SCAN_REGEXES = {
    "text": r"\w+",  # ctText "\\w*", Schema.hs:129
    "text-small": r"\w+",  # ctTextSimple, Schema.hs:140
    "int": r"-?[0-9]+",  # ctInt "([-]?[0-9]*)", Schema.hs:149
    # ctDate, Schema.hs:158
    "date": r"[0-9]{4}-((0[1-9])|(1[0-2]))-((0[1-9])|([12][0-9])|(3[01]))",
    # ctPosition / ctPositionRTree, Schema.hs:167,175
    "position": (
        r"-?(90(\.0*)?|[1-8]?[0-9](\.[0-9]*)?)"
        r"--?((180(\.0*)?)|(1[0-7][0-9])|([1-9]?[0-9]))(\.[0-9]*)?"
    ),
}
REFERENCE_SCAN_REGEXES["geo"] = REFERENCE_SCAN_REGEXES["position"]
REFERENCE_SCAN_REGEXES["position-rtree"] = REFERENCE_SCAN_REGEXES["position"]


def scan_tokens_col(col: Column | str, regex: str) -> Column:
    """scanTextRE (Analyze.hs:85-92) as a JVM expression: all
    non-overlapping matches of ``regex`` in document order, empty
    matches dropped. Group 0 is taken, so reference regexes with
    inner capture groups work verbatim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.regexp_extract_all(c, F.lit(regex), 0), lambda t: t != F.lit("")
    )


_SCAN_PY_CACHE: dict[str, re.Pattern] = {}


def scan_py(text: str, regex: str) -> list[str]:
    """Python twin of scan_tokens_col (oracle + driver side); must
    agree with the JVM scan on the Java/Python-common regex subset."""
    pat = _SCAN_PY_CACHE.get(regex)
    if pat is None:
        pat = _SCAN_PY_CACHE[regex] = re.compile(regex)
    return [m.group(0) for m in pat.finditer(text or "") if m.group(0)]

_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]*>")


def _extract_one(raw: bytes | str | None) -> str | None:
    if raw is None:
        return None
    s = raw.decode("utf-8", errors="replace") if isinstance(raw, (bytes, bytearray)) else raw
    s = _COMMENT_RE.sub(" ", s)
    s = _SCRIPT_STYLE_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    # normalizeWS: words >>> unwords (Html.hs:182-183)
    return " ".join(s.split())


@pandas_udf(StringType())
def extract_text_udf(html_col: pd.Series) -> pd.Series:
    """html (binary or string) -> whitespace-normalized text. Arrow-batched."""
    return html_col.map(_extract_one)


# ---------------------------------------------------------------------------
# selector-configurable extraction (html-hunter's per-context XPath
# feeds, HtmlHunter.hs:288-340: each context may be fed by a selector;
# predefined body / title / headlines, or "-c cx://tag" descendant and
# "-c cx:/html/body"-style absolute paths). Tag-stack matching over the
# stdlib HTMLParser — no DOM build, no external libs, streaming per doc.
# ---------------------------------------------------------------------------

_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
_HEADLINE_TAGS = frozenset(f"h{i}" for i in range(1, 7))


def compile_selector(sel: str):
    """Selector -> matcher(open_tag_stack) -> bool. Supported forms
    (the shapes html-hunter's help text documents): predefined names
    ``body``/``title``/``headlines`` (defCx, HtmlHunter.hs:330-334 →
    html/body, html/head/title, h1-h6 under body), ``//tag``
    (descendant anywhere), and absolute ``/a/b/c`` paths."""
    if sel == "headlines":
        return lambda st: "body" in st and any(t in _HEADLINE_TAGS for t in st)
    if sel == "body":
        sel = "/html/body"
    elif sel == "title":
        sel = "/html/head/title"
    if sel.startswith("//"):
        name = sel[2:]
        if not name or "/" in name:
            raise ValueError(f"bad descendant selector {sel!r}")
        return lambda st: name in st
    if sel.startswith("/"):
        parts = tuple(p for p in sel.split("/") if p)
        if not parts:
            raise ValueError(f"bad path selector {sel!r}")
        return lambda st: tuple(st[: len(parts)]) == parts
    raise ValueError(f"not a legal selector: {sel!r}")


class _SelectorExtractor(_HTMLParser):
    """Streams text nodes whose open-tag ancestor path satisfies the
    matcher; script/style subtrees and comments never emit (comments
    are dropped by the parser, script/style via the skip counter).
    getAllText contract: parts separated by a space, then normalizeWS
    (unwords . words — HtmlHunter.hs:364-372,405-410)."""

    def __init__(self, matcher):
        super().__init__(convert_charrefs=True)
        self.matcher = matcher
        self.stack: list[str] = []
        self.skip = 0
        self.parts: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in _VOID_TAGS:
            return
        self.stack.append(tag)
        if tag in ("script", "style"):
            self.skip += 1

    def handle_startendtag(self, tag, attrs):
        pass  # self-closing: never on the ancestor path of text

    def handle_endtag(self, tag):
        if tag in _VOID_TAGS or tag not in self.stack:
            return  # tolerate stray close tags
        while self.stack:
            t = self.stack.pop()
            if t in ("script", "style"):
                self.skip -= 1
            if t == tag:
                break

    def handle_data(self, data):
        if not self.skip and data.strip() and self.matcher(self.stack):
            self.parts.append(data)


def extract_by_selector(raw: bytes | str | None, matcher) -> str | None:
    if raw is None:
        return None
    s = (
        raw.decode("utf-8", errors="replace")
        if isinstance(raw, (bytes, bytearray))
        else raw
    )
    p = _SelectorExtractor(matcher)
    p.feed(s)
    p.close()
    return " ".join(" ".join(p.parts).split())


def make_selector_extract_udf(selectors: dict[str, str]):
    """(context, html) -> extracted text, per-context selector.
    Contexts absent from ``selectors`` fall back to the whole-document
    extraction (byte-identity contract unchanged for them)."""
    compiled = {cx: compile_selector(s) for cx, s in selectors.items()}

    @pandas_udf(StringType())
    def go(context_col: pd.Series, html_col: pd.Series) -> pd.Series:
        def one(cx, raw):
            m = compiled.get(cx)
            if m is None:
                return _extract_one(raw)
            return extract_by_selector(raw, m)

        return pd.Series(
            [one(cx, raw) for cx, raw in zip(context_col, html_col)],
            dtype="object",
        )

    return go


def tokenize_col(text: Column | str) -> Column:
    """Text column -> array<string> of tokens, JVM-side.

    ``regexp_extract_all`` with a match-all pattern implements Hunt's
    scan-then-drop-empties exactly (empty strings never match ``\\w+``).
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(TOKEN_PATTERN_JAVA), 0)


def normalize_terms(tokens: Column, lowercase: bool = True) -> Column:
    """Normalizer chain (Schema.hs:248-269): applied after validation,
    before position assignment. Default chain = lowercase."""
    if lowercase:
        return F.transform(tokens, lambda t: F.lower(t))
    return tokens


def tokenize_py(text: str, lowercase: bool = False) -> list[str]:
    """Driver/oracle-side tokenizer; must agree with tokenize_col."""
    toks = TOKEN_PATTERN_PY.findall(text or "")
    return [t.lower() for t in toks] if lowercase else toks


# ---------------------------------------------------------------------------
# typed-context normalizer chains (validate -> normalize; Hunt
# Hunt/Index/Schema/Analyze.hs:62-68 applies the chain after validation,
# before position assignment). Each has a JVM column form for the build
# and a python twin for query-constant normalization and the oracle.
# ---------------------------------------------------------------------------

_INT_RE = re.compile(r"-?\d{1,19}")
_TEN20 = 10**20


def int_norm_py(tok: str) -> str | None:
    """Hunt ZeroFill (Normalize/Int.hs:55-70): 21 chars, sign digit
    ('1' non-negative, '0' negative) + 20 digits, negatives stored as
    10^20 + n so lexicographic order == numeric order. Pinned by the
    reference test "1" -> "100000000000000000001"
    (test/Hunt/AnalyzerTests.hs:121-131). Validator: <= 19 digits
    (the JVM build uses the identical rlike rule; Hunt bounds by
    64-bit Int — Normalize/Int.hs isInt — this keeps the two engines'
    rules exactly aligned instead). None = reject."""
    if not _INT_RE.fullmatch(tok or ""):
        return None
    n = int(tok)
    if n >= 0:
        return "1" + str(n).zfill(20)
    return "0" + str(_TEN20 + n).zfill(20)


_DATE_RES = [
    (re.compile(r"(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})"), 6),
    (re.compile(r"(\d{4})-(\d{2})-(\d{2})"), 3),
    (re.compile(r"(\d{4})-(\d{2})"), 2),
    (re.compile(r"(\d{4})"), 1),
]

# xsd gMonthDay / gMonth / gDay (Normalize/Date.hs rexDates:
# "--MM-DD", "--MM", "---DD"); the reference's readMonthDayS/readMonthS/
# readDayS all default the missing fields to YEAR 1 (fromGregorian 1 ...),
# so "--12-25" packs as 0001-12-25 midnight. gDay first: "--\d" would
# not match "---25" anyway (fullmatch), but the order mirrors
# safeDateReaders' most-specific-first list.
_DATE_PARTIAL_RES = [
    (re.compile(r"--(\d{2})-(\d{2})"), lambda m: "0001" + m.group(1) + m.group(2)),
    (re.compile(r"---(\d{2})"), lambda m: "000101" + m.group(1)),
    (re.compile(r"--(\d{2})"), lambda m: "0001" + m.group(1) + "01"),
]


def date_norm_py(tok: str) -> str | None:
    """ISO-8601 date[time] -> 14-digit yyyymmddhhmmss string
    (Normalize/Date.hs:56-63 digit packing); lexicographic ==
    chronological. Partial dates are accepted like the reference's
    isAnyDate/readAnyDateM (AnalyzerTests.hs prop_isAnyDate3: "2013" is
    a valid date): gYear/gYearMonth expand to Jan-1 / day-1 midnight
    (toUTC defaults), and the year-less xsd forms gMonthDay/gMonth/gDay
    ("--12-25"/"--12"/"---25") default the missing fields to year 1 /
    month 1 / day 1 exactly like readMonthDayS/readMonthS/readDayS.
    Known narrowing vs the reference: the optional timezone suffixes
    ("Z", "+hh:mm") its regexes accept are rejected here rather than
    shifted to UTC."""
    for rx, ngroups in _DATE_RES:
        m = rx.fullmatch(tok or "")
        if m:
            digits = "".join(m.groups())
            if ngroups == 1:
                digits += "0101"
            elif ngroups == 2:
                digits += "01"
            return digits.ljust(14, "0")
    for rx, pack in _DATE_PARTIAL_RES:
        m = rx.fullmatch(tok or "")
        if m:
            return pack(m).ljust(14, "0")
    return None


_GEO_RE = re.compile(r"(-?\d+(?:\.\d+)?)-(-?\d+(?:\.\d+)?)")


def geo_norm_py(tok: str) -> str | None:
    """"lat-lon" -> 64-char '0'/'1' Morton/Z-order string: lat and lon
    shifted non-negative, scaled x1e7 to 32-bit ints, bit-interleaved
    MSB-first (lat bits at even positions). A z-string prefix is a
    spatial containment cell (Normalize/Position.hs:61-68 semantics;
    PrefixTreeIndex2Dim range = prefix walk)."""
    m = _GEO_RE.fullmatch(tok or "")
    if not m:
        return None
    lat, lon = float(m.group(1)), float(m.group(2))
    if not (-90.0 <= lat <= 90.0 and -180.0 <= lon <= 180.0):
        return None
    ulat = int(round((lat + 90.0) * 1e7))
    ulon = int(round((lon + 180.0) * 1e7))
    out = []
    for i in range(31, -1, -1):
        out.append("1" if ulat >> i & 1 else "0")
        out.append("1" if ulon >> i & 1 else "0")
    return "".join(out)


def geo_denorm_py(z: str) -> str | None:
    """Inverse of geo_norm_py: 64-char z-string -> "lat-lon" at the
    index's 1e-7-degree resolution (Normalize/Position.hs denormalize;
    round-trip pinned like AnalyzerTests.hs test_norm_pos5)."""
    if not z or len(z) != 64 or set(z) - {"0", "1"}:
        return None
    ulat = ulon = 0
    for i in range(32):
        ulat = (ulat << 1) | (z[2 * i] == "1")
        ulon = (ulon << 1) | (z[2 * i + 1] == "1")
    lat = ulat / 1e7 - 90.0
    lon = ulon / 1e7 - 180.0
    return f"{lat:.7f}-{lon:.7f}"


CONTEXT_NORMS_PY = {"int": int_norm_py, "date": date_norm_py, "geo": geo_norm_py}

# Reference wire names (Schema.hs ctName) -> storage/normalizer type.
# "position" (ctPosition, Schema.hs:165-171) and "position-rtree"
# (ctPositionRTree, Schema.hs:173-179) share the lat-lon key syntax,
# validator, and query surface; they differ only in the reference's
# in-memory index structure (z-curve PrefixTreeIndex2Dim vs
# RTreeIndex.hs:44-100). Here both resolve to the z-order "geo"
# layout: under columnar storage the rect query is a coarse z-interval
# scan + exact de-interleaved per-axis BETWEEN either way, so the
# R-tree is a data-structure choice, not a distinct capability
# (SURVEY §2 I10/I11). Declared names are preserved on the schema
# surface; canonical names drive storage and planning.
CTYPE_ALIASES = {"position": "geo", "position-rtree": "geo"}
KNOWN_CTYPES = ("text", "text-small", "int", "date", "geo") + tuple(CTYPE_ALIASES)


def canonical_ctype(ctype: str) -> str:
    """Collapse reference wire names onto the storage type that
    implements them (identity for the native names)."""
    return CTYPE_ALIASES.get(ctype, ctype)


def normalize_context_col(
    col: Column | str, ctype: str, scan_regex: str | None = None
) -> Column:
    """Raw text column -> space-joined stream of validated+normalized
    tokens for a typed context (feed this as the context column to the
    build; downstream \\w+ tokenization preserves the normalized forms,
    and positions are 1-based over the SURVIVING tokens, matching
    Hunt's validate-then-position order).

    ``scan_regex`` (cxRegEx, ContextSchema Schema.hs:77-92) overrides
    the default whitespace scan: tokens are then the regex's matches in
    document order — e.g. the reference's date default
    (REFERENCE_SCAN_REGEXES["date"]) lifts punctuation-adjacent dates
    out of running text. Without it the rebuild scans on whitespace,
    which is deliberately broader than the reference's type defaults
    (a clean "2013-06" token validates here; the reference's default
    date regex would never emit it — only a cxRegEx override reaches
    those partial forms there too).

    int/date are pure JVM expressions; geo needs bit interleaving —
    a vectorized Arrow UDF."""
    ctype = canonical_ctype(ctype)
    c = F.col(col) if isinstance(col, str) else col
    if ctype == "text":
        return c
    toks = (
        scan_tokens_col(c, scan_regex)
        if scan_regex is not None
        else F.split(c, r"\s+")
    )
    if ctype == "int":
        mapped = F.transform(
            toks,
            lambda t: F.when(
                t.rlike(r"^-?\d{1,19}$"),
                F.when(
                    t.cast("decimal(21,0)") >= 0,
                    F.concat(
                        F.lit("1"),
                        F.lpad(t.cast("decimal(21,0)").cast("string"), 20, "0"),
                    ),
                ).otherwise(
                    F.concat(
                        F.lit("0"),
                        F.lpad(
                            (
                                F.lit(str(_TEN20)).cast("decimal(21,0)")
                                + t.cast("decimal(21,0)")
                            ).cast("decimal(21,0)").cast("string"),
                            20,
                            "0",
                        ),
                    )
                ),
            ),
        )
    elif ctype == "date":
        # partial dates expand to Jan-1 / day-1 midnight like the
        # python twin (reference readAnyDateM toUTC defaults)
        mapped = F.transform(
            toks,
            lambda t: F.when(
                t.rlike(r"^\d{4}-\d{2}-\d{2}(T\d{2}:\d{2}:\d{2})?$"),
                F.rpad(F.regexp_replace(t, r"[^0-9]", ""), 14, "0"),
            )
            .when(
                t.rlike(r"^\d{4}-\d{2}$"),
                F.rpad(
                    F.concat(F.regexp_replace(t, r"[^0-9]", ""), F.lit("01")),
                    14, "0",
                ),
            )
            .when(
                t.rlike(r"^\d{4}$"),
                F.rpad(F.concat(t, F.lit("0101")), 14, "0"),
            )
            # year-less xsd forms, year-1 defaults (readMonthDayS etc.)
            .when(
                t.rlike(r"^--\d{2}-\d{2}$"),
                F.rpad(
                    F.concat(
                        F.lit("0001"), F.regexp_replace(t, r"[^0-9]", "")
                    ),
                    14, "0",
                ),
            )
            .when(
                t.rlike(r"^---\d{2}$"),
                F.rpad(
                    F.concat(
                        F.lit("000101"), F.regexp_replace(t, r"[^0-9]", "")
                    ),
                    14, "0",
                ),
            )
            .when(
                t.rlike(r"^--\d{2}$"),
                F.rpad(
                    F.concat(
                        F.lit("0001"),
                        F.regexp_replace(t, r"[^0-9]", ""),
                        F.lit("01"),
                    ),
                    14, "0",
                ),
            ),
        )
    elif ctype == "geo":
        # the Arrow kernel whitespace-splits internally; a scan override
        # pre-extracts the matches (lat-lon tokens carry no spaces, so
        # the space-join round-trips exactly)
        return _geo_norm_text_udf(
            F.array_join(toks, " ") if scan_regex is not None else c
        )
    else:
        raise ValueError(f"unknown context type {ctype!r}")
    return F.array_join(F.filter(mapped, lambda x: x.isNotNull()), " ")


@pandas_udf(StringType())
def _geo_norm_text_udf(text: pd.Series) -> pd.Series:
    def one(s: str | None) -> str | None:
        if s is None:
            return None
        out = [z for t in s.split() if (z := geo_norm_py(t)) is not None]
        return " ".join(out)

    return text.map(one)
