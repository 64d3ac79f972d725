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

import calendar as _calendar
import datetime as _datetime
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
    # (?U) makes Java's predefined classes (\w, \d, \b) Unicode-aware
    # like Python's — without it the same config tokenizes 'café' as
    # 'caf' on the arrow/jvm strategies but 'café' in the python kernel
    # (a no-op for regexes not using those classes)
    return F.filter(
        F.regexp_extract_all(c, F.lit("(?U)" + regex), 0),
        lambda t: t != F.lit(""),
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

# ASCII digits only: Python \d admits Unicode digits (int() parses
# them!) while the JVM twin's \d is ASCII — and the reference's
# Data.Char.isDigit is ASCII-only, so ASCII is the correct semantics
_INT_RE = re.compile(r"-?[0-9]{1,19}")
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


# Date grammar mirroring the reference's rexDates (Normalize/Date.hs:
# 167-217) in safeDateReaders order (Date.hs:104-110, first matching
# form reads the token): dateTime, date, gYearMonth, gYear, gMonthDay,
# gMonth, gDay — each with an optional timezone suffix. Bounds are the
# reference's own: month 01-12 (m2), day 01-31 (t2, calendar-clipped
# by fromGregorian), hour 00-23 (h2) or the literal 24:00:00 leap
# form, tz hour 00-13 (h13). Narrowings vs the reference, documented:
# negative years and >4-digit years are rejected (its own normalize
# says "no proper support for dates before year 0", and the packed key
# ordering breaks for 5-digit years in the reference too); the
# "+14:00:00" tz alternative its regex admits is rejected here — the
# reference's readTimeZone crashes on it (`read "00:00" :: Int`,
# Date.hs:236-246), so no working behavior exists to mirror.
_TZ_SUFFIX = (
    r"(?:(?P<tzz>Z)|(?P<tzsign>[+-])(?P<tzh>0[0-9]|1[0-3]):(?P<tzm>[0-5][0-9]))?"
)
_Y_PART = r"(?P<y>[0-9]{4})"
_MO_PART = r"(?P<mo>0[1-9]|1[0-2])"
_D_PART = r"(?P<d>0[1-9]|[12][0-9]|3[01])"
_HMS_PART = (
    r"(?:(?P<h>[01][0-9]|2[0-3]):(?P<mi>[0-5][0-9]):(?P<s>[0-5][0-9])"
    r"(?P<fr>\.[0-9]+)?|(?P<h24>24:00:00)(?:\.0+)?)"
)
_DATE_FORMS = [
    re.compile(p + _TZ_SUFFIX)
    for p in (
        rf"{_Y_PART}-{_MO_PART}-{_D_PART}T{_HMS_PART}",  # dateTime
        rf"{_Y_PART}-{_MO_PART}-{_D_PART}",  # date
        rf"{_Y_PART}-{_MO_PART}",  # gYearMonth
        _Y_PART,  # gYear
        rf"--{_MO_PART}-{_D_PART}",  # gMonthDay
        rf"--{_MO_PART}",  # gMonth
        rf"---{_D_PART}",  # gDay
    )
]


def date_norm_py(tok: str) -> str | None:
    r"""ISO-8601 date[time] -> yyyymmddhhmmss[_f+] key (Normalize/
    Date.hs:56-63 digit packing: show-then-strip '-T:'); lexicographic
    == chronological. Reference-parity semantics, each pinned in
    tests/test_typed_contexts.py:

    - partial forms expand to toUTC defaults — gYear/gYearMonth to
      Jan-1/day-1 midnight, the year-less xsd forms gMonthDay/gMonth/
      gDay ("--12-25"/"--12"/"---25") to year 1 (readMonthDayS etc.,
      Date.hs:281-298);
    - out-of-calendar days CLIP like fromGregorian ("2013-02-31" packs
      as Feb 28), while out-of-grammar months/days ("2013-13-01")
      reject;
    - a timezone suffix shifts by the SIGNED OFFSET, ADDED — the
      reference's toUTCTime `addUTCTime tz` with readTimeZone negating
      only '-' (Date.hs:152-158,236-246): "…T12:00:00+02:00" packs as
      14:00, the opposite of ISO-8601 UTC conversion, mirrored as-is;
    - fractional seconds survive into the key with trailing zeros
      dropped (show of Pico), joined with '_' rather than the
      reference's '.': whole-second keys are all exactly 14 digits, so
      any separator keeps lexicographic == chronological, but the
      normalized key stream is re-tokenized by \w+ downstream and '.'
      would split the key in two (indexed terms could then never match
      query-side keys) — '_' is a word character and survives;
    - the leap form "T24:00:00" without a zone renders as 23:59:60
      (Haskell timeToTimeOfDay on dayTime >= 24h); with any zone,
      addUTCTime normalizes it into the next day first.

    Shifts that leave [0001-01-01, 9999-12-31] reject (datetime's
    domain; the reference's year-0 handling is declared broken in its
    own comments)."""
    s = tok or ""
    m = None
    for rx in _DATE_FORMS:
        m = rx.fullmatch(s)
        if m:
            break
    else:
        return None
    g = m.groupdict()
    y = int(g.get("y") or 1)
    mo = int(g.get("mo") or 1)
    d = int(g.get("d") or 1)
    d = min(d, _calendar.monthrange(y, mo)[1])  # fromGregorian clips
    frac = ""
    if g.get("h24") is not None:
        secs = 86400
    else:
        secs = (
            int(g.get("h") or 0) * 3600
            + int(g.get("mi") or 0) * 60
            + int(g.get("s") or 0)
        )
        fr = g.get("fr")
        if fr:
            # DiffTime is Pico fixed point — fromRational floors at 12
            # fraction digits (Data.Fixed), i.e. truncate-then-strip
            fd = fr[1:13].rstrip("0")
            frac = "_" + fd if fd else ""
    if g.get("tzz"):
        off, has_tz = 0, True
    elif g.get("tzsign"):
        off = int(g["tzh"]) * 3600 + int(g["tzm"]) * 60
        if g["tzsign"] == "-":
            off = -off
        has_tz = True
    else:
        off, has_tz = 0, False
    if not has_tz and secs == 86400:
        return f"{y:04d}{mo:02d}{d:02d}235960"
    try:
        dt = _datetime.datetime(y, mo, d) + _datetime.timedelta(
            seconds=secs + off
        )
    except (OverflowError, ValueError):
        return None  # shifted outside year 1..9999
    return (
        f"{dt.year:04d}{dt.month:02d}{dt.day:02d}"
        f"{dt.hour:02d}{dt.minute:02d}{dt.second:02d}" + frac
    )


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


def zerofill_norm_py(tok: str) -> str | None:
    """The reference's named "ZeroFill" normalizer
    (Normalize/Int.hs:55-70 normalizeToText): sign prefix '1'/'0' then
    the digits zero-padded to 20 — NOTE the reference form keeps the
    ABSOLUTE digits for negatives (non-monotone across sign, unlike the
    built-in int context's order-isomorphic key). Mirrored as-is; the
    one divergence is that invalid input DROPS the token instead of
    crashing the process (the reference calls `error`)."""
    if tok is None or not re.fullmatch(r"-?[0-9]+", tok):
        return None
    if not (-(2**63) <= int(tok) <= 2**63 - 1):  # isInt Int64 bounds
        return None
    pfx, nr = ("0", tok[1:]) if tok.startswith("-") else ("1", tok)
    return pfx + "0" * max(0, 20 - len(nr)) + nr


def _zerofill_norm_expr(t: Column) -> Column:
    nr = F.when(
        t.startswith("-"), F.substring(t, 2, 1 << 30)
    ).otherwise(t)
    pfx = F.when(t.startswith("-"), F.lit("0")).otherwise(F.lit("1"))
    padded = F.when(F.length(nr) >= 20, nr).otherwise(F.lpad(nr, 20, "0"))
    return F.when(
        t.rlike(r"^-?[0-9]+$") & t.cast("bigint").isNotNull(),
        F.concat(pfx, padded),
    )


# The reference's named normalizer set (Interpreter.hs:187-189
# `normalizers = [cnUpperCase, cnLowerCase, cnZeroFill]`), referenced
# by name from ContextSchema cxNormalizer (wire key "normalizers").
# Each entry is (Catalyst token expr, python twin); a chain folds left
# to right (normalize' Schema.hs:247-249), applied after scan+validate
# and before the type's key layout, on both the build and the query
# side (normQueryCx Processor.hs:160-181).
CHAIN_NORMALIZERS: dict[str, tuple] = {
    "UpperCase": (F.upper, lambda s: s.upper()),
    "LowerCase": (F.lower, lambda s: s.lower()),
    "ZeroFill": (_zerofill_norm_expr, zerofill_norm_py),
}


def chain_norm_expr(t: Column, names: list[str]) -> Column:
    for nm in names:
        t = CHAIN_NORMALIZERS[nm][0](t)
    return t


def chain_norm_py(word: str | None, names: list[str]) -> str | None:
    for nm in names:
        if word is None:
            return None
        word = CHAIN_NORMALIZERS[nm][1](word)
    return word


class ContextTypePlugin:
    """A user-defined context type — the reference's open ContextType
    set (CType, Schema.hs:104-122; a Hunt instance is configured with a
    LIST of types, Interpreter.hs:185, and hunt-demos/extended-hunt/
    src/Main.hs:65-71 plugs a custom "realInt" CType into it).

    The rebuild's equivalent of ctIxImpl is the normalized key layout:
    ``norm_expr`` maps the raw text Column to the space-joined stream of
    validated+normalized keys (same contract as the built-in types —
    drop invalid tokens, make the key order mirror the type's semantic
    order so lookupRange works), and ``norm_py`` is its per-token
    python twin for query words and range endpoints. ``scan_regex`` is
    the type's default ctRegEx (overridable per context via cxRegEx).

    Like the demo's custom type (which must be compiled into the
    binary), plugins are process-level: an index whose schema names a
    plugin type must have it registered before reopening."""

    def __init__(
        self,
        name: str,
        norm_expr,
        norm_py,
        scan_regex: str | None = None,
    ):
        self.name = name
        self.norm_expr = norm_expr
        self.norm_py = norm_py
        self.scan_regex = scan_regex


CONTEXT_TYPE_REGISTRY: dict[str, ContextTypePlugin] = {}


def register_context_type(plugin: ContextTypePlugin) -> None:
    """Register a custom context type under its ctName. Built-in names
    are reserved; duplicate registration replaces (re-running a config
    script must be idempotent)."""
    if plugin.name in KNOWN_CTYPES:
        raise ValueError(f"context type {plugin.name!r} is built in")
    CONTEXT_TYPE_REGISTRY[plugin.name] = plugin


def is_known_ctype(ctype: str) -> bool:
    return ctype in KNOWN_CTYPES or ctype in CONTEXT_TYPE_REGISTRY


def context_norm_py(ctype: str):
    """Per-token query-side normalizer for a typed context (None for
    text types): built-ins from CONTEXT_NORMS_PY, then plugins."""
    ct = canonical_ctype(ctype)
    if ct in CONTEXT_NORMS_PY:
        return CONTEXT_NORMS_PY[ct]
    p = CONTEXT_TYPE_REGISTRY.get(ct)
    return p.norm_py if p is not None else None


def canonical_ctype(ctype: str) -> str:
    """Collapse reference wire names onto the storage type that
    implements them (identity for the native names)."""
    return CTYPE_ALIASES.get(ctype, ctype)


# JVM twin of the _DATE_FORMS grammar: same patterns with positional
# groups (Java regex has no (?P<>) syntax). Group maps index into each
# pattern's capture groups.
_J_TZ = r"(Z|[+-](?:0[0-9]|1[0-3]):[0-5][0-9])?"
_J_Y = r"([0-9]{4})"
_J_MO = r"(0[1-9]|1[0-2])"
_J_D = r"(0[1-9]|[12][0-9]|3[01])"
_J_HMS = (
    r"(?:([01][0-9]|2[0-3]):([0-5][0-9]):([0-5][0-9])(\.[0-9]+)?"
    r"|(24:00:00)(?:\.0+)?)"
)
_J_DATE_FORMS = [
    (
        rf"{_J_Y}-{_J_MO}-{_J_D}T{_J_HMS}{_J_TZ}",
        dict(y=1, mo=2, d=3, h=4, mi=5, s=6, fr=7, h24=8, tz=9),
    ),
    (rf"{_J_Y}-{_J_MO}-{_J_D}{_J_TZ}", dict(y=1, mo=2, d=3, tz=4)),
    (rf"{_J_Y}-{_J_MO}{_J_TZ}", dict(y=1, mo=2, tz=3)),
    (rf"{_J_Y}{_J_TZ}", dict(y=1, tz=2)),
    (rf"--{_J_MO}-{_J_D}{_J_TZ}", dict(mo=1, d=2, tz=3)),
    (rf"--{_J_MO}{_J_TZ}", dict(mo=1, tz=2)),
    (rf"---{_J_D}{_J_TZ}", dict(d=1, tz=2)),
]
_TS_MIN = "0001-01-01 00:00:00"
_TS_MAX = "9999-12-31 23:59:59"


def _date_form_value(t: Column, pat: str, gmap: dict[str, int]) -> Column:
    """Packed key for one date form, exactly date_norm_py's arithmetic
    as a Catalyst expression: calendar clip (least vs last_day), one
    midnight make_timestamp_ntz + timestampadd of time-of-day plus the
    reference's signed-ADD tz offset, date_format repack, fraction
    appended with trailing zeros dropped. NULL (dropped) when the
    shift leaves year 1..9999, matching the python twin."""
    full = "^" + pat + "$"

    def ex(key: str) -> Column | None:
        gi = gmap.get(key)
        return F.regexp_extract(t, full, gi) if gi else None

    def num(key: str, default: int) -> Column:
        e = ex(key)
        if e is None:
            return F.lit(default)
        return F.when(e == F.lit(""), F.lit(default)).otherwise(e.cast("int"))

    y, mo = num("y", 1), num("mo", 1)
    d = F.least(
        num("d", 1), F.dayofmonth(F.last_day(F.make_date(y, mo, F.lit(1))))
    )
    h24e = ex("h24")
    is24 = (h24e != F.lit("")) if h24e is not None else F.lit(False)
    secs = F.when(is24, F.lit(86400)).otherwise(
        num("h", 0) * 3600 + num("mi", 0) * 60 + num("s", 0)
    )
    tze = ex("tz")
    has_tz = tze != F.lit("")
    off_mag = (
        F.substring(tze, 2, 2).cast("int") * 3600
        + F.substring(tze, 5, 2).cast("int") * 60
    )
    off = (
        F.when(~has_tz | (tze == F.lit("Z")), F.lit(0))
        .when(F.substring(tze, 1, 1) == F.lit("-"), -off_mag)
        .otherwise(off_mag)
    )
    fre = ex("fr")
    if fre is not None:
        # DiffTime is Pico-resolution fixed point: fromRational floors
        # at 12 fraction digits (Data.Fixed), so the key keeps at most
        # the first 12
        fd = F.regexp_replace(F.substring(fre, 2, 12), "0+$", "")
        frac = F.when(
            (fre == F.lit("")) | (fd == F.lit("")), F.lit("")
        ).otherwise(F.concat(F.lit("_"), fd))
    else:
        frac = F.lit("")
    ts = F.timestamp_add(
        "SECOND",
        secs + off,
        F.make_timestamp_ntz(y, mo, d, F.lit(0), F.lit(0), F.lit(0)),
    )
    in_range = (ts >= F.lit(_TS_MIN).cast("timestamp_ntz")) & (
        ts <= F.lit(_TS_MAX).cast("timestamp_ntz")
    )
    leap_key = F.concat(
        F.lpad(y.cast("string"), 4, "0"),
        F.lpad(mo.cast("string"), 2, "0"),
        F.lpad(d.cast("string"), 2, "0"),
        F.lit("235960"),
    )
    return F.when(is24 & ~has_tz, leap_key).when(
        in_range, F.concat(F.date_format(ts, "yyyyMMddHHmmss"), frac)
    )


def _date_norm_expr(t: Column) -> Column:
    """date_norm_py as a pure-JVM CASE over the safeDateReaders form
    list — first matching form wins, unmatched tokens go NULL and are
    dropped by the array filter (parity pinned by a hypothesis
    property in tests/test_typed_contexts.py)."""
    expr: Column | None = None
    for pat, gmap in _J_DATE_FORMS:
        cond = t.rlike("^" + pat + "$")
        val = _date_form_value(t, pat, gmap)
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    return expr


def normalize_context_col(
    col: Column | str,
    ctype: str,
    scan_regex: str | None = None,
    chain: list[str] | None = None,
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
    plugin = CONTEXT_TYPE_REGISTRY.get(ctype)
    if plugin is not None and scan_regex is None:
        # a plugin's declared ctRegEx is its type-default scan
        scan_regex = plugin.scan_regex
    toks = (
        scan_tokens_col(c, scan_regex)
        if scan_regex is not None
        else F.split(c, r"\s+")
    )
    if chain:
        # cxNormalizer chain (Schema.hs:85, normalize' :247-249) runs
        # between scan+validate and the type's key layout
        toks = F.filter(
            F.transform(toks, lambda t: chain_norm_expr(t, chain)),
            lambda x: x.isNotNull(),
        )
    if plugin is not None:
        mapped = plugin.norm_expr(toks)
    elif ctype == "int":
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
        # the full readAnyDateM form set incl. tz shifts, calendar
        # clipping, fractional seconds and the 24:00:00 leap render —
        # one CASE expression per safeDateReaders entry (_date_norm_expr)
        mapped = F.transform(toks, _date_norm_expr)
    elif ctype == "geo":
        # the Arrow kernel whitespace-splits internally; a scan override
        # or normalizer chain pre-processes the tokens (lat-lon tokens
        # carry no spaces, so the space-join round-trips exactly)
        return _geo_norm_text_udf(
            F.array_join(toks, " ")
            if (scan_regex is not None or chain)
            else c
        )
    else:
        raise ValueError(
            f"unknown context type {ctype!r} — custom types must be "
            "registered via register_context_type before (re)opening "
            "the index (the extended-hunt model: the custom CType is "
            "compiled into the binary, hunt-demos Main.hs:65-71)"
        )
    return F.array_join(F.filter(mapped, lambda x: x.isNotNull()), " ")


@pandas_udf(StringType())
def _geo_norm_text_udf(text: pd.Series) -> pd.Series:
    def one(s: str | None) -> str | None:
        if s is None:
            return None
        out = [z for t in s.split() if (z := geo_norm_py(t)) is not None]
        return " ".join(out)

    return text.map(one)
