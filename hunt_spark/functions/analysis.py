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
