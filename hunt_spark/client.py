"""Typed Python client for a running hunt_spark server — the
hunt-client parity module (reference verb set:
hunt-client/src/Hunt/Client.hs:1-188; wire shapes
hunt-api ApiDocument.hs:118-158, Command.hs:162-250).

Mirrors the reference's typed functions one-for-one:

  ================  =============================================
  Hunt.Client       HuntClient
  ================  =============================================
  search            search(query, offset=None, limit=None)
  searchText        search_text(text, offset=None, limit=None)
  complete          complete(query, limit=None)
  completeText      complete_text(text, limit=None)
  completeAll       complete_all(query)
  insertDoc         insert_doc(doc)
  updateDoc         update_doc(doc)
  removeDoc         remove_doc(doc)
  eval              eval_command(cmd)
  getWeight         get_weight(query)
  select            select(query)
  gcStatus          gc_status()
  doctableStatus    doctable_status()
  indexStatus       index_status()
  contextStatus     context_status(name)
  ================  =============================================

Results come back as typed objects (LimitedResult / RankedDoc /
Suggestion / CmdResult dataclasses), not raw dicts — the point of the
module vs the CLI's pass-through JSON. Queries may be given as text
(server-side parse, like the GET routes) or as a structured AST node
from hunt_spark.plans.ast (printed to the reference's text form with
print_query, Grammar.hs round-trip). search_text/complete_text parse
client-side first, mirroring the reference's parseQuery' helper which
fails with a 400-shaped DecodeFailure before any request is made
(Client.hs:171-188).

Pure stdlib (urllib) on purpose — a client must work anywhere the
server does, with no Spark installed. The CLI (hunt_spark.cli) is a
thin shell over this module.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request
from dataclasses import dataclass, field

DEFAULT_URL = "http://localhost:3000"


class HuntClientError(Exception):
    """Transport or server error; ``code`` is the HTTP status (0 for
    connection-level failures, 400 for client-side parse failures)."""

    def __init__(self, code: int, msg: str):
        super().__init__(msg)
        self.code = code


@dataclass(frozen=True)
class RankedDoc:
    """RankedDoc (Query/Intermediate.hs:386-392): document + score;
    ``weight`` only populated by the /weight route."""

    uri: str
    score: float
    description: dict[str, str] = field(default_factory=dict)
    weight: float | None = None

    @classmethod
    def from_json(cls, j: dict) -> "RankedDoc":
        return cls(
            uri=j["uri"],
            score=float(j.get("score", 0.0)),
            description=dict(j.get("description") or {}),
            weight=j.get("weight"),
        )


@dataclass(frozen=True)
class LimitedResult:
    """LimitedResult (ApiDocument.hs:60,72-81): one result page plus
    the TRUE total hit count before offset/limit (lrCount) — what
    clients paginate by. ``max`` < 0 means unlimited."""

    result: list[RankedDoc]
    offset: int
    max: int
    count: int

    @classmethod
    def from_json(cls, j: dict) -> "LimitedResult":
        return cls(
            result=[RankedDoc.from_json(d) for d in j.get("result", [])],
            offset=int(j.get("offset", 0)),
            max=int(j.get("max", -1)),
            count=int(j.get("count", 0)),
        )

    def __iter__(self):
        return iter(self.result)

    def __len__(self) -> int:
        return len(self.result)


@dataclass(frozen=True)
class Suggestion:
    """One completion proposal (word, score) — the reference's
    Suggestion pairs."""

    word: str
    score: float


@dataclass(frozen=True)
class CmdResult:
    """CmdResult envelope (Command.hs:227-250): code 0 = ResOK with
    ``res`` payload; anything else would have raised HuntClientError."""

    code: int
    res: object = None


@dataclass(frozen=True)
class ApiDocument:
    """ApiDocument (ApiDocument.hs:118-158). ``weight=None`` is the
    reference's noScore — the key is omitted on the wire."""

    uri: str
    index: dict[str, str] = field(default_factory=dict)
    description: dict[str, str] = field(default_factory=dict)
    weight: float | None = None

    def to_json(self) -> dict:
        j: dict = {"uri": self.uri, "index": dict(self.index),
                   "description": dict(self.description)}
        if self.weight is not None:
            j["weight"] = self.weight
        return j


def _doc_json(doc) -> dict:
    if isinstance(doc, ApiDocument):
        return doc.to_json()
    if isinstance(doc, dict):
        return doc
    raise TypeError(f"expected ApiDocument or dict, got {type(doc).__name__}")


def _query_text(query) -> str:
    """Accept a text query as-is, or print a structured AST node to the
    reference's text grammar (print_query round-trips Grammar.hs)."""
    if isinstance(query, str):
        return query
    from hunt_spark.plans.ast import print_query

    return print_query(query)


class HuntClient:
    """Typed client bound to one server base URL (withBaseUrl /
    huntBaseUrl, Client.hs:60-69; default localhost:3000 like the
    reference)."""

    def __init__(
        self, base_url: str = DEFAULT_URL, timeout: float | None = None
    ):
        # timeout=None (block like the reference client and the pre-
        # client CLI did) is the right default: /eval batch inserts
        # against a Spark-backed engine routinely run minutes, and an
        # aborted wait leaves the server-side mutation running — the
        # retry then 409s on the duplicate URI
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout

    # -- transport ------------------------------------------------------

    def request(self, method: str, path: str, payload=None):
        """Raw JSON round-trip (the CLI uses this directly to preserve
        pass-through output). Raises HuntClientError on HTTP errors,
        connection failures, and non-JSON bodies."""
        url = self.base_url + path
        data = None if payload is None else json.dumps(payload).encode()
        req = urllib.request.Request(
            url, data=data, method=method,
            headers={"Content-Type": "application/json"} if data else {},
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                body = r.read()
            try:
                return json.loads(body)
            except json.JSONDecodeError as e:
                # a proxy error page / wrong port answering 200 with
                # HTML — surface the body, not a traceback
                raise HuntClientError(
                    0,
                    "Server returned a non-JSON response body\n\n> "
                    + body.decode(errors="replace")[:500],
                ) from e
        except urllib.error.HTTPError as e:
            body = e.read().decode(errors="replace")
            raise HuntClientError(
                e.code,
                f"Request failed with code {e.code} and response body"
                f"\n\n> {body}",
            ) from e
        except urllib.error.URLError as e:
            raise HuntClientError(
                0,
                "Are you sure the Hunt server is running under the given "
                f"URL? Here is the full error\n\n> {e.reason}",
            ) from e

    def _get(self, path: str):
        return self.request("GET", path)

    @staticmethod
    def _quote(q: str) -> str:
        return urllib.parse.quote(q, safe="")

    # -- search ---------------------------------------------------------

    def search(self, query, offset: int | None = None,
               limit: int | None = None) -> LimitedResult:
        """GET /search/:query?offset&limit (search', Client.hs:98).
        offset/limit are Maybe in the reference — omitted params get
        the server's defaults; limit=-1 asks for everything the server
        will serve."""
        params = {}
        if offset is not None:
            params["offset"] = offset
        if limit is not None:
            params["limit"] = limit
        qs = ("?" + urllib.parse.urlencode(params)) if params else ""
        return LimitedResult.from_json(
            self._get(f"/search/{self._quote(_query_text(query))}{qs}")
        )

    def search_text(self, text: str, offset: int | None = None,
                    limit: int | None = None) -> LimitedResult:
        """searchText (Client.hs:88-91): parse client-side first —
        invalid text fails with a 400-shaped error before any request
        (parseQuery', Client.hs:171-188)."""
        return self.search(self._parse(text), offset, limit)

    # -- completion -----------------------------------------------------

    def complete(self, query, limit: int | None = None) -> list[Suggestion]:
        """GET /completion/:query?limit (complete, Client.hs:110)."""
        qs = f"?limit={limit}" if limit is not None else ""
        raw = self._get(f"/completion/{self._quote(_query_text(query))}{qs}")
        return [Suggestion(word=w, score=float(s)) for w, s in raw]

    def complete_text(self, text: str,
                      limit: int | None = None) -> list[Suggestion]:
        return self.complete(self._parse(text), limit)

    def complete_all(self, query) -> list[Suggestion]:
        """completeAll (Client.hs:113-115): unlimited (the server still
        clamps to its own max_k serving cap)."""
        return self.complete(query, limit=-1)

    # -- documents ------------------------------------------------------

    def insert_doc(self, doc: ApiDocument | dict) -> None:
        """POST /document (insertDoc). 409 on an already-indexed URI."""
        self.request("POST", "/document", _doc_json(doc))

    def update_doc(self, doc: ApiDocument | dict) -> None:
        """PUT /document (updateDoc): re-index + merge description."""
        self.request("PUT", "/document", _doc_json(doc))

    def remove_doc(self, doc: ApiDocument | dict | str) -> None:
        """DELETE /document (removeDoc); accepts a bare URI too."""
        j = {"uri": doc} if isinstance(doc, str) else _doc_json(doc)
        self.request("DELETE", "/document", j)

    # -- eval -----------------------------------------------------------

    def eval_command(self, cmd: dict) -> CmdResult:
        """POST /eval with an arbitrary Command (or Sequence) in wire
        form (eval, Client.hs:125-128)."""
        j = self.request("POST", "/eval", cmd)
        return CmdResult(code=int(j.get("code", 0)), res=j.get("res"))

    # -- weight / select ------------------------------------------------

    def get_weight(self, query) -> LimitedResult:
        """GET /weight/:query (getWeight): unlimited search whose
        RankedDocs carry document weights."""
        return LimitedResult.from_json(
            self._get(f"/weight/{self._quote(_query_text(query))}")
        )

    def select(self, query) -> LimitedResult:
        """GET /select/:query (select): unscored, unlimited."""
        return LimitedResult.from_json(
            self._get(f"/select/{self._quote(_query_text(query))}")
        )

    # -- status ---------------------------------------------------------

    def gc_status(self) -> CmdResult:
        return self._status("/status/gc")

    def doctable_status(self) -> CmdResult:
        return self._status("/status/doctable")

    def index_status(self) -> CmdResult:
        return self._status("/status/index")

    def context_status(self, name: str) -> CmdResult:
        """GET /status/context/:name (contextStatus — 'experimental'
        in the reference)."""
        return self._status(f"/status/context/{self._quote(name)}")

    def _status(self, path: str) -> CmdResult:
        j = self._get(path)
        return CmdResult(code=int(j.get("code", 0)), res=j.get("res"))

    # -- helpers --------------------------------------------------------

    @staticmethod
    def _parse(text: str):
        """parseQuery' (Client.hs:171-188): client-side text->Query,
        surfacing parse failures as a 400-coded client error."""
        from hunt_spark.plans.parser import ParseError, parse_query

        try:
            return parse_query(text)
        except ParseError as e:
            raise HuntClientError(400, f"Invalid input: {e}") from e
