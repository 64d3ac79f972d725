"""hunt-cli parity: a thin HTTP client for a running hunt_spark server
(reference verb set: hunt-cli/src/Hunt/CLI/Command.hs:18-31 and
Command/Client.hs:37-45 — eval / search / complete / make-schema /
make-insert / from-csv; `server` maps to scripts/serve_index.py).

    python -m hunt_spark.cli search  [-s URL] [--offset N] [--limit N] QUERY
    python -m hunt_spark.cli complete [-s URL] [--limit N] QUERY
    python -m hunt_spark.cli eval    [-s URL] FILE      # JSON command (file or '-')
    python -m hunt_spark.cli make-schema FILE           # docs -> insert-context cmds
    python -m hunt_spark.cli make-insert FILE           # docs -> insert Sequence
    python -m hunt_spark.cli from-csv FILE              # csv -> ApiDocument list
    python -m hunt_spark.cli parse QUERY                # text query -> Query JSON
                                                        # (the cli-query-parser demo)

Pure stdlib (urllib) on purpose: the CLI must work anywhere the server
does, with no Spark on the client side. All output is pretty-printed
JSON on stdout; errors go to stderr with exit code 1 (the reference's
formatError split)."""

from __future__ import annotations

import argparse
import csv
import json
import sys
import urllib.parse

DEFAULT_URL = "http://localhost:3000"


class CliError(Exception):
    pass


def _request(base: str, method: str, path: str, payload=None):
    """Raw JSON round-trip via the typed client's transport
    (hunt_spark.client.HuntClient.request — the CLI keeps raw dicts to
    pretty-print the wire form verbatim; typed users want HuntClient's
    dataclass surface instead)."""
    from hunt_spark.client import HuntClient, HuntClientError

    try:
        return HuntClient(base).request(method, path, payload)
    except HuntClientError as e:
        raise CliError(str(e)) from e


def _read_json(path: str):
    try:
        raw = sys.stdin.read() if path == "-" else open(path).read()
    except OSError as e:
        raise CliError(str(e)) from e
    try:
        return json.loads(raw)
    except ValueError as e:
        raise CliError(f"JSON parsing failed with err:\n{e}") from e


def _as_documents(j) -> list[dict]:
    """insertCmdsToDocuments (ClientInterface.hs:419-422): accept a
    bare ApiDocument list, a single insert command, or a (nested)
    Sequence of commands, and extract the ApiDocuments."""
    if isinstance(j, list):
        out: list[dict] = []
        for item in j:
            out.extend(_as_documents(item))
        return out
    if isinstance(j, dict):
        if j.get("cmd") == "insert":
            return [j.get("document") or {}]
        if "uri" in j:
            return [j]
    return []


def cmd_eval(args) -> dict:
    return _request(args.base_url, "POST", "/eval", _read_json(args.file))


def cmd_search(args) -> dict:
    # offset/limit are Maybe in the reference client — omit when not
    # given so the server's own defaults apply
    params = {}
    if args.offset is not None:
        params["offset"] = args.offset
    if args.limit is not None:
        params["limit"] = args.limit
    qs = ("?" + urllib.parse.urlencode(params)) if params else ""
    return _request(
        args.base_url, "GET",
        f"/search/{urllib.parse.quote(args.query, safe='')}{qs}",
    )


def cmd_complete(args) -> dict:
    return _request(
        args.base_url, "GET",
        f"/completion/{urllib.parse.quote(args.query, safe='')}?limit={args.limit}",
    )


def cmd_make_schema(args) -> list[dict]:
    # createContextCommands (ClientInterface.hs:313-317): one
    # insert-context with the default schema per distinct context name,
    # first-seen order (nub)
    names: list[str] = []
    for d in _as_documents(_read_json(args.file)):
        for cx in (d.get("index") or {}):
            if cx not in names:
                names.append(cx)
    return [
        {"cmd": "insert-context", "context": cx,
         "schema": {"type": "text", "weight": 1.0}}
        for cx in names
    ]


def cmd_make_insert(args) -> list[dict]:
    # cmdSequence . fmap cmdInsertDoc (Command/Client.hs:184-186)
    return [
        {"cmd": "insert", "document": d}
        for d in _as_documents(_read_json(args.file))
    ]


def cmd_from_csv(args) -> list[dict]:
    """CSV -> ApiDocument list: the 'uri' column is the key, every
    other column becomes both a description field and an index context
    value. (The reference declares this verb 'not supported yet',
    Command/Client.hs:188-193 — this is the obvious completion of it.)"""
    try:
        f = sys.stdin if args.file == "-" else open(args.file, newline="")
    except OSError as e:
        raise CliError(str(e)) from e
    with f:
        rows = list(csv.DictReader(f))
    if rows and "uri" not in rows[0]:
        raise CliError("CSV needs a 'uri' column")
    return [
        {
            "uri": r["uri"],
            "description": {k: v for k, v in r.items() if k != "uri"},
            "index": {k: v for k, v in r.items() if k != "uri"},
        }
        for r in rows
    ]


def cmd_parse(args) -> dict:
    """Text query -> structured Query JSON (the cli-query-parser demo,
    hunt-demos/cli-query-parser/src/Main.hs:16-29: parseQuery then
    encodePretty; invalid input reports 'Invalid input: <err>'). Offline
    — the same wire shape POST /eval accepts as {"cmd":"search"}."""
    from hunt_spark.plans.ast import query_to_json
    from hunt_spark.plans.parser import ParseError, parse_query

    try:
        return query_to_json(parse_query(args.query))
    except ParseError as e:
        raise CliError(f"Invalid input: {e}") from e


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="hunt_spark.cli",
        description="Client for a running hunt_spark server (hunt-cli parity)",
    )
    sub = ap.add_subparsers(dest="verb", required=True)

    def server_opt(p):
        p.add_argument(
            "-s", "--base-url", default=DEFAULT_URL,
            help=f"Base URL of the Hunt server. Defaults to {DEFAULT_URL}",
        )

    p = sub.add_parser("eval", help="Evaluate command in a given file on the Hunt server")
    server_opt(p)
    p.add_argument("file", metavar="FILE", help="File with the JSON command ('-' = stdin)")
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("search", help="Search the Hunt server for a given query")
    server_opt(p)
    p.add_argument("--offset", type=int, default=None,
                   help="Offset from which to start listing results")
    p.add_argument("--limit", type=int, default=None,
                   help="Maximum number of results")
    p.add_argument("query", metavar="QUERY")
    p.set_defaults(fn=cmd_search)

    p = sub.add_parser("complete", help="Retrieve completion proposals for a given query")
    server_opt(p)
    p.add_argument("--limit", type=int, default=20)
    p.add_argument("query", metavar="QUERY")
    p.set_defaults(fn=cmd_complete)

    p = sub.add_parser("make-schema", help="Print JSON schema for a document")
    p.add_argument("file", metavar="FILE")
    p.set_defaults(fn=cmd_make_schema)

    p = sub.add_parser("make-insert", help="Print JSON command for insertion of document")
    p.add_argument("file", metavar="FILE")
    p.set_defaults(fn=cmd_make_insert)

    p = sub.add_parser("from-csv", help="Convert CSV to JSON and print the result")
    p.add_argument("file", metavar="FILE")
    p.set_defaults(fn=cmd_from_csv)

    p = sub.add_parser(
        "parse", help="Parse a text query and print its JSON wire form"
    )
    p.add_argument("query", metavar="QUERY")
    p.set_defaults(fn=cmd_parse)
    return ap


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    try:
        out = args.fn(args)
    except CliError as e:
        print(str(e), file=sys.stderr)
        return 1
    print(json.dumps(out, indent=2, sort_keys=False))
    return 0


if __name__ == "__main__":
    sys.exit(main())
