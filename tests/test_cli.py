"""CLI client (hunt_spark/cli.py) — hunt-cli verb parity
(hunt-cli/src/Hunt/CLI/Command/Client.hs:37-45), driven against a live
HuntServer socket plus the offline file verbs."""

from __future__ import annotations

import json

import pytest

from hunt_spark.cli import main as cli_main
from hunt_spark.engine import HuntEngine
from hunt_spark.operators.build import BuildConfig
from hunt_spark.server import HuntServer
from hunt_spark.sources.corpus import corpus_df

from conftest import context_cols_from_html


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cli_index"))
    eng = HuntEngine(
        spark, root, BuildConfig(n_shards=4, salt_buckets=2, block_size=256)
    )
    eng.build(
        corpus_df(spark, 120, partitions=2),
        context_cols_from_html(),
        build_id="cli",
    )
    srv = HuntServer(eng).start()
    yield srv
    srv.shutdown()


def run_cli(capsys, *argv) -> tuple[int, str, str]:
    rc = cli_main(list(argv))
    cap = capsys.readouterr()
    return rc, cap.out, cap.err


def base(srv) -> str:
    return f"http://127.0.0.1:{srv.port}"


def test_search_verb(server, capsys):
    rc, out, _ = run_cli(
        capsys, "search", "-s", base(server), "--limit", "5", "!the"
    )
    assert rc == 0
    body = json.loads(out)
    assert set(body) == {"result", "offset", "max", "count"}
    assert body["max"] == 5 and body["result"]


def test_complete_verb(server, capsys):
    rc, out, _ = run_cli(
        capsys, "complete", "-s", base(server), "--limit", "3", "bra"
    )
    assert rc == 0
    pairs = json.loads(out)
    assert pairs and all(len(p) == 2 for p in pairs)


def test_eval_verb_batch_file(server, capsys, tmp_path):
    # an eval file with a Sequence: insert two docs then search them —
    # the reference's batch-loading workflow (Eval + cmdSequence)
    cmds = [
        {"cmd": "insert", "document": {
            "uri": "cli://doc1", "index": {"body": "zweisamkeit rules"}}},
        {"cmd": "insert", "document": {
            "uri": "cli://doc2", "index": {"body": "zweisamkeit again"}}},
        {"cmd": "search", "query": "'zweisamkeit'", "max": 10},
    ]
    f = tmp_path / "cmds.json"
    f.write_text(json.dumps(cmds))
    rc, out, _ = run_cli(capsys, "eval", "-s", base(server), str(f))
    assert rc == 0
    res = json.loads(out)
    uris = {r["uri"] for r in res["res"]["result"]}
    assert uris == {"cli://doc1", "cli://doc2"}


def test_make_insert_and_schema_roundtrip(capsys, tmp_path):
    docs = [
        {"uri": "u1", "index": {"title": "a", "body": "b"}},
        {"uri": "u2", "index": {"body": "c"}},
    ]
    f = tmp_path / "docs.json"
    f.write_text(json.dumps(docs))
    rc, out, _ = run_cli(capsys, "make-insert", str(f))
    assert rc == 0
    seq = json.loads(out)
    assert [c["cmd"] for c in seq] == ["insert", "insert"]
    assert [c["document"]["uri"] for c in seq] == ["u1", "u2"]
    # make-schema accepts the insert Sequence too (insertCmdsToDocuments)
    f2 = tmp_path / "cmds.json"
    f2.write_text(json.dumps(seq))
    for src in (f, f2):
        rc, out, _ = run_cli(capsys, "make-schema", str(src))
        assert rc == 0
        cmds = json.loads(out)
        # nub keeps first-seen context order
        assert [c["context"] for c in cmds] == ["title", "body"]
        assert all(c["cmd"] == "insert-context" for c in cmds)


def test_from_csv(capsys, tmp_path):
    f = tmp_path / "docs.csv"
    f.write_text("uri,title,body\nu1,hello,world\nu2,foo,bar\n")
    rc, out, _ = run_cli(capsys, "from-csv", str(f))
    assert rc == 0
    docs = json.loads(out)
    assert docs[0] == {
        "uri": "u1",
        "description": {"title": "hello", "body": "world"},
        "index": {"title": "hello", "body": "world"},
    }


def test_http_error_surfaces(server, capsys):
    rc, out, err = run_cli(
        capsys, "search", "-s", base(server), "'unclosed"
    )
    assert rc == 1 and not out and "code 400" in err


def test_connection_error_message(capsys):
    rc, _, err = run_cli(
        capsys, "search", "-s", "http://127.0.0.1:1", "'x'"
    )
    assert rc == 1 and "server is running" in err


def test_bad_json_file(capsys, tmp_path):
    f = tmp_path / "bad.json"
    f.write_text("{nope")
    rc, _, err = run_cli(capsys, "make-insert", str(f))
    assert rc == 1 and "JSON parsing failed" in err


def test_parse_verb(capsys):
    # the cli-query-parser demo (hunt-demos/cli-query-parser/Main.hs):
    # text query -> pretty-printed Query JSON wire shape, offline
    rc = cli_main(["parse", "when:[2013-01-01T00:00:00+02:00 TO 2014] AND !Brain"])
    out = capsys.readouterr().out
    assert rc == 0
    j = json.loads(out)
    assert j["type"] == "seq" and j["op"] == "and"
    # wire shapes per Grammar.hs ToJSON — round-trip through the parser
    from hunt_spark.plans.ast import query_from_json
    from hunt_spark.plans.parser import parse_query

    assert query_from_json(j) == parse_query(
        "when:[2013-01-01T00:00:00+02:00 TO 2014] AND !Brain"
    )


def test_parse_verb_invalid(capsys):
    rc = cli_main(["parse", "a AND ("])
    cap = capsys.readouterr()
    assert rc == 1
    assert "Invalid input:" in cap.err
