"""Typed Python client (hunt_spark/client.py) — hunt-client parity
(hunt-client/src/Hunt/Client.hs:1-188 verb set), driven against a live
HuntServer socket. Results must come back as typed dataclasses with
the reference's LimitedResult/RankedDoc/Suggestion shapes."""

from __future__ import annotations

import pytest

from hunt_spark.client import (
    ApiDocument,
    CmdResult,
    HuntClient,
    HuntClientError,
    LimitedResult,
    RankedDoc,
    Suggestion,
)
from hunt_spark.engine import HuntEngine
from hunt_spark.operators.build import BuildConfig
from hunt_spark.plans.ast import QFullWord, qand, qcontext
from hunt_spark.server import HuntServer
from hunt_spark.sources.corpus import corpus_df

from conftest import context_cols_from_html


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("client_index"))
    eng = HuntEngine(
        spark, root, BuildConfig(n_shards=4, salt_buckets=2, block_size=256)
    )
    eng.build(
        corpus_df(spark, 120, partitions=2),
        context_cols_from_html(),
        build_id="client",
    )
    srv = HuntServer(eng).start()
    yield srv
    srv.shutdown()


@pytest.fixture(scope="module")
def client(server) -> HuntClient:
    return HuntClient(f"http://127.0.0.1:{server.port}")


def test_search_returns_typed_limited_result(client):
    res = client.search("!the", limit=5)
    assert isinstance(res, LimitedResult)
    assert res.max == 5 and res.count >= len(res.result) > 0
    top = res.result[0]
    assert isinstance(top, RankedDoc)
    assert top.uri.startswith("https://") and top.score > 0
    assert isinstance(top.description, dict)
    # iteration + len sugar
    assert len(res) == len(list(res))


def test_search_pagination_keeps_total_count(client):
    full = client.search("!the", limit=-1)
    page = client.search("!the", offset=2, limit=3)
    assert page.count == full.count  # lrCount = total before the page
    assert [d.uri for d in page] == [d.uri for d in full][2:5]


def test_search_accepts_structured_query_ast(client):
    """search takes a Query (the reference's typed search), not just
    text — AST nodes are printed to the Grammar.hs text form."""
    q = qcontext(["body"], qand(QFullWord("pinky"), QFullWord("brain")))
    typed = client.search(q, limit=5)
    text = client.search("body:('pinky' 'brain')", limit=5)
    assert [d.uri for d in typed] == [d.uri for d in text] and typed.result


def test_search_text_parses_client_side(client):
    ok = client.search_text("!the", limit=3)
    assert ok.result
    with pytest.raises(HuntClientError) as ei:
        client.search_text('"unterminated')
    assert ei.value.code == 400  # parseQuery' 400-shaped DecodeFailure


def test_complete_returns_suggestions(client):
    sug = client.complete("bra", limit=3)
    assert len(sug) == 3 and all(isinstance(s, Suggestion) for s in sug)
    assert all(s.word.lower().startswith("bra") for s in sug)
    assert sug[0].score >= sug[-1].score
    # completeAll = unlimited (server still clamps at max_k)
    assert len(client.complete_all("bra")) >= len(sug)


def test_document_lifecycle_roundtrip(client):
    doc = ApiDocument(
        uri="https://example.org/client/new",
        index={"body": "xylograph quartzite client"},
        description={"kind": "client-test"},
    )
    client.insert_doc(doc)
    hit = client.search("'xylograph'", limit=5)
    assert [d.uri for d in hit] == [doc.uri]
    assert hit.result[0].description == {"kind": "client-test"}
    # 409 on re-insert (insertDoc of a known URI)
    with pytest.raises(HuntClientError) as ei:
        client.insert_doc(doc)
    assert ei.value.code == 409
    # update re-indexes
    client.update_doc(
        ApiDocument(uri=doc.uri, index={"body": "zymurgy replaces it"})
    )
    assert client.search("'zymurgy'", limit=5).count == 1
    assert client.search("'xylograph'", limit=5).count == 0
    # remove by bare URI
    client.remove_doc(doc.uri)
    assert client.search("'zymurgy'", limit=5).count == 0


def test_eval_command(client):
    r = client.eval_command({"cmd": "status", "status": "index"})
    assert isinstance(r, CmdResult) and r.code == 0


def test_get_weight_and_select(client):
    w = client.get_weight("'the'")
    assert w.result and all(d.weight is not None for d in w)
    s = client.select("'the'")
    assert s.count == w.count


def test_status_verbs(client):
    for r in (client.gc_status(), client.doctable_status(),
              client.index_status(), client.context_status("body")):
        assert isinstance(r, CmdResult) and r.code == 0
    with pytest.raises(HuntClientError) as ei:
        client.context_status("nope")
    assert ei.value.code == 404


def test_connection_error_message(tmp_path):
    c = HuntClient("http://127.0.0.1:1", timeout=2)
    with pytest.raises(HuntClientError) as ei:
        c.index_status()
    assert "Hunt server is running" in str(ei.value)
