"""WSGI query service (reference: patapsco-web, bin/web.py:26-54). The app
is exercised directly through the WSGI contract — no socket needed — plus
one live-server smoke check over localhost."""

import json
import threading
import urllib.request
from wsgiref.simple_server import make_server

import pytest

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.service import make_app

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("svc") / "idx")
    docs = spark.createDataFrame(
        [("d1", "stream window join", "eng"),
         ("d2", "window filter scan", "eng"),
         ("d3", "cache probe vector", "eng")],
        "id string, text string, lang string")
    build_index(spark, docs, path, IndexConfig(text=RAW, num_shards=1))
    return path


def call(app, path, qs=""):
    status_h = {}

    def start_response(status, headers):
        status_h["status"] = status
        status_h["headers"] = dict(headers)

    body = b"".join(app({"PATH_INFO": path, "QUERY_STRING": qs},
                        start_response))
    return status_h["status"], json.loads(body)


def test_doc_route(spark, idx):
    app = make_app(spark, idx, text_cfg=RAW)
    status, doc = call(app, "/doc/d2")
    assert status == "200 OK"
    assert doc == {"id": "d2", "lang": "eng", "text": "window filter scan"}


def test_doc_404(spark, idx):
    app = make_app(spark, idx, text_cfg=RAW)
    status, body = call(app, "/doc/nope")
    assert status == "404 Not Found" and "error" in body


def test_query_route_and_params(spark, idx):
    app = make_app(spark, idx, text_cfg=RAW)
    status, hits = call(app, "/query/window")
    assert status == "200 OK"
    assert [h["doc_id"] for h in hits] == ["d1", "d2"]  # equal dl: docid tie-break
    assert hits[0]["rank"] == 0 and hits[0]["score"] > 0
    _, one = call(app, "/query/window", "k=1")
    assert len(one) == 1
    status, hits = call(app, "/query/window AND scan", "mode=boolean")
    assert [h["doc_id"] for h in hits] == ["d2"]
    status, _ = call(app, "/query/x", "mode=wat")
    assert status == "400 Bad Request"


def test_unknown_route(spark, idx):
    app = make_app(spark, idx, text_cfg=RAW)
    assert call(app, "/nope")[0] == "404 Not Found"


def test_live_server_smoke(spark, idx):
    app = make_app(spark, idx, text_cfg=RAW)
    srv = make_server("127.0.0.1", 0, app)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.handle_request, daemon=True)
    t.start()
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/query/stream") as r:
        hits = json.loads(r.read())
    assert hits and hits[0]["doc_id"] == "d1"
    t.join(timeout=30)
    srv.server_close()
