"""Interactive query service — the rebuild of the reference's
``patapsco-web`` (/root/reference/patapsco/bin/web.py:26-54: flask routes
``/doc/<id>`` and ``/query/<query>`` over a run's database + retriever) as a
dependency-free WSGI app, plus the library entry the reference's
``patapsco-query`` CLI wraps (bin/query.py:10-76 — see tools/serve.py).

Routes:

- ``GET /doc/<id>``     → ``{"id", "lang", "text"}`` from the doc store
  (the analyzed/ table — what DatabaseWriter stores, database.py:99-101);
  404 if absent.
- ``GET /query/<text>`` → JSON list of ``{"rank", "doc_id", "score"}``.
  Optional query params: ``k`` (depth), ``mode`` (plain|boolean).

Spark usage per request mirrors the reference's per-request Lucene
search/sqlite get: one partition-pruned predicate-pushed job each — the
service is an interactive front-end, not a batch path.
"""

from __future__ import annotations

import json
from urllib.parse import parse_qs, unquote

from pyspark.sql import SparkSession

from .config import RetrieveConfig, TextConfig
from .operators.rerank import lookup_docs
from .operators.retrieve import search_texts


def make_app(spark: SparkSession, index_path: str,
             text_cfg: TextConfig | None = None, lang: str = "eng",
             cfg: RetrieveConfig | None = None):
    """Build the WSGI app bound to one index (cheap — no state beyond config)."""
    text_cfg = text_cfg or TextConfig()
    base_cfg = cfg or RetrieveConfig()

    def respond(start_response, status: str, payload):
        body = json.dumps(payload).encode("utf-8")
        start_response(status, [("Content-Type", "application/json"),
                                ("Access-Control-Allow-Origin", "*"),
                                ("Content-Length", str(len(body)))])
        return [body]

    def app(environ, start_response):
        path = unquote(environ.get("PATH_INFO", ""))
        params = parse_qs(environ.get("QUERY_STRING", ""))
        if path.startswith("/doc/"):
            doc_id = path[len("/doc/"):]
            rows = lookup_docs(spark, index_path, [doc_id]).collect()
            if not rows:
                return respond(start_response, "404 Not Found",
                               {"error": f"doc {doc_id} not found"})
            r = rows[0]
            return respond(start_response, "200 OK",
                           {"id": r["id"], "lang": r["lang"],
                            "text": r["original_text"]})
        if path.startswith("/query/"):
            qtext = path[len("/query/"):]
            try:
                k = int(params.get("k", [base_cfg.k])[0])
            except ValueError:
                k = -1
            if k < 1:
                return respond(start_response, "400 Bad Request",
                               {"error": "k must be a positive integer"})
            mode = params.get("mode", ["plain"])[0]
            if mode not in ("plain", "boolean"):
                return respond(start_response, "400 Bad Request",
                               {"error": f"unknown mode {mode}"})
            rcfg = RetrieveConfig(name=base_cfg.name, k=k, k1=base_cfg.k1,
                                  b=base_cfg.b, mu=base_cfg.mu)
            res = search_texts(spark, index_path, [("web", qtext)], rcfg,
                               text_cfg=text_cfg, lang=lang, mode=mode)
            hits = [{"rank": int(r["rank"]), "doc_id": r["doc_id"],
                     "score": float(r["score"])} for r in res.collect()]
            return respond(start_response, "200 OK", hits)
        return respond(start_response, "404 Not Found", {"error": "not found"})

    return app


def serve(spark: SparkSession, index_path: str, port: int,
          host: str = "0.0.0.0", **kwargs) -> None:
    """Run the service with the stdlib WSGI server (reference: app.run)."""
    from wsgiref.simple_server import make_server

    with make_server(host, port, make_app(spark, index_path, **kwargs)) as srv:
        srv.serve_forever()
