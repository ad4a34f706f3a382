#!/usr/bin/env python
"""CLI query + web service over a built index — the rebuild of the
reference's ``patapsco-query`` (/root/reference/patapsco/bin/query.py:10-76)
and ``patapsco-web`` (bin/web.py) entry points.

One-shot query (prints "doc_id\\tscore" lines, like the reference CLI):

    spark-submit --py-files patapsco_spark.zip tools/serve.py \\
        --index /path/to/idx --query "data stream window" [--bool] \\
        [--qld --mu 1000] [--stem porter --stopwords lucene] [--count 10]

Web service (GET /doc/<id>, GET /query/<text>?k=10&mode=boolean):

    ... tools/serve.py --index /path/to/idx --port 8080
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description="Query a patapsco_spark index.")
    p.add_argument("-i", "--index", required=True)
    p.add_argument("-q", "--query", help="one-shot query string")
    p.add_argument("--port", type=int, help="serve HTTP instead of one-shot")
    p.add_argument("--query_lang", default="eng")
    p.add_argument("--stem", default=None, choices=[None, "porter"])
    p.add_argument("--stopwords", default=None, choices=[None, "lucene", "baidu"])
    p.add_argument("-c", "--count", type=int, default=10)
    p.add_argument("--bool", action="store_true", dest="boolean",
                   help="boolean/Lucene query syntax")
    p.add_argument("--k1", type=float, default=0.9)
    p.add_argument("--b", type=float, default=0.4)
    p.add_argument("--qld", action="store_true")
    p.add_argument("--mu", type=int, default=1000)
    args = p.parse_args()

    from patapsco_spark.config import RetrieveConfig, TextConfig
    from patapsco_spark.session import get_spark

    spark = get_spark(app="patapsco-spark-serve")
    text_cfg = TextConfig(stem=args.stem, stopwords=args.stopwords)
    cfg = RetrieveConfig(name="qld" if args.qld else "bm25", k=args.count,
                         k1=args.k1, b=args.b, mu=args.mu)

    if args.port:
        from patapsco_spark.service import serve
        serve(spark, args.index, args.port, text_cfg=text_cfg,
              lang=args.query_lang, cfg=cfg)
        return
    if not args.query:
        p.error("--query or --port is required")

    from patapsco_spark.operators.retrieve import search_texts
    res = search_texts(spark, args.index, [("1", args.query)], cfg,
                       text_cfg=text_cfg, lang=args.query_lang,
                       mode="boolean" if args.boolean else "plain")
    rows = res.collect()
    if not rows:
        print("No results")
    for r in rows:
        print(f"{r['doc_id']}\t{r['score']}")


if __name__ == "__main__":
    main()
