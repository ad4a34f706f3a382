"""Warm-query Spark-job-count guards.

The round-6 continuation removed definition-time jobs from every query
path: parquet schema-inference jobs (plans/pqread supplies the footer
schema driver-side) and the term-stats Exchange (single-committed-segment
fast path collects in one job). None of that is visible in the final
DataFrame's explain output — the removed jobs ran at *definition* time —
so this guard pins the observable effect instead: a warm top-k search
must stay within its measured job budget (8 jobs as of the change; 14
before it). A regression that re-introduces per-read inference jobs or
an extra stats job trips the bound."""


def test_warm_search_job_budget(spark, tmp_path):
    from pyspark.sql import functions as F

    from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
    from patapsco_spark.operators.indexer import build_index
    from patapsco_spark.operators.retrieve import search_texts

    docs = spark.createDataFrame(
        [(str(i), f"alpha beta gamma doc{i} delta word{i % 7}")
         for i in range(300)],
        "id string, text string")
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(text=TextConfig(stem=None, stopwords=None,
                                      lowercase=True), num_shards=2)
    build_index(spark, docs, idx, cfg, resume=False)

    def run(tag):
        sc = spark.sparkContext
        sc.setJobGroup(tag, tag)
        res = search_texts(spark, idx, [("q1", "alpha delta")],
                           RetrieveConfig(k=5),
                           text_cfg=cfg.text)
        res.write.format("noop").mode("overwrite").save()
        n = len(sc.statusTracker().getJobIdsForGroup(tag))
        sc.setJobGroup(None, None)
        return n

    run("warmup-jobs")          # plan/codegen warmup
    n = run("measured-jobs")
    # 8 observed on Spark 4.1 (AQE stage jobs + stats collect + save);
    # headroom of +2 for engine-version scheduling differences, but far
    # below the 14 the inference-job regression would reinstate
    assert n <= 10, f"warm search ran {n} jobs (budget 10)"
