"""Mimics the driver's correctness gate: run every queries() entry and its
DuckDB oracle side-by-side at sf0.001 and compare row-count, schema shape,
and values (order-insensitive, like the driver's sorted value-hash)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    pdf = pdf.sort_values(by=list(pdf.columns), ignore_index=True)
    return pdf


def _compare(name, spark_pdf, oracle_pdf):
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs oracle {len(oracle_pdf)}")
    s, o = _canon(spark_pdf), _canon(oracle_pdf)
    assert list(s.columns) == list(o.columns), (
        f"{name}: columns {list(s.columns)} vs {list(o.columns)}")
    for c in s.columns:
        sv, ov = s[c].to_numpy(), o[c].to_numpy()
        if np.issubdtype(sv.dtype, np.floating) or np.issubdtype(ov.dtype, np.floating):
            ok = np.allclose(sv.astype(float), ov.astype(float),
                             atol=1e-9, rtol=0, equal_nan=True)
        else:
            ok = (sv == ov).all()
        assert ok, f"{name}: column {c} differs\nspark:\n{s.head(20)}\noracle:\n{o.head(20)}"


ORACLE_CHECKED = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_query_vs_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    spark_pdf = q(spark, SF_DIR).toPandas()
    oracle_pdf = ddb.execute(entrymod.oracle_sql()[name]).df()
    _compare(name, spark_pdf, oracle_pdf)


def test_all_queries_have_entries():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # entries without oracles must be deliberate (documented weaker check)
    no_oracle = set(qs) - set(oracles)
    assert no_oracle <= {"minhash_lsh_pairs", "simhash", "ann_lsh_topk",
                         "webpages_pipeline", "ann_ivf_topk"}


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert {"doc_id", "rnk", "score"} <= set(df.columns)
