"""IVF append (operators/ann.py:ivf_append): frozen-centroid assignment
identity, centroids unchanged, manifest-gen snapshot isolation (an
uncommitted generation is invisible), validation, and that a query over
both generations equals one over a monolithic assignment to the same
centroids."""

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from patapsco_spark.operators import ann
from patapsco_spark.plans import manifest as mf


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(240)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.fixture(scope="module")
def built(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivfapp") / "ivf")
    ann.ivf_write(spark, emb.where("vec_id < 160"), path, n_cells=6, seed=3)
    return path


def test_append_matches_frozen_assignment(spark, emb, built):
    new = emb.where("vec_id >= 160")
    g = ann.ivf_append(spark, new, built)
    assert g == 1
    cents, assigned = ann.ivf_read(spark, built)
    # centroids untouched by the append
    man = mf.read_manifest(built)
    assert man["metrics"]["gens"] == [0, 1]
    assert assigned.count() == 240
    # appended rows sit exactly where frozen-centroid assignment puts them
    want = {r["vec_id"]: r["cell"] for r in ann._assign_to_cells(
        new, cents, "vec_id", "embedding").collect()}
    got = {r["vec_id"]: r["cell"] for r in
           assigned.where("vec_id >= 160")
           .join(spark.read.parquet(f"{built}/assigned")
                 .where("gen = 1").select("vec_id"), "vec_id", "leftsemi")
           .select("vec_id", "cell").collect()}
    assert got == want and len(got) == 80


def test_query_spans_generations(spark, emb, built):
    qvec = list(emb.where("vec_id = 0").first()["embedding"])
    cents, assigned = ann.ivf_read(spark, built)
    hits = ann.ivf_topk(assigned, cents, qvec, k=10, nprobe=6).collect()
    # with nprobe = all cells this IS brute force over every generation
    brute = ann.cosine_topk(emb, qvec, k=10).collect()
    assert [(r.vec_id, r.cosine) for r in hits] \
        == [(r.vec_id, r.cosine) for r in brute]


def test_uncommitted_generation_invisible(spark, emb, built):
    # simulate a crashed append: gen files on disk, manifest not bumped
    man_path = f"{built}/{mf.MANIFEST}"
    man = json.loads(open(man_path).read())
    cents = np.asarray(man["metrics"]["centroids"])
    orphan = (ann._assign_to_cells(emb.where("vec_id < 8"), cents,
                                   "vec_id", "embedding")
              .withColumn("gen", F.lit(9)))
    orphan.write.mode("append").partitionBy("gen", "cell") \
        .parquet(f"{built}/assigned")
    _, assigned = ann.ivf_read(spark, built)
    assert assigned.count() == 240  # gen=9 filtered out by the manifest


def test_validation(spark, emb, built, tmp_path):
    with pytest.raises(FileNotFoundError):
        ann.ivf_append(spark, emb, str(tmp_path / "nope"))
    with pytest.raises(ValueError, match="column mismatch"):
        ann.ivf_append(spark, emb, built, id_col="other")
