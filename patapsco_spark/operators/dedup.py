"""Deduplication operators for large-scale corpus cleaning.

Beyond the reference's scope (patapsco has no dedup), but first-class for a
web-scale training-data pipeline. All variants are pure DataFrame plans —
shuffles keyed to stay balanced, no driver-side loops:

- exact_duplicates:    md5(text) hash-groupBy (one shuffle on the hash)
- token_jaccard_pairs: exact token-set Jaccard via shingle self-join
                       (quadratic in cluster size — the *oracle* path)
- minhash_signatures / minhash_lsh_candidates: MinHash + banded LSH — the
  scale path: candidate pairs only meet inside small LSH buckets
- simhash64:           64-bit SimHash from per-token md5 bits

Cross-engine determinism: every hash is md5-based (identical hex in Spark
and DuckDB), never engine-specific hash functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Groups of byte-identical texts: (text_hash, n_dups, canonical_id).

    canonical_id = min id per group (deterministic survivor pick). At 100 TB
    this is one hash-partitioned aggregation with map-side partial aggs; the
    md5 is computed JVM-side (whole-stage codegen), no Python.
    """
    return (docs
            .select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
            .groupBy("text_hash")
            .agg(F.count("*").alias("n_dups"),
                 F.min(id_col).alias("canonical_id"))
            .where(F.col("n_dups") > 1))


def _doc_terms(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term) distinct pairs, whitespace tokens, JVM-side."""
    return (docs
            .select(F.col(id_col).alias("_id"),
                    F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"))
            .where(F.col("term") != "")
            .distinct())


def token_jaccard_pairs(docs: DataFrame, threshold: float = 0.8,
                        id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact token-set Jaccard over all pairs sharing ≥1 term.

    |A∩B| via a self-join on term (shuffle on term — a skewed head term makes
    this quadratic, which is exactly why MinHash-LSH below is the scale path;
    this operator is the small-scale oracle and the LSH verifier).
    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    terms = _doc_terms(docs, id_col, text_col)
    sizes = terms.groupBy("_id").agg(F.count("*").alias("sz"))
    a = terms.alias("a")
    b = terms.alias("b")
    inter = (a.join(b, (F.col("a.term") == F.col("b.term")) &
                       (F.col("a._id") < F.col("b._id")))
             .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
             .agg(F.count("*").alias("inter")))
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (inter.join(F.broadcast(sa), "id_a").join(F.broadcast(sb), "id_b")
            .withColumn("jaccard",
                        F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")))


def minhash_signatures(docs: DataFrame, num_hashes: int = 16,
                       id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, seed, minhash) — minhash h_s(D) = min over terms of md5(s||term).

    md5-hex min is engine-portable (lexicographic on hex strings); the
    per-seed expansion is a crossJoin against a tiny seeds table (broadcast).
    """
    spark = docs.sparkSession
    seeds = spark.range(num_hashes).select(F.col("id").cast("int").alias("seed"))
    terms = _doc_terms(docs, id_col, text_col)
    return (terms.crossJoin(F.broadcast(seeds))
            .groupBy(F.col("_id").alias(id_col), "seed")
            .agg(F.min(F.md5(F.concat(F.col("seed").cast("string"),
                                      F.lit(":"), F.col("term")))).alias("minhash")))


def minhash_lsh_candidates(docs: DataFrame, num_hashes: int = 16, bands: int = 4,
                           id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Banded-LSH candidate pairs: docs agreeing on ALL rows of ≥1 band.

    bands × rows = num_hashes; band key = md5 of the band's concatenated
    minhashes; the pair join happens inside buckets only — the classic
    near-dup plan that scales to web corpora (buckets are small, the shuffle
    keys on the bucket hash).
    """
    rows = num_hashes // bands
    sigs = minhash_signatures(docs, num_hashes, id_col, text_col)
    # band signature = md5 over the band's minhashes in seed order
    # (array_sort on "seed:minhash" strings gives a deterministic order —
    # seeds are single digits for num_hashes ≤ 10; zero-pad for more)
    banded = (sigs.withColumn("band", (F.col("seed") / rows).cast("int"))
              .groupBy(id_col, "band")
              .agg(F.md5(F.concat_ws("|", F.array_sort(F.collect_list(
                  F.concat_ws(":", F.col("seed"), F.col("minhash")))))).alias("bucket")))
    a = banded.alias("a")
    b = banded.alias("b")
    return (a.join(b, (F.col("a.band") == F.col("b.band")) &
                      (F.col("a.bucket") == F.col("b.bucket")) &
                      (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"))
            .distinct())


def near_duplicates_minhash(docs: DataFrame, threshold: float = 0.8,
                            num_hashes: int = 16, bands: int = 4,
                            id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """LSH candidates verified with exact Jaccard — candidates only, so the
    expensive exact check touches a vanishing fraction of all pairs."""
    cand = minhash_lsh_candidates(docs, num_hashes, bands, id_col, text_col)
    exact = token_jaccard_pairs(docs, threshold=0.0, id_col=id_col, text_col=text_col)
    return (cand.join(exact, ["id_a", "id_b"])
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def simhash64(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """64-bit SimHash per doc from md5(term) bits, tf-weighted.

    bit_i(sig) = 1 iff Σ_t tf(t)·(2·bit_i(md5(t)) - 1) > 0. Computed with
    JVM expressions: md5 hex → first 16 hex chars → 64 bits via conv().
    """
    tf = (docs.select(F.col(id_col).alias("_id"),
                      F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"))
          .where(F.col("term") != "")
          .groupBy("_id", "term").agg(F.count("*").alias("tf"))
          .withColumn("h", F.conv(F.substring(F.md5("term"), 1, 15), 16, 10)
                      .cast("long")))  # 60 bits to stay in signed-long range
    bit_cols = [
        F.sum(F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1,
                     F.col("tf")).otherwise(-F.col("tf"))).alias(f"b{i}")
        for i in range(60)
    ]
    agg = tf.groupBy("_id").agg(*bit_cols)
    sig = None
    for i in range(60):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1)).otherwise(F.lit(0))
        contrib = F.shiftleft(bit.cast("long"), i)
        sig = contrib if sig is None else sig.bitwiseOR(contrib)
    return agg.select(F.col("_id").alias(id_col), sig.alias("simhash"))


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3,
                       id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, blocked on 16-bit chunks
    (a pair within Hamming ≤3 of 60 bits agrees exactly on ≥1 of 4 chunks —
    pigeonhole — so the join is chunk-blocked, not all-pairs)."""
    sig = simhash64(docs, id_col, text_col)
    chunks = []
    for c in range(4):
        chunks.append(sig.select(
            F.col(id_col), F.col("simhash"),
            F.lit(c).alias("chunk"),
            F.shiftright(F.col("simhash"), c * 15).bitwiseAND(F.lit((1 << 15) - 1)).alias("key")))
    blocked = chunks[0]
    for c in chunks[1:]:
        blocked = blocked.unionByName(c)
    a, b = blocked.alias("a"), blocked.alias("b")
    pairs = (a.join(b, (F.col("a.chunk") == F.col("b.chunk")) &
                       (F.col("a.key") == F.col("b.key")) &
                       (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"),
                     F.col("a.simhash").alias("sig_a"),
                     F.col("b.simhash").alias("sig_b"))
             .distinct())
    return (pairs
            .withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
            .where(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))
