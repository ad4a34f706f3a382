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

import numpy as np
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
            # md5(NULL) is NULL and groupBy collects NULLs together —
            # without this filter every NULL-text doc lands in ONE fake
            # "byte-identical" group and a keep-one policy deletes them
            .where(F.col(text_col).isNotNull())
            .select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
            .groupBy("text_hash")
            .agg(F.count("*").alias("n_dups"),
                 F.min(id_col).alias("canonical_id"))
            .where(F.col("n_dups") > 1))


def _widen(docs: DataFrame) -> DataFrame:
    """Small/packed inputs scan as few partitions; the shingle explode then
    runs nearly single-threaded. Widen to the session parallelism first (the
    raw docs shuffle is trivial next to the expansion it parallelizes).
    Width comes from Spark's own file-packing arithmetic over driver-side
    file metadata (see partitioning.scan_width) — neither the ~2s
    ``df.rdd`` plan translation nor the tiny-files-miscounted-as-wide trap
    of a raw inputFiles() count."""
    from ..partitioning import widen_for_kernel
    return widen_for_kernel(docs)


def _tokens_arr(text_col: str):
    return F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != "")


def _shingles_arr(text_col: str, shingle: int):
    """Array of word n-gram shingles (JVM-side transform over a sequence);
    shingle=1 degenerates to plain tokens."""
    toks = _tokens_arr(text_col)
    if shingle <= 1:
        return toks
    return F.when(
        F.size(toks) >= shingle,
        F.transform(F.sequence(F.lit(1), F.size(toks) - shingle + 1),
                    lambda i: F.concat_ws(" ", F.slice(toks, i, shingle)))
    ).otherwise(F.array().cast("array<string>"))


def _doc_terms(docs: DataFrame, id_col: str, text_col: str,
               shingle: int = 1) -> DataFrame:
    """(id, term) distinct pairs; term = token or word n-gram shingle."""
    docs = _widen(docs)
    return (docs
            .select(F.col(id_col).alias("_id"),
                    F.explode(_shingles_arr(text_col, shingle)).alias("term"))
            .distinct())


def _token_sets(docs: DataFrame, id_col: str, text_col: str,
                shingle: int = 1) -> DataFrame:
    """(_id, toks sorted-distinct array, sz) per doc, JVM-side."""
    docs = _widen(docs)
    return (docs
            .select(F.col(id_col).alias("_id"),
                    F.array_sort(F.array_distinct(
                        _shingles_arr(text_col, shingle))).alias("toks"))
            .withColumn("sz", F.size("toks")))


def _hashed_shingles_arr(text_col: str, shingle: int):
    """Array of xxhash64 shingle fingerprints (long), built WITHOUT string
    concatenation: each token is hashed once, then a shingle hash combines
    the n token hashes. The interpreted HOF cost of concat_ws(slice(...))
    per shingle dominated the jaccard plan (13.6s CPU at sf0.1, measured);
    hashing tuples of longs is ~an order cheaper, and every downstream op
    (sort, distinct, shuffle keys, array_intersect) runs on 8-byte longs
    instead of fat strings. Set semantics (hence Jaccard) are preserved up
    to 64-bit hash collisions — negligible far beyond 10^9 distinct
    shingles."""
    th = F.transform(_tokens_arr(text_col), lambda t: F.xxhash64(t))
    if shingle <= 1:
        return th

    def _combine(i):
        return F.xxhash64(*[F.element_at(th, i + j) for j in range(shingle)])

    return F.when(
        F.size(th) >= shingle,
        F.transform(F.sequence(F.lit(1), F.size(th) - shingle + 1), _combine)
    ).otherwise(F.array().cast("array<long>"))


def _token_sets_hashed(docs: DataFrame, id_col: str, text_col: str,
                       shingle: int = 1) -> DataFrame:
    """(_id, toks distinct array<long> of shingle fingerprints, sz) per
    doc — the hashed-set frame feeding token_jaccard_pairs.

    Vectorized Arrow kernel (round 6): the Catalyst form
    (xxhash64-per-token HOF + per-position combine + array_distinct +
    array_sort) was the single most expensive stage of the jaccard plan
    (~7.7 s for 2.6M shingles at sf1.0, interpreted per element). The
    hash values never surface in any output — they feed only set
    equality (distinct / join keys / array_intersect), the same
    justification the previous xxhash64 switch documented — so the
    kernel is free to use its own 64-bit scheme: per-token polynomial
    char hashes extracted from prefix sums in O(chars) vectorized uint64
    ops (B odd ⇒ invertible mod 2^64), splitmix-mixed, then a k-token
    windowed combine, then a global lexsort-dedupe per doc. Tokenization
    reproduces the Catalyst chain exactly for the engine's semantics:
    Java trim() strips code points ≤ U+0020 from the ends; Java \\s is
    ASCII [ \\t\\n\\x0b\\f\\r]."""
    import re

    from pyspark.sql.types import (ArrayType, IntegerType, LongType,
                                   StructField, StructType)

    docs = _widen(docs)
    src = docs.select(F.col(id_col).alias("_id"),
                      F.coalesce(F.col(text_col), F.lit("")).alias("_t"))
    out_schema = StructType([
        StructField("_id", src.schema["_id"].dataType),
        StructField("toks", ArrayType(LongType(), False), False),
        StructField("sz", IntegerType(), False)])
    kk = int(shingle)

    def kernel(batches):
        import pyarrow as pa

        B = np.uint64(0x100000001B3)       # odd ⇒ invertible mod 2^64
        BINV = np.uint64(pow(0x100000001B3, -1, 1 << 64))
        C = np.uint64(0x9E3779B97F4A7C15)
        M1 = np.uint64(0xFF51AFD7ED558CCD)
        M2 = np.uint64(0xC4CEB9FE1A85EC53)
        token_re = re.compile("[^ \t\n\x0b\f\r]+")
        edge = "".join(map(chr, range(0x21)))  # Java trim: cp <= U+0020

        def _mix(x):
            x = (x ^ (x >> np.uint64(33))) * M1
            x = (x ^ (x >> np.uint64(33))) * M2
            return x ^ (x >> np.uint64(33))

        for batch in batches:
            ids = batch.column(0)
            texts = batch.column(1).to_pylist()
            toks = [token_re.findall(t.strip(edge)) for t in texts]
            ntok = np.fromiter((len(ts) for ts in toks), dtype=np.int64,
                               count=len(toks))
            tlens = np.fromiter(
                (len(t) for ts in toks for t in ts), dtype=np.int64,
                count=int(ntok.sum()))
            if tlens.size:
                blob = "".join(t for ts in toks for t in ts)
                chars = np.frombuffer(blob.encode("utf-32-le"),
                                      dtype=np.uint32).astype(np.uint64)
                n = chars.size
                # prefix trick: Q[j] = sum_{i<j} c[i]·B^{-i}; token hash
                # over [s,e) = (Q[e]-Q[s])·B^{e-1}, all exact mod 2^64
                binv_pow = np.multiply.accumulate(
                    np.full(n, BINV, dtype=np.uint64)) * B  # B^{-0..-(n-1)}
                b_pow = np.multiply.accumulate(
                    np.full(n, B, dtype=np.uint64)) * BINV  # B^{0..n-1}
                q = np.concatenate(
                    ([np.uint64(0)], np.cumsum(chars * binv_pow)))
                ends = np.cumsum(tlens)
                starts = ends - tlens
                th = _mix((q[ends] - q[starts]) * b_pow[ends - 1])
            else:
                th = np.empty(0, dtype=np.uint64)
            # windowed k-token combine, windows confined to one doc
            counts = np.maximum(ntok - kk + 1, 0)
            total = int(counts.sum())
            if total == 0:
                empty_offs = np.zeros(len(texts) + 1, dtype=np.int32)
                yield pa.record_batch(
                    [ids,
                     pa.ListArray.from_arrays(
                         pa.array(empty_offs),
                         pa.array(np.empty(0, dtype=np.int64))),
                     pa.array(np.zeros(len(texts), dtype=np.int32))],
                    names=["_id", "toks", "sz"])
                continue
            doc_idx = np.repeat(np.arange(len(toks)), counts)
            firsts = np.concatenate(([0], np.cumsum(counts)))[:-1]
            local0 = np.arange(total) - np.repeat(firsts, counts)
            tok_offs = np.concatenate(([0], np.cumsum(ntok)))[:-1]
            start = tok_offs[doc_idx] + local0
            h = np.zeros(total, dtype=np.uint64)
            for j in range(kk):
                h = h * C + th[start + j]
            h = _mix(h)
            order = np.lexsort((h, doc_idx))
            ds, hs = doc_idx[order], h[order]
            keep = np.empty(len(hs), dtype=bool)
            keep[0] = True
            keep[1:] = (ds[1:] != ds[:-1]) | (hs[1:] != hs[:-1])
            du, hu = ds[keep], hs[keep]
            sz = np.bincount(du, minlength=len(toks)).astype(np.int32)
            offs = np.concatenate(
                ([0], np.cumsum(sz))).astype(np.int32)
            yield pa.record_batch(
                [ids,
                 pa.ListArray.from_arrays(pa.array(offs),
                                          pa.array(hu.view(np.int64))),
                 pa.array(sz)],
                names=["_id", "toks", "sz"])

    return src.mapInArrow(kernel, out_schema)


def _release_after(out: DataFrame, cached: DataFrame,
                   release: bool = True) -> DataFrame:
    """Materialize the (small, above-threshold) result with an eager
    localCheckpoint, then unpersist the big cached intermediate. Without
    this, every call leaks one cached copy of the full shingle expansion
    for the session's lifetime (a long-lived query service or a bench loop
    steadily fills executor storage memory). The checkpoint blocks hold
    only the thresholded pairs and are GC-cleaned with the plan.

    Tradeoffs (deliberate): the eager checkpoint EXECUTES the pairs plan at
    call time (callers pay even if they never consume the result), and
    localCheckpoint truncates lineage — its blocks are unrecoverable on
    executor loss, so a post-checkpoint executor failure fails the job
    instead of recomputing. Callers that manage caching themselves (or run
    on preemptible executors where lineage recovery matters) pass
    ``release=False`` and own the persist/unpersist lifecycle."""
    if not release:
        return out
    out = out.localCheckpoint(eager=True)
    cached.unpersist()
    return out


VERIFY_BCAST_DOC_CAP = 200_000  # hashed (8-byte) token sets only: 200k
# docs × ~50 longs ≈ 100 MB built — bounded, far under the broadcast cap.


def _verify_jaccard(cand: DataFrame, tok_sets: DataFrame) -> DataFrame:
    """Exact Jaccard for candidate (id_a, id_b) pairs via array_intersect.

    The two joins touch only candidate pairs (tiny vs all-pairs), and the
    intersection runs JVM-side on the sorted token arrays. When the token
    sets are the HASHED (long) representation and the doc count is under
    ``VERIFY_BCAST_DOC_CAP``, both sides broadcast: the candidate stream
    then never shuffles at all (at low thresholds PPJoin candidates run
    to tens of millions of rows, and the second shuffle-join would carry
    one full token array per candidate). String token sets (the
    md5/minhash paths, far fewer candidates) and over-cap corpora keep
    the shuffle joins."""
    from pyspark.sql.types import ArrayType, LongType

    ta = tok_sets.select(F.col("_id").alias("id_a"), F.col("toks").alias("toks_a"),
                         F.col("sz").alias("sz_a"))
    tb = tok_sets.select(F.col("_id").alias("id_b"), F.col("toks").alias("toks_b"),
                         F.col("sz").alias("sz_b"))
    toks_t = tok_sets.schema["toks"].dataType
    if (isinstance(toks_t, ArrayType)
            and isinstance(toks_t.elementType, LongType)
            and tok_sets.count() <= VERIFY_BCAST_DOC_CAP):
        ta, tb = F.broadcast(ta), F.broadcast(tb)
    return (cand.join(ta, "id_a").join(tb, "id_b")
            .withColumn("inter", F.size(F.array_intersect("toks_a", "toks_b")))
            .withColumn("jaccard",
                        F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))))


def token_jaccard_pairs(docs: DataFrame, threshold: float = 0.8,
                        id_col: str = "doc_id", text_col: str = "text",
                        shingle: int = 1, release: bool = True) -> DataFrame:
    """Exact token-set Jaccard pairs ≥ threshold, via **prefix filtering**
    (PPJoin-style): order every doc's tokens by ascending global document
    frequency (rarest first, tie-break by term), keep only the first
    ``sz - ceil(t·sz) + 1`` tokens as join keys — any pair with Jaccard ≥ t
    MUST share a prefix token, so the self-join shuffles rare terms only and
    the head-term (stopword) blowup never happens. A length-ratio filter
    (``min_sz ≥ t·max_sz``) prunes further before verification; exact Jaccard
    is then computed only for surviving candidates with a JVM-side
    array_intersect. Identical results to the naive all-pairs plan.
    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    # Materialize the (expensive) shingle expansion exactly ONCE: the sorted
    # token-set frame feeds (a) the prefix ranking — via a cheap explode of
    # the already-distinct array, so no extra .distinct() shuffle and no
    # count-window for sz (it's F.size of the array) — and (b) the final
    # exact-Jaccard verification. Without this, Catalyst re-evaluates the
    # shingle higher-order function ~3× across the plan (measured 7.2s →
    # target ≥2× faster at sf0.1). persist(MEMORY_AND_DISK default) spills
    # cleanly at scale; on a 100 TB corpus this frame would be staged to
    # parquet by the enclosing job instead. Shingles are xxhash64 longs
    # (see _hashed_shingles_arr) — same Jaccard, far cheaper to compute,
    # shuffle, and intersect than string n-grams.
    tok_sets = _token_sets_hashed(docs, id_col, text_col, shingle).persist()
    terms = tok_sets.select("_id", "sz", F.explode("toks").alias("term"))
    dfreq = terms.groupBy("term").agg(F.count("*").alias("dfreq"))
    ranked = terms.join(dfreq, "term")
    w = Window.partitionBy("_id").orderBy("dfreq", "term")
    # every PPJoin ceil is RELAXED by a small epsilon before rounding:
    # the float product can land one ulp above the exact rational (e.g.
    # t/(1+t)·(sza+szb) overshoots the true ceiling at 133 (t=0.8, size)
    # points below 4000), which would silently DROP pairs with Jaccard
    # exactly == threshold. Relaxing only admits extra candidates — the
    # exact-Jaccard verification below restores precision — while the
    # bound stays a true lower bound at every boundary.
    def rceil(x):
        return F.ceil(x - F.lit(1e-6))

    prefix = (ranked.withColumn("pos", F.row_number().over(w))
              .where(F.col("pos") <=
                     F.col("sz") - rceil(F.lit(threshold) * F.col("sz")) + 1))
    a, b = prefix.alias("a"), prefix.alias("b")
    # PPJoin positional filter: Jaccard ≥ t ⟺ overlap ≥ ceil(t/(1+t)·(sza+szb))
    # =: α. For the pair's FIRST shared prefix token (both docs order tokens
    # by the same global rarity order), overlap ≤ 1 + min(sza−pa, szb−pb); a
    # match row failing this bound can be dropped — the first-match row of
    # any truly-similar pair always passes, and extra surviving rows only
    # add candidates (then distinct'd), so results are unchanged.
    alpha = rceil(F.lit(threshold / (1.0 + threshold)) *
                  (F.col("a.sz") + F.col("b.sz")))
    pos_ok = (F.lit(1) + F.least(F.col("a.sz") - F.col("a.pos"),
                                 F.col("b.sz") - F.col("b.pos"))) >= alpha
    # NO .distinct() on the candidate stream: under the broadcast verify
    # the candidates never shuffle, and measured duplicate multiplicity
    # is ~3% (19.1M raw vs 18.5M distinct at sf1.0) — a full 18.5M-row
    # dedup shuffle bought almost nothing. Duplicate candidate rows
    # produce identical (id_a, id_b, jaccard) rows; the dropDuplicates
    # below runs on the (small) above-threshold output instead.
    cand = (a.join(b, (F.col("a.term") == F.col("b.term")) &
                      (F.col("a._id") < F.col("b._id")) &
                      (F.least("a.sz", "b.sz") >=
                       rceil(F.lit(threshold) * F.greatest("a.sz", "b.sz"))) &
                      pos_ok)
            .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")))
    verified = _verify_jaccard(cand, tok_sets)
    out = (verified.where(F.col("jaccard") >= threshold)
           .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
           .dropDuplicates(["id_a", "id_b"]))
    return _release_after(out, tok_sets, release)


def _minhash_from_terms(terms: DataFrame, num_hashes: int,
                        id_col: str) -> DataFrame:
    """MinHash signatures from a prepared (_id, term) distinct frame.

    One wide aggregation instead of a seeds crossJoin: each term row
    computes its ``num_hashes`` md5s as separate min-aggregated columns
    (identical hashes — md5('<seed>:'||term) — in identical min order),
    then unpivots to the (id, seed, minhash) contract via stack(). The
    old crossJoin shape multiplied the term stream num_hashes× before
    the aggregation (42M rows at sf1.0); this touches each term row
    once with full map-side partial aggregation."""
    cols = [F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("term"))))
            .alias(f"_h{s}") for s in range(num_hashes)]
    wide = terms.groupBy(F.col("_id").alias(id_col)).agg(*cols)
    stack = ", ".join(f"{s}, _h{s}" for s in range(num_hashes))
    return wide.select(F.col(id_col), F.expr(
        f"stack({num_hashes}, {stack}) as (seed, minhash)"))


def minhash_signatures(docs: DataFrame, num_hashes: int = 16,
                       id_col: str = "doc_id", text_col: str = "text",
                       shingle: int = 1) -> DataFrame:
    """(id, seed, minhash) — minhash h_s(D) = min over terms of md5(s||term).

    md5-hex min is engine-portable (lexicographic on hex strings); the
    per-seed expansion is a crossJoin against a tiny seeds table (broadcast).
    """
    return _minhash_from_terms(_doc_terms(docs, id_col, text_col, shingle),
                               num_hashes, id_col)


def _banded_buckets(sigs: DataFrame, num_hashes: int, bands: int,
                    id_col: str) -> DataFrame:
    """(id, band, bucket) band keys from a signatures frame: band
    signature = md5 over the band's minhashes in seed order (array_sort
    on "seed:minhash" strings gives a deterministic order — seeds are
    single digits for num_hashes ≤ 10; zero-pad for more). Shared by the
    within-corpus pair join and the cross-corpus decontamination join."""
    rows = num_hashes // bands
    return (sigs.withColumn("band", (F.col("seed") / rows).cast("int"))
            .groupBy(id_col, "band")
            .agg(F.md5(F.concat_ws("|", F.array_sort(F.collect_list(
                F.concat_ws(":", F.col("seed"), F.col("minhash")))))).alias("bucket")))


def _lsh_from_sigs(sigs: DataFrame, num_hashes: int, bands: int,
                   id_col: str) -> DataFrame:
    """Banded-LSH candidate pairs from a prepared signatures frame."""
    banded = _banded_buckets(sigs, num_hashes, bands, id_col)
    a = banded.alias("a")
    b = banded.alias("b")
    return (a.join(b, (F.col("a.band") == F.col("b.band")) &
                      (F.col("a.bucket") == F.col("b.bucket")) &
                      (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"))
            .distinct())


def minhash_lsh_candidates(docs: DataFrame, num_hashes: int = 16, bands: int = 4,
                           id_col: str = "doc_id", text_col: str = "text",
                           shingle: int = 1) -> DataFrame:
    """Banded-LSH candidate pairs: docs agreeing on ALL rows of ≥1 band.

    bands × rows = num_hashes; band key = md5 of the band's concatenated
    minhashes; the pair join happens inside buckets only — the classic
    near-dup plan that scales to web corpora (buckets are small, the shuffle
    keys on the bucket hash).
    """
    sigs = minhash_signatures(docs, num_hashes, id_col, text_col, shingle)
    return _lsh_from_sigs(sigs, num_hashes, bands, id_col)


def near_duplicates_minhash(docs: DataFrame, threshold: float = 0.8,
                            num_hashes: int = 16, bands: int = 4,
                            id_col: str = "doc_id", text_col: str = "text",
                            shingle: int = 1, release: bool = True) -> DataFrame:
    """LSH candidates verified with exact Jaccard — candidates only, so the
    expensive exact check touches a vanishing fraction of all pairs.

    The shingle expansion is materialized once (persist) and feeds BOTH the
    MinHash signatures and the exact verification — same single-compute
    discipline as :func:`token_jaccard_pairs`. ``release=False`` skips the
    eager localCheckpoint (see :func:`_release_after` for the tradeoff) and
    leaves cache lifecycle to the caller."""
    tok_sets = _token_sets(docs, id_col, text_col, shingle).persist()
    terms = tok_sets.select("_id", F.explode("toks").alias("term"))
    sigs = _minhash_from_terms(terms, num_hashes, id_col)
    cand = _lsh_from_sigs(sigs, num_hashes, bands, id_col)
    verified = _verify_jaccard(cand, tok_sets)
    out = (verified.where(F.col("jaccard") >= threshold)
           .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")))
    return _release_after(out, tok_sets, release)


def simhash64(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """64-bit SimHash per doc from md5(term) bits, tf-weighted.

    bit_i(sig) = 1 iff Σ_t tf(t)·(2·bit_i(md5(t)) - 1) > 0. Computed with
    JVM expressions: md5 hex → first 16 hex chars → 64 bits via conv().
    """
    docs = _widen(docs)
    tf = (docs.select(F.col(id_col).alias("_id"),
                      F.explode(_tokens_arr(text_col)).alias("term"))
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
    """Near-dup pairs by SimHash Hamming distance, blocked on 15-bit chunks
    (a pair within Hamming ≤3 of 60 bits agrees exactly on ≥1 of 4 chunks —
    pigeonhole — so the join is chunk-blocked, not all-pairs).

    The 4-chunk blocking is complete ONLY for max_hamming ≤ 3: at 4+, a
    pair with one flipped bit in every chunk matches no block and would be
    silently missed while same-chunk-concentrated pairs are found —
    inconsistent recall, so larger values are refused loudly."""
    if max_hamming > 3:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the 4-chunk blocking "
            "guarantee (complete only for hamming <= 3); increase the "
            "chunk count before relaxing this")
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


CC_DRIVER_EDGE_CAP = 1_000_000  # bounded-collect ceiling for the
# small-graph fast path below: 1M edges ≈ tens of MB on the driver, the
# same bounded-collect class as term stats / expansion dictionaries.


def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b", max_iter: int = 30) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``; component =
    the minimum node id transitively reachable — the deterministic cluster
    representative used by every near-dup resolution pipeline (pairs alone
    don't dedupe a corpus: A~B and B~C must collapse into ONE keep-set even
    when A~C was never emitted).

    Min-label propagation: each round unions the current labels with labels
    seen across one edge hop and keeps the per-node min — one shuffle per
    round, converged when no node's label changed that round (an exact,
    type-agnostic test: labels are monotone non-increasing under min
    propagation, so zero changes means a fixed point; a join on the
    checkpointed previous frame with an early-exit ``limit(1)`` detects any
    change without aggregating label values, which would silently NULL out
    on string node ids). Rounds
    needed = max component diameter; near-dup clusters are short-diameter
    by construction (members all overlap the same content), so this
    converges in a handful of rounds where a 100 TB corpus would pay
    max_iter only under an adversarial chain graph. Each round
    localCheckpoints the label frame: the iterative plan would otherwise
    grow exponentially and re-execute every prior round per action.

    Raises if ``max_iter`` rounds pass without convergence (silently
    returning half-merged clusters would corrupt a dedup keep-set).
    """
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = (edges.union(edges.select(F.col("dst").alias("src"),
                                      F.col("src").alias("dst")))
             .distinct()
             .localCheckpoint(eager=False))
    # Small-graph fast path: near-dup pair frames are usually a vanishing
    # fraction of the corpus, but each propagation round below is a full
    # Spark job (3 joins + an action) — a handful of rounds costs seconds
    # of pure scheduling on a graph that fits trivially in driver memory.
    # Under the documented cap, collect the (checkpointed — computed
    # exactly once) edge list and run union-find with path compression:
    # same min-label components, bit-identical output, one job replaced
    # by O(E α(E)) driver work. Above the cap, the distributed rounds
    # below remain the scale path.
    n_edges = edges.count()
    if n_edges <= CC_DRIVER_EDGE_CAP:
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] is not r and parent[r] != r:
                r = parent[r]
            while parent[x] is not r and parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        # collect, not toLocalIterator: the latter schedules one sequential
        # job per partition; the cap already bounds the collected bytes
        for row in edges.collect():
            a, b = row[0], row[1]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra
        comp: dict = {}
        for node in parent:
            r = find(node)
            comp[r] = min(comp.get(r, node), node)
        out = [(node, comp[find(node)]) for node in parent]
        from pyspark.sql.types import StructField, StructType

        typ = edges.schema["src"].dataType
        schema = StructType([StructField("node", typ),
                             StructField("comp", typ)])
        return pairs.sparkSession.createDataFrame(out, schema)
    labels = (edges.select(F.col("src").alias("node")).distinct()
              .withColumn("comp", F.col("node")))
    for _ in range(max_iter):
        labels = labels.localCheckpoint(eager=False)
        prev = labels
        hop = (edges.join(labels.withColumnRenamed("node", "dst"), "dst")
               .select(F.col("src").alias("node"), "comp"))
        labels = (labels.union(hop)
                  .groupBy("node").agg(F.min("comp").alias("comp")))
        # pointer jumping (path compression): comp ← comp's own comp. A
        # label is always a graph node, so this stays inside the component
        # and is monotone non-increasing; chains collapse exponentially,
        # making rounds O(log diameter) instead of O(diameter) — each round
        # is a full Spark job, so on long chains (embedding graphs at loose
        # thresholds) this is the difference between 5 and 30 jobs.
        ptr = labels.select(F.col("node").alias("_pn"),
                            F.col("comp").alias("_pc"))
        labels = (labels.join(ptr, labels["comp"] == ptr["_pn"], "left")
                  .select("node",
                          F.coalesce("_pc", "comp").alias("comp")))
        # exact convergence test: did ANY label change this round? A value
        # aggregate (sum of comp) would implicitly cast string node ids to
        # double and return NULL, making NULL == NULL exit after round 1
        # with half-merged clusters — the silent corruption this function
        # promises to refuse. limit(1) lets Spark stop at the first change.
        changed = (labels
                   .join(prev.withColumnRenamed("comp", "prev_comp"), "node")
                   .filter(F.col("comp") != F.col("prev_comp"))
                   .limit(1).count())
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(component diameter exceeds max_iter — raise it)")


def dedup_clusters(pairs: DataFrame, id_a: str = "id_a",
                   id_b: str = "id_b", max_iter: int = 30) -> DataFrame:
    """Near-dup cluster resolution over a verified pair frame: returns
    (doc_id, cluster, cluster_size) for every doc in a non-singleton
    cluster, where ``cluster`` is the min member id (the canonical doc a
    keep-one policy retains: keep rows with doc_id = cluster, drop the
    rest). Built on :func:`connected_components`; the size window shuffles
    the (tiny) clustered-node frame only, never the corpus."""
    cc = connected_components(pairs, id_a, id_b, max_iter)
    return (cc.select(F.col("node").alias("doc_id"),
                      F.col("comp").alias("cluster"))
            .withColumn("cluster_size",
                        F.count("*").over(Window.partitionBy("cluster"))))


def line_dedup(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", min_docs: int = 2) -> DataFrame:
    """Corpus-level line deduplication — the RefinedWeb/Falcon boilerplate
    filter (Penedo et al. 2023 §"line-wise corrections"; also MassiveText's
    repetition cleanup): a line whose trimmed form occurs in ≥ ``min_docs``
    DISTINCT documents is site chrome (cookie banners, nav bars, footers)
    and every occurrence is removed; blank lines and document structure are
    preserved. Returns (id, n_lines, n_removed, clean_text) per doc.

    Scale shape: one posexplode, one agg keyed on md5(line) — the 16-byte
    hash bounds the shuffle key regardless of line length, and md5 keeps
    the plan replayable in any engine (an md5 collision would merge two
    lines' counts identically in Spark and the oracle). The hot set (lines
    in ≥ min_docs docs) is a tiny fraction of the line stream — AQE
    broadcast-converts the anti-join — then one groupBy(id) rebuilds the
    text with order restored by the carried pos. All Catalyst; no Python,
    no collects, no windows over the full line stream.
    """
    # NULL text would make split() NULL: posexplode drops the doc and
    # size() yields -1, publishing negative counts — treat NULL as empty
    txt = F.coalesce(F.col(text_col), F.lit(""))
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(txt, "\n")).alias("pos", "line"))
    keyed = lines.withColumn(
        "lkey", F.when(F.trim(F.col("line")) != "",
                       F.md5(F.trim(F.col("line")))))
    hot = (keyed.where(F.col("lkey").isNotNull())
           .groupBy("lkey")
           .agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
           .where(F.col("n_docs") >= min_docs)
           .select("lkey"))
    # blank lines have NULL lkey and never match → always kept
    kept = keyed.join(hot, "lkey", "left_anti")
    clean = (kept.groupBy(id_col)
             .agg(F.count("*").alias("n_kept"),
                  F.concat_ws(
                      "\n",
                      F.transform(
                          F.array_sort(F.collect_list(
                              F.struct("pos", "line"))),
                          lambda x: x["line"])).alias("clean_text")))
    base = docs.select(
        F.col(id_col),
        F.size(F.split(txt, "\n")).cast("long").alias("n_lines"))
    return (base.join(clean, id_col, "left")
            .select(F.col(id_col),
                    F.col("n_lines"),
                    (F.col("n_lines") - F.coalesce(F.col("n_kept"),
                                                   F.lit(0)))
                    .cast("long").alias("n_removed"),
                    F.coalesce(F.col("clean_text"), F.lit(""))
                    .alias("clean_text")))


def substring_dedup(docs: DataFrame, k: int = 50, min_count: int = 2,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Exact duplicated-substring removal — the ExactSubstr deduplication of
    Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
    Better"), re-expressed Spark-first. Any length-``k`` character span
    whose verbatim text occurs ≥ ``min_count`` times across the corpus
    (within-doc repeats count, like the paper's suffix-array match) is cut
    from EVERY occurrence (the released deduplicate-text-datasets tool's
    behavior); overlapping duplicated windows merge into one removed span.
    Returns (id, n_chars, n_removed, clean_text) per doc.

    Instead of the paper's single giant suffix array (a sequential
    machine-sized build), the plan streams the same information through
    Spark's shuffle: every stride-1 k-gram becomes one (hash, docid, pos)
    row — O(total chars) rows, the same asymptotics as the suffix array's
    O(n) entries but built embarrassingly parallel. Gram generation is a
    vectorized Arrow kernel: each task decodes its docs to one flat
    UTF-32 code-point array and computes two independent 64-bit windowed
    polynomial hashes (splitmix-finalized) with k numpy passes over the
    whole batch — O(chars · k) fully-vectorized uint64 ops, replacing the
    interpreted ``transform``+``xxhash64(substring)`` expression that
    materialized two k-char substring copies per position (~80 s for 13M
    grams at 50k docs; the kernel does the same grams in ~2 s). The hash
    never leaves the plan (the final output is reconstructed from raw
    text), so cross-engine hash portability is irrelevant here, unlike
    the md5-keyed dedup ops above whose oracles replay the hash in SQL.
    A 128-bit key makes an accidental collision (which would over-remove
    one span) negligible even at 10^12 grams.

    One hash repartition on the 128-bit key then brings every
    occurrence of a gram to the same partition, where a second numpy
    kernel lexsorts the partition's (h1, h2) columns and keeps the rows
    of runs ≥ min_count — the old plan's count-then-semi-join shape paid
    a second full pass over the gram stream, and the single-aggregation
    alternative (groupBy.collect_list) falls back to sort-based
    ObjectHashAggregate past 128 distinct keys, sorting the entire gram
    stream in the JVM (~35 s at 14M grams; the numpy lexsort of the same
    partitions takes ~1 s). Per-task memory is one shuffle partition of
    16-byte keys — bounded by the shuffle partition sizing, the same
    class of bound as the per-shard scorer kernels. Each doc then merges
    its own marked positions into spans with an ``aggregate`` HOF — no
    window over the gram stream, no driver collect.

    Docs shorter than ``k`` contribute no grams and are kept verbatim.
    NULL text is treated as '' (kept, 0 removed) rather than silently
    dropped.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    from pyspark.sql.types import (IntegerType, LongType, StructField,
                                   StructType)

    txt = F.coalesce(F.col(text_col), F.lit(""))
    base = docs.select(F.col(id_col), txt.alias("_t"),
                       F.length(txt).cast("long").alias("n_chars"))
    gram_schema = StructType([
        StructField(id_col, base.schema[id_col].dataType),
        StructField("p", IntegerType()),
        StructField("h1", LongType()), StructField("h2", LongType())])
    kk = int(k)

    def gram_kernel(batches):
        import pyarrow as pa

        B1 = np.uint64(0x9E3779B97F4A7C15)   # odd multipliers: 2^64-cyclic
        B2 = np.uint64(0xC2B2AE3D27D4EB4F)
        M1, M2 = np.uint64(0xFF51AFD7ED558CCD), np.uint64(0xC4CEB9FE1A85EC53)

        def _mix(x):  # splitmix64/murmur3 finalizer, vectorized
            x = (x ^ (x >> np.uint64(33))) * M1
            x = (x ^ (x >> np.uint64(33))) * M2
            return x ^ (x >> np.uint64(33))

        for batch in batches:
            ids = batch.column(0)
            texts = batch.column(1).to_pylist()
            lens = np.fromiter((len(t) for t in texts), dtype=np.int64,
                               count=len(texts))
            counts = np.maximum(lens - kk + 1, 0)
            total = int(counts.sum())
            if total == 0:
                continue
            flat = np.frombuffer(
                b"".join(t.encode("utf-32-le") for t in texts),
                dtype=np.uint32).astype(np.uint64)
            w = flat.size - kk + 1
            h1 = np.zeros(w, np.uint64)
            h2 = np.zeros(w, np.uint64)
            for j in range(kk):      # windowed poly hash, uint64 wraparound
                win = flat[j:j + w]
                h1 *= B1
                h1 += win
                h2 *= B2
                h2 += win
            h1, h2 = _mix(h1), _mix(h2)
            offs = np.concatenate(([0], np.cumsum(lens)))[:-1]
            doc_idx = np.repeat(np.arange(len(lens)), counts)
            firsts = np.concatenate(([0], np.cumsum(counts)))[:-1]
            local0 = np.arange(total) - np.repeat(firsts, counts)
            start = offs[doc_idx] + local0     # flat window start, 0-based
            yield pa.record_batch(
                [ids.take(pa.array(doc_idx)),
                 pa.array((local0 + 1).astype(np.int32)),
                 pa.array(h1[start].view(np.int64)),
                 pa.array(h2[start].view(np.int64))],
                names=[id_col, "p", "h1", "h2"])

    src = base.select(F.col(id_col), F.col("_t"))
    par = docs.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < par:
        # small inputs arrive in 1-2 scan partitions; spread the O(chars·k)
        # hashing across the cluster (no-op at scale where scans are wide)
        src = src.repartition(par)
    grams = src.mapInArrow(gram_kernel, gram_schema)
    mc = int(min_count)

    def dup_kernel(batches):
        import pyarrow as pa

        got = [b for b in batches if b.num_rows]
        if not got:
            return
        tbl = pa.Table.from_batches(got)
        h1 = tbl.column("h1").to_numpy()
        h2 = tbl.column("h2").to_numpy()
        order = np.lexsort((h2, h1))
        h1s, h2s = h1[order], h2[order]
        new = np.empty(len(h1s), dtype=bool)
        new[0] = True
        new[1:] = (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])
        run = np.cumsum(new) - 1
        sizes = np.bincount(run)
        sel = order[sizes[run] >= mc]
        if sel.size == 0:
            return
        yield from (tbl.select([id_col, "p"])
                    .take(pa.array(sel)).to_batches())

    mark_schema = StructType(gram_schema.fields[:2])
    marked = grams.repartition("h1", "h2").mapInArrow(dup_kernel,
                                                      mark_schema)
    marks = (marked.groupBy(id_col)
             .agg(F.sort_array(F.collect_list("p")).alias("ps")))
    # ps is sorted, so each new window's end p+k strictly exceeds the
    # previous one's — merging only needs "does p start inside the open
    # span": extend the last interval's e, else append a new interval
    merged = F.expr(
        "aggregate(ps, cast(array() as array<struct<s: int, e: int>>), "
        "(acc, p) -> CASE WHEN size(acc) > 0 "
        f"              AND p <= element_at(acc, -1).e THEN "
        "   concat(slice(acc, 1, size(acc) - 1), "
        f"          array(named_struct('s', element_at(acc, -1).s, "
        f"                             'e', p + {k}))) "
        f"ELSE concat(acc, array(named_struct('s', p, 'e', p + {k}))) END)")
    spans = marks.select(F.col(id_col), merged.alias("iv"))
    out = (base.join(spans, id_col, "left")
           .select(
               F.col(id_col),
               F.col("n_chars"),
               F.coalesce(F.expr(
                   "aggregate(iv, cast(0 as long), "
                   "(a, x) -> a + (x.e - x.s))"), F.lit(0).cast("long"))
               .alias("n_removed"),
               F.coalesce(F.expr(
                   "aggregate(iv, named_struct('t', '', 'prev', 1), "
                   "(acc, x) -> named_struct("
                   "  't', concat(acc.t, substring(_t, acc.prev, "
                   "                               x.s - acc.prev)), "
                   "  'prev', x.e), "
                   "acc -> concat(acc.t, substring(_t, acc.prev, "
                   "                length(_t) - acc.prev + 1)))"),
                   F.col("_t")).alias("clean_text")))
    return out


def semdedup(embeddings: DataFrame, n_cells: int = 16, iters: int = 3,
             threshold: float = 0.95, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding"
             ) -> tuple[DataFrame, DataFrame]:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication — k-means-cluster the embeddings, then inside each
    cluster drop every vector whose cosine similarity to ANY lower-id
    cluster-mate reaches ``threshold``. Returns (kept, removed):
    ``kept`` = the surviving embedding rows, ``removed`` = (id, anchor id,
    cosine) evidence rows for audit.

    Clustering is the deterministic ``ann.ivf_build`` Lloyd (md5-ordered
    sample init, argmin-projection assignment — SQL-replayable end to
    end). The survivor rule is the reference implementation's index-order
    rule (keep the lowest id of each similar pair; the anchor may itself
    be removed by an even earlier near-dup) — a documented departure from
    the paper's keep-farthest-from-centroid variant, chosen because id
    order is deterministic under any partitioning while centroid distance
    ties are not.

    Scale shape: the pairwise similarity is keyed on ``cell`` — ONE
    shuffle, quadratic only WITHIN a cluster. That bound is the SemDeDup
    design itself: n_cells must grow with the corpus (the paper uses 50k
    clusters for LAION) so cluster sizes stay bounded; cell sizing is the
    caller's knob, same as ivf_build.

    The within-cell pair scoring runs as a vectorized numpy kernel per
    cell group (``applyInPandas``), not a self-join: the old cell-keyed
    join materialized ~m^2/2 rows per cell each paying an interpreted
    ``aggregate(zip_with(...))`` dot product (~72 s for 2.5M pairs at
    20k rows), where the kernel computes the same dot products as
    j-blocked tensor products with a strict left-to-right ``cumsum``
    over the dimension axis — bit-identical to the Catalyst fold order —
    and also folds the per-victim min-anchor reduction into the group,
    so neither the pair set nor a second shuffle ever materializes."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    from .ann import ivf_build

    _cents, assigned = ivf_build(embeddings, n_cells=n_cells, iters=iters,
                                 seed=seed, id_col=id_col, vec_col=vec_col)
    id_field = assigned.schema[id_col]
    out_schema = StructType([
        StructField(id_col, id_field.dataType),
        StructField("anchor_id", id_field.dataType),
        StructField("cos", DoubleType())])

    def cell_kernel(pdf):
        import pandas as pd

        m = len(pdf)
        empty = pd.DataFrame({id_col: pdf[id_col][:0], "anchor_id":
                              pdf[id_col][:0], "cos": np.empty(0)})
        if m < 2:
            return empty
        order = np.argsort(pdf[id_col].to_numpy(), kind="stable")
        ids = pdf[id_col].to_numpy()[order]
        vecs = pdf[vec_col].to_numpy()[order]
        # per-element cast to float64 = the Catalyst path's cast("double")
        V = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        dim = V.shape[1]
        # norm: sqrt of the sequential sum of v*v, same order as the fold
        n = np.sqrt(np.cumsum(V * V, axis=1)[:, -1])
        out_id, out_anchor, out_cos = [], [], []
        # j-blocked so the (blk, m, dim) product tensor stays ~32 MB
        blk = max(1, int(4_000_000 // max(1, m * dim)))
        for j0 in range(1, m, blk):
            j1 = min(m, j0 + blk)
            P = V[j0:j1, None, :] * V[None, :, :]
            D = np.cumsum(P, axis=2)[:, :, -1]
            den = n[j0:j1, None] * n[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                C = np.where(den != 0.0, D / den, 0.0)  # try_divide→0.0
            for bi in range(j1 - j0):
                j = j0 + bi
                row = C[bi, :j]
                mask = row >= threshold
                if mask.any():
                    # ids ascending → first match = min anchor id, the
                    # min(struct(_ia, cos)) the join path computed
                    i = int(np.argmax(mask))
                    out_id.append(ids[j])
                    out_anchor.append(ids[i])
                    out_cos.append(row[i])
        if not out_id:
            return empty
        return pd.DataFrame({id_col: out_id, "anchor_id": out_anchor,
                             "cos": np.asarray(out_cos)})

    removed = assigned.groupBy("cell").applyInPandas(cell_kernel, out_schema)
    kept = embeddings.join(removed.select(id_col), id_col, "left_anti")
    return kept, removed


def cross_decontamination(train_docs: DataFrame, eval_docs: DataFrame,
                          threshold: float = 0.8, num_hashes: int = 16,
                          bands: int = 4, id_col: str = "doc_id",
                          text_col: str = "text", shingle: int = 3,
                          release: bool = True) -> DataFrame:
    """Fuzzy cross-corpus decontamination: (train_id, eval_id, jaccard)
    for every training document whose shingle-set Jaccard against an
    evaluation document is ≥ ``threshold`` — the MinHash-LSH complement
    of :func:`textstats.ngram_contamination`'s exact 13-gram probe.
    Exact n-gram matching misses lightly-edited benchmark copies
    (re-wrapped lines, dropped headers); published decontamination
    recipes therefore pair it with an approximate Jaccard pass (GPT-3
    appendix C's 13-gram + fuzzy dedup of eval overlaps; The Pile and
    FineWeb use MinHash against benchmark suites).

    Scale shape (train is 10^12 docs, eval is thousands): both sides
    shingle→minhash→band through the SAME deterministic kernels as
    near_duplicates_minhash; candidates form ONLY inside (band, bucket)
    groups AND only across sides (train×train pairs never materialize —
    the join is side-asymmetric), then the exact-Jaccard verification
    touches candidate pairs alone. Internal ids are side-prefixed, so
    colliding train/eval id spaces stay distinct."""
    t = train_docs.select(
        F.concat(F.lit("t:"), F.col(id_col).cast("string")).alias("_uid"),
        F.col(text_col).alias("_text"))
    e = eval_docs.select(
        F.concat(F.lit("e:"), F.col(id_col).cast("string")).alias("_uid"),
        F.col(text_col).alias("_text"))
    union = t.unionByName(e)
    tok_sets = _token_sets(union, "_uid", "_text", shingle).persist()
    terms = tok_sets.select("_id", F.explode("toks").alias("term"))
    sigs = _minhash_from_terms(terms, num_hashes, "_uid")
    banded = _banded_buckets(sigs, num_hashes, bands, "_uid")
    a = banded.where(F.col("_uid").startswith("t:")).alias("a")
    b = banded.where(F.col("_uid").startswith("e:")).alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band")) &
                      (F.col("a.bucket") == F.col("b.bucket")))
            .select(F.col("a._uid").alias("id_a"),
                    F.col("b._uid").alias("id_b"))
            .distinct())
    verified = _verify_jaccard(cand, tok_sets)
    out = (verified.where(F.col("jaccard") >= threshold)
           .select(F.expr("substring(id_a, 3)").alias("train_id"),
                   F.expr("substring(id_b, 3)").alias("eval_id"),
                   F.round("jaccard", 6).alias("jaccard")))
    return _release_after(out, tok_sets, release)
