"""Deduplication operators for large-scale training-data pipelines.

All of these are pure DataFrame/SQL-expression pipelines (JVM-side,
whole-stage codegen) — no Python in the row path.  Scale notes per operator:

- exact: hash-groupBy; partial combine map-side, shuffle carries one row per
  distinct hash.
- minhash+LSH: the standard shingle → k minhashes → b bands → bucket-join
  pipeline.  Candidate pairs only materialize within a band bucket, so the
  cross product is bounded by bucket size, never global n².  At 100 TB the
  band-bucket groupBy is the only shuffle and it is uniformly hash-keyed.
- simhash: 64-bit fingerprint via per-token hash bit-voting; near-dups are
  then bucketed by fingerprint prefix bands (hamming-ball blocking).
- ngram-jaccard: exact verification on candidates from a blocking key.
- embedding cosine: see functions/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bifrost_spark.functions.cache import register_cache

# Mersenne-prime universal hashing for minhash permutations.  2^31-1 keeps
# a*x+b within int64 under ANSI arithmetic (a,x < 2^31 → product < 2^62).
_MERSENNE = (1 << 31) - 1


def _tokens(text_col: Column) -> Column:
    return F.filter(F.split(F.lower(text_col), "[^\\p{L}\\p{N}]+"), lambda t: t != "")


def shingles(text_col: Column, n: int = 3) -> Column:
    """Word n-gram shingle set (distinct), as hashed 64-bit values."""
    toks = _tokens(text_col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return F.array_distinct(F.transform(grams, lambda g: F.xxhash64(g)))


def minhash_signature(shingle_col: Column, k: int = 32, seed: int = 1) -> Column:
    """k minhashes via k universal-hash permutations h_i(x) = (a_i*x+b_i) mod p.
    Entirely vectorized array math (transform + array_min)."""
    def perm(a: int, b: int):
        return lambda x: F.pmod(F.lit(a) * F.pmod(x, F.lit(_MERSENNE)) + F.lit(b), F.lit(_MERSENNE))

    sigs = []
    for i in range(k):
        a = (seed * 1_000_003 + i * 92_821) % _MERSENNE or 1
        b = (seed * 689_287 + i * 283_111) % _MERSENNE
        sigs.append(F.array_min(F.transform(shingle_col, perm(a, b))))
    return F.array(*sigs)


def minhash_lsh_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_gram: int = 3,
    k: int = 32,
    bands: int = 8,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash-LSH, exact-verified
    with true shingle Jaccard.  Returns (doc_a, doc_b, est_jaccard, jaccard)."""
    rows_per_band = k // bands
    sig = docs.select(
        F.col(id_col).alias("id"),
        shingles(F.col(text_col), n_gram).alias("sh"),
    ).withColumn("sig", minhash_signature(F.col("sh"), k=k))

    # Late materialization: the band self-join sees ONLY (id, band, bucket)
    # — narrow fixed-width rows — never the shingle/signature arrays, which
    # would otherwise be replicated ×bands through the blocking shuffle.
    # Payloads are fetched afterwards for just the (few) candidate pairs.
    # (register_cache: callers release via functions.cache.release_caches.)
    sig = register_cache(sig)
    banded = sig.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(F.concat_ws(",", F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)), b),
            )
        ).alias("band", "bucket"),
    )

    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    pa = sig.select(F.col("id").alias("doc_a"), F.col("sh").alias("sh_a"), F.col("sig").alias("sig_a"))
    pb = sig.select(F.col("id").alias("doc_b"), F.col("sh").alias("sh_b"), F.col("sig").alias("sig_b"))
    cand = pairs.join(pa, "doc_a").join(pb, "doc_b")

    est = (
        F.size(F.filter(F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: (x == y).cast("int")), lambda v: v == 1))
        .cast("double") / F.lit(float(k))
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    jac = inter.cast("double") / union.cast("double")
    return (
        cand.select(
            "doc_a",
            "doc_b",
            F.round(est, 6).alias("est_jaccard"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


def simhash_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_bits: int = 16,
) -> DataFrame:
    """64-bit SimHash per doc + prefix band for hamming-ball blocking.

    Bit-voting without Python: for each bit position, sum(+1/-1 over token
    hashes) via array transforms; bit set iff the vote is positive.
    """
    toks = F.array_distinct(_tokens(F.col(text_col)))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    def vote(i: int):
        return lambda acc, h: acc + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)

    bit_votes = [F.aggregate(hashes, F.lit(0), vote(i)) for i in range(64)]
    fp = None
    for i, v in enumerate(bit_votes):
        bit = F.when(v > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        fp = term if fp is None else fp.bitwiseXOR(term)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        fp.alias("simhash"),
    ).withColumn("band", F.shiftrightunsigned(F.col("simhash"), 64 - prefix_bits))


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: keep the lowest id per content hash."""
    return (
        docs.groupBy(F.sha2(F.col(text_col), 256).alias("content_hash"))
        .agg(F.min(F.col(id_col)).alias("keep_id"), F.count("*").alias("n_dups"))
    )
