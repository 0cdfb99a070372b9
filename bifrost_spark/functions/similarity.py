"""Similarity search over embedding columns (array<float>).

Two paths, same results contract (top-k cosine neighbors):

- ``brute_force_topk``: the exactness baseline. Query side broadcast, corpus
  side scanned once; dot products via zip_with/aggregate (JVM codegen).
  O(|Q|·|C|) — right answer for small query sets or verification.
- ``lsh_bucketed_topk``: the scale path — random-hyperplane LSH (signed
  projections) buckets the corpus; each query probes only its bucket(s).
  Recall < 1.0 by construction; increase n_tables/planes for recall.
  At 100 TB the corpus-side groupBy(bucket) is the only wide dependency and
  buckets are uniformly sized by construction (random projections).

Hyperplanes are generated deterministically from a seed using the same
hash-to-uniform trick as the CDC generator — no numpy on the executors, no
Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bifrost_spark.functions.cache import register_cache


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def _as_double(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    c = corpus.select(F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv"))
    q = queries.select(F.col(query_id_col), _as_double(F.col(vec_col)).alias("qv"))
    sim = _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))
    pairs = F.broadcast(q).join(c, F.col(query_id_col) != F.col("neighbor_id")).select(
        query_id_col, "neighbor_id", sim.alias("sim")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )


def _hyperplane(dim: int, plane_idx: int, seed: int) -> Column:
    """Deterministic pseudo-random hyperplane as an array<double> literal
    expression: component_j = U(seed, plane, j)*2-1."""
    comps = [
        (F.pmod(F.xxhash64(F.lit(seed), F.lit(plane_idx), F.lit(j)), F.lit(1_000_000)) / 500_000.0 - 1.0)
        for j in range(dim)
    ]
    return F.array(*comps)


def lsh_signature(vec: Column, dim: int, n_planes: int = 12, table: int = 0, seed: int = 7) -> Column:
    """Random-hyperplane signature: one bit per plane (sign of projection)."""
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = _dot(vec, _hyperplane(dim, table * 1000 + p, seed))
        bit = F.when(proj >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = sig.bitwiseXOR(F.shiftleft(bit, p))
    return sig


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 10,
    n_tables: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 7,
) -> DataFrame:
    """ANN top-k: candidates = corpus vectors sharing a bucket with the query
    in ANY of n_tables hash tables; exact cosine re-rank on candidates."""
    c = register_cache(corpus.select(F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")))
    q = register_cache(queries.select(F.col(query_id_col), _as_double(F.col(vec_col)).alias("qv")))
    # Late materialization: the ×n_tables bucket join and the pair-dedup see
    # only (id, tbl, sig) — never the embedding arrays (which a dedup would
    # otherwise drag through a SortAggregate per pair).  Vectors are fetched
    # after, for candidate pairs only.
    c_b = c.select(
        "neighbor_id",
        F.explode(
            F.array(*[F.struct(F.lit(t).alias("tbl"), lsh_signature(F.col("cv"), dim, n_planes, t, seed).alias("sig"))
                      for t in range(n_tables)])
        ).alias("bkt"),
    ).select("neighbor_id", "bkt.tbl", "bkt.sig")
    q_b = q.select(
        query_id_col,
        F.explode(
            F.array(*[F.struct(F.lit(t).alias("tbl"), lsh_signature(F.col("qv"), dim, n_planes, t, seed).alias("sig"))
                      for t in range(n_tables)])
        ).alias("bkt"),
    ).select(query_id_col, "bkt.tbl", "bkt.sig")

    pairs = (
        q_b.join(c_b, on=["tbl", "sig"])
        .filter(F.col(query_id_col) != F.col("neighbor_id"))
        .select(query_id_col, "neighbor_id")
        .dropDuplicates([query_id_col, "neighbor_id"])
    )
    cand = pairs.join(q, query_id_col).join(c, "neighbor_id")
    sim = _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        cand.select(query_id_col, "neighbor_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )
