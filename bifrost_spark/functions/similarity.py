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
from bifrost_spark.functions.spread import spread_for_compute


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def _as_double(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def _rerank_topk(pairs: DataFrame, q: DataFrame, c: DataFrame, k: int,
                 query_id_col: str) -> DataFrame:
    """Shared exact-cosine re-rank tail: fetch the two vectors per candidate
    pair (late materialization), rank by sim desc / neighbor_id asc, keep
    top-k.  The output contract (rounding, tie-break) of every top-k ANN
    entry lives HERE so engine and oracles can never diverge per-path."""
    cand = pairs.join(q, query_id_col).join(c, "neighbor_id")
    sim = _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        cand.select(query_id_col, "neighbor_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    # per-row dot products over every (query, corpus) pair are compute-bound
    # — spread an unsplittable small scan to core width first
    c = spread_for_compute(corpus).select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv"))
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


def hyperplanes(dim: int, n_planes: int, n_tables: int, seed: int = 7):
    """Deterministic random hyperplanes, shape (n_tables, n_planes, dim),
    components rounded to 6 decimals.  Rounding makes every component an
    exact short decimal, so an oracle in ANY engine (DuckDB SQL literals,
    numpy, the JVM) reconstructs bit-identical planes from the same seed."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return np.round(rng.uniform(-1.0, 1.0, size=(n_tables, n_planes, dim)), 6)


def _quantized_bit(proj: Column) -> Column:
    """Signature bit = round(projection, 6) >= 0.  The rounding removes the
    sign discontinuity for cross-engine determinism: engines disagree on a
    dot product by at most ~1 ulp, and any |dot| below the rounding quantum
    collapses to ±0.0 which compares >= 0 everywhere."""
    return F.when(F.round(proj, 6) >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))


def lsh_signatures_expr(vec: str, planes) -> Column:
    """Signatures for every table as array<long> — literal-expression path.
    ``vec`` is the NAME of an array<double> column.

    Built as ONE SQL string parsed by F.expr, not nested Column ops: the
    arithmetic is pure Python string work + a single Py4J call, where the
    Column-op formulation cost ~n_tables×n_planes×dim Py4J round-trips to
    BUILD (~1 s of driver time at 1024 nodes, paid per call).  The dot
    products stay in the ``aggregate(zip_with(...))`` higher-order form —
    CodegenFallback, deliberately: an equivalent flat ``v[0]*c0 + …`` sum
    was tried and EXCEEDS janino's method-size limit at dim 64 × 16 planes
    (whole-stage codegen fails to compile, Spark retries then interprets —
    strictly slower than never entering codegen).  Parity with the pandas
    path is exact (pinned by tests): same fold-left IEEE addition from a
    0.0 seed, float literals emitted with repr (shortest round-trip form)
    and a D suffix, bit = IF(round(dot,6) >= 0, 1L, 0L) — IF on a NULL
    condition takes the else branch like the CASE WHEN twin.  Above
    AUTO_EXPR_MAX_NODES use ``lsh_signatures_pandas``; identical output."""
    if not isinstance(vec, str):
        raise TypeError("lsh_signatures_expr takes a column NAME (str)")
    n_tables, n_planes, dim = planes.shape
    tables = []
    for t in range(n_tables):
        bits = []
        for p in range(n_planes):
            arr = ", ".join(f"{float(x)!r}D" for x in planes[t, p])
            dot = (f"aggregate(zip_with({vec}, array({arr}), (x, y) -> x * y), "
                   f"0.0D, (acc, x) -> acc + x)")
            bits.append(f"shiftleft(IF(round({dot}, 6) >= 0, 1L, 0L), {p})")
        tables.append("(" + " ^ ".join(bits) + ")")
    return F.expr("array(" + ", ".join(tables) + ")")


# Auto mode picks the literal path while the plan stays below this many
# Catalyst nodes (n_tables × n_planes × dim).  Rationale, measured at sf0.1
# local[32]: below it, whole-stage-codegen'd literals beat the pandas path's
# Arrow worker spin-up + batch exchange (the round-3 bench regression:
# sim_ann_lsh 3.05→4.88 s when dim-64 queries were forced onto the pandas
# path); above it, plan build/optimize time blows up (~23k nodes at dim 768)
# and the O(1)-plan Arrow matmul wins by orders of magnitude.
AUTO_EXPR_MAX_NODES = 4096


def _pick_signature_impl(signature_impl: str, planes) -> str:
    if signature_impl != "auto":
        return signature_impl
    n_tables, n_planes, dim = planes.shape
    return "expr" if n_tables * n_planes * dim <= AUTO_EXPR_MAX_NODES else "pandas"


def lsh_signatures_pandas(vec: "str | Column", planes) -> Column:
    """Signatures for every table as array<long> — Arrow-batched numpy
    matmul.  One (batch × dim) @ (dim × tables·planes) product per Arrow
    batch regardless of dim, so the plan stays O(1) expressions at dim 768+
    (the literal path would be ~23k Catalyst nodes there)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    n_tables, n_planes, dim = planes.shape
    flat = planes.reshape(n_tables * n_planes, dim)  # captured, broadcast with the task
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    def sig_fn(vs):
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        V = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
        bits = (np.round(V @ flat.T, 6) >= 0).astype(np.int64)  # (n, T*P)
        sigs = bits.reshape(len(V), n_tables, n_planes) @ weights  # (n, T)
        return pd.Series(list(sigs))

    # real (non-string) annotations: `from __future__ import annotations`
    # would stringify inline hints, which pandas_udf cannot introspect
    sig_fn.__annotations__ = {"vs": pd.Series, "return": pd.Series}
    sig_udf = pandas_udf(sig_fn, ArrayType(LongType()))
    return sig_udf(F.col(vec) if isinstance(vec, str) else vec)


def embedding_near_dup_pairs(
    corpus: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_planes: int = 8,
    n_tables: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    signature_impl: str = "auto",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucketed SELF-join (a pair
    is a candidate iff it shares a bucket in ANY table) + exact cosine
    verification ``>= threshold``.  Returns (id_a, id_b, sim).

    Same scale shape as ``lsh_bucketed_topk``: the bucket groupBy is the
    only wide dependency, candidates never materialize globally, vectors
    are late-materialized for candidate pairs only."""
    planes = hyperplanes(dim, n_planes, n_tables, seed)
    sig_fn = (lsh_signatures_pandas
              if _pick_signature_impl(signature_impl, planes) == "pandas"
              else lsh_signatures_expr)
    c = register_cache(spread_for_compute(corpus).select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")))
    b = c.select("id", F.posexplode(sig_fn("v", planes)).alias("tbl", "sig"))
    pairs = (
        b.alias("a").join(
            b.alias("b"),
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    va = c.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    vb = c.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    sim = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        pairs.join(va, "id_a").join(vb, "id_b")
        .select("id_a", "id_b", F.round(sim, 6).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    refine_iters: int = 0,
) -> DataFrame:
    """ANN top-k via an IVF (inverted-file) coarse quantizer — the classic
    FAISS-style alternative to LSH bucketing (``lsh_bucketed_topk``):

    1. **Centroids**: the ``n_centroids`` corpus vectors with the smallest
       multiplicative hash of their id — a deterministic uniform sample that
       any engine reproduces from the ids alone (no RNG state), so the whole
       index is exactly recomputable.  ``refine_iters`` optionally runs that
       many distributed Lloyd (k-means) steps on the seeds — assign, then
       per-cell mean vector via posexplode + component avg — which tightens
       the cells at the cost of oracle-exactness (float means are
       order-sensitive at ~1 ulp), so the oracle-checked entry uses
       ``refine_iters=0`` and production recall tuning uses > 0.
    2. **Assignment**: every corpus vector joins the BROADCAST centroid set
       and keeps its nearest cell (quantized cosine, ties to the lowest
       centroid id) — one narrow pass, map-side ``max_by`` combine, tiny
       shuffle of (id, cell) pairs only.
    3. **Probing**: each query ranks the same broadcast centroids and probes
       its ``n_probe`` nearest cells; candidates are the vectors assigned to
       a probed cell (cell-equality join — the inverted file), then an exact
       cosine re-rank keeps the top ``k``.

    Scale shape: the corpus never self-joins; the only wide dependencies are
    the (id, cell) aggregation and the cell-keyed candidate join, both keyed
    by cell ids that are uniform by construction of the hash-sampled
    centroids.  Recall < 1.0 by construction; raise ``n_probe`` (or
    ``n_centroids``) for recall, exactly like FAISS ``nprobe``.
    Like the LSH path, vectors are late-materialized: candidates carry only
    ids until the final re-rank fetches the two vectors per pair.
    """
    # both sides are consumed twice (cell scoring + final re-rank), and the
    # centroid plan twice more (assign + probes) — persist the narrow
    # projections like the LSH path does (callers release via
    # functions.cache.release_caches).
    c = register_cache(
        spread_for_compute(corpus).select(
            F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv"))
    )
    q = register_cache(
        queries.select(F.col(query_id_col), _as_double(F.col(vec_col)).alias("qv"))
    )
    pairs = _ivf_candidate_pairs(c, q, n_centroids, n_probe, query_id_col, refine_iters)
    return _rerank_topk(pairs, q, c, k, query_id_col)


def _ivf_candidate_pairs(c: DataFrame, q: DataFrame, n_centroids: int,
                         n_probe: int, query_id_col: str,
                         refine_iters: int = 0) -> DataFrame:
    """The candidate-producing half of ``ivf_topk`` (see its docstring):
    hash-sampled centroids → broadcast cell assignment (map-side max_by) →
    per-query n_probe cell probing → cell-equality join.  Returns
    (query_id, neighbor_id) pairs; shared by ``ivf_topk`` (exact-cosine
    re-rank tail) and ``ivfpq_topk`` (PQ/ADC scoring tail)."""
    M = (1 << 31) - 1

    # pre-mod the id: both factors stay < 2^31.3, so the product tops out at
    # ~5.3e18 < int64 max for ANY id range — without it, vec_id ≈ 3.5e9
    # overflows (Spark silently wraps, DuckDB raises, and engine vs oracle
    # diverge).  For ids < M the pre-mod is the identity, so results are
    # unchanged at every current scale.
    ckey = F.pmod(F.pmod(F.col("neighbor_id"), F.lit(M)) * F.lit(2654435761) + F.lit(12345), F.lit(M))
    # the orderBy+limit compiles to TakeOrderedAndProject: per-partition
    # top-n_centroids with a bounded driver merge (n_centroids × partitions
    # rows), never a full corpus exchange — audited in PLANS.md.
    cents = register_cache(
        c.withColumn("ckey", ckey)
        .orderBy("ckey", "neighbor_id")
        .limit(n_centroids)
        .select(
            F.row_number().over(Window.orderBy("ckey", "neighbor_id")).alias("centroid_id"),
            F.col("cv").alias("centv"),
        )
    )

    def cell_scores(side: DataFrame, sid: str, vcol: str, cset: DataFrame) -> DataFrame:
        """(sid, centroid_id, csim) against the broadcast centroids;
        quantized cosine: rounding to 6 decimals before any argmax makes the
        cell choice engine-independent (engines disagree on a dot product by
        ~1 ulp; ties at the rounded value break to the lowest centroid id)."""
        sim = F.round(
            _dot(F.col(vcol), F.col("centv")) / (_norm(F.col(vcol)) * _norm(F.col("centv"))), 6
        )
        return side.join(F.broadcast(cset), how="cross").select(
            sid, F.col("centroid_id"), sim.alias("csim")
        )

    def assign_cells(cset: DataFrame) -> DataFrame:
        # corpus assignment: argmax as a max_by AGGREGATE (not a window) —
        # the partial combine collapses to one row per id map-side, so the
        # only shuffled payload is (id, cell).  Ordering struct
        # (csim, -centroid_id) == "highest sim, then lowest centroid id",
        # the window tie-break used for probing below.
        return (
            cell_scores(c, "neighbor_id", "cv", cset)
            .groupBy("neighbor_id")
            .agg(F.max_by(
                "centroid_id", F.struct(F.col("csim"), (-F.col("centroid_id")).cast("long"))
            ).alias("cell"))
        )

    for _ in range(refine_iters):
        # one distributed Lloyd step: per-cell component means.  All narrow
        # except the (cell, component) aggregate — rows are (cell, i, x),
        # uniform by construction; empty cells simply drop out (FAISS does
        # the same).
        cents = register_cache(
            assign_cells(cents)
            .join(c, "neighbor_id")
            .select("cell", F.posexplode("cv").alias("i", "x"))
            .groupBy("cell", "i")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(F.transform(F.array_sort(F.collect_list(F.struct("i", "m"))),
                             lambda s: s["m"]).alias("centv"))
            .select(F.col("cell").alias("centroid_id"), "centv")
        )

    assign = assign_cells(cents)
    # query probing needs top-n_probe cells, a genuine window — queries are
    # the small side by construction.
    wq = Window.partitionBy(query_id_col).orderBy(F.desc("csim"), F.asc("centroid_id"))
    probes = (
        cell_scores(q, query_id_col, "qv", cents)
        .withColumn("rnk", F.row_number().over(wq))
        .filter(F.col("rnk") <= n_probe)
        .select(query_id_col, F.col("centroid_id").alias("cell"))
    )

    # no dedup needed (unlike the multi-table LSH path): each corpus vector
    # lives in exactly ONE cell and a query's probe cells are distinct, so a
    # (query, neighbor) pair can arise from at most one cell-join row.
    return (
        probes.join(assign, on="cell")
        .filter(F.col(query_id_col) != F.col("neighbor_id"))
        .select(query_id_col, "neighbor_id")
    )


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
    signature_impl: str = "auto",
) -> DataFrame:
    """ANN top-k: candidates = corpus vectors sharing a bucket with the query
    in ANY of n_tables hash tables; exact cosine re-rank on candidates.

    ``signature_impl``: "pandas" (default — Arrow matmul, O(1) plan size at
    any dim) or "expr" (pure Catalyst literals; only for small dims).  Both
    produce identical signatures (quantized-projection bits)."""
    planes = hyperplanes(dim, n_planes, n_tables, seed)
    sig_fn = (lsh_signatures_pandas
              if _pick_signature_impl(signature_impl, planes) == "pandas"
              else lsh_signatures_expr)
    c = register_cache(spread_for_compute(corpus).select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")))
    q = register_cache(queries.select(F.col(query_id_col), _as_double(F.col(vec_col)).alias("qv")))
    # Late materialization: the ×n_tables bucket join and the pair-dedup see
    # only (id, tbl, sig) — never the embedding arrays (which a dedup would
    # otherwise drag through a SortAggregate per pair).  Vectors are fetched
    # after, for candidate pairs only.
    c_b = c.select(
        "neighbor_id", F.posexplode(sig_fn("cv", planes)).alias("tbl", "sig")
    )
    q_b = q.select(
        query_id_col, F.posexplode(sig_fn("qv", planes)).alias("tbl", "sig")
    )

    pairs = (
        q_b.join(c_b, on=["tbl", "sig"])
        .filter(F.col(query_id_col) != F.col("neighbor_id"))
        .select(query_id_col, "neighbor_id")
        .dropDuplicates([query_id_col, "neighbor_id"])  # ×n_tables duplicates
    )
    return _rerank_topk(pairs, q, c, k, query_id_col)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    m: int = 4,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    rerank: bool = False,
    refine_iters: int = 0,
) -> DataFrame:
    """ANN scale path #3: product quantization (Jégou et al. 2011, the
    FAISS ``PQ``/``IVFPQ`` building block) — the MEMORY-bounded ANN path.
    LSH (``lsh_bucketed_topk``) and IVF (``ivf_topk``) prune *candidates*;
    PQ compresses the *vectors themselves*: each ``dim``-float embedding
    (256 B at dim=64) becomes ``m`` one-byte codes (4 B) — at 100 TB of
    raw embeddings the PQ index is ~1.5 TB and fits a modest cluster's
    RAM, which is the entire point of the technique.

    1. **Sub-codebooks**: ``dim`` splits into ``m`` subspaces of dim/m.
       The codebook rows are ``n_codes`` corpus vectors picked by the same
       deterministic multiplicative id-hash as ``ivf_topk`` (no RNG, any
       engine reproduces the index from the ids alone), each sliced into
       its m subvectors.  Production quality would Lloyd-refine per
       subspace exactly like ``ivf_topk(refine_iters>0)``; the
       oracle-checked form keeps the raw sample.
    2. **Encoding**: per (vector, subspace), the nearest code by QUANTIZED
       squared-L2 — ``round(sqdist * 1e6)`` as int64, ties to the lowest
       code id — so assignment is engine-exact.  One broadcast join against
       the m×n_codes codebook, map-side ``min_by`` partial combine: the
       only shuffled payload is (id, sub, code).
    3. **ADC scan**: a query builds its (sub, code) → distance lookup
       table against the SAME broadcast codebook (integer-quantized like
       the encode step, so the cross-subspace SUM is exact integer
       arithmetic — order-independent on any engine).  Approximate distance
       of a corpus vector = sum of m LUT hits on its codes; smallest wins.

    Scale shape: the corpus never self-joins and never moves its float
    vectors — the ADC scan streams (id, sub, code) rows against a
    broadcast LUT with a map-side partial sum; the shuffle is (query,
    neighbor, partial-dist).  ADC is by design a LINEAR scan of the coded
    corpus per query (that is what makes it exact-recall@code-resolution);
    at 10^9+ vectors compose it with the IVF coarse quantizer (probe cells
    via ``ivf_topk``'s assignment, ADC only within probed cells) exactly
    as FAISS ``IVFPQ`` does.

    ``rerank=True`` re-ranks the ADC top-(4k) by exact cosine via the
    shared ``_rerank_topk`` tail (recall recovery at the cost of fetching
    4k float vectors per query); the oracle-checked entry uses the pure
    ADC form, whose integer distances are bit-reproducible everywhere.

    Output: (query_id, neighbor_id, rank, adist) — adist is the integer
    quantized ADC squared-L2 (smaller = closer) — or the ``_rerank_topk``
    contract (rank, sim) when ``rerank=True``.
    """
    c = register_cache(
        spread_for_compute(corpus).select(
            F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv"))
    )
    q = register_cache(
        queries.select(F.col(query_id_col), _as_double(F.col(vec_col)).alias("qv"))
    )
    enc, lut = _pq_parts(c, q, dim, m, n_codes, query_id_col, refine_iters)
    adc = (
        enc.join(F.broadcast(lut), ["sub", "code"])
        .filter(F.col(query_id_col) != F.col("neighbor_id"))
        .groupBy(query_id_col, "neighbor_id")
        .agg(F.sum("dq").alias("adist"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.asc("adist"), F.asc("neighbor_id"))
    ranked = adc.withColumn("rank", F.row_number().over(w))
    if rerank:
        pairs = ranked.filter(F.col("rank") <= 4 * k).select(query_id_col, "neighbor_id")
        return _rerank_topk(pairs, q, c, k, query_id_col)
    return ranked.filter(F.col("rank") <= k).select(
        query_id_col, "neighbor_id", F.col("rank").cast("int").alias("rank"), "adist")


def _pq_parts(c: DataFrame, q: DataFrame, dim: int, m: int, n_codes: int,
              query_id_col: str, refine_iters: int = 0) -> tuple[DataFrame, DataFrame]:
    """The index-building half of ``pq_topk`` (see its docstring): returns
    ``enc`` = per-(neighbor_id, sub) nearest code and ``lut`` = per-(query,
    sub, code) integer-quantized distance table.  Shared by ``pq_topk``
    (full ADC scan) and ``ivfpq_topk`` (ADC over IVF candidates only).
    ``refine_iters`` runs that many per-subspace Lloyd steps on the
    codebook (production recall knob; oracle entries use 0)."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    d = dim // m
    M = (1 << 31) - 1

    def subs(vcol: str) -> Column:
        return F.posexplode(F.array(*[F.slice(F.col(vcol), s * d + 1, d) for s in range(m)]))

    # codebook: hash-sampled rows (TakeOrderedAndProject, never a full
    # corpus sort — same audited shape as ivf_topk), sliced into subspaces
    ckey = F.pmod(F.pmod(F.col("neighbor_id"), F.lit(M)) * F.lit(2654435761) + F.lit(12345), F.lit(M))
    cb = register_cache(
        c.withColumn("ckey", ckey)
        .orderBy("ckey", "neighbor_id")
        .limit(n_codes)
        .select(
            F.row_number().over(Window.orderBy("ckey", "neighbor_id")).alias("code"),
            F.col("cv").alias("fullv"),
        )
        .select("code", subs("fullv").alias("sub", "codev"))
    )

    def qdist(u: Column, v: Column) -> Column:
        sq = F.aggregate(F.zip_with(u, v, lambda x, y: (x - y) * (x - y)),
                         F.lit(0.0), lambda acc, x: acc + x)
        return F.round(sq * F.lit(1e6)).cast("long")

    csub = c.select("neighbor_id", subs("cv").alias("sub", "sv"))

    def encode(codebook: DataFrame) -> DataFrame:
        return (
            csub.join(F.broadcast(codebook), "sub")
            .select("neighbor_id", "sub",
                    F.col("code"), qdist(F.col("sv"), F.col("codev")).alias("dq"))
            .groupBy("neighbor_id", "sub")
            .agg(F.min_by("code", F.struct("dq", "code")).alias("code"))
        )

    for _ in range(refine_iters):
        # one distributed Lloyd step per SUBSPACE: assign codes under the
        # current codebook, then new codev[sub, code] = component mean of
        # the assigned subvectors.  Same shape as ivf_topk's refinement —
        # the wide dependency is a (sub, code, component) aggregate of
        # scalar rows; empty codes drop out.  Trades oracle-exactness for
        # recall (float means are order-sensitive at ~1 ulp), so the
        # oracle-checked entries keep refine_iters=0.
        cb = register_cache(
            encode(cb)
            .join(csub, ["neighbor_id", "sub"])
            .select("sub", "code", F.posexplode("sv").alias("i", "x"))
            .groupBy("sub", "code", "i")
            .agg(F.avg("x").alias("mu"))
            .groupBy("sub", "code")
            .agg(F.transform(F.array_sort(F.collect_list(F.struct("i", "mu"))),
                             lambda s: s["mu"]).alias("codev"))
        )

    enc = encode(cb)
    lut = (
        q.select(query_id_col, subs("qv").alias("sub", "sv"))
        .join(F.broadcast(cb), "sub")
        .select(query_id_col, "sub", "code", qdist(F.col("sv"), F.col("codev")).alias("dq"))
    )
    return enc, lut


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 4,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    refine_iters: int = 0,
) -> DataFrame:
    """The FAISS ``IVFPQ`` composition — the 10^9+-vector shape both halves
    document as their scale path: the IVF coarse quantizer prunes
    CANDIDATES (probe ``n_probe`` of ``n_centroids`` cells — the linear ADC
    scan shrinks by ~n_probe/n_centroids) while PQ compresses the VECTORS
    (candidates are scored from m-byte codes against a broadcast integer
    LUT — the float corpus is touched only to build the index).  This
    non-residual variant codes raw vectors (FAISS's residual coding trades
    oracle-exactness for recall; same trade as ``ivf_topk(refine_iters)``,
    and the deterministic form is what the DuckDB oracle recomputes
    bit-identically).

    Scale shape: union of the two halves' — the corpus never self-joins,
    never moves its floats (cell assignment and encoding each shuffle
    narrow (id, small-int) rows once at index build), and per query the
    only per-candidate work is m integer LUT hits.  Output: the ``pq_topk``
    contract (query_id, neighbor_id, rank, adist)."""
    c = register_cache(
        spread_for_compute(corpus).select(
            F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv"))
    )
    q = register_cache(
        queries.select(F.col(query_id_col), _as_double(F.col(vec_col)).alias("qv"))
    )
    pairs = _ivf_candidate_pairs(c, q, n_centroids, n_probe, query_id_col)
    enc, lut = _pq_parts(c, q, dim, m, n_codes, query_id_col, refine_iters)
    adc = (
        pairs.join(enc, "neighbor_id")
        .join(F.broadcast(lut), [query_id_col, "sub", "code"])
        .groupBy(query_id_col, "neighbor_id")
        .agg(F.sum("dq").alias("adist"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.asc("adist"), F.asc("neighbor_id"))
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", F.col("rank").cast("int").alias("rank"), "adist")
    )
