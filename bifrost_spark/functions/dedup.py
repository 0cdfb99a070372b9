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
from bifrost_spark.functions.spread import spread_for_compute  # noqa: F401 — shared guard, re-exported

# Mersenne-prime universal hashing for minhash permutations.  2^31-1 keeps
# a*x+b within int64 under ANSI arithmetic (a,x < 2^31 → product < 2^62).
_MERSENNE = (1 << 31) - 1


def _tokens(text_col: Column) -> Column:
    return F.filter(F.split(F.lower(text_col), "[^\\p{L}\\p{N}]+"), lambda t: t != "")


def _tokens_ascii(text_col: Column) -> Column:
    """ASCII-only tokenizer for the cross-engine-portable hash mode (the
    DuckDB oracle recomputes the identical tokens/hashes)."""
    return F.filter(F.split(F.lower(text_col), "[^a-z0-9]+"), lambda t: t != "")


def poly_hash(col: Column, mod: int | None = None, mask: int | None = None) -> Column:
    """Polynomial string hash h = fold(h*31 + codepoint), reduced per step by
    ``mod`` (Mersenne prime — minhash input domain) or ``mask`` (power-of-two
    bits — simhash fingerprint domain).  Integer-exact and trivially
    re-expressible in any SQL engine (the DuckDB oracles recompute it with
    list_reduce), unlike xxhash64 which only Spark evaluates.  Used by the
    oracle-checked entries; the xxhash64 variants remain the throughput
    default (single JVM intrinsic vs a per-character fold)."""
    chars = F.filter(F.split(col, ""), lambda c: c != "")
    if mod is not None:
        step = lambda acc, c: F.pmod(acc * 31 + F.ascii(c), F.lit(mod))  # noqa: E731
    else:
        step = lambda acc, c: (acc * 31 + F.ascii(c)).bitwiseAND(F.lit(mask))  # noqa: E731
    return F.aggregate(chars, F.lit(0).cast("long"), step)


def shingles(text_col: Column, n: int = 3, hash_fn: str = "xxhash64") -> Column:
    """Word n-gram shingle set (distinct), as hashed 64-bit values.

    Docs shorter than n tokens emit ONE partial shingle — intentional here
    (a short doc still needs a non-empty signature to participate in
    MinHash at all; the Arrow kernel, expr path, XXH64 twin, and DuckDB
    oracles all match).  The BLOCKLIST gram family (text.common_ngrams /
    remove_boilerplate) deliberately differs: there a partial gram would
    let a shared short phrase scrub whole short docs, so it emits none."""
    toks = _tokens_ascii(text_col) if hash_fn == "poly" else _tokens(text_col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    grams = F.filter(grams, lambda g: g != "")
    if hash_fn == "poly":
        return F.array_distinct(F.transform(grams, lambda g: poly_hash(g, mod=_MERSENNE)))
    return F.array_distinct(F.transform(grams, lambda g: F.xxhash64(g)))


def _minhash_perm_coeffs(k: int, seed: int) -> list[tuple[int, int]]:
    """The (a_i, b_i) universal-hash coefficients — single source of truth
    for the expression path, the Arrow kernel, and the DuckDB oracles."""
    out = []
    for i in range(k):
        a = (seed * 1_000_003 + i * 92_821) % _MERSENNE or 1
        b = (seed * 689_287 + i * 283_111) % _MERSENNE
        out.append((a, b))
    return out


_minhash_poly_udf_cache: dict = {}


def _minhash_poly_arrow(n_gram: int, k: int, seed: int):
    """Arrow-batched kernel computing (sh, sig) for the POLY hash mode in
    one pass — bit-identical to the expression twin (pinned by tests).

    Why: the expression path folds ``(acc*31 + ascii(c)) mod p`` per gram
    CHARACTER through interpreted higher-order functions (~2 s of the
    bench entry's wall at sf0.1).  Here the whole Arrow batch's grams
    concatenate into ONE byte array and the fold becomes Horner-by-powers:
    ``H = Σ byte_j · (31^(L-1-j) mod p)  mod p`` via a single vectorized
    multiply + ``np.add.reduceat`` — exact in int64 (byte·31^e mod p
    < 2^38, gram sums < 2^58 for grams up to a million chars; mod is a
    ring hom, so per-step and end-of-sum reduction agree).  Signatures are
    one (k × grams) ``(a·x + b) mod p`` matrix min per doc (a, x < 2^31 →
    products < 2^62).  xxhash64 mode stays on the JVM intrinsic — it was
    never the bottleneck.

    Null/edge parity with the expr twin (pinned by the parity test): NULL
    text behaves like no grams — sh [] + sig = k NULLs (the expr path's
    concat_ws over a NULL slice yields "" which the gram filter drops);
    gram-hash dedup preserves FIRST-OCCURRENCE order like array_distinct
    (pd.unique)."""
    key = (n_gram, k, seed)
    if key in _minhash_poly_udf_cache:
        return _minhash_poly_udf_cache[key]

    import numpy as np

    coeffs = _minhash_perm_coeffs(k, seed)
    A = np.array([a for a, _ in coeffs], dtype=np.int64)[:, None]
    B = np.array([b for _, b in coeffs], dtype=np.int64)[:, None]
    P = np.int64(_MERSENNE)

    def kernel(texts):
        import re

        import pandas as pd

        pat = re.compile(r"[^a-z0-9]+")
        max_pow = 4096  # > any realistic gram length; grown on demand
        pow31 = np.ones(max_pow, dtype=np.int64)
        for j in range(1, max_pow):
            pow31[j] = (pow31[j - 1] * 31) % P

        docs_grams: list = []  # per doc: list[str] | None
        all_bytes: list[bytes] = []
        lens: list[int] = []
        for t in texts:
            toks = [] if t is None else [w for w in pat.split(t.lower()) if w]
            grams = [" ".join(toks[i:i + n_gram])
                     for i in range(max(len(toks) - n_gram, 0) + 1)]
            grams = [g for g in grams if g]
            docs_grams.append(grams)
            for g in grams:
                gb = g.encode("ascii")  # tokens are [a-z0-9 ] by construction
                all_bytes.append(gb)
                lens.append(len(gb))

        if lens:
            L = np.array(lens, dtype=np.int64)
            if int(L.max()) >= max_pow:
                hi = int(L.max()) + 1
                pw = np.ones(hi, dtype=np.int64)
                for j in range(1, hi):
                    pw[j] = (pw[j - 1] * 31) % P
                pow31 = pw
            flat = np.frombuffer(b"".join(all_bytes), dtype=np.uint8).astype(np.int64)
            ends = np.cumsum(L)
            starts = ends - L
            # exponent at absolute position pos inside gram [s, e) = e-1-pos
            pos = np.arange(flat.shape[0], dtype=np.int64)
            exp = np.repeat(ends - 1, L) - pos
            prod = flat * pow31[exp]
            sums = np.add.reduceat(prod, starts) if flat.size else np.array([], dtype=np.int64)
            gram_hashes = sums % P
        else:
            gram_hashes = np.array([], dtype=np.int64)

        sh_out, sig_out = [], []
        cursor = 0
        for grams in docs_grams:
            g = gram_hashes[cursor:cursor + len(grams)]
            cursor += len(grams)
            x = pd.unique(g)  # first-occurrence order, like array_distinct
            sh_out.append([int(v) for v in x])
            if x.size == 0:
                sig_out.append([None] * k)
            else:
                m = (A * x[None, :] + B) % P
                sig_out.append([int(v) for v in m.min(axis=1)])
        return pd.DataFrame({"sh": sh_out, "sig": sig_out})

    udf = F.pandas_udf("sh array<long>, sig array<long>")(kernel)
    _minhash_poly_udf_cache[key] = udf
    return udf


def minhash_signature(shingle_col: Column, k: int = 32, seed: int = 1) -> Column:
    """k minhashes via k universal-hash permutations h_i(x) = (a_i*x+b_i) mod p.
    Entirely vectorized array math (transform + array_min)."""
    def perm(a: int, b: int):
        return lambda x: F.pmod(F.lit(a) * F.pmod(x, F.lit(_MERSENNE)) + F.lit(b), F.lit(_MERSENNE))

    sigs = [F.array_min(F.transform(shingle_col, perm(a, b)))
            for a, b in _minhash_perm_coeffs(k, seed)]
    return F.array(*sigs)


def minhash_lsh_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_gram: int = 3,
    k: int = 32,
    bands: int = 8,
    min_jaccard: float = 0.5,
    hash_fn: str = "xxhash64",
    seed: int = 1,
    signature_impl: str = "auto",
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash-LSH, exact-verified
    with true shingle Jaccard.  Returns (doc_a, doc_b, est_jaccard, jaccard).

    ``hash_fn="poly"`` switches shingle hashing to the portable polynomial
    hash so a DuckDB oracle can recompute the identical candidate set; the
    banding hash stays xxhash64 — pair membership depends only on band-slice
    EQUALITY, which any hash preserves, so the oracle can band on the raw
    slice values instead.

    ``signature_impl``: "expr" keeps shingling + signatures in SQL
    expressions; "pandas" computes them in one Arrow-batched kernel
    (bit-identical, pinned by tests/test_functions.py parity test); "auto"
    picks "pandas" for hash_fn="poly" — the per-character expression fold is
    interpreted and dominates the wall — and "expr" for xxhash64, where the
    JVM intrinsic already wins."""
    rows_per_band = k // bands
    docs = spread_for_compute(docs)
    impl = signature_impl if signature_impl != "auto" else ("pandas" if hash_fn == "poly" else "expr")
    if impl == "pandas":
        if hash_fn != "poly":
            raise ValueError("signature_impl='pandas' implements the poly hash mode only")
        kern = _minhash_poly_arrow(n_gram, k, seed)
        sig = docs.select(F.col(id_col).alias("id"), kern(F.col(text_col)).alias("r")) \
                  .select("id", F.col("r.sh").alias("sh"), F.col("r.sig").alias("sig"))
    else:
        sig = docs.select(
            F.col(id_col).alias("id"),
            shingles(F.col(text_col), n_gram, hash_fn=hash_fn).alias("sh"),
        ).withColumn("sig", minhash_signature(F.col("sh"), k=k, seed=seed))

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
    n_bits: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """``n_bits`` SimHash fingerprint per doc.

    Bit-voting without Python: for each bit position, sum(+1/-1 over token
    hashes) via array transforms; bit set iff the vote is strictly positive.
    """
    docs = spread_for_compute(docs)
    fp = simhash_col(F.col(text_col), n_bits=n_bits, hash_fn=hash_fn)
    return docs.select(F.col(id_col).alias("doc_id"), fp.alias("simhash"))


def simhash_col(text_col: Column, n_bits: int = 64, hash_fn: str = "xxhash64") -> Column:
    """The SimHash fingerprint as a pure column expression — usable in any
    projection, including streaming plans (no repartition, no DataFrame)."""
    toks = F.array_distinct(_tokens_ascii(text_col) if hash_fn == "poly" else _tokens(text_col))
    if hash_fn == "poly":
        if n_bits > 63:
            # (1 << 64) - 1 overflows a LongType literal; the portable fold
            # is signed-64 arithmetic, so its fingerprint domain tops out at
            # 63 bits (xxhash64 mode covers the full-64-bit default).
            raise ValueError(f"hash_fn='poly' supports n_bits <= 63, got {n_bits}")
        hashes = F.transform(toks, lambda t: poly_hash(t, mask=(1 << n_bits) - 1))
    else:
        hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def vote(i: int):
        return lambda acc, h: acc + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)

    bit_votes = [F.aggregate(hashes, F.lit(0), vote(i)) for i in range(n_bits)]
    fp = None
    for i, v in enumerate(bit_votes):
        bit = F.when(v > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        fp = term if fp is None else fp.bitwiseXOR(term)
    return fp


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 48,
    bands: int = 4,
    max_hamming: int = 3,
    hash_fn: str = "poly",
) -> DataFrame:
    """SimHash near-dup DEDUP (not just fingerprints): multi-band hamming
    blocking + exact hamming verification.  Returns (doc_a, doc_b, hamming).

    Pigeonhole guarantee: with ``bands`` bands of ``n_bits/bands`` bits, any
    pair within hamming distance ``bands - 1`` shares at least one unchanged
    band, so ``max_hamming <= bands - 1`` gives EXACT (recall-1.0) results —
    unlike the single-prefix blocking of round 1, which missed any near-dup
    differing inside the prefix.  The band self-join sees only (id, band,
    band_value) narrow rows; fingerprints join back for the (few) candidate
    pairs; the band groupBy is the only wide dependency and its keys are
    uniform by construction (hash bits).
    """
    assert n_bits % bands == 0, "n_bits must divide into equal bands"
    bits_per_band = n_bits // bands
    band_mask = (1 << bits_per_band) - 1
    fp = simhash_fingerprints(docs, text_col, id_col, n_bits=n_bits, hash_fn=hash_fn)
    fp = register_cache(fp)
    banded = fp.select(
        F.col("doc_id").alias("id"),
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned(F.col("simhash"), b * bits_per_band).bitwiseAND(F.lit(band_mask))
                for b in range(bands)
            ])
        ).alias("band", "band_val"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    fa = fp.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("fp_a"))
    fb = fp.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("fp_b"))
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        pairs.join(fa, "doc_a").join(fb, "doc_b")
        .select("doc_a", "doc_b", hamming.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def near_dup_clusters(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over near-dup candidate pairs → cluster
    assignment + canonical keep-one selection: the final stage of a
    training-data dedup pipeline (pairs from ``minhash_lsh_candidates`` /
    ``simhash_pairs`` / ``embedding_near_dup_pairs`` are only edges; what a
    pipeline keeps is ONE doc per transitive duplicate group).

    Returns (doc_id, cluster_id, cluster_size, is_canonical) for every doc
    that appears in at least one pair; ``cluster_id`` is the minimum doc_id
    of the component, and the canonical survivor is the doc equal to it.

    Distributed shape: iterative min-label propagation with path halving
    (label := min(label, min-neighbor-label, label-of-label)), the
    MapReduce-style CC of Kiveris et al. — each round is two hash-keyed
    joins + a map-side-combined min, on narrow (id, label) rows; rounds are
    O(log diameter) thanks to the pointer-doubling step, and near-dup
    components are shallow in practice.  ``localCheckpoint`` after each
    round cuts the lineage so the plan stays O(1) per round instead of
    growing with iterations.  No driver-side data — the only driver values
    are the per-round convergence counts.
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("id")).distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    try:
        for _ in range(max_iter):
            nbr = (
                edges.join(labels.withColumnRenamed("id", "dst"), "dst")
                .groupBy("src").agg(F.min("label").alias("nbr_label"))
                .withColumnRenamed("src", "id")
            )
            stepped = labels.join(nbr, "id", "left").select(
                "id",
                F.col("label").alias("old"),
                F.least("label", F.coalesce("nbr_label", "label")).alias("mid"),
            )
            # Path halving: also jump to the current label OF the label —
            # doubles the propagation distance per round (O(log d) rounds).
            parents = labels.select(F.col("id").alias("mid"), F.col("label").alias("parent_label"))
            new_labels = (
                stepped.join(parents, "mid", "left")
                .select(
                    "id",
                    F.least("mid", F.coalesce("parent_label", "mid")).alias("label"),
                    (F.least("mid", F.coalesce("parent_label", "mid")) != F.col("old")).alias("changed"),
                )
                .localCheckpoint()
            )
            n_changed = new_labels.filter("changed").count()
            labels = new_labels.drop("changed")
            if n_changed == 0:
                break
    finally:
        edges.unpersist()
    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return labels.join(sizes, "label").select(
        F.col("id").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        "cluster_size",
        (F.col("id") == F.col("label")).alias("is_canonical"),
    )


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: keep the lowest id per content hash."""
    return (
        docs.groupBy(F.sha2(F.col(text_col), 256).alias("content_hash"))
        .agg(F.min(F.col(id_col)).alias("keep_id"), F.count("*").alias("n_dups"))
    )
