"""Text-analysis operators for training-data pipelines.

Everything is built-in pyspark.sql.functions expressions (JVM, codegen) —
token counting, quality scoring, language-ID heuristics, fingerprinting.
The only Python is ``rolling_fingerprint_udf``, an Arrow-batched pandas UDF
(never row-at-a-time) for the polynomial rolling hash that SQL can't express
without per-row loops.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

DEFAULT_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "on", "for", "it")


def tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), "[^\\p{L}\\p{N}]+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """A BPE-shaped proxy: word pieces ≈ words + ceil(extra chars/4) for
    words longer than 4 chars — a deterministic, cheap token estimator."""
    toks = tokens(text)
    pieces = F.transform(
        toks,
        lambda t: F.lit(1) + F.floor((F.greatest(F.length(t) - 4, F.lit(0))) / 4).cast("int"),
    )
    return F.aggregate(pieces, F.lit(0), lambda acc, x: acc + x)


def quality_features(docs: DataFrame, text_col: str = "text",
                     stopwords: tuple[str, ...] = DEFAULT_STOPWORDS) -> DataFrame:
    """Per-doc quality columns: token count, stopword ratio, distinct-token
    ratio, mean token length, punctuation ratio, composite score in [0,1]."""
    t = F.col(text_col)
    toks = tokens(t)
    n = F.size(toks)
    sw = F.size(F.filter(toks, lambda x: x.isin(*stopwords)))
    uniq = F.size(F.array_distinct(toks))
    punct = F.length(F.regexp_replace(t, "[\\p{L}\\p{N}\\s]+", ""))
    nn = F.greatest(n, F.lit(1)).cast("double")
    stop_ratio = sw / nn
    distinct_ratio = uniq / nn
    punct_ratio = punct / F.greatest(F.length(t), F.lit(1)).cast("double")
    score = (
        F.least(nn / 50.0, F.lit(1.0)) * 0.3
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.3
        + distinct_ratio * 0.2
        + (1.0 - F.least(punct_ratio * 10.0, F.lit(1.0))) * 0.2
    )
    return docs.select(
        "*",
        n.alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


# marker-token profiles for the n-gram language-ID heuristic: the standard
# technique (character/word n-gram profiles per language) reduced to a
# deterministic SQL expression.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "to"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "la", "les", "de", "est"),
    "de": ("der", "die", "das", "und", "ist"),
}


def lang_id(docs: DataFrame, text_col: str = "text",
            profiles: dict[str, tuple[str, ...]] | None = None) -> DataFrame:
    """Heuristic language ID: vote marker tokens per language profile;
    argmax wins, ties → 'und' (undetermined)."""
    profiles = profiles or _LANG_MARKERS
    toks = tokens(F.col(text_col))
    def marker_pred(markers: tuple[str, ...]):
        return lambda x: x.isin(*markers)

    scores = {
        lang: F.size(F.filter(toks, marker_pred(markers)))
        for lang, markers in profiles.items()
    }
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang in sorted(profiles, reverse=True):
        pred = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(pred)
    out = docs.select("*", pred.alias("pred_lang"))
    for lang, s in scores.items():
        out = out.withColumn(f"score_{lang}", s)
    return out


def fingerprint(text: Column) -> Column:
    """Normalized-content digest (exact-dedup / provenance key)."""
    norm = F.regexp_replace(F.lower(text), "\\s+", " ")
    return F.sha2(norm, 256)


@pandas_udf(T.LongType())
def rolling_fingerprint_udf(texts: pd.Series) -> pd.Series:
    """Polynomial rolling hash (Karp-Rabin) over the normalized text —
    vectorized pandas UDF (Arrow batches; no per-row Python in Spark's loop).
    Used for shift-tolerant fingerprinting where sha2 is too brittle."""
    MOD = (1 << 61) - 1
    BASE = 257

    def roll(s: str) -> int:
        h = 0
        for ch in " ".join(s.lower().split()):
            h = (h * BASE + ord(ch)) % MOD
        return h

    return texts.fillna("").map(roll).astype("int64")


def document_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.select(
        "*",
        token_count(F.col(text_col)).alias("n_tokens"),
        bpe_ish_token_count(F.col(text_col)).alias("n_bpe_tokens"),
        F.length(F.col(text_col)).alias("n_chars_actual"),
        fingerprint(F.col(text_col)).alias("fingerprint"),
    )


def _tokens_ascii(text: Column) -> Column:
    """ASCII tokenizer shared with the cross-engine oracles (the \\p{L}
    classes differ between regex engines; [a-z0-9] does not)."""
    return F.filter(F.split(F.lower(text), "[^a-z0-9]+"), lambda t: t != "")


def _max_run(sorted_arr: Column) -> Column:
    """Largest count of any single value in a SORTED array, as one
    expression fold — equal values are adjacent after the sort, so the max
    multiplicity is the max run length.  No explode, no shuffle: the mode
    count of a row-local array in O(n) inside codegen."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc, t):
        run = F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(t.alias("prev"), run.alias("run"),
                        F.greatest(acc["best"], run).alias("best"))

    return F.aggregate(sorted_arr, init, step, lambda acc: acc["best"])


_REP_STRUCT = (
    "n_tokens bigint, distinct_token_ratio double, top_token_fraction double,"
    " dup_bigram_fraction double, top_bigram_fraction double"
)
_rep_feats_udf_cache: list = []


def _rep_feats_arrow():
    """Arrow-batched kernel computing all five repetition features in ONE
    pass per document.  Tokenization (lower → split on ``[^a-z0-9]+`` →
    drop empties) and every ratio are bit-identical to the expression twin
    below: same IEEE-double division, counts from ``Counter`` equal the
    sorted-array fold's mode count.  Rounding stays JVM-side (``F.round``)
    so Spark↔oracle parity is unchanged.

    Built lazily (not a module-level decorator): ``pandas_udf`` parses the
    DDL return-type string through the active session's parser, so
    decorating at import time would make ``import bifrost_spark`` require
    a running SparkSession."""
    if _rep_feats_udf_cache:
        return _rep_feats_udf_cache[0]

    def kernel(text: "pd.Series") -> "pd.DataFrame":
        import re
        from collections import Counter

        import pandas as pd

        pat = re.compile(r"[^a-z0-9]+")
        out = {k: [] for k in ("n_tokens", "distinct_token_ratio", "top_token_fraction",
                               "dup_bigram_fraction", "top_bigram_fraction")}
        for t in text:
            if t is None:
                # null text → n_tokens NULL, ratios 0.0 — matches the expr
                # twin (size(split(NULL)) is NULL; the CASE arms fall to 0.0)
                # and the DuckDB oracle (len(NULL) = NULL)
                out["n_tokens"].append(None)
                for k in ("distinct_token_ratio", "top_token_fraction",
                          "dup_bigram_fraction", "top_bigram_fraction"):
                    out[k].append(0.0)
                continue
            toks = [w for w in pat.split(t.lower()) if w]
            n = len(toks)
            if n:
                c = Counter(toks)
                dtr, ttf = len(c) / n, max(c.values()) / n
            else:
                dtr = ttf = 0.0
            if n >= 2:
                cb = Counter(zip(toks, toks[1:]))
                nb = n - 1
                dbf, tbf = (nb - len(cb)) / nb, max(cb.values()) / nb
            else:
                dbf = tbf = 0.0
            out["n_tokens"].append(n)
            out["distinct_token_ratio"].append(dtr)
            out["top_token_fraction"].append(ttf)
            out["dup_bigram_fraction"].append(dbf)
            out["top_bigram_fraction"].append(tbf)
        return pd.DataFrame(out)

    udf = F.pandas_udf(_REP_STRUCT)(kernel)
    _rep_feats_udf_cache.append(udf)
    return udf


def repetition_features(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        keep: list[str] | None = None,
                        impl: str = "pandas") -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1 — the
    'repetitious documents' filters, adapted to line-less text): per doc,

    - ``n_tokens``
    - ``distinct_token_ratio``  (low → boilerplate / keyword stuffing)
    - ``top_token_fraction``    (fraction held by the single most frequent token)
    - ``dup_bigram_fraction``   (1 − distinct bigrams / bigrams)
    - ``top_bigram_fraction``

    ``impl="pandas"`` (default) computes everything in one Arrow-batched
    kernel: the higher-order-function twin (``impl="expr"``) is
    CodegenFallback — Catalyst interprets it per row with NO common-
    subexpression elimination, so tokenization re-evaluates once per
    feature (~9× measured; 30 s → <1 s at sf0.1).  Both impls produce
    bit-identical doubles (pinned by tests); the expr twin stays as the
    engine-independent spec.  Either way this is a pure projection riding
    the scan — no explode, no shuffle — so a 100 TB corpus computes it in
    the scan stage."""
    if impl == "pandas":
        rf = _rep_feats_arrow()(F.col(text_col)).alias("_rf")
        wide = docs.select(F.col(id_col).alias("doc_id"), rf, *[F.col(c) for c in (keep or [])])
        return wide.select(
            "doc_id",
            F.col("_rf.n_tokens").alias("n_tokens"),
            F.round("_rf.distinct_token_ratio", 6).alias("distinct_token_ratio"),
            F.round("_rf.top_token_fraction", 6).alias("top_token_fraction"),
            F.round("_rf.dup_bigram_fraction", 6).alias("dup_bigram_fraction"),
            F.round("_rf.top_bigram_fraction", 6).alias("top_bigram_fraction"),
            *[F.col(c) for c in (keep or [])],
        )
    if impl != "expr":
        raise ValueError(f"impl must be 'pandas' or 'expr', got {impl!r}")
    toks = _tokens_ascii(F.col(text_col))
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.transform(F.sequence(F.lit(1), n - 1),
                    lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1))),
    ).otherwise(F.array().cast("array<string>"))
    nb = F.size(bigrams)
    safe = lambda num, den: F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))  # noqa: E731
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n.cast("long").alias("n_tokens"),
        F.round(safe(F.size(F.array_distinct(toks)), n), 6).alias("distinct_token_ratio"),
        F.round(safe(_max_run(F.sort_array(toks)), n), 6).alias("top_token_fraction"),
        F.round(safe(nb - F.size(F.array_distinct(bigrams)), nb), 6).alias("dup_bigram_fraction"),
        F.round(safe(_max_run(F.sort_array(bigrams)), nb), 6).alias("top_bigram_fraction"),
        # passthrough columns (``keep``) let composite pipelines gate on the
        # features without a doc_id self-join — still one pure projection
        *[F.col(c) for c in (keep or [])],
    )


_gram_udf_cache: dict = {}


def _distinct_grams_pandas(n: int):
    """Arrow-batched per-doc distinct word n-grams.  Same tokens/grams as
    the expression path (parity pinned in tests) but the tokenize+join runs
    vectorized per batch instead of through interpreted per-element
    higher-order functions — the same trade the repetition kernel and the
    poly-MinHash kernel make."""
    if n in _gram_udf_cache:
        return _gram_udf_cache[n]

    def kernel(texts):
        import re

        import pandas as pd

        pat = re.compile(r"[^a-z0-9]+")
        out = []
        for t in texts:
            if t is None:
                out.append([])
                continue
            toks = [w for w in pat.split(t.lower()) if w]
            # docs shorter than n emit NO grams (a partial gram would let a
            # shared short phrase enter the blocklist and scrub whole short
            # docs); oracles and the expr path match this exactly
            gs = [" ".join(toks[i:i + n]) for i in range(max(len(toks) - n + 1, 0))]
            out.append(list(dict.fromkeys(g for g in gs if g)))
        return pd.Series(out)

    udf = F.pandas_udf("array<string>")(kernel)
    _gram_udf_cache[n] = udf
    return udf


def common_ngrams(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_docs: int = 2,
    top: int = 100,
    impl: str = "auto",
) -> DataFrame:
    """Boilerplate / blocklist builder: the word n-grams shared by the most
    documents (headers, footers, license banners, nav chrome).  The standard
    precursor to span-level dedup (Lee et al. 2021 build their substring
    dedup lists this way): emit grams appearing in >= ``min_docs`` distinct
    docs, most-shared first.  Returns (gram, n_docs), ties broken by gram.

    Scale shape: per-doc distinct grams are row-local array math; explode is
    a flatMap (no shuffle); the ONLY shuffle is the groupBy(gram) count with
    map-side partial aggregation (grams deduped per doc, so count(*) counts
    documents — no expensive count-distinct state); the top-N is
    TakeOrdered (per-partition heap, no global sort shuffle).  Uses the
    ascii tokenizer so the DuckDB oracle recomputes grams identically.

    ``impl``: "expr" builds grams with SQL higher-order functions (the
    engine-independent spec); "pandas" (= "auto") uses the Arrow kernel —
    the interpreted per-element HOF chain re-walks each document per gram
    and dominates the wall on long texts (same fix as the repetition and
    poly-MinHash kernels; post-explode parity pinned in tests)."""
    from bifrost_spark.functions.spread import spread_for_compute

    docs = spread_for_compute(docs)
    if impl in ("auto", "pandas"):
        grams = _distinct_grams_pandas(n)(F.col(text_col))
        exploded = docs.select(F.col(id_col), F.explode(grams).alias("gram"))
    elif impl == "expr":
        from bifrost_spark.functions.dedup import _tokens_ascii as _ta

        toks = _ta(F.col(text_col))
        idx = F.when(
            F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
        ).otherwise(F.array().cast("array<int>"))
        grams = F.filter(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))),
            lambda g: g != "",
        )
        exploded = docs.select(F.col(id_col), F.explode(F.array_distinct(grams)).alias("gram"))
    else:
        raise ValueError(f"impl must be 'auto', 'pandas', or 'expr', got {impl!r}")
    return (
        exploded
        .groupBy("gram")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .orderBy(F.col("n_docs").desc(), F.col("gram"))
        .limit(top)
    )


def remove_boilerplate(
    docs: DataFrame,
    blocklist: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    keep: list[str] | None = None,
) -> DataFrame:
    """The scrub half of the blocklist loop (build with ``common_ngrams``):
    drop every token position covered by an occurrence of a blocklisted
    word n-gram, rebuild the NORMALIZED text (lowercase ascii tokens joined
    by single spaces — the domain the grams were built over).  Returns
    (doc_id, clean_text, n_removed, *keep).

    ``blocklist`` is a plain Python list by design: it is top-N output
    (metadata-scale, ≤ ~10^5 grams), shipped to executors in the UDF
    closure — the same broadcast shape as ``decontaminate``'s benchmark
    grams.  Scale: one Arrow-batched projection, no shuffle, no join; the
    corpus never moves."""
    bl = frozenset(blocklist)

    def kernel(texts):
        import re

        import pandas as pd

        pat = re.compile(r"[^a-z0-9]+")
        clean, removed = [], []
        for t in texts:
            toks = [] if t is None else [w for w in pat.split(t.lower()) if w]
            covered: set = set()
            for i in range(max(len(toks) - n + 1, 0)):
                if " ".join(toks[i:i + n]) in bl:
                    covered.update(range(i, i + n))
            clean.append(" ".join(t for j, t in enumerate(toks) if j not in covered))
            removed.append(len(covered))
        return pd.DataFrame({"clean_text": clean, "n_removed": removed})

    udf = F.pandas_udf("clean_text string, n_removed long")(kernel)
    kcols = [F.col(c) for c in (keep or [])]
    return docs.select(F.col(id_col), udf(F.col(text_col)).alias("_s"), *kcols) \
               .select(id_col, F.col("_s.clean_text").alias("clean_text"),
                       F.col("_s.n_removed").alias("n_removed"), *(keep or []))
