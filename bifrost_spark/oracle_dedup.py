"""Spark-free twin of the PRODUCTION-mode (xxhash64-shingled) MinHash-LSH
pipeline — the oracle for ``dedup_minhash_lsh_xx``.

The poly-hash twin of this entry is fully recomputed in DuckDB SQL; the
xxhash64 mode couldn't be, because no SQL engine ships Spark's hash.  The
pure-Python XXH64 in :mod:`bifrost_spark.xxh64` (verified bit-equal against
the JVM intrinsic) removes that gap: this module recomputes the ENTIRE
pipeline — tokenize → word n-grams → xxhash64 shingles → k universal-hash
minima → band slices → candidate pairs → signature-estimate — with numpy +
pure Python, sharing no code with the engine's DataFrame expressions.

The driver-facing oracle then combines two independent checks:
- candidate pairs + est_jaccard from THIS twin (cross-implementation XXH64);
- exact Jaccard recomputed by DuckDB from the raw gram STRING sets
  (hash-independent — the half of the pipeline SQL can check directly).

Engine counterpart: bifrost_spark/functions/dedup.py::minhash_lsh_candidates
(hash_fn="xxhash64").  Reference behavior being twinned: the full-table dedup
sweep Bifrost leaves to its sinks; see SURVEY.md §2 "LLM-data ops".
"""

from __future__ import annotations

import unicodedata

import numpy as np
import pandas as pd

from bifrost_spark.xxh64 import xxh64_str

_MERSENNE = (1 << 31) - 1


def tokens_unicode(text: str) -> list[str]:
    """Twin of the engine's ``F.split(lower(text), "[^\\p{L}\\p{N}]+")``
    (+ empty filter): runs of Unicode letter/number category characters.
    Implemented by category scan, not regex, so Python's ``\\w`` (which
    includes ``_``) can't silently diverge from Java's ``\\p{L}\\p{N}``."""
    out, cur = [], []
    for ch in text.lower():
        if unicodedata.category(ch)[0] in ("L", "N"):
            cur.append(ch)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out


def grams_of(toks: list[str], n_gram: int) -> list[str]:
    """Twin of the engine's gram builder: sequence(0, greatest(len-n, 0))
    start indices, n-token slices (shorter at the tail when len < n),
    empty grams filtered."""
    hi = max(len(toks) - n_gram, 0)
    gs = [" ".join(toks[i : i + n_gram]) for i in range(hi + 1)]
    return [g for g in gs if g != ""]


def minhash_lsh_candidates_xx_oracle(
    docs: pd.DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_gram: int = 3,
    k: int = 32,
    bands: int = 8,
    min_jaccard: float = 0.5,
    seed: int = 1,
) -> pd.DataFrame:
    """Recompute minhash_lsh_candidates(hash_fn="xxhash64") end-to-end with
    no Spark.  Returns (doc_a, doc_b, est_jaccard, jaccard) sorted, same
    rounding contract as the engine (shortest-repr HALF_UP at 6 — see
    ``_round6``).  Pass ``min_jaccard=0.0`` to emit the full pre-verify
    candidate set (the driver oracle does this and re-applies the Jaccard
    filter in DuckDB from the raw gram strings, hash-independently)."""
    rows_per_band = k // bands
    a_coef = np.array(
        [((seed * 1_000_003 + i * 92_821) % _MERSENNE or 1) for i in range(k)],
        dtype=np.int64,
    )
    b_coef = np.array(
        [(seed * 689_287 + i * 283_111) % _MERSENNE for i in range(k)], dtype=np.int64
    )

    ids, sh_sets, sigs = [], {}, {}
    hash_memo: dict[str, int] = {}
    for _, row in docs[[id_col, text_col]].iterrows():
        did = int(row[id_col])
        gs = grams_of(tokens_unicode(str(row[text_col])), n_gram)
        sh = []
        seen = set()
        for g in gs:  # array_distinct preserves nothing we rely on — set is fine
            h = hash_memo.get(g)
            if h is None:
                h = xxh64_str(g)
                hash_memo[g] = h
            if h not in seen:
                seen.add(h)
                sh.append(h)
        ids.append(did)
        sh_sets[did] = frozenset(sh)
        if sh:
            x = np.array(sh, dtype=np.int64) % _MERSENNE  # pmod: non-negative
            # (a*x + b) % p per permutation; a,x < 2^31 → products < 2^62
            sig = ((a_coef[:, None] * x[None, :] + b_coef[:, None]) % _MERSENNE).min(axis=1)
        else:
            sig = np.full(k, np.iinfo(np.int64).max, dtype=np.int64)  # array_min([]) → null; empty docs band uniquely
        sigs[did] = sig

    # banding: equality on the raw signature slice — the engine's xxhash64
    # bucket value preserves slice equality, so pair membership is identical
    buckets: dict[tuple, list[int]] = {}
    for did in ids:
        sig = sigs[did]
        for b in range(bands):
            key = (b, tuple(sig[b * rows_per_band : (b + 1) * rows_per_band]))
            buckets.setdefault(key, []).append(did)

    pairs = set()
    for members in buckets.values():
        if len(members) < 2:
            continue
        ms = sorted(members)
        for i, da in enumerate(ms):
            for db in ms[i + 1 :]:
                pairs.add((da, db))

    out = []
    for da, db in sorted(pairs):
        sa, sb = sh_sets[da], sh_sets[db]
        inter = len(sa & sb)
        union = len(sa) + len(sb) - inter
        if union == 0:
            continue  # engine: null jaccard rows fail the >= filter
        jac = _round6(inter / union)
        # the engine filters on the ROUNDED alias (select → filter), so a
        # raw 0.4999996 passes as 0.5 there — compare post-rounding here too
        if jac < min_jaccard:
            continue
        est = float((sigs[da] == sigs[db]).sum()) / k
        out.append(
            {
                "doc_a": da,
                "doc_b": db,
                "est_jaccard": _round6(est),
                "jaccard": jac,
            }
        )
    return pd.DataFrame(out, columns=["doc_a", "doc_b", "est_jaccard", "jaccard"]).astype(
        {"doc_a": "int64", "doc_b": "int64", "est_jaccard": "float64", "jaccard": "float64"}
    )


def _round6(v: float) -> float:
    """HALF_UP at 6 decimals on the shortest decimal repr — exactly Spark's
    ``F.round`` on a double (BigDecimal.valueOf → Double.toString shortest
    repr → setScale(6, HALF_UP)).  Matters for exactly-representable
    midpoints like 1/128 = 0.0078125, where numpy's half-even would emit
    0.007812 but Spark and DuckDB emit 0.007813."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(v)).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP))
