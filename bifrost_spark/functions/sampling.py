"""Deterministic sampling operators for training-data pipelines.

Random sampling is useless in a reproducible data pipeline — re-running the
job must keep the SAME rows, across engines and cluster sizes.  Both
operators here derive keep/rank decisions from a salted sha256 of the row
key, so results are a pure function of (data, salt), engine-independent
(the DuckDB oracles recompute them with their own sha256), and stable under
repartitioning.

Scale notes:
- ``deterministic_sample`` is a plain scan filter (one foldable predicate
  over a hash of the key) — no shuffle, pushes through column pruning, and
  composes with any downstream op.  Changing the salt draws an independent
  sample; widening the threshold strictly GROWS the kept set (nested
  samples for scaling-law runs: the 1% sample is a subset of the 10%).
- ``stratified_cap`` bounds every stratum (language, source, domain) to at
  most ``cap`` rows, picked by hash order — the standard rebalancing step
  before training-mix assembly.  It is one shuffle on the strata column; a
  single stratum lands on one reducer, which is exactly right for the
  many-small-strata shape (languages, domains).  For a pathological single
  giant stratum, pre-filter with ``deterministic_sample`` at an estimated
  rate first, then cap exactly — the two compose because both are
  hash-deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["deterministic_sample", "stratified_cap"]


def _hash_key(key: Column, salt: str) -> Column:
    return F.sha2(F.concat_ws(":", F.lit(salt), key.cast("string")), 256)


def deterministic_sample(
    df: DataFrame,
    threshold_hex: str = "4000",
    key_col: str = "doc_id",
    salt: str = "s1",
) -> DataFrame:
    """Keep rows whose salted-sha256 prefix sorts below ``threshold_hex``:
    rate = int(threshold_hex, 16) / 16**len(threshold_hex) (e.g. "4000" =
    1/4).  Hex-string comparison avoids any hex→int conversion, so the
    identical predicate runs on every engine with a sha256 function."""
    n = len(threshold_hex)
    return df.filter(F.substring(_hash_key(F.col(key_col), salt), 1, n) < F.lit(threshold_hex.lower()))


def stratified_cap(
    df: DataFrame,
    strata_col: str = "lang",
    cap: int = 50,
    key_col: str = "doc_id",
    salt: str = "s1",
    rank_col: str = "sample_rank",
) -> DataFrame:
    """At most ``cap`` rows per stratum, chosen by salted-hash order (a
    uniform draw, but reproducible).  Appends ``rank_col`` (1-based rank
    within the stratum) so callers can tighten the cap downstream without
    re-shuffling."""
    order = F.substring(_hash_key(F.col(key_col), salt), 1, 16)
    w = Window.partitionBy(strata_col).orderBy(order, F.col(key_col))
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= cap)
    )


def training_mix(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "s1",
    default_rate: float = 0.0,
    hex_digits: int = 6,
) -> DataFrame:
    """Weighted training-mix assembly: keep each stratum (source, domain,
    language) at its own target rate — e.g. {"web": 0.1, "code": 1.0,
    "books": 0.5} — with the same salted-sha256 keep rule as
    ``deterministic_sample``, so the mix is reproducible, engine-independent,
    and nested (raising one stratum's rate strictly grows its kept set
    without disturbing the others; the hash never sees the rate).

    Scale shape: ONE scan-stage filter — the per-stratum threshold is a
    CASE over literals, no join against a rates table, no shuffle; strata
    missing from ``rates`` fall back to ``default_rate``."""
    def thr_hex(rate: float) -> str:
        q = int(rate * (16 ** hex_digits))
        return format(min(max(q, 0), 16 ** hex_digits - 1), f"0{hex_digits}x")

    prefix = F.substring(_hash_key(F.col(key_col), salt), 1, hex_digits)

    def keep_for(rate: float) -> Column:
        if rate >= 1.0:
            return F.lit(True)
        if rate <= 0.0:
            return F.lit(False)
        return prefix < F.lit(thr_hex(rate))

    cond = keep_for(default_rate)
    for stratum, rate in sorted(rates.items()):
        cond = F.when(F.col(strata_col) == stratum, keep_for(rate)).otherwise(cond)
    return df.filter(cond)
