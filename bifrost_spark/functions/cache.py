"""Bookkeeping for operator-internal caches.

``minhash_lsh_candidates`` / ``lsh_bucketed_topk`` persist a narrow
intermediate (signatures / projected vectors) because their plan consumes it
twice (blocking join + late materialization).  The returned DataFrame is a
lazy plan, so the operator cannot unpersist before the caller has consumed
it — instead every persist is registered here and callers (bench loops,
long-lived sessions) call :func:`release_caches` after consuming each
result.  Un-released caches are still safe — Spark evicts cached blocks LRU
under memory pressure — but a long-lived driver should release explicitly so
executor storage does not accumulate across thousands of calls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE_CACHES: list[DataFrame] = []


def register_cache(df: DataFrame) -> DataFrame:
    """Persist ``df`` and remember the handle for :func:`release_caches`."""
    df.persist()
    _LIVE_CACHES.append(df)
    return df


def release_caches() -> None:
    """Unpersist every cache registered since the last release (idempotent).

    Call after the consuming action (count/collect/write) of a returned
    plan; calling earlier is merely a recompute, never a wrong result.
    """
    while _LIVE_CACHES:
        _LIVE_CACHES.pop().unpersist()
