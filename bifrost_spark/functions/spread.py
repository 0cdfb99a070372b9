"""Small-input parallelism guard for compute-amplifying stages.

The driver test tables are single-row-group parquet files, and a
single-row-group file is unsplittable — the scan collapses to ONE task no
matter how many cores the session has, serializing everything narrow that
follows (shingling, signature matmuls, JSON encodes).  At 100 TB the scan
has orders of magnitude more splits than the cluster has cores and this
helper is an explicit no-op; the cluster-scale knob remains
``spark.sql.files.maxPartitionBytes``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_compute(df: DataFrame) -> DataFrame:
    """Round-robin repartition a compute-amplifying input up to one task per
    core; inputs already at/above core width pass through untouched.  The
    repartition shuffles only the raw input rows (cheap, narrow) and buys
    full-width parallelism for everything downstream."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    return df.repartition(target) if n < target else df
