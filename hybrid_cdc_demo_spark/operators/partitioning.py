"""Physical-layout helpers for operator inputs.

At 100 TB an input table arrives with thousands of row groups and the
scan parallelizes naturally. The local testdata is the opposite — a
single-row-group parquet file scans as ONE partition (parquet can't
split inside a row group), so any expression-heavy operator would run
single-core. ``spread`` repartitions only when the input has fewer
partitions than the cluster has slots; on a well-partitioned
production input it is a no-op, so plans keep their scan-time
pruning/pushdown and avoid a pointless full shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure at least ``min_partitions`` (default: cluster default
    parallelism) partitions before CPU-heavy per-row work."""
    target = (
        min_partitions
        or df.sparkSession.sparkContext.defaultParallelism
    )
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
