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


def skew_salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to hot keys: the large side scatters each
    key across ``salt_buckets`` random salts, the small side is
    replicated once per salt, and the join runs on (key, salt) — a hot
    key's rows now land on ``salt_buckets`` tasks instead of one.

    AQE's skew-join splitting handles most cases automatically
    (``spark.sql.adaptive.skewJoin.enabled`` is on in our session
    factory); this explicit form is for the pathological keys AQE's
    thresholds won't split (e.g. one key = 40% of a 100 TB table) or
    non-AQE environments. Salted output is row-identical to the plain
    join (property-tested).

    Only ``inner`` and ``left`` (outer) are supported: under right/full
    outer the replicated small side would emit every UNMATCHED small
    row once per salt — salt_buckets duplicates the plain join doesn't
    have. (Matched rows are fine under any ``how``; it's the
    null-extended ones that multiply.)"""
    import pyspark.sql.functions as F

    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"skew_salted_join supports how='inner'|'left', got {how!r}: "
            "right/full outer would emit unmatched small-side rows once "
            "per salt"
        )

    salted_large = large.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    salted_small = small.withColumn("__salt", salts)
    out = salted_large.join(salted_small, [key, "__salt"], how)
    return out.drop("__salt")
