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


def global_rank(
    df: DataFrame,
    order_cols: list,
    rank_col: str = "pos",
    partitions: int | None = None,
) -> DataFrame:
    """Distributed global enumeration: assign each row its 1-based
    position in the total order of ``order_cols`` — the primitive
    behind "shuffle the corpus once and write it in training order"
    (order by a content-free hash), global sequence ids, and stable
    pagination. Spark's own ``row_number()`` over an unpartitioned
    window executes in ONE task; this is the scale-safe re-expression:

    1. range-repartition + in-partition sort on the order key (a
       global sort's exact plan, ONE wide exchange);
    2. per-partition row counts — a partial-aggregated ≤P-row frame
       to the driver (bounded control data, the partition-head class);
    3. a map-side Arrow pass adds each partition's cumulative offset
       to its local 0-based position.

    The sorted frame is localCheckpoint'ed so both passes see the same
    row→partition assignment (ContextCleaner-reclaimed, not
    CacheManager-pinned). Ties in ``order_cols`` get positions in
    partition order — pass a unique tiebreak column for a total order
    (the oracle-matched callers always do).
    """
    import pyspark.sql.functions as F

    spark = df.sparkSession
    num = int(partitions or spark.sparkContext.defaultParallelism)
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    d = (
        df.repartitionByRange(num, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
        # lazy: the counts aggregation below touches every partition,
        # so it materializes the checkpoint as a side effect — one
        # upstream pass instead of a dedicated eager job + a cached
        # re-read (r10, the BPE/MMR lazy-checkpoint pattern)
        .localCheckpoint(eager=False)
    )
    counts = {
        int(r["_pid"]): r["n"]
        for r in d.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    offset, offsets = 0, {}
    for pid in sorted(counts):
        offsets[pid] = offset
        offset += counts[pid]
    out_fields = [f for f in d.schema.fields if f.name != "_pid"]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in out_fields
    ) + f", {rank_col} long"
    names = [f.name for f in out_fields]

    def enumerate_batches(batches):
        local = 0
        for pdf in batches:
            if not len(pdf):
                continue
            base = offsets[int(pdf["_pid"].iloc[0])]
            out = pdf[names].copy()
            out[rank_col] = range(base + local + 1, base + local + 1 + len(pdf))
            local += len(pdf)
            yield out

    return d.mapInPandas(enumerate_batches, schema=out_schema)


def global_rank_cumsum(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    rank_col: str = "pos",
    cum_col: str = "cum",
    cum_type: str = "decimal(28,6)",
    partitions: int | None = None,
    total_col: str | None = None,
) -> DataFrame:
    """Distributed total-order enumeration PLUS exact prefix sums: each
    row gets its 1-based position in the ``order_cols`` total order
    and the running sum of ``value_col`` up to and including itself —
    the scale-safe form of ``SUM(v) OVER (ORDER BY ...)`` (which Spark
    executes in ONE task when the window has no PARTITION BY).

    Same plan as :func:`global_rank` — one range exchange + in-
    partition sort, then a ≤P-row control frame to the driver — but
    the per-partition summary now carries (row count, exact DECIMAL
    value sum), so the driver prefix-folds BOTH offsets and the Arrow
    pass emits position and cumulative sum in the same sweep. The
    value must be a DECIMAL column: partition subtotals and the Python
    ``decimal.Decimal`` prefix fold are then exact, so the cumulative
    sums are bitwise-reproducible regardless of partitioning.

    Ties in ``order_cols`` get positions in partition order — pass a
    unique tiebreak column for a total order (callers here always do).

    ``total_col`` additionally emits the GRAND total of ``value_col``
    as a literal column: the driver's prefix fold over the ≤P-row
    control frame already computes it (exact Decimal addition is
    order-independent), so callers that need ``cum / total`` stop
    paying a second full aggregation pass over the input just to
    recompute a number this operator always knew (r10, guide §1.2).
    """
    import decimal

    import pyspark.sql.functions as F

    spark = df.sparkSession
    num = int(partitions or spark.sparkContext.defaultParallelism)
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    d = (
        df.repartitionByRange(num, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
        # lazy: the summaries aggregation materializes it (see
        # global_rank)
        .localCheckpoint(eager=False)
    )
    summaries = {
        int(r["_pid"]): (int(r["n"]), r["s"])
        for r in d.groupBy("_pid")
        .agg(F.count("*").alias("n"), F.sum(value_col).alias("s"))
        .collect()
    }
    count_off, sum_off = 0, decimal.Decimal(0)
    offsets: dict[int, tuple[int, decimal.Decimal]] = {}
    for pid in sorted(summaries):
        offsets[pid] = (count_off, sum_off)
        n, s = summaries[pid]
        count_off += n
        sum_off += decimal.Decimal(s) if s is not None else 0
    out_fields = [f for f in d.schema.fields if f.name != "_pid"]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in out_fields
    ) + f", {rank_col} long, {cum_col} {cum_type}"
    names = [f.name for f in out_fields]

    def sweep(batches):
        import itertools

        local_n = 0
        local_s = None
        for pdf in batches:
            if not len(pdf):
                continue
            base_n, base_s = offsets[int(pdf["_pid"].iloc[0])]
            if local_s is None:
                local_s = base_s
            out = pdf[names].copy()
            out[rank_col] = range(
                base_n + local_n + 1, base_n + local_n + 1 + len(pdf)
            )
            vals = [decimal.Decimal(v) for v in pdf[value_col]]
            out[cum_col] = list(
                itertools.accumulate(vals, initial=local_s)
            )[1:]
            local_n += len(pdf)
            local_s = local_s + sum(vals)
            yield out

    out = d.mapInPandas(sweep, schema=out_schema)
    if total_col is not None:
        # sum_off has folded every partition subtotal by now — it IS
        # the exact grand total (empty input leaves Decimal(0), and
        # then there are no rows for the literal to appear on anyway)
        import pyspark.sql.functions as F

        out = out.withColumn(total_col, F.lit(sum_off).cast(cum_type))
    return out
