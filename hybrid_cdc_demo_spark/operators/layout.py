"""Data-layout operators: Z-order (Morton-curve) clustering for
multi-dimensional scan pruning.

Why this exists at 100 TB: parquet scans skip row groups / files whose
column min-max stats exclude the predicate. A table sorted on ONE key
prunes perfectly on that key and not at all on any other; interleaving
the bits of several quantized keys (the Z-/Morton curve — the same
layout Delta Lake's OPTIMIZE ZORDER BY and ClickHouse's
mortonEncode use) gives every interleaved dimension partial locality,
so selective predicates on ANY of them skip most of the data. The
pruning benefit is asserted offline in tests/test_layout.py from real
parquet footer stats (the same footer metadata the scan planner uses).

All curve math is static bit-arithmetic expression trees — JVM
whole-stage-codegen, no UDFs, no shuffle beyond the final range
repartition that turns key order into file order.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def quantize(col: Column, lo: Column | float, hi: Column | float, bits: int) -> Column:
    """Linear quantization of a numeric column into [0, 2^bits - 1]
    given (lo, hi) bounds — pure IEEE divide/multiply/floor, so the
    ranks are deterministic and mirrorable in ANSI SQL. Values at or
    beyond the bounds clamp to the edge buckets."""
    lo_c = F.lit(lo) if not isinstance(lo, Column) else lo
    hi_c = F.lit(hi) if not isinstance(hi, Column) else hi
    top = (1 << bits) - 1
    scaled = F.floor(
        (col.cast("double") - lo_c.cast("double"))
        / (hi_c.cast("double") - lo_c.cast("double"))
        * F.lit(float(top))
    ).cast("bigint")
    return F.greatest(F.lit(0).cast("bigint"), F.least(F.lit(top).cast("bigint"), scaled))


def interleave_bits(cols: list[Column], bits: int) -> Column:
    """Morton interleave: bit i of column c lands at position
    i * len(cols) + c. A static tree of bits x dims shift/mask/OR
    terms (e.g. 2 dims x 10 bits = 20 terms) — constant plan size,
    fully inside whole-stage codegen."""
    ndim = len(cols)
    z = F.lit(0).cast("bigint")
    for c_idx, col in enumerate(cols):
        c64 = col.cast("bigint")
        for i in range(bits):
            bit = F.shiftright(c64, i).bitwiseAND(F.lit(1).cast("bigint"))
            z = z.bitwiseOR(F.shiftleft(bit, i * ndim + c_idx))
    return z


def zorder_key(
    cols: list[Column],
    bounds: list[tuple[float, float]] | None = None,
    bits: int = 10,
) -> Column:
    """Z-curve key over ``cols``. With ``bounds`` (static [lo, hi) per
    column — the production shape: bounds come from table stats, not a
    per-write scan) each column is linearly quantized first; without,
    columns are assumed pre-quantized non-negative ints."""
    if bounds is not None:
        cols = [quantize(c, lo, hi, bits) for c, (lo, hi) in zip(cols, bounds)]
    return interleave_bits(cols, bits)


def column_bounds(df: DataFrame, col_names: list[str]) -> list[tuple[float, float]]:
    """(min, max) per column in ONE aggregation — bounded driver-side
    control data (2 doubles per column), the z-order analogue of the
    IVF centroid collect."""
    aggs = []
    for c in col_names:
        aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
    row = df.agg(*aggs).collect()[0]
    return [(float(row[f"_lo_{c}"]), float(row[f"_hi_{c}"])) for c in col_names]


def zorder_write(
    df: DataFrame,
    path: str,
    col_names: list[str],
    bits: int = 10,
    num_files: int = 16,
    bounds: list[tuple[float, float]] | None = None,
) -> None:
    """Cluster ``df`` on the Z-curve of ``col_names`` and write
    ``num_files`` parquet files: range-repartition by the key (one
    shuffle — contiguous curve segments per file) then sort within
    partitions, so every file covers a tight hyper-rectangle and its
    footer min-max stats prune on every interleaved dimension.

    On a real cluster ``num_files`` is sized to target file size
    (~1 GB); the curve/sort plan is identical."""
    if bounds is None:
        bounds = column_bounds(df, col_names)
    keyed = df.withColumn(
        "_z", zorder_key([F.col(c) for c in col_names], bounds, bits)
    )
    (
        keyed.repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_pruning_stats(
    path: str, predicates: dict[str, tuple[float, float]]
) -> tuple[int, int]:
    """(files_that_must_be_read, total_files) for a conjunction of
    range predicates, decided from parquet FOOTER min-max stats alone
    — exactly the skipping decision a scan planner makes. Driver-side
    footer reads (no Spark job), same metadata trick the LSM sink's
    batch stats use."""
    import pyarrow.parquet as pq
    import os

    total = 0
    needed = 0
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        total += 1
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        overlaps = False
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            rg_ok = True
            for col_idx in range(row_group.num_columns):
                col = row_group.column(col_idx)
                cname = col.path_in_schema
                if cname in predicates and col.statistics is not None:
                    lo, hi = predicates[cname]
                    if col.statistics.max < lo or col.statistics.min > hi:
                        rg_ok = False
                        break
            if rg_ok:
                overlaps = True
                break
        if overlaps:
            needed += 1
    return needed, total
