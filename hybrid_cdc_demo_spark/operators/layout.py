"""Z-order (Morton-curve) data layout for multi-column file skipping.

The 100 TB problem: parquet scans skip files/row-groups whose footer
min/max stats exclude the filter, but that only works for the column
the data happens to be sorted by. A linear sort on `a` makes every
file span the full range of `b`, so predicates on `b` prune nothing.
Interleaving the bits of both columns' quantized values (the Morton /
Z-order curve — the layout behind Delta Lake's OPTIMIZE ZORDER BY and
the classic UB-tree) gives every file a narrow min/max box in EVERY
clustered dimension, so selective predicates on any of them skip most
of the data. This module implements it with plain DataFrame
expressions: quantize each column into 2^bits buckets against its
observed (or caller-supplied) bounds, interleave bucket bits into one
long, range-partition + sort on that code, write parquet.

Everything is JVM-side whole-stage-codegen expressions (shiftleft/
shiftright/floor — no UDF); the only driver-side work is the bounds
aggregate (one row) when bounds aren't supplied. `candidate_files`
reads parquet footers (pyarrow, zero Spark jobs) and returns the
files a min/max-pruning reader would have to touch for a conjunction
of range predicates — the measurable skipping contract the tests pin.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Bucket a value into [0, 2^bits) by linear position in [lo, hi];
    values at/above hi clamp to the top bucket (span==0 → bucket 0)."""
    n = 1 << bits
    span = hi - lo
    if span <= 0:
        return F.lit(0).cast("long")
    q = F.floor((col.cast("double") - F.lit(lo)) / F.lit(span) * F.lit(n))
    return F.greatest(F.lit(0), F.least(F.lit(n - 1), q)).cast("long")


def zorder_code(
    cols: list[str], bounds: dict[str, tuple[float, float]], bits: int = 8
) -> Column:
    """Morton code column: the i-th bit of each column's bucket lands
    at interleaved position i*ncols + col_index. bits*ncols must fit
    a signed long (<= 62). The expression is bits×ncols shift/mask
    terms — fully codegen'd, no UDF."""
    ncols = len(cols)
    if bits * ncols > 62:
        raise ValueError(f"bits*ncols = {bits * ncols} exceeds long range")
    code = F.lit(0).cast("long")
    for ci, name in enumerate(cols):
        lo, hi = bounds[name]
        q = _quantize(F.col(name), lo, hi, bits)
        for bi in range(bits):
            bit = F.shiftright(q, bi).bitwiseAND(F.lit(1))
            code = code + F.shiftleft(bit, bi * ncols + ci)
    return code


def compute_bounds(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    """One-row min/max aggregate — the bounded-metadata job a real
    OPTIMIZE ZORDER also runs (Delta uses table stats the same way)."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
    row = df.agg(*aggs).collect()[0]
    return {c: (float(row[f"_lo_{c}"]), float(row[f"_hi_{c}"])) for c in cols}


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int,
    bits: int = 8,
    bounds: dict[str, tuple[float, float]] | None = None,
) -> dict[str, tuple[float, float]]:
    """Cluster ``df`` on the Z-curve of ``cols`` and write parquet:
    repartitionByRange on the code (contiguous curve segments per
    file — exactly one shuffle, same cost class as any sorted write)
    + sortWithinPartitions so row groups inside a file are tight too.
    Returns the bounds used (callers persist them to z-order
    incremental appends against the same grid)."""
    bounds = bounds or compute_bounds(df, cols)
    code = zorder_code(cols, bounds, bits)
    (
        df.withColumn("_z", code)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
    return bounds


def candidate_files(
    path: str, predicates: dict[str, tuple[float, float]]
) -> tuple[int, int]:
    """(files a min/max-pruning reader must touch, total files) for a
    conjunction of closed-range predicates — straight from parquet
    footers, no Spark job. This is the same file-level elimination
    Spark/Delta/Iceberg do from footer or manifest stats; it is the
    operator's measurable contract."""
    import pyarrow.parquet as pq
    from pathlib import Path

    total = 0
    touched = 0
    for f in Path(path).rglob("*.parquet"):
        total += 1
        md = pq.ParquetFile(str(f)).metadata
        names = md.schema.names
        overlaps = True
        for col, (lo, hi) in predicates.items():
            idx = names.index(col)
            cmin: float | None = None
            cmax: float | None = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    cmin, cmax = None, None
                    break
                cmin = st.min if cmin is None else min(cmin, st.min)
                cmax = st.max if cmax is None else max(cmax, st.max)
            if cmin is None:
                continue  # no stats → cannot prune on this column
            if cmax < lo or cmin > hi:
                overlaps = False
                break
        if overlaps:
            touched += 1
    return touched, total
