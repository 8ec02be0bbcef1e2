"""Source↔replica reconciliation (anti-entropy) for CDC pipelines: the
periodic audit every replication deployment runs to prove the sink
still equals the source (the reference's lag metric says the replica
is CURRENT; this says it is CORRECT).

Shape: one full-outer join on the key, comparing a row FINGERPRINT
(sha2 of the canonical JSON of the compared columns) instead of N
per-column equality predicates — the comparison cost is one hash per
row regardless of column count, and the join carries only (key,
fingerprint), never the payload. At 100 TB both sides shuffle once on
the key (or co-locate for free if both are bucketed/partitioned by it)
and the diff output is bounded by the drift, not the table.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def row_fingerprint(cols: list[str]) -> F.Column:
    """Order-canonical row hash over the compared columns: sha2 of the
    to_json of a struct with SORTED field names, so both sides hash
    identical logical content identically regardless of column order."""
    return F.sha2(
        F.to_json(F.struct(*[F.col(c).alias(c) for c in sorted(cols)])), 256
    )


def reconcile(
    source: DataFrame,
    target: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Per-key diff: (key..., status) where status ∈
    {'missing_in_target', 'missing_in_source', 'mismatch'} — matching
    rows are dropped (the output is the DRIFT, bounded by divergence).
    """
    s = source.select(
        *key_cols, row_fingerprint(compare_cols).alias("_fp_s")
    )
    t = target.select(
        *key_cols, row_fingerprint(compare_cols).alias("_fp_t")
    )
    joined = s.join(t, key_cols, "full_outer")
    status = (
        F.when(F.col("_fp_t").isNull(), F.lit("missing_in_target"))
        .when(F.col("_fp_s").isNull(), F.lit("missing_in_source"))
        .when(F.col("_fp_s") != F.col("_fp_t"), F.lit("mismatch"))
    )
    return (
        joined.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(*key_cols, "status")
    )


def reconcile_summary(
    source: DataFrame,
    target: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """(status, n) counts plus an 'in_sync' row — the one-line health
    report a reconciliation job publishes per table per run."""
    diff = reconcile(source, target, key_cols, compare_cols)
    per_status = diff.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    n_source = source.select(*key_cols).distinct().count()
    # source keys NOT in sync = the ones missing from the target or
    # mismatched (missing_in_source rows are extra TARGET keys)
    n_bad_source = diff.filter(
        F.col("status").isin("missing_in_target", "mismatch")
    ).count()
    in_sync = per_status.sparkSession.createDataFrame(
        [("in_sync_keys", int(n_source - n_bad_source))],
        "status string, n long",
    )
    return per_status.unionByName(in_sync).orderBy("status")
