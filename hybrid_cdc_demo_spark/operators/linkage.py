"""Record-linkage operators: blocked fuzzy joins without the cross
product.

The naive fuzzy join (every left row scored against every right row)
is O(n*m) — dead at any real scale. The scale path here is FastSS-style
deletion-neighborhood blocking (Bocek et al., 2007, the spell-checker
indexing trick): every string expands to itself plus its single-char
deletions; two strings within edit distance 1 ALWAYS share a variant
(substitution: delete the differing position from both; indel: the
shorter string is itself a deletion of the longer), so an equi-join on
the variant string finds every true pair — zero recall loss, proved by
the brute-force differential oracle in plans/linkage_queries.py. False
candidates (distance 2 via different deletions) are removed by an
exact bounded-levenshtein verify, the same candidate-gen + verify
shape as the MinHash/edit-distance dedup family (operators/dedup.py).

Candidate cost is (len+1) rows per record and an equi-join whose key
distribution follows the data (no positional prefix blocks — prefix
blocking collapses catastrophically on sequential identifiers, which
is exactly what TPC-H-style names are)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def deletion_variants(col: Column | str) -> Column:
    """The string plus every single-character deletion, as an array —
    a static higher-order expression (transform over sequence), JVM
    whole-stage codegen, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    dels = F.transform(
        F.sequence(F.lit(1), F.length(c)),
        lambda i: F.concat(
            F.substring(c, F.lit(1), i - 1), F.substring(c, i + 1, F.length(c))
        ),
    )
    return F.array_union(F.array(c), dels)


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_text: str,
    right_text: str,
    left_id: str,
    right_id: str,
    max_dist: int = 1,
) -> DataFrame:
    """Edit-distance-bounded join via deletion-neighborhood blocking:
    (left_id, right_id, dist) for every pair with
    levenshtein(left_text, right_text) <= max_dist.

    Recall guarantee holds for max_dist=1 (the FastSS k=1 theorem);
    larger budgets would need k-deletion neighborhoods, which explode
    combinatorially — raise instead of silently under-recalling."""
    if max_dist != 1:
        raise ValueError(
            "deletion-neighborhood blocking guarantees recall only for "
            f"max_dist=1 (got {max_dist}); use k-deletion variants or "
            "an LSH family for larger budgets"
        )
    lv = left.select(
        F.col(left_id).alias("_lid"),
        F.col(left_text).alias("_ltext"),
        F.explode(deletion_variants(left_text)).alias("_variant"),
    )
    rv = right.select(
        F.col(right_id).alias("_rid"),
        F.col(right_text).alias("_rtext"),
        F.explode(deletion_variants(right_text)).alias("_variant"),
    )
    # Verify IN PLACE, before the distinct (guide §2.3 — shuffle fewer
    # bytes and fewer rows): the bounded levenshtein (early-exit DP,
    # -1 above the budget) runs on each candidate occurrence right
    # after the variant join, so the dedup exchange carries only
    # (id, id, dist) for TRUE matches instead of every banded
    # candidate pair with both text payloads. dist is a pure function
    # of the (unique-id) pair, so filter-then-distinct returns the
    # identical row set the old distinct-then-score shape did. (No
    # spread() here: the variant join's own exchange redistributes the
    # work, and on a well-partitioned production input spread was a
    # no-op anyway.)
    d = F.expr(f"levenshtein(_ltext, _rtext, {int(max_dist)})")
    scored = (
        lv.join(rv, "_variant")
        .select("_lid", "_rid", d.alias("dist"))
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
    )
    return scored.distinct().select(
        F.col("_lid").alias(left_id),
        F.col("_rid").alias(right_id),
        "dist",
    )
