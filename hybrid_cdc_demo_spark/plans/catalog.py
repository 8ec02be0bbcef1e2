"""Declared query inventory (SURVEY.md §2c) — DataFrame builders + DuckDB oracles.

Every entry in :data:`QUERIES` is a ``(spark, sf_dir) -> DataFrame``
builder expressed with the DataFrame API (Catalyst plans the physical
execution); :data:`ORACLE_SQL` holds the equivalent ANSI SQL that the
DuckDB oracle runs over the same parquet tables. Keys without an
oracle entry are tolerance- or property-checked instead (approx
aggregates, LSH variants, pandas_udf-only ops).

Determinism rules (so engine and oracle hash-match):
* every computed column is aliased identically on both sides;
* double aggregates go through exact DECIMAL intermediates, are cast
  back to DOUBLE, then ROUNDed — both engines then produce the same
  bits regardless of shuffle/accumulation order;
* window orderings carry a unique tiebreak column (event_id);
* the events ns-timestamps are truncated to µs identically (see
  sources.tables.load_table).

Scale notes (100 TB posture) are inline per query: broadcast hints on
dimension joins, no driver-side collects in any hot path, aggregations
partial-aggregated map-side by Catalyst.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hybrid_cdc_demo_spark.sources.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


# Exact-decimal helpers: doubles → DECIMAL so SUMs are associative and
# engine/oracle agree bit-for-bit after the final cast back to DOUBLE.
_DEC_PRICE = "decimal(12,2)"  # l_extendedprice / o_totalprice magnitude
_DEC_FRAC = "decimal(3,2)"  # discount/tax in [0,1)


def _dec(col: str, typ: str = _DEC_PRICE):
    return F.col(col).cast(typ)


# ---------------------------------------------------------------------------
# Q1-Q21: relational core
# ---------------------------------------------------------------------------


@query(
    "q01_scan_project",
    oracle="""
    SELECT l_orderkey, l_quantity FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
)
def q01(spark, sf_dir):
    """Scan + projection (column pruning reaches the parquet scan)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .orderBy("l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_quantity")
    )


@query(
    "q02_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber FROM lineitem
    WHERE l_discount > 0.05 AND (l_returnflag = 'R' OR l_tax < 0.02)
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q02(spark, sf_dir):
    """Conjunctive/disjunctive filter — pushed down to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_discount") > 0.05)
            & ((F.col("l_returnflag") == "R") | (F.col("l_tax") < 0.02))
        )
        .orderBy("l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_linenumber")
    )


@query(
    "q03_agg_tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS c,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 2) AS avg_price
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q03(spark, sf_dir):
    """TPC-H Q1-shaped hash aggregate (map-side partial agg + final)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("c"),
            F.round(F.sum(_dec("l_quantity")).cast("double"), 2).alias("sum_qty"),
            F.round(
                F.sum(_dec("l_extendedprice")).cast("double") / F.count("*"), 2
            ).alias("avg_price"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q04_distinct_count",
    oracle="SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS cd FROM orders",
)
def q04(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .agg(F.countDistinct("o_custkey").alias("cd"))
    )


@query("q05_approx_distinct")  # tolerance-checked, not hash-matched
def q05(spark, sf_dir):
    """HyperLogLog++ approximate distinct (within 5%% of exact)."""
    return (
        load_table(spark, sf_dir, "orders")
        .agg(F.approx_count_distinct("o_custkey").alias("cd_approx"))
    )


@query(
    "q06_join_broadcast",
    oracle="""
    SELECT n_name, CAST(COUNT(*) AS BIGINT) AS c
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
)
def q06(spark, sf_dir):
    """Dim join: nation is broadcast — no shuffle of the fact side."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("c"))
        .orderBy("n_name")
    )


@query(
    "q07_join_multiway",
    oracle="""
    SELECT c_mktsegment,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * CAST(1 - CAST(l_discount AS DECIMAL(3,2)) AS DECIMAL(3,2))), 2) AS DOUBLE) AS rev
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def q07(spark, sf_dir):
    """TPC-H Q3-shaped 3-way join; AQE picks broadcast vs sort-merge
    per side. r10 negative result (kept for the record): a guide-§2.3
    per-order pre-aggregation of lineitem (sum the exact-DECIMAL
    amounts by l_orderkey before any join — bit-identical by
    associativity) measured consistently SLOWER on the interleaved
    A/B (old [2.10, 1.96, 2.08] vs pre-agg [2.26, 2.09, 2.25] s,
    new > old in 4/4 rounds): locally the planner broadcasts the
    projected fact side, so the pre-agg just inserts an exchange, and
    at scale its shuffle saving depends on orderkey co-location in
    the files (partial aggregation collapses nothing on a shuffled
    layout) while AQE's size-driven join choice already avoids the
    broadcast. Reverted — the join-then-aggregate form stays."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    amount = _dec("l_extendedprice") * (
        (F.lit(1) - _dec("l_discount", _DEC_FRAC)).cast(_DEC_FRAC)
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("c_mktsegment")
        .agg(F.round(F.sum(amount), 2).cast("double").alias("rev"))
        .orderBy("c_mktsegment")
    )


@query(
    "q08_join_left_outer",
    oracle="""
    SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey ORDER BY c DESC, c_custkey LIMIT 100
    """,
)
def q08(spark, sf_dir):
    """TPC-H Q13-shaped left outer join + count of non-null keys."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c"))
        .orderBy(F.desc("c"), "c_custkey")
        .limit(100)
    )


@query(
    "q09_join_semi",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS c FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
    """,
)
def q09(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    big = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 100000)
        .select("o_custkey")
    )
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
        .agg(F.count("*").alias("c"))
    )


@query(
    "q10_join_anti",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS c FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q10(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .agg(F.count("*").alias("c"))
    )


@query(
    "q11_join_range",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS c
    FROM part p JOIN lineitem l
      ON p.p_partkey = l.l_partkey AND l.l_quantity < p.p_size
    """,
)
def q11(spark, sf_dir):
    """Equi-join with residual range predicate; part side broadcast."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(
            F.broadcast(part),
            (li.l_partkey == part.p_partkey) & (li.l_quantity < part.p_size),
        )
        .agg(F.count("*").alias("c"))
    )


@query(
    "q12_cdc_latest_wins",
    oracle="""
    SELECT user_id, event_type, value FROM (
      SELECT user_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1 ORDER BY user_id
    """,
)
def q12(spark, sf_dir):
    """Latest event per key — exactly ClickHouse ReplacingMergeTree /
    CDC latest-wins semantics (reference src/sinks/clickhouse.py:81-145)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .orderBy("user_id")
        .select("user_id", "event_type", "value")
    )


@query(
    "q13_window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, CAST(r AS INTEGER) AS r FROM (
      SELECT o_custkey, o_orderkey,
             RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS r
      FROM orders
    ) WHERE r <= 3 ORDER BY o_custkey, r, o_orderkey
    """,
)
def q13(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    return (
        orders.withColumn("r", F.rank().over(w))
        .filter(F.col("r") <= 3)
        .orderBy("o_custkey", "r", "o_orderkey")
        .select("o_custkey", "o_orderkey", "r")
    )


@query(
    "q14_window_frame_sum",
    oracle="""
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 2) AS s
    FROM events ORDER BY user_id, ts, event_id
    """,
)
def q14(spark, sf_dir):
    """Analytic window with an explicit ROWS frame (≤4 doubles summed in
    a defined order → bit-identical across engines)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return (
        ev.withColumn("s", F.round(F.sum("value").over(w), 2))
        .orderBy("user_id", "ts", "event_id")
        .select("user_id", "ts", "s")
    )


@query(
    "q15_window_lag",
    oracle="""
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
           value - LAG(value, 1, 0.0) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS d
    FROM events ORDER BY user_id, ts, event_id
    """,
)
def q15(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("d", F.col("value") - F.lag("value", 1, 0.0).over(w))
        .orderBy("user_id", "ts", "event_id")
        .select("user_id", "ts", "d")
    )


@query(
    "q16_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
)
def q16(spark, sf_dir):
    """Top-k — Spark plans TakeOrderedAndProject (no full sort at scale)."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "q17_set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def q17a(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.intersect(supp).orderBy("nationkey")


@query(
    "q17_set_union",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def q17b(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.union(supp).distinct().orderBy("nationkey")


@query(
    "q17_set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def q17c(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.subtract(supp).orderBy("nationkey")


@query(
    "q18_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS c
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def q18(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("c"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@query(
    "q19_string_fns",
    oracle="""
    SELECT p_partkey, UPPER(p_brand) AS brand_u, SUBSTR(p_name, 1, 10) AS name10,
           CAST(LENGTH(p_type) AS INTEGER) AS type_len,
           CONCAT(p_brand, '#', p_type) AS brand_type
    FROM part ORDER BY p_partkey
    """,
)
def q19(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    return part.orderBy("p_partkey").select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.substring("p_name", 1, 10).alias("name10"),
        F.length("p_type").alias("type_len"),
        F.concat("p_brand", F.lit("#"), "p_type").alias("brand_type"),
    )


@query(
    "q20_date_fns",
    oracle="""
    SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS y,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS m
    FROM orders ORDER BY o_orderkey
    """,
)
def q20(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.orderBy("o_orderkey").select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("d"),
        F.year("o_orderdate").alias("y"),
        F.date_trunc("month", F.col("o_orderdate")).alias("m"),
    )


@query(
    "q21_math_decimal",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(1 - CAST(l_discount AS DECIMAL(3,2)) AS DECIMAL(3,2))
                      * CAST(1 + CAST(l_tax AS DECIMAL(3,2)) AS DECIMAL(3,2)), 2) AS DOUBLE) AS amount
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
)
def q21(spark, sf_dir):
    """Per-row decimal arithmetic. The 2-decimal rounding happens via
    ROUND in the exact DECIMAL domain (half-up in both engines) —
    ROUND() on an intermediate double diverges between engines on exact
    .xx5000 boundaries, and DuckDB's decimal→decimal downcast truncates
    rather than rounds."""
    li = load_table(spark, sf_dir, "lineitem")
    amount = (
        _dec("l_extendedprice")
        * (F.lit(1) - _dec("l_discount", _DEC_FRAC)).cast(_DEC_FRAC)
        * (F.lit(1) + _dec("l_tax", _DEC_FRAC)).cast(_DEC_FRAC)
    )
    return li.orderBy("l_orderkey", "l_linenumber").select(
        "l_orderkey",
        "l_linenumber",
        F.round(amount, 2).cast("double").alias("amount"),
    )


# ---------------------------------------------------------------------------
# Q22-Q27: transform-library & training-data operators (oracle-checked)
# ---------------------------------------------------------------------------


@query(
    "q22_masking_sha256",
    oracle="""
    SELECT user_id, sha256(CAST(user_id AS STRING)) AS uid_sha
    FROM (SELECT DISTINCT user_id FROM events) ORDER BY user_id
    """,
)
def q22(spark, sf_dir):
    """PII masking parity (reference src/transform/masking.py:126-148):
    sha256(utf8(value)) via the builtin, null-safe sha2 expression."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("user_id")
        .distinct()
        .withColumn("uid_sha", F.sha2(F.col("user_id").cast("string"), 256))
        .orderBy("user_id")
    )


@query(
    "q23_json_extract",
    oracle="""
    SELECT event_id, json_extract_string(props, '$.k') AS k
    FROM events ORDER BY event_id
    """,
)
def q23(spark, sf_dir):
    """Dynamic JSON payload extraction — the engine's analogue of the
    reference's untyped columns dict (src/models/event.py:21-48)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.orderBy("event_id").select(
        "event_id", F.get_json_object("props", "$.k").alias("k")
    )


@query(
    "q24_array_sum",
    oracle="""
    SELECT vec_id, ROUND(list_sum(CAST(embedding AS DOUBLE[])), 2) AS esum
    FROM embeddings ORDER BY vec_id
    """,
)
def q24(spark, sf_dir):
    """Higher-order array fold over the embedding column (JVM-side)."""
    emb = load_table(spark, sf_dir, "embeddings")
    esum = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.orderBy("vec_id").select("vec_id", F.round(esum, 2).alias("esum"))


@query(
    "q25_dedup_exact_count",
    oracle="SELECT CAST(COUNT(DISTINCT text) AS BIGINT) AS c FROM documents",
)
def q25(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "documents")
        .agg(F.countDistinct("text").alias("c"))
    )


@query(
    "q26_text_token_stats",
    oracle="""
    SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def q26(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.sum("n_chars").alias("total_chars"))
        .orderBy("lang")
    )


@query(
    "q27_cosine_topk",
    oracle="""
    WITH q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
      WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)
    ),
    scored AS (
      SELECT e.vec_id,
             list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
             / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
                * sqrt(list_dot_product(q.qv, q.qv))) AS raw_score
      FROM embeddings e CROSS JOIN q
    )
    SELECT vec_id, ROUND(raw_score, 4) AS score
    FROM scored ORDER BY raw_score DESC, vec_id LIMIT 10
    """,
)
def q27(spark, sf_dir):
    """Brute-force cosine top-k (the correctness baseline for ANN).

    The 1-row query-vector side is cross-joined (broadcast) — no
    driver-side collect, so the same plan works on a 1000-executor
    cluster; the scaled path is operators.similarity.lsh_topk.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    emb_d = emb.select("vec_id", dbl.alias("emb"))
    # min-id row via one TakeOrderedAndProject scan (r11): the old
    # agg-then-join extraction scanned embeddings twice just to find
    # the query vector (vec_id is unique, so the rank-1 row IS the
    # MIN(vec_id) row — identical result, 3 corpus scans -> 2).
    qv = (
        emb_d.orderBy("vec_id").limit(1).select(F.col("emb").alias("qv"))
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )

    scored = emb_d.crossJoin(F.broadcast(qv)).select(
        "vec_id",
        (
            dot(F.col("emb"), F.col("qv"))
            / (
                F.sqrt(dot(F.col("emb"), F.col("emb")))
                * F.sqrt(dot(F.col("qv"), F.col("qv")))
            )
        ).alias("raw_score"),
    )
    return (
        scored.orderBy(F.desc("raw_score"), "vec_id")
        .limit(10)
        .select("vec_id", F.round("raw_score", 4).alias("score"))
    )


# ---------------------------------------------------------------------------
# S1-S6: streaming semantics, batch-replay form (oracle-checked).
# The true streaming (readStream/writeStream) variants live in
# hybrid_cdc_demo_spark.streaming and are exercised by tests/.
# ---------------------------------------------------------------------------


@query(
    "s1_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR AS window_end,
           event_type, CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2, 3 ORDER BY 1, 3
    """,
)
def s1(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("c"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "c",
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "s2_sliding_window",
    oracle="""
    WITH buckets AS (
      SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
               - (k * INTERVAL '15 minutes') AS window_start
      FROM events CROSS JOIN UNNEST([0, 1, 2, 3]) AS t(k)
    )
    SELECT window_start, window_start + INTERVAL 1 HOUR AS window_end,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM buckets GROUP BY window_start ORDER BY window_start
    """,
)
def s2(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(F.count("*").alias("c"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "c",
        )
        .orderBy("window_start")
    )


@query(
    "s3_session_window",
    oracle="""
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    x AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    y AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM x
    )
    SELECT user_id, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM y GROUP BY user_id, sid ORDER BY user_id, session_start
    """,
)
def s3(spark, sf_dir):
    """Session windows, 30-min gap. Spark's session_window end = last
    event + gap; the oracle reproduces that via gaps-and-islands."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "s4_watermarked_hourly",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def s4(spark, sf_dir):
    """Watermarked hourly counts. In batch replay the watermark is a
    no-op (all data on time); the late-drop behavior is exercised by
    the streaming test in tests/test_streaming.py."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("c"))
        .select(F.col("window.start").alias("window_start"), "c")
        .orderBy("window_start")
    )


@query(
    "s5_stateful_dedup",
    oracle="""
    SELECT event_id, user_id, event_type, value FROM (
      SELECT event_id, user_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ts, user_id) AS rn
      FROM events
    ) WHERE rn = 1 ORDER BY event_id
    """,
)
def s5(spark, sf_dir):
    """First-event-wins dedup by event_id (O28 / dropDuplicates
    semantics made deterministic for the oracle comparison)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_id").orderBy("ts", "user_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .orderBy("event_id")
        .select("event_id", "user_id", "event_type", "value")
    )


@query(
    "s6_cdc_pipeline_batch",
    oracle="""
    SELECT sha256(CAST(user_id AS STRING)) AS user_token, event_type, value FROM (
      SELECT user_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1 ORDER BY user_token
    """,
)
def s6(spark, sf_dir):
    """Batch equivalent of the end-to-end CDC pipeline: mask the key
    (O12) then latest-wins upsert (O21/O23). The streaming form
    (foreachBatch + merge + checkpoint) is streaming.pipeline."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.sha2(F.col("user_id").cast("string"), 256).alias("user_token"),
            "event_type",
            "value",
        )
        .orderBy("user_token")
    )


# ---------------------------------------------------------------------------
# Q28-Q29: full TPC-H query forms (beyond the per-shape inventory)
# ---------------------------------------------------------------------------


@query(
    "q28_tpch_q5",
    oracle="""
    SELECT n_name,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * CAST(1 - CAST(l_discount AS DECIMAL(3,2))
                                AS DECIMAL(3,2))), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= DATE '1996-01-01'
      AND o_orderdate <  DATE '1997-01-01'
    GROUP BY n_name ORDER BY revenue DESC, n_name
    """,
)
def q28(spark, sf_dir):
    """TPC-H Q5 (local supplier volume): 6-way join with the
    c_nationkey = s_nationkey residual; region/nation broadcast, the
    date filter pushes to the orders scan."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    amount = _dec("l_extendedprice") * (
        (F.lit(1) - _dec("l_discount", _DEC_FRAC)).cast(_DEC_FRAC)
    )
    # r10 (guide §3.2 — pre-filter the big side): the final join
    # requires s_nationkey = n_nationkey ∧ n_regionkey = r_regionkey ∧
    # r_name = 'ASIA', and c_nationkey = s_nationkey — so ONLY
    # ASIA-nation customers and suppliers can survive. Semi-joining
    # both against the broadcast 5-key nation list before the fact
    # joins drops ~4/5 of customers (and their orders/lineitems)
    # before anything wide is shuffled; pure logical inference from
    # the join predicates, so the result is identical.
    asia_keys = (
        load_table(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "region").filter(
                    F.col("r_name") == "ASIA"
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("_asia_key"))
    )
    cust = cust.join(
        F.broadcast(asia_keys),
        cust.c_nationkey == F.col("_asia_key"),
        "left_semi",
    )
    supp = supp.join(
        F.broadcast(asia_keys),
        supp.s_nationkey == F.col("_asia_key"),
        "left_semi",
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(amount), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "q29_tpch_q10",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * CAST(1 - CAST(l_discount AS DECIMAL(3,2))
                                AS DECIMAL(3,2))), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= DATE '1996-01-01'
      AND o_orderdate <  DATE '1996-07-01'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q29(spark, sf_dir):
    """TPC-H Q10 (returned-item reporting): top customers by lost
    revenue in a window — filters push to both scans, top-k via
    TakeOrderedAndProject."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    amount = _dec("l_extendedprice") * (
        (F.lit(1) - _dec("l_discount", _DEC_FRAC)).cast(_DEC_FRAC)
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.round(F.sum(amount), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q30_tpch_q4",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1996-01-01'
      AND o_orderdate <  DATE '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_returnflag = 'R')
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q30(spark, sf_dir):
    """TPC-H Q4 shape (order priority checking): correlated EXISTS
    becomes a left-semi join — Catalyst's decorrelation, no per-row
    subquery. (The testdata lineitem carries no commit/receipt dates;
    the returned-flag predicate keeps the correlated-EXISTS shape.)"""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    late = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q31_tpch_q15",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * CAST(1 - CAST(l_discount AS DECIMAL(3,2))
                       AS DECIMAL(3,2))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01'
        AND l_shipdate <  DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(ROUND(total_revenue, 2) AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q31(spark, sf_dir):
    """TPC-H Q15 (top supplier): the revenue CTE feeds both the join
    and the MAX scalar subquery — persisted once, the scalar max
    broadcast back as a filter."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    amount = _dec("l_extendedprice") * (
        (F.lit(1) - _dec("l_discount", _DEC_FRAC)).cast(_DEC_FRAC)
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(amount).alias("total_revenue"))
        .persist()
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        supp.join(revenue, supp.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_revenue", 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "q32_tpch_q22",
    oracle="""
    SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE)
             AS totacctbal
    FROM (
      SELECT SUBSTR(c_name, 10, 2) AS cntrycode, c_acctbal
      FROM customer
      WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                         WHERE c_acctbal > 0.0)
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_totalprice > 400000)
    )
    GROUP BY cntrycode ORDER BY cntrycode
    """,
)
def q32(spark, sf_dir):
    """TPC-H Q22 shape (global sales opportunity): scalar AVG
    subquery (broadcast) + correlated NOT EXISTS (left-anti join).
    (Every testdata customer has orders, so the exclusion is
    'never placed a >400k order' to keep the anti-join non-trivial.)"""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    eligible = (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            orders.filter(F.col("o_totalprice") > 400000),
            cust.c_custkey == orders.o_custkey,
            "left_anti",
        )
    )
    return (
        eligible.select(
            F.substring("c_name", 10, 2).alias("cntrycode"), "c_acctbal"
        )
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(_dec("c_acctbal")), 2).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@query(
    "s7_interval_join",
    oracle="""
    SELECT a.event_id AS left_id, b.event_id AS right_id
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts
     AND b.ts <= a.ts + INTERVAL 5 MINUTE
     AND a.event_id <> b.event_id
    ORDER BY left_id, right_id
    """,
)
def s7(spark, sf_dir):
    """Batch replay of the stream-stream interval join (windows.
    interval_join): pairs of events from the same user within 5
    minutes. In streaming form both sides carry watermarks so state
    stays bounded; the batch form is the verifiable equivalent.

    r8 plan: keyed_interval_join — equi-join on (user, 5-minute time
    bucket) instead of user alone. The round-8 skew corpus (one user =
    50% of events) made the plain keyed join a single quadratic task
    (7.1× runtime blowup, SKEW_r08.json); bucketing splits the hot
    user across its time range, bounding each task by events-per-
    (user, window). Identical output (bucket candidates are exact
    integer arithmetic; oracle hash unchanged)."""
    from hybrid_cdc_demo_spark.operators.rangejoin import (
        keyed_interval_join,
        ntz_micros,
    )

    ev = load_table(spark, sf_dir, "events")
    a = ev.select(
        F.col("event_id").alias("left_id"),
        F.col("user_id").alias("u"),
        ntz_micros("ts").alias("a_us"),
    )
    b = ev.select(
        F.col("event_id").alias("right_id"),
        F.col("user_id").alias("u2"),
        ntz_micros("ts").alias("b_us"),
    )
    return (
        keyed_interval_join(
            a, b, on=[("u", "u2")], left_us="a_us", right_us="b_us",
            upper_us=300_000_000,
        )
        .filter(F.col("left_id") != F.col("right_id"))
        .select("left_id", "right_id")
        .orderBy("left_id", "right_id")
    )


@query(
    "s8_running_totals",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,6)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS DOUBLE) AS running_total,
           CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS BIGINT) AS running_events
    FROM events ORDER BY user_id, event_id
    """,
)
def s8(spark, sf_dir):
    """Batch equivalent of running_totals_with_state (the
    applyInPandasWithState operator): per-user cumulative sum/count —
    the stateful stream emits exactly the suffix of this series."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
        F.count(F.lit(1)).over(w).alias("running_events"),
    ).orderBy("user_id", "event_id")


@query(
    "q33_asof_join",
    oracle="""
    SELECT a.event_id, b.value AS last_update_value
    FROM (SELECT user_id, event_id, ts FROM events) a
    ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                    WHERE event_type = 'UPDATE') b
      ON a.user_id = b.user_id AND a.ts >= b.ts
    ORDER BY a.event_id
    """,
)
def q33(spark, sf_dir):
    """As-of join (operators.asof): every event annotated with the
    latest prior UPDATE value for its user. Single-shuffle union+
    window implementation — no native ASOF in Spark, no O(n·m) range
    blowup (see operators/asof.py)."""
    from hybrid_cdc_demo_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    left = ev.select("user_id", "event_id", "ts")
    right = ev.filter(F.col("event_type") == "UPDATE").select(
        "user_id", F.col("ts").alias("u_ts"), F.col("value").alias("u_value")
    )
    return (
        asof_join(left, right, "user_id", "ts", "u_ts", ["u_value"])
        .select("event_id", F.col("u_value").alias("last_update_value"))
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Q34-Q41: wider TPC-H forms (Q3/Q6/Q14/Q17/Q18/Q19 faithful; Q9/Q16
# adapted — the testdata has no partsupp table, so supply-cost terms are
# dropped and supplier attribution comes from lineitem itself)
# ---------------------------------------------------------------------------


@query(
    "q34_tpch_q3",
    oracle="""
    SELECT l_orderkey,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * CAST(1 - CAST(l_discount AS DECIMAL(3,2))
                                AS DECIMAL(3,2))), 2) AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1998-06-01'
      AND l_shipdate  > DATE '1998-06-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def q34(spark, sf_dir):
    """TPC-H Q3 (shipping priority): segment filter broadcast-prunes
    customers, both date filters push to their scans, top-10 via
    TakeOrderedAndProject (no global sort materialized)."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01")
    )
    amount = _dec("l_extendedprice") * (
        (F.lit(1) - _dec("l_discount", _DEC_FRAC)).cast(_DEC_FRAC)
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(amount), 2).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q35_tpch_q6",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * CAST(l_discount AS DECIMAL(3,2))), 2) AS DOUBLE)
             AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01'
      AND l_shipdate <  DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q35(spark, sf_dir):
    """TPC-H Q6 (forecasting revenue change): pure scan-filter-agg —
    every predicate reaches the parquet scan, single partial+final
    aggregate, zero joins. The canonical pushdown litmus test."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    amount = _dec("l_extendedprice") * _dec("l_discount", _DEC_FRAC)
    return li.agg(F.round(F.sum(amount), 2).cast("double").alias("revenue"))


@query(
    "q36_tpch_q14",
    oracle="""
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                         THEN CAST(l_extendedprice AS DECIMAL(12,2))
                              * CAST(1 - CAST(l_discount AS DECIMAL(3,2))
                                    AS DECIMAL(3,2))
                         ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
           * 100.0
           / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(1 - CAST(l_discount AS DECIMAL(3,2))
                            AS DECIMAL(3,2))) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1996-09-01'
      AND l_shipdate <  DATE '1996-10-01'
    """,
)
def q36(spark, sf_dir):
    """TPC-H Q14 (promotion effect): part is the small side — broadcast
    join, conditional aggregation in one pass. Both sums are exact
    decimals cast to double; the final division is a single IEEE op so
    the unrounded quotient is bitwise-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01"))
        & (F.col("l_shipdate") < F.lit("1996-10-01"))
    )
    part = load_table(spark, sf_dir, "part")
    amount = _dec("l_extendedprice") * (
        (F.lit(1) - _dec("l_discount", _DEC_FRAC)).cast(_DEC_FRAC)
    )
    promo = F.when(F.col("p_type") == "PROMO", amount).otherwise(
        F.lit(0).cast(_DEC_PRICE)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.sum(promo).cast("double")
                * F.lit(100.0)
                / F.sum(amount).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q37_tpch_q17",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
           / 7.0 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < 0.2 * (
        SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
               / COUNT(*)
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q37(spark, sf_dir):
    """TPC-H Q17 (small-quantity-order revenue): the correlated AVG
    subquery becomes one grouped aggregate joined back — two passes
    over the brand's lineitems, not a per-row subquery. The per-part
    mean is an exact decimal sum divided by the count in double, so
    the 0.2x threshold is bit-identical across engines."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#23"
    )
    li = load_table(spark, sf_dir, "lineitem")
    branded = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    per_part = branded.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (
            F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))
        ).alias("_avg_qty")
    )
    return (
        branded.join(F.broadcast(per_part), branded.l_partkey == per_part._pk)
        .filter(F.col("l_quantity") < 0.2 * F.col("_avg_qty"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


@query(
    "q38_tpch_q18",
    oracle="""
    SELECT c_custkey, o_orderkey, o_orderdate,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE)
             AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_custkey, o_orderkey, o_orderdate
    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 300
    ORDER BY total_qty DESC, o_orderkey LIMIT 100
    """,
)
def q38(spark, sf_dir):
    """TPC-H Q18 (large-volume customer): aggregate-then-filter
    (HAVING) over the order grain, top-100 via TakeOrderedAndProject.
    At scale the groupBy key is the join key, so the orders join and
    the aggregate share one shuffle partitioning."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate")
        .agg(F.sum(_dec("l_quantity")).alias("_sq"))
        .filter(F.col("_sq") > 300)
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("_sq", 2).cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(100)
    )


@query(
    "q39_tpch_q19",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * CAST(1 - CAST(l_discount AS DECIMAL(3,2))
                                AS DECIMAL(3,2))), 2) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 20)
    """,
)
def q39(spark, sf_dir):
    """TPC-H Q19 (discounted revenue, disjunctive predicate): the OR
    of brand/size/quantity conjuncts evaluates post-join; Catalyst
    still pushes the derivable single-side bounds (brand IN, size/
    quantity ranges) to the scans. Part broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    amount = _dec("l_extendedprice") * (
        (F.lit(1) - _dec("l_discount", _DEC_FRAC)).cast(_DEC_FRAC)
    )
    cond = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#15")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 20)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(F.round(F.sum(amount), 2).cast("double").alias("revenue"))
    )


@query(
    "q40_tpch_q9_shape",
    oracle="""
    SELECT n_name AS nation,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * CAST(1 - CAST(l_discount AS DECIMAL(3,2))
                                AS DECIMAL(3,2))), 2) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    ORDER BY 1, 2 DESC
    """,
)
def q40(spark, sf_dir):
    """TPC-H Q9 shape (product-type profit by nation x year; the
    testdata has no partsupp, so the supply-cost term is dropped).
    part/supplier/nation broadcast; the one big shuffle is the
    lineitem-orders join, then the group-by reuses its output."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    amount = _dec("l_extendedprice") * (
        (F.lit(1) - _dec("l_discount", _DEC_FRAC)).cast(_DEC_FRAC)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 2).cast("double").alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "q41_tpch_q16_shape",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#2' AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q41(spark, sf_dir):
    """TPC-H Q16 shape (supplier relationship count; supplier linkage
    comes from lineitem since the testdata has no partsupp). COUNT
    DISTINCT expands to a two-level aggregate — partial dedup
    map-side, so the shuffle carries (group, suppkey) pairs, not raw
    lineitems."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#2")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "q42_tpch_q7",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(ROUND(SUM(volume), 2) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
             CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(1 - CAST(l_discount AS DECIMAL(3,2)) AS DECIMAL(3,2)) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1997-01-01'
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q42(spark, sf_dir):
    """TPC-H Q7 (volume shipping between two nations, faithful form —
    reference parity target spec only; the reference engine has no
    joins at all, SURVEY.md §2a tail note). Scale shape: both nation
    dims broadcast BEFORE the fact joins so the two-nation predicate
    prunes lineitem rows at the supplier/customer hash joins instead
    of after a full 3-fact shuffle; the shipdate range pushes to the
    lineitem scan; revenue is an exact-decimal sum."""
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk")
    )
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders")
    amount = _dec("l_extendedprice") * (
        (F.lit(1) - _dec("l_discount", _DEC_FRAC)).cast(_DEC_FRAC)
    )
    pair = (F.col("supp_nation") == "NATION_1") & (
        F.col("cust_nation") == "NATION_2"
    ) | (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum(amount), 2).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q43_tpch_q8",
    oracle="""
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_1' THEN volume
                         ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE)
           / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
             CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(1 - CAST(l_discount AS DECIMAL(3,2)) AS DECIMAL(3,2)) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1997-01-01'
    )
    GROUP BY o_year ORDER BY o_year
    """,
)
def q43(spark, sf_dir):
    """TPC-H Q8 (national market share): 8-way join where every
    dimension (part filtered to one type, supplier+nation,
    customer+nation+region filtered to one region) broadcasts, so the
    only shuffle is lineitem⋈orders. Market share is a single IEEE
    division of two exact-decimal sums cast to double — unrounded and
    bitwise-identical across engines (same convention as q36)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk")
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = load_table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(n1), F.col("c_nationkey") == F.col("n_nationkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    amount = _dec("l_extendedprice") * (
        (F.lit(1) - _dec("l_discount", _DEC_FRAC)).cast(_DEC_FRAC)
    )
    vol_t = "decimal(16,4)"
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
        .withColumn("volume", amount.cast(vol_t))
        .groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("nation") == "NATION_1", F.col("volume")).otherwise(
                        F.lit(0).cast(vol_t)
                    )
                ).cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q44_tpch_q13",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '4%'
      GROUP BY c_custkey
    )
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
)
def q44(spark, sf_dir):
    """TPC-H Q13 (customer order-count distribution; the spec's
    o_comment NOT LIKE filter is adapted to o_orderpriority — the
    testdata has no comment column). Two-level aggregate: the left
    outer join + per-customer count shuffles on custkey; the
    count-of-counts regroup is a few dozen rows. The priority filter
    lives in the JOIN condition, not WHERE — customers with only
    filtered orders must still appear with count 0 (outer-join
    semantics a WHERE would break)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = cust.join(
        orders,
        (cust.c_custkey == orders.o_custkey)
        & ~orders.o_orderpriority.like("4%"),
        "left",
    )
    return (
        joined.groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "s9_interval_join_outer",
    oracle="""
    SELECT a.event_id AS left_id, b.event_id AS right_id
    FROM events a LEFT JOIN events b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
     AND a.event_id <> b.event_id
    ORDER BY left_id, right_id NULLS FIRST
    """,
)
def s9(spark, sf_dir):
    """Batch replay of the LEFT OUTER stream-stream interval join
    (windows.interval_join_outer): every event emits, paired with
    same-user events in the next 5 minutes or null if none — the
    missing-follow-up detection shape. In streaming form the outer row
    emits once the watermark passes; this batch form is the verifiable
    equivalent (same join condition, same schema).

    r8 plan: the outer is composed as the bucketized INNER
    keyed_interval_join (see s7 — skew-immune hash join on (user,
    time bucket)) plus an anti-join adding the never-matched left
    events with a null partner; exploding the outer's left side
    directly would null-extend each unmatched candidate bucket twice."""
    from hybrid_cdc_demo_spark.operators.rangejoin import (
        keyed_interval_join,
        ntz_micros,
    )

    ev = load_table(spark, sf_dir, "events")
    a = ev.select(
        F.col("event_id").alias("left_id"),
        F.col("user_id").alias("u"),
        ntz_micros("ts").alias("a_us"),
    )
    b = ev.select(
        F.col("event_id").alias("right_id"),
        F.col("user_id").alias("u2"),
        ntz_micros("ts").alias("b_us"),
    )
    matched = (
        keyed_interval_join(
            a, b, on=[("u", "u2")], left_us="a_us", right_us="b_us",
            upper_us=300_000_000,
        )
        .filter(F.col("left_id") != F.col("right_id"))
        .select("left_id", "right_id")
        # two consumers (the union and the anti-join's distinct): the
        # r11 executed plan re-ran the whole bucketized interval join
        # for the anti side (5 events scans, 2 explodes). The lazy
        # checkpoint materializes the result-sized pair set once
        # (guide §2.4).
        .localCheckpoint(eager=False)
    )
    unmatched = a.join(
        matched.select("left_id").distinct(), "left_id", "left_anti"
    ).select("left_id", F.lit(None).cast("long").alias("right_id"))
    return matched.unionByName(unmatched).orderBy(
        "left_id", F.col("right_id").asc_nulls_first()
    )


@query(
    "s10_stream_enrichment",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    ORDER BY e.event_id
    """,
)
def s10(spark, sf_dir):
    """Batch replay of stream-static dimension enrichment
    (windows.enrich_with_dimension): each event joined to its customer
    attributes via a broadcast dimension — stateless in streaming form
    (no watermark/state store), shuffle-free on the stream side. The
    batch form runs the identical broadcast join."""
    from hybrid_cdc_demo_spark.streaming.windows import enrich_with_dimension

    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    return (
        enrich_with_dimension(ev, cust, "user_id", "c_custkey", how="inner")
        .select("event_id", "user_id", "c_name", "c_mktsegment")
        .orderBy("event_id")
    )


@query(
    "q45_pivot",
    oracle="""
    SELECT user_id,
           CAST(COUNT(CASE WHEN event_type = 'click'    THEN 1 END) AS BIGINT) AS click,
           CAST(COUNT(CASE WHEN event_type = 'error'    THEN 1 END) AS BIGINT) AS error,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
           CAST(COUNT(CASE WHEN event_type = 'signup'   THEN 1 END) AS BIGINT) AS signup,
           CAST(COUNT(CASE WHEN event_type = 'view'     THEN 1 END) AS BIGINT) AS view
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def q45(spark, sf_dir):
    """PIVOT: per-user event counts spread into one column per event
    type. The value list is EXPLICIT — without it Catalyst first runs
    a distinct-values JOB over the fact table, a scale anti-pattern.
    The plan is the standard two-phase aggregate (partial (user,type)
    counts below the first Exchange, pivotfirst regroup on user above
    it — the second shuffle carries at most one row per (user,type)).
    Missing combinations fill 0 to match the oracle's COUNT(CASE...)
    semantics."""
    ev = load_table(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    out = ev.groupBy("user_id").pivot("event_type", kinds).count().na.fill(0)
    return out.select(
        "user_id", *[F.col(k).cast("long").alias(k) for k in kinds]
    ).orderBy("user_id")


@query(
    "q46_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS c,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_qty
    FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def q46(spark, sf_dir):
    """CUBE: all grouping-set combinations of (returnflag, linestatus)
    — the q18 rollup plus the per-linestatus-only sets. Spark expands
    grouping sets map-side (Expand node) so it stays one shuffle;
    quantity is summed in the exact-decimal domain before the double
    cast (same convention as q03)."""
    # r10 (guide §2.3 — aggregate before you Expand): the corpus
    # first collapses to the finest grouping (one exact-decimal
    # partial-aggregated pass); CUBE then expands ≤|groups| rows
    # instead of every lineitem row ×4. COUNT re-aggregates as SUM
    # and DECIMAL sums are exact and associative, so the rollup is
    # bit-identical.
    pre = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("_c"),
            F.sum(_dec("l_quantity")).alias("_q"),
        )
    )
    return (
        pre.cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum("_c").alias("c"),
            F.round(F.sum("_q").cast("double"), 2).alias("sum_qty"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@query(
    "q47_tpch_q12_shape",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def q47(spark, sf_dir):
    """TPC-H Q12 shape (shipping-mode priority split; the testdata has
    no l_shipmode/l_commitdate/l_receiptdate, so the group key is
    l_linestatus and "late" is ship-lag > 60 days after order date).
    The distinctive Q12 machinery is intact: a fact-fact join with a
    conditional two-way CASE aggregation. The shipdate year-range
    pushes to the lineitem scan; the 60-day lag predicate is cross-
    table so it evaluates at the join — Catalyst keeps the single
    orderkey shuffle and partial-aggregates above it."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(
            F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 days")
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias(
                "high_line_count"
            ),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias(
                "low_line_count"
            ),
        )
        .orderBy("l_linestatus")
    )


@query(
    "q48_tpch_q21_shape",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders   ON o_orderkey = l1.l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND n_name = 'NATION_3'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100
    """,
)
def q48(spark, sf_dir):
    """TPC-H Q21 shape (suppliers who kept orders waiting; "late" is
    ship-lag > 90 days after order date — the testdata has no
    commit/receipt dates). The whole point of Q21 survives the
    adaptation: a correlated EXISTS (some OTHER supplier contributed
    to the order) decorrelated to a LEFT SEMI join, and a correlated
    NOT EXISTS (no OTHER supplier was ALSO late) decorrelated to a
    LEFT ANTI join — both on the same orderkey, so all three legs
    hash-partition on l_orderkey and AQE coalesces them into one
    co-partitioned exchange chain; the nation dim broadcasts."""
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 days")
    base = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(late)
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_orderkey", "l_suppkey", "o_orderdate", "s_name")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("x_orderkey"),
        F.col("l_suppkey").alias("x_suppkey"),
        F.col("l_shipdate").alias("x_shipdate"),
    )
    some_other = (F.col("x_orderkey") == F.col("l_orderkey")) & (
        F.col("x_suppkey") != F.col("l_suppkey")
    )
    other_late = some_other & (
        F.col("x_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 days")
    )
    return (
        base.join(l2, some_other, "left_semi")
        .join(l2, other_late, "left_anti")
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


@query(
    "q49_tpch_q2_shape",
    oracle="""
    WITH cost AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS supplycost
      FROM lineitem GROUP BY 1, 2
    ), eu AS (
      SELECT suppkey, partkey, supplycost, s_acctbal, s_name, n_name
      FROM cost
      JOIN supplier ON s_suppkey = suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey,
           CAST(supplycost AS DOUBLE) AS supplycost
    FROM part JOIN eu ON p_partkey = partkey
    WHERE p_size = 3 AND p_type = 'LARGE'
      AND supplycost = (SELECT MIN(e2.supplycost) FROM eu e2
                        WHERE e2.partkey = p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
    """,
)
def q49(spark, sf_dir):
    """TPC-H Q2 shape (minimum-cost supplier; the testdata has no
    partsupp, so the part-supplier cost relation is derived as
    MIN(extendedprice) per (partkey, suppkey) pair observed in
    lineitem). The signature Q2 construct — a correlated MIN scalar
    subquery per part — is decorrelated the way Catalyst would: a
    per-part MIN aggregate over the region-scoped cost relation,
    joined back on (partkey, min). Cost stays DECIMAL end-to-end so
    the equality join and the emitted double are bit-exact. The
    supplier/nation/region dims broadcast.

    The query's only big shuffle is the (partkey, suppkey) cost
    aggregate — so the highly selective part predicate (p_size=3 AND
    p_type='LARGE') is applied FIRST, as a broadcast semi-join of
    lineitem against the filtered part keys, before any aggregation.
    Per-part MIN is computed per partkey, so restricting to the
    selected parts early is semantics-preserving (the correlated
    subquery only ever evaluates at selected partkeys) and cuts the
    dominant shuffle by the part selectivity — the difference between
    shuffling all 100 TB of lineitem pairs and the selected sliver."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 3) & (F.col("p_type") == "LARGE")
    )
    li = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(part.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    cost = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(F.min(_dec("l_extendedprice")).alias("supplycost"))
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    nation = load_table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    eu = cost.join(F.broadcast(supp), F.col("suppkey") == F.col("s_suppkey"))
    min_cost = eu.groupBy(F.col("partkey").alias("m_partkey")).agg(
        F.min("supplycost").alias("min_cost")
    )
    return (
        eu.join(
            min_cost,
            (F.col("partkey") == F.col("m_partkey"))
            & (F.col("supplycost") == F.col("min_cost")),
        )
        .join(F.broadcast(part), F.col("partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            F.col("supplycost").cast("double").alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q50_tpch_q11_shape",
    oracle="""
    WITH value_by_part AS (
      SELECT l_partkey AS partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS part_value
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
      GROUP BY 1
    )
    SELECT partkey, CAST(part_value AS DOUBLE) AS part_value
    FROM value_by_part
    WHERE CAST(part_value AS DOUBLE) >
          (SELECT CAST(SUM(part_value) AS DOUBLE) FROM value_by_part) * 0.001
    ORDER BY part_value DESC, partkey
    """,
)
def q50(spark, sf_dir):
    """TPC-H Q11 shape (important stock; value per part = sum of
    extendedprice supplied by one nation's suppliers — the testdata
    has no partsupp availqty/supplycost). The Q11 signature is the
    scalar subquery in HAVING: the global total is a one-row
    aggregate of the SAME grouped relation, so the per-part values
    compute once, the total reduces from them, and the threshold
    compare is a broadcast nested-loop join of a single row — no
    second scan of lineitem. Sums stay DECIMAL (associative) and the
    threshold compare happens in IEEE double identically on both
    engines."""
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7"
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    value_by_part = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(_dec("l_extendedprice")).alias("part_value_dec"))
    )
    total = value_by_part.agg(
        (F.sum("part_value_dec").cast("double") * F.lit(0.001)).alias("threshold")
    )
    return (
        value_by_part.withColumn(
            "part_value", F.col("part_value_dec").cast("double")
        )
        .join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("partkey", "part_value")
        .orderBy(F.desc("part_value"), "partkey")
    )


@query(
    "q51_tpch_q20_shape",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_5'
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_type = 'PROMO'
        GROUP BY l_suppkey, l_partkey
        HAVING 2 * SUM(CASE WHEN l_shipdate >= DATE '1998-01-01'
                             AND l_shipdate <  DATE '1999-01-01'
                            THEN CAST(l_quantity AS DECIMAL(12,2))
                            ELSE CAST(0 AS DECIMAL(12,2)) END)
             > SUM(CAST(l_quantity AS DECIMAL(12,2)))
      )
    ORDER BY s_name
    """,
)
def q51(spark, sf_dir):
    """TPC-H Q20 shape (part-promotion suppliers; availqty > half of
    a year's shipments becomes: the 1998 shipments of a PROMO
    (partkey, suppkey) pair exceed half the pair's all-time quantity
    — same nested-IN-with-correlated-aggregate structure, partsupp
    replaced by the observed pair relation). The inner IN chain
    decorrelates to: broadcast part filter → one (suppkey, partkey)
    shuffle with a conditional-CASE aggregate → HAVING → LEFT SEMI
    join into the broadcast-joined supplier×nation dim. The half
    comparison is written 2·year > total so it stays entirely in
    exact DECIMAL arithmetic."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    qty = _dec("l_quantity")
    zero = F.lit(0).cast(_DEC_PRICE)
    in_year = (F.col("l_shipdate") >= F.lit("1998-01-01")) & (
        F.col("l_shipdate") < F.lit("1999-01-01")
    )
    promoted = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(in_year, qty).otherwise(zero)).alias("year_qty"),
            F.sum(qty).alias("total_qty"),
        )
        .filter(F.lit(2) * F.col("year_qty") > F.col("total_qty"))
        .select("l_suppkey")
    )
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_5"
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        supp.join(
            promoted, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@query(
    "s11_incremental_agg",
    oracle="""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
           MIN(value) AS min_value, MAX(value) AS max_value
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def s11(spark, sf_dir):
    """Batch equivalent of AggregateSink's maintained state (the
    AggregatingMergeTree personality, streaming/sinks.py): per-key
    running count/sum/min/max. The streaming form folds each
    micro-batch into per-key partial states and merges at read —
    O(batch) per trigger; this one-shot groupBy is the semantic
    contract it must equal (asserted directly against the sink in
    tests/test_aggregate_sink.py; hash-matched here). Sum goes
    through exact DECIMAL so engine and oracle agree bitwise."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("user_id")
    )


@query(
    "ns_ttl_expiry",
    oracle="""
    WITH env AS (
      SELECT event_id,
             date_diff('microseconds', TIMESTAMP '2024-01-01 00:00:00', ts)
               AS timestamp_micros,
             CASE WHEN event_id % 3 = 1 THEN 86400
                  WHEN event_id % 3 = 2 THEN 604800 END AS ttl_seconds
      FROM events
    )
    SELECT event_id, timestamp_micros, ttl_seconds
    FROM env
    WHERE ttl_seconds IS NULL
       OR timestamp_micros + CAST(ttl_seconds AS BIGINT) * 1000000
          > 1641600000000
    ORDER BY event_id
    """,
)
def ns_ttl_expiry(spark, sf_dir):
    """TTL expiry view (SURVEY §2b optional polish; VERDICT r4 #6):
    the reference carries ``ttl_seconds`` in every event but never
    enforces it (reference src/models/event.py:48, parser.py:99-102)
    — ``active_events`` (sources/cdc.py) is the optional expiry
    filter: a row survives iff its TTL is null (never expires) or
    ``timestamp_micros + ttl_seconds`` is still in the future of the
    view's ``now``. Exercised here on an events-derived envelope with
    MIXED TTLs (one-third no-TTL / 1-day / 7-day, keyed off event_id)
    and a fixed ``now`` 19 days into the 30-day event range, so both
    expiry branches and the null branch all fire. Timestamps are NTZ
    interval arithmetic against a fixed origin — no epoch conversion,
    no session-timezone dependence (hash-exact vs DuckDB). The filter
    is a narrow per-row predicate: pushdown-friendly, zero shuffle at
    any scale."""
    from hybrid_cdc_demo_spark.sources.cdc import active_events

    ev = load_table(spark, sf_dir, "events")
    env = ev.select(
        "event_id",
        F.expr(
            "timestampdiff(MICROSECOND, timestamp'2024-01-01 00:00:00', ts)"
        ).alias("timestamp_micros"),
        F.when(F.col("event_id") % 3 == 1, F.lit(86400))
        .when(F.col("event_id") % 3 == 2, F.lit(604800))
        .cast("int")
        .alias("ttl_seconds"),
    )
    now_micros = 19 * 86400 * 1_000_000  # 2024-01-20 on the same clock
    return active_events(env, now_micros).select(
        "event_id", "timestamp_micros", "ttl_seconds"
    ).orderBy("event_id")
