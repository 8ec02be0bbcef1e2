"""engine.sql surface: the SQL string API must produce the same
results as the DataFrame builders (SURVEY §2c: both lower to the same
Catalyst plans) over the registered testdata views."""

import pytest

from hybrid_cdc_demo_spark.engine import Engine
from hybrid_cdc_demo_spark.plans import QUERIES

SF = "/root/testdata/sf0.01"

SQL_EQUIVALENTS = {
    "q03_agg_tpch_q1": """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS c,
               ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 2)
                 AS sum_qty,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                     / COUNT(*), 2) AS avg_price
        FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "q06_join_broadcast": """
        SELECT n_name, COUNT(*) AS c
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name
    """,
    "q13_window_rank": """
        SELECT * FROM (
          SELECT o_custkey, o_orderkey,
                 RANK() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC) AS r
          FROM orders)
        WHERE r <= 3 ORDER BY o_custkey, r, o_orderkey
    """,
    "q16_topk": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
    "q18_rollup": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS c
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3
    """,
    "q45_pivot": """
        SELECT user_id,
               COALESCE(click, 0) AS click, COALESCE(error, 0) AS error,
               COALESCE(purchase, 0) AS purchase, COALESCE(signup, 0) AS signup,
               COALESCE(view, 0) AS view
        FROM (SELECT user_id, event_type FROM events)
        PIVOT (COUNT(*) FOR event_type IN
               ('click' AS click, 'error' AS error, 'purchase' AS purchase,
                'signup' AS signup, 'view' AS view))
        ORDER BY user_id
    """,
    "q46_cube": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS c,
               ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 2)
                 AS sum_qty
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    "q52_grouping_sets": """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
               CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
               COUNT(*) AS c,
               ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 2)
                 AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), (l_linestatus), ())
        ORDER BY g_rf, g_ls,
                 l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    "q53_unpivot": """
        SELECT l_orderkey, l_linenumber, substring(metric, 3) AS metric, val
        FROM (SELECT l_orderkey, l_linenumber, l_discount, l_quantity, l_tax
              FROM lineitem WHERE l_orderkey < 1000)
        UNPIVOT (val FOR metric IN (l_discount, l_quantity, l_tax))
        ORDER BY l_orderkey, l_linenumber, metric
    """,
}


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(SF, spark)


@pytest.mark.parametrize("name", sorted(SQL_EQUIVALENTS))
def test_sql_matches_dataframe_builder(engine, spark, name):
    via_sql = engine.sql(SQL_EQUIVALENTS[name])
    via_df = QUERIES[name](spark, SF)
    sql_rows = [tuple(r) for r in via_sql.collect()]
    df_rows = [tuple(r) for r in via_df.collect()]
    assert len(sql_rows) == len(df_rows) > 0
    # q18's builder orders only by the grouping cols; compare as sets
    assert sorted(map(str, sql_rows)) == sorted(map(str, df_rows))


def test_engine_table_access(engine):
    assert engine.table("nation").count() == 25
    assert {t for t in ("lineitem", "orders")} <= {
        t.name for t in engine.spark.catalog.listTables()
    }
