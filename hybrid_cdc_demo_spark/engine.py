"""Engine facade: one SparkSession + registered testdata views.

API parity goal (SURVEY.md §2c): ``engine.sql(q)`` and the DataFrame
builders in :mod:`hybrid_cdc_demo_spark.plans.catalog` lower to the
same Catalyst plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hybrid_cdc_demo_spark.session import configure_session, get_spark
from hybrid_cdc_demo_spark.sources.tables import load_table, register_views


#: DuckDB-compat scalar aliases registered on the engine session as
#: Spark SQL UDFs (SPARK-28264): they let a query text written against
#: the DuckDB dialect run UNCHANGED through engine.sql when the only
#: divergence is a function NAME. Each is a pure rename of a Spark
#: builtin, so plans stay whole-stage-codegen (the UDF inlines at
#: analysis). Semantic divergences (regexp_replace 'g' flags, QUALIFY,
#: aggregate-internal ORDER BY, unnest table functions) are NOT
#: shimmed — those are real dialect differences, documented per-query
#: in tests/test_sql_surface.py.
_COMPAT_FUNCTIONS = (
    # DuckDB sha256(x) == Spark sha2(x, 256)
    "CREATE OR REPLACE TEMPORARY FUNCTION sha256(x STRING) "
    "RETURNS STRING RETURN sha2(x, 256)",
    # DuckDB string_split_regex(s, p) == Spark split(s, p) (both regex)
    "CREATE OR REPLACE TEMPORARY FUNCTION string_split_regex"
    "(s STRING, p STRING) RETURNS ARRAY<STRING> RETURN split(s, p)",
    # DuckDB string_split splits on a LITERAL separator; escape any
    # regex metacharacters before handing to Spark's regex split. The
    # backslash itself is in the class (listed first, before anything
    # it could escape) — without it a separator like '\d' reached the
    # regex engine unescaped and split on the digit class instead of
    # the literal two characters (r7 ADVICE).
    "CREATE OR REPLACE TEMPORARY FUNCTION string_split"
    "(s STRING, sep STRING) RETURNS ARRAY<STRING> "
    "RETURN split(s, regexp_replace(sep,"
    " '([\\\\\\\\^$.|?*+()\\\\[\\\\]{}])', '\\\\\\\\$1'))",
    # DuckDB starts_with(a, b) == Spark startswith(a, b)
    "CREATE OR REPLACE TEMPORARY FUNCTION starts_with(a STRING, b STRING) "
    "RETURNS BOOLEAN RETURN startswith(a, b)",
)


class Engine:
    def __init__(self, sf_dir: str, spark: SparkSession | None = None):
        self.spark = configure_session(spark) if spark is not None else get_spark()
        self.sf_dir = sf_dir
        register_views(self.spark, sf_dir)
        for ddl in _COMPAT_FUNCTIONS:
            self.spark.sql(ddl)

    def table(self, name: str) -> DataFrame:
        return load_table(self.spark, self.sf_dir, name)

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)
