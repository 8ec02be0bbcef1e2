"""DuckDB differential-test harness (SURVEY.md §5.3).

Mirrors the driver's correctness gate: run the Spark DataFrame builder
and the DuckDB oracle SQL over the same parquet directory, then
compare row count, column set, and values (columns sorted by name,
rows sorted by all columns — order-insensitive).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from hybrid_cdc_demo_spark.sources.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    import datetime

    out = pdf.copy()
    out = out.reindex(sorted(out.columns), axis=1)
    for col in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[col]):
            out[col] = out[col].astype("datetime64[us]")
        elif out[col].dtype == object:
            non_null = out[col].dropna()
            if len(non_null) and all(
                isinstance(v, (datetime.date, datetime.datetime))
                for v in non_null.head(100)
            ):
                out[col] = pd.to_datetime(out[col]).astype("datetime64[us]")
    sort_cols = list(out.columns)
    out = out.sort_values(by=sort_cols, na_position="first").reset_index(drop=True)
    return out


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(oracle_pdf)}"
    )
    s = _normalize(spark_pdf)
    o = _normalize(oracle_pdf)
    assert list(s.columns) == list(o.columns), (
        f"{name}: columns {list(s.columns)} != oracle {list(o.columns)}"
    )
    for col in s.columns:
        sv, ov = s[col], o[col]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            for i, (a, b) in enumerate(zip(sv.tolist(), ov.tolist())):
                a_nan = a is None or (isinstance(a, float) and math.isnan(a))
                b_nan = b is None or (isinstance(b, float) and math.isnan(b))
                if a_nan or b_nan:
                    assert a_nan and b_nan, f"{name}.{col}[{i}]: {a} != {b}"
                else:
                    assert math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9), (
                        f"{name}.{col}[{i}]: {a} != {b}"
                    )
        else:
            sl, ol = sv.tolist(), ov.tolist()
            assert sl == ol, (
                f"{name}.{col}: first diff at "
                f"{next((i for i, (a, b) in enumerate(zip(sl, ol)) if a != b), '?')}"
            )


def run_parity(spark, sf_dir: str, name: str, builder, oracle_sql: str):
    spark_pdf = builder(spark, sf_dir).toPandas()
    con = duck_connection(sf_dir)
    try:
        oracle_pdf = con.execute(oracle_sql).df()
    finally:
        con.close()
    assert_frames_match(spark_pdf, oracle_pdf, name)
    return spark_pdf
