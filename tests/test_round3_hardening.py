"""Round-3 hardening regressions.

Each test pins one fix:

* offset_upsert_sql emits only portable ANSI (CASE running-max) — the
  previous two-arg MAX() was sqlite-only while the module docstring
  claims Postgres-grammar parity (src/sinks/postgres.py:148-205).
* events_replicated_count has ONE definition — collapsed rows applied
  (upserts + deletes) — in both txn scopes.
* AppendSink's empty-log read uses the persisted first-write schema,
  so consumers see the same columns/types before and after batch 1.
* HypertableSink's compacted base is chunk-partitioned and a
  time-ranged read prunes to the queried chunks (the hypertable's
  point, reference src/sinks/timescaledb.py:89-139).
"""

import contextlib
import io
import json
import sqlite3

import pyspark.sql.functions as F
import pytest

from hybrid_cdc_demo_spark.streaming.jdbc import (
    OFFSET_TABLE_DDL,
    JdbcUpsertSink,
    offset_upsert_sql,
)
from hybrid_cdc_demo_spark.streaming.sinks import AppendSink, HypertableSink

from tests.test_round2_hardening import _jdbc_df, _jdbc_fixture


def test_offset_upsert_sql_is_portable_ansi():
    sql = offset_upsert_sql()
    # two-arg MAX is sqlite/ClickHouse-only; GREATEST is Postgres-only —
    # the generated grammar must parse on every claimed dialect
    assert "MAX(" not in sql.upper().replace(" ", "")
    assert "GREATEST" not in sql.upper()
    assert "CASE" in sql and "END" in sql
    # and sqlite actually accepts + applies the running max
    conn = sqlite3.connect(":memory:")
    conn.execute(OFFSET_TABLE_DDL)
    args = ("users", "ecommerce", "jdbc")
    conn.execute(offset_upsert_sql(), args + (1, 400, 2))
    conn.execute(offset_upsert_sql(), args + (2, 100, 3))  # older events
    bid, ts, n = conn.execute(
        "SELECT batch_id, last_event_timestamp_micros, "
        "events_replicated_count FROM cdc_offsets"
    ).fetchone()
    assert (bid, ts, n) == (2, 400, 5)


@pytest.mark.parametrize("scope", ["partition", "driver"])
def test_jdbc_replicated_count_is_collapsed_rows_both_scopes(
    spark, tmp_path, scope
):
    """ADVICE: driver scope used to commit upserts only while partition
    scope committed upserts+deletes — one semantics now: collapsed rows
    applied."""
    factory = _jdbc_fixture(tmp_path, f"count-{scope}")
    sink = JdbcUpsertSink(
        factory, "users", ["user_id", "email"], ["user_id"], txn_scope=scope
    )
    df = _jdbc_df(
        spark,
        [
            # u1: two raw events collapse to one upsert
            ("e0", "INSERT", "u1", "old@x.io", 100),
            ("e1", "UPDATE", "u1", "new@x.io", 200),
            ("e2", "INSERT", "u2", "b@x.io", 100),
            ("e3", "DELETE", "u3", None, 100),
        ],
    )
    sink.write_batch(df, batch_id=1)
    conn = factory()
    (n,) = conn.execute(
        "SELECT events_replicated_count FROM cdc_offsets"
    ).fetchone()
    conn.close()
    assert n == 3  # 2 upsert winners + 1 delete, NOT 4 raw, NOT 2 upserts


def test_append_sink_empty_read_uses_persisted_schema(spark, tmp_path):
    """ADVICE: the empty-log fallback hardcoded key-cols-as-string + 4
    fixed columns, so a consumer selecting a payload column worked
    after batch 1 but failed on an empty log."""
    import shutil

    sink = AppendSink(spark, str(tmp_path / "ch"), ["user_id"])
    batch = spark.createDataFrame(
        [(7, "e0", "INSERT", 100, '{"city":"Oslo"}')],
        "user_id long, event_id string, event_type string, "
        "timestamp_micros long, columns string",
    )
    sink.write_batch(batch, batch_id=0)
    populated_schema = sink.read_raw().schema

    # log drained (e.g. retention) — schema must NOT degrade
    for seg in (tmp_path / "ch" / "log").glob("seg-*"):
        shutil.rmtree(seg)
    empty = sink.read_raw()
    assert empty.count() == 0
    assert empty.schema == populated_schema
    # payload column selectable, key type preserved (long, not string)
    assert empty.select("columns").count() == 0
    assert dict(empty.dtypes)["user_id"] == "bigint"

    # a fresh sink that never wrote still gets the minimal fallback
    fresh = AppendSink(spark, str(tmp_path / "ch2"), ["user_id"])
    assert fresh.read_raw().count() == 0


def test_hypertable_time_range_read_prunes_chunks(spark, tmp_path):
    """O24: the compacted base is partitionBy(_chunk); a time-ranged
    read must plan a PartitionFilter and touch only the queried chunk
    directories — the create_hypertable property the sink exists for."""
    sink = HypertableSink(spark, str(tmp_path / "ts"), ["key_hash"])
    day_us = 86_400_000_000
    base_us = 1_704_067_200_000_000  # 2024-01-01 UTC
    rows = [
        (f"k{d}-{i}", f"e{d}-{i}", "INSERT", base_us + d * day_us + i)
        for d in range(4)
        for i in range(5)
    ]
    batch = spark.createDataFrame(
        rows,
        "key_hash string, event_id string, event_type string, "
        "timestamp_micros long",
    )
    sink.write_batch(batch, batch_id=0)
    sink.compact()

    base = sink.table.read()
    one_day = base.filter(F.col("_chunk") == F.lit("2024-01-02").cast("date"))
    assert one_day.count() == 5

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        one_day.explain("formatted")
    plan = buf.getvalue()
    pf_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf_lines and any("_chunk" in ln for ln in pf_lines), plan

    touched = [
        r[0]
        for r in one_day.select(F.input_file_name()).distinct().collect()
    ]
    assert touched
    for f in touched:
        assert "_chunk=2024-01-02" in f, f
    # other chunks exist and were not touched
    all_files = [
        r[0] for r in base.select(F.input_file_name()).distinct().collect()
    ]
    assert len(all_files) > len(touched)
