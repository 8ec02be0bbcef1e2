"""Data-quality gate operator: one-pass summary, conservative null
handling, pass/fail split correctness, and the single-scan plan."""

import pyspark.sql.functions as F

from hybrid_cdc_demo_spark.operators.quality import gate, violation_summary


def _df(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "A"),
            (2, -1.0, "A"),     # violates positive
            (3, 5.0, "Z"),      # violates known_flag
            (4, None, "A"),     # null -> violates positive (conservative)
        ],
        "id long, qty double, flag string",
    )


RULES = None


def _rules():
    return {
        "positive": F.col("qty") > 0,
        "known_flag": F.col("flag").isin("A", "B"),
    }


def test_summary_counts_and_rates(spark):
    out = {r["rule"]: r for r in violation_summary(_df(spark), _rules()).collect()}
    assert out["positive"]["n_violations"] == 2  # -1 and NULL
    assert out["known_flag"]["n_violations"] == 1
    assert out["positive"]["n_rows"] == 4
    assert out["positive"]["violation_rate"] == 0.5


def test_gate_splits_any_violation(spark):
    good, bad = gate(_df(spark), _rules())
    assert sorted(r["id"] for r in good.collect()) == [1]
    assert sorted(r["id"] for r in bad.collect()) == [2, 3, 4]


def test_summary_is_single_scan(spark):
    df = _df(spark)
    plan = (
        violation_summary(df, _rules())
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # all rules fold into ONE aggregate over one source scan
    assert plan.count("Scan ExistingRDD") + plan.count("FileScan") == 1


def test_streaming_pipeline_quality_rules_quarantine(spark, tmp_path):
    """Declarative DQ rules in the pipeline: violating rows are split
    out of replication and land in the DLQ under destination='quality';
    clean rows replicate normally."""
    import json

    from hybrid_cdc_demo_spark.schema.evolution import (
        SchemaRegistry,
        TableSchema,
    )
    from hybrid_cdc_demo_spark.sources.cdc import ENVELOPE_SCHEMA
    from hybrid_cdc_demo_spark.streaming.dlq import read_dlq
    from hybrid_cdc_demo_spark.streaming.pipeline import (
        CDCPipeline,
        PipelineConfig,
    )

    def env(eid, uid, age, ts):
        return {
            "event_id": eid,
            "event_type": "INSERT",
            "table_name": "users",
            "keyspace": "ecommerce",
            "partition_key": {"user_id": uid},
            "clustering_key": {},
            "columns": json.dumps({"user_id": uid, "age": age}),
            "timestamp_micros": ts,
            "ttl_seconds": None,
            "captured_at": None,
        }

    reg = SchemaRegistry()
    reg.register(
        TableSchema(
            "ecommerce", "users", {"user_id": "text", "age": "int"}, ["user_id"]
        )
    )
    cfg = PipelineConfig(
        source_dir=str(tmp_path / "unused"),
        target_dir=str(tmp_path / "wh"),
        quality_rules={
            "nonneg_age": (
                "get_json_object(columns, '$.age') IS NULL OR "
                "CAST(get_json_object(columns, '$.age') AS INT) >= 0"
            ),
        },
    )
    p = CDCPipeline(spark, cfg, reg)
    batch = spark.createDataFrame(
        [env("e1", "u1", 30, 100), env("e2", "u2", -5, 200),
         env("e3", "u3", 41, 300)],
        ENVELOPE_SCHEMA,
    )
    stats = p.process_batch(batch, batch_id=0)
    assert stats["valid"] == 2
    assert stats["quality_failed"] == 1
    replicated = {
        json.loads(r["columns"])["user_id"]
        for r in p.sinks["postgres"].read().collect()
    }
    assert replicated == {"u1", "u3"}
    dlq = read_dlq(spark, cfg.dlq_path)
    qrows = dlq.filter(F.col("destination") == "quality").collect()
    assert len(qrows) == 1
    assert json.loads(qrows[0]["columns"])["user_id"] == "u2"


class TestWinsorize:
    def test_exact_boundaries_and_clipping(self, spark):
        from hybrid_cdc_demo_spark.operators.quality import winsorize

        # 100 rows with values 1..100: p1 = 1 (rank ceil(1) = 1),
        # p99 = 99 (rank 99)
        df = spark.createDataFrame(
            [(i, float(i)) for i in range(1, 101)], ["id", "v"]
        )
        got = {r["id"]: r for r in winsorize(df, "v", "id").collect()}
        assert got[50]["lo_bound"] == 1.0 and got[50]["hi_bound"] == 99.0
        assert got[100]["clipped"] == 99.0 and got[100]["is_clipped"] == 1
        assert got[99]["clipped"] == 99.0 and got[99]["is_clipped"] == 0
        assert got[1]["is_clipped"] == 0  # equals the lo boundary
        assert sum(r["is_clipped"] for r in got.values()) == 1

    def test_matches_numpy_reference(self, spark):
        import random

        from hybrid_cdc_demo_spark.operators.quality import winsorize

        rng = random.Random(3)
        vals = [round(rng.gauss(50, 20), 2) for _ in range(500)]
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], ["id", "v"]
        )
        got = winsorize(df, "v", "id").collect()
        sv = sorted(vals)
        lo = sv[(500 * 1 + 99) // 100 - 1]
        hi = sv[(500 * 99 + 99) // 100 - 1]
        for r in got:
            assert r["lo_bound"] == lo and r["hi_bound"] == hi
            assert r["clipped"] == min(max(vals[r["id"]], lo), hi)

    def test_tiny_frames_clamp_rank_to_one(self, spark):
        from hybrid_cdc_demo_spark.operators.quality import winsorize

        df = spark.createDataFrame([(1, 5.0), (2, 7.0)], ["id", "v"])
        got = {r["id"]: r for r in winsorize(df, "v", "id").collect()}
        assert got[1]["lo_bound"] == 5.0  # rank clamps to 1
        assert all(r["is_clipped"] == 0 for r in got.values())
