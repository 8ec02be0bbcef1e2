"""Round-9 hardening pins (VERDICT r8 tasks + r8 ADVICE):

1. The PHI hot path is the builtin-expression HMAC (no Python UDF in
   the micro-batch plan), digest-identical to the stdlib and to the
   declared pandas_udf form (vectors in test_masking.py; here we pin
   the PLAN property: no PythonUDF/ArrowEvalPython node).
2. Sink maintenance (compaction/optimize) submits its Spark jobs into
   the deprioritized 'background' FAIR pool; the wrapper clears the
   pool local property afterwards so the reused worker thread never
   leaks it into later foreground work.
3. bench.py exposes the session-noise calibration probe and flags a
   streaming p99 target breach loudly (streaming_p99_target_met).
4. The generated PageRank / LR-training oracles parse, unroll the
   declared iteration count, and materialize every chained CTE (the
   inlining guard — without MATERIALIZED the chain re-evaluates
   exponentially).
5. spill_audit's per-task shuffle-write max covers EVERY
   shuffle-writing stage (r8 ADVICE #2) and the settle loop replaces
   the fixed listener-bus sleep (r8 ADVICE #1).
"""

from __future__ import annotations

import pyspark.sql.functions as F


class TestHmacHotPathIsBuiltin:
    def test_mask_phi_plan_has_no_python_udf(self, spark):
        from hybrid_cdc_demo_spark.functions.masking import mask_phi

        df = spark.createDataFrame([("MRN-1",)], "patient_id string")
        plan = (
            df.select(mask_phi("patient_id").alias("tok"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Python" not in plan and "ArrowEval" not in plan, plan

    def test_pipeline_masked_payload_has_no_python_udf(self, spark):
        """The full pipeline masking projection (which embeds the PHI
        expression inside the to_json(struct(...)) payload rebuild)
        must also stay JVM-side."""
        from hybrid_cdc_demo_spark.schema.evolution import (
            SchemaRegistry,
            TableSchema,
        )
        from hybrid_cdc_demo_spark.streaming.pipeline import (
            CDCPipeline,
            PipelineConfig,
        )
        import tempfile

        reg = SchemaRegistry()
        reg.register(
            TableSchema(
                "ecommerce",
                "users",
                {"user_id": "uuid", "patient_id": "text", "email": "text"},
                ["user_id"],
            )
        )
        tmp = tempfile.mkdtemp(prefix="cdc-hmac-plan-")
        cfg = PipelineConfig(source_dir=tmp, target_dir=tmp + "/wh")
        p = CDCPipeline(spark, cfg, reg)
        df = spark.createDataFrame(
            [
                (
                    "e1",
                    "INSERT",
                    "users",
                    "ecommerce",
                    {"user_id": "u1"},
                    {},
                    '{"user_id": "u1", "patient_id": "MRN-1"}',
                    1,
                    None,
                    "2024-01-01T00:00:00Z",
                )
            ],
            "event_id string, event_type string, table_name string, "
            "keyspace string, partition_key map<string,string>, "
            "clustering_key map<string,string>, columns string, "
            "timestamp_micros long, ttl_seconds int, captured_at string",
        )
        plan = (
            p.mask(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Python" not in plan and "ArrowEval" not in plan, plan


class TestBackgroundPoolWrapper:
    def test_wrapper_sets_and_clears_pool(self, spark):
        from hybrid_cdc_demo_spark.streaming.sinks import _in_background_pool

        sc = spark.sparkContext
        seen = {}

        def task():
            seen["pool"] = sc.getLocalProperty("spark.scheduler.pool")
            return 42

        assert _in_background_pool(spark, task)() == 42
        assert seen["pool"] == "background"
        assert sc.getLocalProperty("spark.scheduler.pool") is None

    def test_wrapper_clears_pool_on_error(self, spark):
        from hybrid_cdc_demo_spark.streaming.sinks import _in_background_pool

        sc = spark.sparkContext

        def boom():
            raise RuntimeError("maintenance failed")

        try:
            _in_background_pool(spark, boom)()
        except RuntimeError:
            pass
        assert sc.getLocalProperty("spark.scheduler.pool") is None

    def test_upsert_sink_compaction_runs_in_background_pool(
        self, spark, tmp_path
    ):
        """compact_every=1 forces a maintenance submission on the very
        first batch; the submitted callable must route through the
        background pool (observed via the pool property inside a
        wrapped compact)."""
        from hybrid_cdc_demo_spark.streaming.sinks import UpsertSink

        sink = UpsertSink(
            spark, str(tmp_path / "s"), key_cols=["k"], compact_every=1
        )
        seen = {}
        orig = sink.compact

        def spying_compact():
            seen["pool"] = spark.sparkContext.getLocalProperty(
                "spark.scheduler.pool"
            )
            return orig()

        sink.compact = spying_compact
        df = spark.createDataFrame(
            [("a", 1, "INSERT", "e1")],
            "k string, timestamp_micros long, event_type string, event_id string",
        )
        sink.write_batch(df, 0)
        sink.flush()
        assert seen.get("pool") == "background"


class TestSessionFairScheduler:
    def test_engine_session_uses_fair_with_background_pool(self, spark):
        """Sessions built by get_spark run FAIR with the allocation
        file shipped in the package (foreign sessions stay FIFO and
        the pool property is inert there — by design)."""
        sc = spark.sparkContext
        if sc.getConf().get("spark.scheduler.mode", "FIFO") != "FAIR":
            import pytest

            pytest.skip("foreign FIFO session — pool property inert")
        alloc = sc.getConf().get("spark.scheduler.allocation.file", "")
        assert alloc.endswith("fairscheduler.xml")


class TestBenchCalibrationAndP99Flag:
    def test_calibration_probe_returns_positive_median(self, spark):
        import bench

        sec = bench.calibration_probe(spark, reps=3)
        assert sec > 0

    def test_p99_flag_logic(self):
        """The artifact flag is the all-runs invariant, not the max."""
        runs_ok = [0.8, 0.9, 0.7]
        runs_bad = [0.8, 1.2, 0.7]
        assert all(p < 1.0 for p in runs_ok)
        assert not all(p < 1.0 for p in runs_bad)


class TestGeneratedOracles:
    def test_pagerank_oracle_unrolls_iterations(self):
        from hybrid_cdc_demo_spark.plans.graph_queries import (
            _pagerank_oracle_sql,
        )

        sql = _pagerank_oracle_sql(iterations=10)
        assert "r10" in sql and "r11" not in sql
        # inlining guard: every chained CTE must be materialized
        assert sql.count("AS MATERIALIZED") >= 3 * 10 + 4
        import duckdb

        duckdb.connect().execute(
            "CREATE VIEW documents AS SELECT 'a b c' AS text"
        ).execute(sql)  # parses + runs on a 1-row corpus

    def test_lr_oracle_unrolls_steps(self):
        from hybrid_cdc_demo_spark.plans.ml_queries import (
            _lr_training_oracle_sql,
        )

        sql = _lr_training_oracle_sql(iters=8)
        assert "w8" in sql and "w9" not in sql
        assert sql.count("AS MATERIALIZED") >= 4 * 8 + 5
        import duckdb

        out = (
            duckdb.connect()
            .execute(
                "CREATE VIEW documents AS SELECT 'the cat sat. on a mat!' AS text"
            )
            .execute(sql)
            .df()
        )
        assert list(out["iteration"]) == list(range(8))

    def test_registered_oracles_use_generators(self):
        from hybrid_cdc_demo_spark.plans import ORACLE_SQL
        from hybrid_cdc_demo_spark.plans.graph_queries import (
            _pagerank_oracle_sql,
        )
        from hybrid_cdc_demo_spark.plans.ml_queries import (
            _lr_training_oracle_sql,
        )

        assert ORACLE_SQL["ns_pagerank_tokens"] == _pagerank_oracle_sql(10)
        assert ORACLE_SQL["ns_lr_training"] == _lr_training_oracle_sql(8, 1.0)

    def test_semantic_dedup_oracle_is_two_stage(self):
        """The sf3-tractable form: native dot-product prefilter CTE
        plus the exact-fold re-rank — and the prefilter margin is the
        documented 1e-6 (wide enough to be ulp-safe, tight enough to
        keep candidates ~1 per point)."""
        from hybrid_cdc_demo_spark.plans import ORACLE_SQL

        sql = ORACLE_SQL["ns_semantic_dedup"]
        assert "list_dot_product(t.e, c.c)" in sql  # native prefilter
        assert "1e-6" in sql  # completeness margin
        assert "list_reduce" in sql  # exact-fold re-rank retained


class TestSpillAuditFixes:
    def test_max_task_scan_covers_all_stages(self):
        """_max_task_shuffle_write_all must consult every stage with
        nonzero shuffle write, not just the aggregate-largest one."""
        import tools.spill_audit as SA

        calls = []

        def fake_single(api, stage):
            calls.append(stage["stageId"])
            return {1: 10, 2: 999, 3: 5}[stage["stageId"]]

        orig = SA._max_task_shuffle_write
        SA._max_task_shuffle_write = fake_single
        try:
            stages = [
                {"stageId": 1, "shuffleWriteBytes": 100},
                {"stageId": 2, "shuffleWriteBytes": 50},  # smaller agg,
                {"stageId": 3, "shuffleWriteBytes": 70},  # bigger task
                {"stageId": 4, "shuffleWriteBytes": 0},  # skipped
            ]
            got = SA._max_task_shuffle_write_all("api", stages)
        finally:
            SA._max_task_shuffle_write = orig
        assert got == 999
        assert sorted(calls) == [1, 2, 3]

    def test_max_task_scan_surfaces_partial_reads(self):
        import tools.spill_audit as SA

        orig = SA._max_task_shuffle_write
        SA._max_task_shuffle_write = lambda api, stage: -1
        try:
            got = SA._max_task_shuffle_write_all(
                "api", [{"stageId": 1, "shuffleWriteBytes": 9}]
            )
        finally:
            SA._max_task_shuffle_write = orig
        assert got == -1


class TestSharedLatestFlag:
    def test_flag_matches_latest_per_key(self, spark):
        from hybrid_cdc_demo_spark.schema.evolution import (
            SchemaRegistry,
            TableSchema,
        )
        from hybrid_cdc_demo_spark.streaming.pipeline import (
            CDCPipeline,
            PipelineConfig,
        )
        from hybrid_cdc_demo_spark.streaming.sinks import latest_per_key
        import tempfile

        reg = SchemaRegistry()
        reg.register(
            TableSchema("ecommerce", "users", {"user_id": "uuid"}, ["user_id"])
        )
        tmp = tempfile.mkdtemp(prefix="cdc-flag-")
        p = CDCPipeline(
            spark,
            PipelineConfig(source_dir=tmp, target_dir=tmp + "/wh"),
            reg,
        )
        df = spark.createDataFrame(
            [
                ("e1", "k1", 10),
                ("e2", "k1", 20),  # latest for k1
                ("e3", "k2", 5),
                ("e4", "k2", 5),  # ts tie -> event_id desc wins
            ],
            "event_id string, key_hash string, timestamp_micros long",
        )
        flagged = p._flag_latest(df)
        winners = {
            r["event_id"]
            for r in flagged.filter("__latest").collect()
        }
        expected = {
            r["event_id"]
            for r in latest_per_key(df, ["key_hash"]).collect()
        }
        assert winners == expected == {"e2", "e4"}

    def test_foreign_key_sink_never_sees_the_flag(self, spark, tmp_path):
        """A sink keyed differently from the pipeline must receive the
        batch WITHOUT __latest (it would collapse by the wrong key
        otherwise) and therefore computes its own latest_per_key."""
        from hybrid_cdc_demo_spark.schema.evolution import (
            SchemaRegistry,
            TableSchema,
        )
        from hybrid_cdc_demo_spark.sources.cdc import generate_change_events
        from hybrid_cdc_demo_spark.streaming.pipeline import (
            CDCPipeline,
            PipelineConfig,
        )

        reg = SchemaRegistry()
        reg.register(
            TableSchema(
                "ecommerce",
                "users",
                {
                    "user_id": "uuid", "email": "text", "phone": "text",
                    "first_name": "text", "last_name": "text", "age": "int",
                    "city": "text", "created_at": "timestamp",
                },
                ["user_id"],
            )
        )
        src = str(tmp_path / "commitlog")
        generate_change_events(src, n_events=200, n_files=2, seed=7)
        cfg = PipelineConfig(
            source_dir=src,
            target_dir=str(tmp_path / "wh"),
            share_latest_flag=True,  # opt-in (off by default — r9 A/B)
        )
        p = CDCPipeline(spark, cfg, reg)

        seen = {}

        class ForeignSink:
            name = "foreign"
            key_cols = ["event_id"]  # NOT the pipeline's key

            def write_batch(self, batch, batch_id):
                seen["cols"] = batch.columns
                return batch.count()

            def read(self):  # pragma: no cover - fan-out contract
                raise NotImplementedError

            def flush(self):
                pass

        p.sinks = {"foreign": ForeignSink()}
        p.run_available()
        assert "cols" in seen
        assert "__latest" not in seen["cols"]


class TestMMRGeneratedOracle:
    def test_mmr_oracle_unrolls_picks(self):
        from hybrid_cdc_demo_spark.plans import ORACLE_SQL
        from hybrid_cdc_demo_spark.plans.textmetrics_queries import (
            _mmr_oracle_sql,
        )

        sql = _mmr_oracle_sql(k=10, lam=0.7)
        assert ORACLE_SQL["ns_mmr_diverse"] == sql
        assert "p10" in sql and "p11" not in sql
        # 1 - lam must be the PYTHON double, not the decimal 0.3 —
        # the engine multiplies by exactly this constant
        assert "0.30000000000000004" in sql
        assert sql.count("AS MATERIALIZED") >= 2 * 10 + 2
        import duckdb

        out = (
            duckdb.connect()
            .execute(
                "CREATE VIEW embeddings AS SELECT * FROM (VALUES "
                "(0, [1.0,0.0]), (1, [0.9,0.1]), (2, [0.0,1.0])) "
                "t(vec_id, embedding)"
            )
            .execute(sql)
            .df()
        )
        # 3 candidates < k picks: pool exhausts gracefully like the
        # engine side, and the query vector (min id) ranks first
        assert list(out["rank"]) == [1, 2, 3]
        assert out["vec_id"][0] == 0


class TestBPEGeneratedOracles:
    CORPUS = (
        "low low low low low lower lower newest newest newest "
        "newest newest newest widest widest widest"
    )

    def test_vocab_oracle_textbook_merges(self):
        """The generated 6-step chain reproduces the Sennrich textbook
        merge sequence on the classic corpus."""
        import duckdb

        from hybrid_cdc_demo_spark.plans import ORACLE_SQL
        from hybrid_cdc_demo_spark.plans.tokenizer_queries import (
            _bpe_vocab_oracle_sql,
        )

        sql = _bpe_vocab_oracle_sql(6)
        assert ORACLE_SQL["ns_bpe_vocab"] == sql
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT '{self.CORPUS}' AS text"
        )
        out = con.execute(sql).df()
        assert list(out["merged"])[:4] == ["es", "est", "lo", "low"]
        assert list(out["cnt"])[:4] == [9, 9, 7, 7]

    def test_encode_oracle_counts(self):
        """Dictionary-encoded tokenization over the trained chain:
        'lowest' is not in the training vocab, so the encode oracle
        only covers corpus words — checked on the corpus itself
        (n_bpe <= n_chars per word, and the known totals)."""
        import duckdb

        from hybrid_cdc_demo_spark.plans import ORACLE_SQL
        from hybrid_cdc_demo_spark.plans.tokenizer_queries import (
            _bpe_encode_oracle_sql,
        )

        sql = _bpe_encode_oracle_sql(6)
        assert ORACLE_SQL["ns_bpe_encode"] == sql
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS "
            f"SELECT 1 AS doc_id, '{self.CORPUS}' AS text "
            "UNION ALL SELECT 2, 'low lower'"
        )
        out = con.execute(sql).df().set_index("doc_id")
        assert out.loc[1, "n_words"] == 16
        # doc 2: low -> [low] (1 token), lower -> [low,e,r] (3 tokens)
        assert out.loc[2, "n_words"] == 2
        assert out.loc[2, "n_bpe_tokens"] == 4

    def test_flag_off_by_default_and_on_when_opted_in(self, spark, tmp_path):
        """Default config never adds __latest (the r9 A/B showed the
        serialized window LOSES at SLO batch size); opting in delivers
        it to same-keyed sinks."""
        from hybrid_cdc_demo_spark.schema.evolution import (
            SchemaRegistry,
            TableSchema,
        )
        from hybrid_cdc_demo_spark.sources.cdc import generate_change_events
        from hybrid_cdc_demo_spark.streaming.pipeline import (
            CDCPipeline,
            PipelineConfig,
        )

        reg = SchemaRegistry()
        reg.register(
            TableSchema(
                "ecommerce", "users",
                {"user_id": "uuid", "age": "int"}, ["user_id"],
            )
        )
        src = str(tmp_path / "cl")
        generate_change_events(src, n_events=100, n_files=1, seed=3)

        seen: dict[str, list] = {}

        def spy_sink(name):
            class Spy:
                key_cols = ["key_hash"]  # matches the pipeline default

                def __init__(self):
                    self.name = name

                def write_batch(self, batch, batch_id):
                    seen[name] = batch.columns
                    return batch.count()

                def flush(self):
                    pass

            return Spy()

        for flag in (False, True):
            cfg = PipelineConfig(
                source_dir=src,
                target_dir=str(tmp_path / f"wh-{flag}"),
                share_latest_flag=flag,
            )
            p = CDCPipeline(spark, cfg, reg)
            p.sinks = {f"spy{flag}": spy_sink(f"spy{flag}")}
            p.run_available()
        assert "__latest" not in seen["spyFalse"]
        assert "__latest" in seen["spyTrue"]
