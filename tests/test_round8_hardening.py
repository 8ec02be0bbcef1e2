"""Round-8 hardening pins for the five r7 ADVICE findings:

1. bigram_lm_coherence drops the forced F.broadcast on the
   distinct-bigram-sized weight table (pinned in test_plans.py —
   logical plan carries no hint, AQE still broadcasts at bench SF).
2. quality_weighted_dedup: NaN quality never wins the argmax.
3. nested_double_lit: bitwise F.lit parity above/below the
   256-element SQL-text switch (incl. -0.0 and subnormals), and
   non-finite inputs render as parseable casts instead of 'infD'.
4. engine string_split: a separator containing a backslash splits on
   the LITERAL separator (DuckDB semantics), not on a regex class.
5. bench.py reports a true median for the streaming single-shot legs
   and includes the commitlog replays in the cold-start max.
"""

import math

from pyspark.sql import functions as F


class TestQualityWeightedDedupNaN:
    def _run(self, spark, rows):
        from hybrid_cdc_demo_spark.operators.dedup import quality_weighted_dedup

        df = spark.createDataFrame(
            rows, "doc_id long, text string, quality double, n_chars long"
        )
        return {
            r["kept_doc_id"]: r
            for r in quality_weighted_dedup(
                df, text_col="text", id_col="doc_id",
                quality_col="quality", size_col="n_chars",
            ).collect()
        }

    def test_nan_quality_never_wins(self, spark):
        """A NaN-scored duplicate must lose to ANY finite score — even
        a deeply negative one (Spark struct ordering sorts NaN above
        every real number, so the pre-fix argmax always kept the NaN
        copy)."""
        got = self._run(
            spark,
            [
                (1, "same text", float("nan"), 100),
                (2, "same text", -1e9, 80),
                (3, "same  TEXT ", 0.5, 60),
            ],
        )
        assert set(got) == {3}
        r = got[3]
        assert r["kept_quality"] == 0.5
        assert r["cluster_size"] == 3
        assert r["bytes_dropped"] == 180

    def test_all_nan_cluster_falls_back_to_lowest_id(self, spark):
        """NaN ranks like NULL (-Infinity): an all-NaN cluster keeps
        the lowest id and reports the native NaN quality."""
        got = self._run(
            spark,
            [
                (7, "dup", float("nan"), 10),
                (4, "dup", float("nan"), 20),
            ],
        )
        assert set(got) == {4}
        assert math.isnan(got[4]["kept_quality"])

    def test_nan_vs_null_mixed_finite_still_ranks(self, spark):
        got = self._run(
            spark,
            [
                (1, "x", None, 5),
                (2, "x", float("nan"), 5),
                (3, "x", 0.1, 5),
                (4, "x", 0.9, 5),
            ],
        )
        assert set(got) == {4}
        assert got[4]["kept_quality"] == 0.9


class TestNestedDoubleLitParity:
    # exercises the tricky corners of shortest-repr round-tripping:
    # negative zero, subnormals (min denormal and a mid denormal),
    # extremes, values needing 17 significant digits
    HARD = [
        0.0, -0.0, 1.0, -1.0,
        5e-324, -5e-324, 2.2250738585072014e-308,
        1.7976931348623157e308, -1.7976931348623157e308,
        0.1, 1 / 3, 2 / 3, math.pi, -math.pi, math.e,
        9007199254740993.0, 1.0000000000000002,
        6.02e23, -1.23456789012345678e-100,
    ]

    def _collect_packed(self, spark, col):
        import struct

        rows = spark.range(1).select(col.alias("c")).collect()[0]["c"]
        return [[struct.pack(">d", x) for x in r] for r in rows]

    def test_bitwise_parity_below_switch(self, spark):
        """<=256 elements: the function returns F.lit directly; pin
        the baseline so the comparison above the switch is meaningful."""
        from hybrid_cdc_demo_spark.operators.similarity import nested_double_lit

        rows = [self.HARD]  # 19 elements — F.lit path
        got = self._collect_packed(spark, nested_double_lit(rows))
        ref = self._collect_packed(spark, F.lit(rows))
        assert got == ref

    def test_bitwise_parity_above_switch(self, spark):
        """>256 elements: the SQL-text path must be BITWISE equal to
        F.lit — including -0.0 (sign bit) and subnormals."""
        from hybrid_cdc_demo_spark.operators.similarity import nested_double_lit

        import random

        rng = random.Random(8)
        rows = [
            self.HARD + [rng.uniform(-1e6, 1e6) for _ in range(11)]
            for _ in range(12)
        ]  # 12 * 30 = 360 > 256 — SQL-text path
        got = self._collect_packed(spark, nested_double_lit(rows))
        ref = self._collect_packed(spark, F.lit(rows))
        assert got == ref
        # -0.0's sign bit really survived (guards against a repr or
        # parse path that collapses it to +0.0)
        import struct

        assert struct.pack(">d", -0.0) in {b for r in got for b in r}

    def test_non_finite_values_parse(self, spark):
        """inf/-inf/NaN render as explicit DOUBLE casts (repr() yields
        'infD' which the SQL parser rejects) and round-trip exactly."""
        from hybrid_cdc_demo_spark.operators.similarity import nested_double_lit

        pad = [float(i) for i in range(97)]
        rows = [
            [float("inf"), float("-inf"), float("nan")] + pad,
            pad + [float("nan"), float("inf"), float("-inf")],
            [0.0] * 100,
        ]  # 300 elements — SQL-text path
        got = spark.range(1).select(
            nested_double_lit(rows).alias("c")
        ).collect()[0]["c"]
        assert got[0][0] == float("inf")
        assert got[0][1] == float("-inf")
        assert math.isnan(got[0][2])
        assert got[1][-3:] != got[1][:3]
        assert math.isnan(got[1][97]) and got[1][98] == float("inf")


class TestStringSplitLiteralBackslash:
    def test_backslash_separator_is_literal(self, tmp_path):
        r"""DuckDB's string_split treats '\d' as the two literal
        characters; the pre-fix shim's escape class omitted the
        backslash so Spark's regex split saw the \d digit class."""
        from hybrid_cdc_demo_spark.engine import Engine

        eng = Engine("/root/testdata/sf0.001")
        got = eng.sql(
            r"SELECT string_split('a\\db7c\\dz', '\\d') AS parts"
        ).collect()[0]["parts"]
        assert got == ["a", "b7c", "z"]  # '7' NOT a split point

        # plain backslash separator
        got2 = eng.sql(
            r"SELECT string_split('x\\y\\z', '\\') AS parts"
        ).collect()[0]["parts"]
        assert got2 == ["x", "y", "z"]

        import duckdb

        ref = duckdb.sql(
            r"SELECT string_split('a\db7c\dz', '\d') AS parts"
        ).fetchone()[0]
        assert got == ref

    def test_metacharacters_still_literal(self):
        from hybrid_cdc_demo_spark.engine import Engine

        eng = Engine("/root/testdata/sf0.001")
        for sep, s, want in [
            (".", "a.b.c", ["a", "b", "c"]),
            ("[x]", "1[x]2", ["1", "2"]),
            ("$^", "p$^q", ["p", "q"]),
        ]:
            got = eng.sql(
                f"SELECT string_split('{s}', '{sep}') AS parts"
            ).collect()[0]["parts"]
            assert got == want, (sep, got)


class TestBenchProtocolPins:
    def test_true_median_and_cold_start_coverage(self):
        """Source pin: the single-shot streaming legs report
        statistics.median (sorted[len//2] is the upper-middle value
        for even run counts) and the cold-start max covers the binary
        commitlog replays too."""
        import pathlib

        src = pathlib.Path("/root/repo/bench.py").read_text()
        assert src.count("statistics.median(") >= 2
        assert "sorted_rates[len" not in src
        assert "single_rates[\n            len(single_rates) // 2" not in src
        # Cold-start coverage across the r10 split bench: the
        # throughput legs take the max over single-sink AND binary
        # commitlog replays, and main()/run_streaming_bench merge that
        # with the isolated SLO leg's cold start (the pre-r10 pin was
        # `[*results, *singles, *binaries]` in the one-session bench).
        assert "[*singles, *binaries]" in src
        assert src.count('streaming.pop("streaming_legs_cold_start_sec")') >= 1
        assert src.count("streaming_legs_cold_start_sec") >= 3
