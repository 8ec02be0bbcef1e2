"""Z-order layout (operators/layout.py): the measurable contract is
file-level min/max skipping in BOTH clustered dimensions — a linear
sort gives it in one dimension only."""

import pyspark.sql.functions as F
import pytest

from hybrid_cdc_demo_spark.operators.layout import (
    candidate_files,
    compute_bounds,
    zorder_code,
    zorder_write,
)
from hybrid_cdc_demo_spark.sources.tables import load_table

N_FILES = 16


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )


def test_zorder_code_interleaves_bits(spark):
    # bucket(a)=0b10, bucket(b)=0b01 with 2 bits each over [0,4):
    # interleaved (a bit i -> pos 2i, b bit i -> pos 2i+1) = 0b0110
    df = spark.createDataFrame([(2.0, 1.0)], "a double, b double")
    code = df.select(
        zorder_code(["a", "b"], {"a": (0, 4), "b": (0, 4)}, bits=2).alias("z")
    ).collect()[0]["z"]
    assert code == 0b0110


def test_zorder_write_preserves_rows(spark, lineitem, tmp_path):
    path = str(tmp_path / "z")
    zorder_write(lineitem, path, ["l_orderkey", "l_partkey"], N_FILES)
    back = spark.read.parquet(path)
    assert back.count() == lineitem.count()
    assert (
        back.agg(F.sum("l_orderkey")).collect()[0][0]
        == lineitem.agg(F.sum("l_orderkey")).collect()[0][0]
    )


def test_zorder_prunes_both_dimensions(spark, lineitem, tmp_path):
    """A selective box predicate on EITHER clustered column must skip
    most files of the z-ordered layout; the linear-sorted layout only
    skips on its sort column."""
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "linear")
    bounds = compute_bounds(lineitem, ["l_orderkey", "l_partkey"])
    zorder_write(lineitem, zpath, ["l_orderkey", "l_partkey"], N_FILES,
                 bounds=bounds)
    (
        lineitem.repartitionByRange(N_FILES, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    # a ~1/8 slice in each dimension
    (ok_lo, ok_hi), (pk_lo, pk_hi) = bounds["l_orderkey"], bounds["l_partkey"]
    ok_box = (ok_lo, ok_lo + (ok_hi - ok_lo) / 8)
    pk_box = (pk_lo, pk_lo + (pk_hi - pk_lo) / 8)

    z_ok, z_total = candidate_files(zpath, {"l_orderkey": ok_box})
    z_pk, _ = candidate_files(zpath, {"l_partkey": pk_box})
    l_ok, l_total = candidate_files(lpath, {"l_orderkey": ok_box})
    l_pk, _ = candidate_files(lpath, {"l_partkey": pk_box})

    assert z_total == l_total == N_FILES
    # linear layout: perfect on its sort column, useless on the other
    assert l_ok <= N_FILES // 4
    assert l_pk == N_FILES
    # z-order: skips meaningfully in BOTH dimensions
    assert z_ok <= N_FILES // 2
    assert z_pk <= N_FILES // 2
    # and the 2-D box touches fewer files than either 1-D slice
    z_box, _ = candidate_files(
        zpath, {"l_orderkey": ok_box, "l_partkey": pk_box}
    )
    assert z_box <= min(z_ok, z_pk)


def test_zorder_code_rejects_overflow():
    with pytest.raises(ValueError):
        zorder_code(["a", "b", "c"], {c: (0, 1) for c in "abc"}, bits=21)


def test_zorder_results_unchanged_by_layout(spark, lineitem, tmp_path):
    """Clustering is physical only: a query over the z-ordered copy
    returns exactly the source rows."""
    path = str(tmp_path / "z")
    zorder_write(lineitem, path, ["l_orderkey", "l_partkey"], N_FILES)
    back = spark.read.parquet(path)
    box = back.filter(
        (F.col("l_orderkey") < 1000) & (F.col("l_partkey") < 500)
    )
    src = lineitem.filter(
        (F.col("l_orderkey") < 1000) & (F.col("l_partkey") < 500)
    )
    assert sorted(map(tuple, box.collect())) == sorted(map(tuple, src.collect()))


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """Joining a date-partitioned fact to a FILTERED dim must plan a
    dynamicpruning subquery on the fact's partition column: the fact
    scan reads only partitions whose keys survive the dim filter,
    discovered AT RUNTIME from the dim side — the mechanism that makes
    star-schema joins over a 100 TB partitioned fact read only the
    selected slice, without a literal partition predicate in the query."""
    import pyspark.sql.functions as F

    from hybrid_cdc_demo_spark.sources.tables import load_table

    orders = load_table(spark, "/root/testdata/sf0.01", "orders")
    fact_path = str(tmp_path / "orders_by_month")
    (
        orders.withColumn("month", F.date_format("o_orderdate", "yyyy-MM"))
        .write.partitionBy("month")
        .parquet(fact_path)
    )
    fact = spark.read.parquet(fact_path)
    months = sorted(r["month"] for r in fact.select("month").distinct().collect())
    # a real dim TABLE (DPP requires a selective predicate on a
    # broadcastable scan side, not an inline literal frame)
    dim_path = str(tmp_path / "month_dim")
    spark.createDataFrame(
        [(m, i % 4 + 1) for i, m in enumerate(months)],
        "month string, quarter int",
    ).write.parquet(dim_path)
    dim = spark.read.parquet(dim_path)
    # dim filtered on an attribute; no literal month predicate on the fact
    joined = fact.join(dim.filter(F.col("quarter") == 1), "month").groupBy(
        "month"
    ).count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan.lower(), plan[:2000]
