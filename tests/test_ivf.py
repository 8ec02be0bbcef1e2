"""IVF ANN (KMeans coarse quantizer): recall vs brute force, graceful
degradation to exact search at nprobe == num_cells, and the persisted
partitionBy(_cell) index path (pruning, parity, stale rebuild)."""

import contextlib
import io
import json
import os

import pyspark.sql.functions as F

from hybrid_cdc_demo_spark.operators.similarity import (
    brute_force_topk,
    ivf_index,
    ivf_read,
    ivf_topk,
    ivf_topk_persisted,
    ivf_write,
    probe_cells,
)
from hybrid_cdc_demo_spark.plans.northstar import (
    corpus_fingerprint,
    ensure_ivf_index,
)
from hybrid_cdc_demo_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def _query_df(spark, emb):
    emb_d = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    min_id = emb_d.agg(F.min("vec_id").alias("mid"))
    return emb_d.join(F.broadcast(min_id), emb_d.vec_id == F.col("mid")).select(
        F.col("emb").alias("qv")
    )


def test_ivf_index_assigns_every_vector_once(spark):
    emb = load_table(spark, SF, "embeddings")
    indexed, centers = ivf_index(emb, num_cells=16)
    n = emb.count()
    assert indexed.count() == n
    assert indexed.select("vec_id").distinct().count() == n
    cells = indexed.select("_cell").distinct().count()
    assert 2 <= cells <= 16
    assert len(centers) == 16


def test_ivf_recall_vs_brute_force(spark):
    emb = load_table(spark, SF, "embeddings")
    q = _query_df(spark, emb)
    exact = {r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()}
    approx = {
        r["vec_id"]
        for r in ivf_topk(emb, q, k=10, num_cells=16, nprobe=6).collect()
    }
    recall = len(exact & approx) / 10
    assert recall >= 0.6, f"recall {recall}"


def test_ivf_full_probe_is_exact(spark):
    emb = load_table(spark, SF, "embeddings")
    q = _query_df(spark, emb)
    exact = [r["vec_id"] for r in brute_force_topk(emb, q, k=5).collect()]
    full = [
        r["vec_id"]
        for r in ivf_topk(emb, q, k=5, num_cells=8, nprobe=8).collect()
    ]
    assert exact == full


# --- persisted (partitionBy _cell) index path --------------------------------


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_persisted_matches_inline(spark, tmp_path):
    """ivf_topk_persisted over an ivf_write index returns exactly what
    the in-memory ivf_topk returns for the same corpus/params."""
    emb = load_table(spark, SF, "embeddings")
    q = _query_df(spark, emb)
    path = str(tmp_path / "ivf")
    ivf_write(emb, path, num_cells=16, seed=42)
    inline = [
        (r["vec_id"], round(r["score"], 6))
        for r in ivf_topk(emb, q, k=10, num_cells=16, nprobe=6, seed=42).collect()
    ]
    persisted = [
        (r["vec_id"], round(r["score"], 6))
        for r in ivf_topk_persisted(spark, path, q, k=10, nprobe=6).collect()
    ]
    assert persisted == inline


def test_persisted_recall_vs_brute_force(spark, tmp_path):
    emb = load_table(spark, SF, "embeddings")
    q = _query_df(spark, emb)
    path = str(tmp_path / "ivf")
    ivf_write(emb, path, num_cells=16, seed=42)
    exact = {r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()}
    # nprobe=10/16 matches the registered ns_simsearch_ivf query. The
    # synthetic embeddings are isotropic (mean pairwise cos ~ 0) — the
    # adversarial case for any cell-probing ANN — so recall here is a
    # floor; clustered real-world embeddings do better at lower nprobe.
    approx = {
        r["vec_id"]
        for r in ivf_topk_persisted(spark, path, q, k=10, nprobe=10).collect()
    }
    recall = len(exact & approx) / 10
    assert recall >= 0.9, f"recall {recall}"


def test_persisted_index_prunes_partitions(spark, tmp_path):
    """The _cell IN (probes) predicate must reach the scan as a
    PartitionFilter, and the files the probe actually touches must all
    live under probed _cell= directories — the partition-pruned I/O
    that makes the persisted index O(nprobe/num_cells) per query."""
    emb = load_table(spark, SF, "embeddings")
    q = _query_df(spark, emb)
    path = str(tmp_path / "ivf")
    ivf_write(emb, path, num_cells=16, seed=42)

    out = ivf_topk_persisted(spark, path, q, k=10, nprobe=4)
    plan = _formatted_plan(out)
    pf_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf_lines and any("_cell" in ln for ln in pf_lines), plan

    indexed, centers, _ = ivf_read(spark, path)
    qv = q.first()[0]
    probe = probe_cells(centers, qv, nprobe=4)
    touched = [
        r[0]
        for r in indexed.filter(F.col("_cell").isin(probe))
        .select(F.input_file_name())
        .distinct()
        .collect()
    ]
    assert touched
    allowed = tuple(f"_cell={p}/" for p in probe)
    for f in touched:
        assert any(a in f for a in allowed), f
    # and at least one cell's files were NOT touched (pruning is real)
    all_cells = {r["_cell"] for r in indexed.select("_cell").distinct().collect()}
    assert set(probe) < all_cells


def test_stale_index_rebuilt_on_corpus_change(spark, tmp_path, monkeypatch):
    """Regenerating the corpus at the same path must invalidate the
    persisted index (corpus fingerprint mismatch), not silently serve
    stale results."""
    monkeypatch.setenv("SPARK_GRAFT_IVF_DIR", str(tmp_path / "cache"))
    sf = str(tmp_path / "sf")
    os.makedirs(sf)

    def write_corpus(n, seed):
        import random

        rng = random.Random(seed)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(n)
        ]
        spark.createDataFrame(rows, "vec_id int, embedding array<float>").coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(sf, "embeddings.parquet"))

    write_corpus(60, seed=1)
    path1 = ensure_ivf_index(spark, sf, num_cells=4, seed=42)
    with open(os.path.join(path1, "centroids.json")) as fh:
        meta1 = json.load(fh)
    assert meta1["corpus_fingerprint"] == corpus_fingerprint(sf)
    n1 = spark.read.parquet(os.path.join(path1, "data")).count()
    assert n1 == 60

    # same fingerprint → no rebuild (cheap no-op path)
    centroids_mtime = os.stat(os.path.join(path1, "centroids.json")).st_mtime_ns
    ensure_ivf_index(spark, sf, num_cells=4, seed=42)
    assert (
        os.stat(os.path.join(path1, "centroids.json")).st_mtime_ns
        == centroids_mtime
    )

    # regenerated corpus (different size/content) → rebuild
    write_corpus(90, seed=2)
    path2 = ensure_ivf_index(spark, sf, num_cells=4, seed=42)
    assert path2 == path1
    with open(os.path.join(path2, "centroids.json")) as fh:
        meta2 = json.load(fh)
    assert meta2["corpus_fingerprint"] != meta1["corpus_fingerprint"]
    assert spark.read.parquet(os.path.join(path2, "data")).count() == 90


def test_ivf_append_is_visible_and_exact(spark, tmp_path):
    """Incremental ingestion: build on a prefix of the corpus, append
    the rest, then a full probe (nprobe == cells -> exact search) must
    equal brute-force top-k over the WHOLE corpus — proving appended
    vectors are ranked identically to originally-indexed ones."""
    from hybrid_cdc_demo_spark.operators.similarity import (
        ivf_append,
        ivf_topk_persisted,
        ivf_write,
    )

    emb = load_table(spark, SF, "embeddings")
    base = emb.filter(F.col("vec_id") < 400)
    extra = emb.filter(F.col("vec_id") >= 400)
    path = str(tmp_path / "ivf_app")
    ivf_write(base, path, num_cells=8, seed=42)
    n = ivf_append(spark, path, extra)
    assert n == extra.count() and n > 0

    q = _query_df(spark, emb)
    got = [
        r["vec_id"]
        for r in ivf_topk_persisted(spark, path, q, k=10, nprobe=8).collect()
    ]
    exact = [r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()]
    assert got == exact

    with open(os.path.join(path, "centroids.json")) as fh:
        meta = json.load(fh)
    assert meta["appended_rows"] == n


def test_ivf_append_reuses_existing_cells(spark, tmp_path):
    """Appends go into the existing cell partition dirs under the
    frozen centroids — no new cells appear, so partition pruning and
    probe cost are unchanged after ingestion."""
    from hybrid_cdc_demo_spark.operators.similarity import (
        ivf_append,
        ivf_read,
        ivf_write,
    )

    emb = load_table(spark, SF, "embeddings")
    base = emb.filter(F.col("vec_id") < 400)
    extra = emb.filter(F.col("vec_id") >= 400)
    path = str(tmp_path / "ivf_app2")
    ivf_write(base, path, num_cells=8, seed=42)
    cells_before = {
        d for d in os.listdir(os.path.join(path, "data")) if d.startswith("_cell=")
    }
    ivf_append(spark, path, extra)
    cells_after = {
        d for d in os.listdir(os.path.join(path, "data")) if d.startswith("_cell=")
    }
    assert cells_after.issubset(cells_before)
    indexed, _, _ = ivf_read(spark, path)
    assert indexed.count() == emb.count()


def test_sq8_index_recall_and_codes(spark, tmp_path):
    """SQ8 IVF: codes are genuinely tinyint (the 4x scan-shrink), the
    full-probe quantized top-k matches brute force exactly after the
    full-precision re-rank, and a narrower probe keeps recall >= 0.9."""
    from hybrid_cdc_demo_spark.operators.similarity import (
        ivf_topk_sq8,
        ivf_write_sq8,
    )

    emb = load_table(spark, SF, "embeddings")
    path = str(tmp_path / "sq8")
    ivf_write_sq8(emb, path, num_cells=8, seed=42)

    data = spark.read.parquet(os.path.join(path, "data"))
    assert dict(data.dtypes)["_codes"] == "array<tinyint>"
    assert data.count() == emb.count()
    # codes bounded to int8 range
    mn, mx = data.select(
        F.min(F.array_min("_codes")), F.max(F.array_max("_codes"))
    ).first()
    assert -127 <= mn <= mx <= 127

    qdf = _query_df(spark, emb)
    exact = [r["vec_id"] for r in brute_force_topk(emb, qdf, k=10).collect()]
    full_probe = [
        r["vec_id"]
        for r in ivf_topk_sq8(spark, path, qdf, k=10, nprobe=8).collect()
    ]
    assert full_probe == exact  # re-rank on floats restores exactness
    # the synthetic embeddings are isotropic — the adversarial case for
    # cell probing (see test_persisted_recall_vs_brute_force); at every
    # narrower probe the quantized path must return EXACTLY what the
    # full-precision index returns (quantization + float re-rank loses
    # nothing; any loss is the cell probe's, not the codes')
    full_path = str(tmp_path / "fullprec")
    ivf_write(emb, full_path, num_cells=8, seed=42)
    for nprobe in (4, 6):
        sq8 = [
            r["vec_id"]
            for r in ivf_topk_sq8(
                spark, path, qdf, k=10, nprobe=nprobe
            ).collect()
        ]
        fullprec = [
            r["vec_id"]
            for r in ivf_topk_persisted(
                spark, full_path, qdf, k=10, nprobe=nprobe
            ).collect()
        ]
        assert sq8 == fullprec, (nprobe, sq8, fullprec)


def test_sq8_zero_vector_is_safe(spark, tmp_path):
    """All-zero vectors quantize to zero codes (no division blowup)."""
    from hybrid_cdc_demo_spark.operators.similarity import sq8_columns

    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
        "vec_id int, embedding array<double>",
    )
    scale, codes = sq8_columns(F.col("embedding"))
    rows = {
        r["vec_id"]: r
        for r in df.select(
            "vec_id", scale.alias("s"), codes.alias("c")
        ).collect()
    }
    assert rows[1]["s"] == 0.0 and rows[1]["c"] == [0, 0, 0]
    assert rows[2]["c"] == [64, -127, 32]
