"""Streaming maintenance of a persisted IVF ANN index.

The batch side builds/probes the inverted file (operators/similarity.py:
ivf_write / ivf_append / ivf_topk_persisted); this sink keeps the same
index fresh from a *stream* of embedding rows inside ``foreachBatch`` —
the shape a production vector store runs: documents flow through the
CDC/curation pipeline, embeddings land in a stream, and the ANN index
ingests them continuously with bounded per-batch cost.

Layout: ``path/data/_batch=<id>/_cell=<k>/...`` — the extra ``_batch``
partition level makes each batch's write target ITS OWN partitions, so
replaying a batch (restart, at-least-once source) dynamically
overwrites only those partitions instead of duplicating rows:
exactly-once ingestion without a transaction log. ``_cell`` stays the
second level, so the probe's ``_cell IN (...)`` filter still
partition-prunes the scan.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from hybrid_cdc_demo_spark.operators.similarity import (
    _as_double_array,
    cell_assign_expr,
    ivf_index,
    ivf_topk_persisted,
    nested_double_lit,
)
from hybrid_cdc_demo_spark.streaming.sinks import BatchLedger


class VectorIndexSink:
    """foreachBatch sink that maintains a persisted IVF index.

    First committed batch trains the coarse quantizer (one Lloyd step,
    operators.similarity.ivf_index) and freezes the centroids; every
    later batch is assigned to those frozen centroids and written into
    its own ``_batch`` partition — O(batch) per trigger, never an
    O(index) rebuild. Queries via :meth:`topk` (or
    ``ivf_topk_persisted`` directly) see each batch as soon as it
    commits. A ledger short-circuits replayed batch ids; even inside
    the crash window the dynamic partition overwrite keeps the DATA
    exactly-once (the sidecar row counter may over-count by one crash
    replay — cosmetic, documented).
    """

    def __init__(
        self,
        spark,
        path: str,
        num_cells: int = 16,
        seed: int = 42,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ):
        self.spark = spark
        self.path = path
        self.num_cells = num_cells
        self.seed = seed
        self.id_col = id_col
        self.vec_col = vec_col
        os.makedirs(path, exist_ok=True)
        self.ledger = BatchLedger(os.path.join(path, "_ledger"))

    # -- sidecar ----------------------------------------------------------
    @property
    def _meta_path(self) -> str:
        return os.path.join(self.path, "centroids.json")

    def _read_meta(self) -> dict | None:
        if not os.path.exists(self._meta_path):
            return None
        with open(self._meta_path) as fh:
            return json.load(fh)

    def _write_meta(self, meta: dict) -> None:
        tmp = os.path.join(self.path, ".centroids.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, self._meta_path)

    # -- foreachBatch entry ------------------------------------------------
    def write_batch(self, batch: DataFrame, batch_id: int) -> int:
        if self.ledger.is_committed(batch_id):
            return 0
        meta = self._read_meta()
        if meta is None:
            # first batch trains the quantizer; rows are then written
            # through the same batch-partitioned path as every other
            # batch (never ivf_write's unversioned layout)
            _, centers = ivf_index(
                batch, self.id_col, self.vec_col, self.num_cells, self.seed
            )
            meta = {
                "id_col": self.id_col,
                "num_cells": self.num_cells,
                "seed": self.seed,
                "centers": centers,
                "indexed_rows": 0,
            }
        data = batch.select(
            F.col(self.id_col), _as_double_array(self.vec_col).alias("_v")
        )
        assigned = (
            data.withColumn("_cell", cell_assign_expr(meta["centers"]))
            .withColumn("_batch", F.lit(int(batch_id)))
        )
        n = assigned.count()
        (
            assigned.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch", "_cell")
            .parquet(os.path.join(self.path, "data"))
        )
        meta["indexed_rows"] = int(meta.get("indexed_rows", 0)) + int(n)
        self._write_meta(meta)
        self.ledger.commit(batch_id, {"rows": int(n)})
        return int(n)

    # -- query side --------------------------------------------------------
    def topk(self, query: DataFrame, k: int = 10, nprobe: int = 8) -> DataFrame:
        return ivf_topk_persisted(
            self.spark, self.path, query, k=k, nprobe=nprobe
        )


class PQVectorIndexSink:
    """foreachBatch sink maintaining a persisted IVF-PQ (residual)
    index — the compressed sibling of :class:`VectorIndexSink` for
    corpora where even the inverted file of raw vectors is too large:
    each indexed row is m small codes (+ id), ~dim·8/m× smaller.

    First committed batch trains BOTH models and freezes them: the
    coarse quantizer (one Lloyd step) and the m residual codebooks
    (operators.clustering.pq_train — the joint per-iteration pass).
    Every later batch is assigned + residual-encoded against the
    frozen models and written into its own ``_batch`` partition
    (dynamic partition overwrite → replay-safe, same exactly-once
    argument as the raw sink). ``_cell`` stays a partition level, so
    probes partition-prune to the probed cells' code files.

    Frozen-codebook drift is the standard production trade-off (FAISS
    indexes do the same); retrain = build a new index and swap paths.
    """

    def __init__(
        self,
        spark,
        path: str,
        dim: int,
        num_cells: int = 16,
        m: int = 4,
        k_codes: int = 8,
        seed: int = 42,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        train_partitions: int | None = None,
    ):
        self.spark = spark
        self.path = path
        self.dim = dim
        self.num_cells = num_cells
        self.m = m
        self.k_codes = k_codes
        self.seed = seed
        self.id_col = id_col
        self.vec_col = vec_col
        self.train_partitions = train_partitions
        os.makedirs(path, exist_ok=True)
        self.ledger = BatchLedger(os.path.join(path, "_ledger"))

    @property
    def _meta_path(self) -> str:
        return os.path.join(self.path, "index.json")

    def _read_meta(self) -> dict | None:
        if not os.path.exists(self._meta_path):
            return None
        with open(self._meta_path) as fh:
            return json.load(fh)

    def _write_meta(self, meta: dict) -> None:
        tmp = os.path.join(self.path, ".index.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, self._meta_path)

    def write_batch(self, batch: DataFrame, batch_id: int) -> int:
        from hybrid_cdc_demo_spark.operators.clustering import (
            assign_expr_with_ids,
            pq_train,
        )

        if self.ledger.is_committed(batch_id):
            return 0
        meta = self._read_meta()
        if meta is None:
            indexed, centers = ivf_index(
                batch, self.id_col, self.vec_col, self.num_cells,
                self.seed, partitions=self.train_partitions,
            )
            centers_lit = nested_double_lit(centers)
            rdf = indexed.withColumn(
                "_r",
                F.zip_with(
                    "_v",
                    F.element_at(centers_lit, F.col("_cell") + 1),
                    lambda a, b: a - b,
                ),
            )
            books = pq_train(
                rdf, self.dim, m=self.m, k=self.k_codes,
                id_col=self.id_col, vec_col="_r",
                partitions=self.train_partitions,
            )
            meta = {
                "id_col": self.id_col,
                "dim": self.dim,
                "num_cells": self.num_cells,
                "m": self.m,
                "k_codes": self.k_codes,
                "seed": self.seed,
                "centers": centers,
                "books": [[c, i] for c, i in books],
                "indexed_rows": 0,
            }
        centers = meta["centers"]
        books = [(c, i) for c, i in meta["books"]]
        sub = self.dim // self.m
        centers_lit = nested_double_lit(centers)
        data = batch.select(
            F.col(self.id_col), _as_double_array(self.vec_col).alias("_v")
        ).withColumn("_cell", cell_assign_expr(centers))
        rdf = data.withColumn(
            "_r",
            F.zip_with(
                "_v",
                F.element_at(centers_lit, F.col("_cell") + 1),
                lambda a, b: a - b,
            ),
        )
        enc = rdf.select(
            F.col(self.id_col),
            "_cell",
            *[
                assign_expr_with_ids(
                    cs, ids, F.slice("_r", s * sub + 1, sub)
                ).cast("int").alias(f"c{s + 1}")
                for s, (cs, ids) in enumerate(books)
            ],
        ).withColumn("_batch", F.lit(int(batch_id)))
        n = enc.count()
        (
            enc.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch", "_cell")
            .parquet(os.path.join(self.path, "data"))
        )
        meta["indexed_rows"] = int(meta.get("indexed_rows", 0)) + int(n)
        self._write_meta(meta)
        self.ledger.commit(batch_id, {"rows": int(n)})
        return int(n)

    def topk(self, query: list[float], topk: int = 10, nprobe: int = 4) -> DataFrame:
        from hybrid_cdc_demo_spark.operators.clustering import (
            ivfpq_topk_persisted,
        )

        return ivfpq_topk_persisted(
            self.spark, self.path, query, topk=topk, nprobe=nprobe
        )
