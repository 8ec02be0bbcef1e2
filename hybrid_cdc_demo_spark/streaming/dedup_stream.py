"""Streaming near-duplicate detection over a document stream.

The batch side finds near-dups corpus-wide (operators/dedup.py:
minhash_lsh_dedup); this sink runs the same MinHash-LSH machinery
INCREMENTALLY inside ``foreachBatch`` — the shape a production
training-data intake runs: documents arrive continuously, each batch
is checked against everything ingested before it (plus itself), and
the accumulated signature store grows by exactly the batch.

Per trigger:

1. signatures for the new docs (shuffle-free per-row fold,
   operators.dedup.minhash_signatures);
2. banded LSH hashes for the new docs;
3. candidate pairs = new-batch bands ⋈ (store ∪ new-batch) bands on
   (band, band_hash), new side broadcast;
4. estimated Jaccard = matching-signature-slot fraction ≥ threshold
   ⇒ near-dup pair emitted (new_id vs earlier id);
5. band rows + signatures appended under ``_batch=<id>`` partitions.

Exactly-once: every output (bands, signatures, pairs) is written with
dynamic partition overwrite into the batch's OWN ``_batch`` partition,
so an at-least-once replay overwrites rather than duplicates; a
:class:`BatchLedger` short-circuits already-committed batch ids.

Scale posture: steps 1-2 and 5 are O(batch). Step 3 scans the band
store — O(history) per trigger locally; at production scale the store
is written bucketed by ``band_hash`` (DataFrameWriter.bucketBy) so the
probe becomes a bucket-pruned shuffle-free join, or the band→ids map
is held in keyed state via applyInPandasWithState. The verify step
compares SIGNATURES (32-64 longs), never raw text — history text is
not retained at all.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from hybrid_cdc_demo_spark.operators.dedup import (
    band_rows,
    minhash_signatures,
)
from hybrid_cdc_demo_spark.streaming.sinks import BatchLedger


def signature_agreement(sig_a: F.Column, sig_b: F.Column) -> F.Column:
    """Fraction of matching MinHash slots — the unbiased estimator of
    Jaccard similarity (one IEEE division, deterministic)."""
    matches = F.aggregate(
        F.zip_with(sig_a, sig_b, lambda a, b: F.when(a == b, 1).otherwise(0)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return matches.cast("double") / F.size(sig_a).cast("double")


class DedupStreamSink:
    """foreachBatch sink that detects near-duplicates incrementally.

    Emitted pairs are (id_new, id_old, est_jaccard) where ``id_old``
    was ingested in an earlier batch OR is a smaller id in the same
    batch — every pair is emitted exactly once, by the batch that
    completes it.
    """

    def __init__(
        self,
        spark,
        path: str,
        num_hashes: int = 32,
        bands: int = 16,
        shingle_k: int = 3,
        threshold: float = 0.5,
        id_col: str = "doc_id",
        text_col: str = "text",
    ):
        self.spark = spark
        self.path = path
        self.num_hashes = num_hashes
        self.bands = bands
        self.shingle_k = shingle_k
        self.threshold = threshold
        self.id_col = id_col
        self.text_col = text_col
        os.makedirs(path, exist_ok=True)
        self.ledger = BatchLedger(os.path.join(path, "_ledger"))

    def _dir(self, name: str) -> str:
        return os.path.join(self.path, name)

    def _read_store(self, name: str) -> DataFrame | None:
        p = self._dir(name)
        if not os.path.exists(p):
            return None
        try:
            return self.spark.read.parquet(p)
        except Exception:  # empty dir before first commit
            return None

    # -- foreachBatch entry ------------------------------------------------
    def write_batch(self, batch: DataFrame, batch_id: int) -> int:
        if self.ledger.is_committed(batch_id):
            return 0
        sigs = minhash_signatures(
            batch, self.text_col, self.id_col, self.num_hashes, self.shingle_k
        ).persist()
        new_bands = band_rows(sigs, self.bands).persist()

        # candidates: new docs vs history (ANY id ordering — a similar
        # historical doc must be caught whatever its id) plus
        # within-batch pairs (smaller id wins to emit each once). The
        # new side is the small one — broadcast it; history is the big
        # scan (see module docstring for the bucketed layout that
        # prunes this at scale). History excludes this batch's own
        # partition so a crash-replay (stores written, ledger not yet
        # committed) doesn't see the batch as its own history.
        hist_bands = self._read_store("bands")
        probe = new_bands.select(
            F.col("_id").alias("id_new"), "band", "band_hash"
        )
        targets = new_bands.select(
            F.col("_id").alias("id_old"),
            "band",
            "band_hash",
            F.lit(False).alias("is_hist"),
        )
        if hist_bands is not None:
            targets = targets.unionByName(
                hist_bands.filter(F.col("_batch") != int(batch_id)).select(
                    F.col("_id").alias("id_old"),
                    "band",
                    "band_hash",
                    F.lit(True).alias("is_hist"),
                )
            )
        cand = (
            targets.join(F.broadcast(probe), ["band", "band_hash"])
            .filter(
                (F.col("is_hist") & (F.col("id_old") != F.col("id_new")))
                | (~F.col("is_hist") & (F.col("id_old") < F.col("id_new")))
            )
            .select("id_new", "id_old")
            .distinct()
        )

        # verify on signatures (no text retained for history)
        hist_sigs = self._read_store("sigs")
        all_sigs = sigs.select("_id", "signature")
        if hist_sigs is not None:
            all_sigs = all_sigs.unionByName(
                hist_sigs.filter(F.col("_batch") != int(batch_id)).select(
                    "_id", "signature"
                )
            )
        a = all_sigs.select(
            F.col("_id").alias("id_new"), F.col("signature").alias("sig_a")
        )
        b = all_sigs.select(
            F.col("_id").alias("id_old"), F.col("signature").alias("sig_b")
        )
        pairs = (
            cand.join(a, "id_new")
            .join(b, "id_old")
            .select(
                "id_new",
                "id_old",
                signature_agreement(F.col("sig_a"), F.col("sig_b")).alias(
                    "est_jaccard"
                ),
            )
            .filter(F.col("est_jaccard") >= self.threshold)
        )

        # persist + count BEFORE the writes: an empty partitioned write
        # creates no files, so a post-write re-read cannot infer a
        # schema on a zero-pair batch
        pairs = pairs.persist()
        n_pairs = pairs.count()
        bid = F.lit(int(batch_id))
        for name, df in (
            ("pairs", pairs),
            ("bands", new_bands),
            ("sigs", sigs.select("_id", "signature")),
        ):
            (
                df.withColumn("_batch", bid)
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_batch")
                .parquet(self._dir(name))
            )
        pairs.unpersist()
        sigs.unpersist()
        new_bands.unpersist()
        self.ledger.commit(batch_id, {"pairs": int(n_pairs)})
        return int(n_pairs)

    def compact(self) -> None:
        """Fold the per-batch store partitions into one base partition
        (``_batch=-1``): the band store is scanned every trigger, so
        thousands of tiny ``_batch`` partitions would make file
        listing the dominant cost (the same small-file problem the LSM
        sinks solve with background merges). Committed batches are
        replay-proof via the ledger — a replayed id short-circuits
        before the store is read — so folding their partitions is
        safe, and ``-1`` is never a live batch id so the current
        batch's history-exclusion filter keeps working. Driver-side,
        between triggers (not concurrent with write_batch)."""
        import shutil

        for name in ("pairs", "bands", "sigs"):
            df = self._read_store(name)
            if df is None:
                continue
            cols = [c for c in df.columns if c != "_batch"]
            tmp = self._dir(name + "__compacting")
            (
                df.select(*cols)
                .withColumn("_batch", F.lit(-1))
                .write.mode("overwrite")
                .partitionBy("_batch")
                .parquet(tmp)
            )
            final = self._dir(name)
            shutil.rmtree(final, ignore_errors=True)
            os.replace(tmp, final)

    # -- query side --------------------------------------------------------
    def pairs(self) -> DataFrame:
        """All near-dup pairs found so far (id_new, id_old, est_jaccard)."""
        df = self._read_store("pairs")
        if df is None:
            return self.spark.createDataFrame(
                [], "id_new long, id_old long, est_jaccard double"
            )
        return df.select("id_new", "id_old", "est_jaccard")

    def signatures(self) -> DataFrame:
        df = self._read_store("sigs")
        if df is None:
            return self.spark.createDataFrame(
                [], "_id long, signature array<long>"
            )
        return df.select("_id", "signature")
