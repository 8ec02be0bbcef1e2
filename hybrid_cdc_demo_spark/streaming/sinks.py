"""Warehouse sink personalities + exactly-once machinery.

Three personalities mirror the reference's destinations:

* UpsertSink     — Postgres personality (src/sinks/postgres.py:68-146):
                   MERGE-style latest-wins upsert; DELETE removes keys
                   (postgres.py:93-101).
* AppendSink     — ClickHouse personality (src/sinks/clickhouse.py:81-145):
                   append-only; dedup deferred to a ReplacingMergeTree-
                   equivalent read view (row_number latest-wins);
                   DELETE policy skip (parity, clickhouse.py:109-116)
                   or tombstone (upgrade).
* HypertableSink — TimescaleDB personality (src/sinks/timescaledb.py:89-139):
                   upsert + time-bucket partitioned layout
                   (partitionBy(date) ≙ create_hypertable).

Exactly-once (reference postgres.py:137+196-198 single-transaction
data+offset commit, SURVEY §7.3.1): every sink keeps a batch ledger;
``foreachBatch`` replays of an already-committed batchId are skipped,
and the upsert merge itself is idempotent, so source-checkpoint +
ledger + idempotent-merge composes to effective exactly-once without a
transactional store. Snapshots are versioned directories with an
atomic pointer swap (plain parquet, no Delta in this container; on a
real deployment the same class maps 1:1 onto Delta MERGE + txnVersion).
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window


class VersionedParquetTable:
    """A tiny ACID-ish table: versioned parquet snapshots + a pointer
    file updated atomically (os.replace). Enough for single-writer
    streaming sinks; maps onto Delta/Iceberg in production."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = Path(path)
        self.path.mkdir(parents=True, exist_ok=True)

    @property
    def _pointer(self) -> Path:
        return self.path / "_LATEST"

    def current_version(self) -> int:
        if not self._pointer.exists():
            return 0
        return int(self._pointer.read_text().strip() or 0)

    def read(self) -> DataFrame | None:
        v = self.current_version()
        if v == 0:
            return None
        return self.spark.read.parquet(str(self.path / f"v={v}"))

    def write(self, df: DataFrame, partition_by: list[str] | None = None) -> int:
        v = self.current_version() + 1
        tmp = self.path / f".tmp-v={v}"
        final = self.path / f"v={v}"
        if tmp.exists():
            shutil.rmtree(tmp)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(str(tmp))
        if final.exists():
            shutil.rmtree(final)
        os.replace(tmp, final)
        tmp_ptr = self.path / "._LATEST.tmp"
        tmp_ptr.write_text(str(v))
        os.replace(tmp_ptr, self._pointer)
        self._gc(keep=2)
        return v

    def _gc(self, keep: int) -> None:
        v = self.current_version()
        for child in self.path.glob("v=*"):
            try:
                if int(child.name.split("=")[1]) <= v - keep:
                    shutil.rmtree(child)
            except (ValueError, OSError):
                pass


class BatchLedger:
    """Committed-batch registry per sink — the `cdc_offsets` analogue
    (FIXTURES.md §B6; reference scripts/sql/create-offset-table.sql:4-18
    plus our batch_id column). JSON-per-batch files; presence of the
    file == committed (atomic create)."""

    def __init__(self, path: str):
        self.path = Path(path)
        self.path.mkdir(parents=True, exist_ok=True)

    def is_committed(self, batch_id: int) -> bool:
        return (self.path / f"batch-{batch_id:012d}.json").exists()

    def commit(self, batch_id: int, stats: dict) -> None:
        tmp = self.path / f".batch-{batch_id:012d}.tmp"
        tmp.write_text(json.dumps({"batch_id": batch_id, **stats}, default=str))
        os.replace(tmp, self.path / f"batch-{batch_id:012d}.json")

    def committed_batches(self) -> list[dict]:
        out = []
        for p in sorted(self.path.glob("batch-*.json")):
            out.append(json.loads(p.read_text()))
        return out


def latest_per_key(
    df: DataFrame, key_cols: list[str], ts_col: str = "timestamp_micros",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Latest-wins collapse (Q12 semantics; offset monotonicity intent
    of src/cdc/offset.py:76-83 with event_id tiebreak for reorder
    safety, SURVEY §7.3.4)."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc(ts_col), F.desc(tiebreak_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


class UpsertSink:
    """Postgres-personality MERGE sink (O21/O22/O25)."""

    name = "postgres"

    def __init__(self, spark: SparkSession, path: str, key_cols: list[str]):
        self.table = VersionedParquetTable(spark, os.path.join(path, "data"))
        self.ledger = BatchLedger(os.path.join(path, "ledger"))
        self.key_cols = key_cols

    def write_batch(self, batch: DataFrame, batch_id: int) -> int:
        """Idempotent MERGE: union current snapshot with the batch's
        newest row per key, keep the overall latest, drop keys whose
        latest event is a DELETE. Rerunning the same batch is a no-op
        (same inputs → same snapshot), giving exactly-once effect."""
        if self.ledger.is_committed(batch_id):
            return 0
        incoming = latest_per_key(batch, self.key_cols)
        current = self.table.read()
        if current is not None:
            merged = current.unionByName(incoming.select(*current.columns))
            merged = latest_per_key(merged, self.key_cols)
        else:
            merged = incoming
        result = merged.filter(F.col("event_type") != "DELETE")
        n = result.count()
        self.table.write(result)
        self.ledger.commit(
            batch_id,
            {
                "destination": self.name,
                "rows": n,
                "last_event_timestamp_micros": _max_ts(batch),
            },
        )
        return n

    def read(self) -> DataFrame | None:
        return self.table.read()


class AppendSink:
    """ClickHouse-personality append sink (O23/O26): raw append log +
    ReplacingMergeTree-equivalent dedup on read."""

    name = "clickhouse"

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        delete_policy: str = "skip",  # skip = reference parity | tombstone
    ):
        self.spark = spark
        self.path = Path(path)
        self.data_path = self.path / "log"
        self.ledger = BatchLedger(os.path.join(path, "ledger"))
        self.key_cols = key_cols
        assert delete_policy in ("skip", "tombstone")
        self.delete_policy = delete_policy

    def write_batch(self, batch: DataFrame, batch_id: int) -> int:
        if self.ledger.is_committed(batch_id):
            return 0
        if self.delete_policy == "skip":
            # reference parity: DELETEs dropped with a warning
            # (clickhouse.py:109-116) — a documented divergence source
            out = batch.filter(F.col("event_type") != "DELETE")
        else:
            out = batch  # tombstones resolve in the dedup view
        n = out.count()
        (
            out.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(str(self.data_path))
        )
        self.ledger.commit(
            batch_id,
            {
                "destination": self.name,
                "rows": n,
                "last_event_timestamp_micros": _max_ts(batch),
            },
        )
        return n

    def read_raw(self) -> DataFrame:
        return self.spark.read.parquet(str(self.data_path))

    def read(self) -> DataFrame:
        """Deduplicated view = ReplacingMergeTree final state (O23):
        latest row per key; under the tombstone policy a trailing
        DELETE removes the key."""
        deduped = latest_per_key(self.read_raw(), self.key_cols)
        if self.delete_policy == "tombstone":
            deduped = deduped.filter(F.col("event_type") != "DELETE")
        return deduped


class HypertableSink(UpsertSink):
    """TimescaleDB personality (O24): upsert + time-partitioned layout.
    partitionBy(time_bucket) is the hypertable chunking property."""

    name = "timescaledb"

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        time_col: str = "timestamp_micros",
    ):
        super().__init__(spark, path, key_cols)
        self.time_col = time_col

    def write_batch(self, batch: DataFrame, batch_id: int) -> int:
        if self.ledger.is_committed(batch_id):
            return 0
        incoming = latest_per_key(batch, self.key_cols)
        current = self.table.read()
        if current is not None:
            merged = latest_per_key(
                current.drop("_chunk").unionByName(incoming), self.key_cols
            )
        else:
            merged = incoming
        result = merged.filter(F.col("event_type") != "DELETE").withColumn(
            "_chunk",
            F.to_date(F.timestamp_micros(F.col(self.time_col))),
        )
        n = result.count()
        self.table.write(result, partition_by=["_chunk"])
        self.ledger.commit(
            batch_id,
            {
                "destination": self.name,
                "rows": n,
                "last_event_timestamp_micros": _max_ts(batch),
            },
        )
        return n


def _max_ts(batch: DataFrame) -> int | None:
    row = batch.agg(F.max("timestamp_micros").alias("m")).collect()[0]
    return row["m"]


def replication_lag_seconds(ledger: BatchLedger, now_micros: int) -> float:
    """O33: now - last committed event timestamp, floored at 0
    (src/cdc/offset.py:271-290)."""
    batches = ledger.committed_batches()
    if not batches:
        return 0.0
    last = max(b.get("last_event_timestamp_micros") or 0 for b in batches)
    return max((now_micros - last) / 1e6, 0.0)
