"""Schema registry, diff, and compatibility — semantics of reference
src/models/schema.py (SchemaVersion 116-143, TableSchema 298-317,
ColumnDef 25-42, change detection 235-280/319-391, compat 62-102) and
src/transform/schema_mapper.py (type maps 57-83, unsupported 154-179).

Driver-side pure logic (no Spark primitives needed): schemas are small
metadata; the *data* never flows through this module. The registry
persists as parquet so it is visible to every executor-side reader via
a normal broadcast-join if ever needed.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import types as ST


class ChangeType(str, Enum):
    ADD_COLUMN = "ADD_COLUMN"
    DROP_COLUMN = "DROP_COLUMN"
    ALTER_TYPE = "ALTER_TYPE"


#: Widening conversions allowed by the reference (schema.py:62-102).
COMPATIBLE_ALTERS: set[tuple[str, str]] = {
    ("int", "bigint"),
    ("float", "double"),
    ("decimal", "double"),
    ("text", "varchar"),
    ("varchar", "text"),
}

#: CQL → Spark type mapping (SURVEY §1.3; schema_mapper.py:57-83).
CQL_TO_SPARK: dict[str, ST.DataType] = {
    "uuid": ST.StringType(),
    "text": ST.StringType(),
    "varchar": ST.StringType(),
    "ascii": ST.StringType(),
    "int": ST.IntegerType(),
    "smallint": ST.ShortType(),
    "tinyint": ST.ByteType(),
    "bigint": ST.LongType(),
    "varint": ST.LongType(),
    "float": ST.FloatType(),
    "double": ST.DoubleType(),
    "decimal": ST.DecimalType(18, 2),
    "boolean": ST.BooleanType(),
    "timestamp": ST.TimestampType(),
    "date": ST.DateType(),
    "time": ST.StringType(),
    "blob": ST.BinaryType(),
    "inet": ST.StringType(),
}

#: Unsupported prefixes → DLQ (schema_mapper.py:154-179;
#: config/schema-mappings.yaml:101-106 strategy "dlq").
UNSUPPORTED_PREFIXES = ("frozen<", "tuple<", "counter")


def cql_to_spark(cql_type: str) -> ST.DataType:
    t = cql_type.strip().lower()
    if t.startswith(UNSUPPORTED_PREFIXES):
        raise UnsupportedTypeError(cql_type)
    if t.startswith("map<"):
        return ST.MapType(ST.StringType(), ST.StringType())
    if t.startswith(("list<", "set<")):
        inner = t[t.index("<") + 1 : t.rindex(">")]
        return ST.ArrayType(cql_to_spark(inner))
    if t.startswith("decimal"):
        return ST.DecimalType(18, 2)
    if t in CQL_TO_SPARK:
        return CQL_TO_SPARK[t]
    # unknown types degrade to text, matching the reference default
    return ST.StringType()


class UnsupportedTypeError(Exception):
    """Raised for FROZEN</TUPLE</COUNTER — route the event to DLQ."""


class SchemaValidationError(Exception):
    """Raised when a registered partition key is missing from an event."""


@dataclass(frozen=True)
class SchemaChange:
    change_type: ChangeType
    column_name: str
    old_type: str | None = None
    new_type: str | None = None

    def is_compatible(self) -> bool:
        """ADD/DROP always compatible; ALTER only for the widening set
        (schema.py:62-102)."""
        if self.change_type in (ChangeType.ADD_COLUMN, ChangeType.DROP_COLUMN):
            return True
        old = (self.old_type or "").lower().split("(")[0]
        new = (self.new_type or "").lower().split("(")[0]
        return old == new or (old, new) in COMPATIBLE_ALTERS


@dataclass
class TableSchema:
    keyspace: str
    table: str
    columns: dict[str, str]  # name -> cql type
    partition_keys: list[str] = field(default_factory=list)
    clustering_keys: list[str] = field(default_factory=list)
    version: int = 1

    def compare(self, other: TableSchema) -> list[SchemaChange]:
        """Diff self (old) → other (new), as ADD/DROP/ALTER changes
        (schema.py:319-391)."""
        changes: list[SchemaChange] = []
        for name, typ in other.columns.items():
            if name not in self.columns:
                changes.append(SchemaChange(ChangeType.ADD_COLUMN, name, None, typ))
            elif self.columns[name].lower() != typ.lower():
                changes.append(
                    SchemaChange(ChangeType.ALTER_TYPE, name, self.columns[name], typ)
                )
        for name, typ in self.columns.items():
            if name not in other.columns:
                changes.append(SchemaChange(ChangeType.DROP_COLUMN, name, typ, None))
        return changes

    def is_compatible_with(self, other: TableSchema) -> bool:
        """Key changes are always incompatible (schema.py:331-356);
        otherwise every individual change must be compatible."""
        if (
            self.partition_keys != other.partition_keys
            or self.clustering_keys != other.clustering_keys
        ):
            return False
        return all(c.is_compatible() for c in self.compare(other))

    def get_hash(self) -> str:
        """SHA-256 of the sorted-JSON schema (schema.py:412-435)."""
        payload = json.dumps(
            {
                "keyspace": self.keyspace,
                "table": self.table,
                "columns": dict(sorted(self.columns.items())),
                "partition_keys": self.partition_keys,
                "clustering_keys": self.clustering_keys,
            },
            sort_keys=True,
        )
        return hashlib.sha256(payload.encode()).hexdigest()

    def to_struct(self) -> ST.StructType:
        """Typed Spark schema for the payload view
        (from_json(columns, to_struct()))."""
        return ST.StructType(
            [ST.StructField(n, cql_to_spark(t), True) for n, t in self.columns.items()]
        )


class SchemaRegistry:
    """Versioned per-table schema registry.

    Mirrors the validator's discovery behavior
    (src/transform/validator.py:66-106): unknown tables are allowed
    (schema discovered from traffic), registered tables validate
    partition keys and classify evolution.
    """

    def __init__(self):
        self._versions: dict[tuple[str, str], list[TableSchema]] = {}

    def register(self, schema: TableSchema) -> list[SchemaChange]:
        key = (schema.keyspace, schema.table)
        history = self._versions.setdefault(key, [])
        changes: list[SchemaChange] = []
        if history:
            prev = history[-1]
            if prev.get_hash() == schema.get_hash():
                return []
            changes = prev.compare(schema)
            schema.version = prev.version + 1
        history.append(schema)
        return changes

    def latest(self, keyspace: str, table: str) -> TableSchema | None:
        history = self._versions.get((keyspace, table))
        return history[-1] if history else None

    def validate_event_keys(
        self, keyspace: str, table: str, partition_key: dict
    ) -> None:
        """Partition-key presence check (validator.py:66-106); no
        schema registered yet → allow (discovery mode)."""
        schema = self.latest(keyspace, table)
        if schema is None:
            return
        missing = [k for k in schema.partition_keys if k not in partition_key]
        if missing:
            raise SchemaValidationError(
                f"{keyspace}.{table}: missing partition keys {missing}"
            )


# --- typed payload views (O10) ----------------------------------------------


def typed_view(batch, schema: TableSchema):
    """Envelope rows → typed per-table view: payload JSON parsed
    against the registered schema (from_json) with per-column
    ``try_cast`` semantics — a value that can't take its declared type
    becomes NULL and the row is flagged in ``type_mismatches``
    (reference validate_column_type/validate_event_types,
    src/transform/validator.py:156-227, which returns a mismatch list
    instead of failing)."""
    import pyspark.sql.functions as F

    raw = F.from_json("columns", ST.MapType(ST.StringType(), ST.StringType()))
    typed_cols = []
    mismatch_flags = []
    for name, cql in schema.columns.items():
        spark_t = cql_to_spark(cql)
        raw_val = raw[name]
        typed = F.try_to_timestamp(raw_val) if isinstance(
            spark_t, ST.TimestampType
        ) else raw_val.try_cast(spark_t)
        typed_cols.append(typed.alias(name))
        mismatch_flags.append(
            F.when(raw_val.isNotNull() & typed.isNull(), F.lit(name))
        )
    return batch.select(
        "event_id",
        "event_type",
        "timestamp_micros",
        *typed_cols,
        F.array_compact(F.array(*mismatch_flags)).alias("type_mismatches"),
    )


# --- evolution supervisor (SURVEY §7.3.2) -----------------------------------

SPARK_TO_CQL = {
    "string": "text",
    "long": "bigint",
    "bigint": "bigint",
    "int": "int",
    "integer": "int",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "timestamp": "timestamp",
    "date": "date",
    "binary": "blob",
}

_NUMERIC_CQL = {
    "int", "bigint", "smallint", "tinyint", "varint", "float", "double",
    "decimal", "counter",
}


def _json_class(cql: str) -> str:
    """JSON serialization class of a CQL type: what schema inference
    can actually observe about it."""
    t = cql.strip().lower().split("(")[0].split("<")[0]
    if t in _NUMERIC_CQL:
        return "number"
    if t == "boolean":
        return "boolean"
    return "string"


class SchemaEvolutionSupervisor:
    """Detect payload drift in a micro-batch and evolve the registry.

    The streaming frame schema never changes (payload stays a JSON
    string), so ADD/widening evolution needs NO query restart — only
    the registry version moves and typed views pick up the new
    column. Incompatible changes (narrowing ALTER, partition-key
    change — schema.py:62-102/331-356) are reported so the pipeline
    can divert that table's events to the DLQ, matching reference
    semantics.
    """

    def __init__(self, registry: SchemaRegistry):
        self.registry = registry
        self.audit: list[dict] = []

    #: drifted payload rows sampled per observation — bounds driver
    #: work; rows the sample misses re-trigger the probe next batch
    sample_size: int = 256

    def observe_batch(self, batch, keyspace: str, table: str) -> dict:
        """Reconcile the payload schema present in ``batch`` with the
        registry. Sampling is limited to rows that actually carry
        unknown columns (≤ sample_size), collected once and classified
        driver-side — full distributed JSON schema inference would
        cost seconds per observation for information a handful of
        rows already carries."""
        import pyspark.sql.functions as F

        current = self.registry.latest(keyspace, table)
        payloads = batch.filter("columns IS NOT NULL AND columns != '{}'")
        sample = []
        if current is not None:
            known = F.array(*[F.lit(c) for c in current.columns])
            drifted = payloads.filter(
                F.size(F.array_except(F.json_object_keys("columns"), known)) > 0
            )
            sample = drifted.select("columns").limit(self.sample_size).collect()
        if not sample:
            # no unknown-column rows: drift (if any) is a class change
            # on a KNOWN column — sample generally to see it
            sample = payloads.select("columns").limit(self.sample_size).collect()
        observed_cols: dict[str, str] = {}
        for row in sample:
            try:
                obj = json.loads(row[0])
            except (TypeError, ValueError):
                continue
            if not isinstance(obj, dict):
                continue
            for k, v in obj.items():
                if v is None:
                    continue
                if isinstance(v, bool):
                    cls = "boolean"
                elif isinstance(v, int):
                    cls = "bigint"
                elif isinstance(v, float):
                    cls = "double"
                else:
                    cls = "text"
                prev = observed_cols.get(k)
                if prev is None or (prev == "bigint" and cls == "double"):
                    observed_cols[k] = cls
                elif prev != cls and "text" in (prev, cls) and prev != "text":
                    observed_cols[k] = "text"
        if not observed_cols:
            return {"action": "noop", "changes": []}
        if current is None:
            discovered = TableSchema(keyspace, table, observed_cols)
            self.registry.register(discovered)
            return {"action": "discovered", "changes": []}
        # union semantics: absent columns are not DROPs (an event may
        # simply not set every column); only ADD/ALTER are observed.
        # JSON inference sees serialization classes, not CQL types —
        # a timestamp arrives as a JSON string, an int as a JSON
        # number — so only an IRRECONCILABLE class change (number →
        # string etc.) is a real ALTER; same-class observations keep
        # the registered (more precise) type.
        merged = dict(current.columns)
        changes: list[SchemaChange] = []
        for name, cql in observed_cols.items():
            if name not in merged:
                changes.append(SchemaChange(ChangeType.ADD_COLUMN, name, None, cql))
                merged[name] = cql
            elif _json_class(merged[name]) != _json_class(cql):
                changes.append(
                    SchemaChange(ChangeType.ALTER_TYPE, name, merged[name], cql)
                )
                merged[name] = cql
        if not changes:
            return {"action": "noop", "changes": []}
        if not all(c.is_compatible() for c in changes):
            entry = {"action": "incompatible", "changes": changes}
            self.audit.append(entry)
            return entry
        evolved = TableSchema(
            keyspace,
            table,
            merged,
            list(current.partition_keys),
            list(current.clustering_keys),
        )
        self.registry.register(evolved)
        entry = {
            "action": "evolved",
            "changes": changes,
            "version": self.registry.latest(keyspace, table).version,
        }
        self.audit.append(entry)
        return entry


# --- registry persistence ----------------------------------------------------


def save_registry(registry: SchemaRegistry, path: str) -> None:
    """Persist every schema version as JSONL keyed
    (keyspace, table, version) — the durable registry table of
    SURVEY §1.1 (small metadata; parquet/Delta in production)."""
    from pathlib import Path as _P

    rows = []
    for (ks, tbl), history in registry._versions.items():
        for s in history:
            rows.append(
                {
                    "keyspace": ks,
                    "table": tbl,
                    "version": s.version,
                    "columns": s.columns,
                    "partition_keys": s.partition_keys,
                    "clustering_keys": s.clustering_keys,
                    "schema_hash": s.get_hash(),
                }
            )
    p = _P(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    tmp = p.with_suffix(".tmp")
    tmp.write_text("\n".join(json.dumps(r) for r in rows))
    tmp.replace(p)


def load_registry(path: str) -> SchemaRegistry:
    from pathlib import Path as _P

    reg = SchemaRegistry()
    text = _P(path).read_text()
    for line in text.splitlines():
        if not line.strip():
            continue
        r = json.loads(line)
        s = TableSchema(
            r["keyspace"],
            r["table"],
            r["columns"],
            r["partition_keys"],
            r["clustering_keys"],
            version=r["version"],
        )
        key = (s.keyspace, s.table)
        reg._versions.setdefault(key, []).append(s)
    for history in reg._versions.values():
        history.sort(key=lambda s: s.version)
    return reg
