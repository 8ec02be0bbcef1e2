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
