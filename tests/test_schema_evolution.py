"""Schema diff/compat semantics (reference src/models/schema.py:62-102,
235-280, 319-391; B5 fixtures in FIXTURES.md)."""

import pytest

from hybrid_cdc_demo_spark.schema.evolution import (
    ChangeType,
    SchemaChange,
    SchemaRegistry,
    SchemaValidationError,
    TableSchema,
    UnsupportedTypeError,
    cql_to_spark,
)
from pyspark.sql import types as ST


def users_v1():
    return TableSchema(
        keyspace="ecommerce",
        table="users",
        columns={
            "user_id": "uuid",
            "email": "text",
            "phone": "text",
            "first_name": "text",
            "last_name": "text",
            "age": "int",
            "created_at": "timestamp",
        },
        partition_keys=["user_id"],
    )


def test_diff_add_drop_alter():
    v1 = users_v1()
    v2 = TableSchema(
        keyspace="ecommerce",
        table="users",
        columns={**v1.columns, "city": "text"},
        partition_keys=["user_id"],
    )
    changes = v1.compare(v2)
    assert changes == [SchemaChange(ChangeType.ADD_COLUMN, "city", None, "text")]

    v3 = TableSchema(
        keyspace="ecommerce",
        table="users",
        columns={**v2.columns, "age": "bigint"},
        partition_keys=["user_id"],
    )
    changes = v2.compare(v3)
    assert changes == [SchemaChange(ChangeType.ALTER_TYPE, "age", "int", "bigint")]

    dropped = dict(v1.columns)
    dropped.pop("phone")
    v4 = TableSchema("ecommerce", "users", dropped, ["user_id"])
    assert (
        SchemaChange(ChangeType.DROP_COLUMN, "phone", "text", None)
        in v1.compare(v4)
    )


def test_compat_rules():
    # widening ok (schema.py:94-100)
    assert SchemaChange(ChangeType.ALTER_TYPE, "a", "int", "bigint").is_compatible()
    assert SchemaChange(ChangeType.ALTER_TYPE, "a", "float", "double").is_compatible()
    assert SchemaChange(ChangeType.ALTER_TYPE, "a", "decimal", "double").is_compatible()
    assert SchemaChange(ChangeType.ALTER_TYPE, "a", "text", "varchar").is_compatible()
    assert SchemaChange(ChangeType.ALTER_TYPE, "a", "varchar", "text").is_compatible()
    # narrowing / unrelated not ok
    assert not SchemaChange(ChangeType.ALTER_TYPE, "a", "bigint", "int").is_compatible()
    assert not SchemaChange(ChangeType.ALTER_TYPE, "a", "int", "text").is_compatible()
    # ADD/DROP always ok (schema.py:86-92)
    assert SchemaChange(ChangeType.ADD_COLUMN, "a", None, "text").is_compatible()
    assert SchemaChange(ChangeType.DROP_COLUMN, "a", "text", None).is_compatible()


def test_key_changes_incompatible():
    v1 = users_v1()
    rekeyed = TableSchema(
        "ecommerce", "users", dict(v1.columns), partition_keys=["email"]
    )
    assert not v1.is_compatible_with(rekeyed)  # schema.py:331-356
    widened = TableSchema(
        "ecommerce",
        "users",
        {**v1.columns, "age": "bigint"},
        partition_keys=["user_id"],
    )
    assert v1.is_compatible_with(widened)


def test_schema_hash_stability():
    a, b = users_v1(), users_v1()
    assert a.get_hash() == b.get_hash()
    b.columns["extra"] = "text"
    assert a.get_hash() != b.get_hash()


def test_registry_versions_and_validation():
    reg = SchemaRegistry()
    assert reg.register(users_v1()) == []
    # unknown table → discovery mode, allowed (validator.py:78-85)
    reg.validate_event_keys("ecommerce", "unknown_table", {})
    # registered table enforces partition keys (validator.py:66-106)
    reg.validate_event_keys("ecommerce", "users", {"user_id": "u1"})
    with pytest.raises(SchemaValidationError):
        reg.validate_event_keys("ecommerce", "users", {"email": "x"})
    # evolution bumps version
    v2 = TableSchema(
        "ecommerce",
        "users",
        {**users_v1().columns, "city": "text"},
        partition_keys=["user_id"],
    )
    changes = reg.register(v2)
    assert changes and changes[0].change_type is ChangeType.ADD_COLUMN
    assert reg.latest("ecommerce", "users").version == 2


def test_type_mapping():
    # SURVEY §1.3 table
    assert cql_to_spark("uuid") == ST.StringType()
    assert cql_to_spark("int") == ST.IntegerType()
    assert cql_to_spark("bigint") == ST.LongType()
    assert cql_to_spark("double") == ST.DoubleType()
    assert cql_to_spark("decimal") == ST.DecimalType(18, 2)
    assert cql_to_spark("timestamp") == ST.TimestampType()
    assert cql_to_spark("blob") == ST.BinaryType()
    assert cql_to_spark("map<text,text>") == ST.MapType(ST.StringType(), ST.StringType())
    assert cql_to_spark("list<int>") == ST.ArrayType(ST.IntegerType())
    assert cql_to_spark("set<text>") == ST.ArrayType(ST.StringType())
    assert cql_to_spark("wat") == ST.StringType()  # unknown → text default
    for bad in ("frozen<list<int>>", "tuple<int,text>", "counter"):
        with pytest.raises(UnsupportedTypeError):  # → DLQ route
            cql_to_spark(bad)


def test_typed_view_struct():
    struct = users_v1().to_struct()
    assert struct["age"].dataType == ST.IntegerType()
    assert struct["email"].dataType == ST.StringType()
