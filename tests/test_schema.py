"""Schema transformer round-trip + SchemaTools DDL (SchemaToolsTest port)."""

import pytest
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from flink_big_query_connector_spark.schema import (
    SchemaTools,
    bq_schema_to_struct_type,
    struct_type_to_bq_schema,
)

BQ_SCHEMA = {
    "fields": [
        {"name": "id", "type": "INT64", "mode": "REQUIRED"},
        {"name": "name", "type": "STRING"},  # null mode -> NULLABLE
        {"name": "tags", "type": "STRING", "mode": "REPEATED"},
        {"name": "amount", "type": "NUMERIC", "mode": "NULLABLE"},
        {"name": "created", "type": "TIMESTAMP", "mode": "NULLABLE"},
        {"name": "when_local", "type": "DATETIME", "mode": "NULLABLE"},
        {
            "name": "address",
            "type": "STRUCT",
            "mode": "NULLABLE",
            "fields": [
                {"name": "city", "type": "STRING", "mode": "NULLABLE"},
                {"name": "zips", "type": "INT64", "mode": "REPEATED"},
            ],
        },
    ]
}


def test_bq_to_spark_types_and_modes():
    st = bq_schema_to_struct_type(BQ_SCHEMA)
    by_name = {f.name: f for f in st.fields}
    assert isinstance(by_name["id"].dataType, LongType)
    assert not by_name["id"].nullable  # REQUIRED
    assert by_name["name"].nullable  # null mode defaults NULLABLE
    assert isinstance(by_name["tags"].dataType, ArrayType)  # REPEATED
    assert by_name["amount"].dataType.simpleString() == "decimal(38,9)"
    assert by_name["created"].dataType.simpleString() == "timestamp"
    assert by_name["when_local"].dataType.simpleString() == "timestamp_ntz"
    addr = by_name["address"].dataType
    assert isinstance(addr, StructType)
    assert isinstance(addr["zips"].dataType, ArrayType)


def test_round_trip():
    st = bq_schema_to_struct_type(BQ_SCHEMA)
    back = struct_type_to_bq_schema(st)
    assert bq_schema_to_struct_type(back) == st


def test_unsupported_type_raises():
    with pytest.raises(ValueError):
        bq_schema_to_struct_type({"fields": [{"name": "x", "type": "WAT"}]})


def test_bignumeric_carries_values_at_or_above_one(spark):
    """BIGNUMERIC must hold |x| >= 1: a (38,38) mapping has zero integer
    digits and nulls/overflows any such value; (38,19) keeps 19 on each
    side of the point."""
    import decimal

    st = bq_schema_to_struct_type(
        {"fields": [{"name": "big", "type": "BIGNUMERIC"}]}
    )
    assert st["big"].dataType.simpleString() == "decimal(38,19)"
    v = decimal.Decimal("1234567890123456789.0123456789012345678")
    df = spark.createDataFrame([(v,)], st)
    [row] = df.collect()
    assert row["big"] == v  # no overflow-to-null, no precision loss
    # round-trip: a wide decimal maps back to BIGNUMERIC, narrow to NUMERIC
    back = struct_type_to_bq_schema(st)
    assert back["fields"][0]["type"] == "BIGNUMERIC"
    from pyspark.sql.types import DecimalType

    narrow = StructType([StructField("n", DecimalType(38, 9))])
    assert struct_type_to_bq_schema(narrow)["fields"][0]["type"] == "NUMERIC"
    wide_int = StructType([StructField("n", DecimalType(38, 0))])
    # 38 integer digits exceed NUMERIC's 29 -> BIGNUMERIC
    assert struct_type_to_bq_schema(wide_int)["fields"][0]["type"] == "BIGNUMERIC"


def test_schema_tools_update_table(spark, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS st_test")
    tools = SchemaTools(spark)
    name = "st_test.evolve"
    tools.drop_table(name)
    tools.create_table(
        name,
        StructType(
            [
                StructField("a", LongType()),
                StructField("b", StringType()),
                StructField("old", StringType()),
            ]
        ),
        location=str(tmp_path / "evolve"),
    )
    assert tools.exists(name)
    desired = StructType(
        [
            StructField("a", LongType()),
            StructField("b", StringType()),
            StructField("c_new", LongType()),
        ]
    )
    diff = tools.update_table(name, desired)
    assert diff == {"added": ["c_new"], "dropped": ["old"]}
    live = {f.name for f in tools.get_table_schema(name).fields}
    assert live == {"a", "b", "c_new"}
    # no-op when schemas already match (reference asserts no RPC issued)
    assert tools.update_table(name, desired) == {"added": [], "dropped": []}
    tools.drop_table(name)


def test_schema_tools_update_view(spark):
    tools = SchemaTools(spark)
    spark.sql("CREATE DATABASE IF NOT EXISTS st_test")
    spark.sql("DROP TABLE IF EXISTS st_test.vt_src")
    spark.range(5).write.saveAsTable("st_test.vt_src")
    tools.update_view("st_test.v1", "SELECT id FROM st_test.vt_src WHERE id < 3")
    assert spark.table("st_test.v1").count() == 3
    tools.update_view("st_test.v1", "SELECT id FROM st_test.vt_src")
    assert spark.table("st_test.v1").count() == 5
    spark.sql("DROP VIEW st_test.v1")
    spark.sql("DROP TABLE st_test.vt_src")
