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
    assert diff == {"added": ["c_new"], "dropped": ["old"], "updated": []}
    live = {f.name for f in tools.get_table_schema(name).fields}
    assert live == {"a", "b", "c_new"}
    # no-op when schemas already match (reference asserts no RPC issued)
    assert tools.update_table(name, desired) == {
        "added": [],
        "dropped": [],
        "updated": [],
    }
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


def test_update_table_carries_descriptions_and_precision(spark, tmp_path):
    """SchemaToolsTest.java:50-119 attribute parity: added columns carry
    description (-> column COMMENT) and decimal precision/scale through
    the generated DDL; a changed description on a retained column is
    re-patched; equal schemas (any field order) are a full no-op."""
    from pyspark.sql.types import DecimalType

    spark.sql("CREATE DATABASE IF NOT EXISTS st_test")
    tools = SchemaTools(spark)
    name = "st_test.evolve_attrs"
    tools.drop_table(name)
    tools.create_table(
        name,
        StructType([StructField("a", LongType())]),
        location=str(tmp_path / "evolve_attrs"),
    )
    desired = StructType(
        [
            StructField("a", LongType(), metadata={"comment": "key col"}),
            StructField(
                "amount",
                DecimalType(30, 10),
                metadata={"comment": "money's worth"},
            ),
        ]
    )
    diff = tools.update_table(name, desired)
    assert diff == {"added": ["amount"], "dropped": [], "updated": ["a"]}
    live = {f.name: f for f in tools.get_table_schema(name).fields}
    assert isinstance(live["amount"].dataType, DecimalType)
    assert live["amount"].dataType.precision == 30
    assert live["amount"].dataType.scale == 10
    assert live["amount"].metadata.get("comment") == "money's worth"
    assert live["a"].metadata.get("comment") == "key col"
    # equal schemas in a different field order -> no-op (reference
    # shouldDoNothingWhenSchemasAreTheSame)
    reordered = StructType([desired.fields[1], desired.fields[0]])
    assert tools.update_table(name, reordered) == {
        "added": [],
        "dropped": [],
        "updated": [],
    }
    tools.drop_table(name)


def test_bignumeric_full_range_string_carrier(spark):
    """BIGNUMERIC full-range mode: a 76-digit value survives the
    StringType carrier bit-for-bit, and the schema round-trips back to
    BIGNUMERIC (not STRING) via the metadata flag."""
    from flink_big_query_connector_spark.schema.transformer import (
        bq_schema_to_struct_type,
        struct_type_to_bq_schema,
    )

    bq = {
        "fields": [
            {"name": "id", "type": "INT64", "mode": "REQUIRED"},
            {
                "name": "big",
                "type": "BIGNUMERIC",
                "mode": "NULLABLE",
                "description": "full-range decimal",
            },
        ]
    }
    st = bq_schema_to_struct_type(bq, bignumeric_as_string=True)
    assert isinstance(st["big"].dataType, StringType)
    assert st["big"].metadata["bq_type"] == "BIGNUMERIC"
    assert st["big"].metadata["comment"] == "full-range decimal"

    # 76 significant digits: 38 integer + 38 fractional
    big_val = ("9" * 38) + "." + ("8" * 38)
    df = spark.createDataFrame([(1, big_val), (2, None)], st)
    [r1, r2] = sorted(df.collect(), key=lambda r: r["id"])
    assert r1["big"] == big_val  # lossless carrier
    assert r2["big"] is None

    back = struct_type_to_bq_schema(st)
    by_name = {f["name"]: f for f in back["fields"]}
    assert by_name["big"]["type"] == "BIGNUMERIC"
    assert by_name["big"]["description"] == "full-range decimal"
    assert by_name["id"]["mode"] == "REQUIRED"


def test_parameterized_numeric_precision_roundtrip():
    """NUMERIC(P,S) with explicit precision/scale maps to DecimalType(P,S)
    and emits precision/scale back in the patch payload (reference
    fieldsToTableFieldSchema setPrecision/setScale)."""
    from pyspark.sql.types import DecimalType

    from flink_big_query_connector_spark.schema.transformer import (
        bq_schema_to_struct_type,
        struct_type_to_bq_schema,
    )

    bq = {
        "fields": [
            {"name": "n", "type": "NUMERIC", "precision": 20, "scale": 5}
        ]
    }
    st = bq_schema_to_struct_type(bq)
    assert st["n"].dataType == DecimalType(20, 5)
    back = struct_type_to_bq_schema(st)["fields"][0]
    assert (back["type"], back["precision"], back["scale"]) == (
        "NUMERIC", 20, 5,
    )
