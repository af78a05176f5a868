"""BigQuery schema <-> Spark StructType conversion.

Port of the reference's ``schema/SchemaTransformer.java:22-81``: the static
type map, the three field modes (NULLABLE / REPEATED / REQUIRED, with null
mode defaulting to NULLABLE), and recursive STRUCT handling.  BigQuery
schemas are represented as plain dicts (the REST/JSON shape):

    {"fields": [{"name": ..., "type": "INT64", "mode": "NULLABLE",
                 "fields": [...]}, ...]}

Type-fidelity notes (SURVEY §1.2): BIGNUMERIC's 76-digit precision
(NUMERIC(76.76, 38)) exceeds Spark's DecimalType(38) — we carry it as
DECIMAL(38,19), splitting the 38 available digits evenly between integer
and fractional parts so both |x|>=1 and fine fractions survive (a (38,38)
mapping has ZERO integer digits and overflows on any |x|>=1); exact
full-range fidelity is available via ``bignumeric_as_string=True`` (a
StringType carrier flagged in field metadata, round-tripped back to
BIGNUMERIC); TIME and GEOGRAPHY have no Spark type and map to
STRING; JSON maps to STRING (VariantType exists on Spark 4 but string keeps
the oracle comparable).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

# BigQuery type -> Spark type (reference SchemaTransformer.java:22-38)
_BQ_TO_SPARK: dict[str, DataType] = {
    "BOOL": BooleanType(),
    "BOOLEAN": BooleanType(),
    "BYTES": BinaryType(),
    "DATE": DateType(),
    "DATETIME": TimestampNTZType(),
    "FLOAT64": DoubleType(),
    "FLOAT": DoubleType(),
    "GEOGRAPHY": StringType(),  # WKT carrier
    "INT64": LongType(),
    "INTEGER": LongType(),
    "NUMERIC": DecimalType(38, 9),
    "BIGNUMERIC": DecimalType(38, 19),  # balanced cap; full range -> STRING
    "JSON": StringType(),
    "STRING": StringType(),
    "TIME": StringType(),  # no Spark TimeType; micros-as-string
    "TIMESTAMP": TimestampType(),
    "INTERVAL": StringType(),
}

_SPARK_TO_BQ: dict[type, str] = {
    BooleanType: "BOOL",
    BinaryType: "BYTES",
    DateType: "DATE",
    TimestampNTZType: "DATETIME",
    DoubleType: "FLOAT64",
    LongType: "INT64",
    StringType: "STRING",
    TimestampType: "TIMESTAMP",
}


def _field_metadata(field: dict, ftype: str, as_string: bool) -> dict:
    """Attribute carry-through (reference ``fieldsToTableFieldSchema``,
    SchemaTools.java:110-135): description -> Spark column comment,
    policy tags and maxLength/precision/scale -> opaque metadata (no
    Spark-side enforcement, catalog pass-through only), plus the
    original BQ type when a StringType carrier would otherwise lose it."""
    md: dict = {}
    if field.get("description") is not None:
        md["comment"] = field["description"]
    if field.get("policyTags") is not None:
        md["policy_tags"] = field["policyTags"]
    if field.get("maxLength") is not None:
        md["max_length"] = int(field["maxLength"])
    if ftype == "BIGNUMERIC" and as_string:
        md["bq_type"] = "BIGNUMERIC"
    return md


def _field_to_spark(field: dict, bignumeric_as_string: bool = False) -> StructField:
    mode = (field.get("mode") or "NULLABLE").upper()  # null -> NULLABLE (:65-67)
    ftype = field["type"].upper()
    if ftype in ("STRUCT", "RECORD"):
        base: DataType = StructType(
            [
                _field_to_spark(f, bignumeric_as_string)
                for f in field.get("fields", [])
            ]
        )
    elif (
        ftype in ("NUMERIC", "BIGNUMERIC")
        and field.get("precision") is not None
        and int(field["precision"]) <= 38
        and not (ftype == "BIGNUMERIC" and bignumeric_as_string)
    ):
        # parameterized NUMERIC(P,S): preserve the declared precision and
        # scale exactly when they fit Spark's 38-digit decimals
        base = DecimalType(
            int(field["precision"]), int(field.get("scale") or 0)
        )
    elif ftype == "BIGNUMERIC" and bignumeric_as_string:
        # Full-range carrier: BIGNUMERIC is NUMERIC(76.76, 38) — beyond
        # DecimalType(38); a decimal string preserves all 76 digits
        # losslessly (flagged in metadata so the reverse transform emits
        # BIGNUMERIC, not STRING).
        base = StringType()
    else:
        if ftype not in _BQ_TO_SPARK:
            raise ValueError(f"unsupported BigQuery type: {ftype}")
        base = _BQ_TO_SPARK[ftype]
    md = _field_metadata(field, ftype, bignumeric_as_string)
    if mode == "REPEATED":
        return StructField(
            field["name"], ArrayType(base), nullable=True, metadata=md
        )
    return StructField(
        field["name"], base, nullable=(mode != "REQUIRED"), metadata=md
    )


def bq_schema_to_struct_type(
    schema: dict, bignumeric_as_string: bool = False
) -> StructType:
    """BigQuery JSON schema -> Spark StructType (recursive).

    ``bignumeric_as_string=True`` selects the exact full-range BIGNUMERIC
    carrier (StringType + ``bq_type`` metadata) instead of the balanced
    DECIMAL(38,19) cap."""
    return StructType(
        [
            _field_to_spark(f, bignumeric_as_string)
            for f in schema.get("fields", [])
        ]
    )


def _spark_to_field(field: StructField) -> dict:
    dtype = field.dataType
    mode = "NULLABLE" if field.nullable else "REQUIRED"
    if isinstance(dtype, ArrayType):
        mode = "REPEATED"
        dtype = dtype.elementType
    out: dict = {"name": field.name, "mode": mode}
    md = field.metadata or {}
    if md.get("comment") is not None:
        out["description"] = md["comment"]
    if md.get("policy_tags") is not None:
        out["policyTags"] = md["policy_tags"]
    if md.get("max_length") is not None:
        out["maxLength"] = md["max_length"]
    if md.get("bq_type") == "BIGNUMERIC" and isinstance(dtype, StringType):
        out["type"] = "BIGNUMERIC"  # round-trip the string carrier
        return out
    if isinstance(dtype, StructType):
        out["type"] = "STRUCT"
        out["fields"] = [_spark_to_field(f) for f in dtype.fields]
    elif isinstance(dtype, DecimalType):
        # NUMERIC is (38,9); anything needing more scale OR more
        # integer digits than NUMERIC holds maps to BIGNUMERIC.
        p_, s_ = dtype.precision, dtype.scale
        fits_numeric = s_ <= 9 and (p_ - s_) <= 29
        out["type"] = "NUMERIC" if fits_numeric else "BIGNUMERIC"
        # parameterized precision/scale carry through the patch payload
        # (reference fieldsToTableFieldSchema setPrecision/setScale)
        out["precision"] = p_
        out["scale"] = s_
    else:
        for spark_cls, bq in _SPARK_TO_BQ.items():
            if isinstance(dtype, spark_cls):
                out["type"] = bq
                break
        else:
            from pyspark.sql.types import FloatType, IntegerType, ShortType

            if isinstance(dtype, (IntegerType, ShortType)):
                out["type"] = "INT64"
            elif isinstance(dtype, FloatType):
                out["type"] = "FLOAT64"
            else:
                raise ValueError(f"unsupported Spark type: {dtype}")
    return out


def struct_type_to_bq_schema(schema: StructType) -> dict:
    """Spark StructType -> BigQuery JSON schema (recursive)."""
    return {"fields": [_spark_to_field(f) for f in schema.fields]}
