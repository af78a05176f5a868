"""Row serialization (reference A17–A19, SURVEY.md §2).

The reference's user-facing surface is a ``RowValueSerializer<A> -> byte[]``
with three shipped flavors: JSON (``serializer/JsonRowValueSerializer.java``),
protobuf (``serializer/ProtoValueSerializer.java`` with the descriptor
derived from the live table schema,
``client/BigQueryProtoClientProvider.java:45-46``), and NoOp for
pre-serialized pipelines (``serializer/NoOpRowSerializer.java:3-8``).

Spark-first mapping: serialization is a *column expression*, not a per-row
callback — it stays JVM-side inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def json_rows(df: DataFrame) -> Column:
    """JSON bytes per row (A17): ``to_json(struct(*))`` — codegen, no UDF."""
    return F.to_json(F.struct(*df.columns)).cast("binary")


def json_size(df: DataFrame) -> Column:
    """Serialized byte size (the ``BigQueryRecord.getSize()`` analogue)."""
    return F.length(F.to_json(F.struct(*df.columns))).cast("long")


def noop_rows(df: DataFrame, payload_col: str) -> Column:
    """NoOp passthrough (A19): the payload column must already be binary."""
    field = dict(zip(df.columns, df.schema.fields))[payload_col]
    if field.dataType.simpleString() != "binary":
        raise TypeError(
            f"NoOp serializer requires a binary column; "
            f"{payload_col} is {field.dataType.simpleString()}"
        )
    return F.col(payload_col)


def proto_rows(df: DataFrame, descriptor_path: str, message_name: str) -> Column:
    """Protobuf bytes per row (A18) via Spark's native ``to_protobuf``.

    Requires the spark-protobuf artifact and a compiled descriptor set
    (the descriptor-from-table-schema fetch of the reference maps to
    compiling the sink table's schema to a ``.desc`` ahead of time).
    Raises NotImplementedError when the runtime lacks the protobuf stack —
    callers fall back to :func:`json_rows`, exactly like the reference's
    JSON writer path.
    """
    try:
        from pyspark.sql.protobuf.functions import to_protobuf
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(f"spark protobuf functions unavailable: {e}")
    try:
        return to_protobuf(
            F.struct(*df.columns), message_name, descFilePath=descriptor_path
        )
    except Exception as e:  # pragma: no cover - jar not on classpath
        raise NotImplementedError(f"to_protobuf unavailable: {e}")
