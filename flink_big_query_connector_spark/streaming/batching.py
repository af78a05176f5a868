"""Count/size/time batching (reference ``process/BatchTrigger.java`` +
``process/RowBatcher.java``).

Two forms:

- :func:`chunk_rows` — the exact reference trigger semantics (fire when
  element count reaches ``max_count`` OR accumulated byte size reaches
  ``max_bytes``, whichever first), used inside the sink writers to bound
  AppendRows payloads under the 10 MB service limit.  This is a per-task
  iterator: it never materializes more than one batch.

- :func:`assign_batches_by_count` / :func:`assign_batches_by_size` —
  declarative DataFrame batch assignment via window arithmetic (pure
  Catalyst, shuffle-once, SQL-expressible so the duckdb oracle can check
  it).  The size variant buckets on the *exclusive* prefix sum — a batch
  may overshoot ``max_bytes`` by at most one row, same as the reference's
  "fires when accumulated size crosses the bound" behavior.

The time bound of the reference trigger (``ProcessingTimeoutTrigger``) maps
to Structured Streaming's ``trigger(processingTime=...)`` — micro-batches
are already time-bounded, so there is no row-level timer here.  Deviation
(documented): the reference resets its timeout timer on each new record;
Spark's fixed-interval micro-batch does not.
"""

from __future__ import annotations

import json
from collections.abc import Iterable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .config import BatchTriggerSettings


def json_size_of(row) -> int:
    """Byte size of a row as serialized (the ``BigQueryRecord.getSize()``
    analogue; newline included to match the backend's accounting).  A str
    row is already serialized (JVM-side ``to_json``, A17)."""
    if isinstance(row, str):
        return len(row) + 1
    return len(json.dumps(row, sort_keys=True, default=str)) + 1


def chunk_rows(
    rows: Iterable[dict],
    settings: BatchTriggerSettings | None = None,
    size_of=json_size_of,
) -> Iterator[list[dict]]:
    """Greedy chunker: emit a batch when count >= max_count or accumulated
    bytes >= max_bytes (fires *after* adding the crossing element, like the
    reference's size trigger which fires on ``accumulated >= maxSize``)."""
    settings = settings or BatchTriggerSettings()
    batch: list[dict] = []
    bytes_acc = 0
    for row in rows:
        batch.append(row)
        bytes_acc += size_of(row)
        if len(batch) >= settings.max_count or bytes_acc >= settings.max_bytes:
            yield batch
            batch, bytes_acc = [], 0
    if batch:
        yield batch


def row_size_col(df: DataFrame) -> Column:
    """Serialized byte size of each row, JVM-side (no Python)."""
    return F.length(F.to_json(F.struct(*df.columns))).cast("long")


def assign_batches_by_count(
    df: DataFrame, key: str, order: list[str], max_count: int
) -> DataFrame:
    """Deterministic batch index per key: floor((row_number-1)/max_count).

    One shuffle on ``key``; the window sort is the only extra cost and
    reuses the shuffle partitioning.
    """
    w = Window.partitionBy(key).orderBy(*order)
    return df.withColumn(
        "batch_index",
        F.floor((F.row_number().over(w) - F.lit(1)) / F.lit(max_count)).cast("long"),
    )


def assign_batches_by_size(
    df: DataFrame, key: str, order: list[str], max_bytes: int, size_col: str
) -> DataFrame:
    """Batch index from the exclusive running byte sum: rows bucket together
    until their cumulative size crosses ``max_bytes``."""
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(size_col)).over(w) - F.col(size_col)  # exclusive prefix
    return df.withColumn(
        "batch_index", F.floor(cum / F.lit(max_bytes)).cast("long")
    )


def stateful_batch_assign(
    stream_df: DataFrame,
    key_col: str,
    order_col: str,
    max_count: int,
):
    """Custom stateful streaming operator: per-key batch index that
    SURVIVES across micro-batches (reference ``BatchTrigger`` count
    semantics, ``process/BatchTrigger.java:27`` — a batch can span multiple
    Flink windows / Spark micro-batches, so the row counter must be keyed
    state, not window arithmetic).

    ``applyInPandasWithState``: state = rows-seen-so-far per key; each
    incoming Arrow batch is sorted by ``order_col`` (intra-batch arrival
    order is partition-nondeterministic) and rows get
    ``batch_index = seen // max_count``.  State is one long per key — at
    100 TB the state store holds |keys| longs, nothing else.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = f"{key_col} long, {order_col} long, batch_index long"
    state_schema = "n long"

    def assign(key, pdfs, state):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            pdf = pdf.sort_values(order_col)
            idx = (n + np.arange(len(pdf))) // max_count
            n += len(pdf)
            yield pd.DataFrame(
                {
                    key_col: pdf[key_col].to_numpy(),
                    order_col: pdf[order_col].to_numpy(),
                    "batch_index": idx.astype("int64"),
                }
            )
        state.update((n,))

    return stream_df.groupBy(key_col).applyInPandasWithState(
        assign, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
