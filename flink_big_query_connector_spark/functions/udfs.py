"""Python UDF surface (SURVEY.md §2 B20): every flavor Spark offers.

These exist to prove the extension points, not to carry hot paths — the
engine's rule is built-ins first (see README "UDF discipline").  Each UDF
here is deterministic and integer/string-exact so the DuckDB oracle can
check it:

- scalar ``pandas_udf``: Arrow-vectorized, one Series in/out per batch;
- grouped-aggregate ``pandas_udf``: a whole group's Series -> one scalar,
  usable inside ``groupBy().agg()``;
- grouped-map ``applyInPandas``: a whole group's frame -> a frame;
- Python UDTF (Spark 4): one row in -> many rows out, lateral-join style.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType


@pandas_udf(LongType())
def ascii_sum_udf(s: pd.Series) -> pd.Series:
    """Scalar pandas UDF: sum of character code points per string (exact
    integer arithmetic — portable to the oracle's list_sum(ord(...)))."""
    return s.map(lambda x: sum(ord(ch) for ch in x) if x is not None else 0)


@pandas_udf(LongType())
def token_sum_agg_udf(n: pd.Series) -> int:
    """Grouped-aggregate pandas UDF: exact integer sum over the group."""
    return int(n.sum())


def rank_in_group(df: DataFrame, group_col: str, order_col: str, id_col: str):
    """Grouped-map applyInPandas: rank rows inside each group by
    (order_col, id_col) — the group's whole frame arrives as pandas."""

    out_schema = f"{id_col} long, {group_col} string, rank_in_group long"

    def rank(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([order_col, id_col])
        return pd.DataFrame(
            {
                id_col: pdf[id_col].to_numpy(),
                group_col: pdf[group_col].to_numpy(),
                "rank_in_group": range(1, len(pdf) + 1),
            }
        )

    return (
        df.select(id_col, group_col, order_col)
        .groupBy(group_col)
        .applyInPandas(rank, out_schema)
    )


class SentenceSplitUDTF:
    """Python UDTF (Spark 4): explode a document into '.'-separated,
    trimmed, non-empty sentences with their ordinal."""

    def eval(self, doc_id: int, text: str):
        if text is None:
            return
        idx = 0
        for part in text.split("."):
            part = part.strip()
            if part:
                yield doc_id, idx, part
                idx += 1
