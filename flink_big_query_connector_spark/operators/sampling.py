"""Sampling / training-mix construction operators.

The core primitive here is a **distributed exclusive prefix-sum** over a
deterministic hash order, used to cut each domain's document stream at a
token budget.  A naive ``Window.partitionBy(domain)`` puts an entire
domain in one task — a straggler the moment one domain dominates the
corpus (at 100 TB a single web crawl domain can be 10s of TB).  Instead
the prefix-sum runs in two levels:

1. bucket every doc by the TOP bits of its hash order key (so bucket
   order == hash order), aggregate per-(domain, bucket) token totals —
   a tiny table, <= 64 rows per domain;
2. exclusive-cumsum those bucket totals per domain (a window over <= 64
   rows), broadcast-join the offsets back, and window only WITHIN each
   (domain, bucket) — bounded partitions regardless of domain skew.

The result is bit-identical to the single-window formulation (the oracle
uses that formulation), but no task ever sees more than 1/64th of a
domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .hashing import hash60_expr
from .text import tokens_expr

# hash60 yields 60-bit keys; taking the top 6 bits gives 64 buckets whose
# ordering refines the full key's ordering (bucket asc, key asc == key asc)
BUCKET_SHIFT = 54


def salted_cum_before(
    df: DataFrame,
    id_col: str,
    value_col: str,
    salt: str,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """THE two-level exclusive prefix sum (module docstring): ``df`` gains
    ``cum_before`` = sum of ``value_col`` over all rows strictly before it
    in salted-hash order, per ``group_cols`` partition (global when empty).
    Shared by :func:`mix_to_token_budget` and
    :func:`weighted_systematic_sample` so the (ord_key, id) tie-break,
    bucket refinement, and empty-frame coalesce can never drift apart."""
    gc = list(group_cols)
    base = df.withColumn(
        "ord_key",
        hash60_expr(
            F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
        ),
    ).withColumn("bucket", F.shiftright(F.col("ord_key"), BUCKET_SHIFT))
    btot = base.groupBy(*gc, "bucket").agg(F.sum(value_col).alias("_bv"))
    wb = (
        Window.partitionBy(*gc)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boff = btot.withColumn(
        "_boff", F.coalesce(F.sum("_bv").over(wb), F.lit(0).cast("long"))
    ).select(*gc, "bucket", "_boff")
    ww = (
        Window.partitionBy(*gc, "bucket")
        .orderBy("ord_key", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        base.join(F.broadcast(boff), gc + ["bucket"])
        .withColumn(
            "cum_before",
            F.col("_boff")
            + F.coalesce(F.sum(value_col).over(ww), F.lit(0).cast("long")),
        )
        .drop("_boff")
    )


def mix_to_token_budget(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    budget_tokens: int,
    salt: str = "mix1",
) -> DataFrame:
    """Greedy per-domain selection to a token budget.

    Docs are ordered by a salted content-independent hash of the id
    (reproducible on any cluster size, stable when the corpus grows — the
    same property :func:`~..plans.llm_ops.llm_sample_stratified`
    documents), and kept while the exclusive running token sum is below
    ``budget_tokens``.  The doc that crosses the boundary is still kept,
    so a domain's total may overshoot by at most one document's tokens —
    the same honest boundary semantics as ``pack_sequences``.
    """
    base = df.select(
        F.col(id_col),
        F.col(group_col),
        F.size(tokens_expr(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    return (
        salted_cum_before(
            base, id_col, "n_tokens", salt, group_cols=(group_col,)
        )
        .filter(F.col("cum_before") < F.lit(budget_tokens))
        .select(id_col, group_col, "n_tokens", "cum_before")
    )


def weighted_systematic_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "wsys1",
) -> DataFrame:
    """Exact weight-proportional systematic (Madow) sampling, k strata.

    Items are laid on a line in salted-hash order, each occupying a
    segment of its weight; the line is cut into k equal strata of width
    W/k and an item is selected once per stratum boundary its segment
    covers: ``n_picks = (cum_after*k) div W - (cum_before*k) div W``.
    Every arithmetic step is INTEGER (no float thresholds), so the
    sample is bit-identical on any cluster size and any engine — the
    property random-number sampling can't give.  Inclusion probability
    is proportional to weight (an item with w >= W/k is picked every
    stratum it spans, reported via ``n_picks``).

    Scale shape: the running weight sum is the same two-level prefix-sum
    as :func:`mix_to_token_budget` — per-bucket totals (64 rows) window
    globally, full rows window only within their bucket — and the grand
    total W joins back as a broadcast 1-row aggregate, so no task ever
    sees more than 1/64th of the corpus and nothing collects on the
    driver.
    """
    base = (
        df.select(
            F.col(id_col),
            F.col(weight_col).cast("long").alias("w"),
        )
        # a zero-weight item occupies a zero-width segment and can never
        # cover a stratum boundary, so dropping it is semantics-preserving
        # — and it keeps W > 0 whenever any weighted item exists (the
        # all-zero corpus would otherwise hit ANSI integer div-by-zero)
        .filter(F.col("w") > 0)
    )
    total = base.agg(F.sum("w").alias("total_w"))
    cum = salted_cum_before(base, id_col, "w", salt).crossJoin(
        F.broadcast(total)
    )
    n_picks = F.expr(
        f"((cum_before + w) * {int(k)}) div total_w"
        f" - (cum_before * {int(k)}) div total_w"
    ).cast("long")
    return (
        cum.withColumn("n_picks", n_picks)
        .filter(F.col("n_picks") > 0)
        .select(id_col, "w", "cum_before", "n_picks")
    )
