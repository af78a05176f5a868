"""Relational query surface (SURVEY.md §2 Part B, B1–B19).

Each query is declared with the DataFrame API so Catalyst supplies predicate
pushdown, column pruning, join selection, partial aggregation and AQE; the
paired DuckDB oracle SQL computes the identical result for the hash gate.

Scale notes (100 TB):
- small dims (``nation``, ``region``) are broadcast explicitly;
- money arithmetic runs in decimal domain (order-independent sums — see
  ``functions.numeric``), so results are stable under any partitioning;
- every aggregate is map-side combinable (plain groupBy/agg — Spark plans
  partial_ + final HashAggregate automatically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType
from pyspark.sql.window import Window

from ..functions import numeric
from ..functions.numeric import dbl, dec
from ..sources.tables import load_tables, register_views, ts_event_time, ts_micros
from ..scratch import scratch_dir, unique_name
from .registry import register

# ---------------------------------------------------------------------------
# B1 — parquet scan
# ---------------------------------------------------------------------------


@register(
    "b01_scan_count",
    oracle="SELECT COUNT(*) AS n FROM lineitem",
    tags=("scan",),
)
def b01_scan_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-table count; Catalyst answers this from parquet row-group stats."""
    t = load_tables(spark, sf_dir)
    return t["lineitem"].agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# B2 — projection with computed column
# ---------------------------------------------------------------------------

_REV = (
    "CAST(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * "
    "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) "
    "AS DECIMAL(18,4)) AS DOUBLE)"
)


def _rev_col() -> F.Column:
    return dbl(
        (
            dec("l_extendedprice", 14, 2)
            * (F.lit(1).cast(DecimalType(4, 2)) - dec("l_discount", 4, 2))
        ).cast(DecimalType(18, 4))
    )


@register(
    "b02_projection",
    oracle=f"""
        SELECT l_orderkey, l_linenumber, {_REV} AS revenue
        FROM lineitem
    """,
    tags=("projection",),
)
def b02_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Narrow projection: the scan should read only 4 columns (ReadSchema)."""
    t = load_tables(spark, sf_dir)
    return t["lineitem"].select(
        "l_orderkey", "l_linenumber", _rev_col().alias("revenue")
    )


# ---------------------------------------------------------------------------
# B3 — filters / predicates (pushed to the parquet scan)
# ---------------------------------------------------------------------------


@register(
    "b03_filter",
    oracle="""
        SELECT COUNT(*) AS n
        FROM lineitem
        WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                             AND TIMESTAMP '1996-12-31 23:59:59'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    tags=("filter",),
)
def b03_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped predicate stack; all three predicates push down."""
    t = load_tables(spark, sf_dir)
    l = t["lineitem"]
    return (
        l.filter(
            F.col("l_shipdate").between("1996-01-01 00:00:00", "1996-12-31 23:59:59")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# B4 — inner equi-join (broadcast)
# ---------------------------------------------------------------------------


@register(
    "b04_join_broadcast",
    oracle="""
        SELECT n_name, COUNT(*) AS n_customers
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    tags=("join",),
)
def b04_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ nation with an explicit broadcast of the 25-row dim.

    At 100 TB the fact side never shuffles for this join: nation is
    broadcast to every executor (BroadcastHashJoin in the plan).
    """
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# B5 — outer join
# ---------------------------------------------------------------------------


@register(
    "b05_outer_join",
    oracle="""
        SELECT c_custkey, COUNT(o_orderkey) AS order_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    """,
    tags=("join",),
)
def b05_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_count"))
    )


# ---------------------------------------------------------------------------
# B6 — semi / anti join
# ---------------------------------------------------------------------------


@register(
    "b06_anti_join",
    oracle="""
        SELECT COUNT(*) AS n_without_orders
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join",),
)
def b06_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders via left_anti (no row explosion, one shuffle)."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("n_without_orders"))
    )


@register(
    "b06_semi_join",
    oracle="""
        SELECT COUNT(*) AS n_with_orders
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join",),
)
def b06_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .agg(F.count(F.lit(1)).alias("n_with_orders"))
    )


# ---------------------------------------------------------------------------
# B7 — theta / range join (equi key + inequality residual)
# ---------------------------------------------------------------------------


@register(
    "b07_range_join",
    oracle="""
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM part p JOIN lineitem l
          ON p.p_partkey = l.l_partkey AND l.l_quantity < 5
    """,
    tags=("join",),
)
def b07_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join with an inequality residual; Spark keys the hash join on
    p_partkey and applies the range predicate as a post-filter — the
    inequality is also pushed to the lineitem scan as ``l_quantity < 5``."""
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .join(
            t["lineitem"],
            (F.col("p_partkey") == F.col("l_partkey")) & (F.col("l_quantity") < 5),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            dbl(F.sum(dec("l_quantity", 12, 2))).alias("sum_qty"),
        )
    )


@register(
    "b07_binned_range_join",
    oracle="""
        WITH bands AS (
          SELECT CAST(i AS BIGINT) AS band_id,
                 895 + i * 9 AS lo, 895 + i * 9 + 15 AS hi
          FROM range(12) t(i)
        )
        SELECT band_id, COUNT(*) AS n,
               CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE)
                   AS sum_price
        FROM bands b JOIN part p
          ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
        GROUP BY band_id ORDER BY band_id
    """,
    tags=("join", "range"),
)
def b07_binned_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure interval join (no equi key) made scalable by bin replication:
    each overlapping band replicates onto every width-10 bin it spans,
    each point computes its bin, and the join becomes EQUI on the bin with
    the exact range predicate as a cheap residual.  The naive form is a
    BroadcastNestedLoopJoin that compares every point against every band
    (the oracle's formulation); binning bounds the per-point comparisons
    to the bands sharing its bin — the difference between O(P*B) and
    O(P * bands-per-bin) at 100 TB.  Bands overlap on purpose so one
    point can land in several bands."""
    t = load_tables(spark, sf_dir)
    bands = (
        spark.range(12)
        .select(
            F.col("id").alias("band_id"),
            (F.lit(895) + F.col("id") * 9).alias("lo"),
            (F.lit(895) + F.col("id") * 9 + 15).alias("hi"),
        )
        .select(
            "band_id",
            "lo",
            "hi",
            F.explode(
                F.sequence(
                    F.floor(F.col("lo") / 10).cast("int"),
                    F.floor((F.col("hi") - 1) / 10).cast("int"),
                )
            ).alias("bin"),
        )
    )
    pts = t["part"].select(
        "p_retailprice",
        F.floor(F.col("p_retailprice") / 10).cast("int").alias("bin"),
    )
    return (
        pts.join(F.broadcast(bands), "bin")
        .filter(
            (F.col("p_retailprice") >= F.col("lo"))
            & (F.col("p_retailprice") < F.col("hi"))
        )
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dbl(F.sum(dec("p_retailprice", 12, 2))).alias("sum_price"),
        )
        .orderBy("band_id")
    )


# ---------------------------------------------------------------------------
# B8 — hash aggregation: TPC-H Q1 pricing summary
# ---------------------------------------------------------------------------

_Q1_ORACLE = """
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR)
           AS DOUBLE) AS sum_qty,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS VARCHAR)
           AS DOUBLE) AS sum_base_price,
      -- VARCHAR route = correctly-rounded decimal->double (DuckDB's
      -- native cast double-rounds past 2^53 scaled units; see
      -- functions/numeric.py::sql_dbl)
      CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(14,2))
            * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
            AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
      CAST(CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(14,2))
            * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
            AS DECIMAL(18,4))
            * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))
            AS DECIMAL(24,6))) AS VARCHAR) AS DOUBLE) AS sum_charge,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR)
           AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS VARCHAR)
           AS DOUBLE) / COUNT(*) AS avg_price,
      CAST(CAST(SUM(CAST(l_discount AS DECIMAL(8,2))) AS VARCHAR)
           AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
"""


@register("b08_q1_pricing_summary", oracle=_Q1_ORACLE, tags=("aggregate",))
def b08_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: 8 aggregates over 2 grouping keys.

    All sums run in decimal domain (exact, order-independent), averages are
    computed as double-division of exact sums — bit-identical to the oracle
    regardless of partitioning.
    """
    t = load_tables(spark, sf_dir)
    one = F.lit(1).cast(DecimalType(4, 2))
    disc_price = (
        dec("l_extendedprice", 14, 2) * (one - dec("l_discount", 4, 2))
    ).cast(DecimalType(18, 4))
    charge = (disc_price * (one + dec("l_tax", 4, 2))).cast(DecimalType(24, 6))
    cnt = F.count(F.lit(1))
    return (
        t["lineitem"]
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dbl(F.sum(dec("l_quantity", 12, 2))).alias("sum_qty"),
            dbl(F.sum(dec("l_extendedprice", 14, 2))).alias("sum_base_price"),
            dbl(F.sum(disc_price)).alias("sum_disc_price"),
            dbl(F.sum(charge)).alias("sum_charge"),
            (dbl(F.sum(dec("l_quantity", 12, 2))) / cnt).alias("avg_qty"),
            (dbl(F.sum(dec("l_extendedprice", 14, 2))) / cnt).alias("avg_price"),
            (dbl(F.sum(dec("l_discount", 8, 2))) / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# B9 — rollup / cube / grouping sets
# ---------------------------------------------------------------------------


@register(
    "b09_rollup",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    tags=("aggregate",),
)
def b09_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            dbl(F.sum(dec("l_quantity", 12, 2))).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "b09_cube",
    oracle="""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem
        GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    tags=("aggregate",),
)
def b09_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# B10 — distinct
# ---------------------------------------------------------------------------


@register(
    "b10_distinct",
    oracle="""
        SELECT COUNT(DISTINCT l_suppkey) AS n_supp,
               COUNT(DISTINCT l_partkey) AS n_part
        FROM lineitem
    """,
    tags=("aggregate",),
)
def b10_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two distinct-counts in one pass (Spark expands + partial aggregates)."""
    t = load_tables(spark, sf_dir)
    return t["lineitem"].agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct("l_partkey").alias("n_part"),
    )


# ---------------------------------------------------------------------------
# B11 — window functions
# ---------------------------------------------------------------------------


@register(
    "b11_window_rank",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(rnk AS BIGINT) AS rnk,
               prev_price
        FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 RANK() OVER w AS rnk,
                 LAG(o_totalprice) OVER w AS prev_price
          FROM orders
          WINDOW w AS (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey)
        )
        WHERE rnk <= 3
    """,
    tags=("window",),
)
def b11_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3-per-customer via rank; single shuffle on the partition key."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        t["orders"]
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.rank().over(w).cast("long").alias("rnk"),
            F.lag("o_totalprice").over(w).alias("prev_price"),
        )
        .filter(F.col("rnk") <= 3)
    )


@register(
    "b11_window_running_sum",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)))
                    OVER (PARTITION BY l_orderkey
                          ORDER BY l_linenumber, l_partkey, l_suppkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS running_qty,
               CAST(ROW_NUMBER()
                    OVER (PARTITION BY l_orderkey
                          ORDER BY l_linenumber, l_partkey, l_suppkey)
                    AS BIGINT) AS rn
        FROM lineitem
    """,
    tags=("window",),
)
def b11_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    # (l_orderkey, l_linenumber) is NOT unique in the test data — a total
    # order inside each partition is required for a deterministic prefix sum.
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey"
    )
    return t["lineitem"].select(
        "l_orderkey",
        "l_linenumber",
        dbl(
            F.sum(dec("l_quantity", 12, 2)).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
        ).alias("running_qty"),
        F.row_number().over(w).cast("long").alias("rn"),
    )


# ---------------------------------------------------------------------------
# B12 — sort / limit / top-k
# ---------------------------------------------------------------------------


@register(
    "b12_topk",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
    tags=("sort",),
)
def b12_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10: Spark plans TakeOrderedAndProject (per-partition heap
    + driver merge) — no global sort materialization at any scale."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "b12_diversified_topk",
    oracle="""
        WITH ranked AS (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders
        )
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM ranked WHERE rn <= 2
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20
    """,
    tags=("sort", "window"),
)
def b12_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIVERSIFIED top-k — the result-diversity constraint every search/
    recommendation surface applies (global top 20 orders by price, at
    most 2 per customer): a per-group ROW_NUMBER cap feeds the global
    TakeOrdered.

    Scale shape: the window shuffles on o_custkey once (hash-partitioned
    sort within groups, no global sort); the capped survivors — at most
    2 x |customers| rows — then hit TakeOrderedAndProject's
    per-partition heap + driver merge, so nothing ever materializes a
    full global ordering."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        t["orders"]
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .drop("rn")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# B13 — set operations
# ---------------------------------------------------------------------------


@register(
    "b13_intersect",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
)
def b13_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .select(F.col("c_nationkey").alias("nationkey"))
        .intersect(t["supplier"].select(F.col("s_nationkey").alias("nationkey")))
    )


@register(
    "b13_except",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey FROM supplier WHERE s_suppkey < 5
    """,
    tags=("setop",),
)
def b13_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations with customers but none of the first five suppliers.  The
    supplier side is restricted so the difference is NON-EMPTY at every
    verification scale — an unrestricted EXCEPT over these tables drains
    to zero rows once both sides cover all 25 nations, which makes the
    oracle comparison vacuous."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .select(F.col("c_nationkey").alias("nationkey"))
        .subtract(
            t["supplier"]
            .filter(F.col("s_suppkey") < 5)
            .select(F.col("s_nationkey").alias("nationkey"))
        )
    )


@register(
    "b17_explode_outer",
    oracle="""
        WITH d AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 10 = 7 THEN []::VARCHAR[]
                      ELSE regexp_extract_all(COALESCE(text, ''),
                                              '\\S+')[:3] END AS toks
          FROM documents
        )
        SELECT doc_id,
               COALESCE(unnest(CASE WHEN len(toks) = 0 THEN [NULL]
                                    ELSE toks END), '<empty>') AS tok
        FROM d
    """,
    tags=("array", "generator"),
)
def b17_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OUTER generator semantics: plain explode silently DROPS rows whose
    array is empty — losing every short/empty document from a downstream
    join spine; explode_outer keeps them as one null-element row.  A
    tenth of the docs get an empty token array in-query to prove the
    preservation; '<empty>' marks the survivors.  NULL text is coalesced
    to '' on BOTH sides so a null-text row takes the explicit empty-array
    branch in each engine (Spark's explode_outer over a NULL array would
    emit one null-element row while DuckDB's unnest(NULL) emits zero)."""
    from ..operators.text import tokens_expr

    t = load_tables(spark, sf_dir)
    toks = F.when(
        F.col("doc_id") % 10 == 7, F.array().cast("array<string>")
    ).otherwise(
        F.slice(tokens_expr(F.coalesce(F.col("text"), F.lit(""))), 1, 3)
    )
    return t["documents"].select(
        "doc_id", F.explode_outer(toks).alias("tok")
    ).select("doc_id", F.coalesce(F.col("tok"), F.lit("<empty>")).alias("tok"))


@register(
    "b02_nested_projection",
    oracle="""
        SELECT lang,
               COUNT(*) AS n,
               CAST(SUM(length(text)) AS BIGINT) AS sum_chars
        FROM documents GROUP BY lang ORDER BY lang
    """,
    tags=("scan", "projection", "nested"),
)
def b02_nested_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-schema column pruning: documents written with a nested
    struct payload (meta.lang, meta.stats.chars, body), then read back
    touching ONLY two leaves — the parquet ReadSchema must contain just
    those leaf paths, never the wide body column (asserted in
    tests/test_scale_patterns.py).  Nested pruning is what keeps a
    struct-heavy 100 TB table from paying full-row I/O for a two-field
    rollup."""
    t = load_tables(spark, sf_dir)
    out = scratch_dir("nested_proj_")
    (
        t["documents"]
        .select(
            "doc_id",
            F.struct(
                F.col("lang").alias("lang"),
                F.struct(
                    F.length("text").cast("long").alias("chars"),
                    F.col("n_chars").alias("declared"),
                ).alias("stats"),
                F.col("text").alias("body"),
            ).alias("meta"),
        )
        .write.mode("overwrite")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    return (
        back.groupBy(F.col("meta.lang").alias("lang"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("meta.stats.chars").cast("long").alias("sum_chars"),
        )
        .orderBy("lang")
    )


@register(
    "b11_ratio_to_report",
    oracle="""
        WITH per AS (
          SELECT event_type,
                 SUM(CAST(value AS DECIMAL(14,4))) AS tv
          FROM events GROUP BY event_type
        ),
        tot AS (SELECT SUM(tv) AS total FROM per)
        SELECT event_type,
               CAST(tv AS DOUBLE) AS type_value,
               floor(CAST(tv AS DOUBLE) / CAST(total AS DOUBLE)
                     * 1000000.0 + 0.5) / 1000000.0 AS share
        FROM per, tot
        ORDER BY event_type
    """,
    tags=("window", "analytics"),
)
def b11_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total (RATIO_TO_REPORT): each group's share of the
    grand total — formulated WITHOUT the textbook `SUM() OVER ()` empty
    window, which forces every row through one partition.  Instead the
    grand total is a second-level aggregate of the per-group partials
    (|groups| rows) broadcast back — the shape that survives 100 TB.
    Decimal-domain sums keep both levels order-free; one double division
    at the end."""
    t = load_tables(spark, sf_dir)
    per = t["events"].groupBy("event_type").agg(
        F.sum(dec("value", 14, 4)).alias("tv")
    )
    tot = per.agg(F.sum("tv").alias("total"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            F.col("tv").cast("double").alias("type_value"),
            numeric.round6_expr(
                F.col("tv").cast("double") / F.col("total").cast("double")
            ).alias("share"),
        )
        .orderBy("event_type")
    )


@register(
    "b13_setops_all",
    oracle="""
        SELECT nationkey, COUNT(*) AS n FROM (
          SELECT c_nationkey AS nationkey FROM customer
          INTERSECT ALL
          SELECT s_nationkey FROM supplier
        ) GROUP BY nationkey
        UNION ALL
        SELECT -1 - nationkey AS nationkey, COUNT(*) AS n FROM (
          SELECT c_nationkey AS nationkey FROM customer
          EXCEPT ALL
          SELECT s_nationkey FROM supplier
        ) GROUP BY nationkey
    """,
    tags=("setop",),
)
def b13_setops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (bag) set operations — INTERSECT ALL / EXCEPT ALL keep
    duplicate multiplicities, which the DISTINCT variants destroy: a key
    appearing 5x in customer and 2x in supplier intersects 2x and
    excepts 3x.  Spark plans both as count-annotated joins (one shuffle,
    map-side partials), never a row-by-row comparison.  The EXCEPT ALL
    branch remaps keys to a disjoint negative range so one result table
    carries both multisets."""
    t = load_tables(spark, sf_dir)
    c = t["customer"].select(F.col("c_nationkey").alias("nationkey"))
    s = t["supplier"].select(F.col("s_nationkey").alias("nationkey"))
    inter = (
        c.intersectAll(s)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    exc = (
        c.exceptAll(s)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select((F.lit(-1) - F.col("nationkey")).alias("nationkey"), "n")
    )
    return inter.unionAll(exc)


@register(
    "b06_null_safe_join",
    oracle="""
        WITH c AS (SELECT CASE WHEN c_custkey % 9 = 4 THEN NULL
                               ELSE c_nationkey END AS k, c_custkey
                   FROM customer),
        s AS (SELECT CASE WHEN s_suppkey % 7 = 2 THEN NULL
                          ELSE s_nationkey END AS k, s_suppkey
              FROM supplier)
        SELECT COALESCE(CAST(c.k AS VARCHAR), 'NULL') AS join_key,
               COUNT(*) AS n,
               CAST(SUM(c_custkey + s_suppkey) AS BIGINT) AS key_sum
        FROM c JOIN s ON c.k IS NOT DISTINCT FROM s.k
        GROUP BY 1
    """,
    tags=("join", "nulls"),
)
def b06_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    MATCH each other instead of vanishing — the semantics CDC and
    entity-resolution joins need when the key itself is optional.  Nulls
    are injected in-query on both sides; the null-null block joins like
    any other key (at scale a frequent NULL key is a skew group — the
    b04 salting pattern applies to it the same way)."""
    t = load_tables(spark, sf_dir)
    c = t["customer"].select(
        F.when(F.col("c_custkey") % 9 == 4, F.lit(None))
        .otherwise(F.col("c_nationkey"))
        .alias("ck"),
        "c_custkey",
    )
    s = t["supplier"].select(
        F.when(F.col("s_suppkey") % 7 == 2, F.lit(None))
        .otherwise(F.col("s_nationkey"))
        .alias("sk"),
        "s_suppkey",
    )
    return (
        c.join(s, F.col("ck").eqNullSafe(F.col("sk")))
        .groupBy(
            F.coalesce(F.col("ck").cast("string"), F.lit("NULL")).alias(
                "join_key"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("c_custkey") + F.col("s_suppkey"))
            .cast("long")
            .alias("key_sum"),
        )
    )


@register(
    "b13_union",
    oracle="""
        SELECT nationkey, COUNT(*) AS n FROM (
          SELECT c_nationkey AS nationkey FROM customer
          UNION ALL
          SELECT s_nationkey FROM supplier
        ) GROUP BY nationkey
    """,
    tags=("setop",),
)
def b13_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .select(F.col("c_nationkey").alias("nationkey"))
        .unionAll(t["supplier"].select(F.col("s_nationkey").alias("nationkey")))
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# B14 — string functions
# ---------------------------------------------------------------------------


@register(
    "b14_string_funcs",
    oracle="""
        SELECT
          UPPER(SUBSTR(p_name, 1, 6)) AS prefix6,
          COUNT(*) AS n,
          CAST(SUM(CAST(LENGTH(p_name) AS BIGINT)) AS BIGINT) AS total_len,
          MIN(TRIM(CONCAT(p_brand, ' ', p_type))) AS min_brand_type,
          MAX(REGEXP_EXTRACT(p_name, '^([a-z]+)', 1)) AS max_first_word
        FROM part
        WHERE p_type LIKE 'PROMO%' OR p_name LIKE '%red%'
        GROUP BY prefix6
    """,
    tags=("scalar",),
)
def b14_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .filter(F.col("p_type").like("PROMO%") | F.col("p_name").like("%red%"))
        .groupBy(F.upper(F.substring("p_name", 1, 6)).alias("prefix6"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("p_name").cast("long")).cast("long").alias("total_len"),
            F.min(
                F.trim(F.concat(F.col("p_brand"), F.lit(" "), F.col("p_type")))
            ).alias("min_brand_type"),
            F.max(F.regexp_extract("p_name", "^([a-z]+)", 1)).alias("max_first_word"),
        )
    )


# ---------------------------------------------------------------------------
# B15 — date/time functions
# ---------------------------------------------------------------------------


@register(
    "b15_datetime",
    oracle="""
        SELECT
          CAST(YEAR(o_orderdate) AS INTEGER) AS yr,
          CAST(MONTH(o_orderdate) AS INTEGER) AS mo,
          CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
          COUNT(*) AS n,
          MIN(o_orderdate) AS first_order,
          MAX(o_orderdate) AS last_order
        FROM orders
        GROUP BY 1, 2, 3
    """,
    tags=("scalar",),
)
def b15_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .groupBy(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
            F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
        )
    )


@register(
    "b15_datediff",
    oracle="""
        SELECT
          CAST(FLOOR(DATEDIFF('day', TIMESTAMP '1992-01-01 00:00:00', o_orderdate)
                     / 365) AS BIGINT) AS yrs_bucket,
          COUNT(*) AS n
        FROM orders
        GROUP BY 1
    """,
    tags=("scalar",),
)
def b15_datediff(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    # Spark datediff(end, start) counts day-boundary crossings after casting
    # to date — same as duckdb's datediff('day', ...). Integer division:
    # duckdb `/` on ints is float division, so use explicit floor-free cast
    # semantics: both sides compute (diff / 365) in double then CAST->BIGINT?
    # CAST(double AS BIGINT) rounds in duckdb but truncates in Spark, so do
    # integer division explicitly on both sides via FLOOR.
    return (
        t["orders"]
        .groupBy(
            F.floor(
                F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
                / F.lit(365)
            )
            .cast("long")
            .alias("yrs_bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# B16 — math / rounding
# ---------------------------------------------------------------------------


@register(
    "b16_math",
    oracle="""
        SELECT
          o_orderpriority,
          CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT) AS sum_floor,
          CAST(SUM(CAST(CEIL(o_totalprice) AS BIGINT)) AS BIGINT) AS sum_ceil,
          CAST(SUM(CAST(ROUND(o_totalprice, 0) AS BIGINT)) AS BIGINT) AS sum_round,
          CAST(SUM(CAST(ABS(o_totalprice - 100000.0) AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_absdev
        FROM orders
        GROUP BY o_orderpriority
    """,
    tags=("scalar",),
)
def b16_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    p = F.col("o_totalprice")
    return (
        t["orders"]
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.floor(p).cast("long")).cast("long").alias("sum_floor"),
            F.sum(F.ceil(p).cast("long")).cast("long").alias("sum_ceil"),
            F.sum(F.round(p, 0).cast("long")).cast("long").alias("sum_round"),
            dbl(F.sum(F.abs(p - F.lit(100000.0)).cast(DecimalType(18, 2)))).alias(
                "sum_absdev"
            ),
        )
    )


# ---------------------------------------------------------------------------
# B17 — JSON / arrays
# ---------------------------------------------------------------------------


@register(
    "b17_json_extract",
    oracle="""
        SELECT json_extract_string(props, '$.k') AS k_str,
               COUNT(*) AS n,
               MIN(event_id) AS min_event
        FROM events
        GROUP BY k_str
    """,
    tags=("json",),
)
def b17_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload extraction on the events table (JVM-side, codegen)."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.get_json_object("props", "$.k").alias("k_str"))
        .agg(F.count(F.lit(1)).alias("n"), F.min("event_id").alias("min_event"))
    )


@register(
    "b05_scd2_intervals",
    oracle="""
        WITH v AS (
          SELECT user_id, event_id, CAST(value AS DOUBLE) AS value,
                 CAST(ts AS TIMESTAMP) AS valid_from,
                 LEAD(CAST(ts AS TIMESTAMP)) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id)
                     AS valid_to
          FROM events WHERE user_id < 30
        )
        SELECT user_id, event_id, value, valid_from, valid_to,
               (valid_to IS NULL) AS is_current
        FROM v
    """,
    tags=("join", "scd"),
)
def b05_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 intervalization: an append-only
    change feed becomes versioned history rows — each change is valid
    from its own timestamp until the key's next change (LEAD), the open
    version flagged is_current.  One window per key, no self-join; this
    is how a dimension table gains time-travel semantics, and the
    interval columns are exactly what b07's as-of join probes."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    ev = t["events"].filter(F.col("user_id") < 30)
    ts_ts = ts_event_time(t["events"])
    w = Window.partitionBy("user_id").orderBy(ts_ts, F.col("event_id"))
    return ev.select(
        "user_id",
        "event_id",
        F.col("value").cast("double").alias("value"),
        ts_ts.alias("valid_from"),
        F.lead(ts_ts).over(w).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


@register(
    "b01_schema_evolution_read",
    oracle="""
        SELECT COUNT(*) AS n_rows,
               (SELECT COUNT(*) FROM documents) AS n_v1,
               (SELECT COUNT(*) FROM documents WHERE doc_id % 2 = 0)
                   AS n_v2,
               (SELECT CAST(SUM(doc_id) AS BIGINT)
                FROM documents WHERE doc_id % 2 = 0) AS sum_score_carrier
        FROM (SELECT * FROM documents
              UNION ALL
              SELECT * FROM documents WHERE doc_id % 2 = 0)
    """,
    tags=("scan", "schema"),
)
def b01_schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift-tolerant lake read: two parquet generations of the
    same table — v2 adds a ``score`` column — read as ONE dataset with
    ``mergeSchema``; v1 rows surface score=null, v2 rows keep values.
    This is additive schema evolution on the storage side (the DSv2
    connector covers the write side); without mergeSchema the scan would
    silently take one footer's schema and drop the new column."""
    t = load_tables(spark, sf_dir)
    out = scratch_dir("schema_evo_")
    t["documents"].write.mode("overwrite").parquet(f"{out}/v1")
    (
        t["documents"]
        .filter(F.col("doc_id") % 2 == 0)
        .withColumn("score", F.col("doc_id").cast("long"))
        .write.mode("overwrite")
        .parquet(f"{out}/v2")
    )
    both = spark.read.option("mergeSchema", "true").parquet(
        f"{out}/v1", f"{out}/v2"
    )
    return both.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("score").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_v1"),
        F.sum(F.when(F.col("score").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_v2"),
        F.sum("score").cast("long").alias("sum_score_carrier"),
    )


@register(
    "b16_rolling_zscore",
    oracle="""
        WITH w AS (
          SELECT event_id, user_id,
                 CAST(value AS DECIMAL(14,4)) AS v,
                 SUM(CAST(value AS DECIMAL(14,4))) OVER fr AS s,
                 SUM(CAST(value AS DECIMAL(14,4))
                     * CAST(value AS DECIMAL(14,4))) OVER fr AS sq,
                 COUNT(*) OVER fr AS n
          FROM events
          WHERE user_id < 50
          WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        ),
        stats AS (
          SELECT event_id, user_id, v, n,
                 CAST(s AS DOUBLE) / n AS mean,
                 GREATEST(CAST(sq AS DOUBLE) / n
                          - (CAST(s AS DOUBLE) / n)
                            * (CAST(s AS DOUBLE) / n), 0.0) AS var
          FROM w
        )
        SELECT event_id, user_id,
               CASE WHEN n >= 4 AND sqrt(var) > 0.0
                    THEN floor((CAST(v AS DOUBLE) - mean) / sqrt(var)
                               * 1000000.0 + 0.5) / 1000000.0
                    ELSE NULL END AS z,
               COALESCE(n >= 4 AND sqrt(var) > 0.0
                        AND abs((CAST(v AS DOUBLE) - mean) / sqrt(var))
                            > 2.0, FALSE) AS is_anomaly
        FROM stats
    """,
    tags=("stats", "timeseries", "anomaly"),
)
def b16_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: per-user 7-event sliding frame,
    mean/variance from DECIMAL-domain rolling sums (exact under any frame
    evaluation order — Spark walks frames, DuckDB uses segment trees;
    float rolling sums would diverge in ulps between the two), one double
    conversion at the end, identical IEEE arithmetic (sqrt is correctly
    rounded in both engines) — hash-exact flags.  The per-user window is
    the partition-parallel shape; no global ordering anywhere."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    ev = t["events"].filter(F.col("user_id") < 50)
    v_dec = dec("value", 14, 4)
    fr = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    w = ev.select(
        "event_id",
        "user_id",
        v_dec.alias("v"),
        F.sum(v_dec).over(fr).alias("s"),
        F.sum(v_dec * v_dec).over(fr).alias("sq"),
        F.count(F.lit(1)).over(fr).alias("n"),
    )
    mean = dbl(F.col("s")) / F.col("n")
    var = F.greatest(
        dbl(F.col("sq")) / F.col("n") - mean * mean, F.lit(0.0)
    )
    std = F.sqrt(var)
    z = (dbl(F.col("v")) - mean) / std
    ok = (F.col("n") >= 4) & (std > 0.0)
    return w.select(
        "event_id",
        "user_id",
        F.when(ok, numeric.round6_expr(z)).otherwise(F.lit(None)).alias(
            "z"
        ),
        F.coalesce(ok & (F.abs(z) > 2.0), F.lit(False)).alias(
            "is_anomaly"
        ),
    )


@register(
    "b11_last_touch_attribution",
    oracle="""
        WITH e AS (
          SELECT user_id, event_id, event_type, epoch_us(ts) AS t
          FROM events WHERE user_id < 200),
        w AS (
          SELECT user_id, event_id, event_type, t,
                 last_value(CASE WHEN event_type <> 'purchase'
                                 THEN event_id END IGNORE NULLS)
                     OVER fr AS attr_event,
                 last_value(CASE WHEN event_type <> 'purchase'
                                 THEN event_type END IGNORE NULLS)
                     OVER fr AS attr_type,
                 last_value(CASE WHEN event_type <> 'purchase'
                                 THEN t END IGNORE NULLS)
                     OVER fr AS attr_t
          FROM e
          WINDOW fr AS (PARTITION BY user_id ORDER BY t, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING)
        )
        SELECT event_id AS purchase_event, user_id,
               attr_event, attr_type,
               CASE WHEN attr_t IS NOT NULL
                         AND t - attr_t <= 604800000000
                    THEN t - attr_t END AS gap_micros
        FROM w WHERE event_type = 'purchase'
    """,
    tags=("window", "attribution"),
)
def b11_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase credits the user's most
    recent preceding non-purchase event within a 7-day lookback — the
    conversion-analytics join expressed as ONE per-user ordered window
    (last_value IGNORE NULLS over the preceding frame), no self-join, no
    range join.  Out-of-window or first-touch purchases attribute to
    NULL.  All arithmetic is integer micros, so the lookback cut is
    exact; per-user windows keep it partition-parallel at any scale."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    ev = t["events"].filter(F.col("user_id") < 200).select(
        "user_id",
        "event_id",
        "event_type",
        ts_micros(t["events"]).alias("t"),
    )
    fr = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    non_purchase = F.col("event_type") != "purchase"
    w = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "t",
        F.last(F.when(non_purchase, F.col("event_id")), True)
        .over(fr)
        .alias("attr_event"),
        F.last(F.when(non_purchase, F.col("event_type")), True)
        .over(fr)
        .alias("attr_type"),
        F.last(F.when(non_purchase, F.col("t")), True)
        .over(fr)
        .alias("attr_t"),
    )
    gap = F.col("t") - F.col("attr_t")
    return w.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event"),
        "user_id",
        "attr_event",
        "attr_type",
        F.when(
            F.col("attr_t").isNotNull() & (gap <= 604_800_000_000), gap
        ).alias("gap_micros"),
    )


@register(
    "b11_multi_touch_attribution",
    oracle="""
        WITH e AS (
          SELECT user_id, event_id, event_type, epoch_us(ts) AS t
          FROM events WHERE user_id < 200),
        p AS (SELECT user_id, event_id AS purchase_event, t AS pt
              FROM e WHERE event_type = 'purchase'),
        touch AS (SELECT user_id, event_id AS touch_event,
                         event_type AS attr_type, t AS tt
                  FROM e WHERE event_type <> 'purchase'),
        j AS (
          SELECT p.purchase_event, p.user_id, touch.touch_event,
                 touch.attr_type
          FROM p JOIN touch ON p.user_id = touch.user_id
          WHERE touch.tt < p.pt AND p.pt - touch.tt <= 604800000000),
        n AS (SELECT purchase_event, COUNT(*) AS n_touches
              FROM j GROUP BY purchase_event)
        SELECT j.purchase_event, j.user_id, j.touch_event, j.attr_type,
               n.n_touches, 1.0 / n.n_touches AS credit
        FROM j JOIN n USING (purchase_event)
    """,
    tags=("join", "window", "attribution"),
)
def b11_multi_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every purchase splits one unit of
    credit equally across ALL the user's non-purchase events in the
    7-day lookback.  The purchase x touch pairing is an EQUI join on
    user_id with the time range as a residual — pair work is bounded by
    per-user activity within the window, never cross-user, so the join
    scales with users x touches-per-week (the binned-interval trick of
    b07 only becomes necessary when there is no equi key at all).  The
    1/n credit is a single IEEE division — identical in both engines."""
    t = load_tables(spark, sf_dir)
    ev = t["events"].filter(F.col("user_id") < 200).select(
        "user_id",
        "event_id",
        "event_type",
        ts_micros(t["events"]).alias("t"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_event"),
        F.col("t").alias("pt"),
    )
    touch = ev.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("event_id").alias("touch_event"),
        F.col("event_type").alias("attr_type"),
        F.col("t").alias("tt"),
    )
    j = (
        p.join(touch, "user_id")
        .filter(
            (F.col("tt") < F.col("pt"))
            & (F.col("pt") - F.col("tt") <= 604_800_000_000)
        )
        .select("purchase_event", "user_id", "touch_event", "attr_type")
    )
    from pyspark.sql.window import Window

    n = F.count(F.lit(1)).over(Window.partitionBy("purchase_event"))
    return j.select(
        "purchase_event",
        "user_id",
        "touch_event",
        "attr_type",
        n.alias("n_touches"),
        (F.lit(1.0) / n).alias("credit"),
    )


@register(
    "b16_winsorized_stats",
    oracle="""
        WITH r AS (
          SELECT event_type, event_id, value,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                      ORDER BY value, event_id) AS rn,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM events),
        b AS (
          SELECT event_type,
                 MIN(CASE WHEN rn = CAST(ceil(n * 0.1) AS BIGINT)
                          THEN value END) AS lo,
                 MIN(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT)
                          THEN value END) AS hi
          FROM r GROUP BY event_type)
        SELECT r.event_type, COUNT(*) AS n,
               CAST(SUM(CAST(least(greatest(r.value, b.lo), b.hi)
                    AS DECIMAL(14,4))) AS DOUBLE) AS winsorized_sum,
               MIN(b.lo) AS lo, MIN(b.hi) AS hi
        FROM r JOIN b USING (event_type)
        GROUP BY r.event_type ORDER BY r.event_type
    """,
    tags=("stats", "robust"),
)
def b16_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (outlier-clipped) aggregation: per event type, values
    clip to the EXACT rank-based [p10, p90] (the ceil(q*n)-th ordered
    value — no approximate percentile, so the oracle is bit-exact), then
    sum in decimal domain.  The robust-stats primitive for metric
    pipelines where a handful of corrupt meters would otherwise dominate
    a mean.  Per-type windows are bounded; the bounds come back as a
    |types|-row broadcast."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    # asc_nulls_last: Spark default ASC ordering is NULLS FIRST while
    # DuckDB's is NULLS LAST — without pinning, a null-valued row can
    # become the p10 bound on one engine only.
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc_nulls_last(), "event_id"
    )
    r = t["events"].select(
        "event_type",
        "event_id",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .alias("n"),
    )
    b = r.groupBy("event_type").agg(
        F.min(
            F.when(
                F.col("rn") == F.ceil(F.col("n") * 0.1).cast("long"),
                F.col("value"),
            )
        ).alias("lo"),
        F.min(
            F.when(
                F.col("rn") == F.ceil(F.col("n") * 0.9).cast("long"),
                F.col("value"),
            )
        ).alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        r.join(F.broadcast(b), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dbl(F.sum(clipped.cast("decimal(14,4)"))).alias(
                "winsorized_sum"
            ),
            F.min("lo").alias("lo"),
            F.min("hi").alias("hi"),
        )
        .orderBy("event_type")
    )


@register(
    "b17_bad_records",
    oracle="""
        WITH raw AS (
          SELECT event_id,
                 CASE WHEN event_id % 7 = 3 THEN '{broken' || props
                      ELSE props END AS raw
          FROM events
        ),
        parsed AS (
          SELECT event_id,
                 CASE WHEN json_valid(raw)
                      THEN TRY_CAST(json_extract(raw, '$.k') AS BIGINT)
                      ELSE NULL END AS k,
                 NOT json_valid(raw) AS is_bad
          FROM raw
        )
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN is_bad THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_bad,
               CAST(SUM(k) AS BIGINT) AS sum_k
        FROM parsed
    """,
    tags=("json", "quality"),
)
def b17_bad_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record handling on a JSON ingest path (PERMISSIVE
    semantics): a seventh of the payloads are corrupted in-query, parsing
    continues — bad rows surface as nulls and are COUNTED, never crash
    the job, and the good rows still aggregate.  This is the
    dead-letter/quarantine accounting every production ingest needs; at
    scale the is_bad flag becomes the partition key of a quarantine
    sink.  (Alignment boundary: the planted corruption is STRUCTURAL —
    invalid JSON — which both engines classify identically; a
    valid-JSON-but-type-drifted k is quarantined by Spark's PERMISSIVE
    parser while the oracle TRY_CASTs it to NULL without flagging, a
    deliberate engine difference outside this query's corruption
    model.)"""
    t = load_tables(spark, sf_dir)
    raw = t["events"].select(
        "event_id",
        F.when(
            F.col("event_id") % 7 == 3,
            F.concat(F.lit("{broken"), F.col("props")),
        )
        .otherwise(F.col("props"))
        .alias("raw"),
    )
    # PERMISSIVE from_json yields a null-FIELDED struct on malformed
    # input (never a null struct); the canonical bad-row detector is the
    # _corrupt_record side-channel column.
    parsed = raw.select(
        "event_id",
        F.from_json(
            F.col("raw"),
            "k bigint, _corrupt_record string",
            {"columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("j"),
    ).select(
        "event_id",
        F.col("j.k").alias("k"),
        F.col("j._corrupt_record").isNotNull().alias("is_bad"),
    )
    return parsed.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("is_bad"), 1).otherwise(0))
        .cast("long")
        .alias("n_bad"),
        F.sum("k").cast("long").alias("sum_k"),
    )


@register(
    "b17_explode_tokens",
    oracle="""
        SELECT token, COUNT(*) AS n
        FROM (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents)
        WHERE token <> ''
        GROUP BY token
    """,
    tags=("array",),
)
def b17_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode(split(...)) — generator + agg; partial aggregation bounds the
    shuffle to |vocabulary| rows per partition regardless of input size."""
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# B18 — approximate + exact quantiles
# ---------------------------------------------------------------------------


@register(
    "b18_median_manual",
    oracle="""
        WITH ranked AS (
          SELECT l_quantity,
                 ROW_NUMBER() OVER (ORDER BY l_quantity) AS rn,
                 COUNT(*) OVER () AS n
          FROM lineitem
        )
        SELECT CAST(AVG(l_quantity) AS DOUBLE) AS median_qty
        FROM ranked
        WHERE rn IN ((n + 1) / 2, (n + 2) / 2)
    """,
    tags=("quantile",),
)
def b18_median_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median via rank arithmetic (engine-neutral, no interpolation
    ambiguity). duckdb's integer `/` is float division, so the oracle uses
    (n+1)/2 semantics via IN on both integer positions after flooring."""
    t = load_tables(spark, sf_dir)
    w = Window.orderBy("l_quantity")  # global-order-ok: exact-median canonical check; at scale use approx_percentile (docstring)
    ranked = t["lineitem"].select(
        "l_quantity",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),  # global-order-ok: same canonical exact-median check as the rank above
    )
    picked = ranked.filter(
        (F.col("rn") == F.floor((F.col("n") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("n") + 2) / 2))
    )
    return picked.agg(F.avg("l_quantity").cast("double").alias("median_qty"))


@register(
    "b18_approx_distinct",
    oracle="""
        SELECT COUNT(DISTINCT l_suppkey) AS exact_supp,
               TRUE AS hll_within_rsd,
               TRUE AS approx_median_in_band
        FROM lineitem
    """,
    tags=("approx",),
)
def b18_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct + KLL-sketch approximate percentiles,
    hash-checkable: the sketches are approximate but DETERMINISTIC for a
    given input, so the query emits the exact distinct count plus boolean
    error-bound assertions the oracle reproduces as literals —
    ``hll_within_rsd`` (HLL++ estimate within 5x the default 5% rsd of the
    exact count) and ``approx_median_in_band`` (KLL 0.5-quantile between
    the exact 0.45 and 0.55 quantiles; default accuracy 10000 bounds rank
    error to n/10000, far inside the band)."""
    t = load_tables(spark, sf_dir)
    agg = t["lineitem"].agg(
        F.count_distinct("l_suppkey").alias("exact_supp"),
        F.approx_count_distinct("l_suppkey").alias("approx_supp"),
        F.percentile_approx("l_quantity", 0.5).alias("amed"),
        F.expr("percentile(l_quantity, array(0.45, 0.55))").alias("band"),
    )
    return agg.select(
        "exact_supp",
        (
            F.abs(F.col("approx_supp") - F.col("exact_supp"))
            <= 0.25 * F.col("exact_supp")
        ).alias("hll_within_rsd"),
        (
            (F.col("amed") >= F.col("band")[0])
            & (F.col("amed") <= F.col("band")[1])
        ).alias("approx_median_in_band"),
    )


_LPC_M = 16384  # linear-counting bitmap bits per group


@register(
    "b18_linear_counting",
    oracle=f"""
        WITH nn AS (
          SELECT event_type, user_id FROM events WHERE user_id IS NOT NULL
        ),
        b AS (
          SELECT event_type,
                 COUNT(DISTINCT (('0x'||substr(md5('lpc:'||
                     CAST(user_id AS VARCHAR)),1,15))::BIGINT % {_LPC_M}))
                     AS set_bits,
                 COUNT(DISTINCT user_id) AS true_distinct
          FROM nn GROUP BY event_type
        ),
        e AS (
          SELECT event_type, set_bits, true_distinct,
                 CAST(set_bits AS DOUBLE) / {_LPC_M}.0 AS x
          FROM b
        )
        SELECT event_type, set_bits,
               floor({_LPC_M}.0 * x * (1.0 + x / 2.0 + (x * x) / 3.0
                     + (x * x * x) / 4.0 + (x * x * x * x) / 5.0
                     + (x * x * x * x * x) / 6.0)
                     * 1000000.0 + 0.5) / 1000000.0 AS est_distinct,
               true_distinct
        FROM e
        ORDER BY event_type
    """,
    tags=("approx", "sketch"),
)
def b18_linear_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear probabilistic counting (Whang et al., TODS 1990) with an
    EXACT cross-engine twin: per group, each key lights one of
    {_LPC_M} md5-derived bitmap bits; the distinct estimate is
    -m*ln(1 - set_bits/m), evaluated as the 6-term Mercator series so
    both engines run the SAME correctly-rounded IEEE +,*,/ sequence
    instead of their (libm-dependent, last-ulp-divergent) ln.

    Scale shape: the build is groupBy(group, bit) with map-side partial
    distinct — the shuffle is bounded at m rows per partition per group
    no matter how many raw keys arrive, the classic bounded-memory
    distinct sketch (HLL's sibling; Spark's own approx_count_distinct is
    the b18_approx_distinct row).  The exact count rides along for the
    acceptance comparison, as in the CMS/recall evaluations."""
    from ..operators import hashing

    t = load_tables(spark, sf_dir)
    ev = t["events"].filter(F.col("user_id").isNotNull())
    pos = hashing.hash60_expr(
        F.concat(F.lit("lpc:"), F.col("user_id").cast("string"))
    ) % F.lit(_LPC_M)
    b = ev.groupBy("event_type").agg(
        F.count_distinct(pos.alias("p")).alias("set_bits"),
        F.count_distinct("user_id").alias("true_distinct"),
    )
    x = F.col("set_bits").cast("double") / F.lit(float(_LPC_M))
    series = (
        F.lit(1.0)
        + x / F.lit(2.0)
        + (x * x) / F.lit(3.0)
        + (x * x * x) / F.lit(4.0)
        + (x * x * x * x) / F.lit(5.0)
        + (x * x * x * x * x) / F.lit(6.0)
    )
    return b.select(
        "event_type",
        "set_bits",
        numeric.round6_expr(
            F.lit(float(_LPC_M)) * x * series
        ).alias("est_distinct"),
        "true_distinct",
    ).orderBy("event_type")


_KMV_K = 256
_H60_SPAN = float(1 << 60)


@register(
    "b18_kmv_intersection",
    oracle=f"""
        WITH ch AS (
          SELECT DISTINCT ('0x'||substr(md5('kmv:'||
                 CAST(user_id AS VARCHAR)),1,15))::BIGINT AS h
          FROM events WHERE event_type = 'click' AND user_id IS NOT NULL
        ),
        ph AS (
          SELECT DISTINCT ('0x'||substr(md5('kmv:'||
                 CAST(user_id AS VARCHAR)),1,15))::BIGINT AS h
          FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL
        ),
        a AS (SELECT h FROM ch ORDER BY h LIMIT {_KMV_K}),
        b AS (SELECT h FROM ph ORDER BY h LIMIT {_KMV_K}),
        u AS (SELECT h FROM (SELECT h FROM a UNION SELECT h FROM b)
              ORDER BY h LIMIT {_KMV_K}),
        stats AS (
          SELECT (SELECT COUNT(*) FROM u) AS n_u,
                 (SELECT MAX(h) FROM u) AS theta,
                 (SELECT COUNT(*) FROM u
                  WHERE h IN (SELECT h FROM a)
                    AND h IN (SELECT h FROM b)) AS rho,
                 (SELECT COUNT(*) FROM (
                    SELECT h FROM ch UNION SELECT h FROM ph)) AS exact_union,
                 (SELECT COUNT(*) FROM ch
                  WHERE h IN (SELECT h FROM ph)) AS exact_intersection
        )
        SELECT CAST(exact_union AS BIGINT) AS exact_union,
               CAST(exact_intersection AS BIGINT) AS exact_intersection,
               ROUND(CASE WHEN n_u < {_KMV_K} THEN CAST(n_u AS DOUBLE)
                     ELSE ({_KMV_K - 1}.0 * {_H60_SPAN!r})
                          / CAST(theta AS DOUBLE) END, 6) AS est_union,
               ROUND(CASE WHEN n_u < {_KMV_K} THEN CAST(rho AS DOUBLE)
                     ELSE (CAST(rho AS DOUBLE) / {_KMV_K}.0)
                          * (({_KMV_K - 1}.0 * {_H60_SPAN!r})
                             / CAST(theta AS DOUBLE)) END, 6)
                   AS est_intersection
        FROM stats
    """,
    tags=("approx", "sketch"),
)
def b18_kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct sketches with set-operation
    estimation (Beyer et al., SIGMOD 2007) — the join-cardinality
    planning primitive: the k smallest hash values of each key set are
    a mergeable 2 KB summary; the union sketch's k-th value theta
    estimates |A∪B| as (k-1)/(theta/2^60), and the fraction rho/k of
    union-sketch members present in BOTH sketches scales it down to the
    intersection.  Sets: click-users vs purchase-users.

    Scale shape: each sketch is distinct-hash -> global k-smallest
    (TakeOrdered: per-partition partial top-k, merge of k-row partials);
    the sketches collect as models (k longs) and the estimates are
    driver arithmetic on them — identical IEEE ops to the oracle's
    doubles.  Below k distinct values a KMV sketch IS the exact set, and
    both engines switch to the exact branch.  Exact union/intersection
    ride along for acceptance."""
    from ..operators import hashing

    t = load_tables(spark, sf_dir)
    ev = t["events"].filter(F.col("user_id").isNotNull())
    h = hashing.hash60_expr(
        F.concat(F.lit("kmv:"), F.col("user_id").cast("string"))
    ).alias("h")

    def sketch(event_type: str) -> list[int]:
        return [
            r["h"]
            for r in ev.filter(F.col("event_type") == event_type)
            .select(h)
            .distinct()
            .orderBy("h")
            .limit(_KMV_K)
            .collect()
        ]

    a, b = set(sketch("click")), set(sketch("purchase"))
    u = sorted(a | b)[:_KMV_K]
    n_u, rho = len(u), sum(1 for x in u if x in a and x in b)
    if n_u < _KMV_K:
        est_union, est_inter = float(n_u), float(rho)
    else:
        theta = u[-1]
        est_union = ((_KMV_K - 1) * 1.0 * _H60_SPAN) / float(theta)
        est_inter = (float(rho) / float(_KMV_K)) * est_union
    exact = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("user_id")
        .agg(
            F.max(
                (F.col("event_type") == "click").cast("int")
            ).alias("c"),
            F.max(
                (F.col("event_type") == "purchase").cast("int")
            ).alias("p"),
        )
        .agg(
            F.count(F.lit(1)).alias("exact_union"),
            F.coalesce(
                F.sum(
                    ((F.col("c") == 1) & (F.col("p") == 1)).cast("long")
                ),
                F.lit(0).cast("long"),
            ).alias("exact_intersection"),
        )
    )
    return exact.select(
        "exact_union",
        "exact_intersection",
        F.round(F.lit(est_union), 6).alias("est_union"),
        F.round(F.lit(est_inter), 6).alias("est_intersection"),
    )


# ---------------------------------------------------------------------------
# B19 — correlated scalar subquery (TPC-H Q17 shape)
# ---------------------------------------------------------------------------


@register(
    "b19_q17_subquery",
    oracle="""
        WITH perpart AS (
          SELECT l_partkey,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS s,
                 COUNT(*) AS n
          FROM lineitem GROUP BY l_partkey
        )
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE)
                 AS total_price
        FROM lineitem l JOIN perpart p ON l.l_partkey = p.l_partkey
        WHERE CAST(l.l_quantity AS DECIMAL(12,2)) * CAST(5 * p.n AS DECIMAL(12,0))
              < p.s
    """,
    tags=("subquery",),
)
def b19_q17_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 semantics: rows with quantity below 0.2 * per-part average.

    The predicate ``q < 0.2 * s/n`` is rewritten as ``5*q*n < s`` so it runs
    entirely in exact decimal arithmetic (no division) — this is also how a
    correlated scalar subquery decorrelates: aggregate-then-join.
    """
    t = load_tables(spark, sf_dir)
    l = t["lineitem"]
    perpart = l.groupBy("l_partkey").agg(
        F.sum(dec("l_quantity", 12, 2)).cast(DecimalType(18, 2)).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    joined = l.join(perpart, "l_partkey")
    return (
        joined.filter(
            dec("l_quantity", 12, 2) * (F.col("n") * 5).cast(DecimalType(12, 0))
            < F.col("s")
        ).agg(
            F.count(F.lit(1)).alias("n_rows"),
            dbl(F.sum(dec("l_extendedprice", 14, 2))).alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# Multi-way join: TPC-H Q3-shaped (customer ⋈ orders ⋈ lineitem)
# ---------------------------------------------------------------------------


@register(
    "b20_q3_shipping",
    oracle=f"""
        SELECT l_orderkey,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(14,2))
                     * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
               o_orderdate, o_orderpriority
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 20
    """,
    tags=("join", "aggregate"),
)
def b20_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: selective dimension filters push down before the joins;
    AQE converts the filtered customer side to a broadcast when small."""
    t = load_tables(spark, sf_dir)
    one = F.lit(1).cast(DecimalType(4, 2))
    disc_price = (
        dec("l_extendedprice", 14, 2) * (one - dec("l_discount", 4, 2))
    ).cast(DecimalType(18, 4))
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    orders = t["orders"].filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    li = t["lineitem"].filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dbl(F.sum(disc_price)).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate"), F.col("l_orderkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# B4+B8 — TPC-H Q5-style six-table join (local supplier volume)
# ---------------------------------------------------------------------------


@register(
    "b20_q5_local_supplier",
    oracle="""
        SELECT n_name,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(14,2))
                     * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey
          AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey
          AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
        GROUP BY n_name
    """,
    tags=("join", "aggregate"),
)
def b20_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-table join where the region filter prunes through
    two broadcast dimension hops before the fact-fact join; the only big
    shuffle is lineitem x orders on orderkey."""
    t = load_tables(spark, sf_dir)
    one = F.lit(1).cast(DecimalType(4, 2))
    disc_price = (
        dec("l_extendedprice", 14, 2) * (one - dec("l_discount", 4, 2))
    ).cast(DecimalType(18, 4))
    asia_nations = (
        t["nation"]
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    supp = t["supplier"].join(
        F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(dbl(F.sum(disc_price)).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# B19 — correlated EXISTS (TPC-H Q4 shape)
# ---------------------------------------------------------------------------


@register(
    "b19_q4_exists",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 48)
        GROUP BY o_orderpriority
    """,
    tags=("subquery",),
)
def b19_q4_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS decorrelates to a left-semi join;
    the date filter pushes to the orders scan."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 48)
        GROUP BY o_orderpriority
        """
    )


# ---------------------------------------------------------------------------
# B9 — explicit GROUPING SETS
# ---------------------------------------------------------------------------


@register(
    "b09_grouping_sets",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("aggregate",),
)
def b09_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (not expressible as rollup/cube): Spark
    expands to a single Expand + one aggregation pass."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# ---------------------------------------------------------------------------
# B11 — lag / lead over event time
# ---------------------------------------------------------------------------


@register(
    "b11_window_lag_lead",
    oracle="""
        SELECT o_custkey, o_orderkey,
               LAG(o_totalprice) OVER w AS prev_price,
               LEAD(o_totalprice) OVER w AS next_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window",),
)
def b11_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead share one window spec -> one shuffle + one sort."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


# ---------------------------------------------------------------------------
# B17 — VariantType JSON (Spark 4 native binary JSON)
# ---------------------------------------------------------------------------


@register(
    "b17_variant_json",
    oracle="""
        SELECT event_type,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS k_sum,
               COUNT(*) AS n_high
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("json", "variant"),
)
def b17_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON via Spark 4 VARIANT: ``parse_json`` decodes each payload ONCE
    into the binary variant encoding; ``variant_get`` then does typed path
    access without re-parsing — at 100 TB this beats string-path functions
    (`get_json_object`) that re-tokenize the JSON text per extraction
    (SURVEY §1.2: BigQuery JSON -> VariantType on Spark 4.x)."""
    t = load_tables(spark, sf_dir)
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return (
        t["events"]
        .select("event_type", k.alias("k"))
        .filter(F.col("k") > 50)
        .groupBy("event_type")
        .agg(F.sum("k").alias("k_sum"), F.count(F.lit(1)).alias("n_high"))
        .orderBy("event_type")
    )


@register(
    "b17_map_functions",
    oracle="""
        SELECT user_id,
               COUNT(*) FILTER (WHERE event_type = 'click') AS clicks,
               COUNT(*) FILTER (WHERE event_type = 'view') AS views,
               COUNT(DISTINCT event_type) AS n_types
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """,
    tags=("maps",),
)
def b17_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + element access (the B17 map surface):
    per user, build ``map<event_type, count>`` with ``map_from_entries``
    over a collected (type, count) struct array, then read it back with
    ``element_at`` and ``map_keys``.  The map is built AFTER the
    aggregation (one shuffle on user_id; the collected array is
    #event_types long, bounded), never carrying per-event data.
    """
    t = load_tables(spark, sf_dir)
    per_type = (
        t["events"]
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    mapped = (
        per_type.groupBy("user_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("event_type", "c"))
            ).alias("m")
        )
    )
    return mapped.select(
        "user_id",
        F.coalesce(F.element_at("m", "click"), F.lit(0)).alias("clicks"),
        F.coalesce(F.element_at("m", "view"), F.lit(0)).alias("views"),
        F.size(F.map_keys("m")).cast("long").alias("n_types"),
    ).orderBy("user_id")


@register(
    "b15_time_bucket_rollup",
    oracle="""
        WITH e AS (
          SELECT date_trunc('day', ts) AS day_b,
                 date_trunc('hour', ts) AS hour_b,
                 event_type, value
          FROM events
        )
        SELECT CAST(day_b AS TIMESTAMP) AS day_bucket,
               CAST(hour_b AS TIMESTAMP) AS hour_bucket,
               event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS total_value
        FROM e
        GROUP BY GROUPING SETS ((day_b, event_type), (day_b, hour_b, event_type))
        ORDER BY day_bucket, hour_bucket NULLS FIRST, event_type
    """,
    tags=("datetime", "rollup"),
)
def b15_time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: hourly AND daily
    buckets computed in ONE pass with grouping sets over derived
    time-bucket columns (the multi-granularity rollup a time-series store
    materializes).  Catalyst expands the sets with a single shuffle and
    partial aggregation on each grouping — at 100 TB the scan happens
    once, not once per granularity."""
    t = load_tables(spark, sf_dir)
    ts_ts = ts_event_time(t["events"])
    e = t["events"].select(
        F.date_trunc("day", ts_ts).alias("day_b"),
        F.date_trunc("hour", ts_ts).alias("hour_b"),
        "event_type",
        "value",
    )
    return (
        e.groupingSets(
            [["day_b", "event_type"], ["day_b", "hour_b", "event_type"]],
            "day_b", "hour_b", "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            dbl(F.sum(dec("value", 14, 4))).alias("total_value"),
        )
        .select(
            F.col("day_b").alias("day_bucket"),
            F.col("hour_b").alias("hour_bucket"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("day_bucket", F.col("hour_bucket").asc_nulls_first(), "event_type")
    )


@register(
    "b22_batch_sessionize",
    oracle="""
        WITH marks AS (
          SELECT user_id, ts, event_id, value,
                 CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 6 HOUR
                      THEN 0 ELSE 1 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
          SELECT user_id, ts, event_id, value,
                 SUM(new_session) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS session_id
          FROM marks
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               COUNT(*) AS n_events,
               CAST(MIN(ts) AS TIMESTAMP) AS session_start,
               CAST(MAX(ts) AS TIMESTAMP) AS session_end
        FROM sess
        GROUP BY user_id, session_id
        ORDER BY user_id, session_id
    """,
    tags=("sessionization", "window"),
)
def b22_batch_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gap = 6h) via the lag-mark-cumsum idiom: one
    shuffle on user_id that both window passes AND the (user_id,
    session_id) aggregate reuse (partitioning on a key subset satisfies
    the clustering requirement); the only other exchange is the global
    output sort.  The streaming twin is b22_stream_session_window."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    e = t["events"].select(
        "user_id",
        ts_event_time(t["events"]).alias("ts"),
        ts_micros(t["events"]).alias("ts_us"),
        "event_id",
        "value",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.lit(6 * 3600 * 1_000_000).cast("long")
    marks = e.withColumn(
        "new_session",
        F.when(
            F.col("ts_us") - F.lag("ts_us").over(w) <= gap_us,
            F.lit(0),
        ).otherwise(F.lit(1)),
    )
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = marks.withColumn("session_id", F.sum("new_session").over(cum))
    return (
        sess.groupBy("user_id", F.col("session_id").cast("long").alias("session_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_id")
    )


@register(
    "b01_partitioned_layout",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS total_value
        FROM events
        WHERE event_type IN ('click', 'purchase')
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("scan", "layout"),
)
def b01_partitioned_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned-layout round trip: write events hive-partitioned by
    event_type, read back TWO partitions via partition pruning, aggregate.
    The read plan's PartitionFilters carry the event_type predicate, so
    the scan touches 2 directories regardless of table size — the layout
    discipline that turns a 100 TB scan into a 2-partition read.  (The
    write is a per-query temp dir; at production scale the layout already
    exists and only the pruned read runs.)"""
    t = load_tables(spark, sf_dir)
    out = scratch_dir("events_by_type_")
    t["events"].write.partitionBy("event_type").mode("overwrite").parquet(out)
    # Explicit schema on read-back: a zero-row source writes NO partition
    # directories, and schema inference over the empty layout fails with
    # UNABLE_TO_INFER_SCHEMA.  In production the layout's schema comes
    # from the catalog for exactly this reason (caught by the empty-table
    # sweep, tests/test_robustness.py).
    back = spark.read.schema(t["events"].schema).parquet(out)
    pruned = back.filter(F.col("event_type").isin("click", "purchase"))
    # the pruning actually happening is asserted in tests/test_scale_patterns
    return (
        pruned.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dbl(F.sum(dec("value", 14, 4))).alias("total_value"),
        )
        .orderBy("event_type")
    )


_SALT_N = 8


@register(
    "b04_salted_join",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    tags=("join", "skew"),
)
def b04_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted shuffle join (the manual skew-mitigation pattern, proven
    result-identical to the plain join by the oracle): the probe side
    gets a random-free deterministic salt (orderkey % N appended to the
    key), the build side replicates each row across all N salts, and the
    join key becomes (key, salt) — a hot key's rows now spread over N
    reducer partitions instead of one.  AQE's skew-join split does this
    adaptively; the explicit form is for engines/pipelines that pin
    shuffle layouts (e.g. to reuse partitioning downstream).  Cost: build
    side inflates N×, probe side is untouched.
    """
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].withColumn(
        "salt", (F.col("l_orderkey") % _SALT_N).cast("int")
    )
    orders_rep = t["orders"].withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(_SALT_N)]))
    )
    return (
        li.join(
            orders_rep,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (li.salt == orders_rep.salt),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dbl(F.sum(dec("l_quantity", 12, 2))).alias("sum_qty"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "b04_bloom_join_prune",
    oracle="""
        SELECT l_linestatus,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                   AS sum_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY l_linestatus
        ORDER BY l_linestatus
    """,
    tags=("join", "sketch"),
)
def b04_bloom_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning (operators/bloom.py): the fact side
    of a fact-to-filtered-dim join is pre-filtered by a Bloom filter
    built distributedly over the dim keys — the explicit, user-land form
    of Spark's InjectRuntimeFilter, whose size thresholds (10 GB scans)
    only trip at production scale and whose bloom expressions are not
    registered for user code.

    Scale shape: the build's bit_or hash aggregate is bounded at
    BLOOM_WORDS rows per partition regardless of dim size and collects a
    32 KB word-array model; the probe is K codegen'd bit tests against
    that literal before the shuffle, so at 100 TB only ~matching fact
    rows (plus the documented FP tail) pay the exchange.  False
    positives only under-prune; the exact join behind the filter makes
    the result IDENTICAL to the unpruned plan — which is the oracle."""
    from ..operators.bloom import bloom_build, bloom_prune

    t = load_tables(spark, sf_dir)
    dim = t["orders"].filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey")
    words = bloom_build(dim, F.col("o_orderkey").cast("string"))
    fact = t["lineitem"].select(
        "l_orderkey", "l_linestatus", "l_quantity"
    )
    pruned = bloom_prune(
        fact, F.col("l_orderkey").cast("string"), words
    )
    return (
        pruned.join(dim, pruned.l_orderkey == dim.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dbl(F.sum(dec("l_quantity", 12, 2))).alias("sum_qty"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "b04_bucketed_join",
    oracle="""
        SELECT o_orderstatus,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    tags=("join", "layout"),
)
def b04_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-co-located join: both sides written bucketed on the join key
    (8 buckets, sorted), then sort-merge-joined with NO Exchange on either
    side — the zero-shuffle plan is pinned by
    tests/test_scale_patterns.py::test_bucketed_join_has_no_shuffle.  At
    100 TB this is the repeated-join discipline: pay the layout shuffle
    once at write time, join shuffle-free forever after.  (The write goes
    to a per-query temp path; production tables already live bucketed.)"""
    t = load_tables(spark, sf_dir)
    out = scratch_dir("bucketed_join_")
    # per-invocation table names: concurrent runs in one session must not
    # race on a shared catalog entry (the tables are dropped on the next
    # invocation's overwrite anyway, but the names must never collide).
    orders_tbl = unique_name("bq_spark_orders_bucketed")
    lineitem_tbl = unique_name("bq_spark_lineitem_bucketed")
    (
        t["orders"]
        .select("o_orderkey", "o_orderstatus")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", f"{out}/orders")
        .mode("overwrite")
        .saveAsTable(orders_tbl)
    )
    (
        t["lineitem"]
        .select("l_orderkey", "l_quantity")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", f"{out}/lineitem")
        .mode("overwrite")
        .saveAsTable(lineitem_tbl)
    )
    # merge hint keeps the small side out of a broadcast so the bucketed
    # SMJ path (the one that matters at scale) is what actually runs.
    j = (
        spark.table(lineitem_tbl)
        .hint("merge")
        .join(
            spark.table(orders_tbl),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
    )
    return (
        j.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dbl(F.sum(dec("l_quantity", 12, 2))).alias("sum_qty"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "b05_merge_upsert",
    oracle="""
        WITH changes AS (
          SELECT o_orderkey,
                 CAST(o_totalprice * 1.1 AS DOUBLE) AS new_price,
                 (o_orderkey % 10 = 3) AS is_delete
          FROM orders WHERE o_orderkey % 5 IN (0, 3)
        )
        SELECT o.o_orderkey,
               CASE WHEN c.o_orderkey IS NOT NULL THEN c.new_price
                    ELSE CAST(o.o_totalprice AS DOUBLE) END AS o_totalprice,
               (c.o_orderkey IS NOT NULL) AS was_updated
        FROM orders o LEFT JOIN changes c ON o.o_orderkey = c.o_orderkey
        WHERE c.is_delete IS DISTINCT FROM TRUE
        ORDER BY o.o_orderkey
    """,
    tags=("merge", "upsert"),
)
def b05_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE semantics without a table format: apply a change set
    (updates + deletes) to a base table in one left join —
    WHEN MATCHED AND is_delete THEN DELETE / WHEN MATCHED THEN UPDATE /
    ELSE keep.  One shuffle on the merge key; a lakehouse MERGE compiles
    to this same join under the hood, plus file rewrite planning."""
    t = load_tables(spark, sf_dir)
    o = t["orders"]
    changes = (
        o.filter((F.col("o_orderkey") % 5).isin(0, 3))
        .select(
            F.col("o_orderkey").alias("c_orderkey"),
            (F.col("o_totalprice") * 1.1).cast("double").alias("new_price"),
            ((F.col("o_orderkey") % 10) == 3).alias("is_delete"),
        )
    )
    merged = o.join(
        changes, F.col("o_orderkey") == F.col("c_orderkey"), "left"
    )
    return (
        merged.filter(
            F.col("is_delete").isNull() | (F.col("is_delete") == False)  # noqa: E712
        )
        .select(
            "o_orderkey",
            F.when(F.col("c_orderkey").isNotNull(), F.col("new_price"))
            .otherwise(F.col("o_totalprice").cast("double"))
            .alias("o_totalprice"),
            F.col("c_orderkey").isNotNull().alias("was_updated"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "b18_histogram",
    oracle="""
        SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bucket,
               COUNT(*) AS n,
               CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
               CAST(MAX(o_totalprice) AS DOUBLE) AS hi
        FROM orders
        GROUP BY 1
        ORDER BY bucket
    """,
    tags=("profiling",),
)
def b18_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (50k buckets over order totals) — the data
    profiling primitive; integer bucket arithmetic keeps it exact and the
    aggregation map-side combinable."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .groupBy(
            F.floor(F.col("o_totalprice") / F.lit(50000.0))
            .cast("long")
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").cast("double").alias("lo"),
            F.max("o_totalprice").cast("double").alias("hi"),
        )
        .orderBy("bucket")
    )


@register(
    "b16_stats_corr",
    oracle="""
        WITH s AS (
          SELECT COUNT(*) AS n,
                 SUM(CAST(l_quantity AS DECIMAL(20,4))) AS sx,
                 SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS sy,
                 SUM(CAST(l_quantity AS DECIMAL(20,4))
                     * CAST(l_extendedprice AS DECIMAL(20,4))) AS sxy,
                 SUM(CAST(l_quantity AS DECIMAL(20,4))
                     * CAST(l_quantity AS DECIMAL(20,4))) AS sxx,
                 SUM(CAST(l_extendedprice AS DECIMAL(20,4))
                     * CAST(l_extendedprice AS DECIMAL(20,4))) AS syy
          FROM lineitem
        )
        SELECT ROUND(
                 (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 9)
               AS corr_qty_price
        FROM s
    """,
    tags=("stats",),
)
def b16_stats_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation computed from DECIMAL-domain moment sums, then
    combined in one double expression: the built-in ``corr`` streams
    doubles and its result depends on partitioning (non-deterministic
    hash), while decimal partial sums are exact and order-free — the same
    discipline the money aggregates use, extended to second moments."""
    t = load_tables(spark, sf_dir)
    x = dec("l_quantity", 20, 4)
    y = dec("l_extendedprice", 20, 4)
    s = t["lineitem"].agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    return s.select(
        F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            9,
        ).alias("corr_qty_price")
    )


@register(
    "b14_levenshtein",
    oracle="""
        SELECT levenshtein(c_name, replace(c_name, '0', 'O')) AS dist,
               COUNT(*) AS n
        FROM customer
        GROUP BY 1
        ORDER BY dist
    """,
    tags=("string",),
)
def b14_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit distance (both engines implement classic Levenshtein) — the
    fuzzy-matching primitive; distribution of distances between each name
    and its zero->O homoglyph variant.

    Cross-engine caveat (probed, not theoretical): Spark's levenshtein
    counts CHARACTER edits while DuckDB's counts BYTE edits —
    levenshtein('héllo','hallo') is 1 vs 2.  This query is immune by
    construction (the pair differs only in single-byte ASCII chars, so
    char edits == byte edits); do NOT extend it to arbitrary non-ASCII
    pairs without normalizing, or the oracle comparison breaks."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .groupBy(
            F.levenshtein(
                F.col("c_name"), F.regexp_replace("c_name", "0", "O")
            ).alias("dist")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("dist")
    )


@register(
    "b22_session_funnel",
    oracle="""
        WITH marks AS (
          SELECT user_id, ts, event_id, event_type,
                 CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 6 HOUR
                      THEN 0 ELSE 1 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
          SELECT user_id, ts, event_id, event_type,
                 SUM(new_session) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS session_id
          FROM marks
        ),
        s1 AS (
          SELECT *, MIN(CASE WHEN event_type = 'view' THEN ts END)
                     OVER (PARTITION BY user_id, session_id) AS tv
          FROM sess
        ),
        s2 AS (
          SELECT *, MIN(CASE WHEN event_type = 'click' AND ts >= tv
                             THEN ts END)
                     OVER (PARTITION BY user_id, session_id) AS tc
          FROM s1
        ),
        s3 AS (
          SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts >= tc
                             THEN ts END)
                     OVER (PARTITION BY user_id, session_id) AS tp
          FROM s2
        ),
        per_session AS (
          SELECT user_id, session_id,
                 MAX(tv) AS tv, MAX(tc) AS tc, MAX(tp) AS tp
          FROM s3 GROUP BY user_id, session_id
        )
        SELECT COUNT(*) AS n_sessions,
               COUNT(tv) AS reached_view,
               COUNT(tc) AS reached_click,
               COUNT(tp) AS reached_purchase
        FROM per_session
    """,
    tags=("sessionization", "funnel"),
)
def b22_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view -> click -> purchase) within 6h
    sessions: three layered window passes pin each stage's first
    timestamp AFTER the previous stage, then one aggregate counts how
    many sessions reached each stage.  All four window/aggregate steps
    reuse the single user_id shuffle (each key set only narrows), so the
    funnel costs one exchange over the sessionization itself."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    e = t["events"].select(
        "user_id",
        ts_event_time(t["events"]).alias("ts"),
        ts_micros(t["events"]).alias("ts_us"),
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.lit(6 * 3600 * 1_000_000).cast("long")
    marks = e.withColumn(
        "new_session",
        F.when(
            F.col("ts_us") - F.lag("ts_us").over(w) <= gap_us,
            F.lit(0),
        ).otherwise(F.lit(1)),
    )
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = marks.withColumn("session_id", F.sum("new_session").over(cum))
    ws = Window.partitionBy("user_id", "session_id")
    s1 = sess.withColumn(
        "tv", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(ws)
    )
    s2 = s1.withColumn(
        "tc",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") >= F.col("tv")),
                F.col("ts"),
            )
        ).over(ws),
    )
    s3 = s2.withColumn(
        "tp",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") >= F.col("tc")),
                F.col("ts"),
            )
        ).over(ws),
    )
    per_session = s3.groupBy("user_id", "session_id").agg(
        F.max("tv").alias("tv"), F.max("tc").alias("tc"), F.max("tp").alias("tp")
    )
    return per_session.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.count("tv").alias("reached_view"),
        F.count("tc").alias("reached_click"),
        F.count("tp").alias("reached_purchase"),
    )


@register(
    "b15_cohort_retention",
    oracle="""
        WITH firsts AS (
          SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
          FROM events GROUP BY user_id
        ),
        activity AS (
          SELECT DISTINCT e.user_id, f.cohort_day,
                 date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
          FROM events e JOIN firsts f ON e.user_id = f.user_id
        )
        SELECT cohort_day, day_offset, COUNT(*) AS active_users
        FROM activity
        WHERE day_offset IN (0, 1, 7, 14)
        GROUP BY cohort_day, day_offset
        ORDER BY cohort_day, day_offset
    """,
    tags=("datetime", "cohort"),
)
def b15_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, counted when
    active again at day offsets 0/1/7/14.  Two aggregations on the same
    user_id shuffle (first-day then distinct-activity); the retention
    matrix itself is |cohorts| x |offsets| — tiny at any corpus size."""
    t = load_tables(spark, sf_dir)
    ev = t["events"].select(
        "user_id", ts_event_time(t["events"]).cast("date").alias("day")
    )
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("day_offset").isin(0, 1, 7, 14))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("active_users"))
        .orderBy("cohort_day", "day_offset")
    )


@register(
    "b11_window_ntile",
    oracle="""
        SELECT o_orderkey,
               NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile,
               ROUND(PERCENT_RANK() OVER (ORDER BY o_totalprice, o_orderkey),
                     9) AS pr,
               ROUND(CUME_DIST() OVER (ORDER BY o_totalprice, o_orderkey),
                     9) AS cd
        FROM orders
        ORDER BY o_orderkey
    """,
    tags=("window",),
)
def b11_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (ntile / percent_rank / cume_dist)
    with a fully-deterministic ordering (price, then key).  Global-order
    windows single-partition by construction — at scale this shape is
    used per-group (partitionBy) or replaced by approx quantiles; the
    canonical form here checks semantics."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    w = Window.orderBy("o_totalprice", "o_orderkey")  # global-order-ok: canonical ntile semantics check; at-scale substitute documented above
    return (
        t["orders"]
        .select(
            "o_orderkey",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 9).alias("pr"),
            F.round(F.cume_dist().over(w), 9).alias("cd"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "b16_user_entropy",
    oracle="""
        WITH c AS (
          SELECT user_id, event_type, COUNT(*) AS n
          FROM events GROUP BY user_id, event_type
        ),
        tot AS (
          SELECT user_id, SUM(n) AS total FROM c GROUP BY user_id
        )
        SELECT c.user_id,
               ROUND(-SUM((CAST(c.n AS DOUBLE) / tot.total)
                          * ln(CAST(c.n AS DOUBLE) / tot.total))
                     + 0.0, 9) AS behavior_entropy
        FROM c JOIN tot ON c.user_id = tot.user_id
        GROUP BY c.user_id
        ORDER BY c.user_id
    """,
    tags=("stats", "entropy"),
)
def b16_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type distribution — the
    behavioral-diversity feature.  Two-level aggregation on one user_id
    shuffle; per-term p*ln(p) sums over at most |event_types| terms per
    user, and DuckDB's SUM over the same grouped terms adds them in the
    same per-group order, so the 9dp round absorbs nothing but noise."""
    t = load_tables(spark, sf_dir)
    c = (
        t["events"]
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = c.groupBy("user_id").agg(F.sum("n").alias("total"))
    p = F.col("n").cast("double") / F.col("total").cast("double")
    return (
        c.join(tot, "user_id")
        .groupBy("user_id")
        .agg(
            # + 0.0 normalizes the degenerate single-type user's -0.0
            # (IEEE: -0.0 + 0.0 = +0.0) BEFORE the round: DuckDB's
            # round preserves the sign of zero, Spark's BigDecimal
            # path cannot produce one — repr-distinct to the driver
            # hash on any data containing a zero-entropy user
            F.round(-F.sum(p * F.log(p)) + F.lit(0.0), 9).alias(
                "behavior_entropy"
            )
        )
        .orderBy("user_id")
    )


@register(
    "b22_event_transitions",
    oracle="""
        WITH seq AS (
          SELECT user_id, event_type,
                 LEAD(event_type) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id) AS next_type
          FROM events
        )
        SELECT event_type AS from_type, next_type AS to_type,
               COUNT(*) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY 1, 2
        ORDER BY from_type, to_type
    """,
    tags=("sessionization", "markov"),
)
def b22_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-transition matrix (the Markov-chain view of user behavior):
    LEAD over each user's time-ordered stream, then count (from, to)
    pairs.  One shuffle on user_id for the sequence window; the
    transition aggregate is |event_types|^2 rows."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        ts_event_time(t["events"]), "event_id"
    )
    seq = t["events"].select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    return (
        seq.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("from_type", "to_type")
    )


@register(
    "b17_array_setops",
    oracle="""
        WITH u AS (
          SELECT user_id,
                 list_sort(list_distinct(list(event_type))) AS types
          FROM events GROUP BY user_id
        )
        SELECT user_id,
               COALESCE(list_aggr(types, 'string_agg', ','), '') AS types,
               COALESCE(list_aggr(list_sort(list_intersect(types,
                   ['click', 'purchase', 'refund'])),
                   'string_agg', ','), '') AS monetary,
               CAST(len(list_filter(types,
                   t -> NOT list_contains(['click', 'purchase', 'refund'], t)))
                   AS BIGINT) AS n_other
        FROM u
        ORDER BY user_id
    """,
    tags=("arrays",),
)
def b17_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra (intersect / except via filter / distinct+sort):
    each user's distinct event-type set intersected with a monetary
    reference set.  Arrays are sorted before comparison so results are
    partition-order-independent, then joined to comma-strings so every
    output column is a driver-sortable scalar (pandas canonicalizers
    cannot sort ndarray cells) — semantics unchanged, the string IS the
    sorted set."""
    t = load_tables(spark, sf_dir)
    ref = F.array(F.lit("click"), F.lit("purchase"), F.lit("refund"))
    u = (
        t["events"]
        .groupBy("user_id")
        .agg(F.array_sort(F.array_distinct(F.collect_list("event_type"))).alias("types_arr"))
    )
    return u.select(
        "user_id",
        F.array_join("types_arr", ",").alias("types"),
        F.array_join(F.array_sort(F.array_intersect("types_arr", ref)), ",").alias("monetary"),
        F.size(F.array_except("types_arr", ref)).cast("long").alias("n_other"),
    ).orderBy("user_id")


@register(
    "b11_window_range_frame",
    oracle="""
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
                   AS DOUBLE) AS trailing_30d
        FROM orders
        ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
    tags=("window", "range-frame"),
)
def b11_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per customer, the trailing-30-day order
    total — the frame is bounded by VALUE distance on the ordering
    column, not row count, so bursty customers aggregate a varying number
    of rows.  Decimal sums keep the running aggregate order-free.  One
    shuffle on o_custkey."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    o = t["orders"].select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        dec("o_totalprice", 18, 2).alias("p"),
        F.unix_date(F.col("o_orderdate").cast("date")).alias("dday"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("dday")
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum("p").over(w).cast("double").alias("trailing_30d"),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


@register(
    "b10_dedup_keep_latest",
    oracle="""
        SELECT user_id, event_id AS latest_event,
               CAST(ts AS TIMESTAMP) AS latest_ts, value
        FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                      ORDER BY ts DESC, event_id DESC) AS rn
          FROM events
        ) WHERE rn = 1
        ORDER BY user_id
    """,
    tags=("dedup", "cdc"),
)
def b10_dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest-per-key (the CDC changelog-compaction primitive: the
    newest record wins, ties broken by the higher event id).  Plain
    ``dropDuplicates`` keeps an ARBITRARY row per key; ordered survival
    needs the row_number formulation, which is one shuffle + one in-
    partition sort.  This is also how a snapshot view materializes from
    an append-only changelog."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        t["events"]
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("latest_event"),
            ts_event_time(t["events"]).alias("latest_ts"),
            "value",
        )
        .orderBy("user_id")
    )


@register(
    "b01_compaction",
    oracle="""
        SELECT CAST(64 AS BIGINT) AS files_before,
               CAST(4 AS BIGINT) AS files_after,
               (SELECT COUNT(*) FROM events) AS n_rows,
               (SELECT CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE)
                FROM events) AS total_value
    """,
    tags=("scan", "layout", "maintenance"),
)
def b01_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction (the OPTIMIZE/maintenance primitive): a
    64-small-file table is rewritten into 4 right-sized files with one
    repartition, and the content round-trips exactly (row count + decimal
    value sum proven against the source table).  Small files are the #1
    silent killer of 100 TB scans — per-file open/footer costs and
    task-scheduling overhead dominate once files drop below ~100 MB; a
    production compactor picks the target count from bytes/file instead
    of a literal 4, with identical plan shape."""
    t = load_tables(spark, sf_dir)
    out = scratch_dir("compaction_")
    # the oracle hardcodes files_before=64 / files_after=4, which requires
    # >=64 rows so every repartition output partition is non-empty; fail
    # loudly at the precondition instead of mysteriously in the hash.
    n_events = t["events"].count()
    if n_events < 64:
        raise ValueError(
            f"b01_compaction needs >=64 events rows for the 64-file "
            f"layout oracle; got {n_events} at {sf_dir}"
        )
    t["events"].repartition(64).write.mode("overwrite").parquet(f"{out}/small")
    small = spark.read.parquet(f"{out}/small")
    files_before = len(small.inputFiles())
    small.repartition(4).write.mode("overwrite").parquet(f"{out}/compact")
    compact = spark.read.parquet(f"{out}/compact")
    files_after = len(compact.inputFiles())
    return compact.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dbl(F.sum(dec("value", 14, 4))).alias("total_value"),
    ).select(
        F.lit(files_before).cast("long").alias("files_before"),
        F.lit(files_after).cast("long").alias("files_after"),
        "n_rows",
        "total_value",
    )


@register(
    "b15_gap_fill_locf",
    oracle="""
        WITH daily AS (
          SELECT user_id, date_trunc('day', ts) AS day,
                 COUNT(*) AS n, SUM(CAST(value AS DECIMAL(14,4))) AS v
          FROM events WHERE user_id < 20
          GROUP BY 1, 2
        ),
        bounds AS (SELECT user_id, MIN(day) AS mn, MAX(day) AS mx
                   FROM daily GROUP BY user_id),
        spine AS (SELECT user_id,
                         unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day
                  FROM bounds),
        j AS (SELECT s.user_id, s.day, d.n, d.v
              FROM spine s LEFT JOIN daily d USING (user_id, day))
        SELECT user_id, CAST(day AS TIMESTAMP) AS day,
               CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
               CAST(last_value(v IGNORE NULLS) OVER (
                    PARTITION BY user_id ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS locf_value,
               (n IS NULL) AS was_gap
        FROM j
    """,
    tags=("datetime", "timeseries"),
)
def b15_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling with last-observation-carried-forward (the
    hypertable ``locf``/``time_bucket_gapfill`` idiom): build each user's
    dense daily spine with a generate-side sequence explode (no shuffle to
    create the missing rows), left-join the real daily aggregates, and
    carry the last non-null value forward with an IGNORE NULLS window.
    Aggregates are decimal-domain so the carried values are order-free
    exact.  Per-user windows are bounded by that user's day span — no
    global single-partition window anywhere."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    ev = t["events"].filter(F.col("user_id") < 20)
    day = F.date_trunc("day", ts_event_time(t["events"]))
    daily = ev.groupBy("user_id", day.alias("day")).agg(
        F.count(F.lit(1)).alias("n"), F.sum(dec("value", 14, 4)).alias("v")
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
        .select(
            "user_id",
            F.explode(
                F.sequence(F.col("mn"), F.col("mx"), F.expr("interval 1 day"))
            ).alias("day"),
        )
    )
    j = spine.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        "day",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        F.last("v", ignorenulls=True).over(w).cast("double").alias("locf_value"),
        F.col("n").isNull().alias("was_gap"),
    )


@register(
    "b19_null_semantics",
    oracle="""
        WITH probe AS (
          SELECT DISTINCT CASE WHEN user_id % 7 = 0 THEN NULL
                               ELSE user_id END AS u
          FROM events WHERE user_id < 30),
        base AS (SELECT DISTINCT user_id FROM events)
        SELECT
          (SELECT COUNT(*) FROM base
           WHERE user_id IN (SELECT u FROM probe)) AS n_in,
          (SELECT COUNT(*) FROM base
           WHERE user_id NOT IN (SELECT u FROM probe)) AS n_not_in,
          (SELECT COUNT(*) FROM base b
           WHERE NOT EXISTS (SELECT 1 FROM probe p
                             WHERE p.u = b.user_id)) AS n_not_exists
    """,
    tags=("subquery", "semantics"),
)
def b19_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN null trap, pinned as a query: when the probe set
    contains a NULL, ``NOT IN`` is never TRUE (x <> NULL is UNKNOWN, and
    UNKNOWN AND ... stays UNKNOWN), so ``n_not_in`` is 0 while the
    intended anti-join semantics live in ``NOT EXISTS`` — the single most
    common silent-wrong-answer migration bug between engines.  Both
    engines run the identical ANSI three-valued logic, so the oracle
    pins that this engine DOESN'T diverge on it.  Plan shape: IN/EXISTS
    compile to (broadcast) semi/anti joins; NOT IN with a nullable probe
    compiles to the null-aware anti join — all probe-sized builds."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH probe AS (
          SELECT DISTINCT CASE WHEN user_id % 7 = 0 THEN NULL
                               ELSE user_id END AS u
          FROM events WHERE user_id < 30),
        base AS (SELECT DISTINCT user_id FROM events)
        SELECT
          (SELECT COUNT(*) FROM base
           WHERE user_id IN (SELECT u FROM probe)) AS n_in,
          (SELECT COUNT(*) FROM base
           WHERE user_id NOT IN (SELECT u FROM probe)) AS n_not_in,
          (SELECT COUNT(*) FROM base b
           WHERE NOT EXISTS (SELECT 1 FROM probe p
                             WHERE p.u = b.user_id)) AS n_not_exists
        """
    )


_RECURSIVE_CTE_SQL = """
    WITH RECURSIVE h(custkey, depth) AS (
      SELECT c_custkey, 0 FROM customer WHERE c_custkey = 0
      UNION ALL
      SELECT c.c_custkey, h.depth + 1
      FROM customer c
      JOIN h ON CAST(FLOOR((c.c_custkey - 1) / 2) AS BIGINT) = h.custkey
      WHERE c.c_custkey > 0
    )
    SELECT h.depth,
           COUNT(*) AS n_members,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_acctbal
    FROM h JOIN customer c ON c.c_custkey = h.custkey
    GROUP BY h.depth
"""


@register(
    "b19_recursive_cte",
    oracle=_RECURSIVE_CTE_SQL,
    tags=("subquery", "recursive"),
)
def b19_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4's WITH RECURSIVE): hierarchy traversal over
    the implicit referral tree parent(c) = floor((c-1)/2) rooted at
    customer 0, rolled up per depth with decimal-domain balance sums.
    Identical ANSI SQL runs on both engines (FLOOR before the BIGINT
    cast — DuckDB's double->BIGINT cast rounds while Spark's truncates).

    Scale shape: the recursion runs ceil(log2(n_customers)) iterations
    — each one equi-join of the frontier (one tree level) against the
    customer table, so total work is O(n log n) joins with frontier-
    sized builds; depth grows only logarithmically with the table (14
    levels at sf0.1, 24 at a trillion rows), far under the engine's
    recursion ceiling.  The reference ecosystem expresses this with
    Flink iterations; Spark 4 makes it a declarative query."""
    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_CTE_SQL)


@register(
    "b11_cumulative_distinct",
    oracle="""
        WITH marked AS (
          SELECT event_id, user_id, ts,
                 CASE WHEN ROW_NUMBER() OVER (
                          PARTITION BY user_id, event_type
                          ORDER BY ts, event_id) = 1
                      THEN 1 ELSE 0 END AS is_new
          FROM events)
        SELECT event_id, user_id,
               CAST(SUM(is_new) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS n_types_seen
        FROM marked
    """,
    tags=("window",),
)
def b11_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over a window — an aggregate Spark (and
    ANSI SQL) cannot express directly in a window frame: mark each row as
    the FIRST occurrence of its (user, event_type) with one keyed
    row_number, then a plain cumulative SUM of the marks gives the
    distinct-so-far count (the feature-engineering staple "how many
    distinct behaviors had this user shown by event N").  Two per-user
    windows, both on the same (ts, event_id) total order — one shuffle by
    user key, never a global window; the distinct state never materializes
    as a set, so memory per row is O(1) at any cardinality."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    mts = ts_micros(t["events"])
    wf = Window.partitionBy("user_id", "event_type").orderBy(
        "mts", "event_id"
    )
    wc = (
        Window.partitionBy("user_id")
        .orderBy("mts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = t["events"].withColumn("mts", mts).select(
        "event_id",
        "user_id",
        "mts",
        F.when(F.row_number().over(wf) == 1, F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_new"),
    )
    return marked.select(
        "event_id",
        "user_id",
        F.sum("is_new").over(wc).cast("long").alias("n_types_seen"),
    )


@register(
    "b16_mann_whitney",
    oracle="""
        WITH base AS (
          SELECT event_type AS g, value AS v,
                 CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS in_a
          FROM events WHERE value IS NOT NULL),
        vals AS (
          SELECT g, v, COUNT(*) AS cnt,
                 CAST(SUM(in_a) AS BIGINT) AS cnt_a
          FROM base GROUP BY g, v),
        ranked AS (
          SELECT g, v, cnt, cnt_a,
                 COALESCE(SUM(cnt) OVER (PARTITION BY g ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS cum_before
          FROM vals),
        agg AS (
          SELECT g,
                 CAST(SUM(cnt_a) AS BIGINT) AS n_a,
                 CAST(SUM(cnt - cnt_a) AS BIGINT) AS n_b,
                 CAST(SUM(cnt_a * (2 * cum_before + cnt + 1)) AS BIGINT)
                     AS r2_a,
                 CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT) AS tie_term
          FROM ranked GROUP BY g),
        stat AS (
          SELECT g, n_a, n_b,
                 CAST(r2_a AS DOUBLE) / 2
                 - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1) / 2 AS ua,
                 CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) AS nab,
                 CAST(n_a + n_b AS DOUBLE) AS nn,
                 CAST(tie_term AS DOUBLE) AS tt
          FROM agg)
        SELECT g AS event_type, n_a, n_b,
               ROUND(ua, 6) AS u_a,
               ROUND(nab - ua, 6) AS u_b,
               CASE WHEN nab > 0
                         AND nab / 12 * ((nn + 1) - tt / (nn * (nn - 1))) > 0
                    THEN
                 floor((ua - nab / 2)
                       / sqrt(nab / 12 * ((nn + 1) - tt / (nn * (nn - 1))))
                       * 1000000.0 + 0.5) / 1000000.0
               END AS z
        FROM stat
    """,
    tags=("stats", "abtest"),
)
def b16_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U — the rank-based (distribution-free) twin of
    b16_ab_welch_ttest, with midrank tie handling and the tie-corrected
    normal approximation z.  All rank arithmetic stays INTEGER-exact:
    midranks enter doubled (2*cum_before + cnt + 1, always integral), so
    the rank sum is a plain BIGINT sum — no order-dependent float
    accumulation anywhere; doubles appear once per OUTPUT row.  Scale
    shape: ranks are computed over the per-group DISTINCT-VALUE relation
    (one map-side-combinable count, then a window over the compressed
    value histogram — never over raw rows), the same compression that
    makes b18_percentile_histogram scale; a continuous metric at 100 TB
    gets bucketed first (same shape, coarser values)."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    base = (
        t["events"]
        .filter(F.col("value").isNotNull())
        .select(
            F.col("event_type").alias("g"),
            F.col("value").alias("v"),
            F.when(F.col("user_id") % 2 == 0, F.lit(1))
            .otherwise(F.lit(0))
            .alias("in_a"),
        )
    )
    vals = base.groupBy("g", "v").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("in_a").cast("long").alias("cnt_a"),
    )
    wc = Window.partitionBy("g").orderBy("v")
    ranked = vals.select(
        "g",
        "cnt",
        "cnt_a",
        F.coalesce(
            F.sum("cnt").over(
                wc.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("cum_before"),
    )
    agg = ranked.groupBy("g").agg(
        F.sum("cnt_a").cast("long").alias("n_a"),
        F.sum(F.col("cnt") - F.col("cnt_a")).cast("long").alias("n_b"),
        F.sum(
            F.col("cnt_a")
            * (2 * F.col("cum_before") + F.col("cnt") + 1)
        )
        .cast("long")
        .alias("r2_a"),
        F.sum(
            F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        )
        .cast("long")
        .alias("tie_term"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ua = F.col("r2_a").cast("double") / 2 - na * (na + 1) / 2
    nab = na * nb
    nn = (F.col("n_a") + F.col("n_b")).cast("double")
    tt = F.col("tie_term").cast("double")
    sig2 = nab / 12 * ((nn + 1) - tt / (nn * (nn - 1)))
    # all-tied or one-armed groups have zero variance: NULL z in BOTH
    # engines (unguarded 0/0 is NULL in Spark, NaN in DuckDB)
    z = F.when(
        (nab > 0) & (sig2 > 0),
        numeric.round6_expr((ua - nab / 2) / F.sqrt(sig2)),
    )
    return agg.select(
        F.col("g").alias("event_type"),
        "n_a",
        "n_b",
        F.round(ua, 6).alias("u_a"),
        F.round(nab - ua, 6).alias("u_b"),
        z.alias("z"),
    )


@register(
    "b16_benford_audit",
    oracle="""
        WITH d AS (
          SELECT event_type,
                 CAST(floor(abs(value)
                      / pow(10, floor(log10(abs(value))))) AS BIGINT)
                     AS digit
          FROM events WHERE value > 0),
        c AS (SELECT event_type, digit, COUNT(*) AS n
              FROM d GROUP BY 1, 2),
        t AS (SELECT event_type, SUM(n) AS total FROM c GROUP BY 1)
        SELECT c.event_type, c.digit, c.n,
               floor(CAST(c.n AS DOUBLE) / CAST(t.total AS DOUBLE)
                     * 1000000.0 + 0.5) / 1000000.0 AS observed_frac,
               ROUND(log10(1 + 1.0 / CAST(c.digit AS DOUBLE)), 6)
                   AS benford_frac,
               ROUND(pow(CAST(c.n AS DOUBLE) / CAST(t.total AS DOUBLE)
                         - log10(1 + 1.0 / CAST(c.digit AS DOUBLE)), 2)
                     / log10(1 + 1.0 / CAST(c.digit AS DOUBLE))
                     * CAST(t.total AS DOUBLE), 6) AS chi2_term
        FROM c JOIN t USING (event_type)
    """,
    tags=("stats", "audit"),
)
def b16_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit audit per event_type — the
    fraud/data-quality screen: observed digit fractions against Benford's
    log10(1+1/d) expectation, with each digit's chi-square contribution so
    a reviewer can see WHERE conformance breaks (synthetic uniform values
    rightly fail it; the query's job is to flag, not to pass).  The digit
    comes from pure double arithmetic (floor/log10/pow — identical IEEE
    ops both engines), never from string formatting.  Scale shape: one
    map-side-combinable count per (type, digit) — 9 rows per type — then a
    broadcast-sized totals join; a 100 TB audit is one pass."""
    t = load_tables(spark, sf_dir)
    v = F.abs(F.col("value"))
    digit = F.floor(v / F.pow(F.lit(10.0), F.floor(F.log10(v)))).cast("long")
    c = (
        t["events"]
        .filter(F.col("value") > 0)
        .select("event_type", digit.alias("digit"))
        .groupBy("event_type", "digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = c.groupBy("event_type").agg(F.sum("n").alias("total"))
    obs = F.col("n").cast("double") / F.col("total").cast("double")
    ben = F.log10(F.lit(1) + F.lit(1.0) / F.col("digit").cast("double"))
    return c.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "digit",
        "n",
        numeric.round6_expr(obs).alias("observed_frac"),
        F.round(ben, 6).alias("benford_frac"),
        F.round(
            F.pow(obs - ben, 2) / ben * F.col("total").cast("double"), 6
        ).alias("chi2_term"),
    )


@register(
    "b16_ab_welch_ttest",
    oracle="""
        WITH m AS (
          SELECT event_type,
                 COUNT(*) FILTER (user_id % 2 = 0) AS na,
                 COUNT(*) FILTER (user_id % 2 = 1) AS nb,
                 SUM(CAST(value AS DECIMAL(14,4)))
                     FILTER (user_id % 2 = 0) AS sa,
                 SUM(CAST(value AS DECIMAL(14,4)))
                     FILTER (user_id % 2 = 1) AS sb,
                 SUM(CAST(value AS DECIMAL(14,4)) * CAST(value AS DECIMAL(14,4)))
                     FILTER (user_id % 2 = 0) AS ssa,
                 SUM(CAST(value AS DECIMAL(14,4)) * CAST(value AS DECIMAL(14,4)))
                     FILTER (user_id % 2 = 1) AS ssb
          FROM events WHERE value IS NOT NULL GROUP BY event_type),
        d AS (
          SELECT event_type, na, nb,
                 CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) AS ma,
                 CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS mb,
                 (CAST(ssa AS DOUBLE)
                  - CAST(na AS DOUBLE) * (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE))
                    * (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)))
                 / (CAST(na AS DOUBLE) - 1) AS va,
                 (CAST(ssb AS DOUBLE)
                  - CAST(nb AS DOUBLE) * (CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
                    * (CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)))
                 / (CAST(nb AS DOUBLE) - 1) AS vb
          FROM m)
        SELECT event_type,
               CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
               floor(ma * 1000000.0 + 0.5) / 1000000.0 AS mean_a,
               floor(mb * 1000000.0 + 0.5) / 1000000.0 AS mean_b,
               CASE WHEN na > 1 AND nb > 1
                         AND va / CAST(na AS DOUBLE)
                             + vb / CAST(nb AS DOUBLE) > 0 THEN
                 floor((ma - mb)
                       / sqrt(va / CAST(na AS DOUBLE)
                              + vb / CAST(nb AS DOUBLE))
                       * 1000000.0 + 0.5) / 1000000.0
               END AS t_stat,
               CASE WHEN na > 1 AND nb > 1
                         AND va / CAST(na AS DOUBLE)
                             + vb / CAST(nb AS DOUBLE) > 0 THEN
                 floor(pow(va / CAST(na AS DOUBLE)
                           + vb / CAST(nb AS DOUBLE), 2)
                       / (pow(va / CAST(na AS DOUBLE), 2)
                          / (CAST(na AS DOUBLE) - 1)
                          + pow(vb / CAST(nb AS DOUBLE), 2)
                            / (CAST(nb AS DOUBLE) - 1))
                       * 1000000.0 + 0.5) / 1000000.0
               END AS welch_df
        FROM d
    """,
    tags=("stats", "abtest"),
)
def b16_ab_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: Welch's unequal-variance t-statistic and
    Welch-Satterthwaite degrees of freedom per event_type, arms split by
    user-id parity (the deterministic stand-in for an assignment hash).
    Everything reduces to FIVE exact decimal moments per (metric, arm) —
    n, sum(value), sum(value^2) — computed in ONE map-side-combinable hash
    aggregate with conditional (FILTER) aggregation, so the statistic is
    order-free exact: the only double arithmetic happens once per OUTPUT
    row, identically in both engines.  This is the experimentation-platform
    pattern at any scale — a 100 TB A/B readout is still a one-pass moment
    sweep, never a per-row t-test."""
    v = dec("value", 14, 4)
    a = F.col("user_id") % 2 == 0
    b = F.col("user_id") % 2 == 1
    t = load_tables(spark, sf_dir)
    m = (
        t["events"]
        .filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.when(a, F.lit(1))).alias("na"),
            F.count(F.when(b, F.lit(1))).alias("nb"),
            F.sum(F.when(a, v)).alias("sa"),
            F.sum(F.when(b, v)).alias("sb"),
            F.sum(F.when(a, v * v)).alias("ssa"),
            F.sum(F.when(b, v * v)).alias("ssb"),
        )
    )
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    ma = F.col("sa").cast("double") / na
    mb = F.col("sb").cast("double") / nb
    va = (F.col("ssa").cast("double") - na * ma * ma) / (na - 1)
    vb = (F.col("ssb").cast("double") - nb * mb * mb) / (nb - 1)
    se2 = va / na + vb / nb
    # degenerate arms (n<=1 or zero pooled variance) yield NULL in BOTH
    # engines — an unguarded 0/0 is NULL in Spark but NaN in DuckDB
    ok = (F.col("na") > 1) & (F.col("nb") > 1) & (se2 > 0)
    t_stat = (ma - mb) / F.sqrt(se2)
    welch_df = F.pow(se2, 2) / (
        F.pow(va / na, 2) / (na - 1) + F.pow(vb / nb, 2) / (nb - 1)
    )
    return m.select(
        "event_type",
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        numeric.round6_expr(ma).alias("mean_a"),
        numeric.round6_expr(mb).alias("mean_b"),
        F.when(ok, numeric.round6_expr(t_stat)).alias("t_stat"),
        F.when(ok, numeric.round6_expr(welch_df)).alias("welch_df"),
    )


@register(
    "b15_gaps_islands",
    oracle="""
        WITH daily AS (
          SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
        ),
        numbered AS (
          SELECT user_id, day,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rn
          FROM daily
        ),
        grp AS (
          SELECT user_id, day,
                 date_diff('day', TIMESTAMP '1970-01-01', day) - rn AS island
          FROM numbered
        )
        SELECT user_id,
               CAST(MIN(day) AS TIMESTAMP) AS streak_start,
               CAST(MAX(day) AS TIMESTAMP) AS streak_end,
               COUNT(*) AS streak_days
        FROM grp GROUP BY user_id, island
    """,
    tags=("datetime", "timeseries"),
)
def b15_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's maximal runs of consecutive active
    days (the classic retention-streak query; hypertable/warehouse idiom).
    The row_number-minus-epoch-day trick turns consecutiveness into a
    constant group key, so islands fall out of one per-user window plus
    one hash aggregate.  Scale shape: the window partitions by user_id
    (bounded by a user's distinct active days, never global), and only
    (user_id, day) pairs — already distinct-reduced map-side — cross the
    shuffle."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    day = F.date_trunc("day", ts_event_time(t["events"]))
    daily = t["events"].select("user_id", day.alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    grp = daily.select(
        "user_id",
        "day",
        (
            F.datediff(F.col("day"), F.lit("1970-01-01").cast("timestamp"))
            - F.row_number().over(w)
        ).alias("island"),
    )
    return grp.groupBy("user_id", "island").agg(
        F.min("day").alias("streak_start"),
        F.max("day").alias("streak_end"),
        F.count(F.lit(1)).alias("streak_days"),
    ).drop("island")


@register(
    "b15_gap_fill_interpolate",
    oracle="""
        WITH daily AS (
          SELECT user_id, date_trunc('day', ts) AS day,
                 COUNT(*) AS n, SUM(CAST(value AS DECIMAL(14,4))) AS v
          FROM events WHERE user_id < 20
          GROUP BY 1, 2
        ),
        bounds AS (SELECT user_id, MIN(day) AS mn, MAX(day) AS mx
                   FROM daily GROUP BY user_id),
        spine AS (SELECT user_id,
                         unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day
                  FROM bounds),
        j AS (SELECT s.user_id, s.day, d.n, d.v
              FROM spine s LEFT JOIN daily d USING (user_id, day)),
        ctx AS (
          SELECT user_id, day, n, v,
                 last_value(v IGNORE NULLS) OVER wp AS prev_v,
                 last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
                     OVER wp AS prev_day,
                 first_value(v IGNORE NULLS) OVER wn AS next_v,
                 first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
                     OVER wn AS next_day
          FROM j
          WINDOW wp AS (PARTITION BY user_id ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 wn AS (PARTITION BY user_id ORDER BY day
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT user_id, CAST(day AS TIMESTAMP) AS day,
               CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
               floor((CASE WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
                     ELSE CAST(prev_v AS DOUBLE)
                          + (CAST(next_v AS DOUBLE) - CAST(prev_v AS DOUBLE))
                            * (CAST(date_diff('day', prev_day, day) AS DOUBLE)
                               / CAST(date_diff('day', prev_day, next_day)
                                      AS DOUBLE))
                     END) * 1000000.0 + 0.5) / 1000000.0 AS interp_value,
               (n IS NULL) AS was_gap
        FROM ctx
    """,
    tags=("datetime", "timeseries"),
)
def b15_gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling by LINEAR INTERPOLATION (the hypertable
    ``interpolate`` idiom, complementing b15_gap_fill_locf's carry-forward):
    gap days take prev + (next - prev) * elapsed/span between the nearest
    observed days on either side.  Both neighbors always exist because the
    spine is bounded by each user's observed min/max day.  Exactness: the
    daily sums are decimal-domain (order-free); the interpolation itself is
    one double expression evaluated identically in both engines and rounded
    to 6dp.  Scale shape: per-user windows only (a user's day span), spine
    rows are generated row-locally by a sequence explode — no shuffle
    creates the gap rows."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    ev = t["events"].filter(F.col("user_id") < 20)
    day = F.date_trunc("day", ts_event_time(t["events"]))
    daily = ev.groupBy("user_id", day.alias("day")).agg(
        F.count(F.lit(1)).alias("n"), F.sum(dec("value", 14, 4)).alias("v")
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
        .select(
            "user_id",
            F.explode(
                F.sequence(F.col("mn"), F.col("mx"), F.expr("interval 1 day"))
            ).alias("day"),
        )
    )
    j = spine.join(daily, ["user_id", "day"], "left")
    wp = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    # anchors key on v (the VALUE being interpolated), not n: an observed
    # day whose daily sum is NULL must not advance the day anchor while
    # the value anchor (IGNORE NULLS over v) stays on an earlier day —
    # mismatched anchors would skew the interpolation fraction
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    ctx = j.select(
        "user_id",
        "day",
        "n",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("prev_v"),
        F.last(obs_day, ignorenulls=True).over(wp).alias("prev_day"),
        F.first("v", ignorenulls=True).over(wn).alias("next_v"),
        F.first(obs_day, ignorenulls=True).over(wn).alias("next_day"),
    )
    frac = F.datediff(F.col("day"), F.col("prev_day")).cast(
        "double"
    ) / F.datediff(F.col("next_day"), F.col("prev_day")).cast("double")
    interp = F.col("prev_v").cast("double") + (
        F.col("next_v").cast("double") - F.col("prev_v").cast("double")
    ) * frac
    return ctx.select(
        "user_id",
        "day",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        numeric.round6_expr(
            F.when(F.col("v").isNotNull(), F.col("v").cast("double")).otherwise(
                interp
            )
        ).alias("interp_value"),
        F.col("n").isNull().alias("was_gap"),
    )


@register(
    "b10_snapshot_diff",
    oracle="""
        WITH old AS (SELECT doc_id, md5(text) AS h FROM documents),
        new AS (
          SELECT doc_id,
                 md5(CASE WHEN doc_id % 13 = 2 THEN text || ' v2'
                          ELSE text END) AS h
          FROM documents WHERE doc_id % 17 <> 3
          UNION ALL
          SELECT doc_id + 100000 AS doc_id,
                 md5('new doc ' || CAST(doc_id AS VARCHAR)) AS h
          FROM documents WHERE doc_id % 19 = 5
        )
        SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
               CASE WHEN o.doc_id IS NULL THEN 'added'
                    WHEN n.doc_id IS NULL THEN 'removed'
                    WHEN o.h <> n.h THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM old o FULL JOIN new n ON o.doc_id = n.doc_id
    """,
    tags=("diff", "cdc"),
)
def b10_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff: classify every doc across two corpus versions
    as added / removed / changed / unchanged.  Each side reduces to
    (doc_id, content-md5) BEFORE the full outer join, so only 8-byte ids
    and 32-char hashes cross the shuffle — never document text.  This is
    the between-crawl-snapshots audit primitive; the "new" snapshot is
    derived in-query (drop %17==3, edit %13==2, add %19==5) so the diff
    is deterministic and oracle-checkable."""
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    old = docs.select("doc_id", F.md5(F.col("text")).alias("h"))
    new = (
        docs.filter(F.col("doc_id") % 17 != 3)
        .select(
            "doc_id",
            F.md5(
                F.when(
                    F.col("doc_id") % 13 == 2, F.concat(F.col("text"), F.lit(" v2"))
                ).otherwise(F.col("text"))
            ).alias("h"),
        )
        .unionAll(
            docs.filter(F.col("doc_id") % 19 == 5).select(
                (F.col("doc_id") + 100000).alias("doc_id"),
                F.md5(
                    F.concat(F.lit("new doc "), F.col("doc_id").cast("string"))
                ).alias("h"),
            )
        )
    )
    o, n = old.alias("o"), new.alias("n")
    return o.join(n, F.col("o.doc_id") == F.col("n.doc_id"), "full").select(
        F.coalesce(F.col("o.doc_id"), F.col("n.doc_id")).alias("doc_id"),
        F.when(F.col("o.doc_id").isNull(), F.lit("added"))
        .when(F.col("n.doc_id").isNull(), F.lit("removed"))
        .when(F.col("o.h") != F.col("n.h"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )


@register(
    "b10_delete_propagation",
    oracle="""
        WITH keys AS (SELECT c_custkey AS k FROM customer
                      WHERE c_custkey % 97 = 13),
        ev AS (SELECT 'events' AS tbl, COUNT(*) AS rows_before,
                      COUNT(*) FILTER (WHERE user_id IN
                          (SELECT k FROM keys)) AS rows_purged
               FROM events),
        cu AS (SELECT 'customer' AS tbl, COUNT(*) AS rows_before,
                      COUNT(*) FILTER (WHERE c_custkey IN
                          (SELECT k FROM keys)) AS rows_purged
               FROM customer),
        od AS (SELECT 'orders' AS tbl, COUNT(*) AS rows_before,
                      COUNT(*) FILTER (WHERE o_custkey IN
                          (SELECT k FROM keys)) AS rows_purged
               FROM orders)
        SELECT tbl, CAST(rows_before AS BIGINT) AS rows_before,
               CAST(rows_purged AS BIGINT) AS rows_purged,
               CAST(rows_before - rows_purged AS BIGINT) AS rows_after
        FROM (SELECT * FROM ev UNION ALL SELECT * FROM cu
              UNION ALL SELECT * FROM od) u
        ORDER BY tbl
    """,
    tags=("governance", "delete"),
)
def b10_delete_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten sweep: one subject-key list propagates
    through every table that references the subject (events by user_id,
    customer by c_custkey, orders by o_custkey), reporting the audit
    counts a deletion job must produce before rewriting.  The key list
    broadcasts — each table pays ONE scan with a map-side membership
    probe, no shuffle anywhere (the actual purge is the same plan with
    the probe negated feeding an overwrite, cf. b01_compaction's rewrite
    shape).  At 100 TB this is the only viable shape: N tables x one
    linear pass each."""
    t = load_tables(spark, sf_dir)
    keys = t["customer"].filter(F.col("c_custkey") % 97 == 13).select(
        F.col("c_custkey").alias("k")
    )

    def audit(df: DataFrame, col: str, tbl: str) -> DataFrame:
        probed = df.join(
            F.broadcast(keys), df[col] == F.col("k"), "left"
        )
        return probed.agg(
            F.lit(tbl).alias("tbl"),
            F.count(F.lit(1)).alias("rows_before"),
            F.count(F.col("k")).alias("rows_purged"),
            (F.count(F.lit(1)) - F.count(F.col("k"))).alias("rows_after"),
        )

    return (
        audit(t["events"], "user_id", "events")
        .unionByName(audit(t["customer"], "c_custkey", "customer"))
        .unionByName(audit(t["orders"], "o_custkey", "orders"))
        .orderBy("tbl")
    )


@register(
    "b01_source_formats",
    oracle="""
        SELECT fmt,
               (SELECT COUNT(*) FROM documents) AS n,
               (SELECT CAST(SUM(length(text)) AS BIGINT) FROM documents)
                   AS sum_chars,
               (SELECT COUNT(DISTINCT source) FROM documents) AS n_sources
        FROM (VALUES ('csv'), ('json'), ('orc'), ('parquet')) t(fmt)
        ORDER BY fmt
    """,
    tags=("scan", "formats"),
)
def b01_source_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-format fidelity: the documents table round-trips through
    every built-in columnar/row codec (CSV with quoting, JSON lines, ORC)
    and each read-back must produce the identical corpus aggregate as the
    parquet original — one output row per format.  CSV/JSON reads carry an
    explicit schema (schema inference is a full extra pass at 100 TB and
    is banned here); ORC/parquet carry their own."""
    import os
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    root = scratch_dir("src_formats_")
    frames = []
    for fmt in ("csv", "json", "orc", "parquet"):
        path = os.path.join(root, fmt)
        if fmt == "parquet":
            back = docs
        else:
            w = docs.write.format(fmt).mode("overwrite")
            if fmt == "csv":
                w = w.option("header", "true").option("escape", '"')
            w.save(path)
            r = spark.read.format(fmt)
            if fmt == "csv":
                # multiLine + explicit escape so quoted embedded newlines
                # round-trip (multiLine makes CSV files unsplittable — at
                # 100 TB prefer a structured codec; CSV here is fidelity
                # coverage, not the scale path)
                r = (
                    r.option("header", "true")
                    .option("multiLine", "true")
                    .option("escape", '"')
                    .schema(schema)
                )
            elif fmt == "json":
                r = r.schema(schema)
            back = r.load(path)
        frames.append(
            back.agg(
                F.lit(fmt).alias("fmt"),
                F.count(F.lit(1)).alias("n"),
                F.sum(F.length("text")).cast("long").alias("sum_chars"),
                F.countDistinct("source").alias("n_sources"),
            ).select("fmt", "n", "sum_chars", "n_sources")
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out.orderBy("fmt")


@register(
    "b04_skew_profile",
    oracle="""
        WITH c AS (SELECT user_id, COUNT(*) AS c FROM events GROUP BY 1)
        SELECT CAST(length(bin(c)) - 1 AS BIGINT) AS bucket_log2,
               COUNT(*) AS n_keys,
               CAST(SUM(c) AS BIGINT) AS n_rows,
               MAX(c) AS max_key_rows
        FROM c
        GROUP BY 1
    """,
    tags=("join", "diagnostics"),
)
def b04_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key SKEW PROFILE: the log2 histogram of per-key row counts
    that decides whether a shuffle join needs salting (b04_salted_join)
    or AQE skew splitting (pinned in test_scale_patterns.py).  Two-level
    aggregation: the per-key count is the only pass over the fact table
    (map-side partials), the histogram then aggregates the far smaller
    per-key table.  All arithmetic is integer (length(bin(c)) - 1 ==
    floor(log2(c)) with no float edge cases), so the profile is exact on
    both engines at any scale.  At 100 TB this is the cheap pre-flight a
    pipeline runs before choosing its join strategy; a long tail in the
    top buckets = salt or skew-split before the big join."""
    t = load_tables(spark, sf_dir)
    counts = t["events"].groupBy("user_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    return counts.groupBy(
        (F.length(F.bin("c")) - 1).cast("long").alias("bucket_log2")
    ).agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("c").cast("long").alias("n_rows"),
        F.max("c").alias("max_key_rows"),
    )


@register(
    "b14_fuzzy_join",
    oracle="""
        WITH names AS (SELECT DISTINCT p_name FROM part),
        dirty AS (
          SELECT p_name AS dirty_src,
                 substr(p_name, 1, 4) ||
                     replace(substr(p_name, 5), 'e', '3') AS dirty_name
          FROM names),
        matched AS (
          SELECT d.dirty_name, n.p_name AS clean_name,
                 CAST(levenshtein(d.dirty_name, n.p_name) AS BIGINT) AS dist
          FROM dirty d
          JOIN names n
            ON substr(d.dirty_name, 1, 4) = substr(n.p_name, 1, 4)
           AND abs(length(d.dirty_name) - length(n.p_name)) <= 2
          WHERE levenshtein(d.dirty_name, n.p_name) <= 2)
        SELECT dirty_name, clean_name, dist FROM matched
    """,
    tags=("string", "join"),
)
def b14_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOCKED fuzzy string join (entity resolution): reconcile a dirty
    name dictionary (deterministic '3'-for-'e' typos past the prefix)
    against the clean dictionary by edit distance <= 2 — but only within
    (4-char-prefix, length-band) blocks, so the quadratic levenshtein
    work is confined to tiny buckets instead of |dirty| x |clean|.  At
    100 TB the dictionaries join as any equi-join on the block key
    (shuffle or broadcast), and block sizing (longer prefixes, q-gram
    blocking) is the recall/cost knob.  The block join runs through
    operators/skew.py::capped_blocked_join, so a degenerate blocking key
    (every name sharing one prefix) salts into bounded slices instead of
    pinning the whole quadratic verify on one task; the documented
    pre-flight is block_size_profile on the same key (the
    b04_skew_profile rule: a long tail in the top log2 buckets = lower
    the cap or lengthen the prefix).  ASCII-only corruption keeps the
    char-vs-byte levenshtein caveat (see b14_levenshtein) inert."""
    from ..operators.skew import capped_blocked_join

    t = load_tables(spark, sf_dir)
    names = t["part"].select("p_name").distinct()
    dirty = names.select(
        F.concat(
            F.substring("p_name", 1, 4),
            F.regexp_replace(F.expr("substring(p_name, 5)"), "e", "3"),
        ).alias("dirty_name")
    )
    blocked = capped_blocked_join(
        dirty.withColumn("_blk", F.substring("dirty_name", 1, 4)),
        names.withColumn("_blk", F.substring("p_name", 1, 4)),
        ["_blk"],
    ).filter(F.abs(F.length("dirty_name") - F.length("p_name")) <= 2)
    return (
        blocked.withColumn(
            "dist", F.levenshtein("dirty_name", "p_name").cast("long")
        )
        .filter(F.col("dist") <= 2)
        .select("dirty_name", F.col("p_name").alias("clean_name"), "dist")
    )


# ---------------------------------------------------------------------------
# B1/B4 — multi-dimensional layout + runtime partition pruning (round 7)
# ---------------------------------------------------------------------------

_Z_BITS = 16  # per-dimension code width; 2 dims interleave into 32 bits
_Z_BOX_CUST = (10, 120)          # custkey box edge (non-empty at sf0.001+)
_Z_BOX_DAY = (365, 730)          # 1996 calendar year as day index
_Z_EPOCH = "1995-01-01"


def _zvalue_col(x: F.Column, y: F.Column) -> F.Column:
    """Morton (Z-order) interleave of two 16-bit codes, JVM-side.

    Bit i of x lands at position 2i, bit i of y at 2i+1; the 32 terms
    have disjoint bits so plain addition assembles the code inside one
    whole-stage-codegen span (no UDF).  Each extracted bit casts to LONG
    BEFORE the shift: shifting an INT by 31 lands on the 32-bit sign bit
    (z(0, 32768) would come out negative and diverge from _zvalue_py).
    """
    terms = []
    for i in range(_Z_BITS):
        terms.append(
            F.shiftleft(
                F.shiftright(x, i).bitwiseAND(F.lit(1)).cast("long"), 2 * i
            )
        )
        terms.append(
            F.shiftleft(
                F.shiftright(y, i).bitwiseAND(F.lit(1)).cast("long"),
                2 * i + 1,
            )
        )
    z = terms[0]
    for term in terms[1:]:
        z = z + term
    return z.cast("long")


def _zvalue_py(x: int, y: int) -> int:
    """Python reference of :func:`_zvalue_col` (test + bound literals)."""
    z = 0
    for i in range(_Z_BITS):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@register(
    "b01_zorder_layout",
    oracle=f"""
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
                   AS total_price
        FROM orders
        WHERE o_custkey BETWEEN {_Z_BOX_CUST[0]} AND {_Z_BOX_CUST[1]}
          AND datediff('day', DATE '{_Z_EPOCH}', o_orderdate)
              BETWEEN {_Z_BOX_DAY[0]} AND {_Z_BOX_DAY[1]}
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    tags=("scan", "layout"),
)
def b01_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER clustering for multi-dimensional data skipping: orders are
    rewritten sorted by the Morton interleave of (custkey, order day), so
    every parquet file's zvalue min/max covers a tight 2-D tile and a 2-D
    box query prunes most files from their footer stats alone — the layout
    trick (Delta/Iceberg OPTIMIZE ZORDER) that turns a 100 TB two-column
    box scan into a handful of file reads when neither column alone is
    selective enough to partition by.

    The read path applies the box's Z-RANGE BOUND first — for any box,
    z(xmin,ymin) <= z(x,y) <= z(xmax,ymax) for every point inside, by
    per-coordinate monotonicity of the Morton code — as a BETWEEN on the
    stored zvalue column (prunable from parquet stats), then the exact
    box residual.  The oracle is the plain box aggregate, so a wrong
    interleave or a wrong bound (dropping rows) fails the hash gate;
    file-level skipping is measured in tests/test_scale_patterns.py.
    """
    t = load_tables(spark, sf_dir)
    xcode = F.pmod(F.col("o_custkey"), F.lit(1 << _Z_BITS)).cast("int")
    ycode = F.pmod(
        F.datediff(F.col("o_orderdate"), F.lit(_Z_EPOCH)),
        F.lit(1 << _Z_BITS),
    ).cast("int")
    out = scratch_dir("orders_zorder_")
    zdf = t["orders"].withColumn("zvalue", _zvalue_col(xcode, ycode))
    (
        zdf.repartitionByRange(8, "zvalue")
        .sortWithinPartitions("zvalue")
        .write.mode("overwrite")
        .parquet(out)
    )
    zlo = _zvalue_py(_Z_BOX_CUST[0], _Z_BOX_DAY[0])
    zhi = _zvalue_py(_Z_BOX_CUST[1], _Z_BOX_DAY[1])
    # explicit schema: a zero-row source writes no data files and
    # inference over the empty layout fails (the b01_partitioned_layout
    # empty-table lesson)
    back = spark.read.schema(zdf.schema).parquet(out)
    boxed = (
        back.filter(F.col("zvalue").between(zlo, zhi))  # stat-prunable
        .filter(
            F.col("o_custkey").between(*_Z_BOX_CUST)
            & F.datediff(F.col("o_orderdate"), F.lit(_Z_EPOCH)).between(
                *_Z_BOX_DAY
            )
        )
    )
    return (
        boxed.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dbl(F.sum(dec("o_totalprice", 14, 2))).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


_DPP_ENGAGEMENT = ("click", "view")


@register(
    "b04_dpp_join",
    oracle=f"""
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS total_value
        FROM events
        WHERE event_type IN {_DPP_ENGAGEMENT!r}
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("join", "layout"),
)
def b04_dpp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition pruning: the fact table is laid out partitioned
    by event_type, and the pruning predicate is NOT a literal — it comes
    from joining a dimension filtered at runtime (category =
    'engagement').  Catalyst plants a DynamicPruningExpression in the
    fact scan's PartitionFilters fed by the dim's broadcast, so only the
    dimension-selected partitions are listed/read — the star-schema scan
    pattern that at 100 TB reads two date partitions instead of seven
    years because the filter lives on the dim.  Static-literal pruning is
    b01_partitioned_layout; the plan shape (DynamicPruningExpression
    present) is pinned in tests/test_scale_patterns.py."""
    t = load_tables(spark, sf_dir)
    out = scratch_dir("events_dpp_")
    t["events"].write.partitionBy("event_type").mode("overwrite").parquet(out)
    fact = spark.read.schema(t["events"].schema).parquet(out)
    dim = (
        t["events"]
        .select("event_type")
        .distinct()
        .withColumn(
            "category",
            F.when(
                F.col("event_type").isin(*_DPP_ENGAGEMENT), "engagement"
            ).otherwise("conversion"),
        )
    )
    pruned = fact.join(
        F.broadcast(dim.filter(F.col("category") == "engagement")),
        "event_type",
    )
    return (
        pruned.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dbl(F.sum(dec("value", 14, 4))).alias("total_value"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# B16 — per-group OLS regression from exact decimal moments (round 7)
# ---------------------------------------------------------------------------


@register(
    "b16_group_regression",
    oracle="""
        WITH m AS (
          SELECT l_returnflag,
                 COUNT(*) AS n,
                 SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sx,
                 SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS sy,
                 SUM(CAST(l_quantity AS DECIMAL(12,2))
                     * CAST(l_quantity AS DECIMAL(12,2))) AS sxx,
                 SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                     * CAST(l_extendedprice AS DECIMAL(14,2))) AS syy,
                 SUM(CAST(l_quantity AS DECIMAL(12,2))
                     * CAST(l_extendedprice AS DECIMAL(14,2))) AS sxy
          FROM lineitem GROUP BY l_returnflag),
        d AS (
          SELECT l_returnflag, n,
                 CAST(n AS DOUBLE) AS nd,
                 CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
                 CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd,
                 CAST(sxy AS DOUBLE) AS sxyd
          FROM m)
        SELECT l_returnflag,
               CAST(n AS BIGINT) AS n,
               floor((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
                     * 1000000.0 + 0.5) / 1000000.0 AS slope,
               floor((syd - (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
                      * sxd) / nd * 1000000.0 + 0.5) / 1000000.0
                   AS intercept,
               floor((nd * sxyd - sxd * syd)
                     / sqrt((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd))
                     * 1000000.0 + 0.5) / 1000000.0 AS corr_xy
        FROM d
        ORDER BY l_returnflag
    """,
    tags=("math",),
)
def b16_group_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS (price ~ quantity) computed from EXACT decimal
    moment sums: the five sufficient statistics (Sx, Sy, Sxx, Syy, Sxy)
    accumulate in the decimal domain — order-independent under any
    partitioning, map-side combinable, one shuffle of 5 numbers per
    group — then slope/intercept/correlation evaluate driver-free in
    IEEE double from identical operand values on both engines.  This is
    the closed-form regression a 100 TB feature pipeline uses instead of
    an iterative solver: moments are a single HashAggregate pass however
    large the fact table, and adding a dimension only widens the tiny
    moment row (reference-spirit: the metrics-aggregation discipline of
    SURVEY §2 B16, exactness rules of functions/numeric.py)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    x = dec("l_quantity", 12, 2)
    y = dec("l_extendedprice", 14, 2)
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxxd, syyd = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxyd = F.col("sxy").cast("double")
    slope = (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
    return m.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        numeric.round6_expr(slope).alias("slope"),
        numeric.round6_expr((syd - slope * sxd) / nd).alias("intercept"),
        numeric.round6_expr(
            (nd * sxyd - sxd * syd)
            / F.sqrt((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd))
        ).alias("corr_xy"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# B7 — point-in-time (feature-store) join (round 7)
# ---------------------------------------------------------------------------


@register(
    "b07_point_in_time_join",
    oracle="""
        WITH hist AS (
          SELECT user_id, event_id AS profile_event_id,
                 CAST(value AS DOUBLE) AS profile_value,
                 CAST(ts AS TIMESTAMP) AS valid_from,
                 LEAD(CAST(ts AS TIMESTAMP)) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
          FROM events WHERE event_type = 'purchase'),
        obs AS (
          SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS obs_time
          FROM events WHERE event_type = 'click' AND user_id < 50)
        SELECT o.event_id, o.user_id, o.obs_time,
               h.profile_event_id, h.profile_value,
               (h.profile_event_id IS NOT NULL) AS had_profile
        FROM obs o LEFT JOIN hist h
          ON h.user_id = o.user_id
         AND h.valid_from <= o.obs_time
         AND (h.valid_to IS NULL OR o.obs_time < h.valid_to)
    """,
    tags=("join", "scd", "temporal"),
)
def b07_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store POINT-IN-TIME join: every observation (click) is
    enriched with the dimension version that was valid AT ITS OWN event
    time — the SCD2 history (purchase feed intervalized via LEAD, the
    b05_scd2_intervals machinery) joined on the key plus an interval
    residual, LEFT so observations before any version surface
    had_profile=false instead of leaking a future value.  This is the
    training-serving-skew guard: a model feature computed this way never
    sees data newer than the observation.  Scale shape: equi-join on
    user_id (both sides co-partition on the key, one shuffle each), the
    interval predicate rides along as a residual filter, and each
    observation matches at most one version by construction — no
    row explosion, no window over the fact table."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    ts_ts = ts_event_time(t["events"])
    w = Window.partitionBy("user_id").orderBy(ts_ts, F.col("event_id"))
    hist = (
        t["events"]
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("profile_event_id"),
            F.col("value").cast("double").alias("profile_value"),
            ts_ts.alias("valid_from"),
            F.lead(ts_ts).over(w).alias("valid_to"),
        )
    )
    obs = (
        t["events"]
        .filter((F.col("event_type") == "click") & (F.col("user_id") < 50))
        .select("event_id", "user_id", ts_ts.alias("obs_time"))
    )
    j = obs.join(
        hist,
        (hist.user_id == obs.user_id)
        & (hist.valid_from <= obs.obs_time)
        & (hist.valid_to.isNull() | (obs.obs_time < hist.valid_to)),
        "left",
    )
    return j.select(
        obs.event_id,
        obs.user_id,
        "obs_time",
        "profile_event_id",
        "profile_value",
        F.col("profile_event_id").isNotNull().alias("had_profile"),
    )


# ---------------------------------------------------------------------------
# B18 — histogram-interpolated percentiles (round 7)
# ---------------------------------------------------------------------------

_PH_W = 25.0  # bucket width over events.value (observed domain 0..~500)


@register(
    "b18_percentile_histogram",
    oracle=f"""
        WITH base AS (
          SELECT event_type AS g, CAST(value AS DOUBLE) AS v
          FROM events WHERE value IS NOT NULL),
        tot AS (SELECT g, COUNT(*) AS n FROM base GROUP BY g),
        hist AS (
          SELECT g, CAST(FLOOR(v / {_PH_W}) AS BIGINT) AS bucket,
                 COUNT(*) AS cnt
          FROM base GROUP BY 1, 2),
        cum AS (
          SELECT g, bucket, cnt,
                 SUM(cnt) OVER (PARTITION BY g ORDER BY bucket) AS cum,
                 COALESCE(SUM(cnt) OVER (PARTITION BY g ORDER BY bucket
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS cum_before
          FROM hist),
        qual AS (
          SELECT c.g, t.n, p.p, c.bucket, c.cnt, c.cum_before,
                 ROW_NUMBER() OVER (PARTITION BY c.g, p.p
                                    ORDER BY c.bucket) AS rn
          FROM cum c
          JOIN tot t ON c.g = t.g
          CROSS JOIN (VALUES (CAST(0.50 AS DOUBLE)), (CAST(0.90 AS DOUBLE)),
                              (CAST(0.99 AS DOUBLE))) AS p(p)
          WHERE CAST(c.cum AS DOUBLE) >= p.p * CAST(t.n AS DOUBLE))
        SELECT g AS event_type, CAST(n AS BIGINT) AS n, p,
               floor((bucket * {_PH_W}
                     + {_PH_W} * (p * CAST(n AS DOUBLE)
                                  - CAST(cum_before AS DOUBLE))
                       / CAST(cnt AS DOUBLE)) * 1000000.0 + 0.5)
                   / 1000000.0 AS value_est
        FROM qual WHERE rn = 1
    """,
    tags=("profiling", "sketch"),
)
def b18_percentile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase percentile estimation — the way percentiles are actually
    computed at 100 TB: one map-side-combinable pass builds a per-group
    equi-width histogram (bounded rows however large the fact table),
    then p50/p90/p99 interpolate linearly inside the first bucket whose
    cumulative count crosses the target rank.  No global sort, no
    per-group row windows over the data — the only window runs over the
    tiny histogram itself.  Estimates are deterministic (integer counts
    + identical IEEE interpolation), so unlike approx_percentile's
    merge-order-dependent sketch this is bit-stable under any
    partitioning AND oracle-checkable; accuracy is bounded by the bucket
    width (refine = second targeted pass over one bucket, same shape)."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    base = (
        t["events"]
        .filter(F.col("value").isNotNull())
        .select(
            F.col("event_type").alias("g"),
            F.col("value").cast("double").alias("v"),
        )
    )
    tot = base.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    hist = base.groupBy(
        "g", F.floor(F.col("v") / F.lit(_PH_W)).cast("long").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    wc = Window.partitionBy("g").orderBy("bucket")
    cum = hist.select(
        "g",
        "bucket",
        "cnt",
        F.sum("cnt").over(wc).alias("cum"),
        F.coalesce(
            F.sum("cnt").over(
                wc.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("cum_before"),
    )
    ps = spark.createDataFrame([(0.50,), (0.90,), (0.99,)], "p double")
    qual = (
        cum.join(F.broadcast(tot), "g")
        .crossJoin(F.broadcast(ps))
        .filter(
            F.col("cum").cast("double") >= F.col("p") * F.col("n").cast("double")
        )
    )
    wr = Window.partitionBy("g", "p").orderBy("bucket")
    return (
        qual.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            F.col("g").alias("event_type"),
            F.col("n").cast("long").alias("n"),
            "p",
            numeric.round6_expr(
                F.col("bucket") * F.lit(_PH_W)
                + F.lit(_PH_W)
                * (
                    F.col("p") * F.col("n").cast("double")
                    - F.col("cum_before").cast("double")
                )
                / F.col("cnt").cast("double")
            ).alias("value_est"),
        )
    )


# ---------------------------------------------------------------------------
# B22 — conversion latency by acquisition cohort (round 7)
# ---------------------------------------------------------------------------

_WEEK_US = 7 * 86_400 * 1_000_000


@register(
    "b22_conversion_latency",
    oracle=f"""
        WITH e AS (
          SELECT user_id, event_type, epoch_us(ts) AS t FROM events
          WHERE event_type IN ('click', 'purchase')),
        u AS (
          SELECT user_id,
                 MIN(CASE WHEN event_type = 'click' THEN t END) AS fc,
                 MIN(CASE WHEN event_type = 'purchase' THEN t END) AS fp
          FROM e GROUP BY user_id),
        c AS (
          SELECT user_id, fc, fp,
                 (fp IS NOT NULL AND fp > fc) AS converted,
                 fc // {_WEEK_US} AS cohort_week
          FROM u WHERE fc IS NOT NULL)
        SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
               COUNT(*) AS n_users,
               CAST(COALESCE(SUM(CASE WHEN converted THEN 1 ELSE 0 END), 0)
                    AS BIGINT) AS n_converted,
               floor(CAST(COALESCE(SUM(CASE WHEN converted THEN 1 ELSE 0 END),
                          0) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                     * 1000000.0 + 0.5) / 1000000.0 AS conversion_rate,
               CASE WHEN SUM(CASE WHEN converted THEN 1 ELSE 0 END) > 0
                    THEN floor((CAST(SUM(CASE WHEN converted
                                            THEN fp - fc ELSE 0 END)
                                     AS DOUBLE) / 1000000.0)
                               / CAST(SUM(CASE WHEN converted THEN 1 ELSE 0
                                          END) AS DOUBLE)
                               * 1000000.0 + 0.5) / 1000000.0
                    END AS avg_latency_s
        FROM c GROUP BY cohort_week ORDER BY cohort_week
    """,
    tags=("funnel", "analytics"),
)
def b22_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert by acquisition cohort: each user's FIRST click
    anchors their cohort week (integer micros div — no calendar-function
    cross-engine hazard) and their first strictly-later purchase marks
    conversion; per cohort the report carries user count, conversion
    rate and mean click->purchase latency in seconds.  The funnel
    completes b22's session/transition family with the latency dimension
    product analytics actually pages on.  Scale shape: one conditional-
    min groupBy(user_id) pass (map-combinable), then a cohort rollup of
    the tiny per-user table — integer micros end-to-end, the double
    division only on final model-sized aggregates."""
    t = load_tables(spark, sf_dir)
    e = (
        t["events"]
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(
            "user_id",
            "event_type",
            ts_micros(t["events"]).alias("t"),
        )
    )
    u = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("t"))).alias("fc"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("t"))
        ).alias("fp"),
    )
    c = (
        u.filter(F.col("fc").isNotNull())
        .withColumn(
            "converted", F.col("fp").isNotNull() & (F.col("fp") > F.col("fc"))
        )
        .withColumn("cohort_week", F.expr(f"fc div {_WEEK_US}"))
    )
    conv = F.when(F.col("converted"), 1).otherwise(0)
    lat = F.when(F.col("converted"), F.col("fp") - F.col("fc")).otherwise(0)
    g = c.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.coalesce(F.sum(conv), F.lit(0)).cast("long").alias("n_converted"),
        F.sum(lat).alias("lat_total"),
    )
    return g.select(
        F.col("cohort_week").cast("long").alias("cohort_week"),
        "n_users",
        "n_converted",
        numeric.round6_ratio_expr(
            F.col("n_converted"), F.col("n_users")
        ).alias("conversion_rate"),
        F.when(
            F.col("n_converted") > 0,
            numeric.round6_expr(
                (F.col("lat_total").cast("double") / F.lit(1_000_000.0))
                / F.col("n_converted").cast("double")
            ),
        ).alias("avg_latency_s"),
    ).orderBy("cohort_week")
