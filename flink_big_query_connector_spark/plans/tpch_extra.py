"""Extended relational surface: TPC-H-derived multi-join analytics plus
pivot/unpivot reshaping and an event-time as-of join.

These widen SURVEY.md §2 Part B beyond the canonical per-operator queries:
each one composes several operator families (selective filters + multi-way
joins + decimal aggregation + top-k) the way real reporting workloads do,
adapted to the reduced TESTDATA schema (no partsupp/shipmode columns; nation
names are ``NATION_<k>``; ``p_type`` is a single word).

Scale notes (100 TB):
- ``nation``/``region`` joins are explicit broadcasts (fixed-size dims);
- every aggregate stays map-side combinable, money math runs in decimal
  domain (order-independent under any shuffle split — see
  ``functions.numeric``);
- the as-of join is a single window pass over a union (one shuffle by
  user key), NOT a range self-join — at 1000 executors it scales with the
  key cardinality instead of the pair count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType
from pyspark.sql.window import Window

from ..functions.numeric import dbl, dec
from ..sources.tables import load_tables, ts_micros
from .registry import register

# Shared decimal discount-price fragments (identical text in both engines so
# the hash gate compares exact decimal math, not float round-off).
_DISC_PRICE_SQL = (
    "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * "
    "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) "
    "AS DECIMAL(18,4))"
)


def _disc_price() -> F.Column:
    one = F.lit(1).cast(DecimalType(4, 2))
    return (
        dec("l_extendedprice", 14, 2) * (one - dec("l_discount", 4, 2))
    ).cast(DecimalType(18, 4))


def _ts(lit: str) -> F.Column:
    return F.lit(lit).cast("timestamp_ntz")


# ---------------------------------------------------------------------------
# TPC-H Q7 — volume shipping between two nations
# ---------------------------------------------------------------------------


@register(
    "b20_q7_volume_shipping",
    oracle=f"""
        SELECT supp_nation, cust_nation, l_year,
               CAST(SUM(volume) AS DOUBLE) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   YEAR(l_shipdate) AS l_year, {_DISC_PRICE_SQL} AS volume
            FROM supplier, lineitem, orders, customer, nation n1, nation n2
            WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
              AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
              AND c_nationkey = n2.n_nationkey
              AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "aggregate"),
)
def b20_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (adapted): nation-pair trade volume by ship year.

    The two nation lookups are broadcast; the nation-name filter lands on
    each fact side BEFORE the big orders⋈lineitem join, so only ~2/25 of
    suppliers and customers survive into the shuffle."""
    t = load_tables(spark, sf_dir)
    n1 = F.broadcast(t["nation"].select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2")))
    n2 = F.broadcast(t["nation"].select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2")))
    supp = t["supplier"].join(n1, F.col("s_nationkey") == F.col("s_nkey"))
    cust = t["customer"].join(n2, F.col("c_nationkey") == F.col("c_nkey"))
    pair_ok = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        t["lineitem"]
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(pair_ok)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dbl(F.sum(_disc_price())).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# TPC-H Q8 — market share of one supplier nation within a customer region
# ---------------------------------------------------------------------------


@register(
    "b20_q8_market_share",
    oracle=f"""
        SELECT o_year,
               CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE) AS mkt_share
        FROM (
            SELECT YEAR(o_orderdate) AS o_year, {_DISC_PRICE_SQL} AS volume,
                   n2.n_name AS nation
            FROM part, supplier, lineitem, orders, customer,
                 nation n1, nation n2, region
            WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
              AND l_orderkey = o_orderkey AND o_custkey = c_custkey
              AND c_nationkey = n1.n_nationkey
              AND n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
              AND s_nationkey = n2.n_nationkey AND p_type = 'ECONOMY'
        ) all_nations
        GROUP BY o_year
        ORDER BY o_year
    """,
    tags=("join", "aggregate"),
)
def b20_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (adapted): NATION_3 suppliers' share of ECONOMY-part revenue
    sold to AMERICA customers, by order year.

    Both sums are exact decimals; the share is one double division per
    group, so the ratio is bitwise-stable across engines.  The part filter
    (~1/6 selectivity) prunes lineitem BEFORE the orders join."""
    t = load_tables(spark, sf_dir)
    amer_nations = F.broadcast(
        t["nation"]
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "AMERICA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("c_nkey"))
    )
    supp_nation = F.broadcast(t["nation"].select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("nation")
    ))
    parts = t["part"].filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    cust = t["customer"].join(amer_nations, F.col("c_nationkey") == F.col("c_nkey"))
    supp = t["supplier"].join(supp_nation, F.col("s_nationkey") == F.col("s_nkey"))
    zero = F.lit(0).cast(DecimalType(18, 4))
    vol = _disc_price()
    return (
        t["lineitem"]
        .join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                dbl(F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(zero)))
                / dbl(F.sum(vol))
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# TPC-H Q10 — returned-item revenue per customer
# ---------------------------------------------------------------------------


@register(
    "b20_q10_returned_items",
    oracle=f"""
        SELECT c_custkey, c_name,
               CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue,
               c_acctbal, n_name
        FROM customer, orders, lineitem, nation
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
          AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    tags=("join", "aggregate", "topk"),
)
def b20_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by returned-line revenue in a half-year
    window.  Deterministic top-k: ties broken by c_custkey in BOTH engines.
    The date filter pushes to the orders scan; returnflag to lineitem."""
    t = load_tables(spark, sf_dir)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1996-07-01 00:00:00"))
    )
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    return (
        t["customer"]
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dbl(F.sum(_disc_price())).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H Q14 — promotion revenue share
# ---------------------------------------------------------------------------


@register(
    "b20_q14_promo_revenue",
    oracle=f"""
        SELECT CAST(100 AS DOUBLE)
                 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_DISC_PRICE_SQL}
                                 ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS promo_revenue
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
    tags=("join", "aggregate"),
)
def b20_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: PROMO parts' percentage of one month's revenue.  Exact
    decimal sums, then (100 * a) / b in double — both engines evaluate the
    identical IEEE expression tree."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= _ts("1996-09-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1996-10-01 00:00:00"))
    )
    zero = F.lit(0).cast(DecimalType(18, 4))
    vol = _disc_price()
    return (
        li.join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100).cast("double")
                * dbl(F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(zero)))
                / dbl(F.sum(vol))
            ).alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 — large-volume orders
# ---------------------------------------------------------------------------


@register(
    "b20_q18_large_volume",
    oracle="""
        SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
               CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty
        FROM customer, orders, lineitem
        WHERE o_orderkey IN (
                SELECT l_orderkey FROM lineitem
                GROUP BY l_orderkey HAVING SUM(l_quantity) > 300.0)
          AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    tags=("join", "aggregate", "subquery"),
)
def b20_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds 300 (l_quantity is
    integer-valued, so double sums are exact and order-independent).

    The HAVING pre-aggregate runs on lineitem alone (map-side partials),
    and its tiny result semi-joins back — at scale AQE turns that into a
    broadcast semi-join instead of reshuffling lineitem."""
    t = load_tables(spark, sf_dir)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 300.0)
        .select(F.col("l_orderkey").alias("big_okey"))
    )
    return (
        t["lineitem"]
        .join(big, F.col("l_orderkey") == F.col("big_okey"), "left_semi")
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dbl(F.sum("l_quantity")).alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# TPC-H Q19 — discounted revenue, OR-of-ANDs predicate
# ---------------------------------------------------------------------------


@register(
    "b20_q19_discounted_revenue",
    oracle=f"""
        SELECT CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue
        FROM lineitem, part
        WHERE p_partkey = l_partkey
          AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                AND l_quantity BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 10
                AND l_quantity BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 20 AND 30))
    """,
    tags=("join", "aggregate"),
)
def b20_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunction of brand/size/quantity clauses across the
    join.  Catalyst extracts the common per-side conjuncts (brand+size on
    part, quantity range on lineitem) and pushes them below the join."""
    t = load_tables(spark, sf_dir)
    q = F.col("l_quantity")
    clause = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 10)
           & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#14") & F.col("p_size").between(1, 15)
           & q.between(20, 30))
    )
    return (
        t["lineitem"]
        .join(t["part"], F.col("p_partkey") == F.col("l_partkey"))
        .filter(clause)
        .agg(dbl(F.sum(_disc_price())).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 — idle high-balance customers with no orders
# ---------------------------------------------------------------------------


@register(
    "b20_q22_idle_balance",
    oracle="""
        SELECT n_name,
               COUNT(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                 AS totacctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > (
                SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                         / COUNT(*)
                FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        GROUP BY n_name
        ORDER BY n_name
    """,
    tags=("join", "aggregate", "subquery"),
)
def b20_q22_idle_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (adapted: nation instead of phone country code): customers
    with above-average positive balance and no recent orders (none since
    1999 — every test customer has SOME order, so 'never ordered' is empty).

    The average is an exact decimal sum / exact count with ONE double
    division, so the comparison threshold is bitwise identical in both
    engines.  The 1-row threshold cross-joins in as a broadcast; the
    no-orders test is a shuffle anti-join on the customer key."""
    t = load_tables(spark, sf_dir)
    thr = (
        t["customer"]
        .filter(F.col("c_acctbal") > 0.0)
        .agg(
            (dbl(F.sum(dec("c_acctbal", 12, 2))) / F.count(F.lit(1)))
            .alias("avg_bal")
        )
    )
    return (
        t["customer"]
        .join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            t["orders"].filter(F.col("o_orderdate") >= _ts("1999-01-01 00:00:00")),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dbl(F.sum(dec("c_acctbal", 12, 2))).alias("totacctbal"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# Pivot / unpivot reshaping
# ---------------------------------------------------------------------------


@register(
    "b08_pivot",
    oracle="""
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN l_linestatus = 'F'
                             THEN CAST(l_quantity AS DECIMAL(12,2)) END)
                    AS DOUBLE) AS qty_f,
               CAST(SUM(CASE WHEN l_linestatus = 'O'
                             THEN CAST(l_quantity AS DECIMAL(12,2)) END)
                    AS DOUBLE) AS qty_o
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("aggregate", "reshape"),
)
def b08_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: linestatus values become columns.  Explicit pivot values keep
    the plan a single pass (no extra distinct-values job) — mandatory at
    scale, where the implicit value scan would read the full table twice."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(dbl(F.sum(dec("l_quantity", 12, 2))))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
    )


@register(
    "b08_unpivot",
    oracle="""
        SELECT o_orderkey, 'o_totalprice' AS metric, o_totalprice AS val
        FROM orders
        UNION ALL
        SELECT o_orderkey, 'o_custkey' AS metric, CAST(o_custkey AS DOUBLE)
        FROM orders
    """,
    tags=("reshape",),
)
def b08_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide columns to (metric, val) rows.  Spark plans
    this as a Generate (expand) — no shuffle, linear in input."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .withColumn("o_custkey_d", F.col("o_custkey").cast("double"))
        .unpivot(
            ["o_orderkey"],
            [F.col("o_totalprice"), F.col("o_custkey_d").alias("o_custkey")],
            "metric",
            "val",
        )
    )


# ---------------------------------------------------------------------------
# As-of join (event-time point lookup)
# ---------------------------------------------------------------------------


@register(
    "b07_asof_join",
    oracle="""
        SELECT c.event_id, c.user_id, c.ts, v.view_value
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'click') c
        ASOF LEFT JOIN
             (SELECT user_id, ts, MAX(value) AS view_value FROM events
              WHERE event_type = 'view' GROUP BY user_id, ts) v
          ON c.user_id = v.user_id AND v.ts <= c.ts
        ORDER BY c.event_id
    """,
    tags=("join", "asof"),
)
def b07_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every click, the value of the same user's most
    recent view at-or-before the click (an operator Spark lacks natively).

    Implemented as ONE window pass over a tagged union — shuffle once by
    user key, sort within partition, carry the last non-null view value
    forward — instead of a range self-join whose intermediate is the pair
    count.  Views are pre-deduped to one row per (user_id, ts) with
    MAX(value) so ties are deterministic; at equal timestamps the view
    sorts before the click (is_click tiebreak), matching ASOF's inclusive
    ``v.ts <= c.ts`` bound."""
    t = load_tables(spark, sf_dir)
    # All as-of logic runs on integer MICROS so ordering and tie-breaking
    # match DuckDB's read of the same file bit-for-bit; ts_micros adapts to
    # whichever physical type (int64-nanos or timestamp-micros) the testdata
    # shipped with.
    ev = t["events"].withColumn("mts", ts_micros(t["events"]))
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "mts")
        .agg(F.max("value").alias("view_value"))
        .select(
            F.lit(None).cast("long").alias("event_id"),
            "user_id",
            "mts",
            F.lit(0).alias("is_click"),
            "view_value",
        )
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        "mts",
        F.lit(1).alias("is_click"),
        F.lit(None).cast("double").alias("view_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("mts", "is_click")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        views.unionByName(clicks)
        .withColumn("asof_value", F.last("view_value", ignorenulls=True).over(w))
        .filter(F.col("is_click") == 1)
        .select(
            "event_id",
            "user_id",
            F.timestamp_micros(F.col("mts")).alias("ts"),
            F.col("asof_value").alias("view_value"),
        )
        .orderBy("event_id")
    )


@register(
    "b07_asof_join_tolerance",
    oracle="""
        WITH c AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'click'),
        v AS (SELECT user_id, ts, MAX(value) AS view_value FROM events
              WHERE event_type = 'view' GROUP BY user_id, ts),
        m AS (SELECT c.event_id, c.user_id, c.ts, v.view_value,
                     epoch_us(c.ts) - epoch_us(v.ts) AS staleness_us
              FROM c ASOF LEFT JOIN v
                ON c.user_id = v.user_id AND v.ts <= c.ts)
        SELECT event_id, user_id, ts,
               CASE WHEN staleness_us <= 172800000000
                    THEN view_value END AS view_value,
               CAST(staleness_us AS BIGINT) AS staleness_us
        FROM m
    """,
    tags=("join", "asof"),
)
def b07_asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a STALENESS TOLERANCE (the feature-store serving
    contract: a feature older than the freshness SLA — 2 days here — must
    not be served, it must read as missing).  Same single tagged-union
    window pass as b07_asof_join, but the carried state is a (view_ts,
    view_value) STRUCT so the match's own timestamp survives to evaluate
    the tolerance — and so a matched-but-NULL view value is faithfully
    carried (a value-only IGNORE NULLS carry would silently skip to an
    older view, diverging from ASOF semantics on dirty data).  The raw
    staleness is kept as an audit column even when the value is nulled."""
    TOL_US = 172_800_000_000  # 2 days
    t = load_tables(spark, sf_dir)
    ev = t["events"].withColumn("mts", ts_micros(t["events"]))
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "mts")
        .agg(F.max("value").alias("view_value"))
        .select(
            F.lit(None).cast("long").alias("event_id"),
            "user_id",
            "mts",
            F.lit(0).alias("is_click"),
            "view_value",
        )
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        "mts",
        F.lit(1).alias("is_click"),
        F.lit(None).cast("double").alias("view_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("mts", "is_click")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(
        F.when(
            F.col("is_click") == 0,
            F.struct(
                F.col("mts").alias("vmts"), F.col("view_value").alias("vval")
            ),
        ),
        ignorenulls=True,
    ).over(w)
    staleness = F.col("mts") - F.col("match.vmts")
    return (
        views.unionByName(clicks)
        .withColumn("match", carried)
        .filter(F.col("is_click") == 1)
        .select(
            "event_id",
            "user_id",
            F.timestamp_micros(F.col("mts")).alias("ts"),
            F.when(staleness <= TOL_US, F.col("match.vval")).alias(
                "view_value"
            ),
            staleness.cast("long").alias("staleness_us"),
        )
    )


@register(
    "b07_asof_join_forward",
    oracle="""
        WITH v AS (
          SELECT user_id, ts, MAX(value) AS view_value
          FROM events WHERE event_type = 'view' GROUP BY user_id, ts
        ),
        c AS (
          SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'click'
        ),
        tagged AS (
          SELECT user_id, ts, 0 AS is_click, NULL::BIGINT AS event_id,
                 view_value FROM v
          UNION ALL
          SELECT user_id, ts, 1, event_id, NULL FROM c
        ),
        filled AS (
          SELECT *, MIN(CASE WHEN is_click = 0 THEN ts END)
                      OVER (PARTITION BY user_id ORDER BY ts, is_click DESC
                            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                      AS next_view_ts
          FROM tagged
        )
        SELECT f.event_id, f.user_id, v.view_value AS asof_value
        FROM filled f LEFT JOIN v
          ON f.user_id = v.user_id AND f.next_view_ts = v.ts
        WHERE f.is_click = 1
        ORDER BY f.event_id
    """,
    tags=("join", "asof"),
)
def b07_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: for every click, the value of the same user's
    NEXT view at-or-after the click (b07_asof_join is the backward
    direction; both directions = full as-of surface).  Same single
    window pass over a tagged union — the forward direction just flips
    the frame to CURRENT ROW .. UNBOUNDED FOLLOWING with first_value; at
    equal timestamps the view sorts after the click via the is_click
    DESC tiebreak, making the bound inclusive."""
    t = load_tables(spark, sf_dir)
    ev = t["events"].withColumn("mts", ts_micros(t["events"]))
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "mts")
        .agg(F.max("value").alias("view_value"))
        .select(
            F.lit(None).cast("long").alias("event_id"),
            "user_id",
            "mts",
            F.lit(0).alias("is_click"),
            "view_value",
        )
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        "mts",
        F.lit(1).alias("is_click"),
        F.lit(None).cast("double").alias("view_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("mts"), F.col("is_click").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        views.unionByName(clicks)
        .withColumn(
            "asof_value", F.first("view_value", ignorenulls=True).over(w)
        )
        .filter(F.col("is_click") == 1)
        .select("event_id", "user_id", "asof_value")
        .orderBy("event_id")
    )
