"""TPC-H-shaped headline analytics.

These are the batch Table-API/SQL capability of the reference
(``flink_table_api_utils.py:209`` execute_sql_query and the SQL exercises
in ``flink_learning/flink_typora.md``) exercised at benchmark scale:
scan-heavy aggregation (Q1), selective multi-way join (Q3), and a
snowflake join through every dimension (Q5 shape).

Scale notes:
- Q1 is one hash-aggregate over lineitem with the shipdate filter pushed
  to the parquet scan; partial aggregation happens map-side so the
  shuffle carries only (flag,status) groups.
- Q3/Q5 broadcast every dimension side (region/nation/customer at TPC-H
  ratios are ≤1.5% of lineitem), so the fact table never shuffles for
  the join — only for the final aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datasets import load
from ..num import davg, dsum, sql_davg, sql_dsum
from ..operators.dedup import widen

Q1_CUTOFF = "1998-09-02 00:00:00"


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: pricing summary report over lineitem."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    # widen(): the 8-aggregate partial agg dominates the (pushed-down)
    # scan ~6:1 on a single-split local file; no-op at scale where the
    # scan already parallelizes (measured 0.96s -> 0.64s at sf0.1)
    return (
        widen(li.filter(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


PRICING_SUMMARY_SQL = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum("l_quantity", "sum_qty")},
  {sql_dsum("l_extendedprice", "sum_base_price")},
  {sql_dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
  {sql_dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
  {sql_davg("l_quantity", "avg_qty")},
  {sql_davg("l_extendedprice", "avg_price")},
  {sql_davg("l_discount", "avg_disc")},
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top unshipped orders by revenue for one segment."""
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue, "revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


SHIPPING_PRIORITY_SQL = f"""
SELECT
  l_orderkey,
  o_orderdate,
  o_orderpriority,
  {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where customer and supplier share
    a nation, snowflaked through region."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(cust),
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(revenue, "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


LOCAL_SUPPLIER_VOLUME_SQL = f"""
SELECT
  n_name,
  {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_5's share of ASIA's ECONOMY-part revenue
    per year — the widest join in the suite (lineitem against part,
    supplier, orders, customer, and nation twice through region).

    Scale shape: every dimension side broadcasts (part filtered by
    type, customer restricted through region, both nation roles), so
    the fact table joins shuffle-free and shuffles once for the final
    per-year aggregate; the share divides two decimal sums computed in
    the same aggregate (one pass, no re-scan). The nation table joins
    TWICE in different roles (customer market vs supplier origin) —
    the classic alias-join the reference teaches with Table-API views.
    """
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = load(spark, sf_dir, "customer")
    n_cust = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n_supp = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target = F.when(F.col("supp_nation") == "NATION_5", revenue).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_cust), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == region.r_regionkey)
        .join(F.broadcast(n_supp), supp.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            dsum(target, "nation_volume"),
            dsum(revenue, "total_volume"),
        )
        .withColumn(
            "mkt_share",
            F.round(F.col("nation_volume") / F.col("total_volume"), 6),
        )
        .select("o_year", "nation_volume", "total_volume", "mkt_share")
    )


MARKET_SHARE_SQL = f"""
SELECT
  CAST(year(o_orderdate) AS INT) AS o_year,
  {sql_dsum("CASE WHEN ns.n_name = 'NATION_5' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END", "nation_volume")},
  {sql_dsum("l_extendedprice * (1 - l_discount)", "total_volume")},
  round(
    {sql_dsum("CASE WHEN ns.n_name = 'NATION_5' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END", "x")[:-5]}
    / {sql_dsum("l_extendedprice * (1 - l_discount)", "y")[:-5]}, 6) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
JOIN region ON nc.n_regionkey = r_regionkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
WHERE p_type = 'ECONOMY'
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1
"""


def order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders per priority that had at least one returned
    line — the EXISTS-subquery / semi-join pattern
    (``flink_typora.md`` SQL exercises; Table API ``in``/``exists``).

    Scale shape: a LEFT SEMI join on the order key. Both sides are
    fact-sized so the join shuffles on ``orderkey`` — but the lineitem
    side is pruned to the single join column by Catalyst before the
    exchange (semi joins emit no right-side columns), and the returned
    flag filter is pushed to the parquet scan. The final aggregate is
    5 groups; partial aggregation makes its shuffle negligible.
    """
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    returned = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


ORDER_PRIORITY_CHECK_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by how many
    non-urgent orders they placed — the LEFT OUTER join where the
    predicate must live in the JOIN (filtering in WHERE would drop the
    zero-order customers the query exists to count).

    Scale shape: orders pre-aggregate to (custkey, count) BEFORE the
    outer join, so the join's shuffle carries one row per ordering
    customer instead of every order (map-side partials shrink it
    further). Customer joins on its key; at 100 TB both sides are
    large and the shuffled hash join on ``custkey`` is the right plan
    (no broadcast hint — AQE may still pick one at small SF). The
    second aggregate is per-distinct-count — tiny.
    """
    cust = load(spark, sf_dir, "customer")
    per_cust = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left_outer")
        .select(F.coalesce(F.col("cnt"), F.lit(0).cast("long")).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


CUSTOMER_ORDER_DISTRIBUTION_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COALESCE(cnt, 0) AS c_count
  FROM customer
  LEFT JOIN (
    SELECT o_custkey, COUNT(*) AS cnt
    FROM orders
    WHERE o_orderpriority <> '1-URGENT'
    GROUP BY o_custkey
  ) oc ON c_custkey = o_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


Q18_MIN_QTY = 250.0


def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total line quantity clears a
    threshold, enriched with the customer — the GROUP BY ... HAVING
    pattern feeding a join.

    Scale shape: the HAVING runs FIRST (aggregate lineitem by order
    key with map-side partials, filter the sums), so only qualifying
    orders — a data-dependent, usually tiny fraction — flow into the
    joins. No broadcast hints: the qualifying set's size is unknown at
    plan time, and AQE converts the joins to broadcast at runtime
    exactly when the filter was selective. The quantity sum routes
    through decimal (num.dsum) so the threshold comparison is
    partition-order-independent — a float sum could flip a borderline
    order in and out of the result between runs.
    """
    qty = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(dsum("l_quantity", "total_qty"))
        .filter(F.col("total_qty") > F.lit(Q18_MIN_QTY))
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        orders.join(qty, orders.o_orderkey == qty.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    )


LARGE_VOLUME_ORDERS_SQL = f"""
SELECT c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM orders
JOIN (
  SELECT l_orderkey, {sql_dsum("l_quantity", "total_qty")}
  FROM lineitem
  GROUP BY l_orderkey
  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) > {Q18_MIN_QTY}
) q ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


DORMANT_CUTOFF = "1998-01-01 00:00:00"


def dormant_high_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no recent
    orders, by nation — the scalar-subquery + NOT EXISTS (anti-join)
    pattern.

    Scale shape: the scalar threshold is one aggregate row broadcast
    into a crossJoin (same single-row-broadcast shape as
    ``q_status_distribution``). The above-average comparison is
    cross-multiplied in decimal (``bal * cnt > total``) instead of
    dividing to a float average: both engines then compare exact
    integers, so no borderline customer can flip on a last-ulp
    difference between Spark's and the oracle's summation order. The
    NOT EXISTS is a LEFT ANTI join on ``custkey`` — the recent-orders
    side is pruned to one column and date-filtered at the scan;
    at 100 TB both sides are large so the anti-join shuffles on the
    key (AQE broadcasts when the filtered side is small).
    """
    cust = load(spark, sf_dir, "customer")
    pos = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(F.col("c_acctbal").cast("decimal(18,6)")).alias("tot"),
        F.count(F.lit(1)).alias("cnt"),
    )
    recent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(DORMANT_CUTOFF).cast("timestamp"))
        .select("o_custkey")
    )
    rich = (
        cust.crossJoin(F.broadcast(pos))
        .filter(F.col("c_acctbal").cast("decimal(18,6)") * F.col("cnt") > F.col("tot"))
    )
    return (
        rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
        .orderBy("c_nationkey")
    )


DORMANT_HIGH_VALUE_SQL = f"""
SELECT
  c_nationkey,
  COUNT(*) AS numcust,
  {sql_dsum("c_acctbal", "totacctbal")}
FROM customer
WHERE CAST(c_acctbal AS DECIMAL(18,6))
      * (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0)
      > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,6))) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '{DORMANT_CUTOFF}'
  )
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


