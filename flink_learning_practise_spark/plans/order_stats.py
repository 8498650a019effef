"""Order statistics plans — batch twins of the reference's stage2
windowed statistics (``flink_order_real_time/stage2_window_statistics/
order_statistics.py`` + ``window_aggregators.py``: per-minute/hour order
count & amount, per-user order stats, per-item sales stats, order status
distribution) and the stage1 lookup-join enrichment.

The ``orders``/``lineitem`` tables play the parsed Walmart order stream;
order-date granularity is daily, so the "per-minute" stats become
per-day tumbling windows — same operator, same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..datasets import load
from ..num import davg, dsum, sql_davg, sql_dsum
from ..operators.dedup import widen
from ..operators import joins, windows

# ---------------------------------------------------------------------------
# #21 per-period order count & amount (tumbling window on order date)


def order_stats_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return windows.tumbling_window(
        orders,
        "o_orderdate",
        "1 day",
        keys=["o_orderstatus"],
        aggs=[
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "total_amount"),
            davg("o_totalprice", "avg_amount"),
        ],
    )


ORDER_STATS_DAILY_SQL = f"""
SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS window_start,
       CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) + INTERVAL 1 DAY AS window_end,
       o_orderstatus,
       COUNT(*) AS n_orders,
       {sql_dsum("o_totalprice", "total_amount")},
       {sql_davg("o_totalprice", "avg_amount")}
FROM orders
GROUP BY 1, 2, 3
"""

# ---------------------------------------------------------------------------
# #22 per-user order stats


def user_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "total_spent"),
        davg("o_totalprice", "avg_spent"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
    )


USER_ORDER_STATS_SQL = f"""
SELECT o_custkey,
       COUNT(*) AS n_orders,
       {sql_dsum("o_totalprice", "total_spent")},
       {sql_davg("o_totalprice", "avg_spent")},
       MIN(o_orderdate) AS first_order,
       MAX(o_orderdate) AS last_order
FROM orders
GROUP BY o_custkey
"""

# ---------------------------------------------------------------------------
# #23 per-item sales stats


def item_sales_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # widen(): parallelize the partial agg past the single-split local
    # scan (no-op at scale); measured ~3-10% at sf0.1
    per_part = widen(li).groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        dsum("l_quantity", "sum_qty"),
        dsum(revenue, "revenue"),
    )
    return joins.lookup_join(per_part, part, per_part.l_partkey == part.p_partkey).select(
        "l_partkey", "p_brand", "n_lines", "sum_qty", "revenue"
    )


ITEM_SALES_STATS_SQL = f"""
SELECT l_partkey, p_brand,
       COUNT(*) AS n_lines,
       {sql_dsum("l_quantity", "sum_qty")},
       {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
FROM lineitem
JOIN part ON l_partkey = p_partkey
GROUP BY l_partkey, p_brand
"""

# ---------------------------------------------------------------------------
# #24 order status distribution (share of total)


def status_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "total_amount"),
    )
    # grand total via a broadcast 1-row aggregate, not a global window:
    # Window.partitionBy() funnels everything into ONE partition (and
    # warns); the scalar-agg + crossJoin keeps both sides' plans
    # parallel and merely broadcasts a single row.
    total = counts.agg(F.sum("n_orders").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn(
            "share_pct",
            F.col("n_orders").cast("double") * 100.0 / F.col("_total"),
        )
        .drop("_total")
    )


STATUS_DISTRIBUTION_SQL = f"""
WITH counts AS (
  SELECT o_orderstatus,
         COUNT(*) AS n_orders,
         {sql_dsum("o_totalprice", "total_amount")}
  FROM orders
  GROUP BY o_orderstatus
)
SELECT o_orderstatus, n_orders, total_amount,
       CAST(n_orders AS DOUBLE) * 100.0 / SUM(n_orders) OVER () AS share_pct
FROM counts
"""

# ---------------------------------------------------------------------------
# #16 lookup join (dim enrichment, broadcast)


def lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    enriched = joins.lookup_join(
        orders, cust, orders.o_custkey == cust.c_custkey
    )
    enriched = joins.lookup_join(
        enriched, nation, enriched.c_nationkey == nation.n_nationkey
    )
    return enriched.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "total_amount"),
    )


LOOKUP_JOIN_SQL = f"""
SELECT n_name,
       COUNT(*) AS n_orders,
       {sql_dsum("o_totalprice", "total_amount")}
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""

# ---------------------------------------------------------------------------
# #9 top-N per key (ranking window)

TOP_N = 3


def top_parts_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    li = widen(li)  # parallelize joins+window past the single-split scan
    # orders is FACT-sized — no broadcast hint: AQE broadcasts the
    # 2-column projection at small SF and falls back to a shuffled join
    # on the order key at scale (broadcasting a fact table at 100 TB
    # would OOM the executors). customer stays a true broadcast dim.
    enriched = li.join(orders, li.l_orderkey == orders.o_orderkey)
    enriched = joins.lookup_join(
        enriched, cust, enriched.o_custkey == cust.c_custkey
    )
    per_part = enriched.groupBy("c_mktsegment", "l_partkey").agg(
        dsum(revenue, "revenue")
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("revenue"), F.asc("l_partkey")
    )
    return (
        per_part.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_N)
        .select("c_mktsegment", "rank", "l_partkey", "revenue")
    )


TOP_PARTS_PER_SEGMENT_SQL = f"""
WITH per_part AS (
  SELECT c_mktsegment, l_partkey,
         {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment, l_partkey
), ranked AS (
  SELECT c_mktsegment, l_partkey, revenue,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY revenue DESC, l_partkey) AS rank
  FROM per_part
)
SELECT c_mktsegment, rank, l_partkey, revenue
FROM ranked
WHERE rank <= {TOP_N}
"""


def sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional subtotal aggregation: ROLLUP over
    (order year, order status) — grand total, per-year, and
    per-(year, status) rows in ONE pass (Catalyst expands the grouping
    sets; partial aggregation still applies, so the fact table shuffles
    once). The Spark-first analog of the reference's tiered order
    statistics (flink_order_real_time/order_statistics.py), collapsed
    into a single grouping-sets plan instead of N separate jobs."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.withColumn("order_year", F.year("o_orderdate"))
        .rollup("order_year", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), "total_price"),
        )
        .select("order_year", "o_orderstatus", "n_orders", "total_price")
    )


SALES_ROLLUP_SQL = f"""
SELECT year(o_orderdate) AS order_year, o_orderstatus,
       COUNT(*) AS n_orders,
       {sql_dsum("o_totalprice", "total_price")}
FROM orders
GROUP BY ROLLUP(year(o_orderdate), o_orderstatus)
"""


ORDER_STATUSES = ("F", "O", "P")  # closed set in the data model


def status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot / crosstab: per-year order counts spread across status
    COLUMNS — the report-shaping operator (Table API's pivot analog).
    The status list is pinned (closed set in the data model), so the
    pivot is a single groupBy(year) with one conditional count per
    status — one shuffle, map-side partials, no second pass to
    discover column names (which at 100 TB would be an extra
    full scan)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.withColumn("order_year", F.year("o_orderdate"))
        .groupBy("order_year")
        .pivot("o_orderstatus", list(ORDER_STATUSES))
        .agg(F.count(F.lit(1)))
        .select(
            "order_year",
            *[F.coalesce(F.col(s), F.lit(0)).alias(f"n_{s}") for s in ORDER_STATUSES],
        )
    )


STATUS_PIVOT_SQL = f"""
SELECT CAST(year(o_orderdate) AS INT) AS order_year,
       {", ".join(f"COUNT(*) FILTER (WHERE o_orderstatus = '{s}') AS n_{s}" for s in ORDER_STATUSES)}
FROM orders
GROUP BY 1
"""


def sales_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (year, status): every subtotal combination — rollup's
    per-year tiers PLUS per-status-across-years — in one grouping-sets
    expansion, still a single shuffle with map-side partials."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.withColumn("order_year", F.year("o_orderdate"))
        .cube("order_year", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), "total_price"),
        )
        .select("order_year", "o_orderstatus", "n_orders", "total_price")
    )


SALES_CUBE_SQL = f"""
SELECT year(o_orderdate) AS order_year, o_orderstatus,
       COUNT(*) AS n_orders,
       {sql_dsum("o_totalprice", "total_price")}
FROM orders
GROUP BY CUBE(year(o_orderdate), o_orderstatus)
"""


# ---------------------------------------------------------------------------
# #108 Pearson correlation matrix over lineitem's numeric columns —
# one pass, one aggregate: all nine moment sums (Σx, Σx², Σxy per
# pair) come from a single scan, wide-decimal-routed so the moments are
# partition-order-exact, then the correlation is closed-form double
# math over nine finished scalars. (Built-ins F.corr exist but
# aggregate in floating point — order-dependent at 1000 partitions.)

CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount")
_DECW = "decimal(38,6)"  # squares of prices overflow decimal(18,6)


def lineitem_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import widen

    cols = list(CORR_COLS)
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).cast(_DECW)).cast("double").alias(f"s_{c}"))
        aggs.append(
            F.sum((F.col(c) * F.col(c)).cast(_DECW)).cast("double").alias(f"q_{c}")
        )
    for i, x in enumerate(cols):
        for y in cols[i + 1 :]:
            aggs.append(
                F.sum((F.col(x) * F.col(y)).cast(_DECW))
                .cast("double")
                .alias(f"p_{x}_{y}")
            )
    # widen(): ten wide-decimal aggregates dominate the single-split
    # local scan; no-op at scale where the scan parallelizes (Q1's rule)
    m = widen(load(spark, sf_dir, "lineitem")).agg(*aggs)

    def corr_expr(x: str, y: str):
        n = F.col("n")
        cov = n * F.col(f"p_{x}_{y}") - F.col(f"s_{x}") * F.col(f"s_{y}")
        vx = n * F.col(f"q_{x}") - F.col(f"s_{x}") * F.col(f"s_{x}")
        vy = n * F.col(f"q_{y}") - F.col(f"s_{y}") * F.col(f"s_{y}")
        return F.round(cov / F.sqrt(vx * vy), 6)

    pairs = [(x, y) for i, x in enumerate(cols) for y in cols[i + 1 :]]
    stacked = ", ".join(
        f"'{x}', '{y}', c_{x}_{y}" for x, y in pairs
    )
    with_corrs = m
    for x, y in pairs:
        with_corrs = with_corrs.withColumn(f"c_{x}_{y}", corr_expr(x, y))
    return with_corrs.selectExpr(
        f"stack({len(pairs)}, {stacked}) AS (col_x, col_y, corr)"
    ).orderBy("col_x", "col_y")


def _corr_sql() -> str:
    cols = list(CORR_COLS)
    sums = ["COUNT(*) AS n"]
    for c in cols:
        sums.append(f"CAST(SUM(CAST({c} AS DECIMAL(38,6))) AS DOUBLE) AS s_{c}")
        sums.append(
            f"CAST(SUM(CAST({c} * {c} AS DECIMAL(38,6))) AS DOUBLE) AS q_{c}"
        )
    pairs = [(x, y) for i, x in enumerate(cols) for y in cols[i + 1 :]]
    for x, y in pairs:
        sums.append(
            f"CAST(SUM(CAST({x} * {y} AS DECIMAL(38,6))) AS DOUBLE) AS p_{x}_{y}"
        )
    corr_rows = " UNION ALL ".join(
        f"SELECT '{x}' AS col_x, '{y}' AS col_y, "
        f"round((n * p_{x}_{y} - s_{x} * s_{y})"
        f" / sqrt((n * q_{x} - s_{x} * s_{x}) * (n * q_{y} - s_{y} * s_{y})), 6)"
        f" AS corr FROM m"
        for x, y in pairs
    )
    return f"WITH m AS (SELECT {', '.join(sums)} FROM lineitem) {corr_rows} ORDER BY col_x, col_y"


LINEITEM_CORR_SQL = _corr_sql()
