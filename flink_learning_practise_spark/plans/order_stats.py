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
from ..num import DEC, davg, dsum, sql_davg, sql_dsum
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


# ---------------------------------------------------------------------------
# #122 market-basket co-occurrence: part pairs bought together in one
# order, with support counts and lift. The self-join is keyed on
# l_orderkey, so pair fan-out is bounded by (lines-per-order choose 2)
# per order — never corpus² — and the (orderkey, partkey) DISTINCT
# shrinks the fact stream before the join (same pre-shrink as Q16).
#
# Mega-basket guard (VERDICT r7 ask #6): the "bounded by basket²"
# argument assumes basket size is schema-bounded (TPC-H caps
# lines-per-order at 7, so the driver oracles are UNCHANGED — the cap
# can never bind there). On an open schema a single pathological
# mega-basket (a B2B bulk order, a crawler cart) squares: one
# 10⁵-item order emits 5×10⁹ pairs into one task. Orders above
# BASKET_MAX_ITEMS are excluded from PAIR GENERATION only — the same
# bounded-error shape as graph.capped_wedges (graph.py): supports
# (n_a, n_b) and the order total still count every order, so the
# reported pairs/lifts for normal baskets are exact and only
# pairs-WITHIN-the-freak-basket are dropped (they are noise for
# association mining anyway — everything co-occurs in a cart that
# contains everything).

BASKET_MIN_SUPPORT = 2
BASKET_TOP_N = 50
BASKET_MAX_ITEMS = 256


def basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return _basket_pairs_from(li)


def _basket_pairs_from(li: DataFrame) -> DataFrame:
    # the (order, part) DISTINCT feeds FOUR consumers (two self-join
    # sides, per-part supports, the order total) — materialize it ONCE
    # behind an eager checkpoint, pre-partitioned on the join key, so
    # the fact scan + distinct run once instead of per branch (the same
    # materialization boundary the shared pair tier uses; at 100 TB
    # this intermediate would land as a table between stages)
    # the basket-size guard column is computed INSIDE the tier build:
    # the count-over-orderkey window's clustering requirement is
    # satisfied by the repartition exchange already in the build, so
    # the guard costs one partition-local sort in the already-paid
    # build — zero extra exchanges in any consumer branch
    items = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .repartition("l_orderkey")
        .withColumn(
            "_bsz",
            F.count(F.lit(1)).over(Window.partitionBy("l_orderkey")),
        )
        .localCheckpoint(eager=True)
    )
    n_orders = items.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("_n")
    )
    part_cnt = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("_c"))
    pairable = items.filter(F.col("_bsz") <= BASKET_MAX_ITEMS)
    a = pairable.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = pairable.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= BASKET_MIN_SUPPORT)
    )
    ca = part_cnt.select(F.col("l_partkey").alias("part_a"), F.col("_c").alias("n_a"))
    cb = part_cnt.select(F.col("l_partkey").alias("part_b"), F.col("_c").alias("n_b"))
    return (
        pairs.join(ca, "part_a")
        .join(cb, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "n_both",
            "n_a",
            "n_b",
            F.round(
                F.col("_n") * F.col("n_both") / (F.col("n_a") * F.col("n_b")), 9
            ).alias("lift"),
        )
        .orderBy(F.desc("n_both"), "part_a", "part_b")
        .limit(BASKET_TOP_N)
    )


BASKET_PAIRS_SQL = f"""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM items),
pc AS (SELECT l_partkey, COUNT(*) AS c FROM items GROUP BY l_partkey),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_both
  FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {BASKET_MIN_SUPPORT}
)
SELECT part_a, part_b, n_both, ca.c AS n_a, cb.c AS n_b,
       round(CAST(n.n_orders AS DOUBLE) * n_both / (ca.c * cb.c), 9) AS lift
FROM pairs
JOIN pc ca ON part_a = ca.l_partkey
JOIN pc cb ON part_b = cb.l_partkey
CROSS JOIN n
ORDER BY n_both DESC, part_a, part_b
LIMIT {BASKET_TOP_N}
"""


# ---------------------------------------------------------------------------
# #123 RFM segmentation: recency / frequency / monetary quartiles per
# customer, each scored 1-4 by DISTRIBUTED ntile — the
# single-partition `ntile() OVER (ORDER BY ..)` trap is exactly what
# this replaces. Order facts aggregate to one row per customer FIRST
# (keyed exchange with map-side partials) so ranking runs on customer
# cardinality, not fact cardinality. The three scores come from ONE
# memoized customer tier via transforms.global_ntile_multi (VERDICT
# r6 ask #6): each measure ranks only its narrow (measure, custkey)
# projection and keeps the 3 exact quartile-boundary tuples; score
# assignment is a map-side CASE, so the customer tier itself is never
# range-exchanged (the old shape paid 3 full-frame range exchanges +
# checkpoints).

RFM_REF_DATE = "2025-01-01"
RFM_BUCKETS = 4


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.transforms import global_ntile_multi

    orders = load(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.datediff(
            F.lit(RFM_REF_DATE).cast("date"), F.max(F.to_date("o_orderdate"))
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        dsum("o_totalprice", "monetary"),
    ).localCheckpoint(eager=False)
    # stack_cast="double" is order-exact here: recency is int days,
    # frequency a count (< 2^53), monetary already a double.
    scored = global_ntile_multi(
        per_cust,
        RFM_BUCKETS,
        [
            (["recency_days", "o_custkey"], "r_score"),
            (["frequency", "o_custkey"], "f_score"),
            (["monetary", "o_custkey"], "m_score"),
        ],
        stack_cast="double",
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            davg("monetary", "avg_monetary"),
            davg("frequency", "avg_frequency"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


RFM_SEGMENTS_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey,
         datediff('day', MAX(CAST(o_orderdate AS DATE)),
                  DATE '{RFM_REF_DATE}') AS recency_days,
         COUNT(*) AS frequency,
         {sql_dsum('o_totalprice', 'monetary')}
  FROM orders GROUP BY o_custkey
),
scored AS (
  SELECT *,
         ntile({RFM_BUCKETS}) OVER (ORDER BY recency_days, o_custkey) AS r_score,
         ntile({RFM_BUCKETS}) OVER (ORDER BY frequency, o_custkey) AS f_score,
         ntile({RFM_BUCKETS}) OVER (ORDER BY monetary, o_custkey) AS m_score
  FROM per_cust
)
SELECT r_score, f_score, m_score,
       COUNT(*) AS n_customers,
       {sql_davg('monetary', 'avg_monetary')},
       {sql_davg('frequency', 'avg_frequency')}
FROM scored
GROUP BY r_score, f_score, m_score
ORDER BY r_score, f_score, m_score
"""


# ---------------------------------------------------------------------------
# #124 shipping-delay percentiles by priority: exact p50/p90/p99 of
# (ship date − order date) per o_orderpriority. Per-key percentiles
# with FEW huge keys, but the value domain is SMALL INTEGERS (days) —
# so instead of ranking rows, aggregate a sparse histogram per
# (priority, delay) first (bounded by |priorities|·|delay domain|) and
# walk its cumulative counts: the discrete value at rank ceil(p·n).
# The window runs over the HISTOGRAM, never the fact table.

DELAY_PCTS = (0.5, 0.9, 0.99)


def shipping_delay_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    delays = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "o_orderpriority",
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias(
            "delay_days"
        ),
    )
    hist = delays.groupBy("o_orderpriority", "delay_days").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_p = Window.partitionBy("o_orderpriority").orderBy("delay_days")
    w_all = Window.partitionBy("o_orderpriority")
    cum = (
        hist.withColumn(
            "cum",
            F.sum("cnt").over(
                w_p.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn("n", F.sum("cnt").over(w_all))
    )
    pcts = None
    for p in DELAY_PCTS:
        tier = (
            cum.filter(
                (F.col("cum") - F.col("cnt") < F.ceil(F.lit(p) * F.col("n")))
                & (F.col("cum") >= F.ceil(F.lit(p) * F.col("n")))
            )
            .select(
                "o_orderpriority",
                F.lit(float(p)).alias("percentile"),
                F.col("delay_days"),
            )
        )
        pcts = tier if pcts is None else pcts.unionByName(tier)
    return pcts.orderBy("o_orderpriority", "percentile")


SHIPPING_DELAY_PCTS_SQL = f"""
WITH delays AS (
  SELECT o_orderpriority,
         datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
           AS delay_days
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
hist AS (
  SELECT o_orderpriority, delay_days, COUNT(*) AS cnt
  FROM delays GROUP BY 1, 2
),
cum AS (
  SELECT o_orderpriority, delay_days, cnt,
         SUM(cnt) OVER (PARTITION BY o_orderpriority ORDER BY delay_days
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(cnt) OVER (PARTITION BY o_orderpriority) AS n
  FROM hist
)
SELECT o_orderpriority, CAST(p AS DOUBLE) AS percentile, delay_days
FROM cum, (VALUES {", ".join(f"({p})" for p in DELAY_PCTS)}) AS t(p)
WHERE cum - cnt < ceil(p * n) AND cum >= ceil(p * n)
ORDER BY o_orderpriority, percentile
"""


# ---------------------------------------------------------------------------
# #125 fuzzy name matching: near-identical part names by Levenshtein
# distance. The scalable shape matches the DICTIONARY, not the rows:
# names collapse to their distinct vocabulary first (bounded by the
# name vocabulary, Heaps-sublinear), pairs are blocked on the last
# token (same noun) so the edit-distance join is |block|² over
# vocabulary blocks — never corpus². Part counts then re-attach per
# name.

FUZZY_MAX_DIST = 2


def fuzzy_part_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    names = (
        part.groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .withColumn("_noun", F.element_at(F.split("p_name", " "), -1))
    )
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.col("n_parts").alias("n_parts_a"),
        "_noun",
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.col("n_parts").alias("n_parts_b"),
        "_noun",
    )
    return (
        a.join(b, "_noun")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("distance", F.levenshtein("name_a", "name_b"))
        .filter(F.col("distance") <= FUZZY_MAX_DIST)
        .select("name_a", "name_b", "distance", "n_parts_a", "n_parts_b")
        .orderBy("name_a", "name_b")
    )


FUZZY_PART_MATCH_SQL = f"""
WITH names AS (
  SELECT p_name, COUNT(*) AS n_parts,
         string_split(p_name, ' ')[-1] AS noun
  FROM part GROUP BY p_name
)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS distance,
       a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
FROM names a JOIN names b ON a.noun = b.noun AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_DIST}
ORDER BY name_a, name_b
"""


# ---------------------------------------------------------------------------
# #129 set-operation churn segments: customers retained / churned / new
# across two order-date halves — INTERSECT and EXCEPT exercised as
# first-class relational surface (both compile to hash semi/anti joins;
# the two period key-sets come from ONE orders scan each, distinct
# pushed below the set op).

CHURN_SPLIT_DATE = "1997-07-01"


def customer_churn_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT as first-class surface — that IS the
    capability this query covers (both compile to hash semi/anti
    joins; the h1/h2 scans are exchange-reused across the three set
    ops). A pipeline that only needs the COUNTS should prefer the
    single-exchange form — ONE groupBy(custkey) with two boolean
    max()-flags, segment = CASE over the flag pair — which this module
    uses everywhere the set-op surface isn't the point; at 100 TB that
    is 1 shuffle against this plan's reused 8."""
    orders = load(spark, sf_dir, "orders")
    h1 = orders.filter(F.col("o_orderdate") < F.lit(CHURN_SPLIT_DATE).cast("timestamp")).select(
        "o_custkey"
    ).distinct()
    h2 = orders.filter(F.col("o_orderdate") >= F.lit(CHURN_SPLIT_DATE).cast("timestamp")).select(
        "o_custkey"
    ).distinct()
    seg = (
        h1.intersect(h2).select(F.lit("retained").alias("segment"), "o_custkey")
        .unionByName(
            h1.exceptAll(h2).select(F.lit("churned").alias("segment"), "o_custkey")
        )
        .unionByName(
            h2.exceptAll(h1).select(F.lit("new").alias("segment"), "o_custkey")
        )
    )
    return (
        seg.groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("segment")
    )


CUSTOMER_CHURN_SEGMENTS_SQL = f"""
WITH h1 AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate < TIMESTAMP '{CHURN_SPLIT_DATE} 00:00:00'
),
h2 AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '{CHURN_SPLIT_DATE} 00:00:00'
),
seg AS (
  SELECT 'retained' AS segment, o_custkey FROM (SELECT * FROM h1 INTERSECT SELECT * FROM h2)
  UNION ALL
  SELECT 'churned', o_custkey FROM (SELECT * FROM h1 EXCEPT SELECT * FROM h2)
  UNION ALL
  SELECT 'new', o_custkey FROM (SELECT * FROM h2 EXCEPT SELECT * FROM h1)
)
SELECT segment, COUNT(*) AS n_customers
FROM seg GROUP BY segment ORDER BY segment
"""


# ---------------------------------------------------------------------------
# #130 percent-of-parent hierarchical shares: nation revenue as a share
# of its region and of the total — the two-level report every BI layer
# builds. ONE fact aggregate (nation grain); the share windows run over
# the 25-row nation tier, so the "unpartitioned window" is bounded by
# the dimension, never the data.


def regional_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    rev = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(dsum("o_totalprice", "revenue"))
    )
    w_r = Window.partitionBy("r_name")
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        rev.withColumn(
            "region_share",
            F.round(F.col("revenue") / F.sum(F.col("revenue").cast(DEC)).over(w_r).cast("double"), 9),
        )
        .withColumn(
            "total_share",
            F.round(F.col("revenue") / F.sum(F.col("revenue").cast(DEC)).over(w_all).cast("double"), 9),
        )
        .orderBy("r_name", "n_name")
    )


REGIONAL_SHARE_SQL = f"""
WITH rev AS (
  SELECT r_name, n_name, {sql_dsum('o_totalprice', 'revenue')}
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name
)
SELECT r_name, n_name, revenue,
       round(revenue / CAST(SUM(CAST(revenue AS DECIMAL(18,6))) OVER (PARTITION BY r_name) AS DOUBLE), 9) AS region_share,
       round(revenue / CAST(SUM(CAST(revenue AS DECIMAL(18,6))) OVER () AS DOUBLE), 9) AS total_share
FROM rev
ORDER BY r_name, n_name
"""


# ---------------------------------------------------------------------------
# #131 custom GROUPING SETS + grouping_id: the exact subtotal
# combinations a report needs — (year), (status), (year, status) — NOT
# the full cube (no grand total here), completing the rollup (#49) /
# cube (#49b) family; grouping_id disambiguates real NULLs from
# subtotal NULLs.


def sales_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    base = orders.withColumn("order_year", F.year("o_orderdate"))
    return (
        base.groupingSets(
            [["order_year"], ["o_orderstatus"], ["order_year", "o_orderstatus"]],
            "order_year",
            "o_orderstatus",
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), "total_price"),
        )
        .select("order_year", "o_orderstatus", "gid", "n_orders", "total_price")
    )


SALES_GROUPING_SETS_SQL = f"""
SELECT year(o_orderdate) AS order_year, o_orderstatus,
       CAST(grouping(year(o_orderdate)) * 2 + grouping(o_orderstatus) AS BIGINT) AS gid,
       COUNT(*) AS n_orders,
       {sql_dsum("o_totalprice", "total_price")}
FROM orders
GROUP BY GROUPING SETS ((year(o_orderdate)), (o_orderstatus),
                        (year(o_orderdate), o_orderstatus))
"""


# ---------------------------------------------------------------------------
# #137 revenue concentration: Gini coefficient + top-1%/top-10% share
# of per-customer revenue. The rank formula G = (2*Sum(r*x) - (n+1)*
# Sum(x)) / (n*Sum(x)) needs a GLOBAL revenue rank — supplied by
# transforms.global_rank (repartitionByRange + per-partition offsets),
# never a single-partition ORDER BY window. Facts collapse to one row
# per customer first, so every later pass runs at customer
# cardinality; totals ride a single-row broadcast.


def revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(dsum("o_totalprice", "revenue"))
    from ..operators.transforms import global_rank

    ranked = global_rank(rev, ["revenue", "o_custkey"], "r")
    totals = rev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("revenue").cast(DEC)).alias("total_dec"),
    )
    agg = (
        ranked.crossJoin(F.broadcast(totals))
        .agg(
            F.first("n").alias("n_customers"),
            F.first("total_dec").cast("double").alias("total"),
            F.sum((F.col("r") * F.col("revenue")).cast("decimal(38,6)"))
            .cast("double")
            .alias("sum_rx"),
            F.sum(
                F.when(
                    F.col("r") > F.col("n") - F.floor(F.col("n") / 100),
                    F.col("revenue"),
                )
                .otherwise(0)
                .cast(DEC)
            )
            .cast("double")
            .alias("top1"),
            F.sum(
                F.when(
                    F.col("r") > F.col("n") - F.floor(F.col("n") / 10),
                    F.col("revenue"),
                )
                .otherwise(0)
                .cast(DEC)
            )
            .cast("double")
            .alias("top10"),
        )
    )
    return agg.select(
        "n_customers",
        F.round(
            (2 * F.col("sum_rx") - (F.col("n_customers") + 1) * F.col("total"))
            / (F.col("n_customers") * F.col("total")),
            9,
        ).alias("gini"),
        F.round(F.col("top1") / F.col("total"), 9).alias("top1_share"),
        F.round(F.col("top10") / F.col("total"), 9).alias("top10_share"),
    )


REVENUE_GINI_SQL = """
WITH rev AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT revenue, row_number() OVER (ORDER BY revenue, o_custkey) AS r FROM rev
),
tot AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(revenue AS DECIMAL(18,6))) AS DOUBLE) AS total
  FROM rev
),
agg AS (
  SELECT CAST(MIN(n) AS BIGINT) AS n_customers,
         MIN(total) AS total,
         CAST(SUM(CAST(r * revenue AS DECIMAL(38,6))) AS DOUBLE) AS sum_rx,
         CAST(SUM(CAST(CASE WHEN r > n - n // 100 THEN revenue ELSE 0 END
                       AS DECIMAL(18,6))) AS DOUBLE) AS top1,
         CAST(SUM(CAST(CASE WHEN r > n - n // 10 THEN revenue ELSE 0 END
                       AS DECIMAL(18,6))) AS DOUBLE) AS top10
  FROM ranked CROSS JOIN tot
)
SELECT n_customers,
       round((2 * sum_rx - (n_customers + 1) * total) / (n_customers * total), 9) AS gini,
       round(top1 / total, 9) AS top1_share,
       round(top10 / total, 9) AS top10_share
FROM agg
"""


# ---------------------------------------------------------------------------
# #138 Benford first-digit screen: does o_totalprice follow the
# first-digit law? The fraud/data-entry screen auditors run. First
# digit via string head (no float log10 at the decade boundaries —
# log10(1000) flooring is a known 1-ulp trap); the 9-row digit tier
# carries counts, observed share, Benford expectation and the gap.


def benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load(spark, sf_dir, "orders")
    digits = (
        orders.select(
            F.substring(F.col("o_totalprice").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        digits.withColumn("share", F.round(F.col("n_orders") / F.sum("n_orders").over(w_all), 9))
        .withColumn(
            "benford_expected",
            F.round(F.log10(1 + 1 / F.col("digit").cast("double")), 9),
        )
        .withColumn(
            "gap", F.round(F.col("share") - F.col("benford_expected"), 9)
        )
        .orderBy("digit")
    )


BENFORD_DIGITS_SQL = """
WITH digits AS (
  SELECT CAST(substring(CAST(o_totalprice AS VARCHAR), 1, 1) AS INTEGER) AS digit,
         COUNT(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT digit, n_orders,
       round(CAST(n_orders AS DOUBLE) / SUM(n_orders) OVER (), 9) AS share,
       round(log10(1 + 1.0 / digit), 9) AS benford_expected,
       round(round(CAST(n_orders AS DOUBLE) / SUM(n_orders) OVER (), 9)
             - round(log10(1 + 1.0 / digit), 9), 9) AS gap
FROM digits
ORDER BY digit
"""


# ---------------------------------------------------------------------------
# #139 time-series autocorrelation of daily revenue at lags 1 and 7
# (the weekly-cycle diagnostic a forecasting pipeline checks first).
# Facts collapse to the calendar-bounded daily tier in ONE keyed
# aggregate — IN INTEGER CENTS, so every Pearson moment is an exact
# decimal(38,0) integer (partition-order-proof, engine-identical); the
# lag pairing is a calendar self-join of the tiny tier (exact "t vs
# t-k days", robust to gaps — unlike a row-offset lag), and the only
# doubles appear when the five finished moments enter the closed-form
# correlation.

AUTOCORR_LAGS = (1, 7)


def autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
            ).alias("cents")
        )
        .localCheckpoint(eager=True)
    )
    outs = []
    for lag in AUTOCORR_LAGS:
        a = daily.select(F.col("day").alias("d"), F.col("cents").alias("x"))
        b = daily.select(
            F.date_add(F.col("day"), lag).alias("d"), F.col("cents").alias("y")
        )
        m = (
            a.join(b, "d")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
                F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
                F.sum(
                    (F.col("x").cast("decimal(38,0)") * F.col("y"))
                ).alias("sxy"),
                F.sum(
                    (F.col("x").cast("decimal(38,0)") * F.col("x"))
                ).alias("sxx"),
                F.sum(
                    (F.col("y").cast("decimal(38,0)") * F.col("y"))
                ).alias("syy"),
            )
            .select(
                F.lit(lag).alias("lag"),
                F.col("n").alias("n_pairs"),
                F.round(
                    (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                        "double"
                    )
                    / F.sqrt(
                        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                            "double"
                        )
                        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
                            "double"
                        )
                    ),
                    6,
                ).alias("autocorr"),
            )
        )
        outs.append(m)
    out = outs[0]
    for m in outs[1:]:
        out = out.unionByName(m)
    return out.orderBy("lag")


AUTOCORR_DAILY_SQL = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
pairs AS (
  SELECT l.lag, a.cents AS x, b.cents AS y
  FROM (SELECT unnest([{", ".join(str(l) for l in AUTOCORR_LAGS)}]) AS lag) l
  JOIN daily a ON TRUE
  JOIN daily b ON a.day = b.day + to_days(CAST(l.lag AS INTEGER))
),
m AS (
  SELECT lag, COUNT(*) AS n,
         SUM(CAST(x AS DECIMAL(38,0))) AS sx,
         SUM(CAST(y AS DECIMAL(38,0))) AS sy,
         SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
         SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
         SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy
  FROM pairs GROUP BY lag
)
SELECT CAST(lag AS INTEGER) AS lag, CAST(n AS BIGINT) AS n_pairs,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS autocorr
FROM m
ORDER BY lag
"""


# ---------------------------------------------------------------------------
# #144 referential-integrity audit: orphan counts for the three core
# FK edges (lineitem→orders, orders→customer, customer→nation) — the
# dq_report (#90) checks columns, this checks EDGES. Each edge is ONE
# key-only LEFT OUTER join + ONE aggregate computing total and orphan
# counts together (a separate anti-join + child count would scan the
# child twice per edge — at 100 TB the extra fact scan is the cost);
# no forced hints per BROADCAST_POLICY (AQE broadcasts a parent key
# set that fits). Assumes parent keys unique (they are PKs — the
# dq_report uniqueness check is the guard); a duplicated parent key
# would inflate the fused counts where the anti-join form tolerates
# it — the documented tradeoff for one scan per edge.


def fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = [
        ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ]
    outs = []
    for name, child, ckey, parent, pkey in edges:
        c = load(spark, sf_dir, child).select(F.col(ckey).alias("k"))
        # dropDuplicates on the parent key: free for a true PK (one
        # map-side combine over an already-unique column), and it keeps
        # the left-join COUNT(*) formulation honest if a parent key
        # ever duplicates — without it every child row matching a
        # doubled parent would count twice, silently inflating
        # n_child_rows (r5 verdict ask; property test in
        # tests/test_analytics_extras.py).
        p = (
            load(spark, sf_dir, parent)
            .select(F.col(pkey).alias("k"), F.lit(1).alias("_hit"))
            .dropDuplicates(["k"])
        )
        outs.append(
            c.join(p, "k", "left")
            .agg(
                F.count(F.lit(1)).alias("n_child_rows"),
                F.sum(
                    F.when(F.col("_hit").isNull(), 1).otherwise(0)
                ).alias("n_orphans"),
            )
            .select(
                F.lit(name).alias("fk"), "n_child_rows", "n_orphans"
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("fk")


FK_INTEGRITY_SQL = """
SELECT 'lineitem->orders' AS fk,
       (SELECT COUNT(*) FROM lineitem) AS n_child_rows,
       (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
          (SELECT 1 FROM orders o WHERE l.l_orderkey = o.o_orderkey)) AS n_orphans
UNION ALL
SELECT 'orders->customer',
       (SELECT COUNT(*) FROM orders),
       (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
          (SELECT 1 FROM customer c WHERE o.o_custkey = c.c_custkey))
UNION ALL
SELECT 'customer->nation',
       (SELECT COUNT(*) FROM customer),
       (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
          (SELECT 1 FROM nation n WHERE c.c_nationkey = n.n_nationkey))
ORDER BY fk
"""


# ---------------------------------------------------------------------------
# #146 weighted percentiles: quantity-weighted price quantiles per
# return flag — "what price level covers half the shipped units", the
# weighted generalization of the exact-percentile family. The flag key
# is FEW-HUGE (3 values over the whole fact table), so a
# Window.partitionBy(flag) running sum would funnel each flag through
# one task; transforms.keyed_prefix_sum instead range-partitions
# (flag, price), cumulates per partition, and stitches with ≤ P+K
# driver scalars. Weights ride decimals end-to-end: the threshold
# crossing (cum ≥ q·W ∧ cum−w < q·W) is exact integer-ish arithmetic,
# engine-identical, and selects the crossing PRICE (unique even when
# tie order within equal prices is partition-dependent).

def weighted_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.transforms import keyed_prefix_sum_with_totals

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    )
    # collapse to the (flag, price) tier FIRST — one map-side-combined
    # aggregate shrinks the frame the prefix pass must range-pin and
    # checkpoint (the crossing selects an x VALUE, so summing tied-x
    # weights up front changes nothing; measured 3.6 s → fact-tier
    # checkpoint was the whole cost at sf0.1)
    # quantities are integral units — ride LONG end-to-end (the
    # decimal(28,6) route was exact too, but precision-28 sums take
    # Spark's BigDecimal path: the tier agg alone measured ~1 s at
    # sf0.1 vs ~0.3 s in long; a long cumsum holds ~9.2e18, far above
    # unit volumes at 100 TB)
    tier = li.groupBy("l_returnflag", "l_extendedprice").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("_tw")
    )
    # totals come FREE from the prefix pass's driver sums, and both
    # crossings collapse into ONE conditional aggregate — the cumsum
    # window (which re-evaluates per consuming action; see
    # keyed_prefix_sum's note) is computed exactly once
    cum, tot = keyed_prefix_sum_with_totals(
        tier,
        ["l_returnflag"],
        ["l_extendedprice"],
        "_tw",
        out_col="_cw",
        weight_type="long",
    )
    # K-row totals frame (bounded flag domain) — policy-exempt
    j = cum.join(F.broadcast(tot), "l_returnflag")

    def crossing(k10: int) -> F.Column:
        # cum >= (k10/10)·W multiplied through by 10: pure integer
        # comparisons, identical values to the decimal formulation on
        # integral weights
        t = F.col("total") * F.lit(k10)
        hit = (F.col("_cw") * 10 >= t) & ((F.col("_cw") - F.col("_tw")) * 10 < t)
        return F.min(F.when(hit, F.col("l_extendedprice")))

    res = j.groupBy("l_returnflag").agg(
        crossing(5).alias("p50_price"),
        crossing(9).alias("p90_price"),
    )
    return (
        tot.select(
            "l_returnflag", F.col("total").cast("long").alias("total_qty")
        )
        .join(res, "l_returnflag")
        .select("l_returnflag", "total_qty", "p50_price", "p90_price")
        .orderBy("l_returnflag")
    )


WEIGHTED_PERCENTILES_SQL = """
WITH cum AS (
  SELECT l_returnflag, l_extendedprice,
         CAST(l_quantity AS DECIMAL(28,6)) AS w,
         SUM(CAST(l_quantity AS DECIMAL(28,6))) OVER (
           PARTITION BY l_returnflag ORDER BY l_extendedprice
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
  FROM lineitem
),
tot AS (
  SELECT l_returnflag, SUM(CAST(l_quantity AS DECIMAL(28,6))) AS W
  FROM lineitem GROUP BY 1
)
SELECT t.l_returnflag, CAST(t.W AS BIGINT) AS total_qty,
  (SELECT MIN(l_extendedprice) FROM cum c
    WHERE c.l_returnflag = t.l_returnflag
      AND c.cw >= t.W * CAST(0.5 AS DECIMAL(3,2))
      AND c.cw - c.w < t.W * CAST(0.5 AS DECIMAL(3,2))) AS p50_price,
  (SELECT MIN(l_extendedprice) FROM cum c
    WHERE c.l_returnflag = t.l_returnflag
      AND c.cw >= t.W * CAST(0.9 AS DECIMAL(3,2))
      AND c.cw - c.w < t.W * CAST(0.9 AS DECIMAL(3,2))) AS p90_price
FROM tot t ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# #147 skyline (Pareto frontier): parts minimizing retail price while
# maximizing size — no other part is cheaper-and-at-least-as-big or
# same-price-and-strictly-bigger. The naive formulation is an O(n²)
# dominance anti-join; the scale plan collapses to the price tier
# (max size per distinct price), computes the EXCLUSIVE prefix max of
# size over ascending price with the distributed-prefix pattern
# (range partition → per-partition running max → ≤ P driver scalars
# stitched as a CASE literal — global_rank's shape with MAX for SUM),
# then one price-keyed join back to parts decides dominance:
# dominated ⟺ prefix_max_below ≥ size ∨ max_at_same_price > size.

def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.transforms import skyline_2d

    part = load(spark, sf_dir, "part")
    return (
        skyline_2d(part, "p_retailprice", "p_size")
        .select("p_partkey", "p_retailprice", "p_size")
        .orderBy("p_partkey")
    )


SKYLINE_PARTS_SQL = """
SELECT p_partkey, p_retailprice, p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
)
ORDER BY p_partkey
"""


# ---------------------------------------------------------------------------
# #148 duplicate-payment screen: order pairs from the same customer in
# the SAME amount band (floor(price / BAND) — pure IEEE divide+floor,
# bit-identical in both engines) within a year. The join key is the
# COMPOSITE (custkey, band) — a full-fact self-join that shuffles once
# on a key whose cardinality grows with the data (no celebrity-customer
# skew: the amount component spreads any single customer's orders),
# then the date-window predicate prunes pairs post-join. An exact
# equality key would be the production setting; the band keeps the
# screen non-empty on synthetic continuous amounts.

DUP_PAYMENT_BAND = 5000
DUP_PAYMENT_DAYS = 365


def duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.floor(F.col("o_totalprice") / DUP_PAYMENT_BAND).alias("_band"),
    )
    a = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("_band"),
        F.col("o_orderkey").alias("okey1"),
        F.col("o_orderdate").alias("d1"),
        F.col("o_totalprice").alias("amount1"),
    )
    b = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("_band"),
        F.col("o_orderkey").alias("okey2"),
        F.col("o_orderdate").alias("d2"),
        F.col("o_totalprice").alias("amount2"),
    )
    return (
        a.join(b, ["custkey", "_band"])
        .where(
            (F.col("okey1") < F.col("okey2"))
            & (
                F.abs(F.datediff(F.col("d2"), F.col("d1")))
                <= DUP_PAYMENT_DAYS
            )
        )
        .select(
            "custkey",
            "okey1",
            "okey2",
            F.datediff(F.col("d2"), F.col("d1")).alias("day_gap"),
            "amount1",
            "amount2",
        )
        .orderBy("okey1", "okey2")
    )


DUPLICATE_PAYMENTS_SQL = f"""
WITH o AS (
  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
         CAST(floor(o_totalprice / {DUP_PAYMENT_BAND}) AS BIGINT) AS band
  FROM orders
)
SELECT a.o_custkey AS custkey, a.o_orderkey AS okey1, b.o_orderkey AS okey2,
       datediff('day', a.o_orderdate, b.o_orderdate) AS day_gap,
       a.o_totalprice AS amount1, b.o_totalprice AS amount2
FROM o a JOIN o b
  ON a.o_custkey = b.o_custkey AND a.band = b.band
 AND a.o_orderkey < b.o_orderkey
 AND abs(datediff('day', a.o_orderdate, b.o_orderdate)) <= {DUP_PAYMENT_DAYS}
ORDER BY okey1, okey2
"""


# ---------------------------------------------------------------------------
# #149 Kaplan-Meier life table: time from order placement to LAST
# shipment, with open/pending orders (status ≠ 'F') treated as
# right-censored at their last observed ship date — the survival-
# analysis staple for "how long until an order fully ships". All
# quantities are exact integers: d (events) and c (censored) per
# distinct day-delta, n_risk via N_total − exclusive prefix count
# (transforms.keyed_prefix_sum with NO key — the distributed global
# running sum, not an unpartitioned window), and the per-step hazard
# as integer parts-per-million (d·10⁶ div n — integer division in both
# engines; a double divide could round across the floor boundary).

def kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.transforms import keyed_prefix_sum_with_totals

    orders = load(spark, sf_dir, "orders")
    last_ship = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("_last_ship"))
    )
    t = (
        orders.join(
            last_ship, orders["o_orderkey"] == last_ship["l_orderkey"]
        )
        .select(
            F.datediff(F.col("_last_ship"), F.col("o_orderdate")).alias("t_days"),
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("_ev"),
        )
    )
    tier = t.groupBy("t_days").agg(
        F.sum("_ev").alias("d_events"),
        F.sum(1 - F.col("_ev")).alias("c_censored"),
        F.count(F.lit(1)).alias("_n_at"),
    )
    # N comes FREE from the prefix pass's driver sums (single-row
    # totals frame) — no second pass over the cumsum window, no re-run
    # of the fact join+aggregate
    cum, tot = keyed_prefix_sum_with_totals(
        tier, [], ["t_days"], "_n_at", out_col="_cum"
    )
    total = tot.select(F.col("total").cast("long").alias("_N"))
    return (
        cum.crossJoin(F.broadcast(total))  # single-row scalar; policy-exempt
        .select(
            "t_days",
            "d_events",
            "c_censored",
            (F.col("_N") - F.col("_cum").cast("long") + F.col("_n_at"))
            .alias("n_risk"),
        )
        .withColumn(
            "hazard_ppm",
            F.expr("(d_events * 1000000L) div n_risk"),
        )
        .orderBy("t_days")
    )


KAPLAN_MEIER_SQL = """
WITH t AS (
  SELECT datediff('day', o.o_orderdate, ls.last_ship) AS t_days,
         CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev
  FROM orders o
  JOIN (SELECT l_orderkey, MAX(l_shipdate) AS last_ship
        FROM lineitem GROUP BY 1) ls
    ON o.o_orderkey = ls.l_orderkey
),
tier AS (
  SELECT t_days, CAST(SUM(ev) AS BIGINT) AS d_events,
         CAST(SUM(1 - ev) AS BIGINT) AS c_censored,
         COUNT(*) AS n_at
  FROM t GROUP BY 1
)
SELECT t_days, d_events, c_censored,
       CAST(SUM(n_at) OVER (ORDER BY t_days DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS n_risk,
       (d_events * 1000000) // CAST(SUM(n_at) OVER (ORDER BY t_days DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS hazard_ppm
FROM tier
ORDER BY t_days
"""


# ---------------------------------------------------------------------------
# #150 cohort LTV: customers grouped by first-order month, revenue
# accumulated by months-since-acquisition — the lifetime-value curve
# every growth dashboard draws next to retention (#83, which counts
# users; this sums money). Month arithmetic stays integer
# (year·12 + month — months_between() returns fractional doubles),
# revenue stays integer cents, and the cumulative sum runs over the
# (cohort, age) tier — calendar-bounded, so the per-cohort window is
# a bounded frame, not a data-proportional funnel.

def cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    first = orders.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("_first")
    )
    j = orders.join(first, "o_custkey").select(
        F.date_format("_first", "yyyy-MM").alias("cohort"),
        (
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            - (F.year("_first") * 12 + F.month("_first"))
        ).alias("age_months"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).alias("_cents"),
    )
    tier = j.groupBy("cohort", "age_months").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("_cents").cast("decimal(38,0)")).alias("_rev"),
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return tier.select(
        "cohort",
        "age_months",
        "n_orders",
        F.col("_rev").cast("long").alias("revenue_cents"),
        F.sum("_rev").over(w).cast("long").alias("cum_revenue_cents"),
    ).orderBy("cohort", "age_months")


COHORT_LTV_SQL = """
WITH first AS (
  SELECT o_custkey, MIN(o_orderdate) AS f FROM orders GROUP BY 1
),
j AS (
  SELECT strftime(f.f, '%Y-%m') AS cohort,
         (year(o.o_orderdate) * 12 + month(o.o_orderdate))
           - (year(f.f) * 12 + month(f.f)) AS age_months,
         CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders o JOIN first f ON o.o_custkey = f.o_custkey
),
tier AS (
  SELECT cohort, age_months, COUNT(*) AS n_orders,
         CAST(SUM(cents) AS BIGINT) AS revenue_cents
  FROM j GROUP BY 1, 2
)
SELECT cohort, age_months, n_orders, revenue_cents,
       CAST(SUM(revenue_cents) OVER (PARTITION BY cohort ORDER BY age_months
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_revenue_cents
FROM tier
ORDER BY cohort, age_months
"""


# ---------------------------------------------------------------------------
# #163 discount elasticity: OLS of ln(quantity) on ln(1 − discount)
# over the fact table — "does discounting move volume" in one number
# (the slope IS the price elasticity under a log-log demand model).
# The zipf_fit numeric discipline taken all-integer: regressors
# quantized to LONG nanos (floor(ln·10⁹ + 0.5)), per-row products
# exact in long (|xn| ≤ 1.1e8, |yn| ≤ 4e9 → |xn·yn| ≤ 4.2e17 < 2⁶³),
# moments summed in decimal(38,0) ⇔ DuckDB hugeint — bit-identical
# integers in both engines, doubles only in the closed form. The
# nano scaling cancels in the slope ratio; the intercept divides the
# 1e9 back out. Chosen over double→decimal(38,12) per-row casts for
# speed: Spark's wide-decimal cast/sum path measured 1.75 s vs 0.30 s
# for long products + integer-decimal sums on the same sf0.1 scan.

def discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    pts = li.select(
        F.floor(F.log(1 - F.col("l_discount")) * 1e9 + F.lit(0.5))
        .cast("long")
        .alias("xn"),
        F.floor(F.log(F.col("l_quantity")) * 1e9 + F.lit(0.5))
        .cast("long")
        .alias("yn"),
    )
    DI = "decimal(38,0)"
    m = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("xn").cast(DI)).alias("sx"),
        F.sum(F.col("yn").cast(DI)).alias("sy"),
        F.sum((F.col("xn") * F.col("xn")).cast(DI)).alias("sxx"),
        F.sum((F.col("xn") * F.col("yn")).cast(DI)).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den  # nano² / nano² — scale cancels exactly
    # intercept in ORIGINAL units: (Σy − slope·Σx)/n with Σ in nanos,
    # so ·1e9 for the output quantization cancels the nano scale.
    icept_num = F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    return m.select(
        "n",
        F.when(den != 0, F.floor(slope * 1e9 + F.lit(0.5)) / 1e9).alias("elasticity"),
        F.when(den != 0, F.floor(icept_num / F.col("n") + F.lit(0.5)) / 1e9).alias(
            "intercept"
        ),
    )


# Long-nano regressors, BIGINT products, HUGEINT sums — the same exact
# integers Spark's decimal(38,0) sums produce; doubles only in the
# closed form (floor() output is integral, so the BIGINT cast's
# round-vs-truncate engine difference cannot bite).
DISCOUNT_ELASTICITY_SQL = """
WITH pts AS (
  SELECT CAST(floor(ln(1 - l_discount) * 1e9 + 0.5) AS BIGINT) AS xn,
         CAST(floor(ln(l_quantity) * 1e9 + 0.5) AS BIGINT) AS yn
  FROM lineitem
),
m AS (
  SELECT COUNT(*) AS n,
         SUM(xn) AS sx,
         SUM(yn) AS sy,
         SUM(xn * xn) AS sxx,
         SUM(xn * yn) AS sxy
  FROM pts
)
SELECT n,
       CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) != 0
            THEN floor(CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE) * 1e9 + 0.5) / 1e9
            END AS elasticity,
       CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) != 0
            THEN floor((CAST(sy AS DOUBLE)
                        - (CAST(n * sxy - sx * sy AS DOUBLE)
                           / CAST(n * sxx - sx * sx AS DOUBLE))
                          * CAST(sx AS DOUBLE)) / n + 0.5) / 1e9
            END AS intercept
FROM m
"""


# ---------------------------------------------------------------------------
# #164 CUSUM changepoint screen on daily revenue: the one-sided
# cumulative-sum control chart S_t = max(0, S_{t−1} + (x_t − μ)) that
# flags sustained upward shifts a z-score misses. ALL-INTEGER
# recurrence: multiplying through by n gives
# T_t = max(0, T_{t−1} + n·cents_t − total_cents) — exact in BIGINT,
# bit-identical in any engine (the r5 "exact integers beat rounded
# doubles" lesson applied to a recursion). The daily tier is
# calendar-bounded, so the single-partition fold is a bounded frame
# (ks_drift's justification), done in one Arrow batch.

def cusum_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    orders = load(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                    "decimal(38,0)"
                )
            )
            .cast("long")
            .alias("revenue_cents")
        )
    )
    tot = daily.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("revenue_cents").cast("decimal(38,0)")).cast("long").alias("_tot"),
    )
    j = daily.crossJoin(F.broadcast(tot))  # single-row scalars; policy-exempt

    def fold(batches):
        rows = []
        for pdf in batches:
            rows.append(pdf)
        if not rows:
            return
        pdf = pd.concat(rows).sort_values("d")
        t = 0
        out = []
        for cents, n, total in zip(pdf["revenue_cents"], pdf["_n"], pdf["_tot"]):
            t = max(0, t + int(n) * int(cents) - int(total))
            out.append(t)
        pdf["cusum_n"] = out
        yield pdf[["d", "revenue_cents", "cusum_n"]]

    return (
        j.repartition(1)  # calendar-bounded tier: one task holds ≤ years×365 rows
        .mapInPandas(fold, "d date, revenue_cents long, cusum_n long")
        .orderBy("d")
    )


# MATERIALIZED hints (DuckDB-only syntax; the oracle never runs on
# Spark): DuckDB 1.0 inlines plain CTEs, so un-hinted `base` — and
# `daily` under it, referenced 3x — would be re-evaluated at every one
# of the ~n_days recursion steps, re-aggregating the orders scan each
# time (measured 14.4 s at sf0.01 vs ~0.2 s materialized).
CUSUM_REVENUE_SQL = """
WITH RECURSIVE daily AS MATERIALIZED (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS revenue_cents
  FROM orders GROUP BY 1
),
base AS MATERIALIZED (
  SELECT d, revenue_cents,
         row_number() OVER (ORDER BY d) AS rn,
         (SELECT COUNT(*) FROM daily) AS n,
         (SELECT CAST(SUM(revenue_cents) AS BIGINT) FROM daily) AS total
  FROM daily
),
r AS (
  SELECT d, revenue_cents, rn, n, total,
         CAST(greatest(0, n * revenue_cents - total) AS BIGINT) AS cusum_n
  FROM base WHERE rn = 1
  UNION ALL
  SELECT b.d, b.revenue_cents, b.rn, b.n, b.total,
         CAST(greatest(0, r.cusum_n + b.n * b.revenue_cents - b.total) AS BIGINT)
  FROM r JOIN base b ON b.rn = r.rn + 1
)
SELECT d, revenue_cents, cusum_n FROM r ORDER BY d
"""


# ---------------------------------------------------------------------------
# #165 market concentration (HHI) per nation: Herfindahl–Hirschman
# index of supplier revenue shares — the antitrust-style "is this
# market a monopoly" number beside Gini's inequality view (#137).
# Shares are double ratios of exact integer cents (both < 2⁵³, so the
# decimal→double cast is exact in every engine); each share² is
# quantized floor(x·10¹²+0.5)/10¹² THEN decimal-summed — never a raw
# double Σ (partition-order drift), never a >2⁵³ integer Σrev²
# (DuckDB's hugeint→double cast isn't correctly rounded).

def hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    rev = (
        li.join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .groupBy("s_nationkey", "s_suppkey")
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                    + F.lit(0.5)
                ).cast("decimal(38,0)")
            )
            .cast("long")
            .alias("_cents")
        )
    )
    tot = rev.groupBy("s_nationkey").agg(
        F.sum(F.col("_cents").cast("decimal(38,0)")).cast("long").alias("_tot")
    )
    terms = rev.join(tot, "s_nationkey").select(
        "s_nationkey",
        (
            F.floor(
                (F.col("_cents").cast("double") / F.col("_tot"))
                * (F.col("_cents").cast("double") / F.col("_tot"))
                * 1e12
                + F.lit(0.5)
            )
            / 1e12
        ).alias("_s2"),
    )
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        terms.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(F.col("_s2").cast("decimal(28,13)"))
            .cast("double")
            .alias("hhi"),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", "n_suppliers", "hhi")
        .orderBy("n_name")
    )


HHI_CONCENTRATION_SQL = """
WITH rev AS (
  SELECT s.s_nationkey, l.l_suppkey,
         CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                       AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
),
tot AS (
  SELECT s_nationkey, CAST(SUM(cents) AS BIGINT) AS tot FROM rev GROUP BY 1
),
terms AS (
  SELECT r.s_nationkey,
         floor((CAST(r.cents AS DOUBLE) / t.tot) * (CAST(r.cents AS DOUBLE) / t.tot) * 1e12 + 0.5) / 1e12 AS s2
  FROM rev r JOIN tot t ON r.s_nationkey = t.s_nationkey
)
SELECT n.n_name, COUNT(*) AS n_suppliers,
       CAST(SUM(CAST(s2 AS DECIMAL(28,13))) AS DOUBLE) AS hhi
FROM terms tm JOIN nation n ON tm.s_nationkey = n.n_nationkey
GROUP BY 1
ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# #166 ABC inventory classification: parts ranked by discounted
# revenue descending, classed A/B/C at the 80%/95% cumulative-share
# marks — the warehouse-ops staple. One keyed revenue aggregate, then
# the distributed prefix sum over (−revenue, partkey) — a TOTAL order,
# so the cumulative is deterministic — with totals free from the
# driver pass; class boundaries compare DECIMAL cum against
# total·0.80/0.95 exactly (no double share rounding at the boundary).

def abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.transforms import keyed_prefix_sum_with_totals

    li = load(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                + F.lit(0.5)
            ).cast("decimal(38,0)")
        )
        .cast("long")
        .alias("_cents")
    ).withColumn("_negrev", -F.col("_cents"))
    cum, tot = keyed_prefix_sum_with_totals(
        rev, [], ["_negrev", "l_partkey"], "_cents", out_col="_cum"
    )
    j = cum.crossJoin(F.broadcast(tot))  # single-row total; policy-exempt
    cls = (
        F.when(F.col("_cum") <= F.expr("total * CAST(0.80 AS DECIMAL(3,2))"), "A")
        .when(F.col("_cum") <= F.expr("total * CAST(0.95 AS DECIMAL(3,2))"), "B")
        .otherwise("C")
    )
    return (
        j.groupBy(cls.alias("abc_class"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(F.col("_cents").cast("decimal(38,0)"))
            .cast("long")
            .alias("revenue_cents"),
            F.first(F.col("total").cast("long")).alias("_t"),
        )
        .select(
            "abc_class",
            "n_parts",
            "revenue_cents",
            (
                F.floor(
                    F.col("revenue_cents").cast("double") / F.col("_t") * 1e9
                    + F.lit(0.5)
                )
                / 1e9
            ).alias("revenue_share"),
        )
        .orderBy("abc_class")
    )


ABC_CLASSIFICATION_SQL = """
WITH rev AS (
  SELECT l_partkey,
         CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                       AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem GROUP BY 1
),
cum AS (
  SELECT l_partkey, cents,
         SUM(CAST(cents AS DECIMAL(28,6))) OVER (
           ORDER BY cents DESC, l_partkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
         (SELECT SUM(CAST(cents AS DECIMAL(28,6))) FROM rev) AS t
  FROM rev
),
classed AS (
  SELECT CASE WHEN c <= t * CAST(0.80 AS DECIMAL(3,2)) THEN 'A'
              WHEN c <= t * CAST(0.95 AS DECIMAL(3,2)) THEN 'B'
              ELSE 'C' END AS abc_class,
         cents, CAST(t AS BIGINT) AS t
  FROM cum
)
SELECT abc_class, COUNT(*) AS n_parts,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents,
       floor(CAST(SUM(cents) AS DOUBLE) / MIN(t) * 1e9 + 0.5) / 1e9
         AS revenue_share
FROM classed
GROUP BY 1
ORDER BY abc_class
"""


# ---------------------------------------------------------------------------
# #167 spend-quartile migration matrix: customers quartiled by spend in
# the first vs second half of the calendar (pivot 1998-01-01 — the data
# midpoint), counted by (from, to) cell — the cohort-movement view a
# CRM draws next to churn segments (#129 says who left; this says who
# moved up or down). Both quartilings ride ONE stacked
# global_ntile_multi boundary pass (skip_nulls: a customer absent from
# a half is excluded from that half's ranking — the two earlier
# global_ntile calls each range-exchanged and checkpointed their half
# separately); the scored customer tier never shuffles, then one
# 16-cell aggregate.

SEG_PIVOT = "1998-01-01"


def segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.transforms import global_ntile_multi

    orders = load(spark, sf_dir, "orders")
    h1 = F.col("o_orderdate") < F.lit(SEG_PIVOT).cast("timestamp")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
        "decimal(38,0)"
    )
    # one customer row with both halves' spend (NULL where absent)
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.when(h1, cents)).cast("long").alias("_c1"),
        F.sum(F.when(~h1, cents)).cast("long").alias("_c2"),
    )
    scored = global_ntile_multi(
        spend,
        4,
        [(["_c1", "o_custkey"], "q_from"), (["_c2", "o_custkey"], "q_to")],
        stack_cast="double",  # cents ≪ 2^53 — order-exact
        skip_nulls=True,
    )
    return (
        scored.where(F.col("_c1").isNotNull() & F.col("_c2").isNotNull())
        .groupBy("q_from", "q_to")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("q_from", "q_to")
    )


SEGMENT_MIGRATION_SQL = f"""
WITH spend AS (
  SELECT o_custkey,
         o_orderdate < TIMESTAMP '{SEG_PIVOT} 00:00:00' AS h1,
         CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1, 2
),
q1 AS (
  SELECT o_custkey, ntile(4) OVER (ORDER BY cents, o_custkey) AS q_from
  FROM spend WHERE h1
),
q2 AS (
  SELECT o_custkey, ntile(4) OVER (ORDER BY cents, o_custkey) AS q_to
  FROM spend WHERE NOT h1
)
SELECT q1.q_from, q2.q_to, COUNT(*) AS n_customers
FROM q1 JOIN q2 ON q1.o_custkey = q2.o_custkey
GROUP BY 1, 2
ORDER BY q_from, q_to
"""


# ---------------------------------------------------------------------------
# #168 Lorenz curve (customer revenue deciles): the curve behind the
# Gini number (#137) — cumulative revenue share by spend decile. One
# customer aggregate, a distributed global_ntile (no single-task
# window), a 10-row decile tier; the cumulative share comes from a
# triangular self-join of that BOUNDED tier (≤ 10×10 rows) instead of
# an unpartitioned window, so the plan stays inside the window budget.

def lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.transforms import global_ntile

    orders = load(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                "decimal(38,0)"
            )
        )
        .cast("long")
        .alias("_cents")
    )
    dec = global_ntile(spend, 10, ["_cents", "o_custkey"], bucket_col="decile")
    tier = dec.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("_cents").cast("decimal(38,0)")).cast("long").alias(
            "revenue_cents"
        ),
    )
    t2 = tier.select(
        F.col("decile").alias("_d2"), F.col("revenue_cents").alias("_r2")
    )
    tot = tier.agg(
        F.sum(F.col("revenue_cents").cast("decimal(38,0)")).cast("long").alias("_t")
    )
    return (
        tier.join(t2, F.col("_d2") <= F.col("decile"))
        .groupBy("decile", "n_customers", "revenue_cents")
        .agg(
            F.sum(F.col("_r2").cast("decimal(38,0)")).cast("long").alias("_cumrev")
        )
        .crossJoin(F.broadcast(tot))  # single-row total; policy-exempt
        .select(
            "decile",
            "n_customers",
            "revenue_cents",
            (
                F.floor(
                    F.col("_cumrev").cast("double") / F.col("_t") * 1e9
                    + F.lit(0.5)
                )
                / 1e9
            ).alias("cum_revenue_share"),
        )
        .orderBy("decile")
    )


LORENZ_CURVE_SQL = """
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
),
dec AS (
  SELECT o_custkey, cents,
         ntile(10) OVER (ORDER BY cents, o_custkey) AS decile
  FROM spend
),
tier AS (
  SELECT decile, COUNT(*) AS n_customers,
         CAST(SUM(cents) AS BIGINT) AS revenue_cents
  FROM dec GROUP BY 1
)
SELECT t.decile, t.n_customers, t.revenue_cents,
       floor(CAST((SELECT SUM(t2.revenue_cents) FROM tier t2
                   WHERE t2.decile <= t.decile) AS DOUBLE)
             / (SELECT SUM(revenue_cents) FROM tier) * 1e9 + 0.5) / 1e9
         AS cum_revenue_share
FROM tier t
ORDER BY decile
"""


# ---------------------------------------------------------------------------
# #175 repeat-purchase intervals: days between a customer's
# consecutive orders, histogrammed by week band — the purchase-cadence
# distribution behind replenishment forecasting and churn cutoffs
# (RFM #123 uses only the LAST gap; this keeps them all). Per-customer
# lag window (millions of small keys — the right window regime), then
# one bounded aggregate; all-integer day math, band by integer
# division (a double divide under floor() could mis-band exact
# multiples of 7 — the lexical-diversity rule).

def repeat_purchase_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("_d"), "o_orderkey"
    )
    w = Window.partitionBy("o_custkey").orderBy("_d", "o_orderkey")
    gaps = (
        o.withColumn("_prev", F.lag("_d").over(w))
        .where(F.col("_prev").isNotNull())
        .select(F.datediff(F.col("_d"), F.col("_prev")).cast("long").alias("_gap"))
    )
    return (
        gaps.groupBy(F.expr("CAST(_gap div 7 AS BIGINT)").alias("week_band"))
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.min("_gap").alias("min_days"),
            F.max("_gap").alias("max_days"),
            (
                F.floor(
                    F.sum("_gap").cast("double") / F.count(F.lit(1)) * 1e2
                    + F.lit(0.5)
                )
                / 1e2
            ).alias("avg_days"),
        )
        .orderBy("week_band")
    )


REPEAT_PURCHASE_SQL = """
WITH g AS (
  SELECT (d - prev) AS gap_days FROM (
    SELECT CAST(o_orderdate AS DATE) AS d,
           lag(CAST(o_orderdate AS DATE)) OVER (
             PARTITION BY o_custkey
             ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS prev
    FROM orders)
  WHERE prev IS NOT NULL
)
SELECT CAST(gap_days // 7 AS BIGINT) AS week_band,
       COUNT(*) AS n_gaps,
       CAST(MIN(gap_days) AS BIGINT) AS min_days,
       CAST(MAX(gap_days) AS BIGINT) AS max_days,
       floor(CAST(SUM(gap_days) AS DOUBLE) / COUNT(*) * 1e2 + 0.5) / 1e2
         AS avg_days
FROM g
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# #176 revenue/volume cross-correlation: Pearson correlation between
# daily revenue and daily order COUNT at lags 0/1/7 — "does volume
# lead revenue" (autocorr #139 correlates revenue with itself; this
# crosses the two series). Same calendar-bounded daily tier, same
# decimal(38,0) moment discipline; the tier is localCheckpointed once
# and reused by all lags.

CROSSCORR_LAGS = (0, 1, 7)


def revenue_order_crosscorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
            ).alias("cents"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .localCheckpoint(eager=True)
    )
    outs = []
    for lag in CROSSCORR_LAGS:
        a = daily.select(F.col("day").alias("d"), F.col("cents").alias("x"))
        b = daily.select(
            F.date_add(F.col("day"), lag).alias("d"),
            F.col("n_orders").alias("y"),
        )
        m = (
            a.join(b, "d")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
                F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
                F.sum((F.col("x").cast("decimal(38,0)") * F.col("y"))).alias("sxy"),
                F.sum((F.col("x").cast("decimal(38,0)") * F.col("x"))).alias("sxx"),
                F.sum((F.col("y").cast("decimal(38,0)") * F.col("y"))).alias("syy"),
            )
            .select(
                F.lit(lag).alias("lag"),
                F.col("n").alias("n_pairs"),
                F.round(
                    (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                        "double"
                    )
                    / F.sqrt(
                        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                            "double"
                        )
                        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
                            "double"
                        )
                    ),
                    6,
                ).alias("crosscorr"),
            )
        )
        outs.append(m)
    out = outs[0]
    for m in outs[1:]:
        out = out.unionByName(m)
    return out.orderBy("lag")


REVENUE_ORDER_CROSSCORR_SQL = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS cents,
         COUNT(*) AS n_orders
  FROM orders GROUP BY 1
),
pairs AS (
  SELECT l.lag, a.cents AS x, b.n_orders AS y
  FROM (SELECT unnest([{", ".join(str(l) for l in CROSSCORR_LAGS)}]) AS lag) l
  JOIN daily a ON TRUE
  JOIN daily b ON a.day = b.day + to_days(CAST(l.lag AS INTEGER))
),
m AS (
  SELECT lag, COUNT(*) AS n,
         SUM(CAST(x AS DECIMAL(38,0))) AS sx,
         SUM(CAST(y AS DECIMAL(38,0))) AS sy,
         SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
         SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
         SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy
  FROM pairs GROUP BY lag
)
SELECT CAST(lag AS INTEGER) AS lag, CAST(n AS BIGINT) AS n_pairs,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS crosscorr
FROM m
ORDER BY lag
"""


# ---------------------------------------------------------------------------
# #178 weekday revenue index: each weekday's revenue share vs the flat
# 1/7 baseline (index > 1 = over-indexed day) — the weekly twin of the
# hour-of-day seasonality (#119). One fact aggregate to a 7-row tier;
# the grand total comes from the TIER (7 rows), attached as a
# single-row broadcast scalar — the fact table is scanned once.

def weekday_revenue_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    tier = orders.groupBy(
        F.dayofweek(F.to_date("o_orderdate")).alias("weekday")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
        ).alias("_cents"),
    )
    total = tier.agg(F.sum("_cents").alias("_tot"))
    return (
        tier.crossJoin(F.broadcast(total))  # single-row scalar
        .select(
            "weekday",
            "n_orders",
            (
                F.floor(
                    F.col("_cents").cast("double") / F.col("_tot") * 7 * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("rev_index"),
        )
        .orderBy("weekday")
    )


WEEKDAY_REVENUE_INDEX_SQL = """
WITH tier AS (
  SELECT CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS INTEGER) AS weekday,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1
)
SELECT weekday, n_orders,
       floor(CAST(cents AS DOUBLE) / t.tot * 7 * 1e6 + 0.5) / 1e6 AS rev_index
FROM tier, (SELECT CAST(SUM(cents) AS BIGINT) AS tot FROM tier) t
ORDER BY weekday
"""


# ---------------------------------------------------------------------------
# #179 part sales momentum: shipped quantity in the trailing 28 days
# vs the 28 days before that (anchored at the corpus max ship date) —
# the velocity screen behind stock-out risk and trend-spotting. The
# anchor is a single-row broadcast scalar (allowed by
# BROADCAST_POLICY); both windows come from ONE conditional aggregate
# over one pruned fact scan; quantities sum in exact DECIMAL.

def part_sales_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", F.to_date("l_shipdate").alias("_d"), "l_quantity"
    )
    anchor = li.agg(F.max("_d").alias("_mx"))
    age = F.datediff(F.col("_mx"), F.col("_d"))
    base = (
        li.crossJoin(F.broadcast(anchor))  # single-row scalar
        .where(age < 56)
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.when(age < 28, F.col("l_quantity").cast("decimal(18,2)"))
            ).alias("_recent"),
            F.sum(
                F.when(age >= 28, F.col("l_quantity").cast("decimal(18,2)"))
            ).alias("_prior"),
        )
    )
    return (
        base.where(F.col("_recent").isNotNull() & F.col("_prior").isNotNull())
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("_recent").cast("double").alias("qty_recent"),
            F.col("_prior").cast("double").alias("qty_prior"),
            (
                F.floor(
                    F.col("_recent").cast("double")
                    / F.col("_prior").cast("double")
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("momentum"),
        )
        .orderBy("partkey")
    )


PART_SALES_MOMENTUM_SQL = """
WITH anchored AS (
  SELECT l_partkey,
         datediff('day', CAST(l_shipdate AS DATE),
                  (SELECT MAX(CAST(l_shipdate AS DATE)) FROM lineitem)) AS age,
         l_quantity
  FROM lineitem
),
base AS (
  SELECT l_partkey,
         SUM(CASE WHEN age < 28
                  THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS recent,
         SUM(CASE WHEN age >= 28
                  THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS prior
  FROM anchored WHERE age < 56 GROUP BY 1
)
SELECT l_partkey AS partkey,
       CAST(recent AS DOUBLE) AS qty_recent,
       CAST(prior AS DOUBLE) AS qty_prior,
       floor(CAST(recent AS DOUBLE) / CAST(prior AS DOUBLE) * 1e6 + 0.5) / 1e6
         AS momentum
FROM base
WHERE recent IS NOT NULL AND prior IS NOT NULL
ORDER BY partkey
"""


# ---------------------------------------------------------------------------
# #184 cross-supplier price spread: per part, the min/max average unit
# price across its suppliers and the spread ratio — the arbitrage /
# mispricing screen. Two part-keyed aggregates; unit price is
# SUM(price)/SUM(qty) per (part, supplier) with both sums in exact
# DECIMAL (a double Σ is partition-order-dependent), one IEEE division
# per pair, spread quantized@6.

def part_price_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    per_supp = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("_p"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_q"),
        )
        .select(
            "l_partkey",
            (F.col("_p").cast("double") / F.col("_q").cast("double")).alias(
                "_unit"
            ),
        )
    )
    return (
        per_supp.groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.min("_unit").alias("_lo"),
            F.max("_unit").alias("_hi"),
        )
        .where(F.col("n_suppliers") >= 2)
        .select(
            "partkey",
            "n_suppliers",
            (F.floor(F.col("_lo") * 1e2 + F.lit(0.5)) / 1e2).alias("min_unit"),
            (F.floor(F.col("_hi") * 1e2 + F.lit(0.5)) / 1e2).alias("max_unit"),
            (
                F.floor(F.col("_hi") / F.col("_lo") * 1e6 + F.lit(0.5)) / 1e6
            ).alias("spread_ratio"),
        )
        .orderBy("partkey")
    )


PART_PRICE_SPREAD_SQL = """
WITH per_supp AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS unit
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT l_partkey AS partkey,
       COUNT(*) AS n_suppliers,
       floor(MIN(unit) * 1e2 + 0.5) / 1e2 AS min_unit,
       floor(MAX(unit) * 1e2 + 0.5) / 1e2 AS max_unit,
       floor(MAX(unit) / MIN(unit) * 1e6 + 0.5) / 1e6 AS spread_ratio
FROM per_supp
GROUP BY 1
HAVING COUNT(*) >= 2
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# #185 Theil index decomposition: customer-revenue inequality split
# into within-nation and between-nation components — the decomposable
# inequality measure Gini (#137) can't give (Theil 1967; T = within +
# between exactly). Per-customer terms are x·ln(x·n_g/S_g) with the
# ln round@6 → DECIMAL so the big sums are term-order-independent and
# their unscaled values stay below 2⁵³; group scalars ride a bounded
# (≤25-nation) broadcast tier; the customer-revenue frame
# materializes ONCE (localCheckpoint) and feeds both the tier and the
# term pass.

def theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        orders.groupBy("o_custkey")
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
            ).alias("_x")
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "_x")
        .localCheckpoint(eager=True)
    )
    tier = rev.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_customers"), F.sum("_x").alias("_sg")
    )
    tot = tier.agg(
        F.sum("n_customers").alias("_n"), F.sum("_sg").alias("_s")
    )
    within = (
        rev.join(F.broadcast(tier), "n_name")  # bounded tier
        .select(
            "n_name",
            (
                F.col("_x").cast("decimal(18,0)")
                * F.round(
                    F.log(
                        (F.col("_x") * F.col("n_customers")).cast("double")
                        / F.col("_sg").cast("double")
                    ),
                    6,
                ).cast("decimal(18,6)")
            ).alias("_t"),
        )
        .groupBy("n_name")
        .agg(F.sum("_t").alias("_tw"))
    )
    return (
        tier.join(within, "n_name")
        .crossJoin(F.broadcast(tot))  # single-row scalars
        .select(
            "n_name",
            "n_customers",
            (
                F.floor(
                    F.col("_sg").cast("double") / F.col("_s") * 1e6 + F.lit(0.5)
                )
                / 1e6
            ).alias("revenue_share"),
            (
                F.floor(
                    F.col("_tw").cast("double") / F.col("_sg") * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("theil_within"),
            (
                F.floor(
                    F.col("_sg").cast("double")
                    / F.col("_s")
                    * F.round(
                        F.log(
                            (F.col("_sg") * F.col("_n")).cast("double")
                            / (F.col("_s") * F.col("n_customers")).cast("double")
                        ),
                        6,
                    )
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("theil_between_term"),
        )
        .orderBy("n_name")
    )


THEIL_INDEX_SQL = """
WITH rev AS (
  SELECT n_name,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS x
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name, o_custkey
),
tier AS (
  SELECT n_name, COUNT(*) AS n_customers, CAST(SUM(x) AS BIGINT) AS sg
  FROM rev GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n_customers) AS BIGINT) AS n, CAST(SUM(sg) AS BIGINT) AS s
  FROM tier
),
within AS (
  SELECT rev.n_name,
         SUM(CAST(x AS DECIMAL(18,0))
             * CAST(round(ln(CAST(x * n_customers AS DOUBLE)
                            / CAST(sg AS DOUBLE)), 6)
                    AS DECIMAL(18,6))) AS tw
  FROM rev JOIN tier ON rev.n_name = tier.n_name
  GROUP BY 1
)
SELECT tier.n_name, n_customers,
       floor(CAST(sg AS DOUBLE) / s * 1e6 + 0.5) / 1e6 AS revenue_share,
       floor(CAST(tw AS DOUBLE) / sg * 1e6 + 0.5) / 1e6 AS theil_within,
       floor(CAST(sg AS DOUBLE) / s
             * round(ln(CAST(sg * n AS DOUBLE)
                        / CAST(s * n_customers AS DOUBLE)), 6)
             * 1e6 + 0.5) / 1e6 AS theil_between_term
FROM tier JOIN within ON tier.n_name = within.n_name, tot
ORDER BY tier.n_name
"""


# ---------------------------------------------------------------------------
# #187 repeat-revenue share by month: of each month's revenue, the
# share from customers past their first order date — the
# acquisition-vs-retention revenue mix (the money twin of
# new-vs-returning #174). One first-date aggregate + one
# customer-keyed join + one calendar aggregate; integer cents; ties on
# the first DATE count as new (all first-day orders are acquisition).

def repeat_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.to_date("o_orderdate").alias("_d"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("_cents"),
    )
    first = o.groupBy("o_custkey").agg(F.min("_d").alias("_fd"))
    return (
        o.join(first, "o_custkey")
        .groupBy(F.year("_d").alias("year"), F.month("_d").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("_cents").alias("_tot"),
            F.sum(
                F.when(F.col("_d") > F.col("_fd"), F.col("_cents")).otherwise(0)
            ).alias("_rep"),
        )
        .select(
            "year",
            "month",
            "n_orders",
            (
                F.floor(
                    F.col("_rep").cast("double") / F.col("_tot") * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("repeat_share"),
        )
        .orderBy("year", "month")
    )


REPEAT_REVENUE_SHARE_SQL = """
WITH o AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
fd AS (SELECT o_custkey, MIN(d) AS first_d FROM o GROUP BY 1)
SELECT CAST(year(d) AS INTEGER) AS year,
       CAST(month(d) AS INTEGER) AS month,
       COUNT(*) AS n_orders,
       floor(CAST(SUM(CASE WHEN d > first_d THEN cents ELSE 0 END) AS DOUBLE)
             / CAST(SUM(cents) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS repeat_share
FROM o JOIN fd USING (o_custkey)
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# #188 price-ending bias: per brand, the share of retail prices whose
# cents end in .00 or .99 — the psychological-pricing / data-entry
# screen (a synthetic or hand-keyed price book over-indexes on round
# endings; Benford #138 checks FIRST digits, this checks LAST). Pure
# map + one bounded aggregate; cents ride exact integers.

def price_ending_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    cents = (F.col("p_retailprice").cast("decimal(18,2)") * 100).cast("long")
    e = part.select("p_brand", (cents % 100).alias("_end"))
    return (
        e.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(F.when(F.col("_end") == 0, 1).otherwise(0)).alias("n_00"),
            F.sum(F.when(F.col("_end") == 99, 1).otherwise(0)).alias("n_99"),
        )
        .select(
            "p_brand",
            "n_parts",
            "n_00",
            "n_99",
            (
                F.floor(
                    (F.col("n_00") + F.col("n_99")).cast("double")
                    / F.col("n_parts")
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("round_price_share"),
        )
        .orderBy("p_brand")
    )


PRICE_ENDING_BIAS_SQL = """
WITH e AS (
  SELECT p_brand,
         CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) % 100
           AS ending
  FROM part
)
SELECT p_brand, COUNT(*) AS n_parts,
       CAST(SUM(CASE WHEN ending = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_00,
       CAST(SUM(CASE WHEN ending = 99 THEN 1 ELSE 0 END) AS BIGINT) AS n_99,
       floor(CAST(SUM(CASE WHEN ending = 0 THEN 1 ELSE 0 END)
                  + SUM(CASE WHEN ending = 99 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) * 1e6 + 0.5) / 1e6 AS round_price_share
FROM e
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# #189 fulfillment-stage snapshot: per priority class, mean days from
# order to FIRST shipment (pick latency) and from first to LAST
# shipment (ship-out span) — the Kimball accumulating-snapshot fact in
# one pass: lineitem collapses to per-order milestones (min/max ship
# date), one order-keyed join attaches the order date, one bounded
# aggregate summarizes. All-integer day math; means floor-quantized@2.

def fulfillment_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("_od"), "o_orderpriority"
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.min(F.to_date("l_shipdate")).alias("_first"),
            F.max(F.to_date("l_shipdate")).alias("_last"),
        )
    )
    j = o.join(li, o.o_orderkey == li.l_orderkey).select(
        "o_orderpriority",
        F.datediff(F.col("_first"), F.col("_od")).cast("long").alias("_lead"),
        F.datediff(F.col("_last"), F.col("_first")).cast("long").alias("_span"),
    )
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (
                F.floor(
                    F.sum("_lead").cast("double") / F.count(F.lit(1)) * 1e2
                    + F.lit(0.5)
                )
                / 1e2
            ).alias("avg_pick_days"),
            (
                F.floor(
                    F.sum("_span").cast("double") / F.count(F.lit(1)) * 1e2
                    + F.lit(0.5)
                )
                / 1e2
            ).alias("avg_span_days"),
            F.max("_span").alias("max_span_days"),
        )
        .orderBy("o_orderpriority")
    )


FULFILLMENT_STAGES_SQL = """
WITH li AS (
  SELECT l_orderkey,
         MIN(CAST(l_shipdate AS DATE)) AS first_ship,
         MAX(CAST(l_shipdate AS DATE)) AS last_ship
  FROM lineitem GROUP BY 1
),
j AS (
  SELECT o_orderpriority,
         (first_ship - CAST(o_orderdate AS DATE)) AS lead_days,
         (last_ship - first_ship) AS span_days
  FROM orders JOIN li ON o_orderkey = l_orderkey
)
SELECT o_orderpriority, COUNT(*) AS n_orders,
       floor(CAST(SUM(lead_days) AS DOUBLE) / COUNT(*) * 1e2 + 0.5) / 1e2
         AS avg_pick_days,
       floor(CAST(SUM(span_days) AS DOUBLE) / COUNT(*) * 1e2 + 0.5) / 1e2
         AS avg_span_days,
       CAST(MAX(span_days) AS BIGINT) AS max_span_days
FROM j
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# #192 forecast-baseline backtest: one-step MAE/MAPE of the two
# baselines every forecasting effort must beat — naive (yesterday) and
# seasonal-naive (same weekday last week) — on daily revenue. No
# recursion, no windows: predictions come from date-offset self-joins
# of the checkpointed calendar tier (the autocorr trick); per-day APE
# ratios quantize@9 → DECIMAL before averaging (a double Σ of ratios
# is partition-order-dependent).

FORECAST_BASELINES = ((1, "naive_1d"), (7, "seasonal_naive_7d"))


def forecast_baselines(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
            ).alias("cents")
        )
        .localCheckpoint(eager=True)
    )
    outs = []
    for lag, name in FORECAST_BASELINES:
        a = daily.select(F.col("day").alias("d"), F.col("cents").alias("y"))
        b = daily.select(
            F.date_add("day", lag).alias("d"), F.col("cents").alias("yhat")
        )
        err = F.abs(F.col("y") - F.col("yhat"))
        m = (
            a.join(b, "d")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(err).alias("_sae"),
                F.sum(
                    F.round(
                        err.cast("double") / F.col("y").cast("double"), 9
                    ).cast("decimal(18,9)")
                ).alias("_sape"),
            )
            .select(
                F.lit(name).alias("model"),
                F.col("n").alias("n_days"),
                (
                    F.floor(
                        F.col("_sae").cast("double") / F.col("n") * 1e2
                        + F.lit(0.5)
                    )
                    / 1e2
                ).alias("mae_cents"),
                (
                    F.floor(
                        F.col("_sape").cast("double") / F.col("n") * 1e6
                        + F.lit(0.5)
                    )
                    / 1e6
                ).alias("mape"),
            )
        )
        outs.append(m)
    out = outs[0]
    for m in outs[1:]:
        out = out.unionByName(m)
    return out.orderBy("model")


FORECAST_BASELINES_SQL = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
joined AS (
  SELECT l.name AS model, a.cents AS y, b.cents AS yhat
  FROM (VALUES {", ".join(f"({lag}, '{name}')" for lag, name in FORECAST_BASELINES)})
       AS l(lag, name)
  JOIN daily a ON TRUE
  JOIN daily b ON a.day = b.day + to_days(CAST(l.lag AS INTEGER))
),
m AS (
  SELECT model, COUNT(*) AS n,
         CAST(SUM(abs(y - yhat)) AS BIGINT) AS sae,
         SUM(CAST(round(CAST(abs(y - yhat) AS DOUBLE) / CAST(y AS DOUBLE), 9)
                  AS DECIMAL(18,9))) AS sape
  FROM joined GROUP BY 1
)
SELECT model, CAST(n AS BIGINT) AS n_days,
       floor(CAST(sae AS DOUBLE) / n * 1e2 + 0.5) / 1e2 AS mae_cents,
       floor(CAST(sape AS DOUBLE) / n * 1e6 + 0.5) / 1e6 AS mape
FROM m
ORDER BY model
"""


# ---------------------------------------------------------------------------
# #193 supplier scorecard: one wide pass over lineitem — revenue,
# distinct parts carried, return rate, average discount — joined to
# the supplier dimension. The "wide aggregate" shape every ops
# dashboard needs: one fact shuffle keyed on suppkey, count(DISTINCT)
# rides the same exchange, dimension attaches by key (AQE-sized).

def supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    # distinct parts in a SEPARATE two-phase aggregate, not a
    # countDistinct inside the wide agg: Spark plans the latter as an
    # Expand that doubles every fact row through the partial hash
    # (measured 1.76 s vs 0.85 s at sf0.1 for the same result). The
    # (supp, part) distinct collapses map-side, so the extra shuffle
    # moves only distinct pairs; the supplier-keyed join is tiny.
    score = li.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        dsum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
        ),
        F.sum(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).alias("_n_ret"),
        F.sum(F.col("l_discount").cast(DEC)).alias("_sd"),
    ).join(
        li.select("l_suppkey", "l_partkey")
        .distinct()
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_parts")),
        "l_suppkey",
    )
    return (
        score.join(supp, score.l_suppkey == supp.s_suppkey)
        .select(
            "s_name",
            "n_lines",
            "n_parts",
            (F.floor(F.col("revenue") * 1e2 + F.lit(0.5)) / 1e2).alias(
                "revenue"
            ),
            (
                F.floor(
                    F.col("_n_ret").cast("double") / F.col("n_lines") * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("return_rate"),
            (
                F.floor(
                    F.col("_sd").cast("double") / F.col("n_lines") * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("avg_discount"),
        )
        .orderBy("s_name")
    )


SUPPLIER_SCORECARD_SQL = """
WITH score AS (
  SELECT l_suppkey,
         COUNT(*) AS n_lines,
         COUNT(DISTINCT l_partkey) AS n_parts,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_ret,
         CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS sd
  FROM lineitem GROUP BY 1
)
SELECT s_name, n_lines, n_parts,
       floor(revenue * 1e2 + 0.5) / 1e2 AS revenue,
       floor(CAST(n_ret AS DOUBLE) / n_lines * 1e6 + 0.5) / 1e6
         AS return_rate,
       floor(sd / n_lines * 1e6 + 0.5) / 1e6 AS avg_discount
FROM score JOIN supplier ON l_suppkey = s_suppkey
ORDER BY s_name
"""


# ---------------------------------------------------------------------------
# #195 part-name token revenue: top-20 part-name tokens by attached
# net revenue — "which product words sell" (the dimension-text explode
# × fact join that category mining runs when there's no category
# column). The fact collapses to per-part revenue FIRST (part
# cardinality, not lineitem), the name tokens explode on the DIMENSION
# only, and the token rollup is vocabulary-bounded; TakeOrdered top-K.

PART_TOKEN_TOP_K = 20


def part_name_revenue_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").select(
        "p_partkey", F.split("p_name", " ").alias("_toks")
    )
    rev = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
                    "long"
                )
            ).alias("_cents")
        )
    )
    j = part.join(rev, part.p_partkey == rev.l_partkey).select(
        F.explode("_toks").alias("token"), "_cents"
    )
    return (
        j.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("_cents").alias("revenue_cents"),
        )
        .orderBy(F.desc("revenue_cents"), "token")
        .limit(PART_TOKEN_TOP_K)
    )


PART_NAME_REVENUE_TOKENS_SQL = f"""
WITH rev AS (
  SELECT l_partkey,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem GROUP BY 1
),
toks AS (
  SELECT unnest(string_split(p_name, ' ')) AS token, cents
  FROM part JOIN rev ON p_partkey = l_partkey
)
SELECT token, COUNT(*) AS n_parts,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents
FROM toks
GROUP BY 1
ORDER BY revenue_cents DESC, token
LIMIT {PART_TOKEN_TOP_K}
"""


# ---------------------------------------------------------------------------
# #197 purchase-regularity census: classify repeat customers by the
# coefficient of variation of their inter-order gaps — regular
# replenishers (CV < 0.5), moderate (< 1), bursty (≥ 1); the
# cadence-stability lens the raw interval histogram (#175) aggregates
# away. Per-customer lag window (small keys), all moments in exact
# integers/decimals, ONE IEEE op order for the CV so banding can't
# straddle engines; per-customer CVs quantize@9 before the band
# average.

def purchase_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("_d"), "o_orderkey"
    )
    w = Window.partitionBy("o_custkey").orderBy("_d", "o_orderkey")
    gaps = (
        o.withColumn("_prev", F.lag("_d").over(w))
        .where(F.col("_prev").isNotNull())
        .select(
            "o_custkey",
            F.datediff(F.col("_d"), F.col("_prev")).cast("long").alias("_g"),
        )
    )
    per_cust = gaps.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_g").alias("_sg"),
        F.sum(F.col("_g") * F.col("_g")).alias("_sgg"),
    )
    mu = F.col("_sg").cast("double") / F.col("_n")
    var = F.col("_sgg").cast("double") / F.col("_n") - mu * mu
    cv = F.sqrt(F.greatest(var, F.lit(0.0))) / mu
    scored = per_cust.where(
        (F.col("_n") >= 2) & (F.col("_sg") > 0)
    ).select(
        F.round(cv, 9).alias("_cv"),
    )
    band = (
        F.when(F.col("_cv") < 0.5, F.lit("regular"))
        .when(F.col("_cv") < 1.0, F.lit("moderate"))
        .otherwise(F.lit("bursty"))
    )
    return (
        scored.groupBy(band.alias("cadence"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (
                F.floor(
                    F.sum(F.col("_cv").cast("decimal(18,9)")).cast("double")
                    / F.count(F.lit(1))
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("avg_cv"),
        )
        .orderBy("cadence")
    )


PURCHASE_REGULARITY_SQL = """
WITH gaps AS (
  SELECT o_custkey, (d - prev) AS g FROM (
    SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
           lag(CAST(o_orderdate AS DATE)) OVER (
             PARTITION BY o_custkey
             ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS prev
    FROM orders)
  WHERE prev IS NOT NULL
),
per_cust AS (
  SELECT o_custkey, COUNT(*) AS n,
         CAST(SUM(g) AS BIGINT) AS sg,
         CAST(SUM(g * g) AS BIGINT) AS sgg
  FROM gaps GROUP BY 1
),
scored AS (
  SELECT round(
           sqrt(greatest(
             CAST(sgg AS DOUBLE) / n
             - (CAST(sg AS DOUBLE) / n) * (CAST(sg AS DOUBLE) / n), 0.0))
           / (CAST(sg AS DOUBLE) / n), 9) AS cv
  FROM per_cust WHERE n >= 2 AND sg > 0
)
SELECT CASE WHEN cv < 0.5 THEN 'regular'
            WHEN cv < 1.0 THEN 'moderate'
            ELSE 'bursty' END AS cadence,
       COUNT(*) AS n_customers,
       floor(CAST(SUM(CAST(cv AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) * 1e6
             + 0.5) / 1e6 AS avg_cv
FROM scored
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# #202 Hill tail-index on order values: α̂ = k / Σ ln(x_(i)/x_(k+1))
# over the top-k order statistics — "how heavy is the spend tail"
# (α ≤ 2 means variance-free whales dominate; the money twin of the
# dup-graph degree Hill diagnostic #141). Top-(k+1) via a TakeOrdered
# heap (never a global sort); the k-row tail aggregates with ln@9 →
# DECIMAL sums; threshold x_(k+1) attaches as a single-row broadcast
# scalar.

HILL_TAIL_K = 200


def revenue_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("_cents"),
        "o_orderkey",
    )
    top = o.orderBy(F.desc("_cents"), "o_orderkey").limit(HILL_TAIL_K + 1)
    thresh = top.agg(F.min("_cents").alias("_xk"))
    tail = top.crossJoin(F.broadcast(thresh)).where(
        F.col("_cents") > F.col("_xk")
    )
    return (
        tail.agg(
            F.count(F.lit(1)).alias("k"),
            F.first("_xk").alias("_x"),
            F.sum(
                F.round(
                    F.log(
                        F.col("_cents").cast("double")
                        / F.col("_xk").cast("double")
                    ),
                    9,
                ).cast("decimal(18,9)")
            ).alias("_s"),
        )
        .select(
            "k",
            F.col("_x").alias("threshold_cents"),
            (
                F.floor(
                    F.col("k") / F.col("_s").cast("double") * 1e6 + F.lit(0.5)
                )
                / 1e6
            ).alias("hill_alpha"),
        )
    )


REVENUE_TAIL_INDEX_SQL = f"""
WITH top AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         o_orderkey
  FROM orders
  ORDER BY cents DESC, o_orderkey
  LIMIT {HILL_TAIL_K + 1}
),
thresh AS (SELECT CAST(MIN(cents) AS BIGINT) AS xk FROM top),
tail AS (
  SELECT cents, xk FROM top, thresh WHERE cents > xk
)
SELECT COUNT(*) AS k,
       CAST(MIN(xk) AS BIGINT) AS threshold_cents,
       floor(COUNT(*)
             / CAST(SUM(CAST(round(ln(CAST(cents AS DOUBLE)
                                      / CAST(xk AS DOUBLE)), 9)
                             AS DECIMAL(18,9))) AS DOUBLE)
             * 1e6 + 0.5) / 1e6 AS hill_alpha
FROM tail
"""


# ---------------------------------------------------------------------------
# #204 priority mix shift: monthly order-priority shares and each
# priority's largest month-over-month swing — the composition-drift
# report (a mix shift flags upstream process changes even when totals
# look flat). Calendar-bounded tier (months × 5 priorities); shares
# quantize@6 BEFORE the MoM self-join so the swing is a difference of
# engine-identical quantized doubles; month arithmetic all-integer
# (y·12+m — months_between() is fractional).

def priority_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias("_m"),
        "o_orderpriority",
    )
    cells = o.groupBy("_m", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("_n")
    )
    tot = cells.groupBy("_m").agg(F.sum("_n").alias("_t"))
    shares = cells.join(F.broadcast(tot), "_m").select(
        "_m",
        "o_orderpriority",
        (
            F.floor(
                F.col("_n").cast("double") / F.col("_t") * 1e6 + F.lit(0.5)
            )
            / 1e6
        ).alias("_share"),
    )
    nxt = shares.select(
        (F.col("_m") - 1).alias("_m"),
        F.col("o_orderpriority"),
        F.col("_share").alias("_next"),
    )
    return (
        shares.join(nxt, ["_m", "o_orderpriority"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            (
                F.floor(
                    F.sum(F.col("_share").cast("decimal(18,6)")).cast("double")
                    / F.count(F.lit(1))
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("avg_share"),
            F.max(F.abs(F.col("_next") - F.col("_share"))).alias(
                "max_mom_swing"
            ),
        )
        .orderBy("o_orderpriority")
    )


PRIORITY_MIX_SHIFT_SQL = """
WITH cells AS (
  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
           AS m,
         o_orderpriority, COUNT(*) AS n
  FROM orders GROUP BY 1, 2
),
tot AS (SELECT m, CAST(SUM(n) AS BIGINT) AS t FROM cells GROUP BY 1),
shares AS (
  SELECT cells.m, o_orderpriority,
         floor(CAST(n AS DOUBLE) / t * 1e6 + 0.5) / 1e6 AS share
  FROM cells JOIN tot ON cells.m = tot.m
)
SELECT a.o_orderpriority,
       COUNT(*) AS n_transitions,
       floor(CAST(SUM(CAST(a.share AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
             * 1e6 + 0.5) / 1e6 AS avg_share,
       MAX(abs(b.share - a.share)) AS max_mom_swing
FROM shares a
JOIN shares b ON b.m = a.m + 1 AND b.o_orderpriority = a.o_orderpriority
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# #208 top-3 customer concentration per nation: what share of each
# nation's revenue its three largest customers hold — key-account
# risk. The SCALE PATTERN is the point: per-key top-k WITHOUT a
# per-nation rank window (nations are few-huge keys — the funnel
# anti-pattern) and WITHOUT a full per-key collect_list (unbounded):
# phase 1 takes each PARTITION's local top-3 per nation (state ≤ 3 per
# (partition, key) — partition size bounds the collect), phase 2
# merges ≤ 3·P candidates per nation. Exact integer cents throughout.

TOP_CONCENTRATION_K = 3


def top_customer_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
            ).alias("_x")
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "_x")
    )
    k = TOP_CONCENTRATION_K
    local = rev.groupBy(
        F.spark_partition_id().alias("_p"), "n_name"
    ).agg(
        F.slice(F.sort_array(F.collect_list("_x"), asc=False), 1, k).alias(
            "_top"
        ),
        F.sum("_x").alias("_s"),
        F.count(F.lit(1)).alias("_n"),
    )
    merged = (
        local.select("n_name", F.explode("_top").alias("_x"))
        .groupBy("n_name")
        .agg(
            F.slice(F.sort_array(F.collect_list("_x"), asc=False), 1, k).alias(
                "_top"
            )
        )
    )
    totals = local.groupBy("n_name").agg(
        F.sum("_s").alias("_sg"), F.sum("_n").alias("n_customers")
    )
    return (
        merged.join(totals, "n_name")
        .select(
            "n_name",
            "n_customers",
            (
                F.floor(
                    F.aggregate(
                        "_top", F.lit(0).cast("long"), lambda a, x: a + x
                    ).cast("double")
                    / F.col("_sg")
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("top3_share"),
        )
        .orderBy("n_name")
    )


TOP_CUSTOMER_CONCENTRATION_SQL = f"""
WITH rev AS (
  SELECT n_name,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS x
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name, o_custkey
),
ranked AS (
  SELECT n_name, x,
         row_number() OVER (PARTITION BY n_name ORDER BY x DESC) AS r
  FROM rev
)
SELECT n_name,
       COUNT(*) AS n_customers,
       floor(CAST(SUM(CASE WHEN r <= {TOP_CONCENTRATION_K} THEN x ELSE 0 END)
                  AS DOUBLE)
             / CAST(SUM(x) AS BIGINT) * 1e6 + 0.5) / 1e6 AS top3_share
FROM ranked
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# #216 order fill-rate SLA: per order month, the share of orders whose
# LAST lineitem shipped within 30/60/90 days of the order date — the
# fulfillment-SLA scorecard behind the reference's order-lifecycle
# stats (stage2 tracks per-status latency; this is the customer-facing
# cut). One orderkey-grain max over lineitem, one orderkey join, one
# calendar-bounded monthly rollup — the join shuffles on the natural
# key both sides already carry, and the monthly tier is ≤ years×12
# rows at any scale.

FILL_SLAS = (30, 60, 90)


def order_fill_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    last = li.groupBy("l_orderkey").agg(
        F.max(F.to_date("l_shipdate")).alias("_last")
    )
    days = F.datediff(F.col("_last"), F.to_date("o_orderdate"))
    monthly = (
        orders.join(last, orders["o_orderkey"] == last["l_orderkey"])
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            *[
                F.sum(F.when(days <= sla, 1).otherwise(0))
                .cast("long")
                .alias(f"n_within_{sla}d")
                for sla in FILL_SLAS
            ],
        )
    )
    return monthly.select(
        "month",
        "n_orders",
        *[f"n_within_{sla}d" for sla in FILL_SLAS],
        *[
            (
                F.floor(
                    F.col(f"n_within_{sla}d").cast("double")
                    / F.col("n_orders")
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias(f"fill_rate_{sla}d")
            for sla in FILL_SLAS
        ],
    ).orderBy("month")


ORDER_FILL_RATE_SQL = f"""
WITH last AS (
  SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS last_ship
  FROM lineitem GROUP BY 1
),
perorder AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
         date_diff('day', CAST(o_orderdate AS DATE), last_ship) AS days
  FROM orders JOIN last ON o_orderkey = l_orderkey
),
m AS (
  SELECT month, COUNT(*) AS n_orders,
         {", ".join(f"CAST(SUM(CASE WHEN days <= {sla} THEN 1 ELSE 0 END) AS BIGINT) AS n_within_{sla}d" for sla in FILL_SLAS)}
  FROM perorder GROUP BY 1
)
SELECT month, n_orders, {", ".join(f"n_within_{sla}d" for sla in FILL_SLAS)},
       {", ".join(f"floor(CAST(n_within_{sla}d AS DOUBLE) / n_orders * 1e6 + 0.5) / 1e6 AS fill_rate_{sla}d" for sla in FILL_SLAS)}
FROM m
ORDER BY month
"""


# ---------------------------------------------------------------------------
# #217 Spearman rank correlation between daily revenue and daily order
# count — the distribution-free complement to #176's Pearson
# cross-correlation (monotone association robust to the heavy order-
# value tail; #202 shows the tail index). Proper tied-rank treatment:
# average ranks, carried as the INTEGER 2·rank (= 2·rank_min + tie_n −
# 1) so every Pearson moment over the ranks is an exact integer — the
# engine-proof all-integer-moments pattern. The daily tier is
# calendar-bounded (≤ years×365 rows at ANY corpus scale), so its
# unpartitioned rank windows and the final single-row reduction are
# bounded-frame by construction, not by data volume.


def spearman_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                "decimal(38,0)"
            )
        )
        .cast("long")
        .alias("rev_cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    two_r = {}
    ranked = daily
    for col in ("rev_cents", "n_orders"):
        # 2·avg_rank = 2·rank_min + ties − 1, all integers (bounded
        # frame: the windows span the ≤ years×365-row daily tier)
        ranked = ranked.withColumn(
            f"_2r_{col}",
            (
                2 * F.rank().over(Window.orderBy(col))
                + F.count(F.lit(1)).over(Window.partitionBy(col))
                - 1
            ).cast("long"),
        )
        two_r[col] = F.col(f"_2r_{col}")
    x, y = two_r["rev_cents"], two_r["n_orders"]
    moments = ranked.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(x).cast("long").alias("_sx"),
        F.sum(y).cast("long").alias("_sy"),
        F.sum(x * x).cast("long").alias("_sxx"),
        F.sum(y * y).cast("long").alias("_syy"),
        F.sum(x * y).cast("long").alias("_sxy"),
    )
    n = F.col("n_days").cast("double")
    cov = n * F.col("_sxy") - F.col("_sx").cast("double") * F.col("_sy")
    vx = n * F.col("_sxx") - F.col("_sx").cast("double") * F.col("_sx")
    vy = n * F.col("_syy") - F.col("_sy").cast("double") * F.col("_sy")
    return moments.select(
        "n_days",
        (
            F.floor(cov / (F.sqrt(vx) * F.sqrt(vy)) * 1e6 + F.lit(0.5)) / 1e6
        ).alias("spearman_rho"),
    )


SPEARMAN_DAILY_SQL = """
WITH daily AS MATERIALIZED (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS rev_cents,
         COUNT(*) AS n_orders
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT CAST(2 * rank() OVER (ORDER BY rev_cents)
              + COUNT(*) OVER (PARTITION BY rev_cents) - 1 AS BIGINT) AS x,
         CAST(2 * rank() OVER (ORDER BY n_orders)
              + COUNT(*) OVER (PARTITION BY n_orders) - 1 AS BIGINT) AS y
  FROM daily
),
m AS (
  SELECT COUNT(*) AS n_days,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM ranked
)
SELECT n_days,
       floor(
         (CAST(n_days AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         / (sqrt(CAST(n_days AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
            * sqrt(CAST(n_days AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
         * 1e6 + 0.5) / 1e6 AS spearman_rho
FROM m
"""


# ---------------------------------------------------------------------------
# #230 repeat-purchase rate by brand: of the distinct (customer, part)
# relationships a brand has, what share ordered that part in MORE than
# one distinct order — the retention-at-SKU-granularity KPI behind
# "which brands get re-bought vs bought once". Shuffles: one keyed
# join orders⋈lineitem (AQE broadcasts the dim-side part join), one
# (part, cust) distinct-order aggregate, one |brands|-group rollup —
# all keys high-cardinality, no funnel.


def reorder_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cp = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_partkey", "o_custkey")
        .agg(F.count_distinct("l_orderkey").alias("n_ord"))
    )
    return (
        cp.join(part, cp["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.when(F.col("n_ord") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_repeat"),
        )
        .select(
            "p_brand",
            "n_pairs",
            "n_repeat",
            (
                F.floor(
                    F.col("n_repeat").cast("double") / F.col("n_pairs") * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("reorder_rate"),
        )
        .orderBy("p_brand")
    )


REORDER_RATE_SQL = """
WITH cp AS MATERIALIZED (
  SELECT l.l_partkey, o.o_custkey, COUNT(DISTINCT l.l_orderkey) AS n_ord
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
)
SELECT p.p_brand, COUNT(*) AS n_pairs,
       CAST(SUM(CASE WHEN cp.n_ord >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repeat,
       floor(CAST(SUM(CASE WHEN cp.n_ord >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) * 1e6 + 0.5) / 1e6 AS reorder_rate
FROM cp JOIN part p ON cp.l_partkey = p.p_partkey
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# #231 open-order backlog by month: how many orders were placed but not
# yet fully shipped at any point — the WIP metric behind fulfillment
# capacity planning. Sweep-line over order-level [orderdate,
# last_shipdate] intervals: +1/−1 deltas per date, one cumulative sum
# over the CALENDAR-BOUNDED distinct-date tier (≤ years×365 rows at
# any corpus scale — the same bounded-frame proof as
# q_weekly_decomposition/q_spearman_daily), then a per-month rollup of
# the step function. The end-of-month level lands on the month's last
# delta date; the peak must ALSO consider the carry-in level held from
# month start until the first delta (a month whose first delta is
# negative peaks at the carried level, not at any in-month row).


def order_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    spans = (
        li.groupBy("l_orderkey")
        .agg(F.max(F.to_date("l_shipdate")).alias("end_d"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.to_date("o_orderdate").alias("start_d"), "end_d")
    )
    deltas = (
        spans.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("start_d").alias("d"), F.lit(1).alias("delta")
                    ),
                    F.struct(
                        F.date_add(F.col("end_d"), 1).alias("d"),
                        F.lit(-1).alias("delta"),
                    ),
                )
            ).alias("e")
        )
        .select("e.d", "e.delta")
        .groupBy("d")
        .agg(F.sum("delta").cast("long").alias("net"))
    )
    cw = Window.orderBy("d")  # calendar-bounded distinct-date tier
    # carry_in = the level held during [month-start, first delta): the
    # step value BEFORE this date's delta (lag over the same bounded
    # tier). Without it, a month whose first delta is negative
    # under-reports its true peak (advice r9, medium).
    stepped = (
        deltas.select("d", F.sum("net").over(cw).alias("backlog"))
        .select(
            F.trunc("d", "month").alias("month"),
            "d",
            "backlog",
            F.lag("backlog", 1, 0).over(cw).alias("carry_in"),
        )
    )
    monthly = stepped.groupBy("month").agg(
        F.greatest(
            F.max("backlog"), F.min_by("carry_in", "d")
        ).alias("peak_backlog"),
        F.max_by("backlog", "d").alias("eom_backlog"),
    )
    # Month densification (advice r10 — the carry-in fix one level up):
    # a month with a carried backlog but NO delta dates at all (no
    # order placed or finally shipped) was absent from the output even
    # though its level is non-zero the whole month — emit it with
    # peak = eom = the carried level. The month dimension is calendar-
    # bounded (one row per month of the dataset span), so the sequence
    # + unpartitioned carry-forward window stay in the bounded-tier
    # class the date windows above already occupy.
    bounds = deltas.agg(
        F.trunc(F.min("d"), "month").alias("mn"),
        F.trunc(F.max("d"), "month").alias("mx"),
    )
    months = bounds.select(
        F.explode(
            F.sequence("mn", "mx", F.expr("interval 1 month"))
        ).alias("month")
    )
    mw = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    filled = months.join(monthly, "month", "left").select(
        "month",
        "peak_backlog",
        "eom_backlog",
        F.last("eom_backlog", ignorenulls=True).over(mw).alias("carry"),
    )
    return (
        filled.select(
            "month",
            F.coalesce("peak_backlog", "carry")
            .cast("long")
            .alias("peak_backlog"),
            F.coalesce("eom_backlog", "carry")
            .cast("long")
            .alias("eom_backlog"),
        )
        .orderBy("month")
    )


ORDER_BACKLOG_SQL = """
WITH spans AS MATERIALIZED (
  SELECT CAST(o.o_orderdate AS DATE) AS start_d, e.end_d
  FROM (SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS end_d
        FROM lineitem GROUP BY 1) e
  JOIN orders o ON e.l_orderkey = o.o_orderkey
),
deltas AS (
  SELECT d, CAST(SUM(delta) AS BIGINT) AS net FROM (
    SELECT start_d AS d, 1 AS delta FROM spans
    UNION ALL
    SELECT end_d + 1, -1 FROM spans
  ) GROUP BY 1
),
cum AS (
  SELECT d, SUM(net) OVER (ORDER BY d) AS backlog FROM deltas
),
stepped AS (
  SELECT CAST(date_trunc('month', d) AS DATE) AS month, d, backlog,
         COALESCE(LAG(backlog) OVER (ORDER BY d), 0) AS carry_in
  FROM cum
),
monthly AS (
  SELECT month,
         CAST(GREATEST(MAX(backlog), MIN_BY(carry_in, d)) AS BIGINT)
           AS peak_backlog,
         CAST(max_by(backlog, d) AS BIGINT) AS eom_backlog
  FROM stepped
  GROUP BY 1
),
months AS (
  SELECT CAST(unnest(generate_series(
           (SELECT MIN(month) FROM monthly),
           (SELECT MAX(month) FROM monthly),
           INTERVAL 1 MONTH)) AS DATE) AS month
),
filled AS (
  SELECT m.month, mo.peak_backlog, mo.eom_backlog,
         LAST_VALUE(mo.eom_backlog IGNORE NULLS) OVER (
           ORDER BY m.month
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carry
  FROM months m LEFT JOIN monthly mo USING (month)
)
SELECT month,
       CAST(COALESCE(peak_backlog, carry) AS BIGINT) AS peak_backlog,
       CAST(COALESCE(eom_backlog, carry) AS BIGINT) AS eom_backlog
FROM filled
ORDER BY 1
"""
