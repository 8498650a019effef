"""Multi-stream composition plans — union/connect, CoGroup, and keyed
running reduce (reference: flink_typora.md:614 `join`/`connect`/`reduce`
operator rows, :865 DataSet Join/CoGroup/Union) — over the ``events``
stream table and the ``orders`` table, each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datasets import load
from ..num import DEC, dsum, sql_dsum
from ..operators import composition

# ---------------------------------------------------------------------------
# union/connect: unified activity feed over two differently-shaped tables


def union_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize events and orders into one tagged activity feed
    (connect+CoMap), then aggregate per (source, kind). The events side
    carries ``user_id``, which the orders projection deliberately lacks —
    exercising the null-fill of heterogeneous connect."""
    ev = load(spark, sf_dir, "events").select(
        F.concat(F.lit("event:"), F.col("event_type")).alias("kind"),
        F.col("value").alias("amount"),
        F.col("user_id"),
    )
    orders = load(spark, sf_dir, "orders").select(
        F.concat(F.lit("order:"), F.col("o_orderstatus")).alias("kind"),
        F.col("o_totalprice").alias("amount"),
    )
    feed = composition.connect_tagged(
        ev, orders, tag_col="source", left_tag="events", right_tag="orders"
    )
    return feed.groupBy("source", "kind").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("amount", "sum_amount"),
        # user_id is NULL on the orders side → distinct-count 0 there
        F.countDistinct("user_id").alias("n_users"),
    )


UNION_ACTIVITY_SQL = f"""
WITH feed AS (
  SELECT 'events' AS source, 'event:' || event_type AS kind,
         value AS amount, user_id
  FROM events
  UNION ALL
  SELECT 'orders', 'order:' || o_orderstatus, o_totalprice, NULL
  FROM orders
)
SELECT source, kind, COUNT(*) AS n_rows,
       {sql_dsum("amount", "sum_amount")},
       COUNT(DISTINCT user_id) AS n_users
FROM feed
GROUP BY source, kind
"""

# ---------------------------------------------------------------------------
# CoGroup: per-user merge of event activity and order history


def cogroup_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user CoGroup of two keyed inputs: events aggregate on one
    side, orders aggregate on the other, full-outer aligned so users
    active on only one side survive with nulls on the other."""
    ev = load(spark, sf_dir, "events")
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_totalprice"
    )
    return composition.cogroup_agg(
        ev,
        orders,
        keys=["user_id"],
        left_aggs=[
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "sum_value"),
        ],
        right_aggs=[
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "sum_spend"),
        ],
    )


COGROUP_USER_ACTIVITY_SQL = f"""
SELECT COALESCE(e.user_id, o.user_id) AS user_id,
       e.n_events, e.sum_value, o.n_orders, o.sum_spend
FROM (
  SELECT user_id, COUNT(*) AS n_events, {sql_dsum("value", "sum_value")}
  FROM events GROUP BY user_id
) e
FULL OUTER JOIN (
  SELECT o_custkey AS user_id, COUNT(*) AS n_orders,
         {sql_dsum("o_totalprice", "sum_spend")}
  FROM orders GROUP BY o_custkey
) o ON e.user_id = o.user_id
"""

# ---------------------------------------------------------------------------
# keyed running reduce: per-user cumulative aggregate emitted per event


def running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink ``keyBy().reduce`` semantics: every event row carries the
    user's running count and running (decimal-exact) value sum up to and
    including itself, in (ts, event_id) order."""
    ev = load(spark, sf_dir, "events")
    out = composition.running_reduce(
        ev,
        keys=["user_id"],
        order=["ts", "event_id"],
        exprs={
            "running_n": F.count(F.lit(1)),
            # cast AFTER the frame evaluates: wrapping the aggregate in
            # cast() before .over() would detach the window spec
            "_running_sum_dec": F.sum(F.col("value").cast(DEC)),
        },
    )
    return out.select(
        "user_id",
        "event_id",
        "running_n",
        F.col("_running_sum_dec").cast("double").alias("running_sum"),
    )


RUNNING_TOTAL_SQL = """
SELECT user_id, event_id,
       COUNT(*) OVER w AS running_n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS running_sum
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# #190 engagement↔revenue correlation: Pearson r between each shared
# user's event count and order revenue — the cross-DATASET join the
# reference's connect/CoGroup exercises point at, ending in one global
# moment aggregate (autocorr's decimal(38,0) discipline). Two fact
# aggregates collapse to entity cardinality FIRST, the join runs on
# the collapsed tiers (AQE-sized), and a single row comes back.

def engagement_revenue_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("_e"))
    )
    rev = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
            ).alias("_c")
        )
    )
    j = ev.join(rev, ev.user_id == rev.o_custkey).select(
        F.col("_e").cast("decimal(38,0)").alias("x"),
        F.col("_c").cast("decimal(38,0)").alias("y"),
    )
    m = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    return m.select(
        F.col("n").alias("n_users"),
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
        ).alias("pearson_r"),
    )


ENGAGEMENT_REVENUE_CORR_SQL = """
WITH e AS (SELECT user_id, COUNT(*) AS x FROM events GROUP BY 1),
r AS (
  SELECT o_custkey,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS y
  FROM orders GROUP BY 1
),
j AS (
  SELECT CAST(x AS DECIMAL(38,0)) AS x, CAST(y AS DECIMAL(38,0)) AS y
  FROM e JOIN r ON e.user_id = r.o_custkey
),
m AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM j
)
SELECT CAST(n AS BIGINT) AS n_users,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS pearson_r
FROM m
"""
