"""Walmart-order ETL — Spark re-expression of the reference's stage1
pipeline (``flink5_parse_walmart_order.py``: parse_walmart_order:18,
parse_walmart_order_json_string:208, convert_to_row_data:384 and
``flink6_walmart_order_pipeline.py``).

The reference parses each Kafka record with per-row Python
``json.loads`` and hand-flattens header + orderLines into tuples. Here
the whole parse is declarative: a pinned nested schema + ``from_json``
+ ``inline`` on the orderLine array — all JVM-side, so the same plan
runs over a 100 TB order lake or an unbounded Kafka stream unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Pinned schema for the raw order documents (schema inference is a full
# extra data pass — never at scale). Field set mirrors the reference's
# parser output (flink5_parse_walmart_order.py:34-176).
ORDER_SCHEMA = """
    purchaseOrderId STRING,
    customerOrderId STRING,
    customerEmailId STRING,
    orderDate BIGINT,
    shippingInfo STRUCT<
        phone: STRING,
        estimatedDeliveryDate: BIGINT,
        estimatedShipDate: BIGINT,
        methodCode: STRING,
        postalAddress: STRUCT<
            name: STRING, address1: STRING, address2: STRING,
            city: STRING, state: STRING, postalCode: STRING,
            country: STRING, addressType: STRING>,
        carrierMethodName: STRING>,
    orderLines STRUCT<
        orderLine: ARRAY<STRUCT<
            lineNumber: STRING,
            item: STRUCT<productName: STRING, sku: STRING, condition: STRING>,
            charges: STRUCT<charge: ARRAY<STRUCT<
                chargeType: STRING,
                chargeName: STRING,
                chargeAmount: STRUCT<currency: STRING, amount: DOUBLE>,
                tax: STRUCT<taxName: STRING,
                            taxAmount: STRUCT<currency: STRING, amount: DOUBLE>>>>>,
            orderLineQuantity: STRUCT<unitOfMeasurement: STRING, amount: STRING>,
            statusDate: BIGINT,
            orderLineStatuses: STRUCT<orderLineStatus: ARRAY<STRUCT<
                status: STRING,
                statusQuantity: STRUCT<unitOfMeasurement: STRING, amount: STRING>,
                trackingInfo: STRUCT<shipDateTime: BIGINT,
                                     carrierName: STRUCT<carrier: STRING>,
                                     methodCode: STRING,
                                     trackingNumber: STRING>>>>,
            fulfillment: STRUCT<fulfillmentOption: STRING, shipMethod: STRING>>>>,
    shipNode STRUCT<type: STRING, name: STRING, id: STRING>,
    request_time STRING
"""


def _ms_to_ts(col: F.Column) -> F.Column:
    """Epoch-millis → timestamp (ref parse_timestamp:400 /
    orderDate_formatted:45), without losing sub-second precision."""
    return F.timestamp_millis(col)


def parse_order_strings(raw: DataFrame, json_col: str = "value") -> DataFrame:
    """Parse raw JSON order strings (one order per record — the Kafka
    shape, ref parse_walmart_order_json_string:208)."""
    return raw.select(
        F.from_json(F.col(json_col), ORDER_SCHEMA).alias("o")
    ).select("o.*")


def parse_order_strings_with_rejects(
    raw: DataFrame, json_col: str = "value"
) -> tuple[DataFrame, DataFrame]:
    """Parse with explicit malformed-record capture (ref
    flink5_parse_walmart_order.py's try/except error path, and
    flink_transform_utils.py error side-output): returns
    (parsed, rejects).

    PERMISSIVE ``from_json`` never fails a row — a syntactically-broken
    record yields an all-NULL struct, indistinguishable from a valid
    record whose fields are absent. Requesting
    ``columnNameOfCorruptRecord`` splits the two: the raw text of
    unparseable input lands in that field, so 'malformed_json'
    (unparseable — replay after fixing the producer) and 'missing_key'
    (well-formed but lacking the field downstream joins key on —
    usually a schema-drift signal) are separate reject tiers, each
    carrying the raw payload (the DLQ contract). Same single-pass
    tagged-split as the batch side-output (#6): one scan, a tag column,
    two filtered views — Catalyst pushes the complementary filters into
    both consumers.
    """
    schema_with_corrupt = ORDER_SCHEMA + ", _corrupt_record STRING"
    tagged = raw.withColumn(
        "_o",
        F.from_json(
            F.col(json_col),
            schema_with_corrupt,
            {"columnNameOfCorruptRecord": "_corrupt_record"},
        ),
    ).withColumn(
        "_reject_reason",
        F.when(
            F.col("_o").isNull() | F.col("_o._corrupt_record").isNotNull(),
            "malformed_json",
        ).when(F.col("_o.purchaseOrderId").isNull(), "missing_key"),
    )
    parsed = tagged.filter(F.col("_reject_reason").isNull()).select("_o.*").drop(
        "_corrupt_record"
    )
    rejects = tagged.filter(F.col("_reject_reason").isNotNull()).select(
        F.col(json_col).alias("raw_payload"),
        F.col("_reject_reason").alias("reject_reason"),
    )
    return parsed, rejects


def flatten_order_lines(orders: DataFrame) -> DataFrame:
    """Header + exploded order lines → one flat typed row per line
    (ref parse_walmart_order:18 / convert_to_row_data:384).

    ``inline`` explodes the struct array in one JVM operator; header
    columns are carried alongside (Catalyst prunes unused ones).
    """
    lines = orders.select(
        "purchaseOrderId",
        "customerOrderId",
        "customerEmailId",
        _ms_to_ts(F.col("orderDate")).alias("order_ts"),
        F.col("shippingInfo.phone").alias("ship_phone"),
        _ms_to_ts(F.col("shippingInfo.estimatedDeliveryDate")).alias(
            "estimated_delivery_ts"
        ),
        _ms_to_ts(F.col("shippingInfo.estimatedShipDate")).alias("estimated_ship_ts"),
        F.col("shippingInfo.methodCode").alias("ship_method_code"),
        F.col("shippingInfo.postalAddress.city").alias("ship_city"),
        F.col("shippingInfo.postalAddress.state").alias("ship_state"),
        F.col("shippingInfo.postalAddress.postalCode").alias("ship_postal_code"),
        F.col("shippingInfo.postalAddress.country").alias("ship_country"),
        F.col("shipNode.type").alias("ship_node_type"),
        F.col("shipNode.name").alias("ship_node_name"),
        F.col("shipNode.id").alias("ship_node_id"),
        F.explode(F.col("orderLines.orderLine")).alias("line"),
    )
    return lines.select(
        "purchaseOrderId",
        "customerOrderId",
        "customerEmailId",
        "order_ts",
        "ship_phone",
        "estimated_delivery_ts",
        "estimated_ship_ts",
        "ship_method_code",
        "ship_city",
        "ship_state",
        "ship_postal_code",
        "ship_country",
        "ship_node_type",
        "ship_node_name",
        "ship_node_id",
        F.col("line.lineNumber").cast("int").alias("line_number"),
        F.col("line.item.productName").alias("product_name"),
        F.col("line.item.sku").alias("sku"),
        F.col("line.orderLineQuantity.amount").cast("double").alias("quantity"),
        F.col("line.orderLineQuantity.unitOfMeasurement").alias("quantity_uom"),
        _ms_to_ts(F.col("line.statusDate")).alias("status_ts"),
        # latest line status (the reference keeps the last status entry)
        F.element_at(F.col("line.orderLineStatuses.orderLineStatus"), -1)[
            "status"
        ].alias("line_status"),
        # total charge for the line: product charges summed JVM-side
        F.aggregate(
            F.col("line.charges.charge"),
            F.lit(0.0),
            lambda acc, c: acc + F.coalesce(c["chargeAmount"]["amount"], F.lit(0.0)),
        ).alias("line_charge_amount"),
        F.aggregate(
            F.col("line.charges.charge"),
            F.lit(0.0),
            lambda acc, c: acc
            + F.coalesce(c["tax"]["taxAmount"]["amount"], F.lit(0.0)),
        ).alias("line_tax_amount"),
        F.col("line.fulfillment.shipMethod").alias("ship_method"),
    )


def order_line_stats(flat_lines: DataFrame) -> DataFrame:
    """Stage2-style rollup over the flattened lines: per ship-state
    order/line counts and charge totals (order_statistics.py analog)."""
    return flat_lines.groupBy("ship_state").agg(
        F.countDistinct("purchaseOrderId").alias("n_orders"),
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("line_charge_amount").cast("decimal(18,6)"))
        .cast("double")
        .alias("total_charges"),
        F.sum(F.col("line_tax_amount").cast("decimal(18,6)"))
        .cast("double")
        .alias("total_tax"),
    )


# ---------------------------------------------------------------------------
# Registered end-to-end nested-order ETL on the driver tables: build the
# walmart-shaped document (header + orderLine array) from orders+lineitem,
# serialize to JSON, parse it back with the pinned-schema from_json +
# explode — the reference's stage1 spine (parse_walmart_order_json_string:
# 208) exercised with an oracle that computes the same result JSON-free.

ROUNDTRIP_LINE_SCHEMA = (
    "purchaseOrderId BIGINT, customerId BIGINT, "
    "orderLines STRUCT<orderLine: ARRAY<STRUCT<"
    "lineNumber: INT, quantity: DOUBLE, price: DOUBLE>>>"
)


def order_json_roundtrip(spark, sf_dir: str) -> DataFrame:
    from ..datasets import load
    from ..num import dsum

    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    # collect_list is assembly-order dependent: sort_array on the struct
    # (lineNumber leads) makes the document deterministic.
    lines = lineitem.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("l_linenumber").alias("lineNumber"),
                    F.col("l_quantity").alias("quantity"),
                    F.col("l_extendedprice").alias("price"),
                )
            )
        ).alias("orderLine")
    )
    docs = orders.join(
        lines, orders.o_orderkey == lines.l_orderkey
    ).select(
        F.to_json(
            F.struct(
                F.col("o_orderkey").alias("purchaseOrderId"),
                F.col("o_custkey").alias("customerId"),
                F.struct(F.col("orderLine")).alias("orderLines"),
            )
        ).alias("payload")
    )
    parsed = docs.select(F.from_json("payload", ROUNDTRIP_LINE_SCHEMA).alias("o"))
    flat = parsed.select(
        F.col("o.purchaseOrderId").alias("orderkey"),
        F.col("o.customerId").alias("custkey"),
        F.explode("o.orderLines.orderLine").alias("ln"),
    )
    return flat.groupBy("custkey").agg(
        F.countDistinct("orderkey").alias("n_orders"),
        F.count(F.lit(1)).alias("n_lines"),
        dsum(F.col("ln.quantity"), "sum_qty"),
        dsum(F.col("ln.price"), "revenue"),
    )


def _sql_dsum(expr: str, alias: str) -> str:
    from ..num import sql_dsum

    return sql_dsum(expr, alias)


ORDER_JSON_ROUNDTRIP_SQL = f"""
SELECT o_custkey AS custkey,
       COUNT(DISTINCT o_orderkey) AS n_orders,
       COUNT(*) AS n_lines,
       {_sql_dsum("l_quantity", "sum_qty")},
       {_sql_dsum("l_extendedprice", "revenue")}
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_custkey
"""
