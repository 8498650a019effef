"""End-to-end test of the Walmart-order-shaped ETL (SURVEY §2 #20) on a
synthetic fixture (same nested shape as the reference's order stream;
data generated here, not copied)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from flink_learning_practise_spark.plans import order_etl


def make_order(i: int) -> dict:
    base_ms = 1_700_000_000_000 + i * 60_000
    return {
        "purchaseOrderId": f"PO{i:06d}",
        "customerOrderId": f"CO{i:06d}",
        "customerEmailId": f"cust{i}@example.com",
        "orderDate": base_ms,
        "shippingInfo": {
            "phone": "5550000000",
            "estimatedDeliveryDate": base_ms + 86_400_000,
            "estimatedShipDate": base_ms + 3_600_000,
            "methodCode": "Value",
            "postalAddress": {
                "name": f"Customer {i}",
                "address1": f"{i} Main St",
                "address2": None,
                "city": "Springfield",
                "state": "CO" if i % 2 else "CA",
                "postalCode": "80108",
                "country": "USA",
                "addressType": "RESIDENTIAL",
            },
            "carrierMethodName": None,
        },
        "orderLines": {
            "orderLine": [
                {
                    "lineNumber": str(j + 1),
                    "item": {
                        "productName": f"Product {i}-{j}",
                        "sku": f"SKU{i}_{j}",
                        "condition": "New",
                    },
                    "charges": {
                        "charge": [
                            {
                                "chargeType": "PRODUCT",
                                "chargeName": "ItemPrice",
                                "chargeAmount": {"currency": "USD", "amount": 10.0 + j},
                                "tax": {
                                    "taxName": "Tax1",
                                    "taxAmount": {"currency": "USD", "amount": 0.5 + j},
                                },
                            }
                        ]
                    },
                    "orderLineQuantity": {"unitOfMeasurement": "EACH", "amount": str(j + 1)},
                    "statusDate": base_ms + 1000,
                    "orderLineStatuses": {
                        "orderLineStatus": [
                            {
                                "status": "Created",
                                "statusQuantity": {"unitOfMeasurement": "EACH", "amount": "1"},
                                "trackingInfo": None,
                            },
                            {
                                "status": "Shipped",
                                "statusQuantity": {"unitOfMeasurement": "EACH", "amount": "1"},
                                "trackingInfo": {
                                    "shipDateTime": base_ms + 7_200_000,
                                    "carrierName": {"carrier": "UPS"},
                                    "methodCode": "Value",
                                    "trackingNumber": f"1Z{i}{j}",
                                },
                            },
                        ]
                    },
                    "fulfillment": {"fulfillmentOption": "S2H", "shipMethod": "VALUE"},
                }
                for j in range(2 + i % 2)
            ]
        },
        "shipNode": {"type": "SellerFulfilled", "name": "Seller", "id": "S1"},
        "request_time": "2026-01-01 00:00:00",
    }


@pytest.fixture(scope="module")
def order_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("orders") / "orders.jsonl"
    with open(path, "w") as f:
        for i in range(10):
            f.write(json.dumps(make_order(i)) + "\n")
    return str(path)


def test_parse_and_flatten(spark, order_file):
    raw = spark.read.text(order_file)
    orders = order_etl.parse_order_strings(raw)
    flat = order_etl.flatten_order_lines(orders)
    rows = flat.collect()
    # 5 odd orders x3 lines + 5 even x2 lines
    assert len(rows) == 5 * 3 + 5 * 2
    by_key = {(r.purchaseOrderId, r.line_number): r for r in rows}
    r = by_key[("PO000001", 2)]
    assert r.sku == "SKU1_1"
    assert r.line_status == "Shipped"
    assert r.line_charge_amount == 11.0
    assert r.line_tax_amount == 1.5
    assert r.quantity == 2.0
    assert r.ship_state == "CO"
    assert r.order_ts.isoformat().startswith("2023-11-14T22:14")
    assert flat.schema["line_number"].dataType.simpleString() == "int"


def test_order_line_stats(spark, order_file):
    raw = spark.read.text(order_file)
    flat = order_etl.flatten_order_lines(order_etl.parse_order_strings(raw))
    stats = order_etl.order_line_stats(flat).collect()
    by_state = {r.ship_state: r for r in stats}
    assert set(by_state) == {"CO", "CA"}
    assert by_state["CO"].n_orders == 5
    assert by_state["CO"].n_lines == 15
    assert by_state["CA"].n_lines == 10
    # deterministic decimal-routed totals
    assert by_state["CA"].total_charges == pytest.approx(sum(10.0 + j for _ in range(5) for j in range(2)))


def test_no_python_udf_in_plan(spark, order_file):
    raw = spark.read.text(order_file)
    flat = order_etl.flatten_order_lines(order_etl.parse_order_strings(raw))
    plan = flat._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_parse_with_rejects_routes_both_tiers(spark, tmp_path):
    """Malformed JSON and key-less records land in the reject view WITH
    their raw payload (replayable DLQ); good records parse as before —
    all from one scan."""
    path = tmp_path / "mixed.jsonl"
    good = make_order(1)
    keyless = dict(make_order(2))
    del keyless["purchaseOrderId"]
    with open(path, "w") as f:
        f.write(json.dumps(good) + "\n")
        f.write("{not valid json at all\n")
        f.write(json.dumps(keyless) + "\n")

    raw = spark.read.text(str(path))
    parsed, rejects = order_etl.parse_order_strings_with_rejects(raw)
    assert [r.purchaseOrderId for r in parsed.collect()] == ["PO000001"]
    rej = {r.reject_reason: r.raw_payload for r in rejects.collect()}
    assert set(rej) == {"malformed_json", "missing_key"}
    assert rej["malformed_json"].startswith("{not valid")
    assert json.loads(rej["missing_key"])["customerOrderId"] == keyless["customerOrderId"]
    # nothing dropped: every input line is in exactly one view
    assert parsed.count() + rejects.count() == 3
