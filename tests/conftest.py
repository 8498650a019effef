from __future__ import annotations

import os

import pytest

from flink_learning_practise_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


def _kafka_conf() -> dict[str, str]:
    """When a broker is available (SPARK_KAFKA_BOOTSTRAP), put the
    Kafka connector on the classpath so the gated integration tests
    (test_kafka_integration.py) can run; a no-op otherwise."""
    if not os.environ.get("SPARK_KAFKA_BOOTSTRAP"):
        return {}
    import pyspark

    pkgs = os.environ.get(
        "SPARK_KAFKA_PACKAGES",
        f"org.apache.spark:spark-sql-kafka-0-10_2.13:{pyspark.__version__}",
    )
    return {"spark.jars.packages": pkgs}


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="flp-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.warehouse.dir": "/tmp/flp-spark-warehouse",
            **_kafka_conf(),
        },
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_small():
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_medium():
    return SF_MEDIUM
