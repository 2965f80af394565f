from __future__ import annotations

import os

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_TEST_CPUS", "4")
    s = (
        SparkSession.builder.appName("giranking-tests")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # ANSI-on matches the driver's Spark 4 session (round-3 gate ran
        # ANSI-enabled); override with SPARK_GRAFT_ANSI=false to test legacy.
        .config("spark.sql.ansi.enabled", os.environ.get("SPARK_GRAFT_ANSI", "true"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


SF_SMALL = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
