"""Shared test fixtures: one session-scoped local SparkSession."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import SparkSession

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "4")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    session = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("dve-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .config(
            "spark.sql.warehouse.dir",
            __import__("tempfile").mkdtemp(prefix="dve_warehouse_"),
        )
        .getOrCreate()
    )
    session.sparkContext.setLogLevel("ERROR")
    yield session
    session.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
