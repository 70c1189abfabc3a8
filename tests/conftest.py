"""Shared Spark fixture for the unit suite.

One session-scoped local[4] SparkSession (Spark startup is ~10 s; per-test
sessions would dominate the suite's runtime). Shuffle partitions kept tiny so
single-machine test jobs don't schedule 32 near-empty tasks per exchange.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "realparse: drives the optional pypdf/pdfplumber/PIL adapter paths "
        "against real-format fixture bytes (skipped where the libs are absent)",
    )


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("yfinance-etl-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet stores TIMESTAMP(NANOS) — same handling as session.get_spark
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    yield s
    s.stop()
