"""Shared fixtures: one SparkSession per test session, testdata paths,
deterministic generators (FIXTURES.md)."""

from __future__ import annotations

import os

import pytest

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMOKE = os.path.join(TESTDATA, "sf0.001")
SF_CORRECT = os.path.join(TESTDATA, "sf0.01")


@pytest.fixture(scope="session")
def spark():
    from datasketches_rust_spark.config import spark_session
    s = spark_session("dsrs-tests", cpus=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "8")), shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_smoke_dir():
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_correct_dir():
    return SF_CORRECT
