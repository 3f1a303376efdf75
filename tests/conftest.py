"""Shared fixtures: one SparkSession and one DuckDB oracle per test session.

SPARK_GRAFT_TEST_SF selects the correctness tier (default sf0.01 = t2).
"""

from __future__ import annotations

import os

import pytest

from s3_kinesis_replay_spark.oracle import duck_connect
from s3_kinesis_replay_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="skr-tests")
    yield s
    # keep the session alive across the whole run; stop at interpreter exit


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()
