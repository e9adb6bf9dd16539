"""Shared fixtures: one local SparkSession per test run + payload loader.

SURVEY §5.2 item 3: JSON normalization is tested against captured
sample payloads of the 10 public APIs (shapes per app.py:90-187),
checked into tests/payloads/ — no live network in tests.
"""

from __future__ import annotations

import json
import os

import pytest

from real_time_big_data_architect_spark.session import get_spark

PAYLOAD_DIR = os.path.join(os.path.dirname(__file__), "payloads")
SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    warehouse = str(tmp_path_factory.mktemp("warehouse"))
    s = get_spark(
        "pytest",
        cpus=4,
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": warehouse},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_small() -> str:
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_medium() -> str:
    return SF_MEDIUM


def raw_payload(source: str) -> str:
    with open(os.path.join(PAYLOAD_DIR, f"{source}.json")) as f:
        return f.read()


def payload_obj(source: str):
    return json.loads(raw_payload(source))


@pytest.fixture()
def payload_df(spark):
    """Factory: payload JSON file → 1-row DataFrame(payload string)."""

    def _make(source: str):
        return spark.createDataFrame([(raw_payload(source),)], "payload string")

    return _make
