from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_UNIT = "/root/testdata/sf0.001"   # fast unit-level checks
SF_ORACLE = "/root/testdata/sf0.01"  # the driver's correctness SF


@pytest.fixture(scope="session")
def spark():
    from dig_etl_engine_spark.session import get_spark

    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def sf_unit() -> str:
    return SF_UNIT


@pytest.fixture(scope="session")
def sf_oracle() -> str:
    return SF_ORACLE
