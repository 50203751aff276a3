from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CHECK = "/root/testdata/sf0.01"
SF_BENCH = "/root/testdata/sf0.1"


@pytest.fixture(scope="session")
def spark():
    from multiagent_form_schema_etl_spark.session import get_spark

    s = get_spark("tests", cpus="8")
    s.sparkContext.setLogLevel("ERROR")
    yield s
