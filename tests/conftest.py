from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("DIFF_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from ruleset_analysis_spark.session import get_spark

    s = get_spark(app_name="ruleset-analysis-tests", cpus=8, driver_memory="8g")
    yield s


@pytest.fixture(scope="session")
def duck():
    from ruleset_analysis_spark.oracle import duck_connect

    con = duck_connect(SF_DIR)
    yield con
    con.close()
