from __future__ import annotations

import pytest

from automated_review_analysis_pipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="arap-spark-tests", master="local[4]",
                  extra_confs={"spark.ui.enabled": "false",
                               "spark.sql.shuffle.partitions": "4"})
    yield s
    s.stop()


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
