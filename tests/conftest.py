from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="session")
def spark():
    from fairy_core_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # small local parallelism for tests
    s = get_spark(app_name="fairy-core-spark-tests", shuffle_partitions=8)
    yield s
    s.stop()
