from __future__ import annotations

import pytest

from mysql_time_machine_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("mtm-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def rich_log():
    from fixtures.gen_binlog import generate_rich

    return generate_rich(seed=42)
