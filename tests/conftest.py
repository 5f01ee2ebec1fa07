from __future__ import annotations

import pytest

from citybikedatawarehouse_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # tiny test inputs: fewer shuffle partitions = less task overhead
    s = get_spark(app_name="cbdw-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    # small SF for fast unit runs; the driver re-checks at sf0.01
    return "/root/testdata/sf0.001"
