from __future__ import annotations

import pytest

from citybikedatawarehouse_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    import tempfile

    # tiny test inputs: fewer shuffle partitions = less task overhead;
    # warehouse in a tmp dir so saveAsTable never writes into the repo
    s = get_spark(
        app_name="cbdw-tests",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="cbdw_wh_")},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    # small SF for fast unit runs; the driver re-checks at sf0.01
    return "/root/testdata/sf0.001"
