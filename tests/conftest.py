from __future__ import annotations

import pytest

from bifrost_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("bifrost-tests", master="local[4]", shuffle_partitions=4,
                  extra_conf={"spark.sql.warehouse.dir": "/tmp/bifrost-warehouse"})
    yield s
