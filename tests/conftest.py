from __future__ import annotations

import tempfile

import pytest

from avro_conversions_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # warehouse dir is a STATIC config (cannot change on a live session);
    # point it at a temp dir so bucketed-table tests never pollute the repo
    wh = tempfile.mkdtemp(prefix="spark_warehouse_")
    s = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    yield s
    s.stop()
