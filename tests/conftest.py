from __future__ import annotations

import pytest

from hjsonschema_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="hjsonschema_spark-tests", cores=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
