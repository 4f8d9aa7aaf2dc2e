from __future__ import annotations

import pytest

from mini_distributed_search_engine_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("mdse-tests", cores=4, shuffle_partitions=4)
    yield s
