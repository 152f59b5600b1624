from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from sketchlib.spark.session import get_spark

    s = get_spark(app="sketchlib-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
