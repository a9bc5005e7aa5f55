from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from usearch_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8, shuffle_partitions=8)
    yield s
