import os

import pytest


def _has_testdata() -> bool:
    return os.path.isdir("/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from ddsketch_ruby_spark.sources.session import get_spark

    s = get_spark("ddsketch-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    if not _has_testdata():
        pytest.skip("driver testdata not present")
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf01_dir() -> str:
    if not os.path.isdir("/root/testdata/sf0.01"):
        pytest.skip("driver testdata not present")
    return "/root/testdata/sf0.01"
