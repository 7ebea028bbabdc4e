import sys

import pytest

sys.path.insert(0, "/root/repo")

from ape_dts_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    return get_spark("tests", shuffle_partitions=4)


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
