import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from diversity_maximization_spark import registry
from diversity_maximization_spark.session import get_spark
from diversity_maximization_spark.testing import duck_connection

registry.load_all()

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dms-tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    return duck_connection(SF_DIR)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
