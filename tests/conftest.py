import os
import random
import string
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datalakefoundation_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dlf-tests", master="local[8]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture()
def prefix():
    """Randomized system-field prefix per test — catches hardcoded-prefix bugs
    (reference datalake.scala:49)."""
    return "".join(random.choices(string.ascii_lowercase, k=4)) + "_"


@pytest.fixture()
def lake_root(tmp_path):
    return str(tmp_path / "lake")
