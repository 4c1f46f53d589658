import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from ferramenta_etl_spark.session import get_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    s = get_session("ferramenta-tests", master=f"local[{cpus}]", shuffle_partitions=cpus)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
