import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dat_archive_map_reduce_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    # test modules define map UDFs; workers must be able to import them
    tests_dir = os.path.dirname(os.path.abspath(__file__))
    existing = os.environ.get("PYTHONPATH", "")
    if tests_dir not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{tests_dir}{os.pathsep}{existing}" if existing else tests_dir
    s = get_spark("tests")
    yield s
    s.stop()
