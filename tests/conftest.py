import os
import sys

import pytest

_TESTS = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_TESTS)
sys.path.insert(0, _ROOT)
# executors must be able to import the test modules (connector fns defined
# in them are pickled by reference)
os.environ["PYTHONPATH"] = os.pathsep.join(
    [_ROOT, _TESTS, os.environ.get("PYTHONPATH", "")]
).rstrip(os.pathsep)

from deepgraph_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="deepgraph_spark_tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
