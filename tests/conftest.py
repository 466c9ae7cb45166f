import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from subgraph_isomorphism_pregel_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("sip-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()
