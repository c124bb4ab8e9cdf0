import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="session")
def spark():
    from openaip_yaixm_to_geojson_spark.plans.session import build_session

    session = build_session(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield session
    session.stop()
