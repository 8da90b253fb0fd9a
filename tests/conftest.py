import pytest

from ocr_spark.pipeline.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("local[4]", app_name="ocr_spark_tests", shuffle_partitions=8)
    yield s
    s.stop()
