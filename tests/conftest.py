import pytest

from ocr_spark.pipeline.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # local[8], shuffle_partitions=8: every 8-partition stage runs in
    # ONE wave instead of two (the box has 32 cores; one pytest process
    # runs at a time). Plans are unchanged — only wave count drops.
    s = get_spark("local[8]", app_name="ocr_spark_tests", shuffle_partitions=8)
    yield s
    s.stop()
