import os

import pytest

from ocr_spark.pipeline.session import get_spark

# local[8], shuffle_partitions=8 by default: every 8-partition stage
# runs in ONE wave instead of two (the box has 32 cores; one pytest
# process runs at a time). Plans are unchanged — only wave count
# drops. OCR_SPARK_TEST_CORES overrides for wall-clock experiments.
_CORES = int(os.environ.get("OCR_SPARK_TEST_CORES", "8"))


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        f"local[{_CORES}]", app_name="ocr_spark_tests",
        shuffle_partitions=_CORES,
    )
    yield s
    s.stop()
