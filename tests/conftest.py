import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))


@pytest.fixture(scope="session")
def spark():
    from mistral_ocr_pipeline_spark.session import get_spark

    s = get_spark(app_name="tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()
