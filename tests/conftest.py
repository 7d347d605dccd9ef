import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="session")
def spark():
    from engine.session import get_spark
    s = get_spark("trip-tiler-tests", master="local[4]", shuffle_partitions=8,
                  driver_memory="8g")
    yield s


@pytest.fixture(scope="session")
def unit_pages():
    """Deterministic unit-scale web_pages + planted truth (FIXTURES.md §1)."""
    from engine.datagen import gen_web_pages
    return gen_web_pages(n_hosts=8, total_pages=2000, seed=42)


@pytest.fixture(scope="session")
def unit_pages_sdf(spark, unit_pages):
    from engine.datagen import pages_to_spark
    return pages_to_spark(spark, unit_pages[0]).cache()
