import pytest

from market_pulse_data_pipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="mp-tests", shuffle_partitions=8)
    # Pre-warm repartitionByRange once: its first call raises
    # sys.recursionlimit (a PySpark import side effect). Inside a
    # hypothesis @given body that trips ensure_free_stackframes'
    # "limit changed during test" warning (an error under our
    # filterwarnings); triggering it here keeps the side effect
    # outside every test body.
    from pyspark.sql import functions as F  # noqa: PLC0415

    s.range(1).repartitionByRange(2, F.col("id")).count()
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
