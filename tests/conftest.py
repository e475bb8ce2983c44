import pytest

from etl_mark1_spark import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    warehouse = str(tmp_path_factory.mktemp("warehouse"))
    spark = get_spark(app_name="etl_mark1_tests", master="local[4]",
                      shuffle_partitions=4,
                      extra_conf={"spark.sql.warehouse.dir": warehouse})
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
