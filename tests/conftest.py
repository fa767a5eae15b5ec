import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    from kgp.session import get_spark

    s = get_spark("kgp-tests", cores=4, extra_conf={
        "spark.sql.shuffle.partitions": "8",
        "spark.ui.enabled": "false",
    })
    yield s
    s.stop()
