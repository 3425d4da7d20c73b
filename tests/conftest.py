import pytest

from selfclean_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        "selfclean-spark-tests",
        master="local[4]",
        extra_conf={
            "spark.sql.shuffle.partitions": "8",
            "spark.driver.memory": "4g",
        },
    )
    yield spark
    spark.stop()
