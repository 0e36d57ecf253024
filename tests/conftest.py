import pytest


@pytest.fixture(scope="session")
def spark():
    from rasteret_spark.session import get_spark

    s = get_spark(app="rasteret-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def images_pdf():
    from rasteret_spark.sources import synthetic as syn

    return syn.images_table(60).to_pandas()


@pytest.fixture(scope="session")
def images_df(spark, images_pdf):
    df = spark.createDataFrame(images_pdf)
    df.persist()
    df.count()
    return df


@pytest.fixture(scope="session")
def aois_pdf():
    from rasteret_spark.sources import synthetic as syn

    return syn.aois_table(30).to_pandas()


@pytest.fixture(scope="session")
def points_pdf():
    from rasteret_spark.sources import synthetic as syn

    return syn.points_table(80).to_pandas()
