from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from facematch_spark.session import get_spark


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    s = get_spark(app_name="facematch_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_corpus():
    from facematch_spark.fixtures import generate_corpus

    return generate_corpus(n_base=50, seed=42)


@pytest.fixture(scope="session")
def tiny_df(spark, tiny_corpus):
    from facematch_spark import schema as S
    from facematch_spark.fixtures import corpus_to_pandas

    return spark.createDataFrame(corpus_to_pandas(tiny_corpus), schema=S.SOURCE_FILES)
