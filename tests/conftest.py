import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("MURA_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from mura_spark.session import get_spark
    spark = get_spark("mura-tests", extra_conf={
        "spark.sql.shuffle.partitions": "8",
        "spark.ui.enabled": "false",
    })
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def session(spark):
    from mura_spark.session import MuraSession
    return MuraSession(spark)


@pytest.fixture(scope="session")
def documents(spark, sf_dir):
    from mura_spark.suite.common import table
    return table(spark, sf_dir, "documents")


@pytest.fixture(scope="session")
def embeddings(spark, sf_dir):
    from mura_spark.suite.common import table
    return table(spark, sf_dir, "embeddings")
