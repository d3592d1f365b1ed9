"""Shared fixtures: one session-scoped local SparkSession (small shuffle
partition count — tests run on tiny data; sizing for scale is bench.py's
job), and a small deterministic corpus."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from theta_spark.corpus import generate_corpus  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    from theta_spark.session import get_spark

    s = get_spark(app_name="theta-spark-tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def docs50():
    return generate_corpus(50, seed=42)


@pytest.fixture(scope="session")
def corpus50(spark, docs50):
    from theta_spark.corpus import corpus_rows, CORPUS_SCHEMA

    return spark.createDataFrame(corpus_rows(docs50), schema=CORPUS_SCHEMA).repartition(4)
