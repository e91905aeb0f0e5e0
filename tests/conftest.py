"""Shared Spark session + reference-parity fixtures.

Fixture data mirrors /root/reference/test/unit/test_selectivesearch.py:17-41
(documented in FIXTURES.md §A) so the ported tests validate against the
reference's own worked examples.
"""

from __future__ import annotations

import pytest

from dataproc_spark.core import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("dataproc_spark-tests", master="local[4]", shuffle_partitions=8,
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.driver.memory": "4g"})
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture()
def results(spark):
    rows = [
        (q, s, b, float(sc))
        for q, s, b, sc in zip(
            [0] * 6 + [1] * 6,
            [0, 0, 1, 1, 2, 2] * 2,
            [0, 1, 0, 1, 0, 1] * 2,
            [3, 2, 5, 2, 4, 1] + [2, 2, 4, 3, 5, 5],
        )
    ]
    return spark.createDataFrame(
        rows, schema="query long, shard long, bucket long, score double"
    )


@pytest.fixture()
def selection(spark):
    rows = list(
        zip([0, 0, 0] + [1, 1, 1], list(range(3)) * 2, [0, 2, 1] + [2, 1, 0])
    )
    return spark.createDataFrame(rows, schema="query long, shard long, rank long")


@pytest.fixture()
def bucket_selection(spark):
    rows = list(
        zip(
            [0] * 6 + [1] * 6,
            [0, 0, 1, 1, 2, 2] * 2,
            [0, 1] * 6,
            [0, 3, 1, 4, 2, 5] + [2, 0, 3, 1, 4, 5],
        )
    )
    return spark.createDataFrame(
        rows, schema="query long, shard long, bucket long, rank long"
    )


def rows_set(df, cols=None):
    """Collect a DataFrame as a set of tuples (order-insensitive compare)."""
    cols = cols or df.columns
    return {tuple(r[c] for c in cols) for r in df.select(*cols).collect()}
