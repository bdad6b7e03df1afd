"""Driver contract for the spark-graft builder (PySpark target).

`queries()` / `oracle_sql()` delegate to mine_database_spark.queries.registry;
see SURVEY.md §2 for the operator inventory each entry covers.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: pricing summary (exact
    integer-cents aggregation over lineitem)."""
    from mine_database_spark.queries.registry import QUERIES

    return QUERIES["pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mine_database_spark.queries.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from mine_database_spark.queries.registry import ORACLES

    return dict(ORACLES)
