"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Engine: ``whitebox_tools_spark`` (see SURVEY.md / README.md).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: derive geometry from the
    interleaved document table, LidarTile tile assignment + population
    filter, PIP overlay tag against the polygon fixture layer, per-tile
    per-polygon aggregate."""
    from whitebox_tools_spark.api import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from whitebox_tools_spark.api import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from whitebox_tools_spark.api import ORACLE_SQL

    return dict(ORACLE_SQL)
