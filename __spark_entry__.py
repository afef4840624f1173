"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship spatial join at sf0.001.
queries(): one callable per implemented operator (SURVEY.md §2).
oracle_sql(): DuckDB-runnable ANSI-SQL twins for the correctness gate.

Implementations live in shapely_spark/queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the engine's spatial join (cell-cover broadcast
    equi-join + prepared-polygon refine) over points derived from
    /root/testdata/sf0.001 against the 25-region nation-box layer."""
    from shapely_spark.queries import QUERIES

    return QUERIES["spatial_join_boxes"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from shapely_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from shapely_spark.queries import ORACLES

    return dict(ORACLES)
