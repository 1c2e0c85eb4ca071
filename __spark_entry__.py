"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship monitoring-dashboard query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2.2 with its DuckDB oracle twin (see
``financialtransactionmonitoringsystem_spark/queries.py``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from financialtransactionmonitoringsystem_spark import queries as _registry
from financialtransactionmonitoringsystem_spark.operators.relational import q_join_multiway


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the TPC-H-Q5-shaped "monitoring dashboard" — revenue
    per region/nation across a 6-table join (SURVEY.md §7 M0)."""
    return q_join_multiway(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.all_queries()


def oracle_sql() -> dict[str, str]:
    return _registry.all_oracles()
