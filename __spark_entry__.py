"""Driver contract for the spark-graft builder (PySpark target).

Thin view over bqfetch_spark's query registry: every implemented
operator from SURVEY.md §2 is a named entry with a PySpark
implementation and (where SQL-expressible) a DuckDB oracle string.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bqfetch_spark.registry import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    from bqfetch_spark.operators.relational import q01_pricing_summary

    return q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in sorted(all_queries().items())}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in sorted(all_queries().items()) if q.oracle is not None}
