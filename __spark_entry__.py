"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query — goskyr-config extraction (items
  explode + CSS/regex/date kernels + filters) over pages synthesized from
  /root/testdata/sf0.001/documents.parquet.
- ``queries()``: one entry per implemented operator family from
  SURVEY.md §2 plus the training-data-pipeline ops (dedup, similarity,
  text analysis, multimodal plumbing, crawl rounds).
- ``oracle_sql()``: DuckDB-runnable ANSI SQL equivalents (same column
  names/aliases) for every SQL-expressible query; crawl/LSH queries are
  rows-only checks.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction pipeline at sf0.001 (rows > 0)."""
    from goskyr_spark.queries import q_ex_items_explode

    return q_ex_items_explode(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from goskyr_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from goskyr_spark.queries import all_oracles

    return all_oracles()
