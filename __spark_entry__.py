"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pricing-summary aggregate at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 plus the
training-data-pipeline operators (dedup / similarity / text quality /
multimodal / crawl / streaming).
``oracle_sql()`` — DuckDB-equivalent SQL for each SQL-expressible
query (binary-payload, custom-hash, and full-crawl-loop entries are
rows-only by design; their correctness gate is tests/).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from common_crawl___autumn_2025_spark.plans.catalog import (  # noqa: E402
    ORACLE_SQL,
    QUERIES,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["a02_sum_avg_pricing"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each SQL-expressible query."""
    return dict(ORACLE_SQL)
