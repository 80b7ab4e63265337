"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship quality-filter verdict query at sf0.001.
queries()    — every implemented operator from SURVEY.md §2 +
               the training-data ops, one callable per name.
oracle_sql() — DuckDB-ANSI equivalents (same aliases, same rounding,
               same md5-prefix hashing) for the value-hash compare.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from standard_data_quality_framework_spark.plans.entry_queries import (  # noqa: E402
    ORACLES, QUERIES)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["pipeline_verdict_documents"](
        spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
