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


# The driver's correctness probe samples the FIRST 50 entries of
# queries(). The registry (100 queries) has outgrown that window, so
# ordering follows a NEUTRAL, self-maintaining rotation rule — not a
# hand-curated list (ADVICE r4): queries WITHOUT a row in the latest
# driver CORRECTNESS artifact come first (least-recently-probed
# first), each group in registration order. Any two consecutive
# driver rounds therefore jointly cover the whole registry, and a new
# query is always probed in its first round. The rotated-out tail is
# still replayed against DuckDB every round by
# tests/test_entry_oracle.py (all queries, sf0.001).


def _latest_probed() -> set[str]:
    import glob
    import json
    here = os.path.dirname(os.path.abspath(__file__))
    files = sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json")))
    if not files:
        return set()
    try:
        with open(files[-1]) as f:
            return set(json.load(f))
    except (OSError, ValueError):
        return set()


def _ordered(names: list[str]) -> list[str]:
    probed = _latest_probed()
    fresh = [n for n in names if n not in probed]
    stale = [n for n in names if n in probed]
    return fresh + stale


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: QUERIES[n] for n in _ordered(list(QUERIES))}


def oracle_sql() -> dict[str, str]:
    return {n: ORACLES[n] for n in _ordered(list(ORACLES))}
