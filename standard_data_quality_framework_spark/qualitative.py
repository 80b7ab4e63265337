"""Qualitative assessment track.

The reference pairs its computed checks with a 7-dimension expert
questionnaire, each answer an integer 1–5 (/root/reference/app.py:
73-158), normalized ``value = (score − 1) / 4`` (app.py:496), and the
final overall rating averages the qualitative and quantitative overall
ratings (app.py:1799-1801). In this engine the questionnaire is a
static config record — validated, normalized, and merged with the
computed metrics table; no per-document compute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import DIMENSIONS

QUALITATIVE_TEMPLATE: dict[str, int] = {d: 3 for d in DIMENSIONS}


def validate_answers(answers: dict[str, int]) -> dict[str, int]:
    out = {}
    for dim in DIMENSIONS:
        if dim not in answers:
            raise ValueError(f"missing qualitative answer for {dim!r}")
        v = int(answers[dim])
        if not 1 <= v <= 5:
            raise ValueError(f"{dim}: answer {v} outside 1..5")
        out[dim] = v
    return out


def qualitative_frame(spark: SparkSession,
                      answers: dict[str, int]) -> DataFrame:
    """(dimension, rating, score) — score = (rating − 1) / 4."""
    a = validate_answers(answers)
    rows = [(d, v, (v - 1) / 4.0) for d, v in a.items()]
    return spark.createDataFrame(
        rows, "dimension string, rating int, score double")


def combined_overall(quant_metrics: DataFrame,
                     qual: DataFrame) -> DataFrame:
    """Overall = mean(quantitative overall rating, qualitative overall
    rating) — app.py:1799-1801. quant_metrics is the metrics.py long
    frame (needs `dimension`, `rating`); excludes its own overall row."""
    q = (quant_metrics.filter(F.col("dimension") != "overall")
         .agg(F.avg(F.col("rating").cast("double"))
              .alias("quant_rating")))
    ql = qual.agg(F.avg(F.col("rating").cast("double"))
                  .alias("qual_rating"))
    return q.crossJoin(ql).select(
        "quant_rating", "qual_rating",
        F.round((F.col("quant_rating") + F.col("qual_rating")) / 2.0, 6)
        .alias("overall_rating"))
