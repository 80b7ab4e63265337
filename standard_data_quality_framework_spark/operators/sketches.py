"""Approximate-distinct sketches with EXACT SQL oracles.

hll_distinct — HyperLogLog built from first principles (Flajolet et
al. 2007, public algorithm) on the cross-engine hash60: at 10^12 docs
a `count_distinct(url)` shuffles every distinct value; the sketch
shuffles 2^p ≤ 1024 registers per group and merges associatively.

Determinism design (why this oracle can be EXACT, unlike Spark's
approx_count_distinct whose HLL++ internals DuckDB can't mirror):

  * register = max over a uniform integer hash — order-independent;
  * the harmonic-sum denominator Σ 2^(-rho) is computed SCALED BY 2^51
    so every term 2^(51-rho) is an exact BIGINT and the SUM is an
    order-independent integer (float summation order would differ
    between engines);
  * the final estimate is ONE double expression over those integers,
    written token-for-token identically in Spark and DuckDB SQL.

Recast of the reference's uniqueness counting
(/root/reference/src/quality_checks.py:245-275 duplicate-row ratio) at
cardinalities where exact distinct does not fit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash60, hash60_sql

_P = 10                      # 2^10 = 1024 registers
_M = 1 << _P
_SCALE = float(1 << 51)      # exact in double
# alpha_m for m = 1024 — same literal arithmetic on both engines
_ALPHA_EXPR = "0.7213 / (1.0 + 1.079 / 1024.0)"


def hll_distinct(df: DataFrame, group_cols: list[str],
                 value_col: str, p: int = _P) -> DataFrame:
    """(group_cols…, est_distinct) — HLL cardinality estimate per
    group over ``value_col``, exact-SQL-mirrorable (see module doc).

    Plan shape: one narrow projection (hash/bucket/rho), one partial-
    aggregating groupBy to the max-register form (≤ m rows per group
    cross the wire), one tiny final aggregate. Skew-free: bucket ids
    are uniform by construction.
    """
    if p != _P:
        raise ValueError("p is pinned to 10 so the SQL oracle constants "
                         "(alpha, scale) stay literal")
    m = 1 << p
    # explicit string cast: md5 wants string/binary, and long→string
    # renders identically in both engines (no scientific notation)
    h = hash60(F.col(value_col).cast("string"))  # 60-bit uniform
    bucket = F.pmod(h, F.lit(m))
    rest = F.shiftright(h, p)               # top 50 bits
    # rho = leading zeros of the 50-bit remainder + 1 ∈ [1, 51];
    # bin-length(x) = floor(log2 x)+1 exactly (string length, no
    # float log) — conv(x,10,2) here, bin(x) in DuckDB
    rho = (F.when(rest == 0, F.lit(51))
           .otherwise(F.lit(51) - F.length(F.conv(rest, 10, 2))))
    regs = (df.select(*group_cols, bucket.alias("_b"), rho.alias("_rho"))
            .groupBy(*group_cols, "_b")
            .agg(F.max("_rho").alias("r")))
    per = (regs.groupBy(*group_cols)
           .agg(F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), "
                             "CAST(51 - r AS INT))")).alias("_s"),
                F.count("*").alias("_mp")))
    denom = (F.col("_s")
             + (F.lit(m) - F.col("_mp")) * F.lit(1 << 51)).cast("double")
    e_raw = (F.expr(_ALPHA_EXPR) * F.lit(float(m)) * F.lit(float(m))
             * F.lit(_SCALE) / denom)
    v = (F.lit(m) - F.col("_mp")).cast("double")  # empty registers
    est = F.when((e_raw <= 2.5 * m) & (v > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m)) / v)) \
           .otherwise(e_raw)
    return per.select(*group_cols, F.round(est, 4).alias("est_distinct"))


def bottomk_sketch(df: DataFrame, group_cols: list[str],
                   value_col: str, k: int = 32) -> DataFrame:
    """(group…, value, hrank) — the k distinct values with the SMALLEST
    hash60 per group: a KMV (k-minimum-values) sketch.

    Deterministic and mergeable: the bottom-k of a union is the
    bottom-k of the concatenated bottom-ks, so partial sketches
    combine associatively across partitions/days — the property that
    makes it a sketch rather than a sample. Doubles as (a) a stable
    per-group sample for eyeballing and (b) a distinct-count
    estimator ((k−1)/max_kth_normalized — HLL above is the better
    counter; KMV keeps the sample itself). One uniform-key shuffle.
    """
    h = hash60(F.col(value_col).cast("string"))
    from pyspark.sql import Window
    w = (Window.partitionBy(*group_cols)
         .orderBy(F.col("_h").asc(), F.col(value_col).asc()))
    return (df.select(*group_cols, F.col(value_col), h.alias("_h"))
            .dropDuplicates([*group_cols, value_col])
            .withColumn("hrank", F.row_number().over(w))
            .filter(F.col("hrank") <= k)
            .drop("_h"))


def hll_distinct_sql(table: str, group_cols: list[str],
                     value_expr: str) -> str:
    """DuckDB mirror of hll_distinct (p=10) over ``table``."""
    g = ", ".join(group_cols)
    h = hash60_sql(value_expr)
    return f"""
WITH hashed AS (
  SELECT {g}, ({h}) % 1024 AS _b,
         CASE WHEN ({h}) // 1024 = 0 THEN 51
              ELSE 51 - length(bin(({h}) // 1024)) END AS _rho
  FROM {table}
),
regs AS (
  SELECT {g}, _b, max(_rho) AS r FROM hashed GROUP BY {g}, _b
),
per AS (
  SELECT {g},
         CAST(sum(CAST(1 AS BIGINT) << (51 - r)) AS BIGINT) AS _s,
         count(*) AS _mp
  FROM regs GROUP BY {g}
)
SELECT {g},
       round(CASE WHEN ({_ALPHA_EXPR} * 1024.0 * 1024.0
                        * 2251799813685248.0
                        / CAST(_s + (1024 - _mp)
                               * (CAST(1 AS BIGINT) << 51) AS DOUBLE))
                       <= 2.5 * 1024
                   AND (1024 - _mp) > 0
              THEN 1024.0 * ln(1024.0 / CAST(1024 - _mp AS DOUBLE))
              ELSE {_ALPHA_EXPR} * 1024.0 * 1024.0 * 2251799813685248.0
                   / CAST(_s + (1024 - _mp)
                          * (CAST(1 AS BIGINT) << 51) AS DOUBLE)
              END, 4) AS est_distinct
FROM per
"""


def grouped_quantiles(df: DataFrame, group_cols: list[str],
                      value_col: str, qs: list[tuple[float, str]],
                      approx: bool = True,
                      accuracy: int = 10_000) -> DataFrame:
    """(group_cols…, <alias per quantile>) — grouped quantiles with a
    memory-bounded default.

    approx=True (the 100-TB tier) uses ``approx_percentile`` — Spark's
    QuantileSummaries (Greenwald–Khanna variant): per-group state is
    O(accuracy · log n) summary tuples instead of EVERY value, and the
    returned value's RANK error is ≤ n/accuracy (documented Spark
    contract). At accuracy=10⁴ over a 10⁹-row group that is a rank
    window of 10⁵ around the true quantile — for smooth value
    distributions a tiny relative value error (bounded empirically by
    tests/test_quality_extras.py::test_grouped_quantiles_approx_relerr).

    approx=False computes exact ``percentile`` — bit-reproducible vs
    DuckDB on integer inputs at dyadic q (the oracle tier:
    plans/entry_queries.py price_quantiles_by_flag), but it buffers
    every group value in one aggregation buffer; with billions of rows
    per group that is an executor OOM, so exact is gated to test scale.

    Recast of /root/reference/src/quality_checks.py summary statistics
    (describe()-style percentiles) for groups that do not fit memory.
    """
    # ONE percentile aggregate with an ARRAY of percentages, then
    # project the items out: per-alias aggregates each built their own
    # per-group value buffer over the same column — 3 quantiles meant
    # 3 identical counts-maps and 3 sorts. The array form shares one
    # buffer; each quantile is computed from the same per-group state,
    # so values are bit-identical per q.
    pcts = F.array(*[F.lit(q) for q, _ in qs])
    if approx:
        agg = F.approx_percentile(F.col(value_col), pcts,
                                  F.lit(accuracy)).alias("_qarr")
    else:
        agg = F.percentile(F.col(value_col), pcts).alias("_qarr")
    return (df.groupBy(*group_cols).agg(agg)
            .select(*group_cols,
                    *[F.col("_qarr").getItem(i).alias(alias)
                      for i, (_, alias) in enumerate(qs)]))


def bloom_sketch(df: DataFrame, key_col: str, n_bits: int = 16384,
                 k: int = 4, salt: str = "bloom") -> DataFrame:
    """(word_idx, bits) — a Bloom filter over ``key_col`` packed into
    63-bit words (bit 63 stays clear so no engine ever has to shift
    into the sign bit — DuckDB rejects ``1::BIGINT << 63``), the
    crawler seen-URL set: a frontier of 10^12 fetched URLs becomes
    ``n_bits`` bits the scheduler probes before enqueueing, with
    false-positive rate ≈ fill^k and NO false negatives.

    The k probe positions come from independently-salted hash60
    values, so both engines compute bit-identical filters and the
    sketch has an exact SQL oracle (same determinism design as
    ``hll_distinct``). Words whose bits are all zero are absent.

    Scale shape: k rows per key explode into (word, mask) pairs whose
    ``bit_or`` partially aggregates map-side — a partition containing
    the same hot URL a million times combines to ≤ k rows before the
    shuffle; reducer keys are bounded by the FILTER size (a knob),
    not the corpus. The result is mergeable: ``bit_or`` two days'
    sketches word-by-word for the rolling seen-set.
    """
    pos = [F.pmod(hash60(F.concat_ws("␟", F.lit(f"{salt}{i}"),
                                     F.col(key_col).cast("string"))),
                  F.lit(n_bits)) for i in range(k)]
    exploded = df.select(F.explode(F.array(*pos)).alias("_pos"))
    return (exploded
            .select(F.expr("_pos div 63").alias("word_idx"),
                    F.expr("shiftleft(CAST(1 AS BIGINT), "
                           "CAST(_pos % 63 AS INT))").alias("_mask"))
            .groupBy("word_idx")
            .agg(F.bit_or("_mask").alias("bits")))


def bloom_summary(sketch: DataFrame, n_bits: int,
                  k: int = 4) -> DataFrame:
    """One row (n_set_bits, fill_frac, est_fpr) from a
    ``bloom_sketch`` frame — the saturation gauge that tells the
    scheduler when to grow or rotate the filter (est_fpr = fill^k,
    the standard approximation). One tiny aggregation over ≤
    ceil(n_bits/63) rows."""
    agg = sketch.agg(
        F.coalesce(F.sum(F.bit_count("bits")), F.lit(0))
        .cast("long").alias("n_set_bits"))
    fill = F.col("n_set_bits") / F.lit(float(n_bits))
    return agg.select(
        "n_set_bits",
        F.round(fill, 6).alias("fill_frac"),
        F.round(F.pow(fill, F.lit(float(k))), 6).alias("est_fpr"))


def bloom_maybe_contains(df: DataFrame, key_col: str, sketch: DataFrame,
                         n_bits: int = 16384, k: int = 4,
                         salt: str = "bloom",
                         broadcast_sketch: bool = True) -> DataFrame:
    """(key, maybe_in) — probe every row's key against a
    ``bloom_sketch`` frame: true iff ALL k probe bits are set (no
    false negatives; false positives at ≈ fill^k).

    Scale shape: the sketch (≤ ceil(n_bits/63) rows — kilobytes at
    the default size) is broadcast; each key explodes into its k
    (word, mask) probes, one BroadcastHashJoin, then a bool_and back
    onto the uniform key — map-side combined, no skew.  A
    10^12-URL seen-set needs ~10^13 bits (terabyte-class, not
    broadcastable): pass ``broadcast_sketch=False`` and the probe
    joins on the uniform ``word_idx`` key instead — the sketch side
    shuffles once by word, the probe side k rows per key, both
    partition-bounded; output identical (equality pinned by pytest).
    """
    pos = [F.pmod(hash60(F.concat_ws("␟", F.lit(f"{salt}{i}"),
                                     F.col(key_col).cast("string"))),
                  F.lit(n_bits)) for i in range(k)]
    probes = (df.select(F.col(key_col).alias("key"),
                        F.explode(F.array(*pos)).alias("_pos"))
              .select("key",
                      F.expr("_pos div 63").alias("word_idx"),
                      F.expr("shiftleft(CAST(1 AS BIGINT), "
                             "CAST(_pos % 63 AS INT))").alias("_mask")))
    sk = F.broadcast(sketch) if broadcast_sketch else sketch
    joined = probes.join(sk, "word_idx", "left")
    hit = (F.coalesce(F.col("bits"), F.lit(0))
           .bitwiseAND(F.col("_mask")) != 0)
    return (joined.groupBy("key")
            .agg(F.bool_and(hit).alias("maybe_in")))
