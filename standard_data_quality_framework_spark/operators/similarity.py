"""Similarity search over embedding columns (array<float>).

  cosine_topk   — exact brute-force top-k: broadcast the (small) query
                  set against the candidate scan; one narrow pass over
                  the big side, ranked per query. The right baseline
                  at any scale where |queries| ≪ |candidates|.
  lsh_buckets / — random-hyperplane sign-LSH: each vector gets a
  lsh_ann         n_planes-bit bucket; candidates are fetched from the
                  query's bucket only. The scale path: the bucket join
                  is an equi-join on a uniform key, probing
                  1/2^n_planes of the corpus in expectation.

All math is native Catalyst (zip_with / aggregate lambda expressions
over array<double>) — no UDFs, whole-stage codegen applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import hyperplanes


def _cos(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def cosine_topk(candidates: DataFrame, queries: DataFrame, id_col: str,
                vec_col: str, k: int = 5) -> DataFrame:
    """(query_id, neighbor_id, cos_sim, rank) — exact top-k by cosine.

    Broadcast the query side; rank with a per-query window. Ties break
    on neighbor id for determinism."""
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv"))
    c = candidates.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).cast("array<double>").alias("cv"))
    scored = (c.join(F.broadcast(q),
                     F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      F.round(_cos(F.col("qv"), F.col("cv")), 4)
                      .alias("cos_sim")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def lsh_buckets(df: DataFrame, id_col: str, vec_col: str,
                n_planes: int = 8, dim: int = 64) -> DataFrame:
    """(id, bucket) — sign-LSH bucket id from deterministic planes."""
    planes = hyperplanes(n_planes, dim)
    v = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        pl = F.array(*[F.lit(x) for x in plane])
        dot = F.aggregate(F.zip_with(v, pl, lambda x, y: x * y),
                          F.lit(0.0), lambda acc, x: acc + x)
        bucket = bucket + F.when(dot > 0,
                                 F.lit(2 ** p).cast("long")).otherwise(0)
    return df.select(F.col(id_col).alias("id"), bucket.alias("bucket"))


def lsh_ann(candidates: DataFrame, queries: DataFrame, id_col: str,
            vec_col: str, k: int = 5, n_planes: int = 8,
            dim: int = 64) -> DataFrame:
    """Approximate top-k: exact cosine ranking within the query's LSH
    bucket. Recall < 1 by design; the bench compares it to cosine_topk."""
    cb = lsh_buckets(candidates, id_col, vec_col, n_planes, dim)
    qb = lsh_buckets(queries, id_col, vec_col, n_planes, dim)
    c = (candidates.select(F.col(id_col).alias("neighbor_id"),
                           F.col(vec_col).cast("array<double>").alias("cv"))
         .join(cb.withColumnRenamed("id", "neighbor_id"), "neighbor_id"))
    q = (queries.select(F.col(id_col).alias("query_id"),
                        F.col(vec_col).cast("array<double>").alias("qv"))
         .join(qb.withColumnRenamed("id", "query_id"), "query_id"))
    scored = (c.join(F.broadcast(q), "bucket")
              .filter(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      F.round(_cos(F.col("qv"), F.col("cv")), 4)
                      .alias("cos_sim")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
